package graft.streaming

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import java.io.ByteArrayOutputStream

/** Row ⇄ Avro binary for the sink path. The image ships Avro core but not
  * the spark-avro bridge module, so the engine derives the Avro schema from
  * the Spark StructType directly — the same "schema follows the struct"
  * contract as the reference's generic Avro serializer
  * (internal/schema/schema.go:36-43).
  *
  * Executor-side: `encodeAll` runs inside mapPartitions, building the writer
  * once per partition from the schema's JSON form (Schema itself is not
  * serialization-friendly across closures).
  */
object AvroCodec {

  /** StructType → Avro record schema. Nullable fields become
    * union(null, T); nested structs recurse (SnortAlert.metadata).
    */
  def avroSchema(st: StructType, name: String, namespace: String = "graft"): Schema = {
    val fields = new java.util.ArrayList[Schema.Field]()
    st.fields.foreach { f =>
      val base = f.dataType match {
        case StringType  => Schema.create(Schema.Type.STRING)
        case LongType    => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case BinaryType  => Schema.create(Schema.Type.BYTES)
        case nested: StructType => avroSchema(nested, s"${name}_${f.name}", namespace)
        case other => throw new IllegalArgumentException(s"unsupported type $other for ${f.name}")
      }
      val (schema, default) =
        if (f.nullable)
          (Schema.createUnion(Schema.create(Schema.Type.NULL), base),
            Schema.Field.NULL_DEFAULT_VALUE)
        else (base, null)
      fields.add(new Schema.Field(f.name, schema, null, default))
    }
    Schema.createRecord(name, null, namespace, false, fields)
  }

  def toRecord(row: Row, st: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    st.fields.zipWithIndex.foreach { case (f, i) =>
      val v =
        if (row.isNullAt(i)) null
        else f.dataType match {
          case nested: StructType =>
            val fieldSchema = schema.getField(f.name).schema()
            val recSchema =
              if (fieldSchema.getType == Schema.Type.UNION)
                fieldSchema.getTypes.get(1)
              else fieldSchema
            toRecord(row.getStruct(i), nested, recSchema)
          case BinaryType => java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
          case _ => row.get(i)
        }
      rec.put(f.name, v)
    }
    rec
  }

  def encode(record: GenericRecord, schema: Schema): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val encoder = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(record, encoder)
    encoder.flush()
    out.toByteArray
  }

  /** Serializable Row → Avro bytes closure: ships the schema as JSON and
    * re-parses it lazily once per executor (Schema is not Serializable).
    */
  def rowEncoder(st: StructType, name: String): Row => Array[Byte] = {
    val schemaJson = avroSchema(st, name).toString
    new (Row => Array[Byte]) with Serializable {
      @transient private lazy val schema = new Schema.Parser().parse(schemaJson)
      def apply(row: Row): Array[Byte] = encode(toRecord(row, st, schema), schema)
    }
  }
}
