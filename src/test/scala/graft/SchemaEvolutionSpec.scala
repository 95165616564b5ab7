package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Schema evolution on the parquet lake — the 100 TB operational reality
  * that a corpus written over months carries files with DIFFERENT
  * schemas (columns added over time). The engine must read the union:
  * `mergeSchema` unions file footers, rows from pre-evolution files
  * surface the new column as null, and predicate pushdown on a column
  * that exists only in SOME files must not drop the files that lack it.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("mergeSchema unions footers; old files null-fill; filters stay correct") {
    val dir = Files.createTempDirectory("graft-evolve").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$dir/old")
    Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("id", "v", "score")
      .write.mode("overwrite").parquet(s"$dir/new")

    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/old", s"$dir/new")
    assert(merged.columns.sorted.toSeq == Seq("id", "score", "v"))

    val rows = merged.orderBy("id")
      .select(col("id"), col("score")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(rows.toSeq == Seq(1L -> None, 2L -> None, 3L -> Some(30L), 4L -> Some(40L)))

    // a predicate on the evolved column must not lose pre-evolution rows
    // via pushdown into files that lack the column
    assert(merged.filter(col("score").isNull).count() == 2)
    assert(merged.filter(col("score") > 35).select("v").as[String].collect().toSeq == Seq("d"))

    // without mergeSchema, reading still works off a single footer —
    // pinned so a behavior change in the default path is caught
    val single = spark.read.parquet(s"$dir/old")
    assert(single.columns.sorted.toSeq == Seq("id", "v"))
  }
}
