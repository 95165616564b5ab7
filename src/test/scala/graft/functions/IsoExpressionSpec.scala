package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IsoExpressionSpec extends SparkSpec {
  import spark.implicits._

  private val vectors = Seq(
    1738296906927463L -> "2025-01-31T04:15:06.927Z",
    1738296906900000L -> "2025-01-31T04:15:06.9Z",
    1738296906000000L -> "2025-01-31T04:15:06Z",
    1738296906999999L -> "2025-01-31T04:15:06.999Z",
    1738296906010000L -> "2025-01-31T04:15:06.01Z",
    0L -> "1970-01-01T00:00:00Z")

  test("native expression matches golden vectors (codegen path)") {
    val got = vectors.map(_._1).toDF("us")
      .select(IsoMicrosTrimExpression.column($"us")).as[String].collect().toSeq
    assert(got == vectors.map(_._2))
  }

  test("interpreted eval path matches codegen kernel") {
    vectors.foreach { case (us, want) =>
      assert(IsoMicrosFormat.format(us).toString == want)
    }
  }

  test("native expression ≡ composed built-ins on real data") {
    val events = graft.Graft.table(spark, sf(), "events")
      .withColumn("us", unix_micros($"ts"))
    val diff = events.select(
      IsoMicrosTrimExpression.column($"us").as("native"),
      Scalars.isoMicrosTrimmed($"us").as("composed"))
      .filter($"native" =!= $"composed")
    assert(diff.count() == 0)
  }

  test("null input yields null, not a crash") {
    val got = Seq[Option[Long]](Some(1L), None).toDF("us")
      .select(IsoMicrosTrimExpression.column($"us")).collect()
    assert(!got(0).isNullAt(0) && got(1).isNullAt(0))
  }
}
