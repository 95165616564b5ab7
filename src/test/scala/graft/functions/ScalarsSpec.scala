package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden-vector specs from FIXTURES.md §3 (extracted from the reference's
  * processor_test.go and code semantics). These pin behavioral parity.
  */
class ScalarsSpec extends SparkSpec {
  import spark.implicits._

  test("priority decode: 1/2/3/else → High/Medium/Low/Informational") {
    val got = Seq(1L, 2L, 3L, 0L, 4L, -1L)
      .toDF("p")
      .select(Scalars.priorityLabel($"p"))
      .as[String]
      .collect()
      .toSeq
    assert(got == Seq("High", "Medium", "Low", "Informational", "Informational", "Informational"))
  }

  test("µs-epoch → ISO-8601 with Go .999 trim semantics") {
    val vectors = Seq(
      1738296906927463L -> "2025-01-31T04:15:06.927Z", // golden, processor_test.go:14-18
      1738296906900000L -> "2025-01-31T04:15:06.9Z",   // trim trailing zero
      1738296906000000L -> "2025-01-31T04:15:06Z",     // whole second, no dot
      1738296906999999L -> "2025-01-31T04:15:06.999Z", // truncate, not round
      1738296906010000L -> "2025-01-31T04:15:06.01Z",  // keep interior zero
      1738296900000000L -> "2025-01-31T04:15:00Z"      // zero seconds digit kept
    )
    val got = vectors.map(_._1).toDF("us")
      .select(Scalars.isoMicrosTrimmed($"us")).as[String].collect().toSeq
    assert(got == vectors.map(_._2))
  }

  test("event-time parse with seconds fallback") {
    val got = Seq(
      ("25/01/31-04:15:06.927463", 0L),
      ("not-a-timestamp", 1738296906L),
      (null.asInstanceOf[String], 1738296906L)
    ).toDF("ts", "secs")
      .select(unix_micros(Scalars.eventTimeWithFallback($"ts", $"secs")))
      .as[Long].collect().toSeq
    assert(got == Seq(1738296906927463L, 1738296906000000L, 1738296906000000L))
  }

  test("time bucket: (t div n) * n") {
    val got = Seq((1738296906L, 60L), (1738296900L, 60L), (120L, 100L))
      .toDF("t", "n")
      .select(Scalars.timeBucket($"t", 60L))
      .as[Long].collect().toSeq
    assert(got == Seq(1738296900L, 1738296900L, 120L))
    val custom = Seq(120L).toDF("t").select(Scalars.timeBucket($"t", 100L)).as[Long].head()
    assert(custom == 100L)
  }

  test("sha256 hex matches the reference's lowercase hex digest") {
    val got = Seq("abc").toDF("s").select(Scalars.sha256Hex($"s")).as[String].head()
    assert(got == "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
  }
}
