package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Kernel contract for NfcNormalizeExpression: composition correctness,
  * ASCII-bypass identity, idempotence, and null passthrough \u2014 plus the
  * cross-form equality that makes q_text_canonicalize's dedup claim true.
  */
class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def nfc(c: org.apache.spark.sql.Column) =
    NfcNormalizeExpression.column(c)

  test("decomposed sequences compose to the precomposed bytes") {
    val rows = Seq(
      ("Cafe\u0301", "Caf\u00e9"), // e + combining acute \u2192 \u00e9
      ("\u212b", "\u00c5"), // Angstrom sign \u2192 \u00c5 (singleton decomposition)
      ("o\u0308", "\u00f6"), // o + diaeresis \u2192 \u00f6
      ("A\u030a", "\u00c5") // A + ring \u2192 \u00c5
    ).toDF("raw", "expected")
    val bad = rows.filter(nfc(col("raw")) =!= col("expected")).count()
    assert(bad === 0)
  }

  test("pure ASCII is returned unchanged through the bypass") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val changed = docs.filter(nfc(col("text")) =!= col("text")).count()
    assert(changed === 0)
    // kernel-level: the bypass must not even re-allocate
    val s = org.apache.spark.unsafe.types.UTF8String.fromString("plain ascii")
    assert(NfcNormalize.normalize(s) eq s)
  }

  test("idempotent: nfc(nfc(x)) == nfc(x), precomposed input is a no-op") {
    val rows = Seq("Cafe\u0301 Me\u0301nu", "Caf\u00e9", "\u212bngstro\u0308m",
      "mixed ascii Caf\u00e9 tail").toDF("raw")
    val bad = rows.filter(nfc(nfc(col("raw"))) =!= nfc(col("raw"))).count()
    assert(bad === 0)
    val noop = rows.select(lit("Caf\u00e9").as("p"))
      .filter(nfc(col("p")) =!= col("p")).count()
    assert(noop === 0)
  }

  test("null passes through as null") {
    val out = Seq[(java.lang.Long, String)]((1L, null), (2L, "Cafe\u0301"))
      .toDF("id", "s")
      .select(col("id"), nfc(col("s")).as("n"))
      .orderBy(col("id")).collect()
    assert(out(0).isNullAt(1))
    assert(out(1).getString(1) === "Caf\u00e9")
  }
}
