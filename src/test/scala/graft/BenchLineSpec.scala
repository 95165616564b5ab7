package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's stdout line discipline (r13 verdict tasks 2 and 3):
  * the two-line contract's budgets, the main line's parseability and
  * headroom against the REAL headline set, and the calib auto-taint
  * threshold logic. Pure string tests — no Spark session.
  */
class BenchLineSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private def parses(s: String) = mapper.readTree(s)

  // ---- calib reference parsing ----

  test("parseCalibRef parses the documented leg=seconds format") {
    assert(Bench.parseCalibRef("spin=0.428,shuffle=0.444,scan=0.180") ==
      Map("spin" -> 0.428, "shuffle" -> 0.444, "scan" -> 0.18))
    // whitespace and trailing comma tolerated; unknown legs carried
    assert(Bench.parseCalibRef(" spin = 0.5 , custom=1.0 ,") ==
      Map("spin" -> 0.5, "custom" -> 1.0))
    intercept[IllegalArgumentException](Bench.parseCalibRef("nonsense"))
  }

  // ---- auto-taint threshold (GATE rule: >=25% deviation = tainted) ----

  test("taintedLegs: clean window flags nothing") {
    val refs = Bench.DefaultCalibRef
    val clean = Map("spin" -> 0.430, "shuffle" -> 0.450, "scan" -> 0.185)
    assert(Bench.taintedLegs(clean, refs).isEmpty)
  }

  test("taintedLegs: the r13 live case (scan 0.225 vs ref 0.180 = exactly 1.25x) flags") {
    // VERDICT_r13 adjudicated the driver window AS tainted at exactly the
    // threshold, so the boundary must flag (>=, not >)
    val m = Map("spin" -> 0.430, "shuffle" -> 0.450, "scan" -> 0.225)
    assert(Bench.taintedLegs(m, Bench.DefaultCalibRef) == Seq("scan"))
  }

  test("taintedLegs: just-below threshold does not flag; multiple legs sort") {
    val refs = Map("spin" -> 0.4, "shuffle" -> 0.4, "scan" -> 0.2)
    assert(Bench.taintedLegs(Map("spin" -> 0.4999, "shuffle" -> 0.1, "scan" -> 0.1), refs).isEmpty)
    assert(Bench.taintedLegs(Map("spin" -> 0.51, "shuffle" -> 0.9, "scan" -> 0.1), refs) ==
      Seq("shuffle", "spin"))
  }

  test("taintedLegs: a failed calib sample (-1 median) is tainted, an absent leg is skipped") {
    val refs = Map("spin" -> 0.4, "scan" -> 0.2)
    assert(Bench.taintedLegs(Map("spin" -> -1.0, "scan" -> 0.1), refs) == Seq("spin"))
    // ref legs with no median at all (e.g. an override naming a leg this
    // build does not sample) are not judged
    assert(Bench.taintedLegs(Map("scan" -> 0.1), refs).isEmpty)
  }

  test("taintedLegsBracketed: the r14 half-window live case flags where the pooled median cannot") {
    // observed in this round's own seal attempt: a co-tenant occupied the
    // FIRST half of the window (pre-headline calib bracket inflated, the
    // post-probes one clean), every headline query read 1.3-1.7x high,
    // and the POOLED scan median 0.224 sat one sample under the 1.25x
    // bar. Per-bracket medians (0.298 vs 0.157) catch it.
    val refs = Bench.DefaultCalibRef
    val brackets = Map(
      "spin" -> Seq(Seq(0.456, 0.442, 0.441), Seq(0.431, 0.436, 0.429)),
      "shuffle" -> Seq(Seq(0.532, 0.433, 0.399), Seq(0.456, 0.377, 0.392)),
      "scan" -> Seq(Seq(0.309, 0.298, 0.224), Seq(0.165, 0.145, 0.157)))
    // pooled view is (barely) clean - the blindness being fixed
    assert(Bench.taintedLegs(Map("scan" -> 0.224), refs).isEmpty)
    assert(Bench.taintedLegsBracketed(brackets, refs) == Seq("scan"))
  }

  test("taintedLegsBracketed: clean brackets pass, an empty or failed bracket flags") {
    val refs = Map("spin" -> 0.4)
    assert(Bench.taintedLegsBracketed(
      Map("spin" -> Seq(Seq(0.41, 0.42), Seq(0.39, 0.4))), refs).isEmpty)
    // a leg whose bracket never sampled is not a clean window
    assert(Bench.taintedLegsBracketed(
      Map("spin" -> Seq(Seq.empty, Seq(0.4))), refs) == Seq("spin"))
    assert(Bench.taintedLegsBracketed(Map("spin" -> Seq.empty), refs) == Seq("spin"))
    // absent leg (override naming an unsampled leg) is skipped, as in the
    // pooled form
    assert(Bench.taintedLegsBracketed(Map.empty, refs).isEmpty)
  }

  test("taintedJson emits a JSON string array") {
    assert(Bench.taintedJson(Nil) == "[]")
    assert(Bench.taintedJson(Seq("scan", "spin")) == """["scan","spin"]""")
    assert(parses(Bench.taintedJson(Seq("scan"))).get(0).asText() == "scan")
  }

  // ---- the two-line stdout contract ----

  /** A main line built from the REAL headline set with worst-plausible
    * field widths (two-digit seconds per query, every calib leg tainted).
    */
  private def realisticMainLine: String = {
    val qs = Bench.headline.map(n => s""""$n":99.999""").mkString("{", ",", "}")
    val calib = ""","calib":{"spin":99.999,"shuffle":99.999,"scan":99.999}"""
    Bench.buildMainLine(9999.999, """["scan","shuffle","spin"]""", calib, qs,
      "/root/testdata/sf0.1")
  }

  /** A probes line at the width the full probe set produces (12 scale
    * entries in [t1,tN,ratio] array form, the spill leg's two byte
    * counts, the six exchange cuts) — values at worst-plausible widths.
    */
  private def realisticProbesLine: String = {
    val scaleNames = Seq("q_join_inner", "q_dedup_lsh_pairs", "q_sim_kmeans",
      "q_graph_pagerank", "q_sim_covariance", "q_join_star",
      "q_join_asof_native", "q_join_interval_keyed_native", "q_dedup_cc",
      "skew_join_salted", "skew_join_unsalted")
    val scale = scaleNames.map(n => s""""$n":[99.999,99.999,99.99]""") :+
      s""""interval_spill_forced":[99.999,99.999,99.99,1234567890,12345678901]"""
    s"""{"graft_probes":true,"scale_probe":{"factor":10,"queries":{${scale.mkString(",")}}},""" +
      s""""exchange_probe":{"factor":10,"bloom_cut":99.99,"superstep_checkpoint_cut":99.99,""" +
      s""""skew_balance":99.99,"lsh_band_cut":9999.9,"pagerank_contrib_cut":9999.9,""" +
      s""""pagerank_hub_growth":99.99}}"""
  }

  test("main line: parses as JSON, carries the required keys, main-guard headroom >= 300") {
    val m = realisticMainLine
    val j = parses(m)
    assert(j.get("metric").asText() == "total")
    assert(j.get("tainted").isArray)
    assert(j.get("queries").size() == Bench.headline.size)
    assert(j.get("calib").has("scan"))
    // r13 verdict task 2's done bar: the line that must never truncate
    // keeps >= 300 chars of headroom under its guard even at worst widths
    assert(m.length <= Bench.MainLineGuard - 300,
      s"main line ${m.length} chars leaves under 300 headroom vs guard " +
        s"${Bench.MainLineGuard} - trim the headline precision or restructure")
  }

  test("probes + main pair fits the tail-capture budget at worst widths") {
    val p = realisticProbesLine
    val m = realisticMainLine
    parses(p)
    assert(p.length + m.length + 2 <= Bench.StdoutBudget,
      s"pair ${p.length}+${m.length} outgrows ${Bench.StdoutBudget} - a " +
        "2000-char tail window would clip the probes line head")
    assert(Bench.assembleStdout(p, m) == Seq(p, m), "within budget the pair passes through")
  }

  test("over-budget pair degrades the probes line to an explicit pointer, main intact and LAST") {
    val m = realisticMainLine
    val fat = "{\"graft_probes\":true,\"pad\":\"" + "x" * 2500 + "\"}"
    val out = Bench.assembleStdout(fat, m)
    assert(out.size == 2 && out.last == m, "main record must survive unchanged as the final line")
    val degraded = parses(out.head)
    assert(degraded.get("graft_probes").asBoolean())
    assert(degraded.get("see").asText().contains("bench.json"),
      "degradation must be explicit in-band, never a silent drop")
    assert(out.head.length + m.length + 2 <= Bench.StdoutBudget)
  }
}
