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

  // ---- contention-resilient sealing (r14 verdict task 1) ----

  test("boundaryTainted: MIN estimator — one quiet sample clears the leg") {
    val refs = Map("spin" -> 0.4, "shuffle" -> 0.4, "scan" -> 0.2)
    // one inflated + one quiet shuffle sample: min 0.35 < 0.5 -> clean
    assert(Bench.boundaryTainted(Map("spin" -> Seq(0.41),
      "shuffle" -> Seq(0.9, 0.35), "scan" -> Seq(0.15, 0.16)), refs).isEmpty)
    // every sample inflated -> tainted; exactly-at-threshold trips (>= rule)
    assert(Bench.boundaryTainted(Map("spin" -> Seq(0.5),
      "shuffle" -> Seq(0.9, 0.8), "scan" -> Seq(0.15, 0.16)), refs) ==
      Seq("shuffle", "spin"))
    // a leg with no sample is not a clean leg
    assert(Bench.boundaryTainted(Map("spin" -> Seq(0.41),
      "shuffle" -> Seq.empty, "scan" -> Seq(0.15)), refs) == Seq("shuffle"))
  }

  test("dirtyChunks: a chunk is dirty when EITHER surrounding boundary trips") {
    val refs = Map("scan" -> 0.2)
    val clean = Map("scan" -> Seq(0.15))
    val hot = Map("scan" -> Seq(0.4))
    // boundaries b0..b3 around chunks 0..2: hot b1 dirties chunks 0 AND 1
    assert(Bench.dirtyChunks(Seq(clean, hot, clean, clean), 3, refs) == Set(0, 1))
    assert(Bench.dirtyChunks(Seq(clean, clean, clean, hot), 3, refs) == Set(2))
    assert(Bench.dirtyChunks(Seq(clean, clean, clean, clean), 3, refs).isEmpty)
  }

  test("compositeClean: clean chunks keep first-pass, dirty+retried take the retry, dirty unretried list unclean") {
    val first = Seq("a" -> 1.0, "b" -> 2.0, "c" -> 3.0, "d" -> 4.0)
    val chunkOf = Map("a" -> 0, "b" -> 0, "c" -> 1, "d" -> 2)
    val (pq, unclean) = Bench.compositeClean(first, chunkOf,
      dirty = Set(0, 2), retriedClean = Map("a" -> 0.9, "b" -> 1.8))
    assert(pq == Seq("a" -> 0.9, "b" -> 1.8, "c" -> 3.0, "d" -> 4.0),
      s"per-query composite wrong: $pq")
    // d's chunk never got a clean pass: first-pass value retained, name listed
    assert(unclean == Seq("d"))
  }

  test("compositeJson: parses, counts exact, inline detail clipped with an explicit flag") {
    val pq = (1 to 10).map(i => s"q$i" -> 1.0)
    val rq = (1 to 7).map(i => s"q$i" -> 0.9).toMap
    val un = (8 to 10).map(i => s"q$i")
    val j = parses("{" + Bench.compositeJson(pq, rq, un) + "}")
      .get("composite_clean")
    // total is over the per-query composite values as handed in (the
    // substitution happened in compositeClean)
    assert(math.abs(j.get("total").asDouble() - 10.0) < 1e-6)
    assert(j.get("requeried_n").asInt() == 7 && j.get("unclean_n").asInt() == 3)
    assert(j.get("requeried").size() == Bench.CompositeInlineMax,
      "inline requeried must clip at the cap")
    assert(j.get("truncated").asBoolean(), "clipping must be flagged in-band")
    // the clean-window case: no clipping, no flag, empty detail
    val jc = parses("{" + Bench.compositeJson(pq, Map.empty, Seq.empty) + "}")
      .get("composite_clean")
    assert(jc.get("requeried_n").asInt() == 0 && !jc.has("truncated"))
  }

  test("compositeJson names form: COMPLETE name lists, values deferred and flagged") {
    val pq = (1 to 10).map(i => s"q$i" -> 1.0)
    val rq = (1 to 7).map(i => s"q$i" -> 0.9).toMap
    val un = (8 to 10).map(i => s"q$i")
    val j = parses("{" + Bench.compositeJson(pq, rq, un, detail = "names") + "}")
      .get("composite_clean")
    // the self-containedness contract (r16 verdict task 3): EVERY
    // requeried and unclean name inline, no clip, whatever the count
    assert(j.get("requeried_names").size() == 7
      && (0 until 7).forall(i => j.get("requeried_names").get(i).asText() == s"q${i + 1}"),
      "names form must carry the complete requeried list")
    assert(j.get("unclean").size() == 3)
    assert(!j.has("requeried"), "names form carries no values")
    // the stage is marked structurally (the requeried_names key), not by a
    // flag, and an empty unclean list is omitted (unclean_n already says 0)
    assert(!j.has("truncated"))
    val jc = parses("{" + Bench.compositeJson(pq, rq, Seq.empty, detail = "names") + "}")
      .get("composite_clean")
    assert(!jc.has("unclean") && jc.get("unclean_n").asInt() == 0
      && jc.get("requeried_names").size() == 7)
  }

  /** A main line built from the REAL headline set with worst-plausible
    * field widths (two-digit seconds per query, every calib leg tainted).
    */
  private def realisticMainLine: String = {
    val qs = Bench.headline.map(n => s""""$n":99.99""").mkString("{", ",", "}")
    val calib = ""","calib":{"spin":99.999,"shuffle":99.999,"scan":99.999}"""
    // worst-plausible composite: every chunk dirty, the inline cap worth
    // of re-queried entries AND unclean names (longest headline names),
    // truncation flagged
    val longest = Bench.headline.sortBy(-_.length)
    val composite = Bench.compositeJson(
      Bench.headline.map(_ -> 99.999),
      longest.take(Bench.CompositeInlineMax + 3).map(_ -> 99.999).toMap,
      longest.take(Bench.CompositeInlineMax + 3))
    val taskMs = Bench.headline.map(_ => "99999").mkString("[", ",", "]")
    Bench.buildMainLine(9999.999, """["scan","shuffle","spin"]""", calib, qs,
      composite, "/root/testdata/sf0.1", cpus = "32", taskMsArr = taskMs)
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
    val scale = scaleNames.map(n => s""""$n":[99.99,99.99,99.99]""") :+
      s""""interval_spill_forced":[99.99,99.99,99.99,1234567890,12345678901]"""
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
    assert(j.get("composite_clean").has("total"),
      "the adjudicated composite must ride the main line (r14 verdict task 1)")
    // r13 verdict task 2's done bar, re-based r19: the cpus + task_ms
    // additions (verdict task 2 — the scaling-contract evidence) cost
    // ~200 chars at worst widths, so the pinned headroom drops 300 -> 150;
    // the guard itself (1800) and the driver's 2000-char tail window are
    // unchanged, and realistic lines sit near 1400.
    assert(m.length <= Bench.MainLineGuard - 150,
      s"main line ${m.length} chars leaves under 150 headroom vs guard " +
        s"${Bench.MainLineGuard} - trim the headline precision or restructure")
  }

  /** The counts-only fallback of [[realisticMainLine]] (same worst
    * widths, composite detail degraded to exact counts + truncation flag).
    */
  private def realisticMainLineCounts: String = {
    val qs = Bench.headline.map(n => s""""$n":99.99""").mkString("{", ",", "}")
    val calib = ""","calib":{"spin":99.999,"shuffle":99.999,"scan":99.999}"""
    val longest = Bench.headline.sortBy(-_.length)
    val composite = Bench.compositeJson(
      Bench.headline.map(_ -> 99.999),
      longest.take(Bench.CompositeInlineMax + 3).map(_ -> 99.999).toMap,
      longest.take(Bench.CompositeInlineMax + 3), detail = "counts")
    val taskMs = Bench.headline.map(_ => "99999").mkString("[", ",", "]")
    Bench.buildMainLine(9999.999, """["scan","shuffle","spin"]""", calib, qs,
      composite, "/root/testdata/sf0.1", cpus = "32", taskMsArr = taskMs)
  }

  /** The names-stage variant of [[realisticMainLine]] (same worst widths,
    * composite degraded to the complete name lists).
    */
  private def realisticMainLineNames(nRequeried: Int,
      nUnclean: Int = 0): String = {
    val qs = Bench.headline.map(n => s""""$n":99.99""").mkString("{", ",", "}")
    val calib = ""","calib":{"spin":99.999,"shuffle":99.999,"scan":99.999}"""
    val longest = Bench.headline.sortBy(-_.length)
    val composite = Bench.compositeJson(
      Bench.headline.map(_ -> 99.999),
      longest.take(nRequeried).map(_ -> 99.999).toMap,
      longest.take(nUnclean), detail = "names")
    val taskMs = Bench.headline.map(_ => "99999").mkString("[", ",", "]")
    Bench.buildMainLine(9999.999, """["scan","shuffle","spin"]""", calib, qs,
      composite, "/root/testdata/sf0.1", cpus = "32", taskMsArr = taskMs)
  }

  test("worst widths: the name list survives via the probes pointer; counts is the true last resort") {
    val p = realisticProbesLine
    val mDetail = realisticMainLine
    val mNames = realisticMainLineNames(Bench.CompositeInlineMax + 3)
    val mCounts = realisticMainLineCounts
    parses(p)
    val jc = parses(mCounts)
    // the counts fallback still carries the adjudicated numbers and flags
    // the dropped detail in-band
    assert(jc.get("composite_clean").has("total")
      && jc.get("composite_clean").get("truncated").asBoolean())
    // since r19's cpus+task_ms additions the full-probes+counts pair no
    // longer fits at worst widths; the ladder's floor — the probes
    // POINTER beside the counts main — must always fit
    assert(Bench.ProbesPointer.length + mCounts.length + 2 <= Bench.StdoutBudget,
      s"floor pair ${Bench.ProbesPointer.length}+${mCounts.length} outgrows " +
        s"${Bench.StdoutBudget} - a 2000-char tail window would clip it")
    // ladder at worst widths (7 LONGEST-name requeries + 7 longest
    // unclean): detail and names both outgrow the pair against the full
    // probes line, so the PROBES degrade to the pointer and the complete
    // name list ships - the names are the round-specific forensics, the
    // probes are round-stable and always in target/bench.json
    val out = Bench.assembleStdout(p, mDetail, mNames, mCounts)
    assert(out == Seq(Bench.ProbesPointer, mNames),
      s"expected (pointer, names); got lengths ${out.map(_.length)}")
    assert(parses(out.last).get("composite_clean").get("requeried_names").size()
      == Bench.CompositeInlineMax + 3)
    // the counts stage is reachable: a name list too long even for the
    // pointer pair (every headline query requeried, worst widths) falls
    // back to counts — paired with the pointer at r19 widths (the
    // full-probes+counts pair no longer fits at worst widths)
    val mNamesHuge = realisticMainLineNames(Bench.headline.size, Bench.headline.size)
    assert(Bench.ProbesPointer.length + mNamesHuge.length + 2 > Bench.StdoutBudget,
      "fixture no longer exercises the counts stage - lengthen the name list")
    val out2 = Bench.assembleStdout(p, mDetail, mNamesHuge, mCounts)
    assert(out2 == Seq(Bench.ProbesPointer, mCounts),
      s"expected the counts last resort beside the pointer; got lengths ${out2.map(_.length)}")
  }

  /** [[realisticMainLineNames]] with MEDIAN-length headline names — the
    * realistic retry mix (a dirty window requeues whatever chunk was
    * dirty, not adversarially the longest-named queries).
    */
  private def realisticMainLineNamesMedian(nRequeried: Int): String = {
    val qs = Bench.headline.map(n => s""""$n":99.99""").mkString("{", ",", "}")
    val calib = ""","calib":{"spin":99.999,"shuffle":99.999,"scan":99.999}"""
    val byLen = Bench.headline.sortBy(_.length)
    val median = byLen.slice((byLen.size - nRequeried) / 2,
      (byLen.size - nRequeried) / 2 + nRequeried)
    val composite = Bench.compositeJson(
      Bench.headline.map(_ -> 99.999),
      median.map(_ -> 99.999).toMap, Seq.empty, detail = "names")
    val taskMs = Bench.headline.map(_ => "99999").mkString("[", ",", "]")
    Bench.buildMainLine(9999.999, """["scan","shuffle","spin"]""", calib, qs,
      composite, "/root/testdata/sf0.1", cpus = "32", taskMsArr = taskMs)
  }

  test("an r16-shaped retry load (6 requeried) ships the COMPLETE name list inline") {
    // The regression this ladder exists for: r16's sealed line said only
    // "requeried_n":6,"truncated":true - the names lived in
    // target/bench.json. At the same load, the final main line must now
    // carry every requeried name, whichever probes form pairs with it.
    val p = realisticProbesLine
    val mDetail = realisticMainLine
    val mNames = realisticMainLineNamesMedian(6)
    val mCounts = realisticMainLineCounts
    val out = Bench.assembleStdout(p, mDetail, mNames, mCounts)
    assert(out.last == mNames,
      s"expected the names-bearing main; got lengths ${out.map(_.length)}")
    val names = parses(out.last).get("composite_clean").get("requeried_names")
    assert(names.size() == 6, s"name list clipped: $names")
    // and at the REAL value widths every round has produced (sub-10s
    // per-query medians, sub-5-digit task ms): since r19's cpus+task_ms
    // additions this retry load tips the full-probes pair over budget, so
    // the probes degrade to their pointer — the COMPLETE name list (the
    // regression this ladder exists for) still ships on the final line
    val realQs = Bench.headline.map(n => s""""$n":9.99""").mkString("{", ",", "}")
    val calib = ""","calib":{"spin":0.439,"shuffle":0.700,"scan":0.527}"""
    val byLen = Bench.headline.sortBy(_.length)
    val median6 = byLen.slice((byLen.size - 6) / 2, (byLen.size - 6) / 2 + 6)
    val realTaskMs = Bench.headline.map(_ => "1234").mkString("[", ",", "]")
    val realNames = Bench.buildMainLine(99.999, """["scan","shuffle"]""", calib,
      realQs, Bench.compositeJson(Bench.headline.map(_ -> 9.999),
        median6.map(_ -> 9.999).toMap, Seq.empty, detail = "names"),
      "/root/testdata/sf0.1", cpus = "32", taskMsArr = realTaskMs)
    val realProbes = realisticProbesLine.replace("99.99,99.99", "9.99,9.99")
    val outReal = Bench.assembleStdout(realProbes, realisticMainLine, realNames, mCounts)
    assert(outReal.last == realNames && outReal.map(_.length).sum + 2 <= Bench.StdoutBudget,
      s"at real widths the names main must ship inside the budget: " +
        s"lengths ${outReal.map(_.length)} vs ${Bench.StdoutBudget}")
    assert(parses(outReal.last).get("composite_clean").get("requeried_names").size() == 6)
  }

  test("a clean window's pair (empty composite detail) passes through the detailed stage") {
    val qs = Bench.headline.map(n => s""""$n":99.99""").mkString("{", ",", "}")
    val calib = ""","calib":{"spin":99.999,"shuffle":99.999,"scan":99.999}"""
    val composite = Bench.compositeJson(Bench.headline.map(_ -> 99.999), Map.empty, Seq.empty)
    val m = Bench.buildMainLine(9999.999, "[]", calib, qs, composite, "/root/testdata/sf0.1")
    val p = realisticProbesLine
    assert(Bench.assembleStdout(p, m, m, m) == Seq(p, m),
      "a clean window must ship the full pair with the (empty) composite detail inline")
  }

  test("a fat probes line degrades to the pointer; the names main survives beside it") {
    val fat = "{\"graft_probes\":true,\"pad\":\"" + "x" * 2500 + "\"}"
    val mDetail = realisticMainLine
    val mNames = realisticMainLineNames(Bench.CompositeInlineMax + 3)
    val mCounts = realisticMainLineCounts
    val out = Bench.assembleStdout(fat, mDetail, mNames, mCounts)
    assert(out == Seq(Bench.ProbesPointer, mNames),
      s"expected (pointer, names); got lengths ${out.map(_.length)}")
    assert(parses(out.head).get("graft_probes").asBoolean())
    assert(out.head.length + out.last.length + 2 <= Bench.StdoutBudget,
      s"pair ${out.map(_.length)} still outgrows ${Bench.StdoutBudget}")
  }

  test("last stage pairs the pointer with the COUNTS-only main, never a fatter one") {
    // r15 ADVICE lineage: when even the pointer cannot rescue the names
    // (every headline requeried at worst widths) AND the probes line is
    // fat, the final pair must be the strictly smallest: (pointer, counts).
    val fat = "{\"graft_probes\":true,\"pad\":\"" + "x" * 2500 + "\"}"
    val mDetail = realisticMainLine
    val mNamesHuge = realisticMainLineNames(Bench.headline.size, Bench.headline.size)
    val mCounts = realisticMainLineCounts
    val out = Bench.assembleStdout(fat, mDetail, mNamesHuge, mCounts)
    assert(out == Seq(Bench.ProbesPointer, mCounts),
      s"the last stage must be (pointer, counts); got lengths ${out.map(_.length)}")
    assert(out.head.length + out.last.length + 2 <= Bench.StdoutBudget,
      s"last-stage pair ${out.map(_.length)} still outgrows ${Bench.StdoutBudget}")
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
