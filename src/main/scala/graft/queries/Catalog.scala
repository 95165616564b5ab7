package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame

/** One declared engine capability: a Spark plan over the testdata tables and,
  * where SQL-expressible, the equivalent DuckDB oracle query (SURVEY.md §2C).
  *
  * Determinism contract (BASELINE.md / FIXTURES.md §4): every query ends with
  * a total ORDER BY over its output columns, floating aggregates are
  * ROUND(x, 2), timestamps leave the plan as formatted strings, and oracle
  * ORDER BY always spells NULLS FIRST (DuckDB defaults to NULLS LAST while
  * Spark defaults to NULLS FIRST).
  */
final case class Q(run: Tables => DataFrame, oracle: Option[String])

trait Catalog {
  def queries: Map[String, Q]

  /** Oracle-parity rounding. Spark's `functions.round` rounds the EXACT
    * decimal expansion of the double (BigDecimal HALF_UP: 2.675d → 2.67,
    * because 2.675d = 2.67499…), while DuckDB computes
    * round(x·10^s)/10^s (2.675d → 2.68). On boundary values the two differ
    * by one ulp-of-cents and break hash equality, so every catalog query
    * rounds the DuckDB way. This method is INHERITED by catalog objects and
    * therefore shadows the wildcard-imported `functions.round` (inherited
    * bindings outrank wildcard imports in Scala).
    */
  protected def round(c: org.apache.spark.sql.Column, scale: Int): org.apache.spark.sql.Column = {
    val p = math.pow(10, scale)
    org.apache.spark.sql.functions.round(c * p) / p
  }

  /** Order-independent exact sum of a 2-dp "money" double (all testdata
    * money columns are exact 2-decimal values): round to integer CENTS,
    * sum as long (exact, associative, whole-stage-codegen-friendly —
    * ~3× faster than a decimal sum, measured), divide back once.
    * GroupBy partial-aggregate merge order is nondeterministic on BOTH
    * engines (task/thread completion order), so a plain double sum can flip
    * its last bit between runs and break exact hash comparison — the
    * q_win_sessionize round-1 driver mismatch. Window running sums don't
    * need this: their summation order is defined by ORDER BY.
    * Scale bound: int64 cents overflow at 9.2e16 money units per group —
    * ~3× headroom over a single-group sum of 100 TB of lineitem prices;
    * beyond that, switch to the DECIMAL form in [[psum]].
    * Oracle equivalent:
    * `CAST(SUM(CAST(round(x * 100) AS BIGINT)) AS DOUBLE) / 100.0`.
    */
  protected def msum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.sum(
      org.apache.spark.sql.functions.round(c * 100).cast("long")) / 100.0

  /** Deterministic mean of a money double: exact cents sum, then double
    * divisions in a fixed order — bit-identical across engines, runs, and
    * parallelism. Oracle: `CAST(SUM(CAST(round(x * 100) AS BIGINT)) AS
    * DOUBLE) / 100.0 / COUNT(x)`.
    */
  protected def mavg(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    msum(c) / org.apache.spark.sql.functions.count(c)

  /** Order-independent sum of a double EXPRESSION whose exact value has ≤6
    * decimals (e.g. products of 2-dp money columns: price·(1−disc) is
    * exactly 4-dp). The double result sits within ~1e-9 of the exact
    * decimal, so the cast to DECIMAL(22,6) rounds identically on both
    * engines, and the decimal sum is exact.
    * Oracle: `CAST(SUM(CAST(expr AS DECIMAL(22,6))) AS DOUBLE)`.
    */
  protected def psum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.sum(c.cast("decimal(22,6)")).cast("double")

  /** Exact integer cents of a FULL-PRECISION double (events.value — NOT a
    * 2-dp money column): floor(x·100 + 0.5), a fixed sequence of
    * exactly-specified IEEE 754 ops (multiply, add, floor), so Spark and
    * ANY DuckDB version agree bit-for-bit — including when x·100 lands
    * exactly on a .5 boundary (x = k + 1/8, …), where HALF_UP and
    * half-even round() implementations disagree (the q_win_sessionize
    * round-1/2 driver hash mismatch: local DuckDB agreed, the driver's
    * version didn't). Queries over full-precision doubles keep the result
    * as BIGINT end-to-end — integers hash identically under any engine.
    * (msum's round() stays correct for the 2-dp money columns: their
    * cents-scaled values sit within ~1e-11 of an integer and can never
    * reach a .5 boundary.)
    * Oracle equivalent: `CAST(floor(x * 100 + 0.5) AS BIGINT)`.
    */
  protected def cents(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.floor(c * 100 + 0.5)
}

/** Union of all capability catalogs — what SparkEntry exposes to the driver. */
object AllQueries {
  private def catalogs: Seq[Catalog] =
    Seq(Relational, Joins, Windows, SetOps, ScalarFns, PipelineQueries, TextQueries, SimilarityQueries, MultimodalQueries, Extended, ScalarFns2, Analytics, SamplingQueries, Subqueries, CurationQueries, GraphQueries, ProfileQueries, LayoutQueries, TpchAnchors, StatsQueries, Spark4Queries)

  def all: Map[String, Q] = catalogs.flatMap(_.queries).toMap
}
