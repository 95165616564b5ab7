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
}

/** Union of all capability catalogs — what SparkEntry exposes to the driver. */
object AllQueries {
  private def catalogs: Seq[Catalog] =
    Seq(Relational, Joins, Windows, SetOps, ScalarFns, PipelineQueries, TextQueries, SimilarityQueries, MultimodalQueries, Extended, ScalarFns2, Analytics)

  def all: Map[String, Q] = catalogs.flatMap(_.queries).toMap
}
