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
}

/** Union of all capability catalogs — what SparkEntry exposes to the driver. */
object AllQueries {
  private def catalogs: Seq[Catalog] = Seq(Relational, Joins)

  def all: Map[String, Q] = catalogs.flatMap(_.queries).toMap
}
