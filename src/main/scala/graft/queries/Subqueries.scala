package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame

/** SQL subquery surface (SURVEY.md §2C relational rows): correlated scalar
  * subqueries, IN / NOT IN, and EXISTS / NOT EXISTS — the query forms an
  * analyst migrating from the reference's SQL front door writes directly.
  *
  * These run through `spark.sql` over temp views on purpose: the engine
  * capability under test is Catalyst's subquery DECORRELATION
  * (RewriteCorrelatedScalarSubquery, RewritePredicateSubquery), which turns
  * each form into the join the DataFrame catalogs spell by hand — scalar
  * subqueries become aggregate-plus-join, IN becomes a left-semi join,
  * NOT IN a null-aware anti join, EXISTS/NOT EXISTS plain semi/anti joins.
  * At 100 TB the rewritten plans are ordinary shuffle joins: nothing here
  * executes per-row.
  *
  * Dialect note: each query is ONE SQL string executed verbatim by both
  * Spark and the DuckDB oracle (views carry the parquet table names), so
  * any engine-specific spelling would fail one side — the strings stay in
  * the common dialect by construction. Numeric guards follow the catalog's
  * exact-cents discipline: money comparisons multiply through by the count
  * instead of dividing (integer-only math, no float boundary risk — see
  * [[Catalog.msum]]).
  */
object Subqueries extends Catalog {

  /** Register the tables a query touches under their canonical names so the
    * identical SQL text runs on Spark (temp views) and DuckDB (parquet
    * views created by the checker/driver).
    */
  private def sql(t: Tables, names: Seq[String], query: String): DataFrame = {
    names.foreach {
      case n @ "part"     => t.part.createOrReplaceTempView(n)
      case n @ "orders"   => t.orders.createOrReplaceTempView(n)
      case n @ "customer" => t.customer.createOrReplaceTempView(n)
      case n @ "lineitem" => t.lineitem.createOrReplaceTempView(n)
      case n @ "supplier" => t.supplier.createOrReplaceTempView(n)
      case n @ "nation"   => t.nation.createOrReplaceTempView(n)
      case n => throw new IllegalArgumentException(s"unregistered table $n")
    }
    t.spark.sql(query)
  }

  /** Parts priced above 1.005× their brand's average retail price — two
    * correlated scalar subqueries (COUNT and exact-cents SUM) so the
    * comparison is pure int64: cents·n·1000 > 1005·sum_cents ⟺
    * price > 1.005·avg. Catalyst decorrelates both into one aggregate join
    * per subquery; DuckDB plans the same shape. The margin must stay under
    * the price spread: p_retailprice spans [900, 920) at sf0.001 (max/avg ≈
    * 1.011) and [900, 1000) at larger sfs, so 1.02× matches NOTHING at the
    * smallest sf while 1.005× stays non-vacuous at every testdata scale.
    */
  private val scalarSql =
    """SELECT p_partkey, p_brand, p_retailprice
      |FROM part p
      |WHERE CAST(round(p_retailprice * 100) AS BIGINT)
      |      * (SELECT COUNT(*) FROM part p2 WHERE p2.p_brand = p.p_brand)
      |      * 1000 >
      |      (SELECT SUM(CAST(round(p3.p_retailprice * 100) AS BIGINT))
      |       FROM part p3 WHERE p3.p_brand = p.p_brand) * 1005
      |ORDER BY p_partkey NULLS FIRST, p_brand NULLS FIRST,
      |         p_retailprice NULLS FIRST""".stripMargin

  /** High-balance customers' orders that ship no near-full-quantity line:
    * IN → left-semi join; NOT IN → null-aware anti join (l_orderkey is
    * non-null here, but the plan must still prove it).
    */
  private val inSql =
    """SELECT o_orderkey, o_custkey
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0)
      |  AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49.5)
      |ORDER BY o_orderkey NULLS FIRST, o_custkey NULLS FIRST""".stripMargin

  /** Suppliers with at least one max-quantity deep-discount line and no
    * min-quantity max-tax deep-discount line — correlated EXISTS (semi
    * join) and NOT EXISTS (anti join). Rare-event predicates keep both
    * branches non-vacuous at every testdata sf (~600 lines per supplier
    * at any TPC-H-proportioned scale).
    */
  private val existsSql =
    """SELECT s_suppkey, s_name
      |FROM supplier s
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_suppkey = s.s_suppkey
      |                AND l.l_quantity >= 49.5 AND l.l_discount >= 0.095)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l2
      |                  WHERE l2.l_suppkey = s.s_suppkey
      |                    AND l2.l_quantity <= 1.5 AND l2.l_tax >= 0.075
      |                    AND l2.l_discount >= 0.085)
      |ORDER BY s_suppkey NULLS FIRST, s_name NULLS FIRST""".stripMargin

  /** Correlated LATERAL derived table — per-nation supplier rollup where
    * the subquery references the outer row. Catalyst plans the aggregate
    * lateral as a decorrelated aggregate + left outer join (a nation with
    * no suppliers still yields one row: NULL max, 0 count — DuckDB
    * agrees); MAX of doubles and COUNT are order-independent, so no
    * rounding contract is needed.
    */
  private val lateralSql =
    """SELECT n_name, t.top_bal, t.n_supp
      |FROM nation, LATERAL (
      |  SELECT MAX(s_acctbal) AS top_bal, COUNT(*) AS n_supp
      |  FROM supplier WHERE s_nationkey = n_nationkey) t
      |ORDER BY n_name NULLS FIRST, top_bal NULLS FIRST, n_supp NULLS FIRST""".stripMargin

  def queries: Map[String, Q] = Map(
    "q_subquery_scalar" -> Q(t => sql(t, Seq("part"), scalarSql), Some(scalarSql)),
    "q_subquery_in" -> Q(
      t => sql(t, Seq("orders", "customer", "lineitem"), inSql), Some(inSql)),
    "q_subquery_exists" -> Q(
      t => sql(t, Seq("supplier", "lineitem"), existsSql), Some(existsSql)),
    "q_join_lateral" -> Q(
      t => sql(t, Seq("nation", "supplier"), lateralSql), Some(lateralSql)))
}
