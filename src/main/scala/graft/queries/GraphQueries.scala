package graft.queries

import graft.operators.PageRank
import org.apache.spark.sql.functions._

/** Graph analytics over relations the engine already holds — the iterative
  * sibling of [[graft.operators.ConnectedComponents]]. The testdata graph is
  * the order–part bipartite graph implied by `lineitem` (node id encoding:
  * orderkey·2 / partkey·2+1 keeps the two key spaces disjoint), symmetrized
  * for an undirected walk. The oracle unrolls the fixed iteration count as
  * a CTE chain — exact because [[PageRank]]'s recurrence is pure BIGINT
  * arithmetic.
  */
object GraphQueries extends Catalog {

  def queries: Map[String, Q] = Map(

    "q_graph_pagerank" -> Q(
      t => {
        val fwd = t.lineitem.select(
          (col("l_orderkey") * 2).as("src"),
          (col("l_partkey") * 2 + 1).as("dst"))
        val edges = fwd
          .union(fwd.select(col("dst").as("src"), col("src").as("dst")))
          .distinct()
        PageRank.run(edges, iters = 3)
          .orderBy(col("pr").desc, col("node"))
          .limit(100)
      },
      Some("""WITH edges AS (
             |  SELECT l_orderkey * 2 AS src, l_partkey * 2 + 1 AS dst FROM lineitem
             |  UNION
             |  SELECT l_partkey * 2 + 1, l_orderkey * 2 FROM lineitem
             |), deg AS (
             |  SELECT src, COUNT(*) AS deg FROM edges GROUP BY src
             |), r0 AS (
             |  SELECT src AS node, CAST(1000000 AS BIGINT) AS pr FROM deg
             |), it1 AS (
             |  SELECT e.dst AS node,
             |         CAST(150000 + (850 * SUM(r.pr // d.deg)) // 1000 AS BIGINT) AS pr
             |  FROM edges e JOIN deg d ON e.src = d.src JOIN r0 r ON e.src = r.node
             |  GROUP BY e.dst
             |), it2 AS (
             |  SELECT e.dst AS node,
             |         CAST(150000 + (850 * SUM(r.pr // d.deg)) // 1000 AS BIGINT) AS pr
             |  FROM edges e JOIN deg d ON e.src = d.src JOIN it1 r ON e.src = r.node
             |  GROUP BY e.dst
             |), it3 AS (
             |  SELECT e.dst AS node,
             |         CAST(150000 + (850 * SUM(r.pr // d.deg)) // 1000 AS BIGINT) AS pr
             |  FROM edges e JOIN deg d ON e.src = d.src JOIN it2 r ON e.src = r.node
             |  GROUP BY e.dst
             |)
             |SELECT node, pr FROM it3
             |ORDER BY pr DESC NULLS FIRST, node NULLS FIRST
             |LIMIT 100""".stripMargin)))
}
