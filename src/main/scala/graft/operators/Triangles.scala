package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting by degree orientation (Suri &
  * Vassilvitskii, WWW'11 — "Counting Triangles and the Curse of the Last
  * Reducer"). Orient every undirected edge from its lower-(degree, id)
  * endpoint to the higher, enumerate wedges only at each oriented edge's
  * SOURCE, and close them against the oriented edge set.
  *
  * Why this shape at 100 TB: orientation bounds every node's out-degree by
  * O(√m), so the wedge set — the only superlinear intermediate — is
  * O(m^1.5) worst-case instead of Σ deg² of the naive node-pivot plan.
  * The celebrity node that would otherwise pivot its full Θ(deg²)
  * neighborhood in one reducer (the titular last reducer) instead only
  * SOURCES wedges among its few higher-degree peers; its mass market of
  * low-degree neighbors each pivot toward it instead. Every triangle is
  * produced exactly once: of its three oriented edges, precisely one pair
  * shares a source, and the third closes that wedge.
  *
  * Plan: `edges` and `oe` are eagerly localCheckpointed — each feeds ≥2
  * plan arms (edges → degree + orientation; oe → wedge pivot ×2 + closing
  * probe) and both are O(m), far smaller than the wedge stream they seed.
  * The degree join is O(nodes)-vs-O(edges): AQE broadcasts the degree side
  * at gated scale and degrades to a hash join at 100 TB.
  */
object Triangles {

  /** `edges`: undirected, deduplicated, (u, v) with u < v, both Long.
    * Returns (a, b, c): one row per triangle, corners in oriented order
    * (a's (deg,id) lowest — NOT necessarily id-sorted).
    */
  def enumerate(edges: DataFrame): DataFrame = {
    val e = edges.select(col("u"), col("v")).localCheckpoint(true)
    val deg = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    val lower = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    // s-partitioned checkpoint (Checkpoints.partitioned — bare checkpoints
    // record UnknownPartitioning under AQE, see Checkpoints scaladoc): the
    // wedge join below is oe⋈oe on s === s2, and alias-aware partitioning
    // propagation makes BOTH sides reuse the recorded hash — two of the
    // triple self-join's six potential exchanges removed; the closing
    // (t, t2) join legitimately re-keys and keeps its own
    val oe = Checkpoints.partitioned(e
      .join(deg.select(col("node").as("nu"), col("d").as("du")), col("u") === col("nu"))
      .join(deg.select(col("node").as("nv"), col("d").as("dv")), col("v") === col("nv"))
      .select(when(lower, col("u")).otherwise(col("v")).as("s"),
        when(lower, col("v")).otherwise(col("u")).as("t")),
      col("s"))
    oe
      .join(oe.select(col("s").as("s2"), col("t").as("t2")),
        col("s") === col("s2") && col("t") =!= col("t2"))
      .join(oe.select(col("s").as("s3"), col("t").as("t3")),
        col("t") === col("s3") && col("t2") === col("t3"))
      .select(col("s").as("a"), col("t").as("b"), col("t2").as("c"))
  }

  /** Per-node triangle participation count — the local clustering-
    * coefficient numerator. Exact BIGINTs; nodes in no triangle are absent.
    */
  def perNodeCounts(edges: DataFrame): DataFrame = {
    val tri = enumerate(edges)
    tri.select(col("a").as("node"))
      .unionAll(tri.select(col("b").as("node")))
      .unionAll(tri.select(col("c").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }
}
