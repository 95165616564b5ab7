package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list — the
  * clustering stage of a dedup pipeline: near-dup PAIRS (MinHash-LSH,
  * SimHash, embedding-LSH — see [[Dedup]], [[Similarity]]) become CLUSTERS,
  * and cluster canonicalization ("keep the min-id document per component")
  * is what actually shrinks a corpus.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", ACM SoCC 2014) — the
  * standard shuffle-native formulation:
  *
  *  - large-star: every node connects each LARGER neighbor to the minimum
  *    of its neighborhood (incl. itself);
  *  - small-star: every node connects its smaller neighbors (and itself)
  *    to the minimum of them.
  *
  * Both steps preserve connectivity, never grow the edge multiset beyond
  * the input size, and converge in O(log n) rounds to per-component stars
  * centered at the component's minimum id. Each round is two hash shuffles
  * (one per star: a windowed per-neighborhood min) over the CURRENT edge set, which shrinks
  * monotonically toward one edge per non-root node — at 100 TB this is the
  * shape you want: no driver-side union-find, no whole-graph broadcast,
  * and skew on a popular root is one hot key in a groupBy-min (mergeable,
  * AQE-splittable), not a cross product.
  *
  * Per-round lineage is truncated with an eager `localCheckpoint`:
  * iterative DataFrame loops otherwise stack O(rounds) plan copies and
  * re-plan the whole history every round. On a cluster, checkpoint to
  * reliable storage instead if rounds are long-lived.
  *
  * Determinism: the fixed point (min-id labeling) is unique regardless of
  * iteration count or partitioning, so results are reproducible across
  * runs, parallelism, and engines — oracle-checkable against a recursive
  * min-reachability CTE.
  */
object ConnectedComponents {

  /** Map every vertex of `edges(srcCol, dstCol)` to its component label =
    * the MINIMUM vertex id reachable from it. Output: (`id`, `component`),
    * one row per distinct vertex appearing in the edge list (roots map to
    * themselves). Vertex ids must be integral (cast to long internally);
    * self-loops and duplicate/reversed edges are tolerated.
    */
  def label(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 50): DataFrame = {
    // Canonical orientation u > v; drop self-loops and duplicates.
    // Checkpoints.preserving, not a bare localCheckpoint: the closing
    // distinct() leaves the relation hash-partitioned on (u, v), which is
    // exactly what the per-round convergence probe joins on — a bare
    // checkpoint under AQE records UnknownPartitioning and the probe
    // re-exchanges BOTH checkpointed sides every round (the r11
    // GraphPlanFenceSpec discovery, same mechanism), pinned by
    // CheckpointsSpec.
    var e = Checkpoints.preserving(edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct())

    // No up-front emptiness probe (r18 optimization): the first round's
    // own convergence statistics answer it — an empty edge set yields
    // empty stars, zero observed changes, so round 1 converges and the
    // result is identical (ConnectedComponentsSpec's empty-edge-list
    // pin). The old `e.isEmpty` was one extra job (plus its driver/AQE
    // gap) on EVERY invocation, paying for the always-false case; the
    // empty graph now costs one trivial round instead.
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // Large-star. Neighborhoods come from BOTH directions; m(u) =
      // min(Γ(u) ∪ {u}); every neighbor v > u re-attaches to m. Output
      // rows (v, m) always satisfy v > u ≥ m, so orientation survives.
      // Both stars compute their per-u minimum with a WINDOW over the
      // neighborhood instead of a groupBy-min joined back (r18
      // optimization): min().over(partitionBy(u)) attaches m inside the
      // ONE hash(u) exchange the star needs anyway, deleting the
      // min-relation exchange and the join — per round, 4 exchanges + 2
      // joins become 2 exchanges, at any scale (the window buffers one
      // u-neighborhood per group — the identical placement the join
      // forced — and spills gracefully). NO mid-round dedup either: the
      // large-star multiset holds EXACTLY one row per input edge (each
      // sym row with v > u emits one), so Kiveris' never-grows invariant
      // holds without it; the small-star min is duplicate-insensitive
      // and `small` closes with its own distinct — results identical.
      //
      // Convergence rides the round's own checkpoint job (r19 verdict
      // task 3): both stars OBSERVE their identity violations —
      // `observe` counts accumulate as a side effect of the
      // materialization pass, so the per-round full-outer probe job (and
      // its driver/AQE latency) is deleted. Exactness: an emitted
      // large-star row (v, m) rewrites e-row (v, u) iff m ≠ u, so
      // cc_large == 0 ⟺ large == e (row-for-row, e distinct); a smallM
      // row re-attaches iff v ≠ m, so cc_small == 0 ⟺ small emits
      // exactly (u, m) = (u, v) per large row ⟺ small == distinct(large).
      // Both zero ⟹ small == e — the OLD probe's criterion — so the loop
      // never stops early; on star sets (the algorithm's fixed points,
      // Kiveris Thm 2) both identities hold, so it stops on the same
      // round the set-equality probe did. Accumulators only ADD under
      // task retries, so zero cannot be a miscount.
      val wU = Window.partitionBy(col("u"))
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val large = sym
        .withColumn("m", least(min(col("v")).over(wU), col("u")))
        .filter(col("v") > col("u"))
        .observe("cc_large",
          count(when(col("m") =!= col("u"), lit(1))).as("chg"))
        .select(col("v").as("u"), col("m").as("v"))

      // Small-star. Edges are oriented u > v, so the u-window sees
      // exactly the SMALLER neighbors; m = their minimum; each non-min
      // smaller neighbor and u itself re-attach to m. All outputs keep
      // u > v (v ≥ m and v ≠ m ⇒ v > m; u > m always). Emission is a
      // single explode over per-row struct arrays rather than a
      // two-branch union of smallM (r19): the union form planned the
      // whole sym→large→smallM window pipeline TWICE — AQE reuses the
      // exchanges but each branch recomputed its post-shuffle window
      // pass — and a doubly-consumed subtree cannot carry an observe
      // node (its counts would double). Identical output multiset: per
      // smallM row, (u, m) always, plus (v, m) when v ≠ m; the closing
      // distinct (already required) collapses duplicates.
      val smallM = large.withColumn("m", min(col("v")).over(wU))
        .observe("cc_small",
          count(when(col("v") =!= col("m"), lit(1))).as("chg"))
      val (small, observed) = Checkpoints.preservingObserved(smallM
        .select(explode(
          when(col("v") =!= col("m"),
            array(struct(col("v").as("u"), col("m").as("v")),
              struct(col("u").as("u"), col("m").as("v"))))
            .otherwise(array(struct(col("u").as("u"), col("m").as("v")))))
          .as("__r"))
        .select(col("__r.u").as("u"), col("__r.v").as("v"))
        .distinct()) // (u, v)-partitioned — see the initial checkpoint note

      converged = Seq("cc_large", "cc_small").forall(
        observed.get(_).exists(_.getLong(0) == 0L))
      e = small
      iter += 1
    }

    e.select(col("u").as("id"), col("v").as("component"))
      .union(e.select(col("v").as("id"), col("v").as("component")))
      .distinct()
  }

  /** [[label]] extended to a full vertex table: every id in
    * `vertices(idCol)` gets a component, isolated vertices labeling
    * themselves — the form corpus dedup wants (every document keeps or
    * loses membership, paired or not).
    */
  def labelAll(vertices: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val labeled = label(edges, srcCol, dstCol)
    vertices.select(col(idCol).cast("long").as("id"))
      .join(labeled, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /** Cluster-dedup survivors: rows of `docs` whose id is the MINIMUM of its
    * connected component in the near-dup graph — i.e. keep one canonical
    * document per duplicate cluster, drop the rest. Non-paired documents
    * are their own component and always survive.
    */
  def keepCanonical(docs: DataFrame, idCol: String,
      pairs: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val comp = labelAll(docs, idCol, pairs, srcCol, dstCol)
    docs.join(
      comp.filter(col("id") === col("component")).select(col("id")),
      docs(idCol) === col("id"), "left_semi")
  }
}
