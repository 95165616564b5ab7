package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spark-4-native surfaces a user migrating from the reference's JSON/text
  * front door (`events.props` is a JSON string, reference
  * `protos/sensor_event.proto:44-46` carries free-form payload fields)
  * gains by switching engines: the VARIANT binary JSON type, collation-aware
  * grouping, SQL pipe syntax, and mergeable HLL sketches.
  *
  * Scale rationale per query is in each entry's comment; the common thread
  * is that all four are engine-level features — binary-encoded
  * once-parsed JSON instead of per-access string re-parsing, collation
  * pushed into the hash-aggregate's key comparison instead of a wrapping
  * lower(), partial sketches that merge associatively across 1000
  * executors instead of a COUNT(DISTINCT) re-shuffle.
  */
object Spark4Queries extends Catalog {

  def queries: Map[String, Q] = Map(

    // VARIANT ingestion: parse the JSON string ONCE into Spark 4's binary
    // variant encoding, then do typed path extraction (variant_get) on the
    // binary form. At 100 TB this is the difference between re-tokenizing
    // the JSON text for every accessed path (get_json_object — the
    // q_json_funcs form) and one parse followed by O(log fields) binary
    // offset lookups per path; same plan shape (narrow map), strictly less
    // CPU per row. The missing-path and wrong-type probes pin the
    // null-not-error contract (try_variant_get) that makes the operator
    // safe on heterogeneous 100 TB payloads. Oracle replays every column
    // with DuckDB's JSON extraction.
    "q_json_variant" -> Q(
      t => t.events
        .withColumn("v", parse_json(col("props")))
        .select(
          col("event_id"),
          col("event_type"),
          variant_get(col("v"), "$.k", "bigint").as("k"),
          variant_get(col("v"), "$.k", "string").as("k_str"),
          variant_get(col("v"), "$.missing", "bigint").as("k_missing"),
          // wrong-type try extraction is always null; rendered to string so
          // no array type ever reaches the driver's pandas sort (the
          // catalog-wide atomic-output rule, SparkEntrySpec)
          try_variant_get(col("v"), "$.k", "array<bigint>").cast("string")
            .as("k_badtype"),
          is_variant_null(col("v")).as("is_json_null"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, event_type,
                     CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
                     json_extract_string(props, '$.k') AS k_str,
                     CAST(json_extract_string(props, '$.missing') AS BIGINT) AS k_missing,
                     CAST(NULL AS VARCHAR) AS k_badtype,
                     (json_extract(props, '$') = 'null') AS is_json_null
              FROM events
              ORDER BY event_id NULLS FIRST""")),

    // Malformed-record ingestion semantics — the reference's failed-event
    // accounting (internal/app/app.go:147-157 counts events that fail to
    // decode; it never crashes the pipeline). Relationally that contract
    // is PERMISSIVE from_json with a corrupt-record column: a bad payload
    // yields null fields plus the raw text in `bad`, a good payload parses
    // — one narrow map, no row lost either way, and the dead-letter stream
    // is just `WHERE bad IS NOT NULL`. Corruption is injected
    // deterministically (every 10th event's props truncated) so the oracle
    // can replay the split with json_valid(). At 100 TB this is the
    // difference between a poison record killing a 6-hour job and a
    // queryable quarantine table.
    "q_json_malformed" -> Q(
      t => {
        val raw = when(col("event_id") % 10 === 0, substring(col("props"), 1, 3))
          .otherwise(col("props"))
        t.events
          .select(col("event_id"), raw.as("s"))
          .withColumn("p", from_json(col("s"),
            org.apache.spark.sql.types.StructType.fromDDL("k bigint, _bad string"),
            Map("columnNameOfCorruptRecord" -> "_bad")))
          .select(
            col("event_id"),
            col("p.k").as("k"),
            col("p._bad").as("bad"))
          .orderBy(col("event_id"))
      },
      Some("""WITH r AS (
             |  SELECT event_id,
             |         CASE WHEN event_id % 10 = 0 THEN substring(props, 1, 3)
             |              ELSE props END AS s
             |  FROM events)
             |SELECT event_id,
             |       CASE WHEN json_valid(s)
             |            THEN CAST(json_extract_string(s, '$.k') AS BIGINT) END AS k,
             |       CASE WHEN NOT json_valid(s) THEN s END AS bad
             |FROM r
             |ORDER BY event_id NULLS FIRST""".stripMargin)),

    // Collation-aware grouping: UTF8_LCASE makes case-insensitivity a
    // property of the COLUMN, so the hash aggregate's key comparison is
    // collation-aware — no wrapping lower() expression for Catalyst to
    // re-evaluate per reference, and downstream joins/sorts on the same
    // column inherit the semantics. The query manufactures case variants
    // (every p_type plus its initcap form), groups on the collated key,
    // and proves both forms landed in one group (n_forms = 2). The output
    // key is normalized through lower() and cast back to a plain binary
    // string because which ORIGINAL spelling a collated group retains is
    // engine/order-dependent — the one nondeterminism the feature
    // introduces, handled the same way at any scale. Oracle replays with
    // lower()-keyed grouping and a string-built initcap.
    "q_agg_collated" -> Q(
      t => {
        val base = t.part.select(col("p_type").as("ty"))
        val mixed = base.unionAll(base.select(initcap(col("ty")).as("ty")))
        mixed
          .groupBy(collate(col("ty"), "UTF8_LCASE").as("tyc"))
          .agg(count(lit(1)).as("n"), count_distinct(col("ty")).as("n_forms"))
          .select(
            lower(col("tyc")).cast("string").as("type_lc"),
            col("n"), col("n_forms"))
          .orderBy(col("type_lc"))
      },
      Some("""WITH mixed AS (
              |  SELECT p_type AS ty FROM part
              |  UNION ALL
              |  SELECT array_to_string(list_transform(string_split(p_type, ' '),
              |           w -> upper(w[1]) || lower(w[2:])), ' ') FROM part
              |)
              |SELECT lower(ty) AS type_lc, COUNT(*) AS n,
              |       COUNT(DISTINCT ty) AS n_forms
              |FROM mixed GROUP BY lower(ty)
              |ORDER BY type_lc NULLS FIRST""".stripMargin)),

    // SQL pipe syntax (SQL:2023-style |> chaining, Spark 4 front door):
    // the Q1 pricing-summary shape restated as a linear pipeline. The
    // feature is purely syntactic — Catalyst plans the identical
    // partial/final hash aggregate the ANSI form gets (the oracle IS the
    // ANSI form, so the gate proves plan-semantics equivalence end to
    // end). Money sums follow the catalog's exact-cents discipline.
    // Bitmap exact-distinct (the RoaringBitmap warehouse pattern, Spark
    // 3.5+ bitmap_* functions): user ids fold into fixed-size per-bucket
    // bitmaps — (group, bucket) partials that merge ASSOCIATIVELY with
    // bitmap_or_agg, unlike COUNT(DISTINCT) whose dedup state is
    // unmergeable and must re-shuffle raw values. That is the exact-
    // distinct contract at 100 TB: daily partials persist as bitmap
    // columns, any rollup (here: the ALL row) is a bitmap OR over
    // partials, never a rescan — the exact sibling of q_agg_hll_merge's
    // approximate sketches, and gated by a plain COUNT(DISTINCT) oracle
    // because the count is exact. Bucket fan-out bounds every bitmap at
    // 4 KB regardless of id range.
    "q_agg_bitmap_distinct" -> Q(
      t => {
        t.events.createOrReplaceTempView("events")
        t.events.sparkSession.sql(
          """WITH b AS (
            |  SELECT event_type, bitmap_bucket_number(user_id) AS bkt,
            |         bitmap_construct_agg(bitmap_bit_position(user_id)) AS bm
            |  FROM events GROUP BY 1, 2
            |), per AS (
            |  SELECT event_type, CAST(SUM(bitmap_count(bm)) AS BIGINT) AS n_users
            |  FROM b GROUP BY event_type
            |), merged AS (
            |  SELECT bkt, bitmap_or_agg(bm) AS bm FROM b GROUP BY bkt
            |), total AS (
            |  SELECT 'ALL' AS event_type,
            |         CAST(SUM(bitmap_count(bm)) AS BIGINT) AS n_users
            |  FROM merged
            |)
            |SELECT * FROM per UNION ALL SELECT * FROM total
            |ORDER BY event_type NULLS FIRST""".stripMargin)
      },
      Some("""SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
              |FROM events GROUP BY event_type
              |UNION ALL
              |SELECT 'ALL', CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events
              |ORDER BY event_type NULLS FIRST""".stripMargin)),

    // SQL-defined scalar function (SQL:2016 / Spark 4 CREATE FUNCTION …
    // RETURNS … RETURN expr) — the UDF form that stays INSIDE Catalyst:
    // the body is inlined into the plan at resolution, so unlike a Scala
    // closure udf() it constant-folds, pushes down, and joins whole-stage
    // codegen — at 100 TB the difference between a black-box per-row
    // call and a fused expression. The query banding per-event values
    // into tiers exercises the function in both the projection and the
    // GROUP BY key. The oracle inlines the body by hand — proving the
    // inlining semantics, not just the arithmetic.
    "q_sql_udf" -> Q(
      t => {
        val s = t.events.sparkSession
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_tier(v DOUBLE)
                |RETURNS STRING
                |RETURN CASE WHEN v >= 300.0 THEN 'high'
                |            WHEN v >= 100.0 THEN 'mid'
                |            ELSE 'low' END""".stripMargin)
        t.events.createOrReplaceTempView("events")
        s.sql("""SELECT graft_tier(value) AS tier, COUNT(*) AS n,
                |       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                |         AS cents
                |FROM events
                |GROUP BY graft_tier(value)
                |ORDER BY tier NULLS FIRST""".stripMargin)
      },
      Some("""SELECT CASE WHEN value >= 300.0 THEN 'high'
              |            WHEN value >= 100.0 THEN 'mid'
              |            ELSE 'low' END AS tier,
              |       CAST(COUNT(*) AS BIGINT) AS n,
              |       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
              |         AS cents
              |FROM events
              |GROUP BY 1
              |ORDER BY tier NULLS FIRST""".stripMargin)),

    "q_sql_pipe" -> Q(
      t => {
        t.lineitem.createOrReplaceTempView("lineitem")
        t.lineitem.sparkSession.sql(
          """FROM lineitem
            ||> WHERE l_shipdate <= DATE '1998-09-02'
            ||> AGGREGATE COUNT(*) AS n,
            |     CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
            |     CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price
            |     GROUP BY l_returnflag, l_linestatus
            ||> ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
                     CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
                     CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price
              FROM lineitem
              WHERE l_shipdate <= DATE '1998-09-02'
              GROUP BY l_returnflag, l_linestatus
              ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // Recursive CTE (WITH RECURSIVE, Spark 4 SQL front door): bounded
    // breadth-first reachability over the same doubled bipartite
    // order/part graph as q_graph_bfs, but stated DECLARATIVELY — the
    // recursion produces every ≤2-hop walk from the seed parts and the
    // outer aggregate collapses walks to min hop distance (aggregation
    // must sit OUTSIDE the recursive term on both engines). Catalyst
    // plans each recursion level as the same shuffle join the
    // operator-form BFS spells by hand (UnionLoop: the 100 TB cost model
    // is identical — levels × one join shuffle); the depth guard is the
    // termination contract. The oracle is DuckDB's recursive CTE of the
    // same text modulo dialect casts — two independent recursive
    // executors agreeing on the fixpoint.
    "q_graph_bfs_recursive" -> Q(
      t => {
        t.lineitem.createOrReplaceTempView("lineitem")
        t.part.createOrReplaceTempView("part")
        t.lineitem.sparkSession.sql(
          """WITH RECURSIVE walk(node, dist) AS (
            |  SELECT p_partkey * 2 + 1, CAST(0 AS BIGINT) FROM part WHERE p_size = 1
            |  UNION ALL
            |  SELECT e.dst, w.dist + 1
            |  FROM walk w
            |  JOIN (SELECT l_orderkey * 2 AS src, l_partkey * 2 + 1 AS dst FROM lineitem
            |        UNION
            |        SELECT l_partkey * 2 + 1, l_orderkey * 2 FROM lineitem) e
            |    ON e.src = w.node
            |  WHERE w.dist < 2
            |)
            |SELECT node, MIN(dist) AS dist FROM walk GROUP BY node
            |ORDER BY node NULLS FIRST""".stripMargin)
      },
      Some("""WITH RECURSIVE walk(node, dist) AS (
             |  SELECT p_partkey * 2 + 1, CAST(0 AS BIGINT) FROM part WHERE p_size = 1
             |  UNION ALL
             |  SELECT e.dst, w.dist + 1
             |  FROM walk w
             |  JOIN (SELECT l_orderkey * 2 AS src, l_partkey * 2 + 1 AS dst FROM lineitem
             |        UNION
             |        SELECT l_partkey * 2 + 1, l_orderkey * 2 FROM lineitem) e
             |    ON e.src = w.node
             |  WHERE w.dist < 2
             |)
             |SELECT node, MIN(dist) AS dist FROM walk GROUP BY node
             |ORDER BY node NULLS FIRST""".stripMargin)),

    // Ordered string aggregation (listagg WITHIN GROUP, SQL:2023): the
    // canonical "roll member names up to the parent row" shape. The
    // WITHIN GROUP order is part of the SEMANTICS (not a display choice):
    // an unordered string_agg is nondeterministic under parallel merge —
    // the same partial-agg merge-order trap msum exists for — so the
    // catalog only ships the ordered form. Oracle: DuckDB's string_agg
    // with ORDER BY.
    "q_agg_listagg" -> Q(
      t => {
        t.supplier.createOrReplaceTempView("supplier")
        t.supplier.sparkSession.sql(
          """SELECT s_nationkey,
            |       listagg(s_name, ',') WITHIN GROUP (ORDER BY s_name) AS members,
            |       COUNT(*) AS n
            |FROM supplier GROUP BY s_nationkey
            |ORDER BY s_nationkey NULLS FIRST""".stripMargin)
      },
      Some("""SELECT s_nationkey,
                     string_agg(s_name, ',' ORDER BY s_name) AS members,
                     COUNT(*) AS n
              FROM supplier GROUP BY s_nationkey
              ORDER BY s_nationkey NULLS FIRST""")),

    // Mergeable HLL sketches — the 100 TB COUNT(DISTINCT) pattern: each
    // group (here: event_type; at scale: a partition / a day / an
    // executor) builds a fixed-size Datasketches HLL of user_id, and the
    // global distinct count is the ESTIMATE OF THE UNION of those
    // sketches — a kilobytes-sized associative merge instead of the
    // re-shuffle of all distinct values a two-level exact COUNT(DISTINCT)
    // needs. Output: per-group estimates plus an 'ALL' row whose value is
    // provably (HllMergeSpec) identical to sketching the whole input in
    // one pass. No DuckDB oracle by design — sketch contents are
    // Datasketches-implementation-specific (same class as
    // q_agg_approx_distinct); the driver records the rows-only check and
    // HllMergeSpec carries the merge-associativity and accuracy proof.
    "q_agg_hll_merge" -> Q(
      t => {
        val perGroup = t.events
          .groupBy(col("event_type"))
          .agg(hll_sketch_agg(col("user_id"), 12).as("sketch"))
        val est = perGroup.select(
          col("event_type"),
          hll_sketch_estimate(col("sketch")).as("approx_users"))
        val merged = perGroup
          .agg(hll_union_agg(col("sketch")).as("u"))
          .select(lit("ALL").as("event_type"),
            hll_sketch_estimate(col("u")).as("approx_users"))
        est.unionAll(merged).orderBy(col("event_type"))
      },
      None),

    // Mergeable Count-Min sketches — the frequency sibling of
    // q_agg_hll_merge's cardinality sketch, completing the sketch family:
    // each group builds a fixed-size CMS of user_id (the 100 TB pattern —
    // per-partition/day/executor sketches whose counts ADD under merge,
    // exactly associative, unlike a sampled top-k), the merged sketch
    // answers point-frequency queries for the heavy-hitter candidates,
    // and the output carries estimate next to exact so the overestimate
    // is visible (CMS never undercounts; ε·N bounds the excess with
    // probability 1-δ — CmsSpec pins determinism, merge-vs-single-pass
    // equality, and the bound). Driver traffic is the per-group sketch
    // binaries (KB each) and ten probes — constant in corpus size. No
    // DuckDB oracle by design (sketch internals are implementation-
    // specific, the q_agg_hll_merge precedent); the driver records the
    // rows-only check.
    "q_agg_cms_heavy_hitters" -> Q(
      t => {
        val spark = t.events.sparkSession
        import spark.implicits._
        val exactTop = t.events.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_exact"))
          .orderBy(col("n_exact").desc_nulls_last, col("user_id"))
          .limit(10)
        val perGroup = t.events
          .groupBy(col("event_type"))
          .agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("sk"))
          .select(col("sk")).collect()
        // reduceOption: an empty events table yields zero per-group
        // sketches, and the heavy-hitter report is then legitimately empty
        // (reduce would throw UnsupportedOperationException — r11 ADVICE)
        perGroup.map(r =>
            org.apache.spark.util.sketch.CountMinSketch.readFrom(r.getAs[Array[Byte]](0)))
          .reduceOption((a, b) => a.mergeInPlace(b)) match {
          case None =>
            Seq.empty[(Long, Long, Long)].toDF("user_id", "n_exact", "n_est")
          case Some(merged) =>
            val keys = exactTop.select(col("user_id")).as[Long].collect().toSeq
            val est = keys.map(k => (k, merged.estimateCount(java.lang.Long.valueOf(k))))
              .toDF("user_id", "n_est")
            exactTop.join(broadcast(est), "user_id")
              .select(col("user_id"), col("n_exact"), col("n_est"))
              .orderBy(col("n_exact").desc_nulls_last, col("user_id"))
        }
      },
      None),

    // KMV bottom-k sketches — the SET-OPERATION member of the sketch
    // family (HLL = cardinality, CMS = frequency): per event_type the k
    // smallest distinct xxhash64 values of the (user_id, day) pair — the
    // "active user-days" set — whose merge is EXACT array union-of-minima
    // (associative + commutative, KmvSpec pins array equality), and which
    // unlike HLL answers INTERSECTION estimates: shared-minima ratio
    // inside the union sketch × the union estimate (Beyer et al.,
    // SIGMOD'07). Output rows: each type's estimate next to its exact
    // distinct count, every pairwise type intersection (audience-overlap,
    // the query HLL cannot answer without inclusion-exclusion error
    // blowup), and the global union. Driver traffic is 5 sketches × k
    // longs + a 16-row estimates frame — constant in corpus size; the
    // exact columns exist only as the gate's audit. Deterministic by
    // construction (fixed hash, order-independent bottom-k), so although
    // rows-only at the driver (the hash values aren't reproducible in
    // DuckDB SQL), the output is bit-stable run to run; KmvSpec carries
    // the merge-exactness, determinism, accuracy-envelope, and
    // below-capacity-exactness proofs.
    "q_agg_kmv_set_ops" -> Q(
      t => {
        val spark = t.events.sparkSession
        import spark.implicits._
        val k = 256
        val kmv = udaf(new graft.operators.KmvAggregator(k))
        val hashed = t.events.select(col("event_type"),
          xxhash64(col("user_id"), to_date(col("ts"))).as("h"))
        val sk: Map[String, Seq[Long]] = hashed
          .groupBy(col("event_type")).agg(kmv(col("h")).as("sk"))
          .collect()
          .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
        val types = sk.keys.toSeq.sorted
        val estRows: Seq[(String, Long)] =
          types.map(tp => (tp, graft.operators.KmvSketch.estimateDistinct(k, sk(tp)))) ++
            (for {
              i <- types.indices
              j <- (i + 1) until types.size
            } yield (s"${types(i)}&${types(j)}",
              graft.operators.KmvSketch.estimateIntersection(k, sk(types(i)), sk(types(j))))) ++
            Seq(("ALL", graft.operators.KmvSketch.estimateDistinct(k,
              sk.values.reduce((a, b) => graft.operators.KmvSketch.union(k, a, b)))))
        val est = estRows.toDF("scope", "n_est")
        val exactType = t.events
          .groupBy(col("event_type"))
          .agg(countDistinct(col("user_id"), to_date(col("ts"))).as("n_exact"))
          .select(col("event_type").as("scope"), col("n_exact"))
        val exactAll = t.events
          .agg(countDistinct(col("user_id"), to_date(col("ts"))).as("n_exact"))
          .select(lit("ALL").as("scope"), col("n_exact"))
        val tu = t.events
          .select(col("event_type"), col("user_id"), to_date(col("ts")).as("d"))
          .distinct()
        val exactPair = tu.as("a").join(tu.as("b"),
            col("a.user_id") === col("b.user_id") && col("a.d") === col("b.d") &&
              col("a.event_type") < col("b.event_type"))
          .groupBy(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
          .agg(count(lit(1)).as("n_exact"))
          .select(concat(col("ta"), lit("&"), col("tb")).as("scope"), col("n_exact"))
        est
          .join(exactType.unionAll(exactPair).unionAll(exactAll), Seq("scope"), "left")
          .select(col("scope"), coalesce(col("n_exact"), lit(0L)).as("n_exact"),
            col("n_est"))
          .orderBy(col("scope"), col("n_exact"), col("n_est"))
      },
      None))
}
