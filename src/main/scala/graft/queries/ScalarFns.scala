package graft.queries

import org.apache.spark.sql.functions._

/** Scalar function families: string, date/time, math, array HOFs, JSON/map
  * (SURVEY.md §2C scalar rows). All built-ins — every expression here stays
  * inside whole-stage codegen.
  */
object ScalarFns extends Catalog {

  def queries: Map[String, Q] = Map(
    "q_str_funcs" -> Q(
      t => t.customer
        .filter(col("c_custkey") < 300)
        .select(
          col("c_custkey"),
          concat(col("c_name"), lit("#"), col("c_mktsegment")).as("joined"),
          upper(col("c_mktsegment")).as("up"),
          lower(col("c_mktsegment")).as("lo"),
          substring(col("c_name"), 1, 8).as("prefix"),
          length(col("c_name")).as("len"),
          trim(lit("  pad  ")).as("trimmed"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
          regexp_replace(col("c_name"), "[0-9]+", "N").as("digits_masked"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
          split(col("c_name"), "#").getItem(0).as("name_part"),
          base64(col("c_mktsegment").cast("binary")).as("b64"),
          unbase64(base64(col("c_mktsegment").cast("binary"))).cast("string").as("roundtrip"))
        .orderBy(col("c_custkey"), col("joined"), col("up"), col("lo"), col("prefix"),
          col("len"), col("trimmed"), col("padded"), col("digits_masked"), col("digits"),
          col("name_part"), col("b64"), col("roundtrip")),
      Some("""SELECT c_custkey,
                     c_name || '#' || c_mktsegment AS joined,
                     upper(c_mktsegment) AS up,
                     lower(c_mktsegment) AS lo,
                     substring(c_name, 1, 8) AS prefix,
                     CAST(length(c_name) AS INTEGER) AS len,
                     trim('  pad  ') AS trimmed,
                     lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
                     regexp_replace(c_name, '[0-9]+', 'N', 'g') AS digits_masked,
                     regexp_extract(c_name, '([0-9]+)', 1) AS digits,
                     string_split(c_name, '#')[1] AS name_part,
                     to_base64(encode(c_mktsegment)) AS b64,
                     decode(from_base64(to_base64(encode(c_mktsegment)))) AS roundtrip
              FROM customer WHERE c_custkey < 300
              ORDER BY c_custkey NULLS FIRST, joined NULLS FIRST, up NULLS FIRST, lo NULLS FIRST,
                       prefix NULLS FIRST, len NULLS FIRST, trimmed NULLS FIRST, padded NULLS FIRST,
                       digits_masked NULLS FIRST, digits NULLS FIRST, name_part NULLS FIRST,
                       b64 NULLS FIRST, roundtrip NULLS FIRST""")),

    "q_date_funcs" -> Q(
      t => t.orders
        .filter(col("o_orderkey") < 500)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
          date_format(date_add(col("o_orderdate").cast("date"), 7), "yyyy-MM-dd").as("plus7"),
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("days_since"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"))
        .orderBy(col("o_orderkey"), col("y"), col("q"), col("m"), col("d"),
          col("month_start"), col("plus7"), col("days_since"), col("epoch_s")),
      Some("""SELECT o_orderkey,
                     CAST(year(o_orderdate) AS INTEGER) AS y,
                     CAST(quarter(o_orderdate) AS INTEGER) AS q,
                     CAST(month(o_orderdate) AS INTEGER) AS m,
                     CAST(day(o_orderdate) AS INTEGER) AS d,
                     strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
                     strftime(CAST(o_orderdate AS DATE) + INTERVAL 7 DAY, '%Y-%m-%d') AS plus7,
                     CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
                     CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s
              FROM orders WHERE o_orderkey < 500
              ORDER BY o_orderkey NULLS FIRST, y NULLS FIRST, q NULLS FIRST, m NULLS FIRST,
                       d NULLS FIRST, month_start NULLS FIRST, plus7 NULLS FIRST,
                       days_since NULLS FIRST, epoch_s NULLS FIRST""")),

    "q_math_funcs" -> Q(
      t => t.part
        .select(
          col("p_partkey"),
          round(col("p_retailprice") * 1.1, 2).as("marked_up"),
          floor(col("p_retailprice")).cast("long").as("fl"),
          ceil(col("p_retailprice")).cast("long").as("ce"),
          abs(col("p_size") - 100).as("dist100"),
          expr("p_size div 7").as("idiv"),
          (col("p_size") % 7).as("imod"),
          round(pow(col("p_size"), 2), 2).as("sq"),
          round(log(col("p_retailprice")), 4).as("ln_price"),
          round(sqrt(col("p_retailprice")), 4).as("sqrt_price"),
          greatest(col("p_size"), lit(25)).as("gst"),
          least(col("p_size"), lit(25)).as("lst"))
        .orderBy(col("p_partkey"), col("marked_up"), col("fl"), col("ce"), col("dist100"),
          col("idiv"), col("imod"), col("sq"), col("ln_price"), col("sqrt_price"),
          col("gst"), col("lst")),
      Some("""SELECT p_partkey,
                     ROUND(p_retailprice * 1.1, 2) AS marked_up,
                     CAST(FLOOR(p_retailprice) AS BIGINT) AS fl,
                     CAST(CEIL(p_retailprice) AS BIGINT) AS ce,
                     CAST(ABS(p_size - 100) AS INTEGER) AS dist100,
                     CAST(p_size // 7 AS BIGINT) AS idiv,
                     CAST(p_size % 7 AS INTEGER) AS imod,
                     ROUND(POW(p_size, 2), 2) AS sq,
                     ROUND(LN(p_retailprice), 4) AS ln_price,
                     ROUND(SQRT(p_retailprice), 4) AS sqrt_price,
                     CAST(GREATEST(p_size, 25) AS INTEGER) AS gst,
                     CAST(LEAST(p_size, 25) AS INTEGER) AS lst
              FROM part
              ORDER BY p_partkey NULLS FIRST, marked_up NULLS FIRST, fl NULLS FIRST,
                       ce NULLS FIRST, dist100 NULLS FIRST, idiv NULLS FIRST, imod NULLS FIRST,
                       sq NULLS FIRST, ln_price NULLS FIRST, sqrt_price NULLS FIRST,
                       gst NULLS FIRST, lst NULLS FIRST""")),

    "q_array_explode" -> Q(
      t => t.embeddings
        .filter(col("vec_id") < 3)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))
        .select(col("vec_id"), col("pos"), round(col("val").cast("double"), 4).as("v"))
        .orderBy(col("vec_id"), col("pos"), col("v")),
      Some("""SELECT vec_id,
                     CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
                     ROUND(CAST(unnest(embedding) AS DOUBLE), 4) AS v
              FROM embeddings WHERE vec_id < 3
              ORDER BY vec_id NULLS FIRST, pos NULLS FIRST, v NULLS FIRST""")),

    // All rounded values here derive from float32 embeddings — DYADIC
    // rationals, whose ×10^4 products can land EXACTLY on .5 ties (hit at
    // sf0.1: emb[1]·2·10^4 = -0.5, Spark HALF_UP → -0.0001 vs DuckDB → -0.0).
    // So this query rounds via floor(x·10^4 + 0.5)/10^4 spelled IDENTICALLY
    // on both engines: same IEEE op sequence, no engine rounding policy left.
    "q_array_hof" -> Q(
      t => {
        def r4(c: org.apache.spark.sql.Column) = floor(c * 10000.0 + 0.5) / 10000.0
        t.embeddings
          .withColumn("emb", transform(col("embedding"), _.cast("double")))
          .select(
            col("vec_id"),
            size(col("embedding")).as("dim"),
            r4(aggregate(col("emb"), lit(0.0), (acc, x) => acc + x)).as("sum_all"),
            size(filter(col("emb"), _ > 0)).as("n_pos"),
            r4(aggregate(transform(col("emb"), x => x * x), lit(0.0), (acc, x) => acc + x)).as("sum_sq"),
            r4(array_max(col("emb"))).as("max_v"),
            r4(element_at(col("emb"), 1) * 2).as("first_doubled"))
          .orderBy(col("vec_id"), col("dim"), col("sum_all"), col("n_pos"),
            col("sum_sq"), col("max_v"), col("first_doubled"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding,
                                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                         FROM embeddings)
              SELECT vec_id,
                     CAST(len(embedding) AS INTEGER) AS dim,
                     FLOOR(list_sum(emb) * 10000.0 + 0.5) / 10000.0 AS sum_all,
                     CAST(len(list_filter(emb, x -> x > 0)) AS INTEGER) AS n_pos,
                     FLOOR(list_sum(list_transform(emb, x -> x * x)) * 10000.0 + 0.5) / 10000.0 AS sum_sq,
                     FLOOR(list_max(emb) * 10000.0 + 0.5) / 10000.0 AS max_v,
                     FLOOR(emb[1] * 2 * 10000.0 + 0.5) / 10000.0 AS first_doubled
              FROM e
              ORDER BY vec_id NULLS FIRST, dim NULLS FIRST, sum_all NULLS FIRST,
                       n_pos NULLS FIRST, sum_sq NULLS FIRST, max_v NULLS FIRST,
                       first_doubled NULLS FIRST""")),

    "q_json_funcs" -> Q(
      t => t.events
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          round(avg(col("k")), 2).as("avg_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type"), col("n"), col("sum_k"), col("avg_k"),
          col("min_k"), col("max_k")),
      Some("""SELECT event_type, COUNT(*) AS n,
                     CAST(SUM(k) AS BIGINT) AS sum_k,
                     ROUND(AVG(k), 2) AS avg_k,
                     MIN(k) AS min_k, MAX(k) AS max_k
              FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
                    FROM events)
              GROUP BY event_type
              ORDER BY event_type NULLS FIRST, n NULLS FIRST, sum_k NULLS FIRST,
                       avg_k NULLS FIRST, min_k NULLS FIRST, max_k NULLS FIRST""")),

    "q_map_funcs" -> Q(
      t => t.events
        .filter(col("event_id") < 100)
        .withColumn("m", from_json(col("props"), lit("map<string,bigint>")))
        .select(
          col("event_id"),
          array_join(map_keys(col("m")), ",").as("keys"),
          array_join(transform(map_values(col("m")), _.cast("string")), ",").as("vals"),
          element_at(col("m"), "k").as("k_val"),
          to_json(col("m")).as("rejson"))
        .orderBy(col("event_id"), col("keys"), col("vals"), col("k_val"), col("rejson")),
      Some("""SELECT event_id,
                     array_to_string(json_keys(props), ',') AS keys,
                     CAST(json_extract_string(props, '$.k') AS VARCHAR) AS vals,
                     CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
                     '{"k":' || json_extract_string(props, '$.k') || '}' AS rejson
              FROM events WHERE event_id < 100
              ORDER BY event_id NULLS FIRST, keys NULLS FIRST, vals NULLS FIRST,
                       k_val NULLS FIRST, rejson NULLS FIRST""")))
}
