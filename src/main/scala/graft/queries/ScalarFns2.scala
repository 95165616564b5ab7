package graft.queries

import org.apache.spark.sql.functions._

/** Second wave of scalar-function coverage: the remaining commonly-used
  * string and date built-ins, plus outer explode semantics (null row kept
  * for empty arrays — the dual of A3's inner explode).
  */
object ScalarFns2 extends Catalog {

  def queries: Map[String, Q] = Map(

    // URL decomposition — the web-corpus curation primitive (domain
    // quotas, path-based filtering, tracking-param stripping all start
    // here). URLs are synthesized from document attributes so the oracle
    // can state the expected constituents INDEPENDENTLY of any URL
    // parser: Spark's parse_url (HOST/PATH/QUERY-key extraction, a
    // codegen'd java.net-based expression) must round-trip exactly what
    // the construction put in. Pure map-side, no shuffle beyond the
    // ordered limit.
    "q_str_url" -> Q(
      t => {
        val url = concat(lit("https://"), col("source"), lit(".example.com/docs/"),
          col("doc_id").cast("string"), lit("?lang="), col("lang"))
        t.documents
          .select(col("doc_id"), url.as("url"))
          .select(col("doc_id"),
            expr("parse_url(url, 'HOST')").as("host"),
            expr("parse_url(url, 'PATH')").as("path"),
            expr("parse_url(url, 'QUERY', 'lang')").as("lang_param"))
          .orderBy(col("doc_id"))
          .limit(50)
      },
      Some("""SELECT doc_id,
              |       source || '.example.com' AS host,
              |       '/docs/' || CAST(doc_id AS VARCHAR) AS path,
              |       lang AS lang_param
              |FROM documents
              |ORDER BY doc_id
              |LIMIT 50""".stripMargin)),

    // Edit distance — fuzzy matching / canonicalization primitive (entity
    // resolution in a data pipeline). levenshtein is the classic dynamic
    // program both engines implement identically; O(|s|·|t|) per row, pure
    // map-side, codegen'd. Spark returns INTEGER, DuckDB BIGINT — cast to
    // BIGINT for the type-strict gate.
    "q_str_distance" -> Q(
      t => t.part
        .select(
          col("p_partkey"),
          levenshtein(col("p_name"), col("p_type")).cast("long").as("lev_name_type"),
          levenshtein(col("p_brand"), lit("Brand#11")).cast("long").as("lev_brand"))
        .orderBy(col("p_partkey"), col("lev_name_type"), col("lev_brand")),
      Some("""SELECT p_partkey,
                     levenshtein(p_name, p_type) AS lev_name_type,
                     levenshtein(p_brand, 'Brand#11') AS lev_brand
              FROM part
              ORDER BY p_partkey NULLS FIRST, lev_name_type NULLS FIRST,
                       lev_brand NULLS FIRST""")),

    "q_str_funcs2" -> Q(
      t => t.part
        .select(
          col("p_partkey"),
          initcap(col("p_name")).as("title"),
          translate(col("p_type"), "AEO", "aeo").as("translated"),
          instr(col("p_name"), "widget").as("widget_at"),
          repeat(col("p_brand"), 2).as("doubled"),
          reverse(col("p_name")).as("reversed"),
          rpad(col("p_brand"), 12, ".").as("padded"),
          left(col("p_name"), lit(4)).as("l4"),
          right(col("p_name"), lit(4)).as("r4"),
          contains(col("p_name"), lit("bolt")).as("has_bolt"),
          startswith(col("p_type"), lit("PRO")).as("is_promo"),
          endswith(col("p_name"), lit("t")).as("ends_t"))
        .orderBy(col("p_partkey"), col("title"), col("translated"), col("widget_at"),
          col("doubled"), col("reversed"), col("padded"), col("l4"), col("r4"),
          col("has_bolt"), col("is_promo"), col("ends_t")),
      Some("""SELECT p_partkey,
                     -- Spark initcap capitalizes every whitespace-separated word
                     array_to_string(list_transform(string_split(p_name, ' '),
                       w -> upper(w[1]) || lower(w[2:])), ' ') AS title,
                     translate(p_type, 'AEO', 'aeo') AS translated,
                     CAST(instr(p_name, 'widget') AS INTEGER) AS widget_at,
                     repeat(p_brand, 2) AS doubled,
                     reverse(p_name) AS reversed,
                     rpad(p_brand, 12, '.') AS padded,
                     left(p_name, 4) AS l4,
                     right(p_name, 4) AS r4,
                     contains(p_name, 'bolt') AS has_bolt,
                     starts_with(p_type, 'PRO') AS is_promo,
                     ends_with(p_name, 't') AS ends_t
              FROM part
              ORDER BY p_partkey NULLS FIRST, title NULLS FIRST, translated NULLS FIRST,
                       widget_at NULLS FIRST, doubled NULLS FIRST, reversed NULLS FIRST,
                       padded NULLS FIRST, l4 NULLS FIRST, r4 NULLS FIRST,
                       has_bolt NULLS FIRST, is_promo NULLS FIRST, ends_t NULLS FIRST""")),

    "q_date_funcs2" -> Q(
      t => t.orders
        .filter(col("o_orderkey") < 300)
        .select(
          col("o_orderkey"),
          date_format(add_months(col("o_orderdate").cast("date"), 3), "yyyy-MM-dd").as("plus3m"),
          date_format(last_day(col("o_orderdate").cast("date")), "yyyy-MM-dd").as("month_end"),
          date_format(trunc(col("o_orderdate").cast("date"), "year"), "yyyy-MM-dd").as("year_start"),
          dayofyear(col("o_orderdate")).as("doy"),
          weekofyear(col("o_orderdate")).as("woy"))
        .orderBy(col("o_orderkey"), col("plus3m"), col("month_end"),
          col("year_start"), col("doy"), col("woy")),
      Some("""SELECT o_orderkey,
                     strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
                     strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
                     strftime(date_trunc('year', CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS year_start,
                     CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
                     CAST(weekofyear(o_orderdate) AS INTEGER) AS woy
              FROM orders WHERE o_orderkey < 300
              ORDER BY o_orderkey NULLS FIRST, plus3m NULLS FIRST, month_end NULLS FIRST,
                       year_start NULLS FIRST, doy NULLS FIRST, woy NULLS FIRST""")),

    "q_array_explode_outer" -> Q(
      t => t.documents
        .withColumn("maybe_tokens",
          when(col("doc_id") % 10 === 0, array().cast("array<string>"))
            .otherwise(slice(split(col("text"), "\\s+"), 1, 2)))
        .select(col("doc_id"), explode_outer(col("maybe_tokens")).as("tok"))
        .orderBy(col("doc_id"), col("tok")),
      Some("""WITH m AS (
              |  SELECT doc_id,
              |         CASE WHEN doc_id % 10 = 0 THEN []::VARCHAR[]
              |              ELSE string_split_regex(text, '\s+')[1:2] END AS maybe_tokens
              |  FROM documents)
              |SELECT m.doc_id, u.tok
              |FROM m LEFT JOIN LATERAL (SELECT unnest(m.maybe_tokens) AS tok) u ON true
              |ORDER BY doc_id NULLS FIRST, tok NULLS FIRST""".stripMargin)),

    // ANSI-safe error handling — Spark 4 runs ANSI mode ON by default, so a
    // dirty-data pipeline MUST route fallible scalar ops through the try_*
    // family (null-on-failure) or the job dies on the first malformed row
    // at hour nine of a 100 TB pass. One row per event exercises the four
    // failure classes: division by a data-dependent zero, out-of-bounds
    // element access, unparseable timestamp text, non-numeric cast. The
    // oracle states the expected RESULT (CASE-guarded equivalents /
    // TRY_CAST) rather than mirroring function names — cross-engine
    // null-semantics equivalence is exactly what's under test. The divide
    // emits an IEEE-exact int/int double; the timestamp leaves as integer
    // µs. All map-side codegen'd — try_* wraps, not UDFs.
    "q_ansi_try_funcs" -> Q(
      t => t.events
        .select(col("event_id"), col("user_id"), col("event_type"),
          cents(col("value")).cast("long").as("c"))
        .select(
          col("event_id"),
          expr("try_divide(c, user_id % 7 - 3)").as("safe_div"),
          expr("try_element_at(sequence(1L, user_id % 5), 3)").as("elem3"),
          expr("unix_micros(try_to_timestamp(concat('2024-01-', lpad(cast(user_id % 40 as string), 2, '0'))))")
            .as("parsed_us"),
          expr("try_cast(concat(cast(user_id as string), case when event_type = 'error' then 'x' else '' end) as bigint)")
            .as("parsed_num"))
        .orderBy(col("event_id"), col("safe_div"), col("elem3"),
          col("parsed_us"), col("parsed_num")),
      Some("""WITH e AS (
              |  SELECT event_id, user_id, event_type,
              |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
              |  FROM events
              |)
              |SELECT event_id,
              |       CASE WHEN user_id % 7 - 3 = 0 THEN NULL
              |            ELSE CAST(c AS DOUBLE) / (user_id % 7 - 3) END AS safe_div,
              |       CASE WHEN user_id % 5 >= 3 THEN CAST(3 AS BIGINT) ELSE NULL END AS elem3,
              |       epoch_us(TRY_CAST(('2024-01-' || lpad(CAST(user_id % 40 AS VARCHAR), 2, '0'))
              |                         AS TIMESTAMP)) AS parsed_us,
              |       TRY_CAST((CAST(user_id AS VARCHAR) ||
              |                 CASE WHEN event_type = 'error' THEN 'x' ELSE '' END)
              |                AS BIGINT) AS parsed_num
              |FROM e
              |ORDER BY event_id NULLS FIRST, safe_div NULLS FIRST, elem3 NULLS FIRST,
              |         parsed_us NULLS FIRST, parsed_num NULLS FIRST""".stripMargin)))
}
