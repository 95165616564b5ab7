package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Bloom-filter semi-join reduction — the classic 100 TB join lever: build
  * a compact bloom filter over the SMALL side's join keys, broadcast it,
  * and drop non-joinable fact rows BEFORE they enter the shuffle. The
  * shuffle then carries only (selectivity + fpp) of the fact table instead
  * of all of it; with a selective dimension predicate that is a 10-100×
  * exchange-volume cut for one broadcast of a few hundred KB.
  *
  * Correctness contract: `might_contain` has false POSITIVES only — every
  * truly-joinable row always passes — so `prefilter(fact).join(dim)` is
  * row-identical to `fact.join(dim)` (the exact join removes the false
  * positives). Catalog queries built on this therefore oracle against the
  * plain-join SQL, with no bloom modeling needed on the DuckDB side.
  * INNER/SEMI joins only: the filter discards non-joinable fact rows (and
  * null keys — `might_contain(null)` is null), which is exactly what a
  * fact-preserving OUTER join must keep, so prefiltering the preserved
  * side of an outer join changes its result. (This mirrors Spark's own
  * InjectRuntimeFilter, which only plants the filter on shuffle-join
  * sides where a semi-join reduction is legal.)
  *
  * Spark's own AQE runtime filter (`spark.sql.optimizer.runtime.bloomFilter
  * .enabled`) injects this same rewrite automatically when its size/
  * selectivity thresholds are met; this operator is the explicit form for
  * when the planner's creation-side thresholds don't fire (e.g. the dim is
  * small only AFTER a non-pushable predicate) or the build should be
  * shared/reused. Built on Spark's own `BloomFilterAggregate` /
  * `BloomFilterMightContain` expressions (the exact pair InjectRuntimeFilter
  * plants), reached through the graftbridge shim — the aggregate does
  * map-side partial builds and merges bitsets on the reduce side, so the
  * build itself is one narrow pass over the dim.
  */
object BloomPrefilter {

  /** Bloom build over `keys` (a single-column LONG DataFrame) as a 1-row
    * binary DataFrame. `expectedItems` sizes the bitset (default fpp 3%).
    */
  def build(keys: DataFrame, expectedItems: Long): DataFrame = {
    val child = ColumnBridge.expression(keys.col(keys.columns.head).cast("long"))
    val agg = new BloomFilterAggregate(child, expectedItems).toAggregateExpression()
    keys.agg(ColumnBridge.column(agg).as("bloom"))
  }

  /** `fact` reduced to rows whose `factKey` might join `dimKeys` — a
    * superset of the truly-joinable rows (false positives only). The bloom
    * build rides in as an uncorrelated scalar subquery (the same carrier
    * InjectRuntimeFilter plants — `might_contain` rejects a plain attribute
    * as its bloom side), so it executes once and reaches every task as a
    * literal; the probe itself is a codegen'd xxhash64 check per row.
    */
  def prefilter(fact: DataFrame, factKey: String, dimKeys: DataFrame,
      expectedItems: Long): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.ScalarSubquery
    import org.apache.spark.sql.graftbridge.PlanBridge
    val bloomScalar = ScalarSubquery(PlanBridge.analyzed(build(dimKeys, expectedItems)))
    val might = ColumnBridge.column(BloomFilterMightContain(
      bloomScalar, ColumnBridge.expression(fact.col(factKey).cast("long"))))
    fact.filter(might)
  }
}
