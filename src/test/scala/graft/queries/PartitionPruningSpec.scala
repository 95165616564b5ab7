package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Data-layout contract: the engine's curation outputs are meant to be
  * written partitioned by coarse selectors (lang, source, date) so that
  * downstream readers scan only the slices they ask for. This spec pins
  * both halves of that bet on a real partitioned write of the documents
  * table:
  *
  *  1. a reader filtering on the partition column prunes at PLANNING time
  *     (PartitionFilters populated, pruned input files < total), and
  *  2. a data-column filter still reaches the scan as a pushed filter
  *     rather than a post-scan Filter-only plan.
  *
  * At 100 TB partition pruning is the difference between reading one
  * lang's slice and reading the corpus; nothing else in the suite asserted
  * Spark's planner actually gets to prune our layouts.
  */
class PartitionPruningSpec extends SparkSpec {

  test("lang-partitioned write prunes partitions and pushes data filters") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ppart").toString
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)

    val langs = docs.select("lang").distinct().count()
    assert(langs > 1, "need multiple partitions for pruning to be visible")

    val one = spark.read.parquet(dir)
      .filter(col("lang") === "en" && col("n_chars") > 100)
      .select(col("doc_id"), col("n_chars"))
    one.collect()
    val scan = one.queryExecution.executedPlan.toString

    // 1. partition pruning happened at planning time
    assert(scan.contains("PartitionFilters: [isnotnull(lang"),
      s"expected a partition filter on lang in the scan:\n$scan")
    // 2. the data-column predicate reached the parquet reader
    assert(scan.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,100)]"),
      s"expected n_chars pushdown into the scan:\n$scan")
    // 3. only the en partition's files were actually read (inputFiles
    // lists the relation pre-pruning, so ask the scan's runtime metric)
    val allFiles = spark.read.parquet(dir).inputFiles.length
    val readFiles = one.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numFiles")).map(_.value).sum
    assert(readFiles > 0 && readFiles < allFiles,
      s"pruned scan read $readFiles of $allFiles files - no pruning happened")
  }
}
