package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `Partitioning.nullSkewLeftJoin` must be RESULT-IDENTICAL to the plain
  * left outer join (the q_join_null_skew oracle proves it on real data;
  * this pins the synthetic edge shapes), while keeping null-key rows out
  * of the join subtree entirely — the property that deletes the
  * hash(null) hot reducer at scale.
  */
class NullSkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private val right = Seq((1L, "a"), (2L, "b"), (3L, "c"))
    .toDF("k", "v")

  private def check(left: org.apache.spark.sql.DataFrame): Unit = {
    val got = Partitioning.nullSkewLeftJoin(left, right, "k")
      .orderBy("id").collect().map(r => (r.getAs[Any]("id"), r.getAs[Any]("k"), r.getAs[Any]("v")))
    val want = left.join(right, Seq("k"), "left")
      .orderBy("id").collect().map(r => (r.getAs[Any]("id"), r.getAs[Any]("k"), r.getAs[Any]("v")))
    assert(got.sameElements(want), s"got=${got.toSeq}\nwant=${want.toSeq}")
  }

  test("matches plain left join: mixed null / matched / unmatched keys") {
    check(Seq((10L, Some(1L)), (11L, None), (12L, Some(99L)), (13L, None),
      (14L, Some(3L))).toDF("id", "k").select(col("k"), col("id")))
  }

  test("matches plain left join: all keys null") {
    check(Seq((20L, Option.empty[Long]), (21L, None)).toDF("id", "k")
      .select(col("k"), col("id")))
  }

  test("matches plain left join: no keys null") {
    check(Seq((30L, Some(1L)), (31L, Some(2L))).toDF("id", "k")
      .select(col("k"), col("id")))
  }

  test("null-key rows do not reach the join subtree") {
    // Parquet-backed (a tiny local relation would be constant-folded into
    // a LocalRelation and the filter evaluated at plan time).
    val df = graft.queries.AllQueries.all("q_join_null_skew")
      .run(graft.Tables(spark, sf("sf0.001")))
    val joinNodes = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joinNodes.nonEmpty)
    // The join's left input must carry the IsNotNull filter on the
    // derived key — the null stream enters only via the Union above the
    // join, so the scan feeding the join never shuffles null keys.
    val joinSide = joinNodes.head.left.toString
    assert(joinSide.toLowerCase.contains("isnotnull"),
      s"join input should filter nulls, got:\n$joinSide")
  }
}
