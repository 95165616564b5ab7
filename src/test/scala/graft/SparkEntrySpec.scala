package graft

class SparkEntrySpec extends SparkSpec {

  test("flagship entry returns ranked regional revenue (driver smoke contract)") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSeq == Seq("r_name", "order_year", "revenue", "rank_in_region"))
    assert(rows.forall(_.getAs[Int]("rank_in_region") <= 3))
  }

  test("every query name has unique entry; every oracle key exists in queries") {
    val qs = SparkEntry.queries
    val oracle = SparkEntry.oracleSql
    assert(qs.nonEmpty)
    assert(oracle.keySet.subsetOf(qs.keySet))
  }

  test("every oracle-backed query emits only atomic output columns") {
    // The driver's correctness harness sorts result frames with pandas,
    // which cannot factorize array/struct/map-typed object columns
    // (TypeError: unhashable type). Any nested value must be rendered to a
    // string (array_join / to_json) before it leaves the query.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val oracleBacked = SparkEntry.oracleSql.keySet
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => oracleBacked.contains(name) }
      .flatMap { case (name, fn) =>
        fn(spark, sf()).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
      }
    assert(offenders.isEmpty, s"non-atomic output columns reach the driver's " +
      s"pandas sort: ${offenders.mkString("; ")}")
  }

  test("all queries run non-empty at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        if (fn(spark, sf()).limit(1).count() == 0) Some(s"$name: empty") else None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(100)}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
