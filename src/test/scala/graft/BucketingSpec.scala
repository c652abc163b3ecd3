package graft



import org.apache.spark.sql.functions._

/** Co-located (bucketed) joins — the 100 TB answer to repeated fact⋈fact
  * joins on the same key (SURVEY.md §0 design notes: "co-locate joins via
  * bucketing"): both sides pre-bucketed by the join key join without any
  * Exchange.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join runs with no shuffle and equal results") {
    // at fixture scale Spark would broadcast the join and bucketing never
    // engages; force the sort-merge path that a real fact⋈fact join takes
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    // warehouse.dir is static; managed tables land in ./spark-warehouse
    // (gitignored). The in-memory catalog is session-scoped, so also
    // remove stale table directories a crashed prior run left behind.
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    Seq("b_orders", "b_lineitem").foreach { t =>
      fs.delete(new org.apache.hadoop.fs.Path(s"spark-warehouse/$t"), true)
    }

    Tables.orders(spark, sf0001)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    Tables.lineitem(spark, sf0001)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("total"))

    joined.collect()
    val direct = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("total"))
    direct.collect()

    def exchanges(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange"))
    // the bucketed join must eliminate the two join-side shuffles
    assert(exchanges(joined) < exchanges(direct),
      s"bucketed=${exchanges(joined)} direct=${exchanges(direct)}")

    assert(joined.exceptAll(direct).isEmpty && direct.exceptAll(joined).isEmpty)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
