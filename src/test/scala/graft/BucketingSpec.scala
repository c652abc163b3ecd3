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

  test("bucketed master store: the person-key id-rewrite join shuffles only the canonical-id side") {
    import graft.model.FactStore
    import graft.operators.GraphOps
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val root = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    try {
      spark.sql("DROP TABLE IF EXISTS b_facts")
      val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path("spark-warehouse/b_facts"), true)

      val facts = FactStore.eventsAsFacts(spark, sf0001)
      val keyExpr = GraphOps.personKey(col("pageView.person"))
      FactStore.ingestBucketed(facts, "b_facts", s"$root/master", keyExpr, nBuckets = 8)
      // the canonical-id map arrives as its own (non-bucketed) relation,
      // as it does from a CC run
      facts.select(keyExpr.as("node")).distinct()
        .withColumn("label", concat(lit("c:"), col("node")))
        .write.parquet(s"$root/cc")
      val cc = spark.read.parquet(s"$root/cc")

      def rewrite(factSide: org.apache.spark.sql.DataFrame) = factSide
        .where(col("kind") === graft.model.FactKind.PageView)
        .join(cc, col("person_key") === col("node"), "left_outer")
        .select(coalesce(col("label"), col("person_key")).as("person"),
          col("pageView.page.url").as("url"))

      val bucketed = rewrite(spark.table("b_facts"))
      bucketed.collect()
      // plain store: same facts + key column, no bucketing metadata
      facts.withColumn("person_key", keyExpr).write.parquet(s"$root/plain")
      val plain = rewrite(spark.read.parquet(s"$root/plain"))
      plain.collect()

      // AQE's plan string repeats exchanges under "== Initial Plan ==" —
      // count only the final plan
      def exchanges(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
          .linesIterator.count(_.contains("Exchange"))
      // bucketed: only the cc side shuffles; plain: both sides do
      assert(exchanges(bucketed) == 1,
        s"expected the single cc-side exchange:\n${bucketed.queryExecution.executedPlan}")
      assert(exchanges(plain) == 2,
        s"the non-bucketed control should shuffle both sides:\n${plain.queryExecution.executedPlan}")
      assert(bucketed.queryExecution.executedPlan.toString.contains("Bucketed: true"),
        "the fact-side scan must be a bucketed scan")
      assert(bucketed.exceptAll(plain).isEmpty && plain.exceptAll(bucketed).isEmpty)

      spark.sql("DROP TABLE IF EXISTS b_facts")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
