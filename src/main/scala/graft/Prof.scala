package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the driver contract). */
object Prof {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm
    time("warm lineitem agg") {
      spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy("l_returnflag").count().collect()
    }

    // 1. CC breakdown on the plain long graph
    val edges = operators.GraphOps.equivEdges(spark, sfDir)
    time("equivEdges count")(edges.count())
    time("CC plain (total)") {
      operators.GraphOps.connectedComponents(edges).count()
    }
    time("CC plain again") {
      operators.GraphOps.connectedComponents(edges).count()
    }

    // 2. ingest write
    val m1 = java.nio.file.Files.createTempDirectory("prof").toString + "/m"
    val facts = time("eventsAsFacts localCheckpoint") {
      graft.model.FactStore.eventsAsFacts(spark, sfDir).localCheckpoint()
    }
    time("ingest write 1")(graft.model.FactStore.ingest(facts, m1))
    time("ingest write 2")(graft.model.FactStore.ingest(facts, m1))
    time("scanKind count") {
      graft.model.FactStore.scanKind(spark, m1, graft.model.FactKind.PageView).count()
    }

    // 3. pretraining pipeline stages
    val docs = Tables.documents(spark, sfDir)
    import graft.functions.TextFunctions._
    val q = docs.where(col("n_chars") >= 100 && size(tokens(col("text"))) >= 20)
    time("quality gate count")(q.count())
    val en = q.join(
      operators.TextOps.langid(q).where(col("pred_lang") === "en").select("doc_id"), Seq("doc_id"))
    time("langid+join count")(en.count())
    val exact = en
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
      .where(col("rn") === 1).drop("rn")
    val exactCp = time("exact dedup localCheckpoint")(exact.localCheckpoint())
    val sh = exactCp.select(col("doc_id"), explode(shingleHashes(col("text"), 3)).as("s"))
    val pairs = time("ngramJaccardPairs") {
      operators.TextOps.ngramJaccardPairs(sh, 0.1)
    }
    time("pairs count")(pairs.count())
    val cc = time("CC on dup pairs") {
      operators.GraphOps.connectedComponents(
        pairs.select(col("i").as("src"), col("j").as("dst"))).localCheckpoint()
    }
    time("final join count") {
      exactCp.join(cc.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left_outer")
        .where(col("label").isNull || col("label") === col("doc_id"))
        .count()
    }

    // 4. streaming window counts: 32 vs 8 shuffle partitions
    def streamWindow(parts: Int): Unit = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val defs = streaming.StreamViews.defs.find(_.name == "stream_window_counts").get
      defs.fn(spark, sfDir).count()
      spark.conf.set("spark.sql.shuffle.partitions", 32)
    }
    time("stream_window_counts @32")(streamWindow(32))
    time("stream_window_counts @8")(streamWindow(8))
    time("stream_window_counts @4")(streamWindow(4))

    // 5. ann_ivf
    time("ann_ivf") {
      SparkEntry.queries("ann_ivf")(spark, sfDir).count()
    }
    time("ann_ivf again") {
      SparkEntry.queries("ann_ivf")(spark, sfDir).count()
    }

    spark.stop()
  }
}
