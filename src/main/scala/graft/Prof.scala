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

    // pipeline_embedding_corpus staged breakdown, 3 reps
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep ---")
      val emb = Tables.embeddings(spark, sfDir)
      val pairs = time("cosineNearDupLsh (materialized)") {
        val p = operators.VectorOps.cosineNearDupLsh(spark, emb, threshold = 0.4)
          .select(col("i").as("src"), col("j").as("dst")).localCheckpoint()
        p.count(); p
      }
      val cc = time("connectedComponents (mat.)") {
        val c = operators.GraphOps.connectedComponents(pairs)
          .select(col("node").as("vec_id"), col("label").as("canonical")).localCheckpoint()
        c.count(); c
      }
      val survivors = emb.join(cc, Seq("vec_id"), "left_outer")
        .where(col("canonical").isNull || col("canonical") === col("vec_id"))
        .select(col("vec_id"), col("embedding"))
      val idx = graft.Scratch.dir("graft_prof")
      time("buildIvfPq") {
        operators.VectorIndex.buildIvfPq(spark, survivors, idx, nCells = 16, m = 8, ks = 16)
      }
      time("searchIvfPq") {
        operators.VectorIndex.searchIvfPq(spark, idx, survivors,
          probes = emb.where(col("vec_id") < 10), k = 5, nProbe = 8, rerank = 8).count()
      }
      pairs.unpersist(); cc.unpersist()
    }

    // whole-query timing as the bench sees it: 4 reps no-GC, 4 with GC
    (1 to 4).foreach { rep =>
      time(s"whole nogc rep$rep") {
        SparkEntry.queries("pipeline_embedding_corpus")(spark, sfDir).count()
      }
    }
    (1 to 4).foreach { rep =>
      System.gc(); Thread.sleep(200)
      time(s"whole gc rep$rep") {
        SparkEntry.queries("pipeline_embedding_corpus")(spark, sfDir).count()
      }
    }

    spark.stop()
  }
}
