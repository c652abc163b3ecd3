package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the driver contract).
  *
  * Round-15 shape: per-STAGE attribution of `pipeline_embedding_corpus`
  * at the SCALING 100× point (200k embeddings, the routed SemDeDup
  * path), to name the stage that owns the ~1.0 final decade
  * (SCALING_r14: 20k → 200k = 14.3 s → 140.2 s). Session shape matches
  * graft.Scaling (local[4], 4 shuffle partitions, noop-write
  * materialization) so stage seconds sum comparably to the artifact's
  * whole-query point.
  */
object Prof {
  def time[A](label: String)(f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"[prof] $label%-44s $s%8.2f s")
    (r, s)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def mat(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    println("[prof] synthesizing the 100x corpus (200k embeddings) ...")
    val dir = Scaling.synthScale(spark, "/root/testdata/sf0.1", 100)

    time("warm (embeddings count)") {
      spark.read.parquet(s"$dir/embeddings.parquet").count()
    }

    (1 to 2).foreach { rep =>
      println(s"--- rep $rep: staged breakdown of the ROUTED pipeline @200k ---")
      val emb = Tables.embeddings(spark, dir)
      // stage 1: routed dedup pair generation (200k > lshMaxRows=5000 ->
      // the cluster-scoped SemDeDup route, exactly what the query runs)
      val (pairs, _) = time("cosineNearDupSemantic pairs (mat.)") {
        val p = operators.VectorOps
          .cosineNearDupSemantic(spark, emb, threshold = 0.4, nAssign = 2)
          .select(col("i").as("src"), col("j").as("dst")).localCheckpoint()
        p.count(); p
      }
      // stage 2: connected components over the dup pairs
      val (cc, _) = time("connectedComponents (mat.)") {
        val c = operators.GraphOps.connectedComponents(pairs)
          .select(col("node").as("vec_id"), col("label").as("canonical"))
          .localCheckpoint()
        c.count(); c
      }
      // stage 3: keep-canonical survivors, checkpointed like the query
      val (survivors, _) = time("survivors localCheckpoint") {
        emb.join(cc, Seq("vec_id"), "left_outer")
          .where(col("canonical").isNull || col("canonical") === col("vec_id"))
          .select(col("vec_id"), col("embedding"))
          .localCheckpoint()
      }
      println(s"[prof]   survivors = ${survivors.count()}")
      // stage 4: index build on the survivors (the query's fixed shape)
      val idx = graft.Scratch.dir("graft_prof")
      time("buildIvfPq (16 cells, 16x16 PQ)") {
        operators.VectorIndex.buildIvfPq(spark, survivors, idx,
          nCells = 16, m = 16, ks = 16)
      }
      // stage 5: serve the probe batch
      time("searchIvfPq (10 probes, mat.)") {
        mat(operators.VectorIndex.searchIvfPq(spark, idx, survivors,
          probes = emb.where(col("vec_id") < 10), k = 5, nProbe = 8,
          rerank = 8))
      }
    }

    // the whole query as Scaling times it, for the sum check
    (1 to 2).foreach { rep =>
      System.gc(); Thread.sleep(200)
      time(s"whole pipeline_embedding_corpus rep$rep") {
        mat(SparkEntry.queries("pipeline_embedding_corpus")(spark, dir))
      }
    }

    spark.stop()
  }
}
