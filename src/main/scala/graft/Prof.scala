package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Scaling, Sessions, Tables}
import graft.functions.TextFunctions.{stopwordCount, tokens, shingleHashes}

/** Round-agnostic profiling harness (not part of the driver contract;
  * r15 ADVICE low #3 retired the rewrite-per-round pattern).
  *
  * Usage: `graft.operators.Prof <target> [factors]`
  *   - `<target>` = a named stage profile (`kbi_stages` — the r15
  *     per-stage attribution of near_dedup_keep_best_incremental), or
  *     ANY declared query name from SparkEntry.queries for whole-query
  *     reps over the synthesized corpus — the generic attribution probe
  *     a new round reaches for first.
  *   - `[factors]` = comma-separated synthScale factors over sf0.1
  *     (default `100,200`).
  *
  * Session shape matches graft.Scaling (local[4], 4 shuffle partitions,
  * noop-write materialization) so seconds compare to SCALING_r{N}
  * whole-query points.
  */
object Prof {
  def time[A](label: String)(f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"[prof] $label%-52s $s%8.2f s")
    (r, s)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // shared recipe (graft.Sessions) so profiled plans == benched plans
    val spark = Sessions.base(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def mat(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val target = args.headOption.getOrElse("kbi_stages")
    val factors = args.drop(1).headOption.getOrElse("100,200")
      .split(",").map(_.toInt)
    if (target != "kbi_stages" && !graft.SparkEntry.queries.contains(target))
      sys.error(s"unknown Prof target '$target': want 'kbi_stages' or a " +
        "declared query name from SparkEntry.queries")

    factors.foreach { factor =>
      println(s"[prof] synthesizing the ${factor}x corpus (${factor * 5000} docs) ...")
      val dir = Scaling.synthScale(spark, "/root/testdata/sf0.1", factor)
      time("warm (documents count)") {
        spark.read.parquet(s"$dir/documents.parquet").count()
      }
      target match {
        case "kbi_stages" => kbiStages(spark, dir, factor, mat)
        case q =>
          (1 to 2).foreach { rep =>
            System.gc(); Thread.sleep(200)
            time(s"$q @${factor}x rep$rep") {
              mat(graft.SparkEntry.queries(q)(spark, dir))
            }
          }
      }
    }

    spark.stop()
  }

  /** The r15 per-stage attribution of near_dedup_keep_best_incremental:
    * names which stage owns a scaling octave (SCALING_r15's 500k → 1M
    * point) before any band/cap retune.
    */
  private def kbiStages(spark: SparkSession, dir: String, factor: Int,
      mat: org.apache.spark.sql.DataFrame => Unit): Unit = {
    val threshold = 0.1
    val qualityScore =
      round(stopwordCount(col("text")) / size(tokens(col("text"))).cast("double"), 4)

    locally {
      (1 to 2).foreach { rep =>
        println(s"--- rep $rep: staged keep_best_incremental @${factor * 5000} docs ---")
        val docs = Tables.documents(spark, dir)
        val isNew = col("doc_id") % 4 === 0

        // stage 1: the one corpus-wide shingle pass, persisted (the
        // query's cache every later stage scans)
        val (hashed, _) = time("shingle pass + persist (mat.)") {
          val h = docs
            .select(col("doc_id"), isNew.as("is_new"),
              shingleHashes(col("text"), 3).as("hs"))
            .where(col("hs").isNotNull)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
          h.count(); h
        }
        try {
          val docsQ = docs.select(col("doc_id"), isNew.as("is_new"),
            qualityScore.as("q"))

          // stage 2: prior-state pair generation over the EXISTING 3/4
          // (routed: >20k rows -> banded minhash + exact verify)
          val (pairsE, _) = time("pairsE routed (existing 3/4, mat.)") {
            val p = NearDedup.routedJaccardPairsFromHashes(
              hashed.where(!col("is_new")).select("doc_id", "hs"), threshold)
              .select(col("i").as("src"), col("j").as("dst")).localCheckpoint()
            println(s"[prof]   pairsE = ${p.count()}")
            p
          }
          // stage 3: prior labeling
          val (labels, _) = time("CC(pairsE) + localCheckpoint") {
            val l = GraphOps.connectedComponents(pairsE).localCheckpoint()
            l.count(); l
          }
          // stage 4: prior kept table (argmax over existing)
          val (keptPrior, _) = time("keptPrior argmax (mat.)") {
            val k = docsQ.where(!col("is_new"))
              .join(labels.withColumnRenamed("node", "doc_id"),
                Seq("doc_id"), "left_outer")
              .select(col("doc_id"), col("q"),
                coalesce(col("label"), col("doc_id")).as("cluster"))
              .groupBy("cluster")
              .agg(max_by(struct(col("doc_id"), col("q")),
                struct(col("q"), (-col("doc_id")).as("nid"))).as("best"))
              .select(col("cluster"), col("best.doc_id").as("doc_id"),
                col("best.q").as("q"))
              .localCheckpoint()
            k.count(); k
          }
          // stage 5: the nightly absorb's batch-touching pairs
          val (pairsNew, _) = time("pairsNew routedIncrementalPairs (mat.)") {
            val p = NearDedup.routedIncrementalPairs(hashed, threshold)
              .localCheckpoint()
            println(s"[prof]   pairsNew = ${p.count()}")
            p
          }
          // stage 6: incremental CC absorb
          val (updated, _) = time("incremental CC + localCheckpoint") {
            val u = GraphOps.connectedComponentsIncremental(labels, pairsNew)
              .localCheckpoint()
            u.count(); u
          }
          // stage 7: affected discovery + re-argmax + passthrough + final
          time("tail (affected/argmax/passthrough, mat.)") {
            val affected = updated
              .join(labels.withColumnRenamed("label", "old_label"),
                Seq("node"), "left_outer")
              .where(col("old_label").isNull || col("old_label") =!= col("label"))
              .select("label").distinct()
            val keptAffected = updated
              .join(broadcast(affected), Seq("label"), "left_semi")
              .select(col("node").as("doc_id"), col("label").as("cluster"))
              .join(docsQ.select("doc_id", "q"), "doc_id")
              .groupBy("cluster")
              .agg(max_by(struct(col("doc_id"), col("q")),
                struct(col("q"), (-col("doc_id")).as("nid"))).as("best"))
              .select(col("cluster"), col("best.doc_id").as("doc_id"),
                col("best.q").as("q"))
            val clusterNewLabel = updated
              .withColumnRenamed("node", "cluster")
              .withColumnRenamed("label", "new_label")
            val keptUntouched = keptPrior
              .join(clusterNewLabel, Seq("cluster"), "left_outer")
              .join(broadcast(affected.withColumnRenamed("label", "al")),
                coalesce(col("new_label"), col("cluster")) === col("al"), "left_anti")
              .select("cluster", "doc_id", "q")
            val newSingles = docsQ.where(col("is_new"))
              .join(updated.withColumnRenamed("node", "doc_id"),
                Seq("doc_id"), "left_anti")
              .select(col("doc_id").as("cluster"), col("doc_id"), col("q"))
            mat(keptUntouched.unionByName(keptAffected).unionByName(newSingles)
              .select(col("doc_id"), col("q")).orderBy("doc_id"))
          }
        } finally hashed.unpersist()
      }

      // the whole query as Scaling times it, for the sum check
      (1 to 2).foreach { rep =>
        System.gc(); Thread.sleep(200)
        time(s"whole near_dedup_keep_best_incremental rep$rep") {
          mat(graft.SparkEntry.queries("near_dedup_keep_best_incremental")(spark, dir))
        }
      }
    }
  }
}
