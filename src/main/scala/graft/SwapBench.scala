package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-benchmark for the per-bucket TWO-RENAME swap that replaced
  * dynamic partition overwrite in LabelStore folds (round 11). The
  * driver bench attributed stream_cc's +32% to the swap protocol but
  * never measured the commit step in isolation — this main does, so the
  * attribution is a number and a future "optimization" knows what it
  * would actually buy before re-opening the crash window (a dynamic
  * partition overwrite's job commit DELETES a bucket's files before
  * renaming replacements in; a crash there leaves the bucket EMPTY).
  *
  * Both paths write the SAME changed-bucket content through the same
  * shuffle-free plan; the measured delta is pure commit mechanics:
  *
  *   - swap: stage to `dir.tmp`, then per changed bucket rename the
  *     live dir aside and the staged dir in, then delete leftovers
  *     (the LabelStore.fold tail, ~3 metadata ops per changed bucket);
  *   - overwrite: `partitionOverwriteMode=dynamic` straight into the
  *     store (the pre-r11 commit).
  *
  * At 100 TB the comparison tilts further toward the swap: rename cost
  * is O(changed buckets) metadata ops regardless of bucket SIZE, while
  * the crash exposure of the overwrite grows with everything. Usage:
  * `sbt "runMain graft.SwapBench"` — prints one JSON line; the measured
  * numbers live in BASELINE.md's round-12 notes.
  */
object SwapBench {

  def main(args: Array[String]): Unit = {
    val iters = sys.env.get("SPARK_GRAFT_SWAPBENCH_ITERS")
      .flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(10)
    val nBuckets = 8
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val f = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)

    val root = java.nio.file.Files.createTempDirectory("graft_swapbench").toString
    // fixture-scale bucket content (the commit step under test is
    // size-independent metadata work; rows only have to exist)
    val rows = spark.range(0, 4096)
      .select(col("id").as("node"), col("id").as("label"),
        pmod(hash(col("id")), lit(nBuckets)).as("bucket"))
      .localCheckpoint() // one fixed input; neither path pays its build

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }

    // per-bucket two-rename swap: the LabelStore.fold commit tail, all
    // nBuckets changed (worst case — every fold pays the full rename set)
    val swapDir = s"$root/swap"
    rows.write.partitionBy("bucket").parquet(swapDir) // seed the store
    val swapTimes = (1 to iters).map { _ =>
      timed {
        val tmp = s"$swapDir.tmp"
        rows.write.partitionBy("bucket").parquet(tmp)
        val old = new Path(s"$swapDir.old")
        f.mkdirs(old)
        f.create(new Path(old, "_graft_perbucket"), true).close()
        (0 until nBuckets).foreach { b =>
          val live = new Path(swapDir, s"bucket=$b")
          val staged = new Path(tmp, s"bucket=$b")
          if (f.exists(staged)) {
            if (f.exists(live))
              require(f.rename(live, new Path(old, s"bucket=$b")))
            require(f.rename(staged, live))
          }
        }
        f.delete(old, true)
        f.delete(new Path(tmp), true)
      }
    }

    // dynamic partition overwrite: the pre-r11 commit (same content,
    // same plan, job commit replaces the touched partitions in place)
    val owDir = s"$root/overwrite"
    rows.write.partitionBy("bucket").parquet(owDir)
    val owTimes = (1 to iters).map { _ =>
      timed {
        rows.write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(owDir)
      }
    }

    val swapMed = median(swapTimes)
    val owMed = median(owTimes)
    val deltaPerBucketMs = (swapMed - owMed) / nBuckets * 1000
    println(f"""{"metric":"swapbench","iters":$iters,"buckets":$nBuckets,"""
      + f""""swap_sec_per_fold":$swapMed%.4f,"overwrite_sec_per_fold":$owMed%.4f,"""
      + f""""delta_sec_per_fold":${swapMed - owMed}%.4f,"delta_ms_per_bucket":$deltaPerBucketMs%.2f}""")
    spark.stop()
  }
}
