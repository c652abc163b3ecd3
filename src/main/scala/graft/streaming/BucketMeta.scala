package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The `_graft_buckets` bucket-count sidecar shared by the
  * bucket-partitioned serving stores (UpsertStore, LabelStore).
  *
  * A store self-describes its hash-bucket modulus so point reads never
  * have to TRUST a caller-supplied count — a wrong one hashes keys into
  * buckets the partition filter then excludes, and an existing key
  * silently resolves to nothing. Counting `bucket=` dirs is NOT a
  * substitute: never-written buckets have no directory, so a sparse
  * store would under-count. The underscore prefix keeps the file
  * invisible to Spark's parquet file index.
  *
  * Durability: the sidecar is written to a temp sibling and RENAMED into
  * place — a bare create-write-close at the final path has a window
  * where a crash leaves an empty/truncated file that would poison every
  * later fold/lookup/compact with a parse error, the one state the
  * stores' crash story couldn't self-recover from. [[read]] is
  * correspondingly tolerant: an unparsable sidecar reads as ABSENT (the
  * caller falls back to an explicit count), and the next [[write]]
  * replaces it.
  */
private[graft] object BucketMeta {

  private def metaPath(root: String) = new Path(root, "_graft_buckets")

  private def fs(spark: SparkSession) =
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)

  /** The store's recorded bucket count; None if the sidecar is absent
    * OR unreadable (empty/truncated/non-numeric — a torn pre-rename
    * write from an older version, healed by the next [[write]]).
    */
  def read(spark: SparkSession, root: String): Option[Int] = {
    val f = fs(spark)
    val p = metaPath(root)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val s =
        try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
        finally in.close()
      scala.util.Try(s.toInt).toOption.filter(_ > 0)
    }
  }

  /** Record `n` if the store has no (readable) sidecar yet; an existing
    * parsable sidecar wins (first write pins the modulus — folds enforce
    * equality against it). Temp-then-rename so no crash point leaves a
    * half-written file at the final path; an unparsable leftover at the
    * destination is healed by an OVERWRITING rename (FileContext
    * `Options.Rename.OVERWRITE` — atomic where the filesystem's rename
    * is), so there is never an absent-sidecar window a concurrent
    * reader could mistake for a pre-sidecar store.
    */
  def write(spark: SparkSession, root: String, n: Int): Unit = {
    require(n > 0, s"bucket count must be positive, got $n")
    if (read(spark, root).isEmpty) {
      val f = fs(spark)
      val p = metaPath(root)
      val tmp = new Path(root, "_graft_buckets.tmp")
      val out = f.create(tmp, true)
      try out.write(n.toString.getBytes("UTF-8")) finally out.close()
      org.apache.hadoop.fs.FileContext
        .getFileContext(spark.sparkContext.hadoopConfiguration)
        .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
  }
}
