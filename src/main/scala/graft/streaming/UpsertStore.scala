package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucket-partitioned LSM-flavored upsert store for streamed serving
  * views (`stream_upsert`'s maintainer).
  *
  * The round-9 form re-read and re-wrote the WHOLE serving store every
  * microbatch (anti-join + union + swap) — at 100 TB the store is the
  * full keyspace and a microbatch touches a sliver, so whole-store I/O
  * per batch is the same scale bug the label store had. Here a fold is
  * pure APPEND: the change batch lands as new files in its keys' hash
  * buckets carrying a monotone `_seq` (Structured Streaming's batchId)
  * and a `_deleted` tombstone flag; nothing existing is read, rewritten
  * or renamed. Reads resolve each key to its highest-_seq version and
  * drop tombstones; [[compact]] is the offline maintenance pass that
  * rewrites buckets down to one live row per key (the batch layer to
  * the folds' speed layer — the Lambda shape at the storage level).
  *
  * Crash story, simpler than a swap protocol because nothing is ever
  * deleted on the write path:
  *
  *   - a fold that crashes mid-commit leaves at most a PREFIX of the
  *     batch's files visible; every prior version remains untouched, so
  *     reads stay correct (they just don't see the half-landed batch);
  *   - Structured Streaming replays an uncommitted batch with the SAME
  *     batchId, so the retry writes rows with the same `_seq` — reads
  *     collapse exact (key, _seq) duplicates, making replay idempotent;
  *   - [[compact]] rewrites in place only during maintenance windows
  *     (same discipline as FactStore/VectorIndex consolidate).
  */
object UpsertStore {

  /** Hash buckets for the keyspace; FIXED for the store's life (it is
    * the partitioning folds append into). Production sizes this so a
    * compacted bucket is ~128 MB.
    */
  val DefaultBuckets = 8

  private def bucketCol(keys: Seq[String], n: Int): Column =
    pmod(hash(keys.map(col): _*), lit(n))

  /** Append one change batch: `deletedCol` (if set) names a Boolean
    * column of `batch` marking tombstone rows — it is consumed into the
    * store's `_deleted` flag (NULL = not deleted: a nullable CDC op
    * flag must not silently drop live rows through three-valued
    * `!null`), so payload schemas stay identical across folds with and
    * without deletes. `seq` must be monotone across folds —
    * foreachBatch's batchId is exactly that. Writes ONLY into the batch
    * keys' bucket directories; existing files are never touched.
    *
    * Contract: a batch carries AT MOST ONE row per key. Rows sharing a
    * key within one fold also share `_seq`, and the read-side argmax
    * would resolve them arbitrarily — a DataFrame has no row order to
    * define "last write wins" inside a batch. Pre-aggregate multi-op
    * CDC batches to their final per-key state before folding (what a
    * keyed CDC feed does anyway).
    */
  def fold(spark: SparkSession, dir: String, batch: DataFrame,
      keys: Seq[String], seq: Long, deletedCol: Option[String] = None,
      nBuckets: Int = DefaultBuckets): Unit = {
    // an empty batch must not create an empty directory (a dir holding
    // only _SUCCESS fails schema inference on the next read)
    if (batch.isEmpty) return
    val withDel = deletedCol match {
      case Some(c) => batch.withColumn(c, coalesce(col(c), lit(false)))
        .withColumnRenamed(c, "_deleted")
      case None => batch.withColumn("_deleted", lit(false))
    }
    withDel
      .withColumn("_seq", lit(seq))
      .withColumn("bucket", bucketCol(keys, nBuckets))
      .write.mode(SaveMode.Append).partitionBy("bucket").parquet(dir)
  }

  /** One-pass latest-version resolve: max_by over the non-key columns
    * keyed on `_seq` — a map-side-combinable argmax aggregate, not a
    * per-key window and not a max+self-join (which would scan the store
    * twice). One row per key by construction, so the exact duplicates a
    * replayed fold leaves (same key, same _seq, same content) collapse
    * for free.
    */
  private def latestPerKey(rows: DataFrame, keys: Seq[String]): DataFrame = {
    val carried = rows.columns.filterNot(keys.contains)
    rows.groupBy(keys.map(col): _*)
      .agg(max_by(struct(carried.map(col): _*), col("_seq")).as("_r"))
      .select(keys.map(col) ++ carried.map(c => col(s"_r.$c").as(c)): _*)
  }

  /** Current state: latest version per key, tombstones dropped,
    * bookkeeping columns removed. None if the store has never been
    * written.
    */
  def read(spark: SparkSession, dir: String, keys: Seq[String]): Option[DataFrame] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(dir))) None
    else Some(latestPerKey(spark.read.parquet(dir), keys)
      .where(!col("_deleted"))
      .drop("_seq", "_deleted", "bucket"))
  }

  /** Rewrite every bucket down to its live rows (latest version per
    * key, tombstoned keys dropped entirely — safe because their
    * shadowed versions are dropped in the same pass). `_seq` and
    * `_deleted` are kept so later folds keep winning and the on-disk
    * schema stays uniform. Dynamic partition overwrite replaces each
    * bucket atomically-per-partition; a bucket whose rows are ALL
    * shadowed/tombstoned has nothing in the written frame and keeps its
    * old files (reads stay correct — its latest versions are
    * tombstones — and the next compaction after a live insert reclaims
    * it). Run in maintenance windows, not under live writers.
    */
  def compact(spark: SparkSession, dir: String, keys: Seq[String]): Unit = {
    val live = latestPerKey(spark.read.parquet(dir), keys)
      .where(!col("_deleted"))
      // lineage cut: the plan reads the directory being overwritten
      .localCheckpoint()
    live.write
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite)
      .partitionBy("bucket")
      .parquet(dir)
  }
}
