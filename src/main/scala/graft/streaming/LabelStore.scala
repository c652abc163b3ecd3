package graft.streaming

import graft.operators.GraphOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucket-partitioned persistent label store for the speed-layer
  * connected-components maintainer (`stream_cc`).
  *
  * The round-9 form rewrote the WHOLE node-sized labeling every
  * microbatch — at 100 TB the labeling is billions of rows and a
  * microbatch touches a sliver of them, so whole-store I/O per batch is
  * the scale bug. Here the store is hash-partitioned by node into
  * `bucket=` directories and each fold rewrites ONLY the buckets that
  * contain a changed or new label, via dynamic partition overwrite;
  * untouched buckets' files are left physically identical
  * (StreamSessionizeSpec^W LabelStoreSpec asserts byte-for-byte).
  *
  * Crash story (replaces the whole-dir StoreSwap for this store —
  * finer granularity needs a different argument):
  *
  *   - Connectivity facts are MONOTONE: an edge once seen never becomes
  *     false, and CC labels only ever decrease (min-id labeling). A
  *     torn dynamic overwrite — some buckets new, some old, or a bucket
  *     holding both an old and a new row for one node — is therefore
  *     still a VALID connectivity compression: every (node → label)
  *     star edge it contains is true of the accumulated graph, so
  *     folding the next batch from it converges to the same labeling.
  *   - [[read]] collapses any duplicate rows a torn commit left with
  *     `min(label)` per node — labels-only-decrease makes min() "the
  *     newest value", an idempotent repair costing one node-keyed
  *     aggregation that Spark prunes to a partial-agg when the store is
  *     read bucket-aligned.
  *   - The streaming engine replays an uncommitted microbatch on
  *     restart; re-folding the same edges is convergent by the same
  *     monotonicity.
  */
object LabelStore {

  /** Buckets for the labeling. At the declared fixture scale a handful;
    * production sizes this so a bucket's parquet is ~128 MB
    * (nodes/bucket × ~16 B). Must stay FIXED across the store's life —
    * it is the hash partitioning the delta detection keys on.
    */
  val DefaultBuckets = 8

  private def bucketCol(node: org.apache.spark.sql.Column, n: Int) =
    pmod(hash(node), lit(n))

  /** Current labeling: (node, label), torn-commit duplicates repaired by
    * the min-fold. Returns None if the store has never been written.
    */
  def read(spark: SparkSession, dir: String): Option[DataFrame] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(dir))) None
    else Some(spark.read.parquet(dir)
      .groupBy("node").agg(min("label").as("label")))
  }

  /** Fold one edge batch into the store, AFFECTED-COMPONENT scoped:
    * only the components the batch touches are read into the CC
    * iteration, and only the buckets holding a changed label are
    * rewritten. The store is never shuffle-aggregated whole:
    *
    *   1. seed labels = labels of the batch's nodes (store scan with a
    *      broadcast batch-node join — no store shuffle);
    *   2. affected = every store row labeled with a seed label — the
    *      complete membership of the touched components (one more
    *      broadcast-semi scan), materialized once, AFFECTED-sized;
    *   3. incremental CC over (affected stars ∪ batch edges) — the
    *      iteration's shuffles are affected-sized, never store-sized;
    *   4. changed buckets = buckets of relabeled/new nodes (bounded by
    *      the bucket count — a driver-safe collect that becomes the
    *      static partition filter for the rewrite read);
    *   5. new bucket content = min-per-node over (current bucket rows ∪
    *      scoped-CC labels): the labels-only-decrease invariant makes
    *      min() correct even against rows the scoped view did not pull
    *      in (a torn store can leave a stale seed label whose scoped
    *      component misses a node's newest link; the node's newer —
    *      smaller — on-disk label then wins the min and no connectivity
    *      is ever forgotten). Changed-bucket-sized shuffle; dynamic
    *      partition overwrite replaces exactly those buckets.
    *
    * Cost shape per fold at 100 TB: two column-pruned store SCANS (the
    * affected discovery cannot be partition-pruned — membership of a
    * touched component lives in arbitrary buckets) plus one
    * partition-pruned read of the changed buckets; every SHUFFLE and
    * materialization is affected- or changed-bucket-sized. The
    * node-sized groupBy the serving [[read]] performs happens once at
    * serve time, not per microbatch.
    */
  def fold(spark: SparkSession, dir: String, edges: DataFrame,
      nBuckets: Int = DefaultBuckets): Unit = {
    // an empty batch folds to nothing — and must not bootstrap an
    // empty DIRECTORY (a dir holding only _SUCCESS fails schema
    // inference on the next read; cheap limit-1 probe)
    if (edges.isEmpty) return
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(dir))) {
      // bootstrap: full labeling, all buckets
      GraphOps.connectedComponents(edges)
        .withColumn("bucket", bucketCol(col("node"), nBuckets))
        .write.partitionBy("bucket").parquet(dir)
    } else {
      val store = spark.read.parquet(dir).select("node", "label", "bucket")
      val batchNodes = edges.select(col("src").as("node"))
        .unionAll(edges.select(col("dst").as("node"))).distinct()
      val seedLabels = store.join(broadcast(batchNodes), Seq("node"))
        .select("label").distinct()
      val affected = store
        .join(broadcast(seedLabels), Seq("label"), "left_semi")
        .select("node", "label")
        .localCheckpoint() // feeds the CC iterations AND the change diff
      val updated = GraphOps.connectedComponentsIncremental(affected, edges)
      val oldMin = affected.groupBy("node").agg(min("label").as("old_label"))
      val changedBuckets = updated
        .join(oldMin, Seq("node"), "left_outer")
        .where(col("old_label").isNull || col("old_label") =!= col("label"))
        .select(bucketCol(col("node"), nBuckets).as("bucket")).distinct()
        .collect().map(_.getInt(0)).toSeq
      if (changedBuckets.nonEmpty) {
        val updatedB = updated
          .withColumn("bucket", bucketCol(col("node"), nBuckets))
          .where(col("bucket").isin(changedBuckets: _*))
        val toWrite = store
          .where(col("bucket").isin(changedBuckets: _*)) // partition-pruned
          .unionByName(updatedB.select("node", "label", "bucket"))
          .groupBy("node", "bucket").agg(min("label").as("label"))
          .select("node", "label", "bucket")
          // localCheckpoint before the overwrite: the plan READS the
          // buckets it is about to replace
          .localCheckpoint()
        toWrite.write
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite")
          .partitionBy("bucket")
          .parquet(dir)
      }
    }
  }
}
