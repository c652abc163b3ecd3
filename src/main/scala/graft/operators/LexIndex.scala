package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent inverted (posting-list) index for lexical BM25 serving —
  * the lexical sibling of [[VectorIndex]], and the "posting-list index at
  * 100 TB" scale path [[TextOps.bm25Scores]]' scaladoc promises made
  * real code (reference analogue: the batch layer precomputing what
  * query time should not — BatchWorkflow.java's precomputed views).
  *
  * Layout under `dir`:
  *   - `postings/bucket=<pmod(xxhash64(t), nBuckets)>/` — (t, doc_id,
  *     tf, dl): the document length rides DENORMALIZED on every posting
  *     (the norms-in-postings trick real engines use), so query time
  *     never joins a corpus-sized doc-length table.
  *   - `stats/` — one row (n_docs, avgdl, n_buckets): the corpus
  *     constants plus the store's recorded bucket modulus, so reads are
  *     self-describing (no caller-supplied nBuckets to get wrong —
  *     the UpsertStore sidecar lesson).
  *
  * A query reads ONLY its terms' bucket partitions (partition-pruned
  * scan: ≤ |qTerms| of nBuckets directories, spec-pinned), filters to
  * the exact terms inside them, and evaluates the SAME scoring
  * expression tree as the direct form — text_bm25_indexed therefore
  * shares text_bm25_topk's oracle SQL verbatim and the driver proves
  * index ≡ direct scan.
  *
  * At 100 TB the build is one map-combinable (doc, term) aggregate plus
  * one partitioned write; a query touches query-term-sized data only —
  * posting lists for 3 terms, never the corpus.
  */
object LexIndex {

  private def postingsDir(dir: String) = s"$dir/postings"
  private def statsDir(dir: String) = s"$dir/stats"

  val DefaultBuckets = 64

  /** Build the index from `docs` (doc_id, text, …). */
  def build(spark: SparkSession, docs: DataFrame, dir: String,
      nBuckets: Int = DefaultBuckets): Unit = {
    require(nBuckets >= 1, s"need nBuckets >= 1, got $nBuckets")
    val tf = docs.select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .where(col("t") =!= "")
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").cast("double").as("dl"))
    tf.join(dl, "doc_id")
      .withColumn("bucket", pmod(xxhash64(col("t")), lit(nBuckets.toLong)))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("bucket")
      .parquet(postingsDir(dir))
    // stats written LAST — it is the read path's entry point, so a crash
    // mid-build leaves an index that loudly reads as not-ready rather
    // than one that silently scores with stale corpus constants
    dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"),
        avg("dl").as("avgdl"), lit(nBuckets).as("n_buckets"))
      .repartition(1) // one row
      .write.mode(SaveMode.Overwrite)
      .parquet(statsDir(dir))
  }

  /** Append `docs` to an existing index — EXACT, unlike PQ append (no
    * codebooks to go stale): new postings land in their terms' buckets
    * under the store's RECORDED modulus, document lengths are per-doc so
    * existing postings never change, document frequency is computed at
    * query time from the postings themselves, and the corpus constants
    * merge from the running (n_docs, sum_dl) totals. build + append ≡
    * one build over the union — the declared query proves it against
    * the direct form's oracle verbatim.
    */
  def append(spark: SparkSession, docs: DataFrame, dir: String): Unit = {
    val prev = spark.read.parquet(statsDir(dir)).head()
    val nBuckets = prev.getAs[Int]("n_buckets")
    val tf = docs.select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .where(col("t") =!= "")
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").cast("double").as("dl"))
    tf.join(dl, "doc_id")
      .withColumn("bucket", pmod(xxhash64(col("t")), lit(nBuckets.toLong)))
      .write.mode(SaveMode.Append)
      .partitionBy("bucket")
      .parquet(postingsDir(dir))
    // stats swaps in crash-safe (two-rename; a complete stats row exists
    // at every intermediate state) — a torn overwrite here would leave
    // the index unreadable, the one state a rebuild-from-scratch is
    // needed to escape
    dl.agg(
        (count(lit(1)) + lit(prev.getAs[Long]("n_docs"))).as("n_docs"),
        (coalesce(sum("dl"), lit(0.0)) // empty batch: totals carry over
          + lit(prev.getAs[Double]("sum_dl"))).as("sum_dl"))
      .select(col("n_docs"), col("sum_dl"),
        (col("sum_dl") / col("n_docs")).as("avgdl"),
        lit(nBuckets).as("n_buckets"))
      .repartition(1)
      .write.mode(SaveMode.Overwrite)
      .parquet(graft.model.StoreSwap.tmpPath(statsDir(dir)))
    graft.model.StoreSwap.commit(spark, statsDir(dir))
  }

  /** Compact the postings in place (the [[VectorIndex.consolidate]]
    * shape): repeated appends leave one small file per batch per touched
    * bucket, and a query then pays per-file open cost across its terms'
    * buckets. Rewrites to one file per bucket partition through the
    * crash-safe [[graft.model.StoreSwap.commit]] two-rename — a complete
    * postings table exists at every intermediate state. Offline
    * maintenance: run between serving windows.
    */
  def consolidate(spark: SparkSession, dir: String): Unit = {
    graft.model.StoreSwap.commit(spark, postingsDir(dir)) // finish any torn swap
    spark.read.parquet(postingsDir(dir))
      .repartition(col("bucket")).sortWithinPartitions("t", "doc_id")
      .write.mode(SaveMode.Overwrite).partitionBy("bucket")
      .option("maxRecordsPerFile", 8L * 1000 * 1000)
      .parquet(graft.model.StoreSwap.tmpPath(postingsDir(dir)))
    graft.model.StoreSwap.commit(spark, postingsDir(dir))
  }

  /** BM25 (k1=1.2, b=0.75) scores of the indexed corpus against
    * `qTerms`: (doc_id, bm25 rounded to 4) — the [[TextOps.bm25Scores]]
    * contract served from the index. Reads only the query terms' bucket
    * partitions.
    */
  def bm25Scores(spark: SparkSession, dir: String,
      qTerms: Seq[String]): DataFrame = {
    require(qTerms.nonEmpty, "need at least one query term")
    // resolve through a possibly-interrupted swap: a complete stats (and
    // postings) version exists at `dir` or `dir.old` at every protocol
    // state
    val statsPath = graft.model.StoreSwap.readablePath(spark, statsDir(dir))
      .getOrElse(sys.error(s"no readable stats under ${statsDir(dir)} — index not built"))
    val statsRow = spark.read.parquet(statsPath).head()
    val nDocs = statsRow.getAs[Long]("n_docs")
    val avgdl = statsRow.getAs[Double]("avgdl")
    val nBuckets = statsRow.getAs[Int]("n_buckets")
    // the terms' buckets via the same expression the build used — never
    // a driver-side reimplementation of xxhash64 that could drift
    val buckets = spark.range(1)
      .select(qTerms.map(t =>
        pmod(xxhash64(lit(t)), lit(nBuckets.toLong))): _*)
      .head().toSeq.map(_.asInstanceOf[Long]).distinct
    val postingsPath = graft.model.StoreSwap
      .readablePath(spark, postingsDir(dir))
      .getOrElse(sys.error(s"no readable postings under ${postingsDir(dir)}"))
    val tfq = spark.read.parquet(postingsPath)
      .where(col("bucket").isin(buckets: _*) && col("t").isin(qTerms: _*))
    val dfreq = tfq.groupBy("t").agg(count(lit(1)).as("df"))
    tfq.join(broadcast(dfreq), "t")
      .withColumn("contrib",
        log((lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1))
          * col("tf") * lit(2.2)
          / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / lit(avgdl))))
      .groupBy("doc_id").agg(round(sum("contrib"), 4).as("bm25"))
      .select(col("doc_id"), col("bm25"))
  }

  /** Indexed BM25 top-k: (rank, doc_id, bm25) — byte-identical to the
    * direct [[TextOps.bm25Scores]] → [[TextOps.bm25Rank]] path.
    */
  def bm25TopK(spark: SparkSession, dir: String, qTerms: Seq[String],
      k: Int = 10): DataFrame =
    TextOps.bm25Rank(bm25Scores(spark, dir, qTerms), k)
}
