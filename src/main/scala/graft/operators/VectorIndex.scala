package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent IVF-PQ index: the lambda-architecture treatment of ANN
  * search (reference: the precomputed-batch-view discipline of
  * BatchWorkflow.java — views are built once from the master data and
  * served many times). An index build is exactly such a view: train the
  * coarse quantizer + residual codebooks once (sample-bounded), encode
  * the corpus to (id, cell, m bytes), and persist
  *
  *   - the CODES table partitioned by `cell` — parquet directories ARE
  *     the inverted lists, so a search's `cell IN (probed)` filter is
  *     partition pruning and the scan reads only nProbe/nCells of the
  *     index bytes (~m bytes per row of those cells, vs dims·4 for raw
  *     embeddings: both prunings compose on disk);
  *   - the CODEBOOKS as a small parquet side table (kind, sub, idx, vec),
  *     floats round-tripping exactly, so appended batches encode
  *     bit-identically to the build pass.
  *
  * `append` encodes new rows with the SAVED codebooks — no retrain, no
  * rewrite of existing cells' files; the nightly-crawl shape (compare
  * `dedup_incremental`). Quantizers drift as the corpus distribution
  * does; rebuilding is a policy decision (track residual magnitudes),
  * not something an append should silently trigger.
  *
  * Search reads the pruned codes table and runs the same
  * [[VectorOps.ivfPqSearch]] the in-query `ann_ivfpq` form uses — one
  * code path, so the prebuilt and in-query answers agree exactly
  * (VectorIndexSpec pins both that equality and the pruned scan shape).
  */
object VectorIndex {

  private def codesDir(dir: String) = dir + "/codes"
  private def booksDir(dir: String) = dir + "/codebooks"

  /** Build the index at `dir` (overwrites): trains on `emb` (bounded by
    * `maxTrainRows`), writes cell-partitioned codes + codebooks. Shapes
    * auto-size from the corpus like the in-query form.
    */
  def buildIvfPq(spark: SparkSession, emb: DataFrame, dir: String,
      nCells: Int = 0, m: Int = 0, ks: Int = 0,
      maxTrainRows: Long = 100000L, nRows: Long = 0L): Unit = {
    import spark.implicits._
    val n = if (nRows > 0) nRows else emb.count()
    val cells = if (nCells > 0) nCells else VectorOps.ivfCells(n)
    val kCent = if (ks > 0) ks else VectorOps.pqCodebookSize(n)
    val dims = VectorOps.embDims(emb)
    val mSub = if (m > 0) m else VectorOps.pqSubspaces(dims)
    val unitEmb = VectorOps.withUnit(emb, "embedding", "unit")
    val centroidArr = VectorOps.trainQuantizer(
      unitEmb.select(col("vec_id"), col("unit").as("embedding")),
      cells, maxTrainRows, n)
    val assigned = VectorOps.ivfPqAssign(spark, unitEmb, centroidArr)
    val books = VectorOps.trainPqCodebooks(
      assigned.select(col("residual").as("embedding")), mSub, kCent, dims,
      maxTrainRows, n)
    VectorOps.ivfPqEncode(assigned, books)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cell")
      .parquet(codesDir(dir))
    val coarseRows = centroidArr.zipWithIndex.map { case (v, i) =>
      ("coarse", 0, i, v.toSeq)
    }
    val bookRows = for {
      (book, s) <- books.zipWithIndex
      (cent, i) <- book.zipWithIndex
    } yield ("pq", s, i, cent.toSeq)
    (coarseRows ++ bookRows).toSeq
      .toDF("kind", "sub", "idx", "vec")
      .repartition(1) // broadcast-sized side table: one file
      .write.mode(SaveMode.Overwrite).parquet(booksDir(dir))
  }

  /** (coarse centroids, PQ codebooks) read back from `dir` — float-exact,
    * so encoding with them is bit-identical to the build pass.
    */
  def readCodebooks(spark: SparkSession, dir: String): (Array[Array[Float]], Array[Array[Array[Float]]]) = {
    val rows = spark.read.parquet(booksDir(dir))
      .select("kind", "sub", "idx", "vec").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getSeq[Float](3).toArray))
    val coarse = rows.filter(_._1 == "coarse").sortBy(_._3).map(_._4)
    val pq = rows.filter(_._1 == "pq").groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (_, cents) => cents.sortBy(_._3).map(_._4) }.toArray
    require(coarse.nonEmpty && pq.nonEmpty, s"no codebooks at $dir")
    (coarse, pq)
  }

  /** Append `newEmb` encoded with the SAVED codebooks: only the new rows
    * are written (into their cells' partition directories); existing
    * files and codebooks are untouched.
    *
    * Append-only semantics, like `FactStore.ingest` (and the reference's
    * Pail.absorb): appending an id twice stores it twice, and both rows
    * can then surface as candidates. Dedup BEFORE appending — the
    * `dedup_incremental` path is the intended upstream — rather than
    * paying a (p, c) distinct inside every search.
    */
  def appendIvfPq(spark: SparkSession, newEmb: DataFrame, dir: String): Unit = {
    val (coarse, books) = readCodebooks(spark, dir)
    val unitEmb = VectorOps.withUnit(newEmb, "embedding", "unit")
    VectorOps.ivfPqEncode(VectorOps.ivfPqAssign(spark, unitEmb, coarse), books)
      .write.mode(SaveMode.Append)
      .partitionBy("cell")
      .parquet(codesDir(dir))
  }

  /** Compact the codes table in place (Pail.consolidate for the index,
    * same rewrite-and-swap shape as `FactStore.consolidate`): streamed
    * micro-batch appends leave one small file per batch per touched cell,
    * and a search then pays per-file open cost across every probed cell.
    * Rewrites to one file per cell partition — at the √n cell sizing a
    * cell's codes are a few MB even at 10⁹ rows (m bytes/row), and an
    * oversized cell can still split via `maxRecordsPerFile`. The row
    * multiset — and therefore every search answer — is unchanged. The
    * swap is the crash-safe [[graft.model.StoreSwap.commit]] two-rename
    * protocol: a complete codes table exists at every intermediate
    * state. Like the FactStore form this is an offline maintenance
    * pass: run it between serving windows, not under live readers.
    */
  def consolidate(spark: SparkSession, dir: String): Unit = {
    // self-heal a predecessor's mid-swap crash before reading
    graft.model.StoreSwap.commit(spark, codesDir(dir))
    spark.read.parquet(codesDir(dir))
      .repartition(col("cell")) // all of a cell's rows → one writer → one file
      .write.mode(SaveMode.Overwrite).partitionBy("cell")
      .parquet(graft.model.StoreSwap.tmpPath(codesDir(dir)))
    graft.model.StoreSwap.commit(spark, codesDir(dir))
  }

  /** Search the prebuilt index: the probed cells' partitions are the
    * only ones read — deterministically. Under default session confs
    * the probed cell ids (bounded: ≤4096 by the cell cap) are pushed as
    * a static partition filter; a session that sets
    * `spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly=false`
    * (the documented serving-session setting) gets the fully
    * driver-free form instead, where the broadcast candidate join on
    * `cell` plants a dynamicpruning subquery on the partition column.
    * VectorIndexSpec pins BOTH paths' pruning. `emb` supplies raw
    * vectors for the exact rerank of the top candidates only.
    *
    * Defaults sit at the measured curve knees (nProbe 8, rerank 12 —
    * the documented stale-codebook-append stance for the indexed form);
    * both are probe/serving-side knobs with zero corpus-side cost
    * beyond the nProbe/nCells scan fraction.
    */
  def searchIvfPq(spark: SparkSession, dir: String, emb: DataFrame,
      probes: DataFrame, k: Int, nProbe: Int = 8, rerank: Int = 12,
      probeMargin: Double = 0.0): DataFrame = {
    val (coarse, books) = readCodebooks(spark, dir)
    VectorOps.ivfPqSearch(spark, spark.read.parquet(codesDir(dir)), emb,
      probes, coarse, books, k, nProbe, rerank, probeMargin)
  }
}
