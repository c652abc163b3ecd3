package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef.{noOracle, withOracle}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.9): media treated as opaque
  * `binary` columns with typed metadata, processed by batched
  * per-partition extractors. The Spark-side shapes — schema, batch
  * iteration, partitioning, output contract — are real and tested; the
  * actual media decode is STUBBED (no image/audio libs in this
  * container): `decodeStub` derives deterministic fake features from the
  * bytes. Swapping in a real decoder changes only that one function.
  *
  * Scale notes: extraction is `mapPartitions` over the binary column —
  * embarrassingly parallel, no shuffle; partition sizing is controlled
  * upstream by `repartition(n)` on ingest so each task holds a bounded
  * number of blobs in memory.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata (the schema a real
    * pipeline would carry for images/audio/video).
    */
  case class MediaRow(doc_id: Long, media_type: String, n_bytes: Long, payload: Array[Byte])

  case class MediaFeatures(
      doc_id: Long, media_type: String, n_bytes: Long,
      byte_mean: Double, feature: Array[Float])

  /** STUB decoder — stands in for image/audio decode + feature extraction.
    * Deterministic in the payload bytes: mean byte value and a 4-dim
    * "embedding" from rolling byte sums. Replace with a real codec to
    * productionize; the surrounding plumbing does not change.
    */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val bytes = r.payload
    var sum = 0L
    val acc = new Array[Long](4)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sum += b
      acc(i % 4) += b
      i += 1
    }
    val n = math.max(bytes.length, 1)
    MediaFeatures(r.doc_id, r.media_type, r.n_bytes,
      sum.toDouble / n, acc.map(a => (a.toDouble / n).toFloat))
  }

  /** The documents table rendered as media rows (text bytes as the opaque
    * payload) — the binary-column ingest path.
    */
  def documentsAsMedia(df: DataFrame): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id"), lit("text/plain").as("media_type"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** Batched per-partition feature extraction — the mapPartitions shape a
    * real decoder plugs into (one decoder init per partition, streamed
    * rows).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real pipeline: init decoder/codec once per partition here
      rows.map(decodeStub)
    }
  }

  val defs: Seq[QueryDef] = Seq(

    // The binary-column metadata path is exact and oracle-checkable.
    withOracle(
      "multimodal_bytes",
      """SELECT doc_id, 'text/plain' AS media_type,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      documentsAsMedia(Tables.documents(s, dir))
        .select(col("doc_id"), col("media_type"), col("n_bytes"))
        .orderBy("doc_id")
    },

    // Stubbed decode features: deterministic but not SQL-expressible.
    noOracle("multimodal_features") { (s, dir) =>
      extractFeatures(documentsAsMedia(Tables.documents(s, dir)))
        .select(col("doc_id"), col("n_bytes"), round(col("byte_mean"), 4).as("byte_mean"))
        .orderBy("doc_id")
    }
  )
}
