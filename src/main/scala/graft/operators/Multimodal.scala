package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef.{noOracle, withOracle}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.9): media treated as opaque
  * `binary` columns with typed metadata, processed by batched
  * per-partition extractors. The Spark-side shapes — schema, batch
  * iteration, partitioning, output contract — are real and tested.
  * Image media types get a REAL decode (JDK ImageIO — PNG/JPEG/GIF/BMP
  * ship with the JVM, no external libs); other media types fall back to
  * `decodeStub`, the seam an audio/video codec plugs into.
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

  /** width/height are decode outputs of raster media; None for the
    * byte-level fallback path. `decode_error` is None on success and the
    * failure message on the quarantine path — downstream filters on it.
    */
  case class MediaFeatures(
      doc_id: Long, media_type: String, n_bytes: Long,
      byte_mean: Double, feature: Array[Float],
      width: Option[Int] = None, height: Option[Int] = None,
      decode_error: Option[String] = None)

  /** STUB decoder — stands in for the codecs the JVM lacks (audio/video).
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

  /** REAL raster decode via JDK ImageIO: byte_mean is the mean Rec.601
    * luma over all pixels, the 4-dim feature is the mean (R, G, B, A)
    * channels — an actual (tiny) image embedding, deterministic in the
    * decoded pixels rather than the compressed bytes.
    */
  def decodeImage(r: MediaRow): MediaFeatures = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
    require(img != null, s"undecodable ${r.media_type} payload for doc ${r.doc_id}")
    val w = img.getWidth
    val h = img.getHeight
    val chan = new Array[Double](4)
    var lum = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val argb = img.getRGB(x, y)
        val rr = (argb >> 16) & 0xff
        val g = (argb >> 8) & 0xff
        val b = argb & 0xff
        chan(0) += rr; chan(1) += g; chan(2) += b; chan(3) += (argb >>> 24) & 0xff
        lum += 0.299 * rr + 0.587 * g + 0.114 * b
        x += 1
      }
      y += 1
    }
    val n = math.max(w * h, 1)
    MediaFeatures(r.doc_id, r.media_type, r.n_bytes,
      lum / n, chan.map(c => (c / n).toFloat), Some(w), Some(h))
  }

  /** 64-bit difference hash (dHash, the classic perceptual image hash):
    * mean-pool the decoded image onto a 9-wide × 8-tall grayscale grid,
    * then bit (x, y) = cell(x+1, y) > cell(x, y) — 8 comparisons × 8
    * rows. Comparisons are invariant under any monotone brightness
    * shift, and near-duplicate images (recompressed, lightly edited)
    * land within small Hamming distance, so the signature plugs
    * straight into the simhash pigeonhole band join
    * ([[NearDedup.hamming64NearDups]]) for image near-dedup at corpus
    * scale — O(candidates), never all-pairs.
    */
  def dHashImage(img: java.awt.image.BufferedImage): Long = {
    val (gw, gh) = (9, 8)
    val w = img.getWidth
    val h = img.getHeight
    val sum = new Array[Double](gw * gh)
    val cnt = new Array[Long](gw * gh)
    var py = 0
    while (py < h) {
      val gy = py * gh / h
      var px = 0
      while (px < w) {
        val gx = px * gw / w
        val argb = img.getRGB(px, py)
        val gray = 0.299 * ((argb >> 16) & 0xff) + 0.587 * ((argb >> 8) & 0xff) +
          0.114 * (argb & 0xff)
        sum(gy * gw + gx) += gray
        cnt(gy * gw + gx) += 1
        px += 1
      }
      py += 1
    }
    def cell(gx: Int, gy: Int): Double = {
      val i = gy * gw + gx
      if (cnt(i) == 0) 0.0 else sum(i) / cnt(i)
    }
    var hash = 0L
    var gy = 0
    while (gy < gh) {
      var gx = 0
      while (gx < gw - 1) {
        if (cell(gx + 1, gy) > cell(gx, gy)) hash |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    hash
  }

  /** Stub dHash for codecless types: the same 9×8-grid comparison rule
    * over bytes sampled at stride positions — deterministic, so dedup
    * plumbing over non-raster payloads stays testable; identical
    * payloads hash identically, the codec swaps in per type.
    */
  def dHashStub(payload: Array[Byte]): Long = {
    if (payload.isEmpty) return 0L
    def cell(gx: Int, gy: Int): Int =
      payload(((gy * 9 + gx).toLong * payload.length / 72).toInt) & 0xff
    var hash = 0L
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        if (cell(gx + 1, gy) > cell(gx, gy)) hash |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    hash
  }

  def dHash(r: MediaRow): Long =
    if (imageIoDecodable(r.media_type)) {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      require(img != null, s"undecodable ${r.media_type} payload for doc ${r.doc_id}")
      dHashImage(img)
    } else dHashStub(r.payload)

  /** Per-row perceptual hashes — the same mapPartitions decoder-init
    * shape as [[extractFeatures]].
    */
  def phashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map(r => (r.doc_id, dHash(r)))
    }.toDF("doc_id", "phash")
  }

  /** True when the JVM ships a codec for this media type. Capability
    * probe, not a prefix test: `image/webp` or `image/heic` payloads are
    * perfectly valid media this JVM simply cannot decode — they must take
    * the stub path, not crash the job. Memoized per executor JVM: the
    * registry scan is a lookup over plugin SPIs, far too slow to repeat
    * per row, and a JVM's codec set never changes mid-job.
    */
  private val decodableCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  def imageIoDecodable(mediaType: String): Boolean =
    decodableCache.computeIfAbsent(mediaType,
      mt => javax.imageio.ImageIO.getImageReadersByMIMEType(mt).hasNext)

  /** REAL audio decode for the formats javax.sound.sampled ships
    * (WAV/AIFF/AU): byte_mean is the mean absolute normalized
    * amplitude × 255 (the audio analogue of the image path's mean luma
    * scale), the 4-dim feature is the RMS amplitude of each temporal
    * quarter — a real (tiny) audio embedding from decoded samples, not
    * compressed bytes. Mono-mixes multi-channel; 8/16-bit linear PCM in
    * both endiannesses and BOTH signednesses, each decoded per the
    * stream's declared AudioFormat.Encoding (WAV 8-bit is unsigned,
    * AIFF 8-bit is signed — assuming one from the width is a silent
    * amplitude corruption). Non-linear encodings (AU's ULAW/ALAW) are
    * normalized through the JVM's own converter to 16-bit signed PCM
    * first, so their amplitudes are correct too; an encoding the JVM
    * cannot convert fails loudly rather than mis-decoding.
    */
  def decodeAudio(r: MediaRow): MediaFeatures = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    import AudioFormat.Encoding.{PCM_SIGNED, PCM_UNSIGNED}
    val src = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(r.payload))
    val in =
      if (src.getFormat.getEncoding == PCM_SIGNED ||
        src.getFormat.getEncoding == PCM_UNSIGNED) src
      else {
        // ULAW/ALAW (audio/basic's defaults): the JVM ships the
        // companding tables — convert rather than mis-read the bytes as
        // linear. Throws IllegalArgumentException on an encoding it
        // cannot convert: loud, as required.
        val sf = src.getFormat
        AudioSystem.getAudioInputStream(
          new AudioFormat(PCM_SIGNED, sf.getSampleRate, 16, sf.getChannels,
            2 * sf.getChannels, sf.getSampleRate, false), src)
      }
    try {
      val fmt = in.getFormat
      val signed = fmt.getEncoding == PCM_SIGNED
      val bytesPerSample = fmt.getSampleSizeInBits / 8
      require(bytesPerSample == 1 || bytesPerSample == 2,
        s"unsupported sample width ${fmt.getSampleSizeInBits} for doc ${r.doc_id}")
      val raw = in.readAllBytes()
      val ch = fmt.getChannels
      val nFrames = raw.length / (bytesPerSample * ch)
      require(nFrames > 0, s"empty audio payload for doc ${r.doc_id}")
      val mono = new Array[Double](nFrames)
      var f = 0
      while (f < nFrames) {
        var c = 0
        var acc = 0.0
        while (c < ch) {
          val off = (f * ch + c) * bytesPerSample
          val s =
            if (bytesPerSample == 1) {
              // width alone does not decide signedness: WAV 8-bit is
              // PCM_UNSIGNED, AIFF 8-bit is PCM_SIGNED
              if (signed) raw(off) / 128.0
              else ((raw(off) & 0xff) - 128) / 128.0
            } else {
              val lo = if (fmt.isBigEndian) raw(off + 1) else raw(off)
              val hi = if (fmt.isBigEndian) raw(off) else raw(off + 1)
              if (signed) ((hi << 8) | (lo & 0xff)) / 32768.0
              else ((((hi & 0xff) << 8) | (lo & 0xff)) - 32768) / 32768.0
            }
          acc += s
          c += 1
        }
        mono(f) = acc / ch
        f += 1
      }
      var sumAbs = 0.0
      val quarters = new Array[Double](4)
      var i = 0
      while (i < nFrames) {
        sumAbs += math.abs(mono(i))
        val q = math.min(i * 4 / nFrames, 3)
        quarters(q) += mono(i) * mono(i)
        i += 1
      }
      val qn = Array.tabulate(4)(q =>
        math.max((q + 1) * nFrames / 4 - q * nFrames / 4, 1))
      MediaFeatures(r.doc_id, r.media_type, r.n_bytes,
        255.0 * sumAbs / nFrames,
        Array.tabulate(4)(q => math.sqrt(quarters(q) / qn(q)).toFloat))
    } finally in.close()
  }

  /** True when javax.sound.sampled can open this media type — same
    * capability-probe-not-prefix-test policy as [[imageIoDecodable]]
    * (audio/mpeg is valid audio this JVM cannot decode: stub path).
    * The probe opens the stream reader registry once per type per JVM.
    */
  private val AudioTypes = Set("audio/wav", "audio/x-wav", "audio/wave",
    "audio/aiff", "audio/x-aiff", "audio/basic")
  def audioDecodable(mediaType: String): Boolean = AudioTypes(mediaType)

  /** Per-media-type dispatch: real codec where the JVM has one, stub
    * elsewhere. Fails loudly on a corrupt payload — the right default for
    * a correctness-first pass; see [[decodeQuarantine]] for the
    * skip-and-count policy a corpus-scale extraction usually wants.
    */
  def decode(r: MediaRow): MediaFeatures =
    if (imageIoDecodable(r.media_type)) decodeImage(r)
    else if (audioDecodable(r.media_type)) decodeAudio(r)
    else decodeStub(r)

  /** Quarantine decode: a payload the codec rejects (truncated PNG,
    * lying media_type) yields a null-feature row FLAGGED via
    * `decode_error` instead of killing the task — at corpus scale one
    * bad row aborting a whole extraction pass is a costly policy, so the
    * caller chooses. Only decode failures are caught (IO / image-format
    * errors); genuine bugs (OOM, NPE) still propagate.
    */
  def decodeQuarantine(r: MediaRow): MediaFeatures =
    try decode(r)
    catch {
      case e @ (_: java.io.IOException | _: IllegalArgumentException |
                _: javax.imageio.IIOException |
                _: javax.sound.sampled.UnsupportedAudioFileException) =>
        MediaFeatures(r.doc_id, r.media_type, r.n_bytes,
          byte_mean = Double.NaN, feature = Array.empty[Float],
          decode_error = Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
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

  /** The documents table rendered as REAL 8-bit PCM WAV payloads: each
    * doc's text bytes become unsigned samples behind a canonical 44-byte
    * RIFF header, so the audio DECODER (not the stub) runs on every row
    * — and because sample i is exactly text byte i, the decoded
    * amplitude statistics are predictable from the text in SQL, giving
    * the real-codec path an exact oracle.
    */
  def documentsAsWav(df: DataFrame): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id"), col("text").cast("binary").as("b"))
      .as[(Long, Array[Byte])]
      .map { case (id, pcm) =>
        MediaRow(id, "audio/wav", pcm.length.toLong, wavWrap(pcm))
      }
  }

  /** Canonical RIFF/WAVE header for 8-bit unsigned mono PCM @ 8 kHz. */
  def wavWrap(pcm: Array[Byte]): Array[Byte] = {
    val n = pcm.length
    val bb = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(8000).putInt(8000) // sample rate, byte rate
      .putShort(1).putShort(8) // block align, bits per sample
      .put("data".getBytes("US-ASCII")).putInt(n)
      .put(pcm)
    bb.array()
  }

  /** Batched per-partition feature extraction — the mapPartitions shape a
    * real decoder plugs into (one decoder init per partition, streamed
    * rows).
    */
  def extractFeatures(media: Dataset[MediaRow],
      quarantine: Boolean = false): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // decoder init once per partition: ImageIO's plugin registry scans
      // on first use per JVM; disabling the on-disk cache keeps executor
      // tasks from contending on a temp directory
      javax.imageio.ImageIO.setUseCache(false)
      if (quarantine) rows.map(decodeQuarantine) else rows.map(decode)
    }
  }

  /** Frame size for the frame-sample generator (a real video pipeline
    * samples at a time interval; the fixed byte stride keeps the shape
    * deterministic and oracle-checkable here).
    */
  val FrameBytes = 256

  /** Stub "resize": stride-2 byte downsample standing in for a media
    * resize on types the JVM has no codec for — per-row payload
    * transform with recomputed metadata.
    */
  def resizeStub(payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte]((payload.length + 1) / 2)
    var i = 0
    while (i < out.length) { out(i) = payload(i * 2); i += 1 }
    out
  }

  /** REAL image resize for ImageIO-decodable payloads: decode, scale to
    * max(1, dim/2) per axis (bilinear), re-encode PNG. Pure row-local
    * payload→payload transform — the same mapPartitions shape as the
    * stub, so swapping codecs never touches the plumbing.
    */
  def resizeImage(payload: Array[Byte]): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "undecodable image payload")
    val w = math.max(1, img.getWidth / 2)
    val h = math.max(1, img.getHeight / 2)
    val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  // ---- Raster-sequence "video" keyframes (r15 task 6): the frame_sample
  // shape composed with the REAL ImageIO decode — the stub seam's
  // replacement path exercised end to end on a container the JVM can
  // actually demux and decode.

  /** Keyframe raster dimension and the resulting fixed frame size: an
    * 8×8 24-bit BMP is 54 header bytes + 8·24 pixel bytes = 246 (the
    * 24-byte row is already 4-aligned, no padding). A fixed W×H 24-bit
    * BMP has a FIXED byte size, so the concatenated container needs no
    * frame index — the byte stride IS the demuxer, which is what keeps
    * the frame count/size arithmetic exact enough for a DuckDB oracle
    * over a real decode.
    */
  val KeyframeDim = 8
  val BmpFrameBytes = 54 + KeyframeDim * KeyframeDim * 3

  /** One solid-gray [[KeyframeDim]]² 24-bit BMP, hand-rolled (BMP file
    * + info headers are 54 deterministic little-endian bytes; routing
    * through ImageIO's encoder would tie the frame size to the JVM's
    * header choices). Decoding it with ImageIO yields exactly
    * (gray, gray, gray) per pixel, so the decoded mean luma is the gray
    * value itself — the property the oracle predicts.
    */
  def solidBmp(gray: Int): Array[Byte] = {
    val w = KeyframeDim
    val rowBytes = w * 3
    val dataSize = rowBytes * w
    val bb = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54) // reserved, pixel-data offset
      .putInt(40).putInt(w).putInt(w) // BITMAPINFOHEADER, width, height
      .putShort(1).putShort(24) // planes, bpp
      .putInt(0).putInt(dataSize) // BI_RGB, data size
      .putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 dpi, no palette
    val g = gray.toByte
    var i = 0
    while (i < dataSize) { bb.put(g); i += 1 }
    bb.array()
  }

  /** A raster-sequence container row: concatenated fixed-size BMP
    * frames in one opaque payload (the multi-frame media shape a real
    * video pipeline carries — here with a codec the JVM ships).
    */
  case class VideoRow(doc_id: Long, n_frames: Int, payload: Array[Byte])

  /** One decoded keyframe: width/height/gray are REAL decode outputs;
    * on the quarantine path a corrupt frame carries `decode_error`
    * instead (the [[decodeQuarantine]] policy per frame).
    */
  case class KeyframeRow(doc_id: Long, frame_idx: Long,
      width: Option[Int], height: Option[Int], gray: Option[Long],
      decode_error: Option[String] = None)

  /** The documents table rendered as synthetic raster-sequence
    * containers: doc d carries 1 + d % 4 frames, frame j solid gray
    * (d·7 + j·13) % 256 — every quantity derives from doc_id alone, so
    * the whole decode pipeline is SQL-predictable while the bytes are
    * genuine BMPs the real codec must parse.
    */
  def documentsAsVideo(df: DataFrame): Dataset[VideoRow] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id")).as[Long].map { id =>
      val k = (1 + id % 4).toInt
      val bb = java.nio.ByteBuffer.allocate(k * BmpFrameBytes)
      (0 until k).foreach(j => bb.put(solidBmp(((id * 7 + j * 13) % 256).toInt)))
      VideoRow(id, k, bb.array())
    }
  }

  /** Demux + keyframe-sample + REAL decode: split the container on the
    * fixed frame stride, take every `stride`-th frame (frame 0 always —
    * a real sampler keys on time; the fixed stride keeps the fan-out
    * oracle-exact), ImageIO-decode each sampled frame and emit its
    * decoded dimensions and rounded mean luma. Row-local flatMap over
    * the payload (one media row → ≤ ⌈frames/stride⌉ keyframe rows, the
    * frame_sample fan-out) inside the [[extractFeatures]]
    * decoder-init-per-partition shape; at 100 TB this is a map-only
    * pass at source parallelism, no shuffle before the output sort.
    * `quarantine = true` applies the [[decodeQuarantine]] policy PER
    * FRAME: a corrupt frame yields a flagged row, the container's other
    * frames still decode.
    */
  def videoKeyframes(videos: Dataset[VideoRow], stride: Int = 2,
      quarantine: Boolean = false): Dataset[KeyframeRow] = {
    import videos.sparkSession.implicits._
    require(stride >= 1, s"need stride >= 1, got $stride")
    videos.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { v =>
        val frames = v.payload.length / BmpFrameBytes
        (0 until frames by stride).iterator.map { j =>
          def decodeFrame(): KeyframeRow = {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
              java.util.Arrays.copyOfRange(v.payload,
                j * BmpFrameBytes, (j + 1) * BmpFrameBytes)))
            require(img != null,
              s"undecodable frame $j of doc ${v.doc_id}")
            var lum = 0.0
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val argb = img.getRGB(x, y)
                lum += 0.299 * ((argb >> 16) & 0xff) +
                  0.587 * ((argb >> 8) & 0xff) + 0.114 * (argb & 0xff)
                x += 1
              }
              y += 1
            }
            KeyframeRow(v.doc_id, j.toLong, Some(img.getWidth),
              Some(img.getHeight),
              Some(math.round(lum / math.max(img.getWidth * img.getHeight, 1))))
          }
          if (!quarantine) decodeFrame()
          else
            try decodeFrame()
            catch {
              case e @ (_: java.io.IOException | _: IllegalArgumentException |
                        _: javax.imageio.IIOException) =>
                KeyframeRow(v.doc_id, j.toLong, None, None, None,
                  Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
            }
        }
      }
    }
  }

  /** Media-type dispatch for resize, like [[decode]]. NOTE the image path
    * re-encodes as PNG whatever the input format — a caller that carries
    * `media_type` alongside the payload must set it to [[ResizedImageType]]
    * on that path (bytes-in/bytes-out keeps the two stub/real paths
    * signature-compatible; the in-repo resize query records sizes only).
    */
  val ResizedImageType = "image/png"
  def resize(mediaType: String, payload: Array[Byte]): Array[Byte] =
    if (imageIoDecodable(mediaType)) resizeImage(payload) else resizeStub(payload)

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
    },

    // REAL audio decode through the Spark path with an EXACT oracle:
    // text bytes as 8-bit PCM samples behind a canonical WAV header —
    // the javax.sound decoder (not the stub) runs per row, and since
    // sample i IS text byte i, DuckDB predicts the decoded mean
    // absolute amplitude from the characters. ASCII fixture: codepoint
    // = byte.
    // The decoded statistic is re-expressed on the INTEGER grid
    // (sum of |sample byte - 128| — exact in both engines) rather than a
    // rounded float mean: the mean is a rational with denominator 128·n
    // that can land exactly on a decimal half-grid, where the two
    // engines' 1-ulp double representations round apart (seen at sf0.1).
    withOracle(
      "multimodal_audio_features",
      """WITH b AS (
        |  SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
        |  FROM documents
        |  WHERE length(text) > 0 AND octet_length(encode(text)) = length(text))
        |SELECT doc_id,
        |       CAST(count(*) AS BIGINT) AS n_samples,
        |       CAST(sum(abs(ord(substr(text, CAST(i AS INT), 1)) - 128)) AS BIGINT)
        |         AS abs_sum
        |FROM b GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // byte_mean = 255·abs_sum/(128·n) exactly; invert on the integer
      // grid (double error ~1e-9 « 1) to emit the exact decoded sum.
      // Only non-empty single-byte (ASCII) docs ride the sample-i-IS-
      // byte-i equivalence — the oracle's ord()/length() arithmetic
      // assumes it, and a 0-frame WAV is (rightly) a loud decode
      // failure. Filtered IDENTICALLY on both sides, so a future
      // fixture with empty or non-ASCII docs drops those rows in both
      // engines instead of failing the whole query.
      extractFeatures(documentsAsWav(Tables.documents(s, dir)
        .where(length(col("text")) > 0 &&
          octet_length(col("text")) === length(col("text")))))
        .select(col("doc_id"), col("n_bytes").as("n_samples"),
          round(col("byte_mean") * col("n_bytes") * 128.0 / 255.0)
            .cast("long").as("abs_sum"))
        .orderBy("doc_id")
    },

    // Perceptual hashes per media row (dHash — real pooled-grayscale
    // comparisons on raster types, stride-sampled byte grid on
    // codecless ones). Deterministic but pixel-level, so not
    // SQL-expressible; MultimodalSpec pins analytic values (gradient
    // image → all-ones hash, monotone brightness invariance) through
    // the Spark path.
    noOracle("multimodal_phash") { (s, dir) =>
      phashes(documentsAsMedia(Tables.documents(s, dir)))
        .orderBy("doc_id")
    },

    // Image near-dedup: dHash signatures through the same pigeonhole
    // band join as text simhash (shared hamming64NearDups) — never an
    // all-pairs comparison. The corpus has no duplicate payloads, so
    // the dup population is constructed from the input itself (the
    // upsertChanges discipline): a "re-crawl" copy of every media row
    // with its first byte perturbed — a one-cell edit the perceptual
    // hash absorbs (hamming ≤ 1 ≤ the threshold) the way it absorbs a
    // recompression artifact on a raster. Each original must pair with
    // exactly its own re-crawl; original×original and re-crawl×
    // re-crawl pairs would be false positives.
    noOracle("near_dedup_phash") { (s, dir) =>
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val recrawl = documentsAsMedia(
        docs.withColumn("text", concat(lit("Z"), expr("substring(text, 2)"))))
        .map(r => r.copy(doc_id = r.doc_id + 1000000L))
      val ph = phashes(documentsAsMedia(docs).union(recrawl))
      NearDedup.hamming64NearDups(ph, "phash", maxDist = 2)
        .orderBy("i", "j")
    },

    // Resize shape: per-row payload -> smaller payload with updated
    // metadata (stride-2 byte downsample stands in for an image resize;
    // a real codec replaces resizeStub only). The size arithmetic is
    // exact, so the plumbing is oracle-checked.
    withOracle(
      "multimodal_resize",
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       CAST((octet_length(encode(text)) + 1) // 2 AS BIGINT) AS n_resized
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      // documents are text/plain → the stub path with its exact size
      // arithmetic; image payloads route through the real ImageIO resize
      documentsAsMedia(Tables.documents(s, dir))
        .map(r => (r.doc_id, r.n_bytes, resize(r.media_type, r.payload).length.toLong))
        .toDF("doc_id", "n_bytes", "n_resized")
        .orderBy("doc_id")
    },

    // Frame-sample shape: one media row -> n frame rows (the video
    // frame-sampling generator); frames here are fixed 256-byte payload
    // slices, so the fan-out and per-frame sizes are oracle-checked.
    withOracle(
      "multimodal_frame_sample",
      """WITH f AS (
        |  SELECT doc_id, octet_length(encode(text)) AS n,
        |         unnest(generate_series(0, (octet_length(encode(text)) - 1) // 256)) AS frame_idx
        |  FROM documents
        |  WHERE octet_length(encode(text)) > 0)
        |SELECT doc_id, frame_idx,
        |       CAST(least(256, n - frame_idx * 256) AS BIGINT) AS frame_bytes
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin) { (s, dir) =>
      import s.implicits._
      documentsAsMedia(Tables.documents(s, dir))
        .flatMap { r =>
          val frames = (r.payload.length + FrameBytes - 1) / FrameBytes
          (0 until frames).map(i => (r.doc_id, i.toLong,
            math.min(FrameBytes, r.payload.length - i * FrameBytes).toLong))
        }
        .toDF("doc_id", "frame_idx", "frame_bytes")
        .orderBy("doc_id", "frame_idx")
    },

    // VIDEO KEYFRAMES over a raster-sequence container (r15 task 6):
    // multimodal_frame_sample's fan-out composed with the REAL ImageIO
    // decode — doc d carries 1 + d%4 concatenated 8×8 BMP frames, the
    // sampler takes every 2nd frame, and each sampled frame is decoded
    // by the actual codec. Every emitted value (fan-out, dimensions,
    // mean luma of a solid frame = its gray) derives from doc_id
    // arithmetic, so the whole real-decode pipeline is DuckDB-oracled
    // exactly — the documentsAsWav trick on the video seam.
    // MultimodalSpec adds the per-frame decode-error quarantine case.
    withOracle(
      "multimodal_video_keyframes",
      """WITH d AS (SELECT doc_id, 1 + doc_id % 4 AS k FROM documents),
        |f AS (SELECT doc_id, unnest(range(0, CAST(k AS BIGINT), 2)) AS frame_idx
        |      FROM d)
        |SELECT doc_id, frame_idx,
        |       CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
        |       (doc_id * 7 + frame_idx * 13) % 256 AS gray
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin) { (s, dir) =>
      videoKeyframes(documentsAsVideo(Tables.documents(s, dir)), stride = 2)
        .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
          col("gray"))
        .orderBy("doc_id", "frame_idx")
    }
  )
}
