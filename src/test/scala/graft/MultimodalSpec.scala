package graft

import graft.operators.Multimodal
import graft.operators.Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary ingest preserves payload bytes and metadata") {
    val docs = Seq((1L, "hello"), (2L, "wörld")).toDF("doc_id", "text")
    val media = documentsAsMedia(docs).collect().map(m => m.doc_id -> m).toMap
    assert(media(1L).payload.sameElements("hello".getBytes("UTF-8")))
    assert(media(2L).payload.sameElements("wörld".getBytes("UTF-8")))
    assert(media(2L).n_bytes == 6) // ö is 2 bytes in UTF-8
    assert(media(1L).media_type == "text/plain")
  }

  test("feature extraction is deterministic and partition-independent") {
    val docs = Tables.documents(spark, sf0001)
    val f1 = extractFeatures(documentsAsMedia(docs)).orderBy("doc_id").collect()
    val f2 = extractFeatures(documentsAsMedia(docs.repartition(7))).orderBy("doc_id").collect()
    assert(f1.length == 500)
    assert(f1.zip(f2).forall { case (a, b) =>
      a.doc_id == b.doc_id && a.byte_mean == b.byte_mean &&
        a.feature.sameElements(b.feature)
    })
  }

  test("stub features have the contracted shape and ranges") {
    val feats = extractFeatures(documentsAsMedia(Tables.documents(spark, sf0001)))
      .collect()
    feats.foreach { f =>
      assert(f.feature.length == 4)
      assert(f.byte_mean > 0 && f.byte_mean < 256)
    }
  }

  private def pngBytes(pixels: Array[Array[Int]]): Array[Byte] = {
    val h = pixels.length
    val w = pixels(0).length
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixels(y)(x))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("image/png payloads get a REAL ImageIO decode with exact channel means (through the Spark path)") {
    // 2x2: red, green / blue, opaque white — channel means are exact
    // quarters, luma is the Rec.601 mix
    val px = Array(
      Array(0xffff0000, 0xff00ff00),
      Array(0xff0000ff, 0xffffffff))
    val png = pngBytes(px)
    val media = Seq(MediaRow(7L, "image/png", png.length.toLong, png)).toDS()
    val f = extractFeatures(media).collect().head
    assert(f.width.contains(2) && f.height.contains(2), s"decoded size: ${f.width}x${f.height}")
    // mean R = (255+0+0+255)/4, G = (0+255+0+255)/4, B = (0+0+255+255)/4, A = 255
    assert(f.feature.toSeq == Seq(127.5f, 127.5f, 127.5f, 255.0f), f.feature.toSeq)
    val lum = (0.299 * 255 + 0.587 * 255 + 0.114 * 255 + // white
      0.299 * 255 + 0.587 * 255 + 0.114 * 255) / 4 // + red + green + blue = one full mix each
    assert(math.abs(f.byte_mean - lum) < 1e-9, s"byte_mean=${f.byte_mean} expected=$lum")
    // PNG is compressed: the decode provably ran on pixels, not payload
    // bytes — the stub over the same payload gives a different answer
    val stub = decodeStub(MediaRow(7L, "application/octet-stream", png.length.toLong, png))
    assert(stub.byte_mean != f.byte_mean)
  }

  test("image resize halves each axis through a real decode-scale-reencode cycle") {
    // 4x4 solid color → resize → decode back: 2x2, same color (bilinear
    // interpolation of a constant field is constant)
    val px = Array.fill(4)(Array.fill(4)(0xff336699))
    val resized = Multimodal.resize("image/png", pngBytes(px))
    // PNG magic: the output is a re-encoded image, not sampled bytes
    assert((resized(0) & 0xff) == 0x89 && resized(1) == 'P'.toByte)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized))
    assert(back.getWidth == 2 && back.getHeight == 2)
    assert((0 until 2).forall(y => (0 until 2).forall(x => back.getRGB(x, y) == 0xff336699)))
    // 1x1 floor: never resizes to zero
    val tiny = Multimodal.resize("image/png", pngBytes(Array(Array(0xff000000))))
    val backTiny = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(tiny))
    assert(backTiny.getWidth == 1 && backTiny.getHeight == 1)
    // non-image media types keep the byte-stride stub (the oracle-checked
    // size arithmetic path)
    val stubbed = Multimodal.resize("text/plain", Array[Byte](1, 2, 3, 4, 5))
    assert(stubbed.toSeq == Seq[Byte](1, 3, 5))
  }

  test("a corrupt image payload fails loudly, not silently") {
    val bad = Seq(MediaRow(1L, "image/png", 4L, Array[Byte](1, 2, 3, 4))).toDS()
    val ex = intercept[Exception](extractFeatures(bad).collect())
    assert(ex.getMessage != null)
  }

  test("quarantine mode survives corrupt payloads: flagged null-feature rows, good rows untouched") {
    val good = pngBytes(Array(Array(0xffff0000)))
    val rows = Seq(
      MediaRow(1L, "image/png", 4L, Array[Byte](1, 2, 3, 4)), // truncated garbage
      MediaRow(2L, "image/png", good.length.toLong, good),
      MediaRow(3L, "text/plain", 2L, Array[Byte](10, 20))
    ).toDS()
    val f = extractFeatures(rows, quarantine = true).collect()
      .map(m => m.doc_id -> m).toMap
    assert(f(1L).decode_error.isDefined, "corrupt row must carry its failure")
    assert(f(1L).byte_mean.isNaN && f(1L).feature.isEmpty)
    assert(f(2L).decode_error.isEmpty && f(2L).width.contains(1), "good image decodes normally")
    assert(f(3L).decode_error.isEmpty && f(3L).byte_mean == 15.0, "stub path unaffected")
    // skip-and-count: the flag column is the count
    assert(extractFeatures(rows, quarantine = true)
      .filter(_.decode_error.isDefined).count() == 1)
  }

  test("image types the JVM has no codec for take the stub path instead of crashing") {
    // a valid webp payload would be undecodable by ImageIO — capability
    // dispatch must route it (and any unknown image subtype) to the stub
    assert(!Multimodal.imageIoDecodable("image/webp"))
    assert(Multimodal.imageIoDecodable("image/png"))
    val rows = Seq(MediaRow(1L, "image/webp", 4L, Array[Byte](10, 20, 30, 40))).toDS()
    val f = extractFeatures(rows).collect().head
    assert(f.width.isEmpty && f.byte_mean == 25.0) // stub features, no throw
    assert(Multimodal.resize("image/webp", Array[Byte](1, 2, 3)).toSeq == Seq[Byte](1, 3))
  }

  private def gradientPng(reversed: Boolean = false, shift: Int = 0): Array[Byte] = {
    // 18x16: gray strictly increases with x (or decreases when
    // reversed); `shift` raises every pixel uniformly (clamped away by
    // construction: values stay < 256)
    val px = Array.tabulate(16, 18) { (_, x) =>
      val g = (if (reversed) 17 - x else x) * 10 + shift
      0xff000000 | (g << 16) | (g << 8) | g
    }
    pngBytes(px.map(_.toArray))
  }

  test("dHash of a left-to-right gradient is analytically all ones; reversed, all zeros") {
    // every 9x8 grid cell pools a 2x2 block whose mean strictly
    // increases with gx, so every comparison bit is set
    val inc = Multimodal.dHash(MediaRow(1L, "image/png",
      gradientPng().length.toLong, gradientPng()))
    assert(inc == -1L, f"expected all-64-bits-set, got $inc%016x")
    val dec = Multimodal.dHash(MediaRow(2L, "image/png",
      gradientPng(reversed = true).length.toLong, gradientPng(reversed = true)))
    assert(dec == 0L, f"expected zero hash, got $dec%016x")
  }

  test("dHash is invariant under a uniform brightness shift; near-dedup pairs shifted copies") {
    val a = gradientPng()
    val b = gradientPng(shift = 60) // same comparisons, +60 brightness
    val c = gradientPng(reversed = true) // opposite: hamming 64
    val media = Seq(
      MediaRow(1L, "image/png", a.length.toLong, a),
      MediaRow(2L, "image/png", b.length.toLong, b),
      MediaRow(3L, "image/png", c.length.toLong, c)).toDS()
    val ph = Multimodal.phashes(media)
    val m = ph.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L), "brightness shift must not change the hash")
    assert(java.lang.Long.bitCount(m(1L) ^ m(3L)) == 64)
    val pairs = graft.operators.NearDedup.hamming64NearDups(ph, "phash", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)), s"got ${pairs.toSeq}")
  }

  test("stub dHash: identical payloads hash identically, empty payload hashes to 0") {
    val p = Array.tabulate(100)(i => ((i * 37) % 251).toByte)
    val h1 = Multimodal.dHashStub(p)
    assert(h1 == Multimodal.dHashStub(p.clone()))
    assert(Multimodal.dHashStub(Array.empty[Byte]) == 0L)
    // a different payload separates (deterministic, not a tautology:
    // reversed stride samples give different comparisons)
    assert(h1 != Multimodal.dHashStub(p.reverse))
  }

  /** 16-bit mono PCM WAV bytes of the given samples (amplitude in
    * [-1, 1]), via the same javax.sound writer a producer would use.
    */
  private def wavBytes(samples: Array[Double], rate: Float = 8000f): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val raw = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      val v = math.max(-32768, math.min(32767, math.round(s * 32767).toInt))
      raw(2 * i) = (v & 0xff).toByte
      raw(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audio/wav payloads get a REAL javax.sound decode with exact amplitude stats") {
    val n = 8000
    val amp = 0.5
    val sine = Array.tabulate(n)(i => amp * math.sin(2 * math.Pi * 440 * i / 8000.0))
    val row = Multimodal.MediaRow(7L, "audio/wav", 0L, wavBytes(sine))
    val f = Multimodal.decode(row)
    // mean |sine| = 2A/pi, RMS per quarter = A/sqrt(2) (whole cycles)
    assert(math.abs(f.byte_mean / 255.0 - 2 * amp / math.Pi) < 1e-3, f.byte_mean)
    assert(f.feature.length == 4)
    f.feature.foreach(q => assert(math.abs(q - amp / math.sqrt(2)) < 1e-3, q))
    // silence decodes to zero everywhere
    val silent = Multimodal.decode(
      Multimodal.MediaRow(8L, "audio/wav", 0L, wavBytes(Array.fill(1000)(0.0))))
    assert(silent.byte_mean == 0.0 && silent.feature.forall(_ == 0f))
    // garbage bytes under an audio type: loud by default, flagged in quarantine
    val junk = Multimodal.MediaRow(9L, "audio/wav", 3L, Array[Byte](1, 2, 3))
    intercept[Exception](Multimodal.decode(junk))
    val q = Multimodal.decodeQuarantine(junk)
    assert(q.decode_error.nonEmpty && q.feature.isEmpty)
    // audio types the JVM can't decode (mp3) still take the stub path
    val mp3 = Multimodal.MediaRow(10L, "audio/mpeg", 4L, Array[Byte](1, 2, 3, 4))
    assert(Multimodal.decode(mp3).feature.length == 4) // stub shape, no crash
  }

  test("audio decode branches on the stream's declared encoding, not the sample width") {
    // the two shapes a width-only decoder silently corrupts: AIFF 8-bit
    // is PCM_SIGNED (WAV 8-bit is unsigned), and audio/basic (AU) is
    // mu-law companded, not linear at all
    import javax.sound.sampled._
    val n = 8000
    val amp = 0.5
    val sine = Array.tabulate(n)(i => amp * math.sin(2 * math.Pi * 440 * i / 8000.0))

    // signed 8-bit big-endian mono AIFF
    val fmt8 = new AudioFormat(8000f, 8, 1, true, true)
    val raw8 = sine.map(s =>
      math.max(-128, math.min(127, math.round(s * 127).toInt)).toByte)
    val bos8 = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(raw8), fmt8, n.toLong),
      AudioFileFormat.Type.AIFF, bos8)
    val aiff = Multimodal.decode(
      Multimodal.MediaRow(11L, "audio/aiff", 0L, bos8.toByteArray))
    // mean |sine| = 2A/pi — a decoder reading these signed bytes as
    // unsigned would center them at -1 and report byte_mean ~255
    assert(math.abs(aiff.byte_mean / 255.0 - 2 * amp / math.Pi) < 1e-2,
      s"AIFF signed 8-bit mis-decoded: byte_mean=${aiff.byte_mean}")

    // mu-law AU: build 16-bit PCM, compand via the JVM's own converter
    val fmt16 = new AudioFormat(8000f, 16, 1, true, false)
    val raw16 = new Array[Byte](n * 2)
    sine.zipWithIndex.foreach { case (s, i) =>
      val v = math.max(-32768, math.min(32767, math.round(s * 32767).toInt))
      raw16(2 * i) = (v & 0xff).toByte
      raw16(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val pcmIn = new AudioInputStream(
      new java.io.ByteArrayInputStream(raw16), fmt16, n.toLong)
    val ulawIn = AudioSystem.getAudioInputStream(
      new AudioFormat(AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, false),
      pcmIn)
    val bosU = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ulawIn, AudioFileFormat.Type.AU, bosU)
    val au = Multimodal.decode(
      Multimodal.MediaRow(12L, "audio/basic", 0L, bosU.toByteArray))
    // companding round-trip is lossy but close; reading the mu-law
    // bytes as linear PCM would be off by an order of magnitude
    assert(math.abs(au.byte_mean / 255.0 - 2 * amp / math.Pi) < 2e-2,
      s"ULAW mis-decoded: byte_mean=${au.byte_mean}")
    au.feature.foreach(q =>
      assert(math.abs(q - amp / math.sqrt(2)) < 2e-2, s"ULAW RMS off: $q"))
  }

  test("video keyframes: fixed-stride demux + REAL BMP decode match the doc_id arithmetic") {
    val docs = Seq((0L, "x"), (3L, "y"), (5L, "z")).toDF("doc_id", "text")
    val vids = documentsAsVideo(docs).collect().map(v => v.doc_id -> v).toMap
    // container size = frames × fixed BMP size (the stride IS the demuxer)
    assert(vids(0L).n_frames == 1 && vids(0L).payload.length == BmpFrameBytes)
    assert(vids(3L).n_frames == 4 && vids(3L).payload.length == 4 * BmpFrameBytes)
    val kf = videoKeyframes(documentsAsVideo(docs), stride = 2).collect()
      .map(k => (k.doc_id, k.frame_idx) -> k).toMap
    // doc 3 (4 frames): keyframes 0 and 2; doc 5 (2 frames): keyframe 0
    assert(kf.keySet == Set((0L, 0L), (3L, 0L), (3L, 2L), (5L, 0L)))
    kf.values.foreach { k =>
      assert(k.width.contains(KeyframeDim) && k.height.contains(KeyframeDim))
      assert(k.decode_error.isEmpty)
      // solid gray (d·7 + j·13) % 256 decodes to mean luma = the gray
      assert(k.gray.contains((k.doc_id * 7 + k.frame_idx * 13) % 256),
        s"decoded luma of a solid frame must be its gray value: $k")
    }
  }

  test("video keyframes quarantine: a corrupt FRAME flags its row, the container's other frames decode") {
    val v = documentsAsVideo(Seq((3L, "x")).toDF("doc_id", "text")).head() // 4 frames
    val corrupt = v.payload.clone()
    // zero frame 2's BMP magic — ImageIO finds no reader for that slice
    corrupt(2 * BmpFrameBytes) = 0
    corrupt(2 * BmpFrameBytes + 1) = 0
    val bad = Seq(VideoRow(3L, 4, corrupt)).toDS()
    // correctness-first default: the torn frame kills the job loudly
    val ex = intercept[Exception](videoKeyframes(bad, stride = 2).collect())
    assert(ex.getMessage != null)
    // quarantine: frame 2 flagged with null decode outputs, frame 0 intact
    val q = videoKeyframes(bad, stride = 2, quarantine = true).collect()
      .map(k => k.frame_idx -> k).toMap
    assert(q.keySet == Set(0L, 2L))
    assert(q(0L).decode_error.isEmpty && q(0L).gray.contains((3L * 7) % 256))
    assert(q(2L).decode_error.isDefined, "corrupt frame must carry its failure")
    assert(q(2L).width.isEmpty && q(2L).height.isEmpty && q(2L).gray.isEmpty)
  }
}
