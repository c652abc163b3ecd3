package graft

import graft.operators.VectorOps
import org.apache.spark.sql.functions._

/** The index auto-sizing rules, exercised past fixture scale: the sizing
  * math (lshDedupPlanes log₂ growth, ivfCells √n, the capped-recall
  * warning) is reasoned in comments but the fixture corpora are too small
  * to trip any of it — this spec checks the rules where they matter, on a
  * synthetic ≥100k-vector corpus and at web-scale row counts.
  */
class ScaleShapeSpec extends SparkSpec {

  /** Synthetic corpus: n rows of dims uniform floats in [-1, 1). Enough
    * spread that SRP codes occupy most buckets — the regime the balance
    * claim is about.
    */
  private def syntheticEmb(n: Long, dims: Int) =
    spark.range(n).select(col("id").as("vec_id"),
      array((0 until dims).map(i => (rand(i) * 2 - 1).cast("float")): _*).as("embedding"))

  test("auto-sized planes keep the average SRP bucket under maxBucket/2 on a 100k corpus") {
    val n = 100000L
    val maxBucket = 10000
    val planes = VectorOps.lshDedupPlanes(n, maxBucket)
    // the rule must actually grow past its floor for this n — a constant
    // answer here means the log is wired wrong
    assert(planes > 4, s"planes=$planes did not grow with the corpus")
    // measured, not derived: real band codes over 100k vectors, average
    // occupancy per (table, code) bucket
    val codes = VectorOps.lshBandCodes(spark, syntheticEmb(n, 16), nTables = 4, planes)
    val avgBucket = codes.groupBy("t", "code").count()
      .agg(avg("count")).head().getDouble(0)
    assert(avgBucket <= maxBucket / 2.0,
      s"average bucket $avgBucket at $planes planes exceeds ${maxBucket / 2}")
    // and the hot-bucket cap would drop nothing in this regime: the max
    // bucket stays under maxBucket, so recall is not silently eroded
    val max = codes.groupBy("t", "code").count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    assert(max <= maxBucket, s"max bucket $max exceeds the $maxBucket cap")
  }

  test("annLsh plane auto-sizing holds the per-table probe bucket ~constant across scales") {
    // the search path's rule: planes = log2(n/2500) in [6, 24] — the
    // EXPECTED bucket n/2^planes must stay in the same ~1.2k-2.5k band at
    // every scale the formula serves (a constant plane count would blow
    // this up linearly with n)
    for (n <- Seq(200000L, 10000000L, 1000000000L)) {
      val planes = math.min(24, math.max(6,
        math.ceil(math.log(math.max(1.0, n / 2500.0)) / math.log(2)).toInt))
      val expectedBucket = n.toDouble / math.pow(2, planes)
      assert(expectedBucket <= 2500.0,
        s"n=$n planes=$planes expected bucket $expectedBucket")
    }
  }

  test("ivfCells tracks sqrt(n) between its floor and cap across magnitudes") {
    for (exp <- 2 to 12) {
      val n = math.pow(10.0, exp).toLong
      val c = VectorOps.ivfCells(n)
      val unclamped = math.ceil(math.sqrt(n.toDouble)).toInt
      assert(c == math.max(16, math.min(4096, unclamped)),
        s"ivfCells($n)=$c is not clamped sqrt")
      // the derived average cell stays sub-linear: at the cap the answer
      // is 'shard the index', documented, not a silent bucket explosion
      if (c < 4096) assert(n.toDouble / c <= math.sqrt(n.toDouble) + 1,
        s"average cell ${n.toDouble / c} exceeds sqrt(n) at n=$n")
    }
  }

  test("the capped-recall warning fires for threshold 0.4 at web scale (not a silent degrade)") {
    val baos = new java.io.ByteArrayOutputStream()
    val orig = System.err
    val (tables, planes) = try {
      System.setErr(new java.io.PrintStream(baos, true))
      VectorOps.lshDedupParams(0.4, 0.9, 1000000000L, 10000)
    } finally System.setErr(orig)
    val warned = baos.toString
    assert(tables == 256, s"cap must engage at low threshold × web scale, got $tables")
    assert(warned.contains("capped at") && warned.contains("recall"),
      s"capped recall must be LOGGED, got: '$warned'")
    // and the workable regime stays silent: same corpus, dedup-grade threshold
    val quiet = new java.io.ByteArrayOutputStream()
    val (t2, _) = try {
      System.setErr(new java.io.PrintStream(quiet, true))
      VectorOps.lshDedupParams(0.9, 0.9, 1000000000L, 10000)
    } finally System.setErr(orig)
    assert(t2 < 256 && quiet.toString.isEmpty,
      s"high-threshold regime must not warn (tables=$t2, stderr='${quiet.toString}')")
  }

  test("pqCodebookSize tracks n/50 between its floor and byte-code cap") {
    for (exp <- 2 to 12) {
      val n = math.pow(10.0, exp).toLong
      val ks = VectorOps.pqCodebookSize(n)
      assert(ks == math.max(16L, math.min(256L, n / 50)).toInt,
        s"pqCodebookSize($n)=$ks is not clamped n/50")
    }
    // the cap is the hard byte-code ceiling: codes are unsigned bytes
    assert(VectorOps.pqCodebookSize(Long.MaxValue) == 256)
  }

  test("quantizer trainers skip null embeddings instead of crashing") {
    val withNulls = syntheticEmb(200, 8)
      .withColumn("embedding",
        when(col("vec_id") % 7 === 0, lit(null)).otherwise(col("embedding")))
    val books = VectorOps.trainPqCodebooks(withNulls, m = 2, ks = 4, dims = 8,
      maxTrainRows = 100000L, nRows = 200L)
    assert(books.length == 2 && books.forall(_.length == 4))
    val coarse = VectorOps.trainQuantizer(withNulls, cells = 4,
      maxTrainRows = 100000L, nRows = 200L)
    assert(coarse.length == 4)
  }

  test("sample-bounded PQ training on a 100k corpus yields live, full-width codebooks") {
    val n = 100000L
    val dims = 16
    val emb = syntheticEmb(n, dims)
    val ks = VectorOps.pqCodebookSize(n)
    assert(ks == 256, s"100k rows should hit the byte ceiling, got $ks")
    // training must touch only the 20k sample (the sampling branch), not
    // the corpus — if this collected all 100k the time and memory double
    val books = VectorOps.trainPqCodebooks(
      emb.select(col("embedding")), m = 8, ks = ks, dims = dims,
      maxTrainRows = 20000L, nRows = n)
    assert(books.length == 8 && books.forall(_.length == ks))
    assert(books.map(_(0).length).sum == dims, "subspace widths must tile dims")
    // encode the full corpus: every row compresses to exactly m bytes and
    // the codebooks are LIVE — a collapsed subspace (most rows on a few
    // codes) would mean the trainer quantizes a spread corpus poorly and
    // ADC ranking degenerates toward ties
    val codeRows = emb.select(org.apache.spark.sql.graft.PqNative
      .pqEncode(col("embedding"), books).as("codes"))
      .collect().map(_.getAs[Array[Byte]](0))
    assert(codeRows.forall(_.length == 8), "every row must compress to m bytes")
    (0 until 8).foreach { s =>
      val live = codeRows.iterator.map(c => c(s) & 0xFF).toSet.size
      assert(live >= ks / 2, s"subspace $s uses only $live of $ks codes")
    }
  }

  test("BPE learning on a 50k-word vocabulary stays reference-exact") {
    import spark.implicits._
    // synthetic Zipf-ish vocabulary: 50k distinct words over a 20-char
    // alphabet, frequency ~ 1/rank — the iteration input is exactly this
    // vocab relation at ANY corpus size, so this is the scale that
    // matters for the learner (not corpus rows)
    val words = (0 until 50000).map { i =>
      val len = 3 + (i % 8)
      val w = (0 until len).map(k => ('a' + ((i * 131 + k * 29) % 20)).toChar).mkString
      (w, (50000L / (i + 1)) + 1L)
    }
    // duplicates from the generator collapse by summing freq (groupBy)
    val wf = words.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val df = wf.toSeq.toDF("w", "freq")
    val got = graft.operators.Bpe.learnMerges(df, 6)
    // reference: same greedy fold + tie-break in plain Scala
    var sym: Map[Vector[String], Long] =
      wf.map { case (w, f) => w.map(_.toString).toVector -> f }
    val want = scala.collection.mutable.Buffer[(Int, String, String, String, Long)]()
    for (rank <- 1 to 6) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((s, f) <- sym; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + f
      val ((a, b), n) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      want += ((rank, a, b, a + b, n))
      sym = sym.groupMapReduce { case (s, _) =>
        val acc = Vector.newBuilder[String]; var last: String = null
        for (x <- s) {
          if (last == a && x == b) last = a + b
          else { if (last != null) acc += last; last = x }
        }
        if (last != null) acc += last
        acc.result()
      } { case (_, f) => f }(_ + _)
    }
    assert(got == want.toSeq, s"\ngot:  $got\nwant: ${want.toSeq}")
  }
}
