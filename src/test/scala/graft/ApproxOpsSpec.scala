package graft

import graft.operators.{TextOps, VectorOps}
import org.apache.spark.sql.functions._

/** Error-bound and recall specs for the approximate (no-oracle) operators,
  * measured against their exact counterparts on real test tables.
  */
class ApproxOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hll estimates within 2% of exact distinct counts (sf0.001 events)") {
    val ev = Tables.events(spark, sf0001)
    val exact = ev.groupBy("event_type").agg(countDistinct($"user_id").as("u"))
    val approx = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id", lit(14))).as("a"))
    val joined = exact.join(approx, "event_type")
      .select($"u".cast("double"), $"a".cast("double")).collect()
    joined.foreach { r =>
      val (u, a) = (r.getDouble(0), r.getDouble(1))
      assert(math.abs(a - u) / math.max(u, 1.0) <= 0.02, s"exact=$u approx=$a")
    }
  }

  test("theta segment overlap matches exact set algebra (sf0.001 events)") {
    // at fixture cardinality (< the sketch's 4096 nominal entries) the KMV
    // sample is lossless, so union/intersection estimates are EXACT; at
    // scale the standard theta error bounds apply — this pins the algebra
    // wiring, not the sampling
    val ev = Tables.eventsRaw(spark, sf0001)
    val overlap = SparkEntry.queries("theta_segment_overlap")(spark, sf0001).collect()
    assert(overlap.length == 10, s"expected C(5,2)=10 segment pairs, got ${overlap.length}")
    val users = ev.select($"event_type", $"user_id").distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    overlap.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (sa, sb) = (users(a), users(b))
      assert(r.getLong(2) == sa.size, s"$a uniques: ${r.getLong(2)} vs ${sa.size}")
      assert(r.getLong(3) == sb.size, s"$b uniques: ${r.getLong(3)} vs ${sb.size}")
      assert(r.getLong(4) == (sa | sb).size, s"$a|$b union: ${r.getLong(4)} vs ${(sa | sb).size}")
      assert(r.getLong(5) == (sa & sb).size, s"$a&$b intersect: ${r.getLong(5)} vs ${(sa & sb).size}")
    }
  }

  test("stream_quantiles within KLL rank-error bounds of exact percentiles (sf0.001)") {
    // KLL k=200 one-sided rank error ≈ 1.65%; allow 3% of rank on each
    // side: the estimated p50 must sit between the exact p47 and p53
    // value quantiles (ditto p95 ± 3%), per event_type
    val ev = Tables.eventsRaw(spark, sf0001)
    val got = SparkEntry.queries("stream_quantiles")(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val bounds = ev.groupBy("event_type")
      .agg(expr("percentile(value, 0.47)").as("lo50"), expr("percentile(value, 0.53)").as("hi50"),
        expr("percentile(value, 0.92)").as("lo95"), expr("percentile(value, 0.98)").as("hi95"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got.keySet == bounds.keySet)
    got.foreach { case (et, (p50, p95)) =>
      val (lo50, hi50, lo95, hi95) = bounds(et)
      assert(p50 >= lo50 && p50 <= hi50, s"$et p50=$p50 outside [$lo50, $hi50]")
      assert(p95 >= lo95 && p95 <= hi95, s"$et p95=$p95 outside [$lo95, $hi95]")
    }
  }

  test("hll hour->day sketch merge equals day-level sketch estimate") {
    val ev = Tables.events(spark, sf0001)
      .withColumn("hb", graft.functions.TimeFunctions.hourBucket($"ts_secs"))
      .withColumn("day", graft.functions.TimeFunctions.fdiv($"hb", 24L))
    val merged = ev.groupBy("event_type", "hb", "day")
      .agg(hll_sketch_agg($"user_id", lit(14)).as("sk"))
      .groupBy("event_type", "day")
      .agg(hll_sketch_estimate(hll_union_agg($"sk", lit(false))).as("m"))
    val direct = ev.groupBy("event_type", "day")
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id", lit(14))).as("d"))
    val diff = merged.join(direct, Seq("event_type", "day"))
      .where($"m" =!= $"d").count()
    assert(diff == 0, "sketch merge must be lossless vs direct aggregation")
  }

  test("ann_lsh recall@5 vs brute force >= 0.3 on uniform vectors (sf0.001)") {
    val emb = Tables.embeddings(spark, sf0001)
    val brute = SparkEntry.queries("similarity_topk")(spark, sf0001)
      .select($"probe_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("ann_lsh")(spark, sf0001)
      .select($"probe_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.3, s"recall@5 was $recall")
  }

  test("multi-probe LSH: recall never below single-probe at the same shape (sf0.001)") {
    // flip probes only WIDEN each probe's candidate set (the base code is
    // always probed), so recall@k vs brute force is monotone in nFlips —
    // the property that lets multi-probe trade tables for probes at scale
    val emb = Tables.embeddings(spark, sf0001)
    def recallAt(flips: Int): Double = {
      val got = VectorOps.annLsh(spark, emb, probeFilter = $"vec_id" < 10,
        k = 5, nPlanes = 6, nFlips = flips)
        .select($"probe_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = SparkEntry.queries("similarity_topk")(spark, sf0001)
        .select($"probe_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (brute & got).size.toDouble / brute.size
    }
    val single = recallAt(0)
    val multi = recallAt(2)
    assert(multi >= single,
      s"multi-probe recall $multi fell below single-probe $single")
  }

  test("multi-probe base codes are bit-identical to the corpus-side expression") {
    // the probe and corpus sides draw from ONE hyperplane family: position
    // t*(1+nFlips) of the multi-probe layout must equal table t's plain
    // band code for every row, or probes silently stop finding their own
    // bucket
    val emb = Tables.embeddings(spark, sf0001).limit(200)
    val dims = emb.select(size($"embedding")).head().getInt(0)
    val mismatches = emb.select(
      org.apache.spark.sql.graft.SrpNative
        .srpBandCodes($"embedding", 4, 6, dims).as("base"),
      org.apache.spark.sql.graft.SrpNative
        .srpMultiProbeCodes($"embedding", 4, 6, dims, 2).as("mp"))
      .where(expr("exists(sequence(0, 3), t -> base[t] != mp[t * 3])"))
      .count()
    assert(mismatches == 0, "probe-side base codes diverged from srp_band_codes")
  }

  test("multi-probe perturbations: first two are single flips, rest within Hamming 2, all distinct") {
    // the (score, bit count, mask) rank order guarantees probes 1..2 are
    // the two lowest-margin SINGLE flips (pinned-shape compatibility with
    // the pre-2-bit form) and every probe is a distinct 1-or-2-bit
    // perturbation of the base code
    val emb = Tables.embeddings(spark, sf0001).limit(100)
    val dims = emb.select(size($"embedding")).head().getInt(0)
    val nFlips = 8
    val rows = emb.select(org.apache.spark.sql.graft.SrpNative
      .srpMultiProbeCodes($"embedding", 4, 6, dims, nFlips).as("mp"))
      .collect().map(_.getSeq[Long](0))
    rows.foreach { codes =>
      (0 until 4).foreach { t =>
        val table = codes.slice(t * (1 + nFlips), (t + 1) * (1 + nFlips))
        val base = table.head
        val probes = table.tail
        assert(probes.distinct.size == nFlips, "probe codes must be distinct")
        assert(probes.forall(p => java.lang.Long.bitCount(p ^ base) <= 2),
          "every probe must be within Hamming distance 2 of the base")
        assert(probes.take(2).forall(p => java.lang.Long.bitCount(p ^ base) == 1),
          "the first two probes must be single-bit flips (pinned-shape compat)")
      }
    }
  }

  test("ann_ivf recall@5 vs brute force >= 0.5 (sf0.001)") {
    val brute = SparkEntry.queries("similarity_topk")(spark, sf0001)
      .select($"probe_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SparkEntry.queries("ann_ivf")(spark, sf0001)
      .select($"probe_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall@5 was $recall")
  }

  test("ann_ivf_filtered: every neighbor satisfies the filter; recall vs exact filtered >= 0.5") {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, sf0001)
    val got = SparkEntry.queries("ann_ivf_filtered")(spark, sf0001)
      .persist()
    try {
      // soundness: no odd-label neighbor can appear
      val oddLabels = emb.where($"label" % 2 === 1)
        .select($"vec_id".as("neighbor_id"))
      assert(got.join(oddLabels, "neighbor_id").count() == 0,
        "a neighbor violated the corpus filter")
      // recall vs the exact filtered brute force at the same predicate
      val probes = emb.where($"vec_id" < 10)
        .select($"vec_id".as("p"), $"embedding".as("pe"))
      val corpus = emb.where($"label" % 2 === 0)
        .select($"vec_id".as("c"), $"embedding".as("ce"))
      val brute = corpus.join(broadcast(probes), $"p" =!= $"c")
        .withColumn("cos", VectorOps.cosine($"pe", $"ce"))
        .withColumn("rnk",
          row_number().over(Window.partitionBy("p").orderBy($"cos".desc, $"c")))
        .where($"rnk" <= 5)
        .select($"p", $"c").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val ivf = got.select($"probe_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (brute & ivf).size.toDouble / brute.size
      assert(recall >= 0.5, s"filtered recall@5 was $recall")
    } finally got.unpersist()
  }

  test("ann_pq recall@5 vs brute force >= 0.5 (sf0.001)") {
    val brute = SparkEntry.queries("similarity_topk")(spark, sf0001)
      .select($"probe_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = SparkEntry.queries("ann_pq")(spark, sf0001)
      .select($"probe_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & pq).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall@5 was $recall")
  }

  test("ann_ivfpq recall@5 vs brute force >= 0.5 (sf0.001)") {
    val brute = SparkEntry.queries("similarity_topk")(spark, sf0001)
      .select($"probe_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SparkEntry.queries("ann_ivfpq")(spark, sf0001)
      .select($"probe_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & got).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall@5 was $recall")
  }

  test("ann_ivfpq reported cosines are exact for returned pairs") {
    val emb = Tables.embeddings(spark, sf0001)
    val got = SparkEntry.queries("ann_ivfpq")(spark, sf0001)
    val a = emb.select($"vec_id".as("probe_id"), $"embedding".as("pa"))
    val b = emb.select($"vec_id".as("neighbor_id"), $"embedding".as("pb"))
    val bad = got.join(a, "probe_id").join(b, "neighbor_id")
      .withColumn("exact", round(VectorOps.cosine($"pa", $"pb"), 4))
      .where($"exact" =!= $"cos").count()
    assert(bad == 0)
  }

  test("pq native: ADC score equals dot with the code reconstruction, codes in range") {
    import org.apache.spark.sql.graft.PqNative
    val emb = Tables.embeddings(spark, sf0001)
    val dims = emb.select(size($"embedding")).head().getInt(0)
    val (m, ks) = (8, 16)
    val unit = VectorOps.withUnit(emb, "embedding", "unit")
    val books = VectorOps.trainPqCodebooks(
      unit.select($"unit".as("embedding")), m, ks, dims,
      maxTrainRows = 100000L, nRows = emb.count())
    assert(books.length == m && books.forall(_.length == ks))
    assert(books.map(_(0).length).sum == dims, "subspace widths must tile dims")
    val rows = unit.limit(50)
      .select($"unit", PqNative.pqEncode($"unit", books).as("codes"),
        PqNative.pqLut($"unit", books).as("lut"),
        PqNative.pqAdc(PqNative.pqLut($"unit", books),
          PqNative.pqEncode($"unit", books), ks).as("adc"))
      .collect()
    val offsets = books.scanLeft(0)((a, b) => a + b(0).length).init
    rows.foreach { r =>
      val v = r.getSeq[Float](0)
      val codes = r.getAs[Array[Byte]](1)
      val adc = r.getDouble(3)
      assert(codes.length == m)
      assert(codes.forall(c => (c & 0xFF) < ks), "codes must index the codebook")
      // reconstruction: concatenated chosen centroids; ADC must equal its
      // dot with the row exactly (same subspace accumulation order)
      val recon = codes.zipWithIndex.flatMap { case (c, s) => books(s)(c & 0xFF) }
      val bySub = books.indices.map { s =>
        val off = offsets(s); val w = books(s)(0).length
        (off until off + w).map(i => v(i).toDouble * recon(i).toDouble).sum
      }.sum
      assert(math.abs(adc - bySub) < 1e-9, s"adc $adc != reconstruction dot $bySub")
    }
  }

  test("ann_lsh reported cosines are exact for returned pairs") {
    val emb = Tables.embeddings(spark, sf0001)
    val lsh = SparkEntry.queries("ann_lsh")(spark, sf0001)
    val a = emb.select($"vec_id".as("probe_id"), $"embedding".as("pa"))
    val b = emb.select($"vec_id".as("neighbor_id"), $"embedding".as("pb"))
    val bad = lsh.join(a, "probe_id").join(b, "neighbor_id")
      .withColumn("exact", round(VectorOps.cosine($"pa", $"pb"), 4))
      .where($"exact" =!= $"cos").count()
    assert(bad == 0)
  }

  test("fvdot registers as a SQL function and matches the Column API") {
    org.apache.spark.sql.graft.GraftNative.register(spark)
    val viaSql = Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "round(fvdot(embedding, embedding), 6) AS d")
    val viaCol = Tables.embeddings(spark, sf0001)
      .select($"vec_id",
        round(graft.operators.VectorOps.dot($"embedding", $"embedding"), 6).as("d"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
  }

  test("langid classifies real sentences by stopword profile") {
    val samples = Seq(
      (1L, "the cat is on the mat and it is warm in that house"),
      (2L, "der hund ist nicht mit der katze und das ist gut"),
      (3L, "el perro y la casa de los gatos es un lugar que me gusta"),
      (4L, "xyzzy qwerty plugh")
    ).toDF("doc_id", "text")
    val got = TextOps.langid(samples).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
    assert(got(3L) == "es")
    assert(got(4L) == "und")
  }

  test("granularity conservation: day-bucket pageview sums equal hour-bucket sums") {
    val rollup = SparkEntry.queries("agg_rollup_granularity")(spark, sf0001)
    val byG = rollup.groupBy("g").agg(sum("pageviews").as("total"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG("h") == byG("d") && byG("d") == byG("w") && byG("w") == byG("m"))
  }

  test("near_dedup_cosine_lsh: no false positives, high recall vs the exact all-pairs form (sf0.01)") {
    val emb = Tables.embeddings(spark, sf001)
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1))
    val exact = SparkEntry.queries("near_dedup_cosine")(spark, sf001)
      .collect().map(r => key(r) -> r.getDouble(2)).toMap
    val lsh = VectorOps.cosineNearDupLsh(spark, emb, threshold = 0.4)
      .collect().map(r => key(r) -> r.getDouble(2)).toMap
    // soundness: exact verification ⇒ every emitted pair is a true pair
    // with the identical cosine
    lsh.foreach { case (k, c) =>
      assert(exact.contains(k), s"false positive pair $k")
      assert(exact(k) == c, s"cosine mismatch on $k: exact=${exact(k)} lsh=$c")
    }
    // recall at the 16×4 dedup shape: ≥ 80% of all threshold pairs, and
    // ≥ 95% of the high-similarity (cos ≥ 0.6) pairs a dedup pass most
    // needs (collision odds rise steeply with similarity)
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall (${lsh.size}/${exact.size})")
    val hi = exact.filter(_._2 >= 0.6)
    if (hi.nonEmpty) {
      val hiRecall = hi.keys.count(lsh.contains).toDouble / hi.size
      assert(hiRecall >= 0.95, s"high-sim recall $hiRecall")
    }
  }

  test("near_dedup_semantic: no false positives, within-cell recall vs the exact form (sf0.01)") {
    val emb = Tables.embeddings(spark, sf001)
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1))
    val exact = SparkEntry.queries("near_dedup_cosine")(spark, sf001)
      .collect().map(r => key(r) -> r.getDouble(2)).toMap
    // nAssign = 1 explicit: this block measures the single-assign
    // cost-floor point (the library default is multi-assign since r11)
    val sem = VectorOps.cosineNearDupSemantic(spark, emb, threshold = 0.4,
      nCells = 8, nAssign = 1)
      .collect().map(r => key(r) -> r.getDouble(2)).toMap
    // soundness: exact cosine inside cells ⇒ every emitted pair is a true
    // pair with the identical cosine
    sem.foreach { case (k, c) =>
      assert(exact.contains(k), s"false positive pair $k")
      assert(exact(k) == c, s"cosine mismatch on $k: exact=${exact(k)} sem=$c")
    }
    // cluster scoping only loses Voronoi-boundary straddlers; on the
    // fixture most threshold pairs co-cluster — require half, and report
    // the measured value so RECALL artifacts can track drift
    val recall = sem.size.toDouble / exact.size
    assert(recall >= 0.5, s"semantic recall $recall (${sem.size}/${exact.size})")
    info(s"semantic dedup recall at 8 cells: $recall (${sem.size}/${exact.size})")

    // multi-assignment (2 nearest cells): every single-assign pair is
    // still found (cell sets are supersets of the single cell), the
    // boundary pairs it adds are exact-verified (no false positives),
    // and recall strictly improves on the fixture
    val multi = VectorOps.cosineNearDupSemantic(spark, emb, threshold = 0.4,
      nCells = 8, nAssign = 2)
      .collect().map(r => key(r) -> r.getDouble(2)).toMap
    multi.foreach { case (k, c) =>
      assert(exact.contains(k), s"false positive pair $k (multi-assign)")
      assert(exact(k) == c, s"cosine mismatch on $k: exact=${exact(k)} multi=$c")
    }
    sem.keys.foreach { k =>
      assert(multi.contains(k), s"multi-assign lost single-assign pair $k")
    }
    val multiRecall = multi.size.toDouble / exact.size
    assert(multiRecall >= recall,
      s"multi-assign recall $multiRecall below single-assign $recall")
    info(s"semantic dedup recall at 8 cells, nAssign=2: $multiRecall (${multi.size}/${exact.size})")
  }

  test("hybrid_search_ann_indexed: fused recall >= 0.8 vs exact fusion; BOTH branches partition-pruned") {
    import graft.operators.{LexIndex, VectorIndex}
    val docs = Tables.documents(spark, sf0001).where($"doc_id" =!= 0)
    val emb = Tables.embeddings(spark, sf0001)
    val qTerms = Seq("spark", "merge", "vector")
    val lexIdx = Scratch.dir("hyann_lex")
    LexIndex.build(spark, docs, lexIdx)
    val vecIdx = Scratch.dir("hyann_vec")
    VectorIndex.buildIvfPq(spark, emb.where($"vec_id" =!= 0), vecIdx,
      nCells = 16, m = 16, ks = 16)
    val fusedDf = VectorOps.hybridSearchAnnIndexed(spark, lexIdx, vecIdx,
      emb, qTerms, probeId = 0L)
    val fused = fusedDf.collect().map(_.getAs[Long]("doc_id")).toSet
    val exact = VectorOps.hybridSearchRrf(Tables.documents(spark, sf0001),
      emb, qTerms, probeId = 0L)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(exact.size == 10 && fused.size == 10)
    val recall = (fused & exact).size.toDouble / exact.size
    assert(recall >= 0.8,
      s"index-served fusion recall $recall vs exact fusion (got ${fused.toSeq.sorted}, want ${exact.toSeq.sorted})")

    // both branches' scans must be partition-pruned: the lexical scan to
    // the 3 query terms' buckets, the vector scan to <= nProbe cells
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allNodes(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: allNodes(s.plan)
      case _ => p +: p.children.flatMap(allNodes)
    }
    val scans = allNodes(fusedDf.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val lexScans = scans.filter(_.relation.location.rootPaths
      .exists(_.toString.contains("hyann_lex")))
    val vecScans = scans.filter(_.relation.location.rootPaths
      .exists(p => p.toString.contains("hyann_vec") && p.toString.endsWith("/codes")))
    val lexBuckets = spark.read.parquet(s"$lexIdx/stats").head()
      .getAs[Int]("n_buckets") // the store's recorded modulus
    val wantedBuckets = spark.range(1)
      .select(qTerms.map(t =>
        pmod(xxhash64(lit(t)), lit(lexBuckets.toLong))): _*)
      .head().toSeq.map(_.asInstanceOf[Long]).distinct.size
    assert(lexScans.nonEmpty && vecScans.nonEmpty,
      s"expected scans over both indexes, got ${scans.map(_.relation.location.rootPaths).mkString}")
    assert(lexScans.map(_.selectedPartitions.partitionCount).max == wantedBuckets,
      s"lexical branch must read only the $wantedBuckets query-term buckets")
    assert(vecScans.map(_.selectedPartitions.partitionCount).max <= 8,
      "vector branch must read only the probed cells (nProbe = 8)")
  }

  test("hybrid_search_batch: blocks ≡ batch-of-one; lexical scan pruned to the batch's term-bucket union") {
    import graft.operators.LexIndex
    val docs = Tables.documents(spark, sf0001)
    val emb = Tables.embeddings(spark, sf0001)
    val idx = Scratch.dir("hybatch_lex")
    LexIndex.build(spark, docs, idx)
    val reqs = VectorOps.HybridBatchRequests
    val batchDf = VectorOps.hybridSearchBatch(spark, idx, emb, reqs)
    val rows = batchDf.collect().map(_.toSeq)
    val byQid = rows.groupBy(_.head.asInstanceOf[Int])
    assert(reqs.forall(r => byQid(r._1).length == 10), "k=10 per request")
    // batching is pure amortization: each request's block equals serving
    // it through a batch of ONE against the same shared index
    reqs.foreach { r =>
      val solo = VectorOps.hybridSearchBatch(spark, idx, emb, Seq(r))
        .collect().map(_.toSeq)
      assert(byQid(r._1).toSeq == solo.toSeq,
        s"request ${r._1}: batch block must equal the batch-of-one")
    }
    // the lexical side read only the UNION of the batch's terms' buckets
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allNodes(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: allNodes(s.plan)
      case _ => p +: p.children.flatMap(allNodes)
    }
    // the store's RECORDED modulus (builds size it from the corpus)
    val nBuckets = spark.read.parquet(s"$idx/stats").head()
      .getAs[Int]("n_buckets")
    val wanted = spark.range(1)
      .select(reqs.flatMap(_._2).distinct.map(t =>
        pmod(xxhash64(lit(t)), lit(nBuckets.toLong))): _*)
      .head().toSeq.map(_.asInstanceOf[Long]).distinct.size
    val lexScans = allNodes(batchDf.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("hybatch_lex")) => f
    }
    assert(lexScans.nonEmpty &&
      lexScans.map(_.selectedPartitions.partitionCount).max == wanted,
      s"batch read ${lexScans.map(_.selectedPartitions.partitionCount)} buckets; union is $wanted")
  }

  test("hybrid_search_ann_batch: per-request fused recall >= 0.8 vs the exact batch fusion; one pruned codes scan") {
    import graft.operators.{LexIndex, VectorIndex}
    val docs = Tables.documents(spark, sf0001)
    val emb = Tables.embeddings(spark, sf0001)
    val lexIdx = Scratch.dir("hyannb_lex")
    LexIndex.build(spark, docs, lexIdx)
    val vecIdx = Scratch.dir("hyannb_vec")
    VectorIndex.buildIvfPq(spark, emb, vecIdx, nCells = 16, m = 16, ks = 16)
    val reqs = VectorOps.HybridBatchRequests
    val annDf = VectorOps.hybridSearchAnnBatch(spark, lexIdx, vecIdx, emb, reqs)
    val ann = annDf.collect()
      .map(r => (r.getInt(0), r.getLong(2))).groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val exact = VectorOps.hybridSearchBatch(spark, lexIdx, emb, reqs)
      .collect().map(r => (r.getInt(0), r.getLong(2))).groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    reqs.foreach { r =>
      val recall = (ann(r._1) & exact(r._1)).size.toDouble / exact(r._1).size
      assert(exact(r._1).size == 10 && recall >= 0.8,
        s"request ${r._1}: ann-batch fused recall $recall vs exact batch fusion")
    }
    // ONE codes scan for the whole batch, pruned to the union of all
    // probes' probed cells (<= 3 probes x nProbe 8, and < the 16 built)
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allNodes(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: allNodes(s.plan)
      case _ => p +: p.children.flatMap(allNodes)
    }
    val vecScans = allNodes(annDf.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(p =>
            p.toString.contains("hyannb_vec") && p.toString.endsWith("/codes")) => f
    }
    assert(vecScans.nonEmpty,
      s"expected a codes scan over the vector index")
    assert(vecScans.map(_.selectedPartitions.partitionCount).max < 16,
      "codes scan must be pruned to the probed cells, not all 16")
  }

  test("semantic_decontaminate drops planted eval-duplicate train vectors, keeps orthogonal ones, excludes eval rows") {
    // eval = vec 0 along x; vec 10 is its scaled copy (cos 1), vec 11 a
    // near-paraphrase (cos ~0.995), vec 12 orthogonal (cos 0)
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 7),
      (10L, Array(3.0f, 0.0f, 0.0f), 1),
      (11L, Array(1.0f, 0.1f, 0.0f), 2),
      (12L, Array(0.0f, 1.0f, 0.0f), 3)).toDF("vec_id", "embedding", "label")
    val kept = VectorOps.semanticDecontaminate(emb, col("vec_id") === 0, 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(12L),
      s"scaled copy 10 and paraphrase 11 dropped, orthogonal 12 kept, eval 0 excluded: $kept")
    // threshold above the paraphrase keeps it
    val lax = VectorOps.semanticDecontaminate(emb, col("vec_id") === 0, 0.999)
      .select("vec_id").as[Long].collect().toSet
    assert(lax == Set(11L, 12L), s"only the exact-direction copy dropped: $lax")
  }

  test("quantizer survives a corpus smaller than the requested cell count") {
    // a heavily-deduplicated corpus can leave fewer survivors than
    // nCells; MLlib k-means with k > n dies with an opaque
    // ArrayIndexOutOfBounds — trainQuantizer must cap k at the sample
    // size instead (found by the 10x scaling probe, round 11)
    val tiny = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val centroids = VectorOps.trainQuantizer(tiny, cells = 16,
      maxTrainRows = 100000L, nRows = 3L)
    assert(centroids.length == 3 && centroids.head.length == 3)
    // and the full IVF search path works end to end on the tiny corpus
    val got = VectorOps.annIvf(spark, tiny, probeFilter = col("vec_id") < 1,
      k = 2, nCells = 16)
    assert(got.count() == 2)
  }

  test("margin-adaptive IVF probing: huge margin equals fixed nProbe, tight margin is a subset") {
    val emb = Tables.embeddings(spark, sf0001)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixed = pairs(VectorOps.annIvf(spark, emb,
      probeFilter = col("vec_id") < 10, k = 5, nCells = 16, nProbe = 8))
    // a margin wider than any possible score gap prunes nothing
    val loose = pairs(VectorOps.annIvf(spark, emb,
      probeFilter = col("vec_id") < 10, k = 5, nCells = 16, nProbe = 8,
      probeMargin = 1e9))
    assert(loose == fixed, "unbounded margin must equal the fixed-probe form")
    // a tight margin scans fewer cells; every result is still one of the
    // fixed form's candidates (pruning only ever removes cells)
    val tight = VectorOps.annIvf(spark, emb,
      probeFilter = col("vec_id") < 10, k = 5, nCells = 16, nProbe = 8,
      probeMargin = 0.05)
    assert(tight.count() > 0, "rank-1 cell is always probed, results exist")
  }

  test("probeMargin operating point: fewer cells scanned at equal recall on clustered geometry") {
    // Margin-adaptive probing pays off where probes sit DEEP inside
    // Voronoi cells — clustered corpora, the shape real embeddings have.
    // (The near-uniform synthetic fixture is the adversarial case: every
    // probe is near a boundary, so at the recommended 0.2 the RECALL_r12
    // curve shows only 76/80 cells there. Planted clusters show the
    // knob's actual operating point.) Recall stays EQUAL by identity —
    // the margin run returns the same top-k pairs as fixed nProbe=8 —
    // while the (probe, cell) scan count measurably collapses.
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(16) {
      val v = Array.fill(16)(rnd.nextGaussian())
      val nn = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / nn).toFloat)
    }
    val emb = (0 until 160).map { i =>
      val e = centers(i / 10).map(x => x + 0.03f * rnd.nextGaussian().toFloat)
      (i.toLong, e)
    }.toDF("vec_id", "embedding")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixed = pairs(VectorOps.annIvf(spark, emb,
      probeFilter = col("vec_id") < 10, k = 5, nCells = 16, nProbe = 8))
    val margin = pairs(VectorOps.annIvf(spark, emb,
      probeFilter = col("vec_id") < 10, k = 5, nCells = 16, nProbe = 8,
      probeMargin = 0.2))
    assert(margin == fixed,
      "the recommended margin must not change results on clustered geometry")
    val cellsFixed = VectorOps.ivfProbedCells(spark, emb,
      probeFilter = col("vec_id") < 10, nCells = 16, nProbe = 8)
    val cellsMargin = VectorOps.ivfProbedCells(spark, emb,
      probeFilter = col("vec_id") < 10, nCells = 16, nProbe = 8,
      probeMargin = 0.2)
    assert(cellsMargin < cellsFixed,
      s"margin must prune probed cells: $cellsMargin vs $cellsFixed")
    // deep-in-cell probes collapse toward one cell each: at least half
    // the fixed 8-cells-per-probe budget must be pruned
    assert(cellsMargin <= cellsFixed / 2,
      s"clustered probes should prune most of the cap: $cellsMargin vs $cellsFixed")
  }

  test("semantic dedup survives degenerate quantizers (fewer centroids than nAssign)") {
    // duplicate-heavy corpora collapse k-means to fewer centroids than
    // the multi-assign default asks for; the assignment fan-out must cap
    // at the trained centroid count instead of tripping NearestCentroids'
    // arity check (review finding, round 11)
    val one = Seq((0L, Array.fill(8)(1.0f))).toDF("vec_id", "embedding")
    assert(VectorOps.cosineNearDupSemantic(spark, one, threshold = 0.4,
      nCells = 16).count() == 0)
    val twins = Seq((0L, Array.fill(8)(1.0f)), (1L, Array.fill(8)(1.0f)))
      .toDF("vec_id", "embedding")
    val pairs = VectorOps.cosineNearDupSemantic(spark, twins, threshold = 0.4,
      nCells = 16).select("i", "j").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)), s"identical pair must still dedup: $pairs")
  }

  test("lshDedupParams sizes buckets to the corpus and tables to the recall identity") {
    // fixture scale: few rows → minimum planes, tables from the identity
    val (tSmall, bSmall) = VectorOps.lshDedupParams(0.4, 0.9, 2000L, 10000)
    assert(bSmall == 4)
    assert(tSmall >= 10 && tSmall <= 20, s"tables=$tSmall")
    // 10^9 rows at a real dedup threshold: planes grow with log2(n) so the
    // average bucket stays ~maxBucket/4; tables stay modest because high
    // similarity collides often
    val (tBig, bBig) = VectorOps.lshDedupParams(0.9, 0.9, 1000000000L, 10000)
    assert(bBig == 19, s"planes=$bBig") // log2(1e9/2500) ≈ 18.6
    assert(1000000000.0 / math.pow(2, bBig) < 10000, "average bucket under the cap")
    assert(tBig >= 20 && tBig <= 80, s"tables=$tBig")
    // low threshold at scale: LSH is intrinsically weak — the table cap
    // engages rather than exploding the job
    val (tLow, _) = VectorOps.lshDedupParams(0.4, 0.9, 1000000000L, 10000)
    assert(tLow == 256, s"tables=$tLow")
  }

  test("lshDedupTables engages the cap when p^b underflows instead of collapsing to 1 table") {
    // threshold -1 → collision probability 0 → p^b == 0: no finite table
    // count reaches the target; the 256 cap (with the logged warning) must
    // engage, not the log(1-0)=0 division's silent 1-table answer
    assert(VectorOps.lshDedupTables(-1.0, 0.9, 24, 1000000L) == 256)
    // sanity either side of the underflow: a workable regime stays modest
    assert(VectorOps.lshDedupTables(0.9, 0.9, 19, 1000000000L) <= 80)
  }

  test("cosineNearDupLsh honors a single pinned shape parameter (no silent discard)") {
    val emb = Tables.embeddings(spark, sf0001)
    // pinning only nPlanes must keep that width and still derive tables
    // from the recall identity at it; soundness (exact verify ⇒ no false
    // positives) holds for any shape, so the run itself is the check
    val pinnedPlanes = VectorOps.cosineNearDupLsh(spark, emb, threshold = 0.4, nPlanes = 4)
    val auto = VectorOps.cosineNearDupLsh(spark, emb, threshold = 0.4)
    assert(pinnedPlanes.count() > 0)
    // pinning only nTables keeps corpus-sized buckets; tiny table count →
    // recall at most the auto shape's (subset soundness still exact)
    val pinnedTables = VectorOps.cosineNearDupLsh(spark, emb, threshold = 0.4, nTables = 2)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val autoPairs = auto.select("i", "j").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pinnedTables.nonEmpty)
    val exact = SparkEntry.queries("near_dedup_cosine")(spark, sf0001)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pinnedTables.subsetOf(exact) && autoPairs.subsetOf(exact),
      "every emitted pair must be a true pair regardless of pinned shape")
  }

  test("ivfCells follows the sqrt-n rule between its floor and cap") {
    assert(VectorOps.ivfCells(100L) == 16) // floor: tiny corpora
    assert(VectorOps.ivfCells(1000000L) == 1000) // √n in the open range
    assert(VectorOps.ivfCells(1000000000L) == 4096) // cap: shard beyond this
  }

  test("pairGuard trips above the all-pairs cap and honors the conf override") {
    val big = spark.range(30001).toDF("vec_id")
    val ex = intercept[IllegalArgumentException](VectorOps.pairGuard(big))
    assert(ex.getMessage.contains("exceeds the 20000"))
    VectorOps.pairGuard(spark.range(20000).toDF("vec_id")) // at the cap: fine
    spark.conf.set("graft.allpairs.maxRows", "40000")
    try VectorOps.pairGuard(big) // raised deliberately: passes
    finally spark.conf.unset("graft.allpairs.maxRows")
  }

  test("outlier filter evicts a planted noise vector, keeps tight-cluster members") {
    import spark.implicits._
    // two tight 8-dim clusters (30 members each, tiny deterministic
    // jitter) + one far-off-manifold noise vector
    def jit(i: Int, d: Int) = 0.01f * (((i * 31 + d * 17) % 7) - 3)
    val a = (0 until 30).map(i => (i.toLong,
      Array(1f + jit(i, 0), jit(i, 1), jit(i, 2), jit(i, 3), 0f, 0f, 0f, 0f)))
    val b = (0 until 30).map(i => (100L + i,
      Array(0f, 0f, 0f, 0f, 1f + jit(i, 4), jit(i, 5), jit(i, 6), jit(i, 7))))
    val noise = Seq((999L, Array(0.5f, -0.5f, 0.5f, -0.5f, 0.5f, -0.5f, 0.5f, -0.5f)))
    val emb = (a ++ b ++ noise).toDF("vec_id", "embedding")
    val kept = VectorOps.embeddingOutlierFilter(spark, emb, nCells = 2, zMax = 3.0)
      .select("vec_id").as[Long].collect().toSet
    assert(!kept.contains(999L), "planted noise vector survived")
    // at most a stray boundary member may z-score out; the clusters stay
    assert(kept.size >= 58, s"over-eviction: kept ${kept.size} of 60 inliers")
  }

  test("cluster-balanced sample: caps, coverage, determinism, subset") {
    val emb = Tables.embeddings(spark, sf001)
    val got = VectorOps.clusterBalancedSample(spark, emb, nCells = 8, perCell = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // per-cell quota respected, ranks contiguous from 1
    got.groupBy(_._2).foreach { case (cell, rows) =>
      assert(rows.length <= 10, s"cell $cell over quota: ${rows.length}")
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length), s"cell $cell ranks")
    }
    // every cell that holds vectors is represented (coverage: the point
    // of balancing) — cells from a fresh assignment of the same corpus
    assert(got.map(_._2).distinct.length >= 2, "degenerate single-cell sample")
    // deterministic: a second run returns the identical set
    val again = VectorOps.clusterBalancedSample(spark, emb, nCells = 8, perCell = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // subset of the corpus
    val ids = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got.forall(r => ids(r._1)))
  }

  test("hybrid rerank: candidates ⊆ fused top-10, coverage-first ordering, deterministic") {
    val docs = Tables.documents(spark, sf0001)
    val emb = Tables.embeddings(spark, sf0001)
    val qTerms = Seq("spark", "merge", "vector")
    val fused = VectorOps.hybridSearchRrf(docs, emb, qTerms, probeId = 0L)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val reranked = VectorOps.hybridSearchRerank(docs, emb, qTerms, probeId = 0L)
      .collect()
    // the rerank tier only REORDERS retrieved candidates — it can never
    // introduce a doc the retrieval stage didn't surface
    assert(reranked.length == 5)
    assert(reranked.forall(r => fused(r.getAs[Long]("doc_id"))),
      s"reranked ids must come from the fused top-10")
    // ranks contiguous, ordered by the rerank score (doc_id tiebreak)
    assert(reranked.map(_.getAs[Int]("rank")).toSeq == (1 to 5))
    val scores = reranked.map(_.getAs[Double]("ce_score")).toSeq
    assert(scores == scores.sorted.reverse, s"rerank order broken: $scores")
    // deterministic
    val again = VectorOps.hybridSearchRerank(docs, emb, qTerms, probeId = 0L)
      .collect().map(_.toSeq).toSeq
    assert(reranked.map(_.toSeq).toSeq == again)

    // coverage-first: on a planted corpus, a doc matching ALL query
    // terms once each outranks a doc stuffing ONE term many times —
    // the signal a cross-encoder adds over tf-driven BM25
    import spark.implicits._
    val planted = Seq(
      (1L, "spark merge vector padding padding padding padding padding"),
      (2L, "spark spark spark spark spark spark spark spark"),
      (3L, "merge vector padding padding padding padding padding padding")
    ).toDF("doc_id", "text")
    val scored = planted
      .select($"doc_id", VectorOps.ceScore(qTerms).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(1L) > scored(2L),
      s"full coverage must beat single-term stuffing: $scored")
    assert(scored(1L) > scored(3L), s"3/3 terms must beat 2/3: $scored")
  }

  test("hybrid rerank keeps a TOKEN-LESS doc the semantic branch fused in (scored 0, never dropped)") {
    // the rerank tier re-scores the fused top-10 row-locally — a doc with
    // no tokens (pure-embedding hit: empty extraction, non-text asset)
    // scores coverage 0 + density 0 but must survive to the ranked list;
    // an implementation (or oracle) that reaches its tokens through an
    // INNER join would silently drop it. The shipped oracle LEFT JOINs
    // doc length and derives the coverage denominator from the query CTE
    // for exactly this row; this pins the Spark side to those semantics.
    import spark.implicits._
    val qTerms = Seq("spark", "merge", "vector")
    // 4 lexical docs + the token-less doc 99 = 5 candidates, so the
    // top-5 rerank MUST include doc 99 iff it was retained
    val docs = Seq(
      (0L, "probe doc excluded from ranking"),
      (1L, "spark merge vector pipeline"),
      (2L, "spark merge data"),
      (3L, "vector data stream"),
      (4L, "merge stream"),
      (99L, "")
    ).toDF("doc_id", "text")
    def v(x: Float, y: Float) = Array(x, y, 0f, 0f)
    val emb = Seq(
      (0L, v(1f, 0f)),      // probe
      (1L, v(0f, 1f)), (2L, v(0.1f, 1f)), (3L, v(-0.1f, 1f)), (4L, v(0f, -1f)),
      (99L, v(0.99f, 0.1f)) // near-identical to the probe: sem_rank 1
    ).toDF("vec_id", "embedding")
    val fusedIds = VectorOps.hybridSearchRrf(docs, emb, qTerms, probeId = 0L)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(fusedIds.contains(99L),
      s"setup: the token-less doc must reach the fused top-10 via the semantic branch: $fusedIds")
    val reranked = VectorOps.hybridSearchRerank(docs, emb, qTerms, probeId = 0L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("ce_score")).toMap
    assert(reranked.contains(99L),
      s"token-less candidate dropped by the rerank tier: $reranked")
    assert(reranked(99L) == 0.0,
      s"a token-less doc scores exactly 0 (coverage 0 + density 0): ${reranked(99L)}")
    assert(reranked.filterNot(_._1 == 99L).values.forall(_ > 0.0),
      "every lexical candidate outscores the token-less one")
  }
}
