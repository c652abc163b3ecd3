package graft

import java.nio.file.{Files, Paths}

import graft.operators.{NearDedup, TextOps, VectorOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-round recall measurement for the approximate operator family,
  * against each operator's EXACT counterpart on the fixture tables —
  * committed as `RECALL_r{N}.json` so recall drift across rounds is
  * visible the way bench/correctness drift already is.
  *
  * Baselines: ann_lsh / ann_ivf / ann_pq vs the brute-force
  * `similarity_topk` top-5; near_dedup_minhash vs exact shingle Jaccard
  * at the same threshold; near_dedup_simhash vs brute-force all-pairs
  * Hamming over the same signatures; near_dedup_cosine_lsh vs the exact
  * all-pairs `near_dedup_cosine`. All the approximate paths verify exactly on
  * their candidate sets, so precision is 1.0 by construction (checked in
  * the specs) — recall is the one number that can drift.
  */
object Recall {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "RECALL.json"
    // shared recipe (graft.Sessions) so recall runs the benched plans
    val spark = Sessions.fromEnv("8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def pairSet(df: DataFrame): Set[(Long, Long)] =
      df.select(df.columns(0), df.columns(1)).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(got: Set[(Long, Long)], truth: Set[(Long, Long)]): Double =
      if (truth.isEmpty) 1.0 else (got & truth).size.toDouble / truth.size

    def topk(name: String): Set[(Long, Long)] =
      pairSet(SparkEntry.queries(name)(spark, sfDir).select("probe_id", "neighbor_id"))

    // ANN search: fixture index shapes vs the brute-force scan
    val brute = topk("similarity_topk")
    val annLsh = recall(topk("ann_lsh"), brute)
    val annIvf = recall(topk("ann_ivf"), brute)
    val annPq = recall(topk("ann_pq"), brute)
    val annIvfPq = recall(topk("ann_ivfpq"), brute)
    val annIndexed = recall(topk("ann_ivfpq_indexed"), brute)

    // metadata-filtered IVF vs the exact filtered brute force at the
    // same predicate (even labels, the declared query's shape)
    val bruteFiltered = {
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(spark, sfDir)
      val fProbes = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("p"), col("embedding").as("pe"))
      val fCorpus = emb.where(col("label") % 2 === 0)
        .select(col("vec_id").as("c"), col("embedding").as("ce"))
      pairSet(fCorpus.join(broadcast(fProbes), col("p") =!= col("c"))
        .withColumn("cos", VectorOps.cosine(col("pe"), col("ce")))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("p").orderBy(col("cos").desc, col("c"))))
        .where(col("rnk") <= 5).select("p", "c"))
    }
    val annIvfFiltered = recall(topk("ann_ivf_filtered"), bruteFiltered)

    // minhash text dedup vs exact shingle Jaccard at the declared 0.5
    val docs = Tables.documents(spark, sfDir)
    val hashed = docs.select(col("doc_id"),
      functions.TextFunctions.shingleHashes(col("text"), 3).as("hs"))
    val exactJac = pairSet(
      TextOps.ngramJaccardPairsFromHashes(hashed, 0.5).select("i", "j"))
    val minhash = recall(
      pairSet(SparkEntry.queries("near_dedup_minhash")(spark, sfDir).select("i", "j")),
      exactJac)

    // simhash vs brute-force all-pairs Hamming over the same signatures
    // (the pigeonhole band join is exact up to the hot-bucket cap — this
    // measures what the cap actually costs on the fixture corpus)
    val sigs = NearDedup.simhashSignatures(docs)
    val a = sigs.select(col("doc_id").as("i"), col("simhash").as("ha"))
    val b = sigs.select(col("doc_id").as("j"), col("simhash").as("hb"))
    val exactSim = pairSet(a.join(b, col("i") < col("j"))
      .where(bit_count(expr("ha ^ hb")) <= 3).select("i", "j"))
    val simhash = recall(
      pairSet(SparkEntry.queries("near_dedup_simhash")(spark, sfDir).select("i", "j")),
      exactSim)

    // embedding dedup: LSH candidates + exact verify vs exact all-pairs
    val exactCos = pairSet(
      SparkEntry.queries("near_dedup_cosine")(spark, sfDir).select("i", "j"))
    val cosLsh = recall(
      pairSet(SparkEntry.queries("near_dedup_cosine_lsh")(spark, sfDir).select("i", "j")),
      exactCos)
    // round 13: near_dedup_semantic now DECLARES the library default
    // (multi-assign); the single-assign knob is near_dedup_semantic_floor.
    // (The transitional near_dedup_semantic_multi alias row was dropped
    // in r14 as promised at the re-point.)
    val semantic = recall(
      pairSet(SparkEntry.queries("near_dedup_semantic")(spark, sfDir).select("i", "j")),
      exactCos)
    val semanticFloor = recall(
      pairSet(SparkEntry.queries("near_dedup_semantic_floor")(spark, sfDir).select("i", "j")),
      exactCos)

    // hybrid retrieval with BOTH branches index-served, vs the exact
    // fusion it approximates (single-probe top-10 overlap)
    val hybridAnn = {
      def topDocs(name: String): Set[Long] =
        SparkEntry.queries(name)(spark, sfDir)
          .select("doc_id").collect().map(_.getLong(0)).toSet
      val exact = topDocs("hybrid_search_rrf")
      val fused = topDocs("hybrid_search_ann_indexed")
      if (exact.isEmpty) 1.0 else (fused & exact).size.toDouble / exact.size
    }

    // the BATCH serving composition (r14): mean per-request top-10
    // overlap of the both-indexes batch form vs the exact batch fusion
    // it approximates (same shared full-corpus index on the lexical
    // side, so the delta is purely the vector branch's approximation)
    val hybridAnnBatch = {
      def byQid(name: String): Map[Int, Set[Long]] =
        SparkEntry.queries(name)(spark, sfDir)
          .select("qid", "doc_id").collect()
          .groupBy(_.getInt(0)).view
          .mapValues(_.map(_.getLong(1)).toSet).toMap
      val exact = byQid("hybrid_search_batch")
      val fused = byQid("hybrid_search_ann_batch")
      val per = exact.map { case (qid, ex) =>
        if (ex.isEmpty) 1.0
        else (fused.getOrElse(qid, Set.empty) & ex).size.toDouble / ex.size
      }
      if (per.isEmpty) 1.0 else per.sum / per.size
    }

    // Recall/cost CURVES for the two ANN knobs, at the pinned fixture
    // shapes: the headline numbers above are OPERATING POINTS on these
    // curves, not ceilings — the curve is what shows the knob works
    // (monotone, reaching ~1.0) and what a recall target costs.
    val lshCurve = Seq(0, 2, 5, 8, 12).map { f =>
      val r = recall(pairSet(VectorOps.annLsh(spark, Tables.embeddings(spark, sfDir),
        probeFilter = col("vec_id") < 10, k = 5, nPlanes = 6, nFlips = f)
        .select("probe_id", "neighbor_id")), brute)
      f -> r
    }
    val ivfCurve = Seq(1, 2, 4, 8).map { p =>
      val r = recall(pairSet(VectorOps.annIvf(spark, Tables.embeddings(spark, sfDir),
        probeFilter = col("vec_id") < 10, k = 5, nCells = 16, nProbe = p)
        .select("probe_id", "neighbor_id")), brute)
      p -> r
    }
    val pqCurve = Seq(2, 4, 8, 12, 16).map { rr =>
      val r = recall(pairSet(VectorOps.annPq(spark, Tables.embeddings(spark, sfDir),
        probeFilter = col("vec_id") < 10, k = 5, m = 8, ks = 16, rerank = rr)
        .select("probe_id", "neighbor_id")), brute)
      rr -> r
    }
    // the pinned ann_ivfpq shape (16 cells, 16×16 residual PQ) swept on
    // its two knobs: nProbe (row pruning) and rerank (the ADC-misrank
    // escape hatch — candidates surviving to the exact rerank)
    val ivfPqCurve = Seq(2, 4, 8, 12).map { np =>
      val r = recall(pairSet(VectorOps.annIvfPq(spark, Tables.embeddings(spark, sfDir),
        probeFilter = col("vec_id") < 10, k = 5, nCells = 16, nProbe = np,
        m = 16, ks = 16, rerank = 8).select("probe_id", "neighbor_id")), brute)
      np -> r
    }
    // margin-adaptive probing operating curve (round-12 task: the knob
    // shipped dark in r11 — published here so a recommended margin has a
    // measured recall/cost point behind it). At the pinned shape
    // (16 cells, nProbe=8 cap) each point pairs the recall annIvf
    // measures with the (probe, cell) pairs the SAME quantizer scans —
    // the cost axis margin pruning moves; nProbe curves can't show it.
    val marginCurve = Seq(0.0, 0.02, 0.05, 0.1, 0.2).map { m =>
      val r = recall(pairSet(VectorOps.annIvf(spark, Tables.embeddings(spark, sfDir),
        probeFilter = col("vec_id") < 10, k = 5, nCells = 16, nProbe = 8,
        probeMargin = m).select("probe_id", "neighbor_id")), brute)
      val cellsScanned = VectorOps.ivfProbedCells(spark,
        Tables.embeddings(spark, sfDir), probeFilter = col("vec_id") < 10,
        nCells = 16, nProbe = 8, probeMargin = m)
      (m, r, cellsScanned)
    }

    val ivfPqRerankCurve = Seq(2, 4, 8, 16).map { rr =>
      val r = recall(pairSet(VectorOps.annIvfPq(spark, Tables.embeddings(spark, sfDir),
        probeFilter = col("vec_id") < 10, k = 5, nCells = 16, nProbe = 8,
        m = 16, ks = 16, rerank = rr).select("probe_id", "neighbor_id")), brute)
      rr -> r
    }
    def curveJson(c: Seq[(Int, Double)]): String =
      c.map { case (x, r) => f""""$x": $r%.4f""" }.mkString("{", ", ", "}")
    val marginJson = marginCurve.map { case (m, r, cells) =>
      f""""$m%.2f": {"recall": $r%.4f, "probe_cells": $cells}""" }
      .mkString("{", ", ", "}")

    val json =
      f"""{"sf": "$sfDir",
         | "curves": {
         |  "ann_lsh_by_nflips_8x6":  ${curveJson(lshCurve)},
         |  "ann_ivf_by_nprobe_16c":  ${curveJson(ivfCurve)},
         |  "ann_pq_by_rerank_8x16":  ${curveJson(pqCurve)},
         |  "ann_ivfpq_by_nprobe_16c_16x16r8": ${curveJson(ivfPqCurve)},
         |  "ann_ivfpq_by_rerank_16c_16x16p8": ${curveJson(ivfPqRerankCurve)},
         |  "ann_ivf_by_probe_margin_16c_p8": $marginJson
         | },
         | "ops": {
         |  "ann_lsh":              {"recall": $annLsh%.4f, "baseline": "similarity_topk", "truth_size": ${brute.size}},
         |  "ann_ivf":              {"recall": $annIvf%.4f, "baseline": "similarity_topk", "truth_size": ${brute.size}},
         |  "ann_pq":               {"recall": $annPq%.4f, "baseline": "similarity_topk", "truth_size": ${brute.size}},
         |  "ann_ivfpq":            {"recall": $annIvfPq%.4f, "baseline": "similarity_topk", "truth_size": ${brute.size}},
         |  "ann_ivfpq_indexed":    {"recall": $annIndexed%.4f, "baseline": "similarity_topk", "truth_size": ${brute.size}},
         |  "ann_ivf_filtered":     {"recall": $annIvfFiltered%.4f, "baseline": "exact filtered brute force (label %% 2 = 0)", "truth_size": ${bruteFiltered.size}},
         |  "near_dedup_minhash":   {"recall": $minhash%.4f, "baseline": "exact ngram jaccard @0.5", "truth_size": ${exactJac.size}},
         |  "near_dedup_simhash":   {"recall": $simhash%.4f, "baseline": "all-pairs hamming <=3", "truth_size": ${exactSim.size}},
         |  "near_dedup_cosine_lsh":{"recall": $cosLsh%.4f, "baseline": "near_dedup_cosine @0.4", "truth_size": ${exactCos.size}},
         |  "near_dedup_semantic":  {"recall": $semantic%.4f, "baseline": "near_dedup_cosine @0.4", "truth_size": ${exactCos.size}},
         |  "near_dedup_semantic_floor": {"recall": $semanticFloor%.4f, "baseline": "near_dedup_cosine @0.4 (single-assign cost-floor knob, primary ID until r12)", "truth_size": ${exactCos.size}},
         |  "hybrid_search_ann_indexed": {"recall": $hybridAnn%.4f, "baseline": "hybrid_search_rrf exact fusion top-10", "truth_size": 10},
         |  "hybrid_search_ann_batch": {"recall": $hybridAnnBatch%.4f, "baseline": "hybrid_search_batch exact batch fusion, mean per-request top-10 overlap (NEW r14)", "truth_size": 30}
         | }}""".stripMargin
    Files.writeString(Paths.get(out), json + "\n")
    println(s"[recall] wrote $out")
    println(json)
    spark.stop()
  }
}
