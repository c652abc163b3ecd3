package graft

import java.nio.file.Files

import graft.functions.TextFunctions
import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** 10× pipeline-scale smoke (round-10 task): the text pipelines' guards
  * — the minhash hot-bucket cap, the MaxShingleFreq hot-shingle cap,
  * the bounded unigram vocab — had only ever run at sf0.1 (5 000 docs),
  * below every cap's trigger point. This suite synthesizes a ~10×
  * corpus (50 000 docs = the real sf0.1 table + a planted boilerplate
  * block large enough to trip the 10 000-doc caps + a unique-vocabulary
  * filler block) and runs the declared pipelines end-to-end against it,
  * asserting
  *
  *   1. the caps ENGAGE, with their `[graft]` warning lines actually
  *      emitted, and the capped runs stay tractable (the uncapped joins
  *      would be ~10⁸-pair blowups), and
  *   2. the survivor/pair sets restricted to the NON-pathological
  *      subset (the real sf0.1 docs) are identical to a run without the
  *      planted pathology — the caps must cost recall only where the
  *      pathology is.
  *
  * Corpus design: planted blocks use tokens interleaved so that every
  * 3-shingle contains a block-specific token — zero cross-block shingle
  * collisions by construction, which is what makes the clean-subset
  * equality exact rather than probabilistic.
  */
class TenXScaleSmokeSpec extends SparkSpec {
  import spark.implicits._

  private val sf01 = "/root/testdata/sf0.1"
  private val BoilerBase = 1000000L
  private val FillerBase = 2000000L
  private val NBoiler = 15000
  private val NFiller = 30000

  // en-profile stopwords, ordered so no other language profile matches
  private val stops = Seq("the", "and", "that", "it", "to", "is", "in", "of")

  /** 60-token template: stopword/template-word alternation — every
    * 3-shingle contains a tmpl token, so boilerplate shingles never
    * collide with the real corpus. Each doc appends one unique token:
    * md5-distinct (survives exact dedup) but sharing 58 of 59 shingles,
    * so ~93% of docs land in the template's band buckets — ~14 000 rows
    * per bucket, over the 10 000 cap.
    */
  private val template =
    (0 until 30).flatMap(k => Seq(stops(k % stops.size), s"tmplword$k"))
      .mkString(" ")

  private lazy val synthDir: String = {
    val dir = Files.createTempDirectory("graft_10x").toString
    val base = spark.read.parquet(s"$sf01/documents.parquet")
    val boiler = spark.range(NBoiler.toLong)
      .select((col("id") + BoilerBase).as("doc_id"),
        concat(lit(template + " uniq"), col("id")).as("text"))
    val filler = spark.range(NFiller.toLong)
      .select((col("id") + FillerBase).as("doc_id"),
        concat_ws(" ",
          (0 until 12).flatMap(k =>
            Seq(lit(stops(k % stops.size)),
              concat(lit(s"f"), col("id"), lit(s"x$k")))) :+ lit("the"): _*)
          .as("text"))
    val planted = boiler.unionByName(filler)
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("synth"))
      .withColumn("n_chars", length(col("text")))
    val full = base.unionByName(
      planted.select(base.columns.map(c =>
        col(c).cast(base.schema(c).dataType).as(c)): _*))
    full.repartition(8).write.parquet(s"$dir/documents.parquet")
    dir
  }

  /** Run `body` with stderr captured (dropHotBuckets reports its drops
    * there); returns (result, captured text).
    */
  private def capturingErr[T](body: => T): (T, String) = {
    val buf = new java.io.ByteArrayOutputStream()
    val old = System.err
    System.setErr(new java.io.PrintStream(buf, true))
    try { val r = body; (r, buf.toString) }
    finally System.setErr(old)
  }

  test("pipeline_pretraining_corpus_scale at 10x: hot-bucket cap engages, clean subset unchanged") {
    val (cappedFull, err) = capturingErr {
      SparkEntry.queries("pipeline_pretraining_corpus_scale")(spark, synthDir)
        .collect().map(r => (r.getLong(0), r.getInt(1)))
    }
    assert(err.contains("minhash hot-bucket cap"),
      s"the cap must engage AND report; stderr was: $err")
    // the real sf0.1 docs must ship exactly as they do without the
    // planted pathology in the corpus
    val baseline = SparkEntry.queries("pipeline_pretraining_corpus_scale")(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(cappedFull.filter(_._1 < BoilerBase).toSet == baseline.toSet,
      "caps must not change the non-pathological subset's survivors")
    // the documented recall cost lands exactly on the pathology: every
    // boilerplate doc's near-dup pairs collide only in dropped buckets,
    // so all of them survive un-deduplicated (the warning told us so)
    val boilerSurvivors = cappedFull.count(r =>
      r._1 >= BoilerBase && r._1 < FillerBase)
    assert(boilerSurvivors == NBoiler,
      s"expected the capped run to keep all $NBoiler boilerplate docs, got $boilerSurvivors")
    // filler docs are genuinely unique: all survive
    assert(cappedFull.count(_._1 >= FillerBase) == NFiller)
  }

  test("exact-jaccard join at 10x: MaxShingleFreq cap engages, clean pairs unchanged") {
    val docs = Tables.documents(spark, synthDir)
    val hashed = docs.select(col("doc_id"),
      TextFunctions.shingleHashes(col("text"), 3).as("hs"))
    val (pairsFull, err) = capturingErr {
      TextOps.ngramJaccardPairsFromHashes(hashed, 0.1)
        .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    assert(err.contains("exact-jaccard shingle hot-bucket cap"),
      s"the shingle cap must engage AND report; stderr was: $err")
    // without the cap the template shingles alone join 15000² rows —
    // with it, boilerplate contributes nothing and the real corpus's
    // pairs are exactly the base run's
    val baseHashed = Tables.documents(spark, sf01).select(col("doc_id"),
      TextFunctions.shingleHashes(col("text"), 3).as("hs"))
    val basePairs = TextOps.ngramJaccardPairsFromHashes(baseHashed, 0.1)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairsFull.filter(_._1 < BoilerBase).toSet == basePairs.toSet,
      "capped pairs on the clean subset must equal the clean-corpus run")
    assert(!pairsFull.exists(p => p._1 >= BoilerBase || p._2 >= BoilerBase),
      "planted blocks must contribute no surviving pairs (template " +
        "shingles dropped, residual shingles unique)")
  }

  test("text_span_dedup at 10x: boilerplate spans flagged ~wholly dup, filler clean") {
    val res = SparkEntry.queries("text_span_dedup")(spark, synthDir)
      .select("doc_id", "n_spans", "n_dup_spans")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val boiler = res.filter(r => r._1 >= BoilerBase && r._1 < FillerBase)
    assert(boiler.length == NBoiler)
    // 61 tokens → 54 8-spans; the unique token sits in the final span
    // only → 53 of 54 spans are corpus-duplicated
    assert(boiler.forall(r => r._2 == 54 && r._3 == 53),
      s"boilerplate span profile off: ${boiler.take(3).mkString(", ")}")
    val filler = res.filter(_._1 >= FillerBase)
    assert(filler.length == NFiller)
    assert(filler.forall(_._3 == 0L), "filler docs must have no dup spans")
  }

  test("unigram logprob at 10x: floored-vocab path completes with finite scores") {
    // ~375k singleton token types (every filler/boilerplate unique
    // token); the minCount=2 floor drops them all from the vocab
    // relation, which is what keeps the broadcast bounded at scale
    val res = SparkEntry.queries("text_unigram_logprob")(spark, synthDir)
      .select("doc_id", "nll").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(res.length == 50000, s"expected one score per doc, got ${res.length}")
    assert(res.forall { case (_, nll) =>
      !nll.isNaN && !nll.isInfinite && nll > 0 })
  }

  test("bigram logprob at 10x: floored bigram-type relation completes with finite scores") {
    // the bigram-type relation is strictly larger than the unigram vocab
    // (every unique filler token mints up to two singleton bigram types);
    // the minCount=2 floor drops the singleton tail from BOTH model
    // relations — the r12 hardening this smoke exercises at volume
    val res = SparkEntry.queries("text_bigram_logprob")(spark, synthDir)
      .select("doc_id", "nll").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // docs with >= 2 tokens score; the corpus generator emits none with
    // fewer, so every doc has a row
    assert(res.length == 50000, s"expected one score per doc, got ${res.length}")
    assert(res.forall { case (_, nll) =>
      !nll.isNaN && !nll.isInfinite && nll > 0 })
  }
}
