package graft

import graft.operators.CorpusOps
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("contamination: planted eval text inside a train doc flags at containment 1.0") {
    val evalText = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (0L, evalText), // eval doc
      (1L, s"unrelated filler words before $evalText and trailing content here"), // contains it
      (2L, "completely different training material about query engines entirely")
    ).toDF("doc_id", "text")
    val pairs = CorpusOps.contaminationPairs(docs, col("doc_id") === 0, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq == Seq((0L, 1L, 1.0)),
      s"every eval shingle appears in doc 1: $pairs")
  }

  test("contamination is containment (eval-relative), not jaccard") {
    // train doc much larger than eval: jaccard would be tiny, containment 1.0
    val evalText = "one two three four five six"
    val big = ("pad" * 2 + " ") + (1 to 60).map(i => s"w$i").mkString(" ") + s" $evalText"
    val docs = Seq((0L, evalText), (1L, big)).toDF("doc_id", "text")
    val got = CorpusOps.contaminationPairs(docs, col("doc_id") === 0, 0.9)
      .select("containment").as[Double].collect()
    assert(got.toSeq == Seq(1.0))
  }

  test("decontaminate drops contaminated train docs, keeps clean ones, excludes eval rows") {
    val evalText = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (0L, evalText),                                                   // eval doc
      (1L, s"unrelated filler words before $evalText and trailing bits"), // contaminated
      (2L, "completely different training material about query engines"), // clean
      (3L, "another clean doc with its own disjoint vocabulary set")      // clean
    ).toDF("doc_id", "text")
    val kept = CorpusOps.decontaminate(docs, col("doc_id") === 0, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L),
      s"eval row 0 excluded, contaminated 1 dropped, clean 2/3 kept — got $kept")
    // threshold above the overlap keeps the contaminated doc too
    val lax = CorpusOps.decontaminate(docs, col("doc_id") === 0, threshold = 1.1)
      .select("doc_id").as[Long].collect().toSet
    assert(lax == Set(1L, 2L, 3L))
  }

  test("importance sampling ranks target-like pool docs above target-unlike ones") {
    // target vocabulary {apple..fig} vs disjoint pool vocabulary
    // {rock..flint}; every word appears >= minCount times so no floor
    // interferes with the planted signal
    val tgtWords = "apple banana cherry date elderberry fig"
    val offWords = "rock stone pebble gravel boulder flint"
    val docs = Seq(
      (0L, s"$tgtWords $tgtWords", "tgt"),
      (1L, s"$tgtWords $tgtWords", "tgt"),
      (2L, s"$tgtWords $tgtWords", "pool"),   // target-like pool doc
      (3L, s"$offWords $offWords", "pool"),   // target-unlike
      (4L, s"$offWords $offWords", "pool")
    ).toDF("doc_id", "text", "source")
    val got = CorpusOps.importanceSample(docs, col("source") === "tgt", k = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(2) > got(3),
      s"the target-vocabulary pool doc must outscore the disjoint one: $got")
    assert(got(2) == got(0) && got(0) == got(1),
      s"identical text scores identically whatever its source: $got")
    assert(got(3) == got(4), s"identical off-target docs tie: $got")
  }

  test("importance sampling floors rare counts: a target singleton scores like a target-absent word") {
    // "spark" occurs ONCE in the target (floored to 0 at minCount=2);
    // "flume" never does. Both have RAW count 3 (doc 12 balances), so
    // docs 10/11 — identical but for that word — must score EQUAL: the
    // floor makes the target singleton indistinguishable from absent.
    val docs = Seq(
      (0L, "common common spark words words", "tgt"),
      (1L, "common common words words filler filler", "tgt"),
      (10L, "common words spark spark", "pool"),
      (11L, "common words flume flume", "pool"),
      (12L, "flume filler filler", "pool")
    ).toDF("doc_id", "text", "source")
    val got = CorpusOps.importanceSample(docs, col("source") === "tgt", k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(10) == got(11),
      s"floored target singleton must be indistinguishable from absent: $got")
    // k caps the output
    val capped = CorpusOps.importanceSample(docs, col("source") === "tgt", k = 2).count()
    assert(capped == 2L)
  }

  test("temperature mixing: alpha=1 is the natural mix, alpha=0 the uniform one, 0.7 up-samples the tail") {
    val tot = Seq(("big", 9000L), ("small", 1000L)).toDF("source", "n_tokens")
    def m(alpha: Double) = CorpusOps.mixTemperature(tot, alpha)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val nat = m(1.0)
    assert(nat("big")._2 == 0.9 && nat("small")._2 == 0.1, s"alpha=1 must reproduce p: $nat")
    assert(nat.values.forall(_._3 == 1.0), "alpha=1 weights are all 1")
    val uni = m(0.0)
    assert(uni("big")._2 == 0.5 && uni("small")._2 == 0.5, s"alpha=0 is uniform: $uni")
    val t = m(0.7)
    assert(t("small")._3 > 1.0 && t("big")._3 < 1.0,
      s"alpha=0.7 must up-sample the tail source and down-sample the head: $t")
    // q still sums to 1 on the rounding grid
    assert(math.abs(t.values.map(_._2).sum - 1.0) < 1e-4)
  }

  test("shard_pack matches the sequential prefix sum and respects the budget") {
    val docs = (0L until 100L).map(i => (i, (i % 13) + 1)).toDF("doc_id", "n_tokens")
    val got = CorpusOps.shardPack(docs, budget = 20, parts = 7)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // sequential reference
    var cum = 0L
    val want = (0L until 100L).map { i =>
      val n = (i % 13) + 1
      val shard = cum / 20
      cum += n
      (i, n, shard)
    }
    assert(got.toSeq == want)
    // shards are contiguous non-decreasing runs in doc order
    assert(got.map(_._3).sliding(2).forall(p => p(0) <= p(1)))
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("stratumPrefix matches the sequential per-stratum prefix sum at any width") {
    val rows = (0L until 120L).map(i => (i, s"l${i % 3}", (i % 7) + 1))
    val docs = rows.toDF("doc_id", "lang", "v")
    // sequential reference: per stratum, order by (md5(id), id), rank + cumsum
    val want = rows.groupBy(_._2).toSeq.flatMap { case (_, rs) =>
      val ordered = rs.sortBy(t => (md5hex(t._1.toString), t._1))
      var cum = 0L
      ordered.zipWithIndex.map { case ((id, l, v), ix) =>
        cum += v; (id, l, v, ix + 1L, cum)
      }
    }.sortBy(t => (t._2, t._4))
    def run(p: Int) = CorpusOps.stratumPrefix(docs, parts = p)
      .orderBy("lang", "rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(run(1) == want)
    assert(run(5) == want)
    assert(run(32) == want)
  }

  test("distributed sampling queries match the single-window reference form") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf0001)
    // the naive whole-stratum-in-one-task forms the distributed versions replace
    val rankW = Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val strat = docs.select(col("doc_id"), col("lang"))
      .withColumn("rn", row_number().over(rankW))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
      .where(col("rn") <= functions.TimeFunctions.fdiv(col("n") + 9, 10L))
      .select("doc_id", "lang").orderBy("doc_id")
    assert(SparkEntry.queries("sample_stratified")(spark, sf0001).collect().toSeq ==
      strat.collect().toSeq)
    val cumW = rankW.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budget = docs.select(col("doc_id"), col("lang"),
        size(functions.TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(cumW))
      .where(col("cum") <= CorpusOps.MixBudget)
      .orderBy("doc_id")
    assert(SparkEntry.queries("sample_token_budget")(spark, sf0001).collect().toSeq ==
      budget.collect().toSeq)
  }

  test("pack_sequences matches the sequential concat-and-chunk reference") {
    val L = CorpusOps.SeqLen
    val docs = (0L until 80L).map(i => (i, (i % 200) * 7 + 1)).toDF("doc_id", "n_tokens")
    def run(p: Int) = CorpusOps.globalTokenOffsets(docs, parts = p)
      .select(col("doc_id"), col("n_tokens"),
        functions.TimeFunctions.fdiv(col("start"), L).as("f"),
        functions.TimeFunctions.fdiv(col("start") + col("n_tokens") - 1, L).as("l"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    var cum = 0L
    val want = (0L until 80L).map { i =>
      val n = (i % 200) * 7 + 1
      val f = cum / L
      val l = (cum + n - 1) / L
      cum += n
      (i, n, f, l)
    }
    assert(run(6) == want)
    // width-independence: the packing is a pure function of the corpus
    assert(run(1) == run(6) && run(6) == run(32))
    // stream coverage: doc i+1 starts in the sequence doc i ends in (or
    // the next one) — no token gap and no overlap between documents
    want.sliding(2).foreach { case Seq((_, _, _, l0), (_, _, f1, _)) =>
      assert(f1 == l0 || f1 == l0 + 1)
    }
  }

  test("shard_pack is independent of the range-partition width") {
    val docs = (0L until 57L).map(i => (i * 3 % 57, (i % 7) + 2)).toDF("doc_id", "n_tokens")
    def run(p: Int) = CorpusOps.shardPack(docs, budget = 15, parts = p)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(run(1) == run(5) && run(5) == run(32))
  }

  test("ppl split is exact window-ntile semantics, parts-independent, null-lang safe") {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.TextOps
    // skewed langs, duplicate texts (tied nll -> doc_id tie-break), a
    // null-lang stratum, and sizes not divisible by 3 so the first
    // n mod k buckets really do carry the extra row
    val words = Seq("the", "quick", "fox", "jumps", "over", "lazy", "dog", "zyx")
    val docs = (0L until 23L).map { i =>
      val lang = if (i < 14) "en" else if (i < 21) "fr" else null
      val text = (0 to (i % 5).toInt).map(j => words(((i + j) % 8).toInt)).mkString(" ")
      (i, if (i == 7) docText6 else text, lang) // 7 duplicates 6's text: exact tie
    }.toDF("doc_id", "text", "lang")
    def run(p: Int) = CorpusOps.pplSplit(docs, k = 3, parts = p)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    val scored = TextOps.unigramLogprob(docs)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val w = Window.partitionBy("lang").orderBy(col("nll"), col("doc_id"))
    val want = scored.select(col("doc_id"), ntile(3).over(w).cast("long").as("bucket"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(run(4) == want, "closed-form bucket must equal window ntile")
    assert(run(1) == run(4) && run(4) == run(32),
      "the split is a pure function of the corpus, not the exchange width")
    // every lang's buckets differ by at most one row (the ntile balance)
    val sizes = CorpusOps.pplSplit(docs, k = 3).groupBy("lang", "bucket").count()
      .collect().groupBy(r => Option(r.getString(0))).values
    sizes.foreach { g =>
      val ns = g.map(_.getLong(2))
      assert(ns.max - ns.min <= 1, s"unbalanced buckets: ${g.toSeq}")
    }
  }

  private val docText6 = "dog zyx" // doc 6's generated text (i=6: words 6,7)

  test("source cap keeps the k best-LM-scored docs per source, ties on doc_id") {
    import graft.operators.TextOps
    // "the the the" scores best (most common token); rarer vocab worse.
    // src a has 4 docs (cap 2 engages), src b has 2 (cap is a no-op).
    val docs = Seq(
      (0L, "the the the", "a"), (1L, "the quick fox", "a"),
      (2L, "zyx qwerty unique", "a"), (3L, "the the the", "a"),
      (4L, "the quick fox", "b"), (5L, "plugh xyzzy", "b")
    ).toDF("doc_id", "text", "lang").withColumnRenamed("lang", "source")
    val kept = CorpusOps.sourceCap(docs, cap = 2)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    // src a: docs 0 and 3 tie on the best score -> both kept (ranks 1,2);
    // src b keeps both of its docs
    assert(kept == Seq((0L, 1L), (3L, 2L), (4L, 1L), (5L, 2L)), s"got $kept")
    // equivalence with the window row_number form
    import org.apache.spark.sql.expressions.Window
    val scored = TextOps.unigramLogprob(docs)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
    val w = Window.partitionBy("source").orderBy(col("nll"), col("doc_id"))
    val want = scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 2).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(kept == want)
  }
}
