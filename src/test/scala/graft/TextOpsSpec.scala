package graft

import graft.operators.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("piiScrub redacts planted emails and phone numbers with exact counts") {
    val docs = Seq(
      (0L, "contact alice.smith+tag@example.co.uk or bob@test.org today"),
      (1L, "call 555-123-4567 or 555 987 6543 after hours"),
      (2L, "mixed: carol@ex.io at 555.222.3333 thanks"),
      (3L, "no pii in this document at all"),
      (4L, "not-a-phone 12-345-6789 and not-an-email foo@bar (no tld)")
    ).toDF("doc_id", "text")
    val got = TextOps.piiScrub(docs).orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got(0) == ((0L, "contact <EMAIL> or <EMAIL> today", 2L, 0L)))
    assert(got(1) == ((1L, "call <PHONE> or <PHONE> after hours", 0L, 2L)))
    assert(got(2) == ((2L, "mixed: <EMAIL> at <PHONE> thanks", 1L, 1L)))
    assert(got(3) == ((3L, "no pii in this document at all", 0L, 0L)))
    // 12-345-6789 has a 2-digit prefix; foo@bar lacks a dotted TLD
    assert(got(4) == ((4L, "not-a-phone 12-345-6789 and not-an-email foo@bar (no tld)", 0L, 0L)))
  }

  test("incrementalDedup drops exact and near dups of the existing corpus, keeps fresh docs") {
    import org.apache.spark.sql.functions.col
    val existing = "the quick brown fox jumps over the lazy dog near the river bank today"
    val docs = Seq(
      (0L, existing),                                                   // existing corpus
      (1L, "completely unrelated material about distributed query engines and shuffles"),
      (10L, existing),                                                  // new: exact dup of 0
      (11L, existing + " extra trailing words"),                        // new: near dup of 0
      (12L, "fresh new content with entirely different vocabulary throughout the body")
    ).toDF("doc_id", "text")
    val got = TextOps.incrementalDedup(docs, col("doc_id") >= 10, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(12L), s"only the fresh doc survives: $got")
  }

  test("incrementalDedup never drops a new doc for matching another NEW doc") {
    import org.apache.spark.sql.functions.col
    val t = "some repeated crawl text that appears twice in the same new batch here"
    val docs = Seq(
      (0L, "existing corpus content that matches nothing in the incoming batch at all"),
      (10L, t), (11L, t) // dups of each other, but not of the existing side
    ).toDF("doc_id", "text")
    val got = TextOps.incrementalDedup(docs, col("doc_id") >= 10, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    // intra-batch dedup is near_dedup_apply's job, applied before ingest
    assert(got == Set(10L, 11L), s"both new docs survive the cross-corpus check: $got")
  }

  test("incrementalDedupBloom returns exactly incrementalDedup's survivor set") {
    import org.apache.spark.sql.functions.col
    val existing = "the quick brown fox jumps over the lazy dog near the river bank today"
    val docs = Seq(
      (0L, existing),
      (1L, "completely unrelated material about distributed query engines and shuffles"),
      (10L, existing),                           // new: exact dup of 0
      (11L, existing + " extra trailing words"), // new: near dup of 0
      (12L, "fresh new content with entirely different vocabulary throughout the body"),
      (13L, "another novel document sharing no shingles with anything already ingested")
    ).toDF("doc_id", "text")
    val exact = TextOps.incrementalDedup(docs, col("doc_id") >= 10, threshold = 0.5)
      .as[(Long, Int)].collect().toSet
    val bloomed = TextOps.incrementalDedupBloom(docs, col("doc_id") >= 10, threshold = 0.5)
      .as[(Long, Int)].collect().toSet
    assert(bloomed == exact, s"bloom prefilter must not change the result: $bloomed vs $exact")
    assert(bloomed.map(_._1) == Set(12L, 13L))
  }

  test("incrementalDedupBloom with an empty existing corpus keeps every new doc") {
    import org.apache.spark.sql.functions.col
    // empty build side → null bloom → might_contain is null-filtered, and
    // both drop stages are empty: all new docs must survive
    val docs = Seq(
      (10L, "first document of a brand new corpus with nothing before it"),
      (11L, "second document equally novel relative to the empty master store")
    ).toDF("doc_id", "text")
    val got = TextOps.incrementalDedupBloom(docs, col("doc_id") >= 10, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(10L, 11L), s"empty existing corpus drops nothing: $got")
  }

  test("piiScrub is idempotent: scrubbing scrubbed text changes nothing") {
    val docs = Seq((0L, "reach me: a@b.com / 555-123-4567")).toDF("doc_id", "text")
    val once = TextOps.piiScrub(docs).select("doc_id", "clean")
      .withColumnRenamed("clean", "text")
    val twice = TextOps.piiScrub(once).as[(Long, String, Long, Long)].head()
    assert(twice == ((0L, "reach me: <EMAIL> / <PHONE>", 0L, 0L)))
  }

  // counts: a=3 b=2 c=1, total=6 (the OOV-inclusive normalizer)
  private def unigramDocs = Seq((0L, "a a b"), (1L, "a b c")).toDF("doc_id", "text")

  test("unigramLogprob: default floor matches the unbounded model exactly") {
    // minCount=2 floors singletons out of the vocab, and they back off to
    // count minCount-1 = 1 — their true count — so scores are identical
    // to the unbounded model (this is what keeps the DuckDB oracle green)
    val got = TextOps.unigramLogprob(unigramDocs).orderBy("doc_id")
      .as[(Long, Double)].collect().toSeq
    def nll(cs: Double*) = -cs.map(c => math.log(c / 6.0)).sum / cs.size
    assert(math.abs(got(0)._2 - nll(3, 3, 2)) < 5e-5)
    assert(math.abs(got(1)._2 - nll(3, 2, 1)) < 5e-5)
  }

  test("unigramLogprob: minCount floor bounds the vocab and backs off OOV") {
    spark.conf.set("graft.unigram.minCount", "3")
    try {
      // vocab is now {a} only; b (count 2) and c (count 1) are OOV and
      // score with backoff count minCount-1 = 2; normalizer stays 6
      val got = TextOps.unigramLogprob(unigramDocs).orderBy("doc_id")
        .as[(Long, Double)].collect().toSeq
      def nll(cs: Double*) = -cs.map(c => math.log(c / 6.0)).sum / cs.size
      assert(math.abs(got(0)._2 - nll(3, 3, 2)) < 5e-5)
      assert(math.abs(got(1)._2 - nll(3, 2, 2)) < 5e-5)
    } finally spark.conf.unset("graft.unigram.minCount")
  }

  test("unigramLogprob: an empty or all-blank corpus yields an empty result, not an NPE") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextOps.unigramLogprob(empty).count() == 0)
  }

  test("unigramLogprob: above the maxVocab guard the score join is a shuffle join, same result") {
    val onBroadcastPath = TextOps.unigramLogprob(unigramDocs)
      .orderBy("doc_id").as[(Long, Double)].collect().toSeq
    spark.conf.set("graft.unigram.maxVocab", "1")
    // suppress Catalyst's own small-table auto-broadcast (fixture-sized
    // stats would hide the guard): the claim is that above the guard we
    // no longer FORCE a broadcast of an arbitrarily large vocab
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = TextOps.unigramLogprob(unigramDocs)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"vocab above the guard must not broadcast:\n$plan")
      val got = df.orderBy("doc_id").as[(Long, Double)].collect().toSeq
      assert(got == onBroadcastPath, "join strategy must not change scores")
    } finally {
      spark.conf.unset("graft.unigram.maxVocab")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("spanDedup flags exactly the spans shared across documents") {
    // docs 0 and 1 share one verbatim 4-token run ("alpha beta gamma
    // delta" at different offsets); doc 2 is disjoint; doc 3 is too
    // short to have any 4-token span and must emit no row.
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "prefix words here alpha beta gamma delta"),
      (2L, "one two three four five six"),
      (3L, "too short")
    ).toDF("doc_id", "text")
    val got = TextOps.spanDedup(docs, 4).orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // doc 0: spans at offsets 1..3 -> 3 spans, 1 duplicated
    // doc 1: spans at offsets 1..4 -> 4 spans, 1 duplicated
    assert(got == Seq(
      (0L, 3L, 1L, 0.3333),
      (1L, 4L, 1L, 0.25),
      (2L, 3L, 0L, 0.0)))
  }

  test("spanDedup counts a span ONCE per doc even when it repeats within the doc") {
    // "x y x y x y" repeats the span "x y x y" internally but no other
    // doc shares it: distinct-per-doc signatures mean it is NOT
    // corpus-duplicated (within-doc repetition is text_repetition's job).
    val docs = Seq(
      (0L, "x y x y x y"),
      (1L, "totally different words entirely here now")
    ).toDF("doc_id", "text")
    val got = TextOps.spanDedup(docs, 4).orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // doc 0 has 3 span positions but only 2 DISTINCT spans
    // ("x y x y", "y x y x"); none shared with doc 1.
    assert(got == Seq(
      (0L, 2L, 0L, 0.0),
      (1L, 3L, 0L, 0.0)))
  }

  test("spanScrub deletes every non-first occurrence of a duplicated span, rebuilds text") {
    // docs 0 and 1 share the 4-token span "alpha beta gamma delta";
    // doc 0 holds the global first occurrence (min (doc_id, pos)) and
    // keeps it verbatim, doc 1 loses exactly those four tokens. doc 2
    // is disjoint and byte-identical after the scrub; doc 3 is shorter
    // than a span and untouched.
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "prefix words here alpha beta gamma delta"),
      (2L, "one two three four five six"),
      (3L, "too short")
    ).toDF("doc_id", "text")
    val got = TextOps.spanScrub(docs, 4).orderBy("doc_id")
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (0L, 6L, "alpha beta gamma delta epsilon zeta"),
      (1L, 3L, "prefix words here"),
      (2L, 6L, "one two three four five six"),
      (3L, 2L, "too short")))
  }

  test("spanScrub within-doc repetition: later occurrences of the doc's own span are removed") {
    // one doc repeats its own 4-token span back-to-back: occurrence at
    // pos 1 is the keeper; the occurrence at pos 5 is deleted. The
    // middle spans (pos 2-4) wrap around the repetition and exist once
    // each — not duplicated, but their tokens 5-8 are covered by the
    // deleted occurrence, so exactly tokens 5-8 drop.
    val docs = Seq(
      (0L, "a b c d a b c d"),
      (1L, "unrelated filler text goes right here")
    ).toDF("doc_id", "text")
    val got = TextOps.spanScrub(docs, 4).orderBy("doc_id")
      .as[(Long, Long, String)].collect().toSeq
    assert(got.head == (0L, 4L, "a b c d"), s"got ${got.head}")
    assert(got(1) == (1L, 6L, "unrelated filler text goes right here"))
  }

  test("bigramLogprob is context-aware: natural order beats shuffled order at equal unigram NLL") {
    // corpus dominated by "a b" bigrams; doc 10 repeats the common
    // bigram, doc 11 uses the same TOKEN BAG in inverted order — the
    // unigram model ties them, the bigram model must not
    val docs = ((0L until 10L).map(i => (i, "a b c" + i)) ++ Seq(
      (10L, "a b a b a b"),
      (11L, "b a b a b a"))).toDF("doc_id", "text")
    val uni = TextOps.unigramLogprob(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(uni(10L) == uni(11L), s"unigram NLL must tie the token bags: $uni")
    val bi = TextOps.bigramLogprob(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bi(10L) < bi(11L),
      s"the corpus-frequent bigram order must score better: $bi")
    // one-token docs have no bigram position and no row
    assert(TextOps.bigramLogprob(Seq((0L, "solo")).toDF("doc_id", "text")).count() == 0)
  }

  // c1: a=3 b=3 c=1 (total 7); c2: ab=3 ba=1 bc=1 — singleton types in
  // BOTH model relations, so the floors have something to drop
  private def bigramDocs = Seq((0L, "a b a b c"), (1L, "a b")).toDF("doc_id", "text")

  test("bigramLogprob: default floor matches the unbounded model exactly") {
    // minCount=2 floors singleton bigram/token types, and they back off
    // to count minCount-1 = 1 — their true count — so scores are
    // identical to the unbounded model (what keeps the oracle green
    // while the model relations stay bounded at scale)
    val floored = TextOps.bigramLogprob(bigramDocs).orderBy("doc_id")
      .as[(Long, Double)].collect().toSeq
    spark.conf.set("graft.bigram.minCount", "1")
    try {
      val unbounded = TextOps.bigramLogprob(bigramDocs).orderBy("doc_id")
        .as[(Long, Double)].collect().toSeq
      assert(floored == unbounded,
        s"default floor must score exactly like the unbounded model: $floored vs $unbounded")
    } finally spark.conf.unset("graft.bigram.minCount")
  }

  test("bigramLogprob: minCount floor bounds both model relations and backs off OOV") {
    spark.conf.set("graft.bigram.minCount", "3")
    try {
      // bigram relation is now {ab: 3}; ba/bc are OOV at backoff count
      // 2; unigram side keeps {a: 3, b: 3}, c is OOV at backoff 2; the
      // normalizer stays 7 (all occurrences)
      val got = TextOps.bigramLogprob(bigramDocs).orderBy("doc_id")
        .as[(Long, Double)].collect().toSeq
      def p(c2: Double, ca: Double, cb: Double) = 0.75 * c2 / ca + 0.25 * cb / 7.0
      def nll(ps: Double*) = -ps.map(math.log).sum / ps.size
      // doc0 bigrams: ab, ba(oov), ab, bc(oov; cb=c also oov)
      val want0 = nll(p(3, 3, 3), p(2, 3, 3), p(3, 3, 3), p(2, 3, 2))
      val want1 = nll(p(3, 3, 3))
      assert(math.abs(got(0)._2 - want0) < 5e-5, s"doc0: ${got(0)._2} vs $want0")
      assert(math.abs(got(1)._2 - want1) < 5e-5, s"doc1: ${got(1)._2} vs $want1")
    } finally spark.conf.unset("graft.bigram.minCount")
  }

  test("bigramLogprob: an empty or all-blank corpus yields an empty result, not an NPE") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextOps.bigramLogprob(empty).count() == 0)
  }

  test("trigramLogprob is context-aware one order past the bigram: equal-bigram-multiset docs separate") {
    // docs 10 and 11 have the SAME unigram bag and the SAME bigram
    // multiset ({xy:2, yy:1, yx:1}) — bigram NLL provably ties them —
    // but different trigram multisets (10: xyy,yyx,yxy; 11: xyx,yxy,
    // xyy); the background corpus repeats doc 10's pattern, so its
    // trigram order is corpus-frequent and must score better
    val docs = ((0L until 10L).map(i => (i, "x y y x y")) ++ Seq(
      (10L, "x y y x y"),
      (11L, "x y x y y"))).toDF("doc_id", "text")
    val bi = TextOps.bigramLogprob(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bi(10L) == bi(11L),
      s"bigram NLL must tie the equal bigram multisets: $bi")
    val tri = TextOps.trigramLogprob(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(tri(10L) < tri(11L),
      s"the corpus-frequent trigram order must score better: $tri")
    // docs shorter than 3 tokens have no trigram position and no row
    assert(TextOps.trigramLogprob(
      Seq((0L, "just two"), (1L, "solo")).toDF("doc_id", "text")).count() == 0)
  }

  test("trigramLogprob: default floor matches the unbounded model exactly") {
    // the bigram invariant one order up: minCount=2 drops singleton
    // types whose OOV backoff count (1) IS their true count, so the
    // bounded model scores exactly like the unbounded one — what keeps
    // the DuckDB oracle (which computes the unbounded model) green
    val floored = TextOps.trigramLogprob(bigramDocs).orderBy("doc_id")
      .as[(Long, Double)].collect().toSeq
    spark.conf.set("graft.trigram.minCount", "1")
    try {
      val unbounded = TextOps.trigramLogprob(bigramDocs).orderBy("doc_id")
        .as[(Long, Double)].collect().toSeq
      assert(floored == unbounded,
        s"default floor must score exactly like the unbounded model: $floored vs $unbounded")
    } finally spark.conf.unset("graft.trigram.minCount")
  }

  test("bigramLogprob: above the size guards the score joins are shuffle joins, same scores") {
    val onBroadcastPath = TextOps.bigramLogprob(bigramDocs)
      .orderBy("doc_id").as[(Long, Double)].collect().toSeq
    // minCount=1 keeps every type (scores = the unbounded model, which
    // the default path equals exactly), putting both relations — 3
    // bigram types, 3 token types — above the size guards
    spark.conf.set("graft.bigram.minCount", "1")
    spark.conf.set("graft.bigram.maxTypes", "1")
    spark.conf.set("graft.unigram.maxVocab", "1")
    // suppress Catalyst's own small-table auto-broadcast (fixture-sized
    // stats would hide the guard): the claim is that above the guard we
    // no longer FORCE a broadcast of an arbitrarily large model relation
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = TextOps.bigramLogprob(bigramDocs)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"model relations above the guard must not broadcast:\n$plan")
      val got = df.orderBy("doc_id").as[(Long, Double)].collect().toSeq
      assert(got == onBroadcastPath, "join strategy must not change scores")
    } finally {
      spark.conf.unset("graft.bigram.minCount")
      spark.conf.unset("graft.bigram.maxTypes")
      spark.conf.unset("graft.unigram.maxVocab")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("gopherFilter applies the Gopher rule set with exact boundary semantics") {
    val docs = Seq(
      (0L, "the cat and the dog ran to the big house in town"), // all rules pass
      (1L, "a b"), // below the word-count floor
      (2L, "### $$$ %%% ^^^ &&& *** !!!"), // no alphabetic words, no stopwords
      (3L, ""), // zero words: null ratios, keep=false via the count floor
      (4L, null.asInstanceOf[String]) // null text: dropped, not scored
    ).toDF("doc_id", "text")
    val got = TextOps.gopherFilter(docs).orderBy("doc_id").collect()
    assert(got.length == 4, "null-text docs are dropped")
    val keeps = got.map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(keeps == Map(0L -> true, 1L -> false, 2L -> false, 3L -> false), s"$keeps")
    val d0 = got(0)
    assert(d0.getLong(1) == 12 && math.abs(d0.getDouble(2) - 3.0833) < 1e-9 &&
      d0.getDouble(3) == 1.0 && d0.getLong(4) == 6, s"doc0 signals off: $d0")
    assert(got(3).isNullAt(2) && got(3).isNullAt(3),
      "zero-word doc must carry null ratios, not a division error")
  }

  test("htmlStrip drops tags, decodes entities single-pass, collapses whitespace") {
    val docs = Seq(
      (0L, "<html><body><p>Hello <b>world</b></p>\n<div class=\"x\">two  spaces</div></body></html>"),
      (1L, "a &lt;tag&gt; literal &amp;amp; stays &amp; here &quot;q&quot; &#39;s&#39;"),
      (2L, "no markup at all"),
      (3L, ""),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextOps.htmlStrip(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(got(0) == ((0L, "Hello world two spaces", 10L)), s"got ${got(0)}")
    // single-pass decode: "&amp;amp;" -> "&amp;" the TEXT, never "&"
    assert(got(1) == ((1L, "a <tag> literal &amp; stays & here \"q\" 's'", 0L)),
      s"got ${got(1)}")
    assert(got(2) == ((2L, "no markup at all", 0L)))
    assert(got(3) == ((3L, "", 0L)))
    assert(got(4) == ((4L, null, -1L)), "null text stays null in both engines")
  }

  test("spanScrubWindowed equals spanScrub; candidates are exactly the dup-holding docs") {
    // 20 clean docs with disjoint vocab, two docs sharing an 8-token
    // span, one doc repeating its OWN 8-token span — the windowed form
    // must (a) flag exactly those three docs as candidates (the winnow
    // guarantee at run length n catches cross-doc AND within-doc
    // repeats) and (b) produce byte-identical output to the full plan.
    val span = "s1 s2 s3 s4 s5 s6 s7 s8"
    val clean = (0L until 20L).map(i =>
      (i, (0 until 12).map(j => s"c${i}_$j").mkString(" ")))
    val docs = (clean ++ Seq(
      (100L, s"pre100a pre100b $span post100"),
      (101L, s"$span tail101a tail101b tail101c"),
      (102L, s"x102a $span mid102 $span y102b")
    )).toDF("doc_id", "text")
    val n = 8
    val cand = TextOps.winnowScrubCandidates(docs, n)
      .as[Long].collect().toSet
    assert(cand == Set(100L, 101L, 102L),
      s"candidates must be exactly the dup-holding docs, got $cand")
    val full = TextOps.spanScrub(docs, n).orderBy("doc_id")
      .as[(Long, Long, String)].collect().toSeq
    val windowed = TextOps.spanScrubWindowed(docs, n).orderBy("doc_id")
      .as[(Long, Long, String)].collect().toSeq
    assert(windowed == full, "the windowed plan must be output-identical")
    // sanity on the edit itself: the global keeper is doc 100's copy
    // (min (doc_id, pos)), so 101 loses its copy and 102 loses BOTH of
    // its occurrences
    val m = windowed.map(r => r._1 -> r._3).toMap
    assert(m(100L) == s"pre100a pre100b $span post100")
    assert(m(101L) == "tail101a tail101b tail101c")
    assert(m(102L) == "x102a mid102 y102b")
  }

  test("spanScrubRouted: forced windowed route ≡ direct; route picks the declared plan on each side of the knob") {
    val span = "r1 r2 r3 r4 r5 r6 r7 r8"
    val docs = ((0L until 10L).map(i =>
      (i, (0 until 12).map(j => s"d${i}_$j").mkString(" "))) ++ Seq(
      (100L, s"a100 $span b100"),
      (101L, s"$span c101 d101")
    )).toDF("doc_id", "text")
    val n = 8
    val direct = TextOps.spanScrub(docs, n).orderBy("doc_id")
      .as[(Long, Long, String)].collect().toSeq
    // default knob (200k): fixture-sized input routes DIRECT — the plan
    // has no union of scrubbed+untouched branches
    val routedDefault = TextOps.spanScrubRouted(docs, n)
    assert(!routedDefault.queryExecution.analyzed.toString.contains("Union"),
      "below the knob the direct (no-union) plan must run")
    assert(routedDefault.orderBy("doc_id").as[(Long, Long, String)]
      .collect().toSeq == direct)
    // forced: knob below the corpus row count routes WINDOWED (the
    // scrubbed ∪ untouched shape) and the output is still byte-identical
    spark.conf.set("graft.spanscrub.directMaxRows", "1")
    try {
      val routed = TextOps.spanScrubRouted(docs, n)
      assert(routed.queryExecution.analyzed.toString.contains("Union"),
        "above the knob the windowed (union) plan must run")
      assert(routed.orderBy("doc_id").as[(Long, Long, String)]
        .collect().toSeq == direct,
        "the forced route must be output-identical — routing changes cost, never answers")
    } finally spark.conf.unset("graft.spanscrub.directMaxRows")
  }

  test("containment catches a quoted-whole short doc that Jaccard misses") {
    // doc 0 = 6 words quoted verbatim inside doc 1's 60 words: the
    // short doc's 4 shingles are ALL in the long doc, so containment =
    // 1.0, while Jaccard = 4/58 ≈ 0.07 — under any useful threshold.
    val quote = "the quick brown fox jumps high"
    val filler = (1 to 54).map(i => s"w$i").mkString(" ")
    val docs = Seq((0L, quote), (1L, s"$filler $quote")).toDF("doc_id", "text")
    // run the containment machinery directly on the planted docs
    import graft.functions.TextFunctions.shingleHashes
    import org.apache.spark.sql.functions._
    val hashed = docs.select(col("doc_id"), shingleHashes(col("text"), 3).as("hs"))
    val sh = hashed.select(col("doc_id"), explode(col("hs")).as("s"))
    val sizes = hashed.select(col("doc_id"), size(col("hs")).cast("long").as("n"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("i"), col("n").as("ni")), "i")
      .join(sizes.select(col("doc_id").as("j"), col("n").as("nj")), "j")
      .select(
        (col("inter") / least(col("ni"), col("nj")).cast("double")).as("containment"),
        (col("inter") / (col("ni") + col("nj") - col("inter")).cast("double")).as("jaccard"))
      .head()
    assert(inter.getDouble(0) == 1.0, s"containment ${inter.getDouble(0)}")
    assert(inter.getDouble(1) < 0.1, s"jaccard ${inter.getDouble(1)} not asymmetric")
  }
}
