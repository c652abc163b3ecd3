package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef.noOracle
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning (Sennrich et al. 2016) — the
  * tokenizer-TRAINING side of the BPE surface (`bpe_pair_counts` is one
  * iteration's counting pass; `text_token_count_bpe` is the
  * pre-tokenizer). Learns the top-R merge rules from corpus statistics.
  *
  * Scale shape (the part that matters at 100 TB): the corpus is touched
  * EXACTLY ONCE — one explode + groupBy to the distinct-word frequency
  * table (vocabulary-sized, Heaps'-law sublinear ~10⁶-10⁸ rows where the
  * corpus is 10¹¹ words). Every merge iteration then runs on that vocab
  * relation alone: a pair-count aggregate (vocab-sized shuffle with
  * map-side partials), a 1-row argmax collect, and a row-local symbol
  * rewrite. R merges = R small shuffles + R driver rows — the corpus
  * never re-materializes. This is the map-reduce BPE trainer shape.
  *
  * Semantics: initial symbols are the word's characters (no end-of-word
  * marker — a presentation choice, not a capability: append one to the
  * word column upstream to get marker-aware merges). Each iteration
  * picks the max-count pair with the deterministic tie-break
  * (count desc, a asc, b asc) and merges adjacent (a,b) occurrences
  * greedily left-to-right — the same fold every reference BPE applies.
  * Symbols are kept as strings; merged symbols are concatenations
  * (display convention of the original paper).
  */
object Bpe {

  /** Character-split a word into its initial symbol array. */
  def charSymbols(w: Column): Column =
    transform(sequence(lit(1), length(w)), i => substring(w, i, lit(1)))

  /** Adjacent symbol pairs of `sym` as (a, b) structs; empty below 2. */
  private def adjacentPairs(sym: Column): Column =
    when(size(sym) >= 2,
      transform(sequence(lit(1), size(sym) - 1), i =>
        struct(element_at(sym, i).as("a"), element_at(sym, i + 1).as("b"))))
      .otherwise(array().cast("array<struct<a:string,b:string>>"))

  /** Greedy left-to-right merge of adjacent (a,b) into a+b — one fold
    * over the symbol array. After a merge the new symbol cannot
    * immediately re-merge as the left side ("aaa" under (a,a) → "aa","a"),
    * matching the reference algorithm's non-overlapping pass.
    */
  private def mergePair(sym: Column, a: String, b: String): Column =
    aggregate(sym, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Learn up to `r` merges from a (w, freq) word-frequency relation.
    * Returns (rank, a, b, merged, n) — n the weighted pair count that won
    * the rank. Stops early when no pair remains (fully merged vocab).
    */
  def learnMerges(wordFreq: DataFrame, r: Int): Seq[(Int, String, String, String, Long)] = {
    require(r >= 1, s"need at least one merge, got $r")
    var words = wordFreq
      .select(charSymbols(col("w")).as("sym"), col("freq"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= r && !done) {
      val top = words
        .select(explode(adjacentPairs(col("sym"))).as("p"), col("freq"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, a, b, a + b, n))
        val next = words
          .select(mergePair(col("sym"), a, b).as("sym"), col("freq"))
          .localCheckpoint()
        words.unpersist()
        words = next
        rank += 1
      }
    }
    words.unpersist()
    merges.result()
  }

  /** Corpus word frequencies — the single corpus-wide pass. */
  def wordFrequencies(docs: DataFrame): DataFrame =
    docs.select(explode(tokens(col("text"))).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Segment a word column under an ordered merge list: start from
    * characters, apply each learned merge rank by rank (the exact
    * application rule of the reference algorithm — later merges see the
    * symbols earlier merges built). Row-local; the merge list rides the
    * expression as literals, so a streaming intake can segment with a
    * batch-trained merge table the same way the quality filter serves
    * its weights.
    *
    * Expression-fold cost is O(R·len) per word — right for the R≤64
    * fixture/test tier. A production 32k-merge vocabulary applies merges
    * by rank-priority queue per word instead; that imperative kernel
    * belongs in a native expression (the TextNative pattern) and the
    * per-word INPUT of it would be exactly this function's contract.
    */
  def segment(w: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(charSymbols(w)) { case (sym, (a, b)) => mergePair(sym, a, b) }

  /** Per-doc subword segmentation stats under the learned merges:
    * subword count and the distinct subword types used.
    */
  def segmentDocs(docs: DataFrame, merges: Seq[(String, String)]): DataFrame =
    docs.select(col("doc_id"),
      explode(tokens(col("text"))).as("w"))
      .where(col("w") =!= "")
      .select(col("doc_id"), segment(col("w"), merges).as("sym"))
      .groupBy("doc_id")
      .agg(sum(size(col("sym"))).cast("long").as("n_subwords"),
        size(array_distinct(flatten(collect_list(col("sym"))))).cast("long")
          .as("n_types"))

  val defs: Seq[QueryDef] = Seq(

    // Learn the top-8 merges over the documents corpus. Deterministic
    // (integer counts, total tie-break) but the iterative argmax loop is
    // not a single SQL expression — no oracle; BpeSpec proves the merge
    // sequence equals a from-scratch reference implementation on both a
    // planted vocabulary and the fixture corpus.
    noOracle("bpe_learn") { (s, dir) =>
      import s.implicits._
      val merges = learnMerges(wordFrequencies(Tables.documents(s, dir)), 8)
      merges.toDF("rank", "a", "b", "merged", "n").orderBy("rank")
    },

    // Learn-then-apply roundtrip: segment every document under the top-8
    // corpus merges. Deterministic but merge-dependent — no SQL oracle;
    // BpeSpec proves segmentation equals the reference implementation's
    // rank-ordered application.
    noOracle("text_bpe_apply") { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val merges = learnMerges(wordFrequencies(docs), 8).map(m => (m._2, m._3))
      segmentDocs(docs, merges).orderBy("doc_id")
    }
  )
}
