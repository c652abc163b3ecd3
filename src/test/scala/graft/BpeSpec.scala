package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE merge learning vs a from-scratch driver-side reference
  * implementation: same greedy left-to-right merge, same
  * (count desc, a asc, b asc) tie-break — the sequences must be
  * identical, ranks, pairs, and counts.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE on a word-frequency map (independent code path: plain
    * Scala collections, no Spark).
    */
  private def referenceMerges(wf: Map[String, Long], r: Int): Seq[(Int, String, String, String, Long)] = {
    var words: Map[Vector[String], Long] =
      wf.groupMapReduce { case (w, _) => w.map(_.toString).toVector } { case (_, f) => f }(_ + _)
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var continue = true
    while (rank <= r && continue) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((sym, f) <- words; i <- 0 until sym.length - 1)
        counts((sym(i), sym(i + 1))) = counts.getOrElse((sym(i), sym(i + 1)), 0L) + f
      if (counts.isEmpty) continue = false
      else {
        val ((a, b), n) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((rank, a, b, a + b, n))
        words = words.groupMapReduce { case (sym, _) =>
          val acc = Vector.newBuilder[String]
          var last: String = null
          for (x <- sym) {
            if (last == a && x == b) { last = a + b }
            else { if (last != null) acc += last; last = x }
          }
          if (last != null) acc += last
          acc.result()
        } { case (_, f) => f }(_ + _)
        rank += 1
      }
    }
    out.result()
  }

  test("learned merges equal the reference on a planted vocabulary") {
    // the classic Sennrich et al. example vocabulary
    val wf = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val df = wf.toSeq.toDF("w", "freq")
    val got = Bpe.learnMerges(df, 6)
    val want = referenceMerges(wf, 6)
    assert(got == want, s"\ngot:  $got\nwant: $want")
    // sanity: the first merge is the est-family pair (count 9)
    assert(got.head._5 == 9L)
  }

  test("learned merges equal the reference on the fixture corpus") {
    val docs = Tables.documents(spark, sf0001)
    val wf = Bpe.wordFrequencies(docs)
      .as[(String, Long)].collect().toMap
    val got = Bpe.learnMerges(Bpe.wordFrequencies(docs), 8)
    val want = referenceMerges(wf, 8)
    assert(got == want, s"\ngot:  $got\nwant: $want")
    assert(got.size == 8)
  }

  test("merge fold is greedy left-to-right (aaa under (a,a) -> aa, a)") {
    val df = Seq(("aaa", 1L)).toDF("w", "freq")
    val m = Bpe.learnMerges(df, 1)
    assert(m == Seq((1, "a", "a", "aa", 2L)))
  }

  /** Reference application: rank-ordered greedy merges on one word. */
  private def referenceSegment(w: String, merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(w.map(_.toString).toVector) { case (sym, (a, b)) =>
      val acc = Vector.newBuilder[String]
      var last: String = null
      for (x <- sym) {
        if (last == a && x == b) { last = a + b }
        else { if (last != null) acc += last; last = x }
      }
      if (last != null) acc += last
      acc.result()
    }

  test("segmentation equals rank-ordered reference application") {
    val wf = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = Bpe.learnMerges(wf.toSeq.toDF("w", "freq"), 6).map(m => (m._2, m._3))
    val words = Seq("low", "lower", "newest", "widest", "lowest", "stew")
    val got = words.toDF("w")
      .select($"w", Bpe.segment($"w", merges).as("sym"))
      .as[(String, Seq[String])].collect().toMap
    for (w <- words)
      assert(got(w).toVector == referenceSegment(w, merges),
        s"$w: ${got(w)} vs ${referenceSegment(w, merges)}")
  }

  test("declared apply query agrees with reference counts on the fixture") {
    val docs = Tables.documents(spark, sf0001)
    val merges = Bpe.learnMerges(Bpe.wordFrequencies(docs), 8).map(m => (m._2, m._3))
    val got = Bpe.segmentDocs(docs, merges)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // reference: per-doc counts from driver-side segmentation
    val ref = docs.select($"doc_id", $"text").as[(Long, String)].collect().map {
      case (id, text) =>
        val words = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        val segs = words.map(referenceSegment(_, merges))
        id -> (segs.map(_.size.toLong).sum, segs.flatten.distinct.size.toLong)
    }.toMap
    assert(got == ref)
  }

  test("declared query emits ranked merges over documents") {
    val out = SparkEntry.queries("bpe_learn")(spark, sf001)
    val rows = out.collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length))
    assert(rows.nonEmpty && rows.length <= 8)
  }
}
