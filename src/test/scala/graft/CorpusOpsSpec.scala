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

  test("shard_pack is independent of the range-partition width") {
    val docs = (0L until 57L).map(i => (i * 3 % 57, (i % 7) + 2)).toDF("doc_id", "n_tokens")
    def run(p: Int) = CorpusOps.shardPack(docs, budget = 15, parts = p)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(run(1) == run(5) && run(5) == run(32))
  }
}
