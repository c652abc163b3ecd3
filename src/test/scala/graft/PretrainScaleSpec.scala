package graft

import graft.functions.TextFunctions._
import graft.operators.NearDedup
import org.apache.spark.sql.functions._

/** The scale form of the pretraining pipeline must ship the same corpus
  * as the exact form wherever band recall is total — and its near-dedup
  * stage must actually be the banded join, not the full shingle
  * self-join it replaces.
  */
class PretrainScaleSpec extends SparkSpec {

  test("scale pipeline (banded near-dedup) ships the exact pipeline's corpus") {
    for (dir <- Seq(sf0001, sf001)) {
      val exact = SparkEntry.queries("pipeline_pretraining_corpus")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
      val scale = SparkEntry.queries("pipeline_pretraining_corpus_scale")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
      assert(scale == exact,
        s"$dir: survivor sets differ (banded recall fell below total: " +
          s"${exact.size} exact vs ${scale.size} scale)")
    }
  }

  test("candidate generation joins on band buckets, never the shingle relation") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog while the cat sleeps"),
      (1L, "the quick brown fox jumps over the lazy dog while the cat rests"),
      (2L, "entirely unrelated material about columnar execution and shuffles"))
      .toDF("doc_id", "text")
    val sigs = docs
      .select(col("doc_id"), NearDedup.minhashSignatureArray(
        shingleHashes(col("text"), 3)).as("sig"))
      .where(col("sig").isNotNull)
      .select(col("doc_id") +:
        (0 until NearDedup.NumHashes).map(i => col("sig")(i).as(s"mh$i")): _*)
    val cands = NearDedup.minhashCandidates(sigs)
    val p = cands.queryExecution.optimizedPlan.toString
    assert(p.contains("band") && p.contains("bv"),
      s"candidate join must be on (band, bv):\n$p")
    assert(!p.toLowerCase.contains("cartesian"), p)
    assert(cands.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((0L, 1L)))
  }
}
