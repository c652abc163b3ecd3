package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Winnowing fingerprint guarantees (Schleimer/Wilkerson/Aiken SIGMOD'03):
  * with window w over k-token shingles, any two documents sharing a run of
  * at least w + k - 1 tokens share at least one fingerprint — the property
  * plagiarism/dup detection relies on. k = 3, w = 4 here → 6-token runs.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def fps(docs: Seq[(Long, String)]): Map[Long, Set[String]] =
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.winnowFingerprints(col("text"), 4).as("f"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
      .toMap

  test("docs sharing a 6-token run share a fingerprint; disjoint docs share none") {
    val sharedRun = "alpha bravo charlie delta echo foxtrot"
    val m = fps(Seq(
      (0L, s"one two three $sharedRun nine ten eleven twelve"),
      (1L, s"totally different prefix words here $sharedRun and another tail"),
      (2L, "unrelated content with no overlap whatsoever in any token span")))
    assert((m(0L) & m(1L)).nonEmpty, "guaranteed shared fingerprint missing")
    assert((m(0L) & m(2L)).isEmpty && (m(1L) & m(2L)).isEmpty,
      "disjoint docs must not collide")
  }

  test("fingerprint set is deterministic, non-empty for >=3-token docs, and compressed") {
    val text = ("the quick brown fox jumps over the lazy dog " * 4).trim
    val Seq(a, b) = Seq(fps(Seq((0L, text))), fps(Seq((0L, text))))
    assert(a(0L) == b(0L), "same text must fingerprint identically")
    val nShingles = text.split("\\s+", -1).length - 2
    assert(a(0L).nonEmpty && a(0L).size < nShingles,
      s"expected 1..${nShingles - 1} fingerprints, got ${a(0L).size}")
  }

  test("short docs: one fingerprint for 3..6 tokens, empty below 3") {
    val m = fps(Seq((0L, "just three words"), (1L, "two words"), (2L, "")))
    assert(m(0L).size == 1)
    assert(m(1L).isEmpty && m(2L).isEmpty)
  }
}
