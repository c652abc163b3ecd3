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

  test("piiScrub is idempotent: scrubbing scrubbed text changes nothing") {
    val docs = Seq((0L, "reach me: a@b.com / 555-123-4567")).toDF("doc_id", "text")
    val once = TextOps.piiScrub(docs).select("doc_id", "clean")
      .withColumnRenamed("clean", "text")
    val twice = TextOps.piiScrub(once).as[(Long, String, Long, Long)].head()
    assert(twice == ((0L, "reach me: <EMAIL> / <PHONE>", 0L, 0L)))
  }
}
