package graft

import java.nio.file.Files

import graft.model._
import org.apache.spark.sql.functions._

class FactStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmpMaster(): String =
    Files.createTempDirectory("graft_test").toString + "/master"

  private def sampleFacts = Seq(
    Fact.pageView(PersonId.ofUser(1), "http://foo.com/a", 60, nonce = 1),
    Fact.pageView(PersonId.ofCookie("ABC"), "http://foo.com/b", 62, nonce = 2),
    Fact.equiv(PersonId.ofUser(1), PersonId.ofCookie("ABC"), 100),
    Fact.personProperty(PersonId.ofUser(1),
      PersonPropertyValue(Some("Alice"), None, Some(Location(Some("SF"), None, Some("US")))), 50),
    Fact.pageProperty(PageId("http://foo.com/a"), 10, 70)
  ).toDS()

  test("debugObserve reports pass-through metrics from the same action (the reference's Debug predicate)") {
    val observed = graft.operators.Workflow.debugObserve(
      sampleFacts.toDF(), "ingest_debug", sum(col("pedigree.trueAsOfSecs")).as("ts_sum"))
    // rows unchanged, one action — collect() executes THIS Dataset's
    // queryExecution (count() would plan a new one whose metrics the
    // original handle never sees)
    assert(observed.collect().length == 5)
    val m = observed.queryExecution.observedMetrics("ingest_debug")
    assert(m.getAs[Long]("rows") == 5L)
    assert(m.getAs[Long]("ts_sum") == 60 + 62 + 100 + 50 + 70)
  }

  test("round-trip: all fact kinds survive partitioned write + typed read") {
    val master = tmpMaster()
    FactStore.ingest(sampleFacts, master)
    val back = FactStore.readAll(spark, master)
    assert(back.count() == 5)
    assert(back.collect().forall(_.unitCount == 1))
    val kinds = back.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds == Map("page_view" -> 2L, "equiv" -> 1L,
      "person_property" -> 1L, "page_property" -> 1L))
  }

  test("scanKind prunes partitions in the physical plan") {
    val master = tmpMaster()
    FactStore.ingest(sampleFacts, master)
    val scan = FactStore.scanKind(spark, master, FactKind.Equiv)
    assert(scan.count() == 1)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("kind"),
      s"expected kind partition filter in plan:\n$plan")
  }

  test("append ingest doubles, consolidate compacts without data loss") {
    val master = tmpMaster()
    FactStore.ingest(sampleFacts, master, shredPartitions = 4)
    FactStore.ingest(sampleFacts, master, shredPartitions = 4)
    assert(FactStore.readAll(spark, master).count() == 10)
    FactStore.consolidate(spark, master, targetFiles = 1)
    val back = FactStore.readAll(spark, master)
    assert(back.count() == 10)
    val files = back.select(input_file_name()).distinct().count()
    // one file per non-empty kind partition after targetFiles=1 rewrite
    assert(files <= 4, s"expected <=4 files after consolidate, got $files")
  }

  test("snapshot claims staging atomically; deleteSnapshot removes it") {
    val base = Files.createTempDirectory("graft_test").toString
    val staging = base + "/new"
    sampleFacts.write.parquet(staging)
    val snap = FactStore.snapshot(spark, staging)
    assert(snap.isDefined)
    assert(FactStore.snapshot(spark, staging).isEmpty, "staging gone after claim")
    assert(spark.read.parquet(snap.get).count() == 5)
    FactStore.deleteSnapshot(spark, snap.get)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(snap.get)))
  }

  test("deduplicate collapses identical facts, keeps distinct nonces") {
    val pv = Fact.pageView(PersonId.ofUser(1), "http://foo.com/a", 60, nonce = 1)
    val sameAgain = Fact.pageView(PersonId.ofUser(1), "http://foo.com/a", 60, nonce = 1)
    val differentNonce = Fact.pageView(PersonId.ofUser(1), "http://foo.com/a", 60, nonce = 2)
    val deduped = FactStore.deduplicate(Seq(pv, sameAgain, differentNonce).toDS()).collect()
    assert(deduped.length == 2)
    assert(deduped.flatMap(_.pageView).map(_.nonce).sorted.toSeq == Seq(1L, 2L))
  }

  test("validate rejects union-invariant violations") {
    val bad = Seq(
      Fact(FactKind.PageView, Pedigree(0, "self"), None, None, None, None))
      .toDS()
    intercept[IllegalArgumentException] {
      FactStore.validate(bad)
    }
  }

  test("ingest's in-write guard aborts on invariant violations, commits nothing") {
    val master = tmpMaster()
    val mixed = Seq(
      Fact.pageView(PersonId.ofUser(1), "http://foo.com/a", 60, nonce = 1),
      Fact(FactKind.PageView, Pedigree(0, "self"), None, None, None, None))
      .toDS()
    val e = intercept[Exception] { FactStore.ingest(mixed, master) }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("union invariant")), e.toString)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val committed = new org.apache.hadoop.fs.Path(master)
    assert(!fs.exists(committed) ||
      fs.globStatus(new org.apache.hadoop.fs.Path(master + "/*/*.parquet")).isEmpty,
      "aborted ingest must not leave committed files")
  }

  test("snapshotDiff roundtrip: applying the diff to old reproduces new exactly") {
    import spark.implicits._
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, null, 40.0))
      .toDF("k", "s", "v")
    val neu = Seq((1L, "a", 10.0), (2L, "B", 20.0), (4L, null, 41.0), (5L, "e", 50.0))
      .toDF("k", "s", "v")
    val diff = graft.operators.IngestOps.snapshotDiff(old, neu, "k")
    val ops = diff.collect().map(r => (r.getLong(0), r.getString(3))).toMap
    // 1 unchanged → absent; 2 payload change → U; 3 removed → D;
    // 4 null-safe compare still sees the v change → U; 5 added → I
    assert(ops == Map(2L -> "U", 3L -> "D", 4L -> "U", 5L -> "I"))
    val reapplied = old
      .join(diff.select("k"), Seq("k"), "left_anti")
      .unionAll(diff.where(col("op") =!= "D").drop("op"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val expected = neu.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(reapplied == expected)
  }

  test("snapshotDiff of identical snapshots is empty") {
    import spark.implicits._
    val snap = Seq((1L, "a", 10.0), (2L, null, 20.0)).toDF("k", "s", "v")
    val snap2 = Seq((2L, null, 20.0), (1L, "a", 10.0)).toDF("k", "s", "v")
    assert(graft.operators.IngestOps.snapshotDiff(snap, snap2, "k").count() == 0L)
  }

  test("PersonId sort order matches Thrift compareTo (cookie tag < user_id tag)") {
    val ids = Seq(PersonId.ofUser(5), PersonId.ofCookie("ZZZ"),
      PersonId.ofUser(1), PersonId.ofCookie("AAA"))
    val sorted = ids.sortBy(_.sortKey)
    assert(sorted == Seq(PersonId.ofCookie("AAA"), PersonId.ofCookie("ZZZ"),
      PersonId.ofUser(1), PersonId.ofUser(5)))
  }
}
