package graft

import java.nio.file.Files

import graft.streaming.UpsertStore
import org.apache.spark.sql.functions._

/** The LSM-flavored streamed upsert store: folds are pure appends into
  * the batch keys' buckets only, reads resolve latest-per-key and drop
  * tombstones, replayed folds are idempotent, compaction preserves the
  * read result.
  */
class UpsertStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_upsertstore").toString + "/store"

  private def fileSet(dir: String): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir)).map(_.getPath)
      .filter(_.endsWith(".parquet")).toSet
  }

  private val keys = Seq("k")

  private def readMap(dir: String): Map[Long, String] =
    UpsertStore.read(spark, dir, keys).get
      .select("k", "v").as[(Long, String)].collect().toMap

  test("fold appends only into the batch keys' buckets; existing files untouched") {
    val dir = freshDir()
    UpsertStore.fold(spark, dir,
      (0L until 64L).map(i => (i, s"v0-$i")).toDF("k", "v"), keys, seq = 0)
    val before = fileSet(dir)
    UpsertStore.fold(spark, dir, Seq((3L, "v1-3")).toDF("k", "v"), keys, seq = 1)
    val after = fileSet(dir)
    assert(before.subsetOf(after), "a fold must never rewrite or remove existing files")
    val newFiles = after -- before
    val changedBucket = spark.range(1)
      .select(pmod(hash(lit(3L)), lit(UpsertStore.DefaultBuckets))).head().getInt(0)
    assert(newFiles.nonEmpty && newFiles.forall(_.contains(s"bucket=$changedBucket")),
      s"new files must land only in the changed key's bucket, got $newFiles")
    assert(readMap(dir)(3L) == "v1-3" && readMap(dir)(4L) == "v0-4")
  }

  test("read resolves latest version per key and drops tombstones") {
    val dir = freshDir()
    UpsertStore.fold(spark, dir,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), keys, seq = 0)
    UpsertStore.fold(spark, dir,
      Seq((2L, "b2", false), (3L, null.asInstanceOf[String], true), (4L, "d", false))
        .toDF("k", "v", "del"),
      keys, seq = 1, deletedCol = Some("del"))
    assert(readMap(dir) == Map(1L -> "a", 2L -> "b2", 4L -> "d"),
      "update wins, delete tombstones, insert lands, untouched key persists")
  }

  test("replaying a fold with the same seq is idempotent (streaming batch retry)") {
    val dir = freshDir()
    UpsertStore.fold(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), keys, seq = 0)
    val batch = Seq((2L, "b2")).toDF("k", "v")
    UpsertStore.fold(spark, dir, batch, keys, seq = 1)
    UpsertStore.fold(spark, dir, batch, keys, seq = 1) // the retry
    val rows = UpsertStore.read(spark, dir, keys).get
    assert(rows.count() == 2, "duplicate (key, seq) rows must collapse on read")
    assert(readMap(dir) == Map(1L -> "a", 2L -> "b2"))
  }

  test("compact shrinks to live rows, preserves the read result, later folds still win") {
    val dir = freshDir()
    UpsertStore.fold(spark, dir,
      (0L until 32L).map(i => (i, s"v0-$i")).toDF("k", "v"), keys, seq = 0)
    UpsertStore.fold(spark, dir,
      (0L until 32L by 2).map(i => (i, s"v1-$i")).toDF("k", "v"), keys, seq = 1)
    UpsertStore.fold(spark, dir,
      Seq((5L, null.asInstanceOf[String], true)).toDF("k", "v", "del"),
      keys, seq = 2, deletedCol = Some("del"))
    val beforeCompact = readMap(dir)
    UpsertStore.compact(spark, dir, keys)
    assert(readMap(dir) == beforeCompact, "compaction must not change the read result")
    val raw = spark.read.parquet(dir)
    assert(raw.count() == beforeCompact.size,
      "after compaction the store holds exactly the live rows")
    // a post-compaction fold still supersedes compacted versions
    UpsertStore.fold(spark, dir, Seq((0L, "v3-0")).toDF("k", "v"), keys, seq = 3)
    assert(readMap(dir)(0L) == "v3-0")
  }

  test("empty batches fold to nothing: no empty-directory bootstrap, no file churn") {
    val dir = freshDir()
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    UpsertStore.fold(spark, dir, empty, keys, seq = 0)
    assert(UpsertStore.read(spark, dir, keys).isEmpty,
      "an empty first batch must not create an unreadable empty store")
    UpsertStore.fold(spark, dir, Seq((1L, "a")).toDF("k", "v"), keys, seq = 1)
    val before = fileSet(dir)
    UpsertStore.fold(spark, dir, empty, keys, seq = 2)
    assert(fileSet(dir) == before, "an empty batch must write nothing")
    assert(readMap(dir) == Map(1L -> "a"))
  }

  test("torn fold (prefix of batch files visible) leaves prior versions readable") {
    val dir = freshDir()
    UpsertStore.fold(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), keys, seq = 0)
    // simulate the crash state: only PART of batch 1 landed — key 1's
    // new version is on disk, key 2's never made it
    UpsertStore.fold(spark, dir, Seq((1L, "a1")).toDF("k", "v"), keys, seq = 1)
    assert(readMap(dir) == Map(1L -> "a1", 2L -> "b"),
      "reads see every fully-landed version; nothing is ever lost mid-fold")
  }

  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
      Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      allNodes(a.executedPlan)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: allNodes(s.plan)
    case _ => p +: p.children.flatMap(allNodes)
  }

  test("lookup prunes the scan to the keys' buckets and equals the filtered full read") {
    val dir = freshDir()
    UpsertStore.fold(spark, dir,
      (0L until 64L).map(i => (i, s"v0-$i")).toDF("k", "v"), keys, seq = 0)
    UpsertStore.fold(spark, dir, Seq((3L, "v1-3")).toDF("k", "v"), keys, seq = 1)
    val looked = UpsertStore.lookup(spark, dir, keys, Seq(Seq(3L), Seq(4L))).get
    looked.collect() // materialize so the executed plan is final
    // result ≡ full read filtered to the same keys
    val expect = UpsertStore.read(spark, dir, keys).get
      .where($"k".isin(3L, 4L)).as[(Long, String)].collect().toSet
    assert(looked.as[(Long, String)].collect().toSet == expect)
    assert(expect.contains((3L -> "v1-3")))
    // the scan reads ONLY the looked-up keys' bucket partitions
    val wanted = spark.range(1).select(
      pmod(hash(lit(3L)), lit(UpsertStore.DefaultBuckets)),
      pmod(hash(lit(4L)), lit(UpsertStore.DefaultBuckets)))
      .head()
    val nWanted = Set(wanted.getInt(0), wanted.getInt(1)).size
    val scans = allNodes(looked.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "no file scan in the lookup plan")
    val scanned = scans.map(_.selectedPartitions.partitionCount).max
    assert(scanned == nWanted,
      s"lookup read $scanned of ${UpsertStore.DefaultBuckets} buckets; wanted $nWanted")
  }

  test("lookup casts literals to the store's key types (Int probe for a Long key)") {
    val dir = freshDir()
    UpsertStore.fold(spark, dir,
      (0L until 16L).map(i => (i, s"v-$i")).toDF("k", "v"), keys, seq = 0)
    // hash(5: Int) != hash(5L): an uncast Int literal would probe the
    // wrong bucket and silently return nothing
    val got = UpsertStore.lookup(spark, dir, keys, Seq(Seq(5)))
      .get.as[(Long, String)].collect().toMap
    assert(got == Map(5L -> "v-5"))
  }

  test("lookup reads the bucket modulus from the store's sidecar, not the caller") {
    // a store folded at 16 buckets must lookup correctly with NO
    // caller-supplied count (the sidecar self-describes); a mismatched
    // fold is rejected outright (review finding, round 11)
    val dir = freshDir()
    UpsertStore.fold(spark, dir,
      (0L until 64L).map(i => (i, s"v-$i")).toDF("k", "v"), keys, seq = 0,
      nBuckets = 16)
    val got = UpsertStore.lookup(spark, dir, keys, Seq(Seq(7L)))
      .get.as[(Long, String)].collect().toMap
    assert(got == Map(7L -> "v-7"),
      s"sidecar-derived modulus must find the key, got $got")
    val e = intercept[IllegalArgumentException] {
      UpsertStore.fold(spark, dir, Seq((1L, "x")).toDF("k", "v"), keys,
        seq = 1, nBuckets = 8)
    }
    assert(e.getMessage.contains("nBuckets"))
    // compaction preserves the sidecar across the whole-dir swap
    UpsertStore.compact(spark, dir, keys)
    assert(UpsertStore.lookup(spark, dir, keys, Seq(Seq(7L)))
      .get.as[(Long, String)].collect().toMap == Map(7L -> "v-7"))
  }

  test("files accumulate per fold until the trigger fires; maintain compacts to ~1 file/bucket") {
    val dir = freshDir()
    val maxFiles = 4
    var reads = Vector.empty[Map[Long, String]]
    var fired = 0
    (0 until 6).foreach { i =>
      UpsertStore.fold(spark, dir,
        (0L until 16L).map(k => (k, s"v$i-$k")).toDF("k", "v"), keys, seq = i.toLong)
      if (UpsertStore.maintain(spark, dir, keys, maxFiles)) fired += 1
      reads :+= readMap(dir)
    }
    assert(fired >= 1, "six 16-key folds at maxFiles=4 must trip the trigger at least once")
    // every read along the way saw the latest fold's values
    reads.zipWithIndex.foreach { case (m, i) =>
      assert(m == (0L until 16L).map(k => k -> s"v$i-$k").toMap,
        s"read after fold $i diverged (compaction ran: $fired)")
    }
    // after a final compact every bucket is ~1 file
    UpsertStore.compact(spark, dir, keys)
    assert(UpsertStore.maxFilesPerBucket(spark, dir) <= 2,
      s"compacted bucket still holds ${UpsertStore.maxFilesPerBucket(spark, dir)} files")
    assert(!UpsertStore.needsCompact(spark, dir, maxFiles))
  }

  test("compact crash windows: store (or its .old) is always complete; fold/read recover") {
    import graft.model.StoreSwap
    val f = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def P(s: String) = new org.apache.hadoop.fs.Path(s)

    // window 1: compact staged dir.tmp but crashed BEFORE the swap —
    // reads ignore the staging; later folds append; a later compact
    // discards the stale tmp rather than promoting it over newer folds
    val d1 = freshDir()
    UpsertStore.fold(spark, d1, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), keys, seq = 0)
    spark.read.parquet(d1).write.parquet(StoreSwap.tmpPath(d1)) // the stale staging
    UpsertStore.fold(spark, d1, Seq((1L, "a1")).toDF("k", "v"), keys, seq = 1)
    assert(readMap(d1) == Map(1L -> "a1", 2L -> "b"))
    UpsertStore.compact(spark, d1, keys)
    assert(readMap(d1) == Map(1L -> "a1", 2L -> "b"),
      "a stale pre-fold staging must never be promoted over newer folds")

    // window 2: crash BETWEEN the two renames — store absent, .old holds
    // the current version, tmp holds the staged compacted version.
    // read() resolves through .old; fold() first rolls the swap back, so
    // nothing under the appended batch can be deleted by later recovery.
    val d2 = freshDir()
    UpsertStore.fold(spark, d2, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), keys, seq = 0)
    spark.read.parquet(d2).write.parquet(StoreSwap.tmpPath(d2))
    require(f.rename(P(d2), P(StoreSwap.oldPath(d2)))) // crash point
    assert(readMap(d2) == Map(1L -> "a", 2L -> "b"),
      "mid-swap absence must read as the preserved .old, not as empty")
    UpsertStore.fold(spark, d2, Seq((3L, "c")).toDF("k", "v"), keys, seq = 1)
    assert(!f.exists(P(StoreSwap.oldPath(d2))) && !f.exists(P(StoreSwap.tmpPath(d2))),
      "fold must finish the rollback before appending")
    assert(readMap(d2) == Map(1L -> "a", 2L -> "b", 3L -> "c"))

    // window 3: crash AFTER the swap, before .old cleanup — the next
    // compact (or StoreSwap.commit) cleans it; reads already see dir
    val d3 = freshDir()
    UpsertStore.fold(spark, d3, Seq((1L, "a")).toDF("k", "v"), keys, seq = 0)
    spark.read.parquet(d3).write.parquet(StoreSwap.oldPath(d3)) // leftover .old
    assert(readMap(d3) == Map(1L -> "a"))
    UpsertStore.compact(spark, d3, keys)
    assert(!f.exists(P(StoreSwap.oldPath(d3))))
    assert(readMap(d3) == Map(1L -> "a"))
  }

  test("a torn (empty/garbage) bucket-count sidecar reads as absent and self-heals") {
    // a crash mid-sidecar-write used to leave an empty _graft_buckets
    // that made every later fold/lookup/compact throw
    // NumberFormatException — the one state the store couldn't recover
    // from. Now the sidecar is written temp-then-rename, and an
    // unparsable one (from an old store) is treated as absent.
    val f = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def P(s: String) = new org.apache.hadoop.fs.Path(s)
    val dir = freshDir()
    UpsertStore.fold(spark, dir,
      (0L until 16L).map(i => (i, s"v-$i")).toDF("k", "v"), keys, seq = 0)
    // plant the torn state: truncate the sidecar to zero bytes
    f.create(P(s"$dir/_graft_buckets"), true).close()
    // sidecar-less lookup degrades to the explicit-count path with a
    // actionable error, never a bare parse exception
    val e = intercept[RuntimeException] {
      UpsertStore.lookup(spark, dir, keys, Seq(Seq(5L)))
    }
    assert(e.getMessage.contains("nBuckets"), s"wanted the fallback hint, got: $e")
    assert(UpsertStore.lookup(spark, dir, keys, Seq(Seq(5L)),
      nBuckets = UpsertStore.DefaultBuckets).get
      .as[(Long, String)].collect().toMap == Map(5L -> "v-5"))
    // reads and compaction never needed the sidecar
    assert(readMap(dir).size == 16)
    // the next fold re-records the modulus; sidecar-less lookup works again
    UpsertStore.fold(spark, dir, Seq((5L, "v1-5")).toDF("k", "v"), keys, seq = 1)
    assert(UpsertStore.lookup(spark, dir, keys, Seq(Seq(5L))).get
      .as[(Long, String)].collect().toMap == Map(5L -> "v1-5"))
  }
}
