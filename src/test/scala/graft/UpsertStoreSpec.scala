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
}
