package graft

import graft.streaming.{StreamSessionize, StreamViews}
import graft.streaming.StreamSessionize._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import scala.jdk.CollectionConverters._

/** The `graft.stream.stateStore` seam: streaming results must be
  * IDENTICAL under the default heap provider and the RocksDB provider —
  * the spillable backend is purely an executor-memory decision (the
  * CassandraState role in the reference speed layer), never a semantics
  * one. Also pins that the conf actually engages RocksDB (via the
  * provider's own custom metrics), so the seam can't silently no-op.
  */
class StateStoreSpec extends SparkSpec {
  import spark.implicits._

  private val Min = 60 * 1000L

  private def withStateStoreConf[A](value: String)(f: => A): A = {
    spark.conf.set("graft.stream.stateStore", value)
    try f finally spark.conf.unset("graft.stream.stateStore")
  }

  /** Drive completedVisits over a MemoryStream under the session's
    * current provider conf, returning (visits, rocksdb-engaged).
    */
  private def runSessionize(name: String): (Set[(String, Long, Long, Int)], Boolean) =
    StreamViews.withStreamStateConf(spark) {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[PageView]
      val visits = StreamSessionize.completedVisits(spark, input.toDS(), "1 minute")
      val q = visits.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      input.addData(
        PageView("foo.com", 1, 10 * Min), PageView("foo.com", 1, 15 * Min),
        PageView("foo.com", 1, 70 * Min), // gap-split session
        PageView("foo.com", 2, 20 * Min),
        PageView("bar.com", 1, 30 * Min))
      q.processAllAvailable()
      input.addData(PageView("zzz.com", 99, 500 * Min)) // watermark flush
      q.processAllAvailable()
      input.addData(PageView("zzz.com", 99, 501 * Min))
      q.processAllAvailable()
      val rocks = Option(q.lastProgress).toSeq
        .flatMap(_.stateOperators.toSeq)
        .exists(_.customMetrics.keySet.asScala.exists(_.startsWith("rocksdb")))
      val got = spark.table(name).as[CompletedVisit].collect()
        .map(v => (v.domain, v.user, v.startMs, v.nPageviews)).toSet
      q.stop()
      (got, rocks)
    }

  test("stream sessionize under RocksDB equals the default provider (and RocksDB really engages)") {
    val (heap, heapRocks) = runSessionize("ss_heap")
    assert(!heapRocks, "default provider must not be RocksDB")
    val (rocks, rocksEngaged) = withStateStoreConf("rocksdb")(runSessionize("ss_rocks"))
    assert(rocksEngaged,
      "graft.stream.stateStore=rocksdb must route state through the RocksDB provider")
    assert(rocks == heap, s"provider changed results:\nheap=$heap\nrocksdb=$rocks")
    assert(rocks.nonEmpty)
  }

  test("stream_dedup_bounded declared query is provider-independent") {
    val heap = SparkEntry.queries("stream_dedup_bounded")(spark, sf0001)
      .collect().map(_.toSeq).toSet
    val rocks = withStateStoreConf("rocksdb") {
      SparkEntry.queries("stream_dedup_bounded")(spark, sf0001)
        .collect().map(_.toSeq).toSet
    }
    assert(heap.nonEmpty)
    assert(rocks == heap)
  }

  test("an unknown state-store value fails loudly, not silently on-heap") {
    val ex = intercept[IllegalArgumentException] {
      withStateStoreConf("cassandra") {
        StreamViews.withStreamStateConf(spark)(())
      }
    }
    assert(ex.getMessage.contains("memory|rocksdb"))
  }
}
