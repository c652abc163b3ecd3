package graft

import graft.streaming.StreamSessionize
import graft.streaming.StreamSessionize._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Batch≡stream convergence for stateful sessionization (the Lambda
  * consistency property, SURVEY.md §5.4): visits closed by the advancing
  * watermark must match the batch gap-sessionization of the same facts.
  */
class StreamSessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val Min = 60 * 1000L

  test("visits close on 30-min inactivity and report their own domain") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PageView]
    val visits = StreamSessionize.completedVisits(spark, input.toDS(), "1 minute")
    val q = visits.writeStream.format("memory").queryName("ssz_visits")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    // session A: foo.com user 1, two views 5 min apart (not a bounce)
    input.addData(
      PageView("foo.com", 1, 10 * Min),
      PageView("foo.com", 1, 15 * Min),
      // session B: bar.com user 2, single view (a bounce)
      PageView("bar.com", 2, 12 * Min))
    q.processAllAvailable()
    // advance the watermark far past both sessions' timeouts with a
    // different key — expiry must emit the *expired* visit's domain, not
    // this tuple's (the reference's bug, not reproduced)
    input.addData(PageView("baz.com", 9, 120 * Min))
    q.processAllAvailable()
    input.addData(PageView("baz.com", 9, 121 * Min)) // nudge another batch
    q.processAllAvailable()

    val got = spark.table("ssz_visits").as[CompletedVisit].collect()
      .map(v => (v.domain, v.user, v.nPageviews, v.isBounce)).toSet
    q.stop()
    assert(got == Set(
      ("foo.com", 1L, 2, false),
      ("bar.com", 2L, 1, true)))
  }

  test("timeout fires strictly below the watermark (boundary semantics pinned)") {
    // the stream_sessionize oracle encodes `end + 1800 < max_ts` (strict);
    // this pins that Spark's EventTimeTimeout really is strict at the
    // boundary, which the sf test data never exercises
    implicit val sqlCtx = spark.sqlContext
    val T = 100 * Min
    val input = MemoryStream[PageView]
    val visits = StreamSessionize.completedVisits(spark, input.toDS(), "0 seconds")
    val q = visits.writeStream.format("memory").queryName("ssz_bound")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    def emitted() = spark.table("ssz_bound").as[CompletedVisit]
      .collect().map(_.domain).toSet

    input.addData(PageView("a.com", 1, T))
    q.processAllAvailable()
    // watermark -> exactly the timeout timestamp: must NOT fire
    input.addData(PageView("w.com", 9, T + 30 * Min))
    q.processAllAvailable()
    input.addData(PageView("w2.com", 8, T + 30 * Min)) // extra batch at same watermark
    q.processAllAvailable()
    assert(!emitted().contains("a.com"), "timeout == watermark must not fire (strict)")
    // watermark one ms past the timeout: fires on the next batch
    input.addData(PageView("w3.com", 7, T + 30 * Min + 1))
    q.processAllAvailable()
    input.addData(PageView("w4.com", 6, T + 30 * Min + 1))
    q.processAllAvailable()
    assert(emitted().contains("a.com"), "timeout < watermark must fire")
    q.stop()
  }

  test("in-batch gaps split visits without waiting for the timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PageView]
    val visits = StreamSessionize.completedVisits(spark, input.toDS(), "1 minute")
    val q = visits.writeStream.format("memory").queryName("ssz_gaps")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    // one batch containing two sessions of the same key, 40 min apart:
    // the first closes immediately on the in-batch gap
    input.addData(
      PageView("foo.com", 1, 10 * Min),
      PageView("foo.com", 1, 11 * Min),
      PageView("foo.com", 1, 51 * Min))
    q.processAllAvailable()

    val got = spark.table("ssz_gaps").as[CompletedVisit].collect()
      .map(v => (v.user, v.startMs, v.nPageviews)).toSet
    q.stop()
    assert(got == Set((1L, 10 * Min, 2)))
  }

  test("built-in session_window streaming agg converges to batch sessionize") {
    // the declarative alternative to flatMapGroupsWithState: Spark's
    // native session windows with the same 30-min gap
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val input = MemoryStream[PageView]
    val agg = input.toDS()
      .withColumn("ts", ($"tsMillis" / 1000).cast("timestamp"))
      .withWatermark("ts", "1 minute")
      .groupBy(session_window($"ts", "30 minutes"), $"domain", $"user")
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("ssz_native")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    input.addData(
      PageView("foo.com", 1, 10 * Min), PageView("foo.com", 1, 15 * Min),
      PageView("foo.com", 1, 70 * Min),
      PageView("bar.com", 2, 20 * Min))
    q.processAllAvailable()
    input.addData(PageView("zzz.com", 9, 500 * Min))
    q.processAllAvailable()
    input.addData(PageView("zzz.com", 9, 501 * Min))
    q.processAllAvailable()
    val got = spark.table("ssz_native")
      .select($"domain", $"user", $"n").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    q.stop()
    assert(got == Set(
      ("foo.com", 1L, 2L), // 10+15 min merge
      ("foo.com", 1L, 1L), // 70 min alone
      ("bar.com", 2L, 1L)))
  }

  test("batch≡stream: watermark-closed visits match batch sessionize (30-min gap)") {
    implicit val sqlCtx = spark.sqlContext
    // times start well above 0: a ts equal to the initial watermark (0)
    // is filtered as late data by the streaming engine
    val pvs = Seq(
      PageView("foo.com", 1, 10 * Min), PageView("foo.com", 1, 15 * Min),
      PageView("foo.com", 1, 70 * Min), // new session after 55-min gap
      PageView("foo.com", 2, 20 * Min),
      PageView("bar.com", 1, 30 * Min))
    val input = MemoryStream[PageView]
    val visits = StreamSessionize.completedVisits(spark, input.toDS(), "1 minute")
    val q = visits.writeStream.format("memory").queryName("ssz_conv")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    input.addData(pvs: _*)
    q.processAllAvailable()
    input.addData(PageView("zzz.com", 99, 500 * Min)) // flush all via watermark
    q.processAllAvailable()
    input.addData(PageView("zzz.com", 99, 501 * Min))
    q.processAllAvailable()
    val streamed = spark.table("ssz_conv").as[CompletedVisit].collect()
      .map(v => (v.domain, v.user, v.startMs, v.nPageviews)).toSet
    q.stop()

    // batch equivalent: gap sessionize with the same 30-min threshold
    val batch = graft.operators.Sessionize.sessions(
      pvs.toDF("domain", "user_id", "ts"), Seq("domain", "user_id"),
      org.apache.spark.sql.functions.col("ts"),
      org.apache.spark.sql.functions.col("ts"),
      gapSecs = StreamSessionize.TimeoutMs)
      .select("domain", "user_id", "start_secs", "n_pageviews")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3).toInt))
      .toSet
    assert(streamed == batch)
  }
}
