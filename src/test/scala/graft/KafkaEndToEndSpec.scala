package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger

import graft.streaming.StreamSource
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** End-to-end speed-layer test against a FAKE in-memory broker (no real
  * broker or connector jar exists in this sandbox — zero egress). The
  * fake reproduces the Kafka source's observable contract, so everything
  * except the literal `format("kafka").load()` line runs for real:
  *
  *  - the exact 7-column wire frame the connector emits (key/value
  *    binary, topic, partition, offset, timestamp, timestampType);
  *  - keyed partition assignment (hash(key) % nPartitions — Kafka's
  *    default partitioner shape) with per-partition CONTIGUOUS offsets;
  *  - a producer API, so the spec "produces to a topic" and the speed
  *    layer consumes via [[StreamSource.decodeKafka]] — the same decode
  *    the kafka branch of StreamSource.events applies.
  *
  * Mirrors the reference's Kafka-fed topology
  * (UniquesOverTime.java:196-222, TridentSpeedLayer.java:66-90): produce
  * serialized pageview records to a topic, consume as a stream, count
  * per key, and the streamed answer must equal the batch recompute.
  */
class KafkaEndToEndSpec extends SparkSpec {
  import spark.implicits._

  /** One record as the kafka connector presents it. */
  case class WireRecord(
      key: Array[Byte], value: Array[Byte], topic: String,
      partition: Int, offset: Long, timestamp: java.sql.Timestamp,
      timestampType: Int)

  /** The fake broker: produce() assigns partitions by key hash and hands
    * out contiguous per-partition offsets; raw() is the streaming frame a
    * kafka scan of the topic would yield.
    */
  class FakeKafkaBroker(spark: SparkSession, topic: String, nPartitions: Int) {
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    private val stream = MemoryStream[WireRecord]
    private val offsets = Array.fill(nPartitions)(0L)

    def produce(records: Seq[(String, String)]): Unit = synchronized {
      val wire = records.map { case (k, v) =>
        val p = math.floorMod(k.hashCode, nPartitions)
        val off = offsets(p)
        offsets(p) = off + 1
        WireRecord(k.getBytes(UTF_8), v.getBytes(UTF_8), topic, p, off,
          new java.sql.Timestamp(86400000L), 0)
      }
      stream.addData(wire)
    }

    def raw: DataFrame = stream.toDF()

    def endOffsets: Seq[Long] = offsets.toSeq
  }

  private val sinkId = new AtomicInteger(0)

  /** Run a streaming transform of the fake-broker frame to completion. */
  private def runStream(raw: DataFrame, mode: String = "complete")(
      transform: DataFrame => DataFrame): DataFrame = {
    val name = s"graft_fake_kafka_${sinkId.incrementAndGet()}"
    val q = transform(raw).writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  test("produce events to a fake topic; streamed per-key counts equal the batch recompute") {
    val schema = Tables.eventsRaw(spark, sf0001).schema
    val events = Tables.eventsRaw(spark, sf0001)
    // the producer side: each event row JSON-serialized, keyed by user —
    // the reference's PageviewScheme wire step (UniquesOverTime.java:83-110)
    val payloads = events
      .select(col("user_id").cast("string").as("k"), to_json(struct(col("*"))).as("v"))
      .as[(String, String)].collect().toSeq

    val broker = new FakeKafkaBroker(spark, "pageviews", nPartitions = 3)
    // two produce calls: the stream must absorb multiple batches
    val (first, rest) = payloads.splitAt(payloads.size / 2)
    broker.produce(first)
    broker.produce(rest)

    val counted = runStream(broker.raw) { raw =>
      StreamSource.decodeKafka(raw, schema)
        .groupBy(col("event_type").as("url"))
        .agg(count(lit(1)).as("pv"))
    }
    val batch = events.groupBy(col("event_type").as("url"))
      .agg(count(lit(1)).as("pv"))
    assert(counted.exceptAll(batch).isEmpty && batch.exceptAll(counted).isEmpty,
      "streamed counts over the fake topic must equal the batch recompute")
    assert(broker.endOffsets.sum == payloads.size.toLong, "every record got exactly one offset")
  }

  test("the fake broker keeps the kafka contract: keyed partitioning, contiguous offsets, wire schema") {
    val broker = new FakeKafkaBroker(spark, "t", nPartitions = 3)
    broker.produce((1 to 100).map(i => (s"user${i % 7}", s"payload$i")))
    // stream the raw frame into a table, then analyze it batch-side
    // (streaming aggregation forbids countDistinct)
    val consumed = runStream(broker.raw, mode = "append")(identity)
    val perPart = consumed.groupBy("topic", "partition")
      .agg(count(lit(1)).as("n"), min("offset").as("lo"), max("offset").as("hi"))
    // per-partition offsets are 0-based and contiguous (hi = n - 1)
    perPart.collect().foreach { r =>
      assert(r.getAs[String]("topic") == "t")
      assert(r.getAs[Long]("lo") == 0L)
      assert(r.getAs[Long]("hi") == r.getAs[Long]("n") - 1)
    }
    // same key → same partition (the default-partitioner shape)
    val byKey = consumed
      .select(col("key").cast("string").as("k"), col("partition"))
      .groupBy("k").agg(countDistinct(col("partition")).as("nparts"))
    byKey.collect().foreach(r => assert(r.getAs[Long]("nparts") == 1L, r))
    // the frame carries exactly the kafka source's columns
    assert(broker.raw.schema.fieldNames.toSeq ==
      Seq("key", "value", "topic", "partition", "offset", "timestamp", "timestampType"))
  }
}
