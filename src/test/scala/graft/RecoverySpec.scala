package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Exactly-once across restarts (SURVEY.md §2.7 delivery row): a file-
  * source stream with a checkpoint is stopped mid-input and restarted;
  * the sink must contain every input row exactly once — checkpointed
  * offsets + idempotent per-epoch sink replace Trident's txid state
  * (CassandraState.java:62-68,120-127).
  */
class RecoverySpec extends SparkSpec {
  import spark.implicits._

  test("file stream restart from checkpoint is exactly-once") {
    val base = Files.createTempDirectory("graft_recovery")
    val in = base.resolve("in"); Files.createDirectories(in)
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("id LONG, v LONG")
        .parquet(in.toString)
        .withColumn("doubled", col("v") * 2)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // epoch 1: first file
    Seq.range(0L, 100L).map(i => (i, i % 7)).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(in.toString)
    runOnce()
    // epoch 2: second file arrives after the stream stopped
    Seq.range(100L, 250L).map(i => (i, i % 7)).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(in.toString)
    runOnce()
    // epoch 3: restart with NO new data — must add nothing (idempotent)
    runOnce()

    val got = spark.read.parquet(out).select("id").as[Long].collect().toSeq.sorted
    assert(got.size == 250, s"expected 250 rows exactly once, got ${got.size}")
    assert(got == Seq.range(0L, 250L), "every input id exactly once")
  }
}
