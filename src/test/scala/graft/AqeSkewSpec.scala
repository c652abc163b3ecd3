package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling (SURVEY.md §7.4: "skewed keys → salting or AQE
  * skew-join"): a 90%-hot-key join must still produce correct results,
  * and with skew thresholds lowered to fixture scale, AQE splits the
  * oversized partition (skew=true in the executed join).
  */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed join partition and results stay correct") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      // the downstream groupBy(k) reuses the join partitioning; without
      // this AQE declines to split (it would add a shuffle)
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // left: 200k rows, 90% on key 0; right: one row per key
      val left = spark.range(200000)
        .select((when(rand(7) < 0.9, 0L).otherwise(pmod(col("id"), lit(100)))).as("k"),
          col("id").as("v"))
      val right = spark.range(100).select(col("id").as("k"), (col("id") * 10).as("w"))
      val joined = left.join(right, "k")
      val perKeyDf = joined.groupBy("k").agg(count(lit(1)).as("n"))
      val perKey = perKeyDf.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // the *executed* plan (post-AQE) must show the skew split
      val plan = perKeyDf.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"expected AQE skew split in:\n$plan")
      val expected = left.groupBy("k").agg(count(lit(1)).as("n")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(perKey == expected)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
