package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted double-sum matches direct within fp rounding on real data") {
    val ev = Tables.eventsRaw(spark, sf001)
    val salted = Skew.saltedAgg(
      ev.withColumn("v2", $"value"), Seq("event_type"), 8,
      Seq(("n", count(lit(1)), c => sum(col(c))),
        ("t", sum($"v2"), c => round(sum(col(c)), 2))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = ev.withColumn("v2", $"value").groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("v2"), 2).as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == expected)
  }

  test("salted aggregation equals direct aggregation on skewed keys") {
    // 90% of rows share one hot key
    val rows = (1 to 5000).map { i =>
      val k = if (i % 10 == 0) s"cold-${i % 97}" else "hot"
      (k, (i % 13).toLong)
    }
    val df = rows.toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedCountSum(df, Seq("k"), "v", salt = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("salted join equals the plain join with broadcast disabled") {
    // 90% of fact rows share one hot key; dim carries distinct payloads
    val fact = (1 to 5000).map { i =>
      val k = if (i % 10 == 0) (i % 97).toLong + 100L else 7L
      (k, i.toLong)
    }.toDF("k", "v")
    val dim = (0 to 300).map(i => (i.toLong, s"d$i")).toDF("dk", "payload")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val direct = fact.join(dim, $"k" === $"dk").drop("dk")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .groupBy(identity).view.mapValues(_.size).toMap
      val salted = Skew.saltedJoin(fact, dim, "k", "dk", salt = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(salted == direct)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("salted join replicates the dim side across every salt value") {
    val fact = (1 to 200).map(i => (1L, i.toLong)).toDF("k", "v")
    val dim = Seq((1L, "one")).toDF("dk", "payload")
    // every fact row must find its replica: full row count preserved
    val n = Skew.saltedJoin(fact, dim, "k", "dk", salt = 8).count()
    assert(n == 200L)
  }

  test("salted stage 1 actually spreads the hot key across salts") {
    val df = (1 to 2000).map(i => ("hot", i.toLong)).toDF("k", "v")
    val salts = df
      .withColumn("__salt",
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(8)))
      .select(countDistinct($"__salt")).as[Long].head()
    assert(salts >= 4, s"hot key only hit $salts salt buckets")
  }
}
