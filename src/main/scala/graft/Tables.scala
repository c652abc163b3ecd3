package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * `events` is the streaming-source proxy for the reference's pageview
  * stream (reference: src/java/manning/speedlayer/UniquesOverTime.java:83-110
  * tuples (user, url, timestamp)): `user_id` stands in for the person id,
  * a deterministic synthetic URL built from (event_type, user_id, event_id)
  * stands in for the page URL, and `ts` for the pageview timestamp.
  */
object Tables {

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** The events file's on-disk schema — what a streaming file source must
    * declare to read the parquet as-is (before [[normalizeTs]]).
    */
  def eventsFileSchema(spark: SparkSession, dir: String): org.apache.spark.sql.types.StructType =
    eventsFile(spark, dir).schema

  /** The events relation exactly as stored — `ts` in whatever physical
    * type the generator used. Callers normalize with [[normalizeTs]].
    */
  def eventsFile(spark: SparkSession, dir: String): DataFrame = {
    // generator-era compat: TIMESTAMP(NANOS) parquet is rejected by the
    // reader unless mapped to LongType (harmless when ts is micros)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
  }

  /** Normalize a raw events relation's `ts` to epoch NANOSECONDS as
    * LongType — the engine's internal timestamp currency (the reference
    * keeps integer epochs too, schema.thrift:71-75). The generator has
    * shipped `ts` as TIMESTAMP(NANOS) (→ LongType under `nanosAsLong`)
    * and as timestamp[us] (→ TimestampNTZType) across rounds; both map
    * to the same instants here, so every downstream bucket/window/asof
    * and every DuckDB oracle (`epoch_ns(ts)` accepts either physical
    * type) is schema-drift-proof. NTZ wall times are interpreted as UTC
    * — exactly DuckDB's `epoch_ns` reading — by pinning the session
    * timezone before the cast to an instant.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampNTZType =>
        df.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case TimestampType =>
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other (expected LONG nanos or a timestamp)")
    }
  }

  /** Raw events with `ts` normalized to epoch-nanos LongType (see
    * [[normalizeTs]]). Everything batch-side reads events through here.
    */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(eventsFile(spark, dir))

  /** Events decorated with the pageview-proxy columns:
    *  - ts_secs: epoch seconds (integer division of nanos — matches the
    *    reference's i32-seconds timestamps, schema.thrift:71-75)
    *  - url: synthetic URL with port/query/fragment so that URL
    *    normalization has something to strip
    *  - the (person=user_id, url, timestamp=ts_secs) triple of
    *    ExtractPageViewFields (BatchWorkflow.java:245-260)
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    eventsRaw(spark, dir)
      .withColumn("ts_secs", graft.functions.TimeFunctions.tsSecs(col("ts")))
      .withColumn(
        "url",
        concat(
          lit("https://"), col("event_type"), lit(".example.com:8080/u/"),
          (col("user_id") % 20).cast("string"), lit("/item?q="),
          col("event_id").cast("string"), lit("#f")))

  /** SQL snippets the DuckDB oracle uses for the same derived columns —
    * kept here so Spark and oracle definitions sit side by side.
    */
  object sql {
    // Integer path end to end: epoch_ns keeps BIGINT nanos; DuckDB `//`
    // truncates toward zero while Spark's tsSecs floors, so the two agree
    // exactly on the non-negative epochs the test data guarantees (the
    // engine itself handles negative epochs — PropertySpec pins floorDiv
    // over the full Long range).
    val tsSecs = "(epoch_ns(ts) // 1000000000)"
    val url =
      "'https://' || event_type || '.example.com:8080/u/' || CAST(user_id % 20 AS VARCHAR) || '/item?q=' || CAST(event_id AS VARCHAR) || '#f'"
    // What NormalizeURL must produce for the synthetic url above.
    val normUrl =
      "'https://' || event_type || '.example.com/u/' || CAST(user_id % 20 AS VARCHAR) || '/item'"
    // What ExtractDomain (authority, incl. port) must produce.
    val domain = "event_type || '.example.com:8080'"
  }
}
