package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time-bucket scalar ops.
  *
  * The reference buckets by *integer division of epoch seconds*, not by
  * calendar truncation (ToHourBucket BatchWorkflow.java:235-243;
  * EmitGranularities BatchWorkflow.java:262-275): hour = secs/3600,
  * day = hour/24, week = day/7, month = day/28 (fixed 7-day weeks and
  * 28-day "months"). We keep those semantics exactly — `date_trunc` would
  * be a silent behavior change.
  */
object TimeFunctions {

  /** Exact floor division on integral columns, yielding LongType (works for
    * negative epochs too, the full Long range). `floor(c / n)` would promote
    * through DoubleType, whose 2^53 exact range epoch *nanoseconds* (~1.7e18)
    * exceed — a boundary value could land in the wrong bucket. Instead:
    * truncated integral `div` minus one when the remainder is negative —
    * all long arithmetic, no overflow for any input (a subtract-the-mod
    * formulation would wrap near Long.MinValue).
    */
  def fdiv(c: Column, n: Long): Column = {
    require(n > 0, s"fdiv divisor must be positive, got $n")
    (call_function("div", c, lit(n)) -
      when(c % lit(n) < 0, lit(1L)).otherwise(lit(0L))).cast("long")
  }

  /** Epoch nanoseconds -> epoch seconds, exactly. */
  def tsSecs(tsNanos: Column): Column = fdiv(tsNanos, 1000000000L)

  def hourBucket(tsSecs: Column): Column = fdiv(tsSecs, 3600L)

  /** 1 row -> 4 rows of (g, bucket): ("h", hour), ("d", hour/24),
    * ("w", day/7), ("m", day/28). Built-in `explode` covers the
    * generator/UDTF shape — no custom Generator needed.
    */
  def granularities(hourBucket: Column): Column = {
    val day = fdiv(hourBucket, 24L)
    explode(array(
      struct(lit("h").as("g"), hourBucket.cast("long").as("bucket")),
      struct(lit("d").as("g"), day.as("bucket")),
      struct(lit("w").as("g"), fdiv(day, 7L).as("bucket")),
      struct(lit("m").as("g"), fdiv(day, 28L).as("bucket"))))
  }

  /** DuckDB expression equivalents, parameterized by an hour-bucket SQL
    * fragment, for oracle queries.
    */
  def granularitiesSql(hb: String): String =
    s"""SELECT 'h' AS g, $hb AS bucket UNION ALL
       |SELECT 'd', ($hb) // 24 UNION ALL
       |SELECT 'w', (($hb) // 24) // 7 UNION ALL
       |SELECT 'm', (($hb) // 24) // 28""".stripMargin
}
