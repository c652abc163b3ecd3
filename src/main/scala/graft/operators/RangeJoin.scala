package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef.withOracle
import graft.functions.TimeFunctions.fdiv
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Banded range (interval) join — like the as-of join, an operator the
  * reference lacks, composed from existing ops (SURVEY.md §7.3 preference
  * order): probe rows explode to the fixed-width time buckets their
  * window spans, build rows band to their own bucket, and the equi-join
  * on (key, bucket) carries the range predicate as a post-filter.
  *
  * Scale: a naive theta-join `l.ts BETWEEN r.ts - w AND r.ts` executes as
  * a broadcast nested loop (or cartesian) — O(n·m) and a 100 TB killer.
  * Banding makes it an equi-shuffle whose per-key fan-out is bounded by
  * the bucket population: each probe touches ceil(w/bucket)+1 buckets,
  * each (probe, build) match joins at exactly the build row's bucket (no
  * dedup needed). Bucket width = the window, so probes explode 2×.
  */
object RangeJoin {

  val WindowSecs = 3600L

  /** Pairs (left row, right row) with equal `key` and
    * rightTs in [leftTs - windowSecs, leftTs].
    */
  def bandedRangeJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, windowSecs: Long): DataFrame = {
    val probes = left.withColumn("__bucket",
      explode(array(fdiv(col(leftTs) - windowSecs, windowSecs),
        fdiv(col(leftTs), windowSecs))))
    val build = right.withColumn("__bucket", fdiv(col(rightTs), windowSecs))
    probes.join(build, Seq(key, "__bucket"))
      .where(col(rightTs) >= col(leftTs) - windowSecs &&
        col(rightTs) <= col(leftTs))
      .drop("__bucket")
  }

  private val ts = Tables.sql.tsSecs

  val defs: Seq[QueryDef] = Seq(

    // Attribution-window shape: every click by the same user within the
    // hour before each purchase (the as-of join keeps only the latest;
    // the range join keeps the full window).
    withOracle(
      "join_range",
      s"""SELECT p.event_id AS purchase_id, c.event_id AS click_id
         |FROM (SELECT event_id, user_id, $ts AS ts_secs FROM events
         |      WHERE event_type = 'purchase') p
         |JOIN (SELECT event_id, user_id, $ts AS ts_secs FROM events
         |      WHERE event_type = 'click') c
         |  ON p.user_id = c.user_id
         | AND c.ts_secs BETWEEN p.ts_secs - ${WindowSecs} AND p.ts_secs
         |ORDER BY purchase_id, click_id""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts_secs").as("pts"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts_secs").as("cts"))
      bandedRangeJoin(purchases, clicks, "user_id", "pts", "cts", WindowSecs)
        .select(col("purchase_id"), col("click_id"))
        .orderBy("purchase_id", "click_id")
    },

    // Multi-touch attribution over the same window pairs: every click in
    // the hour before a purchase gets a LINEAR credit (1/n) and a
    // TIME-DECAY credit (1/(1+age) normalized per purchase — rational in
    // the age, so both engines evaluate identical doubles before the
    // round; no exp() 1-ulp exposure). The per-purchase totals ride two
    // windows over the PAIR relation sharing one partitioning, and per-
    // key volume is bounded by the clicks-in-window population the
    // banded join already bounds — never user-history-sized.
    withOracle(
      "attribution_multitouch",
      s"""WITH p AS (SELECT event_id AS purchase_id, user_id, $ts AS pts
         |           FROM events WHERE event_type = 'purchase'),
         |c AS (SELECT event_id AS click_id, user_id, $ts AS cts
         |      FROM events WHERE event_type = 'click'),
         |pairs AS (
         |  SELECT purchase_id, click_id, pts, cts,
         |         CAST(1 AS DOUBLE) / (1 + pts - cts) AS raw
         |  FROM p JOIN c ON p.user_id = c.user_id
         |   AND c.cts BETWEEN p.pts - ${WindowSecs} AND p.pts),
         |tot AS (
         |  SELECT purchase_id, click_id,
         |         count(*) OVER (PARTITION BY purchase_id) AS n_touches,
         |         raw, sum(raw) OVER (PARTITION BY purchase_id) AS t
         |  FROM pairs)
         |SELECT purchase_id, click_id, n_touches,
         |       round(CAST(1 AS DOUBLE) / n_touches, 4) AS linear_w,
         |       round(raw / t, 4) AS decay_w
         |FROM tot ORDER BY purchase_id, click_id""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts_secs").as("pts"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts_secs").as("cts"))
      val byPurchase = Window.partitionBy("purchase_id")
      bandedRangeJoin(purchases, clicks, "user_id", "pts", "cts", WindowSecs)
        .withColumn("raw", lit(1.0) / (lit(1L) + col("pts") - col("cts")))
        .withColumn("n_touches", count(lit(1)).over(byPurchase))
        .withColumn("t", sum("raw").over(byPurchase))
        .select(col("purchase_id"), col("click_id"), col("n_touches"),
          round(lit(1.0) / col("n_touches"), 4).as("linear_w"),
          round(col("raw") / col("t"), 4).as("decay_w"))
        .orderBy("purchase_id", "click_id")
    }
  )
}
