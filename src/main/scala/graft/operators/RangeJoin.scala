package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef.withOracle
import graft.functions.TimeFunctions.fdiv
import org.apache.spark.sql.DataFrame
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
    }
  )
}
