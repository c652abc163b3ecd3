package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming cohort retention — the speed-layer form of the batch
  * `cohort_retention` view (same batch+speed pairing as StreamFunnel).
  *
  * Per-user state is the distinct set of active WEEKS. The cohort week
  * is min(weeks), and a LATE event can lower it — which remaps every
  * offset (offset = week − cohort) — so unlike the funnel there is no
  * monotone per-emission statistic: emissions supersede each other
  * rather than accumulate. Each update therefore carries a VERSION
  * counter, and the serving read keeps only each user's latest emission
  * (max version) before exploding offsets into the retention matrix.
  *
  * State is bounded by the user's active-week count (≤ weeks of product
  * lifetime — a few hundred longs), not by event volume; at 100 TB the
  * state store shards by user like every stateful query here.
  */
object StreamCohort {

  case class WeekEvent(user: Long, wk: Long)
  case class WeekState(wks: Seq[Long], version: Long)
  case class CohortProgress(user: Long, version: Long, cohortWk: Long, offsets: Seq[Long])

  def updateCohort(user: Long, rows: Iterator[WeekEvent],
      state: GroupState[WeekState]): CohortProgress = {
    val prev = state.getOption.getOrElse(WeekState(Seq.empty, 0L))
    val wks = (prev.wks ++ rows.map(_.wk)).distinct
    val st = WeekState(wks, prev.version + 1)
    state.update(st)
    val cohort = wks.min
    CohortProgress(user, st.version, cohort, wks.map(_ - cohort).sorted)
  }

  def progress(spark: SparkSession,
      events: Dataset[WeekEvent]): Dataset[CohortProgress] = {
    import spark.implicits._
    events
      .groupByKey(_.user)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(updateCohort)
  }
}
