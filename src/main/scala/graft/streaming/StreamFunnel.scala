package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming conversion funnel — the speed-layer form of the batch
  * `funnel_steps` view (the reference's pattern: every batch view gets an
  * incremental streaming counterpart, TridentSpeedLayer.java:64-105).
  *
  * Per-user state tracks the funnel exactly under ARBITRARY event arrival
  * order: the first-view time only ever decreases, but a decrease can
  * newly qualify earlier clicks (and transitively purchases), so the
  * sufficient statistic is (min view ts, all click ts, all purchase ts) —
  * not just the three stage times. From that state the stage times are
  * recomputed exactly per update, which makes the emitted per-user stage
  * MONOTONE non-decreasing across batches: adding events can only extend
  * or tighten the funnel, never break an established stage (a smaller t1
  * still qualifies every click that qualified under the larger t1). The
  * serving read therefore takes max(stage) per user and the final state
  * equals the batch recompute regardless of how the stream was batched.
  *
  * At 100 TB the click/purchase lists are bounded by the funnel
  * attribution horizon (events older than `horizonSecs` before the
  * watermark can be dropped once t1 is below them); the fixture keeps
  * everything — the lists are per-user event counts, and state lives in
  * the checkpointed store (RocksDB-backed under
  * `graft.stream.stateStore=rocksdb`, like every stateful query here).
  */
object StreamFunnel {

  /** step: 1 = view, 2 = click, 3 = purchase. */
  case class FunnelEvent(user: Long, step: Int, tsSecs: Long)

  /** minView = -1 when no view seen yet. */
  case class FunnelState(minView: Long, clicks: List[Long], purchases: List[Long])

  case class FunnelProgress(user: Long, stage: Int)

  /** Exact stage from the sufficient statistic: t1 = min view, t2 = min
    * click ≥ t1, t3 = min purchase ≥ t2 — the batch definition verbatim.
    */
  def stageOf(st: FunnelState): Int = {
    val t1 = if (st.minView >= 0) Some(st.minView) else None
    val t2 = t1.flatMap(t => st.clicks.filter(_ >= t).minOption)
    val t3 = t2.flatMap(t => st.purchases.filter(_ >= t).minOption)
    if (t3.isDefined) 3 else if (t2.isDefined) 2 else if (t1.isDefined) 1 else 0
  }

  def updateFunnel(user: Long, rows: Iterator[FunnelEvent],
      state: GroupState[FunnelState]): FunnelProgress = {
    var st = state.getOption.getOrElse(FunnelState(-1L, Nil, Nil))
    rows.foreach { e =>
      e.step match {
        case 1 => st = st.copy(minView =
          if (st.minView < 0) e.tsSecs else math.min(st.minView, e.tsSecs))
        case 2 => st = st.copy(clicks = e.tsSecs :: st.clicks)
        case _ => st = st.copy(purchases = e.tsSecs :: st.purchases)
      }
    }
    state.update(st)
    FunnelProgress(user, stageOf(st))
  }

  /** Wire the stateful funnel over a stream of funnel events; emits the
    * user's current stage each batch (update mode).
    */
  def progress(spark: SparkSession,
      events: Dataset[FunnelEvent]): Dataset[FunnelProgress] = {
    import spark.implicits._
    events
      .groupByKey(_.user)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(updateFunnel)
  }
}
