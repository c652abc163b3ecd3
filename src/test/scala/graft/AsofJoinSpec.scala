package graft

import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof >= semantics: equal ts matches, latest-prior wins, no-prior is null") {
    val purchases = Seq(
      (1L, 100L, 10L), // equal-ts click exists
      (1L, 95L, 11L),  // between clicks: latest prior is ts=90
      (2L, 50L, 12L)   // user's clicks all later -> null
    ).toDF("user_id", "ts", "purchase_id")
    val clicks = Seq(
      (1L, 90L, 20L), (1L, 100L, 21L), (1L, 101L, 22L),
      (2L, 60L, 23L)
    ).toDF("user_id", "ts", "click_id")
    val got = AsofJoin.asofJoin(purchases, clicks, "user_id", "ts", "click_id")
      .collect().map(r => r.getAs[Long]("purchase_id") ->
        Option(r.getAs[java.lang.Long]("click_id")).map(_.toLong)).toMap
    assert(got == Map(
      10L -> Some(21L), // ts=100 click matches at equal ts
      11L -> Some(20L), // latest prior (90), not later ones
      12L -> None))     // no prior click
  }

  test("forward asof <= semantics: equal ts matches, earliest-next wins, no-next is null") {
    val views = Seq(
      (1L, 100L, 10L), // equal-ts click exists
      (1L, 95L, 11L),  // between clicks: earliest next is ts=100
      (2L, 70L, 12L)   // user's clicks all earlier -> null
    ).toDF("user_id", "ts", "view_id")
    val clicks = Seq(
      (1L, 90L, 20L), (1L, 100L, 21L), (1L, 101L, 22L),
      (2L, 60L, 23L)
    ).toDF("user_id", "ts", "click_id")
    val got = AsofJoin.asofJoinForward(views, clicks, "user_id", "ts", "click_id")
      .collect().map(r => r.getAs[Long]("view_id") ->
        Option(r.getAs[java.lang.Long]("click_id")).map(_.toLong)).toMap
    assert(got == Map(
      10L -> Some(21L), // ts=100 click matches at equal ts
      11L -> Some(21L), // earliest next (100), not later ones
      12L -> None))     // no later click
  }

  test("tolerance asof: boundary kept, one-past dropped, infinite = plain asof") {
    val purchases = Seq(
      (1L, 100L, 10L), // gap to latest click (90) = 10 -> kept at tol 10
      (1L, 101L, 11L), // gap 11 -> dropped at tol 10
      (2L, 50L, 12L)   // no prior click at all
    ).toDF("user_id", "ts", "purchase_id")
    val clicks = Seq((1L, 90L, 20L), (2L, 60L, 21L)).toDF("user_id", "ts", "click_id")
    def run(tol: Long) =
      AsofJoin.asofJoinTolerance(purchases, clicks, "user_id", "ts", "click_id", tol)
        .collect().map(r => r.getAs[Long]("purchase_id") ->
          Option(r.getAs[java.lang.Long]("click_id")).map(_.toLong)).toMap
    assert(run(10L) == Map(10L -> Some(20L), 11L -> None, 12L -> None))
    // huge tolerance degenerates to the unbounded asof
    val unbounded = AsofJoin.asofJoin(purchases, clicks, "user_id", "ts", "click_id")
      .collect().map(r => r.getAs[Long]("purchase_id") ->
        Option(r.getAs[java.lang.Long]("click_id")).map(_.toLong)).toMap
    assert(run(Long.MaxValue) == unbounded)
  }

  test("nearest asof: closer side wins, exact tie goes backward, one-sided falls through") {
    val purchases = Seq(
      (1L, 100L, 10L), // prior at 90 (d=10), next at 105 (d=5) -> next
      (1L, 94L, 11L),  // prior at 90 (d=4), next at 105 (d=11) -> prior
      (1L, 50L, 12L),  // no prior -> next (90)
      (2L, 70L, 13L),  // no next -> prior (60)
      (3L, 80L, 14L),  // equidistant: prior 75 (d=5), next 85 (d=5) -> prior
      (4L, 10L, 15L)   // no clicks for the user at all
    ).toDF("user_id", "ts", "purchase_id")
    val clicks = Seq(
      (1L, 90L, 20L), (1L, 105L, 21L),
      (2L, 60L, 22L),
      (3L, 75L, 23L), (3L, 85L, 24L)
    ).toDF("user_id", "ts", "click_id")
    val got = AsofJoin.asofJoinNearest(purchases, clicks, "user_id", "ts", "click_id")
      .collect().map(r => r.getAs[Long]("purchase_id") ->
        Option(r.getAs[java.lang.Long]("click_id")).map(_.toLong)).toMap
    assert(got == Map(
      10L -> Some(21L), 11L -> Some(20L), 12L -> Some(20L),
      13L -> Some(22L), 14L -> Some(23L), 15L -> None))
  }

  test("nearest asof: both direction frames share one key shuffle") {
    val ev = Tables.eventsRaw(spark, sf0001)
    import org.apache.spark.sql.functions._
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val c = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val df = AsofJoin.asofJoinNearest(p, c, "user_id", "ts", "click_id")
    df.collect()
    // walk through AQE wrappers — toString would print the exchange twice
    // (Final Plan + Initial Plan)
    def nodes(n: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      val children = n match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case other => other.children
      }
      n +: children.flatMap(nodes)
    }
    val exchanges = nodes(df.queryExecution.executedPlan).count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
    assert(exchanges <= 1,
      s"backward and forward windows must reuse the same key partitioning, got $exchanges exchanges:\n${df.queryExecution.executedPlan}")
    val windows = nodes(df.queryExecution.executedPlan).count(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec])
    assert(windows == 1,
      s"both direction frames must evaluate in ONE window node, got $windows")
  }

  test("asof join is deterministic under repartitioning") {
    val ev = Tables.eventsRaw(spark, sf0001)
    import org.apache.spark.sql.functions._
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val c = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val a = AsofJoin.asofJoin(p, c, "user_id", "ts", "click_id").orderBy("purchase_id").collect()
    val b = AsofJoin.asofJoin(p.repartition(7), c.repartition(3), "user_id", "ts", "click_id")
      .orderBy("purchase_id").collect()
    assert(a.sameElements(b))
  }
}
