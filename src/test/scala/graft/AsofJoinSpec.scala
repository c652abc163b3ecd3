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
