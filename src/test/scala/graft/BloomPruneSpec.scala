package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.execution.{FilterExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}

import graft.operators.Relational

/** Bloom-prune join: result identity with the plain join (no false
  * negatives + exact join), prune-before-exchange plan shape, and the
  * empty-build degenerate case.
  */
class BloomPruneSpec extends SparkSpec {

  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val children = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec => Seq(s.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    p +: children.flatMap(nodes)
  }

  private def lineitem = Tables.lineitem(spark, sf0001)
    .select("l_orderkey", "l_returnflag", "l_extendedprice")
  private def urgent = Tables.orders(spark, sf0001)
    .where(col("o_orderpriority") === "1-URGENT").select("o_orderkey")

  test("bloomPruneJoin returns exactly the plain join's rows") {
    val pruned = Relational.bloomPruneJoin(lineitem, "l_orderkey", urgent, "o_orderkey")
    val plain = lineitem.join(urgent, col("l_orderkey") === col("o_orderkey"))
    assert(pruned.count() === plain.count())
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
    assert(pruned.count() > 0, "fixture must exercise a non-empty join")
  }

  test("bloom probe filter sits below the big side's shuffle exchange") {
    val pruned = Relational.bloomPruneJoin(lineitem, "l_orderkey", urgent, "o_orderkey")
    pruned.count() // materialize so AQE finalizes the plan
    val all = nodes(pruned.queryExecution.executedPlan)
    val bloomFilters = all.collect {
      case f: FilterExec if f.condition.exists(_.isInstanceOf[BloomFilterMightContain]) => f
    }
    assert(bloomFilters.nonEmpty, "expected a might_contain filter in the plan")
    // The filter's own subtree must reach the parquet scan without any
    // shuffle in between: pruning happens in the scan stage.
    val subtree = bloomFilters.flatMap(nodes)
    assert(!subtree.exists(_.isInstanceOf[ShuffleExchangeLike]),
      "bloom probe must run before the exchange, not after")
    assert(subtree.exists(_.nodeName.toLowerCase.contains("scan")),
      "bloom probe must sit directly on the scan stage")
  }

  test("empty build side yields the empty join, not an error") {
    val none = Tables.orders(spark, sf0001)
      .where(col("o_orderpriority") === "NO-SUCH-PRIORITY").select("o_orderkey")
    val pruned = Relational.bloomPruneJoin(lineitem, "l_orderkey", none, "o_orderkey")
    assert(pruned.count() === 0)
  }

  test("bloomRewriteLeftOuter returns exactly the plain left-outer rewrite") {
    val ev = Tables.eventsRaw(spark, sf0001).select("event_id", "user_id")
    // sf0.001 user ids span only 0..14, so use a map rule that is live at
    // this scale: every third id rewrites to id+1000, the rest are absent
    val idmap = ev
      .select(col("user_id").as("node"), (col("user_id") + 1000L).as("canonical"))
      .where(col("node") % 3 === 0)
      .distinct()
    val split = Relational
      .bloomRewriteLeftOuter(ev, "user_id", idmap, "node", "canonical", "person")
      .select("event_id", "person")
    val plain = ev.join(idmap, col("user_id") === col("node"), "left_outer")
      .select(col("event_id"), coalesce(col("canonical"), col("user_id")).as("person"))
    assert(split.count() === plain.count())
    assert(split.exceptAll(plain).isEmpty && plain.exceptAll(split).isEmpty)
    // both branches must be live: some ids rewritten, most identity
    val rewritten = split.join(
      ev.select(col("event_id"), col("user_id")), "event_id")
      .where(col("person") =!= col("user_id")).count()
    assert(rewritten > 0 && rewritten < split.count())
  }

  test("rewrite split's identity branch reaches its scan with no exchange") {
    val ev = Tables.eventsRaw(spark, sf0001).select("event_id", "user_id")
    val idmap = ev
      .select(col("user_id").as("node"), (col("user_id") + 1000L).as("canonical"))
      .where(col("node") % 3 === 0)
      .distinct()
    val split = Relational
      .bloomRewriteLeftOuter(ev, "user_id", idmap, "node", "canonical", "person")
    split.count()
    val all = nodes(split.queryExecution.executedPlan)
    val unions = all.filter(_.nodeName.toLowerCase.contains("union"))
    assert(unions.nonEmpty, "expected a union of the two branches")
    // at least one union input (the definite-non-member branch) must be a
    // pure scan pipeline: bloom filter + project, zero exchanges
    val shuffleFree = unions.head.children.exists { c =>
      val sub = nodes(c)
      !sub.exists(_.isInstanceOf[ShuffleExchangeLike]) &&
        sub.exists(_.nodeName.toLowerCase.contains("scan"))
    }
    assert(shuffleFree, "identity branch must not shuffle")
  }

  test("bloomRewriteLeftOuter with an empty map is the identity mapping") {
    val ev = Tables.eventsRaw(spark, sf0001).select("event_id", "user_id")
    val empty = ev.select(col("user_id").as("node"),
      col("user_id").as("canonical")).where(lit(false))
    val got = Relational
      .bloomRewriteLeftOuter(ev, "user_id", empty, "node", "canonical", "person")
    assert(got.where(col("person") =!= col("user_id")).count() === 0)
    assert(got.count() === ev.count())
  }

  test("declared query matches the unpruned recompute") {
    val q = SparkEntry.queries("join_bloom_prune")(spark, sf0001)
    val recompute = lineitem
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"), round(sum("l_extendedprice"), 2).as("revenue"))
      .orderBy("l_returnflag")
    assert(q.collect().toSeq === recompute.collect().toSeq)
  }
}
