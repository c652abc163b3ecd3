package graft

import graft.functions.TopKAgg
import graft.functions.TopKAgg.{Buf, Entry}

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private val agg = TopKAgg.TopK(3)

  test("reduce keeps the buffer bounded at k and ordered (value desc, id asc)") {
    val rows = Seq((1L, 5.0), (2L, 9.0), (3L, 9.0), (4L, 1.0), (5L, 7.0), (6L, 9.0))
    val b = rows.foldLeft(agg.zero)(agg.reduce)
    assert(b.items == Seq(Entry(9.0, 2L), Entry(9.0, 3L), Entry(9.0, 6L)))
    assert(b.items.size <= 3)
  }

  test("merge is order-insensitive: any split of the input gives the same top-k") {
    val rows = (1L to 40L).map(i => (i, (i * 7 % 13).toDouble))
    val whole = rows.foldLeft(agg.zero)(agg.reduce)
    for (cut <- Seq(1, 13, 20, 39)) {
      val (a, b) = rows.splitAt(cut)
      val merged = agg.merge(a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      assert(merged == whole, s"split at $cut")
    }
    assert(agg.merge(whole, agg.zero) == whole)
  }

  test("agg_topk_heap equals the window form on the same table at any partitioning") {
    val heap = SparkEntry.queries("agg_topk_heap")(spark, sf0001).collect().toSeq
    val window = SparkEntry.queries("topk_per_group")(spark, sf0001).collect().toSeq
    assert(heap == window)
  }

  test("the typed aggregate combines map-side (partial agg before the exchange)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    val df = SparkEntry.queries("agg_topk_heap")(spark, sf0001)
    df.collect()
    // AQE-aware walk (plain collect stops at the wrapper nodes)
    def nodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec => Seq(s.plan)
      case other => other.children
    }).flatMap(nodes)
    // two ObjectHashAggregate nodes (partial + final) = the buffer is
    // merged before the shuffle; a single node would mean all rows of a
    // key cross the wire
    val aggs = nodes(df.queryExecution.executedPlan).collect {
      case a: ObjectHashAggregateExec => a
    }
    assert(aggs.size >= 2, s"expected partial+final typed aggregation:\n" +
      df.queryExecution.executedPlan)
  }
}
