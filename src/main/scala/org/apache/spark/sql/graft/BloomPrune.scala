package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType

/** Explicit bloom-filter pre-join pruning (SURVEY.md §4 shuffle-reduction
  * toolkit). Builds a bloom filter over the build side's join keys in one
  * distributed aggregation, then filters the probe side BEFORE its shuffle
  * exchange, so rows that cannot match never leave the scan stage. At
  * 100 TB this is the difference between shuffling the whole fact table
  * and shuffling only the (often single-digit-percent) matching slice.
  *
  * Spark's own InjectRuntimeFilter does this opportunistically, but only
  * when its heuristics fire (selective creation-side filter, size
  * thresholds, one filter per application side). This operator is the
  * deterministic, caller-controlled form for when the pipeline KNOWS the
  * build side is sparse in the probe side's key space — e.g. the
  * reference's id-rewrite join where only a minority of pageview user ids
  * appear in the equiv-graph canonical-id map (BatchWorkflow.java:607-619).
  *
  * Both build and probe keys are wrapped in XxHash64 — the same pairing
  * Spark's runtime-filter injection uses — so the aggregate's putLong and
  * the probe's mightContainLong see identical 64-bit values for any input
  * type. Correctness does not depend on the filter: bloom filters have no
  * false negatives, and the exact join removes false positives, so
  * prune+join ≡ join row-for-row (the DuckDB oracle runs the plain join).
  *
  * Lives under org.apache.spark.sql because BloomFilterAggregate /
  * ExpressionUtils are private[sql]; same placement as FloatVecDot.
  */
object BloomPrune {

  /** Aggregate the build side's keys into one serialized bloom filter.
    * Partial aggregation runs distributed (per-partition blooms merged by
    * OR), so the driver receives exactly one bounded-size byte array —
    * ~1.2 MB at 1 M expected items — never the key set itself. Returns
    * null on an empty build side; [[mightContain]] then evaluates to null
    * (filtered as false), which matches the empty inner-join result.
    */
  def buildBloom(build: DataFrame, key: Column, expectedItems: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(ExpressionUtils.expression(key))),
      math.max(expectedItems, 1L)).toAggregateExpression()
    build.select(ExpressionUtils.column(agg).as("bf"))
      .head().getAs[Array[Byte]]("bf")
  }

  /** Codegen probe predicate: `might_contain(bloom, xxhash64(key))`. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(ExpressionUtils.expression(key)))))
}
