package graft

import graft.functions.TimeFunctions.hourBucket
import org.apache.spark.sql.functions._

/** The serving_merge oracle (merged == full recompute) would pass
  * trivially if one view were empty; these tests pin that the cutoff
  * actually splits the data — both views contribute rows, and (at sf0.01,
  * where events are dense enough) the boundary hour itself is split
  * across the two views and must merge by summation.
  */
class ServingMergeSpec extends SparkSpec {

  private def cutoffOf(dir: String): Long = {
    val ev = Tables.events(spark, dir)
    val mm = ev.agg(min(col("ts_secs")), max(col("ts_secs"))).head()
    mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) * 4 / 5
  }

  test("both the batch view and the speed view contribute rows") {
    Seq(sf0001, sf001).foreach { dir =>
      val ev = Tables.events(spark, dir)
      val cutoff = cutoffOf(dir)
      assert(ev.where(col("ts_secs") < cutoff).limit(1).count() == 1, s"$dir batch side empty")
      assert(ev.where(col("ts_secs") >= cutoff).limit(1).count() == 1, s"$dir speed side empty")
    }
  }

  test("the cutoff hour is split across both views and merges by summation (sf0.01)") {
    val ev = Tables.events(spark, sf001)
    val cutoff = cutoffOf(sf001)
    val cutoffHour = Math.floorDiv(cutoff, 3600L)
    val inHour = ev.where(hourBucket(col("ts_secs")) === cutoffHour)
    val below = inHour.where(col("ts_secs") < cutoff).count()
    val above = inHour.where(col("ts_secs") >= cutoff).count()
    assert(below > 0 && above > 0, s"cutoff hour not split: below=$below above=$above")
    // the merged view reports exactly the sum for that hour's buckets
    val merged = SparkEntry.queries("serving_merge")(spark, sf001)
      .where(col("hbv") === cutoffHour)
      .agg(sum(col("pageviews"))).head().getLong(0)
    assert(merged == below + above)
  }

  test("a conf-provided cutoff replaces the derived one (no min/max scan) and still merges exactly") {
    val ev = Tables.events(spark, sf0001)
    // pick a different split point than the derived 4/5 one: the median-ish
    // 1/2 point, supplied the way a deployment would — from batch-run
    // metadata via conf
    val mm = ev.agg(min(col("ts_secs")), max(col("ts_secs"))).head()
    val confCutoff = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 2
    spark.conf.set("graft.serving.cutoffSecs", confCutoff.toString)
    try {
      val merged = SparkEntry.queries("serving_merge")(spark, sf0001)
        .agg(sum(col("pageviews"))).head().getLong(0)
      assert(merged == ev.count(), "merged view must equal the full recompute at any cutoff")
      // and the conf cutoff genuinely split the data (both views non-empty)
      assert(ev.where(col("ts_secs") < confCutoff).limit(1).count() == 1)
      assert(ev.where(col("ts_secs") >= confCutoff).limit(1).count() == 1)
    } finally spark.conf.unset("graft.serving.cutoffSecs")
  }
}
