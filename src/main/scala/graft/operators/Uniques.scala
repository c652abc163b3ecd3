package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef.{noOracle, withOracle}
import graft.functions.TimeFunctions._
import org.apache.spark.sql.functions._

/** Unique-visitors-over-time views (SURVEY.md §2.3 `approx_distinct_hll`,
  * `merge_hll`; reference ConstructHyperLogLog/MergeHyperLogLog buffers,
  * BatchWorkflow.java:428-493).
  *
  * Three tiers:
  *  - `uniques_over_time`: exact COUNT(DISTINCT) per (url, granularity,
  *    bucket) — the correctness oracle (exact distinct is not mergeable,
  *    so it groups from raw rows per granularity).
  *  - `approx_distinct_hll`: Datasketches HLL sketches per (url, hour)
  *    via `hll_sketch_agg` — the reference's ConstructHyperLogLog, with
  *    log2m=14 ≈ lgConfigK 14 for ~0.8% rsd parity.
  *  - `merge_hll`: hour-level sketch *bytes* merged up to coarser buckets
  *    with `hll_union_agg` — the reference's MergeHyperLogLog partial-agg
  *    reuse: at 100 TB the raw rows are scanned once, coarser granularities
  *    merge fixed-size sketches instead of re-scanning.
  *
  * Sketch estimates are deterministic for fixed input but not DuckDB-
  * comparable → no-oracle (rows-only driver check) + ScalaTest error-bound
  * specs against the exact counts.
  */
object Uniques {

  private val ts = Tables.sql.tsSecs
  private val hb = s"($ts) // 3600"

  val defs: Seq[QueryDef] = Seq(

    withOracle(
      "uniques_over_time",
      s"""WITH pv AS (
         |  SELECT event_type AS url, user_id, $hb AS hbv FROM events),
         |ex AS (
         |  SELECT url, user_id, 'h' AS g, hbv AS bucket FROM pv UNION ALL
         |  SELECT url, user_id, 'd', hbv // 24 FROM pv UNION ALL
         |  SELECT url, user_id, 'w', (hbv // 24) // 7 FROM pv UNION ALL
         |  SELECT url, user_id, 'm', (hbv // 24) // 28 FROM pv)
         |SELECT url, g, bucket, count(DISTINCT user_id) AS uniques
         |FROM ex GROUP BY url, g, bucket ORDER BY url, g, bucket""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type").as("url"), col("user_id"),
          granularities(hourBucket(col("ts_secs"))).as("gb"))
        .select(col("url"), col("gb.g").as("g"), col("gb.bucket").as("bucket"), col("user_id"))
        .groupBy("url", "g", "bucket")
        .agg(countDistinct(col("user_id")).as("uniques"))
        .orderBy("url", "g", "bucket")
    },

    // ConstructHyperLogLog (BatchWorkflow.java:428-443): per (url, hour)
    // HLL sketch of users; reported as the sketch estimate.
    noOracle("approx_distinct_hll") { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type").as("url"), hourBucket(col("ts_secs")).as("hbv"))
        .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(14))).as("approx_uniques"))
        .orderBy("url", "hbv")
    },

    // MergeHyperLogLog (BatchWorkflow.java:445-469): hour sketches merged
    // into day/week/month sketches — union of sketch bytes, no re-scan.
    noOracle("merge_hll") { (s, dir) =>
      val hourSketches = Tables.events(s, dir)
        .groupBy(col("event_type").as("url"), hourBucket(col("ts_secs")).as("hbv"))
        .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sketch"))
      hourSketches
        .select(col("url"), granularities(col("hbv")).as("gb"), col("sketch"))
        .select(col("url"), col("gb.g").as("g"), col("gb.bucket").as("bucket"), col("sketch"))
        .groupBy("url", "g", "bucket")
        .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false))).as("approx_uniques"))
        .orderBy("url", "g", "bucket")
    },

    // Audience overlap between event-type segments via Theta sketches —
    // the set-ALGEBRA tier HLL cannot provide: HLL sketches only union,
    // but "how many unique users did segments A and B share" needs an
    // intersection (and A−B a difference) over the already-aggregated
    // sketches. The Theta sketch (Dasgupta et al., KMV family) supports
    // all three closed over sketch bytes, so segment-overlap matrices
    // come from one corpus scan + segment²-sized sketch algebra.
    //
    // Scale: one map-combinable sketch agg per segment (the shuffle
    // carries KB-sized sketches, not users), then a segments×segments
    // pair join over a segments-sized relation — corpus bytes are read
    // once, the quadratic part touches kilobytes. Estimates are exact
    // below the sketch's nominal-entries capacity (the KMV sample is
    // lossless until 4096 hashes at the default lgK=12); error bounds at
    // scale are spec'd in ApproxOpsSpec against the exact self-join.
    noOracle("theta_segment_overlap") { (s, dir) =>
      val sk = Tables.eventsRaw(s, dir)
        .groupBy(col("event_type").as("seg"))
        .agg(theta_sketch_agg(col("user_id")).as("sk"))
      val a = sk.select(col("seg").as("seg_a"), col("sk").as("ska"))
      val b = sk.select(col("seg").as("seg_b"), col("sk").as("skb"))
      a.join(b, col("seg_a") < col("seg_b"))
        .select(col("seg_a"), col("seg_b"),
          round(theta_sketch_estimate(col("ska"))).cast("long").as("uniques_a"),
          round(theta_sketch_estimate(col("skb"))).cast("long").as("uniques_b"),
          round(theta_sketch_estimate(theta_union(col("ska"), col("skb"))))
            .cast("long").as("uniques_union"),
          round(theta_sketch_estimate(theta_intersection(col("ska"), col("skb"))))
            .cast("long").as("uniques_both"))
        .orderBy("seg_a", "seg_b")
    }
  )
}
