package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef.withOracle
import graft.functions.TimeFunctions._
import graft.functions.UrlFunctions._
import org.apache.spark.sql.functions._

/** The reference's batch-layer pageview pipeline re-expressed Spark-first
  * (SURVEY.md §2.1-§2.3, §2.5), declared over the `events` pageview proxy
  * (see Tables.events). Each query is deterministic (total ORDER BY) and
  * paired with a DuckDB oracle.
  */
object BatchViews {

  private val ts = Tables.sql.tsSecs
  private val hb = s"($ts) // 3600"

  val defs: Seq[QueryDef] = Seq(

    // PailTap full scan (BatchWorkflow.java:131-143) -> parquet scan.
    // Timestamp projected as epoch seconds so both engines hash identically.
    withOracle(
      "scan_parquet",
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        |       l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
        |       CAST(epoch(l_shipdate) AS BIGINT) AS ship_secs
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax"), col("l_returnflag"),
          col("l_linestatus"),
          // parquet ms timestamps read as TIMESTAMP_NTZ; NTZ->LTZ is the
          // identity under the UTC session TZ, then LTZ->long epoch secs.
          col("l_shipdate").cast("timestamp_ltz").cast("long").as("ship_secs"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // attributeTap vertical pruning (BatchWorkflow.java:114-129) -> filter
    // that Catalyst pushes into the scan (PushedFilters in explain).
    withOracle(
      "scan_pruned",
      """SELECT event_id, user_id, round(value, 2) AS value
        |FROM events WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.eventsRaw(s, dir)
        .where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), round(col("value"), 2).as("value"))
        .orderBy("event_id")
    },

    // ExtractPageViewFields (BatchWorkflow.java:245-260): Data -> (person, url, ts).
    withOracle(
      "project_fields",
      s"""SELECT event_id, user_id AS person, ${Tables.sql.url} AS url, $ts AS ts_secs
         |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id").as("person"), col("url"), col("ts_secs"))
        .orderBy("event_id")
    },

    // Predicate filter (BatchWorkflow.java:251-252 / UniquesOverTime.java:128-129).
    withOracle(
      "filter_where",
      """SELECT event_id, user_id, event_type, round(value, 2) AS value
        |FROM events WHERE value > 250 AND event_type <> 'error'
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.eventsRaw(s, dir)
        .where(col("value") > 250 && col("event_type") =!= "error")
        .select(col("event_id"), col("user_id"), col("event_type"),
          round(col("value"), 2).as("value"))
        .orderBy("event_id")
    },

    // NormalizeURL (BatchWorkflow.java:183-210): protocol://host/path, no
    // port/query/fragment. Oracle constructs the expected form directly
    // from the known synthetic URL structure.
    withOracle(
      "normalize_url",
      s"""SELECT event_id, ${Tables.sql.normUrl} AS norm_url
         |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"), normalizeUrl(col("url")).as("norm_url"))
        .orderBy("event_id")
    },

    // ExtractDomain (BatchWorkflow.java:495-505): URL -> authority (host[:port]).
    withOracle(
      "extract_domain",
      s"""SELECT event_id, ${Tables.sql.domain} AS domain
         |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"), extractDomain(col("url")).as("domain"))
        .orderBy("event_id")
    },

    // ToHourBucket (BatchWorkflow.java:235-243): integer division, not
    // calendar truncation.
    withOracle(
      "hour_bucket",
      s"SELECT event_id, $hb AS hb FROM events ORDER BY event_id") { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"), hourBucket(col("ts_secs")).as("hb"))
        .orderBy("event_id")
    },

    // EmitGranularities (BatchWorkflow.java:262-275): 1 row -> 4 rows of
    // (g, bucket) with fixed 7-day weeks / 28-day months.
    withOracle(
      "explode_granularities",
      s"""WITH hours AS (SELECT event_id, $hb AS hbv FROM events)
         |SELECT event_id, g, bucket FROM (
         |  SELECT event_id, 'h' AS g, hbv AS bucket FROM hours UNION ALL
         |  SELECT event_id, 'd', hbv // 24 FROM hours UNION ALL
         |  SELECT event_id, 'w', (hbv // 24) // 7 FROM hours UNION ALL
         |  SELECT event_id, 'm', (hbv // 24) // 28 FROM hours)
         |ORDER BY event_id, g""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          granularities(hourBucket(col("ts_secs"))).as("gb"))
        .select(col("event_id"), col("gb.g").as("g"), col("gb.bucket").as("bucket"))
        .orderBy("event_id", "g")
    },

    // jcascalog.op.Count hourly rollup (BatchWorkflow.java:287-294):
    // COUNT(*) per (url, hour). Partial+final hash agg is Catalyst built-in.
    withOracle(
      "agg_count",
      s"""SELECT event_type AS url, $hb AS hbv, count(*) AS pageviews
         |FROM events GROUP BY 1, 2 ORDER BY url, hbv""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type").as("url"), hourBucket(col("ts_secs")).as("hbv"))
        .agg(count(lit(1)).as("pageviews"))
        .orderBy("url", "hbv")
    },

    // jcascalog.op.Sum (BatchWorkflow.java:296-302,552-558). Rounded to the
    // data's own 2dp grid so fp summation order cannot flip the hash.
    withOracle(
      "agg_sum",
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables.eventsRaw(s, dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
        .orderBy("event_type")
    },

    // The flagship two-stage rollup (BatchWorkflow.java:284-302): hourly
    // counts reused to build day/week/month counts — partial-agg reuse as
    // an explicit plan, not a re-scan per granularity.
    withOracle(
      "agg_rollup_granularity",
      s"""WITH hourly AS (
         |  SELECT event_type AS url, $hb AS hbv, count(*) AS pv
         |  FROM events GROUP BY 1, 2),
         |ex AS (
         |  SELECT url, 'h' AS g, hbv AS bucket, pv FROM hourly UNION ALL
         |  SELECT url, 'd', hbv // 24, pv FROM hourly UNION ALL
         |  SELECT url, 'w', (hbv // 24) // 7, pv FROM hourly UNION ALL
         |  SELECT url, 'm', (hbv // 24) // 28, pv FROM hourly)
         |SELECT url, g, bucket, CAST(sum(pv) AS BIGINT) AS pageviews
         |FROM ex GROUP BY url, g, bucket ORDER BY url, g, bucket""".stripMargin) { (s, dir) =>
      pageviewsOverTime(s, dir)
    },

    // Option.DISTINCT set-dedup (BatchWorkflow.java:223-233).
    withOracle(
      "distinct_dedup",
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin) { (s, dir) =>
      Tables.eventsRaw(s, dir)
        .select("user_id", "event_type").distinct()
        .orderBy("user_id", "event_type")
    },

    // Option.SORT secondary sort (BatchWorkflow.java:548): order within each
    // group without a global sort; first 3 events per user.
    withOracle(
      "sort_within_group",
      """SELECT user_id, rn, event_id FROM (
        |  SELECT user_id, event_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events)
        |WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      Tables.eventsRaw(s, dir)
        .withColumn("rn",
          row_number().over(
            Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
        .where(col("rn") <= 3)
        .select("user_id", "rn", "event_id")
        .orderBy("user_id", "rn")
    },

    // Api.selectFields (BatchWorkflow.java:636-637): project + reorder.
    withOracle(
      "select_fields",
      "SELECT n_name, n_nationkey FROM nation ORDER BY n_name") { (s, dir) =>
      Tables.nation(s, dir).select("n_name", "n_nationkey").orderBy("n_name")
    },

    // Multi-sink fan-out (BatchWorkflow.java:643-649): one cached flow,
    // two outputs — modeled as a tagged union of the two branches.
    withOracle(
      "union_outputs",
      """SELECT tag, event_id FROM (
        |  SELECT 'high' AS tag, event_id FROM events WHERE value >= 400
        |  UNION ALL
        |  SELECT 'low' AS tag, event_id FROM events WHERE value < 10)
        |ORDER BY tag, event_id""".stripMargin) { (s, dir) =>
      // no cache: two pruned columnar scans beat pinning the fact table in
      // memory (at scale, caching the events table is never an option)
      val ev = Tables.eventsRaw(s, dir).select("event_id", "value")
      val high = ev.where(col("value") >= 400).select(lit("high").as("tag"), col("event_id"))
      val low = ev.where(col("value") < 10).select(lit("low").as("tag"), col("event_id"))
      high.unionAll(low).orderBy("tag", "event_id")
    },

    // orderBy+limit top-k (not in reference; Catalyst TakeOrderedAndProject).
    withOracle(
      "topk_orders",
      """SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
    },

    // Trident CombinedCombinerAggregator (TridentSpeedLayer.java:249-287):
    // tuple-of-aggregates in one pass — native multi-expression agg.
    withOracle(
      "stream_combined_agg",
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total,
        |       round(min(value), 2) AS vmin, round(max(value), 2) AS vmax,
        |       count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables.eventsRaw(s, dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"),
          round(min("value"), 2).as("vmin"), round(max("value"), 2).as("vmax"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("event_type")
    }
  )

  /** The flagship pageviews-over-time view, shared with SparkEntry.entry. */
  def pageviewsOverTime(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val hourly = Tables.events(s, dir)
      .groupBy(col("event_type").as("url"), hourBucket(col("ts_secs")).as("hbv"))
      .agg(count(lit(1)).as("pv"))
    hourly
      .select(col("url"), granularities(col("hbv")).as("gb"), col("pv"))
      .select(col("url"), col("gb.g").as("g"), col("gb.bucket").as("bucket"), col("pv"))
      .groupBy("url", "g", "bucket")
      .agg(sum("pv").as("pageviews"))
      .orderBy("url", "g", "bucket")
  }
}
