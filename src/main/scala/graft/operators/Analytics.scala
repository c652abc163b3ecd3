package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef.withOracle
import graft.functions.TimeFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General analytics operators beyond the reference's surface (SURVEY.md
  * §2.5 notes these are "available for free via Catalyst"; declared here
  * so the capability is oracle-proven, not just claimed): ROLLUP subtotal
  * hierarchies, interpolated percentiles, pivot-style conditional
  * aggregation, running window aggregates, and set operations.
  */
object Analytics {

  /** keys × active-hours counts — the shared "hourly" relation of
    * timeseries_gapfill and timeseries_correlate. Bucketing goes through
    * TimeFunctions.hourBucket (exact long floor-div), the same
    * implementation every other operator uses — no second bucketing
    * variant to drift.
    */
  private def hourlyCounts(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type").as("key"),
        TimeFunctions.hourBucket(col("ts_secs")).as("hb"))
      .agg(count(lit(1)).as("pv"))

  val defs: Seq[QueryDef] = Seq(

    // Time-series gap filling: densify each key's hourly pageview series
    // over its own [min, max] hour span, zero-filling silent hours (the
    // serving semantics of a count series) and carrying the last observed
    // count forward beside it (the sensor/LOCF semantics). The grid is
    // born from a per-key 2-scalar aggregate + a row-local sequence
    // explode — never a keys × global-hours cross join, so a key active
    // for a day doesn't pay for the corpus' full history. Hours-per-key
    // bounds the fanout; the join and the LOCF window share the key
    // hash. This is the missing-bucket half of explode_granularities'
    // contract (a bucket with no events must exist to serve a zero).
    withOracle(
      "timeseries_gapfill", {
        val ts = Tables.sql.tsSecs
        s"""WITH hourly AS (
           |  SELECT event_type AS key, ($ts) // 3600 AS hb, count(*) AS pv
           |  FROM events GROUP BY 1, 2),
           |span AS (SELECT key, min(hb) AS mnh, max(hb) AS mxh FROM hourly GROUP BY 1),
           |grid AS (SELECT key, unnest(range(mnh, mxh + 1)) AS hb FROM span)
           |SELECT g.key, g.hb, coalesce(h.pv, 0) AS pv,
           |       last_value(h.pv IGNORE NULLS) OVER (
           |         PARTITION BY g.key ORDER BY g.hb ROWS UNBOUNDED PRECEDING) AS pv_locf
           |FROM grid g LEFT JOIN hourly h ON g.key = h.key AND g.hb = h.hb
           |ORDER BY g.key, g.hb""".stripMargin
      }) { (s, dir) =>
      // hourly is keys x active-hours — tiny next to the corpus. It
      // feeds BOTH the span aggregate and the fill join; materializing
      // it once keeps the corpus scan single-pass (exchange reuse does
      // not bridge the two differently-shaped consumers).
      val hourly = hourlyCounts(s, dir).localCheckpoint()
      val grid = hourly.groupBy("key")
        .agg(min("hb").as("mnh"), max("hb").as("mxh"))
        .select(col("key"), explode(sequence(col("mnh"), col("mxh"))).as("hb"))
      val w = Window.partitionBy("key").orderBy("hb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("key", "hb"), "left_outer")
        .select(col("key"), col("hb"),
          coalesce(col("pv"), lit(0L)).as("pv"),
          last(col("pv"), ignoreNulls = true).over(w).as("pv_locf"))
        .orderBy("key", "hb")
    },

    // ROLLUP subtotal hierarchy (the general form of the reference's
    // explicit granularity rollup). Subtotal rows carry NULL group keys;
    // coalesce to a sentinel so both engines sort/hash identically.
    withOracle(
      "agg_rollup_sets",
      """SELECT coalesce(l_returnflag, '*') AS rf, coalesce(l_linestatus, '*') AS ls,
        |       count(*) AS n, round(sum(l_extendedprice), 2) AS total
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("total"))
        .select(coalesce(col("l_returnflag"), lit("*")).as("rf"),
          coalesce(col("l_linestatus"), lit("*")).as("ls"), col("n"), col("total"))
        .orderBy("rf", "ls")
    },

    // Misra-Gries heavy hitters (FreqSketch): frequency estimation with
    // at most k counters of state, where the exact top-k keeps one
    // counter per DISTINCT key. Fixture keys (5 event types) sit below
    // k=8, where the sketch provably never decrements — counts are exact
    // and deterministic, so this DECLARES with a full oracle; the
    // k < cardinality regime (bounds, merge behavior) is FreqSketchSpec's
    // job. Scale: the Aggregator combines map-side (ObjectHashAggregate
    // partial+final) — each task ships ≤ k counters, adversarial key
    // cardinality can't grow state or shuffle.
    withOracle(
      "approx_heavy_hitters",
      """SELECT event_type AS key, count(*) AS est
        |FROM events GROUP BY 1 ORDER BY est DESC, key""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.eventsRaw(s, dir)
        .select(col("event_type")).as[String]
        .groupByKey(_ => 0)
        .agg(graft.functions.FreqSketch.MisraGries(8).toColumn.name("sk"))
        .select(explode(col("sk.items")).as("e"))
        .select(col("e.key").as("key"), col("e.count").as("est"))
        .orderBy(col("est").desc, col("key"))
    },

    // Count-Min point-frequency estimates (FreqSketch.CountMin): the
    // sketch answers "how frequent is THIS key" for ANY key under fixed
    // d·w state whatever the cardinality — the complement of
    // Misra-Gries' "which keys are heavy". One pass builds the grid
    // (map-side partial merge = pointwise add, exactly lossless); the
    // readout cross-joins the one-row sketch against the probe keys
    // (serving-side, key-cardinality-sized — the codegen'd estimate
    // expression never touches fact rows). At the fixture's 5 keys ≪ w=1024 the
    // estimates are collision-free and EXACT, so the oracle is the
    // exact GROUP BY; the over-estimate-only and eps·n bounds under
    // forced collisions are pinned in FreqSketchSpec.
    withOracle(
      "approx_count_min",
      """SELECT event_type AS key, count(*) AS est
        |FROM events GROUP BY 1 ORDER BY key""".stripMargin) { (s, dir) =>
      import s.implicits._
      val (w, d) = (1024, 3)
      val ev = Tables.eventsRaw(s, dir)
      val sk = ev.select(col("event_type")).as[String]
        .groupByKey(_ => 0)
        .agg(graft.functions.FreqSketch.CountMin(w, d).toColumn.name("sk"))
        .select(col("sk.counts").as("counts"))
      ev.select(col("event_type")).distinct()
        .crossJoin(sk)
        .select(col("event_type").as("key"),
          graft.functions.FreqSketch.CountMin
            .estimateColumn(col("counts"), col("event_type"), w, d).as("est"))
        .orderBy("key")
    },

    // CUBE: all 2^k grouping-set subtotals (the rollup's lattice
    // completion — rollup gives the hierarchy, cube every margin).
    // Same NULL-sentinel discipline as agg_rollup_sets.
    withOracle(
      "agg_cube",
      """SELECT coalesce(l_returnflag, '*') AS rf, coalesce(l_linestatus, '*') AS ls,
        |       count(*) AS n, round(sum(l_extendedprice), 2) AS total
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("total"))
        .select(coalesce(col("l_returnflag"), lit("*")).as("rf"),
          coalesce(col("l_linestatus"), lit("*")).as("ls"), col("n"), col("total"))
        .orderBy("rf", "ls")
    },

    // Interpolated percentiles per group (quality-cutoff shape for the
    // training pipeline: e.g. drop docs below the p5 quality score).
    withOracle(
      "agg_percentile",
      """SELECT event_type,
        |       round(quantile_cont(value, 0.5), 4) AS p50,
        |       round(quantile_cont(value, 0.95), 4) AS p95
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables.eventsRaw(s, dir)
        .groupBy("event_type")
        .agg(round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.95)"), 4).as("p95"))
        .orderBy("event_type")
    },

    // Pivot: per-user event-type counts as columns (conditional
    // aggregation in the oracle — the portable form of PIVOT).
    withOracle(
      "agg_pivot",
      """SELECT user_id,
        |       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      Tables.eventsRaw(s, dir)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "purchase", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")
    },

    // Running window aggregates: cumulative spend + event rank per user.
    withOracle(
      "window_running",
      """SELECT event_id, user_id,
        |       row_number() OVER w AS rn,
        |       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                              ROWS UNBOUNDED PRECEDING), 2) AS running_total
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, rn""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.eventsRaw(s, dir)
        .select(col("event_id"), col("user_id"),
          row_number().over(w).as("rn"),
          round(sum("value").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
            .as("running_total"))
        .orderBy("user_id", "rn")
    },

    // Cross-series correlation: Pearson corr of every key pair's hourly
    // count series over the hours both were live — which event streams
    // co-move. The self-join is keyed on the HOUR (time-cardinality,
    // uniform — every hour carries exactly |keys| rows, so no skew), and
    // corr() aggregates with map-side partials into a keys²-sized
    // result. Rounded to 4dp on both engines; the pair grid is total
    // (i < j) so the output order is deterministic.
    withOracle(
      "timeseries_correlate", {
        val ts = Tables.sql.tsSecs
        s"""WITH hourly AS (
           |  SELECT event_type AS key, ($ts) // 3600 AS hb, count(*) AS pv
           |  FROM events GROUP BY 1, 2)
           |SELECT a.key AS key_a, b.key AS key_b,
           |       round(corr(a.pv, b.pv), 4) AS r
           |FROM hourly a JOIN hourly b ON a.hb = b.hb AND a.key < b.key
           |GROUP BY 1, 2 ORDER BY key_a, key_b""".stripMargin
      }) { (s, dir) =>
      val hourly = hourlyCounts(s, dir)
      val a = hourly.select(col("key").as("key_a"), col("hb"), col("pv").as("pv_a"))
      val b = hourly.select(col("key").as("key_b"), col("hb"), col("pv").as("pv_b"))
      a.join(b, Seq("hb")).where(col("key_a") < col("key_b"))
        .groupBy("key_a", "key_b")
        .agg(round(corr("pv_a", "pv_b"), 4).as("r"))
        .orderBy("key_a", "key_b")
    },

    // Equi-depth decile bucketing (ntile): the ranking-window tier the
    // running/lag pair doesn't cover — assigns each customer a balance
    // decile and aggregates per bucket. One window shuffle on the
    // (constant) partition… deliberately NOT: ntile over an unpartitioned
    // window would serialize the corpus through one task, so the decile
    // is computed per nation (the real-world grain) and the window key
    // is the nation — partition-parallel like every other window here.
    withOracle(
      "window_ntile",
      """SELECT nationkey, decile, count(*) AS n_cust,
        |       round(min(bal), 2) AS min_bal, round(max(bal), 2) AS max_bal
        |FROM (SELECT c_nationkey AS nationkey, c_acctbal AS bal,
        |             ntile(10) OVER (PARTITION BY c_nationkey
        |                             ORDER BY c_acctbal, c_custkey) AS decile
        |      FROM customer)
        |GROUP BY 1, 2 ORDER BY nationkey, decile""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
      Tables.customer(s, dir)
        .select(col("c_nationkey").as("nationkey"), col("c_acctbal").as("bal"),
          ntile(10).over(w).as("decile"))
        .groupBy("nationkey", "decile")
        .agg(count(lit(1)).as("n_cust"),
          round(min("bal"), 2).as("min_bal"), round(max("bal"), 2).as("max_bal"))
        .orderBy("nationkey", "decile")
    },

    // Unpivot (wide → long melt) — the inverse of agg_pivot, closing the
    // reshaping lattice: per-nation order-priority counts pivoted wide,
    // then melted back to (nation, priority, n) rows via the built-in
    // unpivot operator (Expand under the hood — row-local, zero extra
    // shuffles beyond the pivot's own aggregate).
    withOracle(
      "agg_unpivot",
      """WITH wide AS (
        |  SELECT c.c_nationkey AS nationkey,
        |         count(*) FILTER (o.o_orderpriority = '1-URGENT') AS urgent,
        |         count(*) FILTER (o.o_orderpriority = '2-HIGH') AS high,
        |         count(*) FILTER (o.o_orderpriority = '3-MEDIUM') AS medium
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1)
        |SELECT nationkey, prio, n
        |FROM wide UNPIVOT (n FOR prio IN (urgent, high, medium))
        |ORDER BY nationkey, prio""".stripMargin) { (s, dir) =>
      val wide = Tables.orders(s, dir)
        .join(Tables.customer(s, dir),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nationkey"))
        .agg(
          count(when(col("o_orderpriority") === "1-URGENT", 1)).as("urgent"),
          count(when(col("o_orderpriority") === "2-HIGH", 1)).as("high"),
          count(when(col("o_orderpriority") === "3-MEDIUM", 1)).as("medium"))
      wide.unpivot(Array(col("nationkey")),
          Array(col("urgent"), col("high"), col("medium")), "prio", "n")
        .orderBy("nationkey", "prio")
    },

    // Set operations: users who click but never error (EXCEPT), and the
    // click∩purchase overlap (INTERSECT).
    withOracle(
      "set_ops",
      """SELECT 'click_no_error' AS op, user_id FROM (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  EXCEPT
        |  SELECT user_id FROM events WHERE event_type = 'error')
        |UNION ALL
        |SELECT 'click_and_purchase', user_id FROM (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  INTERSECT
        |  SELECT user_id FROM events WHERE event_type = 'purchase')
        |ORDER BY op, user_id""".stripMargin) { (s, dir) =>
      val ev = Tables.eventsRaw(s, dir)
      def users(t: String) = ev.where(col("event_type") === t).select("user_id")
      val exceptSet = users("click").except(users("error"))
        .select(lit("click_no_error").as("op"), col("user_id"))
      val intersectSet = users("click").intersect(users("purchase"))
        .select(lit("click_and_purchase").as("op"), col("user_id"))
      exceptSet.unionAll(intersectSet).orderBy("op", "user_id")
    },

    // lag/lead family: per-user inter-event gap in seconds (the raw
    // material of sessionization thresholds and arrival-rate analysis).
    // NULL for each user's first event, exactly as SQL lag defines it.
    //
    // Scale: one hash shuffle on user_id (high-cardinality key) and a
    // per-user sort — the same single-exchange shape PlanSpec pins for
    // sessionize; no global ordering anywhere.
    withOracle(
      "window_lag_delta",
      s"""SELECT event_id, user_id,
         |       CAST((${Tables.sql.tsSecs}) -
         |            lag(${Tables.sql.tsSecs}) OVER (PARTITION BY user_id
         |                                            ORDER BY ts, event_id)
         |            AS BIGINT) AS gap_secs
         |FROM events ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          (col("ts_secs") - lag(col("ts_secs"), 1).over(w)).as("gap_secs"))
        .orderBy("user_id", "event_id")
    },

    // SCD Type-2 dimension build: the change stream (per-user event_type
    // transitions) becomes versioned rows with [valid_from, valid_to)
    // and an is_current flag — a new version opens only when the value
    // CHANGES (consecutive duplicates collapse), the warehouse history
    // table property_latest's latest-wins view is derived from. Both
    // windows share one (user_id; ts, event_id) partitioning, so the
    // whole build rides a single shuffle; at 100 TB the change capture
    // runs per partition after one exchange on the dimension key.
    withOracle(
      "scd2_history",
      s"""WITH ev AS (
         |  SELECT user_id, event_type AS val, ${Tables.sql.tsSecs} AS ts, event_id
         |  FROM events),
         |ch AS (
         |  SELECT user_id, val, ts, event_id,
         |         lag(val) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
         |  FROM ev),
         |flt AS (SELECT user_id, val, ts, event_id FROM ch
         |        WHERE prev IS NULL OR val <> prev),
         |v AS (
         |  SELECT user_id, val, ts AS valid_from,
         |         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
         |  FROM flt)
         |SELECT user_id, val, valid_from, valid_to,
         |       CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current
         |FROM v ORDER BY user_id, valid_from, val, valid_to NULLS LAST""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts_secs"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_type").as("val"),
          col("ts_secs"), col("event_id"))
        .withColumn("prev", lag(col("val"), 1).over(w))
        .where(col("prev").isNull || col("val") =!= col("prev"))
        .withColumn("valid_to", lead(col("ts_secs"), 1).over(w))
        .select(col("user_id"), col("val"), col("ts_secs").as("valid_from"),
          col("valid_to"),
          when(col("valid_to").isNull, 1).otherwise(0).as("is_current"))
        // valid_to completes the total order: an A,B,A value flip inside
        // one epoch second yields two rows tied on (user_id, valid_from,
        // val) that differ only in valid_to/is_current — without it the
        // two engines may emit the tie in different orders. NULLS LAST
        // explicitly: Spark defaults nulls-first asc, DuckDB nulls-last.
        .orderBy(col("user_id"), col("valid_from"), col("val"),
          col("valid_to").asc_nulls_last)
    },

    // Semi-structured extraction: parse the JSON props payload into a
    // typed column and aggregate it — the schema-on-read step every
    // event pipeline runs on its property bag. Spark side uses real
    // from_json (codegen'd Jackson parse, row-local); the oracle only
    // needs to compute the same numbers, so it string-extracts.
    //
    // Scale: parsing is a zero-shuffle map fused into the scan
    // projection; the aggregate is the usual map-side-combined groupBy.
    withOracle(
      "props_json_extract",
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(regexp_extract(props, '"k":\s*(-?[0-9]+)', 1) AS BIGINT)) AS BIGINT) AS k_sum,
        |       min(CAST(regexp_extract(props, '"k":\s*(-?[0-9]+)', 1) AS BIGINT)) AS k_min,
        |       max(CAST(regexp_extract(props, '"k":\s*(-?[0-9]+)', 1) AS BIGINT)) AS k_max
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables.eventsRaw(s, dir)
        .select(col("event_type"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
            .getField("k").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("k_sum"),
          min("k").as("k_min"), max("k").as("k_max"))
        .orderBy("event_type")
    },

    // Grouped top-k: each customer's 2 highest-value orders — the
    // "limit per group" operator (recommendation shortlists, per-entity
    // samples).
    //
    // Scale: the window partitions by o_custkey (high-cardinality), so
    // no group exceeds one customer's orders — never the
    // whole-stratum-in-one-task collapse of a low-cardinality partition
    // key; at extreme per-key skew the aggregate min-heap form replaces
    // the window.
    withOracle(
      "topk_per_group",
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 2)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"), col("rn"))
        .orderBy("o_custkey", "rn")
    },

    // The same grouped top-k as a typed bounded-heap Aggregator
    // (SURVEY.md §2.8's CascalogBuffer extension point): identical
    // results to topk_per_group by construction AND by oracle — but the
    // buffer is capped at k, reduce/merge are associative, and Spark
    // combines map-side, so a single key with a billion rows ships at
    // most k rows per upstream partition instead of sorting the whole
    // group in one window task. The form to reach for under per-key
    // skew.
    withOracle(
      "agg_topk_heap",
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .as[(Long, Long, Double)]
        .groupByKey(_._1)
        .mapValues { case (_, okey, price) => (okey, price) }
        .agg(graft.functions.TopKAgg.TopK(2).toColumn.name("top"))
        .select(col("key").as("o_custkey"),
          posexplode(col("top.items")).as(Seq("pos", "e")))
        .select(col("o_custkey"), col("e.id").as("o_orderkey"),
          round(col("e.value"), 2).as("price"), (col("pos") + 1).as("rn"))
        .orderBy("o_custkey", "rn")
    },

    // Statistical aggregates (variance family): per-type dispersion of
    // the value column. Spark and DuckDB both aggregate in doubles;
    // round(2) absorbs partial-aggregation order differences.
    //
    // Scale: map-side partial aggregation — stddev partials are
    // (count, mean, M2) triples, so the shuffle carries 3 doubles per
    // (task, group), not rows.
    withOracle(
      "agg_stats",
      """SELECT event_type, count(*) AS n,
        |       round(avg(value), 2) AS mean_v,
        |       round(stddev_samp(value), 2) AS sd_v,
        |       round(min(value), 2) AS min_v, round(max(value), 2) AS max_v
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables.eventsRaw(s, dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(avg("value"), 2).as("mean_v"),
          round(stddev_samp("value"), 2).as("sd_v"),
          round(min("value"), 2).as("min_v"), round(max("value"), 2).as("max_v"))
        .orderBy("event_type")
    },

    // Ordered conversion funnel view → click → purchase: a user reaches
    // step n+1 at the first step-(n+1) event AT OR AFTER their step-n
    // arrival time. The canonical product-analytics query over the same
    // pageview stream the reference's views aggregate.
    //
    // Scale: each stage is a map-combinable min-aggregate keyed by user
    // (user-cardinality, skew-free) followed by an equi-join on user_id
    // against a set that only SHRINKS stage over stage — at 100 TB the
    // stage-2+ scans prune by event_type at the parquet reader and the
    // shrinking arrival relation makes each successive join cheaper
    // (broadcastable once conversion whittles it under the threshold).
    // All integer arithmetic; no float ordering anywhere.
    withOracle(
      "funnel_steps",
      s"""WITH s1 AS (
         |  SELECT user_id, min(${Tables.sql.tsSecs}) AS t1 FROM events
         |  WHERE event_type = 'view' GROUP BY user_id),
         |s2 AS (
         |  SELECT e.user_id, min(${Tables.sql.tsSecs}) AS t2
         |  FROM events e JOIN s1 USING (user_id)
         |  WHERE event_type = 'click' AND ${Tables.sql.tsSecs} >= t1
         |  GROUP BY e.user_id),
         |s3 AS (
         |  SELECT e.user_id, min(${Tables.sql.tsSecs}) AS t3
         |  FROM events e JOIN s2 USING (user_id)
         |  WHERE event_type = 'purchase' AND ${Tables.sql.tsSecs} >= t2
         |  GROUP BY e.user_id)
         |SELECT step, step_type, n_users FROM (
         |  SELECT 1 AS step, 'view' AS step_type, count(*) AS n_users FROM s1
         |  UNION ALL SELECT 2, 'click', count(*) FROM s2
         |  UNION ALL SELECT 3, 'purchase', count(*) FROM s3)
         |ORDER BY step""".stripMargin) { (s, dir) =>
      val ev = Tables.eventsRaw(s, dir)
        .select(col("user_id"), col("event_type"),
          graft.functions.TimeFunctions.tsSecs(col("ts")).as("ts_secs"))
      def stage(prev: org.apache.spark.sql.DataFrame, prevT: String,
          step: String, outT: String) =
        ev.where(col("event_type") === step)
          .join(prev, "user_id")
          .where(col("ts_secs") >= col(prevT))
          .groupBy("user_id").agg(min("ts_secs").as(outT))
      val s1 = ev.where(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts_secs").as("t1"))
      val s2 = stage(s1, "t1", "click", "t2")
      val s3 = stage(s2, "t2", "purchase", "t3")
      def level(df: org.apache.spark.sql.DataFrame, step: Int, name: String) =
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(step).as("step"), lit(name).as("step_type"), col("n_users"))
      level(s1, 1, "view")
        .unionAll(level(s2, 2, "click"))
        .unionAll(level(s3, 3, "purchase"))
        .orderBy("step")
    },

    // Weekly cohort retention: cohort = the ISO-epoch week of a user's
    // first event, cell (cohort_wk, wk_offset) = distinct users from that
    // cohort active wk_offset weeks later. The standard retention matrix
    // over the reference's pageview-stream shape.
    //
    // Scale: first-seen is a map-combinable min-aggregate on user_id; the
    // activity join shuffles both sides on user_id (user-cardinality — no
    // hot keys); the distinct collapses to (user, cohort, offset) with
    // partial aggregation before the final matrix aggregate, whose result
    // is weeks² — tiny. Integer week arithmetic end to end (truncating
    // division, non-negative epochs — same contract as ts_secs).
    withOracle(
      "cohort_retention",
      s"""WITH wk AS (
         |  SELECT user_id, ${Tables.sql.tsSecs} // 604800 AS wk FROM events),
         |first AS (SELECT user_id, min(wk) AS cohort_wk FROM wk GROUP BY user_id),
         |act AS (
         |  SELECT DISTINCT w.user_id, f.cohort_wk, w.wk - f.cohort_wk AS wk_offset
         |  FROM wk w JOIN first f USING (user_id))
         |SELECT cohort_wk, wk_offset, count(*) AS n_users
         |FROM act GROUP BY cohort_wk, wk_offset
         |ORDER BY cohort_wk, wk_offset""".stripMargin) { (s, dir) =>
      val wk = Tables.eventsRaw(s, dir)
        .select(col("user_id"),
          graft.functions.TimeFunctions.tsSecs(col("ts")).as("ts_secs"))
        .select(col("user_id"),
          TimeFunctions.fdiv(col("ts_secs"), 604800L).as("wk"))
      val first = wk.groupBy("user_id").agg(min("wk").as("cohort_wk"))
      wk.join(first, "user_id")
        .select(col("user_id"), col("cohort_wk"), (col("wk") - col("cohort_wk")).as("wk_offset"))
        .distinct()
        .groupBy("cohort_wk", "wk_offset")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_wk", "wk_offset")
    }
  )
}
