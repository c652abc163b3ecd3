package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef.withOracle
import org.apache.spark.sql.functions._

/** Data-quality constraint checking — the expectations report every
  * production pipeline runs before publishing a batch (null fractions,
  * key uniqueness, referential integrity, value ranges). The reference
  * trusts its Thrift schema for structure but has no content checks; a
  * 100 TB ingest needs them as a first-class queryable view, not an
  * ad-hoc notebook.
  *
  * Shape: all ROW-LOCAL checks over one table fold into a single
  * conditional-aggregation pass (one scan, map-combinable partials —
  * adding a check costs a column, not a scan); cross-table checks are a
  * duplicate-key aggregate (key-cardinality) and a referential left-anti
  * join (foreign-key shuffle, bloom-prunable). The report itself is
  * checks-sized.
  */
object Quality {

  val defs: Seq[QueryDef] = Seq(

    withOracle(
      "dq_check",
      """WITH r AS (
        |  SELECT 'null_orderkey' AS chk,
        |         CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'nonpositive_quantity',
        |         CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'negative_price',
        |         CAST(sum(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'dup_orderkey', CAST(count(*) AS BIGINT)
        |  FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)
        |  UNION ALL
        |  SELECT 'orphan_lineitem', CAST(count(*) AS BIGINT)
        |  FROM lineitem
        |  WHERE l_orderkey IS NOT NULL
        |    AND l_orderkey NOT IN (SELECT o_orderkey FROM orders))
        |SELECT chk, n AS n_violations FROM r ORDER BY chk""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir)
      // every row-local lineitem check in ONE scan
      val rowLocal = li.agg(
        sum(when(col("l_orderkey").isNull, 1).otherwise(0)).cast("long").as("null_orderkey"),
        sum(when(col("l_quantity") <= 0, 1).otherwise(0)).cast("long").as("nonpositive_quantity"),
        sum(when(col("l_extendedprice") < 0, 1).otherwise(0)).cast("long").as("negative_price"))
        .select(expr(
          """stack(3,
            |  'null_orderkey', null_orderkey,
            |  'nonpositive_quantity', nonpositive_quantity,
            |  'negative_price', negative_price) AS (chk, n_violations)""".stripMargin))
      val dup = ord.groupBy("o_orderkey").agg(count(lit(1)).as("c"))
        .where(col("c") > 1)
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("dup_orderkey").as("chk"), col("n_violations"))
      val orphan = li.where(col("l_orderkey").isNotNull).select("l_orderkey")
        .join(ord.select(col("o_orderkey").as("l_orderkey")), Seq("l_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("orphan_lineitem").as("chk"), col("n_violations"))
      rowLocal.unionAll(dup).unionAll(orphan).orderBy("chk")
    },

    // Rolling volume-anomaly detection — the monitoring view on top of
    // the constraint report: per event type, each hour's count scored
    // against the trailing 24-hour window (z = (n − μ)/σ over ROWS
    // BETWEEN 24 PRECEDING AND 1 PRECEDING — row-based in BOTH engines,
    // so hour gaps cannot desynchronize the frames), flagged at |z| ≥ 3
    // on the ROUNDED score. A 12-observation warm-up guards the
    // undefined-stddev region (and the engines' different n=1 stddev
    // conventions); σ = 0 windows are unflaggable and excluded.
    //
    // Scale: one map-combinable (type, hour) count over the scan, then a
    // window whose per-key volume is hours-per-type — bounded by
    // retention, not event volume. Never a self-join.
    withOracle(
      "dq_volume_anomaly",
      s"""WITH hourly AS (
         |  SELECT event_type, ${Tables.sql.tsSecs} // 3600 AS hour,
         |         count(*) AS n
         |  FROM events GROUP BY 1, 2),
         |scored AS (
         |  SELECT event_type, hour, n,
         |         count(*) OVER w AS n_obs,
         |         avg(n) OVER w AS mu,
         |         stddev_samp(n) OVER w AS sd
         |  FROM hourly
         |  WINDOW w AS (PARTITION BY event_type ORDER BY hour
         |               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
         |SELECT event_type, hour, n,
         |       round((n - mu) / sd, 4) AS z,
         |       (abs(round((n - mu) / sd, 4)) >= 3) AS is_anomaly
         |FROM scored WHERE n_obs >= 12 AND sd > 0
         |ORDER BY event_type, hour""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val hourly = Tables.events(s, dir)
        .groupBy(col("event_type"),
          graft.functions.TimeFunctions.fdiv(col("ts_secs"), 3600L).as("hour"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("event_type").orderBy("hour")
        .rowsBetween(-24, -1)
      hourly
        .withColumn("n_obs", count(lit(1)).over(w))
        .withColumn("mu", avg("n").over(w))
        .withColumn("sd", stddev_samp(col("n")).over(w))
        .where(col("n_obs") >= 12 && col("sd") > 0)
        .withColumn("z", round((col("n") - col("mu")) / col("sd"), 4))
        .select(col("event_type"), col("hour"), col("n"), col("z"),
          (abs(col("z")) >= 3).as("is_anomaly"))
        .orderBy("event_type", "hour")
    }
  )
}
