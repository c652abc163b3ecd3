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
    }
  )
}
