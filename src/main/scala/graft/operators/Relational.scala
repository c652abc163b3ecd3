package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef.withOracle
import org.apache.spark.sql.functions._

/** Join-shaped operators (SURVEY.md §2.4) plus a TPC-H-style headline
  * aggregation. Join strategy is deliberate for 100 TB: dimension tables
  * (nation/region/customer at star-schema ratios) are broadcast; only the
  * fact table keeps its partitioning, so no shuffle of the big side.
  */
object Relational {

  val defs: Seq[QueryDef] = Seq(

    // TPC-H Q1-shaped pricing summary over lineitem — the headline scan+agg
    // benchmark query. Sums rounded to the data's 2dp grid; averages to 4dp.
    withOracle(
      "q1_agg",
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       round(avg(l_extendedprice), 4) AS avg_price,
        |       round(avg(l_discount), 4) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // TPC-H Q6-shaped forecast-revenue: pure scan+filter+agg — the
    // pushdown/codegen stress case (single row out).
    withOracle(
      "q6_filter_agg",
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
        |       count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 24""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp")
          && col("l_discount").between(0.03, 0.07)
          && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
          count(lit(1)).as("n"))
    },

    // TPC-H Q3-shaped shipping priority: selective fact⋈fact join + top-k
    // by computed revenue.
    withOracle(
      "q3_shipping",
      """SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       CAST(epoch(o_orderdate) AS BIGINT) AS odate
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, l_orderkey
        |LIMIT 10""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") > lit("1998-03-15 00:00:00").cast("timestamp"))
        .join(Tables.orders(s, dir)
          .where(col("o_orderdate") < lit("1998-03-15 00:00:00").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir).where(col("c_mktsegment") === "BUILDING")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
        .orderBy(col("rev").desc, col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"), round(col("rev"), 2).as("revenue"),
          col("o_orderdate").cast("timestamp_ltz").cast("long").as("odate"))
    },

    // TPC-H Q4 (order-priority checking), adapted to the fixture's
    // columns: the EXISTS probe is "some line item shipped more than 30
    // days after the order date" (the fixture lineitem carries no
    // commit/receipt dates, so the late-delivery predicate is expressed
    // on shipdate vs orderdate). The shape is the point: a quarter-
    // filtered fact scan semi-joined on (equi-key + correlated range
    // condition) — EXISTS compiles to a left-semi join, each order
    // counted once no matter how many qualifying line items.
    withOracle(
      "q4_order_priority",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .where(col("o_orderdate") >= lit("1998-01-01 00:00:00").cast("timestamp")
          && col("o_orderdate") < lit("1998-04-01 00:00:00").cast("timestamp"))
        .join(Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate")),
          col("l_orderkey") === col("o_orderkey")
            && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAY"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // Cascalog implicit equi-join (BatchWorkflow.java:628-634) -> fact ⋈
    // broadcast dims: orders ⋈ customer ⋈ nation ⋈ region, revenue per nation.
    withOracle(
      "join_inner",
      """SELECT r_name, n_name, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("revenue"))
        .orderBy("r_name", "n_name")
    },

    // TPC-H Q5-shaped local-supplier volume: six-way join with the
    // customer-supplier same-nation constraint — join-reorder stress.
    withOracle(
      "q5_local_supplier",
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       count(*) AS n
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir)
          .where(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp")
            && col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("n_name")
    },

    // TPC-H Q18-shaped large-volume customers: HAVING-filtered aggregate
    // subquery semi-joined back to the fact, then re-aggregated.
    withOracle(
      "q18_large_orders",
      """SELECT c_custkey, o_orderkey,
        |       round(o_totalprice, 2) AS o_totalprice,
        |       round(sum(l_quantity), 2) AS total_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(l_quantity) > 150)
        |GROUP BY c_custkey, o_orderkey, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val big = li.groupBy("l_orderkey").agg(sum("l_quantity").as("tq"))
        .where(col("tq") > 150).select(col("l_orderkey").as("big_okey"))
      li.join(big, col("l_orderkey") === col("big_okey"), "left_semi")
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "o_orderkey", "o_totalprice")
        .agg(sum("l_quantity").as("tq2"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select(col("c_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"),
          round(col("tq2"), 2).as("total_qty"))
    },

    // Semi-join (TPC-H Q4 shape): orders having at least one late lineitem.
    withOracle(
      "join_semi",
      """SELECT o_orderpriority, count(*) AS n
        |FROM orders
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val late = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"))
      Tables.orders(s, dir)
        .join(late,
          col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"),
          "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },

    // Anti-join: customers with no orders at all.
    withOracle(
      "join_anti",
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    },

    // Full outer join: two per-order aggregates with guaranteed one-sided
    // rows (orders with no 'R' lines; orders with ≤4 lines), null sides
    // coalesced to a sentinel. Completes the declared join surface
    // (inner / left / semi / anti / asof / range / interval / full).
    // Scale: both sides shuffle on the same key, so the join itself adds
    // no exchange beyond the aggregates'; full-outer can't broadcast
    // (both sides must surface unmatched rows) — the sort-merge shape is
    // the right one at any size.
    withOracle(
      "join_full_outer",
      """WITH a AS (
        |  SELECT l_orderkey, count(*) AS r_lines FROM lineitem
        |  WHERE l_returnflag = 'R' GROUP BY 1),
        |b AS (
        |  SELECT l_orderkey, count(*) AS tail_lines FROM lineitem
        |  WHERE l_linenumber > 4 GROUP BY 1)
        |SELECT coalesce(a.l_orderkey, b.l_orderkey) AS okey,
        |       CAST(coalesce(r_lines, -1) AS BIGINT) AS r_lines,
        |       CAST(coalesce(tail_lines, -1) AS BIGINT) AS tail_lines
        |FROM a FULL OUTER JOIN b ON a.l_orderkey = b.l_orderkey
        |ORDER BY okey""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val a = li.where(col("l_returnflag") === "R")
        .groupBy(col("l_orderkey").as("ak")).agg(count(lit(1)).as("r_lines"))
      val b = li.where(col("l_linenumber") > 4)
        .groupBy(col("l_orderkey").as("bk")).agg(count(lit(1)).as("tail_lines"))
      a.join(b, col("ak") === col("bk"), "full_outer")
        .select(coalesce(col("ak"), col("bk")).as("okey"),
          coalesce(col("r_lines"), lit(-1L)).as("r_lines"),
          coalesce(col("tail_lines"), lit(-1L)).as("tail_lines"))
        .orderBy("okey")
    },

    // !!newId ungrounded-var left outer join (BatchWorkflow.java:679-686):
    // pageviews left-joined to a canonical-id map; unmatched keep their id.
    // The map here is a deterministic synthetic equiv relation over events
    // user ids (full CC-derived map lives in the connected_components query).
    withOracle(
      "join_left_outer",
      """WITH idmap AS (
        |  SELECT DISTINCT user_id AS node, user_id % 37 AS canonical
        |  FROM events WHERE user_id % 37 <> user_id)
        |SELECT coalesce(canonical, user_id) AS person, count(*) AS pageviews
        |FROM events LEFT JOIN idmap ON user_id = node
        |GROUP BY 1 ORDER BY person""".stripMargin) { (s, dir) =>
      val ev = Tables.eventsRaw(s, dir)
      val idmap = ev.select(col("user_id").as("node"), (col("user_id") % 37).as("canonical"))
        .where(col("canonical") =!= col("node")).distinct()
      ev.join(broadcast(idmap), col("user_id") === col("node"), "left_outer")
        .select(coalesce(col("canonical"), col("user_id")).as("person"))
        .groupBy("person").agg(count(lit(1)).as("pageviews"))
        .orderBy("person")
    },

    // MakeNormalizedPageview row rewrite (BatchWorkflow.java:607-619):
    // per-row coalesce of joined-in canonical id over the original.
    withOracle(
      "rewrite_join",
      """WITH idmap AS (
        |  SELECT DISTINCT user_id AS node, user_id % 37 AS canonical
        |  FROM events WHERE user_id % 37 <> user_id)
        |SELECT event_id, coalesce(canonical, user_id) AS person
        |FROM events LEFT JOIN idmap ON user_id = node
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val ev = Tables.eventsRaw(s, dir)
      val idmap = ev.select(col("user_id").as("node"), (col("user_id") % 37).as("canonical"))
        .where(col("canonical") =!= col("node")).distinct()
      ev.join(broadcast(idmap), col("user_id") === col("node"), "left_outer")
        .select(col("event_id"), coalesce(col("canonical"), col("user_id")).as("person"))
        .orderBy("event_id")
    },

    // Bloom-prune shuffle join: prefilter the fact side with a bloom built
    // on the (filtered) build side's keys, then exact-join. Urgent orders
    // are a minority of orderkeys, so most lineitem rows drop before the
    // exchange. Oracle is the PLAIN join — no-false-negatives + exact join
    // means prune changes nothing but the shuffled byte count.
    withOracle(
      "join_bloom_prune",
      """SELECT l_returnflag, count(*) AS n_items,
        |       round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val urgent = Tables.orders(s, dir)
        .where(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      bloomPruneJoin(
        Tables.lineitem(s, dir).select("l_orderkey", "l_returnflag", "l_extendedprice"),
        "l_orderkey", urgent, "o_orderkey")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_items"), round(sum("l_extendedprice"), 2).as("revenue"))
        .orderBy("l_returnflag")
    },

    // Bloom-split id rewrite: the !!newId left-outer rewrite
    // (BatchWorkflow.java:679-686) in the regime where the canonical-id
    // map is person-cardinality — too big to broadcast, and SPARSE in the
    // event stream's key space (here 2% of ids). The plain plan shuffles
    // EVERY event on user_id; the bloom split routes definite non-members
    // straight to the identity mapping (no shuffle) and left-outer-joins
    // only the probable members, where false positives coalesce back to
    // identity. Oracle is the plain left-outer rewrite.
    withOracle(
      "rewrite_join_bloom",
      """WITH idmap AS (
        |  SELECT DISTINCT user_id AS node, user_id % 37 AS canonical
        |  FROM events WHERE user_id % 50 = 0 AND user_id % 37 <> user_id)
        |SELECT event_id, coalesce(canonical, user_id) AS person
        |FROM events LEFT JOIN idmap ON user_id = node
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val ev = Tables.eventsRaw(s, dir).select("event_id", "user_id")
      val idmap = ev
        .select(col("user_id").as("node"), (col("user_id") % 37).as("canonical"))
        .where(col("node") % 50 === 0 && col("canonical") =!= col("node"))
        .distinct()
      bloomRewriteLeftOuter(ev, "user_id", idmap, "node", "canonical", "person")
        .select("event_id", "person")
        .orderBy("event_id")
    }
  )

  /** Inner-join `big ⋈ build` on the given keys, pruning `big` with a
    * bloom filter over `build`'s keys before the join so non-matching
    * rows never reach the shuffle (see
    * [[org.apache.spark.sql.graft.BloomPrune]]). The join is pinned to
    * sort-merge: the operator exists for the both-sides-too-big-to-
    * broadcast regime, and the pin keeps the prune-before-exchange shape
    * observable at test scale. `expectedItems` sizes the filter; 0 means
    * count the build side (one cheap columnar scan — the build side is
    * the small one by contract).
    */
  def bloomPruneJoin(
      big: org.apache.spark.sql.DataFrame, bigKey: String,
      build: org.apache.spark.sql.DataFrame, buildKey: String,
      expectedItems: Long = 0L): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.graft.BloomPrune
    val n = if (expectedItems > 0) expectedItems else build.count()
    val bloom = BloomPrune.buildBloom(build, col(buildKey), n)
    big.where(BloomPrune.mightContain(bloom, col(bigKey)))
      .join(build.hint("merge"), col(bigKey) === col(buildKey))
  }

  /** The left-outer "rewrite" form of the bloom prune: append to `rows`
    * a column `out` = the map's `mapVal` where `key` matches `mapKey`,
    * else `key` itself — WITHOUT shuffling rows that cannot match. The
    * bloom over the map's keys splits the input: definite non-members map
    * to identity with no exchange; probable members go through a pinned
    * sort-merge left-outer join where false positives coalesce back to
    * identity — so the union is row-identical to the plain left-outer
    * rewrite. Costs a second scan of `rows` (one per branch), which at
    * scale is the standard trade: a cheap columnar re-scan against
    * shuffling the ~98% of rows a sparse map can never rewrite. A null
    * bloom (empty map) routes everything to the identity branch.
    */
  def bloomRewriteLeftOuter(
      rows: org.apache.spark.sql.DataFrame, key: String,
      map: org.apache.spark.sql.DataFrame, mapKey: String, mapVal: String,
      out: String, expectedItems: Long = 0L): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.graft.BloomPrune
    val n = if (expectedItems > 0) expectedItems else map.count()
    val bloom = BloomPrune.buildBloom(map, col(mapKey), n)
    val hit = coalesce(BloomPrune.mightContain(bloom, col(key)), lit(false))
    val keep = rows.columns.map(col).toSeq
    val miss = rows.where(!hit).select(keep :+ col(key).as(out): _*)
    val maybe = rows.where(hit)
      .join(map.hint("merge"), col(key) === col(mapKey), "left_outer")
      .select(keep :+ coalesce(col(mapVal), col(key)).as(out): _*)
    maybe.unionAll(miss)
  }
}
