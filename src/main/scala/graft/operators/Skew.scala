package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §7.4 / BASELINE 100 TB rule:
  * "skewed keys → salting or AQE skew-join").
  *
  * AQE handles skewed *joins* automatically; skewed *aggregations* with
  * expensive per-group state (large sums, collect-style buffers) still
  * benefit from manual two-stage salting: stage 1 aggregates on
  * (key, salt) spreading a hot key over `salt` reducers, stage 2 merges
  * the partials per key. Correct for any algebraic aggregate expressed as
  * (partial, merge) pairs.
  *
  * Numeric contract: exact equality with the direct aggregation for
  * integral/decimal aggregates; floating-point sums can differ in the
  * last ulp because salting changes summation order (same caveat as any
  * partial-aggregation reshape — round to the data's grid when comparing).
  */
object Skew {

  /** Two-stage salted count/sum aggregation: groupBy keys with a random
    * salt in [0, salt), then merge partials. `aggs` maps output column
    * name -> (stage1 agg over input, stage2 merge over stage-1 output).
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      salt: Int,
      aggs: Seq[(String, Column, String => Column)]): DataFrame = {
    val stage1 = df
      .withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(aggs.head._2.as(s"__p_${aggs.head._1}"),
        aggs.tail.map(a => a._2.as(s"__p_${a._1}")): _*)
    stage1
      .groupBy(keys.map(col): _*)
      .agg(aggs.head._3(s"__p_${aggs.head._1}").as(aggs.head._1),
        aggs.tail.map(a => a._3(s"__p_${a._1}").as(a._1)): _*)
  }

  /** Convenience: salted count(*) + sum(valueCol) per key. */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: String,
      salt: Int = 16): DataFrame =
    saltedAgg(df, keys, salt, Seq(
      ("n", count(lit(1)), c => sum(col(c))),
      ("total", sum(col(valueCol)), c => sum(col(c)))))

  /** Salted shuffle join for a skewed fact key: each fact row takes an
    * arbitrary salt in [0, salt) and the dim side is REPLICATED across
    * all salt values, so the join key becomes (key, salt) and one hot
    * key's rows spread over `salt` reducers instead of funneling into
    * one. Exact — every fact row meets precisely the one dim replica
    * carrying its salt, so the result is row-identical to the plain
    * join (inner, on `factKey = dimKey`).
    *
    * This is the manual form of AQE's skew-join split, for the cases
    * AQE can't reach: a sort-merge partition it can't subdivide without
    * breaking a co-located downstream, a shuffled-hash join, or a skew
    * known AHEAD of runtime (a planted hot user, a null-heavy key)
    * where paying `salt`× dim replication up front beats a mid-query
    * replan. Cost model: dim shuffle volume grows salt×, fact volume is
    * unchanged — right when |dim| ≪ |fact| but dim is still past the
    * broadcast threshold (a broadcastable dim needs no salting at all).
    *
    * `dim`'s non-key columns must not collide with `fact`'s.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, salt: Int = 16): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
    val replicated = dim
      .withColumn("__salt", explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
      .withColumnRenamed(dimKey, "__dimkey")
    salted
      .join(replicated,
        salted(factKey) === replicated("__dimkey") &&
          salted("__salt") === replicated("__salt"))
      .drop("__salt").drop("__dimkey")
  }

  val defs: Seq[graft.QueryDef] = Seq(
    // The salted aggregation DECLARED: count+sum per event_type — 5 hot
    // keys over the whole fact stream, exactly the shape where a plain
    // groupBy funnels each key's every row into one reducer. Stage 1
    // spreads each key over 16 salted partials (map-side-combined),
    // stage 2 merges 16 rows per key. round(2) absorbs the
    // salt-order-dependent FP summation (documented numeric contract).
    graft.QueryDef.withOracle(
      "agg_salted",
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      saltedCountSum(graft.Tables.eventsRaw(s, dir), Seq("event_type"), "value")
        .select(col("event_type"), col("n"), round(col("total"), 2).as("total"))
        .orderBy("event_type")
    },

    // The salted JOIN declared: events (fact, 150 users over the whole
    // stream — hot keys) ⋈ customer (dim) on user_id = c_custkey, spread
    // over 8 salts, then rolled up per market segment. Inner-join ≡ the
    // plain join row for row (each fact row meets exactly its own salt's
    // dim replica), so the oracle is the unsalted SQL; round(2) absorbs
    // salt-order FP summation as in agg_salted. SkewSpec pins equality
    // against the direct join under a disabled broadcast threshold and
    // that the hot key actually spreads.
    graft.QueryDef.withOracle(
      "join_salted",
      """SELECT c_mktsegment, count(*) AS n, round(sum(value), 2) AS total
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      val fact = graft.Tables.eventsRaw(s, dir).select(col("user_id"), col("value"))
      val dim = graft.Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment"))
      saltedJoin(fact, dim, "user_id", "c_custkey", salt = 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        .orderBy("c_mktsegment")
    }
  )
}
