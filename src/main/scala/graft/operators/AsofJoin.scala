package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef.withOracle
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator the reference (and built-in Spark) lacks,
  * composed from existing ops per the preference order in SURVEY.md §7.3
  * / the build brief: rather than a custom SparkPlan or an O(n·m) range
  * join, tag both sides, union, and take a running `last(..., ignoreNulls)`
  * per key ordered by event time. One shuffle on the key, O(n log n)
  * within partitions — the shape that survives 100 TB (a per-key
  * interleave, never a per-pair product).
  *
  * Tie rule: at equal timestamps the right side sorts first, so a left
  * row sees a right row with the exact same timestamp (>= semantics,
  * matching DuckDB's ASOF JOIN which oracles this operator).
  */
object AsofJoin {

  /** For each left row, attach `valueCol` of the latest right row with
    * rightTs <= leftTs, per key. Inputs: left(key, ts, leftCols…),
    * right(key, ts, valueCol). Output: left columns + valueCol (null when
    * no prior right row exists).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      valueCol: String): DataFrame = {
    val leftCols = left.columns.filterNot(_ == valueCol)
    val taggedLeft = left.withColumn("__side", lit(1))
      .withColumn(valueCol, lit(null).cast(right.schema(valueCol).dataType))
    val taggedRight = right.select(
      (Seq(col(key), col(ts)) ++
        leftCols.filterNot(c => c == key || c == ts).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        lit(0).as("__side") :+ col(valueCol)): _*)
    val w = Window.partitionBy(key).orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedLeft.select(taggedRight.columns.toIndexedSeq.map(col): _*)
      .unionAll(taggedRight)
      .withColumn(valueCol, last(col(valueCol), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .drop("__side")
  }

  /** The FORWARD mirror: for each left row, attach `valueCol` of the
    * EARLIEST right row with rightTs >= leftTs, per key — "next event
    * after" semantics (next click after an impression, next restock
    * after a stockout). Same single-shuffle interleave; the window runs
    * currentRow → unboundedFollowing with `first(..., ignoreNulls)`,
    * and at equal timestamps the left side sorts first so a
    * simultaneous right row stays inside the frame (>= semantics,
    * matching DuckDB's forward ASOF which oracles it).
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
      ts: String, valueCol: String): DataFrame = {
    val leftCols = left.columns.filterNot(_ == valueCol)
    val taggedLeft = left.withColumn("__side", lit(0))
      .withColumn(valueCol, lit(null).cast(right.schema(valueCol).dataType))
    val taggedRight = right.select(
      (Seq(col(key), col(ts)) ++
        leftCols.filterNot(c => c == key || c == ts).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        lit(1).as("__side") :+ col(valueCol)): _*)
    val w = Window.partitionBy(key).orderBy(col(ts), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    taggedLeft.select(taggedRight.columns.toIndexedSeq.map(col): _*)
      .unionAll(taggedRight)
      .withColumn(valueCol, first(col(valueCol), ignoreNulls = true).over(w))
      .where(col("__side") === 0)
      .drop("__side")
  }

  /** Tolerance-bounded backward as-of (the feature-store join contract:
    * a stale feature row is WORSE than no row): the latest right row with
    * leftTs - tolerance <= rightTs <= leftTs, else null. Same
    * single-shuffle interleave — the right value rides packed with its
    * own timestamp so the staleness test is one row-local comparison on
    * the matched pair; no second join, no per-pair product. `ts` must be
    * numeric (the engine's epoch-nanos currency); `tolerance` in the
    * same unit.
    */
  def asofJoinTolerance(left: DataFrame, right: DataFrame, key: String,
      ts: String, valueCol: String, tolerance: Long): DataFrame = {
    val packed = right.select(col(key), col(ts),
      struct(col(ts).as("mts"), col(valueCol).as("mv")).as("__m"))
    asofJoin(left, packed, key, ts, "__m")
      .withColumn(valueCol,
        when(col("__m").isNotNull &&
          col(ts) - col("__m.mts") <= tolerance, col("__m.mv")))
      .drop("__m")
  }

  /** The NEAREST direction (pandas merge_asof direction='nearest'): for
    * each left row, the right row minimizing |leftTs − rightTs| per key;
    * exact-distance ties go backward (the earlier row). Both candidates
    * come out of ONE key-partitioned interleave — the backward and
    * forward frames share the same (partition, order) spec so Spark
    * plans a single shuffle — and the argmin is one row-local
    * comparison on the packed (ts, value) structs. `ts` must be numeric
    * (the engine's epoch-nanos currency).
    */
  def asofJoinNearest(left: DataFrame, right: DataFrame, key: String,
      ts: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val mType = new StructType()
      .add("mts", right.schema(ts).dataType)
      .add("mv", right.schema(valueCol).dataType)
    val leftCols = left.columns.filterNot(_ == valueCol)
    val taggedLeft = left.withColumn("__side", lit(1))
      .withColumn("__m", lit(null).cast(mType))
    val taggedRight = right.select(
      (Seq(col(key), col(ts)) ++
        leftCols.filterNot(c => c == key || c == ts).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        lit(0).as("__side") :+
        struct(col(ts).as("mts"), col(valueCol).as("mv")).as("__m")): _*)
    // right sorts first at equal ts: the backward frame then includes a
    // simultaneous right row (>= semantics) while the forward frame
    // starts at the left row and excludes it — distance-0 matches are
    // the backward branch's, which the tie rule picks anyway.
    val ord = Window.partitionBy(key).orderBy(col(ts), col("__side"))
    val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    taggedLeft.select(taggedRight.columns.toIndexedSeq.map(col): _*)
      .unionAll(taggedRight)
      .withColumn("__b", last(col("__m"), ignoreNulls = true).over(wb))
      .withColumn("__f", first(col("__m"), ignoreNulls = true).over(wf))
      .where(col("__side") === 1)
      .withColumn(valueCol,
        when(col("__f").isNull, col("__b.mv"))
          .when(col("__b").isNull, col("__f.mv"))
          .when(col(ts) - col("__b.mts") <= col("__f.mts") - col(ts), col("__b.mv"))
          .otherwise(col("__f.mv")))
      .drop("__side", "__m", "__b", "__f")
  }

  val defs: Seq[QueryDef] = Seq(

    // Attribution shape: each purchase joined as-of to the same user's
    // latest preceding (or simultaneous) click. ns-precision timestamps
    // make the as-of pick unique.
    withOracle(
      "join_asof",
      """SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY purchase_id""".stripMargin) { (s, dir) =>
      val ev = Tables.eventsRaw(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      asofJoin(purchases, clicks, key = "user_id", ts = "ts", valueCol = "click_id")
        .select(col("purchase_id"), col("user_id"), col("click_id"))
        .orderBy("purchase_id")
    },

    // Tolerance-bounded attribution: the same purchase→click as-of, but
    // a click more than 15 minutes stale no longer attributes (the
    // feature-store staleness contract). Oracle = DuckDB ASOF + the same
    // row-local staleness CASE on the matched pair.
    withOracle(
      "join_asof_tolerance",
      """SELECT p.event_id AS purchase_id, p.user_id,
        |       CASE WHEN c.event_id IS NOT NULL
        |                 AND epoch_ns(p.ts) - epoch_ns(c.ts) <= 900000000000
        |            THEN c.event_id END AS click_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY purchase_id""".stripMargin) { (s, dir) =>
      val ev = Tables.eventsRaw(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      asofJoinTolerance(purchases, clicks, key = "user_id", ts = "ts",
        valueCol = "click_id", tolerance = 900L * 1000000000L)
        .select(col("purchase_id"), col("user_id"), col("click_id"))
        .orderBy("purchase_id")
    },

    // The forward direction: each impression (view) joined as-of to the
    // same user's NEXT click at-or-after it — time-to-convert shape.
    withOracle(
      "join_asof_forward",
      """SELECT v.event_id AS view_id, v.user_id, c.event_id AS click_id
        |FROM (SELECT * FROM events WHERE event_type = 'view') v
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON v.user_id = c.user_id AND v.ts <= c.ts
        |ORDER BY view_id""".stripMargin) { (s, dir) =>
      val ev = Tables.eventsRaw(s, dir)
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      asofJoinForward(views, clicks, key = "user_id", ts = "ts", valueCol = "click_id")
        .select(col("view_id"), col("user_id"), col("click_id"))
        .orderBy("view_id")
    },

    // The nearest direction: each purchase joined to the same user's
    // click closest in time, before OR after (sensor/quote alignment
    // shape; ties go backward). Oracle = backward ASOF + forward ASOF +
    // the same row-local distance argmin.
    withOracle(
      "join_asof_nearest",
      """WITH p AS (SELECT user_id, ts, event_id AS purchase_id FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, event_id AS click_id FROM events
        |      WHERE event_type = 'click'),
        |b AS (SELECT p.purchase_id, p.user_id, p.ts, c.click_id AS b_id, c.ts AS b_ts
        |      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts),
        |f AS (SELECT p.purchase_id, c.click_id AS f_id, c.ts AS f_ts
        |      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts)
        |SELECT b.purchase_id, b.user_id,
        |       CASE WHEN f_id IS NULL THEN b_id
        |            WHEN b_id IS NULL THEN f_id
        |            WHEN epoch_ns(b.ts) - epoch_ns(b_ts)
        |                 <= epoch_ns(f_ts) - epoch_ns(b.ts) THEN b_id
        |            ELSE f_id END AS click_id
        |FROM b JOIN f USING (purchase_id)
        |ORDER BY purchase_id""".stripMargin) { (s, dir) =>
      val ev = Tables.eventsRaw(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      asofJoinNearest(purchases, clicks, key = "user_id", ts = "ts",
        valueCol = "click_id")
        .select(col("purchase_id"), col("user_id"), col("click_id"))
        .orderBy("purchase_id")
    }
  )
}
