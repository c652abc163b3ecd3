package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions class must make the native functions SQL-callable in a
  * session configured only via spark.sql.extensions — the cluster-wide
  * deployment path (no imperative register() call anywhere).
  *
  * Extensions apply at session CREATION, so this builds a fresh
  * SparkSession over the shared SparkContext (never stopping it — the
  * other suites' session shares it) and restores the previous
  * default/active session afterwards.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions registers fvdot/shingle_hash64/minhash_signature") {
    val shared = SparkTestSession.spark // ensure the shared context exists
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // withExtensions runs the same class the spark.sql.extensions conf
      // would instantiate (GraftExtensions IS SparkSessionExtensions =>
      // Unit); the conf string itself is Spark's own loading machinery
      val spark = SparkSession.builder()
        .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
        .getOrCreate() // new session instance over the existing context
      assert(spark ne shared, "must be a fresh session, or extensions won't apply")
      val dot = spark.sql(
        "SELECT fvdot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), " +
          "array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d").head().getDouble(0)
      assert(dot == 11.0)
      val nsh = spark.sql(
        "SELECT size(shingle_hash64('a b c d', 3)) AS n").head().getInt(0)
      assert(nsh == 2)
      val sig = spark.sql(
        "SELECT minhash_signature(shingle_hash64('a b c d e f', 3), 8) AS s")
        .head().getSeq[Long](0)
      assert(sig.length == 8)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("graft.sql.approxDistinct=true rewrites COUNT(DISTINCT) to an HLL estimate; off stays exact") {
    SparkTestSession.spark
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val spark = SparkSession.builder()
        .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
        .getOrCreate()
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      Tables.eventsRaw(spark, "/root/testdata/sf0.001")
        .createOrReplaceTempView("ext_events")
      val q = "SELECT count(DISTINCT user_id) AS u FROM ext_events"
      val exact = spark.sql(q).head().getLong(0)

      spark.conf.set("graft.sql.approxDistinct", "true")
      try {
        val approxDf = spark.sql(q)
        val plan = approxDf.queryExecution.optimizedPlan.toString
        assert(plan.contains("hll_sketch_estimate"),
          s"rewrite must appear in the plan:\n$plan")
        val approx = approxDf.head().getLong(0)
        assert(math.abs(approx - exact).toDouble / exact <= 0.02,
          s"approx $approx vs exact $exact")
      } finally spark.conf.set("graft.sql.approxDistinct", "false")

      // conf off: exact plan, exact answer, no sketch anywhere
      val offDf = spark.sql(q)
      assert(!offDf.queryExecution.optimizedPlan.toString.contains("hll_sketch"))
      assert(offDf.head().getLong(0) == exact)

      // unsketchable input types stay exact instead of becoming an
      // AnalysisException (HllSketchAgg rejects doubles)
      spark.conf.set("graft.sql.approxDistinct", "true")
      try {
        val dbl = spark.sql(
          "SELECT count(DISTINCT cast(user_id AS DOUBLE)) AS u FROM ext_events")
        assert(!dbl.queryExecution.optimizedPlan.toString.contains("hll_sketch"),
          "a double column must not be rewritten")
        assert(dbl.head().getLong(0) == exact)
      } finally spark.conf.set("graft.sql.approxDistinct", "false")
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
