package graft.operators

import java.nio.file.Files

import graft.{QueryDef, Tables}
import graft.QueryDef.withOracle
import graft.functions.{TimeFunctions, UrlFunctions}
import graft.model.{Fact, FactKind, FactStore}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed end-to-end batch workflow and the union-typed id graph —
  * the reference's top-level pipeline (BatchWorkflow.java:689-702): ingest
  * into the master dataset, normalize URLs, deduplicate, normalize person
  * ids via connected components over *union-typed* PersonIDs (cookie xor
  * user id), then the serving views. Plus the latest-wins property view
  * over the schema's property half (schema.thrift:13-42).
  *
  * Scale notes (100 TB): every stage is a declarative DataFrame op — the
  * ingest writes shard by `kind`, URL-normalize/dedup are map+shuffle on
  * fact hash, CC shuffles on node key with localCheckpoint'd iterations,
  * and the id-rewrite is a shuffle join on person key (the canonical-id
  * map is person-cardinality — NOT broadcastable at scale; AQE picks the
  * strategy when it does fit). Nothing collects to the driver.
  */
object Workflow {

  private def newMaster(): String =
    graft.Scratch.dir("graft_workflow") + "/master"

  /** The reference's `Debug` print-through predicate
    * (BatchWorkflow.java:277-282) mapped Spark-first: `Dataset.observe`
    * attaches named metrics (row count + any extra aggregates) that
    * materialize WITH the action that runs the query — no second scan, no
    * executor-side printing. Read the numbers from
    * `df.queryExecution.observedMetrics` (or a QueryExecutionListener in
    * production) after the action. Rows pass through untouched.
    */
  def debugObserve(df: org.apache.spark.sql.DataFrame, name: String,
      extra: org.apache.spark.sql.Column*): org.apache.spark.sql.DataFrame =
    df.observe(name, count(lit(1)).as("rows"), extra: _*)

  /** Shared recursive-CTE body: the union-typed equiv graph of
    * equivFactsFromEvents, transitive closure, min-key canonical per node.
    */
  private val ccCte: String = {
    val userKey = GraphOps.userKeySql("u")
    s"""ids AS (SELECT DISTINCT user_id AS u FROM events),
       |e AS (
       |  SELECT $userKey AS src,
       |         ${GraphOps.cookieKeySql("'ck' || lpad(CAST(u % 53 AS VARCHAR), 5, '0')")} AS dst
       |  FROM ids
       |  UNION
       |  SELECT $userKey, ${GraphOps.userKeySql("u % 37")} FROM ids WHERE u % 37 <> u),
       |edges AS (SELECT src AS a, dst AS b FROM e UNION SELECT dst, src FROM e),
       |nodes AS (SELECT DISTINCT a AS node FROM edges),
       |reach AS (
       |  SELECT node, node AS m FROM nodes
       |  UNION
       |  SELECT e2.b AS node, r.m FROM reach r JOIN edges e2 ON e2.a = r.node),
       |cc AS (SELECT node, min(m) AS canonical FROM reach GROUP BY node)""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // IterateEdges over PersonID unions (BatchWorkflow.java:583-605):
    // cookie and user-id nodes in one graph, canonical = smallest id under
    // the union total order (tag first — cookies win over user ids).
    withOracle(
      "connected_components_union",
      s"""WITH RECURSIVE $ccCte
         |SELECT node, canonical FROM cc ORDER BY node""".stripMargin) { (s, dir) =>
      val edges = FactStore.equivFactsFromEvents(s, dir)
        .select(GraphOps.personKey(col("equiv.id1")).as("src"),
          GraphOps.personKey(col("equiv.id2")).as("dst"))
      GraphOps.connectedComponents(edges)
        .select(col("node"), col("label").as("canonical"))
        .orderBy("node")
    },

    // The composed pipeline (BatchWorkflow.java:689-702): a re-delivered
    // ingest batch (absorbed twice) plus equiv facts → normalize URLs on
    // the master facts (:212-221) → deduplicate (:223-233) → CC over the
    // union-typed equiv graph (:561-605) → rewrite pageview person ids
    // from the CC output (:607-619) → pageviews + uniques per (url, hour).
    withOracle(
      "batch_workflow",
      s"""WITH RECURSIVE $ccCte,
         |pv AS (
         |  SELECT DISTINCT user_id, ${Tables.sql.normUrl} AS url,
         |         ${Tables.sql.tsSecs} AS ts_secs, event_id
         |  FROM events),
         |rw AS (
         |  SELECT coalesce(cc.canonical, ${GraphOps.userKeySql("pv.user_id")}) AS person,
         |         pv.url, pv.ts_secs
         |  FROM pv LEFT JOIN cc ON cc.node = ${GraphOps.userKeySql("pv.user_id")})
         |SELECT url, ts_secs // 3600 AS hbv, count(*) AS pageviews,
         |       count(DISTINCT person) AS uniques
         |FROM rw GROUP BY 1, 2 ORDER BY url, hbv""".stripMargin) { (s, dir) =>
      import s.implicits._
      val master = newMaster()
      // materialize the incoming batch once (the reference's staging
      // snapshot, BatchWorkflow.java:152-162) so the re-delivered absorb
      // re-reads the snapshot instead of recomputing the source transform
      val pvFacts = FactStore.eventsAsFacts(s, dir).localCheckpoint()
      // first absorb carries the mixed batch (pageviews + equivs) in one
      // write pass; the second is the re-delivered pageview batch that
      // dedup must collapse
      FactStore.ingest(
        pvFacts.unionAll(FactStore.equivFactsFromEvents(s, dir)), master)
      FactStore.ingest(pvFacts, master) // the re-delivered batch dedup removes
      pvFacts.unpersist()

      val normalized = FactStore.scanKind(s, master, FactKind.PageView)
        .withColumn("pageView", col("pageView").withField("page",
          struct(UrlFunctions.normalizeUrl(col("pageView.page.url")).as("url"))))
        .as[Fact]
      val deduped = FactStore.deduplicate(normalized)

      val edges = FactStore.scanKind(s, master, FactKind.Equiv)
        .select(GraphOps.personKey(col("equiv.id1")).as("src"),
          GraphOps.personKey(col("equiv.id2")).as("dst"))
      val cc = GraphOps.connectedComponents(edges)

      deduped.toDF()
        .select(GraphOps.personKey(col("pageView.person")).as("node"),
          col("pageView.page.url").as("url"),
          col("pedigree.trueAsOfSecs").as("ts_secs"))
        .join(cc, Seq("node"), "left_outer")
        .select(coalesce(col("label"), col("node")).as("person"),
          col("url"), col("ts_secs"))
        .groupBy(col("url"), TimeFunctions.hourBucket(col("ts_secs")).as("hbv"))
        .agg(count(lit(1)).as("pageviews"), countDistinct(col("person")).as("uniques"))
        .orderBy("url", "hbv")
    },

    // Latest-property-wins serving view over person/page property facts
    // (schema.thrift:13-42; pedigree true-as-of is the event time that
    // orders observations). Ties broken by value for determinism.
    withOracle(
      "property_latest",
      s"""WITH pp AS (
         |  SELECT 'person' AS entity, ${GraphOps.userKeySql("user_id")} AS pkey,
         |         event_type AS val, ${Tables.sql.tsSecs} AS ts
         |  FROM events),
         |pg AS (
         |  SELECT 'page' AS entity, 'https://' || event_type || '.example.com' AS pkey,
         |         CAST(CAST(event_id % 1000 AS INT) AS VARCHAR) AS val,
         |         ${Tables.sql.tsSecs} AS ts
         |  FROM events),
         |u AS (SELECT * FROM pp UNION ALL SELECT * FROM pg),
         |r AS (SELECT *, row_number() OVER (
         |        PARTITION BY entity, pkey ORDER BY ts DESC, val DESC) AS rn
         |      FROM u)
         |SELECT entity, pkey, val, ts FROM r WHERE rn = 1
         |ORDER BY entity, pkey""".stripMargin) { (s, dir) =>
      val master = newMaster()
      // one absorb of the mixed-kind batch: the kind-partitioned write
      // routes both property types in a single pass (two separate ingests
      // would scan and commit twice for no semantic difference)
      FactStore.ingest(
        FactStore.personPropertyFactsFromEvents(s, dir)
          .unionAll(FactStore.pagePropertyFactsFromEvents(s, dir)), master)
      val person = FactStore.scanKind(s, master, FactKind.PersonProperty)
        .select(lit("person").as("entity"),
          GraphOps.personKey(col("personProperty.id")).as("pkey"),
          col("personProperty.value.location.city").as("val"),
          col("pedigree.trueAsOfSecs").as("ts"))
      val page = FactStore.scanKind(s, master, FactKind.PageProperty)
        .select(lit("page").as("entity"),
          col("pageProperty.id.url").as("pkey"),
          col("pageProperty.pageViews").cast("string").as("val"),
          col("pedigree.trueAsOfSecs").as("ts"))
      val w = Window.partitionBy("entity", "pkey")
        .orderBy(col("ts").desc, col("val").desc)
      person.unionAll(page)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1).drop("rn")
        .orderBy("entity", "pkey")
    }
  )
}
