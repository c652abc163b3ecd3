package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from the per-module operator registries; each
  * module entry is a SURVEY.md §2 operator ID with its Spark implementation
  * and (when SQL-expressible) a DuckDB oracle.
  */
object SparkEntry {

  lazy val modules: Seq[QueryDef] =
    operators.BatchViews.defs ++
      operators.Relational.defs ++
      operators.Analytics.defs ++
      operators.AsofJoin.defs ++
      operators.RangeJoin.defs ++
      operators.Sessionize.defs ++
      operators.Uniques.defs ++
      operators.GraphOps.defs ++
      operators.Workflow.defs ++
      operators.TextOps.defs ++
      operators.Bpe.defs ++
      operators.CorpusOps.defs ++
      operators.VectorOps.defs ++
      operators.NearDedup.defs ++
      operators.Multimodal.defs ++
      operators.Skew.defs ++
      operators.Quality.defs ++
      operators.QualityFilter.defs ++
      operators.Layout.defs ++
      operators.IngestOps.defs ++
      streaming.StreamViews.defs ++
      sources.TextSources.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Pageviews-over-time — the book's flagship batch view
    * (reference: src/java/manning/batchlayer/BatchWorkflow.java:284-302).
    */
  def entry(spark: SparkSession): DataFrame =
    operators.BatchViews.pageviewsOverTime(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val names = modules.map(_.name)
    val dups = names.diff(names.distinct).distinct
    require(dups.isEmpty, s"duplicate query names would shadow each other: ${dups.mkString(", ")}")
    modules.map(d => d.name -> d.fn).toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  lazy val oracleSql: Map[String, String] =
    modules.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
