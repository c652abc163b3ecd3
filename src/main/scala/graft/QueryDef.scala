package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator query (SURVEY.md §2): a Spark implementation and,
  * when SQL-expressible, an equivalent DuckDB oracle over the same parquet
  * tables. Declared queries must be deterministic: total ORDER BY over key
  * columns, exact/int aggregates preferred, floats rounded (SURVEY.md §2
  * preamble), and column names aligned Spark<->oracle (driver hashes values
  * under name-sorted columns).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def withOracle(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(sql))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
