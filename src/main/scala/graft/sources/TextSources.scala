package graft.sources

import java.nio.file.Files

import graft.{QueryDef, Tables}
import graft.QueryDef.withOracle
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Non-parquet source formats (the reference's only format is
  * Thrift-in-SequenceFile; a Spark-native engine must also ingest the
  * interchange formats a 100 TB corpus actually arrives in). Declared as
  * write→read round-trips with explicit schemas — schema-first, no
  * inference in production paths (SURVEY.md §1.4) — whose read-back
  * aggregates the DuckDB oracle predicts from the original table.
  */
object TextSources {

  private def stage(): String =
    graft.Scratch.dir("graft_src")

  private val eventSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("event_type", StringType), StructField("value", DoubleType)))

  private def eventsSlim(s: SparkSession, dir: String) =
    Tables.eventsRaw(s, dir).select("event_id", "user_id", "event_type", "value")

  val defs: Seq[QueryDef] = Seq(

    withOracle(
      "source_csv",
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val path = stage() + "/events_csv"
      eventsSlim(s, dir).write.option("header", "true").csv(path)
      s.read.schema(eventSchema).option("header", "true").csv(path)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        .orderBy("event_type")
    },

    withOracle(
      "source_json",
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val path = stage() + "/events_json"
      eventsSlim(s, dir).write.json(path)
      s.read.schema(eventSchema).json(path)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        .orderBy("event_type")
    },

    // Line-oriented raw text — how web corpora actually arrive at 100 TB
    // (one document per line: the WET/plain-text tier below JSONL).
    // Round-trip: stage each doc's text as one line, read back with
    // `spark.read.text`, recompute corpus stats from the raw lines. The
    // oracle computes the same stats from the source table — the
    // round-trip must be content-lossless. One-doc-one-line is ENFORCED
    // at the write, not assumed: nulls are dropped (write.text throws
    // on them) and embedded newlines normalized to spaces — a doc
    // containing \n would otherwise silently split into extra lines and
    // inflate n_lines vs the oracle. The oracle applies the IDENTICAL
    // normalization (char count preserved: \n → one space; token splits
    // unchanged: both are \s+). Scale: text splits by line within
    // files; no schema inference pass.
    withOracle(
      "source_text",
      """SELECT CAST(count(*) AS BIGINT) AS n_lines,
        |       CAST(sum(length(regexp_replace(text, '[\r\n]', ' ', 'g'))) AS BIGINT)
        |         AS total_chars,
        |       CAST(sum(len(string_split_regex(lower(text), '\s+'))) AS BIGINT)
        |         AS total_tokens
        |FROM documents WHERE text IS NOT NULL""".stripMargin) { (s, dir) =>
      val path = stage() + "/docs_txt"
      Tables.documents(s, dir)
        .where(col("text").isNotNull)
        .select(regexp_replace(col("text"), "[\\r\\n]", " ").as("text"))
        .write.text(path)
      s.read.text(path)
        .agg(count(lit(1)).cast("long").as("n_lines"),
          sum(length(col("value"))).cast("long").as("total_chars"),
          sum(size(graft.functions.TextFunctions.tokens(col("value"))))
            .cast("long").as("total_tokens"))
    },

    // Whole-file binary ingest: `binaryFile` is how image/audio/video
    // corpora enter Spark — one row per file with (path, length,
    // content). Staged here as one file per document (partitionBy on a
    // unique key), read back whole; the oracle predicts file count and
    // total bytes from the source table (ASCII fixture: bytes = chars,
    // +1 per file for the text writer's newline).
    //
    // Scale: binaryFile parallelizes by file; maxPartitionBytes groups
    // small files per task, pathGlobFilter/recursiveFileLookup prune at
    // listing time — the multimodal decode pipeline (Multimodal.scala)
    // starts from exactly this row shape.
    withOracle(
      "source_binary",
      """SELECT CAST(count(*) AS BIGINT) AS n_files,
        |       CAST(sum(n_chars) + count(*) AS BIGINT) AS total_bytes
        |FROM documents WHERE doc_id < 20""".stripMargin) { (s, dir) =>
      val path = stage() + "/docs_bin"
      Tables.documents(s, dir).where(col("doc_id") < 20)
        .select(col("doc_id"), col("text"))
        .write.partitionBy("doc_id").text(path)
      s.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt")
        .option("recursiveFileLookup", "true")
        .load(path)
        .agg(count(lit(1)).as("n_files"),
          sum(length(col("content"))).as("total_bytes"))
    },

    // ORC round-trip: the other columnar interchange format large
    // archives arrive in. Same pushdown properties as parquet (predicate
    // + column pruning reach the ORC reader), so the scale argument is
    // the parquet one; the oracle checks content, not format.
    withOracle(
      "source_orc",
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val path = stage() + "/events_orc"
      eventsSlim(s, dir).write.orc(path)
      s.read.schema(eventSchema).orc(path)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        .orderBy("event_type")
    }
  )
}
