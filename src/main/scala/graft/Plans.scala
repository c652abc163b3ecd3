package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Regenerates PLANS.md: the formatted physical plan of EVERY declared
  * query at sf0.001 — full coverage, so a new query can't ship without
  * its plan appearing here. Plan *properties* (pushdown, pruning,
  * broadcast, partial agg, zero-shuffle band codes, ...) are pinned by
  * PlanSpec/BucketingSpec/PretrainScaleSpec; this file is the
  * human-readable dump the specs guard.
  *
  * Queries that materialize during construction (streaming memory sinks,
  * staged ingest stores, localCheckpoint'd intermediates) render their
  * post-materialization read — the dump flags those plans with a note
  * rather than omitting them, and the eager half's properties are pinned
  * by the streaming/ingest specs.
  */
object Plans {

  /** Plan dumps can embed raw control bytes — e.g. the sample_stratified
    * nullStratum NUL sentinel VALUE rendered into a plan's literal
    * — and ONE such byte makes grep classify the whole artifact as
    * binary (the round-11 PLANS.md carried a NUL at byte 165158).
    * Escape everything below 0x20 except newline/tab (plus DEL) to a
    * visible \\uXXXX so the committed file stays greppable text.
    */
  private def sanitize(s: String): String =
    s.flatMap {
      case c if c == '\n' || c == '\t' => c.toString
      case c if c < 0x20 || c == 0x7f => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private val materializedNote =
    "_Plan contains a local or pre-materialized relation (memory-sink " +
    "result, staged store, localCheckpoint, or literal table): the eager " +
    "half ran during query construction and its plan properties are " +
    "pinned by the specs (PlanSpec / StreamSourceSpec / " +
    "PretrainScaleSpec / BucketingSpec / FactStoreSpec)._"

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("/root/repo/PLANS.md")
    // shared recipe (graft.Sessions) so committed plans == benched plans
    val spark = Sessions.base("local[8]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = SparkEntry.queries.keys.toSeq.sorted
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of all declared queries (sf0.001)\n\n")
    sb.append(s"Regenerated per round; ${names.size} queries. Plan properties are\n")
    sb.append("pinned by PlanSpec and friends — this dump is the human-readable\n")
    sb.append("record those specs guard.\n")
    var failed = 0
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        val note =
          if (plan.contains("LocalTableScan") || plan.contains("ExistingRDD"))
            s"\n$materializedNote\n"
          else ""
        sb.append(s"\n## $name\n$note\n```\n$plan```\n")
      } catch {
        case e: Throwable =>
          failed += 1
          sb.append(s"\n## $name\n\nFAILED to construct: ${e.getMessage}\n")
          System.err.println(s"[plans] $name failed: ${e.getMessage}")
      }
    }
    Files.writeString(Paths.get(out), sanitize(sb.toString))
    println(s"[plans] wrote $out (${names.size} queries, $failed failed)")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
