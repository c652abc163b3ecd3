package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Regenerates PLANS.md: the formatted physical plan of each headline
  * query at sf0.001. Plan *properties* (pushdown, pruning, broadcast,
  * partial agg, zero-shuffle band codes, ...) are pinned by PlanSpec;
  * this file is the human-readable dump the specs guard.
  */
object Plans {
  val headline: Seq[String] = Seq(
    "q1_agg", "q3_shipping", "q5_local_supplier", "q18_large_orders",
    "join_asof", "join_range", "agg_rollup_granularity", "join_inner", "join_semi",
    "sessionize_visits", "connected_components", "similarity_topk",
    "near_dedup_cosine", "text_ngram_jaccard", "scan_pruned",
    // serving_merge is excluded: building its DataFrame executes the
    // streaming half into a memory sink, so the dump would both run a
    // streaming job per regeneration and render that side as an opaque
    // LocalTableScan
    "agg_rollup_sets", "batch_workflow", "property_latest",
    "near_dedup_apply", "ann_lsh", "pipeline_pretraining_corpus",
    "multimodal_frame_sample",
    // corpus-construction ops (contamination_check is excluded for the
    // same reason as serving_merge: its candidate join materializes
    // eagerly via localCheckpoint)
    "shard_pack", "sample_stratified", "sample_token_budget",
    "embedding_quantize", "embedding_centroid",
    "text_langid", "doc_winnow_fingerprint", "text_token_count_bpe",
    // round-6 additions (dedup_incremental is excluded: its survivor set
    // materializes eagerly via localCheckpoint, like contamination_check)
    "text_repetition", "text_pii_scrub", "text_unigram_logprob",
    "pack_sequences", "corpus_mix_weights", "window_lag_delta",
    "agg_stats")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("/root/repo/PLANS.md")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of headline queries (sf0.001)\n\n")
    sb.append("Regenerated per round; plan properties pinned by PlanSpec/BucketingSpec.\n")
    headline.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      sb.append(s"\n## $name\n\n```\n$plan```\n")
    }
    // sink_partitioned's query lambda runs its ingest eagerly when the
    // DataFrame is built; dump the read-back plan (the half PlanSpec pins
    // — PartitionFilters on the partition predicate) over a store staged
    // once here, so regenerating PLANS.md doesn't re-run the write job
    // inside plan construction.
    locally {
      val store = Files.createTempDirectory("graft_plans").toString + "/store"
      graft.operators.IngestOps.stagePartitionedStore(spark, sfDir, store)
      val df = graft.operators.IngestOps.partitionedReadBack(spark, store)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      sb.append(s"\n## sink_partitioned (read-back over a pre-staged store)\n\n```\n$plan```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    spark.stop()
  }
}
