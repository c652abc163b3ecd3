package graft

import org.apache.spark.sql.SparkSession

/** ONE session recipe for every harness (Bench / Verify / Plans / Scaling
  * / Attrib / Recall / Prof), so the plans that are verified against the
  * oracle, the plans committed to PLANS.md, and the plans the bench times
  * are the same physical plans. Round-18's verdict flagged the drift:
  * `canChangeCachedPlanOutputPartitioning` was set only in the measurement
  * sessions, so benched shuffles differed from verified ones.
  *
  * Conf rationale (all scale-neutral, none core-count-derived):
  *  - nanosAsLong: events.parquet stores TIMESTAMP(NANOS); read as Long.
  *  - committer v2: one rename per task at commit — the ingest queries pay
  *    two parquet commits each by design; v1's extra sequential rename
  *    pass is pure fixed cost on FS-backed stores (object-store
  *    deployments swap in their own committer).
  *  - canChangeCachedPlanOutputPartitioning=true: lets AQE apply byte-
  *    sized coalescing (advisoryPartitionSizeInBytes) under persisted
  *    plans too; default-off for cached-plan-reuse stability, not
  *    correctness. Measured at sf0.1: stream_lex_append 451 → 79 tasks.
  *    A 100 TB shuffle keeps its parallelism — only tiny shuffles
  *    collapse.
  */
object Sessions {
  def base(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")

  /** base() with master/partitions derived from $SPARK_GRAFT_CPUS (the
    * driver contract's core-count seam). */
  def fromEnv(defaultCpus: String): SparkSession.Builder = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)
    base(s"local[$cpus]", cpus)
  }
}
