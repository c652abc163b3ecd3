package graft

import graft.operators.{LexIndex, TextOps}
import org.apache.spark.sql.functions._

/** The persistent posting-list index: results byte-identical to the
  * direct BM25 scan, query-time scan pruned to the query terms' bucket
  * partitions, stats sidecar self-describing.
  */
class LexIndexSpec extends SparkSpec {
  import spark.implicits._

  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
      Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      allNodes(a.executedPlan)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: allNodes(s.plan)
    case _ => p +: p.children.flatMap(allNodes)
  }

  private def freshDir(): String = Scratch.dir("lexindex_spec")

  private val qTerms = Seq("spark", "merge", "vector")

  test("indexed BM25 equals the direct scan, rank for rank") {
    val docs = Tables.documents(spark, sf0001)
    val dir = freshDir()
    LexIndex.build(spark, docs, dir)
    val direct = TextOps.bm25Rank(TextOps.bm25Scores(docs, qTerms), 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val indexed = LexIndex.bm25TopK(spark, dir, qTerms, k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(direct.nonEmpty && indexed.sameElements(direct),
      s"direct=${direct.mkString(",")} indexed=${indexed.mkString(",")}")
  }

  test("query scan reads only the query terms' bucket partitions") {
    val docs = Tables.documents(spark, sf0001)
    val dir = freshDir()
    LexIndex.build(spark, docs, dir)
    val scores = LexIndex.bm25Scores(spark, dir, qTerms)
    scores.collect() // finalize the executed plan
    val wanted = spark.range(1)
      .select(qTerms.map(t =>
        pmod(xxhash64(lit(t)), lit(LexIndex.DefaultBuckets.toLong))): _*)
      .head().toSeq.map(_.asInstanceOf[Long]).distinct.size
    val scans = allNodes(scores.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "no file scan in the indexed-score plan")
    val scanned = scans.map(_.selectedPartitions.partitionCount).max
    assert(scanned == wanted,
      s"query read $scanned of ${LexIndex.DefaultBuckets} buckets; wanted $wanted")
  }

  test("build + append equals one build over the union, stats totals merged") {
    val docs = Tables.documents(spark, sf0001)
    val whole = freshDir()
    LexIndex.build(spark, docs, whole)
    val grown = freshDir()
    LexIndex.build(spark, docs.where($"doc_id" % 2 === 0), grown)
    LexIndex.append(spark, docs.where($"doc_id" % 2 === 1), grown)
    val a = LexIndex.bm25TopK(spark, whole, qTerms, k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val b = LexIndex.bm25TopK(spark, grown, qTerms, k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(a.nonEmpty && b.sameElements(a),
      s"whole=${a.mkString(",")} grown=${b.mkString(",")}")
    val (sw, sg) = (spark.read.parquet(s"$whole/stats").head(),
      spark.read.parquet(s"$grown/stats").head())
    assert(sg.getAs[Long]("n_docs") == sw.getAs[Long]("n_docs"))
    assert(math.abs(sg.getAs[Double]("sum_dl") - sw.getAs[Double]("sum_dl")) < 1e-6)
  }

  test("consolidate: answers unchanged, appended small files compacted") {
    val docs = Tables.documents(spark, sf0001)
    val dir = freshDir()
    LexIndex.build(spark, docs.where($"doc_id" % 2 === 0), dir)
    LexIndex.append(spark, docs.where($"doc_id" % 2 === 1), dir)
    val before = LexIndex.bm25TopK(spark, dir, qTerms, k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    def parquetFiles(): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$dir/postings"))
        .count(_.getName.endsWith(".parquet"))
    }
    val filesBefore = parquetFiles()
    LexIndex.consolidate(spark, dir)
    val after = LexIndex.bm25TopK(spark, dir, qTerms, k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(after.sameElements(before), "consolidation must not change answers")
    assert(parquetFiles() < filesBefore,
      s"expected fewer postings files after consolidate (before=$filesBefore, after=${parquetFiles()})")
  }

  test("reads are self-describing: a non-default modulus is recovered from stats") {
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma beta"))
      .toDF("doc_id", "text")
    val dir = freshDir()
    LexIndex.build(spark, docs, dir, nBuckets = 7)
    val got = LexIndex.bm25Scores(spark, dir, Seq("beta"))
      .orderBy("doc_id").collect().map(_.getLong(0))
    assert(got.sameElements(Array(1L, 2L)),
      s"both docs must score for 'beta', got ${got.mkString(",")}")
  }
}
