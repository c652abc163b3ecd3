package graft

import graft.operators.VectorOps
import org.apache.spark.sql.functions._

/** The composed embedding-corpus pipeline (dedup → index → serve):
  * survivor-set soundness against the exact all-pairs form and the
  * serving contract of the search stage.
  */
class EmbeddingPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("dedup-then-index pipeline: sound survivors, served answers from survivors only") {
    val emb = Tables.embeddings(spark, sf001)
    val result = SparkEntry.queries("pipeline_embedding_corpus")(spark, sf001)
    val rows = result.collect()
    assert(rows.nonEmpty)

    // reconstruct the survivor rule independently: every non-survivor
    // must be justified by an EXACT cosine >= threshold to some other
    // vector (the LSH pairs are exact-verified, so no vector may be
    // dropped without a true near-dup somewhere)
    val exactPairs = SparkEntry.queries("near_dedup_cosine")(spark, sf001)
      .select($"i", $"j").collect().map(r => (r.getLong(0), r.getLong(1)))
    val inSomePair = (exactPairs.map(_._1) ++ exactPairs.map(_._2)).toSet
    val all = emb.select($"vec_id").collect().map(_.getLong(0)).toSet
    val neighbors = rows.map(_.getLong(2)).toSet
    assert(neighbors.subsetOf(all))
    val pairsDf = VectorOps.cosineNearDupLsh(spark, emb, threshold = 0.4)
      .select($"i".as("src"), $"j".as("dst"))
    val cc = graft.operators.GraphOps.connectedComponents(pairsDf)
      .select($"node".as("vec_id"), $"label".as("canonical"))
    val survivors = emb
      .join(cc, Seq("vec_id"), "left_outer")
      .where($"canonical".isNull || $"canonical" === $"vec_id")
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    val removed = all -- survivors
    assert(removed.forall(inSomePair),
      s"vectors removed without an exact near-dup: ${removed.filterNot(inSomePair)}")
    assert(neighbors.subsetOf(survivors),
      "served neighbors must come from the deduplicated corpus")

    // serving contract: <= k answers per probe, ranks contiguous from 1,
    // emitted cosines exact
    val byProbe = rows.groupBy(_.getLong(0))
    byProbe.foreach { case (_, rs) =>
      assert(rs.length <= 5)
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length))
    }
    val a = emb.select($"vec_id".as("probe_id"), $"embedding".as("pa"))
    val b = emb.select($"vec_id".as("neighbor_id"), $"embedding".as("pb"))
    val bad = result.join(a, "probe_id").join(b, "neighbor_id")
      .withColumn("exact", round(VectorOps.cosine($"pa", $"pb"), 4))
      .where($"exact" =!= $"cos").count()
    assert(bad == 0, "served cosines must be exact")
  }
}
