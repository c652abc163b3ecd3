package graft

import org.apache.spark.sql.functions._

/** The user-facing facade: every flow runs over caller-constructed
  * DataFrames (no fixture tables) — the "a user of the reference could
  * switch" surface.
  */
class EngineSpec extends SparkSpec {
  import spark.implicits._

  test("text near-dedup flow: pairs -> drop, over caller DataFrames") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (3L, "completely different content about distributed shuffle exchange operators"))
      .toDF("doc_id", "text")
    val pairs = Engine.nearDupPairs(docs, threshold = 0.5)
    val got = pairs.select("i", "j").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)), s"expected the near-dup pair, got $got")
    val canon = Engine.dropNearDuplicates(docs, pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(canon == Set(1L, 3L), "min-id canonical kept, duplicate dropped")
  }

  test("dropNearDuplicatesBy keeps the highest-priority duplicate, ties to min id") {
    val docs = Seq(
      (1L, "dup cluster a", 0.2),
      (2L, "dup cluster a variant", 0.9),
      (3L, "dup cluster a variant two", 0.9),
      (4L, "standalone", 0.1))
      .toDF("doc_id", "text", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("i", "j")
    val kept = Engine.dropNearDuplicatesBy(docs, pairs, col("quality"))
      .select("doc_id").as[Long].collect().toSet
    // cluster {1,2,3}: 2 and 3 tie on quality 0.9 -> keep 2; 4 untouched
    assert(kept == Set(2L, 4L), s"got $kept")
  }

  test("embedding flow: cosine near-dup pairs and ANN top-k over caller DataFrames") {
    val rnd = new scala.util.Random(7)
    def vec(seedShift: Double): Array[Float] =
      Array.tabulate(16)(i => (math.sin(i + seedShift) + rnd.nextGaussian() * 0.01).toFloat)
    val emb = (0L until 40L).map { i =>
      // ids 0 and 1 are near-identical; the rest random-ish
      if (i == 1L) (i, vec(0.0)) else (i, vec(i.toDouble))
    }.toDF("vec_id", "embedding")
    val pairs = Engine.cosineNearDupPairs(spark, emb, threshold = 0.95)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), s"planted near-dup must be found, got $pairs")
    val hits = Engine.annTopK(spark, emb, probeFilter = col("vec_id") === 0L,
      k = 3, nProbe = 8, rerank = 8)
    val top = hits.orderBy("rank").select("neighbor_id").as[Long].head()
    assert(top == 1L, s"nearest neighbor of 0 must be its near-copy 1, got $top")
  }

  test("semanticNearDupPairs routes to the multi-assign form by default") {
    // two tight clusters straddling nothing: the planted near-identical
    // pair must surface through the DEFAULT (multi-assign) path, and the
    // explicit nAssign=1 knob must still be accepted
    val rnd = new scala.util.Random(11)
    def vec(seedShift: Double): Array[Float] =
      Array.tabulate(16)(i => (math.sin(i + seedShift) + rnd.nextGaussian() * 0.01).toFloat)
    val emb = (0L until 40L).map { i =>
      if (i == 1L) (i, vec(0.0)) else (i, vec(i.toDouble))
    }.toDF("vec_id", "embedding")
    val pairs = Engine.semanticNearDupPairs(spark, emb, threshold = 0.95)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), s"default (multi-assign) path missed the dup: $pairs")
    val single = Engine.semanticNearDupPairs(spark, emb, threshold = 0.95, nAssign = 1)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(single.subsetOf(pairs), "single-assign pairs must be a subset of multi-assign")
  }

  test("family aliases are the operator objects (stable API points)") {
    assert(Engine.text eq operators.TextOps)
    assert(Engine.dedup eq operators.NearDedup)
    assert(Engine.vectors eq operators.VectorOps)
    assert(Engine.index eq operators.VectorIndex)
    assert(Engine.graph eq operators.GraphOps)
    assert(Engine.store eq model.FactStore)
    assert(Engine.labels eq streaming.LabelStore)
    assert(Engine.serving eq model.ServingPointer)
  }

  test("rebuildAndFlip stages into a fresh version and commits the pointer") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_engine_rebuild").toString + "/root"
    val docs = Tables.documents(spark, sf0001).limit(100)
    val v0 = Engine.rebuildAndFlip(spark, root)(
      operators.LexIndex.build(spark, docs, _, nBuckets = 4))
    assert(v0 == 0L && Engine.serving.resolve(spark, root)
      .contains(Engine.serving.versionDir(root, 0)))
    val before = operators.LexIndex.bm25TopK(spark,
      Engine.serving.resolve(spark, root).get, Seq("spark", "data"), k = 5)
      .collect().map(_.toSeq).toSeq
    val v1 = Engine.rebuildAndFlip(spark, root)(
      operators.LexIndex.build(spark, docs, _, nBuckets = 16))
    assert(v1 == 1L)
    val after = operators.LexIndex.bm25TopK(spark,
      Engine.serving.resolve(spark, root).get, Seq("spark", "data"), k = 5)
      .collect().map(_.toSeq).toSeq
    assert(after == before, "same corpus across the flip -> same answers")
  }
}
