package graft

import graft.operators.VectorOps
import org.apache.spark.sql.functions._

/** knn_label_propagate's evaluation harness against PLANTED geometry:
  * the declared fixture corpus has labels random w.r.t. embedding
  * geometry, so its emitted accuracy sits at the chance floor by
  * construction — which never showed the harness can detect real
  * signal. Here clusters are planted (tight Gaussian blobs around
  * well-separated random centers, labels = cluster id), the positive
  * control must propagate labels near-perfectly, and a label-shuffled
  * negative control must fall back to ~chance.
  */
class KnnLabelSpec extends SparkSpec {
  import spark.implicits._

  private val NClusters = 10
  private val Dims = 16
  private val PerCluster = 50

  /** (vec_id, label, embedding): `PerCluster` points per cluster, each
    * center ± small noise — within-cluster cosine ≫ cross-cluster.
    * Deterministic (fixed seed).
    */
  private def planted = {
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(NClusters) {
      val v = Array.fill(Dims)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    // cluster by BLOCKS of 5 consecutive ids, so the vec_id % 5 == 0
    // seed split lands exactly one labeled point per block — every
    // cluster gets PerCluster/5 seeds (id-modulo clustering would give
    // the %5 seed set points from clusters 0 and 5 only)
    (0 until NClusters * PerCluster).map { i =>
      val cl = (i / 5) % NClusters
      val e = centers(cl).map(x => x + 0.05f * rnd.nextGaussian().toFloat)
      (i.toLong, cl, e)
    }.toDF("vec_id", "label", "embedding")
  }

  private def accuracy(df: org.apache.spark.sql.DataFrame): Double =
    df.agg(avg(col("is_correct").cast("double"))).head().getDouble(0)

  test("positive control: planted clusters propagate labels at >= 0.9 accuracy") {
    // seed = every 5th point (10 labeled points per cluster); the other
    // 400 points must take their own cluster's label from their nearest
    // labeled neighbors
    val acc = accuracy(
      VectorOps.knnLabelPropagate(planted, col("vec_id") % 5 === 0))
    assert(acc >= 0.9,
      s"planted-geometry accuracy must be near-perfect, got $acc")
  }

  test("negative control: shuffled labels read ~chance through the same harness") {
    // identical geometry, labels decoupled from it: reassign each point
    // a deterministic pseudo-random label. Propagation can then do no
    // better than chance (1/NClusters) up to sampling noise — the
    // honest floor the FIXTURE corpus sits at (BASELINE.md)
    val shuffled = planted.withColumn("label",
      pmod(xxhash64(col("vec_id")), lit(NClusters)).cast("int"))
    val acc = accuracy(
      VectorOps.knnLabelPropagate(shuffled, col("vec_id") % 5 === 0))
    assert(acc < 0.3,
      s"label-shuffled accuracy must collapse toward 1/$NClusters, got $acc")
  }

  test("k caps the vote: each prediction carries at most k votes, majority wins per cluster") {
    val res = VectorOps.knnLabelPropagate(planted, col("vec_id") % 5 === 0, k = 3)
    val bad = res.where(col("n_votes") > 3).count()
    assert(bad == 0, s"$bad predictions carry more than k votes")
    assert(accuracy(res) >= 0.9, "k=3 still propagates planted labels")
  }
}
