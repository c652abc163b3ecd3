package graft

import graft.functions.FreqSketch
import graft.functions.FreqSketch.{MGBuf, MisraGries}
import org.apache.spark.sql.functions._

/** Misra-Gries sketch: exactness below k, the n/(k+1) error bound and
  * heavy-hitter retention under k < cardinality, merge bound under
  * arbitrary splits, and map-side partial aggregation in the plan.
  */
class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  private def foldAll(mg: MisraGries, xs: Seq[String]): Map[String, Long] =
    xs.foldLeft(mg.zero)((b, x) => mg.reduce(b, x)).m

  // deterministic skewed stream: zipf-ish over 20 keys, 4000 items
  private val stream: Seq[String] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(4000)(s"k${math.min(19, math.abs(rnd.nextGaussian() * 4).toInt)}")
  }
  private val truth: Map[String, Long] =
    stream.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("exact counts when distinct keys never exceed k") {
    val mg = MisraGries(25) // 20 distinct < k
    val got = foldAll(mg, stream)
    assert(got == truth)
  }

  test("n/(k+1) lower-bound error and heavy-hitter retention at k=8") {
    val mg = MisraGries(8)
    val got = foldAll(mg, stream)
    assert(got.size <= 8)
    val slack = stream.size.toDouble / (8 + 1)
    got.foreach { case (ky, est) =>
      assert(est <= truth(ky), s"$ky overestimated: $est > ${truth(ky)}")
      assert(est >= truth(ky) - slack, s"$ky est $est below ${truth(ky)} - $slack")
    }
    // every key with true frequency > n/(k+1) must be retained
    truth.filter(_._2 > slack).keys.foreach { hh =>
      assert(got.contains(hh), s"heavy hitter $hh lost")
    }
  }

  test("merged partitions obey the same bound as the sequential fold") {
    val mg = MisraGries(8)
    val parts = stream.grouped(977).toSeq // uneven splits
    val merged = parts.map(p => MGBuf(foldAll(mg, p)))
      .reduce((a, b) => mg.merge(a, b)).m
    assert(merged.size <= 8)
    val slack = stream.size.toDouble / (8 + 1)
    merged.foreach { case (ky, est) =>
      assert(est <= truth(ky) && est >= truth(ky) - slack,
        s"$ky merged est $est outside [${truth(ky) - slack}, ${truth(ky)}]")
    }
    truth.filter(_._2 > slack).keys.foreach { hh =>
      assert(merged.contains(hh), s"heavy hitter $hh lost after merge")
    }
  }

  test("approx_heavy_hitters aggregates map-side (partial ObjectHashAggregate)") {
    val plan = SparkEntry.queries("approx_heavy_hitters")(spark, sf0001)
      .queryExecution.executedPlan.toString
    val aggs = "(?m)ObjectHashAggregate".r.findAllIn(plan).size
    assert(aggs >= 2, s"expected partial+final ObjectHashAggregate, plan:\n$plan")
  }

  private def cmFold(cm: FreqSketch.CountMin, xs: Seq[String]): FreqSketch.CMSketch =
    xs.foldLeft(cm.zero)((b, x) => cm.reduce(b, x))

  test("count-min never underestimates, and meets the eps*n bound under forced collisions") {
    // w=32 against 20 distinct keys forces real cell sharing
    val cm = FreqSketch.CountMin(32, 3)
    val sk = cmFold(cm, stream)
    val epsN = math.ceil(math.E / 32 * stream.size).toLong
    truth.foreach { case (ky, t) =>
      val est = FreqSketch.CountMin.estimate(sk.counts, 32, 3, ky)
      assert(est >= t, s"$ky underestimated: $est < $t")
      assert(est <= t + epsN, s"$ky est $est above $t + $epsN")
    }
    // a never-seen key reads only others' collisions: bounded the same way
    val ghost = FreqSketch.CountMin.estimate(sk.counts, 32, 3, "never-seen")
    assert(ghost <= epsN, s"ghost key read $ghost > $epsN")
  }

  test("count-min merge is exactly the sequential fold (pointwise add)") {
    val cm = FreqSketch.CountMin(64, 4)
    val whole = cmFold(cm, stream)
    val merged = stream.grouped(977).toSeq.map(cmFold(cm, _)).reduce(cm.merge)
    assert(merged.counts.toSeq == whole.counts.toSeq)
  }

  test("count-min is exact when cardinality is collision-free (large w)") {
    val cm = FreqSketch.CountMin(4096, 3)
    val sk = cmFold(cm, stream)
    truth.foreach { case (ky, t) =>
      assert(FreqSketch.CountMin.estimate(sk.counts, 4096, 3, ky) == t)
    }
  }

  test("estimateColumn (codegen readout) equals the JVM estimate cell-for-cell") {
    // a COLLIDING shape (w=32), so agreement requires the column-side
    // seeded Murmur3Hash and the aggregator-side cell() to share the
    // exact hash — not merely both being "close enough" estimates
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val (w, d) = (32, 3)
    val cm = FreqSketch.CountMin(w, d)
    val sk = cmFold(cm, stream)
    val keys = truth.keys.toSeq :+ "never-seen"
    val got = keys.toDF("key")
      .crossJoin(Seq(Tuple1(sk.counts)).toDF("counts"))
      .select(col("key"),
        FreqSketch.CountMin.estimateColumn(col("counts"), col("key"), w, d).as("est"))
      .as[(String, Long)].collect().toMap
    keys.foreach { ky =>
      assert(got(ky) == FreqSketch.CountMin.estimate(sk.counts, w, d, ky),
        s"column and JVM readouts disagree for $ky")
    }
  }

  test("count-min inner product bounds the exact equi-join size") {
    val rnd = new scala.util.Random(11)
    val a = Seq.fill(3000)(s"k${rnd.nextInt(40)}")
    val b = Seq.fill(2000)(s"k${rnd.nextInt(60)}")
    val exact = {
      val fb = b.groupBy(identity).view.mapValues(_.size.toLong).toMap
      a.groupBy(identity).view.mapValues(_.size.toLong).toMap
        .map { case (k, fa) => fa * fb.getOrElse(k, 0L) }.sum
    }
    val cm = FreqSketch.CountMin(64, 4)
    val est = FreqSketch.CountMin.innerProduct(
      cmFold(cm, a).counts, cmFold(cm, b).counts, 64, 4)
    assert(est >= exact, s"join size underestimated: $est < $exact")
    val bound = exact + math.ceil(math.E / 64 * a.size.toLong * b.size).toLong
    assert(est <= bound, s"join size est $est above $exact + slack ($bound)")
    // collision-free shape estimates exactly
    val big = FreqSketch.CountMin(4096, 3)
    assert(FreqSketch.CountMin.innerProduct(
      cmFold(big, a).counts, cmFold(big, b).counts, 4096, 3) == exact)
  }

  test("approx_count_min aggregates map-side (partial ObjectHashAggregate)") {
    val plan = SparkEntry.queries("approx_count_min")(spark, sf0001)
      .queryExecution.executedPlan.toString
    val aggs = "(?m)ObjectHashAggregate".r.findAllIn(plan).size
    assert(aggs >= 2, s"expected partial+final ObjectHashAggregate, plan:\n$plan")
  }
}
