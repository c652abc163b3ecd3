package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a typed Aggregator — bounded-memory
  * frequency estimation, the fourth mergeable-sketch family beside HLL
  * (distincts), Theta (set algebra), and KLL (quantiles).
  *
  * The exact streaming top-k (`stream_topk`) keeps one counter per
  * DISTINCT key: state is key-cardinality-sized, which over 100 TB of
  * URLs is itself a scale problem. Misra-Gries keeps at most `k`
  * counters with the classic guarantee
  *
  *   trueCount − n/(k+1)  ≤  estimate  ≤  trueCount
  *
  * (n = stream length), so every key with frequency > n/(k+1) — every
  * true heavy hitter at that threshold — is retained. Summaries MERGE
  * with the same bound (Agarwal et al., "Mergeable Summaries", PODS'12:
  * add counters pointwise, then subtract the (k+1)-largest count and
  * drop non-positive counters), so reduce/merge combine map-side like
  * every aggregate here: a task ships at most k counters regardless of
  * input size.
  *
  * Estimates are the RETAINED count (a lower bound on the true count).
  * Below k distinct keys the sketch never decrements and the counts are
  * EXACT — the fixture spec pins that, plus the error bound under
  * k < cardinality.
  */
object FreqSketch {

  case class Counter(key: String, count: Long)
  case class Summary(items: Seq[Counter])

  /** Buffer: at most k live counters. A Map field product-encodes as
    * MapType — no Kryo (see the verify notes on Kryo under JDK17).
    */
  case class MGBuf(m: Map[String, Long])

  /** String keys → top-k counters by (count DESC, key ASC). */
  case class MisraGries(k: Int) extends Aggregator[String, MGBuf, Summary] {
    require(k >= 1, s"misra-gries needs k >= 1, got $k")

    override def zero: MGBuf = MGBuf(Map.empty)

    override def reduce(b: MGBuf, key: String): MGBuf = {
      val m = b.m
      m.get(key) match {
        case Some(c) => MGBuf(m.updated(key, c + 1))
        case None if m.size < k => MGBuf(m.updated(key, 1L))
        case None =>
          // decrement-all step: every counter pays one; zeros drop. The
          // arriving key is NOT inserted (its count would be 0).
          MGBuf(m.flatMap { case (ky, c) => if (c > 1) Some(ky -> (c - 1)) else None })
      }
    }

    override def merge(a: MGBuf, b: MGBuf): MGBuf = {
      if (a.m.isEmpty) b
      else if (b.m.isEmpty) a
      else {
        val sum = b.m.foldLeft(a.m) { case (m, (ky, c)) =>
          m.updated(ky, m.getOrElse(ky, 0L) + c)
        }
        if (sum.size <= k) MGBuf(sum)
        else {
          // subtract the (k+1)-largest count from all, drop non-positive
          val cut = sum.values.toArray.sorted(Ordering[Long].reverse).apply(k)
          MGBuf(sum.flatMap { case (ky, c) => if (c > cut) Some(ky -> (c - cut)) else None })
        }
      }
    }

    override def finish(b: MGBuf): Summary =
      Summary(b.m.toSeq.sortBy { case (ky, c) => (-c, ky) }
        .map { case (ky, c) => Counter(ky, c) })

    override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
    override def outputEncoder: Encoder[Summary] = Encoders.product[Summary]
  }
}
