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

  // Array, not Seq: the Aggregator contract lets reduce/merge mutate and
  // return their first argument, so the d·w grid is allocated once per
  // hash-map buffer and incremented in place — a Seq would force a full
  // O(w·d) copy per input row on the per-fact-row hot path.
  case class CMSketch(counts: Array[Long])

  /** Count-Min sketch (Cormode & Muthukrishnan, J.Alg'05): d hash rows ×
    * w counters; a key increments one cell per row and a point query
    * takes the MIN over its d cells. Complements Misra-Gries in the
    * sketch family: MG answers "which keys are heavy" (it keeps keys,
    * but only k of them), CM answers "how frequent is THIS key" for ANY
    * key — state is a fixed d·w counter grid whatever the cardinality,
    * and merge is pointwise addition (exactly lossless, unlike MG's
    * subtract-and-drop), so partial aggregation ships d·w longs per task.
    *
    * Guarantees: estimate ≥ trueCount always (increments are never
    * lost); estimate ≤ trueCount + ⌈e/w·n⌉ with probability 1 − e^(−d)
    * per query (n = stream length). Collision-free cardinalities (≪ w)
    * estimate EXACTLY — the fixture queries pin that against the exact
    * GROUP BY; the bounds under forced collisions live in FreqSketchSpec.
    */
  case class CountMin(w: Int, d: Int) extends Aggregator[String, CMSketch, CMSketch] {
    require(w >= 2 && d >= 1, s"count-min needs w >= 2, d >= 1, got ($w, $d)")

    override def zero: CMSketch = CMSketch(new Array[Long](w * d))

    override def reduce(b: CMSketch, key: String): CMSketch = {
      val a = b.counts
      // one UTF-8 encode per input row, not one per hash row — reduce
      // is the per-fact-row hot path (d× redundant encodings otherwise)
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(key)
      var r = 0
      while (r < d) {
        a(r * w + CountMin.cellOf(u, r, w)) += 1
        r += 1
      }
      b
    }

    override def merge(a: CMSketch, b: CMSketch): CMSketch = {
      val x = a.counts
      val y = b.counts
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      a
    }

    override def finish(b: CMSketch): CMSketch = b

    override def bufferEncoder: Encoder[CMSketch] = Encoders.product[CMSketch]
    override def outputEncoder: Encoder[CMSketch] = Encoders.product[CMSketch]
  }

  object CountMin {
    /** Row r's cell for `key`: seeded Murmur3 over the UTF8 bytes —
      * EXACTLY the value Spark's codegen'd `Murmur3Hash(key, seed = r)`
      * computes, so the column-expression readout
      * ([[estimateColumn]]) and this JVM-side increment path always
      * agree cell-for-cell. Floor-mod into [0, w).
      */
    private[functions] def cell(key: String, r: Int, w: Int): Int =
      cellOf(org.apache.spark.unsafe.types.UTF8String.fromString(key), r, w)

    private[functions] def cellOf(u: org.apache.spark.unsafe.types.UTF8String,
        r: Int, w: Int): Int =
      java.lang.Math.floorMod(
        org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
          u.getBaseObject, u.getBaseOffset, u.numBytes(), r), w)

    /** Point query: min over the key's d cells. Serving-side readout for
      * a handful of probe keys — not a per-fact-row hot path.
      */
    def estimate(counts: Seq[Long], w: Int, d: Int, key: String): Long = {
      var best = Long.MaxValue
      var r = 0
      while (r < d) {
        val c = counts(r * w + cell(key, r, w))
        if (c < best) best = c
        r += 1
      }
      best
    }

    /** The point query as a pure column expression: least over the d
      * rows of `element_at(counts, r·w + floorMod(murmur3_r(key), w))`.
      * Identical to [[estimate]] by the shared hash (spec-pinned); being
      * expression-built it rides whole-stage codegen — no closure UDF
      * anywhere on the sketch path.
      */
    def estimateColumn(counts: org.apache.spark.sql.Column,
        key: org.apache.spark.sql.Column, w: Int, d: Int): org.apache.spark.sql.Column = {
      import org.apache.spark.sql.functions.{element_at, least, lit, pmod}
      val cells = (0 until d).map { r =>
        element_at(counts,
          lit(r * w) + pmod(org.apache.spark.sql.graft.SketchNative.murmur3(key, r),
            lit(w)) + 1)
      }
      if (cells.size == 1) cells.head else least(cells: _*)
    }

    /** Equi-join SIZE estimate from two same-shaped sketches (Cormode &
      * Muthukrishnan §4.2): |A ⋈ B| = Σ_k f_A(k)·f_B(k) is estimated by
      * min over rows of the per-row inner product. Never underestimates;
      * over by ≤ e/w · |A|·|B| w.p. 1 − e^(−d). The planner-diagnostics
      * use: both sides' sketches are map-side-combinable aggregates, so
      * a join's output size is estimated from two O(d·w) summaries
      * BEFORE committing to its shuffle — at 100 TB that is the
      * difference between picking a broadcast and discovering a
      * 10¹²-row blowup at runtime.
      */
    def innerProduct(a: Seq[Long], b: Seq[Long], w: Int, d: Int): Long = {
      require(a.length == w * d && b.length == w * d,
        s"sketch shapes differ: ${a.length} vs ${b.length} vs $w*$d")
      var best = Long.MaxValue
      var r = 0
      while (r < d) {
        var s = 0L
        var i = r * w
        while (i < (r + 1) * w) { s += a(i) * b(i); i += 1 }
        if (s < best) best = s
        r += 1
      }
      best
    }
  }
}
