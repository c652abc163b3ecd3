package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded-heap top-k aggregation (SURVEY.md §2.8: the
  * `CascalogBuffer` per-group-reduce extension point as a Spark
  * `Aggregator[IN, BUF, OUT]`).
  *
  * This is the skew-proof form of "limit per group": the buffer never
  * holds more than k rows, reduce/merge are associative+commutative, so
  * Spark combines MAP-SIDE — a key with a billion rows ships at most k
  * rows per upstream partition to the shuffle, where the window form
  * sorts the entire group in one task. The window form
  * (`topk_per_group`) stays the default for high-cardinality keys; this
  * replaces it when per-key volume is the risk.
  *
  * Ordering: value DESC, id ASC — identical to the window form's
  * `ORDER BY o_totalprice DESC, o_orderkey` so the two agree exactly.
  *
  * The buffer is a pair of primitive arrays kept insertion-sorted
  * (HeapBuf), mutated in place: the common-case row — below a full
  * buffer's floor — costs one comparison and zero allocation, and an
  * improving row costs one arraycopy shift of < k elements. The previous
  * boxed-Seq buffer re-sorted a fresh Vector per improving row, which at
  * sf0.1 made the aggregate ~6.7× the window form.
  */
object TopKAgg {

  case class Entry(value: Double, id: Long)
  case class Buf(items: Seq[Entry])

  /** Insertion-sorted primitive buffer: slots [0, size) of the k-length
    * arrays are live, in output order (value DESC, id ASC). Trailing
    * slots are garbage — `size` guards every read, including after an
    * encoder round trip (sort-based fallback / shuffle).
    */
  case class HeapBuf(var size: Int, values: Array[Double], ids: Array[Long])

  /** (id, value) rows → the k largest by (value DESC, id ASC). */
  case class TopK(k: Int) extends Aggregator[(Long, Double), HeapBuf, Buf] {
    require(k >= 1, s"top-k needs k >= 1, got $k")

    // java.lang.Double.compare gives a TOTAL order (NaN comparable, -0.0
    // < 0.0) — `>`/`==` on primitives is not a strict weak ordering under
    // NaN, which would both corrupt the bounded-buffer gate (a real value
    // neither beats nor ties a NaN floor, so it's dropped) and make merge
    // split-order-dependent
    private def before(v1: Double, id1: Long, v2: Double, id2: Long): Boolean = {
      val c = java.lang.Double.compare(v2, v1) // value DESC
      c < 0 || (c == 0 && id1 < id2)
    }

    override def zero: HeapBuf =
      HeapBuf(0, new Array[Double](k), new Array[Long](k))

    override def reduce(b: HeapBuf, a: (Long, Double)): HeapBuf = {
      val v = a._2
      val id = a._1
      // bounded-buffer gate: full and not ahead of the floor → untouched
      if (b.size >= k && !before(v, id, b.values(k - 1), b.ids(k - 1))) b
      else {
        // insertion position: everything in [0, i) stays ahead of the row
        var i = if (b.size < k) b.size else k - 1
        while (i > 0 && !before(b.values(i - 1), b.ids(i - 1), v, id)) i -= 1
        val keep = math.min(b.size, k - 1) // last slot drops when full
        System.arraycopy(b.values, i, b.values, i + 1, keep - i)
        System.arraycopy(b.ids, i, b.ids, i + 1, keep - i)
        b.values(i) = v
        b.ids(i) = id
        b.size = math.min(b.size + 1, k)
        b
      }
    }

    override def merge(x: HeapBuf, y: HeapBuf): HeapBuf = {
      if (y.size == 0) x
      else if (x.size == 0) y
      else {
        // both sides sorted: two-pointer merge of the first k
        val vs = new Array[Double](k)
        val is = new Array[Long](k)
        var i = 0; var j = 0; var n = 0
        while (n < k && (i < x.size || j < y.size)) {
          val takeX = j >= y.size ||
            (i < x.size && before(x.values(i), x.ids(i), y.values(j), y.ids(j)))
          if (takeX) { vs(n) = x.values(i); is(n) = x.ids(i); i += 1 }
          else { vs(n) = y.values(j); is(n) = y.ids(j); j += 1 }
          n += 1
        }
        HeapBuf(n, vs, is)
      }
    }

    override def finish(b: HeapBuf): Buf =
      Buf((0 until b.size).map(i => Entry(b.values(i), b.ids(i))))

    override def bufferEncoder: Encoder[HeapBuf] = Encoders.product[HeapBuf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }
}
