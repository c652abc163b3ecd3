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
  */
object TopKAgg {

  case class Entry(value: Double, id: Long)
  case class Buf(items: Seq[Entry])

  /** (id, value) rows → the k largest by (value DESC, id ASC). */
  case class TopK(k: Int) extends Aggregator[(Long, Double), Buf, Buf] {
    // java.lang.Double.compare gives a TOTAL order (NaN comparable, -0.0
    // < 0.0) — `>`/`==` on primitives is not a strict weak ordering under
    // NaN, which would both corrupt the bounded-buffer gate (a real value
    // neither beats nor ties a NaN floor, so it's dropped) and make merge
    // split-order-dependent
    private def lt(a: Entry, b: Entry): Boolean = {
      val c = java.lang.Double.compare(b.value, a.value) // value DESC
      c < 0 || (c == 0 && a.id < b.id)
    }

    private def top(items: Seq[Entry]): Seq[Entry] =
      items.sortWith(lt).take(k)

    override def zero: Buf = Buf(Vector.empty)

    override def reduce(b: Buf, a: (Long, Double)): Buf = {
      val e = Entry(a._2, a._1)
      // bounded: skip the sort when the buffer is full and e is below its floor
      if (b.items.size >= k && !lt(e, b.items.last)) b
      else Buf(top(b.items :+ e))
    }

    override def merge(x: Buf, y: Buf): Buf = Buf(top(x.items ++ y.items))

    override def finish(b: Buf): Buf = b

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }
}
