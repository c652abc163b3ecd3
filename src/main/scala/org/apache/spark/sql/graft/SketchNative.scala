package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Murmur3Hash
import org.apache.spark.sql.classic.ExpressionUtils

/** Column builders for the sketch readouts (graft.functions.FreqSketch).
  *
  * Spark's public `hash(...)` pins seed 42; the Count-Min grid needs one
  * independent hash per row r, i.e. Murmur3 with seed = r. Murmur3Hash
  * is the same codegen'd expression behind `hash(...)` — only the seed
  * differs — so a readout built from it stays inside whole-stage
  * codegen (no closure UDF on the readout path). Placed in this package
  * because Column↔Expression bridging via ExpressionUtils is
  * private[sql]; standard extension placement.
  */
object SketchNative {

  /** Codegen'd Murmur3 of `col` with an explicit seed (the seeded form
    * of `functions.hash`). For a string column this hashes the UTF8
    * bytes — [[graft.functions.FreqSketch.CountMin.cell]] computes the
    * identical value JVM-side for the aggregator's increments.
    */
  def murmur3(col: Column, seed: Int): Column =
    ExpressionUtils.column(
      Murmur3Hash(Seq(ExpressionUtils.expression(col)), seed))
}
