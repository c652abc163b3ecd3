package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BinaryType, DataType, DoubleType, FloatType}

/** Product-quantization primitives (Jégou et al., TPAMI 2011) as codegen'd
  * row-local expressions — the compressed-domain ANN path: the corpus is
  * stored as `m` one-byte sub-codes (16 bytes/vector at m=16 instead of
  * 256 for 64 float dims), probes score the codes through per-probe lookup
  * tables (ADC — asymmetric distance computation), and only the top
  * candidates touch raw vectors again for the exact rerank.
  *
  * The codebook rides each expression instance as a plain
  * `Array[Array[Array[Float]]]` ([subspace][centroid][dim]) — broadcast-
  * sized (≤ m·256·(dims/m) floats = dims·256 ≈ 64 KB at 64 dims) and
  * shipped with the task binary exactly like [[NearestCentroid]]'s
  * centroid table. Subspaces are contiguous dim windows whose widths come
  * from the codebook itself, so ragged widths (dims not divisible by m)
  * need no side-channel. All three expressions share that convention,
  * which is what makes `lut[s·ks + code[s]]` line up in [[PqAdc]].
  *
  * Lives under org.apache.spark.sql because ExpectsInputTypes /
  * ExpressionUtils are private[sql]; standard extension placement.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression with ExpectsInputTypes {

  require(codebooks.nonEmpty, "codebook must have at least one subspace")
  require(codebooks.forall(b => b.nonEmpty && b.length <= 256),
    "each subspace needs 1..256 centroids (codes are unsigned bytes)")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))

  override def dataType: DataType = BinaryType

  // dim offset of each subspace window, derived from centroid widths
  @transient private lazy val offsets: Array[Int] =
    codebooks.scanLeft(0)((acc, b) => acc + b(0).length).init

  def compute(v: ArrayData): Array[Byte] = {
    val vLen = v.numElements()
    val out = new Array[Byte](codebooks.length)
    var s = 0
    while (s < codebooks.length) {
      val book = codebooks(s)
      val off = offsets(s)
      val width = book(0).length
      // common prefix of the subspace window and the row (ragged rows, as
      // in NearestCentroid); a window past the row's end scores width 0
      // for every centroid and ties resolve to code 0
      val n = math.max(0, math.min(vLen - off, width))
      var best = 0
      var bestD = Double.MaxValue
      var cIdx = 0
      while (cIdx < book.length) {
        val c = book(cIdx)
        var d = 0.0
        var i = 0
        while (i < n) {
          val diff = v.getFloat(off + i).toDouble - c(i).toDouble
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = cIdx }
        cIdx += 1
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqe", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  override def prettyName: String = "pq_encode"
}

/** Per-probe ADC lookup table: `lut[s·ks + c]` = dot of the probe's
  * subspace-`s` window with centroid `c` of subspace `s` — so the probe
  * pays O(ks·dims) ONCE and every corpus vector afterwards costs O(m)
  * array reads in [[PqAdc]] instead of an O(dims) dot. `ks` is the common
  * centroid count (codebooks are padded to equal size by the trainer).
  * Summing the per-subspace dots reconstructs dot(probe, decode(codes))
  * exactly, in the same subspace order, so ADC scores are bit-identical
  * to scoring the reconstruction.
  */
case class PqLut(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression with ExpectsInputTypes {

  require(codebooks.nonEmpty, "codebook must have at least one subspace")
  require(codebooks.map(_.length).distinct.length == 1,
    "subspace codebooks must share one centroid count (pad in the trainer)")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  @transient private lazy val offsets: Array[Int] =
    codebooks.scanLeft(0)((acc, b) => acc + b(0).length).init

  def compute(v: ArrayData): ArrayData = {
    val vLen = v.numElements()
    val ks = codebooks(0).length
    val out = new Array[Double](codebooks.length * ks)
    var s = 0
    while (s < codebooks.length) {
      val book = codebooks(s)
      val off = offsets(s)
      val width = book(0).length
      val n = math.max(0, math.min(vLen - off, width))
      var cIdx = 0
      while (cIdx < ks) {
        val c = book(cIdx)
        var acc = 0.0
        var i = 0
        while (i < n) { acc += v.getFloat(off + i).toDouble * c(i).toDouble; i += 1 }
        out(s * ks + cIdx) = acc
        cIdx += 1
      }
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pql", this, classOf[PqLut].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)

  override def prettyName: String = "pq_lut"
}

/** ADC score of one corpus code array against one probe LUT:
  * Σ_s lut[s·ks + codes[s]] — m unsigned-byte indirections per pair, the
  * inner loop of the compressed scan. Equals dot(probe, decode(codes))
  * by [[PqLut]]'s construction.
  */
case class PqAdc(left: Expression, right: Expression, ks: Int)
    extends BinaryExpression with ExpectsInputTypes {

  require(ks >= 1 && ks <= 256, s"ks must be in [1, 256], got $ks")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType), BinaryType)

  override def dataType: DataType = DoubleType

  def compute(lut: ArrayData, codes: Array[Byte]): Double = {
    var acc = 0.0
    var s = 0
    while (s < codes.length) {
      acc += lut.getDouble(s * ks + (codes(s) & 0xFF))
      s += 1
    }
    acc
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqa", this, classOf[PqAdc].getName)
    nullSafeCodeGen(ctx, ev, (l, r) => s"${ev.value} = $ref.compute($l, $r);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdc = copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_adc"
}

object PqNative {

  /** `pq_encode(vec)` against a fixed codebook, as a Column (BinaryType,
    * one unsigned-byte code per subspace).
    */
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Float]]]): Column =
    ExpressionUtils.column(PqEncode(ExpressionUtils.expression(vec), codebooks))

  /** `pq_lut(vec)` against a fixed codebook, as a Column (m·ks doubles). */
  def pqLut(vec: Column, codebooks: Array[Array[Array[Float]]]): Column =
    ExpressionUtils.column(PqLut(ExpressionUtils.expression(vec), codebooks))

  /** `pq_adc(lut, codes)` at centroid count `ks`, as a Column. */
  def pqAdc(lut: Column, codes: Column, ks: Int): Column =
    ExpressionUtils.column(
      PqAdc(ExpressionUtils.expression(lut), ExpressionUtils.expression(codes), ks))
}
