package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native PQ encode / ADC / distortion loops, invoked from generated
  * code with the codebooks and lookup tables held as REFERENCE OBJECTS
  * (`ctx.addReferenceObj`) instead of unrolled literal expressions.
  *
  * Why: the expression-tree formulation (one [[VecL2SqSlice]] per
  * (subspace, entry) wrapped in `least`/CASE chains) generates
  * m x ks — and on per-probed-cell residual paths nprobe x m x ks —
  * inlined calls; at production parameters (m=16, ks=256, nprobe=64)
  * that overflows Janino's 64 KB generated-method limit and Spark
  * silently falls back to interpreted execution for the whole probe
  * stage (observed on the sf0.1 sweep as `Code grows beyond 64 KB`).
  * Here the generated code is ONE static call per row regardless of
  * parameters, so the probe/encode stages stay inside whole-stage
  * codegen at any table size — the constant volume rides along as a
  * deserialized array on each executor, exactly like a broadcast.
  *
  * Arithmetic is bit-identical to the expression form it replaces
  * (and to the DuckDB oracles that restate it): subspace distances use
  * [[VecHelper.l2sqSlice]]'s left-to-right double fold; argmins break
  * ties toward the smaller entry index (the `least(struct(d, j))`
  * rule); ADC sums run in ascending subspace order (the
  * `list(ld ORDER BY m)` fold); double comparisons go through
  * `java.lang.Double.compare` (Spark's NaN-greatest ordering).
  */
object AnnHelper {

  /** [[VecHelper.l2sqSlice]] against a driver-constant centroid. */
  private def l2sq(v: ArrayData, vFloat: Boolean, start: Int,
      c: Array[Double]): Double = {
    val st = math.max(0, start)
    val n = math.min(c.length, math.max(0, v.numElements() - st))
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (vFloat) v.getFloat(st + i).toDouble else v.getDouble(st + i)
      val d = x - c(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** PQ encode: per subspace the index of the nearest entry (ties to
    * the smaller index — `least(struct(d, j))`).
    */
  def encode(v: ArrayData, vFloat: Boolean,
      cb: Array[Array[Array[Double]]]): ArrayData = {
    val m = cb.length
    val out = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val entries = cb(mi)
      val dsub = entries(0).length
      var best = l2sq(v, vFloat, mi * dsub, entries(0))
      var js = 0
      var j = 1
      while (j < entries.length) {
        val d = l2sq(v, vFloat, mi * dsub, entries(j))
        if (java.lang.Double.compare(d, best) < 0) { best = d; js = j }
        j += 1
      }
      out(mi) = js
      mi += 1
    }
    new GenericArrayData(out)
  }

  /** [[encode]] under the codebooks of the row's probed cell; null for
    * a cell outside the probed set (the CASE-with-no-else rule —
    * unreachable after the isin filter, preserved for parity).
    */
  def encodeByCell(cell: Long, v: ArrayData, vFloat: Boolean,
      cells: Array[Long],
      cbs: Array[Array[Array[Array[Double]]]]): ArrayData = {
    var i = 0
    while (i < cells.length) {
      if (cells(i) == cell) return encode(v, vFloat, cbs(i))
      i += 1
    }
    null
  }

  /** ADC: the code's lookups into the query's table, summed in
    * ascending subspace order; null on a null/out-of-range code slot
    * (the element_at-miss rule — unreachable for codes this engine
    * wrote).
    */
  def adc(code: ArrayData, lut: Array[Array[Double]]): java.lang.Double = {
    val m = lut.length
    if (code.numElements() < m) return null
    var acc = 0.0
    var mi = 0
    while (mi < m) {
      if (code.isNullAt(mi)) return null
      val j = code.getInt(mi)
      if (j < 0 || j >= lut(mi).length) return null
      acc += lut(mi)(j)
      mi += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** [[adc]] under the table of the row's probed cell. */
  def adcByCell(cell: Long, code: ArrayData, cells: Array[Long],
      luts: Array[Array[Array[Double]]]): java.lang.Double = {
    var i = 0
    while (i < cells.length) {
      if (cells(i) == cell) return adc(code, luts(i))
      i += 1
    }
    null
  }

  /** ADC reconstruction error: per subspace the distance to the
    * NEAREST entry (the argmin distance itself — no code round-trip),
    * summed in ascending subspace order.
    */
  def minDist(v: ArrayData, vFloat: Boolean,
      cb: Array[Array[Array[Double]]]): Double = {
    var acc = 0.0
    var mi = 0
    while (mi < cb.length) {
      val entries = cb(mi)
      val dsub = entries(0).length
      var best = l2sq(v, vFloat, mi * dsub, entries(0))
      var j = 1
      while (j < entries.length) {
        val d = l2sq(v, vFloat, mi * dsub, entries(j))
        if (java.lang.Double.compare(d, best) < 0) best = d
        j += 1
      }
      acc += best
      mi += 1
    }
    acc
  }
}

private[functions] object AnnExpressions {
  def isFloatVec(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  def checkVec(e: Expression, name: String): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    e.dataType match {
      case ArrayType(FloatType | DoubleType, _) | NullType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$name expects a float/double array vector, got $t")
    }
  }
}

/** `pq_encode(vec) -> array<int>` over driver-constant codebooks. */
case class PqEncode(child: Expression, cb: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    AnnExpressions.checkVec(child, prettyName)
  private def vFloat = AnnExpressions.isFloatVec(child)
  override protected def nullSafeEval(v: Any): Any =
    AnnHelper.encode(v.asInstanceOf[ArrayData], vFloat, cb)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCb", cb, "double[][][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.AnnHelper.encode($v, $vFloat, $cbRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `pq_adc(code) -> double` under a driver-constant query table. */
case class PqAdc(child: Expression, lut: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(IntegerType, _) | NullType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"pq_adc expects array<int> codes, got $t")
    }
  }
  override protected def nullSafeEval(code: Any): Any =
    AnnHelper.adc(code.asInstanceOf[ArrayData], lut)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("adcLut", lut, "double[][]")
    nullSafeCodeGen(ctx, ev, code => {
      s"""java.lang.Double ${ev.value}_r =
         |  graft.functions.AnnHelper.adc($code, $lutRef);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }""".stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): PqAdc =
    copy(child = newChild)
}

/** `pq_encode_by_cell(cell, vec) -> array<int>` — encode under the
  * codebooks of the row's probed cell (per-cell COMBINED residual
  * tables); null outside the probed set.
  */
case class PqEncodeByCell(left: Expression, right: Expression,
    cells: Array[Long], cbs: Array[Array[Array[Array[Double]]]])
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode_by_cell"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    left.dataType match {
      case LongType | IntegerType | NullType =>
        AnnExpressions.checkVec(right, prettyName)
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects an integral cell id, got $t")
    }
  }
  private def vFloat = AnnExpressions.isFloatVec(right)
  override protected def nullSafeEval(cell: Any, v: Any): Any =
    AnnHelper.encodeByCell(cell.asInstanceOf[Number].longValue(),
      v.asInstanceOf[ArrayData], vFloat, cells, cbs)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cellsRef = ctx.addReferenceObj("annCells", cells, "long[]")
    val cbsRef = ctx.addReferenceObj("annCbs", cbs, "double[][][][]")
    nullSafeCodeGen(ctx, ev, (cell, v) => {
      s"""org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
         |  graft.functions.AnnHelper.encodeByCell((long)($cell), $v, $vFloat,
         |    $cellsRef, $cbsRef);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r; }""".stripMargin
    })
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqEncodeByCell =
    copy(left = l, right = r)
}

/** `pq_adc_by_cell(cell, code) -> double` — ADC under the query table
  * of the row's probed cell; null outside the probed set.
  */
case class PqAdcByCell(left: Expression, right: Expression,
    cells: Array[Long], luts: Array[Array[Array[Double]]])
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_by_cell"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (LongType | IntegerType | NullType, ArrayType(IntegerType, _) | NullType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (integral cell, array<int> code), got ($l, $r)")
    }
  }
  override protected def nullSafeEval(cell: Any, code: Any): Any =
    AnnHelper.adcByCell(cell.asInstanceOf[Number].longValue(),
      code.asInstanceOf[ArrayData], cells, luts)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cellsRef = ctx.addReferenceObj("annCells", cells, "long[]")
    val lutsRef = ctx.addReferenceObj("annLuts", luts, "double[][][]")
    nullSafeCodeGen(ctx, ev, (cell, code) => {
      s"""java.lang.Double ${ev.value}_r =
         |  graft.functions.AnnHelper.adcByCell((long)($cell), $code,
         |    $cellsRef, $lutsRef);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }""".stripMargin
    })
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqAdcByCell =
    copy(left = l, right = r)
}

/** `pq_min_dist(vec) -> double` — ADC reconstruction error under
  * driver-constant codebooks (the distortion/drift projection).
  */
case class PqMinDist(child: Expression, cb: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_min_dist"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    AnnExpressions.checkVec(child, prettyName)
  private def vFloat = AnnExpressions.isFloatVec(child)
  override protected def nullSafeEval(v: Any): Any =
    AnnHelper.minDist(v.asInstanceOf[ArrayData], vFloat, cb)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCb", cb, "double[][][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.AnnHelper.minDist($v, $vFloat, $cbRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqMinDist =
    copy(child = newChild)
}
