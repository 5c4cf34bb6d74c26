package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst nearest-centroid assignment: `array<double>` vector ×
  * `array<array<double>>` centroid matrix → the 0-based index of the
  * nearest centroid by SQUARED L2, with each distance rounded to 6
  * decimals (Spark `round` semantics: `BigDecimal.valueOf(x).setScale(6,
  * HALF_UP)`) before comparison and ties going to the LOWEST index —
  * byte-identical semantics to the `aggregate(...)` fold over per-centroid
  * `round(zip_with(...), 6)` distances it replaces in
  * [[graft.ops.LlmOps.ivfAssign]], so the DuckDB centroid side-dump
  * oracles replay it unchanged.
  *
  * Why native: the HOF fold is interpreted and allocates a struct + an
  * intermediate array per (row, centroid); at |cells| ~ √N (the IVF cell
  * budget a 10M-vector corpus wants — hundreds of cells) the assignment
  * pass is N·k·d flops and MUST be one primitive loop nest. The rounding
  * is hoisted out of the hot loop: HALF_UP rounding is monotone, so
  * argmin over rounded distances = lowest index whose rounded distance
  * equals round(min raw distance) — pass 1 is pure double arithmetic
  * over a hoisted scratch buffer, pass 2 rounds only the ≤1e-6-band
  * candidates (almost always exactly one BigDecimal call per row).
  *
  * A centroid whose distance is undefined under the fold's semantics
  * (ragged dims or a null element → `zip_with` nulls poison the sum)
  * never wins; if NO centroid has a defined distance the result is -1,
  * matching the fold's initial accumulator.
  */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val vOk = left.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val cOk = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (vOk && cOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects (array<double>, array<array<double>>), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    NearestCentroid.assign(v, cents)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = graft.functions.NearestCentroid.assign($v, $c);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
}

object NearestCentroid {
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Static so the generated code is one call; JIT inlines the loop nest.
    * NaN distances (a NaN vector element) never win: `raw < minRaw` is
    * false for NaN, same as the fold's `when(dist < acc.d)`. */
  def assign(v: ArrayData, cents: ArrayData): Int = {
    val dim = v.numElements()
    val k = cents.numElements()
    var minRaw = Double.MaxValue
    var anyValid = false
    // pass 1: raw squared-L2 per centroid into a scratch buffer
    val d = new Array[Double](k)
    var j = 0
    while (j < k) {
      var dist = Double.NaN
      if (!cents.isNullAt(j)) {
        val c = cents.getArray(j)
        if (c.numElements() == dim) {
          var acc = 0.0
          var ok = true
          var i = 0
          while (ok && i < dim) {
            if (v.isNullAt(i) || c.isNullAt(i)) ok = false
            else { val t = v.getDouble(i) - c.getDouble(i); acc += t * t }
            i += 1
          }
          if (ok) dist = acc
        }
      }
      d(j) = dist
      if (dist < minRaw) { minRaw = dist; anyValid = true }
      j += 1
    }
    if (!anyValid) return -1
    // pass 2: the rounded argmin. HALF_UP rounding is monotone, so the
    // min of rounded distances == round(min raw); the winner is the
    // LOWEST index whose distance rounds to it. Only distances within
    // the rounding band of minRaw can round equal (2e-6 bound is
    // conservative against float-repr edge cases on the grid boundary).
    val rMin = round6(minRaw)
    j = 0
    while (j < k) {
      val dj = d(j)
      if (dj == dj && dj - minRaw < 2e-6 && round6(dj) == rMin) return j
      j += 1
    }
    -1 // unreachable: the raw min itself rounds to rMin
  }
}
