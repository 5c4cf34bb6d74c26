package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native sign-hyperplane LSH bits over an `array<double>` vector: bit `j`
  * of the result is 1 iff the sequential dot product of the vector with
  * Walsh hyperplane `j` (coefficient +1 where index bit `j` is 0, −1 where
  * it is 1 — mutually orthogonal, engine-portable integer construction) is
  * `>= 0`. Packs up to 31 planes into one int.
  *
  * This is the candidate-generation hash of the embedding near-dup
  * operator ([[graft.ops.LlmOps]] sign-LSH banding): computed once per
  * vector, so the interpreted `aggregate(transform(...))` formulation is
  * merely nBits interpreted passes per row — this expression compiles the
  * whole bit vector into one primitive loop nest inside whole-stage
  * codegen. Summation order is ascending index, identical to the
  * interpreted fold and to DuckDB's `list_sum(list_transform(...))`, so
  * oracle float parity is preserved bit-for-bit. Null elements count as 0
  * (dense embeddings; a null VECTOR yields null via the null-safe wrapper).
  */
case class WalshSignBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), IntegerType) if right.foldable =>
      // the literal is foldable, so its value is available at analysis time;
      // nBits > 31 would silently wrap (1 << j is mod-32 in Java) and
      // nBits <= 0 would silently return 0 — reject both here
      right.eval() match {
        case null => TypeCheckResult.TypeCheckFailure(
          "walsh_sign_bits nBits literal must not be null")
        case nb: Int if nb > 0 && nb <= 31 => TypeCheckResult.TypeCheckSuccess
        case nb => TypeCheckResult.TypeCheckFailure(
          s"walsh_sign_bits nBits must be in (0, 31], got $nb")
      }
    case _ => TypeCheckResult.TypeCheckFailure(
      s"walsh_sign_bits expects (array<double>, int literal), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "walsh_sign_bits"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val nBits = b.asInstanceOf[Int]
    val n = v.numElements()
    var packed = 0
    var j = 0
    while (j < nBits) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (!v.isNullAt(i)) {
          if (((i >> j) & 1) == 0) acc += v.getDouble(i)
          else acc -= v.getDouble(i)
        }
        i += 1
      }
      if (acc >= 0) packed |= (1 << j)
      j += 1
    }
    packed
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, nb) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val packed = ctx.freshName("packed")
      s"""
         |int $n = $v.numElements();
         |int $packed = 0;
         |for (int $j = 0; $j < $nb; $j++) {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$v.isNullAt($i)) {
         |      if ((($i >> $j) & 1) == 0) $acc += $v.getDouble($i);
         |      else $acc -= $v.getDouble($i);
         |    }
         |  }
         |  if ($acc >= 0.0) $packed |= (1 << $j);
         |}
         |${ev.value} = $packed;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WalshSignBits =
    copy(left = newLeft, right = newRight)
}
