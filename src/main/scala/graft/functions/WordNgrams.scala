package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** O(len) word n-gram array: all `n`-token windows of a string, joined
  * by single spaces, in order — the linear replacement for the two
  * interpreted HOF idioms the shingling queries used:
  *
  *   - `transform(sequence(0, size(split(s,' '))-2), i ->
  *      concat(split(s,' ')[i], ' ', split(s,' ')[i+1]))` (bigrams):
  *      the lambda body re-evaluates `split(s, ' ')` PER ELEMENT in
  *      interpreted mode — O(len²) per document;
  *   - `transform(sequence(0, size(w)-k), i ->
  *      array_join(slice(w, i+1, k), ' '))` over a pre-split array:
  *      linear, but interpreted with a fresh array + string build per
  *      gram.
  *
  * Exact-parity contract (same argument as [[DsirBigram]]): token
  * boundaries are exactly the 0x20 bytes (never inside a multi-byte
  * UTF-8 sequence) with Spark's `split(s, ' ')` limit=-1 semantics —
  * ALL empty tokens kept — and the joined n-gram `w(i) ⧺ ' ' ⧺ … ⧺
  * w(i+n-1)` is byte-identical to the slice of the input from the
  * start of token i to the end of token i+n-1, because every separator
  * is exactly one space. So each gram is a zero-copy byte slice of the
  * input. Fewer than n tokens (including NULL input, where the CASE
  * forms' `size(...) >= n` condition is NULL and falls to the ELSE
  * `array()` arm) yields the empty array — the expression is
  * never-null, like [[CharNgrams]]. */
object WordNgrams {
  private val Empty: ArrayData = new GenericArrayData(Array.empty[Any])
  def empty: ArrayData = Empty

  def ngrams(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    var spaces = 0
    var i = 0
    while (i < len) { if (bytes(i) == 0x20) spaces += 1; i += 1 }
    val nTok = spaces + 1
    if (nTok < n) return Empty
    val starts = new Array[Int](nTok)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < len) {
      if (bytes(i) == 0x20) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val out = new Array[AnyRef](nTok - n + 1)
    i = 0
    while (i <= nTok - n) {
      val from = starts(i)
      val until = if (i + n < nTok) starts(i + n) - 1 else len
      out(i) = UTF8String.fromBytes(bytes, from, until - from)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `word_ngrams(s, nLit)` → array<string> of all n-token windows (see
  * [[WordNgrams]]); never null. */
case class WordNgramsExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType &&
        right.foldable)
      right.eval() match {
        case null => TypeCheckResult.TypeCheckFailure(
          "word_ngrams n literal must not be null")
        case w: Int if w >= 1 && w <= 64 => TypeCheckResult.TypeCheckSuccess
        case w => TypeCheckResult.TypeCheckFailure(
          s"word_ngrams n must be in [1,64], got $w")
      }
    else TypeCheckResult.TypeCheckFailure(
      "word_ngrams expects (string, literal int n)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"
  override def nullable: Boolean = false

  @transient private lazy val n: Int = right.eval().asInstanceOf[Int]

  override def eval(input: InternalRow): Any = {
    val s = left.eval(input)
    if (s == null) WordNgrams.empty
    else WordNgrams.ngrams(s.asInstanceOf[UTF8String], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nLit = n
    val leftGen = left.genCode(ctx)
    val javaType = org.apache.spark.sql.catalyst.expressions.codegen
      .CodeGenerator.javaType(dataType)
    val resultCode =
      code"""
         |${leftGen.code}
         |$javaType ${ev.value} = ${leftGen.isNull}
         |  ? graft.functions.WordNgrams.empty()
         |  : graft.functions.WordNgrams.ngrams(${leftGen.value}, $nLit);
       """.stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordNgramsExpr =
    copy(left = newLeft, right = newRight)
}
