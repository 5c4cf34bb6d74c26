package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** O(len) character n-gram array: all `n`-character windows of a string,
  * in order — the linear-time replacement for the SQL-lambda formulation
  * `transform(sequence(1, length(s)-n+1), i -> substring(s, i, n))`.
  *
  * Why native: Spark's `substring(s, i, n)` on a UTF8String is O(i) — it
  * walks bytes from the start to find the i-th character, because UTF-8
  * is variable-width. Inside a transform over every position that makes
  * shingling O(len²) PER DOCUMENT; the cost hides from scale exponents
  * (document length is constant across corpus decades) but multiplies
  * the constant by ~len/2. Measured at the 50M-doc decade-4 tier: the
  * trigram pass of `text_quality_lm` burned 17+ minutes in
  * `UTF8String.substringSQL` before this expression (thread-dump
  * evidence, round 15) vs seconds after. This walks the byte array ONCE,
  * records each character's byte offset, then slices `n`-char windows by
  * offset — exact UTF-8 character semantics, identical output to the
  * lambda form INCLUDING null handling: the CASE's `length(s) >= n`
  * condition is NULL for a NULL string, which falls to the ELSE arm, so
  * a NULL input yields `array()` — NOT null (round-15 advisor: a
  * null-preserving version silently changed `size(...)` consumers from
  * 0 to -1/null on NULL-text docs and diverged from the DuckDB oracles'
  * `greatest(length-2,0)` shape). Hence the expression is never-null and
  * overrides `eval`/`doGenCode` directly instead of the null-safe
  * wrappers.
  */
case class CharNgrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType &&
        right.foldable)
      right.eval() match {
        case null => TypeCheckResult.TypeCheckFailure(
          "char_ngrams n literal must not be null")
        case w: Int if w >= 1 && w <= 64 => TypeCheckResult.TypeCheckSuccess
        case w => TypeCheckResult.TypeCheckFailure(
          s"char_ngrams n must be in [1,64], got $w")
      }
    else TypeCheckResult.TypeCheckFailure(
      "char_ngrams expects (string, literal int n)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"
  override def nullable: Boolean = false

  @transient private lazy val n: Int = right.eval().asInstanceOf[Int]

  override def eval(input: InternalRow): Any = {
    val s = left.eval(input)
    if (s == null) CharNgrams.empty
    else CharNgrams.ngrams(s.asInstanceOf[UTF8String], n)
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
         |  ? graft.functions.CharNgrams.empty()
         |  : graft.functions.CharNgrams.ngrams(${leftGen.value}, $nLit);
       """.stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharNgrams =
    copy(left = newLeft, right = newRight)
}

object CharNgrams {
  private val Empty: ArrayData = new GenericArrayData(Array.empty[Any])

  /** The NULL-input result (see the class doc); also referenced from
    * generated code. */
  def empty: ArrayData = Empty

  /** Shared by interpreted eval and generated code. One byte pass for the
    * character offsets, one O(1) slice per window. */
  def ngrams(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    if (len < n) return Empty // cheap pre-check (numChars <= numBytes)
    // character start offsets (numChars + 1 sentinel)
    val offs = new Array[Int](len + 1)
    var nc = 0
    var i = 0
    while (i < len) {
      offs(nc) = i
      nc += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    offs(nc) = len
    if (nc < n) return Empty
    val out = new Array[Any](nc - n + 1)
    var j = 0
    while (j + n <= nc) {
      out(j) = UTF8String.fromBytes(bytes, offs(j), offs(j + n) - offs(j))
      j += 1
    }
    new GenericArrayData(out)
  }
}
