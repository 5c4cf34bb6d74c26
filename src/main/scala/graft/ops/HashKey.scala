package graft.ops

import java.security.MessageDigest
import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions.udf

/** Content-addressed cache keys (SURVEY.md §2.7 F1): SHA-1 of the canonical
  * JSON of a work descriptor, byte-compatible with the reference's
  * `json.dumps(obj, sort_keys=True, ensure_ascii=True,
  * separators=(', ', ': '))` → `hashlib.sha1` (`queue/request_tools.py:37-45`).
  *
  * Byte fidelity matters: the reference memoizes work under these keys
  * (`queue/request_tools.py:374-390`), so an engine that hashes differently
  * would orphan every existing cache entry. The serializer below reproduces
  * CPython's `json` output exactly for the value domain the reference hashes
  * (str/int/float/bool/None, lists, string-keyed dicts), including
  * `ensure_ascii` \\uXXXX escaping and Python `repr` float formatting.
  */
object HashKey {

  sealed trait JVal
  case object JNull extends JVal
  final case class JBool(v: Boolean) extends JVal
  final case class JInt(v: Long) extends JVal
  final case class JFloat(v: Double) extends JVal
  final case class JStr(v: String) extends JVal
  final case class JArr(v: Seq[JVal]) extends JVal
  final case class JObj(v: Seq[(String, JVal)]) extends JVal

  /** Python `json.dumps` string escaping with `ensure_ascii=True`. */
  def escape(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < ' ' || c > '~' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  /** Shortest decimal string that round-trips to exactly `d`, in
    * `%e`-style scientific form. `java.lang.Double.toString` is NOT
    * shortest-round-trip before JDK 19 (e.g. it renders
    * 4.568643288225989e16 with 17 digits where 16 suffice), so search the
    * precision explicitly — this is what CPython's `repr` guarantees. */
  private def shortestSci(d: Double): String = {
    // Locale.ROOT: a decimal-comma default locale would render "5,0e-02"
    // and blow up the parse-back check
    var p = 0
    while (p < 17) {
      val s = String.format(java.util.Locale.ROOT, "%." + p + "e", Double.box(d))
      if (java.lang.Double.parseDouble(s) == d) return s
      p += 1
    }
    String.format(java.util.Locale.ROOT, "%.17e", Double.box(d))
  }

  /** Python `repr(float)` — shortest round-trip decimal, plain form for
    * 1e-4 <= |x| < 1e16, else `Ne±EE` scientific with >=2-digit exponent. */
  def pyFloatRepr(d: Double): String = {
    if (d.isNaN) return "NaN"
    if (d.isInfinity) return if (d > 0) "Infinity" else "-Infinity"
    if (d == 0.0) return if (1 / d < 0) "-0.0" else "0.0"
    val bd = new java.math.BigDecimal(shortestSci(d))
    val a = math.abs(d)
    if (a >= 1e-4 && a < 1e16) {
      var plain = bd.toPlainString
      if (!plain.contains('.')) plain += ".0"
      else {
        // strip trailing zeros but keep one decimal digit
        plain = plain.replaceAll("0+$", "")
        if (plain.endsWith(".")) plain += "0"
      }
      plain
    } else {
      // python: '1e+16', '5e-05', '1.7976931348623157e+308'
      val stripped = bd.stripTrailingZeros
      val unscaled = stripped.unscaledValue.toString
      val neg = unscaled.startsWith("-")
      val digits = if (neg) unscaled.substring(1) else unscaled
      val exp = digits.length - 1 - stripped.scale
      val mantissa =
        if (digits.length == 1) digits
        else digits.substring(0, 1) + "." + digits.substring(1)
      val sign = if (exp < 0) "-" else "+"
      f"${if (neg) "-" else ""}$mantissa%se$sign%s${math.abs(exp)}%02d"
    }
  }

  /** Canonical rendering: sort_keys=True, separators=(', ', ': '). */
  def render(v: JVal): String = v match {
    case JNull      => "null"
    case JBool(b)   => if (b) "true" else "false"
    case JInt(i)    => i.toString
    case JFloat(f)  => pyFloatRepr(f)
    case JStr(s)    => escape(s)
    case JArr(xs)   => xs.map(render).mkString("[", ", ", "]")
    case JObj(kvs)  =>
      // python sort_keys compares by Unicode CODE POINT; Java String
      // ordering compares UTF-16 code units, which disagrees beyond the BMP
      // (surrogates sort below e.g. U+FF61) — compare code point arrays
      kvs.sortWith((a, b) => codePointLt(a._1, b._1))
        .map { case (k, x) => s"${escape(k)}: ${render(x)}" }
        .mkString("{", ", ", "}")
  }

  private def codePointLt(a: String, b: String): Boolean = {
    val xa = a.codePoints.toArray
    val xb = b.codePoints.toArray
    val n = math.min(xa.length, xb.length)
    var i = 0
    while (i < n) {
      if (xa(i) != xb(i)) return xa(i) < xb(i)
      i += 1
    }
    xa.length < xb.length
  }

  def sha1Hex(s: String): String =
    MessageDigest.getInstance("SHA-1")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  /** Reference `json_sha1_hash` (`queue/request_tools.py:37-45`). */
  def keyOf(v: JVal): String = sha1Hex(render(v))

  /** Best-effort conversion of arbitrary Scala/Spark values (Row fields,
    * Maps, Seqs) into the canonical AST; dict keys come out sorted via
    * [[render]]. */
  def toJVal(x: Any): JVal = x match {
    case null                  => JNull
    case v: JVal               => v
    case b: Boolean            => JBool(b)
    case i: Int                => JInt(i.toLong)
    case l: Long               => JInt(l)
    case s: Short              => JInt(s.toLong)
    case b: Byte               => JInt(b.toLong)
    case d: Double             => JFloat(d)
    case f: Float              => JFloat(f.toDouble)
    case d: java.math.BigDecimal => JFloat(d.doubleValue)
    case s: String             => JStr(s)
    case r: Row =>
      JObj(r.schema.fieldNames.toSeq.zipWithIndex.map { case (n, i) => n -> toJVal(r.get(i)) })
    case m: scala.collection.Map[_, _] =>
      JObj(m.toSeq.map { case (k, v) => k.toString -> toJVal(v) })
    case s: scala.collection.Seq[_] => JArr(s.toSeq.map(toJVal))
    case a: Array[_]           => JArr(a.toSeq.map(toJVal))
    case Some(v)               => toJVal(v)
    case None                  => JNull
    // typed documents (the Request model) render as objects by declared
    // field name — the S6 request echo writes the full document, like the
    // reference dumping the Mongo doc (`queue/request_tools.py:553-558`)
    case p: Product =>
      JObj(p.productElementNames.toSeq.zip(p.productIterator.toSeq)
        .map { case (n, v) => n -> toJVal(v) })
    case other => JStr(other.toString)
  }

  /** Canonical-JSON column over a `struct(...)` column (field names become
    * sorted object keys). Scalar UDF: the per-row cost is string building +
    * SHA-1 — acceptable off the 100 TB hot path (hashes are computed once per
    * work descriptor, not per pixel). */
  val canonicalJsonUdf = udf((r: Row) => render(toJVal(r)))
  val sha1KeyUdf = udf((r: Row) => keyOf(toJVal(r)))

  def canonicalJson(structCol: Column): Column = canonicalJsonUdf(structCol)
  def sha1Key(structCol: Column): Column = sha1KeyUdf(structCol)
}
