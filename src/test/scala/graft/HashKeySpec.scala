package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.HashKey._

class HashKeySpec extends AnyFunSuite {

  test("canonical JSON matches CPython json.dumps byte-for-byte") {
    CanonicalJsonVectors.cases.foreach { case (name, v, expectedJson, _) =>
      assert(render(v) == expectedJson, s"case $name")
    }
  }

  test("sha1 matches CPython hashlib.sha1 over canonical JSON") {
    CanonicalJsonVectors.cases.foreach { case (name, v, _, expectedSha) =>
      assert(keyOf(v) == expectedSha, s"case $name")
    }
  }

  test("hash is invariant under object key order (sort_keys)") {
    val a = JObj(Seq("x" -> JInt(1), "y" -> JStr("s"), "z" -> JArr(Seq(JInt(2)))))
    val b = JObj(Seq("z" -> JArr(Seq(JInt(2))), "x" -> JInt(1), "y" -> JStr("s")))
    assert(keyOf(a) == keyOf(b))
  }

  test("python float repr edge cases") {
    assert(pyFloatRepr(0.05) == "0.05")
    assert(pyFloatRepr(123.0) == "123.0")
    assert(pyFloatRepr(1.0e7) == "10000000.0")
    assert(pyFloatRepr(1e16) == "1e+16")
    assert(pyFloatRepr(5e-05) == "5e-05")
    assert(pyFloatRepr(-0.0) == "-0.0")
    assert(pyFloatRepr(1.5e-7) == "1.5e-07")
  }

  test("adversarial float vectors match CPython (shortest-repr stress)") {
    FloatReprVectors.cases.foreach { case (v, expectedJson, expectedSha) =>
      assert(render(v) == expectedJson)
      assert(keyOf(v) == expectedSha)
    }
  }

  test("non-BMP object keys sort by code point like python sort_keys") {
    // U+FF61 (one UTF-16 unit 0xFF61) sorts BEFORE U+1F600 by code point,
    // though its UTF-16 unit is larger than the lead surrogate 0xD83D;
    // ensure_ascii renders the pair as \ud83d\ude00 exactly like CPython
    val o = JObj(Seq("\uff61" -> JInt(1), "\ud83d\ude00" -> JInt(2)))
    assert(render(o) == "{\"\\uff61\": 1, \"\\ud83d\\ude00\": 2}")
  }

  test("toJVal on maps sorts keys at render time") {
    val m = Map("b" -> 2, "a" -> 1)
    assert(render(toJVal(m)) == """{"a": 1, "b": 2}""")
  }
}
