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

  test("toJVal on maps sorts keys at render time") {
    val m = Map("b" -> 2, "a" -> 1)
    assert(render(toJVal(m)) == """{"a": 1, "b": 2}""")
  }
}
