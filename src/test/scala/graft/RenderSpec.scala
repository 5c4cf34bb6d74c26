package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Render

class RenderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("wordWrap chunks >max words into max-size pieces joined by \\n (F14)") {
    val long = "a" * 200
    val df = Seq(s"short $long tail").toDF("s")
    val out = df.select(Render.wordWrap(col("s"), 80).as("w")).as[String].collect().head
    // reference semantics (documentation_tool.py:393-406): every char kept,
    // chunks of exactly max, remainder last
    val expected = "short " + ("a" * 80) + "\n" + ("a" * 80) + "\n" + ("a" * 40) + " tail"
    assert(out == expected)
  }

  test("wordWrap is identity when no word exceeds max") {
    val df = Seq("hello world").toDF("s")
    assert(df.select(Render.wordWrap(col("s")).as("w"))
      .as[String].collect().head == "hello world")
  }

  test("htmlify renders newlines as <br/> (F17)") {
    val df = Seq("a\nb\nc").toDF("s")
    assert(df.select(Render.htmlify(col("s")).as("h"))
      .as[String].collect().head == "a<br/>b<br/>c")
  }
}
