package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench protocol's self-check (`Bench.validateProtocolLine`): the
  * r07/r09 `"parsed": null` class — an emitted line the driver's parser
  * rejects — must fail the run loudly instead of silently voiding the
  * round's benchmark. Covers the two realistic corruption modes: a
  * NaN/Infinity timing (invalid JSON number token) and an unescaped quote
  * in a query name.
  */
class BenchProtocolSpec extends AnyFunSuite {

  private val good =
    """{"metric":"total","value":12.5,"unit":"sec","pass_totals":[12.5,11.9],""" +
      """"contended":[],"queries":{"q1":1.25,"q2":11.25},"sf":"/root/testdata/sf0.1"}"""

  test("well-formed full line round-trips") {
    Bench.validateProtocolLine(good, requireQueries = true)
  }

  test("well-formed total-only line round-trips without queries") {
    val totalOnly =
      """{"metric":"total","value":12.5,"unit":"sec","pass_totals":[12.5,11.9],"contended":[],"sf":"x"}"""
    Bench.validateProtocolLine(totalOnly, requireQueries = false)
  }

  test("substrates map validates when present, rejects non-number values") {
    val withSubs = good.replace(""","queries":""",
      ""","substrates":{"minhash_pairs":2.5,"sessionized_events":0.4},"queries":""")
    Bench.validateProtocolLine(withSubs, requireQueries = true)
    val bad = withSubs.replace("\"minhash_pairs\":2.5", "\"minhash_pairs\":\"x\"")
    assertThrows[Exception](Bench.validateProtocolLine(bad, requireQueries = true))
  }

  test("NaN timing is rejected (invalid JSON number token)") {
    val bad = good.replace("\"q2\":11.25", "\"q2\":NaN")
    assertThrows[Exception](Bench.validateProtocolLine(bad, requireQueries = true))
  }

  test("Infinity total is rejected") {
    val bad = good.replace("\"value\":12.5", "\"value\":Infinity")
    assertThrows[Exception](Bench.validateProtocolLine(bad, requireQueries = true))
  }

  test("unescaped quote in a query name is rejected") {
    val bad = good.replace("\"q1\"", "\"q\"1\"")
    assertThrows[Exception](Bench.validateProtocolLine(bad, requireQueries = true))
  }

  test("missing queries object fails when required, passes when not") {
    val noQueries =
      """{"metric":"total","value":1.0,"unit":"sec","pass_totals":[1.0],"contended":[],"sf":"x"}"""
    assertThrows[Exception](Bench.validateProtocolLine(noQueries, requireQueries = true))
    Bench.validateProtocolLine(noQueries, requireQueries = false)
  }

  test("non-numeric per-query timing is rejected") {
    val bad = good.replace("\"q2\":11.25", "\"q2\":\"11.25\"")
    assertThrows[Exception](Bench.validateProtocolLine(bad, requireQueries = true))
  }

  test("trailing tokens after the JSON object are rejected (r13 strict parse)") {
    // the round-12 advisor finding: a default ObjectMapper stops at the
    // first complete value, so '{...}garbage' passed the self-check yet a
    // stricter tail-parsing driver would reject it — the silent-void class
    assertThrows[Exception](
      Bench.validateProtocolLine(good + "garbage", requireQueries = true))
    assertThrows[Exception](
      Bench.validateProtocolLine(good + """ {"second":1}""", requireQueries = true))
  }

  test("duplicated key is rejected (r13 strict parse)") {
    // a duplicated field parses last-wins in lenient parsers and first-wins
    // in others — ambiguous on the wire, so the validator refuses it
    val dup = good.dropRight(1) + ""","value":99.0}"""
    assertThrows[Exception](Bench.validateProtocolLine(dup, requireQueries = true))
  }

  // ---- whole-pass contention adjudication (round-13 verdict #6) ----------

  test("contended pass detection: >15% divergence names the slower pass") {
    // the BENCH_r13 shape: pass 2 overlapped an external load (20% over)
    assert(Bench.contendedPassIndex(Seq(132.5, 159.6)).contains(1))
    assert(Bench.contendedPassIndex(Seq(159.6, 132.5)).contains(0))
  }

  test("contended pass detection: totals within the band do not re-run") {
    assert(Bench.contendedPassIndex(Seq(132.5, 140.0)).isEmpty) // 5.7%
    assert(Bench.contendedPassIndex(Seq(100.0, 115.0)).isEmpty) // exactly 15%
    assert(Bench.contendedPassIndex(Seq(100.0, 100.0)).isEmpty)
  }

  test("contended pass detection: a failed (non-positive) pass is not noise") {
    assert(Bench.contendedPassIndex(Seq(0.0, 150.0)).isEmpty)
    assert(Bench.contendedPassIndex(Seq(-1.0, 150.0)).isEmpty)
  }

  test("protocol line with a contended_pass record validates") {
    val adjudicated = good.replace(""","contended":[]""",
      ""","contended_pass":{"pass":2,"original_total":159.6,"rerun_total":131.8},"contended":[]""")
    Bench.validateProtocolLine(adjudicated, requireQueries = true)
  }

  test("malformed contended_pass record is rejected") {
    val bad = good.replace(""","contended":[]""",
      ""","contended_pass":{"pass":"two","original_total":159.6,"rerun_total":131.8},"contended":[]""")
    assertThrows[Exception](Bench.validateProtocolLine(bad, requireQueries = true))
    val bad2 = good.replace(""","contended":[]""",
      ""","contended_pass":[2],"contended":[]""")
    assertThrows[Exception](Bench.validateProtocolLine(bad2, requireQueries = true))
  }
}
