package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{HashKey, Msr, Naming}
import graft.ops.HashKey._

/** Golden behavior test against the captured production request from the
  * reference (`queue/doc_test.py:12-96`, ported to
  * `src/test/resources/request_fixture.json`; see FIXTURES.md). Asserts the
  * full check_request derivation chain (`queue/request_tools.py:362-424`):
  * filter normalization → msr descriptor → canonical SHA-1 → column names.
  */
class GoldenFixtureSpec extends AnyFunSuite {

  val dataset = "nigeriaaims_geocodedresearchrelease_level1_v1_3"

  test("fixture selection 1: 'All' filter entry is dropped, donors kept") {
    val filters = Map(
      "donors" -> Seq("AFDB"),
      "ad_sector_names" -> Seq("All"))
    assert(Msr.normalizeFilters(filters) == Map("donors" -> Seq("AFDB")))
  }

  /** The msr descriptor the reference hashes
    * (`queue/request_tools.py:371-383`): dataset, type, resolution 0.05,
    * worker version, normalized filters. Expected SHA-1 generated with
    * CPython json.dumps+hashlib on the identical descriptor. */
  test("msr descriptor hash matches CPython sha1 golden value") {
    val descriptor = JObj(Seq(
      "dataset" -> JStr(dataset),
      "type" -> JStr("release"),
      "resolution" -> JFloat(0.05),
      "version" -> JStr("0.1"),
      "filters" -> JObj(Seq("donors" -> JArr(Seq(JStr("AFDB")))))))
    assert(HashKey.keyOf(descriptor) == "1e7b27768cb5caeb17d80b25dacd89bf84fc2f10")
  }

  test("selection 2 (donors AFDB+France) hashes differently") {
    def desc(donors: Seq[String]) = JObj(Seq(
      "dataset" -> JStr(dataset),
      "type" -> JStr("release"),
      "resolution" -> JFloat(0.05),
      "version" -> JStr("0.1"),
      "filters" -> JObj(Seq("donors" -> JArr(donors.map(JStr))))))
    assert(HashKey.keyOf(desc(Seq("AFDB"))) != HashKey.keyOf(desc(Seq("AFDB", "France"))))
  }

  test("raster column name: udel_precip_v401_min.1998.mean") {
    // file name `udel_precip_v401_min_1998` → temporal suffix 1998
    // (`queue/request_tools.py:467`), extract type `mean`.
    val fileName = "udel_precip_v401_min_1998"
    val base = "udel_precip_v401_min"
    val temporal = fileName.substring(base.length + 1)
    assert(temporal == "1998")
    assert(Naming.display(Naming.col(base, temporal, "mean"))
      == "udel_precip_v401_min.1998.mean")
  }

  test("msr columns: dataset.hash7.{sum,potential,reliability}") {
    val h = "1e7b27768cb5caeb17d80b25dacd89bf84fc2f10"
    assert(Naming.msrCols(dataset, h).map(Naming.display) == Seq(
      s"$dataset.1e7b277.sum",
      s"$dataset.1e7b277.potential",
      s"$dataset.1e7b277.reliability"))
  }

  test("hash write-back guard: only absent-or-unchanged hashes are written (Q4)") {
    // reference quirk (`queue/request_tools.py:386-390`): a *changed* hash is
    // NOT refreshed. Modelled as the guard predicate itself.
    def shouldWriteBack(existing: Option[String], computed: String): Boolean =
      existing.isEmpty || existing.contains(computed)
    assert(shouldWriteBack(None, "abc"))
    assert(shouldWriteBack(Some("abc"), "abc"))
    assert(!shouldWriteBack(Some("old"), "abc"))
  }

  test("stage timeline: 4 named stages in order") {
    val stages = Seq("submit", "prep", "process", "complete")
    val times = Seq(1470299931L, 1470419931L, 1470419931L, 1470419933L)
    assert(times == times.sorted, "stage times are monotonic")
    assert(stages.distinct.size == 4)
  }

  /** Both notification variants' strings, byte-exact against the reference
    * format grammars: notify_received (`queue/request_tools.py:254-272`)
    * "Request {id[:7]}.. Received" and notify_completed (:281-322)
    * "Request {id[:7]}.. Completed" plus the direct zip-download URL
    * "http://{server}/data/geoquery_results/{id}/{id}.zip" (same id appears
    * as BOTH the directory and the file stem). */
  test("email subjects + zip url match the reference format grammar byte-exact") {
    val s = TestSpark.spark
    val d = "/root/testdata/sf0.001"
    val received = SparkEntry.queries("email_content")(s, d).limit(50).collect()
    assert(received.nonEmpty)
    received.foreach { r =>
      val rid = r.getAs[String]("status_url").split("/").last
      assert(r.getAs[String]("subject") ==
        s"AidData geo(query) - Request ${rid.take(7)}.. Received")
    }
    val completed = SparkEntry.queries("email_content_completed")(s, d).collect()
    val byStatus = completed.groupBy(r => r.getAs[String]("subject").endsWith(".. Completed"))
    assert(byStatus.contains(true), "fixture has completed ('F') orders")
    assert(byStatus.contains(false), "fixture has in-flight ('O') orders")
    completed.foreach { r =>
      val rid = r.getAs[String]("status_url").split("/").last
      val subj = r.getAs[String]("subject")
      if (subj.endsWith(".. Completed")) {
        assert(subj == s"AidData geo(query) - Request ${rid.take(7)}.. Completed")
        assert(r.getAs[String]("zip_url") ==
          s"http://download.example.org/data/geoquery_results/$rid/$rid.zip")
      } else {
        assert(subj == s"AidData geo(query) - Request ${rid.take(7)}.. Received")
        assert(r.getAs[String]("zip_url") == null,
          "zip_url only renders from notify_completed")
      }
    }
  }
}
