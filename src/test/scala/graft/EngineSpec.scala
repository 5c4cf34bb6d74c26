package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.model._

class EngineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def newEngine() = new Engine(spark, Files.createTempDirectory("graft_engine").toString)

  val request = Request(
    id = "req-1",
    boundary = Boundary("nga_adm0_gadm28"),
    release_data = Seq(ReleaseSelection(dataset = "nigeriaaims",
      filters = Map("donors" -> Seq("AFDB")))),
    raster_data = Seq(RasterSelection(name = "udel",
      extract_types = Seq("mean"), files = Seq(RasterFile("udel_1998")))))

  def base = Seq((1, "A"), (2, "B")).toDF("asdf_id", "name")
  def pixels = Seq((1, 10.0, 1.0, "A", 1998), (2, 6.0, 2.0, "R", 1998))
    .toDF("asdf_id", "value", "weight", "cls", "temporal")
  def locations = Seq((1, 40.0, 100.0, "AFDB"), (2, 60.0, 100.0, "AFDB"))
    .toDF("asdf_id", "alloc", "amount", "donors")

  test("submit -> tick -> results lifecycle with status machine") {
    val e = newEngine()
    e.submit(request)
    assert(e.status("req-1").contains(-1))
    val outcomes = e.tick(base, pixels, locations)
    assert(outcomes == Map("req-1" -> 1))
    assert(e.status("req-1").contains(1))
    val r = e.results("req-1").get
    assert(r.count() == 2)
    assert(r.columns.exists(_.startsWith("udel__1998__mean")))
  }

  test("batched artifact path: many same-schema completions in one tick " +
    "produce artifacts identical to the per-request path") {
    // round-13 verdict #3: a group of same-schema results goes through
    // ONE partitioned write per artifact kind (writeGroup); a singleton
    // goes through writeSingle. Run the same request body through both
    // shapes and require identical parquet rows and identical CSV BYTES
    // (the byte-golden contract the batch path must preserve, including
    // row order via the pre-shuffle ordinal).
    val eBatch = newEngine()
    val ids = (0 until 5).map(i => f"req-b$i")
    ids.foreach(i => eBatch.submit(request.copy(id = i)))
    val outB = eBatch.tick(base, pixels, locations)
    assert(outB == ids.map(_ -> 1).toMap)
    val eSingle = newEngine()
    eSingle.submit(request.copy(id = "req-s"))
    assert(eSingle.tick(base, pixels, locations) == Map("req-s" -> 1))
    def csvBytes(e: Engine, id: String): String = {
      val dir = new java.io.File(e.workRoot + s"/out/$id/results_csv")
      val f = dir.listFiles().filter(_.getName.endsWith(".csv"))
      assert(f.length == 1, s"expected one csv file in $dir")
      new String(java.nio.file.Files.readAllBytes(f.head.toPath))
    }
    val golden = csvBytes(eSingle, "req-s")
    ids.foreach { id =>
      val r = eBatch.results(id).get
      assert(r.count() == 2, s"$id results wrong")
      assert(csvBytes(eBatch, id) == golden,
        s"$id batched CSV bytes differ from the per-request path")
    }
  }

  test("batched path, oversized member: an artifact spanning >1 read split " +
    "demotes to writeSingle — one csv file, one header, byte-golden order") {
    // round-15 verdict #2 'done' criterion. The batched promote move is
    // only byte-golden while a request's staged CSV is ONE part file; an
    // artifact larger than a read split re-reads as several tasks, each
    // writing its own headered part with unpinned inter-part order. Force
    // that shape deterministically: tiny parquet row groups (the staged
    // write) + tiny maxPartitionBytes (the staged re-read), a 4000-zone
    // base so each member carries enough rows to split. The guard must
    // detect the multi-part staging and demote to writeSingle's
    // coalesce(1), whose bytes equal the per-request path's exactly.
    val hc = spark.sparkContext.hadoopConfiguration
    val prevBlock = Option(hc.get("parquet.block.size"))
    val prevMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val prevOpen = spark.conf.get("spark.sql.files.openCostInBytes")
    try {
      hc.setInt("parquet.block.size", 4096)
      spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      val bigBase = (1 to 4000).map(i => (i, s"zone-$i")).toDF("asdf_id", "name")
      val bigPixels = (1 to 4000).map(i =>
        (i, (i % 17).toDouble, 1.0, "A", 1998)).toDF(
        "asdf_id", "value", "weight", "cls", "temporal")
      val eBatch = newEngine()
      val ids = Seq("req-m0", "req-m1")
      ids.foreach(i => eBatch.submit(request.copy(id = i)))
      assert(eBatch.tick(bigBase, bigPixels, locations) == ids.map(_ -> 1).toMap)
      // non-vacuity: under these confs this artifact really is >1 split
      val splits = spark.read.parquet(
        eBatch.workRoot + "/out/req-m0/results").rdd.getNumPartitions
      assert(splits > 1, s"fixture too small to force a split (got $splits)")
      val eSingle = newEngine()
      eSingle.submit(request.copy(id = "req-ms"))
      assert(eSingle.tick(bigBase, bigPixels, locations) == Map("req-ms" -> 1))
      def csvOneFile(e: Engine, id: String): String = {
        val dir = new java.io.File(e.workRoot + s"/out/$id/results_csv")
        val f = dir.listFiles().filter(_.getName.endsWith(".csv"))
        assert(f.length == 1, s"expected ONE csv file in $dir, got ${f.length}")
        new String(java.nio.file.Files.readAllBytes(f.head.toPath))
      }
      val golden = csvOneFile(eSingle, "req-ms")
      val header = golden.linesIterator.next()
      assert(golden.linesIterator.count(_ == header) == 1,
        "golden csv must carry exactly one header line")
      ids.foreach { id =>
        val got = csvOneFile(eBatch, id)
        assert(got == golden, s"$id demoted CSV bytes differ from the " +
          "per-request path (order or header breakage)")
      }
    } finally {
      prevBlock match {
        case Some(v) => hc.set("parquet.block.size", v)
        case None => hc.unset("parquet.block.size")
      }
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevMax)
      spark.conf.set("spark.sql.files.openCostInBytes", prevOpen)
    }
  }

  test("completed requests are not reprocessed on the next tick") {
    val e = newEngine()
    e.submit(request)
    e.tick(base, pixels, locations)
    assert(e.tick(base, pixels, locations).isEmpty) // queue drained
  }

  test("failing request ends at -2 and yields no results") {
    val e = newEngine()
    val broken = request.copy(id = "req-x", release_data = Seq.empty,
      raster_data = Seq(RasterSelection(name = "x",
        extract_types = Seq("nope"), files = Seq(RasterFile("x_1998")))))
    e.submit(broken)
    assert(e.tick(base, pixels, locations) == Map("req-x" -> -2))
    assert(e.status("req-x").contains(-2))
    assert(e.results("req-x").isEmpty)
  }

  test("full lifecycle on real sf0.001 parquet with the bucketed-default cache") {
    import org.apache.spark.sql.functions.{col, lit}
    import graft.ops.Tables
    val d = "/root/testdata/sf0.001"
    val e = newEngine() // bucketed = true by default
    e.submit(Request(id = "r-real", priority = 5, boundary = Boundary("nga"),
      raster_data = Seq(RasterSelection("udel_precip_v401", Seq("mean", "sum"),
        Seq(RasterFile("udel_precip_v401_1995")))),
      release_data = Seq(ReleaseSelection("nigeriaaims",
        filters = Map("donors" -> Seq("AFDB"))))))
    val realBase = Tables.nation(spark, d)
      .select(col("n_nationkey").as("asdf_id"), col("n_name"))
    val realLocs = Tables.locations(spark, d)
      .withColumn("asdf_id", col("cell_id") % 25)
      .withColumn("alloc", col("amount") * lit(0.9))
      .withColumn("donors", lit("AFDB"))
    val outcomes = e.tick(realBase, Tables.pixels(spark, d), realLocs)
    assert(outcomes == Map("r-real" -> 1))
    val r = e.results("r-real").get
    assert(r.count() == 25) // one row per nation zone
    assert(r.columns.exists(_.startsWith("udel_precip_v401__1995__mean")))
    assert(r.columns.exists(_.endsWith("__reliability")))
    // second tick: queue drained, extracts memoized — nothing recomputes
    assert(e.tick(realBase, Tables.pixels(spark, d), realLocs).isEmpty)
    assert(e.pipeline.misses(e.pipeline.checkRequest(
      Request(id = "other", boundary = Boundary("nga"),
        release_data = Seq(ReleaseSelection("nigeriaaims",
          filters = Map("donors" -> Seq("AFDB"))))))).isEmpty)
  }

  test("bundle zips the artifacts of a completed request") {
    val e = newEngine()
    e.submit(request)
    e.tick(base, pixels, locations)
    val zip = Files.createTempDirectory("graft_zip").resolve("r.zip")
    e.bundle("req-1", zip.toString)
    val zf = new java.util.zip.ZipFile(zip.toFile)
    try {
      val names = new Iterator[String] {
        val en = zf.entries(); def hasNext = en.hasMoreElements
        def next() = en.nextElement().getName
      }.toSet
      assert(names.exists(_.endsWith("request.json")))
      assert(names.exists(_.contains("results_csv")))
    } finally zf.close()
  }

  test("a restarted engine still holds submitted requests and can process them") {
    val dir = Files.createTempDirectory("graft_engine").toString
    new Engine(spark, dir).submit(request) // first engine dies after submit
    val e2 = new Engine(spark, dir)
    assert(e2.status("req-1").contains(-1))
    assert(e2.tick(base, pixels, locations) == Map("req-1" -> 1))
    assert(e2.results("req-1").get.count() == 2)
  }

  test("CronTick pass: JSONL drop file -> submitted -> processed -> artifacts") {
    // uses the existing session (CronTick's builder getOrCreate reuses it)
    val work = Files.createTempDirectory("graft_cron").toString
    val drop = Files.createTempDirectory("graft_drop").resolve("reqs.jsonl")
    val req = Request(id = "cron-1", priority = 1,
      boundary = Boundary("nga"),
      raster_data = Seq(RasterSelection("udel_precip_v401", Seq("mean"),
        Seq(RasterFile("udel_precip_v401_1995")))),
      release_data = Seq(ReleaseSelection("nigeriaaims",
        filters = Map("donors" -> Seq("AFDB")))))
    // the drop file mixes a full document, a minimal frontend document
    // relying on Scala-side defaults (no status/priority/email/stage),
    // and one garbage line — only the garbage line may be skipped
    val full = Seq(req).toDS().toJSON.collect().head
    val minimal = """{"id":"cron-2","boundary":{"name":"nga"},""" +
      """"raster_data":[{"name":"udel_precip_v401","extract_types":["mean"],""" +
      """"files":[{"name":"udel_precip_v401_1995"}]}]}"""
    Files.writeString(drop, s"$full\n$minimal\nnot json at all\n")
    CronTick.main(Array(work, "/root/testdata/sf0.001", drop.toString))
    val e = new Engine(spark, work)
    assert(e.status("cron-1").contains(1))
    assert(e.results("cron-1").get.count() == 25)
    assert(e.status("cron-2").contains(1), "minimal document must process")
  }

  test("CronTick fails loudly on a mistyped drop-file path") {
    val work = Files.createTempDirectory("graft_cron").toString
    intercept[IllegalArgumentException] {
      CronTick.main(Array(work, "/root/testdata/sf0.001", "/no/such/file.jsonl"))
    }
  }

  test("tick heals a submit-crash orphan (body stored, queue row lost)") {
    val dir = Files.createTempDirectory("graft_engine").toString
    val e1 = new Engine(spark, dir)
    e1.submit(request)
    // simulate the crash window: body persisted, queue row gone — reset
    // the states table to an unrelated committed snapshot
    val states = new graft.ops.StateTable(spark, s"$dir/state", Seq("id"))
    states.commit(Seq(("someone-else", 1, 0L)).toDF("id", "status", "submit_time"))
    val e2 = new Engine(spark, dir)
    assert(e2.status("req-1").isEmpty, "queue row really is gone")
    assert(e2.tick(base, pixels, locations) == Map("req-1" -> 1),
      "orphan reconcile must re-insert the queue row and process it")
  }

  test("fuzz: random submit/tick/crash/restart/orphan schedules — no lost " +
    "request, no double-processing, live stores drain, archive partitions") {
    // Engine-level companion to the StateTableSpec model fuzz: the state
    // layer's 100 schedules check the table contract cheaply; these
    // schedules drive the FULL lifecycle (submit→pipeline→artifacts→
    // compaction) where each tick costs real processing. Double-
    // processing is detected by artifact mtime: a completed request's
    // results _SUCCESS must never be rewritten by any later tick,
    // whatever resubmits/crashes follow.
    def mkReq(id: String, failing: Boolean): Request =
      if (failing) request.copy(id = id, release_data = Seq.empty,
        raster_data = Seq(RasterSelection(name = "x",
          extract_types = Seq("nope"), files = Seq(RasterFile("x_1998")))))
      else request.copy(id = id)
    for (seed <- 0 until 15) {
      val rnd = new scala.util.Random(seed)
      val dir = Files.createTempDirectory(s"graft_efuzz$seed").toString
      var e = new Engine(spark, dir, bucketed = false)
      val submitted = scala.collection.mutable.Map[String, Boolean]() // id -> failing
      val doneMtime = scala.collection.mutable.Map[String, Long]()
      def noteCompletions(outcomes: Map[String, Int]): Unit =
        outcomes.collect { case (id, 1) =>
          // FIRST completion wins: recording on every report would refresh
          // the stored mtime when a reprocessing bug rewrites the artifact,
          // making the final compare pass on the very defect it hunts
          doneMtime.getOrElseUpdate(id,
            new java.io.File(s"$dir/out/$id/results/_SUCCESS").lastModified())
        }: Unit
      var n = 0
      def freshId(): String = { n += 1; s"f$seed-$n" }
      for (_ <- 0 until 3 + rnd.nextInt(4)) {
        rnd.nextInt(5) match {
          case 0 | 1 => // submit batch: new ids, dup ids, resubmits of done ids
            val reqs = (0 until 1 + rnd.nextInt(3)).map { _ =>
              if (submitted.nonEmpty && rnd.nextInt(4) == 0) {
                val id = submitted.keys.toSeq.sorted(
                  Ordering.String)(rnd.nextInt(submitted.size))
                // resubmit with the OPPOSITE body shape — the first body
                // must win everywhere, so the final status must still
                // match the ORIGINAL shape
                mkReq(id, !submitted(id))
              } else {
                val id = freshId(); val failing = rnd.nextInt(4) == 0
                submitted(id) = failing; mkReq(id, failing)
              }
            }
            e.submitAll(reqs): Unit
          case 2 => noteCompletions(e.tick(base, pixels, locations))
          case 3 => e = new Engine(spark, dir, bucketed = false) // crash+restart
          case 4 => // submit-crash orphan: body durable, queue row lost
            val id = freshId(); val failing = rnd.nextInt(4) == 0
            submitted(id) = failing
            val body = mkReq(id, failing)
              .copy(status = -1, stage = Seq(StageTime("submit", 0L)))
            new graft.ops.StateTable(spark, s"$dir/requests", Seq("id"))
              .upsert(Seq(body).toDS().toDF()): Unit
        }
      }
      // drain: a restarted engine heals orphans and finishes everything
      e = new Engine(spark, dir, bucketed = false)
      noteCompletions(e.tick(base, pixels, locations))
      assert(e.tick(base, pixels, locations).isEmpty,
        s"seed=$seed: a drained queue must tick empty")
      submitted.foreach { case (id, failing) =>
        assert(e.status(id).contains(if (failing) -2 else 1),
          s"seed=$seed $id: lost or wrong terminal status")
        assert(e.results(id).isDefined == !failing,
          s"seed=$seed $id: results must exist iff completed")
      }
      doneMtime.foreach { case (id, mt) =>
        assert(new java.io.File(s"$dir/out/$id/results/_SUCCESS")
          .lastModified() == mt,
          s"seed=$seed $id: completed artifacts were rewritten (reprocessed)")
      }
      // live stores drain: terminal rows compact away, bodies follow
      Seq("state", "requests").foreach { t =>
        val live = new graft.ops.StateTable(spark, s"$dir/$t", Seq("id")).read()
        assert(live.forall(_.isEmpty), s"seed=$seed live $t must drain")
      }
      // full history partitions: every id exactly once, all terminal
      val all = new graft.ops.StateTable(spark, s"$dir/state", Seq("id"))
        .readAll().get.select("id", "status").collect()
        .map(r => r.getString(0) -> r.getInt(1))
      assert(all.length == all.map(_._1).distinct.length,
        s"seed=$seed duplicate ids across live∪archive")
      assert(all.map(_._1).toSet == submitted.keySet,
        s"seed=$seed history must hold exactly the submitted ids")
    }
  }

  test("driver holds no process-lifetime request-body map (bounded heap)") {
    // structural: the engine must not declare a mutable collection field —
    // bodies are durable in the request store and loaded per tick by a
    // pending-ids semi-join, so the driver heap is bounded by the live
    // queue head, not the lifetime request history
    val fields = classOf[Engine].getDeclaredFields.map(_.getType.getName)
    assert(!fields.exists(_.contains("mutable")),
      s"engine must not hold driver-side collections: ${fields.mkString(", ")}")
    // behavioral: a 5k-request backlog submits, drains, and never
    // reprocesses — purely from the durable store
    val e = newEngine()
    val reqs = (1 to 5000).map(i => Request(id = f"bulk-$i%05d",
      boundary = Boundary("nga"), release_data = Seq.empty, raster_data = Seq.empty))
    e.submitAll(reqs)
    val out = e.tick(base, pixels, locations)
    assert(out.size == 5000 && out.values.forall(_ == -2)) // invalid → error status
    assert(e.tick(base, pixels, locations).isEmpty, "backlog fully drained")
  }

  test("terminal rows leave the live queue table after the tick (compaction)") {
    val dir = Files.createTempDirectory("graft_engine").toString
    val e = new Engine(spark, dir)
    e.submit(request)
    assert(e.tick(base, pixels, locations) == Map("req-1" -> 1))
    val st = new graft.ops.StateTable(spark, s"$dir/state", Seq("id"))
    assert(st.read().get.count() == 0, "live queue drained of terminal rows")
    assert(st.archive().get.count() == 1, "terminal row archived")
    assert(e.status("req-1").contains(1), "status served from the archive")
    val bodies = new graft.ops.StateTable(spark, s"$dir/requests", Seq("id"))
    assert(bodies.read().get.count() == 0, "terminal bodies archived too")
    assert(e.results("req-1").get.count() == 2, "results unaffected")
    assert(e.tick(base, pixels, locations).isEmpty, "archive is not re-queued")
  }

  test("re-submitting a compacted (archived) id stays idempotent — no reprocess") {
    val e = newEngine()
    e.submit(request)
    assert(e.tick(base, pixels, locations) == Map("req-1" -> 1))
    // req-1's row now lives in the archive; a duplicate submission must
    // NOT re-enter the queue as new (the reference's find-then-insert
    // never forgets a completed id)
    e.submit(request)
    assert(e.status("req-1").contains(1), "completed status must survive re-submit")
    assert(e.tick(base, pixels, locations).isEmpty, "no reprocessing")
  }

  test("golden fixture request: CSV column grammar and JSON echo are " +
    "byte-stable end-to-end (S5/S6 against the doc_test.py document)") {
    // The captured production request (src/test/resources/
    // request_fixture.json, from the reference's queue/doc_test.py:12-96)
    // driven through the REAL lifecycle: submit → Pipeline.tick →
    // Artifacts. Byte-golden on (1) the results CSV — column ORDER
    // (asdf_id, extract columns, passthrough), the dotted display-name
    // grammar with BOTH msr hash segments (the fixture's two donor
    // filters hash differently), '' nulls — and (2) the S6 request echo
    // as canonical JSON. Any drift in naming, hashing, ordering, or JSON
    // rendering fails byte-compare.
    val fixtureReq = Request(
      id = "57a2ff1bc15e002f448b4568",
      boundary = Boundary("nga_adm0_gadm28",
        title = "Nigeria ADM0 Boundary - GADM 2.8", group = "nga_gadm28"),
      release_data = Seq(
        ReleaseSelection(
          dataset = "nigeriaaims_geocodedresearchrelease_level1_v1_3",
          custom_name = "New Request",
          filters = Map("donors" -> Seq("AFDB"),
            "ad_sector_names" -> Seq("All"))),
        ReleaseSelection(
          dataset = "nigeriaaims_geocodedresearchrelease_level1_v1_3",
          custom_name = "hiiiiii",
          filters = Map("donors" -> Seq("AFDB", "France"),
            "ad_sector_names" -> Seq("All")))),
      raster_data = Seq(RasterSelection(name = "udel_precip_v401_min",
        extract_types = Seq("mean"),
        files = Seq(RasterFile("udel_precip_v401_min_1998",
          path = "precip_1998_min.tif")))),
      email = "user@example.com",
      custom_name = "My Full test request")
    val dir = Files.createTempDirectory("graft_golden_fix").toString
    val e = new Engine(spark, dir)
    e.submit(fixtureReq)
    val locs = Seq((1, 40.0, 100.0, "AFDB"), (1, 25.0, 50.0, "France"),
      (2, 60.0, 100.0, "AFDB"), (2, 30.0, 60.0, "World Bank"))
      .toDF("asdf_id", "alloc", "amount", "donors")
    assert(e.tick(base, pixels, locs) == Map(fixtureReq.id -> 1))
    val csvDir = new java.io.File(s"$dir/out/${fixtureReq.id}/results_csv")
    val csvFile = csvDir.listFiles().filter(_.getName.endsWith(".csv")).head
    val csvBytes = java.nio.file.Files.readAllBytes(csvFile.toPath)
    val echoPath = Files.createTempDirectory("graft_echo").resolve("request.json")
    graft.ops.Artifacts.writeRequestJson(fixtureReq, echoPath.toString)
    val echoBytes = java.nio.file.Files.readAllBytes(echoPath)
    def check(name: String, actual: Array[Byte]): Unit = {
      val res = getClass.getResourceAsStream(s"/golden/$name")
      if (res == null) {
        // first recording: emit the candidate for review, then fail —
        // a golden must be added to resources deliberately, never blind
        val cand = java.nio.file.Paths.get("target/golden_candidates", name)
        java.nio.file.Files.createDirectories(cand.getParent)
        java.nio.file.Files.write(cand, actual)
        fail(s"golden $name missing; candidate written to $cand")
      }
      val golden = res.readAllBytes()
      assert(java.util.Arrays.equals(actual, golden),
        s"$name drifted from golden:\n${new String(actual)}")
    }
    check("fixture_results.csv", csvBytes)
    check("fixture_request.json", echoBytes)
  }

  test("golden bundle: CSV bytes match the recorded artifact exactly") {
    // locks the whole S5/S6/S9 edge in one assertion: merge column order,
    // the dotted display-name grammar (incl. the canonical-JSON hash_key
    // segment), '' nulls, and float rendering must all stay byte-stable
    val e = newEngine()
    e.submit(request)
    e.tick(base, pixels, locations)
    val zip = Files.createTempDirectory("graft_zip").resolve("r.zip")
    e.bundle("req-1", zip.toString)
    val zf = new java.util.zip.ZipFile(zip.toFile)
    try {
      val en = zf.entries()
      var csv: Option[Array[Byte]] = None
      while (en.hasMoreElements) {
        val entry = en.nextElement()
        if (entry.getName.contains("results_csv") && entry.getName.endsWith(".csv"))
          csv = Some(zf.getInputStream(entry).readAllBytes())
      }
      val golden = getClass.getResourceAsStream("/golden/bundle_results.csv").readAllBytes()
      assert(csv.isDefined, "bundle contains no results CSV")
      assert(java.util.Arrays.equals(csv.get, golden),
        s"bundle CSV drifted from golden:\n${new String(csv.get)}")
    } finally zf.close()
  }
}
