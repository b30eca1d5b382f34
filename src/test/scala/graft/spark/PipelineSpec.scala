package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.fixtures.PdfFixtures

/** Spark end-to-end: t1 smoke table (statuses, dedup, lineage) and the
  * kill/resume integration test (t3) over the Iceberg-shaped warehouse.
  */
class PipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("t1 smoke: statuses, latest-capture dedup, byte-identity") {
    import spark.implicits._
    val pages = PagesGen.smokeTable(spark)
    val out = Pipeline.run(spark, pages, "t1").collect().map(r => r.url -> r).toMap

    assert(out.size == 7) // 8 rows, 1 duplicate url collapsed
    assert(out("https://t/ok-pdf").status == "ok")
    assert(out("https://t/ok-pdf").text == "Hello World")
    assert(out("https://t/ok-flate").text == "compressed")
    assert(out("https://t/ok-html").status == "ok")
    assert(out("https://t/dup").text == "new capture") // latest warc_ts wins
    assert(out("https://t/err").status == "error")
    assert(out("https://t/err").text == "partial")
    assert(out("https://t/empty").status == "empty")
    // Byte identity: text_bytes match the kernel run directly.
    val direct = graft.Extract(PdfFixtures.s01("Hello World"))
    assert(out("https://t/ok-pdf").text_bytes.sameElements(direct.textBytes))
  }

  test("oversize cap produces skipped_oversize with lineage accounting") {
    import spark.implicits._
    val acc = spark.sparkContext.collectionAccumulator[LineageRow]("lin-test")
    val pages = PagesGen.smokeTable(spark)
    val out = Pipeline.extract(spark, Pipeline.dedupLatest(pages), "t1b",
      maxBytesPerDoc = 900, lineageAcc = acc).collect()
    val oversize = out.filter(_.status == "skipped_oversize")
    assert(oversize.nonEmpty) // the 1KB doc trips the cap
    import scala.jdk.CollectionConverters._
    val lineage = acc.value.asScala
    assert(lineage.map(_.input_rows).sum == 7)
    assert(lineage.map(_.ok_rows).sum == out.count(_.status == "ok"))
    assert(lineage.map(_.err_rows).sum == out.count(_.status == "error"))
    assert(lineage.map(_.bytes_out).sum == out.map(_.text_bytes.length.toLong).sum)
  }

  test("lineage flushes even when a downstream limit() stops consuming early") {
    import scala.jdk.CollectionConverters._
    val acc = spark.sparkContext.collectionAccumulator[LineageRow]("lin-early")
    val pages = PagesGen.smokeTable(spark)
    val got = Pipeline.extract(spark, pages, "t1c", lineageAcc = acc)
      .limit(1).collect()
    assert(got.length == 1)
    // The task-completion listener flushes each launched task's lineage row
    // even though the iterator was never exhausted.
    assert(acc.value.asScala.nonEmpty)
    assert(acc.value.asScala.map(_.input_rows).sum >= 1)
  }

  test("vacuum removes stranded uncommitted batch dirs, keeps every committed one") {
    import spark.implicits._
    val docs = (0 until 40).map { i =>
      PageRow(f"https://vac/doc-$i%04d", new java.sql.Timestamp(PagesGen.BaseTs + i),
        PdfFixtures.s01(s"vac doc $i"), "", "en")
    }
    val wh = Files.createTempDirectory("wh-vac").toString
    TableIO.runResumable(spark, docs.toDF(), wh, "vac", numBuckets = 4, batchBuckets = 2)
    val before = TableIO.readData(spark, wh).get.count()
    // Strand two orphan dirs: a crashed batch's data output and its lineage.
    val orphanData = new java.io.File(s"$wh/data/batch-99-deadbeef")
    val orphanLin = new java.io.File(s"$wh/lineage/batch-99-deadbeef")
    orphanData.mkdirs(); orphanLin.mkdirs()
    Files.writeString(orphanData.toPath.resolve("part-junk.parquet"), "junk")
    // Default min-age guard: a FRESH stranded dir (possibly a concurrent
    // writer mid-commit) must NOT be swept...
    assert(TableIO.vacuum(wh).isEmpty)
    assert(orphanData.exists())
    // ...but once old enough it is.
    val removed = TableIO.vacuum(wh, minAgeMs = 0)
    assert(removed.toSet == Set(orphanData.getCanonicalPath, orphanLin.getCanonicalPath),
      removed.toString)
    assert(!orphanData.exists() && !orphanLin.exists())
    // Committed data untouched, table still reads identically.
    assert(TableIO.readData(spark, wh).get.count() == before)
    assert(TableIO.vacuum(wh, minAgeMs = 0).isEmpty) // idempotent
  }

  test("manifest round-trips dirs containing ']' (vacuum must not mistake them for orphans)") {
    val wh = Files.createTempDirectory("wh-br[1]").toString
    TableIO.commit(wh, Set(0), Some(s"$wh/data/batch-1-x"), Some(s"$wh/lineage/batch-1-x"), 4)
    val rt = TableIO.currentSnapshot(wh).get
    // A ']' inside the path previously truncated the regex-parsed arrays to
    // Nil — and vacuum would then sweep every committed dir.
    assert(rt.dataDirs == Seq(s"$wh/data/batch-1-x"), rt.dataDirs)
    assert(rt.lineageDirs == Seq(s"$wh/lineage/batch-1-x"))
    new java.io.File(s"$wh/data/batch-1-x").mkdirs()
    new java.io.File(s"$wh/lineage/batch-1-x").mkdirs()
    assert(TableIO.vacuum(wh, minAgeMs = 0).isEmpty)
    assert(new java.io.File(s"$wh/data/batch-1-x").exists())
  }

  test("t3 kill/resume: killed job restarts from last committed snapshot, no dups/missing") {
    import spark.implicits._
    val docs = (0 until 200).map { i =>
      PageRow(f"https://t3/doc-$i%04d", new java.sql.Timestamp(PagesGen.BaseTs + i),
        PdfFixtures.s01(s"document number $i content"), "", "en")
    }
    val pages = docs.toDF()

    // Full run (no failure) as the golden result.
    val whFull = Files.createTempDirectory("wh-full").toString
    TableIO.runResumable(spark, pages, whFull, "full", numBuckets = 8, batchBuckets = 2)
    val full = TableIO.readData(spark, whFull).get
      .select("url", "text").collect().map(r => (r.getString(0), r.getString(1))).sorted

    // Killed run: fails after 2 committed batches, then resumes.
    val whKill = Files.createTempDirectory("wh-kill").toString
    intercept[RuntimeException] {
      TableIO.runResumable(spark, pages, whKill, "killed", numBuckets = 8,
        batchBuckets = 2, failAfterBatches = 2)
    }
    val partial = TableIO.currentSnapshot(whKill).get
    assert(partial.committedBuckets.size == 4) // 2 batches x 2 buckets committed
    // Resume: only uncommitted buckets run.
    TableIO.runResumable(spark, pages, whKill, "resumed", numBuckets = 8, batchBuckets = 2)
    val resumed = TableIO.readData(spark, whKill).get
      .select("url", "text").collect().map(r => (r.getString(0), r.getString(1))).sorted

    assert(resumed.length == 200) // no missing
    assert(resumed.map(_._1).distinct.length == 200) // no dups
    assert(resumed.toSeq == full.toSeq) // identical output
    // Lineage table covers both runs.
    val lineage = TableIO.readLineage(spark, whKill).get
    assert(lineage.agg(sum("input_rows")).head().getLong(0) == 200)

    // Resuming with a DIFFERENT bucket count must fail fast: it would
    // silently remap url->bucket and duplicate/miss documents.
    val e = intercept[IllegalArgumentException] {
      TableIO.runResumable(spark, pages, whKill, "wrong-buckets", numBuckets = 16)
    }
    assert(e.getMessage.contains("numBuckets"))
  }

  test("parquetRowCount reads footer metadata only, matches count()") {
    val p = "/root/testdata/sf0.001/documents.parquet"
    assert(TableIO.parquetRowCount(spark, p) == spark.read.parquet(p).count())
    // PARTITIONED layout (key=value subdirs) counts recursively
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("prc").toString
    (0 until 100).map(i => (i.toLong, i % 3)).toDF("v", "k")
      .write.partitionBy("k").parquet(s"$dir/t")
    assert(TableIO.parquetRowCount(spark, s"$dir/t") == 100L)
    // empty/wrong path fails LOUDLY instead of returning 0
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$dir/empty"))
    intercept[IllegalArgumentException] {
      TableIO.parquetRowCount(spark, s"$dir/empty")
    }
    TableIO.deleteRecursively(new java.io.File(dir))
  }

  test("extractImages: one pass emits per-image rows + no-image markers") {
    import spark.implicits._
    val ts = new java.sql.Timestamp(0L)
    val pages = Seq(
      PageRow("u-img", ts, graft.fixtures.PdfFixtures.sImages("pic doc", 9L), "", "en"),
      PageRow("u-plain", ts, graft.fixtures.PdfFixtures.s01("no pics"), "", "en"),
      PageRow("u-html", ts, graft.fixtures.PdfFixtures.htmlSimple("web page"), "", "en"),
      PageRow("u-garbage", ts, "%PDF-nope".getBytes, "", "en"),
      PageRow("u-empty", ts, Array.emptyByteArray, "", "en"),
      PageRow("u-big", ts, Array.fill[Byte](60)('x'), "", "en")).toDF()
    val rows = Pipeline.extractImages(spark, pages, maxBytesPerDoc = 50).collect()
    // oversize cap of 50 bytes only catches u-big; raise for the real docs
    val rows2 = Pipeline.extractImages(spark,
      pages.filter(col("url") =!= "u-big")).collect()
    val byUrl = rows2.groupBy(_.url)
    // the status taxonomy holds (the images-table analogue of x34)
    assert(rows.find(_.url == "u-big").get.status == "skipped_oversize")
    assert(byUrl("u-empty").head.status == "empty")
    assert(byUrl("u-html").head.status == "non_pdf")
    assert(byUrl("u-garbage").head.status == "error")
    assert(byUrl("u-plain").head.status == "ok")
    assert(byUrl("u-img").forall(_.status == "ok"))
    // TIMEOUT guard is live on the image path: a 200k-op content stream
    // (the parse loop polls Deadline every 1024 ops) against a 1 ms budget
    // becomes a timeout marker, not a stuck task
    val spin = {
      val c = ("BT " + "0 0 Td " * 200000 + "ET")
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      val bld = new graft.fixtures.PdfFixtures.Builder()
      bld.obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
      bld.obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>")
      bld.obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
      bld.stream(4, s"<< /Length ${c.length} >>", c)
      bld.build()
    }
    val hrows = Pipeline.extractImages(spark,
      Seq(PageRow("u-spin", ts, spin, "", "en")).toDF(), timeoutMs = 1).collect()
    assert(hrows.map(_.status).toSeq == Seq("timeout"))
    // the image page yields its 3 XObjects + 1 inline, formula-exact stats
    val imgs = byUrl("u-img").sortBy(_.idx)
    assert(imgs.length == 4)
    assert(imgs.map(_.source).toSeq == Seq("xobject", "xobject", "xobject", "inline"))
    val im0 = imgs.head
    assert((im0.width, im0.height, im0.bpc, im0.components) ==
      (8 + 9 % 24, 8 + (9 / 7) % 16, 8, 1))
    assert(im0.band0_sum == (for (y <- 0 until im0.height; x <- 0 until im0.width)
      yield (x + y + 9) % 256).sum)
    // image-less / non-PDF / unparseable docs each keep exactly one marker
    for (u <- Seq("u-plain", "u-html", "u-garbage", "u-empty")) {
      assert(byUrl(u).length == 1, u)
      assert(byUrl(u).head.source == "none", u)
    }
    assert(byUrl("u-garbage").head.n_errors == 1)
    assert(byUrl("u-html").head.n_errors == 0)
    // plan shape: no exchange before the kernel (same contract as extract)
    val plan = Pipeline.extractImages(spark, pages).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "extractImages must not pre-shuffle")
  }

  test("extraction plan: single shuffle (repartition), kernel in one mapPartitions") {
    val pages = PagesGen.smokeTable(spark)
    val ds = Pipeline.extract(spark, pages, "plan", numPartitions = 4)
    val plan = ds.queryExecution.executedPlan.toString
    // exactly one exchange below the kernel (the url repartition)
    assert(plan.contains("Exchange"))
    assert(plan.contains("SerializeFromObject")) // typed kernel present
  }

  test("extraction plan DEFAULT: no pre-kernel shuffle (scan partitions feed the kernel)") {
    val pages = PagesGen.smokeTable(spark)
    val ds = Pipeline.extract(spark, pages, "plan-default") // numPartitions = -1
    val plan = ds.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"default path must not shuffle payloads:\n$plan")
  }

  test("extract_text Catalyst expression via SQL") {
    import spark.implicits._
    GraftFunctions.register(spark)
    PagesGen.smokeTable(spark).createOrReplaceTempView("pages_smoke")
    val rows = spark.sql(
      """SELECT url, extract_text(html).text AS text, extract_text(html).status AS status
        |FROM pages_smoke WHERE url = 'https://t/ok-pdf'""".stripMargin).collect()
    assert(rows.length == 1)
    assert(rows.head.getString(1) == "Hello World")
    assert(rows.head.getString(2) == "ok")
    // null-safety + type check
    val nullRow = spark.sql("SELECT extract_text(CAST(NULL AS BINARY)) AS r").collect()
    assert(nullRow.head.isNullAt(0))
    intercept[Exception](spark.sql("SELECT extract_text('not binary at all')").collect())
  }

  test("extract_text participates in codegen (no CodegenFallback row)") {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    GraftFunctions.register(spark)
    PagesGen.smokeTable(spark).createOrReplaceTempView("pages_smoke_cg")
    val df = spark.sql(
      "SELECT extract_text(html).text AS t FROM pages_smoke_cg WHERE url = 'https://t/ok-pdf'")
    // The expression itself must not be a fallback...
    val exprs = df.queryExecution.analyzed.expressions
      .flatMap(_.collect { case e: ExtractTextExpr => e })
    assert(exprs.nonEmpty)
    assert(!exprs.exists(_.isInstanceOf[CodegenFallback]))
    // ...and the generated code must actually COMPILE: CODEGEN_ONLY makes
    // janino failures throw instead of silently falling back to interpreted.
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val rows = df.collect()
      assert(rows.head.getString(0) == "Hello World")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("entry() flagship returns rows on sf0.001") {
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    assert(n > 0)
    assert(df.filter(col("status") === "ok").count() == n) // all fixtures extract cleanly
  }

  test("t2: fixture corpus through the pipeline, byte-identical golden join, match rate 1.0") {
    import spark.implicits._
    // Every PDF container variant x 25 texts, with the expected text known
    // by construction; golden verification join per SURVEY §2.10.
    val rows = for {
      i <- 0 until 25
      v <- 0 until 4
    } yield {
      val text = s"golden doc $i variant $v with some content to extract"
      graft.spark.PageRow(f"https://t2/doc-$i%03d-$v", new java.sql.Timestamp(PagesGen.BaseTs + i),
        PagesGen.payloadFor(i.toLong * 4 + v, text, v), text /* golden rides along */, "en")
    }
    val pages = rows.toDF()
    val extracted = Pipeline.run(spark, pages, "t2").toDF()
    val golden = pages.select(col("url"), col("text").as("expected"))
    val joined = extracted.join(broadcast(golden), "url")
    val total = joined.count()
    assert(total == 100)
    val matched = joined.filter(col("text") === col("expected")).count()
    assert(matched == total) // byte-identical match rate = 1.0
    assert(joined.filter(col("status") =!= "ok").count() == 0)
  }
}
