package graft.sources

import graft.SparkTestSession
import graft.metrics.BytePlanner
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class LayoutsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  private lazy val lineitem =
    spark.read.parquet(s"${SparkTestSession.sf001}/lineitem.parquet")

  test("sortedStats layout makes range predicates prune groups AND pages") {
    val dir = java.nio.file.Files.createTempDirectory("layout-sorted").toString
    Layouts.sortedStats(lineitem, dir, Seq("l_extendedprice"),
      groupBytes = 256 * 1024, pageRows = 1000, partitions = 2)
    val pred = "l_extendedprice > 80000.0"
    val rg = BytePlanner.plan(dir, Seq("l_extendedprice"), Some(pred))
    rg.rowGroups should be > 2
    rg.survivingGroups should be < rg.rowGroups
    val pp = BytePlanner.planPages(dir, Seq("l_extendedprice"), pred)
    pp.survivingPages should be < pp.pages
    // and the data itself is intact
    spark.read.parquet(dir).count() shouldBe lineitem.count()
  }

  test("zordered layout prunes pages on EITHER interleaved column") {
    val zDir = java.nio.file.Files.createTempDirectory("layout-z").toString
    Layouts.zordered(lineitem, zDir, "l_extendedprice", "l_quantity",
      groupBytes = 16 * 1024 * 1024, pageRows = 500, partitions = 1)
    val sortDir = java.nio.file.Files.createTempDirectory("layout-sort1").toString
    Layouts.sortedStats(lineitem, sortDir, Seq("l_extendedprice"),
      groupBytes = 16 * 1024 * 1024, pageRows = 500, partitions = 1)
    def frac(dir: String, pred: String, c: String): Double = {
      val pp = BytePlanner.planPages(dir, Seq(c), pred)
      pp.survivingPages.toDouble / pp.pages
    }
    // leading-column predicate: both layouts prune
    frac(zDir, "l_extendedprice > 90000.0", "l_extendedprice") should be < 0.8
    frac(sortDir, "l_extendedprice > 90000.0", "l_extendedprice") should be < 0.8
    // second-column predicate: the single-sort layout is blind, Z is not
    val zQty = frac(zDir, "l_quantity > 45.0", "l_quantity")
    val sortQty = frac(sortDir, "l_quantity > 45.0", "l_quantity")
    zQty should be < 0.8
    sortQty should be > 0.95 // quantity uncorrelated with the sort key
    zQty should be < sortQty
    // conjunction across both columns prunes harder than either alone
    val both = frac(zDir, "l_extendedprice > 90000.0 AND l_quantity > 45.0", "l_quantity")
    both should be <= zQty
    spark.read.parquet(zDir).count() shouldBe lineitem.count()
  }

  test("compact merges small-file debris and can restore sortedness") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val inDir = java.nio.file.Files.createTempDirectory("compact-in").toString
    // simulate streaming debris: 40 tiny files
    lineitem.repartition(40).write.mode("overwrite").parquet(inDir)
    val nIn = new java.io.File(inDir).listFiles().count(_.getName.endsWith(".parquet"))
    nIn should be >= 30
    val outDir = java.nio.file.Files.createTempDirectory("compact-out").toString
    Layouts.compact(inDir, outDir, targetBytes = 512 * 1024, sortCols = Seq("l_quantity"))
    val nOut = new java.io.File(outDir).listFiles().count(_.getName.endsWith(".parquet"))
    nOut should be < nIn / 3
    spark.read.parquet(outDir).count() shouldBe lineitem.count()
    // re-sorting restored prunable statistics across the output files
    val p = BytePlanner.plan(outDir, Seq("l_quantity"), Some("l_quantity > 45.0"))
    p.survivingGroups should be < p.rowGroups
  }

  test("postingIndex layout: term probes prune the index, never scan the corpus") {
    val docs = spark.read.parquet(s"${SparkTestSession.sf001}/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("layout-posting").toString
    Layouts.postingIndex(docs, dir, groupBytes = 16 * 1024, pageRows = 500,
      partitions = 2)

    // the index is term-sorted, so a single-trigram probe keeps a sliver
    val rg = BytePlanner.plan(dir, Seq("doc_id", "tri"), Some("tri == tab"))
    rg.rowGroups should be > 2
    rg.survivingGroups should be < rg.rowGroups
    rg.survivingGroups should be > 0

    // the probe plan reads the index parquet only: no `text` column exists
    // in it to scan — the corpus is touched later, and only for candidates
    // (batch_id is the r15 maintenance partition level, not payload)
    val posting = spark.read.parquet(dir)
    posting.columns.toSeq should contain theSameElementsAs Seq("doc_id", "tri", "batch_id")

    // probing the persisted index reproduces the inline x87 candidate set
    import org.apache.spark.sql.functions.{array_distinct, col, countDistinct, explode, expr, length => slen}
    val pat = "table part"
    val tris = (0 to pat.length - 3).map(i => pat.substring(i, i + 3)).distinct
    val fromIndex = posting.where(col("tri").isin(tris: _*))
      .groupBy("doc_id").agg(countDistinct("tri").as("nt"))
      .where(col("nt") === tris.size)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val inline = docs.where(slen(col("text")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))"))).as("tri"))
      .where(col("tri").isin(tris: _*))
      .groupBy("doc_id").agg(countDistinct("tri").as("nt"))
      .where(col("nt") === tris.size)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    fromIndex shouldBe inline
  }

  test("postingAppend lifecycle: grown ≡ rebuilt, replay no-op, rebase invariant") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"${SparkTestSession.sf001}/documents.parquet")
    val even = docs.where(col("doc_id") % 2 === 0)
    val odd = docs.where(col("doc_id") % 2 === 1)
    val grown = java.nio.file.Files.createTempDirectory("posting-grow").toString
    Layouts.postingIndex(even, grown, groupBytes = 256L * 1024, pageRows = 2000)
    Layouts.postingAppend(odd, grown,
      groupBytes = 256L * 1024, pageRows = 2000, batchId = Some("odd"))
    def rows(p: String) = spark.read.parquet(p).select("doc_id", "tri")
      .orderBy("doc_id", "tri").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val rebuilt = java.nio.file.Files.createTempDirectory("posting-rebuild").toString
    Layouts.postingIndex(docs, rebuilt, groupBytes = 256L * 1024, pageRows = 2000)
    val grownRows = rows(grown)
    grownRows.length should be > 0
    grownRows shouldBe rows(rebuilt) // per-doc independence: append ≡ rebuild
    // replay under the same id is a row-level no-op (the probe's
    // countDistinct would absorb duplicates, so pin it here)
    Layouts.postingAppend(odd, grown,
      groupBytes = 256L * 1024, pageRows = 2000, batchId = Some("odd"))
    rows(grown) shouldBe grownRows
    // rebase: one generation, same rows, tri-range pruning restored
    Layouts.sortedRebase(grown, Seq("tri"),
      groupBytes = 16 * 1024, pageRows = 500)(spark)
    rows(grown) shouldBe grownRows
    spark.read.parquet(grown).select("batch_id").distinct()
      .collect().map(_.getString(0)).toSeq shouldBe Seq("base")
    val rg = BytePlanner.plan(grown, Seq("doc_id", "tri"), Some("tri == tab"))
    rg.rowGroups should be > 2
    rg.survivingGroups should be < rg.rowGroups
    // legacy flat index refuses a replay-safe append
    val legacy = java.nio.file.Files.createTempDirectory("posting-legacy").toString
    spark.read.parquet(grown).select("doc_id", "tri")
      .write.mode("overwrite").parquet(legacy)
    intercept[IllegalArgumentException] {
      Layouts.postingAppend(odd, legacy, batchId = Some("b"))
    }
  }

  test("bloomKeys layout lets point probes prune what stats cannot") {
    val dir = java.nio.file.Files.createTempDirectory("layout-bloom").toString
    // write in incoming (unsorted-by-key) order: stats are blind to probes
    Layouts.bloomKeys(lineitem, dir, Seq("l_orderkey"))
    val keys = lineitem.select("l_orderkey").collect().map(_.getLong(0)).toSet
    val absent = (keys.min to keys.max).find(!keys(_)).get
    BytePlanner.planBloom(dir, Seq("l_orderkey"), Some(s"l_orderkey == $absent"))
      .survivingGroups shouldBe 0
    BytePlanner.planBloom(dir, Seq("l_orderkey"), Some(s"l_orderkey == ${keys.head}"))
      .survivingGroups should be > 0
  }

  test("hivePartitioned layout gets dynamic partition pruning from a filtered dim join") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("layout-hive").toString
    Layouts.hivePartitioned(lineitem, dir, "l_returnflag")
    // one directory per flag value
    new java.io.File(dir).listFiles().map(_.getName)
      .count(_.startsWith("l_returnflag=")) shouldBe 3
    // static pruning: a literal partition predicate never lists other dirs
    val fact = spark.read.parquet(dir)
    val static = fact.where($"l_returnflag" === "A")
    static.queryExecution.executedPlan.toString should include ("PartitionFilters: [")
    static.count() shouldBe lineitem.where($"l_returnflag" === "A").count()
    // dynamic pruning: the partition filter is only known at RUNTIME via
    // the dim subquery — the plan carries a dynamicpruning expression.
    // The dim must be a file relation: a LocalRelation folds the filter
    // away (ConvertToLocalRelation), leaving DPP no selective predicate.
    val dimDir = java.nio.file.Files.createTempDirectory("layout-hive-dim").toString
    Seq(("A", "accepted"), ("X", "unused")).toDF("flag", "label")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = fact.join(dim.where($"label" === "accepted"),
      $"l_returnflag" === $"flag")
    val plan = joined.queryExecution.executedPlan.toString
    plan.toLowerCase should include ("dynamicpruning")
    joined.count() shouldBe lineitem.where($"l_returnflag" === "A").count()
  }

  test("inParallel: runs every thunk on success, propagates the ORIGINAL " +
      "exception of a failure, and does not wait out slower siblings first") {
    // success path: all thunks execute exactly once
    import scala.jdk.CollectionConverters._
    val ran = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    Layouts.inParallel((1 to 4).map(i => () => { ran.add(i); () }): _*)
    ran.asScala.toSet shouldBe (1 to 4).toSet
    // failure path: the cause surfaces un-wrapped (not ExecutionException),
    // and a FAST failure in a later-submitted thunk is observed without
    // waiting for an earlier slow sibling to finish (the r18 ADVICE:
    // completions are taken in finish order) — the slow thunk here would
    // hold a submission-order wait for 30 s
    val t0 = System.nanoTime()
    val boom = intercept[IllegalStateException] {
      Layouts.inParallel(
        () => try Thread.sleep(30000) catch { case _: InterruptedException => },
        () => throw new IllegalStateException("fast failure"))
    }
    boom.getMessage shouldBe "fast failure"
    (System.nanoTime() - t0) / 1e9 should be < 20.0
  }

  test("copyTree: hardlink fork equals the source and isolates deletions; " +
      "the no-link fallback copies identically") {
    val conf = spark.sparkContext.hadoopConfiguration
    def writeTree(root: java.nio.file.Path): Unit = {
      java.nio.file.Files.createDirectories(root.resolve("sub/batch_id=a"))
      java.nio.file.Files.write(root.resolve("part-0.parquet"),
        "payload-0".getBytes("UTF-8"))
      java.nio.file.Files.write(root.resolve("sub/batch_id=a/part-1.parquet"),
        "payload-1".getBytes("UTF-8"))
      java.nio.file.Files.write(root.resolve("sub/batch_id=a/_SEALED"),
        Array.empty[Byte])
    }
    def treeOf(root: java.nio.file.Path): Map[String, String] = {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(root)
      try walk.iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        // the Hadoop local fs writes .crc sidecars on its copy path (and
        // none on the link path) — payload equality is the contract
        .filterNot(_.getFileName.toString.endsWith(".crc"))
        .map(p => root.relativize(p).toString ->
          new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
        .toMap
      finally walk.close()
    }
    for (allowLink <- Seq(true, false)) {
      val src = java.nio.file.Files.createTempDirectory(s"ct-src-$allowLink")
      val dst = java.nio.file.Files.createTempDirectory(s"ct-dst-$allowLink")
        .resolve("fork")
      writeTree(src)
      val before = treeOf(src)
      val fs = new org.apache.hadoop.fs.Path(src.toString)
        .getFileSystem(conf)
      Layouts.copyTree(fs,
        new org.apache.hadoop.fs.Path(src.toString),
        new org.apache.hadoop.fs.Path(dst.toString), conf,
        allowLink = allowLink)
      // the fork is byte-identical to the source
      treeOf(dst) shouldBe before
      // on the link path the copy really is a hardlink (same inode) —
      // the fast path must be exercised, not silently falling back
      if (allowLink) {
        val a = java.nio.file.Files.readAttributes(
          src.resolve("part-0.parquet"),
          classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()
        val b = java.nio.file.Files.readAttributes(
          dst.resolve("part-0.parquet"),
          classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()
        b shouldBe a
      }
      // deleting the fork (a lifecycle mutating its copy) leaves the
      // template intact — the write-once sharing contract
      scala.reflect.io.Directory(dst.toFile).deleteRecursively()
      treeOf(src) shouldBe before
    }
  }
}
