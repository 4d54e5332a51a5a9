package graft.sources

import graft.{SparkSpec, TestSpark}
import graft.recipes.Schemas
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Size-split planning (the 100 TB default) and limit pushdown:
  *
  *   - planning reads ZERO file content — partitions are cut from the
  *     listing's file lengths alone, so a huge collection plans in
  *     listing time (the r6 verdict's scale fix for the driver-side
  *     byte walk);
  *   - the split ownership convention (skip leading partial line, own
  *     lines starting at <= end) loses and duplicates nothing across
  *     arbitrary byte boundaries;
  *   - a pushed limit prunes cursor planning to ceil(limit/pageSize)
  *     pages — the reference's `limit(1)` connectivity probe plans ONE
  *     page — and caps reader output in both modes.
  */
class DocStoreSplitSpec extends SparkSpec {

  private val twoCols = StructType(Seq(
    StructField("user_id", StringType), StructField("username", StringType)))

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))

  /** Bytes read through the local filesystem so far (planning must not
    * move this needle; the listing is metadata, not content).
    */
  private def localFsBytesRead: Long = {
    import scala.jdk.CollectionConverters._
    org.apache.hadoop.fs.FileSystem.getGlobalStorageStatistics.iterator().asScala
      .filter(s => s.getScheme == "file")
      .flatMap(s => Option(s.getLong("bytesRead")).map(_.longValue()))
      .sum
  }

  test("split planning opens no file content, O(#files) partitions from sizes") {
    val dir = java.nio.file.Files.createTempDirectory("docstore_split").toString
    val docs = (0 until 500).map(i => s"""{"user_id": "u$i", "username": "name-$i"}""")
    (0 until 3).foreach { f =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/part-$f.jsonl"),
        (docs.mkString("\n") + "\n").getBytes("UTF-8"))
    }
    val fileLen = java.nio.file.Files.size(
      java.nio.file.Paths.get(s"$dir/part-0.jsonl"))
    val splitSize = 4096L
    val df = spark.read.format("docstore").schema(twoCols)
      .option("splitSize", splitSize).load(dir)

    val before = localFsBytesRead
    val parts = scanOf(df).scan.toBatch.planInputPartitions()
    val after = localFsBytesRead
    assert(after - before === 0L,
      s"split planning read ${after - before} bytes of file content")

    val perFile = (fileLen + splitSize - 1) / splitSize
    assert(parts.length === (3 * perFile).toInt)

    // ...and the unaligned splits still read every document exactly once
    val got = df.collect().map(_.getString(0))
    assert(got.length === 1500)
    assert(got.groupBy(identity).values.forall(_.length === 3)) // one per copy
  }

  test("split ownership survives hostile boundaries: CRLF, blanks, no trailing newline") {
    val dir = java.nio.file.Files.createTempDirectory("docstore_split2").toString
    // blank + whitespace-only lines interleaved, CRLF separators, and no
    // final newline — every boundary case the ownership rules must hold on
    val lines = (0 until 97).flatMap(i =>
      Seq(s"""{"user_id": "u$i", "username": "n$i"}""") ++
        (if (i % 7 == 0) Seq("", "  \t ") else Nil))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/coll.jsonl"),
      lines.mkString("\r\n").getBytes("UTF-8"))
    // sweep every splitSize from pathological (splits inside most lines)
    // to single-split so all boundary phases are exercised
    Seq(16L, 37L, 256L, 1L << 20).foreach { sz =>
      val got = spark.read.format("docstore").schema(twoCols)
        .option("splitSize", sz).load(s"$dir/coll.jsonl")
        .collect().map(_.getString(0)).sorted
      assert(got === (0 until 97).map(i => s"u$i").sorted.toArray,
        s"splitSize=$sz lost or duplicated documents")
    }
  }

  test("limit(1) probe in cursor mode plans exactly one page") {
    val probe = spark.read.format("docstore").schema(Schemas.userDoc)
      .option("planMode", "cursor").option("pageSize", 4)
      .load(s"${TestSpark.FixtureDir}/users.jsonl")
      .limit(1)
    val scan = scanOf(probe)
    assert(scan.scan.description().contains("pushedLimit=1"),
      s"limit not pushed: ${scan.scan.description()}")
    assert(scan.scan.toBatch.planInputPartitions().length === 1,
      "limit-1 probe should plan a single cursor page")
    assert(probe.collect().length === 1)
  }

  test("cursor limit planning counts DOCS, not pages — short trailing pages don't starve it") {
    // two 5-doc files, pageSize 4: each file yields a full page + a
    // 1-doc trailing page. A page-counted stop (ceil(8/4)=2 pages)
    // would plan only file A's 5 docs and return 5 rows for limit(8);
    // doc-counted planning must reach into file B and return 8.
    val dir = java.nio.file.Files.createTempDirectory("docstore_limit").toString
    Seq("a", "b").foreach { f =>
      val docs = (0 until 5).map(i =>
        s"""{"user_id": "$f$i", "username": "n$i"}""")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/$f.jsonl"),
        (docs.mkString("\n") + "\n").getBytes("UTF-8"))
    }
    val df = spark.read.format("docstore").schema(twoCols)
      .option("planMode", "cursor").option("pageSize", 4)
      .load(dir).limit(8)
    assert(scanOf(df).scan.description().contains("pushedLimit=8"))
    assert(df.collect().length === 8,
      "cursor planner stopped on page count and under-produced the limit")
  }

  test("pushed limit caps reader output in split mode too") {
    val df = spark.read.format("docstore").schema(Schemas.userDoc)
      .option("splitSize", 256)
      .load(s"${TestSpark.FixtureDir}/users.jsonl")
      .limit(3)
    val scan = scanOf(df)
    assert(scan.scan.description().contains("pushedLimit=3"))
    // partial push: Spark keeps the global limit, answer stays exact
    assert(df.collect().length === 3)
  }

  test("the scan reports listing-derived statistics: small collections broadcast") {
    import org.apache.spark.sql.functions.col
    val df = spark.read.format("docstore").schema(Schemas.userDoc)
      .load(s"${TestSpark.FixtureDir}/users.jsonl")
    val fixtureBytes = java.nio.file.Files.size(
      java.nio.file.Paths.get(s"${TestSpark.FixtureDir}/users.jsonl"))
    // Catalyst's stats for the V2 relation come from estimateStatistics
    assert(df.queryExecution.optimizedPlan.stats.sizeInBytes === BigInt(fixtureBytes))
    // ...which makes the tiny collection broadcast-eligible in a join
    val joined = spark.read.parquet(s"${TestSpark.Sf0001}/customer.parquet")
      .join(df, col("c_custkey").cast("string") === col("user_id"))
    val bhj = joined.queryExecution.executedPlan.toString
    assert(bhj.contains("BroadcastHashJoin") || bhj.contains("BroadcastExchange"),
      s"small docstore side should broadcast:\n$bhj")
  }

  test("split and cursor modes agree on the fixture collections") {
    def read(opts: Map[String, String]) = {
      val r = spark.read.format("docstore").schema(Schemas.recipeDoc)
      opts.foreach { case (k, v) => r.option(k, v) }
      r.load(s"${TestSpark.FixtureDir}/recipes.jsonl")
        .collect().map(_.toString).sorted
    }
    assert(read(Map("splitSize" -> "512")) ===
      read(Map("planMode" -> "cursor", "pageSize" -> "3")))
  }
}
