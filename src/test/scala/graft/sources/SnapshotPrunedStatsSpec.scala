package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.operators.SnapshotLog

/** Per-FILE column stats and what they unlock: partition-aligned
  * predicates claimed EXACT at file granularity (no residual Filter,
  * all-false files dropped), aggregate pushdown over the PRUNED set
  * (COUNT(col) from per-file null counts), and CBO column statistics
  * that keep reporting — exactly — on pruned scans.
  */
class SnapshotPrunedStatsSpec extends SparkSpec {

  private lazy val cat: String = {
    spark.conf.set("spark.sql.catalog.snprn",
      classOf[SnapshotCatalog].getName)
    "snprn"
  }

  private def fs(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Day-fanout log: days(d) spec, 4 days × 25 rows, v NULL on every
    * 5th key — every file covers one day (d point-banded, null-free),
    * v nullable with a known per-day null count.
    */
  private def dayLog(tag: String): String = {
    import spark.implicits._
    val root = graft.TempDirs.create(s"prstats_$tag").resolve("log").toString
    val prior = spark.conf.getOption("spark.graft.write.fanout")
    spark.conf.set("spark.graft.write.fanout", "true")
    try {
      SnapshotLog.createTable(spark, root,
        org.apache.spark.sql.types.StructType.fromDDL(
          "d TIMESTAMP, k BIGINT, v STRING"),
        Seq(SnapshotLog.PartField("days", "d")))
      SnapshotLog.append(spark, root,
        (1L to 100L).map(k => (
          java.sql.Timestamp.from(
            java.time.Instant.ofEpochSecond((k % 4) * 86400L)),
          k, if (k % 5 == 0) null else s"v${k % 3}"))
          .toDF("d", "k", "v"))
    } finally prior match {
      case Some(x) => spark.conf.set("spark.graft.write.fanout", x)
      case None => spark.conf.unset("spark.graft.write.fanout")
    }
    root
  }

  private def isLocal(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    plan.contains("LocalTableScan") && !plan.contains("SnapshotBatchScan") &&
      !plan.contains("SnapshotScan ")
  }

  private def hasFilter(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Filter])

  test("a day-equality predicate is claimed exact: no Filter, files drop") {
    val root = dayLog("claim")
    val df = spark.sql(s"SELECT k, v FROM $cat.`$root` " +
      "WHERE d = TIMESTAMP '1970-01-02 00:00:00'")
    assert(!hasFilter(df),
      "decidable partition predicate must be claimed exact:\n" +
        df.queryExecution.optimizedPlan.toString)
    val scan = SnapshotCatalog.scanOf(df)
    assert(scan.keptFiles.size < scan.totalFiles,
      s"other days' files must drop (${scan.keptFiles.size}/${scan.totalFiles})")
    // day 1 holds k % 4 == 1: 25 rows, every key ≡ 1 (mod 4)
    val rows = df.collect()
    assert(rows.length == 25)
    assert(rows.forall(_.getLong(0) % 4 == 1))
  }

  test("undecidable predicates stay residual and exact") {
    val root = dayLog("resid")
    // k spans every file: no point band, must NOT be claimed
    val df = spark.sql(s"SELECT k FROM $cat.`$root` WHERE k < 50")
    assert(hasFilter(df), "non-point predicate must keep its Filter")
    assert(df.count() == 49L)
    // mixed: the day half is claimable, the k half is not — the row
    // answer must still be exact either way
    val m = spark.sql(s"SELECT k FROM $cat.`$root` " +
      "WHERE d = TIMESTAMP '1970-01-02 00:00:00' AND k < 50")
    assert(m.collect().map(_.getLong(0)).sorted.toSeq ==
      (1L until 50L).filter(_ % 4 == 1))
  }

  test("NULLs in the predicate column refuse the claim") {
    import spark.implicits._
    val root = graft.TempDirs.create("prstats_null").resolve("log").toString
    // one file, g point-banded ('a' in every NON-NULL row) but with a
    // NULL row the point can't see: claiming `g = 'a'` would return
    // the NULL row too — the per-file null count must block the claim
    SnapshotLog.append(spark, root,
      Seq((1L, Option("a")), (2L, Option("a")), (3L, Option.empty[String]))
        .toDF("k", "g").coalesce(1))
    val df = spark.sql(s"SELECT k FROM $cat.`$root` WHERE g = 'a'")
    assert(hasFilter(df), "nullable point column must not be claimed")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("aggregates over a claimed predicate answer from the manifest") {
    val root = dayLog("agg")
    val q = s"""SELECT count(*) AS n, count(v) AS nv,
               |       min(k) AS mn, max(k) AS mx
               |FROM $cat.`$root`
               |WHERE d = TIMESTAMP '1970-01-02 00:00:00'""".stripMargin
    val df = spark.sql(q)
    assert(isLocal(df),
      "pruned aggregate must fold from the manifest:\n" +
        df.queryExecution.executedPlan.toString)
    val r = df.head()
    // day 1: k ≡ 1 (mod 4) in [1,100] → 25 rows {1,5,…,97}; v is NULL
    // where k % 5 == 0 → {5, 25, 45, 65, 85} = 5 nulls
    assert(r.getLong(0) == 25L && r.getLong(1) == 20L)
    assert(r.getLong(2) == 1L && r.getLong(3) == 97L)
    // the strong form: the answer never touches data files
    val f = fs(root)
    SnapshotLog.snapshot(spark, root, SnapshotLog.currentId(spark, root))
      .files.foreach(e =>
        require(f.delete(new Path(s"$root/${e.path}"), false)))
    val r2 = spark.sql(q).head()
    assert(r2.getLong(0) == 25L && r2.getLong(1) == 20L)
  }

  test("grouped COUNT(col) uses per-file null counts") {
    val root = dayLog("gcnt")
    val df = spark.sql(
      s"""SELECT d, count(*) AS n, count(v) AS nv
         |FROM $cat.`$root` GROUP BY d ORDER BY d""".stripMargin)
    assert(isLocal(df),
      "grouped COUNT(col) must fold from per-file nulls:\n" +
        df.queryExecution.executedPlan.toString)
    val rows = df.collect()
    assert(rows.length == 4)
    assert(rows.map(_.getLong(1)).sum == 100L)
    // day 0 holds k ≡ 0 (mod 4): nulls where k % 5 == 0 → k ≡ 0 (20):
    // {20, 40, 60, 80, 100} = 5 → 25 rows, 20 non-null
    assert(rows(0).getLong(1) == 25L && rows(0).getLong(2) == 20L)
  }

  test("pruned scans report exact column statistics from per-file meta") {
    val root = dayLog("cbo")
    val df = spark.sql(s"SELECT k, v FROM $cat.`$root` " +
      "WHERE d = TIMESTAMP '1970-01-02 00:00:00'")
    val scan = SnapshotCatalog.scanOf(df).asInstanceOf[SnapshotBatchScan]
    assert(scan.keptFiles.size < scan.totalFiles, "the scan is pruned")
    val stats = scan.estimateStatistics()
    assert(stats.numRows().getAsLong == 25L)
    val cols = stats.columnStats()
    import scala.jdk.CollectionConverters._
    val byName = cols.asScala.map { case (k, v) => k.describe() -> v }.toMap
    // v: 5 NULLs among day-1 rows, 3 distinct values ({v0,v1,v2})
    assert(byName("v").nullCount().getAsLong == 5L)
    assert(byName("v").distinctCount().getAsLong == 3L)
    // k: exact bounds of the PRUNED subset, not the table
    assert(byName("k").nullCount().getAsLong == 0L)
    assert(byName("k").min().get() == java.lang.Long.valueOf(1L))
    assert(byName("k").max().get() == java.lang.Long.valueOf(97L))
  }

  test("CBO broadcasts a PRUNED dim from its subset statistics") {
    import spark.implicits._
    val fact = graft.TempDirs.create("prstats_fact").resolve("log").toString
    SnapshotLog.append(spark, fact,
      (1 to 20000).map(i => (i.toLong % 2000L, i.toLong)).toDF("k", "m")
        .repartition(4))
    // dim fanout on trunc(1000, k): two files, each point-banded on the
    // band column; a `band = 0` predicate prunes to ONE file of 1000
    // rows whose subset stats (not the 2000-row table stats) must feed
    // the broadcast decision
    val dim = graft.TempDirs.create("prstats_dim").resolve("log").toString
    val prior = spark.conf.getOption("spark.graft.write.fanout")
    spark.conf.set("spark.graft.write.fanout", "true")
    try {
      SnapshotLog.createTable(spark, dim,
        org.apache.spark.sql.types.StructType.fromDDL(
          "band BIGINT, k BIGINT, label STRING"),
        Seq(SnapshotLog.PartField("trunc", "band", 1000)))
      SnapshotLog.append(spark, dim,
        (1 to 2000).map(i => ((i % 2) * 1000L, i.toLong, s"L${i % 1000}"))
          .toDF("band", "k", "label"))
    } finally prior match {
      case Some(x) => spark.conf.set("spark.graft.write.fanout", x)
      case None => spark.conf.unset("spark.graft.write.fanout")
    }
    val restore = Seq("spark.sql.cbo.enabled", "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "4096")
      // the label equality (NDV ~1000 within the kept file) shrinks the
      // pruned dim to ~1 estimated row — broadcastable only if column
      // stats SURVIVE the partition pruning
      val plan = spark.sql(
        s"""SELECT count(*) FROM $cat.`$fact` f
           |JOIN $cat.`$dim` d ON f.k = d.k
           |WHERE d.band = 0 AND d.label = 'L5'""".stripMargin)
        .queryExecution.sparkPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"pruned dim with live column stats must broadcast:\n$plan")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("per-file meta survives a WAP publish round-trip") {
    import spark.implicits._
    val root = graft.TempDirs.create("prstats_wap").resolve("log").toString
    SnapshotLog.append(spark, root,
      (1 to 40).map(i => (i.toLong, s"c${i % 4}")).toDF("k", "c"))
    spark.conf.set("spark.graft.wap.branch", "audit")
    try {
      SnapshotLog.createBranch(spark, root, "audit")
      SnapshotLog.appendToBranch(spark, root, "audit",
        (41 to 60).map(i => (i.toLong, s"c${i % 8}")).toDF("k", "c"))
    } finally spark.conf.unset("spark.graft.wap.branch")
    SnapshotLog.fastForward(spark, root, "audit")
    // the published manifest re-rendered the branch's entries; the
    // per-file meta must have ridden along — the fold still answers
    val r = spark.sql(
      s"SELECT ndv, null_count FROM $cat.`$root`.stats WHERE col_name = 'c'")
      .head()
    assert(!r.isNullAt(0), "meta must survive the publish round-trip")
    assert(r.getLong(0) == 8L && r.getLong(1) == 0L)
  }
}
