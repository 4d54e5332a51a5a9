package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SnapshotLog

/** Stats and aggregate pushdown UNDER OUTSTANDING DELETE VECTORS: the
  * manifest records each target file's kill count, so a MoR-heavy
  * table (streaming upserts between compactions) keeps exact COUNTs
  * from metadata and keeps feeding CBO — instead of silently losing
  * every statistic until compaction.
  */
class SnapshotDvStatsSpec extends SparkSpec {

  private lazy val cat: String = {
    spark.conf.set("spark.sql.catalog.sndv",
      classOf[SnapshotCatalog].getName)
    "sndv"
  }

  private def isLocal(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    plan.contains("LocalTableScan") && !plan.contains("SnapshotBatchScan") &&
      !plan.contains("SnapshotScan ")
  }

  /** (k, c never-null, v null on every 5th k), 100 rows; then a MoR
    * delete kills every 10th k (all of which also have v NULL).
    */
  private def dvLog(tag: String): String = {
    import spark.implicits._
    val root = graft.TempDirs.create(s"dvstats_$tag").resolve("log").toString
    SnapshotLog.append(spark, root,
      (1L to 100L).map(k => (k, s"c$k",
        if (k % 5 == 0) null else s"v${k % 3}")).toDF("k", "c", "v")
        .coalesce(2))
    SnapshotLog.deleteWhereMoR(spark, root, pmod(col("k"), lit(10)) === 0)
    root
  }

  test("COUNT(*) and COUNT(null-free col) answer from the manifest " +
      "while DVs are outstanding") {
    val root = dvLog("cnt")
    val q = s"SELECT count(*) AS n, count(c) AS nc FROM $cat.`$root`"
    val df = spark.sql(q)
    assert(isLocal(df),
      "DV kill counts must keep the COUNT pushdown alive:\n" +
        df.queryExecution.executedPlan.toString)
    val r = df.head()
    assert(r.getLong(0) == 90L, "count(*) must subtract the kills")
    assert(r.getLong(1) == 90L, "count(c): c is null-free, live = rows - kills")
    // the strong form: the answer never opens a data file
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    SnapshotLog.snapshot(spark, root, SnapshotLog.currentId(spark, root))
      .files.foreach(e =>
        require(fs.delete(new Path(s"$root/${e.path}"), false)))
    assert(spark.sql(q).head().getLong(0) == 90L)
  }

  test("COUNT(mixed-null col) and MIN/MAX refuse pushdown under kills " +
      "— and still answer correctly through the MoR scan") {
    val root = dvLog("refuse")
    // v: NULL on k%5==0; killed rows (k%10==0) are a subset of those —
    // live non-null v = 100 - 20 nulls = 80, but the PUSHDOWN cannot
    // prove it (killed rows' null status is unrecorded) → real scan
    val dfv = spark.sql(s"SELECT count(v) AS nv FROM $cat.`$root`")
    assert(!isLocal(dfv),
      "mixed-null COUNT under kills must refuse the manifest answer")
    assert(dfv.head().getLong(0) == 80L)
    // min/max: the extremum could be a dead row — must scan
    val mm = spark.sql(s"SELECT min(k) AS mn, max(k) AS mx FROM $cat.`$root`")
    assert(!isLocal(mm), "MIN/MAX under kills must refuse")
    val r = mm.head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 99L)
  }

  test("numRows and column stats stay live (estimate-grade) under DVs") {
    val root = dvLog("rows")
    val df = spark.sql(s"SELECT k, v FROM $cat.`$root`")
    val scan = SnapshotCatalog.scanOf(df).asInstanceOf[SnapshotBatchScan]
    val stats = scan.estimateStatistics()
    assert(stats.numRows().getAsLong == 90L,
      "numRows must subtract per-file kill counts")
    import scala.jdk.CollectionConverters._
    val byName = stats.columnStats().asScala
      .map { case (k2, v2) => k2.describe() -> v2 }.toMap
    // k is null-free: live nulls exactly 0; ndv estimate still serves
    assert(byName("k").nullCount().getAsLong == 0L)
    assert(byName("k").distinctCount().getAsLong > 0L)
    // v mixed-null: proportional estimate — present, in [10, 20]
    val vn = byName("v").nullCount().getAsLong
    assert(vn >= 10L && vn <= 20L, s"estimate-grade live nulls, got $vn")
  }

  test("CBO still flips the build side from a DV-dirty pruned dim") {
    import spark.implicits._
    val fact = graft.TempDirs.create("dvstats_fact").resolve("log").toString
    SnapshotLog.append(spark, fact,
      (1 to 20000).map(i => (i.toLong % 2000L, i.toLong)).toDF("k", "m")
        .repartition(4))
    val dim = graft.TempDirs.create("dvstats_dim").resolve("log").toString
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
    // dirty the dim: an outstanding DV on the kept band's file — the
    // round-15 engine dropped ALL column stats here and lost the
    // broadcast; kill-adjusted stats must keep it
    SnapshotLog.deleteWhereMoR(spark, dim,
      col("band") === 0L && pmod(col("k"), lit(7)) === 0L)
    val restore = Seq("spark.sql.cbo.enabled", "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k2 => k2 -> spark.conf.getOption(k2)).toMap
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "4096")
      val plan = spark.sql(
        s"""SELECT count(*) FROM $cat.`$fact` f
           |JOIN $cat.`$dim` d ON f.k = d.k
           |WHERE d.band = 0 AND d.label = 'L5'""".stripMargin)
        .queryExecution.sparkPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"DV-dirty pruned dim with live column stats must broadcast:\n$plan")
    } finally restore.foreach {
      case (k2, Some(v2)) => spark.conf.set(k2, v2)
      case (k2, None) => spark.conf.unset(k2)
    }
  }
}
