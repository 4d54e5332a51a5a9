package graft.sources

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SnapshotLog

/** Manual sf1-scale A/B for the SPJ/fanout pair (not part of the
  * regression sweep — run explicitly; results recorded in
  * BENCH_NOTES.md). Orders at sf0.1 replicated 10x = 1.5M rows per
  * side, bucket(32), fanout layout.
  */
class SpjScaleProbe extends SparkSpec {

  private lazy val cat: String = {
    spark.conf.set("spark.sql.catalog.snprobe",
      classOf[SnapshotCatalog].getName)
    "snprobe"
  }

  test("sf1 SPJ A/B") {
    assume(sys.env.contains("GRAFT_SPJ_PROBE"),
      "manual probe — set GRAFT_SPJ_PROBE=1 to run (results in BENCH_NOTES)")
    val dir = graft.TempDirs.create("spj_sf1")
    val fact = dir.resolve("fact").toString
    val dim = dir.resolve("dim").toString
    val base = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
      .select(col("o_orderkey").cast("long").as("k"),
        col("o_custkey").cast("long").as("c"),
        col("o_orderpriority").as("p"))
    val big = (0L until 10L).map(i =>
      base.select((col("k") + lit(i * 10000000L)).as("k"), col("c"),
        col("p"))).reduce(_ unionByName _)
    val prior = spark.conf.getOption("spark.graft.write.fanout")
    spark.conf.set("spark.graft.write.fanout", "true")
    try {
      SnapshotLog.createTable(spark, fact,
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, c BIGINT"),
        Seq(SnapshotLog.PartField("bucket", "k", 32)))
      SnapshotLog.append(spark, fact, big.select("k", "c"))
      SnapshotLog.createTable(spark, dim,
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, p STRING"),
        Seq(SnapshotLog.PartField("bucket", "k", 32)))
      SnapshotLog.append(spark, dim, big.select("k", "p"))
    } finally prior match {
      case Some(v) => spark.conf.set("spark.graft.write.fanout", v)
      case None => spark.conf.unset("spark.graft.write.fanout")
    }

    @volatile var tasks = 0
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks += 1
    }
    spark.sparkContext.addSparkListener(listener)
    def timed(tag: String)(body: => Long): (Double, Int) = {
      org.apache.spark.graft.BusFlush.flush(spark.sparkContext)
      tasks = 0
      val t0 = System.nanoTime()
      val n = body
      val secs = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.BusFlush.flush(spark.sparkContext)
      assert(n == 1500000L, s"$tag rows $n")
      (secs, tasks)
    }
    def joinCount(): Long = spark.sql(
      s"""SELECT /*+ MERGE(f) */ count(*) AS n
         |FROM $cat.`$fact` f JOIN $cat.`$dim` d ON f.k = d.k""".stripMargin)
      .head().getLong(0)
    def scanAgg(): Long = spark.sql(
      s"SELECT count(*) AS n FROM (SELECT k, c FROM $cat.`$fact` " +
        "WHERE c >= 0)").head().getLong(0)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      // warm both paths once
      joinCount(); scanAgg()
      def sweep(on: Boolean): Unit = {
        if (on) spark.conf.set("spark.graft.catalog.preserveGrouping", "true")
        else spark.conf.unset("spark.graft.catalog.preserveGrouping")
        val j = Seq.fill(2)(timed(s"join spj=$on")(joinCount()))
          .minBy(_._1)
        val s = Seq.fill(2)(timed(s"scan spj=$on") {
          scanAgg(); 1500000L
        }).minBy(_._1)
        println(f"SPJ_AB spj=$on join=${j._1}%.2fs tasks=${j._2} " +
          f"scan=${s._1}%.2fs scanTasks=${s._2}")
      }
      sweep(on = true)
      sweep(on = false)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.graft.catalog.preserveGrouping")
      spark.sparkContext.removeSparkListener(listener)
    }
  }
}
