package graft.plans

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.operators.SnapshotLog

/** Row-level DML under write-audit-publish: with
  * `spark.graft.wap.branch` set, MERGE/UPDATE/DELETE stage on the
  * session's branch as MoR commits (auto-forked on first use), the
  * session audits its own staged state, main stays untouched until
  * fast_forward publishes — the full WAP loop, not just INSERT.
  */
class WapDmlSpec extends SparkSpec {

  private lazy val cat: String = {
    spark.conf.set("spark.sql.catalog.wapdml",
      classOf[graft.sources.SnapshotCatalog].getName)
    "wapdml"
  }

  private def newLog(tag: String): String = {
    import spark.implicits._
    val root = graft.TempDirs.create(s"wapdml_$tag").resolve("log").toString
    SnapshotLog.append(spark, root,
      (1 to 100).map(k => (k.toLong, s"v$k")).toDF("k", "v").repartition(4))
    root
  }

  private def withWap[A](name: String)(body: => A): A = {
    spark.conf.set("spark.graft.wap.branch", name)
    try body finally spark.conf.unset("spark.graft.wap.branch")
  }

  test("MERGE under WAP stages on the branch; publish lands it") {
    import spark.implicits._
    val root = newLog("merge")
    Seq((10L, "W"), (500L, "new")).toDF("k", "v")
      .createOrReplaceTempView("wap_merge_src")
    withWap("audit") {
      spark.sql(s"MERGE INTO $cat.`$root` t USING wap_merge_src s " +
        "ON t.k = s.k WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *")
      // the session audits its own staged merge
      assert(spark.sql(s"SELECT v FROM $cat.`$root` WHERE k = 10")
        .head().getString(0) == "W")
      assert(spark.sql(s"SELECT count(*) AS n FROM $cat.`$root`")
        .head().getLong(0) == 101L)
    }
    // main untouched: one snapshot, original values
    assert(SnapshotLog.currentId(spark, root) == 1L)
    assert(SnapshotLog.read(spark, root).count() == 100L)
    SnapshotLog.fastForward(spark, root, "audit")
    val out = SnapshotLog.read(spark, root)
    assert(out.count() == 101L)
    assert(out.filter(col("k") === 10L).select("v").head().getString(0) == "W")
    assert(out.filter(col("k") === 500L).count() == 1L)
  }

  test("UPDATE then DELETE under WAP stack vectors on the branch") {
    val root = newLog("stack")
    withWap("fix") {
      spark.sql(s"UPDATE $cat.`$root` SET v = 'U' WHERE k <= 10")
      spark.sql(s"DELETE FROM $cat.`$root` WHERE k % 2 = 1")
      val staged = spark.sql(s"SELECT * FROM $cat.`$root`")
      assert(staged.count() == 50L)
      assert(staged.filter(col("v") === "U").count() == 5L)
    }
    assert(SnapshotLog.read(spark, root).count() == 100L, "main untouched")
    SnapshotLog.fastForward(spark, root, "fix")
    val out = SnapshotLog.read(spark, root)
    assert(out.count() == 50L)
    assert(out.filter(col("k") % 2 === 1).count() == 0L)
    assert(out.filter(col("v") === "U").count() == 5L)
  }

  test("WAP DML matches the same DML on main, row for row") {
    import spark.implicits._
    val wapRoot = newLog("eq_wap")
    val mainRoot = newLog("eq_main")
    Seq((3L, "X"), (7L, "X"), (300L, "ins")).toDF("k", "v")
      .createOrReplaceTempView("wap_eq_src")
    withWap("w") {
      spark.sql(s"MERGE INTO $cat.`$wapRoot` t USING wap_eq_src s " +
        "ON t.k = s.k WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *")
      spark.sql(s"UPDATE $cat.`$wapRoot` SET v = upper(v) WHERE k <= 2")
    }
    SnapshotLog.fastForward(spark, wapRoot, "w")
    spark.sql(s"MERGE INTO $cat.`$mainRoot` t USING wap_eq_src s " +
      "ON t.k = s.k WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *")
    spark.sql(s"UPDATE $cat.`$mainRoot` SET v = upper(v) WHERE k <= 2")
    assert(rowSet(SnapshotLog.read(spark, wapRoot)) ==
      rowSet(SnapshotLog.read(spark, mainRoot)))
  }

  test("an explicit OTHER-branch pin still refuses DML under WAP") {
    import spark.implicits._
    val root = newLog("other")
    SnapshotLog.createBranch(spark, root, "elsewhere")
    Seq((1L, "x")).toDF("k", "v").createOrReplaceTempView("wap_other_src")
    withWap("mine") {
      intercept[Exception] {
        spark.sql(s"MERGE INTO $cat.`$root` VERSION AS OF 'elsewhere' t " +
          "USING wap_other_src s ON t.k = s.k " +
          "WHEN MATCHED THEN UPDATE SET *")
      }
    }
    assert(SnapshotLog.currentId(spark, root) == 1L)
  }
}
