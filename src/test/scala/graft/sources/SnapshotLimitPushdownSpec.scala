package graft.sources

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.operators.SnapshotLog

/** Limit pushdown into catalog FILE PLANNING: a bare `LIMIT n` plans
  * only the prefix of files whose manifest row counts reach n — and
  * refuses whenever a kept file's contribution could fall short
  * (filters, outstanding deletes), because the truncation must never
  * under-deliver rows to the Limit above.
  */
class SnapshotLimitPushdownSpec extends SparkSpec {

  private lazy val cat: String = {
    spark.conf.set("spark.sql.catalog.snlim",
      classOf[SnapshotCatalog].getName)
    "snlim"
  }

  /** Three 10-row files. */
  private def freshLog(tag: String): String = {
    import spark.implicits._
    val root = graft.TempDirs.create(s"limpush_$tag").resolve("log").toString
    Seq(1L to 10L, 11L to 20L, 21L to 30L).foreach { ks =>
      SnapshotLog.append(spark, root,
        ks.map(k => (k, s"v$k")).toDF("k", "v").coalesce(1))
    }
    root
  }

  test("a bare LIMIT plans only the covering file prefix") {
    val root = freshLog("bare")
    val df = spark.sql(s"SELECT * FROM $cat.`$root` LIMIT 5")
    val scan = SnapshotCatalog.scanOf(df)
    assert(scan.keptFiles.size == 1 && scan.totalFiles == 3,
      s"5 rows fit in the first 10-row file: ${scan.description()}")
    assert(df.count() == 5L)
    // a limit crossing a file boundary keeps exactly the covering prefix
    val df2 = spark.sql(s"SELECT * FROM $cat.`$root` LIMIT 15")
    assert(SnapshotCatalog.scanOf(df2).keptFiles.size == 2)
    assert(df2.count() == 15L)
    // larger than the table: everything, exactly once
    val df3 = spark.sql(s"SELECT * FROM $cat.`$root` LIMIT 1000")
    assert(SnapshotCatalog.scanOf(df3).keptFiles.size == 3)
    assert(df3.count() == 30L)
  }

  test("a WHERE clause refuses truncation: kept files might not match") {
    val root = freshLog("filtered")
    // all matches live in the LAST file — truncating to the first file
    // would return zero rows under the limit
    val df = spark.sql(
      s"SELECT * FROM $cat.`$root` WHERE k > 20 LIMIT 5")
    assert(df.count() == 5L)
    val scan = SnapshotCatalog.scanOf(df)
    assert(scan.keptFiles.size >= 1 &&
      scan.keptFiles.exists(_.stats.exists(_._2._2 == "30")),
      "the match-bearing file must stay planned")
  }

  test("outstanding delete vectors refuse truncation: rows are upper bounds") {
    val root = freshLog("mor")
    // kill 8 of the first file's 10 rows: a LIMIT 5 truncated to that
    // file alone would deliver only 2
    SnapshotLog.deleteWhereMoR(spark, root, col("k") <= 8L)
    val df = spark.sql(s"SELECT * FROM $cat.`$root` LIMIT 5")
    assert(SnapshotCatalog.scanOf(df).keptFiles.size == 3,
      "DV-dirty snapshot must keep the full plan")
    assert(df.count() == 5L)
  }

  test("time travel and the limit compose") {
    val root = freshLog("tt")
    val df = spark.sql(
      s"SELECT * FROM $cat.`$root` VERSION AS OF 1 LIMIT 3")
    assert(SnapshotCatalog.scanOf(df).keptFiles.size == 1)
    assert(df.count() == 3L)
  }
}
