package graft.sources

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.operators.SnapshotLog

/** Property harness for the grouped/global aggregate pushdown: across
  * seeded random layouts (fanout on/off, null fractions, value
  * cardinalities, MoR deletes), the CATALOG answer — whether the
  * manifest served it or a scan did — must equal the library read's
  * aggregate row-for-row. The pushdown's refusal arms are exactly the
  * cases where metadata could lie; this pins that every arm either
  * refuses or answers right, under layouts no single example test
  * enumerates.
  */
class GroupedPushdownPropertySpec extends SparkSpec {

  private lazy val cat: String = {
    spark.conf.set("spark.sql.catalog.snprop",
      classOf[SnapshotCatalog].getName)
    "snprop"
  }

  test("catalog grouped/global aggregates match the scan across random layouts") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 1 to 12) {
      val root = graft.TempDirs.create(s"gprop_$trial").resolve("t").toString
      val fanout = rnd.nextBoolean()
      val days = 1 + rnd.nextInt(4)
      val nullEvery = rnd.nextInt(4) // 0 = no nulls; else 1-in-(n+3)
      val rows = 40 + rnd.nextInt(200)
      val morDelete = rnd.nextBoolean()
      val data = (1 to rows).map { i =>
        val d =
          if (nullEvery > 0 && i % (nullEvery + 3) == 0) None
          else Some(java.sql.Timestamp.from(
            java.time.Instant.ofEpochSecond((i % days) * 86400L)))
        (d, i.toLong)
      }
      val prior = spark.conf.getOption("spark.graft.write.fanout")
      if (fanout) spark.conf.set("spark.graft.write.fanout", "true")
      try {
        SnapshotLog.createTable(spark, root,
          org.apache.spark.sql.types.StructType.fromDDL(
            "d TIMESTAMP, k BIGINT"),
          if (fanout) Seq(SnapshotLog.PartField("days", "d")) else Seq.empty)
        SnapshotLog.append(spark, root, data.toDF("d", "k")
          .repartition(1 + rnd.nextInt(4)))
      } finally prior match {
        case Some(v) => spark.conf.set("spark.graft.write.fanout", v)
        case None => spark.conf.unset("spark.graft.write.fanout")
      }
      if (morDelete)
        SnapshotLog.deleteWhereMoR(spark, root, col("k") % 7 === 0L)
      val tag = s"trial=$trial fanout=$fanout days=$days " +
        s"nullEvery=$nullEvery rows=$rows mor=$morDelete"
      // grouped
      val got = spark.sql(
        s"""SELECT d, count(*) AS n, count(k) AS nk,
           |       min(k) AS mn, max(k) AS mx
           |FROM $cat.`$root` GROUP BY d""".stripMargin)
      val want = SnapshotLog.read(spark, root).groupBy("d")
        .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.count(col("k")).as("nk"),
          org.apache.spark.sql.functions.min("k").as("mn"),
          org.apache.spark.sql.functions.max("k").as("mx"))
      assert(rowSet(got) == rowSet(want), tag)
      // global
      val gotG = spark.sql(
        s"""SELECT count(*) AS n, count(d) AS nd,
           |       min(k) AS mn, max(d) AS mxd FROM $cat.`$root`""".stripMargin)
      val wantG = SnapshotLog.read(spark, root)
        .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.count(col("d")).as("nd"),
          org.apache.spark.sql.functions.min("k").as("mn"),
          org.apache.spark.sql.functions.max("d").as("mxd"))
      assert(rowSet(gotG) == rowSet(wantG), tag)
    }
  }
}
