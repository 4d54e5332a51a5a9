package graft.operators

import graft.{SparkSpec, TestSpark}
import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Compaction must (1) hit the file-count arithmetic exactly —
  * ceil(bytes / target) files per partition directory, (2) actually
  * shrink a fragmented lake, and (3) preserve content bit-for-bit.
  */
class LakeMaintenanceSpec extends SparkSpec {

  private def parquetFiles(dir: String): Seq[Path] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq.filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)
  }

  test("compaction meets the per-partition file-count arithmetic and keeps content") {
    val root = Files.createTempDirectory("graft_lk_spec")
    val frag = root.resolve("frag").toString
    val compacted = root.resolve("out").toString
    val docs = graft.Tables(spark, TestSpark.Sf0001, "documents")
      .select(col("doc_id"), col("text"), col("source"), col("lang"))
    docs.repartition(24).write.partitionBy("lang").parquet(frag)

    val stats = LakeMaintenance.compact(
      spark, frag, compacted, targetFileSizeBytes = 16 * 1024, Seq("lang"))

    assert(stats.nonEmpty)
    stats.foreach { st =>
      // the claimed arithmetic
      val expected = math.max(1L, (st.inputBytes + 16 * 1024 - 1) / (16 * 1024)).toInt
      assert(st.outputFiles === expected, st)
      // the filesystem agrees with the claim
      assert(parquetFiles(s"$compacted/${st.partition}").size === st.outputFiles, st)
      // a 24-way fragmented partition really did shrink
      assert(st.outputFiles < st.inputFiles, st)
    }

    val before = docs.select("doc_id", "text", "source", "lang")
    val after = spark.read.parquet(compacted)
      .select(col("doc_id"), col("text"), col("source"), col("lang").cast("string"))
    assert(after.count() === before.count())
    assert(rowSet(after) === rowSet(before))
  }

  test("clusterBy writes files with disjoint sort-key ranges") {
    val out = Files.createTempDirectory("graft_lk_cluster").resolve("clustered").toString
    val ev = graft.Tables(spark, TestSpark.Sf0001, "events")
      .select("event_id", "user_id", "event_type")
    LakeMaintenance.clusterBy(ev, out, numFiles = 6,
      Seq(col("user_id")), Seq(col("event_id")))

    val files = parquetFiles(out)
    assert(files.size === 6)
    // per-file user_id ranges from the data itself (what the footer
    // min/max stats encode) must not overlap: a user_id predicate then
    // touches exactly one file
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.toString)
        .agg(min("user_id"), max("user_id")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hiA), (loB, _)) => assert(hiA < loB, ranges)
      case _ =>
    }
    assert(spark.read.parquet(out).count() === ev.count())
  }

  test("unpartitioned lake compacts to a single directory") {
    val root = Files.createTempDirectory("graft_lk_flat")
    val frag = root.resolve("frag").toString
    val out = root.resolve("out").toString
    val ev = graft.Tables(spark, TestSpark.Sf0001, "events").select("event_id", "event_type")
    ev.repartition(16).write.parquet(frag)
    val stats = LakeMaintenance.compact(spark, frag, out, targetFileSizeBytes = 1L << 30)
    assert(stats.map(_.partition) === Seq("."))
    assert(stats.head.outputFiles === 1)
    assert(parquetFiles(out).size === 1)
    assert(spark.read.parquet(out).count() === ev.count())
  }
}
