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

  test("z-order layout skips files on the NON-leading dimension; 1-D sort cannot") {
    val root = Files.createTempDirectory("graft_lk_z")
    val zDir = root.resolve("zordered").toString
    val sDir = root.resolve("sorted").toString
    val ev = graft.Tables(spark, TestSpark.Sf0001, "events")
      .select(col("event_id"), col("user_id"),
        floor(col("value")).cast("long").as("vbucket"))
    LakeMaintenance.zCluster(ev, zDir, numFiles = 8, x = "user_id", y = "vbucket")
    LakeMaintenance.clusterBy(ev, sDir, numFiles = 8, Seq(col("user_id")))

    // per-file (min,max) of vbucket — what the parquet footer stats
    // encode and what a reader's file-skipping consults
    def vRanges(dir: String): Seq[(Long, Long)] = parquetFiles(dir).map { f =>
      val r = spark.read.parquet(f.toString).agg(min("vbucket"), max("vbucket")).head()
      (r.getLong(0), r.getLong(1))
    }
    val r = ev.agg(min("vbucket"),
      expr("percentile(vbucket, 0.25)").cast("long")).head()
    val (v0, hi) = (r.getLong(0), r.getLong(1))
    // predicate on the non-leading dimension: the lowest-QUANTILE quarter
    // of rows (the value dim is skewed; a range-quarter predicate would
    // match most rows and no layout could skip files on it)
    def touched(ranges: Seq[(Long, Long)]): Int =
      ranges.count { case (lo, hiF) => !(hiF < v0 || lo > hi) }
    val zTouched = touched(vRanges(zDir))
    val sTouched = touched(vRanges(sDir))
    // the user-sorted layout interleaves vbucket everywhere: every file
    // intersects; the z-layout must skip at least a third of the files
    assert(sTouched === 8, s"sorted layout expected to touch all files, got $sTouched")
    assert(zTouched <= 5, s"z-layout touched $zTouched of 8 files")
    // and the rewrite preserves row count
    assert(spark.read.parquet(zDir).count() === ev.count())
  }

  test("in-place compaction: fragmented partitions swap atomically, compact ones untouched") {
    val root = Files.createTempDirectory("graft_lk_inplace")
    val lake = root.resolve("lake").toString
    val docs = graft.Tables(spark, TestSpark.Sf0001, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    docs.repartition(12).write.partitionBy("lang").parquet(lake)
    val before = spark.read.parquet(lake)
      .select(col("doc_id"), md5(col("text")).as("h")).collect().map(_.toString).sorted

    val fs = new Path(lake).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val langs = fs.listStatus(new Path(lake)).filter(_.isDirectory)
      .map(_.getPath.getName).sorted
    // pre-compact ONE partition to a single file so the threshold skips it
    val compactLang = langs.head
    val one = spark.read.parquet(s"$lake/$compactLang")
      .repartition(1).cache()
    one.count()
    fs.delete(new Path(s"$lake/$compactLang"), true)
    one.write.parquet(s"$lake/$compactLang")
    one.unpersist()
    val stampBefore = parquetFiles(s"$lake/$compactLang")
      .map(p => p.getName -> fs.getFileStatus(p).getModificationTime).toMap

    val stats = LakeMaintenance.compactInPlace(
      spark, lake, targetFileSizeBytes = 64L << 20, Seq("lang"))
    // the pre-compacted partition was skipped: flagged AND byte-untouched
    val skipped = stats.filter(!_.rewritten)
    assert(skipped.map(_.partition).contains(s"$compactLang"),
      s"expected $compactLang skipped; got $stats")
    val stampAfter = parquetFiles(s"$lake/$compactLang")
      .map(p => p.getName -> fs.getFileStatus(p).getModificationTime).toMap
    assert(stampAfter === stampBefore, "skipped partition's files must be untouched")
    // every fragmented partition collapsed to its target count (1 file)
    langs.tail.foreach { l =>
      assert(parquetFiles(s"$lake/$l").size === 1, s"lang=$l not compacted")
    }
    // no staging/displaced leftovers, content preserved bit-for-bit
    val leftovers = fs.listStatus(new Path(lake))
      .map(_.getPath.getName).filter(_.startsWith("."))
    assert(leftovers.isEmpty, s"leftovers: ${leftovers.mkString(",")}")
    val after = spark.read.parquet(lake)
      .select(col("doc_id"), md5(col("text")).as("h")).collect().map(_.toString).sorted
    assert(after === before)
  }

  test("in-place compaction recovers a partition displaced by a crashed prior run") {
    val root = Files.createTempDirectory("graft_lk_recover")
    val lake = root.resolve("lake").toString
    graft.Tables(spark, TestSpark.Sf0001, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
      .repartition(6).write.partitionBy("lang").parquet(lake)
    val before = spark.read.parquet(lake)
      .select(col("doc_id"), md5(col("text")).as("h")).collect().map(_.toString).sorted

    // simulate the crash window: live dir renamed aside, commit never ran
    val fs = new Path(lake).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val victim = fs.listStatus(new Path(lake)).filter(_.isDirectory)
      .map(_.getPath).minBy(_.getName)
    require(fs.rename(victim,
      new Path(victim.getParent, s".compact_old_${victim.getName}")))

    LakeMaintenance.compactInPlace(
      spark, lake, targetFileSizeBytes = 64L << 20, Seq("lang"))
    val after = spark.read.parquet(lake)
      .select(col("doc_id"), md5(col("text")).as("h")).collect().map(_.toString).sorted
    assert(after === before, "recovery must restore the displaced partition")
    assert(!fs.listStatus(new Path(lake))
      .exists(_.getPath.getName.startsWith(".")), "no dot leftovers")
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
