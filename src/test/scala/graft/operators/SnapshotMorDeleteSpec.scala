package graft.operators

import graft.SparkSpec
import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Merge-on-read positional deletes: a `deleteWhereMoR` must move ZERO
  * data bytes (same files, same mtimes), every read path must apply
  * the vector, accounting must stay exact under overlapping deletes,
  * the changelog must surface DV deltas as row-level changes, and
  * `rewriteDeletes` must fold vectors away read-invariantly so the
  * partial CoW rewrites (which refuse while vectors are outstanding)
  * work again. Maintenance must treat DV parquet dirs and delete
  * lists as first-class citizens: live ones survive vacuum, expired
  * ones are reclaimed.
  */
class SnapshotMorDeleteSpec extends SparkSpec {

  import spark.implicits._

  private def newRoot(): String =
    Files.createTempDirectory("graft_mor_spec").resolve("log").toString

  private def fs(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dvDirs(root: String): Seq[String] =
    fs(root).listStatus(new Path(s"$root/data")).toSeq
      .map(_.getPath.getName).filter(_.contains("_dv_"))

  private def deleteLists(root: String): Seq[String] =
    fs(root).listStatus(new Path(s"$root/snap")).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith("d_") && n.endsWith(".list"))

  test("MoR delete rewrites no data file and every read applies the vector") {
    val root = newRoot()
    SnapshotLog.append(spark, root,
      (1 to 100).map(k => (k, if (k % 10 == 0) "drop" else "keep"))
        .toDF("k", "tag").repartition(4))
    val before = SnapshotLog.snapshot(spark, root, 1L)
    val stamps = before.files.map { f =>
      f.path -> fs(root).getFileStatus(new Path(s"$root/${f.path}")).getModificationTime
    }.toMap

    val id = SnapshotLog.deleteWhereMoR(spark, root, col("tag") === "drop")
    assert(id === 2L)
    val after = SnapshotLog.snapshot(spark, root, 2L)
    assert(after.operation === "mor-delete")
    assert(after.rows === 90L)
    // IDENTICAL data files, untouched on disk — the entire point of MoR
    assert(after.files.map(_.path).toSet === before.files.map(_.path).toSet)
    after.files.foreach { f =>
      assert(fs(root).getFileStatus(new Path(s"$root/${f.path}"))
        .getModificationTime === stamps(f.path))
    }
    assert(dvDirs(root).size === 1)
    // read applies the vector; time travel to v1 still sees everything
    assert(SnapshotLog.read(spark, root).count() === 90L)
    assert(SnapshotLog.read(spark, root)
      .filter(col("tag") === "drop").count() === 0L)
    assert(SnapshotLog.read(spark, root, asOf = 1L).count() === 100L)
    // pruned read paths apply it too
    assert(SnapshotLog.readRange(spark, root, "k", Some("1"), Some("100"))
      .count() === 90L)
  }

  test("overlapping second MoR delete never double-counts a coordinate") {
    val root = newRoot()
    SnapshotLog.append(spark, root,
      (1 to 60).map(k => (k, k % 3)).toDF("k", "m").repartition(3))
    SnapshotLog.deleteWhereMoR(spark, root, col("m") === 0) // 20 rows
    // overlaps: every m==0 k divisible by 6 is ALREADY dead
    SnapshotLog.deleteWhereMoR(spark, root, col("k") % 2 === 0) // 20 more (evens not m==0)
    val expected = (1 to 60).filterNot(k => k % 3 == 0 || k % 2 == 0)
    assert(SnapshotLog.snapshot(spark, root, 3L).rows === expected.size.toLong)
    assert(rowSet(SnapshotLog.read(spark, root).select("k")) ===
      rowSet(expected.toDF("k")))
    // statsSummary: exact live count, null bounds (a dead row may carry
    // the recorded extremum — metadata cannot answer, caller scans)
    val st = SnapshotLog.statsSummary(spark, root, Seq("k")).collect().head
    assert(st.getLong(1) === expected.size.toLong)
    assert(st.isNullAt(2) && st.isNullAt(3))
  }

  test("NULL-predicate rows are not matches") {
    val root = newRoot()
    SnapshotLog.append(spark, root,
      Seq((1, Some("a")), (2, None), (3, Some("b"))).toDF("k", "v"))
    SnapshotLog.deleteWhereMoR(spark, root, col("v") === "a")
    assert(rowSet(SnapshotLog.read(spark, root).select("k")) ===
      rowSet(Seq(2, 3).toDF("k")))
  }

  test("no-match MoR delete commits nothing and leaves no debris") {
    val root = newRoot()
    SnapshotLog.append(spark, root, Seq((1, "a")).toDF("k", "v"))
    assert(SnapshotLog.deleteWhereMoR(spark, root, col("k") === 99) === 1L)
    assert(SnapshotLog.history(spark, root).size === 1)
    assert(dvDirs(root).isEmpty && deleteLists(root).isEmpty)
  }

  test("changes() surfaces a DV delta as row-level deletes; appends after MoR carry the vector") {
    val root = newRoot()
    SnapshotLog.append(spark, root,
      (1 to 20).map(k => (k, if (k <= 5) "x" else "y")).toDF("k", "tag")
        .repartition(2))
    SnapshotLog.deleteWhereMoR(spark, root, col("tag") === "x")
    // v1→v2: exactly the five dead rows, as deletes, no inserts
    val d = SnapshotLog.changes(spark, root, 1L, 2L)
    assert(d.filter(col("change") === "insert").count() === 0L)
    assert(rowSet(d.filter(col("change") === "delete").select("k")) ===
      rowSet((1 to 5).toDF("k")))
    // an append on the dirty table carries the vector forward
    SnapshotLog.append(spark, root, Seq((100, "z")).toDF("k", "tag"))
    assert(SnapshotLog.read(spark, root).count() === 16L)
    assert(SnapshotLog.snapshot(spark, root, 3L).rows === 16L)
    // changes from empty reproduces the LIVE content
    assert(SnapshotLog.changes(spark, root, 0L, 3L)
      .filter(col("change") === "insert").count() === 16L)
  }

  test("rewriteDeletes folds vectors away read-invariantly and unlocks CoW") {
    val root = newRoot()
    SnapshotLog.append(spark, root,
      (1 to 40).map(k => (k, k % 4)).toDF("k", "m").repartition(2))
    // second list stays clean — it must carry BY REFERENCE through the fold
    SnapshotLog.append(spark, root,
      (41 to 60).map(k => (k, 9)).toDF("k", "m").repartition(1))
    SnapshotLog.deleteWhereMoR(spark, root, col("m") === 0)
    val live = rowSet(SnapshotLog.read(spark, root))
    // partial CoW rewrites refuse while vectors are outstanding
    intercept[IllegalArgumentException] {
      SnapshotLog.deleteWhere(spark, root, col("m") === 1) }
    intercept[IllegalArgumentException] {
      SnapshotLog.mergeInto(spark, root, Seq((1, 7)).toDF("k", "m"), Seq("k")) }
    intercept[IllegalArgumentException] {
      SnapshotLog.optimizeBinPack(spark, root, smallBytes = 1L << 30) }

    val cleanBefore = SnapshotLog.snapshot(spark, root, 3L).files
      .filter(_.path.contains("c2_")).map(_.path).toSet
    val id = SnapshotLog.rewriteDeletes(spark, root)
    assert(id === 4L)
    assert(SnapshotLog.snapshot(spark, root, 4L).operation === "rewrite-deletes")
    assert(rowSet(SnapshotLog.read(spark, root)) === live)
    // the clean append's files rode untouched
    assert(cleanBefore.subsetOf(
      SnapshotLog.snapshot(spark, root, 4L).files.map(_.path).toSet))
    // the fold is content-invariant: the changelog across it is empty
    assert(SnapshotLog.changes(spark, root, 3L, 4L).count() === 0L)
    // idempotent; and CoW works again
    assert(SnapshotLog.rewriteDeletes(spark, root) === 4L)
    SnapshotLog.deleteWhere(spark, root, col("m") === 1)
    assert(SnapshotLog.read(spark, root)
      .filter(col("m") === 1).count() === 0L)
  }

  test("optimize applies and drops outstanding vectors") {
    val root = newRoot()
    SnapshotLog.append(spark, root,
      (1 to 30).map(k => (k, k % 3)).toDF("k", "m").repartition(3))
    SnapshotLog.deleteWhereMoR(spark, root, col("m") === 2)
    SnapshotLog.optimize(spark, root, clusterBy = "k", numFiles = 2)
    assert(SnapshotLog.read(spark, root).count() === 20L)
    // vectors are gone: a partial CoW rewrite is legal again
    SnapshotLog.deleteWhere(spark, root, col("m") === 0)
    assert(SnapshotLog.read(spark, root).count() === 10L)
  }

  test("rollback across an MoR delete restores the rows") {
    val root = newRoot()
    SnapshotLog.append(spark, root, (1 to 10).toDF("k"))
    SnapshotLog.deleteWhereMoR(spark, root, col("k") > 5)
    assert(SnapshotLog.read(spark, root).count() === 5L)
    SnapshotLog.rollback(spark, root, toId = 1L)
    assert(SnapshotLog.read(spark, root).count() === 10L)
    // and rolling FORWARD to the MoR state restores the vector with it
    SnapshotLog.rollback(spark, root, toId = 2L)
    assert(SnapshotLog.read(spark, root).count() === 5L)
  }

  test("MoR merge discovery prunes target files from the key range") {
    val root = newRoot()
    SnapshotLog.append(spark, root,
      (1 to 800).map(k => (k.toLong, s"v$k")).toDF("k", "v")
        .repartitionByRange(8, col("k")))
    val files = SnapshotLog.snapshot(spark, root, 1L).files
    assert(files.size == 8)
    // the strong form: delete every out-of-band file — a discovery
    // scan that opened them would crash the merge
    val out = files.filter { f =>
      val (lo, hi) = f.stats("k")
      hi.toLong < 301L || lo.toLong > 320L
    }
    assert(out.size >= 6)
    out.foreach(f => fs(root).delete(
      new Path(s"$root/${f.path}"), false))
    SnapshotLog.mergeIntoMoR(spark, root,
      (301L to 320L).map(k => (k, "X")).toDF("k", "v"), Seq("k"))
    val band = SnapshotLog.readRange(spark, root, "k",
      Some("301"), Some("320"))
    assert(band.count() == 20L)
    assert(band.select("v").distinct().head().getString(0) == "X")
  }

  test("MoR merge replaces matched rows via a vector and appends the source") {
    val root = newRoot()
    SnapshotLog.append(spark, root,
      (1 to 20).map(k => (k, "old")).toDF("k", "v").repartition(2))
    val before = SnapshotLog.snapshot(spark, root, 1L).files.map(_.path).toSet
    SnapshotLog.mergeIntoMoR(spark, root,
      Seq((5, "new"), (15, "new"), (99, "ins")).toDF("k", "v"), Seq("k"))
    val after = SnapshotLog.snapshot(spark, root, 2L)
    assert(after.operation === "mor-merge")
    assert(after.rows === 21L)
    // every pre-existing file carried untouched; the source's files added
    assert(before.subsetOf(after.files.map(_.path).toSet))
    val expect = (1 to 20).map(k =>
      (k, if (k == 5 || k == 15) "new" else "old")) :+ ((99, "ins"))
    assert(rowSet(SnapshotLog.read(spark, root)) ===
      rowSet(expect.toDF("k", "v")))
    // changes(): the source as inserts, the matched pre-rows as deletes
    val d = SnapshotLog.changes(spark, root, 1L, 2L)
    assert(rowSet(d.filter(col("change") === "delete").select("k")) ===
      rowSet(Seq(5, 15).toDF("k")))
    assert(rowSet(d.filter(col("change") === "insert").select("k")) ===
      rowSet(Seq(5, 15, 99).toDF("k")))
  }

  test("MoR merge works while earlier vectors are outstanding") {
    val root = newRoot()
    SnapshotLog.append(spark, root,
      (1 to 30).map(k => (k, k % 3)).toDF("k", "m").repartition(3))
    SnapshotLog.deleteWhereMoR(spark, root, col("m") === 0)
    // upsert over the DIRTY table: a key killed by the first vector is
    // NOT matched (it's dead) — its source row takes the insert arm
    SnapshotLog.mergeIntoMoR(spark, root,
      Seq((3, 7), (4, 7)).toDF("k", "m"), Seq("k"))
    val expect = (1 to 30).filter(_ % 3 != 0).map(k => (k, if (k == 4) 7 else k % 3)) :+
      ((3, 7))
    assert(rowSet(SnapshotLog.read(spark, root)) ===
      rowSet(expect.toDF("k", "m")))
    assert(SnapshotLog.snapshot(spark, root, 3L).rows === expect.size.toLong)
    // the fold then clears BOTH commits' vectors
    SnapshotLog.rewriteDeletes(spark, root)
    assert(rowSet(SnapshotLog.read(spark, root)) === rowSet(expect.toDF("k", "m")))
    assert(deleteLists(root).nonEmpty) // history still references them
    SnapshotLog.expire(spark, root, keepLast = 1)
    assert(dvDirs(root).isEmpty && deleteLists(root).isEmpty)
  }

  test("reserved coordinate names fail fast with the real constraint") {
    val root = newRoot()
    SnapshotLog.append(spark, root, Seq((1, "a")).toDF("k", "__path"))
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.deleteWhereMoR(spark, root, col("k") === 1) }
    assert(e.getMessage.contains("reserved by merge-on-read"))
    // CoW operations on such a table stay fully available
    SnapshotLog.deleteWhere(spark, root, col("k") === 1)
    assert(SnapshotLog.read(spark, root).count() === 0L)
  }

  test("replayed MoR merge is value-idempotent (the streaming redelivery case)") {
    val root = newRoot()
    SnapshotLog.append(spark, root,
      (1 to 10).map(k => (k, "old")).toDF("k", "v").repartition(2))
    val src = Seq((3, "new"), (42, "ins")).toDF("k", "v")
    SnapshotLog.mergeIntoMoR(spark, root, src, Seq("k"))
    val once = rowSet(SnapshotLog.read(spark, root))
    // a redelivered batch (crash between commit and checkpoint) kills
    // its own prior append by key and re-appends identical rows
    SnapshotLog.mergeIntoMoR(spark, root, src, Seq("k"))
    assert(rowSet(SnapshotLog.read(spark, root)) === once)
    assert(SnapshotLog.snapshot(spark, root, 3L).rows === 11L)
  }

  test("vacuum spares live DV dirs; expire reclaims dead vectors and lists") {
    val root = newRoot()
    SnapshotLog.append(spark, root,
      (1 to 20).map(k => (k, k % 2)).toDF("k", "m").repartition(2))
    SnapshotLog.deleteWhereMoR(spark, root, col("m") === 0)
    assert(dvDirs(root).size === 1 && deleteLists(root).size === 1)
    // the vector is LIVE — an aggressive vacuum must not touch it
    SnapshotLog.vacuumOrphans(spark, root, graceMs = 0L)
    assert(dvDirs(root).size === 1)
    assert(SnapshotLog.read(spark, root).count() === 10L)
    // fold + expire history: the vector and its list are now dead debris
    SnapshotLog.rewriteDeletes(spark, root)
    SnapshotLog.expire(spark, root, keepLast = 1)
    assert(dvDirs(root).isEmpty && deleteLists(root).isEmpty)
    assert(SnapshotLog.read(spark, root).count() === 10L)
  }
}
