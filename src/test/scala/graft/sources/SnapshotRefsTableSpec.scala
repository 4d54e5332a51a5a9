package graft.sources

import org.apache.hadoop.fs.Path

import graft.SparkSpec
import graft.operators.SnapshotLog

/** The `snap.t.refs` metadata table: tags and branches with pinned /
  * fork snapshots, staged commit counts, and head commit times — the
  * write-audit-publish audit door (Iceberg's refs table).
  */
class SnapshotRefsTableSpec extends SparkSpec {

  private lazy val cat: String = {
    spark.conf.set("spark.sql.catalog.snrefs",
      classOf[SnapshotCatalog].getName)
    "snrefs"
  }

  private def freshLog(tag: String): String = {
    import spark.implicits._
    val root = graft.TempDirs.create(s"refstbl_$tag").resolve("log").toString
    SnapshotLog.append(spark, root,
      (1L to 10L).map(k => (k, s"v$k")).toDF("k", "v").coalesce(1))
    SnapshotLog.append(spark, root,
      (11L to 20L).map(k => (k, s"v$k")).toDF("k", "v").coalesce(1))
    root
  }

  test("tags and mid-stage branches surface; fast-forward retires the branch") {
    import spark.implicits._
    val root = freshLog("wap")
    SnapshotLog.tag(spark, root, "release-1", 1L)
    SnapshotLog.createBranch(spark, root, "audit")
    SnapshotLog.appendToBranch(spark, root, "audit",
      (21L to 25L).map(k => (k, s"b$k")).toDF("k", "v"))
    val rows = spark.sql(
      s"SELECT * FROM $cat.`$root`.refs ORDER BY name").collect()
    assert(rows.length == 2)
    val branch = rows(0)
    assert(branch.getString(0) == "audit" && branch.getString(1) == "branch")
    assert(branch.getLong(2) == 2L, "branch pins its FORK snapshot")
    assert(branch.getLong(3) == 1L, "one staged commit")
    assert(!branch.isNullAt(4), "head commit time is known")
    val t = rows(1)
    assert(t.getString(0) == "release-1" && t.getString(1) == "tag")
    assert(t.getLong(2) == 1L)
    assert(t.isNullAt(3), "tags stage nothing")
    // publish: the branch ref disappears, the tag stays
    SnapshotLog.fastForward(spark, root, "audit")
    val after = spark.sql(
      s"SELECT name, type FROM $cat.`$root`.refs").collect()
    assert(after.length == 1 && after(0).getString(0) == "release-1")
  }

  test("a fresh (commit-less) branch reports zero staged commits") {
    val root = freshLog("fresh")
    SnapshotLog.createBranch(spark, root, "wip")
    val r = spark.sql(
      s"SELECT snapshot_id, commits FROM $cat.`$root`.refs " +
        "WHERE name = 'wip'").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 0L)
  }

  test("an unparseable foreign file under refs/ is SURFACED with null " +
      "snapshot details, never silently dropped") {
    val root = freshLog("foreign")
    SnapshotLog.tag(spark, root, "good", 2L)
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(s"$root/refs/garbage"), true)
    try out.write("not-a-snapshot-id".getBytes("UTF-8")) finally out.close()
    // this is a WAP AUDIT table: a ref that cannot be resolved still
    // appears (with null snapshot_id), because omitting it would
    // understate risk
    val rows = spark.sql(
      s"SELECT name, snapshot_id FROM $cat.`$root`.refs ORDER BY name")
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("garbage", "good"))
    assert(rows(0).isNullAt(1), "unresolvable ref surfaces as null pin")
    assert(rows(1).getLong(1) == 2L)
  }

  test("committed_at is the STAMPED commit time: it survives a " +
      "copy/restore that rewrites every file mtime") {
    val root = freshLog("drcopy")
    SnapshotLog.tag(spark, root, "pin", 2L)
    val before = spark.sql(
      s"SELECT committed_at FROM $cat.`$root`.refs WHERE name = 'pin'")
      .head().getTimestamp(0)
    // simulate a DR restore / rsync: every manifest gets a NEW mtime
    val dir = java.nio.file.Paths.get(
      new java.net.URI(new Path(s"$root/snap").toUri.toString).getPath)
    java.nio.file.Files.list(dir).forEach { p =>
      java.nio.file.Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() + 86400000L))
    }
    val after = spark.sql(
      s"SELECT committed_at FROM $cat.`$root`.refs WHERE name = 'pin'")
      .head().getTimestamp(0)
    assert(after == before,
      s"commit time must come from the manifest's T line, not mtime " +
        s"($before -> $after)")
  }

  test("a table without refs yields an empty frame") {
    val root = freshLog("none")
    assert(spark.sql(s"SELECT * FROM $cat.`$root`.refs").count() == 0L)
  }
}
