package graft.operators

import graft.SparkSpec
import java.nio.file.Files
import org.apache.hadoop.fs.Path

/** The manifest TREE's scale contract: a commit's metadata write is
  * O(its own files + #commits), never O(#files in the table) — the flat
  * manifest re-serialized the entire inventory per commit. Also pins
  * legacy flat-manifest migration and reference reuse across CoW
  * deletes.
  */
class SnapshotManifestTreeSpec extends SparkSpec {

  import spark.implicits._

  private def newRoot() =
    Files.createTempDirectory("graft_mtree").resolve("log").toString
  private def fs(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def snapFiles(root: String): Map[String, Long] =
    fs(root).listStatus(new Path(s"$root/snap")).map(st =>
      st.getPath.getName -> st.getLen).toMap

  private def textOf(root: String, name: String): String = {
    val in = fs(root).open(new Path(s"$root/snap/$name"))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  test("a small append to a many-file table writes bounded metadata") {
    val root = newRoot()
    // 8 commits x 4 files = a 32-file table
    (1 to 8).foreach { b =>
      SnapshotLog.append(spark, root,
        (1 to 8).map(i => (b * 100 + i, s"v$b-$i")).toDF("k", "v").repartition(4))
    }
    val before = snapFiles(root)
    SnapshotLog.append(spark, root, Seq((9999, "tail")).toDF("k", "v").coalesce(1))
    val added = snapFiles(root).keySet.diff(before.keySet).toSeq.sorted

    // exactly two metadata objects: the snapshot manifest + ONE file
    // list holding only this commit's file
    assert(added.count(_.endsWith(".manifest")) === 1, s"added: $added")
    assert(added.count(_.endsWith(".list")) === 1, s"added: $added")
    assert(added.size === 2, s"added: $added")

    val listLines = textOf(root, added.find(_.endsWith(".list")).get)
      .split('\n').filter(_.nonEmpty)
    assert(listLines.length === 1, "the new list tracks only the appended file")

    // the manifest carries the table by REFERENCE: one header + one M
    // line per commit + the commit-time T line, and not a single
    // inline data path
    val mLines = textOf(root, added.find(_.endsWith(".manifest")).get)
      .split('\n').filter(_.nonEmpty)
    assert(mLines.count(_.startsWith("M\t")) === 9,
      s"manifest lines: ${mLines.mkString("|")}")
    assert(mLines.tail.forall(l =>
      l.startsWith("M\t") || l.startsWith("T\t")),
      "no inline data lines in a tree manifest")

    // content is intact: 64 seeded rows + the tail row
    assert(SnapshotLog.read(spark, root).count() === 65L)
    assert(SnapshotLog.snapshot(spark, root, 9L).rows === 65L)
  }

  test("CoW delete carries untouched file lists by reference") {
    val root = newRoot()
    SnapshotLog.append(spark, root, Seq((1, "a")).toDF("k", "v").coalesce(1))
    SnapshotLog.append(spark, root, Seq((2, "b")).toDF("k", "v").coalesce(1))
    SnapshotLog.append(spark, root, Seq((3, "c")).toDF("k", "v").coalesce(1))
    def refsOf(id: Long): Seq[String] =
      textOf(root, f"v$id%08d.manifest").split('\n')
        .filter(_.startsWith("M\t")).map(_.split('\t')(1)).toSeq
    val refs3 = refsOf(3L)
    assert(refs3.size === 3)
    // delete the row held by commit 2's file: lists 1 and 3 must carry
    // forward under their ORIGINAL names; list 2 must not
    SnapshotLog.deleteWhere(spark, root, org.apache.spark.sql.functions.col("k") === 2)
    val refs4 = refsOf(4L)
    assert(refs4.contains(refs3(0)) && refs4.contains(refs3(2)),
      s"untouched lists rewritten: $refs3 -> $refs4")
    assert(!refs4.contains(refs3(1)), "the touched list must dissolve")
    assert(rowSet(SnapshotLog.read(spark, root)) ===
      rowSet(Seq((1, "a"), (3, "c")).toDF("k", "v")))
  }

  test("legacy flat manifests read and migrate into the tree on the next commit") {
    val root = newRoot()
    // build real data files via the API, then rewrite snapshot 1's
    // manifest into the pre-tree flat form (inline file lines)
    SnapshotLog.append(spark, root, Seq((1, "a"), (2, "b")).toDF("k", "v").coalesce(1))
    val f = fs(root)
    val snap1 = snapFiles(root)
    val mName = snap1.keySet.find(_.endsWith(".manifest")).get
    val lName = snap1.keySet.find(_.endsWith(".list")).get
    val header = textOf(root, mName).split('\n').head
    val fileLines = textOf(root, lName).split('\n').filter(_.nonEmpty)
    require(f.delete(new Path(s"$root/snap/$mName"), false))
    require(f.delete(new Path(s"$root/snap/$lName"), false))
    val out = f.create(new Path(s"$root/snap/$mName"), true)
    try out.write((header +: fileLines).mkString("\n").getBytes("UTF-8"))
    finally out.close()

    // the flat manifest still reads
    assert(rowSet(SnapshotLog.read(spark, root)) ===
      rowSet(Seq((1, "a"), (2, "b")).toDF("k", "v")))
    // an append on top migrates the inline inventory into a file list:
    // the new manifest is pure-tree (one M line, no inline paths)
    SnapshotLog.append(spark, root, Seq((3, "c")).toDF("k", "v").coalesce(1))
    val m2 = textOf(root, "v00000002.manifest").split('\n').filter(_.nonEmpty)
    assert(m2.tail.forall(l => l.startsWith("M\t") || l.startsWith("T\t")))
    assert(rowSet(SnapshotLog.read(spark, root)) ===
      rowSet(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")))
  }
}
