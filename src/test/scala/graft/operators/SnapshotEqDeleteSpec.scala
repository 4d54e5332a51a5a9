package graft.operators

import graft.SparkSpec
import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Equality deletes — the scan-free MoR delete form: a
  * `deleteWhereEqual` must write ONLY its key set (zero data files
  * read or moved, zero table scans), apply to exactly the files its
  * sequence postdates (re-inserted keys survive), match null-safely,
  * surface in the changelog as row-level deletes, convert to a
  * positional vector read-invariantly (`rewriteEqualityDeletes`), and
  * ride every maintenance verb: metadata answers degrade honestly
  * while key sets are outstanding, CoW rewrites refuse, schema
  * evolution resolves keys by field id, and expire/vacuum treat key
  * dirs as first-class citizens.
  */
class SnapshotEqDeleteSpec extends SparkSpec {

  import spark.implicits._

  private def newRoot(): String =
    Files.createTempDirectory("graft_eq_spec").resolve("log").toString

  private def fs(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def eqDirs(root: String): Seq[String] =
    fs(root).listStatus(new Path(s"$root/data")).toSeq
      .map(_.getPath.getName).filter(_.contains("_eq_"))

  test("eq delete writes only its key set and applies by sequence era") {
    val root = newRoot()
    SnapshotLog.append(spark, root,
      (1 to 50).map(k => (k, s"v$k")).toDF("k", "v").repartition(3))
    val before = SnapshotLog.snapshot(spark, root, 1L)
    val stamps = before.files.map { f =>
      f.path -> fs(root).getFileStatus(new Path(s"$root/${f.path}")).getModificationTime
    }.toMap

    // delete keys 10..30 — NO scan, NO data file touched
    val id = SnapshotLog.deleteWhereEqual(spark, root,
      (10 to 30).toDF("k"))
    assert(id === 2L)
    val after = SnapshotLog.snapshot(spark, root, 2L)
    assert(after.operation === "eq-delete")
    assert(after.files.map(_.path).toSet === before.files.map(_.path).toSet)
    after.files.foreach { f =>
      assert(fs(root).getFileStatus(new Path(s"$root/${f.path}"))
        .getModificationTime === stamps(f.path))
    }
    assert(eqDirs(root).size === 1)
    assert(SnapshotLog.read(spark, root).count() === 29L)

    // re-insert half the deleted keys AFTER the delete: the sequence
    // rule keeps them alive — the delete never applies to newer files
    SnapshotLog.append(spark, root,
      (10 to 20).map(k => (k, s"new$k")).toDF("k", "v"))
    val cur = SnapshotLog.read(spark, root)
    assert(cur.count() === 40L)
    assert(cur.filter(col("v").startsWith("new")).count() === 11L)
    assert(cur.filter(col("v") === "v15").count() === 0L)
    // time travel: v1 sees everything, v2 the post-delete view
    assert(SnapshotLog.read(spark, root, asOf = 1L).count() === 50L)
    assert(SnapshotLog.read(spark, root, asOf = 2L).count() === 29L)
    // pruned read paths apply it too
    assert(SnapshotLog.readRange(spark, root, "k", Some("1"), Some("50"))
      .count() === 40L)
  }

  test("empty key frame commits nothing and leaves no debris") {
    val root = newRoot()
    SnapshotLog.append(spark, root, Seq((1, "a")).toDF("k", "v"))
    assert(SnapshotLog.deleteWhereEqual(spark, root,
      Seq.empty[Int].toDF("k")) === 1L)
    assert(SnapshotLog.history(spark, root).size === 1)
    assert(eqDirs(root).isEmpty)
  }

  test("null keys match null rows (Iceberg value semantics, not SQL)") {
    val root = newRoot()
    SnapshotLog.append(spark, root,
      Seq((Some(1), "a"), (None, "b"), (Some(3), "c"), (None, "d"))
        .toDF("k", "v"))
    SnapshotLog.deleteWhereEqual(spark, root,
      Seq[Option[Int]](None).toDF("k"))
    assert(rowSet(SnapshotLog.read(spark, root).select("v")) ===
      rowSet(Seq("a", "c").toDF("v")))
  }

  test("multi-column key set matches the whole key tuple") {
    val root = newRoot()
    SnapshotLog.append(spark, root,
      Seq((1, "x", 10), (1, "y", 20), (2, "x", 30)).toDF("a", "b", "c"))
    SnapshotLog.deleteWhereEqual(spark, root, Seq((1, "x")).toDF("a", "b"))
    assert(rowSet(SnapshotLog.read(spark, root).select("c")) ===
      rowSet(Seq(20, 30).toDF("c")))
  }

  test("changes() surfaces an eq delete as row-level deletes of live rows only") {
    val root = newRoot()
    SnapshotLog.append(spark, root,
      (1 to 20).map(k => (k, k % 2)).toDF("k", "m").repartition(2))
    // kill the evens positionally first, then eq-delete 1..6: the eq
    // delta must surface ONLY 1, 3, 5 (2/4/6 were already DV-dead)
    SnapshotLog.deleteWhereMoR(spark, root, col("m") === 0)
    SnapshotLog.deleteWhereEqual(spark, root, (1 to 6).toDF("k"))
    val d = SnapshotLog.changes(spark, root, 2L, 3L)
    assert(d.filter(col("change") =!= "delete").count() === 0L)
    assert(rowSet(d.select("k")) === rowSet(Seq(1, 3, 5).toDF("k")))
    // and the full-window read stays consistent with the changelog fold
    assert(SnapshotLog.read(spark, root).count() === 7L)
  }

  test("a second eq delete never re-kills rows dead under the first") {
    val root = newRoot()
    SnapshotLog.append(spark, root,
      (1 to 12).map(k => (k, k % 3)).toDF("k", "m"))
    SnapshotLog.deleteWhereEqual(spark, root, (1 to 6).toDF("k"))
    // overlapping key set — 4,5,6 already dead; delta is 7,8 only
    SnapshotLog.deleteWhereEqual(spark, root, (4 to 8).toDF("k"))
    val d = SnapshotLog.changes(spark, root, 2L, 3L)
    assert(rowSet(d.select("k")) === rowSet(Seq(7, 8).toDF("k")))
    assert(SnapshotLog.read(spark, root).count() === 4L)
  }

  test("rewriteEqualityDeletes converts read-invariantly and re-exacts the count") {
    val root = newRoot()
    SnapshotLog.append(spark, root,
      (1 to 40).map(k => (k, s"v$k")).toDF("k", "v").repartition(2))
    SnapshotLog.deleteWhereEqual(spark, root, (5 to 14).toDF("k"))
    SnapshotLog.append(spark, root, Seq((7, "back")).toDF("k", "v"))
    // metadata honesty while the key set is outstanding: count unknown
    val dirty = SnapshotLog.statsSummary(spark, root, Seq("k")).collect().head
    assert(dirty.isNullAt(1) && dirty.isNullAt(2) && dirty.isNullAt(3))

    val beforeRows = rowSet(SnapshotLog.read(spark, root))
    val id = SnapshotLog.rewriteEqualityDeletes(spark, root)
    assert(SnapshotLog.snapshot(spark, root, id).operation === "rewrite-eq")
    // read-invariant: the conversion is pure representation change
    assert(rowSet(SnapshotLog.read(spark, root)) === beforeRows)
    assert(SnapshotLog.changes(spark, root, id - 1, id).count() === 0L)
    // the header knows its kill count again (31 = 40 - 10 + 1)
    assert(SnapshotLog.snapshot(spark, root, id).rows === 31L)
    val st = SnapshotLog.statsSummary(spark, root, Seq("k")).collect().head
    assert(st.getLong(1) === 31L)
    // fold the vector; CoW rewrites are unlocked again
    SnapshotLog.rewriteDeletes(spark, root)
    assert(rowSet(SnapshotLog.read(spark, root)) === beforeRows)
    SnapshotLog.deleteWhere(spark, root, col("k") === 40)
    assert(SnapshotLog.read(spark, root).count() === 30L)
  }

  test("partial CoW rewrites and DV folds refuse while key sets are outstanding") {
    val root = newRoot()
    SnapshotLog.append(spark, root, (1 to 10).map(k => (k, "x")).toDF("k", "v"))
    SnapshotLog.deleteWhereEqual(spark, root, Seq(3).toDF("k"))
    intercept[IllegalArgumentException] {
      SnapshotLog.deleteWhere(spark, root, col("k") === 5)
    }
    intercept[IllegalArgumentException] {
      SnapshotLog.mergeInto(spark, root, Seq((5, "y")).toDF("k", "v"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      SnapshotLog.optimizeBinPack(spark, root, smallBytes = 1L << 30)
    }
    intercept[IllegalArgumentException] {
      SnapshotLog.rewriteDeletes(spark, root)
    }
    // full rewrite reads through the live view and so folds everything
    SnapshotLog.optimize(spark, root, "k", 1)
    assert(SnapshotLog.read(spark, root).count() === 9L)
    // ...and drops the key refs: CoW works again
    SnapshotLog.deleteWhere(spark, root, col("k") === 5)
    assert(SnapshotLog.read(spark, root).count() === 8L)
  }

  test("mergeIntoMoR discovery sees the eq-dead rows as gone") {
    val root = newRoot()
    SnapshotLog.append(spark, root,
      (1 to 10).map(k => (k, s"v$k")).toDF("k", "v"))
    SnapshotLog.deleteWhereEqual(spark, root, Seq(2, 4).toDF("k"))
    // upsert key 2 (eq-dead: must insert, not double-kill) and 5 (live)
    SnapshotLog.mergeIntoMoR(spark, root,
      Seq((2, "up2"), (5, "up5")).toDF("k", "v"), Seq("k"))
    val cur = SnapshotLog.read(spark, root)
    assert(cur.count() === 9L)
    assert(rowSet(cur.filter(col("k").isin(2, 4, 5)).select("v")) ===
      rowSet(Seq("up2", "up5").toDF("v")))
  }

  test("rollback across an eq delete revives its rows in the changelog") {
    val root = newRoot()
    SnapshotLog.append(spark, root, (1 to 8).map(k => (k, "a")).toDF("k", "v"))
    SnapshotLog.deleteWhereEqual(spark, root, Seq(1, 2).toDF("k"))
    val id = SnapshotLog.rollback(spark, root, 1L)
    assert(SnapshotLog.read(spark, root).count() === 8L)
    val d = SnapshotLog.changes(spark, root, 2L, id)
    assert(d.filter(col("change") =!= "insert").count() === 0L)
    assert(rowSet(d.select("k")) === rowSet(Seq(1, 2).toDF("k")))
  }

  test("rename re-resolves key columns by field id; keyed drop refuses") {
    val root = newRoot()
    SnapshotLog.append(spark, root,
      (1 to 6).map(k => (k, s"v$k")).toDF("k", "v"))
    SnapshotLog.deleteWhereEqual(spark, root, Seq(2, 3).toDF("k"))
    SnapshotLog.renameColumn(spark, root, "k", "key_id")
    val cur = SnapshotLog.read(spark, root)
    assert(rowSet(cur.select(col("key_id"))) ===
      rowSet(Seq(1, 4, 5, 6).toDF("key_id")))
    intercept[IllegalArgumentException] {
      SnapshotLog.dropColumn(spark, root, "key_id")
    }
    // the other column drops fine, and the delete still applies
    SnapshotLog.dropColumn(spark, root, "v")
    assert(SnapshotLog.read(spark, root).count() === 4L)
  }

  test("expire reclaims dead key dirs, vacuum spares live ones") {
    val root = newRoot()
    SnapshotLog.append(spark, root, (1 to 10).map(k => (k, "x")).toDF("k", "v"))
    SnapshotLog.deleteWhereEqual(spark, root, Seq(1).toDF("k"))
    // vacuum with zero grace: the live key dir must survive
    SnapshotLog.vacuumOrphans(spark, root, graceMs = 0L)
    assert(eqDirs(root).size === 1)
    assert(SnapshotLog.read(spark, root).count() === 9L)
    // optimize folds the delete away; expiring history kills the dir
    SnapshotLog.optimize(spark, root, "k", 1)
    SnapshotLog.expire(spark, root, keepLast = 1)
    assert(eqDirs(root).isEmpty)
    assert(SnapshotLog.read(spark, root).count() === 9L)
  }

  test("a multi-commit window nets DV and eq deletes without double-emitting") {
    val root = newRoot()
    SnapshotLog.append(spark, root,
      (1 to 20).map(k => (k, k % 3)).toDF("k", "m").repartition(2))
    SnapshotLog.deleteWhereMoR(spark, root, col("m") === 0) // kills 3,6,...,18
    SnapshotLog.deleteWhereEqual(spark, root, (1 to 6).toDF("k"))
    // the NET window spans both deletes: each dead row must surface as
    // exactly ONE delete — 3 and 6 are claimed by the DV branch alone
    val d = SnapshotLog.changes(spark, root, 1L, 3L)
    assert(d.filter(col("change") =!= "delete").count() === 0L)
    assert(rowSet(d.select("k")) ===
      rowSet((Seq(1, 2, 4, 5) ++ (3 to 18 by 3)).toDF("k")))
    // and the incremental-fold identity holds: state(1) + window = state(3)
    assert(SnapshotLog.read(spark, root).count() === 20L - d.count())
  }

  test("rollback across BOTH delete forms revives each row exactly once") {
    val root = newRoot()
    SnapshotLog.append(spark, root,
      (1 to 20).map(k => (k, k % 3)).toDF("k", "m").repartition(2))
    SnapshotLog.deleteWhereMoR(spark, root, col("m") === 0) // 3,6,...,18
    SnapshotLog.deleteWhereEqual(spark, root, (1 to 6).toDF("k")) // +1,2,4,5
    val id = SnapshotLog.rollback(spark, root, 1L)
    assert(SnapshotLog.read(spark, root).count() === 20L)
    val d = SnapshotLog.changes(spark, root, 3L, id)
    assert(d.filter(col("change") =!= "insert").count() === 0L)
    // the DV branch revives the positional kills, the eq branch the
    // key-set kills — 3 and 6 (dead by BOTH) must surface once
    assert(rowSet(d.select("k")) ===
      rowSet((Seq(1, 2, 4, 5) ++ (3 to 18 by 3)).toDF("k")))
  }

  test("an append racing an equality delete binds rows by COMMIT order, not dir name") {
    // a lost-race append keeps its first-attempt DIRECTORY id but
    // commits later — the __seq stat must carry the true sequence or
    // a delete sequenced between the two ids would eat the new rows.
    // Outcome-conditional assertions make this deterministic under
    // any interleaving; the lost-race branch is the one under test.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val root = newRoot()
    SnapshotLog.append(spark, root,
      (1 to 10).map(k => (k, "seed")).toDF("k", "v"))
    val fApp = Future(
      SnapshotLog.append(spark, root, Seq((999, "late")).toDF("k", "v")))
    val fDel = Future(
      try Some(SnapshotLog.deleteWhereEqual(spark, root, Seq(999, 5).toDF("k")))
      catch { case _: IllegalStateException => None })
    val appId = Await.result(fApp, 120.seconds)
    val delId = Await.result(fDel, 120.seconds).getOrElse(
      SnapshotLog.deleteWhereEqual(spark, root, Seq(999, 5).toDF("k")))
    val cur = SnapshotLog.read(spark, root)
    // key 5 predates both commits: always dead
    assert(cur.filter(col("k") === 5).count() === 0L)
    // key 999's fate follows the COMMIT order
    val expect999 = if (appId > delId) 1L else 0L
    assert(cur.filter(col("k") === 999).count() === expect999,
      s"append=$appId delete=$delId")
    assert(cur.filter(col("k") =!= 999 && col("k") =!= 5).count() === 9L)
  }

  test("mergeIntoEqual upserts in one commit touching zero existing files") {
    val root = newRoot()
    SnapshotLog.append(spark, root,
      (1 to 30).map(k => (k, s"v$k")).toDF("k", "v").repartition(3))
    val before = SnapshotLog.snapshot(spark, root, 1L)
    val stamps = before.files.map { f =>
      f.path -> fs(root).getFileStatus(new Path(s"$root/${f.path}")).getModificationTime
    }.toMap
    val id = SnapshotLog.mergeIntoEqual(spark, root,
      Seq((5, "up5"), (99, "new99")).toDF("k", "v"), Seq("k"))
    assert(id === 2L)
    assert(SnapshotLog.snapshot(spark, root, 2L).operation === "eq-merge")
    // every pre-existing file carried untouched — the scan-free point
    before.files.foreach { f =>
      assert(fs(root).getFileStatus(new Path(s"$root/${f.path}"))
        .getModificationTime === stamps(f.path))
    }
    val cur = SnapshotLog.read(spark, root)
    assert(cur.count() === 31L)
    assert(rowSet(cur.filter(col("k").isin(5, 99)).select("v")) ===
      rowSet(Seq("up5", "new99").toDF("v")))
    // the changelog decomposes the one commit into retraction + adds
    val d = SnapshotLog.changes(spark, root, 1L, 2L)
    assert(rowSet(d) === rowSet(Seq(
      (5, "v5", "delete"), (5, "up5", "insert"), (99, "new99", "insert"))
      .toDF("k", "v", "change")))
    // a second upsert replaces the first's row too (its key set
    // applies to the earlier merge's files by the sequence rule)
    SnapshotLog.mergeIntoEqual(spark, root,
      Seq((5, "up5b")).toDF("k", "v"), Seq("k"))
    assert(rowSet(SnapshotLog.read(spark, root)
      .filter(col("k") === 5).select("v")) === rowSet(Seq("up5b").toDF("v")))
    // convert + fold compacts everything away, read-invariantly
    val want = rowSet(SnapshotLog.read(spark, root))
    SnapshotLog.rewriteEqualityDeletes(spark, root)
    SnapshotLog.rewriteDeletes(spark, root)
    assert(rowSet(SnapshotLog.read(spark, root)) === want)
    val st = SnapshotLog.statsSummary(spark, root, Seq("k")).collect().head
    assert(st.getLong(1) === 31L)
  }

  test("two concurrent equality merges both survive via identity retry") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val root = newRoot()
    SnapshotLog.append(spark, root,
      (1 to 10).map(k => (k, s"v$k")).toDF("k", "v"))
    // a lost race must re-merge, not kill the caller — the shape of a
    // streaming upsert colliding with concurrent maintenance/writers
    val ids = Await.result(Future.sequence(Seq(
      Future(SnapshotLog.mergeIntoEqual(spark, root,
        Seq((5, "a5")).toDF("k", "v"), Seq("k"))),
      Future(SnapshotLog.mergeIntoEqual(spark, root,
        Seq((6, "b6"), (42, "n42")).toDF("k", "v"), Seq("k"))))), 120.seconds)
    assert(ids.toSet.size === 2)
    val cur = SnapshotLog.read(spark, root)
    assert(cur.count() === 11L)
    assert(rowSet(cur.filter(col("k").isin(5, 6, 42)).select("v")) ===
      rowSet(Seq("a5", "b6", "n42").toDF("v")))
  }

  test("equality merge bootstraps an empty table as its append arm") {
    val root = newRoot()
    val id = SnapshotLog.mergeIntoEqual(spark, root,
      Seq((1, "a"), (2, "b")).toDF("k", "v"), Seq("k"))
    assert(id === 1L)
    assert(SnapshotLog.read(spark, root).count() === 2L)
    // no key set outstanding: nothing existed to retract, so metadata
    // stays exact and no read pays an anti-join
    val st = SnapshotLog.statsSummary(spark, root, Seq("k")).collect().head
    assert(st.getLong(1) === 2L)
    // and the next merge on the non-empty table retracts normally
    SnapshotLog.mergeIntoEqual(spark, root, Seq((2, "b2")).toDF("k", "v"), Seq("k"))
    assert(rowSet(SnapshotLog.read(spark, root).select("v")) ===
      rowSet(Seq("a", "b2").toDF("v")))
  }

  test("conversion on a bucketed table scans only matching-bucket files") {
    val root = newRoot()
    SnapshotLog.append(spark, root,
      (1 to 200).map(k => (k, s"v$k")).toDF("k", "v"))
    SnapshotLog.optimizeBucketed(spark, root, "k", 8)
    val all = SnapshotLog.snapshot(spark, root, 2L).files
    // a one-key retraction: the conversion should plan ~1/8 of the
    // files, from the manifest's bucket bands alone
    SnapshotLog.deleteWhereEqual(spark, root, Seq(42).toDF("k"))
    val scan = SnapshotLog.eqConvertScan(spark, root)
    assert(scan.nonEmpty && scan.size < all.size,
      s"conversion scan not pruned: ${scan.size} of ${all.size}")
    // and the pruned conversion is still exact
    val want = rowSet(SnapshotLog.read(spark, root))
    val id = SnapshotLog.rewriteEqualityDeletes(spark, root)
    assert(rowSet(SnapshotLog.read(spark, root)) === want)
    assert(SnapshotLog.snapshot(spark, root, id).rows === 199L)
    // a MULTI-column key set prunes by its LAYOUTED column's component
    // (each keyed column's bucket membership is a necessary condition)
    SnapshotLog.deleteWhereEqual(spark, root,
      Seq((43, "v43")).toDF("k", "v"))
    val scan2 = SnapshotLog.eqConvertScan(spark, root)
    assert(scan2.nonEmpty && scan2.size < all.size,
      s"multi-column conversion scan not pruned: ${scan2.size} of ${all.size}")
    SnapshotLog.rewriteEqualityDeletes(spark, root)
    assert(SnapshotLog.read(spark, root).count() === 198L)
  }

  test("key frame validation fails fast with the real constraint") {
    val root = newRoot()
    SnapshotLog.append(spark, root, Seq((1, "a")).toDF("k", "v"))
    intercept[IllegalArgumentException] {
      SnapshotLog.deleteWhereEqual(spark, root, Seq(1).toDF("nope"))
    }
    intercept[IllegalArgumentException] {
      SnapshotLog.deleteWhereEqual(spark, root, Seq(1L).toDF("k"))
    }
  }
}
