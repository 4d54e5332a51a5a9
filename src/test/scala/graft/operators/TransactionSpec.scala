package graft.operators

import org.apache.hadoop.fs.Path

import graft.SparkSpec
import graft.operators.SnapshotLog._

/** Multi-log atomic commit: N tables advance together or not at all,
  * with crash recovery in both directions and readers never seeing a
  * torn state — the "kill the process between the two commits" spec.
  */
class TransactionSpec extends SparkSpec {

  private def kv(rows: (Long, String)*): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("k", "v").coalesce(1)
  }

  private def scratch(): (String, String, String) = {
    val d = graft.TempDirs.create("txn")
    (d.resolve("a").toString, d.resolve("b").toString,
      d.resolve("tx").toString)
  }

  test("a committed transaction advances both logs") {
    val (a, b, tx) = scratch()
    append(spark, a, kv(1L -> "a0"))
    append(spark, b, kv(1L -> "b0"))
    val ids = commitTransaction(spark,
      Seq(a -> kv(2L -> "a1"), b -> kv(2L -> "b1")), tx)
    assert(ids == Seq(2L, 2L))
    assert(read(spark, a).count() == 2L)
    assert(read(spark, b).count() == 2L)
    assert(operationOf(spark, a, 2L) == s"txn=$tx")
  }

  test("a crash between the two prepares is invisible and aborts cleanly") {
    val (a, b, tx) = scratch()
    append(spark, a, kv(1L -> "a0"))
    append(spark, b, kv(1L -> "b0"))
    // simulate the coordinator dying after preparing A only: plan file
    // + A's prepare manifest, no decision
    val tfs = new Path(tx).getFileSystem(spark.sparkContext.hadoopConfiguration)
    tfs.mkdirs(new Path(tx))
    val out = tfs.create(new Path(s"$tx/plan"), true)
    try out.write(s"$a\n$b".getBytes("UTF-8")) finally out.close()
    txnPrepare(spark, a, kv(2L -> "torn"), tx)
    // READERS NEVER SEE THE TORN STATE: A's head resolves to v1
    assert(currentId(spark, a) == 1L)
    assert(rowSet(read(spark, a)) == Seq(Seq("1", "a0")))
    assert(read(spark, b).count() == 1L)
    // a committer on A is blocked, loudly, not silently stacked on top
    val e = intercept[IllegalStateException] { append(spark, a, kv(9L -> "x")) }
    assert(e.getMessage.contains("in-flight multi-log transaction"))
    // recovery: not all participants prepared -> abort, head restored
    assert(!recoverTxn(spark, tx))
    assert(currentId(spark, a) == 1L)
    assert(maxManifestId(spark, a) == 1L,
      "the aborted prepare's manifest must be deleted")
    // the table commits normally again
    append(spark, a, kv(3L -> "a2"))
    assert(read(spark, a).count() == 2L)
  }

  test("a crash after the last prepare rolls forward") {
    val (a, b, tx) = scratch()
    append(spark, a, kv(1L -> "a0"))
    append(spark, b, kv(1L -> "b0"))
    val tfs = new Path(tx).getFileSystem(spark.sparkContext.hadoopConfiguration)
    tfs.mkdirs(new Path(tx))
    val out = tfs.create(new Path(s"$tx/plan"), true)
    try out.write(s"$a\n$b".getBytes("UTF-8")) finally out.close()
    txnPrepare(spark, a, kv(2L -> "a1"), tx)
    txnPrepare(spark, b, kv(2L -> "b1"), tx)
    // both pending — both invisible
    assert(read(spark, a).count() == 1L)
    assert(read(spark, b).count() == 1L)
    // every participant prepared -> recovery commits forward
    assert(recoverTxn(spark, tx))
    assert(read(spark, a).count() == 2L)
    assert(read(spark, b).count() == 2L)
  }

  test("an aborted decision voids a late coordinator's commit") {
    val (a, b, tx) = scratch()
    append(spark, a, kv(1L -> "a0"))
    val tfs = new Path(tx).getFileSystem(spark.sparkContext.hadoopConfiguration)
    tfs.mkdirs(new Path(tx))
    val out = tfs.create(new Path(s"$tx/plan"), true)
    try out.write(a.getBytes("UTF-8")) finally out.close()
    // recovery decides 'aborted' first (no prepares landed)
    assert(!recoverTxn(spark, tx))
    // the late coordinator's decision attempt must observe the abort
    assert(decideTxn(spark, tx, "committed") == "aborted")
  }

  test("a pinned base rejects a transaction computed against stale content") {
    val (a, b, tx) = scratch()
    append(spark, a, kv(1L -> "a0"))
    val cur0 = currentId(spark, a) // the caller reads at cur0...
    append(spark, a, kv(2L -> "raced")) // ...then a commit races it
    val e = intercept[IllegalStateException] {
      commitTransaction(spark, Seq(a -> kv(9L -> "stale")), tx,
        overwriteRoots = Set(a), expectedBase = Map(a -> cur0))
    }
    assert(e.getMessage.contains("conflicted with concurrent snapshot") ||
      e.getMessage.contains("CAS"))
    // the raced commit survives; the stale overwrite never landed
    assert(rowSet(read(spark, a)) == Seq(Seq("1", "a0"), Seq("2", "raced")))
  }

  test("TIMESTAMP AS OF never resolves a pending prepare") {
    val (a, b, tx) = scratch()
    append(spark, a, kv(1L -> "a0"))
    val tfs = new Path(tx).getFileSystem(spark.sparkContext.hadoopConfiguration)
    tfs.mkdirs(new Path(tx))
    val out = tfs.create(new Path(s"$tx/plan"), true)
    try out.write(s"$a\n$b".getBytes("UTF-8")) finally out.close()
    txnPrepare(spark, a, kv(2L -> "torn"), tx)
    // the prepare's manifest HAS the newest mtime, but time travel must
    // take the same visibility walk as currentId: v1 is the answer
    val now = System.currentTimeMillis() + 60000L
    assert(snapshotAtTime(spark, a, now) == 1L)
    // once the decision commits, the same timestamp resolves the prepare
    decideTxn(spark, tx, "committed")
    assert(snapshotAtTime(spark, a, now) == 2L)
  }

  test("aborted-decision cleanup is idempotent and catches late prepares") {
    val (a, b, tx) = scratch()
    append(spark, a, kv(1L -> "a0"))
    val tfs = new Path(tx).getFileSystem(spark.sparkContext.hadoopConfiguration)
    tfs.mkdirs(new Path(tx))
    val out = tfs.create(new Path(s"$tx/plan"), true)
    try out.write(a.getBytes("UTF-8")) finally out.close()
    // recovery aborts (nothing prepared yet)...
    assert(!recoverTxn(spark, tx))
    // ...then a LIVE coordinator's prepare lands after the abort: void,
    // invisible, but physically blocking the head id
    txnPrepare(spark, a, kv(2L -> "late"), tx)
    assert(currentId(spark, a) == 1L)
    intercept[IllegalStateException] { append(spark, a, kv(9L -> "x")) }
    // re-running recovery on the decided txn must CLEAN UP, not just
    // return the decision — else the table is blocked forever
    assert(!recoverTxn(spark, tx))
    assert(maxManifestId(spark, a) == 1L,
      "the late prepare's manifest must be deleted by the re-run")
    append(spark, a, kv(3L -> "a2"))
    assert(read(spark, a).count() == 2L)
  }

  test("a late coordinator voided mid-commit cleans its own prepares") {
    val (a, b, tx) = scratch()
    append(spark, a, kv(1L -> "a0"))
    append(spark, b, kv(1L -> "b0"))
    // an adversary aborts the txn BEFORE the coordinator runs (decision
    // files are first-writer-wins; the plan does not exist yet)
    assert(decideTxn(spark, tx, "aborted") == "aborted")
    val e = intercept[IllegalStateException] {
      commitTransaction(spark,
        Seq(a -> kv(2L -> "a1"), b -> kv(2L -> "b1")), tx)
    }
    assert(e.getMessage.contains("aborted"))
    // its prepares must not linger: both tables commit normally again
    assert(maxManifestId(spark, a) == 1L)
    assert(maxManifestId(spark, b) == 1L)
    append(spark, a, kv(3L -> "a2"))
    append(spark, b, kv(3L -> "b2"))
    assert(read(spark, a).count() == 2L)
    assert(read(spark, b).count() == 2L)
  }

  test("a decided-committed transaction stays visible through fresh reads") {
    val (a, b, tx) = scratch()
    append(spark, a, kv(1L -> "a0"))
    append(spark, b, kv(1L -> "b0"))
    commitTransaction(spark, Seq(a -> kv(2L -> "a1"), b -> kv(2L -> "b1")), tx)
    // later plain commits stack on the txn head normally
    append(spark, a, kv(3L -> "a2"))
    assert(read(spark, a).count() == 3L)
    assert(history(spark, a).map(_.id) == Seq(1L, 2L, 3L))
  }

  test("readTransaction reads the txn-consistent pair under later commits") {
    val (a, b, tx) = scratch()
    append(spark, a, kv(1L -> "a0"))
    append(spark, b, kv(1L -> "b0"))
    commitTransaction(spark, Seq(a -> kv(2L -> "a1"), b -> kv(2L -> "b1")), tx)
    // both tables advance AFTER the transaction — the group read must
    // still see exactly the state the decision published
    append(spark, a, kv(3L -> "late-a"))
    append(spark, b, kv(3L -> "late-b"))
    val group = readTransaction(spark, tx)
    assert(group.keySet == Set(a, b))
    assert(rowSet(group(a)) == Seq(Seq("1", "a0"), Seq("2", "a1")))
    assert(rowSet(group(b)) == Seq(Seq("1", "b0"), Seq("2", "b1")))
    // fresh reads see the later commits (the pin is the txn's, not the head)
    assert(read(spark, a).count() == 3L)
  }

  test("readTransaction refuses an undecided or aborted transaction") {
    val (a, b, tx) = scratch()
    append(spark, a, kv(1L -> "a0"))
    val tfs = new Path(tx).getFileSystem(spark.sparkContext.hadoopConfiguration)
    tfs.mkdirs(new Path(tx))
    val out = tfs.create(new Path(s"$tx/plan"), true)
    try out.write(a.getBytes("UTF-8")) finally out.close()
    // undecided: nothing consistent exists yet
    intercept[IllegalArgumentException] { readTransaction(spark, tx) }
    // aborted: never readable
    assert(!recoverTxn(spark, tx))
    intercept[IllegalArgumentException] { readTransaction(spark, tx) }
  }
}
