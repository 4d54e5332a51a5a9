package graft.sources

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.operators.SnapshotLog

/** Three-valued logic in the per-file claim evaluator: a NULL row
  * outcome is a non-match but is NOT FALSE — under `Not` it stays NULL
  * (still a non-match), never flips to TRUE. Collapsing NULL→FALSE
  * inside the evaluator made `x NOT IN (1, NULL)` and `NOT (c = v)`
  * over pre-ADD-COLUMN (all-NULL) files claim ALL-TRUE and return rows
  * SQL says must not exist. These specs pin the SQL answer AND that
  * legitimate claiming power survives the fix.
  */
class SnapshotClaimTriStateSpec extends SparkSpec {

  private lazy val cat: String = {
    spark.conf.set("spark.sql.catalog.sntri",
      classOf[SnapshotCatalog].getName)
    "sntri"
  }

  /** Day-fanout log: 4 day-files, d point-banded + null-free in each. */
  private def dayLog(tag: String): String = {
    import spark.implicits._
    val root = graft.TempDirs.create(s"tristate_$tag").resolve("log").toString
    val prior = spark.conf.getOption("spark.graft.write.fanout")
    spark.conf.set("spark.graft.write.fanout", "true")
    try {
      SnapshotLog.createTable(spark, root,
        org.apache.spark.sql.types.StructType.fromDDL("d TIMESTAMP, k BIGINT"),
        Seq(SnapshotLog.PartField("days", "d")))
      SnapshotLog.append(spark, root,
        (1L to 100L).map(k => (
          java.sql.Timestamp.from(
            java.time.Instant.ofEpochSecond((k % 4) * 86400L)), k))
          .toDF("d", "k"))
    } finally prior match {
      case Some(x) => spark.conf.set("spark.graft.write.fanout", x)
      case None => spark.conf.unset("spark.graft.write.fanout")
    }
    root
  }

  private def hasFilter(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Filter])

  test("NOT IN with a NULL list element returns ZERO rows — the " +
      "NULL-derived non-match must not negate to all-true") {
    val root = dayLog("notin")
    // SQL: d NOT IN (x, NULL) is NOT(d = x OR NULL) — NULL for every
    // d ≠ x, FALSE for d = x; no row can ever pass
    val df = spark.sql(s"SELECT k FROM $cat.`$root` " +
      "WHERE d NOT IN (TIMESTAMP '1970-01-02 00:00:00', NULL)")
    assert(df.count() == 0L,
      "x NOT IN (…, NULL) must return zero rows (SQL three-valued logic)")
  }

  test("NOT(=) over pre-ADD-COLUMN files: the all-NULL era is a " +
      "non-match, not a negated match") {
    import spark.implicits._
    val root = graft.TempDirs.create("tristate_addcol").resolve("log").toString
    // era 1: no column c at all (reads as NULL after the ADD)
    SnapshotLog.append(spark, root,
      (1L to 10L).map(k => (k, s"v$k")).toDF("k", "v").coalesce(1))
    spark.sql(s"ALTER TABLE $cat.`$root` ADD COLUMN c STRING")
    // era 2/3: c constant per append → point-banded + null-free files
    SnapshotLog.append(spark, root,
      (11L to 20L).map(k => (k, s"v$k", "x")).toDF("k", "v", "c").coalesce(1))
    SnapshotLog.append(spark, root,
      (21L to 30L).map(k => (k, s"v$k", "y")).toDF("k", "v", "c").coalesce(1))
    // disable constraint propagation so no inferred IsNotNull(c) is
    // co-pushed — the Not(EqualTo) claim must be NULL-correct alone
    val key = "spark.sql.constraintPropagation.enabled"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try {
      val df = spark.sql(
        s"SELECT k FROM $cat.`$root` WHERE NOT (c = 'x')")
      val got = df.collect().map(_.getLong(0)).sorted.toSeq
      assert(got == (21L to 30L).toSeq,
        s"pre-ADD rows read c as NULL: NOT(NULL = 'x') is NULL, a " +
          s"non-match — got $got")
    } finally prior match {
      case Some(x) => spark.conf.set(key, x)
      case None => spark.conf.unset(key)
    }
  }

  test("legitimate NOT(=) claiming power survives: null-free point " +
      "files still claim exact with correct rows") {
    val root = dayLog("notpos")
    val df = spark.sql(s"SELECT k FROM $cat.`$root` " +
      "WHERE NOT (d = TIMESTAMP '1970-01-02 00:00:00')")
    assert(!hasFilter(df),
      "null-free point files decide NOT(=) exactly — must claim:\n" +
        df.queryExecution.optimizedPlan.toString)
    val rows = df.collect().map(_.getLong(0))
    assert(rows.length == 75 && rows.forall(_ % 4 != 1))
  }

  test("a bare IS NULL / IS NOT NULL claims from null counts alone — " +
      "no point band needed — and unlocks the manifest COUNT") {
    import spark.implicits._
    val root = graft.TempDirs.create("tristate_isnull").resolve("log").toString
    // file A: note all-NULL; file B: note null-free — no point stats
    // on note in either (all-null records none; B's values are unique)
    SnapshotLog.append(spark, root,
      (1L to 40L).map(k => (k, Option.empty[String])).toDF("k", "note")
        .coalesce(1))
    SnapshotLog.append(spark, root,
      (41L to 100L).map(k => (k, Option(s"n$k"))).toDF("k", "note")
        .coalesce(1))
    val df = spark.sql(
      s"SELECT count(*) AS n FROM $cat.`$root` WHERE note IS NULL")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan") &&
      !plan.contains("SnapshotBatchScan"),
      s"null-audit count must fold from the manifest:\n$plan")
    assert(df.head().getLong(0) == 40L)
    val df2 = spark.sql(
      s"SELECT count(*) AS n FROM $cat.`$root` WHERE note IS NOT NULL")
    assert(df2.head().getLong(0) == 60L)
    assert(df2.queryExecution.executedPlan.toString
      .contains("LocalTableScan"))
  }

  test("NOT IN without nulls still claims and drops exactly") {
    val root = dayLog("notin2")
    val df = spark.sql(s"SELECT k FROM $cat.`$root` " +
      "WHERE d NOT IN (TIMESTAMP '1970-01-02 00:00:00', " +
      "TIMESTAMP '1970-01-03 00:00:00')")
    assert(!hasFilter(df),
      "null-free NOT IN over point files must claim exact:\n" +
        df.queryExecution.optimizedPlan.toString)
    val rows = df.collect().map(_.getLong(0))
    assert(rows.length == 50 && rows.forall(k => k % 4 != 1 && k % 4 != 2))
  }
}
