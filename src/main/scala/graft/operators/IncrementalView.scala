package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q

/** Incremental maintenance of additive GROUP BY views from a
  * [[SnapshotLog]] change feed — the materialized-view half of the
  * table format: instead of re-aggregating the table after every
  * commit, fold each snapshot's insert/delete delta into the view
  * state.
  *
  * Additive aggregates (`count(*)`, `sum(c)`) maintain exactly:
  * an insert contributes `+1 / +c`, a delete `-1 / -c`, so
  * `state ⊕ delta` is one aggregation of the DELTA (churn-sized)
  * plus one outer join against the view (view-sized, typically tiny —
  * it is grouped). A 100 TB table with 0.1% daily churn refreshes its
  * views by touching 0.1% of the data; the full re-aggregation the
  * fold replaces would scan everything, every time. Groups whose
  * count reaches zero are dropped, so the maintained view is
  * row-for-row the view a from-scratch aggregation would build — the
  * invariant iv1's oracle checks end-to-end across appends, a MERGE
  * upsert, and a CoW delete.
  *
  * Non-additive aggregates (min/max under deletes, distinct counts)
  * need retraction state beyond this fold — out of scope here; the
  * sketch tier ([[graft.functions]] Misra–Gries, bottom-k) is the
  * engine's answer for those at scale.
  */
object IncrementalView {

  /** One maintenance step: fold a tagged delta (rows + `change` column
    * of `insert`/`delete`) into view `state`.
    *
    * @param state   current view: `keys ++ (n, sum_<c>...)`; pass None
    *                for the empty view
    * @param delta   changelog rows: table columns + `change`
    * @param keys    grouping columns
    * @param sumCols columns to maintain sums for
    */
  def applyDelta(state: Option[DataFrame], delta: DataFrame,
      keys: Seq[String], sumCols: Seq[String]): DataFrame = {
    val sign = when(col("change") === "insert", lit(1L)).otherwise(lit(-1L))
    val deltaAgg = delta.groupBy(keys.map(col): _*).agg(
      sum(sign).as("d_n"),
      sumCols.map(c => sum(sign * col(c)).as(s"d_sum_$c")): _*)
    val folded = state match {
      case None =>
        deltaAgg.select(
          keys.map(col) ++ Seq(col("d_n").as("n")) ++
            sumCols.map(c => col(s"d_sum_$c").as(s"sum_$c")): _*)
      case Some(st) =>
        st.join(deltaAgg, keys, "full_outer").select(
          keys.map(col) ++ Seq(
            (coalesce(col("n"), lit(0L)) + coalesce(col("d_n"), lit(0L))).as("n")) ++
            sumCols.map(c =>
              (coalesce(col(s"sum_$c"), lit(0L)) +
                coalesce(col(s"d_sum_$c"), lit(0L))).as(s"sum_$c")): _*)
    }
    // a group whose membership reached zero leaves the view entirely
    folded.filter(col("n") > 0)
  }

  /** Materialize the view over a [[SnapshotLog]] by folding every
    * snapshot transition in `(0, current]` — each step aggregates one
    * transition's churn, with `localCheckpoint` severing the fold's
    * self-referential lineage (same loop discipline as
    * [[GraphOps.pageRank]]). A long-lived deployment persists the state
    * and the last applied snapshot id, then folds only the tail.
    */
  def materialize(spark: SparkSession, root: String,
      keys: Seq[String], sumCols: Seq[String]): DataFrame = {
    val hi = SnapshotLog.currentId(spark, root)
    require(hi > 0, s"materialize over empty log $root")
    var state: Option[DataFrame] = None
    (0L until hi).foreach { i =>
      val delta = SnapshotLog.changes(spark, root, i, i + 1)
      state = Some(
        applyDelta(state, delta, keys, sumCols).localCheckpoint(true))
    }
    state.get
  }

  /** Operation tag recording which table snapshot a view commit
    * reflects: `refresh=<tableSnapshotId>`.
    */
  private def cursorOf(spark: SparkSession, viewRoot: String): Long =
    if (SnapshotLog.currentId(spark, viewRoot) == 0L) 0L
    else {
      val op = SnapshotLog
        .snapshot(spark, viewRoot, SnapshotLog.currentId(spark, viewRoot))
        .operation
      require(op.startsWith("refresh="), s"not a view log: operation $op")
      op.stripPrefix("refresh=").toLong
    }

  /** Transactionally-consistent incremental refresh: the view lives in
    * its OWN [[SnapshotLog]], and each refresh commit's operation tag
    * records the table snapshot it reflects (`refresh=<id>`) — cursor
    * and output commit in ONE atomic manifest rename, so a crash
    * anywhere leaves either the old view (with its old cursor) or the
    * new view (with the new one); re-running refresh after any crash is
    * a no-op or a clean catch-up, never a double-apply. Each refresh
    * folds only `changelog(applied, current]` — churn-sized work — and
    * the view keeps its own time-travelable history as a bonus.
    * Returns the table snapshot id the view now reflects.
    */
  def refresh(spark: SparkSession, viewRoot: String, tableRoot: String,
      keys: Seq[String], sumCols: Seq[String]): Long = {
    val applied = cursorOf(spark, viewRoot)
    val cur = SnapshotLog.currentId(spark, tableRoot)
    require(cur >= applied,
      s"view at $viewRoot reflects snapshot $applied but table is at $cur")
    if (cur == applied) return applied
    val delta = SnapshotLog.changelog(spark, tableRoot, applied, cur)
      .drop("snapshot_id")
    val state =
      if (applied == 0L) None else Some(SnapshotLog.read(spark, viewRoot))
    val next = applyDelta(state, delta, keys, sumCols)
    SnapshotLog.overwriteAs(spark, viewRoot, next, s"refresh=$cur")
    cur
  }

  /** One JOIN-view maintenance step — the textbook delta-join identity
    * ΔV = ΔA⋈B_pre ∪ A_pre⋈ΔB ∪ ΔA⋈ΔB, with inserts/deletes as ±1
    * signs (an update is delete+insert in the change feed, so it flows
    * through unchanged). The maintained view is a MULTISET — rows with
    * a multiplicity `m` — folded exactly like [[applyDelta]]'s counts;
    * `m = 0` rows leave the view. Each step's join OUTPUT is
    * churn-sized: pre-states join only against deltas, never against
    * each other (the full A⋈B re-join is precisely what IVM exists to
    * avoid). The pre-state SCAN is still table-sized here; a 100 TB
    * deployment buckets the pre-state on the join key so each delta
    * touches only its matching buckets. `outCols` names the view's columns (from both inputs).
    */
  def applyJoinDelta(state: Option[DataFrame],
      aPre: DataFrame, dA: Option[DataFrame],
      bPre: DataFrame, dB: Option[DataFrame],
      joinKey: String, outCols: Seq[String]): DataFrame = {
    def signed(d: DataFrame) = d.withColumn("sign",
      when(col("change") === "insert", lit(1L)).otherwise(lit(-1L)))
    val out = outCols.map(col)
    val parts = Seq(
      dA.map(da => signed(da).join(bPre, joinKey).select(out :+ col("sign"): _*)),
      dB.map(db => aPre.join(signed(db), joinKey).select(out :+ col("sign"): _*)),
      (dA, dB) match {
        case (Some(da), Some(db)) =>
          val a = signed(da).withColumnRenamed("sign", "sign_a")
          val b = signed(db).withColumnRenamed("sign", "sign_b")
          Some(a.join(b, joinKey)
            .select(out :+ (col("sign_a") * col("sign_b")).as("sign"): _*))
        case _ => None
      }).flatten
    require(parts.nonEmpty, "at least one side must have a delta")
    val deltaAgg = parts.reduce(_ unionByName _)
      .groupBy(out: _*).agg(sum(col("sign")).as("d_m"))
    val folded = state match {
      case None => deltaAgg.select(out :+ col("d_m").as("m"): _*)
      case Some(st) =>
        st.join(deltaAgg, outCols, "full_outer").select(
          out :+ (coalesce(col("m"), lit(0L)) +
            coalesce(col("d_m"), lit(0L))).as("m"): _*)
    }
    folded.filter(col("m") > 0)
  }

  /** Materialize an A⋈B join view by folding both logs' aligned
    * snapshot transitions — pre-states come from TIME TRAVEL on each
    * log, so every step sees exactly the states the delta-join
    * identity requires, without keeping copies. Superseded per-step
    * checkpoints are released by the ContextCleaner once unreferenced
    * — the same per-round `localCheckpoint` discipline as
    * [[GraphOps.pageRank]] and [[materialize]] (storage is bounded by
    * the handful of in-flight rounds, not the history length).
    */
  def materializeJoin(spark: SparkSession, rootA: String, rootB: String,
      joinKey: String, outCols: Seq[String]): DataFrame = {
    val hiA = SnapshotLog.currentId(spark, rootA)
    val hiB = SnapshotLog.currentId(spark, rootB)
    require(hiA > 0 && hiB > 0, "materializeJoin over an empty log")
    // pre-state at transition i: snapshot i (empty for i = 0 — read()
    // treats asOf=0 as "current", so the bootstrap empties explicitly);
    // a log whose history ended keeps its final state
    def pre(root: String, hi: Long, i: Long): DataFrame = {
      val snap = SnapshotLog.read(spark, root, asOf = math.max(math.min(i, hi), 1L))
      if (i == 0) snap.limit(0) else snap
    }
    var state: Option[DataFrame] = None
    (0L until math.max(hiA, hiB)).foreach { i =>
      val dA = if (i < hiA) Some(SnapshotLog.changes(spark, rootA, i, i + 1)) else None
      val dB = if (i < hiB) Some(SnapshotLog.changes(spark, rootB, i, i + 1)) else None
      state = Some(applyJoinDelta(state,
          pre(rootA, hiA, i), dA, pre(rootB, hiB, i), dB, joinKey, outCols)
        .localCheckpoint(true))
    }
    state.get
  }

  val all: Seq[Q] = Seq(
    // IV1: the per-status (count, key-sum) view maintained INCREMENTALLY
    // across ordersLog's whole history (3 appends + CoW delete) must
    // equal the view a from-scratch aggregation of the FINAL state
    // builds — the oracle computes the latter relationally. A wrong
    // sign, a dropped delta, or a lingering zero-count group all break
    // the hash.
    Q(
      "iv1_incremental_view",
      (s, dir) => {
        val root = SnapshotLog.stagedOrdersLog(s, dir)
        materialize(s, root, keys = Seq("o_orderstatus"),
          sumCols = Seq("o_orderkey"))
          .select(col("o_orderstatus"), col("n"),
            col("sum_o_orderkey").as("key_sum"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |       CAST(sum(o_orderkey) AS BIGINT) AS key_sum
             |FROM orders WHERE o_orderstatus <> 'F'
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
      stage = Some((s, dir) => { SnapshotLog.stagedOrdersLog(s, dir); () })
    ),

    // IV2: the transactional refresh loop — a view in its own snapshot
    // log, refreshed TWICE against a mutating table (seed → refresh →
    // append + CoW delete → refresh). The second refresh folds only the
    // two new snapshots' churn (its cursor, recorded in the view's own
    // commit, proves where it resumed). Final view must equal the
    // from-scratch aggregation of the final table — the oracle.
    Q(
      "iv2_view_refresh",
      (s, dir) => {
        val view = refreshedViewLog(s, dir)
        SnapshotLog.read(s, view)
          .select(col("o_orderstatus"), col("n"),
            col("sum_o_orderkey").as("key_sum"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |       CAST(sum(o_orderkey) AS BIGINT) AS key_sum
             |FROM orders WHERE o_orderstatus <> 'O'
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
      stage = Some((s, dir) => { refreshedViewLog(s, dir); () })
    ),

    // IV3: incremental JOIN-view maintenance — the delta-join identity
    // (applyJoinDelta) folded across TWO mutating logs with different
    // history lengths (orders side: append → CoW delete → MERGE price
    // update; customer side: append → MERGE name update). The
    // maintained multiset view must equal the from-scratch join of
    // both FINAL states — the oracle reproduces those states
    // relationally. A wrong sign on any of the three delta joins, a
    // missed ΔA⋈ΔB term, or a stale pre-state all break the hash.
    Q(
      "iv3_join_view",
      (s, dir) => {
        val (ra, rb) = joinViewLogs(s, dir)
        materializeJoin(s, ra, rb, "custkey",
          Seq("o_orderkey", "custkey", "cents", "c_name"))
          .orderBy("o_orderkey")
      },
      Some("""WITH a AS (
             |  SELECT o_orderkey, o_custkey AS custkey,
             |    CAST(round(o_totalprice * 100) AS BIGINT)
             |      + CASE WHEN o_orderkey % 7 = 0 THEN 1000 ELSE 0 END AS cents
             |  FROM orders WHERE o_orderkey % 5 <> 0),
             |b AS (
             |  SELECT c_custkey AS custkey,
             |    CASE WHEN c_custkey % 10 = 0 THEN 'X' || c_name ELSE c_name END AS c_name
             |  FROM customer)
             |SELECT o_orderkey, custkey, cents, c_name, CAST(1 AS BIGINT) AS m
             |FROM a JOIN b USING (custkey) ORDER BY o_orderkey""".stripMargin),
      stage = Some((s, dir) => { joinViewLogs(s, dir); () })
    )
  )

  /** iv3's staged pair of logs: the orders side mutates three times
    * (append, CoW delete of key≡0 mod 5, MERGE +1000 cents on key≡0
    * mod 7), the customer side twice (append, MERGE 'X'-prefix on
    * key≡0 mod 10) — deliberately different history lengths so the
    * aligned fold exercises the one-sided-delta path.
    */
  private def joinViewLogs(s: SparkSession, dir: String): (String, String) = {
    val p = graft.TempDirs.staged(s"ivjoin_${graft.TempDirs.dirKey(dir)}") { p =>
      val rootA = p.resolve("a").toString
      val rootB = p.resolve("b").toString
      val a = graft.Tables(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey").as("custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      SnapshotLog.append(s, rootA, a)
      SnapshotLog.deleteWhere(s, rootA, pmod(col("o_orderkey"), lit(5)) === 0)
      SnapshotLog.mergeInto(s, rootA,
        SnapshotLog.read(s, rootA)
          .filter(pmod(col("o_orderkey"), lit(7)) === 0)
          .withColumn("cents", col("cents") + 1000L),
        Seq("o_orderkey"))
      val b = graft.Tables(s, dir, "customer")
        .select(col("c_custkey").as("custkey"), col("c_name"))
      SnapshotLog.append(s, rootB, b)
      SnapshotLog.mergeInto(s, rootB,
        b.filter(pmod(col("custkey"), lit(10)) === 0)
          .withColumn("c_name", concat(lit("X"), col("c_name"))),
        Seq("custkey"))
    }
    (p.resolve("a").toString, p.resolve("b").toString)
  }

  /** Staged two-refresh view: its own table log (even keys, then odd
    * keys, then a CoW delete of the 'O' rows) with a refresh after the
    * first append and another after the delete — the second one starts
    * from cursor 1 and folds only snapshots 2..3.
    */
  private def refreshedViewLog(s: SparkSession, dir: String): String =
    graft.TempDirs.staged(s"ivview_${graft.TempDirs.dirKey(dir)}") { p =>
      val table = p.resolve("table").toString
      val view = p.resolve("view").toString
      val orders = graft.Tables(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus")
      val keys = Seq("o_orderstatus")
      val sums = Seq("o_orderkey")
      SnapshotLog.append(s, table, orders.filter(pmod(col("o_orderkey"), lit(2)) === 0))
      refresh(s, view, table, keys, sums)
      SnapshotLog.append(s, table, orders.filter(pmod(col("o_orderkey"), lit(2)) === 1))
      SnapshotLog.deleteWhere(s, table, col("o_orderstatus") === "O")
      refresh(s, view, table, keys, sums)
    }.resolve("view").toString
}
