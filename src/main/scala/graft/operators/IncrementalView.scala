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
    )
  )
}
