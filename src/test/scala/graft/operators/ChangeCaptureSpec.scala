package graft.operators

import graft.{SparkSpec, TestSpark}
import org.apache.spark.sql.functions._

/** Structural invariants of the CDC pair (cd1/mg1) that the row-hash
  * oracle doesn't state explicitly — the properties a downstream
  * incremental consumer relies on.
  */
class ChangeCaptureSpec extends SparkSpec {

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, TestSpark.Sf0001)

  test("cd1: changelog partitions cleanly into insert/update/delete") {
    val diff = run("cd1_snapshot_diff").cache()
    try {
      // key appears exactly once — a changelog with duplicate keys
      // cannot be applied idempotently
      assert(diff.groupBy("o_orderkey").count().filter(col("count") > 1).isEmpty)
      // classification is total and consistent with the null pattern
      assert(diff.filter(
        (col("change_type") === "insert" && (col("old_price").isNotNull || col("new_price").isNull)) ||
        (col("change_type") === "delete" && (col("old_price").isNull || col("new_price").isNotNull)) ||
        (col("change_type") === "update" &&
          (col("old_price").isNull || col("new_price").isNull ||
            col("old_price") === col("new_price")))).isEmpty)
      // applying the changelog to snapshot A reproduces snapshot B
      val o = graft.Tables(spark, TestSpark.Sf0001, "orders")
        .select("o_orderkey", "o_totalprice")
      val snapA = o.filter(col("o_orderkey") % 7 =!= 0)
      val snapB = o.filter(col("o_orderkey") % 5 =!= 0)
        .select(
          col("o_orderkey"),
          when(col("o_orderkey") % 3 === 0, col("o_totalprice") + 10)
            .otherwise(col("o_totalprice")).as("o_totalprice"))
      val applied = snapA
        .join(diff.select("o_orderkey", "change_type", "new_price"), Seq("o_orderkey"), "left")
        .filter(col("change_type").isNull || col("change_type") =!= "delete")
        .select(
          col("o_orderkey"),
          coalesce(col("new_price"), col("o_totalprice")).as("o_totalprice"))
        .unionAll(
          diff.filter(col("change_type") === "insert")
            .select(col("o_orderkey"), col("new_price").as("o_totalprice")))
      assert(rowSet(applied) === rowSet(snapB))
    } finally diff.unpersist()
  }

  test("mg1: exactly one current row per key; closed rows precede it") {
    val hist = run("mg1_scd2_merge").cache()
    try {
      val perKey = hist.groupBy("c_custkey").agg(
        sum(when(col("is_current"), 1).otherwise(0)).as("n_current"),
        count(lit(1)).as("n_rows"),
        max("valid_from").as("max_from"))
      assert(perKey.filter(col("n_current") =!= 1).isEmpty)
      // closed rows carry valid_to = successor's valid_from; open rows null
      assert(hist.filter(!col("is_current") && col("valid_to").isNull).isEmpty)
      assert(hist.filter(col("is_current") && col("valid_to").isNotNull).isEmpty)
      // a key has 2 rows iff the batch touched it, else 1
      assert(perKey.filter(col("n_rows") > 2).isEmpty)
      assert(perKey.filter(col("n_rows") === 2 && col("max_from") =!= 2).isEmpty)
    } finally hist.unpersist()
  }
}
