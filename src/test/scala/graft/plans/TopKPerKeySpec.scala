package graft.plans

import graft.{SparkSpec, TestSpark}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The TopKPerKey stack must (1) replace the Filter+Window row_number
  * idiom with the partial/final heap operators, (2) produce exactly the
  * window semantics — ranks, ties by tiebreak column, rank-kept and
  * rank-dropped projections — on multi-partition data, and (3) leave
  * windows it cannot serve (multiple window functions) alone.
  */
class TopKPerKeySpec extends SparkSpec {

  import spark.implicits._

  private def planted = (1 to 400).map { i =>
    (s"k${i % 7}", (i * 37) % 100, i.toLong) // 7 keys, tied values, unique id
  }.toDF("key", "value", "id").repartition(11)

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Reference answer computed directly in Scala. */
  private def expected(k: Int): Set[(String, Int, Long, Int)] =
    (1 to 400).map(i => (s"k${i % 7}", (i * 37) % 100, i.toLong))
      .groupBy(_._1)
      .flatMap { case (key, rows) =>
        rows.sortBy(r => (-r._2, r._3)).take(k).zipWithIndex.map {
          case ((_, v, id), idx) => (key, v, id, idx + 1)
        }
      }.toSet

  test("row_number filter plans as partial+final heaps, exact ranks, 11 partitions") {
    val w = Window.partitionBy("key").orderBy(desc("value"), asc("id"))
    val df = planted.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    val plan = planOf(df)
    assert(plan.contains("FinalTopKPerKey"), plan.take(800))
    assert(plan.contains("PartialTopKPerKey"), plan.take(800))
    assert(!plan.contains("Window"), plan.take(800))
    val got = df.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
    assert(got === expected(3))
  }

  test("rank-dropped projection and cast comparisons still rewrite") {
    val w = Window.partitionBy("key").orderBy(desc("value"), asc("id"))
    val df = planted
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") < 3L) // < over a cast column: k = 2
      .select("key", "id")
    assert(planOf(df).contains("FinalTopKPerKey"), planOf(df).take(800))
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === expected(2).map(t => (t._1, t._3)))
  }

  test("rank == 1 becomes top-1") {
    val w = Window.partitionBy("key").orderBy(desc("value"), asc("id"))
    val df = planted.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    assert(planOf(df).contains("FinalTopKPerKey"), planOf(df).take(800))
    val got = df.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
    assert(got === expected(1))
  }

  test("bounded heap table: eviction path is exact at key cardinality >> resident keys") {
    // 50k distinct keys across 7 partitions with only 16 resident heaps
    // per task — thousands of evictions per partition; the emitted-chunk
    // union must still reduce to exactly the window semantics.
    spark.conf.set(TopKPerKey.MaxHeapKeysConf, "16")
    try {
      val n = 200000
      val df = spark.range(n)
        .selectExpr("id % 50000 AS key", "(id * 2654435761) % 1000000 AS value", "id")
        .repartition(7)
      val w = Window.partitionBy("key").orderBy(desc("value"), asc("id"))
      val out = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      val plan = planOf(out)
      assert(plan.contains("PartialTopKPerKey"), plan.take(800))
      val want = (0L until n)
        .map(id => (id % 50000, (id * 2654435761L) % 1000000, id))
        .groupBy(_._1)
        .flatMap { case (key, rows) =>
          rows.sortBy(r => (-r._2, r._3)).take(2).zipWithIndex.map {
            case ((_, v, id), idx) => (key, v, id, idx + 1)
          }
        }.toSet
      val got = out.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
      assert(got === want)
    } finally spark.conf.unset(TopKPerKey.MaxHeapKeysConf)
  }

  test("partial pass participates in whole-stage codegen (no fallback)") {
    val s = spark.newSession()
    // compile failures must throw, not silently fall back to interpreted
    s.conf.set("spark.sql.codegen.fallback", "false")
    TopKPerKey.install(s)
    import s.implicits._
    val df = (1 to 400).map(i => (s"k${i % 7}", (i * 37) % 100, i.toLong))
      .toDF("key", "value", "id").repartition(11)
    val w = Window.partitionBy("key").orderBy(desc("value"), asc("id"))
    val out = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    // execute FIRST: under AQE, CollapseCodegenStages runs per query
    // stage at materialization, so the pre-execution plan has no '*'
    // codegen markers anywhere
    val got = out.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
    assert(got === expected(3))
    val plan = out.queryExecution.executedPlan.toString
    // '*(n)' prefix = node is inside a WholeStageCodegen region
    assert("""\*\(\d+\) PartialTopKPerKey""".r.findFirstIn(plan).isDefined, plan)
  }

  test("multi-window-function filters are not rewritten") {
    val w = Window.partitionBy("key").orderBy(desc("value"), asc("id"))
    val df = planted
      .withColumn("rn", row_number().over(w))
      .withColumn("total", sum("value").over(Window.partitionBy("key")))
      .filter(col("rn") <= 2)
    assert(planOf(df).contains("Window"), planOf(df).take(800))
  }

  test("ev5 (custom operator) equals ev3's window semantics on the event log") {
    val ev5 = graft.SparkEntry.queries("ev5_topk_per_key")(spark, TestSpark.Sf0001)
    // reference computed directly from the base table in Scala
    val purchases = graft.Tables(spark, TestSpark.Sf0001, "events")
      .filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = purchases.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      rows.sortBy(r => (-r._3, r._2)).take(2).zipWithIndex.map {
        case ((_, id, v), idx) => (u, idx + 1L, id, v)
      }.toSeq
    }.toSet
    val got = ev5.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === want)
  }
}
