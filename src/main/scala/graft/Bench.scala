package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark sweep: every `bench = true` registry query against
  * SPARK_GRAFT_SF_DIR, one JSON summary line on stdout for the driver.
  *
  * Output-size constraint: the driver keeps only the final ~2000 chars of
  * the run's output, so the stdout line uses 2-decimal times, the sf
  * basename, omits `errors` when empty, and lists only the 40 slowest
  * queries plus an `others` rollup (the full registry outgrew the window
  * at ~77 entries); the full-precision record (every query's seconds,
  * errors, total) is always written to BENCH_FULL.json alongside.
  *
  * Self-honesty: a query that throws is recorded in `errors` (and still
  * contributes its elapsed time) instead of silently benching as ~0s —
  * a plan-time failure must not masquerade as a speedup.
  */
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

    // Constant-size queries (bench = false, e.g. the seed-derived recipe
    // star analytics) are excluded: they don't read sfDir, so timing them
    // adds noise, not scaling signal. They remain in Verify/CORRECTNESS.
    // SPARK_GRAFT_BENCH_ONLY=a,b,c restricts the sweep (local iteration;
    // the driver never sets it).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val names = SparkEntry.registry.filter(_.bench).map(_.name)
      .filter(n => only.forall(_.contains(n)))

    // Warm-up sweep at the smallest SF: exercises the same plans so JIT /
    // codegen / parquet-footer first-touch cost doesn't land on whichever
    // query the measured sweep happens to run first.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).exists()) names.foreach { name =>
      try run(SparkEntry.queries(name), warmDir) catch { case _: Throwable => () }
    }

    // Machine-load context: a shared box can inflate CPU-saturating
    // queries up to ~2x run-to-run (round-3's dd3 12.2s->21.3s was load,
    // not code — it cost a round of comparability to prove). Recording
    // loadavg start/end plus a second run of the slowest queries lets a
    // reader separate load artifacts from real regressions in-artifact.
    def loadavg(): String =
      try Files.readString(Paths.get("/proc/loadavg")).trim
        .split(" ").take(3).mkString(",")
      catch { case _: Throwable => "" }
    val loadStart = loadavg()

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // Per-query attribution telemetry (BENCH_FULL.json only): GC time
    // spent inside the timed window and cache bytes materialized by the
    // query (read BEFORE the inter-query clearCache). A future dd3-style
    // 2-3x swing is then attributable from the artifact alone: high gc_ms
    // -> memory pressure/sweep environment; cache_mb 0 on a query whose
    // plan persists an intermediate -> the persist was lost (recompute).
    val telemetry = scala.collection.mutable.LinkedHashMap[String, (Long, Long)]()
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }
    def cachedMb(): Long =
      spark.sparkContext.getRDDStorageInfo
        .map(i => i.memSize + i.diskSize).sum / (1024 * 1024)
    def timed(name: String, dir: String): (String, Double) = {
      // Untimed inter-query cleanup: drop per-query persisted
      // intermediates and force a GC so the ContextCleaner reaps
      // accumulated broadcast/shuffle state — without this, queries late
      // in the sweep measure the prior queries' garbage, not themselves
      // (observed 5-10x inflation on trivial queries at sweep position 40).
      spark.catalog.clearCache()
      System.gc()
      // Reset session-global experimental hooks: ev5/rj2 install their
      // optimizer rule/strategy inside the query fn, and without this
      // every LATER query (including ev3, the documented built-in-window
      // baseline ev5 is compared against) silently benches the rewritten
      // plan. Answers are unaffected (the rules are answer-preserving);
      // the ev3-vs-ev5 comparison is what this protects.
      spark.experimental.extraOptimizations = Nil
      spark.experimental.extraStrategies = Nil
      val gc0 = gcMs()
      val t0 = System.nanoTime()
      try run(SparkEntry.queries(name), dir)
      catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(80)
      }
      val sec = (System.nanoTime() - t0) / 1e9
      telemetry(name) = (gcMs() - gc0, cachedMb())
      name -> sec
    }
    val results = names.map(timed(_, sfDir))
    val total = results.map(_._2).sum
    // Second run of the 3 slowest: if run2 << run1 the first number was
    // load/GC noise, not plan cost. (Cleanup inside timed() keeps caches
    // from making run2 trivially fast — this re-executes the full plan.)
    val rerun = results.sortBy(-_._2).take(3).map { case (n, _) => timed(n, sfDir) }
    val loadEnd = loadavg()

    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    }
    // 2-decimal, trailing zeros stripped ("0.30" -> "0.3", "1.00" -> "1").
    def fmt(v: Double): String = {
      val s = f"$v%.2f"
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').reverse.stripSuffix(".") else s
    }
    def line(f: Double => String, keep: Int): String = {
      // stdout budget: the registry outgrew the driver's ~2000-char tail
      // window at ~77 entries, so the printed line carries the `keep`
      // slowest queries (the scaling signal) plus an `others` rollup;
      // BENCH_FULL.json always carries every query.
      val (shown, folded) = results.sortBy(-_._2).splitAt(keep)
      val qs = shown.map { case (k, v) => "\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
      val othersJson =
        if (folded.isEmpty) ""
        else s""","others":{"n":${folded.size},"sec":${f(folded.map(_._2).sum)}}"""
      val errJson =
        if (errors.isEmpty) ""
        else errors.map { case (k, v) => "\"" + esc(k) + "\":\"" + esc(v) + "\"" }
          .mkString(",\"errors\":{", ",", "}")
      val rerunJson = rerun
        .map { case (k, v) => "\"" + k + "\":" + f(v) }
        .mkString(""","rerun":{""", ",", "}")
      s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs$othersJson,"sf":"${
        new java.io.File(sfDir).getName}","load":{"start":"$loadStart","end":"$loadEnd"}$rerunJson$errJson}"""
    }
    // Telemetry rides only in BENCH_FULL.json (stdout budget is ~2000
    // chars); a rerun query's entry reflects its LAST (rerun) window.
    val teleJson = telemetry
      .map { case (k, (gc, mb)) => "\"" + esc(k) + s"""":{"gc_ms":$gc,"cache_mb":$mb}""" }
      .mkString(""","telemetry":{""", ",", "}")
    Files.writeString(
      Paths.get("BENCH_FULL.json"),
      line(_.toString, results.size).stripSuffix("}") + teleJson + "}\n")
    println(line(fmt, 40))
    spark.stop()
  }
}
