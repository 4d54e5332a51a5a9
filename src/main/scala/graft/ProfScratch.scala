package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Throwaway decomposition experiments for the optimization round —
  * never on a query path; deleted or inert when the round closes.
  */
object ProfScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)

    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) taskMs.addAndGet(e.taskMetrics.executorRunTime)
    })
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo; val m = i.taskMetrics
        stageLog.add(f"      stage ${m.executorRunTime / 1000.0}%6.2fs n=${i.numTasks}%-3d in=${m.inputMetrics.bytesRead / 1e6}%7.1fMB shR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%7.1fMB shW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%7.1fMB recs=${m.shuffleReadMetrics.recordsRead + m.inputMetrics.recordsRead}%-9d/${m.shuffleWriteMetrics.recordsWritten}%-9d gc=${m.jvmGCTime}%dms")
      }
    })
    def timed(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      spark.catalog.clearCache()
      graft.CacheScope.release()
      System.gc()
      org.apache.spark.graft.BusFlush.flush(spark.sparkContext)
      val t0w = System.nanoTime(); val t0t = taskMs.get
      stageLog.clear()
      df.write.format("noop").mode("overwrite").save()
      org.apache.spark.graft.BusFlush.flush(spark.sparkContext)
      println(f"[scratch] $label%-40s wall ${(System.nanoTime() - t0w) / 1e9}%6.2fs task ${(taskMs.get - t0t) / 1000.0}%6.1fs")
      if (sys.env.get("SCRATCH_STAGES").contains("1")) {
        import scala.jdk.CollectionConverters._
        stageLog.asScala.foreach(l => println("[scratch]" + l))
      }
    }

    val docs = Tables(spark, sfDir, "documents")
    def bandsN(parts: Int) = {
      val d = if (parts <= 1) docs else docs.repartition(parts)
      d.select(col("doc_id"),
          posexplode(call_function(GraftFunctions.BandSigsName,
            col("text"), lit(104), lit(13), lit(1))))
        .select(col("doc_id"), col("pos").as("band"), col("col").as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    def bands(rep: Boolean) = {
      val d = if (rep) docs.repartition(cpus.toInt) else docs
      d.select(col("doc_id"),
          posexplode(call_function(GraftFunctions.BandSigsName,
            col("text"), lit(104), lit(13), lit(1))))
        .select(col("doc_id"), col("pos").as("band"), col("col").as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    def cands(b: org.apache.spark.sql.DataFrame) =
      b.as("a").join(b.as("b"),
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
    def sigs(rep: Boolean) = {
      val d = if (rep) docs.repartition(cpus.toInt) else docs
      d.select(col("doc_id"),
          call_function(GraftFunctions.MinhashName, col("text"), lit(104)).as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    def scored(b: org.apache.spark.sql.DataFrame, sg: org.apache.spark.sql.DataFrame) =
      cands(b)
        .join(sg.select(col("doc_id"), col("sig").as("sig_a")),
          col("doc_a") === col("doc_id")).drop("doc_id")
        .join(sg.select(col("doc_id"), col("sig").as("sig_b")),
          col("doc_b") === col("doc_id")).drop("doc_id")
        .select(col("doc_a"), col("doc_b"),
          call_function(GraftFunctions.AgreeName, col("sig_a"), col("sig_b")).as("n_agree"))
        .select(col("doc_a"), col("doc_b"), col("n_agree"),
          round(col("n_agree").cast("double") / 104, 6).as("est_jaccard"))
        .filter(col("est_jaccard") >= 0.9)

    args.lift(1).getOrElse("dd8") match {
      case "dd8" =>
        for (i <- 1 to 2; n <- Seq(1, 4, 8, 16, 32)) {
          timed(s"r$i cands parts=$n")(cands(bandsN(n)))
        }
      case "gr1" =>
        import org.apache.spark.sql.expressions.Window
        def graph() = {
          val ev = Tables(spark, sfDir, "events")
            .select(col("user_id"), col("ts"), col("event_id"),
              get_json_object(col("props"), "$.k").cast("long").as("node"))
            .filter(col("node").isNotNull)
          val byTime = Window.partitionBy("user_id").orderBy("ts", "event_id")
          val edges = ev
            .withColumn("src", lag("node", 1).over(byTime))
            .filter(col("src").isNotNull)
            .select(col("src"), col("node").as("dst"))
            .groupBy("src", "dst").agg(count(lit(1)).as("w"))
          (ev.select("node").distinct(), edges)
        }
        def prUnrolled(sever: Boolean) = {
          val (nodes, edges) = graph()
          val Scale = 1000000000L
          val v0 = nodes.select(col("node").cast("long").as("node"))
          val v = if (sever) v0.localCheckpoint(true) else v0
          val outw = edges.groupBy("src").agg(sum("w").as("outw"))
          val e0 = edges.join(outw, "src")
            .select(col("src").cast("long").as("src"),
              col("dst").cast("long").as("dst"),
              col("w").cast("long").as("w"), col("outw").cast("long").as("outw"))
          val e = if (sever) e0.localCheckpoint(true)
            else e0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val n = v.count()
          val base = (Scale * 15 / 100) / n
          var ranks = v.withColumn("rank", lit(Scale / n))
          for (_ <- 0 until 5) {
            val contribs = e.join(ranks, e("src") === ranks("node"))
              .select(e("dst"), expr("(rank * w) div outw").as("c"))
              .groupBy("dst").agg(sum("c").as("c"))
            val next = v.join(contribs, v("node") === contribs("dst"), "left")
              .select(v("node"),
                (lit(base) + expr(s"(85 * coalesce(c, 0L)) div 100")).as("rank"))
            ranks = if (sever) next.localCheckpoint(true) else next
          }
          ranks.select(col("node"), col("rank").as("rank_fp")).orderBy("node")
        }
        def prStride(stride: Int, obsCount: Boolean) = {
          val (nodes, edges) = graph()
          val Scale = 1000000000L
          val v0 = nodes.select(col("node").cast("long").as("node"))
          val (v, n) = if (obsCount) {
            val obs = org.apache.spark.sql.Observation()
            val vv = v0.observe(obs, count(lit(1)).as("n")).localCheckpoint(true)
            (vv, obs.get("n").asInstanceOf[Long])
          } else {
            val vv = v0.localCheckpoint(true)
            (vv, vv.count())
          }
          val outw = edges.groupBy("src").agg(sum("w").as("outw"))
          val e = edges.join(outw, "src")
            .select(col("src").cast("long").as("src"),
              col("dst").cast("long").as("dst"),
              col("w").cast("long").as("w"), col("outw").cast("long").as("outw"))
            .localCheckpoint(true)
          val base = (Scale * 15 / 100) / n
          var ranks = v.withColumn("rank", lit(Scale / n))
          for (r <- 0 until 5) {
            val contribs = e.join(ranks, e("src") === ranks("node"))
              .select(e("dst"), expr("(rank * w) div outw").as("c"))
              .groupBy("dst").agg(sum("c").as("c"))
            val next = v.join(contribs, v("node") === contribs("dst"), "left")
              .select(v("node"),
                (lit(base) + expr(s"(85 * coalesce(c, 0L)) div 100")).as("rank"))
            ranks = if (r < 4 && (r % stride == stride - 1)) next.localCheckpoint(true) else next
          }
          ranks.select(col("node"), col("rank").as("rank_fp")).orderBy("node")
        }
        for (i <- 1 to 3) {
          timed(s"r$i pr sever-per-round (current)")(prUnrolled(true))
          timed(s"r$i pr stride2+obs")(prStride(2, true))
          timed(s"r$i pr stride5+obs (no mid ckpt)")(prStride(5, true))
        }
      case "jw" =>
        // microbench the kernel on real heads
        val heads = Tables(spark, sfDir, "documents")
          .select(substring(col("text"), 1, 80)).collect()
          .map(r => org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)))
        val rnd = new java.util.Random(7)
        val n = heads.length
        for (rep <- 1 to 3) {
          var sum = 0.0
          val t0 = System.nanoTime()
          var i = 0
          while (i < 1000000) {
            sum += graft.functions.JaroWinklerSimilarity.compute(
              heads(rnd.nextInt(n)), heads(rnd.nextInt(n)))
            i += 1
          }
          println(f"[scratch] jw rep$rep ${(System.nanoTime() - t0) / 1e6}%.0fms for 1M calls (sum=$sum%.1f)")
        }
        // pair stream without JW vs with JW
        val d = Tables(spark, sfDir, "documents").select(
          col("doc_id"), substring(col("text"), 1, 80).as("head"),
          col("lang"), (col("n_chars") / 20).cast("long").as("len_bucket"),
          split(col("text"), " ").getItem(0).as("w1"))
        val n2 = 16
        val a = d.repartition(n2).select(col("doc_id").as("doc_a"), col("head").as("head_a"),
          col("lang").as("lang_a"), col("len_bucket").as("lb_a"), col("w1"))
        val b = d.select(col("doc_id").as("doc_b"), col("head").as("head_b"),
          col("lang").as("lang_b"), col("len_bucket").as("lb_b"), col("w1"))
        def cand = a.join(b, a("w1") === b("w1") && col("doc_a") < col("doc_b"))
        for (i <- 1 to 2) {
          timed(s"r$i pairs only")(cand.select(col("doc_a"), col("doc_b")))
          timed(s"r$i pairs + features no jw")(cand.select(col("doc_a"), col("doc_b"),
            (col("lang_a") === col("lang_b")).as("f1"), (col("lb_a") === col("lb_b")).as("f2")))
          timed(s"r$i pairs + jw")(cand.select(col("doc_a"), col("doc_b"),
            round(call_function(GraftFunctions.JaroWinklerName, col("head_a"), col("head_b")), 6).as("sim")))
          timed(s"r$i pairs + jw + persist")({
            val f = cand.select(col("doc_a"), col("doc_b"),
              round(call_function(GraftFunctions.JaroWinklerName, col("head_a"), col("head_b")), 6).as("sim"))
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            f})
        }
      case other => sys.error(s"unknown experiment $other")
    }
    spark.stop()
  }
}
