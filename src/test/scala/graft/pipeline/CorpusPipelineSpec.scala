package graft.pipeline

import graft.{SparkSpec, TestSpark}
import graft.operators.Decontamination
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** End-to-end corpus pipeline: row accounting is monotone and complete,
  * the lake layout partition-prunes, dedup invariants hold in the
  * written output, and the published test split is actually gram-clean
  * against the published train split.
  */
class CorpusPipelineSpec extends SparkSpec {

  private lazy val out = Files.createTempDirectory("corpus-lake").toString + "/lake"
  private lazy val report = CorpusPipeline.run(spark, TestSpark.Sf0001, out)

  test("row accounting: monotone drops, splits partition the survivors") {
    val r = report
    assert(r.input >= r.afterQuality)
    assert(r.afterQuality >= r.afterLang)
    assert(r.afterLang >= r.afterExact)
    assert(r.afterExact >= r.afterNear)
    assert(r.afterNear > 0)
    assert(r.train + r.validation + r.test === r.afterNear)
    assert(r.testClean <= r.test)
  }

  test("lake: partitioned by split, pruned scans, dedup invariants hold") {
    report // ensure the pipeline ran
    val lake = spark.read.parquet(out)
    assert(lake.count() === report.train + report.validation + report.testClean)

    val plan = lake.filter(col("split") === "train")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(split"), plan.take(600))

    // exact-dedup survived the write: every text is unique
    assert(lake.select("text").distinct().count() === lake.count())
    // splits are disjoint by doc_id
    assert(lake.select("doc_id").distinct().count() === lake.count())
  }

  test("published test split shares no 5-gram with published train") {
    report
    val lake = spark.read.parquet(out)
    val trainGrams = Decontamination
      .gramsOf(lake.filter(col("split") === "train").select("doc_id", "text"))
      .select("g").distinct()
    val overlap = Decontamination
      .gramsOf(lake.filter(col("split") === "test").select("doc_id", "text"))
      .join(trainGrams, Seq("g"), "left_semi")
      .count()
    assert(overlap === 0L)
  }
}
