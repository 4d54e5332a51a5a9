package graft.pipeline

import graft.Tables
import graft.operators.{Decontamination, Dedup, Sampling}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The composed training-corpus pipeline — every hygiene operator the
  * library provides, in the order a 100 TB pretraining ingest runs them:
  *
  *   quality filter → language filter → exact dedup → near-dedup
  *   (MinHash/LSH canonical reps) → deterministic split → test-set
  *   decontamination → partitioned lake write
  *
  * This is the training-data analogue of `recipes.RecipeEtl` (the
  * reference's composed ETL): one callable that strings the individually
  * oracle-verified operators into an executable product, with a row
  * accounting [[Report]] so every drop is attributable.
  *
  * Order matters for cost at scale: the per-row filters (quality, lang)
  * run FIRST on the scan — zero shuffle, pushed projections — so the
  * shuffling stages (dedup groupBy, LSH banding, gram joins) see only
  * surviving rows. Filters compose per-row; dedup keys are 8-byte
  * hashes; the split is a deterministic per-row hash (re-runnable,
  * backfill-safe); decontamination drops test docs sharing any 5-gram
  * with train. The lake is written partitioned by split so every
  * downstream trainer/eval scan partition-prunes.
  */
object CorpusPipeline {

  final case class Report(
      input: Long,
      afterQuality: Long,
      afterLang: Long,
      afterExact: Long,
      afterNear: Long,
      train: Long,
      validation: Long,
      test: Long,
      testClean: Long) {
    def json: String =
      s"""{"input":$input,"after_quality":$afterQuality,"after_lang":$afterLang,""" +
        s""""after_exact":$afterExact,"after_near":$afterNear,"train":$train,""" +
        s""""val":$validation,"test":$test,"test_clean":$testClean}"""
  }

  private val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** tx2's keep-predicate: ≥ 20 tokens and ≤ 25% stopwords. */
  private def qualityKeep(df: DataFrame): DataFrame = {
    val sw = Stopwords.map(w => s"'$w'").mkString(", ")
    val toks = size(split(col("text"), " "))
    val stops = expr(s"size(filter(split(text, ' '), t -> t IN ($sw)))")
    df.filter(toks >= 20 && stops.cast("double") / toks <= 0.25)
  }

  def run(spark: SparkSession, sfDir: String, outDir: String): Report = {
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val input = docs.count()

    val quality = qualityKeep(docs)
    val afterQuality = quality.count()

    val english = quality.filter(col("lang") === "en")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val afterLang = english.count()

    // exact dedup: one row per content fingerprint, smallest id canonical
    val exact = english
      .withColumn("fp", md5(col("text")))
      .withColumn("keep_id", min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      .filter(col("doc_id") === col("keep_id"))
      .drop("fp", "keep_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val afterExact = exact.count()

    // near-dedup: fixed-point LSH clustering over the SURVIVING frame,
    // keep each cluster's canonical representative
    val reps = Dedup.clusterFrame(exact)
      .filter(col("is_canonical")).select("doc_id")
    val near = exact.join(reps, Seq("doc_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val afterNear = near.count()

    val split = Sampling.hashSplit(near, col("doc_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val Seq(train, validation, test) = Seq("train", "val", "test")
      .map(s => split.filter(col("split") === s).count())

    // decontamination: drop test docs sharing any 5-gram with train
    val trainGrams = Decontamination
      .gramsOf(split.filter(col("split") === "train").select("doc_id", "text"))
      .select("g").distinct()
    val dirtyTest = Decontamination
      .gramsOf(split.filter(col("split") === "test").select("doc_id", "text"))
      .join(trainGrams, Seq("g"), "left_semi")
      .select("doc_id").distinct()
    val clean = split.join(dirtyTest, Seq("doc_id"), "left_anti")
    val testClean = clean.filter(col("split") === "test").count()

    clean.write.mode("overwrite")
      .option("compression", "zstd")
      .partitionBy("split")
      .parquet(outDir)

    Seq(english, exact, near, split).foreach(_.unpersist())
    Report(input, afterQuality, afterLang, afterExact, afterNear,
      train, validation, test, testClean)
  }

  /** CLI: sfDir outDir → one JSON report line. */
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(run(spark, sfDir, outDir).json)
    spark.stop()
  }
}
