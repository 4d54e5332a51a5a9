package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Event-driven warehouse load (SURVEY.md §2.9 / §3.3): the reference's
  * GCS-event-triggered BigQuery loader
  * (`/root/reference/bigquery_loader_function/main.py:5-52`) re-expressed
  * as a Structured Streaming file source with `Trigger.AvailableNow` and a
  * `foreachBatch` full overwrite — WRITE_TRUNCATE semantics: every new
  * file version replaces the whole table.
  *
  * Scale notes: the file source tracks processed files in the checkpoint
  * (exactly-once per file); the overwrite is an atomic directory swap on
  * the warehouse path. At 100 TB you would switch `mode("overwrite")` to
  * partition-overwrite or MERGE, but truncate-reload is the reference's
  * contract. Routing state is one filename column — no shuffle anywhere.
  */
object IncrementalLoad {

  /** Post-load verification ledger: warehouse path → rows counted by
    * reading the table BACK after the overwrite — the reference loader's
    * `get_table().num_rows` post-check
    * (bigquery_loader_function/main.py:47-48). Read-back, not
    * `batch.count()`: the point is to verify what actually landed.
    */
  private val postLoadCounts =
    new java.util.concurrent.ConcurrentHashMap[String, Long]()

  /** Rows the last completed load left at `warehousePath` (read back
    * post-overwrite), if a load ran in this session.
    */
  def lastLoadedRowCount(warehousePath: String): Option[Long] =
    Option(postLoadCounts.get(warehousePath))

  /** One (warehouse_path, num_rows) row per table loaded this session —
    * the report surface for callers that want the reference's num_rows
    * check as a frame.
    */
  def loadSummary(spark: SparkSession): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      postLoadCounts.asScala.toSeq.sortBy(_._1))
      .toDF("warehouse_path", "num_rows")
  }

  /** P5: process only `backups/&#42;.csv` object keys
    * (bigquery_loader_function/main.py:20-22).
    */
  def isLoadable(fileName: Column): Column =
    fileName.contains("/backups/") && fileName.endsWith(".csv")

  /** P6/F13: object key → warehouse table name — basename, strip the
    * `.csv` suffix, and apply the `recipe`→`recipes` rename
    * (bigquery_loader_function/main.py:25-27).
    */
  def tableNameFor(fileName: Column): Column = {
    val base = regexp_extract(fileName, "([^/]+)\\.csv$", 1)
    when(base === "recipe", "recipes").otherwise(base)
  }

  /** One truncate-reload stream for one table: watch
    * `landingDir/backups/<csvName>`, and on every new file version
    * replace `warehousePath` wholesale.
    *
    * Mirrors the reference's one-invocation-per-object-event shape; the
    * filename predicate (P5) is applied as a stream filter over
    * `input_file_name()` exactly like the reference guard.
    */
  def truncateReloadStream(
      spark: SparkSession,
      landingDir: String,
      csvName: String,
      schema: StructType,
      warehousePath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val in = spark.readStream
      .schema(schema)
      .option("header", true)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSSxxx")
      .option("maxFilesPerTrigger", 1) // one load job per file event
      .option("pathGlobFilter", csvName) // route: only this table's file
      .csv(s"$landingDir/backups/")
      .withColumn("_file", input_file_name())
      .filter(isLoadable(col("_file")))
      .drop("_file")
    in.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // WRITE_TRUNCATE: full refresh, exactly like the reference's
          // BigQuery load_job write_disposition.
          batch.write.mode("overwrite").parquet(warehousePath)
          // post-load verification: read the table back and count, the
          // reference's num_rows check (main.py:47-48)
          val n = batch.sparkSession.read.parquet(warehousePath).count()
          postLoadCounts.put(warehousePath, n)
          System.err.println(s"[load] batch=$batchId $warehousePath num_rows=$n")
        }
      }
      .start()
  }

  /** Run the available-now load for every star table and block until all
    * pending file events are processed (the batch analogue of the
    * always-on event-driven deployment).
    */
  def loadAllAvailableNow(
      spark: SparkSession,
      landingDir: String,
      warehouseDir: String,
      checkpointRoot: String): Unit = {
    import graft.recipes.Schemas
    // reference CSV basenames: recipe.csv feeds the `recipes` table
    val files = Map(
      "users.csv" -> "users", "recipe.csv" -> "recipes",
      "ingredients.csv" -> "ingredients", "steps.csv" -> "steps",
      "interactions.csv" -> "interactions")
    val queries = files.map { case (csvName, table) =>
      truncateReloadStream(
        spark, landingDir, csvName,
        Schemas.starTables(table),
        s"$warehouseDir/$table",
        s"$checkpointRoot/$table")
    }
    queries.foreach(_.awaitTermination())
  }
}
