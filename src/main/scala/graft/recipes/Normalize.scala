package graft.recipes

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The core document→star normalization (reference
  * `/root/reference/src/etl_pipeline.py:37-124`): three document
  * collections in, five relational tables out.
  *
  * Pure `DataFrame => DataFrame` transforms — sinks (CSV/Parquet,
  * streaming foreachBatch) are kept separate (CsvIO / IncrementalLoad) so
  * the same transform serves the batch ETL, the serverless path, and the
  * event-driven reload.
  *
  * Scale notes: every output is a narrow projection or a generator-explode
  * of its input — no joins, no aggregation, no shuffle anywhere; the whole
  * normalization runs at scan speed and parallelizes per input split.
  * Catalyst prunes the nested schema: reading `ingredients` out of the
  * document only materializes that array, not `steps`.
  */
object Normalize {

  /** users: project 4 fields, dropping `role`
    * (src/etl_pipeline.py:44-53).
    */
  def users(docs: DataFrame): DataFrame =
    docs.select(col("user_id"), col("username"), col("email"), col("created_at"))

  /** recipes: project 6 scalar fields, dropping `servings` and the nested
    * arrays (src/etl_pipeline.py:60-68).
    */
  def recipes(docs: DataFrame): DataFrame =
    docs.select(
      col("recipe_id"), col("title"), col("author_id"),
      col("prep_time_minutes"), col("difficulty"), col("created_at"))

  /** ingredients: one row per element of the nested array, parent key
    * carried, struct fields flattened (src/etl_pipeline.py:71-79).
    */
  def ingredients(docs: DataFrame): DataFrame =
    docs.select(col("recipe_id"), explode(col("ingredients")).as("ing"))
      .select(
        col("recipe_id"),
        col("ing.name").as("name"),
        col("ing.quantity").as("quantity"),
        col("ing.unit").as("unit"))

  /** steps: one row per step string with a generated 1-based ordinal
    * preserving array order (src/etl_pipeline.py:81-84).
    */
  def steps(docs: DataFrame): DataFrame =
    docs.select(col("recipe_id"), posexplode(col("steps")))
      .select(
        col("recipe_id"),
        (col("pos") + 1).cast("int").as("step_number"),
        col("col").as("instruction"))

  /** interactions: 6 fields; `rating` stays a nullable int — the
    * empty-string default of the reference (src/etl_pipeline.py:95) is a
    * CSV-serialization concern handled at the sink (CsvIO writes null as
    * "").
    */
  def interactions(docs: DataFrame): DataFrame =
    docs.select(
      col("interaction_id"), col("user_id"), col("recipe_id"),
      col("type"), col("rating"), col("timestamp"))

  /** The full ETL: all five star tables from the three collections. */
  def normalize(
      userDocs: DataFrame,
      recipeDocs: DataFrame,
      interactionDocs: DataFrame): Map[String, DataFrame] = Map(
    "users" -> users(userDocs),
    "recipes" -> recipes(recipeDocs),
    "ingredients" -> ingredients(recipeDocs),
    "steps" -> steps(recipeDocs),
    "interactions" -> interactions(interactionDocs))

  /** Read a document collection from JSONL with its declared schema (the
    * Firestore-collection scan of src/etl_pipeline.py:28-32 — at scale,
    * point this at partitioned JSON/Parquet instead).
    */
  def readDocs(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .json(path)
}
