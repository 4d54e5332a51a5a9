package graft.recipes

import org.apache.spark.sql.types._

/** Declared (never inferred) schemas for the recipe-analytics pipeline.
  *
  * Source documents mirror the reference's Firestore collections
  * (`/root/reference/schema/recipe.json:1-84`, `schema/user.json:1-7`,
  * `schema/user_interaction.json:1-7`); star-schema tables mirror the exact
  * CSV column lists hard-coded at `/root/reference/src/etl_pipeline.py:103-124`.
  * Schema rigidity is a stated design property of the reference
  * (`README.md:527`), so these StructTypes are the contract everything else
  * compiles against.
  */
object Schemas {

  // ---- source document collections ----

  /** `users` documents. `role` exists in the source schema
    * (schema/user.json:5) but is dropped by the ETL projection.
    */
  val userDoc: StructType = StructType(Seq(
    StructField("user_id", StringType),
    StructField("username", StringType),
    StructField("email", StringType),
    StructField("role", StringType),
    StructField("created_at", TimestampType)))

  /** Nested ingredient element (schema/recipe.json:9-70). Quantity is
    * fractional (e.g. 0.5 at schema/recipe.json:43) — double, not int.
    */
  val ingredientStruct: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("quantity", DoubleType),
    StructField("unit", StringType)))

  /** `recipes` documents with the two nested arrays. `servings`
    * (schema/recipe.json:6) is dropped by the ETL.
    */
  val recipeDoc: StructType = StructType(Seq(
    StructField("recipe_id", StringType),
    StructField("title", StringType),
    StructField("author_id", StringType),
    StructField("prep_time_minutes", IntegerType),
    StructField("servings", IntegerType),
    StructField("difficulty", StringType),
    StructField("created_at", TimestampType),
    StructField("ingredients", ArrayType(ingredientStruct)),
    StructField("steps", ArrayType(StringType))))

  /** `interactions` documents. `rating` is nullable (~70% absent,
    * src/insert_recipe.py:122-124).
    */
  val interactionDoc: StructType = StructType(Seq(
    StructField("interaction_id", StringType),
    StructField("user_id", StringType),
    StructField("recipe_id", StringType),
    StructField("type", StringType),
    StructField("rating", IntegerType),
    StructField("timestamp", TimestampType)))

  // ---- star-schema target tables (exact CSV headers) ----

  val usersTable: StructType = StructType(Seq(
    StructField("user_id", StringType),
    StructField("username", StringType),
    StructField("email", StringType),
    StructField("created_at", TimestampType)))

  val recipesTable: StructType = StructType(Seq(
    StructField("recipe_id", StringType),
    StructField("title", StringType),
    StructField("author_id", StringType),
    StructField("prep_time_minutes", IntegerType),
    StructField("difficulty", StringType),
    StructField("created_at", TimestampType)))

  val ingredientsTable: StructType = StructType(Seq(
    StructField("recipe_id", StringType),
    StructField("name", StringType),
    StructField("quantity", DoubleType),
    StructField("unit", StringType)))

  val stepsTable: StructType = StructType(Seq(
    StructField("recipe_id", StringType),
    StructField("step_number", IntegerType),
    StructField("instruction", StringType)))

  val interactionsTable: StructType = StructType(Seq(
    StructField("interaction_id", StringType),
    StructField("user_id", StringType),
    StructField("recipe_id", StringType),
    StructField("type", StringType),
    StructField("rating", IntegerType),
    StructField("timestamp", TimestampType)))

  /** Star-table schemas keyed by warehouse table name (the names the
    * filename router produces, bigquery_loader_function/main.py:25-27).
    */
  val starTables: Map[String, StructType] = Map(
    "users" -> usersTable,
    "recipes" -> recipesTable,
    "ingredients" -> ingredientsTable,
    "steps" -> stepsTable,
    "interactions" -> interactionsTable)
}
