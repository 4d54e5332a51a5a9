package graft.recipes

import graft.etl.Validate
import graft.etl.Validate.Rule
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full reproduction of the reference's data-quality validator
  * (`/root/reference/src/data_validation.py:49-196`) over the five
  * all-string CSV tables, producing the exact golden
  * `validation_report.csv` semantics: table names, rule order, message
  * text (including interpolated offending values), the
  * recipe_id→user_id→interaction_id→"N/A" record-ID coalesce, and the
  * Users→Recipes→Interactions→Ingredients→Steps table order.
  *
  * Inputs are the all-string DataFrames `CsvIO.readStrings` yields —
  * `csv.DictReader` hands the reference strings, where "missing" means
  * empty; Spark reads empty CSV fields as null, so null-checks here cover
  * both.
  *
  * Referential checks (`user_id in user_ids` set membership,
  * data_validation.py:60-63) become broadcast left-join null-flags: the
  * dim side is distinct keys only, so at 100 TB the fact side streams
  * map-side with no shuffle.
  */
object RecipeValidation {

  private val ValidDifficulties = Seq("Easy", "Medium", "Hard")
  private val ValidInteractionTypes = Seq("view", "like", "cook_attempt")

  /** Python's `row.get(a) or row.get(b) or … or "N/A"` — empty string is
    * falsy, so it coalesces like SQL null (data_validation.py:78-83).
    * Columns the table lacks are skipped, as dict.get returns None.
    */
  private def recordId(df: DataFrame): Column = {
    val candidates = Seq("recipe_id", "user_id", "interaction_id")
      .filter(df.columns.contains)
      .map(c => when(col(c) =!= "", col(c)))
    coalesce(candidates :+ lit("N/A"): _*)
  }

  private def missing(f: String): Rule =
    Rule(col(f).isNotNull && col(f) =!= "", s"Missing $f")

  /** `float(x) <= 0` try/except pair (data_validation.py:109-113): exactly
    * one of the two rules can fire. DictReader always yields "" (never a
    * missing key) for these columns and `float('')` raises, so a
    * null/empty field fires the non-numeric message — Spark reads empty
    * CSV fields as null, hence the bare `parsed.isNotNull` check covers
    * the reference's empty-string path too.
    */
  private def numericPair(f: String, invalidMsg: String, nonNumericMsg: String): Seq[Rule] = {
    val parsed = expr(s"try_cast($f AS DOUBLE)")
    Seq(
      Rule(parsed.isNull || parsed > 0, invalidMsg), // fires only when numeric
      Rule(parsed.isNotNull, nonNumericMsg))
  }

  /** users checks (data_validation.py:122-129). Email must match at the
    * START of the string (Python `re.match`), with no end anchor.
    */
  def usersReport(users: DataFrame): DataFrame =
    Validate.report(
      users, "Users", recordId(users),
      Seq("user_id", "username", "email").map(missing) :+
        Rule(
          col("email").isNull || col("email") === "" ||
            col("email").rlike("^[^@]+@[^@]+\\.[^@]+"),
          "Invalid email format"))

  /** recipes checks (data_validation.py:104-120): required fields, numeric
    * prep time, difficulty enum (message interpolates the offending
    * value), and the two existence semi-joins (must have ≥1 ingredient and
    * ≥1 step).
    */
  def recipesReport(recipes: DataFrame, ingredients: DataFrame, steps: DataFrame): DataFrame = {
    val withIng = ingredients.select(col("recipe_id").as("rid_ing")).distinct()
    val withSteps = steps.select(col("recipe_id").as("rid_step")).distinct()
    val joined = recipes
      .join(broadcast(withIng), col("recipe_id") === col("rid_ing"), "left")
      .join(broadcast(withSteps), col("recipe_id") === col("rid_step"), "left")
    Validate.report(
      joined, "Recipes", recordId(recipes),
      Seq("recipe_id", "title", "prep_time_minutes", "difficulty").map(missing) ++
        numericPair("prep_time_minutes", "Invalid prep_time", "Non-numeric prep_time") ++
        Seq(
          Rule(
            col("difficulty").isin(ValidDifficulties: _*),
            concat(lit("Invalid difficulty: "), coalesce(col("difficulty"), lit("")))),
          Rule(col("rid_ing").isNotNull, "No ingredients linked"),
          Rule(col("rid_step").isNotNull, "No steps linked")))
  }

  /** interactions checks (data_validation.py:131-142). */
  def interactionsReport(interactions: DataFrame, users: DataFrame, recipes: DataFrame): DataFrame = {
    val uids = users.select(col("user_id").as("uid_ok")).distinct()
    val rids = recipes.select(col("recipe_id").as("rid_ok")).distinct()
    val joined = interactions
      .join(broadcast(uids), col("user_id") === col("uid_ok"), "left")
      .join(broadcast(rids), col("recipe_id") === col("rid_ok"), "left")
    Validate.report(
      joined, "Interactions", recordId(interactions),
      Seq("interaction_id", "user_id", "recipe_id", "type", "timestamp").map(missing) ++
        Seq(
          Rule(col("uid_ok").isNotNull, "Orphaned User ID"),
          Rule(col("rid_ok").isNotNull, "Orphaned Recipe ID"),
          Rule(
            col("type").isin(ValidInteractionTypes: _*),
            concat(lit("Invalid type: "), coalesce(col("type"), lit(""))))))
  }

  /** ingredients checks (data_validation.py:144-156). */
  def ingredientsReport(ingredients: DataFrame, recipes: DataFrame): DataFrame = {
    val rids = recipes.select(col("recipe_id").as("rid_ok")).distinct()
    val joined = ingredients.join(broadcast(rids), col("recipe_id") === col("rid_ok"), "left")
    Validate.report(
      joined, "Ingredients", recordId(ingredients),
      Seq("recipe_id", "name", "quantity").map(missing) ++
        Seq(Rule(col("rid_ok").isNotNull, "Links to non-existent recipe")) ++
        numericPair("quantity", "Zero/Negative quantity", "Non-numeric quantity"))
  }

  /** steps checks (data_validation.py:158-166). */
  def stepsReport(steps: DataFrame, recipes: DataFrame): DataFrame = {
    val rids = recipes.select(col("recipe_id").as("rid_ok")).distinct()
    val joined = steps.join(broadcast(rids), col("recipe_id") === col("rid_ok"), "left")
    Validate.report(
      joined, "Steps", recordId(steps),
      Seq("recipe_id", "step_number", "instruction").map(missing) :+
        Rule(col("rid_ok").isNotNull, "Links to non-existent recipe"))
  }

  /** The whole run, in the reference's table order
    * (data_validation.py:169-174). Add `Validate.withTimestamp` for the
    * report file's `Validated_At` column.
    */
  def validateAll(tables: Map[String, DataFrame]): DataFrame = {
    val (u, r, ing, st, ia) = (
      tables("users"), tables("recipes"), tables("ingredients"),
      tables("steps"), tables("interactions"))
    usersReport(u)
      .unionAll(recipesReport(r, ing, st))
      .unionAll(interactionsReport(ia, u, r))
      .unionAll(ingredientsReport(ing, r))
      .unionAll(stepsReport(st, r))
  }
}
