package graft.recipes

import graft.Q
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-oracle verification of the reference's PUBLISHED analytics
  * numbers: both engines read the reference's own golden CSV exports
  * (the CSVs under `/root/reference/output/`, the data behind README.md §6 — avg
  * prep 65.3, "Cheesy Cake" 6 views, Chicken Gravy 8 steps, …) and run
  * the same 10 queries. Where `ra1`–`ra10` prove the full
  * generator→normalize→analytics pipeline end-to-end on Seed-derived
  * tables, these prove the published numbers themselves — the Spark side
  * is exactly the "a reference user points the library at their CSV
  * exports" path (typed CSV read + RecipeAnalytics).
  *
  * `bench = false`: constant-size input (20 recipes), no scaling signal.
  */
object RecipeGoldenQueries {

  /** The harness default: the reference's own CSV exports. */
  val DefaultGoldenDir = "/root/reference/output"

  /** Load the five CSV-export tables from ANY directory — the
    * library-facing entry point: a user points this at their own
    * `users.csv`/`recipe.csv`/… exports and feeds the result to any
    * [[RecipeAnalytics]] query. The registry entries below use the
    * default (the published golden files) so the driver oracle checks
    * the published numbers.
    */
  def tables(s: SparkSession,
      dir: String = DefaultGoldenDir): RecipeAnalytics.Tables = Map(
    "users" -> CsvIO.readTyped(s, s"$dir/users.csv", Schemas.usersTable),
    "recipes" -> CsvIO.readTyped(s, s"$dir/recipe.csv", Schemas.recipesTable),
    "ingredients" -> CsvIO.readTyped(s, s"$dir/ingredients.csv", Schemas.ingredientsTable),
    "steps" -> CsvIO.readTyped(s, s"$dir/steps.csv", Schemas.stepsTable),
    "interactions" -> CsvIO.readTyped(s, s"$dir/interactions.csv", Schemas.interactionsTable))

  // DuckDB reads the same files; only the queried columns matter, so
  // auto-inferred types (VARCHAR names/titles, BIGINT prep minutes) align
  // with the Spark schema for every expression used here.
  private def csv(name: String): String =
    s"read_csv_auto('$DefaultGoldenDir/$name.csv', header=true)"

  private def q(name: String)(spark: RecipeAnalytics.Tables => DataFrame,
      oracle: String): Q =
    Q(name, (s, _) => spark(tables(s)), Some(oracle), bench = false)

  val all: Seq[Q] = Seq(
    q("rg1_top_ingredients")(RecipeAnalytics.topIngredients(_),
      s"""SELECT name, count(*) AS frequency FROM ${csv("ingredients")}
         |GROUP BY name ORDER BY frequency DESC, name LIMIT 5""".stripMargin),

    q("rg2_avg_prep_time")(RecipeAnalytics.avgPrepTime,
      s"""SELECT round(avg(prep_time_minutes), 1) AS avg_time
         |FROM ${csv("recipe")} WHERE prep_time_minutes > 0""".stripMargin),

    q("rg3_difficulty_distribution")(RecipeAnalytics.difficultyDistribution,
      s"""SELECT difficulty, count(*) AS "count" FROM ${csv("recipe")}
         |GROUP BY difficulty ORDER BY difficulty""".stripMargin),

    q("rg4_liked_vs_global_prep")(RecipeAnalytics.likedVsGlobalPrep,
      s"""SELECT g.global_avg, l.liked_avg FROM
         |  (SELECT round(avg(prep_time_minutes), 1) AS global_avg FROM ${csv("recipe")}) g,
         |  (SELECT round(avg(prep_time_minutes), 1) AS liked_avg
         |   FROM ${csv("interactions")} ia JOIN ${csv("recipe")} r USING (recipe_id)
         |   WHERE ia.type = 'like') l""".stripMargin),

    q("rg5_top_viewed_recipe")(RecipeAnalytics.topViewedRecipe,
      s"""SELECT title, count(*) AS views
         |FROM ${csv("interactions")} ia JOIN ${csv("recipe")} r USING (recipe_id)
         |WHERE ia.type = 'view'
         |GROUP BY title ORDER BY views DESC, title LIMIT 1""".stripMargin),

    q("rg6_liked_ingredients")(RecipeAnalytics.likedIngredients(_),
      s"""SELECT name, count(interaction_id) AS likes
         |FROM ${csv("interactions")} ia JOIN ${csv("ingredients")} ing USING (recipe_id)
         |WHERE ia.type = 'like'
         |GROUP BY name ORDER BY likes DESC, name LIMIT 5""".stripMargin),

    q("rg7_active_users")(RecipeAnalytics.activeUsers(_),
      s"""SELECT username, count(*) AS actions
         |FROM ${csv("interactions")} ia JOIN ${csv("users")} u USING (user_id)
         |GROUP BY username ORDER BY actions DESC, username LIMIT 3""".stripMargin),

    q("rg8_most_complex_recipe")(RecipeAnalytics.mostComplexRecipe,
      s"""SELECT title, count(step_number) AS steps
         |FROM ${csv("recipe")} r JOIN ${csv("steps")} st USING (recipe_id)
         |GROUP BY title ORDER BY steps DESC, title LIMIT 1""".stripMargin),

    q("rg9_avg_ingredient_count")(RecipeAnalytics.avgIngredientCount,
      s"""SELECT round(avg(cnt), 1) AS avg_ingredients FROM
         |  (SELECT recipe_id, count(*) AS cnt FROM ${csv("ingredients")}
         |   GROUP BY recipe_id)""".stripMargin),

    q("rg10_views_by_difficulty")(RecipeAnalytics.viewsByDifficulty,
      s"""SELECT difficulty, count(*) AS views
         |FROM ${csv("interactions")} ia JOIN ${csv("recipe")} r USING (recipe_id)
         |WHERE ia.type = 'view'
         |GROUP BY difficulty ORDER BY views DESC, difficulty""".stripMargin)
  )
}
