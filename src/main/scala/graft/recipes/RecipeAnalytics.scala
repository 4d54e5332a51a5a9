package graft.recipes

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's 10 analytics queries (`/root/reference/README.md:334-519`)
  * over the actual recipe star schema — a user of the reference can point
  * these at the five tables and get the README's published numbers (the
  * RecipeAnalyticsSpec asserts exactly that against the golden CSVs).
  *
  * `graft.analytics.StarQueries` carries the same query shapes over the
  * large TPC-H-ish testdata for the oracle/bench harness; this module is
  * the domain-schema face. All dims here are broadcast-sized; the
  * interactions/ingredients facts are the scaling side, and every query
  * is a broadcast-join + partial-agg + top-k plan.
  *
  * Each function takes the star tables by name ("users", "recipes",
  * "ingredients", "steps", "interactions") as typed DataFrames.
  */
object RecipeAnalytics {

  type Tables = Map[String, DataFrame]

  /** Q1: top-5 most common ingredients (README.md:339-341). */
  def topIngredients(t: Tables, k: Int = 5): DataFrame =
    t("ingredients")
      .groupBy(col("name"))
      .agg(count(lit(1)).as("frequency"))
      .orderBy(desc("frequency"), asc("name"))
      .limit(k)

  /** Q2: global average prep time, positive only (README.md:361-363). */
  def avgPrepTime(t: Tables): DataFrame =
    t("recipes")
      .filter(col("prep_time_minutes") > 0)
      .agg(round(avg("prep_time_minutes"), 1).as("avg_time"))

  /** Q3: difficulty distribution (README.md:377-379). */
  def difficultyDistribution(t: Tables): DataFrame =
    t("recipes")
      .groupBy(col("difficulty"))
      .agg(count(lit(1)).as("count"))
      .orderBy("difficulty")

  /** Q4: liked-recipes avg prep vs global avg — two scalar subqueries
    * (README.md:394-399).
    */
  def likedVsGlobalPrep(t: Tables): DataFrame = {
    val globalAvg = t("recipes")
      .agg(round(avg("prep_time_minutes"), 1).as("global_avg"))
    val likedAvg = t("interactions").filter(col("type") === "like")
      .join(broadcast(t("recipes")), Seq("recipe_id"))
      .agg(round(avg("prep_time_minutes"), 1).as("liked_avg"))
    globalAvg.crossJoin(likedAvg)
  }

  /** Q5: most-viewed recipe, top-1 (README.md:411-415). */
  def topViewedRecipe(t: Tables): DataFrame =
    t("interactions").filter(col("type") === "view")
      .join(broadcast(t("recipes")), Seq("recipe_id"))
      .groupBy(col("title"))
      .agg(count(lit(1)).as("views"))
      .orderBy(desc("views"), asc("title"))
      .limit(1)

  /** Q6: ingredients of liked recipes, COUNT(interaction_id) non-null
    * semantics (README.md:428-432).
    */
  def likedIngredients(t: Tables, k: Int = 5): DataFrame =
    t("interactions").filter(col("type") === "like")
      .join(t("ingredients"), Seq("recipe_id"))
      .groupBy(col("name"))
      .agg(count(col("interaction_id")).as("likes"))
      .orderBy(desc("likes"), asc("name"))
      .limit(k)

  /** Q7: most active users leaderboard (README.md:450-453). */
  def activeUsers(t: Tables, k: Int = 3): DataFrame =
    t("interactions")
      .join(broadcast(t("users")), Seq("user_id"))
      .groupBy(col("username"))
      .agg(count(lit(1)).as("actions"))
      .orderBy(desc("actions"), asc("username"))
      .limit(k)

  /** Q8: most complex recipe by step count, parent⋈bridge top-1
    * (README.md:477-480).
    */
  def mostComplexRecipe(t: Tables): DataFrame =
    t("recipes")
      .join(t("steps"), Seq("recipe_id"))
      .groupBy(col("title"))
      .agg(count(col("step_number")).as("steps"))
      .orderBy(desc("steps"), asc("title"))
      .limit(1)

  /** Q9: average ingredient count per recipe — nested aggregation
    * (README.md:491-492).
    */
  def avgIngredientCount(t: Tables): DataFrame =
    t("ingredients")
      .groupBy(col("recipe_id"))
      .agg(count(lit(1)).as("cnt"))
      .agg(round(avg("cnt"), 1).as("avg_ingredients"))

  /** Q10: views by difficulty (README.md:505-509). */
  def viewsByDifficulty(t: Tables): DataFrame =
    t("interactions").filter(col("type") === "view")
      .join(broadcast(t("recipes")), Seq("recipe_id"))
      .groupBy(col("difficulty"))
      .agg(count(lit(1)).as("views"))
      .orderBy(desc("views"), asc("difficulty"))

  val all: Map[String, Tables => DataFrame] = Map(
    "ra1_top_ingredients" -> (topIngredients(_)),
    "ra2_avg_prep_time" -> avgPrepTime,
    "ra3_difficulty_distribution" -> difficultyDistribution,
    "ra4_liked_vs_global_prep" -> likedVsGlobalPrep,
    "ra5_top_viewed_recipe" -> topViewedRecipe,
    "ra6_liked_ingredients" -> (likedIngredients(_)),
    "ra7_active_users" -> (activeUsers(_)),
    "ra8_most_complex_recipe" -> mostComplexRecipe,
    "ra9_avg_ingredient_count" -> avgIngredientCount,
    "ra10_views_by_difficulty" -> viewsByDifficulty)
}
