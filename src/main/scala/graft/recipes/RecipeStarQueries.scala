package graft.recipes

import graft.Q
import org.apache.spark.sql.SparkSession

/** Driver-oracle registration of the reference's 10 analytics queries
  * (`/root/reference/README.md:334-519`) over the ACTUAL recipe star
  * schema — not just their TPC-H-shaped twins in StarQueries.
  *
  * Both engines derive the same five star tables deterministically from
  * nothing but `range()` and md5 math: the Spark side runs
  * `Seed.seedDocuments` (11 users / 20 recipes / 50 interactions, the
  * reference's golden row counts) through the real
  * `Normalize.normalize` document→star ETL, and each DuckDB oracle
  * rebuilds the identical tables in SQL CTEs via `Seed.hSql`/`pickSql`
  * (the same md5-derived pseudo-randomness `sg1`/`sg2` already prove
  * portable). So the driver — not just RecipeAnalyticsSpec — verifies
  * the reference's own queries on the reference's own schema, ends to
  * ends: generator → normalization → analytics.
  *
  * `bench = false`: the seed corpus is constant-size (independent of
  * sfDir), so timing these adds noise, not scaling signal — the same
  * query shapes are benchmarked at scale as q1–q10.
  */
object RecipeStarQueries {

  import Seed._

  private def tables(s: SparkSession): RecipeAnalytics.Tables = {
    val (u, r, ia) = Seed.seedDocuments(s)
    Normalize.normalize(u, r, ia)
  }

  // ---- DuckDB CTEs mirroring Seed + Normalize (columns each query needs) ----

  private val synRange = "(SELECT range AS i FROM range(19))"

  /** recipes: flagship + 19 synthetic (Seed.recipes → Normalize.recipes). */
  private val rcpSql =
    s"""rcp AS (
       |  SELECT 'rec_001_saurav_chicken_gravy' AS recipe_id,
       |         'Chicken Gravy for 2 People' AS title,
       |         35 AS prep_time_minutes, 'Medium' AS difficulty
       |  UNION ALL
       |  SELECT printf('rec_%03d_synthetic', CAST(i + 2 AS INT)),
       |         ${pickSql(Adjectives, "adj", "i")} || ' ' || ${pickSql(FoodTypes, "food", "i")},
       |         CAST(${hSql("prep", "i")} % 111 + 10 AS INT),
       |         ${pickSql(Difficulties, "diff", "i")}
       |  FROM $synRange)""".stripMargin

  /** ingredients: 12 flagship + per-recipe pool-sampled names
    * (Normalize.ingredients explode).
    */
  private val ingSql = {
    val flagship = FlagshipIngredients
      .map { case (n, _, _) => s"('${n.replace("'", "''")}')" }.mkString(", ")
    s"""ing AS (
       |  SELECT 'rec_001_saurav_chicken_gravy' AS recipe_id, name
       |  FROM (VALUES $flagship) t(name)
       |  UNION ALL
       |  SELECT printf('rec_%03d_synthetic', CAST(i + 2 AS INT)) AS recipe_id,
       |         ${pickSql(IngredientPool, "iname", "i*100+k")} AS name
       |  FROM (SELECT i, unnest(generate_series(1, CAST(${hSql("ning5", "i")} % 6 + 3 AS INT))) AS k
       |        FROM $synRange))""".stripMargin
  }

  /** steps: 8 flagship + 3 boilerplate per synthetic recipe
    * (Normalize.steps posexplode, 1-based).
    */
  private val stpSql =
    s"""stp AS (
       |  SELECT 'rec_001_saurav_chicken_gravy' AS recipe_id,
       |         unnest(generate_series(1, ${FlagshipSteps.size})) AS step_number
       |  UNION ALL
       |  SELECT printf('rec_%03d_synthetic', CAST(i + 2 AS INT)), unnest(generate_series(1, 3))
       |  FROM $synRange)""".stripMargin

  /** users: Saurav + 10 synthetic (Seed.users → Normalize.users). */
  private val usrSql =
    s"""usr AS (
       |  SELECT 'user_saurav_001' AS user_id, 'Saurav Nayak' AS username
       |  UNION ALL
       |  SELECT printf('user_%d', CAST(${hSql("uid", "i")} % 9000 + 1000 AS INT)),
       |         ${pickSql(FirstNames, "ufn", "i")} || ' ' || ${pickSql(LastNames, "uln", "i")}
       |  FROM (SELECT range AS i FROM range(10)))""".stripMargin

  /** interactions: 50 over the seeded id pools with 3:2:1 weighted type. */
  private val iaSql = {
    val userPool = "user_saurav_001" +: syntheticUserIds()
    val recipePool = "rec_001_saurav_chicken_gravy" +:
      (2 to 20).map(n => f"rec_$n%03d_synthetic")
    s"""ia AS (
       |  SELECT printf('int_%04d', CAST(i AS INT)) AS interaction_id,
       |         ${pickSql(userPool, "iuser", "i")} AS user_id,
       |         ${pickSql(recipePool, "irec", "i")} AS recipe_id,
       |         ${pickSql(InteractionTypes, "itype", "i")} AS type
       |  FROM (SELECT range AS i FROM range(50)))""".stripMargin
  }

  private def q(name: String)(spark: RecipeAnalytics.Tables => org.apache.spark.sql.DataFrame,
      oracle: String): Q =
    Q(name, (s, _) => spark(tables(s)), Some(oracle), bench = false)

  val all: Seq[Q] = Seq(
    q("ra1_top_ingredients")(RecipeAnalytics.topIngredients(_),
      s"""WITH $ingSql
         |SELECT name, count(*) AS frequency FROM ing
         |GROUP BY name ORDER BY frequency DESC, name LIMIT 5""".stripMargin),

    q("ra2_avg_prep_time")(RecipeAnalytics.avgPrepTime,
      s"""WITH $rcpSql
         |SELECT round(avg(prep_time_minutes), 1) AS avg_time
         |FROM rcp WHERE prep_time_minutes > 0""".stripMargin),

    q("ra3_difficulty_distribution")(RecipeAnalytics.difficultyDistribution,
      s"""WITH $rcpSql
         |SELECT difficulty, count(*) AS "count" FROM rcp
         |GROUP BY difficulty ORDER BY difficulty""".stripMargin),

    q("ra4_liked_vs_global_prep")(RecipeAnalytics.likedVsGlobalPrep,
      s"""WITH $rcpSql,
         |$iaSql
         |SELECT g.global_avg, l.liked_avg FROM
         |  (SELECT round(avg(prep_time_minutes), 1) AS global_avg FROM rcp) g,
         |  (SELECT round(avg(prep_time_minutes), 1) AS liked_avg
         |   FROM ia JOIN rcp USING (recipe_id) WHERE type = 'like') l""".stripMargin),

    q("ra5_top_viewed_recipe")(RecipeAnalytics.topViewedRecipe,
      s"""WITH $rcpSql,
         |$iaSql
         |SELECT title, count(*) AS views FROM ia JOIN rcp USING (recipe_id)
         |WHERE type = 'view' GROUP BY title ORDER BY views DESC, title LIMIT 1""".stripMargin),

    q("ra6_liked_ingredients")(RecipeAnalytics.likedIngredients(_),
      s"""WITH $ingSql,
         |$iaSql
         |SELECT name, count(interaction_id) AS likes
         |FROM ia JOIN ing USING (recipe_id) WHERE type = 'like'
         |GROUP BY name ORDER BY likes DESC, name LIMIT 5""".stripMargin),

    q("ra7_active_users")(RecipeAnalytics.activeUsers(_),
      s"""WITH $usrSql,
         |$iaSql
         |SELECT username, count(*) AS actions FROM ia JOIN usr USING (user_id)
         |GROUP BY username ORDER BY actions DESC, username LIMIT 3""".stripMargin),

    q("ra8_most_complex_recipe")(RecipeAnalytics.mostComplexRecipe,
      s"""WITH $rcpSql,
         |$stpSql
         |SELECT title, count(step_number) AS steps FROM rcp JOIN stp USING (recipe_id)
         |GROUP BY title ORDER BY steps DESC, title LIMIT 1""".stripMargin),

    q("ra9_avg_ingredient_count")(RecipeAnalytics.avgIngredientCount,
      s"""WITH $ingSql
         |SELECT round(avg(cnt), 1) AS avg_ingredients FROM
         |  (SELECT recipe_id, count(*) AS cnt FROM ing GROUP BY recipe_id)""".stripMargin),

    q("ra10_views_by_difficulty")(RecipeAnalytics.viewsByDifficulty,
      s"""WITH $rcpSql,
         |$iaSql
         |SELECT difficulty, count(*) AS views FROM ia JOIN rcp USING (recipe_id)
         |WHERE type = 'view' GROUP BY difficulty ORDER BY views DESC, difficulty""".stripMargin)
  )
}
