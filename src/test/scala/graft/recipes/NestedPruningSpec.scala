package graft.recipes

import graft.{SparkSpec, TestSpark}
import java.nio.file.Files

/** Catalyst must prune the nested document schema: extracting only the
  * ingredients array from a parquet document store may not read the
  * steps array (or the other scalars) off disk — the property that makes
  * document normalization scan-bound at 100 TB.
  */
class NestedPruningSpec extends SparkSpec {

  test("ingredient explode reads only recipe_id + ingredients from parquet docs") {
    val dir = Files.createTempDirectory("docs-parquet").toString
    Normalize.readDocs(spark, s"${TestSpark.FixtureDir}/recipes.jsonl", Schemas.recipeDoc)
      .write.mode("overwrite").parquet(dir)

    val plan = Normalize.ingredients(spark.read.parquet(dir))
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("ingredients"), readSchema)
    assert(!readSchema.contains("steps"), s"steps not pruned: $readSchema")
    assert(!readSchema.contains("title"), s"scalars not pruned: $readSchema")
  }

  test("steps explode symmetrically prunes ingredients") {
    val dir = Files.createTempDirectory("docs-parquet2").toString
    Normalize.readDocs(spark, s"${TestSpark.FixtureDir}/recipes.jsonl", Schemas.recipeDoc)
      .write.mode("overwrite").parquet(dir)
    val readSchema = Normalize.steps(spark.read.parquet(dir))
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      .linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("steps"))
    assert(!readSchema.contains("ingredients"), s"not pruned: $readSchema")
  }
}
