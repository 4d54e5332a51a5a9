package graft.sources

import graft.{SparkSpec, TestSpark}
import graft.recipes.{Normalize, Schemas}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** The docstore DataSource V2 connector: result parity with the
  * declared-schema JSON reader, pagination as the partitioning unit,
  * column pruning reaching the reader, and the declared-schema guard.
  */
class DocStoreSourceSpec extends SparkSpec {

  private def docstore(file: String, schema: org.apache.spark.sql.types.StructType,
      pageSize: Int): DataFrame =
    spark.read.format("docstore")
      .schema(schema)
      .option("planMode", "cursor") // this spec pins the exact-page mode
      .option("pageSize", pageSize)
      .load(s"${TestSpark.FixtureDir}/$file")

  private def sortedRows(df: DataFrame, key: String): Array[String] =
    df.orderBy(key).collect().map(_.toString)

  test("reads equal the declared-schema JSON reader, flat and nested") {
    // users: flat schema with a timestamp
    val viaJson = Normalize.readDocs(
      spark, s"${TestSpark.FixtureDir}/users.jsonl", Schemas.userDoc)
    val viaStore = docstore("users.jsonl", Schemas.userDoc, pageSize = 4)
    assert(sortedRows(viaStore, "user_id") === sortedRows(viaJson, "user_id"))

    // recipes: nested array<struct> and array<string> exercise recursion
    val rJson = Normalize.readDocs(
      spark, s"${TestSpark.FixtureDir}/recipes.jsonl", Schemas.recipeDoc)
    val rStore = docstore("recipes.jsonl", Schemas.recipeDoc, pageSize = 7)
    assert(sortedRows(rStore, "recipe_id") === sortedRows(rJson, "recipe_id"))

    // interactions: the mostly-absent nullable rating must surface as null
    val iJson = Normalize.readDocs(
      spark, s"${TestSpark.FixtureDir}/interactions.jsonl", Schemas.interactionDoc)
    val iStore = docstore("interactions.jsonl", Schemas.interactionDoc, pageSize = 9)
    assert(sortedRows(iStore, "interaction_id") === sortedRows(iJson, "interaction_id"))
    assert(iStore.filter(col("rating").isNull).count() ===
      iJson.filter(col("rating").isNull).count())
  }

  test("one partition per pageSize documents — the cursor-page parallelism") {
    val n = docstore("recipes.jsonl", Schemas.recipeDoc, pageSize = 1000).count()
    def parts(pageSize: Int): Int =
      docstore("recipes.jsonl", Schemas.recipeDoc, pageSize).rdd.getNumPartitions
    assert(parts(7) === ((n + 6) / 7).toInt)
    assert(parts(1) === n.toInt)
    assert(parts(1000) === 1)
  }

  test("column pruning reaches the scan: only projected fields are read") {
    val pruned = docstore("recipes.jsonl", Schemas.recipeDoc, pageSize = 7)
      .select("recipe_id", "difficulty")
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))
    assert(scan.output.map(_.name).sorted === Seq("difficulty", "recipe_id"))
    assert(scan.scan.description().contains("required=recipe_id,difficulty"))
    // and the pruned read still returns correct values
    assert(pruned.orderBy("recipe_id").collect().length === 20)
  }

  test("schema inference is refused — declared schemas are the contract") {
    val e = intercept[Exception] {
      spark.read.format("docstore")
        .load(s"${TestSpark.FixtureDir}/users.jsonl").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("declared schema")))
  }

  test("CRLF line endings: byte accounting keeps pages disjoint (no dup/loss)") {
    val dir = java.nio.file.Files.createTempDirectory("docstore_crlf").toString
    val docs = (0 until 11).map(i => s"""{"user_id": "u$i", "username": "name$i"}""")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/coll.jsonl"),
      docs.mkString("\r\n").getBytes("UTF-8")) // \r\n separators, no trailing newline
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("username",
        org.apache.spark.sql.types.StringType)))
    val df = spark.read.format("docstore").schema(schema)
      .option("planMode", "cursor")
      .option("pageSize", 3).load(s"$dir/coll.jsonl")
    val got = df.collect().map(_.getString(0)).sorted
    assert(got === (0 until 11).map(i => s"u$i").sorted.toArray)
    assert(df.rdd.getNumPartitions === 4) // ceil(11/3)
  }

  test("directory of collection files reads as one collection") {
    val dir = java.nio.file.Files.createTempDirectory("docstore_dir").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.FixtureDir}/users.jsonl"),
      java.nio.file.Paths.get(s"$dir/part-0.jsonl"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.FixtureDir}/users.jsonl"),
      java.nio.file.Paths.get(s"$dir/part-1.jsonl"))
    val both = spark.read.format("docstore").schema(Schemas.userDoc)
      .option("planMode", "cursor")
      .option("pageSize", 4).load(dir)
    assert(both.count() === 22) // 11 docs per copy
    assert(both.rdd.getNumPartitions === 6) // ceil(11/4) pages per file
  }
}
