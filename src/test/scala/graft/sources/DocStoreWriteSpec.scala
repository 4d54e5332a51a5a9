package graft.sources

import graft.{SparkSpec, TestSpark}
import graft.recipes.Schemas
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The connector's write side: the V2 two-phase commit (task temp files
  * → driver rename), append vs truncate semantics, the one-document-
  * one-line invariant under hostile payloads, and type round-trips
  * (timestamps micro-exact, nested array<struct>).
  */
class DocStoreWriteSpec extends SparkSpec {

  private def writeDocs(df: DataFrame, path: String, mode: String): Unit =
    df.write.format("docstore").mode(mode).save(path)

  private def readDocs(path: String, schema: StructType): DataFrame =
    spark.read.format("docstore").schema(schema).load(path)

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType)))

  test("round-trip: write through the connector, read back identically") {
    val out = graft.TempDirs.create("docstore_write_rt").resolve("coll").toString
    val src = graft.Tables(spark, TestSpark.Sf0001, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    writeDocs(src, out, "append")
    val back = readDocs(out, docSchema)
    assert(rowSet(back) === rowSet(src))
    // commit left no temp or hidden files behind
    val leftovers = new java.io.File(out).listFiles()
      .map(_.getName).filter(n => n.startsWith(".") || n.startsWith("_"))
    assert(leftovers.isEmpty, s"leftovers: ${leftovers.mkString(",")}")
  }

  test("append accumulates; overwrite truncates to exactly the new content") {
    import spark.implicits._
    val out = graft.TempDirs.create("docstore_write_modes").resolve("coll").toString
    val a = Seq((1L, "alpha", "en"), (2L, "beta", "en")).toDF("doc_id", "text", "lang")
    val b = Seq((3L, "gamma", "de")).toDF("doc_id", "text", "lang")
    writeDocs(a, out, "append")
    writeDocs(b, out, "append")
    assert(readDocs(out, docSchema).count() === 3)
    writeDocs(b, out, "overwrite")
    val got = readDocs(out, docSchema).select("doc_id").as[Long].collect().sorted
    assert(got === Array(3L))
  }

  test("embedded newlines and control chars stay one escaped line per document") {
    import spark.implicits._
    val out = graft.TempDirs.create("docstore_write_nl").resolve("coll").toString
    val hostile = Seq(
      (1L, "line1\nline2\r\nline3", "en"),
      (2L, "tab\there ctl \"quoted\"", "de")).toDF("doc_id", "text", "lang")
    writeDocs(hostile, out, "append")
    // physical invariant: one '\n'-terminated line per document
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".jsonl"))
    val physicalLines = files.map(f =>
      java.nio.file.Files.readAllLines(f.toPath).size()).sum
    assert(physicalLines === 2, "each document must serialize to ONE line")
    // semantic invariant: values survive exactly
    val back = readDocs(out, docSchema).orderBy("doc_id")
      .select("text").as[String].collect()
    assert(back(0) === "line1\nline2\r\nline3")
    assert(back(1) === "tab\there ctl \"quoted\"")
  }

  test("timestamps and nested array<struct> round-trip through write+read") {
    val out = graft.TempDirs.create("docstore_write_nested").resolve("coll").toString
    val src = spark.read.format("docstore").schema(Schemas.recipeDoc)
      .load(s"${TestSpark.FixtureDir}/recipes.jsonl")
    writeDocs(src, out, "append")
    val back = spark.read.format("docstore").schema(Schemas.recipeDoc).load(out)
    assert(rowSet(back) === rowSet(src))

    val uOut = graft.TempDirs.create("docstore_write_ts").resolve("coll").toString
    val users = spark.read.format("docstore").schema(Schemas.userDoc)
      .option("planMode", "cursor").option("pageSize", 4)
      .load(s"${TestSpark.FixtureDir}/users.jsonl")
    writeDocs(users, uOut, "append")
    val uBack = spark.read.format("docstore").schema(Schemas.userDoc).load(uOut)
    // micro-exact: compare epoch micros, not rendered strings
    assert(rowSet(uBack.select(col("user_id"), unix_micros(col("created_at")))) ===
      rowSet(users.select(col("user_id"), unix_micros(col("created_at")))))
  }
}
