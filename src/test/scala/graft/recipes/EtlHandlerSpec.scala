package graft.recipes

import graft.{SparkSpec, TestSpark}
import java.nio.file.Files

/** The request-shaped handler's envelope contract (the reference's
  * HTTP function): 200 + success JSON with row counts on a good run,
  * 500 + error JSON (never a throw) when the pipeline fails.
  */
class EtlHandlerSpec extends SparkSpec {

  test("success path: 200 envelope with processed count and per-table rows") {
    val out = Files.createTempDirectory("etl_handler_ok").toString
    val r = EtlHandler.handle(spark, TestSpark.FixtureDir, out)
    assert(r.status === 200)
    assert(r.body.contains(""""status":"success""""))
    // the reference reports the recipe count in its success message
    assert(r.body.contains(""""processed_recipes":20"""))
    assert(r.body.contains(""""users":11"""))
    // the pipeline actually ran: validation report landed in outDir
    assert(new java.io.File(s"$out/validation_report.csv").exists())
  }

  test("failure path: 500 envelope, no exception escapes") {
    val out = Files.createTempDirectory("etl_handler_bad").toString
    val r = EtlHandler.handle(spark, "/nonexistent/docs/dir", out)
    assert(r.status === 500)
    assert(r.body.contains(""""status":"error""""))
    assert(r.body.contains("Pipeline Failed"))
  }
}
