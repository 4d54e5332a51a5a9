package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Static discipline checks over the production sources: the rules that
  * keep operators distributed stay enforced, not just remembered.
  */
class CodeDisciplineSpec extends AnyFunSuite {

  private def mainSources: Seq[(String, String)] =
    Files.walk(Paths.get("src/main/scala")).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .map(p => p.toString -> new String(Files.readAllBytes(p)))
      .toSeq

  test("no driver-side row collection in any operator/query path") {
    val offenders = mainSources.collect {
      case (path, src) if src.contains(".collect()") || src.contains("toLocalIterator") =>
        path
    }
    assert(offenders.isEmpty, s"driver-side collection in: $offenders")
  }

  test("no Scala UDFs — custom logic is Catalyst expressions only") {
    val offenders = mainSources.collect {
      case (path, src) if src.contains("functions.udf(") || src.contains(" udf(") =>
        path
    }
    assert(offenders.isEmpty, s"udf() used in: $offenders")
  }

  test("every registered query has a DuckDB oracle") {
    val missing = SparkEntry.registry.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"queries without oracles: $missing")
  }

  test("query names are unique and stable-keyed") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size === names.size)
    assert(names.forall(_.matches("[a-z0-9_]+")))
  }
}
