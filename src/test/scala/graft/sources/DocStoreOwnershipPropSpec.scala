package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Property-level hammering of the split-ownership convention at the
  * reader layer (no Spark jobs per case — DocPage readers are driven
  * directly, so hundreds of hostile layouts run in seconds): for ANY
  * document list, separator style, trailing-newline choice, and
  * splitSize, the union of all splits' outputs must be EXACTLY the
  * document list — nothing lost, nothing doubled, for every boundary
  * phase. Cursor pages get the same treatment plus the
  * pageSize-exactness invariant.
  */
class DocStoreOwnershipPropSpec extends SparkSpec {

  private val schema = StructType(Seq(StructField("v", StringType)))

  private def scanFor(file: String, splitSize: Long, pageSize: Int): DocStoreScan =
    new DocStoreScan(schema, file, pageSize, splitSize, "split", -1)

  private def readAll(pages: Seq[DocPage]): Seq[String] = {
    val factory = new DocPageReaderFactory(schema,
      Array(("fs.defaultFS", "file:///")))
    pages.flatMap { p =>
      val r = factory.createReader(p)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      try while (r.next()) out += r.get().getUTF8String(0).toString
      finally r.close()
      out
    }
  }

  test("split ownership is exactly-once for every (layout, splitSize) combination") {
    // spark touch: readers resolve conf via shipped entries, but the
    // scan's planning helpers need an active session
    spark.sparkContext
    val rnd = new scala.util.Random(41)
    val dir = Files.createTempDirectory("docstore_prop").toString
    var cases = 0
    for (trial <- 0 until 40) {
      val nDocs = 1 + rnd.nextInt(30)
      val docs = Seq.tabulate(nDocs)(i =>
        s"d${trial}_${i}_" + ("x" * rnd.nextInt(25)))
      val sep = if (rnd.nextBoolean()) "\n" else "\r\n"
      val blanks = rnd.nextInt(3) // interleave blank/ws-only lines
      val lines = docs.flatMap(d =>
        Seq(s"""{"v": "$d"}""") ++ Seq.fill(blanks)(if (rnd.nextBoolean()) "" else "  "))
      val trailing = if (rnd.nextBoolean()) sep else ""
      val file = s"$dir/t$trial.jsonl"
      Files.write(Paths.get(file), (lines.mkString(sep) + trailing).getBytes("UTF-8"))
      val len = Files.size(Paths.get(file))
      // splitSizes chosen to land boundaries inside docs, on separators,
      // and past EOF
      val sizes = Seq(1L, 2L, 3L, 5L, 7L, 11L, 17L, 29L, len / 2 + 1, len + 10)
      sizes.filter(_ > 0).foreach { sz =>
        val scan = scanFor(file, sz, pageSize = 4)
        val got = readAll(scan.splitPages(file, len).map(_.asInstanceOf[DocPage]))
        assert(got.sorted == docs.sorted,
          s"trial=$trial sep=${sep.length} splitSize=$sz: got ${got.size}/${docs.size}")
        cases += 1
      }
    }
    assert(cases > 300)
  }

  test("cursor pages carry exactly pageSize non-blank documents, exactly once") {
    spark.sparkContext
    val rnd = new scala.util.Random(43)
    val dir = Files.createTempDirectory("docstore_prop_cur").toString
    val conf = new org.apache.hadoop.conf.Configuration(false)
    conf.set("fs.defaultFS", "file:///")
    for (trial <- 0 until 15) {
      val nDocs = 1 + rnd.nextInt(40)
      val docs = Seq.tabulate(nDocs)(i => s"c${trial}_$i")
      val lines = docs.flatMap(d =>
        Seq(s"""{"v": "$d"}""") ++ (if (rnd.nextBoolean()) Seq("") else Nil))
      val file = s"$dir/t$trial.jsonl"
      Files.write(Paths.get(file),
        (lines.mkString("\n") + (if (rnd.nextBoolean()) "\n" else ""))
          .getBytes("UTF-8"))
      val len = Files.size(Paths.get(file))
      val pageSize = 1 + rnd.nextInt(7)
      val scan = new DocStoreScan(schema, file, pageSize, 1L << 20, "cursor", -1)
      val p = new org.apache.hadoop.fs.Path(file)
      val (pages, plannedDocs) =
        scan.cursorPages(p.getFileSystem(conf), p, len, Long.MaxValue)
      // every page but the last holds exactly pageSize docs
      val perPage = pages.map(pg => readAll(Seq(pg)).size)
      assert(perPage.dropRight(1).forall(_ == pageSize),
        s"trial=$trial pageSize=$pageSize perPage=$perPage")
      assert(readAll(pages).sorted == docs.sorted)
      // the planner's reported doc count is exact — the invariant the
      // pushed-limit stop rule depends on (docs, not pages)
      assert(plannedDocs === nDocs.toLong,
        s"trial=$trial planner counted $plannedDocs of $nDocs docs")
    }
  }

  test("cursor walk never reads past the admitted length (streaming growth)") {
    // a file admitted into a streaming offset at length L may have
    // grown by planning time; the walk must plan ONLY the first L
    // bytes, or page offsets would misalign with the committed offset
    val dir = Files.createTempDirectory("docstore_prop_grow").toString
    val conf = new org.apache.hadoop.conf.Configuration(false)
    conf.set("fs.defaultFS", "file:///")
    val first = (0 until 6).map(i => s"""{"v": "old$i"}""")
    val body = first.mkString("\n") + "\n"
    val admittedLen = body.getBytes("UTF-8").length.toLong
    val grown = body + (0 until 6).map(i => s"""{"v": "new$i"}""").mkString("\n")
    val file = s"$dir/grow.jsonl"
    Files.write(Paths.get(file), grown.getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    val scan = new DocStoreScan(schema, file, 4, 1L << 20, "cursor", -1)
    val p = new org.apache.hadoop.fs.Path(file)
    val (pages, planned) =
      scan.cursorPages(p.getFileSystem(conf), p, admittedLen, Long.MaxValue)
    assert(planned === 6L, s"planned $planned docs past the admitted length")
    assert(pages.forall(_.end <= admittedLen),
      s"a page extends past the admitted length: $pages")
  }
}
