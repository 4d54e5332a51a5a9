package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `docstore` — a DataSource V2 connector that models a document-store
  * collection read with PER-DOCUMENT CURSOR PAGINATION, the structural
  * analogue of the reference's Firestore streaming cursor
  * (`/root/reference/src/etl_pipeline.py:28-32`: `db.collection(name)
  * .stream()` pulls documents through a paged gRPC cursor).
  *
  * What is real here (and tested):
  *   - the full V2 stack: `TableProvider` → `Table` → `ScanBuilder` →
  *     `Scan`/`Batch` → `InputPartition` → `PartitionReader`;
  *   - SIZE-SPLIT planning (the default, `planMode=split`): partitions
  *     are cut from file LENGTHS alone — `ceil(len / splitSize)` byte
  *     ranges per file, O(#files) driver work and ZERO file-content
  *     reads at plan time (asserted in DocStoreSplitSpec). Readers own
  *     lines by the standard split convention (a split starting
  *     mid-line skips to the first line past its start; a line
  *     straddling a split's end belongs to the split it starts in), so
  *     pointing the connector at a 100 TB collection plans in listing
  *     time, not read time — the r6 scale fix;
  *   - CURSOR pagination (opt-in, `planMode=cursor`): the planner walks
  *     the collection once like a store cursor, emitting one
  *     `InputPartition` per `pageSize` documents (blank lines excluded,
  *     so every page carries exactly `pageSize` real documents) — the
  *     structural analogue of the modeled page-token API, kept for the
  *     doc-count-exact semantics at fixture scale;
  *   - LIMIT pushdown (`SupportsPushDownLimit`): the reference's
  *     connectivity probe is `collection.limit(1).stream()`
  *     (`cloud_function/main.py:29-33`); here a `limit(n)` stops cursor
  *     planning after `ceil(n / pageSize)` pages (a `limit(1)` probe
  *     plans ONE page and the plan-time walk stops at its boundary) and
  *     caps every reader at `n` rows in both modes;
  *   - column pruning (`SupportsPushDownRequiredColumns`): a projection
  *     reaches the reader, which materializes ONLY the required fields
  *     of each document (a document store returns whole documents; the
  *     reader is where narrowing happens);
  *   - declared-schema reads: `inferSchema` refuses — inference is a
  *     full extra pass at 100 TB and silently drifts types, the same
  *     contract as `CorpusIO`/`Normalize.readDocs`.
  *
  * What is a sandbox stand-in: the "store" is JSONL files (one document
  * per line). Against a real store, split planning maps to the store's
  * shard/token metadata and cursor planning to its page-token API;
  * everything from `InputPartition` down is unchanged. Filter pushdown
  * is deliberately absent — the modeled cursor API returns whole
  * collections, and claiming pushdown the backend can't serve would be
  * a lie in the plan.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.DocStoreSource") // or "docstore"
  *     .schema(Schemas.userDoc)
  *     .option("splitSize", 32 << 20)  // split mode (default)
  *     .option("planMode", "cursor")   // or: exact pageSize-doc pages
  *     .option("pageSize", 300)
  *     .load(dir) // a .jsonl file or a directory of them
  * }}}
  */
class DocStoreSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "docstore"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "docstore requires a declared schema (.schema(...)): inference is a " +
        "full extra pass over the collection and silently drifts types")

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new DocStoreTable(schema, properties)
}

private[sources] class DocStoreTable(
    tableSchema: StructType, props: java.util.Map[String, String])
    extends Table with SupportsRead with SupportsWrite {

  override def name(): String = s"docstore(${props.get("path")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo):
      org.apache.spark.sql.connector.write.WriteBuilder = {
    val path = Option(info.options.get("path")).orElse(Option(props.get("path")))
      .getOrElse(throw new IllegalArgumentException("docstore: no path given"))
    new DocStoreWriteBuilder(path, info.schema(), info.queryId())
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    def opt(k: String) = Option(options.get(k)).orElse(Option(props.get(k)))
    val path = opt("path")
      .getOrElse(throw new IllegalArgumentException("docstore: no path given"))
    val pageSize = opt("pageSize").map(_.toInt).getOrElse(300)
    require(pageSize > 0, s"docstore: pageSize must be positive, got $pageSize")
    val splitSize = opt("splitSize").map(_.toLong).getOrElse(128L << 20)
    require(splitSize > 0, s"docstore: splitSize must be positive, got $splitSize")
    val mode = opt("planMode").getOrElse("split")
    require(mode == "split" || mode == "cursor",
      s"docstore: planMode must be split or cursor, got $mode")
    val maxFiles = opt("maxFilesPerTrigger").map(_.toInt)
    maxFiles.foreach(n => require(n > 0,
      s"docstore: maxFilesPerTrigger must be positive, got $n"))
    new DocStoreScanBuilder(tableSchema, path, pageSize, splitSize, mode, maxFiles)
  }
}

private[sources] class DocStoreScanBuilder(
    fullSchema: StructType, path: String, pageSize: Int,
    splitSize: Long, mode: String, maxFilesPerTrigger: Option[Int])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit {

  private var required: StructType = fullSchema
  private var limit: Int = -1

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Partial push (returns false): planning and every reader are capped,
    * but a page/split can hold more rows than `limit`, so Spark keeps
    * its global Limit on top — the honest contract.
    */
  override def pushLimit(l: Int): Boolean = { limit = l; false }

  override def build(): Scan =
    new DocStoreScan(required, path, pageSize, splitSize, mode, limit,
      maxFilesPerTrigger)
}

/** One unit of scan parallelism: bytes of `file` in [`start`, `end`).
  *
  * `aligned = true` (cursor pages): both offsets fall exactly on line
  * boundaries by construction of the planner's index walk — the reader
  * starts at `start` and stops before `end`.
  *
  * `aligned = false` (size splits): offsets are arbitrary, and the
  * reader applies the standard split convention — skip to the first
  * line starting after `start` (unless `start` is 0), then read every
  * line that STARTS at a position <= `end`, even past `end` (the next
  * split symmetrically discards its leading partial line). Every line is
  * read by exactly one split.
  *
  * `rowLimit >= 0` caps the rows this reader emits (pushed limit).
  */
private[sources] case class DocPage(
    file: String, start: Long, end: Long,
    aligned: Boolean = true, rowLimit: Int = -1)
  extends InputPartition

private[sources] class DocStoreScan(
    required: StructType, private[sources] val path: String, pageSize: Int,
    splitSize: Long, private[sources] val mode: String, limit: Int,
    maxFilesPerTrigger: Option[Int] = None)
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Collection byte size from the LISTING (no content reads — the same
    * O(#files) metadata as split planning), so Catalyst's join planning
    * sees a real sizeInBytes instead of the conservative default: a
    * small dimension collection read through the connector becomes
    * broadcast-eligible exactly like a small parquet table would.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes: Long =
      try {
        val conf = hadoopConf()
        val root0 = new Path(path)
        val fs = root0.getFileSystem(conf)
        collectionFiles(fs, fs.makeQualified(root0)).map(_.getLen).sum
      // NonFatal only: an OOM or linkage error must propagate, not
      // dissolve into a silent "table is huge" estimate
      } catch { case scala.util.control.NonFatal(_) => Long.MaxValue }
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
  }
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new DocStoreMicroBatchStream(this, maxFilesPerTrigger)
  override def description(): String =
    s"docstore path=$path planMode=$mode pageSize=$pageSize splitSize=$splitSize " +
      s"pushedLimit=${if (limit >= 0) limit else "none"} " +
      s"required=${required.fieldNames.mkString(",")}"

  private[sources] def hadoopConf() =
    // the SESSION's Hadoop conf, not a bare `new Configuration()`:
    // spark.hadoop.* settings (credentials, endpoints, fs.defaultFS)
    // must reach the filesystem, and a scheme-less path must resolve
    // against fs.defaultFS exactly as spark.read.parquet would
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()

  private[sources] def collectionFiles(fs: FileSystem, root: Path) =
    if (fs.getFileStatus(root).isDirectory)
      fs.listStatus(root).filter(_.isFile)
        .filter(s => !s.getPath.getName.startsWith(".") &&
          !s.getPath.getName.startsWith("_"))
        .sortBy(_.getPath.toString)
    else Array(fs.getFileStatus(root))

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = hadoopConf()
    val root0 = new Path(path)
    val fs = root0.getFileSystem(conf)
    val root = fs.makeQualified(root0)
    val files = collectionFiles(fs, root)
    if (mode == "split") planSplits(files) else planCursor(fs, files)
  }

  /** Size-split planning: byte ranges cut from the listing's file
    * lengths — NO file content is opened on the driver (DocStoreSplitSpec
    * asserts zero bytes read through the filesystem during planning).
    * O(#files) metadata work however large the collection; the listing
    * itself is the same one any scan needs.
    */
  private def planSplits(files: Array[org.apache.hadoop.fs.FileStatus]): Array[InputPartition] =
    files.flatMap(st => splitPages(st.getPath.toString, st.getLen))
      .toArray[InputPartition]

  private[sources] def splitPages(file: String, len: Long): Seq[DocPage] = {
    val n = math.max(1L, (len + splitSize - 1) / splitSize)
    (0L until n).map { i =>
      DocPage(file, i * splitSize,
        math.min((i + 1) * splitSize, len), aligned = false, rowLimit = limit)
    }
  }

  /** The cursor walk: one sequential pass per collection file, cutting a
    * page boundary every `pageSize` NON-BLANK documents (blank and
    * whitespace-only lines are excluded from the count, mirroring the
    * reader's skip — so pages never run short). Driver-side by design —
    * this is the planning metadata a store's cursor API hands out as
    * page tokens; its cost is one streaming read of the collection (no
    * parse), its output O(n / pageSize) partition descriptors. A pushed
    * limit stops the walk once the planned DOCUMENT count covers it —
    * counting documents, not pages, because a short trailing page
    * guarantees nothing (a page-counted stop could plan fewer rows
    * than the limit and silently under-produce). The reference's
    * limit-1 probe still plans one page and reads one.
    */
  private def planCursor(
      fs: FileSystem, files: Array[org.apache.hadoop.fs.FileStatus]): Array[InputPartition] = {
    val docsWanted = if (limit >= 0) limit.toLong else Long.MaxValue
    var docsPlanned = 0L
    val pages = scala.collection.mutable.ArrayBuffer.empty[DocPage]
    val it = files.iterator
    while (it.hasNext && docsPlanned < docsWanted) {
      val st = it.next()
      val (filePages, fileDocs) =
        cursorPages(fs, st.getPath, st.getLen, docsWanted - docsPlanned)
      pages ++= filePages
      docsPlanned += fileDocs
    }
    pages.toArray[InputPartition]
  }

  /** One file's cursor walk over its first `len` bytes, stopping once
    * `docsWanted` documents are planned; returns (pages, exact planned
    * document count). The walk never reads past `len`: in streaming, a
    * file may have grown past its admitted offset length by planning
    * time, and page offsets derived from the newer bytes would
    * misalign with what the offset committed.
    */
  private[sources] def cursorPages(
      fs: FileSystem, f: Path, len: Long,
      docsWanted: Long): (Seq[DocPage], Long) = {
    val pages = scala.collection.mutable.ArrayBuffer.empty[DocPage]
    var docsPlanned = 0L
    val in = fs.open(f)
    try {
      val buf = new Array[Byte](64 * 1024)
      var pageStart = 0L
      var pos = 0L
      var docsInPage = 0
      var sawContent = false
      def readNext(): Int = {
        val want = math.min(buf.length.toLong, len - pos).toInt
        if (want <= 0) -1 else in.read(buf, 0, want)
      }
      var read = readNext()
      var done = false
      while (read > 0 && !done) {
        var i = 0
        while (i < read && !done) {
          val b = buf(i)
          if (b == '\n') {
            if (sawContent) docsInPage += 1
            sawContent = false
            if (docsInPage == pageSize) {
              pages += DocPage(f.toString, pageStart, pos + i + 1, rowLimit = limit)
              docsPlanned += docsInPage
              pageStart = pos + i + 1
              docsInPage = 0
              done = docsPlanned >= docsWanted
            }
          } else if (b != '\r' && b != ' ' && b != '\t') sawContent = true
          i += 1
        }
        pos += read
        read = if (done) -1 else readNext()
      }
      // trailing page: a final doc without a newline still counts
      if (!done && pageStart < len) {
        pages += DocPage(f.toString, pageStart, len, rowLimit = limit)
        docsPlanned += docsInPage + (if (sawContent) 1 else 0)
      }
    } finally in.close()
    (pages.toSeq, docsPlanned)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // snapshot the session's Hadoop conf on the DRIVER and ship the
    // entries with the (serializable) factory — executors have no
    // SparkSession.active, and a bare `new Configuration()` there would
    // drop every spark.hadoop.* setting the read was planned with
    import scala.jdk.CollectionConverters._
    val conf = org.apache.spark.sql.SparkSession.active
      .sessionState.newHadoopConf()
    val entries = conf.iterator().asScala.map(e => (e.getKey, e.getValue)).toArray
    new DocPageReaderFactory(required, entries)
  }
}

/** Streaming offset: the set of collection files fully consumed, with
  * the length each was admitted at (files are IMMUTABLE once they
  * appear — the object-store landing contract the reference's export
  * jobs follow; a "growing" collection grows by NEW files). Serialized
  * with SORTED keys so offset equality — how Spark decides "no new
  * data" — is stable across runs. At millions of files per directory a
  * production source compacts this seen-set into the checkpoint's
  * metadata log exactly as Spark's FileStreamSource does; the offset
  * here carries it inline, bounded by files-per-collection.
  */
private[sources] case class DocStoreOffset(files: Map[String, Long])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = {
    val m = new ObjectMapper()
    val root = m.createObjectNode()
    val f = root.putObject("files")
    files.toSeq.sortBy(_._1).foreach { case (k, v) => f.put(k, v) }
    m.writeValueAsString(root)
  }
}

private[sources] object DocStoreOffset {
  def fromJson(s: String): DocStoreOffset = {
    val node = new ObjectMapper().readTree(s).get("files")
    import scala.jdk.CollectionConverters._
    DocStoreOffset(
      node.properties().asScala.map(e => e.getKey -> e.getValue.asLong()).toMap)
  }
}

/** The docstore cursor as a genuine Structured Streaming source: each
  * micro-batch admits the NEW collection files since the last committed
  * offset (sorted-name order, `maxFilesPerTrigger` per batch under
  * admission control) and plans them with the scan's configured mode —
  * size splits or exact cursor pages — through the same
  * `DocPage`/reader stack as the batch path. Implements
  * `SupportsTriggerAvailableNow` (the end target is snapshotted once,
  * then drained batch-by-batch) so `Trigger.AvailableNow` replays a
  * landing directory as a real multi-batch run; the checkpoint's offset
  * is the resume cursor — a restarted query consumes exactly the files
  * that appeared since, never re-reading or skipping one
  * (DocStoreStreamSpec proves both).
  */
private[sources] class DocStoreMicroBatchStream(
    scan: DocStoreScan, maxFilesPerTrigger: Option[Int])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset => StreamOffset, ReadLimit, ReadMaxFiles}

  private var availableNowTarget: Option[Map[String, Long]] = None

  private def listing(): Map[String, Long] = {
    val conf = scan.hadoopConf()
    val root0 = new Path(scan.path)
    val fs = root0.getFileSystem(conf)
    val root = fs.makeQualified(root0)
    if (!fs.exists(root)) Map.empty
    else scan.collectionFiles(fs, root)
      .map(st => st.getPath.toString -> st.getLen).toMap
  }

  override def initialOffset(): StreamOffset = DocStoreOffset(Map.empty)

  override def latestOffset(): StreamOffset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control entry point")

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(n => ReadLimit.maxFiles(n))
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: StreamOffset, limit: ReadLimit): StreamOffset = {
    val current = availableNowTarget.getOrElse(listing())
    val seen = start.asInstanceOf[DocStoreOffset].files
    val fresh = (current.keySet -- seen.keySet).toSeq.sorted
    val admitted = limit match {
      case mf: ReadMaxFiles => fresh.take(mf.maxFiles())
      case _ => fresh
    }
    DocStoreOffset(seen ++ admitted.map(f => f -> current(f)))
  }

  override def reportLatestOffset(): StreamOffset =
    DocStoreOffset(availableNowTarget.getOrElse(listing()))

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(listing())

  override def planInputPartitions(
      start: StreamOffset, end: StreamOffset): Array[InputPartition] = {
    val seen = start.asInstanceOf[DocStoreOffset].files
    val target = end.asInstanceOf[DocStoreOffset].files
    val fresh = (target.keySet -- seen.keySet).toSeq.sorted
    if (scan.mode == "split")
      fresh.flatMap(f => scan.splitPages(f, target(f))).toArray[InputPartition]
    else {
      val conf = scan.hadoopConf()
      fresh.flatMap { f =>
        val p = new Path(f)
        scan.cursorPages(p.getFileSystem(conf), p, target(f), Long.MaxValue)._1
      }.toArray[InputPartition]
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    scan.createReaderFactory()

  override def deserializeOffset(json: String): StreamOffset =
    DocStoreOffset.fromJson(json)

  override def commit(end: StreamOffset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] class DocPageReaderFactory(
    readSchema: StructType, confEntries: Array[(String, String)])
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val page = partition.asInstanceOf[DocPage]
    new PartitionReader[InternalRow] {
      private val conf = {
        val c = new Configuration(false)
        confEntries.foreach { case (k, v) => c.set(k, v) }
        c
      }
      private val fs = new Path(page.file).getFileSystem(conf)
      private val in = fs.open(new Path(page.file))
      in.seek(page.start)
      private val buf = new java.io.BufferedInputStream(in, 64 * 1024)
      private val mapper = new ObjectMapper()
      // byte-exact position tracking (a BufferedReader.readLine would
      // lose the \n-vs-\r\n distinction and let the reader run past its
      // page boundary into the next partition's documents)
      private var consumed = page.start
      private var emitted = 0
      private var row: InternalRow = _

      // Unaligned (size-split) partitions apply the standard split
      // convention: a split starting mid-file discards through the first
      // newline (the previous split owns that line — including the case
      // where `start` already sits on a line boundary: the previous
      // split's `lineStart <= end` read it), then owns every line whose
      // START position is <= its `end`, reading past `end` if the last
      // line straddles it. Exactly-once by symmetry of the two rules.
      if (!page.aligned && page.start > 0) {
        var b = buf.read()
        while (b != -1 && b != '\n') { consumed += 1; b = buf.read() }
        if (b == '\n') consumed += 1
      }

      // a LOOP, not recursion: next() overrides an interface method, so
      // scalac cannot tail-call-optimize it, and a long run of blank
      // lines inside one page would otherwise grow the stack per line
      override def next(): Boolean = {
        if (page.rowLimit >= 0 && emitted >= page.rowLimit) return false
        while (if (page.aligned) consumed < page.end else consumed <= page.end) {
          val bytes = new java.io.ByteArrayOutputStream(256)
          var b = buf.read()
          while (b != -1 && b != '\n') {
            consumed += 1
            bytes.write(b)
            b = buf.read()
          }
          if (b == '\n') consumed += 1
          val line = bytes.toString("UTF-8").stripSuffix("\r").trim
          if (line.nonEmpty) {
            row = DocJson.toRow(mapper.readTree(line), readSchema)
            emitted += 1
            return true
          }
          if (b == -1) return false
          // blank/whitespace-only line: keep scanning this page
        }
        false
      }

      override def get(): InternalRow = row
      override def close(): Unit = buf.close()
    }
  }
}

/** The WRITE side of the connector — the Firestore-export inverse: rows
  * become one JSON document per line, landed as immutable part files
  * (exactly the contract the streaming reader's offset model assumes).
  * The commit protocol is the standard V2 two-phase shape: every task
  * writes a dot-prefixed temp file (invisible to readers and to the
  * planner's listing filter), its commit message carries the temp name,
  * and the DRIVER's commit renames all temps into place — a failed or
  * speculative task's temp is deleted by abort and never becomes
  * visible. `mode("overwrite")` maps to TRUNCATE: pre-existing part
  * files are removed inside the same driver commit, after every temp
  * has landed.
  */
private[sources] class DocStoreWriteBuilder(path: String, schema: StructType,
    queryId: String)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {

  private var doTruncate = false

  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true
    this
  }

  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.Write {
      override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
        new DocStoreBatchWrite(path, schema, doTruncate, queryId)
    }
}

private[sources] case class DocWriteCommit(tempFile: String)
  extends org.apache.spark.sql.connector.write.WriterCommitMessage

private[sources] class DocStoreBatchWrite(
    path: String, schema: StructType, truncate: Boolean, queryId: String)
    extends org.apache.spark.sql.connector.write.BatchWrite {

  private def fsFor() = {
    val conf = org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
    val root = new Path(path)
    (root.getFileSystem(conf), root)
  }

  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo):
      org.apache.spark.sql.connector.write.DataWriterFactory = {
    val (fs, root) = fsFor()
    fs.mkdirs(root)
    import scala.jdk.CollectionConverters._
    val conf = org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
    new DocStoreWriterFactory(path, schema, queryId,
      conf.iterator().asScala.map(e => (e.getKey, e.getValue)).toArray)
  }

  override def commit(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    val (fs, root) = fsFor()
    // visible names carry the write's queryId, so two APPLICATIONS
    // writing the same collection can never collide on (partitionId,
    // taskId) alone; the truncate list additionally excludes this
    // commit's own targets — belt and braces against a rename that
    // silently replaced an identically-named file
    val targets = messages.collect { case DocWriteCommit(tmp) =>
      new Path(tmp).getName.stripPrefix(".tmp-") }.toSet
    val existing =
      if (truncate)
        fs.listStatus(root).toSeq.filter(s => s.isFile &&
          !s.getPath.getName.startsWith(".") && !s.getPath.getName.startsWith("_") &&
          !targets(s.getPath.getName))
          .map(_.getPath)
      else Seq.empty
    messages.collect { case DocWriteCommit(tmp) =>
      val t = new Path(tmp)
      val visible = new Path(root, t.getName.stripPrefix(".tmp-"))
      require(fs.rename(t, visible), s"docstore commit rename of $t failed")
    }
    // truncate AFTER the new files land: a reader mid-commit sees old,
    // mixed, or new content but never an empty collection
    existing.foreach(p =>
      require(fs.delete(p, false), s"docstore truncate of $p failed"))
  }

  override def abort(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    val (fs, _) = fsFor()
    messages.collect { case DocWriteCommit(tmp) =>
      fs.delete(new Path(tmp), false)
    }
  }
}

private[sources] class DocStoreWriterFactory(
    path: String, schema: StructType, queryId: String,
    confEntries: Array[(String, String)])
    extends org.apache.spark.sql.connector.write.DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long):
      org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
      private val conf = {
        val c = new Configuration(false)
        confEntries.foreach { case (k, v) => c.set(k, v) }
        c
      }
      // taskId keeps speculative/retried attempts of the same partition
      // from colliding WITHIN this application; queryId makes the name
      // unique ACROSS applications (two apps both start taskIds at 0 —
      // without it, an overwrite from a second app could rename onto an
      // existing part file). Only the committed attempt's message
      // reaches commit(), the rest are aborted.
      private val tmp = new Path(
        s"$path/.tmp-part-$partitionId-$taskId-$queryId.jsonl")
      // a PRIVATE (uncached) filesystem instance: setWriteChecksum on
      // the shared cached FS would disable .crc checksums JVM-wide for
      // every other writer — scope the "no sidecars" choice to this
      // writer's own handle and close it with the task
      private val fs = FileSystem.newInstance(tmp.toUri, conf)
      fs.setWriteChecksum(false)
      private val out = new java.io.BufferedOutputStream(fs.create(tmp, true), 64 * 1024)
      private val mapper = new ObjectMapper()

      override def write(row: InternalRow): Unit = {
        out.write(mapper.writeValueAsBytes(DocJson.fromRow(mapper, row, schema)))
        out.write('\n')
      }

      override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
        out.close()
        DocWriteCommit(tmp.toString)
      }

      override def abort(): Unit = {
        out.close()
        fs.delete(tmp, false)
      }

      override def close(): Unit = fs.close()
    }
}

/** Registry rows driving the docstore connector through the driver's
  * DuckDB oracle: both engines read the SAME collection files (the
  * checked-in fixture collections mirroring the reference's Firestore
  * export), so the rows verify the connector's parse/convert path —
  * flat fields, timestamps, and the nested array<struct> — not just
  * its plumbing. Constant-size input → `bench = false`.
  */
object DocStoreQueries {

  // Resolved to an ABSOLUTE path at runtime (relative to this JVM's
  // launch directory, walking up if launched from a subdir). The
  // resolution must happen here, not in the SQL text: the oracle SQL
  // is interpolated into `oracleSql` and later executed by a DuckDB
  // process with a DIFFERENT cwd, so a launch-relative string in the
  // SQL silently breaks only on the oracle side (the r10 ds1/ds2/sm13
  // regression). Canonicalizing once keeps both engines reading the
  // same files while staying checkout-portable.
  private val FixtureDir: String = {
    val rel = "src/test/resources/fixtures"
    var dir = new java.io.File(".").getCanonicalFile
    var found: Option[java.io.File] = None
    while (found.isEmpty && dir != null) {
      val cand = new java.io.File(dir, rel)
      if (cand.isDirectory) found = Some(cand) else dir = dir.getParentFile
    }
    found.getOrElse(new java.io.File(rel)).getCanonicalPath
  }

  import graft.Q
  import org.apache.spark.sql.functions._

  val all: Seq[Q] = Seq(
    // DS1: flat collection scan through the V2 stack in CURSOR mode
    // (exact 4-doc pages — the modeled page-token path); timestamps
    // compared as epoch micros (both engines' native integer form).
    Q(
      "ds1_docstore_scan",
      (s, _) =>
        s.read.format("docstore")
          .schema(graft.recipes.Schemas.userDoc)
          .option("planMode", "cursor")
          .option("pageSize", 4)
          .load(s"$FixtureDir/users.jsonl")
          .select(
            col("user_id"), col("username"), col("email"), col("role"),
            unix_micros(col("created_at")).as("created_us"))
          .orderBy("user_id"),
      Some(s"""SELECT user_id, username, email, role,
              |  epoch_us(created_at) AS created_us
              |FROM read_json('$FixtureDir/users.jsonl',
              |  format='newline_delimited',
              |  columns={'user_id':'VARCHAR','username':'VARCHAR',
              |           'email':'VARCHAR','role':'VARCHAR',
              |           'created_at':'TIMESTAMP WITH TIME ZONE'})
              |ORDER BY user_id""".stripMargin),
      bench = false
    ),

    // DS2: nested array<struct> through the connector's recursive
    // converter, exploded to scalar rows for the driver comparator —
    // in SPLIT mode (the 100 TB default) with a splitSize small enough
    // that the fixture planning yields several unaligned byte ranges,
    // so the split ownership convention is oracle-checked too.
    Q(
      "ds2_docstore_nested",
      (s, _) =>
        s.read.format("docstore")
          .schema(graft.recipes.Schemas.recipeDoc)
          .option("splitSize", 1024)
          .load(s"$FixtureDir/recipes.jsonl")
          .select(col("recipe_id"), explode(col("ingredients")).as("i"))
          .select(
            col("recipe_id"),
            col("i.name").as("ing_name"),
            col("i.quantity").as("quantity"),
            col("i.unit").as("unit"))
          .orderBy("recipe_id", "ing_name", "quantity"),
      Some(s"""SELECT recipe_id, i.name AS ing_name,
              |  i.quantity AS quantity, i.unit AS unit
              |FROM (SELECT recipe_id, unnest(ingredients) AS i
              |      FROM read_json('$FixtureDir/recipes.jsonl',
              |        format='newline_delimited',
              |        columns={'recipe_id':'VARCHAR',
              |                 'ingredients':'STRUCT(name VARCHAR, quantity DOUBLE, unit VARCHAR)[]'}))
              |ORDER BY recipe_id, ing_name, quantity""".stripMargin),
      bench = false
    ),

    // DS3: the WRITE side round-trip — the documents table exported
    // through the connector's two-phase commit (rows → escaped JSONL
    // part files) and read back through its scan. The oracle reads the
    // ORIGINAL parquet table: export + re-import must be the identity,
    // including texts with embedded quotes/newlines. Reads sfDir (so it
    // scales), but the write dominates → bench=false like the sinks.
    Q(
      "ds3_docstore_roundtrip",
      (s, dir) => {
        val out = graft.TempDirs.create("graft_ds3").resolve("coll").toString
        graft.Tables(s, dir, "documents")
          .select(col("doc_id"), col("text"), col("lang"), col("source"))
          .write.format("docstore").mode("append").save(out)
        s.read.format("docstore")
          .schema(StructType(Seq(
            StructField("doc_id", LongType), StructField("text", StringType),
            StructField("lang", StringType), StructField("source", StringType))))
          .load(out)
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, text, lang, source
             |FROM documents ORDER BY doc_id""".stripMargin),
      bench = false
    ),

    // SM13: the docstore MICRO-BATCH tier end-to-end — the users
    // collection staged as a two-file landing, drained by a real
    // checkpointed AvailableNow run (one admitted file per batch via
    // the source's admission control), parquet sink read back. The
    // oracle reads the ORIGINAL fixture: streaming the collection
    // file-by-file must lose/duplicate nothing vs the one-shot read.
    Q(
      "sm13_docstore_stream",
      (s, _) => {
        import org.apache.spark.sql.functions._
        val root = graft.TempDirs.create("graft_sm13")
        val landing = root.resolve("landing")
        java.nio.file.Files.createDirectories(landing)
        val lines = java.nio.file.Files
          .readAllLines(java.nio.file.Paths.get(s"$FixtureDir/users.jsonl"))
        import scala.jdk.CollectionConverters._
        val (a, b) = lines.asScala.toSeq.splitAt(6)
        java.nio.file.Files.write(landing.resolve("batch-0.jsonl"),
          (a.mkString("\n") + "\n").getBytes("UTF-8"))
        java.nio.file.Files.write(landing.resolve("batch-1.jsonl"),
          (b.mkString("\n") + "\n").getBytes("UTF-8"))
        val out = root.resolve("out").toString
        val q = s.readStream.format("docstore")
          .schema(graft.recipes.Schemas.userDoc)
          .option("planMode", "cursor").option("pageSize", 4)
          .option("maxFilesPerTrigger", 1)
          .load(landing.toString)
          .writeStream.format("parquet")
          .option("path", out)
          .option("checkpointLocation", root.resolve("ckpt").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(out)
          .select(
            col("user_id"), col("username"), col("email"), col("role"),
            unix_micros(col("created_at")).as("created_us"))
          .orderBy("user_id")
      },
      Some(s"""SELECT user_id, username, email, role,
              |  epoch_us(created_at) AS created_us
              |FROM read_json('$FixtureDir/users.jsonl',
              |  format='newline_delimited',
              |  columns={'user_id':'VARCHAR','username':'VARCHAR',
              |           'email':'VARCHAR','role':'VARCHAR',
              |           'created_at':'TIMESTAMP WITH TIME ZONE'})
              |ORDER BY user_id""".stripMargin),
      bench = false
    )
  )
}

/** Jackson document → catalyst `InternalRow` for the REQUIRED schema
  * only — fields the projection pruned are never materialized. Missing
  * or null fields become SQL NULL (the document-store reality: schemas
  * are per-document).
  */
private[sources] object DocJson {

  def toRow(node: JsonNode, schema: StructType): InternalRow =
    new GenericInternalRow(schema.fields.map { f =>
      val child = node.get(f.name)
      if (child == null || child.isNull) null else convert(child, f.dataType)
    }.asInstanceOf[Array[Any]])

  /** The serialization inverse of [[toRow]] — catalyst `InternalRow` →
    * Jackson document. NULL fields are written as JSON null (the
    * document-store convention [[toRow]] reads back as SQL NULL);
    * timestamps round-trip micro-exactly through ISO-8601 UTC (the wire
    * format [[convert]] parses). Jackson escapes embedded newlines and
    * control characters, so every document stays one physical line —
    * the invariant the readers' line accounting depends on.
    */
  def fromRow(mapper: ObjectMapper, row: InternalRow,
      schema: StructType): com.fasterxml.jackson.databind.node.ObjectNode = {
    val node = mapper.createObjectNode()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (row.isNullAt(i)) node.putNull(f.name)
      else f.dataType match {
        case StringType  => node.put(f.name, row.getUTF8String(i).toString)
        case IntegerType => node.put(f.name, row.getInt(i))
        case LongType    => node.put(f.name, row.getLong(i))
        case DoubleType  => node.put(f.name, row.getDouble(i))
        case FloatType   => node.put(f.name, row.getFloat(i))
        case BooleanType => node.put(f.name, row.getBoolean(i))
        case TimestampType =>
          val us = row.getLong(i)
          node.put(f.name, java.time.Instant.EPOCH
            .plus(us, java.time.temporal.ChronoUnit.MICROS).toString)
        case st: StructType =>
          node.set[JsonNode](f.name, fromRow(mapper, row.getStruct(i, st.size), st))
        case ArrayType(el, _) =>
          val arr = node.putArray(f.name)
          val data = row.getArray(i)
          (0 until data.numElements()).foreach { j =>
            if (data.isNullAt(j)) arr.addNull()
            else el match {
              case StringType  => arr.add(data.getUTF8String(j).toString)
              case IntegerType => arr.add(data.getInt(j))
              case LongType    => arr.add(data.getLong(j))
              case DoubleType  => arr.add(data.getDouble(j))
              case FloatType   => arr.add(data.getFloat(j))
              case BooleanType => arr.add(data.getBoolean(j))
              case st: StructType =>
                arr.add(fromRow(mapper, data.getStruct(j, st.size), st))
              case other => throw new UnsupportedOperationException(
                s"docstore write: unsupported array element type $other")
            }
          }
        case other =>
          throw new UnsupportedOperationException(
            s"docstore write: unsupported type $other")
      }
    }
    node
  }

  private def convert(n: JsonNode, dt: DataType): Any = dt match {
    case StringType  => UTF8String.fromString(n.asText())
    case IntegerType => n.asInt()
    case LongType    => n.asLong()
    case DoubleType  => n.asDouble()
    case FloatType   => n.asDouble().toFloat
    case BooleanType => n.asBoolean()
    case TimestampType =>
      // ISO-8601 with offset (the wire format of every document store
      // export here) → UTC micros, TimestampType's storage contract
      val odt = java.time.OffsetDateTime.parse(n.asText())
      odt.toInstant.getEpochSecond * 1000000L + odt.getNano / 1000L
    case st: StructType => toRow(n, st)
    case ArrayType(el, _) =>
      val vals = new Array[Any](n.size())
      var i = 0
      while (i < n.size()) {
        val c = n.get(i)
        vals(i) = if (c == null || c.isNull) null else convert(c, el)
        i += 1
      }
      new GenericArrayData(vals)
    case other =>
      throw new UnsupportedOperationException(s"docstore: unsupported type $other")
  }
}
