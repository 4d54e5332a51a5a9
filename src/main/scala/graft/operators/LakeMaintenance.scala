package graft.operators

import graft.{Q, Tables}
import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Lake maintenance: small-file compaction — the pass every real
  * partitioned lake runs nightly. Streaming ingests, incremental loads
  * and over-parallel writers (every task emits a file per partition
  * value it touches) leave partition directories full of KB-scale
  * files; at 100 TB that means scan task counts in the millions,
  * NameNode/object-store listing pressure, and per-file open overhead
  * dominating I/O. Compaction rewrites each partition directory to
  * `ceil(bytes / targetFileSize)` files.
  *
  * Scale shape: the unit of work is ONE PARTITION DIRECTORY — sizes come
  * from a filesystem listing (no data read to plan), each rewrite is a
  * round-robin `repartition(n)` of just that directory (n tasks → n
  * files, no skew by construction), and directories are independent, so
  * a production run fans partition rewrites out concurrently (a job
  * pool) and can checkpoint progress per partition. Rewriting into a
  * fresh directory + atomic swap is the crash-safe deployment pattern;
  * table formats with a transaction log (the lineage of this operator)
  * commit the same rewrite as a metadata swap.
  *
  * Reference anchor: the reference's warehouse loads are
  * WRITE_TRUNCATE-per-table (`bigquery_loader_function/main.py:36-45`)
  * — full rewrites sidestep fragmentation at its scale; this is the
  * operator that restores that property to an incrementally-built lake.
  */
object LakeMaintenance {

  /** One partition directory's compaction accounting. */
  final case class PartitionCompaction(
      partition: String, inputFiles: Long, inputBytes: Long, outputFiles: Int)

  /** Compact `inDir` (a parquet lake laid out as `partitionCols`
    * key=value directories; Nil = unpartitioned) into `outDir` with
    * files of ~`targetFileSizeBytes`. Returns per-partition accounting.
    */
  def compact(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetFileSizeBytes: Long,
      partitionCols: Seq[String] = Nil): Seq[PartitionCompaction] = {
    require(targetFileSizeBytes > 0, "targetFileSizeBytes must be positive")
    val conf = spark.sparkContext.hadoopConfiguration
    val in = new Path(inDir)
    val fs = in.getFileSystem(conf)
    def leafDirs(p: Path, depth: Int): Seq[Path] =
      if (depth == 0) Seq(p)
      else fs.listStatus(p).toSeq.filter(_.isDirectory)
        .flatMap(d => leafDirs(d.getPath, depth - 1))
    leafDirs(in, partitionCols.size).sortBy(_.toString).map { dir =>
      val files = fs.listStatus(dir).toSeq
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      val bytes = files.map(_.getLen).sum
      val n = math.max(1L, (bytes + targetFileSizeBytes - 1) / targetFileSizeBytes).toInt
      val rel = in.toUri.relativize(dir.toUri).toString.stripSuffix("/")
      val dest = if (rel.isEmpty) outDir else s"$outDir/$rel"
      spark.read.parquet(dir.toString)
        .repartition(n)
        .write.mode("overwrite").option("compression", "zstd").parquet(dest)
      PartitionCompaction(if (rel.isEmpty) "." else rel, files.size, bytes, n)
    }
  }

  /** Cluster a lake by a sort key: `repartitionByRange(n, keys)` +
    * `sortWithinPartitions` gives every output file a DISJOINT key range
    * (range exchange assigns non-overlapping key intervals to tasks), so
    * parquet column min/max statistics — per file footer and per row
    * group — let a selective reader skip everything but the files whose
    * interval contains the predicate. This is the sorted-clustering pass
    * (the 1-D case of z-ordering) run alongside compaction: compaction
    * fixes FILE COUNT, clustering fixes FILE RELEVANCE.
    * LakeMaintenanceSpec asserts the written footers' ranges really are
    * disjoint; the lk2 registry query proves content preservation.
    */
  def clusterBy(
      df: org.apache.spark.sql.DataFrame,
      outDir: String,
      numFiles: Int,
      partitionKeys: Seq[org.apache.spark.sql.Column],
      sortKeys: Seq[org.apache.spark.sql.Column] = Nil): Unit =
    // range-partition on partitionKeys ONLY: a composite range key would
    // let one partition-key value straddle a file boundary, breaking the
    // one-file-per-predicate property; sortKeys refine order inside each
    // file for row-group locality
    df.repartitionByRange(numFiles, partitionKeys: _*)
      .sortWithinPartitions(partitionKeys ++ sortKeys: _*)
      .write.mode("overwrite").option("compression", "zstd").parquet(outDir)

  /** LK1: fragment → compact → prove content preservation. The query
    * stages the documents table as a lang-partitioned lake written by 48
    * over-parallel tasks (the fragmentation every incremental ingest
    * produces), compacts it to target size, and returns the compacted
    * lake's CONTENT (doc_id, lang, source, md5(text)) — which must equal
    * the source table exactly, the invariant that makes compaction safe
    * to run under live readers. File-count arithmetic is asserted in
    * LakeMaintenanceSpec (filesystem facts aren't SQL-oracle-expressible).
    */
  val all: Seq[Q] = Seq(
    Q(
      "lk1_compaction",
      (s, dir) => {
        val root = Files.createTempDirectory("graft_lk1")
        val frag = root.resolve("fragmented").toString
        val compacted = root.resolve("compacted").toString
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("text"), col("source"), col("lang"))
          .repartition(48)
          .write.partitionBy("lang").parquet(frag)
        compact(s, frag, compacted, targetFileSizeBytes = 4L << 20,
          partitionCols = Seq("lang"))
        s.read.parquet(compacted)
          .select(
            col("doc_id"),
            col("lang").cast("string").as("lang"),
            col("source"),
            md5(col("text")).as("text_md5"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang, source, md5(text) AS text_md5
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    // LK2: sort-clustered rewrite — events re-laid-out by user_id so a
    // per-user read touches one file instead of all of them. Content
    // preservation is the oracle-checked invariant; the disjoint
    // per-file key ranges (the thing that makes the layout useful) are
    // asserted from the parquet footers in LakeMaintenanceSpec.
    Q(
      "lk2_cluster_layout",
      (s, dir) => {
        val root = Files.createTempDirectory("graft_lk2")
        val out = root.resolve("clustered").toString
        clusterBy(
          Tables(s, dir, "events").select("event_id", "user_id", "event_type", "value"),
          out, numFiles = 8, Seq(col("user_id")), Seq(col("event_id")))
        s.read.parquet(out)
          .select("event_id", "user_id", "event_type", "value")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, event_type, value
             |FROM events ORDER BY event_id""".stripMargin)
    )
  )
}
