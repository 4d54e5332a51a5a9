package graft.operators

import org.apache.spark.sql.functions._
import scala.util.Random

import graft.SparkSpec

/** The IVF maintenance loop: imbalance detection, transactional
  * retrain, maintained-equals-rebuilt, and recall that stays bounded
  * under append drift instead of degrading silently.
  */
class IvfMaintenanceSpec extends SparkSpec {

  import spark.implicits._

  private val dims = 64

  private def unit(v: Array[Double]): Array[Float] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(x => (x / n).toFloat)
  }

  /** Clustered corpus: 4 tight gaussian clusters — the shape where a
    * frozen arbitrary quantizer lumps members into few cells while
    * trained centroids dedicate cells per cluster.
    */
  private def clusteredRows(rnd: Random, perCluster: Int,
      idBase: Long): Seq[(Long, Array[Float])] = {
    val centers = (0 until 4).map(_ => Array.fill(dims)(rnd.nextGaussian()))
    centers.zipWithIndex.flatMap { case (c, ci) =>
      (0 until perCluster).map { j =>
        (idBase + ci * perCluster + j,
          unit(c.map(_ + 0.05 * rnd.nextGaussian())))
      }
    }
  }

  test("drift trips the threshold; retrain rebalances and is transactional") {
    val d = graft.TempDirs.create("ivfm")
    val (root, cents, tx) = (d.resolve("log").toString,
      d.resolve("cents").toString, d.resolve("tx").toString)
    val rnd = new Random(11)
    val np = 6
    // balanced-ish start, then a drift batch that clumps
    SnapshotLog.append(spark, root, Similarity.indexRows(spark,
      (0 until 200).map(i => (i.toLong,
        unit(Array.fill(dims)(rnd.nextGaussian())))).toDF("vec_id", "embedding"),
      np))
    val before = Similarity.cellImbalance(spark, root)
    Similarity.upsertIndex(spark, root, cents,
      clusteredRows(rnd, 100, 1000L).toDF("vec_id", "embedding"), np)
    val drifted = Similarity.cellImbalance(spark, root)
    assert(drifted > 1.5, s"drift corpus not skewed enough: $drifted")
    assert(Similarity.maintainIvf(spark, root, cents, tx, threshold = 1.5))
    val after = Similarity.cellImbalance(spark, root)
    assert(after < drifted,
      s"retrain must reduce imbalance: $drifted -> $after (start $before)")
    // the retrain was ONE transaction: both logs advanced, op recorded
    assert(SnapshotLog.operationOf(spark, root,
      SnapshotLog.currentId(spark, root)).startsWith("txn="))
    assert(SnapshotLog.currentId(spark, cents) > 0L)
  }

  test("below threshold the probe is a no-op") {
    val d = graft.TempDirs.create("ivfm_noop")
    val (root, cents, tx) = (d.resolve("log").toString,
      d.resolve("cents").toString, d.resolve("tx").toString)
    val rnd = new Random(12)
    SnapshotLog.append(spark, root, Similarity.indexRows(spark,
      (0 until 100).map(i => (i.toLong,
        unit(Array.fill(dims)(rnd.nextGaussian())))).toDF("vec_id", "embedding"), 6))
    val id = SnapshotLog.currentId(spark, root)
    assert(!Similarity.maintainIvf(spark, root, cents, tx, threshold = 1e9))
    assert(SnapshotLog.currentId(spark, root) == id, "no-op must not commit")
    assert(SnapshotLog.currentId(spark, cents) == 0L)
  }

  test("maintained search equals a from-scratch rebuild on the same centroids") {
    val d = graft.TempDirs.create("ivfm_eq")
    val (root, cents, tx) = (d.resolve("log").toString,
      d.resolve("cents").toString, d.resolve("tx").toString)
    val rnd = new Random(13)
    val np = 6
    val base = (0 until 150).map(i => (i.toLong,
      unit(Array.fill(dims)(rnd.nextGaussian()))))
    val drift = clusteredRows(rnd, 80, 1000L)
    SnapshotLog.append(spark, root,
      Similarity.indexRows(spark, base.toDF("vec_id", "embedding"), np))
    Similarity.upsertIndex(spark, root, cents,
      drift.toDF("vec_id", "embedding"), np)
    assert(Similarity.maintainIvf(spark, root, cents, tx, threshold = 1.3))
    // one more post-retrain batch — must assign by the NEW generation
    val late = clusteredRows(new Random(14), 20, 5000L)
    Similarity.upsertIndex(spark, root, cents,
      late.toDF("vec_id", "embedding"), np)
    val got = Similarity.maintainedIvfTopK(spark, root, cents,
      numQueries = 20, topK = 3)
    // rebuild from scratch with the SAME stored centroids
    val storedCents = Similarity.maintainedCentroids(spark, cents).get
    val rebuilt = Similarity.prepareTrained(spark,
      (base ++ drift ++ late).toDF("vec_id", "embedding"), storedCents, np)
    val want = Similarity.ivfTopKTrained(rebuilt, storedCents,
      numQueries = 20, topK = 3)
    assert(rowSet(got) === rowSet(want),
      "maintained index must answer exactly like a rebuilt one")
  }

  test("partial maintenance splits only hot cells; every prior file carried byte-identical") {
    import org.apache.hadoop.fs.Path
    val d = graft.TempDirs.create("ivfm_part")
    val (root, cents) = (d.resolve("log").toString, d.resolve("cents").toString)
    val rnd = new Random(16)
    val np = 6
    SnapshotLog.append(spark, root, Similarity.indexRows(spark,
      (0 until 200).map(i => (i.toLong,
        unit(Array.fill(dims)(rnd.nextGaussian())))).toDF("vec_id", "embedding"), np))
    Similarity.upsertIndex(spark, root, cents,
      clusteredRows(rnd, 80, 1000L).toDF("vec_id", "embedding"), np)
    // partial mode refuses before a trained generation exists
    intercept[IllegalStateException] {
      Similarity.maintainIvfPartial(spark, root, cents,
        d.resolve("tx0").toString)
    }
    assert(Similarity.maintainIvf(spark, root, cents,
      d.resolve("tx1").toString, threshold = 1.3))
    val k0 = Similarity.maintainedCentroids(spark, cents).get.length
    // ONE tight new cluster — all its rows land in one trained cell
    val center = Array.fill(dims)(rnd.nextGaussian())
    Similarity.upsertIndex(spark, root, cents,
      (0 until 300).map(i => (5000L + i,
        unit(center.map(_ + 0.03 * rnd.nextGaussian()))))
        .toDF("vec_id", "embedding"), np)
    val hotImb = Similarity.cellImbalance(spark, root, k = k0)
    assert(hotImb > 2.0, s"hot batch must skew one cell: $hotImb")
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val beforeId = SnapshotLog.currentId(spark, root)
    val beforeFiles = SnapshotLog.snapshot(spark, root, beforeId).files
    val stamps = beforeFiles.map(f => f.path ->
      fs.getFileStatus(new Path(s"$root/${f.path}")).getModificationTime).toMap
    val content0 = rowSet(SnapshotLog.read(spark, root)
      .select("vec_id", "nrm", "bucket"))
    // below threshold: bounded-aggregation no-op
    assert(Similarity.maintainIvfPartial(spark, root, cents,
      d.resolve("txn").toString, threshold = 1e9).isEmpty)
    assert(SnapshotLog.currentId(spark, root) == beforeId)
    val split = Similarity.maintainIvfPartial(spark, root, cents,
      d.resolve("tx2").toString, threshold = 2.0)
    assert(split.nonEmpty && split.size < k0,
      s"only the hot cells split, got $split of $k0")
    // EVERY pre-split data file is carried, byte-untouched (MoR replace:
    // rewrite bytes are the hot rows + their delete vector, never the table)
    val afterFiles = SnapshotLog.snapshot(spark, root,
      SnapshotLog.currentId(spark, root)).files
    assert(beforeFiles.map(_.path).toSet.subsetOf(afterFiles.map(_.path).toSet))
    beforeFiles.foreach { f =>
      assert(fs.getFileStatus(new Path(s"$root/${f.path}"))
        .getModificationTime == stamps(f.path), s"${f.path} was rewritten")
    }
    // the split was ONE transaction: index + centroid table flip together
    assert(SnapshotLog.operationOf(spark, root,
      SnapshotLog.currentId(spark, root)).startsWith("txn="))
    val gen = Similarity.maintainedCentroids(spark, cents).get
    assert(gen.length == k0 + split.size, "each split adds one dense cell id")
    // rows preserved exactly (only `cell` may change, only in hot cells)
    assert(rowSet(SnapshotLog.read(spark, root)
      .select("vec_id", "nrm", "bucket")) == content0)
    val cellsNow = SnapshotLog.read(spark, root).select("cell").distinct()
      .collect().map(_.get(0).asInstanceOf[Number].longValue).toSet
    assert(cellsNow.forall(c => c >= 1 && c <= gen.length))
    assert(split.forall(c => cellsNow.contains(k0 + split.indexOf(c) + 1) ||
      cellsNow.contains(c)), "split children must be populated")
    // imbalance over the NEW cell count improved
    val afterImb = Similarity.cellImbalance(spark, root, k = gen.length)
    assert(afterImb < hotImb * gen.length / k0.toDouble,
      s"split must reduce per-cell load: $hotImb -> $afterImb")
    // a later upsert assigns by the post-split generation
    Similarity.upsertIndex(spark, root, cents,
      (0 until 10).map(i => (9000L + i,
        unit(center.map(_ + 0.03 * rnd.nextGaussian()))))
        .toDF("vec_id", "embedding"), np)
    val lateCells = SnapshotLog.read(spark, root)
      .filter(col("vec_id") >= 9000L).select("cell").distinct()
      .collect().map(_.get(0).asInstanceOf[Number].longValue).toSet
    assert(lateCells.forall(c => c >= 1 && c <= gen.length))
    // search still runs over the split generation and finds planted rows
    val got = Similarity.maintainedIvfTopK(spark, root, cents,
      numQueries = 10, topK = 3)
    assert(got.count() > 0)
  }

  test("post-drift recall stays bounded after maintenance") {
    val d = graft.TempDirs.create("ivfm_recall")
    val (root, cents, tx) = (d.resolve("log").toString,
      d.resolve("cents").toString, d.resolve("tx").toString)
    val rnd = new Random(15)
    val np = 6
    val nQ = 40
    // queries + planted twins live in the DRIFT clusters — exactly the
    // region a frozen quantizer serves worst
    val centers = (0 until 4).map(_ => Array.fill(dims)(rnd.nextGaussian()))
    val queries = (0 until nQ).map { q =>
      (q.toLong, unit(centers(q % 4).map(_ + 0.05 * rnd.nextGaussian()))) }
    val twins = queries.map { case (q, e) =>
      (1000L + q, unit(e.map(_.toDouble + 0.002 * rnd.nextGaussian()))) }
    val noise = (0 until 300).map(i => (2000L + i,
      unit(Array.fill(dims)(rnd.nextGaussian()))))
    SnapshotLog.append(spark, root, Similarity.indexRows(spark,
      (queries ++ noise).toDF("vec_id", "embedding"), np))
    Similarity.upsertIndex(spark, root, cents,
      twins.toDF("vec_id", "embedding"), np)
    Similarity.maintainIvf(spark, root, cents, tx, threshold = 1.2)
    val found = Similarity.maintainedIvfTopK(spark, root, cents, nQ, topK = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = (0 until nQ).count(q => found.get(q.toLong).contains(1000L + q))
    val recall = hits.toDouble / nQ
    assert(recall >= 0.8,
      s"post-maintenance planted-twin recall $recall ($hits/$nQ)")
  }
}
