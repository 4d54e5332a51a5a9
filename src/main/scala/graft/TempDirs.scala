package graft

import java.nio.file.{Files, Path, Paths}

/** Tracks the scratch directories the registry queries materialize
  * (fragmented/compacted lakes, streaming landing+checkpoint trees,
  * staged chunk files) so harnesses can reclaim them deterministically —
  * the disk-side twin of [[CacheScope]]. Before this existed, every
  * Verify/Bench sweep left its lake rewrites under /tmp (measured: 1600+
  * orphaned directories after six rounds), which on a shared box turns
  * into filesystem pressure that the bench then mis-attributes to the
  * queries themselves.
  *
  * Two lifetimes:
  *
  *   - [[create]]: per-query scratch. Swept by [[sweep]] (Bench between
  *     timed queries, Verify after each dump) once the query's result
  *     has been fully materialized.
  *   - [[staged]]: session-lifetime derived artifacts keyed by content
  *     (e.g. st3's partitioned lake, st4's bucketed tables, lk1's
  *     fragmented input), deterministic per key, written once behind a
  *     completion marker and reused by reruns. Deleted only at JVM exit.
  *
  * A JVM shutdown hook sweeps both lists as a backstop for ad-hoc
  * sessions (spec runs, notebooks) that never call [[sweep]]. A SIGKILL
  * skips the hook; the marker protocol makes a half-written staged dir
  * self-healing (no marker → deleted and restaged on next use).
  */
object TempDirs {

  private val tracked = scala.collection.mutable.ArrayBuffer.empty[Path]
  private val stagedDirs = scala.collection.mutable.ArrayBuffer.empty[Path]
  private val sweepActions = scala.collection.mutable.ArrayBuffer.empty[() => Unit]
  private var hooked = false

  private def ensureHook(): Unit =
    if (!hooked) {
      hooked = true
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        sweep()
        stagedDirs.synchronized(stagedDirs.toList).foreach(deleteRecursively)
      }))
    }

  /** New tracked scratch dir; reclaimed by the next [[sweep]]. */
  def create(prefix: String): Path = synchronized {
    ensureHook()
    val p = Files.createTempDirectory(prefix)
    tracked += p
    p
  }

  /** Register extra cleanup to run on the next [[sweep]] (e.g. dropping
    * a catalog table whose backing files a tracked dir holds).
    */
  def onSweep(f: () => Unit): Unit = synchronized { sweepActions += f }

  /** Delete every tracked scratch dir and run registered actions. Only
    * call once the DataFrames produced from those dirs are fully
    * materialized (the harness contract: consume, then sweep).
    */
  def sweep(): Unit = {
    val (dirs, actions) = synchronized {
      val d = tracked.toList
      val a = sweepActions.toList
      tracked.clear()
      sweepActions.clear()
      (d, a)
    }
    actions.foreach(a => try a() catch { case _: Throwable => () })
    dirs.foreach(deleteRecursively)
  }

  /** Session-lifetime staged artifact dir for `key`: if the completion
    * marker is present the existing content is reused (staging is keyed
    * by a digest of its inputs, so content is deterministic per key);
    * otherwise any partial leftovers are deleted and `write` re-runs.
    * The marker lands only after `write` returns, so a crash mid-write
    * leaves a dir the next caller restages rather than trusts.
    */
  def staged(key: String)(write: Path => Unit): Path = synchronized {
    ensureHook()
    val p = Paths.get(sys.props("java.io.tmpdir"), s"graft_staged_$key")
    val marker = p.resolve("_GRAFT_STAGED")
    if (!Files.exists(marker)) {
      deleteRecursively(p)
      Files.createDirectories(p)
      write(p)
      Files.createFile(marker)
    }
    stagedDirs.synchronized { if (!stagedDirs.contains(p)) stagedDirs += p }
    p
  }

  /** Tracked + staged counts (test/diagnostic hook). */
  def size: (Int, Int) = synchronized((tracked.size, stagedDirs.size))

  /** Short content key for a source directory — the digest staged-artifact
    * keys embed so a warm-up sweep at one SF can never leave artifacts a
    * measured sweep at another SF silently reuses.
    */
  def dirKey(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      try {
        val all = Files.walk(p).iterator().asScala.toSeq.reverse
        all.foreach(f => try Files.deleteIfExists(f) catch { case _: Throwable => () })
      } catch { case _: Throwable => () }
    }
}
