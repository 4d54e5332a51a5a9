package graft.streaming

import java.nio.file.attribute.FileTime
import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame

/** Shared TEST staging helper: land a batch DataFrame as one parquet
  * file named `batch-NNN` with a strictly increasing mtime, so the
  * file stream source (ordered by modification time) replays staged
  * batches in sequence under maxFilesPerTrigger=1 — the same
  * convention as StreamingQueries' production-side staging. One
  * definition for every streaming spec, so the replay-ordering
  * convention cannot drift between tests and the paths they validate.
  */
object ReplayStaging {
  def stage(landing: Path, i: Int, df: DataFrame): Unit = {
    val tmp = Files.createTempDirectory(s"replay_stage_$i")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val listing = Files.list(tmp)
    val part =
      try listing.filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
      finally listing.close()
    val dest = landing.resolve(f"batch-$i%03d.parquet")
    Files.move(part, dest)
    Files.setLastModifiedTime(dest,
      FileTime.fromMillis(1000000000000L + i * 60000L))
  }
}
