package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The scratch/staged lifecycle contract the harnesses rely on:
  * tracked dirs die on sweep, staged dirs survive it, the staging
  * marker makes half-written artifacts self-healing, and sweep actions
  * run exactly once.
  */
class TempDirsSpec extends AnyFunSuite {

  test("create() is tracked and reclaimed by sweep; staged dirs survive the sweep") {
    val scratch = TempDirs.create("graft_tds_scratch")
    Files.writeString(scratch.resolve("f.txt"), "x")
    var writes = 0
    val staged = TempDirs.staged("tds_survivor") { p =>
      writes += 1
      Files.writeString(p.resolve("data.txt"), "payload")
    }
    TempDirs.sweep()
    assert(!Files.exists(scratch), "tracked scratch must not survive sweep")
    assert(Files.exists(staged.resolve("data.txt")), "staged must survive sweep")
    assert(writes === 1)
  }

  test("staged(): marker-present content is reused; a missing marker restages") {
    var writes = 0
    def stage() = TempDirs.staged("tds_marker") { p =>
      writes += 1
      Files.writeString(p.resolve("v.txt"), s"w$writes")
    }
    val p = stage()
    stage() // marker present -> no rewrite
    assert(writes === 1)
    assert(Files.readString(p.resolve("v.txt")) === "w1")
    // a crash mid-write leaves content without the marker: the next
    // caller must distrust and rebuild it
    Files.delete(p.resolve("_GRAFT_STAGED"))
    Files.writeString(p.resolve("v.txt"), "torn")
    stage()
    assert(writes === 2)
    assert(Files.readString(p.resolve("v.txt")) === "w2")
  }

  test("a failed staging write leaves no marker, so the next attempt retries") {
    intercept[RuntimeException] {
      TempDirs.staged("tds_fail")(_ => throw new RuntimeException("boom"))
    }
    var ran = false
    val p = TempDirs.staged("tds_fail") { q =>
      ran = true
      Files.writeString(q.resolve("ok.txt"), "ok")
    }
    assert(ran, "second attempt must re-run the write")
    assert(Files.exists(p.resolve("ok.txt")))
  }

  test("onSweep actions fire once and tolerate failures") {
    var fired = 0
    TempDirs.onSweep(() => fired += 1)
    TempDirs.onSweep(() => throw new RuntimeException("cleanup failed"))
    TempDirs.sweep() // must not throw
    TempDirs.sweep() // actions cleared: no double fire
    assert(fired === 1)
  }
}
