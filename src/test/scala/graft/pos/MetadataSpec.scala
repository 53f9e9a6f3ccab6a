package graft.pos

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Manifest round-trip + idempotence semantics (metadata.py parity). */
class MetadataSpec extends AnyFunSuite {

  private def tmpDir(): String =
    Files.createTempDirectory("stage").toString

  test("manifest round-trips through JSON") {
    val m = StageMetadata("2025-01-01", "2025-01-31",
      Seq("Kavia", "Nativa"), "cleaner_v1", "2025-02-01T00:00:00Z", "ok")
    assert(StageMetadata.fromJson(StageMetadata.toJson(m)).contains(m))
  }

  test("shouldRun: missing, failed, version-mismatch, force") {
    val man = new StageManifests(tmpDir())
    assert(man.shouldRun("2025-01-01", "2025-01-31", "v1"))
    man.write(StageMetadata("2025-01-01", "2025-01-31", Seq("K"),
      "v1", "now", "ok"))
    assert(!man.shouldRun("2025-01-01", "2025-01-31", "v1"))       // skip
    assert(man.shouldRun("2025-01-01", "2025-01-31", "v2"))        // version
    assert(man.shouldRun("2025-01-01", "2025-01-31", "v1", force = true))
    man.write(StageMetadata("2025-02-01", "2025-02-28", Seq("K"),
      "v1", "now", "failed"))
    assert(man.shouldRun("2025-02-01", "2025-02-28", "v1"))        // failed
  }

  test("runStage: executes once, skips when covered, crash leaves failed") {
    val man = new StageManifests(tmpDir())
    var runs = 0
    val r1 = man.runStage("2025-01-01", "2025-01-31", "v1", Seq("K")) {
      runs += 1; "done" }
    assert(r1.contains("done") && runs == 1)
    val r2 = man.runStage("2025-01-01", "2025-01-31", "v1", Seq("K")) {
      runs += 1; "again" }
    assert(r2.isEmpty && runs == 1) // idempotent skip
    // crash: status stays failed → next run re-executes
    intercept[RuntimeException] {
      man.runStage("2025-03-01", "2025-03-31", "v1", Seq("K")) {
        throw new RuntimeException("boom") }
    }
    assert(man.read("2025-03-01", "2025-03-31").get.status == "failed")
    assert(man.shouldRun("2025-03-01", "2025-03-31", "v1"))
  }

  test("coveredIntervals feeds interval subtraction for gap downloads") {
    val man = new StageManifests(tmpDir())
    man.write(StageMetadata("2025-01-01", "2025-01-10", Seq("K"),
      "v1", "now", "ok"))
    man.write(StageMetadata("2025-01-20", "2025-01-25", Seq("K"),
      "v1", "now", "ok"))
    man.write(StageMetadata("2025-01-11", "2025-01-19", Seq("K"),
      "v2", "now", "ok")) // wrong version → not covered
    val gaps = Intervals.subtract(
      (java.time.LocalDate.parse("2025-01-01"),
        java.time.LocalDate.parse("2025-01-31")),
      man.coveredIntervals("v1"))
    assert(gaps == Seq(
      (java.time.LocalDate.parse("2025-01-11"),
        java.time.LocalDate.parse("2025-01-19")),
      (java.time.LocalDate.parse("2025-01-26"),
        java.time.LocalDate.parse("2025-01-31"))))
  }
}
