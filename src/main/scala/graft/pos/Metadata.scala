package graft.pos

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Stage-run manifests for idempotent, incremental pipelines —
  * `_meta/{start}_{end}.json` beside each stage's output
  * (`/root/reference/src/pos_core/etl/metadata.py:14-160`,
  * `payments/metadata.py:39-93`). Driver-side: manifests are tiny and
  * gate whether distributed work runs at all. The `failed` status is
  * written BEFORE a run and overwritten on success, so a crashed run
  * never masquerades as complete (etl/payments.py:105-117 semantics).
  */
final case class StageMetadata(startDate: String, endDate: String,
                               branches: Seq[String], version: String,
                               lastRun: String, status: String)

object StageMetadata {
  private def q(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def toJson(m: StageMetadata): String =
    s"""{"start_date": ${q(m.startDate)}, "end_date": ${q(m.endDate)}, """ +
      s""""branches": [${m.branches.map(q).mkString(", ")}], """ +
      s""""version": ${q(m.version)}, "last_run": ${q(m.lastRun)}, """ +
      s""""status": ${q(m.status)}}"""

  /** Minimal JSON field extraction (flat object, string/array values). */
  def fromJson(s: String): Option[StageMetadata] = {
    def str(k: String): Option[String] =
      ("\"" + k + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
        .findFirstMatchIn(s).map(_.group(1)
          .replace("\\\"", "\"").replace("\\\\", "\\"))
    def arr(k: String): Seq[String] =
      ("\"" + k + "\"\\s*:\\s*\\[([^\\]]*)\\]").r
        .findFirstMatchIn(s).map(_.group(1)).toSeq
        .flatMap("\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(_))
        .map(_.group(1))
    for {
      sd <- str("start_date"); ed <- str("end_date")
      v <- str("version"); lr <- str("last_run"); st <- str("status")
    } yield StageMetadata(sd, ed, arr("branches"), v, lr, st)
  }
}

final class StageManifests(stageDir: String) {
  private def metaDir: Path = Paths.get(stageDir, "_meta")
  private def pathFor(start: String, end: String): Path =
    metaDir.resolve(s"${start}_$end.json")

  def write(m: StageMetadata): Unit = {
    Files.createDirectories(metaDir)
    Files.writeString(pathFor(m.startDate, m.endDate),
      StageMetadata.toJson(m))
  }

  def read(start: String, end: String): Option[StageMetadata] = {
    val p = pathFor(start, end)
    if (Files.exists(p)) StageMetadata.fromJson(Files.readString(p))
    else None
  }

  def readAll(): Seq[StageMetadata] =
    if (!Files.exists(metaDir)) Nil
    else {
      val stream = Files.list(metaDir)
      try stream.iterator().asScala
        .filter(_.toString.endsWith(".json"))
        .flatMap(p => StageMetadata.fromJson(Files.readString(p)))
        .toSeq
      finally stream.close()
    }

  /** should_run_stage (payments/metadata.py:75-93): run unless an
    * exact-range manifest exists with status ok and matching version. */
  def shouldRun(start: String, end: String, version: String,
                force: Boolean = false): Boolean =
    force || !read(start, end).exists(m =>
      m.status == "ok" && m.version == version)

  /** Covered day-ranges with ok status + matching version — feeds
    * [[Intervals.subtract]] for gap-only downloads
    * (etl/utils.py:250-316). */
  def coveredIntervals(version: String)
      : Seq[(java.time.LocalDate, java.time.LocalDate)] =
    readAll().filter(m => m.status == "ok" && m.version == version)
      .map(m => (java.time.LocalDate.parse(m.startDate),
        java.time.LocalDate.parse(m.endDate)))

  /** Run `work` with crash-safe status handling: `failed` is on disk
    * while work executes; flipped to ok only on success. */
  def runStage[A](start: String, end: String, version: String,
                  branches: Seq[String], force: Boolean = false)
                 (work: => A): Option[A] = {
    if (!shouldRun(start, end, version, force)) None
    else {
      val now = java.time.Instant.now().toString
      write(StageMetadata(start, end, branches, version, now, "failed"))
      val result = work
      write(StageMetadata(start, end, branches, version,
        java.time.Instant.now().toString, "ok"))
      Some(result)
    }
  }
}
