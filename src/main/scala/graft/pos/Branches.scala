package graft.pos

import java.time.LocalDate

/** SCD2-style branch registry with validity windows, mirroring
  * `/root/reference/src/pos_core/etl/branch_config.py:20-88` and the
  * as-of resolution in `branches.py:60-127`.
  *
  * The registry is tiny (≈10 rows): kept as driver-side data and
  * broadcast when joined against facts (SURVEY J5).
  */
final case class CodeWindow(branch: String, code: String,
                            validFrom: LocalDate,
                            validTo: Option[LocalDate]) {
  def containsDate(d: LocalDate): Boolean =
    !d.isBefore(validFrom) && validTo.forall(!d.isAfter(_))
  /** `Kavia_OLD` → logical `Kavia` (branch_config.py:68-69). */
  def logicalName: String = branch.split("_")(0)
}

final class BranchRegistry(val windows: Seq[CodeWindow],
                           excluded: Set[String] = Set("CEDIS")) {
  def active: Seq[CodeWindow] =
    windows.filterNot(w => excluded.contains(w.logicalName))

  /** Branch name + date → code valid on that date (branches.py:60-100). */
  def codeFor(branch: String, d: LocalDate): Option[String] =
    active.filter(_.logicalName == branch)
      .find(_.containsDate(d)).map(_.code)

  /** Date → all codes valid on it (branches.py:103-127). */
  def codesOn(d: LocalDate): Map[String, String] =
    active.filter(_.containsDate(d))
      .map(w => w.logicalName -> w.code).toMap

  def logicalNames: Seq[String] = active.map(_.logicalName).distinct
}

object Branches {
  /** `sucursales.json` → registry (`branch_config.py:37-95`): each
    * top-level key is a branch segment (`Kavia_OLD` → logical
    * `Kavia`), with `code` (string or number — the reference str()s
    * it), `valid_from`, and optional/null `valid_to`. Flat two-level
    * shape, so the same minimal regex extraction as
    * [[StageMetadata.fromJson]]. */
  def loadSucursalesJson(path: java.nio.file.Path): BranchRegistry = {
    val text = java.nio.file.Files.readString(path)
    val entry = """"([^"]+)"\s*:\s*\{([^}]*)\}""".r
    val windows = entry.findAllMatchIn(text).map { m =>
      val key = m.group(1)
      val body = m.group(2)
      def fld(k: String): Option[String] =
        ("\"" + k + "\"\\s*:\\s*(?:\"([^\"]*)\"|(null|[0-9.]+))").r
          .findFirstMatchIn(body)
          .flatMap(mm => Option(mm.group(1)).orElse(Option(mm.group(2))))
          .filter(_ != "null")
      def req(k: String): String = fld(k).getOrElse(throw new ConfigError(
        s"sucursales.json entry '$key' is missing '$k'"))
      CodeWindow(key, req("code"), LocalDate.parse(req("valid_from")),
        fld("valid_to").map(LocalDate.parse))
    }.toSeq
    new BranchRegistry(windows)
  }
}
