package graft.pos.ingest

import graft.pos.{ExtractionError, Intervals}
import java.time.LocalDate

/** Driver-side ingestion connector (SURVEY S1–S5): the HTTP extraction
  * layer that lands raw report bytes in bronze before any Spark work.
  * Ingestion is NOT a Spark operator — one driver (or a small pool)
  * talks to the source system; Spark starts at the landed files.
  *
  * This environment has no egress, so the transport is an injected
  * function; everything around it — retry/backoff policy, export
  * response decoding (JSON-base64 vs attachment), download planning
  * over covered intervals — is real and tested, mirroring
  * `/root/reference/src/pos_core/etl/raw/extraction.py`.
  */
object Extraction {

  /** Exponential backoff schedule (extraction.py:335-344:
    * backoff_factor 0.8 → 0.8, 1.6, 3.2, …). */
  def backoffSchedule(retries: Int, factor: Double = 0.8): Seq[Double] =
    (0 until retries).map(i => factor * math.pow(2.0, i.toDouble))

  /** Retry on 429/5xx with backoff; other failures raise immediately
    * (extraction.py:313-356 policy). `sleep` injected for tests. */
  val RetryStatuses: Set[Int] = Set(429, 500, 502, 503, 504)

  def withRetry[A](retries: Int = 3, factor: Double = 0.8,
                   sleep: Double => Unit = s =>
                     Thread.sleep((s * 1000).toLong))
                  (call: () => Either[Int, A]): A = {
    val waits = backoffSchedule(retries, factor)
    var attempt = 0
    while (true) {
      call() match {
        case Right(a) => return a
        case Left(status) if RetryStatuses(status) && attempt < retries =>
          sleep(waits(attempt)); attempt += 1
        case Left(status) =>
          throw new ExtractionError(
            s"request failed with status $status after $attempt retries")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Filename from a Content-Disposition header
    * (extraction.py:712-714 + order_times tests). */
  def contentDispositionFilename(cd: String): Option[String] = {
    if (cd == null) return None
    val q = "filename\\*?=\"([^\"]+)\"".r
    val p = "filename\\*?=([^;\\s]+)".r
    q.findFirstMatchIn(cd).map(_.group(1))
      .orElse(p.findFirstMatchIn(cd).map(_.group(1)))
      .map(_.stripPrefix("UTF-8''"))
  }

  /** Export response decode: JSON `{"fileBase64": …}`, a direct
    * attachment, or — anything else — the reference's
    * unexpected-content-type raise with the body prefix for
    * diagnostics (extraction.py:702-720). The JSON fallback name is
    * UNDATED (`{report}.xlsx`, extraction.py:708) while the
    * attachment fallback is dated (`{report}_{start}_{end}.xlsx`,
    * :713) — the reference uses different defaults per branch, so
    * the two are separate parameters. The raise matters
    * operationally: an expired session answers the export POST with
    * 200 + an HTML login page, and without the guard that HTML would
    * be stored as a workbook and fail much later, far from the auth
    * fault. */
  def decodeExport(contentType: String, body: Array[Byte],
                   contentDisposition: String = "",
                   defaultName: String = "export.xlsx",
                   attachmentDefaultName: String = null)
      : (String, Array[Byte]) = {
    val ct = Option(contentType).getOrElse("").toLowerCase
    val cd = Option(contentDisposition).getOrElse("")
    if (ct.contains("application/json")) {
      val text = new String(body, java.nio.charset.StandardCharsets.UTF_8)
      val b64 = "\"fileBase64\"\\s*:\\s*\"([^\"]+)\"".r
        .findFirstMatchIn(text).map(_.group(1))
        .getOrElse(throw new ExtractionError(
          "export JSON missing 'fileBase64'"))
      // extraction.py:708 — the JSON may carry its own fileName
      val name = "\"fileName\"\\s*:\\s*\"([^\"]+)\"".r
        .findFirstMatchIn(text).map(_.group(1)).getOrElse(defaultName)
      (name, java.util.Base64.getDecoder.decode(b64))
    } else if (ct.contains("application/vnd") ||
        ct.contains("application/octet-stream") ||
        cd.toLowerCase.contains("attachment")) {
      val name = contentDispositionFilename(cd)
        .getOrElse(Option(attachmentDefaultName).getOrElse(defaultName))
      (name, body)
    } else {
      val preview = new String(body.take(300),
        java.nio.charset.StandardCharsets.UTF_8)
      throw new ExtractionError(
        s"Export returned unexpected content-type $ct. " +
          s"Body starts: $preview")
    }
  }

  /** Download plan: requested range minus already-covered intervals,
    * chunked to ≤ chunkDays per request (extraction.py:885-1039 +
    * utils.py:94-211). Pure planning — returns the chunks to fetch. */
  def planDownloads(start: LocalDate, end: LocalDate,
                    covered: Seq[(LocalDate, LocalDate)],
                    chunkDays: Int = 180): Seq[(LocalDate, LocalDate)] =
    Intervals.subtract((start, end), covered)
      .flatMap { case (s, e) => Intervals.iterChunks(s, e, chunkDays) }
}
