package graft.pos.ingest

import graft.pos.ExtractionError
import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite

/** Connector logic without a network: retry policy, export decoding,
  * download planning (extraction.py parity, order_times tests tier). */
class ExtractionSpec extends AnyFunSuite {
  private def d(s: String) = LocalDate.parse(s)

  test("backoff schedule is 0.8, 1.6, 3.2 (factor * 2^i)") {
    assert(Extraction.backoffSchedule(3) == Seq(0.8, 1.6, 3.2))
  }

  test("withRetry: retries on 503 then succeeds; sleeps the schedule") {
    var calls = 0
    val slept = scala.collection.mutable.ListBuffer.empty[Double]
    val out = Extraction.withRetry[String](retries = 3,
      sleep = slept += _) { () =>
      calls += 1
      if (calls < 3) Left(503) else Right("ok")
    }
    assert(out == "ok" && calls == 3)
    assert(slept.toList == List(0.8, 1.6))
  }

  test("withRetry: non-retryable status raises immediately") {
    var calls = 0
    val e = intercept[ExtractionError] {
      Extraction.withRetry[String](sleep = _ => ()) { () =>
        calls += 1; Left(401)
      }
    }
    assert(calls == 1 && e.getMessage.contains("401"))
  }

  test("withRetry: exhausted retries raise") {
    var calls = 0
    intercept[ExtractionError] {
      Extraction.withRetry[String](retries = 2, sleep = _ => ()) { () =>
        calls += 1; Left(500)
      }
    }
    assert(calls == 3) // initial + 2 retries
  }

  test("content-disposition filename: quoted, bare, RFC 5987") {
    assert(Extraction.contentDispositionFilename(
      """attachment; filename="Pagos_2025.xlsx"""")
      .contains("Pagos_2025.xlsx"))
    assert(Extraction.contentDispositionFilename(
      "attachment; filename=report.xlsx").contains("report.xlsx"))
    assert(Extraction.contentDispositionFilename(
      "attachment; filename*=UTF-8''Caf%C3%A9.xlsx")
      .contains("Caf%C3%A9.xlsx"))
    assert(Extraction.contentDispositionFilename("attachment").isEmpty)
  }

  test("decodeExport: JSON base64 vs direct attachment") {
    val payload = "xlsx-bytes".getBytes
    val b64 = java.util.Base64.getEncoder.encodeToString(payload)
    val (n1, b1) = Extraction.decodeExport("application/json; charset=utf-8",
      s"""{"fileBase64": "$b64"}""".getBytes, defaultName = "x.xlsx")
    assert(n1 == "x.xlsx" && b1.sameElements(payload))
    val (n2, b2) = Extraction.decodeExport("application/octet-stream",
      payload, """attachment; filename="r.xlsx"""")
    assert(n2 == "r.xlsx" && b2.sameElements(payload))
    intercept[ExtractionError] {
      Extraction.decodeExport("application/json", "{}".getBytes)
    }
    // attachment disposition alone (no vnd/octet-stream ct) still
    // routes to the attachment branch (extraction.py:713)
    val (n3, _) = Extraction.decodeExport("text/plain", payload,
      """attachment; filename="a.xlsx"""")
    assert(n3 == "a.xlsx")
    // the dated default applies ONLY to the attachment branch
    val (n4, _) = Extraction.decodeExport("application/vnd.ms-excel",
      payload, "", defaultName = "R.xlsx",
      attachmentDefaultName = "R_2025-01-01_2025-01-07.xlsx")
    assert(n4 == "R_2025-01-01_2025-01-07.xlsx")
  }

  test("decodeExport: HTML response raises at the fault site " +
    "(expired session must not be stored as a workbook)") {
    val html = "<html><title>Login</title>…".getBytes("UTF-8")
    val e = intercept[ExtractionError] {
      Extraction.decodeExport("text/html; charset=utf-8", html)
    }
    assert(e.getMessage.contains("unexpected content-type text/html"))
    assert(e.getMessage.contains("<title>Login</title>"))
  }

  test("planDownloads: gaps only, chunked to 180 days") {
    val plan = Extraction.planDownloads(d("2024-01-01"), d("2025-06-30"),
      covered = Seq((d("2024-03-01"), d("2024-04-30"))))
    // gap 1: 2024-01-01..2024-02-29 (60 d); gap 2: 2024-05-01..2025-06-30
    assert(plan.head == (d("2024-01-01"), d("2024-02-29")))
    assert(plan.tail.head._1 == d("2024-05-01"))
    assert(plan.last._2 == d("2025-06-30"))
    assert(plan.forall { case (s, e) =>
      e.toEpochDay - s.toEpochDay < 180 })
    // fully covered → empty plan
    assert(Extraction.planDownloads(d("2024-03-05"), d("2024-04-01"),
      Seq((d("2024-03-01"), d("2024-04-30")))).isEmpty)
  }
}
