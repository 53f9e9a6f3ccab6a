package graft.pos.ingest

import scala.collection.mutable.ListBuffer

import graft.pos.ExtractionError
import graft.pos.ingest.Login._
import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite

/** S2/S3 without a network: CSRF scraping over canned fixture pages,
  * login-form discovery/field selection, and the full
  * login → token → warm-up → export choreography against scripted
  * transports (extraction.py:204-305,359-401,418-593,625-720 parity). */
class LoginSpec extends AnyFunSuite {

  // ------------------------------------------------------- fixtures
  private val loginPage =
    """<html><head><title>Log On</title></head><body>
      |<form action="/Account/LogOn" method="post">
      |  <input name="__RequestVerificationToken" type="hidden"
      |         value="tok-login-123"/>
      |  <input name="UserName" type="text" value=""/>
      |  <input name="Password" type="password" value=""/>
      |  <input name="ReturnUrl" type="hidden" value=""/>
      |  <input type="submit" value="Entrar"/>
      |</form></body></html>""".stripMargin

  private val reportPage =
    """<html><head><title>Consolidated</title></head><body>
      |<input name="__RequestVerificationToken" type="hidden"
      |       value="tok-report-456"/>
      |</body></html>""".stripMargin

  private val noTokenPage =
    """<html><head><title>Broken Page</title></head>
      |<body><p>no antiforgery here</p></body></html>""".stripMargin

  // ---------------------------------------------- CSRF token lookup
  test("csrfFromHtml: named input, single-quoted and bare values") {
    assert(csrfFromHtml(loginPage).contains("tok-login-123"))
    assert(csrfFromHtml(
      "<input name='__RequestVerificationToken' value='sq'/>")
      .contains("sq"))
    assert(csrfFromHtml(
      "<input name=__RequestVerificationToken value=bare>")
      .contains("bare"))
  }

  test("csrfFromHtml precedence: named input beats meta beats hidden") {
    val all =
      """<meta name="__RequestVerificationToken" content="from-meta"/>
        |<input type="hidden" id="MyVerificationToken" value="from-hidden"/>
        |<input name="__RequestVerificationTokenWith" value="from-with"/>
        |""".stripMargin
    assert(csrfFromHtml(all).contains("from-with"))
    val metaAndHidden =
      """<meta name="__RequestVerificationToken" content="from-meta"/>
        |<input type="hidden" id="MyVerificationToken" value="from-hidden"/>
        |""".stripMargin
    assert(csrfFromHtml(metaAndHidden).contains("from-meta"))
    assert(csrfFromHtml(
      """<input type="hidden" id="MyVerificationToken" value="h"/>""")
      .contains("h"))
  }

  test("csrfFromHtml: empty values never match; absent → None") {
    assert(csrfFromHtml(
      """<input name="__RequestVerificationToken" value=""/>
        |<meta name="__RequestVerificationToken" content="m2"/>"""
        .stripMargin).contains("m2"))
    assert(csrfFromHtml(noTokenPage).isEmpty)
  }

  test("requireCsrfToken passes tokens through and trims") {
    val r = PosResponse.html(200, "http://pos.example/x", reportPage)
    assert(requireCsrfToken(Some(" t "), "ctx", r, Nil) == "t")
  }

  test("requireCsrfToken: missing token crashes with diagnostics") {
    val r = PosResponse.html(200,
      "http://pos.example/Account/LogOn?ReturnUrl=x", noTokenPage)
    val e = intercept[ExtractionError] {
      requireCsrfToken(None, "Report page", r, Seq(".ASPXAUTH"))
    }
    val m = e.getMessage
    assert(m.contains("MANDATORY"))
    assert(m.contains("login_redirected=true"))
    assert(m.contains("auth_cookie_present=true"))
    assert(m.contains("token_field_found_in_html=false"))
    assert(m.contains("HTML title=Broken Page"))
  }

  // ------------------------------------------- form/field selection
  test("firstForm: action, fields, duplicate names last-wins") {
    val f = firstForm(loginPage).get
    assert(f.action.contains("/Account/LogOn"))
    assert(f.fields == Map("__RequestVerificationToken" -> "tok-login-123",
      "UserName" -> "", "Password" -> "", "ReturnUrl" -> ""))
    val dup = firstForm(
      """<form><input name="A" value="1"/><input name="A" value="2"/>
        |</form>""".stripMargin).get
    assert(dup.fields("A") == "2")
    assert(firstForm("<p>no form</p>").isEmpty)
  }

  test("multi-form page: only the FIRST form is scraped") {
    val page =
      """<form action="/search"><input name="q" value=""/></form>
        |<form action="/Account/LogOn">
        |  <input name="UserName"/><input name="Password"/></form>
        |""".stripMargin
    val f = firstForm(page).get
    assert(f.action.contains("/search") && f.fieldOrder == Seq("q"))
  }

  test("chooseUserField preference order; choosePasswordField fallback") {
    assert(chooseUserField(Map("Email" -> "", "Username" -> ""))
      .contains("Email"))
    assert(chooseUserField(Map("foo" -> "")).isEmpty)
    assert(choosePasswordField(Map("Pwd" -> ""), "").contains("Pwd"))
    // not in fields → scan the raw HTML for input type=password
    assert(choosePasswordField(Map.empty,
      """<input type="password" name="ClaveSecreta"/>""")
      .contains("ClaveSecreta"))
    assert(choosePasswordField(Map.empty, "<p/>").isEmpty)
  }

  test("originFor / resolveAction") {
    assert(originFor("https://pos.example:8443/tenant") ==
      "https://pos.example:8443")
    assert(resolveAction("/Account/LogOn", "https://pos.example/app") ==
      "https://pos.example/Account/LogOn")
    assert(resolveAction("https://sso.example/login", "https://pos.example")
      == "https://sso.example/login")
  }

  // -------------------------------------------- scripted transports
  /** Scripted fake session: GETs answer from a url→response map that
    * flips to the authenticated page set after a successful login
    * POST; every exchange is recorded for assertions. */
  private class FakeSession(
      anonymous: Map[String, PosResponse],
      authenticated: Map[String, PosResponse],
      loginAction: String = "http://pos.example/Account/LogOn",
      expectUser: String = "alice", expectPass: String = "s3cret")
      extends PosSession {
    var loggedIn = false
    val gets = ListBuffer.empty[String]
    val posts = ListBuffer.empty[(String, Map[String, String],
      Map[String, String])]
    val cookies = scala.collection.mutable.LinkedHashMap.empty[String, String]
    override def get(url: String): PosResponse = {
      gets += url
      val pages = if (loggedIn) authenticated else anonymous
      pages.getOrElse(url, PosResponse.html(404, url, ""))
    }
    override def post(url: String, params: Map[String, String],
                      data: Map[String, String],
                      headers: Map[String, String]): PosResponse = {
      posts += ((url, data, headers))
      if (url == loginAction) {
        if (data.get("UserName").contains(expectUser) &&
          data.get("Password").contains(expectPass) &&
          data.get("__RequestVerificationToken").exists(_.nonEmpty)) {
          loggedIn = true
          cookies(".ASPXAUTH") = "auth-cookie"
          PosResponse.html(302, url, "")
        } else PosResponse.html(200, url, loginPage) // bounced back
      } else if (!loggedIn) PosResponse.html(401, url, "")
      else PosResponse.html(200, url, "{}",
        ).copy(contentType = "application/json")
    }
    override def cookieNames: Seq[String] = cookies.keys.toSeq
    override def setCookie(name: String, value: String): Unit =
      cookies(name) = value
  }

  private val base = "http://pos.example"
  private val reportUrl = s"$base$ReportPagePath"

  private def freshSession() = new FakeSession(
    anonymous = Map(
      s"$base/" -> PosResponse.html(200, s"$base/", ""),
      reportUrl -> PosResponse.html(200,
        s"$base/Account/LogOn?ReturnUrl=${ReportPagePath}", loginPage)),
    authenticated = Map(
      s"$base/" -> PosResponse.html(200, s"$base/", ""),
      reportUrl -> PosResponse.html(200, reportUrl, reportPage)))

  // ---------------------------------------------------- S2: login
  test("loginIfNeeded: full redirect → scrape → POST → verify flow") {
    val s = freshSession()
    val out = loginIfNeeded(s, base, Some("alice"), Some("s3cret"))
    assert(out == LoggedIn)
    // seed GET, probe GET, verify GET
    assert(s.gets.toList ==
      List(s"$base/", reportUrl, reportUrl))
    val (postUrl, data, headers) = s.posts.head
    assert(postUrl == s"$base/Account/LogOn")
    assert(data("UserName") == "alice" && data("Password") == "s3cret")
    // scraped hidden token travels in the form; empty ReturnUrl aimed
    // back at the report page
    assert(data("__RequestVerificationToken") == "tok-login-123")
    assert(data("ReturnUrl") == ReportPagePath)
    assert(headers("Origin") == base)
    assert(headers("Referer").contains("/Account/LogOn"))
  }

  test("loginIfNeeded: already authenticated → no POST") {
    val s = freshSession()
    s.loggedIn = true
    assert(loginIfNeeded(s, base, None, None) == LoginNotRequired)
    assert(s.posts.isEmpty)
  }

  test("loginIfNeeded: redirect without credentials fails") {
    val e = intercept[ExtractionError] {
      loginIfNeeded(freshSession(), base, None, Some("x"))
    }
    assert(e.getMessage.contains("WS_USER/WS_PASS"))
  }

  test("loginIfNeeded: bad credentials → still-redirected diagnostic") {
    // A 401-style site (no redirect): the reference's verify step only
    // fails on a non-200 re-probe (extraction.py:489-497) — a
    // redirected-but-200 login page passes its check by design.
    val s = new FakeSession(
      anonymous = Map(
        s"$base/" -> PosResponse.html(200, s"$base/", ""),
        reportUrl -> PosResponse.html(401, reportUrl, loginPage)),
      authenticated = Map(
        reportUrl -> PosResponse.html(200, reportUrl, reportPage)))
    val e = intercept[ExtractionError] {
      loginIfNeeded(s, base, Some("alice"), Some("WRONG"))
    }
    assert(e.getMessage.contains("still redirected"))
    assert(e.getMessage.contains("Auth cookie present: false"))
  }

  test("loginIfNeeded: form without credential fields fails with list") {
    val weird = new FakeSession(
      anonymous = Map(
        s"$base/" -> PosResponse.html(200, s"$base/", ""),
        reportUrl -> PosResponse.html(200, s"$base/Account/LogOn",
          """<form action="/Account/LogOn">
            |<input name="Captcha" value=""/></form>""".stripMargin)),
      authenticated = Map.empty)
    val e = intercept[ExtractionError] {
      loginIfNeeded(weird, base, Some("a"), Some("b"))
    }
    assert(e.getMessage.contains("Could not identify"))
    assert(e.getMessage.contains("Captcha"))
  }

  // -------------------------------------------------- S3: warm-up
  test("aplicarWarmup: probe + full battery, token in header AND body") {
    val posted = ListBuffer.empty[(String, Map[String, String],
      Map[String, String])]
    val s = new PosSession {
      override def get(url: String) = PosResponse.html(200, url, "")
      override def post(url: String, params: Map[String, String],
                        data: Map[String, String],
                        headers: Map[String, String]) = {
        posted += ((url, data, headers)); PosResponse.html(200, url, "")
      }
    }
    val warnings = aplicarWarmup(s, base, reportUrl, "tok", "8777",
      LocalDate.parse("2025-01-01"), LocalDate.parse("2025-01-31"))
    assert(warnings.isEmpty)
    // 1 probe + 22 battery posts, probe endpoint first and repeated
    assert(posted.size == AplicarEndpoints.size + 1)
    assert(posted.head._1.endsWith("/Reports/GetConsolidatedSales"))
    assert(posted(1)._1.endsWith("/Reports/GetConsolidatedSales"))
    assert(posted.map(_._1).drop(1).toList ==
      AplicarEndpoints.map(e => s"$base/Reports/$e").toList)
    posted.foreach { case (_, data, headers) =>
      assert(headers("RequestVerificationToken") == "tok")
      assert(headers("X-Requested-With") == "XMLHttpRequest")
      assert(data("__RequestVerificationToken") == "tok")
      assert(data("subsidiaryId") == "8777")
      assert(data("startDate") == "2025-01-01")
      assert(data("endDate") == "2025-01-31")
    }
  }

  test("aplicarWarmup: empty token refused; 401/403 abort; 500 warns") {
    intercept[ExtractionError] {
      aplicarWarmup(new PosSession {
        override def get(url: String) = PosResponse.html(200, url, "")
        override def post(u: String, p: Map[String, String],
                          d: Map[String, String],
                          h: Map[String, String]) =
          PosResponse.html(200, u, "")
      }, base, reportUrl, "  ", "1",
        LocalDate.now(java.time.ZoneOffset.UTC),
        LocalDate.now(java.time.ZoneOffset.UTC))
    }
    def fixedStatus(st: Int) = new PosSession {
      override def get(url: String) = PosResponse.html(200, url, "")
      override def post(u: String, p: Map[String, String],
                        d: Map[String, String], h: Map[String, String]) =
        PosResponse.html(st, u, "")
    }
    val d0 = LocalDate.parse("2025-01-01")
    assert(intercept[ExtractionError] {
      aplicarWarmup(fixedStatus(401), base, reportUrl, "t", "1", d0, d0)
    }.getMessage.contains("401"))
    assert(intercept[ExtractionError] {
      aplicarWarmup(fixedStatus(403), base, reportUrl, "t", "1", d0, d0)
    }.getMessage.contains("CSRF/Policy"))
    val w = aplicarWarmup(fixedStatus(500), base, reportUrl, "t", "1",
      d0, d0)
    assert(w.size == AplicarEndpoints.size + 1)
    assert(w.head == "Warm-up GetConsolidatedSales returned 500")
  }

  // ------------------------------- end-to-end export choreography
  test("exportReport: login → token → warm-up → export → decode") {
    val payload = "xlsx-bytes".getBytes
    val b64 = java.util.Base64.getEncoder.encodeToString(payload)
    val s = new FakeSession(
      anonymous = Map(
        s"$base/" -> PosResponse.html(200, s"$base/", ""),
        reportUrl -> PosResponse.html(200,
          s"$base/Account/LogOn?ReturnUrl=$ReportPagePath", loginPage)),
      authenticated = Map(
        s"$base/" -> PosResponse.html(200, s"$base/", ""),
        reportUrl -> PosResponse.html(200, reportUrl, reportPage))) {
      override def post(url: String, params: Map[String, String],
                        data: Map[String, String],
                        headers: Map[String, String]): PosResponse =
        if (loggedIn && url == s"$base/Reports/ExportSalesReport") {
          posts += ((url, data, headers))
          PosResponse(200, url,
            s"""{"fileName": "Pagos_8777.xlsx", "fileBase64": "$b64"}"""
              .getBytes, contentType = "application/json")
        } else super.post(url, params, data, headers)
    }

    assert(loginIfNeeded(s, base, Some("alice"), Some("s3cret")) == LoggedIn)
    val (name, bytes) = exportSalesReport(s, base, "payments", "8777",
      LocalDate.parse("2025-03-01"), LocalDate.parse("2025-03-31"))
    assert(name == "Pagos_8777.xlsx" && bytes.sameElements(payload))

    // choreography order: login POST, probe+22 warm-ups, export
    val urls = s.posts.map(_._1).toList
    assert(urls.head == s"$base/Account/LogOn")
    assert(urls.count(_.contains("/Reports/GetConsolidatedSales")) == 2)
    assert(urls.last == s"$base/Reports/ExportSalesReport")
    assert(urls.size == 1 + (AplicarEndpoints.size + 1) + 1)
    // subsidiary cookie set before the export; token from REPORT page
    assert(s.cookies("SubsidiaryId") == "8777")
    val (_, exportData, exportHeaders) = s.posts.last
    assert(exportData("__RequestVerificationToken") == "tok-report-456")
    assert(exportHeaders("RequestVerificationToken") == "tok-report-456")
  }

  test("exportReport: report page without token crashes (no export POST)") {
    val s = freshSession()
    s.loggedIn = true
    val broken = new FakeSession(
      anonymous = Map.empty,
      authenticated = Map(
        reportUrl -> PosResponse.html(200, reportUrl, noTokenPage))) {
      loggedIn = true
    }
    intercept[ExtractionError] {
      exportReport(broken, base,
        ReportDescriptor("Export", reportName = "Consolidated"),
        "1", LocalDate.parse("2025-01-01"), LocalDate.parse("2025-01-02"))
    }
    assert(broken.posts.isEmpty)
  }

  test("exportSalesReport: unknown report name lists the choices") {
    val e = intercept[ExtractionError] {
      exportSalesReport(freshSession(), base, "bogus", "1",
        LocalDate.parse("2025-01-01"), LocalDate.parse("2025-01-02"))
    }
    assert(e.getMessage.contains("Unknown sales report"))
    assert(e.getMessage.contains("Consolidated"))
  }

  test("exportTransfersIssued: own page token, no warm-up, fixed fields") {
    val transfersUrl = s"$base$InventoryTransfersPage"
    val payload = "transfer-xlsx".getBytes
    val s = new FakeSession(
      anonymous = Map.empty,
      authenticated = Map(
        transfersUrl -> PosResponse.html(200, transfersUrl,
          """<input name="__RequestVerificationToken" value="tok-tr"/>"""))) {
      loggedIn = true
      override def post(url: String, params: Map[String, String],
                        data: Map[String, String],
                        headers: Map[String, String]): PosResponse = {
        posts += ((url, data, headers))
        PosResponse(200, url, payload,
          contentType = "application/octet-stream",
          contentDisposition = """attachment; filename="Traspasos.xlsx"""")
      }
    }
    val (name, bytes) = exportTransfersIssued(s, base, "5392",
      LocalDate.parse("2025-02-01"), LocalDate.parse("2025-02-28"))
    assert(name == "Traspasos.xlsx" && bytes.sameElements(payload))
    // exactly ONE post (no warm-up battery), to the Inventory export
    assert(s.posts.map(_._1).toList ==
      List(s"$base$InventoryTransfersExport"))
    val (_, data, headers) = s.posts.head
    assert(data("transferReference") == "" && data("status") == "0")
    assert(data("__RequestVerificationToken") == "tok-tr")
    assert(headers("Referer") == transfersUrl)
    assert(s.cookies("SubsidiaryId") == "5392")
  }

  test("decodeExport honors JSON fileName when present") {
    val payload = "x".getBytes
    val b64 = java.util.Base64.getEncoder.encodeToString(payload)
    val (name, _) = Extraction.decodeExport("application/json",
      s"""{"fileName": "Ventas.xlsx", "fileBase64": "$b64"}""".getBytes,
      defaultName = "default.xlsx")
    assert(name == "Ventas.xlsx")
  }
}
