package graft.pos.ingest

import scala.collection.mutable.ListBuffer

import graft.pos.ExtractionError
import java.time.LocalDate

/** SURVEY S2/S3 — the POS login + "Aplicar" warm-up choreography.
  *
  * The reference drives an ASP.NET site: seed the session, probe a
  * protected report page, follow the login redirect, scrape the form,
  * pick the user/password fields, POST credentials, then warm the
  * report caches with a battery of AJAX POSTs before the export call
  * works (`/root/reference/src/pos_core/etl/raw/extraction.py:418-499`
  * login, `:524-593` warm-up, `:625-720` export choreography).
  *
  * This environment has no egress, so the transport is an injected
  * [[PosSession]] — but everything ABOVE the socket is real and pure:
  * CSRF-token scraping (`extraction.py:204-242`), the mandatory-token
  * guard with its diagnostic dump (`:245-305`), login-form discovery
  * and field selection (`:359-401,453-477`), action-URL resolution,
  * warm-up sequencing and status policy, and the full
  * login → token → cookie → warm-up → export → decode flow. All of it
  * is exercised end-to-end in LoginSpec against scripted transports
  * and canned HTML fixtures.
  *
  * HTML lookups are a small attribute scanner rather than a DOM
  * parser: the reference only ever reads flat `<input>`/`<meta>`
  * attributes and the first `<form>` — fixture-grade regex scanning
  * reproduces those lookups exactly without an HTML dependency.
  */
object Login {

  // ------------------------------------------------------ constants
  /** `extraction.py:80` — the protected page used both as the login
    * probe and as the CSRF-token source for sales exports. */
  val ReportPagePath = "/Reports/ConsolidatedSalesMasterReport"

  /** `extraction.py:82-83` — the transfers flow has its own page. */
  val InventoryTransfersPage = "/Inventory/Transfers"
  val InventoryTransfersExport = "/Inventory/ExportTransfersIssued"

  /** `extraction.py:92-115` — the browser's "Aplicar" click fans out
    * to these report-cache endpoints; export fails until they ran. */
  val AplicarEndpoints: Seq[String] = Seq(
    "GetConsolidatedSales", "CancelSalesDetail", "CourtesiesDetail",
    "SalesByHours", "SalesByGroup", "SalesByGroupType", "SalesByArea",
    "SalesBySaucer", "SalesByUser", "SalesByTypeOfOrder",
    "DiscountsDetail", "PersonsByHour", "PersonsByDay",
    "PersonsByDayName", "SalesByPaymentType", "SalesByModifiers",
    "SalesByTerminal", "MegaPointsReport", "TipByUser", "Promotions",
    "ChargePaymentMethod", "SaleNullificationDetail")

  /** `extraction.py:73-78` — report type → export endpoint. */
  val ReportEndpoints: Map[String, String] = Map(
    "Detail" -> "ExportSalesDetailReport",
    "Consolidated" -> "Export",
    "Payments" -> "ExportSalesReport")

  // ------------------------------------------------- transport face
  /** One HTTP exchange as the choreography sees it. `url` is the
    * FINAL url after redirects (the login detector reads it). */
  final case class PosResponse(status: Int, url: String,
                               body: Array[Byte] = Array.emptyByteArray,
                               contentType: String = "text/html",
                               contentDisposition: String = "") {
    def text: String =
      new String(body, java.nio.charset.StandardCharsets.UTF_8)
  }

  object PosResponse {
    def html(status: Int, url: String, html: String): PosResponse =
      PosResponse(status, url,
        html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** The injected transport: a cookie-carrying session (the
    * reference's `requests.Session`). Implementations follow
    * redirects themselves and report the final url. */
  trait PosSession {
    def get(url: String): PosResponse
    def post(url: String, params: Map[String, String],
             data: Map[String, String],
             headers: Map[String, String]): PosResponse
    /** Cookie-jar names — the `.ASPXAUTH` diagnostics read these. */
    def cookieNames: Seq[String] = Seq.empty
    /** `extraction.py:503-521` — SubsidiaryId rides a cookie. */
    def setCookie(name: String, value: String): Unit = ()
  }

  // ------------------------------------- HTML attribute scanning
  /** All open tags `<name …>` in document order. */
  private[ingest] def tagsOf(html: String, tag: String): Seq[String] =
    s"(?is)<$tag\\b[^>]*>".r.findAllIn(html).toSeq

  /** One attribute off an open tag: double-quoted, single-quoted or
    * bare values (the three spellings fixtures/ASP.NET emit). */
  private[ingest] def attrOf(tag: String, attr: String): Option[String] =
    s"""(?is)\\b$attr\\s*=\\s*("([^"]*)"|'([^']*)'|([^\\s>]+))""".r
      .findFirstMatchIn(tag)
      .map(m => Option(m.group(2)).orElse(Option(m.group(3)))
        .getOrElse(m.group(4)))

  // ------------------------------------------------ CSRF scraping
  /** ASP.NET AntiForgery token lookup, in the reference's exact
    * precedence (`extraction.py:204-242`): named inputs, then the
    * meta tag, then any hidden input whose name/id mentions
    * VerificationToken. Empty values never match. */
  def csrfFromHtml(html: String): Option[String] = {
    val inputs = tagsOf(html, "input")
    def inputNamed(n: String): Option[String] =
      inputs.find(t => attrOf(t, "name").contains(n))
        .flatMap(t => attrOf(t, "value")).filter(_.nonEmpty)
    inputNamed("__RequestVerificationToken")
      .orElse(inputNamed("__RequestVerificationTokenWith"))
      .orElse(tagsOf(html, "meta")
        .find(t => attrOf(t, "name").contains("__RequestVerificationToken"))
        .flatMap(t => attrOf(t, "content")).filter(_.nonEmpty))
      .orElse(inputs
        .filter(t => attrOf(t, "type").exists(_.equalsIgnoreCase("hidden")))
        .find { t =>
          (attrOf(t, "name").getOrElse("") + attrOf(t, "id").getOrElse(""))
            .contains("VerificationToken")
        }
        .flatMap(t => attrOf(t, "value")).filter(_.nonEmpty))
  }

  /** The MANDATORY-token guard (`extraction.py:245-305`): a missing
    * token crashes the pipeline immediately — with the same
    * diagnostics the reference dumps (final url, login-redirect flag,
    * `.ASPXAUTH` cookie presence, whether the token FIELD NAME even
    * appears in the HTML, page title, body head) so a 401 later never
    * has to be debugged blind. */
  def requireCsrfToken(token: Option[String], context: String,
                       response: PosResponse,
                       cookieNames: Seq[String]): String =
    token.map(_.trim).filter(_.nonEmpty).getOrElse {
      val body = response.text
      val title = "(?is)<title[^>]*>(.*?)</title>".r
        .findFirstMatchIn(body).map(_.group(1).trim)
        .filter(_.nonEmpty).getOrElse("n/a")
      val authCookie =
        cookieNames.exists(_.toUpperCase.startsWith(".ASPXAUTH"))
      val loginRedirected =
        response.url != null && response.url.contains("/Account/LogOn")
      val searched =
        Seq("__RequestVerificationToken", "__RequestVerificationTokenWith")
      val fieldInHtml = searched.exists(body.contains)
      val snippet = body.replace("\r", " ").replace("\n", " ").take(240)
      throw new ExtractionError(
        s"CSRF token is MANDATORY but was not found on $context. " +
          "The pipeline will crash here to prevent 401 errors later. " +
          s"Diagnostics: status=${response.status}, url=${response.url}, " +
          s"login_redirected=$loginRedirected, " +
          s"auth_cookie_present=$authCookie, " +
          s"content_type=${response.contentType}, " +
          s"token_fields_searched=${searched.mkString("[", ", ", "]")}, " +
          s"token_field_found_in_html=$fieldInHtml, " +
          s"HTML title=$title. Body start: $snippet")
    }

  // ----------------------------------------------- login-form scrape
  /** The first `<form>`: its action plus every named input, LAST
    * value winning on duplicates (dict-assignment order,
    * `extraction.py:463-470`); `fieldOrder` preserves discovery order
    * for the could-not-identify diagnostic. */
  final case class LoginForm(action: Option[String],
                             fields: Map[String, String],
                             fieldOrder: Seq[String])

  def firstForm(html: String): Option[LoginForm] =
    "(?is)<form\\b[^>]*>.*?</form>".r.findFirstIn(html).map { formHtml =>
      val open = "(?is)<form\\b[^>]*>".r.findFirstIn(formHtml).get
      val pairs = tagsOf(formHtml, "input").flatMap { t =>
        attrOf(t, "name").filter(_.nonEmpty)
          .map(n => n -> attrOf(t, "value").getOrElse(""))
      }
      LoginForm(attrOf(open, "action"), pairs.toMap,
        pairs.map(_._1).distinct)
    }

  /** `extraction.py:359-374` — username field, fixed preference. */
  def chooseUserField(fields: Map[String, String]): Option[String] =
    Seq("UserName", "Email", "Login", "Username").find(fields.contains)

  /** `extraction.py:377-401` — password field by name, else the first
    * `input type="password"`'s name from the raw HTML. */
  def choosePasswordField(fields: Map[String, String],
                          html: String): Option[String] =
    Seq("Password", "Pass", "Pwd").find(fields.contains)
      .orElse(tagsOf(html, "input")
        .find(t => attrOf(t, "type").exists(_.equalsIgnoreCase("password")))
        .flatMap(t => attrOf(t, "name")).filter(_.nonEmpty))

  /** `extraction.py:404-415` — scheme://authority of a url. */
  def originFor(baseUrl: String): String = {
    val u = java.net.URI.create(baseUrl)
    s"${u.getScheme}://${u.getAuthority}"
  }

  /** Absolute action url: already-absolute actions pass through,
    * site-relative ones resolve against the ORIGIN (not the page) —
    * `extraction.py:459-461`. */
  def resolveAction(action: String, baseUrl: String): String =
    if (action.startsWith("http")) action else originFor(baseUrl) + action

  /** Non-2xx → fail with status + body head (`extraction.py:180-192`). */
  private def ensureOk(r: PosResponse, msg: String): Unit =
    if (r.status < 200 || r.status >= 300)
      throw new ExtractionError(
        s"$msg. HTTP ${r.status} — ${r.text.take(400)}")

  // ---------------------------------------------------------- login
  sealed trait LoginOutcome
  case object LoginNotRequired extends LoginOutcome
  case object LoggedIn extends LoginOutcome

  /** S2 — `extraction.py:418-499`. Probe the protected report page;
    * on a login redirect (url landing on /Account/LogOn, or 401),
    * scrape the form, select the credential fields, POST, and verify
    * the protected page now answers 200. */
  def loginIfNeeded(s: PosSession, baseUrl: String,
                    user: Option[String],
                    pwd: Option[String]): LoginOutcome = {
    // Seed on tenant root — sets cookies some auth flows expect; the
    // status is advisory only (extraction.py:443-445).
    s.get(s"$baseUrl/")
    val r = s.get(s"$baseUrl$ReportPagePath")
    val needsLogin = (r.url != null && r.url.contains("/Account/LogOn")) ||
      r.status == 401
    if (!needsLogin) return LoginNotRequired

    if (user.forall(_.isEmpty) || pwd.forall(_.isEmpty))
      throw new ExtractionError(
        "Login required but WS_USER/WS_PASS not provided.")

    val html = r.text
    val form = firstForm(html).getOrElse(
      throw new ExtractionError("Login form not found."))
    val actionUrl = form.action.filter(_.nonEmpty) match {
      case Some(a) => resolveAction(a, baseUrl)
      case None    => r.url // action-less form posts back to the page
    }

    val userField = chooseUserField(form.fields).getOrElse("UserName")
    val pwField = choosePasswordField(form.fields, html).getOrElse("Password")
    if (!form.fields.contains(userField) || !form.fields.contains(pwField))
      throw new ExtractionError(
        "Could not identify user/password fields. Found: " +
          form.fieldOrder.mkString("[", ", ", "]"))

    var fields = form.fields + (userField -> user.get) + (pwField -> pwd.get)
    // An empty ReturnUrl bounces to the site root after login; aim it
    // back at the report page (extraction.py:481-482).
    if (fields.get("ReturnUrl").contains(""))
      fields += "ReturnUrl" -> ReportPagePath

    val r2 = s.post(actionUrl, Map.empty, fields,
      Map("Referer" -> r.url, "Origin" -> originFor(baseUrl)))
    if (r2.status != 200 && r2.status != 302)
      throw new ExtractionError(s"Login POST failed. HTTP ${r2.status}")

    val test = s.get(s"$baseUrl$ReportPagePath")
    if (test.status == 200) LoggedIn
    else {
      val aspxauth =
        s.cookieNames.exists(_.toUpperCase.startsWith(".ASPXAUTH"))
      throw new ExtractionError(
        "Login failed: still redirected to login. " +
          s"Auth cookie present: $aspxauth; final URL checked: ${test.url}")
    }
  }

  // -------------------------------------------------------- warm-up
  /** The AJAX header set every warm-up/export POST carries
    * (`extraction.py:563-570`): token BOTH as a header and (by the
    * callers) as a `__RequestVerificationToken` form field. */
  def ajaxHeaders(baseUrl: String, reportPageUrl: String,
                  token: String): Map[String, String] = Map(
    "Origin" -> originFor(baseUrl),
    "Referer" -> reportPageUrl,
    "X-Requested-With" -> "XMLHttpRequest",
    "Content-Type" -> "application/x-www-form-urlencoded; charset=UTF-8",
    "Accept" -> "*/*",
    "RequestVerificationToken" -> token)

  /** S3 — `extraction.py:524-593`. One probe POST to the first
    * endpoint, then the full battery in order (the probe endpoint
    * intentionally posts twice — the reference's quick self-test).
    * 401 and 400/403 abort (auth lost / CSRF block); other non-2xx
    * statuses are survivable and returned as warnings. */
  def aplicarWarmup(s: PosSession, baseUrl: String, reportPageUrl: String,
                    token: String, subsidiaryId: String,
                    start: LocalDate, end: LocalDate): Seq[String] = {
    if (token == null || token.trim.isEmpty)
      throw new ExtractionError(
        "CSRF token is required for aplicarWarmup but was null or empty. " +
          "Ensure requireCsrfToken is called before this function.")
    val headers = ajaxHeaders(baseUrl, reportPageUrl, token)
    val params = Map("subsidiaryId" -> subsidiaryId,
      "startDate" -> start.toString, "endDate" -> end.toString)
    val body = params + ("__RequestVerificationToken" -> token)
    val warnings = ListBuffer.empty[String]
    def postEndpoint(name: String): Unit = {
      val r = s.post(s"$baseUrl/Reports/$name", params, body, headers)
      r.status match {
        case 401 =>
          throw new ExtractionError("401 Not authenticated (lost .ASPXAUTH?)")
        case st if st == 400 || st == 403 =>
          throw new ExtractionError(s"$st CSRF/Policy block on $name")
        case st if st < 200 || st >= 300 =>
          warnings += s"Warm-up $name returned $st"
        case _ => ()
      }
    }
    postEndpoint(AplicarEndpoints.head)
    AplicarEndpoints.foreach(postEndpoint)
    warnings.toList
  }

  // --------------------------------------------------------- export
  /** `extraction.py:597-621` — config-driven export descriptor. */
  final case class ReportDescriptor(exportPath: String,
                                    reportPagePath: String = ReportPagePath,
                                    needsWarmup: Boolean = true,
                                    reportName: String = "")

  val OrderTimesDescriptor: ReportDescriptor =
    ReportDescriptor("ExportOrderTimes", reportName = "OrderTimes")

  /** The full S2/S3-dependent export choreography
    * (`extraction.py:625-720`): SubsidiaryId cookie → report page GET
    * → mandatory CSRF token → warm-up (if the report needs it) →
    * export POST (params in the query string AND the body, token in
    * header + body) → decode via [[Extraction.decodeExport]]. */
  def exportReport(s: PosSession, baseUrl: String, d: ReportDescriptor,
                   subsidiaryId: String, start: LocalDate,
                   end: LocalDate): (String, Array[Byte]) = {
    s.setCookie("SubsidiaryId", subsidiaryId)
    val reportPage = s"$baseUrl${d.reportPagePath}"
    val page = s.get(reportPage)
    ensureOk(page, "Failed to open report page")
    val token = requireCsrfToken(csrfFromHtml(page.text),
      s"Report page (${d.reportPagePath})", page, s.cookieNames)

    if (d.needsWarmup)
      aplicarWarmup(s, baseUrl, reportPage, token, subsidiaryId, start, end)

    val params = Map("subsidiaryId" -> subsidiaryId,
      "startDate" -> start.toString, "endDate" -> end.toString)
    val body = params + ("__RequestVerificationToken" -> token)
    val r = s.post(s"$baseUrl/Reports/${d.exportPath}", params, body,
      ajaxHeaders(baseUrl, reportPage, token))
    if (r.status == 401)
      throw new ExtractionError(
        "401 Unauthorized on export — auth expired or CSRF missing.")
    ensureOk(r,
      s"Export failed for ${d.reportName} $subsidiaryId $start..$end")
    // JSON fallback is UNDATED, attachment fallback dated
    // (extraction.py:708 vs :713)
    Extraction.decodeExport(r.contentType, r.body, r.contentDisposition,
      defaultName = s"${d.reportName}.xlsx",
      attachmentDefaultName = s"${d.reportName}_${start}_${end}.xlsx")
  }

  /** `extraction.py:723-770` — named sales reports route through the
    * descriptor path; unknown names fail with the choice list. */
  def exportSalesReport(s: PosSession, baseUrl: String, report: String,
                        subsidiaryId: String, start: LocalDate,
                        end: LocalDate): (String, Array[Byte]) = {
    val cap = report.toLowerCase.capitalize
    val endpoint = ReportEndpoints.getOrElse(cap,
      throw new ExtractionError(
        s"Unknown sales report '$report'. Choose from: " +
          ReportEndpoints.keys.toSeq.sorted.mkString(", ")))
    exportReport(s, baseUrl,
      ReportDescriptor(endpoint, reportName = cap), subsidiaryId,
      start, end)
  }

  /** `extraction.py:789-861` — the transfers flow: its own page for
    * the token, NO warm-up, export under /Inventory with two extra
    * fixed form fields. */
  def exportTransfersIssued(s: PosSession, baseUrl: String,
                            subsidiaryId: String, start: LocalDate,
                            end: LocalDate): (String, Array[Byte]) = {
    val pageUrl = s"$baseUrl$InventoryTransfersPage"
    val page = s.get(pageUrl)
    ensureOk(page, "Failed to open Inventory Transfers page")
    val token = requireCsrfToken(csrfFromHtml(page.text),
      "Inventory Transfers page", page, s.cookieNames)
    s.setCookie("SubsidiaryId", subsidiaryId)

    val form = Map("subsidiaryId" -> subsidiaryId,
      "startDate" -> start.toString, "endDate" -> end.toString,
      "transferReference" -> "", "status" -> "0",
      "__RequestVerificationToken" -> token)
    val r = s.post(s"$baseUrl$InventoryTransfersExport", Map.empty, form,
      ajaxHeaders(baseUrl, pageUrl, token))
    if (r.status == 401) {
      val aspxauth =
        s.cookieNames.exists(_.toUpperCase.startsWith(".ASPXAUTH"))
      throw new ExtractionError(
        "ExportTransfersIssued returned 401 (unauthorized). " +
          s"Auth cookie present: $aspxauth. " +
          "Likely the login didn't stick or the CSRF token is missing.")
    }
    ensureOk(r, "ExportTransfersIssued failed")
    Extraction.decodeExport(r.contentType, r.body, r.contentDisposition,
      defaultName = "TransfersIssued.xlsx",
      attachmentDefaultName = s"TransfersIssued_${start}_${end}.xlsx")
  }
}
