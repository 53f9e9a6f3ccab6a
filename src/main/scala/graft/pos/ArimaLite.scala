package graft.pos

/** Pure-JVM log-AR model — the Spark-side stand-in for the reference's
  * log-SARIMAX grid search (`/root/reference/src/pos_core/forecasting/
  * models/arima.py:31-185`). statsmodels has no JVM twin (SURVEY §7.4
  * risk 8), so the contract is preserved — log1p transform, (p, d)
  * grid with min-AIC selection, expm1 + clip ≥ 0 on the way out,
  * ≥ 30-obs guard upstream — with an AR(p) core fit by ordinary least
  * squares instead of a Kalman-filter MLE.
  *
  * Each series is tiny (10²–10³ points); fitting runs per
  * (branch, metric) group inside `flatMapGroups`, so the cluster
  * parallelizes across series, not within them.
  */
object ArimaLite {

  final case class Fit(p: Int, d: Int, coef: Array[Double],
                       intercept: Double, sigma2: Double, aic: Double)

  /** Solve A x = b by Gaussian elimination with partial pivoting.
    * Returns None on singular systems. */
  private def solve(a: Array[Array[Double]],
                    b: Array[Double]): Option[Array[Double]] = {
    val n = b.length
    val m = Array.tabulate(n)(i => a(i) :+ b(i))
    for (col <- 0 until n) {
      val piv = (col until n).maxBy(r => math.abs(m(r)(col)))
      if (math.abs(m(piv)(col)) < 1e-12) return None
      val t = m(col); m(col) = m(piv); m(piv) = t
      for (r <- col + 1 until n) {
        val f = m(r)(col) / m(col)(col)
        for (c <- col to n) m(r)(c) -= f * m(col)(c)
      }
    }
    val x = new Array[Double](n)
    for (r <- n - 1 to 0 by -1) {
      var s = m(r)(n)
      for (c <- r + 1 until n) s -= m(r)(c) * x(c)
      x(r) = s / m(r)(r)
    }
    Some(x)
  }

  /** OLS fit of y_t = c + Σ φ_i y_{t-i} + ε. */
  def fitAr(y: Array[Double], p: Int): Option[Fit] = {
    val n = y.length - p
    if (n <= p + 2) return None
    val k = p + 1 // intercept + p lags
    val xtx = Array.fill(k, k)(0.0)
    val xty = Array.fill(k)(0.0)
    for (t <- p until y.length) {
      val row = 1.0 +: Array.tabulate(p)(i => y(t - 1 - i))
      for (i <- 0 until k) {
        xty(i) += row(i) * y(t)
        for (j <- 0 until k) xtx(i)(j) += row(i) * row(j)
      }
    }
    solve(xtx, xty).flatMap { beta =>
      var sse = 0.0
      for (t <- p until y.length) {
        var pred = beta(0)
        for (i <- 0 until p) pred += beta(i + 1) * y(t - 1 - i)
        val e = y(t) - pred
        sse += e * e
      }
      // floor, not reject: a (near-)perfect fit — e.g. an exact trend
      // after differencing — is the BEST model, with AIC → very low
      val sigma2 = math.max(sse / n, 1e-12)
      if (sigma2.isNaN) None
      else Some(Fit(p, 0, beta.drop(1), beta(0), sigma2,
        n * math.log(sigma2) + 2.0 * (k + 1)))
    }
  }

  /** ARMA(p, q) via Hannan–Rissanen: a long AR fit supplies residual
    * estimates, then one OLS regresses y_t on p lags of y and q lags
    * of those residuals. `maCoef` empty ⇒ plain AR. */
  final case class ArmaFit(p: Int, q: Int, d: Int, coef: Array[Double],
                           maCoef: Array[Double], intercept: Double,
                           sigma2: Double, aic: Double,
                           resid: Array[Double])

  def fitArma(y: Array[Double], p: Int, q: Int): Option[ArmaFit] = {
    if (q == 0) {
      return fitAr(y, p).map(f => ArmaFit(p, 0, 0, f.coef, Array.empty,
        f.intercept, f.sigma2, f.aic, residualsAr(y, f)))
    }
    // stage 1: long AR for residual estimates
    val m = math.max(p, q) + 3
    val e = fitAr(y, m).map(residualsAr(y, _)).getOrElse(return None)
    // e(t) aligned to y(t) for t >= m; e(t) = 0 earlier
    val start = math.max(p, m + q)
    val n = y.length - start
    if (n <= p + q + 2) return None
    val k = 1 + p + q
    val xtx = Array.fill(k, k)(0.0)
    val xty = Array.fill(k)(0.0)
    def row(t: Int): Array[Double] =
      1.0 +: (Array.tabulate(p)(i => y(t - 1 - i)) ++
        Array.tabulate(q)(j => e(t - 1 - j)))
    for (t <- start until y.length) {
      val r = row(t)
      for (i <- 0 until k) {
        xty(i) += r(i) * y(t)
        for (j <- 0 until k) xtx(i)(j) += r(i) * r(j)
      }
    }
    solve(xtx, xty).flatMap { beta =>
      var sse = 0.0
      for (t <- start until y.length) {
        val r = row(t)
        var pred = 0.0
        for (i <- 0 until k) pred += beta(i) * r(i)
        sse += math.pow(y(t) - pred, 2)
      }
      val sigma2 = math.max(sse / n, 1e-12)
      if (sigma2.isNaN) None
      else {
        val fit = ArmaFit(p, q, 0,
          beta.slice(1, 1 + p), beta.slice(1 + p, k), beta(0),
          sigma2, n * math.log(sigma2) + 2.0 * (k + 1), Array.empty)
        Some(fit.copy(resid = residualsArma(y, fit, e)))
      }
    }
  }

  /** In-sample one-step residuals of an AR fit (0 before lag cover). */
  private def residualsAr(y: Array[Double], f: Fit): Array[Double] = {
    val e = new Array[Double](y.length)
    for (t <- f.p until y.length) {
      var pred = f.intercept
      for (i <- 0 until f.p) pred += f.coef(i) * y(t - 1 - i)
      e(t) = y(t) - pred
    }
    e
  }

  private def residualsArma(y: Array[Double], f: ArmaFit,
                            eInit: Array[Double]): Array[Double] = {
    val e = eInit.clone()
    val start = math.max(f.p, f.q)
    for (t <- start until y.length) {
      var pred = f.intercept
      for (i <- 0 until f.p) pred += f.coef(i) * y(t - 1 - i)
      for (j <- 0 until f.q) pred += f.maCoef(j) * e(t - 1 - j)
      e(t) = y(t) - pred
    }
    e
  }

  private def diff(y: Array[Double]): Array[Double] =
    Array.tabulate(y.length - 1)(i => y(i + 1) - y(i))

  /** Grid over p ∈ 0..maxP × q ∈ 0..maxQ × d ∈ {0,1} (p+q ≥ 1), min
    * AIC — the reference's SARIMAX grid minus seasonal terms
    * (arima.py:118-139: failures inside the grid are skipped). */
  def select(y: Array[Double], maxP: Int = 2, maxQ: Int = 2)
      : Option[ArmaFit] = {
    val fits = for {
      d <- 0 to 1
      yd = if (d == 0) y else diff(y)
      p <- 0 to maxP
      q <- 0 to maxQ
      if p + q > 0
      f <- fitArma(yd, p, q)
    } yield f.copy(d = d)
    if (fits.isEmpty) None else Some(fits.minBy(_.aic))
  }

  /** Iterated h-step forecast on the (possibly differenced) scale —
    * future shocks are zero, trailing residuals feed the MA terms —
    * then integrate back. */
  def forecastFit(y: Array[Double], fit: ArmaFit, h: Int)
      : Array[Double] = {
    val yd = if (fit.d == 0) y else diff(y)
    val buf = scala.collection.mutable.ArrayBuffer(yd.toSeq: _*)
    val e = scala.collection.mutable.ArrayBuffer(
      (if (fit.resid.nonEmpty) fit.resid
       else new Array[Double](yd.length)).toSeq: _*)
    val out = new Array[Double](h)
    for (s <- 0 until h) {
      var v = fit.intercept
      for (i <- 0 until fit.p) v += fit.coef(i) * buf(buf.length - 1 - i)
      for (j <- 0 until fit.q) v += fit.maCoef(j) * e(e.length - 1 - j)
      buf += v
      e += 0.0 // future shocks have expectation zero
      out(s) = v
    }
    if (fit.d == 0) out
    else { // integrate: cumulative sum anchored at the last level
      var level = y.last
      out.map { dv => level += dv; level }
    }
  }

  /** Full contract: log1p → grid select → forecast → expm1 → clip ≥ 0
    * (arima.py:96,165-169). Falls back to the series mean when the
    * grid yields nothing (constant series etc.) OR when the selected
    * model's iterated forecast leaves the observed envelope — an
    * OLS-fit ARMA can be non-stationary and explode; the reference
    * tolerates per-model failures the same way. */
  def forecastLog1p(values: Array[Double], h: Int): Array[Double] = {
    val y = values.map(v => math.log1p(math.max(v, 0.0)))
    val mean = if (y.isEmpty) 0.0 else y.sum / y.length
    val lo = if (y.isEmpty) 0.0 else y.min - 5.0
    val hi = if (y.isEmpty) 0.0 else y.max + 5.0
    val raw = select(y) match {
      case Some(fit) =>
        val fc = forecastFit(y, fit, h)
        if (fc.forall(v => java.lang.Double.isFinite(v) &&
              v >= lo && v <= hi)) fc
        else Array.fill(h)(mean)
      case None => Array.fill(h)(mean)
    }
    raw.map(v => math.max(math.expm1(v), 0.0))
  }
}
