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

  private def diff(y: Array[Double]): Array[Double] =
    Array.tabulate(y.length - 1)(i => y(i + 1) - y(i))

  /** Grid over p ∈ 1..maxP × d ∈ {0,1}, min AIC (arima.py:118-139:
    * failures inside the grid are tolerated and skipped). */
  def select(y: Array[Double], maxP: Int = 3): Option[Fit] = {
    val fits = for {
      d <- 0 to 1
      yd = if (d == 0) y else diff(y)
      p <- 1 to maxP
      f <- fitAr(yd, p)
    } yield f.copy(d = d)
    if (fits.isEmpty) None else Some(fits.minBy(_.aic))
  }

  /** Iterated h-step forecast on the (possibly differenced) scale,
    * then integrate back. */
  def forecastFit(y: Array[Double], fit: Fit, h: Int): Array[Double] = {
    val yd = if (fit.d == 0) y else diff(y)
    val buf = scala.collection.mutable.ArrayBuffer(yd.toSeq: _*)
    val out = new Array[Double](h)
    for (s <- 0 until h) {
      var v = fit.intercept
      for (i <- 0 until fit.p) v += fit.coef(i) * buf(buf.length - 1 - i)
      buf += v
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
    * grid yields nothing (constant series etc.). */
  def forecastLog1p(values: Array[Double], h: Int): Array[Double] = {
    val y = values.map(v => math.log1p(math.max(v, 0.0)))
    val raw = select(y) match {
      case Some(fit) => forecastFit(y, fit, h)
      case None =>
        val mean = if (y.isEmpty) 0.0 else y.sum / y.length
        Array.fill(h)(mean)
    }
    raw.map(v => math.max(math.expm1(v), 0.0))
  }
}
