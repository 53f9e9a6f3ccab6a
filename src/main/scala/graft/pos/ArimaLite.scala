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

  private def sdiff(y: Array[Double], s: Int): Array[Double] =
    if (y.length <= s) Array.empty
    else Array.tabulate(y.length - s)(i => y(i + s) - y(i))

  /** Apply d regular + sD seasonal differences; returns the working
    * series plus the pre-difference series stack (head = last applied)
    * needed to integrate a forecast back to the original scale. */
  private def diffChain(y: Array[Double], d: Int, sD: Int, s: Int)
      : (Array[Double], List[(Array[Double], Int)]) = {
    var cur = y
    var stack = List.empty[(Array[Double], Int)]
    for (_ <- 0 until d) { stack = (cur, 1) :: stack; cur = diff(cur) }
    for (_ <- 0 until sD) { stack = (cur, s) :: stack; cur = sdiff(cur, s) }
    (cur, stack)
  }

  /** Invert the difference chain: each step anchors on the tail of the
    * corresponding pre-difference series (x_t = Δx_t + x_{t-lag}). */
  private def integrate(fc: Array[Double],
                        stack: List[(Array[Double], Int)]): Array[Double] =
    stack.foldLeft(fc) { case (f, (pre, lag)) =>
      val hist = scala.collection.mutable.ArrayBuffer(pre.toSeq: _*)
      f.map { dv =>
        val v = dv + hist(hist.length - lag)
        hist += v
        v
      }
    }

  /** Grid over p ∈ 0..maxP × q ∈ 0..maxQ × d ∈ {0,1} (p+q ≥ 1), min
    * AIC — the non-seasonal slice of the reference's SARIMAX grid
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

  // ---------------------------------------------------------- seasonal
  /** Subset-lag SARMA fit on the (d, D_s)-differenced series. The
    * multiplicative SARIMAX polynomial φ(B)Φ(B^s) is expanded to its
    * lag set {i + j·s : 0 ≤ i ≤ p, 0 ≤ j ≤ P} \ {0} and the products
    * φ_iΦ_j are freed into independent OLS coefficients (same for the
    * MA side over the Hannan–Rissanen residuals) — a superset of the
    * reference's SARIMAX family under the repo's documented OLS-not-MLE
    * tolerance (arima.py:118-139, seasonal_order=(P,D,Q,7)). */
  final case class LagFit(arLags: Array[Int], maLags: Array[Int],
                          d: Int, sD: Int, s: Int,
                          coef: Array[Double], maCoef: Array[Double],
                          intercept: Double, sigma2: Double,
                          aic: Double, resid: Array[Double])

  /** φ(B)Φ(B^s) expansion: {1..p} ∪ {i + j·s} for j ≥ 1, i ≤ p. */
  private def lagSet(p: Int, sp: Int, s: Int): Array[Int] =
    ((1 to p) ++ (for { j <- 1 to sp; i <- 0 to p } yield i + j * s))
      .distinct.sorted.toArray

  def fitLags(w: Array[Double], arLags: Array[Int],
              maLags: Array[Int]): Option[LagFit] = {
    val pMax = if (arLags.isEmpty) 0 else arLags.max
    val qMax = if (maLags.isEmpty) 0 else maLags.max
    // stage 1 (only when MA lags are present): long AR residuals
    val eHat: Array[Double] =
      if (maLags.isEmpty) new Array[Double](w.length)
      else {
        val m = math.max(pMax, qMax) + 3
        fitAr(w, m).map(residualsAr(w, _)).getOrElse(return None)
      }
    val start =
      if (maLags.isEmpty) pMax
      else math.max(pMax, math.max(pMax, qMax) + 3 + qMax)
    val n = w.length - start
    val k = 1 + arLags.length + maLags.length
    if (n <= k + 2) return None
    def row(t: Int): Array[Double] =
      1.0 +: (arLags.map(l => w(t - l)) ++ maLags.map(l => eHat(t - l)))
    val xtx = Array.fill(k, k)(0.0)
    val xty = Array.fill(k)(0.0)
    for (t <- start until w.length) {
      val r = row(t)
      for (i <- 0 until k) {
        xty(i) += r(i) * w(t)
        for (j <- 0 until k) xtx(i)(j) += r(i) * r(j)
      }
    }
    solve(xtx, xty).flatMap { beta =>
      var sse = 0.0
      for (t <- start until w.length) {
        val r = row(t)
        var pred = 0.0
        for (i <- 0 until k) pred += beta(i) * r(i)
        sse += math.pow(w(t) - pred, 2)
      }
      val sigma2 = math.max(sse / n, 1e-12)
      if (sigma2.isNaN) None
      else {
        val fit = LagFit(arLags, maLags, 0, 0, 0,
          beta.slice(1, 1 + arLags.length),
          beta.slice(1 + arLags.length, k), beta(0), sigma2,
          n * math.log(sigma2) + 2.0 * (k + 1), Array.empty)
        Some(fit.copy(resid = residualsLags(w, fit)))
      }
    }
  }

  /** In-sample one-step residuals under the fitted SARMA recursion
    * (feeds the MA terms of the iterated forecast). */
  private def residualsLags(w: Array[Double], f: LagFit): Array[Double] = {
    val pMax = if (f.arLags.isEmpty) 0 else f.arLags.max
    val qMax = if (f.maLags.isEmpty) 0 else f.maLags.max
    val e = new Array[Double](w.length)
    for (t <- math.max(pMax, qMax) until w.length) {
      var pred = f.intercept
      for (i <- f.arLags.indices) pred += f.coef(i) * w(t - f.arLags(i))
      for (j <- f.maLags.indices) pred += f.maCoef(j) * e(t - f.maLags(j))
      e(t) = w(t) - pred
    }
    e
  }

  /** Full seasonal grid — the reference's 288-combination shape:
    * (p,d,q) ∈ (0..2)×(0..1)×(0..2) × (P,D,Q) ∈ {0,1}³ at period s,
    * min AIC, per-combination failures skipped (arima.py:41-46,
    * 118-139). */
  /** All grid fits, best (lowest) AIC first — callers that iterate a
    * forecast should walk this list and take the first SANE forecast:
    * with the σ² floor, several degenerate perfect fits can tie on
    * likelihood and the nominal winner may be an explosive recursion
    * (OLS enforces neither stationarity nor invertibility — and the
    * reference runs SARIMAX with enforce_stationarity=False too). */
  def selectSeasonalAll(y: Array[Double], s: Int = 7, maxP: Int = 2,
                        maxQ: Int = 2, maxSP: Int = 1, maxSQ: Int = 1)
      : Seq[LagFit] = {
    val fits = for {
      d <- 0 to 1
      sD <- 0 to 1
      w = diffChain(y, d, sD, s)._1
      if w.nonEmpty
      p <- 0 to maxP
      q <- 0 to maxQ
      sp <- 0 to maxSP
      sq <- 0 to maxSQ
      if p + q + sp + sq > 0
      f <- fitLags(w, lagSet(p, sp, s), lagSet(q, sq, s))
    } yield f.copy(d = d, sD = sD, s = s)
    fits.sortBy(_.aic)
  }

  def selectSeasonal(y: Array[Double], s: Int = 7, maxP: Int = 2,
                     maxQ: Int = 2, maxSP: Int = 1, maxSQ: Int = 1)
      : Option[LagFit] =
    selectSeasonalAll(y, s, maxP, maxQ, maxSP, maxSQ).headOption

  // --------------------------------------------------- CSS refinement
  /** Conditional sum of squares of a parameter vector
    * [intercept, φ…, θ…] under the (S)ARMA recursion with zero
    * pre-sample shocks — the exact objective statsmodels' method="css"
    * minimizes (the reference's SARIMAX fits CSS-MLE; Gaussian MLE and
    * CSS share their minimizer up to the pre-sample treatment). */
  private def cssSse(w: Array[Double], arLags: Array[Int],
                     maLags: Array[Int], params: Array[Double]): Double = {
    val pMax = if (arLags.isEmpty) 0 else arLags.max
    val qMax = if (maLags.isEmpty) 0 else maLags.max
    // the recursion still runs from the lag cover, but the SUM skips a
    // further qMax steps: with zero pre-sample shocks the first MA
    // residuals carry a startup transient, and letting the optimizer
    // see it makes it damp the transient instead of fitting the
    // process (visible as flattened seasonal spikes on short series)
    val start = math.max(pMax, qMax)
    val burn = start + qMax
    val e = new Array[Double](w.length)
    var sse = 0.0
    for (t <- start until w.length) {
      var pred = params(0)
      for (i <- arLags.indices) pred += params(1 + i) * w(t - arLags(i))
      for (j <- maLags.indices)
        pred += params(1 + arLags.length + j) * e(t - maLags(j))
      e(t) = w(t) - pred
      if (t >= burn) sse += e(t) * e(t)
    }
    sse
  }

  /** The CSS objective value of a fit's own parameters — exposed so
    * callers/tests can compare warm start vs refined on equal terms. */
  def cssObjective(w: Array[Double], fit: LagFit): Double =
    cssSse(w, fit.arLags, fit.maLags,
      fit.intercept +: (fit.coef ++ fit.maCoef))

  /** Derivative-free Nelder–Mead minimization (standard ρ=1, χ=2,
    * γ=½, σ=½ simplex moves) — small, dependency-free, and exactly
    * enough for the ≤ 13-parameter CSS surfaces here. */
  private def nelderMead(f: Array[Double] => Double, x0: Array[Double],
                         maxIter: Int): Array[Double] = {
    val n = x0.length
    var simplex = (x0 +: Array.tabulate(n) { i =>
      val x = x0.clone()
      x(i) += (if (math.abs(x(i)) > 1e-8) 0.05 * math.abs(x(i)) else 0.01)
      x
    }).map(x => (x, f(x))).sortBy(_._2)
    var iter = 0
    while (iter < maxIter &&
           simplex.last._2 - simplex.head._2 > 1e-12 *
             (math.abs(simplex.head._2) + 1e-12)) {
      val worst = simplex.last
      val centroid = Array.tabulate(n)(j =>
        simplex.dropRight(1).map(_._1(j)).sum / n)
      def move(a: Double) =
        Array.tabulate(n)(j => centroid(j) + a * (centroid(j) - worst._1(j)))
      val refl = move(1.0); val fRefl = f(refl)
      val replacement =
        if (fRefl < simplex.head._2) {
          val exp = move(2.0); val fExp = f(exp)
          if (fExp < fRefl) (exp, fExp) else (refl, fRefl)
        } else if (fRefl < simplex(simplex.length - 2)._2) (refl, fRefl)
        else {
          val con = move(-0.5); val fCon = f(con)
          if (fCon < worst._2) (con, fCon)
          else { // shrink toward the best vertex
            val best = simplex.head._1
            simplex = simplex.head +: simplex.tail.map { case (x, _) =>
              val s = Array.tabulate(n)(j => best(j) + 0.5 * (x(j) - best(j)))
              (s, f(s))
            }
            simplex.last
          }
        }
      simplex = (simplex.dropRight(1) :+ replacement).sortBy(_._2)
      iter += 1
    }
    simplex.head._1
  }

  // ------------------------------------------------- exact Kalman MLE
  /** Exact Gaussian log-likelihood of a subset-lag ARMA(+intercept)
    * via the Kalman filter on Harvey's state-space form — the same
    * objective statsmodels' SARIMAX maximizes (concentrated σ²),
    * closing the OLS/CSS-vs-MLE gap exactly. Subset lags expand to a
    * dense lag polynomial with zeros; state dim m = max(p, q+1); the
    * stationary initial covariance solves the m²×m² Lyapunov system
    * (I − T⊗T)vec(P₀)=vec(RR′). Non-stationary parameter points (unit
    * AR sum, Lyapunov failure, F ≤ 0) score −∞ so the optimizer walks
    * back inside the stationary region. */
  def kalmanLogLik(w: Array[Double], arLags: Array[Int],
                   maLags: Array[Int], params: Array[Double]): Double =
    kalman(w, arLags, maLags, params)._1

  /** (log-likelihood, concentrated σ̂²). */
  private def kalman(w: Array[Double], arLags: Array[Int],
                     maLags: Array[Int], params: Array[Double])
      : (Double, Double) = {
    val fail = (Double.NegativeInfinity, Double.NaN)
    val pMax = if (arLags.isEmpty) 0 else arLags.max
    val qMax = if (maLags.isEmpty) 0 else maLags.max
    val m = math.max(pMax, qMax + 1)
    val phi = new Array[Double](m) // dense φ_1..m (zeros off-lag)
    for (i <- arLags.indices) phi(arLags(i) - 1) = params(1 + i)
    val theta = new Array[Double](m) // dense θ_1..m-1 at positions 1..
    for (j <- maLags.indices if maLags(j) < m)
      theta(maLags(j)) = params(1 + arLags.length + j)
    val r = new Array[Double](m); r(0) = 1.0
    for (i <- 1 until m) r(i) = theta(i)
    val phiSum = phi.sum
    if (math.abs(1.0 - phiSum) < 1e-8) return fail
    val mu = params(0) / (1.0 - phiSum)
    // T row i = φ_{i+1}·e0 + shift: T(i)(0)=phi(i), T(i)(i+1)=1
    def mulT(p: Array[Array[Double]]): Array[Array[Double]] =
      Array.tabulate(m, m) { (i, j) =>
        phi(i) * p(0)(j) + (if (i < m - 1) p(i + 1)(j) else 0.0)
      }
    def mulTRight(p: Array[Array[Double]]): Array[Array[Double]] =
      Array.tabulate(m, m) { (i, j) =>
        phi(j) * p(i)(0) + (if (j < m - 1) p(i)(j + 1) else 0.0)
      }
    // stationary P0: (I - T⊗T) vec(P) = vec(RR')
    val dim = m * m
    val a0 = Array.tabulate(dim, dim) { (row, colIdx) =>
      val (i, j) = (row / m, row % m)
      val (k, l) = (colIdx / m, colIdx % m)
      val tik = if (k == 0) phi(i) else if (k == i + 1) 1.0 else 0.0
      val tjl = if (l == 0) phi(j) else if (l == j + 1) 1.0 else 0.0
      (if (row == colIdx) 1.0 else 0.0) - tik * tjl
    }
    val b0 = Array.tabulate(dim)(x => r(x / m) * r(x % m))
    val p0vec = solve(a0, b0).getOrElse(return fail)
    var p = Array.tabulate(m, m)((i, j) => p0vec(i * m + j))
    if (p(0)(0) <= 0 || !java.lang.Double.isFinite(p(0)(0)))
      return fail
    val a = new Array[Double](m)
    var sumLogF = 0.0
    var ssq = 0.0
    for (t <- w.indices) {
      val f = p(0)(0)
      if (f <= 1e-300 || !java.lang.Double.isFinite(f))
        return fail
      val v = w(t) - mu - a(0)
      sumLogF += math.log(f)
      ssq += v * v / f
      // a' = T a + (T P e0) v / F ; P' = T P T' + RR' − (TPe0)(TPe0)'/F
      val tp = mulT(p)
      val k = Array.tabulate(m)(i => tp(i)(0) / f)
      val ta = Array.tabulate(m)(i =>
        phi(i) * a(0) + (if (i < m - 1) a(i + 1) else 0.0))
      for (i <- 0 until m) a(i) = ta(i) + k(i) * v
      val tpt = mulTRight(tp)
      p = Array.tabulate(m, m)((i, j) =>
        tpt(i)(j) + r(i) * r(j) - k(i) * f * k(j))
    }
    val n = w.length
    val sigma2 = ssq / n
    if (sigma2 <= 0 || !java.lang.Double.isFinite(sigma2))
      fail
    else
      (-0.5 * n * (math.log(2 * math.Pi) + 1.0 + math.log(sigma2)) -
        0.5 * sumLogF, sigma2)
  }

  /** Exact-MLE refinement from a CSS/HR warm start: Nelder–Mead
    * maximizing the Kalman likelihood. Keeps the warm start when the
    * start itself is outside the stationary region (the filter scores
    * it −∞ — the reference runs enforce_stationarity=False and
    * tolerates such fits too) or when refinement does not improve the
    * exact likelihood. */
  def refineMle(w: Array[Double], fit: LagFit,
                maxIter: Int = 300): LagFit = {
    if (fit.sigma2 <= 1e-10) return fit
    val x0 = fit.intercept +: (fit.coef ++ fit.maCoef)
    val ll0 = kalmanLogLik(w, fit.arLags, fit.maLags, x0)
    if (!java.lang.Double.isFinite(ll0)) return fit
    val best = nelderMead(
      ps => -kalmanLogLik(w, fit.arLags, fit.maLags, ps), x0, maxIter)
    val (ll1, sigma2) = kalman(w, fit.arLags, fit.maLags, best)
    if (!java.lang.Double.isFinite(ll1) || ll1 < ll0) return fit
    val k = x0.length
    val refined = fit.copy(
      coef = best.slice(1, 1 + fit.arLags.length),
      maCoef = best.slice(1 + fit.arLags.length, k),
      intercept = best(0),
      sigma2 = if (java.lang.Double.isFinite(sigma2)) sigma2
               else fit.sigma2,
      aic = -2.0 * ll1 + 2.0 * (k + 1))
    refined.copy(resid = residualsLags(w, refined))
  }

  /** Refine a Hannan–Rissanen OLS fit by minimizing the true CSS
    * objective from the OLS point (two-stage HR is consistent but not
    * efficient — its MA coefficients regress on ESTIMATED residuals;
    * CSS re-optimizes them under the model's own recursion, which is
    * what statsmodels does after its own HR warm start). σ²/AIC are
    * recomputed under the CSS objective; the refined fit never has
    * higher CSS than the OLS start because NM only descends. */
  def refineCss(w: Array[Double], fit: LagFit,
                maxIter: Int = 400): LagFit = {
    // a σ²-floor fit is already exact on its sample — the CSS descent
    // could only trade that exactness against the startup transient
    if (fit.sigma2 <= 1e-10) return fit
    val x0 = fit.intercept +: (fit.coef ++ fit.maCoef)
    val pMax = if (fit.arLags.isEmpty) 0 else fit.arLags.max
    val qMax = if (fit.maLags.isEmpty) 0 else fit.maLags.max
    val n = w.length - (math.max(pMax, qMax) + qMax)
    val k = x0.length
    // sample-size guard BEFORE the descent — too-short series would
    // pay hundreds of objective evaluations for a discarded result
    if (n <= k + 2) return fit
    val best = nelderMead(cssSse(w, fit.arLags, fit.maLags, _), x0, maxIter)
    val sse = cssSse(w, fit.arLags, fit.maLags, best)
    val sigma2 = math.max(sse / n, 1e-12)
    val refined = fit.copy(
      coef = best.slice(1, 1 + fit.arLags.length),
      maCoef = best.slice(1 + fit.arLags.length, k),
      intercept = best(0), sigma2 = sigma2,
      aic = n * math.log(sigma2) + 2.0 * (k + 1))
    refined.copy(resid = residualsLags(w, refined))
  }

  /** Iterated h-step forecast of a seasonal fit on the differenced
    * scale (future shocks zero, trailing residuals feed the MA lags),
    * then integration back through the difference chain. */
  def forecastLagFit(y: Array[Double], fit: LagFit, h: Int)
      : Array[Double] = {
    val (w, stack) = diffChain(y, fit.d, fit.sD, fit.s)
    val buf = scala.collection.mutable.ArrayBuffer(w.toSeq: _*)
    val e = scala.collection.mutable.ArrayBuffer(
      (if (fit.resid.nonEmpty) fit.resid
       else new Array[Double](w.length)).toSeq: _*)
    val out = new Array[Double](h)
    for (step <- 0 until h) {
      var v = fit.intercept
      for (i <- fit.arLags.indices)
        v += fit.coef(i) * buf(buf.length - fit.arLags(i))
      for (j <- fit.maLags.indices)
        v += fit.maCoef(j) * e(e.length - fit.maLags(j))
      buf += v
      e += 0.0
      out(step) = v
    }
    integrate(out, stack)
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

  /** Full contract: log1p → seasonal (s=7) grid select → forecast →
    * expm1 → clip ≥ 0 (arima.py:96,118-139,165-169). Falls back to the
    * series mean when the grid yields nothing (constant series etc.)
    * OR when the selected model's iterated forecast leaves the
    * observed envelope — an OLS-fit (S)ARMA can be non-stationary and
    * explode; the reference tolerates per-model failures the same
    * way. */
  def forecastLog1p(values: Array[Double], h: Int): Array[Double] = {
    val y = values.map(v => math.log1p(math.max(v, 0.0)))
    val mean = if (y.isEmpty) 0.0 else y.sum / y.length
    val lo = if (y.isEmpty) 0.0 else y.min - 5.0
    val hi = if (y.isEmpty) 0.0 else y.max + 5.0
    // walk the AIC order, first fit whose forecast stays inside the
    // observed envelope wins (degenerate σ²-floor ties can put an
    // explosive recursion first); nothing sane → series-mean fallback.
    // Each candidate runs the statsmodels estimation ladder from its
    // OLS warm start — CSS descent, then exact Kalman MLE (refineMle
    // keeps the CSS fit when the point is non-stationary or MLE does
    // not improve the exact likelihood) — and the iterator is lazy,
    // so only candidates actually reached pay the refinement.
    val raw = selectSeasonalAll(y).iterator
      .map { fit =>
        val w = diffChain(y, fit.d, fit.sD, fit.s)._1
        forecastLagFit(y, refineMle(w, refineCss(w, fit)), h)
      }
      .find(_.forall(v => java.lang.Double.isFinite(v) &&
        v >= lo && v <= hi))
      .getOrElse(Array.fill(h)(mean))
    raw.map(v => math.max(math.expm1(v), 0.0))
  }
}
