package graft.functions

/** Scalar special functions backing the p-values of the statistics module
  * ([[graft.operators.Stats]]) — the JVM has no scipy, so the survival
  * functions of the normal, χ², Student-t and F distributions are derived
  * from the two classic kernels every textbook builds them on:
  *
  *   - regularized incomplete gamma  P(a,x)/Q(a,x)   (series + Lentz CF)
  *   - regularized incomplete beta   I_x(a,b)        (Lentz CF)
  *
  * using the standard identities
  *   erfc(x)      = Q(1/2, x²)                    (x ≥ 0)
  *   norm.sf(z)   = erfc(z/√2)/2
  *   chi2.sf(x,k) = Q(k/2, x/2)
  *   t.sf(t,ν)    = I_{ν/(ν+t²)}(ν/2, 1/2) / 2    (t ≥ 0)
  *   f.sf(f,d₁,d₂)= I_{d₂/(d₂+d₁f)}(d₂/2, d₁/2)
  *
  * The implementations are the public-domain algorithms (Lanczos log-gamma,
  * gamma series/continued fraction, beta continued fraction) as described
  * in Abramowitz & Stegun and Numerical Recipes; accuracy is ~1e-14 over
  * the parameter ranges statistics uses, verified in SpecialMathSpec via
  * exact cross-identities (χ²₁ ↔ normal, F(1,ν) ↔ t(ν), P+Q=1, I_x
  * symmetry) and published constants (erfc(1), t/χ² critical values).
  *
  * These run on O(1) final aggregate rows only — never in a per-row hot
  * path — so a (deterministic, non-codegen) UDF wrapper is acceptable.
  */
object SpecialMath {

  /** ln Γ(x), Lanczos approximation (g = 7, 9 coefficients). */
  def gammaln(x: Double): Double =
    if (x < 0.5)
      // reflection for the (unused in stats, but correct) left half-plane
      math.log(math.Pi / math.sin(math.Pi * x)) - gammaln(1.0 - x)
    else {
      val z = x - 1.0
      var a = 0.99999999999980993
      val c = LANCZOS
      var i = 0
      while (i < c.length) { a += c(i) / (z + i + 1); i += 1 }
      val t = z + 7.5
      0.5 * math.log(2.0 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(a)
    }

  private val LANCZOS = Array(
    676.5203681218851, -1259.1392167224028, 771.32342877765313,
    -176.61502916214059, 12.507343278686905, -0.13857109526572012,
    9.9843695780195716e-6, 1.5056327351493116e-7)

  /** Regularized lower incomplete gamma P(a, x) = γ(a,x)/Γ(a). */
  def gammaP(a: Double, x: Double): Double = {
    require(a > 0 && x >= 0, s"gammaP domain: a=$a x=$x")
    if (x == 0) 0.0
    else if (x < a + 1.0) gammaSeries(a, x)
    else 1.0 - gammaCF(a, x)
  }

  /** Regularized upper incomplete gamma Q(a, x) = 1 − P(a, x). */
  def gammaQ(a: Double, x: Double): Double = {
    require(a > 0 && x >= 0, s"gammaQ domain: a=$a x=$x")
    if (x == 0) 1.0
    else if (x < a + 1.0) 1.0 - gammaSeries(a, x)
    else gammaCF(a, x)
  }

  // P(a,x) by its power series — converges fast for x < a+1
  private def gammaSeries(a: Double, x: Double): Double = {
    var ap = a
    var sum = 1.0 / a
    var del = sum
    var n = 0
    while (n < 1000 && math.abs(del) >= math.abs(sum) * 1e-16) {
      ap += 1.0; del *= x / ap; sum += del; n += 1
    }
    sum * math.exp(-x + a * math.log(x) - gammaln(a))
  }

  // Q(a,x) by modified-Lentz continued fraction — converges fast for x ≥ a+1
  private def gammaCF(a: Double, x: Double): Double = {
    val FPMIN = 1e-300
    var b = x + 1.0 - a
    var c = 1.0 / FPMIN
    var d = 1.0 / b
    var h = d
    var i = 1
    var done = false
    while (i <= 1000 && !done) {
      val an = -i * (i - a)
      b += 2.0
      d = an * d + b; if (math.abs(d) < FPMIN) d = FPMIN
      c = b + an / c; if (math.abs(c) < FPMIN) c = FPMIN
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < 1e-16) done = true
      i += 1
    }
    math.exp(-x + a * math.log(x) - gammaln(a)) * h
  }

  /** Regularized incomplete beta I_x(a, b). */
  def betainc(a: Double, b: Double, x: Double): Double = {
    require(a > 0 && b > 0, s"betainc domain: a=$a b=$b")
    if (x <= 0.0) 0.0
    else if (x >= 1.0) 1.0
    else {
      val bt = math.exp(gammaln(a + b) - gammaln(a) - gammaln(b) +
        a * math.log(x) + b * math.log(1.0 - x))
      // use the CF on the side where it converges quickly, mirror otherwise
      if (x < (a + 1.0) / (a + b + 2.0)) bt * betaCF(a, b, x) / a
      else 1.0 - bt * betaCF(b, a, 1.0 - x) / b
    }
  }

  private def betaCF(a: Double, b: Double, x: Double): Double = {
    val FPMIN = 1e-300
    val qab = a + b
    val qap = a + 1.0
    val qam = a - 1.0
    var c = 1.0
    var d = 1.0 - qab * x / qap
    if (math.abs(d) < FPMIN) d = FPMIN
    d = 1.0 / d
    var h = d
    var m = 1
    var done = false
    while (m <= 1000 && !done) {
      val m2 = 2 * m
      var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
      d = 1.0 + aa * d; if (math.abs(d) < FPMIN) d = FPMIN
      c = 1.0 + aa / c; if (math.abs(c) < FPMIN) c = FPMIN
      d = 1.0 / d
      h *= d * c
      aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
      d = 1.0 + aa * d; if (math.abs(d) < FPMIN) d = FPMIN
      c = 1.0 + aa / c; if (math.abs(c) < FPMIN) c = FPMIN
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < 1e-16) done = true
      m += 1
    }
    h
  }

  /** Complementary error function. */
  def erfc(x: Double): Double =
    if (x >= 0) gammaQ(0.5, x * x)
    else 2.0 - gammaQ(0.5, x * x)

  def erf(x: Double): Double = 1.0 - erfc(x)

  /** Standard-normal survival function P(Z > z). */
  def normSf(z: Double): Double = 0.5 * erfc(z / math.sqrt(2.0))

  /** χ²(df) survival function P(X > x). */
  def chi2Sf(x: Double, df: Double): Double =
    if (x <= 0) 1.0 else gammaQ(df / 2.0, x / 2.0)

  /** Student-t(df) survival function P(T > t) (scipy `t.sf`). */
  def tSf(t: Double, df: Double): Double = {
    val ib = betainc(df / 2.0, 0.5, df / (df + t * t))
    if (t >= 0) 0.5 * ib else 1.0 - 0.5 * ib
  }

  /** F(d1, d2) survival function P(F > f) (scipy `special.fdtrc`). */
  def fSf(f: Double, d1: Double, d2: Double): Double =
    if (f <= 0) 1.0 else betainc(d2 / 2.0, d1 / 2.0, d2 / (d2 + d1 * f))
}
