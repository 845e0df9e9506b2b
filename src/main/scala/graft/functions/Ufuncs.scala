package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The numpy elementwise-ufunc surface (reference: `dask/array/ufunc.py:1-349`
  * and `UFuncElemwise` `dask_expr/_expr.py:826` — ~90 ufuncs applied
  * blockwise).  Spark-first: every function here is a codegen'd `Column`
  * expression built from `org.apache.spark.sql.functions` / arithmetic —
  * no UDFs, so a chain of ufuncs stays inside one WholeStageCodegen span
  * and fuses into the scan.
  *
  * Functions whose Spark builtin already matches numpy exactly (exp, log,
  * sqrt, sin…) are thin aliases kept for surface completeness; the value
  * is in the composed forms (logaddexp, sinc, heaviside, copysign…) where
  * the numpy semantics need assembling.
  */
object Ufuncs {

  // --- trig ---
  def sin(c: Column): Column = org.apache.spark.sql.functions.sin(c)
  def cos(c: Column): Column = org.apache.spark.sql.functions.cos(c)
  def tan(c: Column): Column = org.apache.spark.sql.functions.tan(c)
  def arcsin(c: Column): Column = asin(c)
  def arccos(c: Column): Column = acos(c)
  def arctan(c: Column): Column = atan(c)
  def arctan2(y: Column, x: Column): Column = atan2(y, x)
  def sinh(c: Column): Column = org.apache.spark.sql.functions.sinh(c)
  def cosh(c: Column): Column = org.apache.spark.sql.functions.cosh(c)
  def tanh(c: Column): Column = org.apache.spark.sql.functions.tanh(c)
  def arcsinh(c: Column): Column = asinh(c)
  def arccosh(c: Column): Column = acosh(c)
  def arctanh(c: Column): Column = atanh(c)
  def deg2rad(c: Column): Column = radians(c)
  def rad2deg(c: Column): Column = degrees(c)
  def hypot(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.hypot(a, b)

  // --- exp / log ---
  def exp(c: Column): Column = org.apache.spark.sql.functions.exp(c)
  def expm1(c: Column): Column = org.apache.spark.sql.functions.expm1(c)
  def exp2(c: Column): Column = pow(lit(2.0), c)
  // Spark's log family yields NULL at/below zero; numpy yields -inf at 0
  // and nan below — and NULL silently vanishes from aggregates where
  // nan poisons them, so the numpy edge values matter
  private def logDomain(c: Column, interior: Column): Column =
    when(c === 0, lit(Double.NegativeInfinity))
      .when(c < 0, lit(Double.NaN)).otherwise(interior)
  def log(c: Column): Column = logDomain(c, org.apache.spark.sql.functions.log(c))
  def log1p(c: Column): Column =
    when(c === -1, lit(Double.NegativeInfinity))
      .when(c < -1, lit(Double.NaN))
      .otherwise(org.apache.spark.sql.functions.log1p(c))
  def log2(c: Column): Column = logDomain(c, org.apache.spark.sql.functions.log2(c))
  def log10(c: Column): Column = logDomain(c, org.apache.spark.sql.functions.log10(c))
  /** ln(eˣ + eʸ) computed stably: max + log1p(exp(-|x-y|)). */
  def logaddexp(a: Column, b: Column): Column =
    greatest(a, b) + log1p(org.apache.spark.sql.functions.exp(-abs(a - b)))
  /** log₂(2ˣ + 2ʸ), same stabilization in base 2. */
  def logaddexp2(a: Column, b: Column): Column =
    greatest(a, b) + log2(lit(1.0) + pow(lit(2.0), -abs(a - b)))

  // --- powers / roots ---
  def sqrt(c: Column): Column = org.apache.spark.sql.functions.sqrt(c)
  def cbrt(c: Column): Column = org.apache.spark.sql.functions.cbrt(c)
  def square(c: Column): Column = c * c
  def power(a: Column, b: Column): Column = pow(a, b)
  def reciprocal(c: Column): Column = when(c === 0, lit(Double.PositiveInfinity)).otherwise(lit(1.0) / c) // numpy: 1/0 = inf, not NULL
  def ldexp(a: Column, b: Column): Column = a * pow(lit(2.0), b)

  // --- rounding ---
  def rint(c: Column): Column = org.apache.spark.sql.functions.rint(c)
  def floor(c: Column): Column = org.apache.spark.sql.functions.floor(c)
  def ceil(c: Column): Column = org.apache.spark.sql.functions.ceil(c)
  /** round toward zero, keeping double type (numpy trunc).  Spark's
    * floor/ceil return LongType (NaN → 0, saturating at ±2⁶³), so NaN/±inf
    * and magnitudes ≥ 2⁵² — where every double is already an integer —
    * pass through untouched.
    */
  def trunc(c: Column): Column =
    when(org.apache.spark.sql.functions.isnan(c) || abs(c) >= lit(4.503599627370496e15), c)
      .otherwise(when(c >= 0, org.apache.spark.sql.functions.floor(c))
        .otherwise(org.apache.spark.sql.functions.ceil(c)).cast("double"))
  def fix(c: Column): Column = trunc(c)

  // --- sign / compare ---
  def sign(c: Column): Column = signum(c)
  /** true iff the IEEE sign bit is set — including -0.0 (numpy signbit).
    * The raw-bits test is the only exact form: 1/-0.0 would distinguish
    * the zero signs but ANSI mode rejects the division.
    */
  private val signbitUdf = udf((x: Double) => java.lang.Double.doubleToRawLongBits(x) < 0)
  def signbit(c: Column): Column = signbitUdf(c.cast("double"))
  def absolute(c: Column): Column = abs(c)
  def fabs(c: Column): Column = abs(c)
  /** numpy maximum/minimum PROPAGATE NaN. Spark orders NaN LARGEST
    * (unlike IEEE), so greatest already propagates it but least would
    * skip it — minimum needs the explicit NaN guard.
    */
  def maximum(a: Column, b: Column): Column = greatest(a, b)
  def minimum(a: Column, b: Column): Column =
    when(isnan(a) || isnan(b), lit(Double.NaN)).otherwise(least(a, b))
  /** numpy fmax/fmin IGNORE NaN (return the other operand; NaN only when
    * both are NaN).
    */
  def fmax(a: Column, b: Column): Column =
    when(isnan(a), b).when(isnan(b), a).otherwise(greatest(a, b))
  def fmin(a: Column, b: Column): Column =
    when(isnan(a), b).when(isnan(b), a).otherwise(least(a, b))
  /** magnitude of a with the sign of b (numpy copysign; b = ±0 maps to +). */
  def copysign(a: Column, b: Column): Column =
    when(b < 0, -abs(a)).otherwise(abs(a))
  /** C-style remainder: sign follows the DIVIDEND (numpy fmod, Java %). */
  def fmod(a: Column, b: Column): Column = a % b
  /** Python-style modulo: sign follows the DIVISOR (numpy mod/remainder). */
  def mod(a: Column, b: Column): Column = ((a % b) + b) % b
  def heaviside(c: Column, h0: Column): Column =
    when(org.apache.spark.sql.functions.isnan(c), c) // NaN propagates (numpy)
      .when(c < 0, lit(0.0)).when(c > 0, lit(1.0)).otherwise(h0)

  // --- float predicates ---
  def isnan(c: Column): Column = org.apache.spark.sql.functions.isnan(c)
  def isfinite(c: Column): Column =
    !org.apache.spark.sql.functions.isnan(c) && abs(c) =!= lit(Double.PositiveInfinity)
  def isinf(c: Column): Column = abs(c) === lit(Double.PositiveInfinity)
  def nanToNum(c: Column): Column =
    when(org.apache.spark.sql.functions.isnan(c), lit(0.0))
      .when(c === lit(Double.PositiveInfinity), lit(Double.MaxValue))
      .when(c === lit(Double.NegativeInfinity), lit(Double.MinValue))
      .otherwise(c)

  // --- misc ---
  /** normalized sinc: sin(πx)/(πx), 1 at 0 (numpy convention). */
  def sinc(c: Column): Column = {
    val px = lit(math.Pi) * c
    when(c === 0, lit(1.0)).otherwise(org.apache.spark.sql.functions.sin(px) / px)
  }
  def clip(c: Column, lo: Column, hi: Column): Column = least(greatest(c, lo), hi)
  /** logistic sigmoid 1/(1+e⁻ˣ) (scipy.special.expit, numpy ufunc set). */
  def expit(c: Column): Column = lit(1.0) / (lit(1.0) + exp(-c))
  /** log-odds ln(x/(1-x)) (scipy.special.logit). */
  def logit(c: Column): Column =
    when(c === 0, lit(Double.NegativeInfinity))
      .when(c === 1, lit(Double.PositiveInfinity))
      .when(c < 0 || c > 1, lit(Double.NaN))
      .otherwise(org.apache.spark.sql.functions.log(c / (lit(1.0) - c)))
  /** fractional and integral parts (numpy modf), both with x's sign. */
  def modf(c: Column): Column = struct((c - trunc(c)).as("frac"), trunc(c).as("int"))

  /** numpy frexp: x = mantissa · 2^exponent with 0.5 <= |mantissa| < 1
    * (0 → (0, 0); non-finite x → (x, 0), numpy's convention — without the
    * short-circuit, 2^inf makes the mantissa NaN). The log2-derived
    * exponent candidate is corrected by one where floating-point log
    * rounding lands outside the half-open mantissa interval, so exact
    * powers of two stay exact. Caveat: deep in the subnormal range the
    * log2 candidate can be off by more than the ±1 this correction
    * recovers; normals are exact.
    */
  def frexp(c: Column): Column = {
    val passThrough = c === 0 || isnan(c) ||
      c === lit(Double.PositiveInfinity) || c === lit(Double.NegativeInfinity)
    val e0 = when(passThrough, lit(0.0))
      .otherwise(org.apache.spark.sql.functions.floor(
        org.apache.spark.sql.functions.log(2.0, abs(c))) + 1.0)
    val m0 = c / pow(lit(2.0), e0)
    val e1 = when(passThrough, lit(0.0))
      .when(abs(m0) >= 1.0, e0 + 1.0)
      .when(abs(m0) < 0.5, e0 - 1.0)
      .otherwise(e0)
    struct(
      when(passThrough, c).otherwise(c / pow(lit(2.0), e1)).as("mantissa"),
      e1.as("exponent"))
  }

  /** numpy isposinf / isneginf. */
  def isposinf(c: Column): Column = c === lit(Double.PositiveInfinity)
  def isneginf(c: Column): Column = c === lit(Double.NegativeInfinity)

  /** dask/pandas isnull / notnull: missing = SQL NULL or NaN. */
  def isnull(c: Column): Column = c.isNull || isnan(c)
  def notnull(c: Column): Column = !isnull(c)

  /** numpy divmod: (floor quotient, python-style remainder) as a struct —
    * the same pairing contract as [[modf]]/[[frexp]]; q = (a - mod(a,b))/b
    * so q*b + r == a exactly even at sign boundaries. A zero divisor
    * yields (0, 0) — numpy's divmod-by-zero convention — instead of the
    * silent (null, null) Spark's non-ANSI division would produce.
    */
  def divmod(a: Column, b: Column): Column = {
    val r = mod(a, b)
    when(b === 0, struct(lit(0.0).as("quot"), lit(0.0).as("rem")))
      .otherwise(struct(((a - r) / b).as("quot"), r.as("rem")))
  }

  /** numpy i0 — modified Bessel function of the first kind, order 0, via
    * the Abramowitz & Stegun 9.8.1/9.8.2 polynomial pair (|rel err| <
    * 1.6e-7 small-arg, < 1.9e-7 large-arg) — a codegen'd piecewise
    * polynomial, no UDF.
    */
  def i0(c: Column): Column = {
    val ax = abs(c)
    val tS = (ax / 3.75) * (ax / 3.75)
    def poly(t: Column, ks: Seq[Double]): Column =
      ks.reverse.foldLeft(lit(0.0): Column)((acc, k) => acc * t + k)
    val small = poly(tS, Seq(1.0, 3.5156229, 3.0899424, 1.2067492,
      0.2659732, 0.0360768, 0.0045813))
    val tL = lit(3.75) / ax
    val large = org.apache.spark.sql.functions.exp(ax) / sqrt(ax) *
      poly(tL, Seq(0.39894228, 0.01328592, 0.00225319, -0.00157565,
        0.00916281, -0.02057706, 0.02635537, -0.01647633, 0.00392377))
    when(ax <= 3.75, small).otherwise(large)
  }

  // integer number theory (numpy gcd/lcm) — Euclid's loop needs real
  // iteration, so these are the module's only UDFs; still one jitted
  // closure per batch, no Python round trip
  private def gcdL(a0: Long, b0: Long): Long = {
    var a = math.abs(a0); var b = math.abs(b0)
    while (b != 0) { val t = a % b; a = b; b = t }
    a
  }
  private val gcdUdf = udf((a: Long, b: Long) => gcdL(a, b))
  private val lcmUdf = udf((a: Long, b: Long) =>
    if (a == 0 || b == 0) 0L else math.abs(a / gcdL(a, b) * b))
  def gcd(a: Column, b: Column): Column = gcdUdf(a.cast("long"), b.cast("long"))
  def lcm(a: Column, b: Column): Column = lcmUdf(a.cast("long"), b.cast("long"))

  // float representation helpers (numpy nextafter/spacing)
  private val nextafterUdf = udf((a: Double, b: Double) => Math.nextAfter(a, b))
  private val spacingUdf = udf((a: Double) => Math.ulp(a))
  def nextafter(a: Column, b: Column): Column = nextafterUdf(a, b)
  def spacing(c: Column): Column = spacingUdf(c)

  // --- nan-aware reductions (numpy nansum family, dask
  // `array/reductions.py:70-960` nan-variants) -------------------------
  // Spark aggregates SKIP null but PROPAGATE NaN, so the nan-variants are
  // the plain aggregates over a NaN→NULL remap — all codegen, and the
  // partial→final aggregation shape is unchanged.
  def nanToNull(c: Column): Column =
    when(org.apache.spark.sql.functions.isnan(c), lit(null)).otherwise(c)
  /** numpy nansum of an all-NaN slice is 0.0, not NULL — coalesce. */
  def nansum(c: Column): Column = coalesce(sum(nanToNull(c)), lit(0.0))
  def nanmean(c: Column): Column = avg(nanToNull(c))
  def nanmin(c: Column): Column = min(nanToNull(c))
  def nanmax(c: Column): Column = max(nanToNull(c))
  def nanstd(c: Column): Column = stddev_samp(nanToNull(c))
  def nanvar(c: Column): Column = var_samp(nanToNull(c))
  /** numpy nancumsum: NaN treated as 0 inside the running sum. */
  def nancumsumTerm(c: Column): Column = coalesce(nanToNull(c), lit(0.0))
}
