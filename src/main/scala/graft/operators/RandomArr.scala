package graft.operators

import org.apache.spark.sql.SparkSession

/** Seeded random chunked arrays — the dask.array.random surface
  * (reference `dask/array/random.py:1-1113`, where every distribution is a
  * per-chunk RandomState draw seeded from a deterministic sequence).
  *
  * Spark-first design: instead of seeding a stateful generator per chunk
  * (which ties values to one chunk grid), every element's value is a pure
  * function of `(seed, stream, global flat index)` through a splitmix64
  * finalizer — a counter-based RNG in the Philox spirit. That gives a
  * STRONGER property than dask's: the array is deterministic under
  * rechunk/slice/reshape, not just under same-chunking regeneration, and
  * generation stays a zero-shuffle grid-parallel map at any scale (the
  * block grid is enumerated distributively by `GArr.fromFunction`; no
  * driver data, no sequential dependency between draws).
  *
  * Multi-draw samplers (poisson's Knuth inversion, binomial's Bernoulli
  * sum) advance the `stream` counter per draw, so each element consumes an
  * independent substream.
  */
object GArrRandom {
  import GArr.cStrides

  /** splitmix64 output finalizer over a linearly-combined counter. */
  @inline private def smix(x: Long): Long = {
    var z = x
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  @inline private def rng(seed: Long, stream: Long, flat: Long): Long =
    smix(seed * 0x2545F4914F6CDD1DL + stream * 0x9E3779B97F4A7C15L +
      flat * 0xD1342543DE82EF95L + 0x632BE59BD9B4E019L)

  /** Uniform in [0,1): top 53 bits of the hash. */
  @inline private def u01(h: Long): Double = (h >>> 11) * (1.0 / (1L << 53))

  /** Core: build an array where each element applies `f` to its private
    * draw function (draw t ∈ 0,1,2,… are independent uniforms in [0,1)).
    */
  private def elementwise(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
                          seed: Long, stream0: Long)(f: (Int => Double) => Double): GArr = {
    val strides = cStrides(shape)
    GArr.fromFunction(s, shape, chunkSizes) { g =>
      var flat = 0L
      var d = 0
      while (d < g.length) { flat += g(d) * strides(d); d += 1 }
      val fl = flat
      f(t => u01(rng(seed, stream0 + t, fl)))
    }
  }

  /** `random_sample` / `uniform(low, high)` (random.py `uniform`). */
  def uniform(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
              seed: Long, low: Double = 0.0, high: Double = 1.0): GArr =
    elementwise(s, shape, chunkSizes, seed, 0L)(d => low + d(0) * (high - low))

  def randomSample(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
                   seed: Long): GArr = uniform(s, shape, chunkSizes, seed)

  /** `standard_normal` / `normal(loc, scale)` via Box-Muller on two
    * substream uniforms (u1 shifted into (0,1] so log never sees 0).
    */
  def normal(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
             seed: Long, loc: Double = 0.0, scale: Double = 1.0): GArr =
    elementwise(s, shape, chunkSizes, seed, 0L) { d =>
      val u1 = 1.0 - d(0)
      val u2 = d(1)
      loc + scale * math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
    }

  def standardNormal(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
                     seed: Long): GArr = normal(s, shape, chunkSizes, seed)

  /** `randint(low, high)`: integer-valued doubles in [low, high). */
  def randint(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
              seed: Long, low: Long, high: Long): GArr = {
    require(high > low, s"randint: empty range [$low,$high)")
    val span = (high - low).toDouble
    elementwise(s, shape, chunkSizes, seed, 0L)(d => low + math.floor(d(0) * span))
  }

  /** `exponential(scale)` by inversion. */
  def exponential(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
                  seed: Long, scale: Double = 1.0): GArr =
    elementwise(s, shape, chunkSizes, seed, 0L)(d => -scale * math.log(1.0 - d(0)))

  /** `poisson(lam)` via Knuth inversion — O(lam) substream draws per
    * element, exact for the moderate λ this surface targets.
    */
  def poisson(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
              seed: Long, lam: Double): GArr = {
    require(lam >= 0.0 && lam < 500.0, s"poisson: lam=$lam out of supported range")
    elementwise(s, shape, chunkSizes, seed, 0L) { d =>
      val limit = math.exp(-lam)
      var k = 0
      var p = 1.0
      while ({ p *= d(k); k += 1; p > limit }) ()
      (k - 1).toDouble
    }
  }

  /** `binomial(n, p)` as a sum of n Bernoulli substream draws. */
  def binomial(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
               seed: Long, n: Int, p: Double): GArr = {
    require(n >= 0 && p >= 0.0 && p <= 1.0)
    elementwise(s, shape, chunkSizes, seed, 0L) { d =>
      var k = 0
      var t = 0
      while (t < n) { if (d(t) < p) k += 1; t += 1 }
      k.toDouble
    }
  }

  /** `choice(values)` with replacement: uniform index into a driver-held
    * value list (matches dask's choice, whose `a` is materialized).
    */
  def choice(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
             seed: Long, values: Seq[Double]): GArr = {
    require(values.nonEmpty)
    val v = values.toArray
    elementwise(s, shape, chunkSizes, seed, 0L)(d => v(math.floor(d(0) * v.length).toInt))
  }

  // ---------------------------------------------------------------------
  // Distribution long tail (reference `dask/array/random.py:1-1113`, which
  // forwards each name to a per-chunk RandomState method). Every sampler
  // below is an inverse-CDF or bounded-rejection composition over the same
  // counter-based substream core, so ALL of them inherit the
  // rechunk-invariance and zero-shuffle generation of `elementwise`.
  // ---------------------------------------------------------------------

  /** Wrap an element's substream as a sequential draw source for samplers
    * that consume a variable number of uniforms (rejection loops).
    */
  @inline private def drawCounter(d: Int => Double): () => Double = {
    var t = -1
    () => { t += 1; d(t) }
  }

  /** One standard-normal draw via Box-Muller on two sequential uniforms. */
  @inline private def normalDraw(next: () => Double): Double = {
    val u1 = 1.0 - next()
    val u2 = next()
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  /** One gamma(shape, scale) draw — Marsaglia-Tsang squeeze (ACM TOMS 2000),
    * the same sampler family numpy uses: ~1.05 expected iterations, each
    * consuming 3 substream uniforms. shape<1 is boosted through
    * gamma(shape+1) * U^(1/shape).
    */
  private def gammaDraw(next: () => Double, shape: Double, scale: Double): Double = {
    require(shape > 0.0 && scale > 0.0, s"gamma: bad shape=$shape scale=$scale")
    if (shape < 1.0) {
      val u = next()
      gammaDraw(next, shape + 1.0, scale) * math.pow(u, 1.0 / shape)
    } else {
      val dd = shape - 1.0 / 3.0
      val c = 1.0 / math.sqrt(9.0 * dd)
      var res = -1.0
      while (res < 0.0) {
        var x = 0.0
        var v = 0.0
        do {
          x = normalDraw(next)
          v = 1.0 + c * x
        } while (v <= 0.0)
        v = v * v * v
        val u = 1.0 - next() // (0,1]: log never sees 0
        if (math.log(u) < 0.5 * x * x + dd - dd * v + dd * math.log(v)) res = dd * v * scale
      }
      res
    }
  }

  /** `gumbel(loc, scale)` by inversion: loc − scale·ln(−ln U), U ∈ (0,1]. */
  def gumbel(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
             seed: Long, loc: Double = 0.0, scale: Double = 1.0): GArr =
    elementwise(s, shape, chunkSizes, seed, 0L)(d =>
      loc - scale * math.log(-math.log(1.0 - d(0))))

  /** `laplace(loc, scale)` by two-sided inversion. */
  def laplace(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
              seed: Long, loc: Double = 0.0, scale: Double = 1.0): GArr =
    elementwise(s, shape, chunkSizes, seed, 0L) { d =>
      val u = d(0)
      if (u < 0.5) loc + scale * math.log(2.0 * u + java.lang.Double.MIN_VALUE)
      else loc - scale * math.log(2.0 * (1.0 - u))
    }

  /** `logistic(loc, scale)` by inversion: loc + scale·ln(u/(1−u)). */
  def logistic(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
               seed: Long, loc: Double = 0.0, scale: Double = 1.0): GArr =
    elementwise(s, shape, chunkSizes, seed, 0L) { d =>
      val u = d(0) + java.lang.Double.MIN_VALUE
      loc + scale * math.log(u / (1.0 - u))
    }

  /** `weibull(a)` by inversion: (−ln(1−u))^(1/a). */
  def weibull(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
              seed: Long, a: Double): GArr = {
    require(a > 0.0)
    elementwise(s, shape, chunkSizes, seed, 0L)(d =>
      math.pow(-math.log(1.0 - d(0)), 1.0 / a))
  }

  /** `pareto(a)` (Lomax, like numpy): (1−u)^(−1/a) − 1. */
  def pareto(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
             seed: Long, a: Double): GArr = {
    require(a > 0.0)
    elementwise(s, shape, chunkSizes, seed, 0L)(d =>
      math.pow(1.0 - d(0), -1.0 / a) - 1.0)
  }

  /** `rayleigh(scale)` by inversion: scale·sqrt(−2 ln(1−u)). */
  def rayleigh(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
               seed: Long, scale: Double = 1.0): GArr =
    elementwise(s, shape, chunkSizes, seed, 0L)(d =>
      scale * math.sqrt(-2.0 * math.log(1.0 - d(0))))

  /** `standard_cauchy()` by inversion: tan(π(u−1/2)). */
  def standardCauchy(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
                     seed: Long): GArr =
    elementwise(s, shape, chunkSizes, seed, 0L)(d =>
      math.tan(math.Pi * (d(0) - 0.5)))

  /** `power(a)` by inversion: u^(1/a). */
  def power(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
            seed: Long, a: Double): GArr = {
    require(a > 0.0)
    elementwise(s, shape, chunkSizes, seed, 0L)(d => math.pow(d(0), 1.0 / a))
  }

  /** `lognormal(mean, sigma)`: exp of a Box-Muller normal. */
  def lognormal(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
                seed: Long, mean: Double = 0.0, sigma: Double = 1.0): GArr =
    elementwise(s, shape, chunkSizes, seed, 0L) { d =>
      math.exp(mean + sigma * normalDraw(drawCounter(d)))
    }

  /** `triangular(left, mode, right)` by inversion. */
  def triangular(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
                 seed: Long, left: Double, mode: Double, right: Double): GArr = {
    require(left <= mode && mode <= right && left < right)
    val fc = (mode - left) / (right - left)
    elementwise(s, shape, chunkSizes, seed, 0L) { d =>
      val u = d(0)
      if (u < fc) left + math.sqrt(u * (right - left) * (mode - left))
      else right - math.sqrt((1.0 - u) * (right - left) * (right - mode))
    }
  }

  /** `geometric(p)`: trials to first success, support {1,2,…}, by
    * inversion: ⌈ln(1−u)/ln(1−p)⌉ clamped to ≥1.
    */
  def geometric(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
                seed: Long, p: Double): GArr = {
    require(p > 0.0 && p <= 1.0)
    if (p == 1.0) elementwise(s, shape, chunkSizes, seed, 0L)(_ => 1.0)
    else {
      val lq = math.log(1.0 - p)
      elementwise(s, shape, chunkSizes, seed, 0L)(d =>
        math.max(1.0, math.ceil(math.log(1.0 - d(0)) / lq)))
    }
  }

  /** `gamma(shape, scale)` — Marsaglia-Tsang rejection on substreams. */
  def gamma(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
            seed: Long, gshape: Double, gscale: Double = 1.0): GArr =
    elementwise(s, shape, chunkSizes, seed, 0L)(d =>
      gammaDraw(drawCounter(d), gshape, gscale))

  def standardGamma(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
                    seed: Long, gshape: Double): GArr =
    gamma(s, shape, chunkSizes, seed, gshape, 1.0)

  /** `beta(a, b)` = Γa/(Γa+Γb) from two sequential gamma draws. */
  def beta(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
           seed: Long, a: Double, b: Double): GArr =
    elementwise(s, shape, chunkSizes, seed, 0L) { d =>
      val next = drawCounter(d)
      val g1 = gammaDraw(next, a, 1.0)
      val g2 = gammaDraw(next, b, 1.0)
      g1 / (g1 + g2)
    }

  /** `chisquare(df)` = gamma(df/2, 2). */
  def chisquare(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
                seed: Long, df: Double): GArr = {
    require(df > 0.0)
    gamma(s, shape, chunkSizes, seed, df / 2.0, 2.0)
  }

  /** `standard_t(df)` = N / sqrt(χ²(df)/df) on one substream. */
  def standardT(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
                seed: Long, df: Double): GArr = {
    require(df > 0.0)
    elementwise(s, shape, chunkSizes, seed, 0L) { d =>
      val next = drawCounter(d)
      val z = normalDraw(next)
      val chi = gammaDraw(next, df / 2.0, 2.0)
      z / math.sqrt(chi / df)
    }
  }

  /** `f(dfnum, dfden)` = (χ²₁/d1)/(χ²₂/d2) on one substream. */
  def fDist(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
            seed: Long, dfnum: Double, dfden: Double): GArr = {
    require(dfnum > 0.0 && dfden > 0.0)
    elementwise(s, shape, chunkSizes, seed, 0L) { d =>
      val next = drawCounter(d)
      val c1 = gammaDraw(next, dfnum / 2.0, 2.0)
      val c2 = gammaDraw(next, dfden / 2.0, 2.0)
      (c1 / dfnum) / (c2 / dfden)
    }
  }

  /** `negative_binomial(n, p)` via the gamma-Poisson mixture:
    * Poisson(Γ(n, (1−p)/p)). Knuth inversion bounds the mixture mean so
    * the substream consumption stays O(mean).
    */
  def negativeBinomial(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
                       seed: Long, n: Double, p: Double): GArr = {
    require(n > 0.0 && p > 0.0 && p <= 1.0)
    require(n * (1.0 - p) / p < 400.0,
      s"negative_binomial: mean ${n * (1.0 - p) / p} too large for Knuth inversion")
    elementwise(s, shape, chunkSizes, seed, 0L) { d =>
      val next = drawCounter(d)
      val lam = gammaDraw(next, n, (1.0 - p) / p)
      val limit = math.exp(-lam)
      var k = 0
      var pr = 1.0
      while ({ pr *= next(); k += 1; pr > limit }) ()
      (k - 1).toDouble
    }
  }

  /** `wald(mean, scale)` (inverse Gaussian) — Michael-Schucany-Haas
    * transform: one normal + one uniform, no rejection.
    */
  def wald(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
           seed: Long, mean: Double, scale: Double): GArr = {
    require(mean > 0.0 && scale > 0.0)
    elementwise(s, shape, chunkSizes, seed, 0L) { d =>
      val next = drawCounter(d)
      val z = normalDraw(next)
      val v = z * z
      val x = mean + mean * mean * v / (2.0 * scale) -
        mean / (2.0 * scale) * math.sqrt(4.0 * mean * scale * v + mean * mean * v * v)
      val u = next()
      if (u <= mean / (mean + x)) x else mean * mean / x
    }
  }

  /** `zipf(a)` — Devroye's rejection-inversion (the numpy sampler shape):
    * support {1,2,…}, P(k) ∝ k^(−a), a > 1.
    */
  def zipf(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
           seed: Long, a: Double): GArr = {
    require(a > 1.0, s"zipf: a=$a must be > 1")
    val am1 = a - 1.0
    val b = math.pow(2.0, am1)
    elementwise(s, shape, chunkSizes, seed, 0L) { d =>
      val next = drawCounter(d)
      var res = 0.0
      while (res == 0.0) {
        val u = 1.0 - next()
        val v = next()
        val x = math.floor(math.pow(u, -1.0 / am1))
        if (x >= 1.0 && x < 9.0e18) {
          val t = math.pow(1.0 + 1.0 / x, am1)
          if (v * x * (t - 1.0) / (b - 1.0) <= t / b) res = x
        }
      }
      res
    }
  }

  /** `vonmises(mu, kappa)` — Best-Fisher (1979) wrapped rejection, the
    * numpy sampler; κ→0 degenerates to uniform on (−π, π].
    */
  def vonmises(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
               seed: Long, mu: Double, kappa: Double): GArr = {
    require(kappa >= 0.0)
    if (kappa < 1e-8)
      elementwise(s, shape, chunkSizes, seed, 0L)(d => math.Pi * (2.0 * d(0) - 1.0) + mu)
    else {
      val tau = 1.0 + math.sqrt(1.0 + 4.0 * kappa * kappa)
      val rho = (tau - math.sqrt(2.0 * tau)) / (2.0 * kappa)
      val r = (1.0 + rho * rho) / (2.0 * rho)
      elementwise(s, shape, chunkSizes, seed, 0L) { d =>
        val next = drawCounter(d)
        var f = 0.0
        var accepted = false
        while (!accepted) {
          val u1 = next()
          val z = math.cos(math.Pi * u1)
          f = (1.0 + r * z) / (r + z)
          val c = kappa * (r - f)
          val u2 = next() + java.lang.Double.MIN_VALUE
          if (c * (2.0 - c) - u2 > 0.0 || math.log(c / u2) + 1.0 - c >= 0.0) accepted = true
        }
        val u3 = next()
        val theta = mu + math.signum(u3 - 0.5) * math.acos(f)
        // wrap into (−π, π]
        val w = math.IEEEremainder(theta, 2.0 * math.Pi)
        if (w <= -math.Pi) w + 2.0 * math.Pi else w
      }
    }
  }

  /** `multinomial(n, pvals)` — output shape is `shape :+ pvals.length`
    * (numpy appends the category axis). Every category cell of one draw
    * replays the SAME n substream picks (the flat counter covers only the
    * leading dims), so the counts are consistent per draw and still
    * rechunk-invariant; O(n·k) work per draw.
    */
  def multinomial(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
                  seed: Long, n: Int, pvals: Seq[Double]): GArr = {
    require(n >= 0 && pvals.nonEmpty && pvals.forall(_ >= 0.0))
    require(math.abs(pvals.sum - 1.0) < 1e-9, s"multinomial: pvals sum ${pvals.sum} != 1")
    val k = pvals.length
    val cum = pvals.scanLeft(0.0)(_ + _).tail.toArray
    val leadStrides = cStrides(shape)
    val nd0 = shape.length
    GArr.fromFunction(s, shape :+ k.toLong, chunkSizes :+ k) { g =>
      var flat = 0L
      var d = 0
      while (d < nd0) { flat += g(d) * leadStrides(d); d += 1 }
      val j = g(nd0).toInt
      val fl = flat
      var hits = 0
      var t = 0
      while (t < n) {
        val u = u01(rng(seed, t.toLong, fl))
        // linear scan of the cumulative table (k is small)
        var bucket = 0
        while (bucket < k - 1 && u >= cum(bucket)) bucket += 1
        if (bucket == j) hits += 1
        t += 1
      }
      hits.toDouble
    }
  }

  /** `hypergeometric(ngood, nbad, nsample)` by exact sequential sampling
    * without replacement — O(nsample) substream draws per element.
    */
  def hypergeometric(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
                     seed: Long, ngood: Int, nbad: Int, nsample: Int): GArr = {
    require(ngood >= 0 && nbad >= 0 && nsample >= 0 && nsample <= ngood + nbad)
    elementwise(s, shape, chunkSizes, seed, 0L) { d =>
      var good = ngood
      var bad = nbad
      var hits = 0
      var t = 0
      while (t < nsample) {
        if (d(t) * (good + bad) < good) { hits += 1; good -= 1 } else bad -= 1
        t += 1
      }
      hits.toDouble
    }
  }

  /** `logseries(p)` — Kemp's inversion-with-shortcut (the numpy
    * `rk_logseries` algorithm, `numpy/random/src/distributions.c`):
    * support {1,2,…}, P(k) = −pᵏ/(k·ln(1−p)).  Each rejection round
    * consumes two substream uniforms.
    */
  def logseries(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
                seed: Long, p: Double): GArr = {
    require(p > 0.0 && p < 1.0, s"logseries: p=$p outside (0,1)")
    val r = math.log1p(-p)
    elementwise(s, shape, chunkSizes, seed, 0L) { d =>
      val next = drawCounter(d)
      var out = -1.0
      while (out < 0) {
        val v = next()
        if (v >= p) out = 1.0
        else {
          val u = next()
          val q = -math.expm1(r * u)
          if (v <= q * q) {
            val k = math.floor(1.0 + math.log(v) / math.log(q))
            if (k >= 1 && v != 0.0) out = k
          } else if (v >= q) out = 1.0
          else out = 2.0
        }
      }
      out
    }
  }

  /** `noncentral_chisquare(df, nonc)` — numpy's decomposition
    * (`distributions.c rk_noncentral_chisquare`): for df > 1,
    * χ²(df−1) + (Z + √nonc)²; for df ≤ 1, the Poisson mixture
    * χ²(df + 2·Poisson(nonc/2)).  Pure substream composition of the
    * existing gamma / normal / Poisson draws.
    */
  def noncentralChisquare(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
                          seed: Long, df: Double, nonc: Double): GArr = {
    require(df > 0.0 && nonc >= 0.0)
    if (nonc == 0.0) chisquare(s, shape, chunkSizes, seed, df)
    else if (df > 1.0) {
      val sn = math.sqrt(nonc)
      elementwise(s, shape, chunkSizes, seed, 0L) { d =>
        val next = drawCounter(d)
        val chi = gammaDraw(next, (df - 1.0) / 2.0, 2.0)
        val z = normalDraw(next)
        chi + (z + sn) * (z + sn)
      }
    } else {
      val lam = nonc / 2.0
      require(lam < 500.0, s"noncentral_chisquare: nonc=$nonc out of supported range")
      val limit = math.exp(-lam)
      elementwise(s, shape, chunkSizes, seed, 0L) { d =>
        val next = drawCounter(d)
        var k = 0
        var pr = 1.0
        while ({ pr *= next(); pr > limit }) k += 1
        gammaDraw(next, (df + 2.0 * k) / 2.0, 2.0)
      }
    }
  }

  /** `noncentral_f(dfnum, dfden, nonc)` =
    * (ncχ²(dfnum, nonc)/dfnum) / (χ²(dfden)/dfden) on one substream.
    */
  def noncentralF(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
                  seed: Long, dfnum: Double, dfden: Double, nonc: Double): GArr = {
    require(dfnum > 0.0 && dfden > 0.0 && nonc >= 0.0)
    // the dfnum <= 1 branch is a Knuth Poisson(nonc/2) mixture whose
    // exp(-lam) termination constant underflows to 0 for lam >~ 745,
    // silently truncating the count — same guard as noncentralChisquare
    require(dfnum > 1.0 || nonc / 2.0 < 500.0,
      s"noncentral_f: nonc=$nonc out of supported range for dfnum<=1")
    val sn = math.sqrt(nonc)
    elementwise(s, shape, chunkSizes, seed, 0L) { d =>
      val next = drawCounter(d)
      val num =
        if (dfnum > 1.0) {
          val chi = gammaDraw(next, (dfnum - 1.0) / 2.0, 2.0)
          val z = normalDraw(next)
          chi + (z + sn) * (z + sn)
        } else {
          val lam = nonc / 2.0
          val limit = math.exp(-lam)
          var k = 0
          var pr = 1.0
          while ({ pr *= next(); pr > limit }) k += 1
          gammaDraw(next, (dfnum + 2.0 * k) / 2.0, 2.0)
        }
      val den = gammaDraw(next, dfden / 2.0, 2.0)
      (num / dfnum) / (den / dfden)
    }
  }

  /** `permutation(n)` (reference `random.py` RandomState/Generator
    * member): a seeded random permutation of 0…n−1, as dask returns for
    * an integer argument.  Spark-first lowering: key every index with a
    * seeded 64-bit hash and pack the indices in key order — ONE
    * distributed sort (the [[GArr.fromColumn]] range-partitioned path),
    * no driver-side array, layout-independent by construction (the key
    * is a pure function of (seed, index)).
    */
  def permutation(s: SparkSession, n: Long, chunk: Int, seed: Long): GArr = {
    import org.apache.spark.sql.functions.{col, lit, xxhash64}
    val df = s.range(n).select(
      col("id").cast("double").as("v"),
      xxhash64(col("id"), lit(seed)).as("k"))
    GArr.fromColumn(df, "v", Seq("k", "v"), chunk)
  }

  /** `multivariate_hypergeometric(colors, nsample)` — the marginal chain:
    * color i's count is hypergeometric in (colors(i), remaining-after-i,
    * remaining sample), conditioned on the counts already drawn — the
    * same sequential-conditional pattern as [[multinomial]].  Output
    * shape = shape :+ colors.length (the count vector rides the last
    * axis, one substream per element like every other draw).
    */
  def multivariateHypergeometric(s: SparkSession, shape: Seq[Long], chunkSizes: Seq[Int],
                                 seed: Long, colors: Seq[Int], nsample: Int): GArr = {
    require(colors.nonEmpty && colors.forall(_ >= 0) && nsample >= 0 &&
      nsample <= colors.sum)
    val k = colors.length
    val strides = cStrides(shape)
    val outShape = shape :+ k.toLong
    val outChunks = chunkSizes :+ k
    GArr.fromFunction(s, outShape, outChunks) { g =>
      var flat = 0L
      var dd = 0
      while (dd < shape.length) { flat += g(dd) * strides(dd); dd += 1 }
      val fl = flat
      val d: Int => Double = t => u01(rng(seed, t.toLong, fl))
      // regenerate the whole vector's chain and read off component g(last):
      // pure-function-of-index contract (rechunk-invariant), same as the
      // multinomial lowering
      val want = g(shape.length).toInt
      var remainingPop = colors.sum
      var remainingSample = nsample
      var t = 0
      var i = 0
      var res = 0.0
      while (i <= want) {
        var good = colors(i)
        var bad = remainingPop - colors(i)
        var hits = 0
        var j = 0
        val draws = remainingSample
        while (j < draws) {
          if (d(t) * (good + bad) < good) { hits += 1; good -= 1 } else bad -= 1
          t += 1; j += 1
        }
        if (i == want) res = hits.toDouble
        remainingPop -= colors(i)
        remainingSample -= hits
        i += 1
      }
      res
    }
  }
}
