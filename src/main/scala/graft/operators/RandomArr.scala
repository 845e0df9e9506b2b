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
}
