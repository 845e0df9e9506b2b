package graft.sources

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic random-distribution suite (reference:
  * `dask/array/random.py:1-1113` — the full numpy distribution surface over
  * seeded per-chunk generators).
  *
  * Design: every value is a pure function of (row id, seed) via the
  * portable splitmix64 uniform (same construction as [[Timeseries]], proven
  * bit-replicable in DuckDB HUGEINT macros by q69) — unlike Spark's
  * `rand()`/`randn()`, whose streams depend on the partition layout, these
  * columns are identical on any cluster shape, which is what a training
  * pipeline needs for reproducible corpus sampling.  Distributions are
  * derived by standard transforms (Box-Muller, inverse-CDF) in plain
  * column arithmetic, so everything except the hash itself is codegen'd.
  */
object RandomData {

  /** uniform(0,1): top 53 bits of splitmix64(id ^ mix64(seed)) as an exact
    * dyadic rational — bit-replicable externally.
    */
  private val uUdf = udf((id: Long, seed: Long) =>
    (Hashing.mix64(id ^ Hashing.mix64(seed)) >>> 11).toDouble / (1L << 53).toDouble)

  /** Knuth/inverse-CDF poisson from ONE uniform: k = #{i : cdf(i) <= u}.
    * The pmf recurrence p_{k+1} = p_k * λ/(k+1) is accumulated
    * left-to-right so an external oracle can reproduce the exact float
    * sequence.
    */
  private val poissonUdf = udf((u: Double, lambda: Double) => {
    var k = 0
    var p = math.exp(-lambda)
    var cdf = p
    while (u >= cdf && k < 200) { k += 1; p *= lambda / k; cdf += p }
    k
  })

  def uniform(id: Column, seed: Long): Column = uUdf(id, lit(seed))

  def uniformRange(id: Column, seed: Long, lo: Double, hi: Double): Column =
    uniform(id, seed) * (hi - lo) + lo

  /** standard normal via Box-Muller over two independent uniforms; the
    * 1e-300 guard keeps log finite at u=0 (prob 2⁻⁵³) without changing any
    * other value.
    */
  def normal(id: Column, seed: Long, mu: Double = 0.0, sigma: Double = 1.0): Column =
    sqrt(lit(-2.0) * log(uniform(id, seed) + lit(1e-300))) *
      cos(lit(2.0 * math.Pi) * uniform(id, seed + 1000000)) * sigma + mu

  def lognormal(id: Column, seed: Long, mu: Double = 0.0, sigma: Double = 1.0): Column =
    exp(normal(id, seed, mu, sigma))

  /** exponential(rate λ) via inverse CDF: -ln(u)/λ. */
  def exponential(id: Column, seed: Long, lambda: Double = 1.0): Column =
    -log(uniform(id, seed) + lit(1e-300)) / lambda

  /** integer uniform in [lo, hi) — exact (dyadic u × small int). */
  def randint(id: Column, seed: Long, lo: Long, hi: Long): Column =
    (floor(uniform(id, seed) * (hi - lo)) + lo).cast("long")

  /** choice over a fixed option list, uniform. */
  def choice(id: Column, seed: Long, options: Seq[String]): Column =
    element_at(array(options.map(lit): _*),
      (floor(uniform(id, seed) * options.size) + 1).cast("int"))

  def bernoulli(id: Column, seed: Long, p: Double): Column =
    (uniform(id, seed) < p).cast("int")

  def poisson(id: Column, seed: Long, lambda: Double): Column = {
    // the inverse-CDF walk degenerates for large λ: exp(-λ) underflows to
    // 0 near λ≈745 (cdf never moves) and the k<200 cap truncates the bulk
    // of the mass well before that — every row would silently return the
    // cap.  Fail fast; large-λ callers should use a rounded normal.
    require(lambda > 0 && lambda <= 100,
      s"poisson inverse-CDF sampling supports lambda in (0, 100], got $lambda " +
        "(approximate large lambda with round(normal(mu=lambda, sigma=sqrt(lambda))))")
    poissonUdf(uniform(id, seed), lit(lambda))
  }

  /** Demo frame with one column per distribution — the `datasets.timeseries`
    * analog for the random suite.  Floats are NOT rounded here; round at
    * the query edge.
    */
  def frame(spark: SparkSession, rows: Long, seed: Long = 7L,
            numPartitions: Int = 0): DataFrame = {
    val base =
      if (numPartitions > 0) spark.range(0, rows, 1, numPartitions) else spark.range(rows)
    val rid = col("id")
    base.select(
      rid,
      uniform(rid, seed).as("u"),
      normal(rid, seed + 1).as("gauss"),
      exponential(rid, seed + 2, lambda = 2.0).as("expo"),
      lognormal(rid, seed + 3, sigma = 0.5).as("logn"),
      randint(rid, seed + 4, 10, 100).as("ri"),
      choice(rid, seed + 5, Seq("red", "green", "blue")).as("pick"),
      bernoulli(rid, seed + 6, 0.25).as("bern"),
      poisson(rid, seed + 7, 4.0).as("pois"))
  }
}
