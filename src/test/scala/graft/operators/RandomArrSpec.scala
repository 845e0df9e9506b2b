package graft.operators

import graft.SparkTestBase

/** Seeded random chunked arrays (SURVEY §2.11 random suite; reference
  * `dask/array/random.py`): the counter-based design must be deterministic
  * across CHUNKINGS (stronger than dask's same-chunking determinism) and
  * each distribution must land near its analytic moments.
  */
class RandomArrSpec extends SparkTestBase {

  private def vec(a: GArr): Array[Double] = {
    val m = a.toIndexedDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    Array.tabulate(a.numElements.toInt)(i => m(i.toLong))
  }

  test("uniform: identical values under different chunk grids and rechunk") {
    val a = GArrRandom.uniform(spark, Seq(200L), Seq(7), seed = 42L)
    val b = GArrRandom.uniform(spark, Seq(200L), Seq(13), seed = 42L)
    assert(vec(a).toSeq == vec(b).toSeq)
    assert(vec(a.rechunk(Seq(31))).toSeq == vec(a).toSeq)
    val c = GArrRandom.uniform(spark, Seq(200L), Seq(7), seed = 43L)
    assert(vec(a).toSeq != vec(c).toSeq)
  }

  test("uniform(low,high): bounds and mean") {
    val v = vec(GArrRandom.uniform(spark, Seq(4000L), Seq(512), 7L, low = 2.0, high = 6.0))
    assert(v.forall(x => x >= 2.0 && x < 6.0))
    assert(math.abs(v.sum / v.length - 4.0) < 0.1)
  }

  test("normal: moments of a 2-D draw") {
    val v = vec(GArrRandom.normal(spark, Seq(100L, 80L), Seq(32, 32), 11L, loc = 3.0, scale = 2.0))
    val n = v.length
    val mean = v.sum / n
    val varr = v.map(x => (x - mean) * (x - mean)).sum / n
    assert(math.abs(mean - 3.0) < 0.1, s"mean $mean")
    assert(math.abs(varr - 4.0) < 0.2, s"var $varr")
  }

  test("randint: integral values covering the range") {
    val v = vec(GArrRandom.randint(spark, Seq(3000L), Seq(512), 5L, 10L, 15L))
    assert(v.forall(x => x == math.floor(x) && x >= 10.0 && x < 15.0))
    assert(v.distinct.sorted.toSeq == Seq(10.0, 11.0, 12.0, 13.0, 14.0))
  }

  test("poisson / exponential / binomial: analytic means") {
    val p = vec(GArrRandom.poisson(spark, Seq(4000L), Seq(512), 3L, lam = 4.0))
    assert(p.forall(x => x == math.floor(x) && x >= 0.0))
    assert(math.abs(p.sum / p.length - 4.0) < 0.15)
    val e = vec(GArrRandom.exponential(spark, Seq(4000L), Seq(512), 9L, scale = 2.0))
    assert(e.forall(_ >= 0.0))
    assert(math.abs(e.sum / e.length - 2.0) < 0.15)
    val b = vec(GArrRandom.binomial(spark, Seq(4000L), Seq(512), 13L, n = 10, p = 0.3))
    assert(b.forall(x => x == math.floor(x) && x >= 0.0 && x <= 10.0))
    assert(math.abs(b.sum / b.length - 3.0) < 0.15)
  }

  test("choice: values drawn from the list, roughly uniformly") {
    val v = vec(GArrRandom.choice(spark, Seq(3000L), Seq(512), 17L, Seq(2.5, -1.0, 7.0)))
    assert(v.toSet == Set(2.5, -1.0, 7.0))
    val counts = v.groupBy(identity).map(_._2.length)
    assert(counts.forall(c => c > 800 && c < 1200))
  }

  private def meanVar(v: Array[Double]): (Double, Double) = {
    val m = v.sum / v.length
    (m, v.map(x => (x - m) * (x - m)).sum / v.length)
  }

  test("inversion long tail: supports and analytic means") {
    val n = 4000L
    val c = Seq(512)
    val gum = vec(GArrRandom.gumbel(spark, Seq(n), c, 21L))
    assert(math.abs(gum.sum / gum.length - 0.5772) < 0.08, "gumbel mean≈γ")
    val lap = vec(GArrRandom.laplace(spark, Seq(n), c, 22L))
    val (lm, lv) = meanVar(lap)
    assert(math.abs(lm) < 0.08 && math.abs(lv - 2.0) < 0.3, s"laplace $lm $lv")
    val lgt = vec(GArrRandom.logistic(spark, Seq(n), c, 23L))
    val (gm, gv) = meanVar(lgt)
    assert(math.abs(gm) < 0.1 && math.abs(gv - math.Pi * math.Pi / 3.0) < 0.5, s"logistic $gm $gv")
    val wei = vec(GArrRandom.weibull(spark, Seq(n), c, 24L, a = 2.0))
    assert(wei.forall(_ >= 0.0))
    assert(math.abs(wei.sum / wei.length - 0.8862) < 0.05, "weibull(2) mean=Γ(1.5)")
    val ray = vec(GArrRandom.rayleigh(spark, Seq(n), c, 25L))
    assert(ray.forall(_ >= 0.0))
    assert(math.abs(ray.sum / ray.length - 1.2533) < 0.05, "rayleigh mean=√(π/2)")
    val par = vec(GArrRandom.pareto(spark, Seq(n), c, 26L, a = 3.0))
    assert(par.forall(_ >= 0.0))
    assert(math.abs(par.sum / par.length - 0.5) < 0.08, "pareto(3) mean=1/2")
    val tri = vec(GArrRandom.triangular(spark, Seq(n), c, 27L, 0.0, 1.0, 2.0))
    assert(tri.forall(x => x >= 0.0 && x <= 2.0))
    assert(math.abs(tri.sum / tri.length - 1.0) < 0.05, "triangular mean")
    val geo = vec(GArrRandom.geometric(spark, Seq(n), c, 28L, p = 0.25))
    assert(geo.forall(x => x == math.floor(x) && x >= 1.0))
    assert(math.abs(geo.sum / geo.length - 4.0) < 0.25, "geometric(0.25) mean=4")
    val pow = vec(GArrRandom.power(spark, Seq(n), c, 29L, a = 3.0))
    assert(pow.forall(x => x >= 0.0 && x <= 1.0))
    assert(math.abs(pow.sum / pow.length - 0.75) < 0.03, "power(3) mean=3/4")
    val lgn = vec(GArrRandom.lognormal(spark, Seq(n), c, 30L, 0.0, 0.5))
    assert(lgn.forall(_ > 0.0))
    assert(math.abs(lgn.sum / lgn.length - math.exp(0.125)) < 0.06, "lognormal mean")
    val cau = vec(GArrRandom.standardCauchy(spark, Seq(n), c, 31L))
    // Cauchy has no mean; check the median instead (≈0) and heavy tails
    val sorted = cau.sorted
    assert(math.abs(sorted(cau.length / 2)) < 0.1, "cauchy median≈0")
    assert(cau.exists(_.abs > 20.0), "cauchy heavy tails")
  }

  test("gamma family: gamma/beta/chisquare/standard_t/f moments") {
    val n = 4000L
    val c = Seq(512)
    val gam = vec(GArrRandom.gamma(spark, Seq(n), c, 41L, gshape = 3.0, gscale = 2.0))
    val (gm, gv) = meanVar(gam)
    assert(gam.forall(_ > 0.0))
    assert(math.abs(gm - 6.0) < 0.3 && math.abs(gv - 12.0) < 2.0, s"gamma $gm $gv")
    // shape < 1 exercises the boost path
    val gs = vec(GArrRandom.standardGamma(spark, Seq(n), c, 42L, gshape = 0.5))
    assert(gs.forall(_ >= 0.0))
    assert(math.abs(gs.sum / gs.length - 0.5) < 0.08, "gamma(0.5) mean")
    val bet = vec(GArrRandom.beta(spark, Seq(n), c, 43L, a = 2.0, b = 5.0))
    assert(bet.forall(x => x > 0.0 && x < 1.0))
    assert(math.abs(bet.sum / bet.length - 2.0 / 7.0) < 0.02, "beta(2,5) mean")
    val chi = vec(GArrRandom.chisquare(spark, Seq(n), c, 44L, df = 4.0))
    assert(chi.forall(_ > 0.0))
    assert(math.abs(chi.sum / chi.length - 4.0) < 0.25, "chisquare(4) mean")
    val t8 = vec(GArrRandom.standardT(spark, Seq(n), c, 45L, df = 8.0))
    val (tm, tv) = meanVar(t8)
    assert(math.abs(tm) < 0.08 && math.abs(tv - 8.0 / 6.0) < 0.3, s"t(8) $tm $tv")
    val f812 = vec(GArrRandom.fDist(spark, Seq(n), c, 46L, dfnum = 8.0, dfden = 12.0))
    assert(f812.forall(_ > 0.0))
    assert(math.abs(f812.sum / f812.length - 1.2) < 0.15, "F(8,12) mean=12/10")
  }

  test("negative_binomial / hypergeometric: integral support and means") {
    val n = 4000L
    val c = Seq(512)
    val nb = vec(GArrRandom.negativeBinomial(spark, Seq(n), c, 51L, n = 5.0, p = 0.5))
    assert(nb.forall(x => x == math.floor(x) && x >= 0.0))
    assert(math.abs(nb.sum / nb.length - 5.0) < 0.3, "negbinom(5,0.5) mean=5")
    val hyp = vec(GArrRandom.hypergeometric(spark, Seq(n), c, 52L, 20, 30, 10))
    assert(hyp.forall(x => x == math.floor(x) && x >= 0.0 && x <= 10.0))
    assert(math.abs(hyp.sum / hyp.length - 4.0) < 0.15, "hypergeom mean=n·K/N")
  }

  test("wald / zipf / vonmises: supports and analytic moments") {
    val n = 4000L
    val c = Seq(512)
    val w = vec(GArrRandom.wald(spark, Seq(n), c, 71L, mean = 2.0, scale = 6.0))
    assert(w.forall(_ > 0.0))
    assert(math.abs(w.sum / w.length - 2.0) < 0.12, "wald mean")
    val z = vec(GArrRandom.zipf(spark, Seq(n), c, 72L, a = 3.0))
    assert(z.forall(x => x == math.floor(x) && x >= 1.0))
    // P(1) = 1/ζ(3) ≈ 0.8319
    val p1 = z.count(_ == 1.0).toDouble / z.length
    assert(math.abs(p1 - 0.8319) < 0.03, s"zipf(3) P(1)=$p1")
    val vm = vec(GArrRandom.vonmises(spark, Seq(n), c, 73L, mu = 0.5, kappa = 4.0))
    assert(vm.forall(x => x > -math.Pi && x <= math.Pi + 0.5))
    // circular mean direction ≈ mu for concentrated kappa
    val cm = math.atan2(vm.map(math.sin).sum, vm.map(math.cos).sum)
    assert(math.abs(cm - 0.5) < 0.08, s"vonmises circular mean $cm")
  }

  test("multinomial: per-draw counts sum to n, category means = n·p") {
    val m = GArrRandom.multinomial(spark, Seq(500L), Seq(64), 81L, n = 20,
      pvals = Seq(0.5, 0.3, 0.2))
    assert(m.shape == Seq(500L, 3L))
    val g = m.toIndexedDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = Array.tabulate(500, 3)((i, j) => g((i * 3 + j).toLong))
    assert(rows.forall(r => r.sum == 20.0), "each draw's counts sum to n")
    val means = (0 until 3).map(j => rows.map(_(j)).sum / 500.0)
    assert(math.abs(means(0) - 10.0) < 0.5 && math.abs(means(1) - 6.0) < 0.5 &&
      math.abs(means(2) - 4.0) < 0.5, s"category means $means")
    // rechunk-invariance across the leading axis
    val m2 = GArrRandom.multinomial(spark, Seq(500L), Seq(17), 81L, n = 20,
      pvals = Seq(0.5, 0.3, 0.2))
    val g2 = m2.toIndexedDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(g == g2)
  }

  test("rejection samplers are rechunk-invariant too (substream counters)") {
    val a = vec(GArrRandom.gamma(spark, Seq(300L), Seq(7), 61L, gshape = 2.5))
    val b = vec(GArrRandom.gamma(spark, Seq(300L), Seq(64), 61L, gshape = 2.5))
    assert(a.toSeq == b.toSeq)
    val c1 = vec(GArrRandom.beta(spark, Seq(300L), Seq(11), 62L, 2.0, 3.0))
    val c2 = vec(GArrRandom.beta(spark, Seq(300L), Seq(128), 62L, 2.0, 3.0))
    assert(c1.toSeq == c2.toSeq)
  }

  test("logseries: support {1,2,...} and analytic mean; rechunk-invariant") {
    val p = 0.5
    val v = vec(GArrRandom.logseries(spark, Seq(20000L), Seq(2048), 91L, p))
    assert(v.forall(x => x >= 1.0 && x == math.floor(x)))
    // E[X] = -p / ((1-p) ln(1-p)) = 1.4427 at p=0.5
    val expMean = -p / ((1 - p) * math.log1p(-p))
    assert(math.abs(v.sum / v.length - expMean) < 0.05, s"mean ${v.sum / v.length}")
    val v2 = vec(GArrRandom.logseries(spark, Seq(20000L), Seq(333), 91L, p))
    assert(v.toSeq == v2.toSeq)
  }

  test("noncentral chisquare / F: analytic means on both df branches") {
    // df>1 branch: E = df + nonc
    val a = vec(GArrRandom.noncentralChisquare(spark, Seq(20000L), Seq(2048), 17L, 3.0, 2.0))
    assert(math.abs(a.sum / a.length - 5.0) < 0.15, s"ncx2 mean ${a.sum / a.length}")
    // df<=1 Poisson-mixture branch
    val b = vec(GArrRandom.noncentralChisquare(spark, Seq(20000L), Seq(2048), 19L, 0.8, 1.5))
    assert(math.abs(b.sum / b.length - 2.3) < 0.15, s"ncx2 df<=1 mean ${b.sum / b.length}")
    // E[ncF] = dfden (dfnum + nonc) / (dfnum (dfden - 2)) = 2.1875
    val f = vec(GArrRandom.noncentralF(spark, Seq(40000L), Seq(4096), 23L, 4.0, 10.0, 3.0))
    assert(math.abs(f.sum / f.length - 2.1875) < 0.15, s"ncF mean ${f.sum / f.length}")
  }

  test("permutation: exact permutation of 0..n-1, seed-deterministic, chunk-independent") {
    val a = vec(GArrRandom.permutation(spark, 500L, 64, 31L))
    assert(a.sorted.toSeq == (0 until 500).map(_.toDouble))
    assert(a.toSeq != (0 until 500).map(_.toDouble), "not the identity")
    val b = vec(GArrRandom.permutation(spark, 500L, 17, 31L))
    assert(a.toSeq == b.toSeq, "layout-independent")
    val c = vec(GArrRandom.permutation(spark, 500L, 64, 32L))
    assert(a.toSeq != c.toSeq, "seed-sensitive")
  }

  test("multivariate hypergeometric: exact vector sums, marginal means, rechunk-invariant") {
    val m = GArrRandom.multivariateHypergeometric(spark, Seq(400L), Seq(64), 29L,
      colors = Seq(5, 3, 2), nsample = 4)
    assert(m.shape == Seq(400L, 3L))
    val g = m.toIndexedDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = Array.tabulate(400, 3)((i, j) => g((i * 3 + j).toLong))
    assert(rows.forall(_.sum == 4.0), "each draw sums to nsample")
    assert(rows.forall(r => r(0) <= 5 && r(1) <= 3 && r(2) <= 2), "per-color caps")
    val means = (0 until 3).map(j => rows.map(_(j)).sum / 400.0)
    // E[X_i] = nsample * colors_i / total = (2.0, 1.2, 0.8)
    assert(math.abs(means(0) - 2.0) < 0.15 && math.abs(means(1) - 1.2) < 0.12 &&
      math.abs(means(2) - 0.8) < 0.12, s"marginal means $means")
    val m2 = GArrRandom.multivariateHypergeometric(spark, Seq(400L), Seq(23), 29L,
      colors = Seq(5, 3, 2), nsample = 4)
    val g2 = m2.toIndexedDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(g == g2)
  }
}
