package graft.operators

import graft.SparkTestBase
import graft.functions.SpecialMath
import org.apache.spark.sql.functions._

/** Stats module (dask/array/stats.py parity) + Misra–Gries heavy hitters.
  *
  * SpecialMath is pinned by exact cross-identities (which hold to machine
  * precision independent of any table) and published constants; the
  * distributed statistics are pinned against straight driver-side Scala
  * recomputations on the same data, so the thing under test is the
  * aggregate lowering, not the formula transcription.
  */
class StatsSketchSpec extends SparkTestBase {

  import spark.implicits._

  // deterministic skewed sample, n=240, two groups
  private val xs: Seq[Double] =
    (1 to 240).map(i => ((i * 37) % 101) + 0.25 * ((i * 17) % 13) + (if (i % 7 == 0) 40.0 else 0.0))
  private val grp: Seq[String] = (1 to 240).map(i => if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c")
  private lazy val df = xs.zip(grp).zipWithIndex
    .map { case ((v, g), i) => (i.toLong, v, g) }
    .toDF("id", "v", "g").repartition(7)

  // ---- SpecialMath ------------------------------------------------------

  test("special functions: identities and published constants") {
    // P + Q = 1
    for (a <- Seq(0.5, 1.0, 2.5, 10.0, 60.0); x <- Seq(0.1, 1.0, 5.0, 30.0, 120.0))
      assert(math.abs(SpecialMath.gammaP(a, x) + SpecialMath.gammaQ(a, x) - 1.0) < 1e-12)
    // I_x(a,b) = 1 - I_{1-x}(b,a)
    for (a <- Seq(0.5, 2.0, 7.5); b <- Seq(0.5, 3.0, 12.0); x <- Seq(0.05, 0.3, 0.7, 0.95))
      assert(math.abs(SpecialMath.betainc(a, b, x) - (1.0 - SpecialMath.betainc(b, a, 1.0 - x))) < 1e-12)
    // chi2(1) <-> normal, F(1,v) <-> t(v)
    for (z <- Seq(0.5, 1.0, 1.96, 3.0)) {
      assert(math.abs(SpecialMath.chi2Sf(z * z, 1) - 2 * SpecialMath.normSf(z)) < 1e-12)
      assert(math.abs(SpecialMath.fSf(z * z, 1, 10) - 2 * SpecialMath.tSf(z, 10)) < 1e-12)
    }
    // published values
    assert(math.abs(SpecialMath.erfc(1.0) - 0.15729920705028513) < 1e-12)
    assert(math.abs(SpecialMath.normSf(1.959963984540054) - 0.025) < 1e-9)
    assert(math.abs(SpecialMath.chi2Sf(3.841458820694124, 1) - 0.05) < 1e-9)
    assert(math.abs(SpecialMath.tSf(2.2281388519649385, 10) - 0.025) < 1e-9)
    assert(math.abs(SpecialMath.normSf(0.0) - 0.5) < 1e-15)
  }

  // driver-side reference helpers
  private def mean(s: Seq[Double]) = s.sum / s.size
  private def varS(s: Seq[Double]) = { val m = mean(s); s.map(x => (x - m) * (x - m)).sum / (s.size - 1) }
  private def centralMoment(s: Seq[Double], p: Int) = { val m = mean(s); s.map(x => math.pow(x - m, p)).sum / s.size }

  test("ttest_1samp / ttest_ind (pooled + Welch) / ttest_rel match driver-side reference") {
    val r1 = Stats.ttest1Samp(df, "v", 55.0).head()
    val expT1 = (mean(xs) - 55.0) / math.sqrt(varS(xs) / xs.size)
    assert(math.abs(r1.getDouble(0) - expT1) < 1e-9)
    assert(math.abs(r1.getAs[Double]("p_value") - 2 * SpecialMath.tSf(math.abs(expT1), xs.size - 1)) < 1e-12)

    val a = xs.zip(grp).collect { case (v, "a") => v }
    val b = xs.zip(grp).collect { case (v, g) if g != "a" => v }
    val (n1, n2, m1, m2, v1, v2) = (a.size.toDouble, b.size.toDouble, mean(a), mean(b), varS(a), varS(b))
    // pooled
    val dfp = n1 + n2 - 2
    val svar = ((n1 - 1) * v1 + (n2 - 1) * v2) / dfp
    val expPooled = (m1 - m2) / math.sqrt(svar * (1 / n1 + 1 / n2))
    val rp = Stats.ttestInd(df, "v", col("g") === "a", equalVar = true).head()
    assert(math.abs(rp.getDouble(0) - expPooled) < 1e-9 && math.abs(rp.getDouble(1) - dfp) < 1e-9)
    // Welch
    val (vn1, vn2) = (v1 / n1, v2 / n2)
    val dfw = math.pow(vn1 + vn2, 2) / (vn1 * vn1 / (n1 - 1) + vn2 * vn2 / (n2 - 1))
    val expWelch = (m1 - m2) / math.sqrt(vn1 + vn2)
    val rw = Stats.ttestInd(df, "v", col("g") === "a", equalVar = false).head()
    assert(math.abs(rw.getDouble(0) - expWelch) < 1e-9 && math.abs(rw.getDouble(1) - dfw) < 1e-9)

    // paired: v vs id-derived second reading
    val withB = df.withColumn("v2", col("v") * 0.9 + col("id") % 5)
    val d = xs.zipWithIndex.map { case (v, i) => v - (v * 0.9 + i % 5) }
    val expRel = mean(d) / math.sqrt(varS(d) / d.size)
    val rr = Stats.ttestRel(withB, "v", "v2").head()
    assert(math.abs(rr.getDouble(0) - expRel) < 1e-9)
  }

  test("power_divergence: all lambda families match driver-side reference") {
    val obs = Seq(16.0, 18.0, 16.0, 14.0, 12.0, 12.0)
    val odf = obs.toDF("obs")
    val e = mean(obs)
    def expected(lam: Double): Double =
      if (lam == 0.0) 2.0 * obs.map(o => o * math.log(o / e)).sum
      else if (lam == -1.0) 2.0 * obs.map(o => e * math.log(e / o)).sum
      else if (lam == 1.0) obs.map(o => (o - e) * (o - e) / e).sum
      else obs.map(o => o * (math.pow(o / e, lam) - 1)).sum / (0.5 * lam * (lam + 1))
    for (lam <- Seq(1.0, 0.0, -1.0, -0.5, -2.0, 2.0 / 3.0)) {
      val r = Stats.powerDivergence(odf, "obs", lambda_ = lam).head()
      assert(math.abs(r.getDouble(0) - expected(lam)) < 1e-9, s"lambda=$lam")
      assert(math.abs(r.getAs[Double]("p_value") -
        SpecialMath.chi2Sf(expected(lam), obs.size - 1)) < 1e-12)
    }
    // explicit expected column + ddof
    val odf2 = obs.zip(Seq(15.0, 15.0, 15.0, 15.0, 14.0, 14.0)).toDF("obs", "exp")
    val r2 = Stats.powerDivergence(odf2, "obs", expCol = Some("exp"), ddof = 1).head()
    val exp2 = obs.zip(Seq(15.0, 15.0, 15.0, 15.0, 14.0, 14.0)).map { case (o, ex) => (o - ex) * (o - ex) / ex }.sum
    assert(math.abs(r2.getDouble(0) - exp2) < 1e-9 && r2.getDouble(1) == 4.0)
  }

  test("skew/kurtosis/moment and their tests match driver-side reference") {
    val n = xs.size.toDouble
    val (m2, m3, m4) = (centralMoment(xs, 2), centralMoment(xs, 3), centralMoment(xs, 4))
    val b1 = m3 / math.pow(m2, 1.5)
    val b2 = m4 / (m2 * m2)
    assert(math.abs(Stats.skew(df, "v").head().getDouble(0) - b1) < 1e-9)
    assert(math.abs(Stats.kurtosis(df, "v").head().getDouble(0) - (b2 - 3)) < 1e-9)
    assert(math.abs(Stats.moment(df, "v", 3).head().getDouble(0) - m3) < 1e-6)

    // skewtest Z (D'Agostino)
    val y0 = b1 * math.sqrt(((n + 1) * (n + 3)) / (6.0 * (n - 2)))
    val beta2 = 3.0 * (n * n + 27 * n - 70) * (n + 1) * (n + 3) / ((n - 2.0) * (n + 5) * (n + 7) * (n + 9))
    val w2 = math.sqrt(2 * (beta2 - 1)) - 1
    val delta = 1 / math.sqrt(0.5 * math.log(w2))
    val alpha = math.sqrt(2.0 / (w2 - 1))
    val y = if (y0 == 0) 1.0 else y0
    val zs = delta * math.log(y / alpha + math.sqrt(math.pow(y / alpha, 2) + 1))
    val rs = Stats.skewtest(df, "v").head()
    assert(math.abs(rs.getDouble(0) - zs) < 1e-9)
    assert(math.abs(rs.getDouble(1) - 2 * SpecialMath.normSf(math.abs(zs))) < 1e-12)

    // kurtosistest Z (Anscombe–Glynn)
    val eB2 = 3.0 * (n - 1) / (n + 1)
    val varb2 = 24.0 * n * (n - 2) * (n - 3) / ((n + 1) * (n + 1) * (n + 3) * (n + 5))
    val x = (b2 - eB2) / math.sqrt(varb2)
    val sqrtbeta1 = 6.0 * (n * n - 5 * n + 2) / ((n + 7) * (n + 9)) *
      math.sqrt(6.0 * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3)))
    val aA = 6.0 + 8.0 / sqrtbeta1 * (2.0 / sqrtbeta1 + math.sqrt(1 + 4.0 / (sqrtbeta1 * sqrtbeta1)))
    val term1 = 1 - 2 / (9.0 * aA)
    val denom = 1 + x * math.sqrt(2 / (aA - 4.0))
    val term2 = math.pow((1 - 2.0 / aA) / denom, 1.0 / 3.0)
    val zk = (term1 - term2) / math.sqrt(2 / (9.0 * aA))
    val rk = Stats.kurtosistest(df, "v").head()
    assert(math.abs(rk.getDouble(0) - zk) < 1e-9)

    // normaltest combines both
    val k2 = zs * zs + zk * zk
    val rn = Stats.normaltest(df, "v").head()
    assert(math.abs(rn.getDouble(0) - k2) < 1e-8)
    assert(math.abs(rn.getDouble(1) - SpecialMath.chi2Sf(k2, 2)) < 1e-12)
  }

  test("f_oneway matches driver-side reference") {
    val groups = grp.distinct.sorted.map(g => xs.zip(grp).collect { case (v, `g`) => v })
    val all = groups.flatten
    val off = mean(all)
    val shifted = groups.map(_.map(_ - off))
    val bign = all.size.toDouble
    val sstot = shifted.flatten.map(x => x * x).sum - math.pow(shifted.flatten.sum, 2) / bign
    val ssbn = shifted.map(g => math.pow(g.sum, 2) / g.size).sum - math.pow(shifted.flatten.sum, 2) / bign
    val (dfbn, dfwn) = (groups.size - 1.0, bign - groups.size)
    val expF = (ssbn / dfbn) / ((sstot - ssbn) / dfwn)
    val r = Stats.fOneway(df, "v", "g").head()
    assert(math.abs(r.getDouble(0) - expF) < 1e-9)
    assert(r.getDouble(1) == dfbn && r.getDouble(2) == dfwn)
    assert(math.abs(r.getDouble(3) - SpecialMath.fSf(expF, dfbn, dfwn)) < 1e-12)
  }

  // ---- Misra–Gries heavy hitters ---------------------------------------

  test("heavyHitters is exact on a skewed corpus and across partition layouts") {
    // zipf-ish: key i appears ~ 2000/i times, plus a long uniform tail
    val heavy = (1 to 20).flatMap(i => Seq.fill(2000 / i)(s"k$i"))
    val tail = (1 to 5000).map(i => s"t$i")
    val data = new scala.util.Random(42).shuffle(heavy ++ tail)
    for (parts <- Seq(1, 5, 32)) {
      val d = data.toDF("tok").repartition(parts)
      val got = Sketches.heavyHitters(d, "tok", k = 10, budget = 256)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val exact = d.groupBy("tok").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok").asc).limit(10)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      assert(got.toSeq == exact.toSeq, s"parts=$parts")
    }
  }

  test("heavyHitters candidate pruning keeps the shuffle small") {
    val d = (1 to 10000).map(i => if (i % 2 == 0) "big" else s"u$i").toDF("tok").repartition(8)
    val top = Sketches.heavyHitters(d, "tok", k = 1, budget = 64).collect()
    assert(top.head.getString(0) == "big" && top.head.getLong(1) == 5000L)
  }
}
