package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SpecialMath

/** The reference's statistical-test module (`dask/array/stats.py:91-455`,
  * SURVEY §2.11) — every public function: `ttest_1samp`, `ttest_ind`
  * (pooled and Welch), `ttest_rel`, `chisquare` / `power_divergence` (all
  * six λ families), `skew`, `skewtest`, `kurtosis`, `kurtosistest`,
  * `normaltest`, `f_oneway`, `moment` — each returning the statistic, the
  * degrees of freedom where defined, AND the p-value, exactly as scipy
  * does.
  *
  * Scale shape: every test lowers to one or two partial→final hash
  * aggregates over the data (the second pass, where present, centers on
  * the global mean delivered via a broadcast 1-row cross join — no driver
  * round-trip, mirroring the reference's `alldata -= offset` trick in
  * `f_oneway`, stats.py:389, which it does for numerical stability). The
  * survival functions ([[graft.functions.SpecialMath]]) run as a scalar
  * UDF over the single final row only — O(1) rows, never per-datum.
  */
object Stats {

  private val tSf2   = udf((t: Double, df: Double) => 2.0 * SpecialMath.tSf(math.abs(t), df))
  private val chi2Sf = udf((x: Double, df: Double) => SpecialMath.chi2Sf(x, df))
  private val zSf2   = udf((z: Double) => 2.0 * SpecialMath.normSf(math.abs(z)))
  private val fSf    = udf((f: Double, d1: Double, d2: Double) => SpecialMath.fSf(f, d1, d2))

  /** `ttest_1samp(a, popmean)` (stats.py:107): one aggregate pass. */
  def ttest1Samp(df: DataFrame, valueCol: String, popmean: Double): DataFrame = {
    val c = col(valueCol).cast("double")
    df.agg(avg(c).as("m"), var_samp(c).as("v"), count(c).cast("double").as("n"))
      .select(
        ((col("m") - popmean) / sqrt(col("v") / col("n"))).as("t_stat"),
        (col("n") - 1).as("df"))
      .withColumn("p_value", tSf2(col("t_stat"), col("df")))
  }

  /** `ttest_ind(a, b, equal_var)` (stats.py:91): the two samples are the
    * rows of one frame split by a predicate, so both sides' moments come
    * out of a single conditional-aggregation pass — one scan however large
    * the corpus, vs. the reference's two separate arrays.
    */
  def ttestInd(df: DataFrame, valueCol: String, isA: Column,
               equalVar: Boolean = true): DataFrame = {
    val c = col(valueCol).cast("double")
    val a = when(isA, c)
    val b = when(!isA, c)
    val agg = df.agg(
      avg(a).as("m1"), var_samp(a).as("v1"), count(a).cast("double").as("n1"),
      avg(b).as("m2"), var_samp(b).as("v2"), count(b).cast("double").as("n2"))
    val withDf =
      if (equalVar) {
        // _equal_var_ttest_denom, stats.py:472: pooled variance
        val dfree = col("n1") + col("n2") - 2.0
        val svar = ((col("n1") - 1) * col("v1") + (col("n2") - 1) * col("v2")) / dfree
        agg.select(col("m1"), col("m2"),
          sqrt(svar * (lit(1.0) / col("n1") + lit(1.0) / col("n2"))).as("denom"),
          dfree.as("df"))
      } else {
        // _unequal_var_ttest_denom, stats.py:479: Welch–Satterthwaite df
        val vn1 = col("v1") / col("n1")
        val vn2 = col("v2") / col("n2")
        val dfree = pow(vn1 + vn2, 2) /
          (pow(vn1, 2) / (col("n1") - 1) + pow(vn2, 2) / (col("n2") - 1))
        agg.select(col("m1"), col("m2"), sqrt(vn1 + vn2).as("denom"),
          coalesce(dfree, lit(1.0)).as("df"))
      }
    withDf.select(
      ((col("m1") - col("m2")) / col("denom")).as("t_stat"), col("df"))
      .withColumn("p_value", tSf2(col("t_stat"), col("df")))
  }

  /** `ttest_rel(a, b)` (stats.py:127): paired test — the aggregate runs
    * over the per-row difference, one pass.
    */
  def ttestRel(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val d = (col(aCol).cast("double") - col(bCol).cast("double"))
    df.agg(avg(d).as("dm"), var_samp(d).as("v"), count(d).cast("double").as("n"))
      .select((col("dm") / sqrt(col("v") / col("n"))).as("t_stat"),
        (col("n") - 1).as("df"))
      .withColumn("p_value", tSf2(col("t_stat"), col("df")))
  }

  /** `power_divergence(f_obs, f_exp, ddof, lambda_)` (stats.py:194) over a
    * frame of per-category observed (and optionally expected) counts.
    * With no expected column the uniform mean is used, broadcast from a
    * 1-row aggregate (the reference's `f_obs.mean(keepdims=True)`).
    * λ families: 1 Pearson, 0 log-likelihood (G-test), −1 modified
    * log-likelihood, −1/2 Freeman–Tukey, −2 Neyman, 2/3 Cressie–Read.
    */
  def powerDivergence(df: DataFrame, obsCol: String,
                      expCol: Option[String] = None, ddof: Int = 0,
                      lambda_ : Double = 1.0): DataFrame = {
    val obs = col(obsCol).cast("double")
    val withExp = expCol match {
      case Some(e) => df.select(obs.as("__obs"), col(e).cast("double").as("__exp"))
      case None =>
        df.select(obs.as("__obs"))
          .crossJoin(broadcast(df.agg(avg(obs).as("__exp"))))
    }
    val o = col("__obs")
    val e = col("__exp")
    // zero-denominator cells: Spark division/log by zero yields NULL and
    // sum() SKIPS null, which would silently delete the cell from the
    // statistic; scipy returns inf there — make the divergence explicit
    val inf = lit(Double.PositiveInfinity)
    val terms =
      if (lambda_ == 1.0) when(e === 0, when(o === 0, 0.0).otherwise(inf))
        .otherwise(pow(o - e, 2) / e)
      else if (lambda_ == 0.0) lit(2.0) * when(o === 0, 0.0)
        .otherwise(when(e === 0, inf).otherwise(o * log(o / e)))
      else if (lambda_ == -1.0) lit(2.0) * when(e === 0, 0.0)
        .otherwise(when(o === 0, inf).otherwise(e * log(e / o)))
      else {
        // general λ: same e=0 guard as the special branches — Spark's o/e
        // is NULL there and sum() would silently drop the cell. numpy's
        // limit as e→0+ with o>0: (o/e)^λ → +inf for λ>0 (term +inf, the
        // denominator ½λ(λ+1) is >0 for λ>0), and → 0 for λ<0 (term is the
        // FINITE −o/(½λ(λ+1)), matching numpy's inf**negative == 0.0).
        val denom = 0.5 * lambda_ * (lambda_ + 1)
        val atZeroE =
          if (lambda_ > 0) when(o === 0, 0.0).otherwise(inf)
          else when(o === 0, 0.0).otherwise(-o / lit(denom))
        when(e === 0, atZeroE)
          .otherwise((o * (pow(o / e, lambda_) - 1)) / lit(denom))
      }
    withExp.agg(sum(terms).as("stat"),
        (count(col("__obs")).cast("double") - 1 - ddof).as("df"))
      .withColumn("p_value", chi2Sf(col("stat"), col("df")))
  }

  /** `chisquare` (stats.py:148) = power divergence at λ=1. */
  def chisquare(df: DataFrame, obsCol: String, expCol: Option[String] = None,
                ddof: Int = 0): DataFrame =
    powerDivergence(df, obsCol, expCol, ddof, lambda_ = 1.0)

  /** One 1-row frame of the biased central moments m2..m4 and n for
    * `valueCol` — the shared input of skew/kurtosis and their tests.
    * Two passes: broadcast global mean, then a single centered-power-sum
    * aggregate (numerically safe — no raw-power-sum cancellation).
    */
  private def centralMoments(df: DataFrame, valueCol: String): DataFrame = {
    val c = col(valueCol).cast("double")
    val x = c - col("__mean")
    df.select(c.as(valueCol))
      .crossJoin(broadcast(df.agg(avg(c).as("__mean"))))
      // count the VALUES, not the rows: avg() skips nulls, so a row-count
      // n would mix populations and skew the z formulas
      .agg(count(c).cast("double").as("n"),
        avg(pow(x, 2)).as("m2"), avg(pow(x, 3)).as("m3"), avg(pow(x, 4)).as("m4"))
  }

  /** Exact-moment variant for INTEGER-VALUED columns: raw power sums
    * Σx..Σx⁴ accumulate as BIGINTs, which are order-independent — any
    * partitioning, AQE plan, or combine order yields the bit-identical
    * moments (the scale-proof accumulation a float sum cannot give).
    * Central moments then derive in ONE fixed double-op sequence, so an
    * oracle computing the same sequence from the same sums matches
    * bit-for-bit.  Raw-power-sum cancellation is not a concern for the
    * small-magnitude domains callers opt into.  CONTRACT — the bound
    * must account for row count, not just |x|: Spark's non-ANSI Long
    * `sum` wraps silently, so callers must hold n·max|x|⁴ < 2⁶³.
    * E.g. |x| ≤ 50 (l_quantity) is safe to ~1.4×10¹² rows, but |x| ≤ 10⁴
    * overflows Σx⁴ past ~922 rows.  Verify the domain statically before
    * reusing; otherwise call [[centralMoments]].
    */
  private def centralMomentsExactIntegral(df: DataFrame, valueCol: String): DataFrame = {
    val xl = col(valueCol).cast("long")
    df.agg(count(xl).cast("double").as("n"),
        sum(xl).as("s1"), sum(xl * xl).as("s2"),
        sum(xl * xl * xl).as("s3"), sum(xl * xl * xl * xl).as("s4"))
      .select(col("n"), (col("s1") / col("n")).as("mean"),
        col("s2"), col("s3"), col("s4"))
      .select(col("n"),
        (col("s2") / col("n") - col("mean") * col("mean")).as("m2"),
        (col("s3") / col("n") - lit(3.0) * col("mean") * (col("s2") / col("n"))
          + lit(2.0) * col("mean") * col("mean") * col("mean")).as("m3"),
        (col("s4") / col("n") - lit(4.0) * col("mean") * (col("s3") / col("n"))
          + lit(6.0) * col("mean") * col("mean") * (col("s2") / col("n"))
          - lit(3.0) * col("mean") * col("mean") * col("mean") * col("mean")).as("m4"))
  }

  private def momentsOf(df: DataFrame, valueCol: String, exactIntegral: Boolean): DataFrame =
    if (exactIntegral) centralMomentsExactIntegral(df, valueCol)
    else centralMoments(df, valueCol)

  /** `moment(a, n)` (stats.py:410): biased n-th central moment. */
  def moment(df: DataFrame, valueCol: String, n: Int): DataFrame = {
    val c = col(valueCol).cast("double")
    val x = pow(c - col("__mean"), n)
    df.select(c.as(valueCol))
      .crossJoin(broadcast(df.agg(avg(c).as("__mean"))))
      .agg(avg(x).as("moment"))
  }

  /** `skew(a)` (stats.py:239): biased g1 = m3/m2^1.5 (0 when m2=0). */
  def skew(df: DataFrame, valueCol: String): DataFrame =
    centralMoments(df, valueCol).select(
      when(col("m2") === 0, 0.0)
        .otherwise(col("m3") / pow(col("m2"), 1.5)).as("skew"))

  /** `kurtosis(a, fisher)` (stats.py:294): biased m4/m2² (−3 if Fisher). */
  def kurtosis(df: DataFrame, valueCol: String, fisher: Boolean = true): DataFrame =
    centralMoments(df, valueCol).select(
      (when(col("m2") === 0, 0.0).otherwise(col("m4") / pow(col("m2"), 2))
        - (if (fisher) lit(3.0) else lit(0.0))).as("kurtosis"))

  // D'Agostino skewtest Z (stats.py:265) as a Column over a centralMoments
  // row — shared by skewtest and normaltest.
  private def skewZ: Column = {
    val n = col("n")
    val b2 = when(col("m2") === 0, 0.0).otherwise(col("m3") / pow(col("m2"), 1.5))
    val y0 = b2 * sqrt(((n + 1) * (n + 3)) / (lit(6.0) * (n - 2)))
    val beta2 = lit(3.0) * (n * n + n * 27 - 70) * (n + 1) * (n + 3) /
      ((n - 2.0) * (n + 5) * (n + 7) * (n + 9))
    val w2 = sqrt(lit(2.0) * (beta2 - 1)) - 1
    val delta = lit(1.0) / sqrt(lit(0.5) * log(w2))
    val alpha = sqrt(lit(2.0) / (w2 - 1))
    val y = when(y0 === 0, 1.0).otherwise(y0)
    delta * log(y / alpha + sqrt(pow(y / alpha, 2) + 1))
  }

  // Anscombe–Glynn kurtosistest Z (stats.py:325), same sharing.
  private def kurtZ: Column = {
    val n = col("n")
    val b2 = when(col("m2") === 0, 0.0).otherwise(col("m4") / pow(col("m2"), 2))
    val e = lit(3.0) * (n - 1) / (n + 1)
    val varb2 = lit(24.0) * n * (n - 2) * (n - 3) / ((n + 1) * (n + 1) * (n + 3) * (n + 5))
    val x = (b2 - e) / sqrt(varb2)
    val sqrtbeta1 = lit(6.0) * (n * n - n * 5 + 2) / ((n + 7) * (n + 9)) *
      sqrt(lit(6.0) * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3)))
    val a = lit(6.0) + lit(8.0) / sqrtbeta1 *
      (lit(2.0) / sqrtbeta1 + sqrt(lit(1.0) + lit(4.0) / pow(sqrtbeta1, 2)))
    val term1 = lit(1.0) - lit(2.0) / (lit(9.0) * a)
    val denom0 = lit(1.0) + x * sqrt(lit(2.0) / (a - 4.0))
    // reference guards denom<0 by pinning Z to 0 (stats.py:348-352)
    val term2 = pow((lit(1.0) - lit(2.0) / a) / denom0, lit(1.0) / 3.0)
    when(denom0 < 0, 0.0)
      .otherwise((term1 - term2) / sqrt(lit(2.0) / (lit(9.0) * a)))
  }

  /** `skewtest(a)` (stats.py:265). The reference raises for n < 8; here
    * the statistic is simply undefined (NaN) below that, since n is not
    * known without running the job.
    */
  def skewtest(df: DataFrame, valueCol: String,
               exactIntegral: Boolean = false): DataFrame =
    momentsOf(df, valueCol, exactIntegral)
      .select(skewZ.as("z_stat"))
      .select(col("z_stat"), zSf2(col("z_stat")).as("p_value"))

  /** `kurtosistest(a)` (stats.py:325). */
  def kurtosistest(df: DataFrame, valueCol: String,
                   exactIntegral: Boolean = false): DataFrame =
    momentsOf(df, valueCol, exactIntegral)
      .select(kurtZ.as("z_stat"))
      .select(col("z_stat"), zSf2(col("z_stat")).as("p_value"))

  /** `normaltest(a)` (stats.py:362): K² = Z_skew² + Z_kurt², χ²(2) —
    * both Z's come off the same single moments row.
    */
  def normaltest(df: DataFrame, valueCol: String,
                 exactIntegral: Boolean = false): DataFrame =
    momentsOf(df, valueCol, exactIntegral)
      .select((pow(skewZ, 2) + pow(kurtZ, 2)).as("k2_stat"))
      .select(col("k2_stat"), chi2Sf(col("k2_stat"), lit(2.0)).as("p_value"))

  /** `f_oneway(*groups)` (stats.py:375): one-way ANOVA with the groups
    * given by a key column. Center on the broadcast global mean (the
    * reference's stability offset), per-group partials, then a final
    * aggregate over the handful of group rows.
    */
  def fOneway(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val c = col(valueCol).cast("double")
    val centered = df.select(col(groupCol).as("__g"), c.as("__v"))
      .crossJoin(broadcast(df.agg(avg(c).as("__mean"))))
      .select(col("__g"), (col("__v") - col("__mean")).as("x"))
    val g = centered.groupBy(col("__g")).agg(
      sum(col("x")).as("s"), sum(col("x") * col("x")).as("ss"),
      count(col("x")).cast("double").as("n"))
    val fin = g.agg(
      sum(col("n")).as("bign"), count(lit(1)).cast("double").as("k"),
      sum(col("ss")).as("sumss"), sum(col("s")).as("sums"),
      sum(col("s") * col("s") / col("n")).as("ssg"))
    val sstot = col("sumss") - pow(col("sums"), 2) / col("bign")
    val ssbn = col("ssg") - pow(col("sums"), 2) / col("bign")
    fin.select(
        (((ssbn / (col("k") - 1)) / ((sstot - ssbn) / (col("bign") - col("k"))))).as("f_stat"),
        (col("k") - 1).as("df_between"), (col("bign") - col("k")).as("df_within"))
      .withColumn("p_value", fSf(col("f_stat"), col("df_between"), col("df_within")))
  }
}
