package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class UfuncsSpec extends SparkTestBase {
  import spark.implicits._

  private def eval1(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                    xs: Seq[Double]): Seq[Double] =
    xs.toDF("x").select(f(col("x")).cast("double").as("y"))
      .collect().map(_.getDouble(0)).toSeq

  test("composed ufuncs match scala.math reference values") {
    val xs = Seq(-2.5, -1.0, -0.0, 0.0, 0.5, 3.25)
    val sinc = eval1(Ufuncs.sinc, xs)
    xs.zip(sinc).foreach { case (x, got) =>
      val exp = if (x == 0) 1.0 else math.sin(math.Pi * x) / (math.Pi * x)
      assert(math.abs(got - exp) < 1e-12, s"sinc($x)")
    }
    val trunc = eval1(Ufuncs.trunc, xs)
    assert(trunc == Seq(-2.0, -1.0, 0.0, 0.0, 0.0, 3.0))
    val sgnbit = xs.toDF("x").select(Ufuncs.signbit(col("x")).as("y"))
      .collect().map(_.getBoolean(0)).toSeq
    // -0.0 carries the sign bit (numpy signbit semantics)
    assert(sgnbit == Seq(true, true, true, false, false, false))
  }

  test("logaddexp is stable for far-apart operands") {
    val got = Seq((800.0, 1.0)).toDF("a", "b")
      .select(Ufuncs.logaddexp(col("a"), col("b")).as("y"))
      .head().getDouble(0)
    // naive ln(e^800 + e^1) overflows; stable form returns ~800
    assert(math.abs(got - 800.0) < 1e-9)
    val close = Seq((1.0, 1.0)).toDF("a", "b")
      .select(Ufuncs.logaddexp(col("a"), col("b")).as("y"))
      .head().getDouble(0)
    assert(math.abs(close - (1.0 + math.log(2.0))) < 1e-12)
  }

  test("copysign / fmod / mod follow numpy conventions") {
    val rows = Seq((5.0, -0.1), (5.0, 0.1), (-7.5, 2.0))
    val df = rows.toDF("a", "b")
    val cs = df.select(Ufuncs.copysign(col("a"), col("b")).as("y"))
      .collect().map(_.getDouble(0)).toSeq
    assert(cs == Seq(-5.0, 5.0, 7.5))
    // fmod: sign of dividend; mod: sign of divisor
    val fm = Seq((-7.0, 3.0)).toDF("a", "b")
      .select(Ufuncs.fmod(col("a"), col("b")).as("f"),
        Ufuncs.mod(col("a"), col("b")).as("m")).head()
    assert(fm.getDouble(0) == -1.0 && fm.getDouble(1) == 2.0)
  }

  test("trunc/heaviside propagate NaN; trunc preserves huge magnitudes; signbit(-0)") {
    val xs = Seq(Double.NaN, 1e20, -1e20, Double.PositiveInfinity)
    val tr = eval1(Ufuncs.trunc, xs)
    assert(tr(0).isNaN && tr(1) == 1e20 && tr(2) == -1e20 && tr(3).isPosInfinity)
    val hv = Seq(Double.NaN).toDF("x")
      .select(Ufuncs.heaviside(col("x"), lit(0.5)).as("y")).head().getDouble(0)
    assert(hv.isNaN)
    val sb = Seq(-0.0, 0.0, Double.NaN).toDF("x")
      .select(Ufuncs.signbit(col("x")).as("y")).collect().map(_.getBoolean(0)).toSeq
    assert(sb == Seq(true, false, false))
  }

  test("gcd/lcm/expit/logit/modf/nextafter/spacing") {
    val r = Seq((54L, 24L)).toDF("a", "b")
      .select(Ufuncs.gcd(col("a"), col("b")).as("g"),
        Ufuncs.lcm(col("a"), col("b")).as("l")).head()
    assert(r.getLong(0) == 6L && r.getLong(1) == 216L)
    val z = Seq((0L, 5L)).toDF("a", "b")
      .select(Ufuncs.gcd(col("a"), col("b")), Ufuncs.lcm(col("a"), col("b"))).head()
    assert(z.getLong(0) == 5L && z.getLong(1) == 0L)
    val e = Seq(0.0).toDF("x").select(Ufuncs.expit(col("x"))).head().getDouble(0)
    assert(e == 0.5)
    val lg = Seq(0.5).toDF("x").select(Ufuncs.logit(col("x"))).head().getDouble(0)
    assert(math.abs(lg) < 1e-12)
    val mf = Seq(-2.75).toDF("x").select(Ufuncs.modf(col("x")).as("m")).head()
      .getStruct(0)
    assert(mf.getDouble(0) == -0.75 && mf.getDouble(1) == -2.0)
    val na = Seq((1.0, 2.0)).toDF("a", "b")
      .select(Ufuncs.nextafter(col("a"), col("b"))).head().getDouble(0)
    assert(na == Math.nextAfter(1.0, 2.0) && na > 1.0)
    val sp = Seq(1.0).toDF("x").select(Ufuncs.spacing(col("x"))).head().getDouble(0)
    assert(sp == Math.ulp(1.0))
  }

  test("heaviside and isfinite/isinf") {
    val hv = Seq(-3.0, 0.0, 2.0).toDF("x")
      .select(Ufuncs.heaviside(col("x"), lit(0.5)).as("y"))
      .collect().map(_.getDouble(0)).toSeq
    assert(hv == Seq(0.0, 0.5, 1.0))
    val xs = Seq(1.0, Double.PositiveInfinity, Double.NegativeInfinity, Double.NaN)
    val fin = xs.toDF("x").select(Ufuncs.isfinite(col("x")).as("y"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(fin == Seq(true, false, false, false))
    val inf = xs.toDF("x").select(Ufuncs.isinf(col("x")).as("y"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(inf == Seq(false, true, true, false))
  }

  test("minimum/maximum propagate NaN; fmax/fmin ignore it (numpy split)") {
    val df = Seq((Double.NaN, 5.0), (5.0, Double.NaN), (2.0, 7.0),
      (Double.NaN, Double.NaN)).toDF("a", "b")
    val r = df.select(
      Ufuncs.maximum(col("a"), col("b")).as("mx"),
      Ufuncs.minimum(col("a"), col("b")).as("mn"),
      Ufuncs.fmax(col("a"), col("b")).as("fx"),
      Ufuncs.fmin(col("a"), col("b")).as("fn")).collect()
    assert(r(0).getDouble(0).isNaN && r(0).getDouble(1).isNaN)
    assert(r(0).getDouble(2) == 5.0 && r(0).getDouble(3) == 5.0)
    assert(r(1).getDouble(2) == 5.0 && r(1).getDouble(3) == 5.0)
    assert(r(2).getDouble(0) == 7.0 && r(2).getDouble(1) == 2.0)
    assert(r(2).getDouble(2) == 7.0 && r(2).getDouble(3) == 2.0)
    assert(r(3).toSeq.forall(_.asInstanceOf[Double].isNaN))
  }

  test("frexp: 0.5 <= |mantissa| < 1, exact on powers of two; isposinf/isneginf") {
    val xs = Seq(8.0, 1.0, 0.5, -3.0, 0.0, 1e-300, 6.5e200)
    val r = xs.toDF("x").select(Ufuncs.frexp(col("x")).as("f")).collect()
      .map(row => (row.getStruct(0).getDouble(0), row.getStruct(0).getDouble(1)))
    xs.zip(r).foreach { case (x, (m, e)) =>
      if (x == 0.0) assert(m == 0.0 && e == 0.0)
      else {
        assert(math.abs(m) >= 0.5 && math.abs(m) < 1.0, s"mantissa $m of $x")
        assert(m * math.pow(2.0, e) == x, s"recompose $x")
      }
    }
    assert(r(0) == ((0.5, 4.0)) && r(1) == ((0.5, 1.0)) && r(2) == ((0.5, 0.0)))
    // numpy: frexp(±inf) = (±inf, 0), frexp(nan) = (nan, 0)
    val nf = Seq(Double.PositiveInfinity, Double.NegativeInfinity, Double.NaN)
      .toDF("x").select(Ufuncs.frexp(col("x")).as("f")).collect()
      .map(row => (row.getStruct(0).getDouble(0), row.getStruct(0).getDouble(1)))
    assert(nf(0) == ((Double.PositiveInfinity, 0.0)))
    assert(nf(1) == ((Double.NegativeInfinity, 0.0)))
    assert(nf(2)._1.isNaN && nf(2)._2 == 0.0)
    val inf = Seq(Double.PositiveInfinity, Double.NegativeInfinity, 1.0).toDF("x")
      .select(Ufuncs.isposinf(col("x")).as("p"), Ufuncs.isneginf(col("x")).as("n"))
      .collect().map(row => (row.getBoolean(0), row.getBoolean(1))).toSeq
    assert(inf == Seq((true, false), (false, true), (false, false)))
  }

  test("isnull/notnull treat NULL and NaN as missing; divmod pairs recompose") {
    val df = Seq(Some(1.0), None, Some(Double.NaN)).toDF("x")
    val nn = df.select(Ufuncs.isnull(col("x")).as("i"), Ufuncs.notnull(col("x")).as("n"))
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1))).toSeq
    assert(nn == Seq((false, true), (true, false), (true, false)))
    // divmod follows numpy: floor quotient, remainder with the divisor's sign
    val dm = Seq((7.0, 3.0), (-7.0, 3.0), (7.0, -3.0), (-7.0, -3.0)).toDF("a", "b")
      .select(Ufuncs.divmod(col("a"), col("b")).as("d"))
      .collect().map(r => (r.getStruct(0).getDouble(0), r.getStruct(0).getDouble(1)))
    assert(dm.toSeq == Seq((2.0, 1.0), (-3.0, 2.0), (-3.0, -2.0), (2.0, -1.0)))
    // zero divisor: (0, 0) — numpy's divmod-by-zero convention, not null
    val dz = Seq((7.0, 0.0)).toDF("a", "b")
      .select(Ufuncs.divmod(col("a"), col("b")).as("d")).collect()
      .map(r => (r.getStruct(0).getDouble(0), r.getStruct(0).getDouble(1)))
    assert(dz.toSeq == Seq((0.0, 0.0)))
  }

  test("i0 matches reference values within the A&S polynomial tolerance") {
    // scipy.special.i0 reference values
    val ref = Map(0.0 -> 1.0, 1.0 -> 1.2660658777520084,
      3.75 -> 9.118945958491711, 10.0 -> 2815.716628466254)
    val r = ref.keys.toSeq.sorted.toDF("x").select(col("x"), Ufuncs.i0(col("x")).as("y"))
      .collect().map(row => row.getDouble(0) -> row.getDouble(1)).toMap
    ref.foreach { case (x, want) =>
      assert(math.abs(r(x) - want) / math.max(want, 1.0) < 2e-7, s"i0($x) = ${r(x)} vs $want")
    }
  }

  test("nan-reduction family skips NaN; nansum of all-NaN is 0") {
    val df = Seq(1.0, Double.NaN, 3.0, Double.NaN, 5.0).toDF("x")
    val r = df.agg(
      Ufuncs.nansum(col("x")).as("s"), Ufuncs.nanmean(col("x")).as("m"),
      Ufuncs.nanmin(col("x")).as("lo"), Ufuncs.nanmax(col("x")).as("hi"),
      Ufuncs.nanstd(col("x")).as("sd")).head()
    assert(r.getDouble(0) == 9.0 && r.getDouble(1) == 3.0)
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 5.0)
    assert(math.abs(r.getDouble(4) - 2.0) < 1e-12) // std of 1,3,5
    // plain sum would be NaN — the remap is what makes it numpy-nansum
    assert(df.agg(sum(col("x"))).head().getDouble(0).isNaN)
    val allNan = Seq(Double.NaN, Double.NaN).toDF("x")
    assert(allNan.agg(Ufuncs.nansum(col("x"))).head().getDouble(0) == 0.0)
    assert(allNan.agg(Ufuncs.nanmean(col("x"))).head().isNullAt(0))
  }
}
