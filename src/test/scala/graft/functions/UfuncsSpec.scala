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
