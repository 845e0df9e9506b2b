package graft.operators

import graft.SparkTestBase

/** argtopk, nanquantile/nanmedian/nanprod, moveaxis/rollaxis, trace —
  * the dask.array export long tail closed in round 9c.
  */
class ArgtopkNanqSpec extends SparkTestBase {

  private def arr1d(vals: Seq[Double], chunk: Int): GArr = {
    val v = vals.toArray
    GArr.fromFunction(spark, Seq(v.length.toLong), Seq(chunk))(g => v(g(0).toInt))
  }

  private def cells(a: GArr): Map[Long, Double] =
    a.toIndexedDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("argtopk 1-D: indices of largest/smallest with smaller-index tie-break") {
    val v = Seq(3.0, 7.0, 7.0, 1.0, 9.0, 0.0, 9.0, 4.0)
    val a = arr1d(v, 3)
    val top3 = cells(a.argtopkAxis(0, 3))
    // values sorted desc: 9(idx4), 9(idx6), 7(idx1) — ties to smaller idx
    assert(top3(0) == 4.0 && top3(1) == 6.0 && top3(2) == 1.0, top3)
    val bot2 = cells(a.argtopkAxis(0, -2))
    assert(bot2(0) == 5.0 && bot2(1) == 3.0, bot2)
  }

  test("argtopk along axis 1 of a 2-D multi-chunk array vs dense reference") {
    val rnd = new scala.util.Random(42)
    val rows = 5; val cols = 11
    val m = Array.fill(rows, cols)((rnd.nextInt(9)).toDouble)
    val a = GArr.fromFunction(spark, Seq(rows.toLong, cols.toLong), Seq(2, 4))(
      g => m(g(0).toInt)(g(1).toInt))
    val k = 4
    val got = cells(a.argtopkAxis(1, k))
    for (r <- 0 until rows) {
      val expect = (0 until cols).sortBy(c => (-m(r)(c), c)).take(k)
      for (j <- 0 until k)
        assert(got(r * k + j) == expect(j).toDouble, s"row $r pos $j")
    }
  }

  test("nanquantile/nanmedian drop NaNs per lane; all-NaN lane yields NaN") {
    val m = Seq(
      Seq(1.0, Double.NaN, 5.0, 3.0),
      Seq(Double.NaN, Double.NaN, Double.NaN, Double.NaN),
      Seq(2.0, 4.0, 6.0, 8.0))
    val a = GArr.fromFunction(spark, Seq(3L, 4L), Seq(2, 2))(g => m(g(0).toInt)(g(1).toInt))
    val med = cells(a.nanmedianAxis(1))
    assert(med(0) == 3.0) // median of {1,3,5}
    assert(med(1).isNaN)
    assert(med(2) == 5.0)
    val q25 = cells(a.nanquantileAxis(1, 0.25))
    assert(q25(0) == 2.0) // linear interp over {1,3,5}: 1 + 0.5*(3-1)
    assert(q25(2) == 3.5)
  }

  test("nanprod treats NaN as identity; all-NaN lane gives the empty product 1") {
    val m = Seq(Seq(2.0, Double.NaN, 3.0), Seq(Double.NaN, Double.NaN, Double.NaN))
    val a = GArr.fromFunction(spark, Seq(2L, 3L), Seq(1, 2))(g => m(g(0).toInt)(g(1).toInt))
    val p = cells(a.nanprodAxis(1))
    assert(p(0) == 6.0 && p(1) == 1.0)
  }

  test("moveaxis/rollaxis permute like numpy; trace sums the diagonal") {
    val a = GArr.fromFunction(spark, Seq(2L, 3L, 4L), Seq(1, 2, 2))(
      g => (g(0) * 12 + g(1) * 4 + g(2)).toDouble)
    val mv = a.moveaxis(0, 2) // (2,3,4) -> (3,4,2)
    assert(mv.shape == Seq(3L, 4L, 2L))
    val c = cells(mv)
    for (i <- 0 until 2; j <- 0 until 3; k <- 0 until 4)
      assert(c((j * 4L + k) * 2 + i) == i * 12.0 + j * 4 + k, s"($i,$j,$k)")
    val rl = a.rollaxis(2) // axis 2 to front: (4,2,3)
    assert(rl.shape == Seq(4L, 2L, 3L))
    val sq = GArr.fromFunction(spark, Seq(5L, 5L), Seq(2, 3))(
      g => (g(0) * 5 + g(1) + 1).toDouble)
    assert(sq.trace == (1.0 + 7 + 13 + 19 + 25))
  }

  test("np.block-style nested assembly via concatenate composition") {
    def const(r: Long, c: Long, v: Double) =
      GArr.fromFunction(spark, Seq(r, c), Seq(2, 2))(_ => v)
    val top = GArr.concatenate(1, Seq(const(2, 3, 1.0), const(2, 2, 2.0)))
    val bottom = GArr.concatenate(1, Seq(const(3, 3, 3.0), const(3, 2, 4.0)))
    val b = GArr.concatenate(0, Seq(top, bottom))
    assert(b.shape == Seq(5L, 5L))
    val c = cells(b)
    for (i <- 0 until 5; j <- 0 until 5) {
      val expect = (if (i < 2) 0 else 2) + (if (j < 3) 1 else 2)
      assert(c(i * 5L + j) == expect.toDouble, s"($i,$j)")
    }
  }
}
