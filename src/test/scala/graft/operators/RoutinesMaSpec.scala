package graft.operators

import graft.SparkTestBase

/** `dask/array/routines.py` long-tail compositions and the `ma.py`
  * masked tier — driver-checked against directly-computed numpy
  * semantics on deterministic multi-chunk arrays.
  */
class RoutinesMaSpec extends SparkTestBase {

  private def arr1d(vals: Seq[Double], chunk: Int): GArr = {
    val v = vals.toArray
    GArr.fromFunction(spark, Seq(v.length.toLong), Seq(chunk))(g => v(g(0).toInt))
  }

  private def values1d(a: GArr): Seq[Double] =
    a.toIndexedDF.collect().sortBy(_.getLong(0)).map(_.getDouble(1)).toSeq

  private def cells(a: GArr): Map[Long, Double] =
    a.toIndexedDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("outer: 1-D x 1-D block cartesian matches the dense outer product") {
    val a = arr1d(Seq(1, 2, 3, 4, 5).map(_.toDouble), 2)
    val b = arr1d(Seq(10, 20, 30).map(_.toDouble), 2)
    val o = ArrayRoutines.outer(a, b)
    assert(o.shape == Seq(5L, 3L))
    val c = cells(o)
    for (i <- 0 until 5; j <- 0 until 3)
      assert(c(i.toLong * 3 + j) == (i + 1.0) * (j + 1) * 10.0, s"outer($i,$j)")
  }

  test("vdot / ediff1d / ravel on mismatched chunkings") {
    val a = arr1d((1 to 12).map(_.toDouble), 5)
    val b = arr1d((1 to 12).map(i => (i % 4).toDouble), 3)
    assert(ArrayRoutines.vdot(a, b) == (1 to 12).map(i => i.toDouble * (i % 4)).sum)
    assert(values1d(ArrayRoutines.ediff1d(a)) == Seq.fill(11)(1.0))
  }

  test("isin / union1d / extract / delete1d / insert1d") {
    val a = arr1d(Seq(3, 1, 4, 1, 5, 9, 2, 6).map(_.toDouble), 3)
    assert(values1d(ArrayRoutines.isin(a, Seq(1.0, 9.0))) ==
      Seq(0, 1, 0, 1, 0, 1, 0, 0).map(_.toDouble))
    val b = arr1d(Seq(4, 7, 1).map(_.toDouble), 2)
    assert(values1d(ArrayRoutines.union1d(a, b)) ==
      Seq(1, 2, 3, 4, 5, 6, 7, 9).map(_.toDouble))
    val cond = arr1d(Seq(1, 0, 1, 0, 0, 1, 0, 0).map(_.toDouble), 3)
    assert(values1d(ArrayRoutines.extract(cond, a)) == Seq(3.0, 4.0, 9.0))
    assert(values1d(ArrayRoutines.delete1d(a, Seq(1L, -1L))) ==
      Seq(3, 4, 1, 5, 9, 2).map(_.toDouble))
    assert(values1d(ArrayRoutines.insert1d(a, 2L, arr1d(Seq(77.0, 88.0), 2))) ==
      Seq(3, 1, 77, 88, 4, 1, 5, 9, 2, 6).map(_.toDouble))
  }

  test("flatnonzero / nonzero / argwhere on a 2-D grid") {
    // 3x4 with zeros scattered; chunks 2x3 exercise cross-block coords
    val m = GArr.fromFunction(spark, Seq(3L, 4L), Seq(2, 3)) { g =>
      if ((g(0) * 4 + g(1)) % 3 == 0) 0.0 else (g(0) * 4 + g(1)).toDouble
    }
    // flat values: idx 0,3,6,9 are zero -> nonzero flat idx = others
    val want = (0 until 12).filter(i => i % 3 != 0)
    assert(values1d(ArrayRoutines.flatnonzero(m)) == want.map(_.toDouble))
    val nz = ArrayRoutines.nonzero(m)
    assert(values1d(nz(0)) == want.map(i => (i / 4).toDouble))
    assert(values1d(nz(1)) == want.map(i => (i % 4).toDouble))
    val aw = ArrayRoutines.argwhere(m)
    assert(aw.shape == Seq(want.length.toLong, 2L))
    val c = cells(aw)
    want.zipWithIndex.foreach { case (flat, k) =>
      assert(c(k.toLong * 2) == (flat / 4).toDouble && c(k.toLong * 2 + 1) == (flat % 4).toDouble)
    }
  }

  test("select / choose / piecewise / isclose / allclose") {
    val x = arr1d(Seq(-3, -1, 0, 2, 5, 7).map(_.toDouble), 2)
    val neg = x.scalarMap(v => if (v < 0) 1.0 else 0.0)
    val big = x.scalarMap(v => if (v > 4) 1.0 else 0.0)
    val sel = ArrayRoutines.select(Seq(neg, big), Seq(x.scalarMap(-_), x.scalarMap(_ * 10)), 99.0)
    assert(values1d(sel) == Seq(3, 1, 99, 99, 50, 70).map(_.toDouble))
    val idx = arr1d(Seq(0, 1, 1, 0, 1, 0).map(_.toDouble), 2)
    val ch = ArrayRoutines.choose(idx, Seq(x, x.scalarMap(_ + 100)))
    assert(values1d(ch) == Seq(-3, 99, 100, 2, 105, 7).map(_.toDouble))
    val pw = ArrayRoutines.piecewise(x, Seq((v: Double) => v < 0), Seq((v: Double) => -v))
    assert(values1d(pw) == Seq(3, 1, 0, 2, 5, 7).map(_.toDouble))
    val y = x.scalarMap(v => v + 1e-9)
    assert(ArrayRoutines.allclose(x, y))
    assert(!ArrayRoutines.allclose(x, x.scalarMap(_ + 1.0)))
    assert(values1d(ArrayRoutines.isclose(x, y)) == Seq.fill(6)(1.0))
  }

  test("swapaxes / flips / rot90 / atleast / append") {
    val m = GArr.fromFunction(spark, Seq(2L, 3L), Seq(1, 2))(g => (g(0) * 3 + g(1)).toDouble)
    // m = [[0,1,2],[3,4,5]]
    val sw = ArrayRoutines.swapaxes(m, 0, 1)
    assert(cells(sw) == Map(0L -> 0.0, 1L -> 3.0, 2L -> 1.0, 3L -> 4.0, 4L -> 2.0, 5L -> 5.0))
    assert(cells(ArrayRoutines.flipud(m))(0L) == 3.0)
    assert(cells(ArrayRoutines.fliplr(m))(0L) == 2.0)
    // np.rot90([[0,1,2],[3,4,5]]) = [[2,5],[1,4],[0,3]]
    val r = ArrayRoutines.rot90(m)
    assert(r.shape == Seq(3L, 2L))
    assert(cells(r) == Map(0L -> 2.0, 1L -> 5.0, 2L -> 1.0, 3L -> 4.0, 4L -> 0.0, 5L -> 3.0))
    assert(cells(ArrayRoutines.rot90(m, 2)) ==
      Map(0L -> 5.0, 1L -> 4.0, 2L -> 3.0, 3L -> 2.0, 4L -> 1.0, 5L -> 0.0))
    assert(cells(ArrayRoutines.rot90(ArrayRoutines.rot90(m, 3), 1)) == cells(m))
    assert(ArrayRoutines.atleast2d(arr1d(Seq(1.0, 2.0), 2)).shape == Seq(1L, 2L))
    assert(ArrayRoutines.atleast3d(m).shape == Seq(2L, 3L, 1L))
    val ap = ArrayRoutines.append(arr1d(Seq(1.0, 2.0), 2), arr1d(Seq(3.0), 1))
    assert(values1d(ap) == Seq(1.0, 2.0, 3.0))
  }

  test("ma: masked constructors, filled, count, sum/mean, average, fix_invalid, binop") {
    val a = arr1d(Seq(1, 2, 3, 4, 5, 6).map(_.toDouble), 2)
    val mw = MaskedArr.maskedWhere(a.scalarMap(v => if (v % 2 == 0) 1.0 else 0.0), a)
    assert(values1d(mw.getmaskarray) == Seq(0, 1, 0, 1, 0, 1).map(_.toDouble))
    assert(values1d(mw.filled(-1.0)) == Seq(1, -1, 3, -1, 5, -1).map(_.toDouble))
    assert(mw.count() == 3L)
    assert(mw.average() == (1.0 + 3.0 + 5.0) / 3)
    val me = MaskedArr.maskedEqual(a, 3.0)
    assert(values1d(me.getmaskarray) == Seq(0, 0, 1, 0, 0, 0).map(_.toDouble))
    val mi = MaskedArr.maskedInside(a, 2.0, 4.0)
    assert(values1d(mi.getmaskarray) == Seq(0, 1, 1, 1, 0, 0).map(_.toDouble))
    val mo = MaskedArr.maskedOutside(a, 2.0, 4.0)
    assert(values1d(mo.getmaskarray) == Seq(1, 0, 0, 0, 1, 1).map(_.toDouble))
    val withNan = a.scalarMap(v => if (v == 4.0) Double.NaN else v)
    val fixed = MaskedArr.maskedInvalid(withNan).fixInvalid(0.0)
    assert(values1d(fixed.getmaskarray) == Seq(0, 0, 0, 1, 0, 0).map(_.toDouble))
    assert(values1d(fixed.getdata) == Seq(1, 2, 3, 0, 5, 6).map(_.toDouble))
    // weighted average over valid cells only
    val w = arr1d(Seq(1, 1, 2, 1, 2, 1).map(_.toDouble), 2)
    val avgW = mw.average(Some(w))
    assert(math.abs(avgW - (1 * 1 + 3 * 2 + 5 * 2) / 5.0) < 1e-12)
    // binop: mask union
    val other = MaskedArr.maskedEqual(a, 5.0)
    val s = mw.binop(other)(_ + _)
    assert(values1d(s.getmaskarray) == Seq(0, 1, 0, 1, 1, 1).map(_.toDouble))
    assert(values1d(s.getdata).take(1) == Seq(2.0))
    // 2-D axis reductions
    val m2 = GArr.fromFunction(spark, Seq(2L, 3L), Seq(1, 2))(g => (g(0) * 3 + g(1)).toDouble)
    val mm = MaskedArr.maskedEqual(m2, 4.0) // masks the (1,1) cell
    assert(values1d(mm.countAxis(0)) == Seq(2.0, 1.0, 2.0))
    assert(values1d(mm.sumAxis(0)) == Seq(3.0, 1.0, 7.0))
    assert(values1d(mm.meanAxis(1)) == Seq(1.0, (3.0 + 5.0) / 2))
    // masked_values approximate matching
    val mv = MaskedArr.maskedValues(a, 2.0 + 1e-9)
    assert(values1d(mv.getmaskarray) == Seq(0, 1, 0, 0, 0, 0).map(_.toDouble))
  }

  test("ma: comparison constructors, compressed, nonzero, where, ones/zeros_like") {
    val a = arr1d(Seq(1, 2, 3, 4, 5, 6).map(_.toDouble), 2)
    assert(values1d(MaskedArr.maskedGreater(a, 4.0).getmaskarray) ==
      Seq(0, 0, 0, 0, 1, 1).map(_.toDouble))
    assert(values1d(MaskedArr.maskedGreaterEqual(a, 4.0).getmaskarray) ==
      Seq(0, 0, 0, 1, 1, 1).map(_.toDouble))
    assert(values1d(MaskedArr.maskedLess(a, 3.0).getmaskarray) ==
      Seq(1, 1, 0, 0, 0, 0).map(_.toDouble))
    assert(values1d(MaskedArr.maskedLessEqual(a, 3.0).getmaskarray) ==
      Seq(1, 1, 1, 0, 0, 0).map(_.toDouble))
    assert(values1d(MaskedArr.maskedNotEqual(a, 3.0).getmaskarray) ==
      Seq(1, 1, 0, 1, 1, 1).map(_.toDouble))
    // compressed: valid cells only, C order
    val mw = MaskedArr.maskedWhere(a.scalarMap(v => if (v % 2 == 0) 1.0 else 0.0), a)
    assert(values1d(mw.compressed()) == Seq(1.0, 3.0, 5.0))
    // ma.nonzero: masked cells never count as nonzero; payload zeros don't either
    val withZero = a.scalarMap(v => if (v == 4.0) 0.0 else v)
    val nz = MaskedArr.maskedEqual(withZero, 2.0).nonzero()
    assert(values1d(nz.head) == Seq(0.0, 2.0, 4.0, 5.0)) // flat idx of 1,3,5,6
    // ma.where: chosen cell's mask travels with its payload
    val other = MaskedArr.maskedEqual(a.scalarMap(_ + 10), 13.0)
    val cond = a.scalarMap(v => if (v <= 3.0) 1.0 else 0.0)
    val picked = mw.maWhere(cond, other)
    assert(values1d(picked.getdata) == Seq(1, 2, 3, 14, 15, 16).map(_.toDouble))
    assert(values1d(picked.getmaskarray) == Seq(0, 1, 0, 0, 0, 0).map(_.toDouble))
    assert(values1d(mw.onesLike.getdata) == Seq.fill(6)(1.0))
    assert(values1d(mw.zerosLike.getmaskarray) == values1d(mw.getmaskarray))
  }

  test("unique / uniqueCounts: sorted distinct of a multi-chunk 2-D array") {
    val a = GArr.fromFunction(spark, Seq(4L, 5L), Seq(2, 2))(g => ((g(0) * 5 + g(1)) % 6).toDouble)
    assert(values1d(ArrayRoutines.unique(a)) == Seq(0.0, 1.0, 2.0, 3.0, 4.0, 5.0))
    val (vals, cnts) = ArrayRoutines.uniqueCounts(a)
    assert(values1d(vals) == Seq(0.0, 1.0, 2.0, 3.0, 4.0, 5.0))
    // 20 cells over residues mod 6: 0,1 appear 4x (residues hit twice in
    // the wrap), the rest 3x — check against a driver recount
    val dense = for (i <- 0 until 4; j <- 0 until 5) yield ((i * 5 + j) % 6).toDouble
    val want = dense.groupBy(identity).toSeq.sortBy(_._1).map(_._2.length.toDouble)
    assert(values1d(cnts) == want)
  }

  test("trilIndices / triuIndices match numpy's nonzero(tri) composition") {
    // rectangular 4x6, k = 1
    val tl = ArrayRoutines.trilIndices(spark, 4L, k = 1L, m = 6L, chunk = 3)
    val wantTl = for (i <- 0 until 4; j <- 0 until 6 if j - i <= 1) yield (i, j)
    assert(values1d(tl(0)) == wantTl.map(_._1.toDouble))
    assert(values1d(tl(1)) == wantTl.map(_._2.toDouble))
    val tu = ArrayRoutines.triuIndices(spark, 4L, k = -1L, m = 6L, chunk = 3)
    val wantTu = for (i <- 0 until 4; j <- 0 until 6 if j - i >= -1) yield (i, j)
    assert(values1d(tu(0)) == wantTu.map(_._1.toDouble))
    assert(values1d(tu(1)) == wantTu.map(_._2.toDouble))
  }

  test("push forward-fills NaN along an axis across chunk boundaries") {
    val v = Seq(Double.NaN, 1.0, Double.NaN, Double.NaN, 4.0, Double.NaN,
      Double.NaN, Double.NaN, 8.0, Double.NaN)
    val a = arr1d(v, 3)
    val got = values1d(ArrayRoutines.push(a, 0))
    val want = Seq(Double.NaN, 1.0, 1.0, 1.0, 4.0, 4.0, 4.0, 4.0, 8.0, 8.0)
    assert(got.head.isNaN, "leading NaN stays NaN")
    assert(got.tail == want.tail)
    // 2-D along axis 0: each column fills independently
    val m = GArr.fromFunction(spark, Seq(5L, 3L), Seq(2, 2))(g =>
      if ((g(0) + g(1)) % 2 == 0) Double.NaN else (g(0) * 3 + g(1)).toDouble)
    val p = ArrayRoutines.push(m, 0)
    val c = cells(p)
    val dense = Array.tabulate(5, 3)((i, j) =>
      if ((i + j) % 2 == 0) Double.NaN else (i * 3 + j).toDouble)
    for (j <- 0 until 3; i <- 1 until 5; if dense(i)(j).isNaN)
      dense(i)(j) = dense(i - 1)(j)
    for (i <- 0 until 5; j <- 0 until 3) {
      val w = dense(i)(j); val g = c(i.toLong * 3 + j)
      assert((w.isNaN && g.isNaN) || w == g, s"push2d($i,$j): $g vs $w")
    }
  }
}
