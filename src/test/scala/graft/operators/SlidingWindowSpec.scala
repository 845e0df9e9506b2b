package graft.operators

import graft.SparkTestBase

/** `sliding_window_view` (array/lib/stride_tricks.py), meshgrid/indices,
  * ravel_multi_index/unravel_index, and apply_over_axes — checked against
  * direct numpy semantics on multi-chunk arrays.
  */
class SlidingWindowSpec extends SparkTestBase {

  private def arr1d(vals: Seq[Double], chunk: Int): GArr = {
    val v = vals.toArray
    GArr.fromFunction(spark, Seq(v.length.toLong), Seq(chunk))(g => v(g(0).toInt))
  }

  private def cells(a: GArr): Map[Long, Double] =
    a.toIndexedDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("sliding window 1-D: w > chunk forces halos across multiple blocks") {
    val v = (0 until 11).map(i => ((i * 13) % 17).toDouble)
    val a = arr1d(v, 3) // chunks 3,3,3,2 — window 4 spans two neighbors
    val sw = a.slidingWindowAxis(0, 4)
    assert(sw.shape == Seq(8L, 4L))
    assert(sw.chunks == Seq(Seq(3, 3, 2), Seq(4)))
    val c = cells(sw)
    for (i <- 0 until 8; q <- 0 until 4)
      assert(c(i * 4L + q) == v(i + q), s"window($i,$q)")
  }

  test("sliding window whole-array window and w=1 degenerate") {
    val v = (1 to 6).map(_.toDouble)
    val a = arr1d(v, 2)
    val whole = a.slidingWindowAxis(0, 6)
    assert(whole.shape == Seq(1L, 6L))
    assert(cells(whole) == (0 until 6).map(q => q.toLong -> v(q)).toMap)
    val unit = a.slidingWindowAxis(0, 1)
    assert(unit.shape == Seq(6L, 1L))
    assert((0 until 6).forall(i => cells(unit)(i) == v(i)))
  }

  test("sliding window along axis 1 of a 2-D array keeps row chunking") {
    val a = GArr.fromFunction(spark, Seq(4L, 7L), Seq(2, 3))(
      g => (g(0) * 7 + g(1)).toDouble)
    val sw = a.slidingWindowAxis(1, 3)
    assert(sw.shape == Seq(4L, 5L, 3L))
    assert(sw.chunks.head == Seq(2, 2)) // rows untouched
    val c = cells(sw)
    for (r <- 0 until 4; i <- 0 until 5; q <- 0 until 3)
      assert(c((r * 5L + i) * 3 + q) == r * 7.0 + i + q, s"($r,$i,$q)")
  }

  test("rolling mean = sliding window + mean over the trailing axis (narrow reduce)") {
    val v = (0 until 10).map(i => (i * i % 9).toDouble)
    val rm = arr1d(v, 4).slidingWindowAxis(0, 3).meanAxis(1)
    val c = cells(rm)
    for (i <- 0 until 8)
      assert(math.abs(c(i) - (v(i) + v(i + 1) + v(i + 2)) / 3.0) < 1e-12, s"mean[$i]")
  }

  test("meshgrid xy and ij over multi-chunk 1-D inputs land on one shared grid") {
    val x = arr1d(Seq(10.0, 20.0, 30.0), 2)
    val y = arr1d(Seq(1.0, 2.0), 1)
    val Seq(gx, gy) = ArrayRoutines.meshgrid(Seq(x, y)) // 'xy': shape (ny, nx)
    assert(gx.shape == Seq(2L, 3L) && gy.shape == Seq(2L, 3L))
    assert(gx.chunks == gy.chunks)
    val cx = cells(gx); val cy = cells(gy)
    for (r <- 0 until 2; c <- 0 until 3) {
      assert(cx(r * 3L + c) == (c + 1) * 10.0, s"X($r,$c)")
      assert(cy(r * 3L + c) == r + 1.0, s"Y($r,$c)")
    }
    val Seq(ix, iy) = ArrayRoutines.meshgrid(Seq(x, y), indexing = "ij") // (nx, ny)
    assert(ix.shape == Seq(3L, 2L) && iy.shape == Seq(3L, 2L))
    for (r <- 0 until 3; c <- 0 until 2) {
      assert(cells(ix)(r * 2L + c) == (r + 1) * 10.0)
      assert(cells(iy)(r * 2L + c) == c + 1.0)
    }
  }

  test("indices(shape) matches np.indices per dimension") {
    val Seq(r0, r1) = ArrayRoutines.indicesArr(spark, Seq(3L, 4L), Seq(2, 3))
    for (i <- 0 until 3; j <- 0 until 4) {
      assert(cells(r0)(i * 4L + j) == i.toDouble)
      assert(cells(r1)(i * 4L + j) == j.toDouble)
    }
  }

  test("unravel_index / ravel_multi_index roundtrip on a multi-chunk index array") {
    val dims = Seq(4L, 5L, 6L)
    val idx = arr1d(Seq(0, 1, 29, 30, 65, 119, 73).map(_.toDouble), 3)
    val coords = ArrayRoutines.unravelIndex(idx, dims)
    val c0 = cells(coords(0)); val c1 = cells(coords(1)); val c2 = cells(coords(2))
    val expect = Seq(0, 1, 29, 30, 65, 119, 73).map { f =>
      (f / 30, f % 30 / 6, f % 6)
    }
    expect.zipWithIndex.foreach { case ((e0, e1, e2), i) =>
      assert(c0(i) == e0.toDouble && c1(i) == e1.toDouble && c2(i) == e2.toDouble, s"[$i]")
    }
    val back = ArrayRoutines.ravelMultiIndex(coords, dims)
    val cb = cells(back)
    Seq(0, 1, 29, 30, 65, 119, 73).zipWithIndex.foreach { case (f, i) =>
      assert(cb(i) == f.toDouble, s"ravel[$i]")
    }
  }

  test("apply_over_axes sums over axes 0 and 2 with kept dims") {
    val a = GArr.fromFunction(spark, Seq(2L, 3L, 4L), Seq(1, 2, 3))(
      g => (g(0) * 12 + g(1) * 4 + g(2)).toDouble)
    val r = ArrayRoutines.applyOverAxes(a, Seq(0, 2))((g, ax) => g.sumAxis(ax))
    assert(r.shape == Seq(1L, 3L, 1L))
    val c = cells(r)
    for (j <- 0 until 3) {
      val expect = (for (i <- 0 until 2; k <- 0 until 4) yield i * 12 + j * 4 + k).sum
      assert(c(j) == expect.toDouble, s"axis1=$j")
    }
  }
}
