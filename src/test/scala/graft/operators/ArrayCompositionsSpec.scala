package graft.operators

import graft.SparkTestBase

/** The numpy composition surface over GArr — vstack/hstack/dstack,
  * tri/diag, repeat/tile, weighted average, kron, apply_along_axis —
  * each cell-exact vs a driver-dense reference.
  */
class ArrayCompositionsSpec extends SparkTestBase {

  private def cells(a: GArr): Map[Long, Double] =
    a.toIndexedDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  private def arr1(xs: Array[Double], chunk: Int): GArr =
    GArr.fromFunction(spark, Seq(xs.length.toLong), Seq(chunk))(g => xs(g(0).toInt))

  private def arr2(xs: Array[Double], rows: Int, cols: Int, c0: Int, c1: Int): GArr =
    GArr.fromFunction(spark, Seq(rows.toLong, cols.toLong), Seq(c0, c1))(
      g => xs((g(0) * cols + g(1)).toInt))

  test("vstack/hstack/dstack follow the numpy promotion rules") {
    val a = arr1(Array(1, 2, 3), 2)
    val b = arr1(Array(4, 5, 6), 2)
    val v = GArr.vstack(Seq(a, b))
    assert(v.shape == Seq(2L, 3L))
    assert(cells(v) == Map(0L -> 1.0, 1L -> 2.0, 2L -> 3.0, 3L -> 4.0, 4L -> 5.0, 5L -> 6.0))
    val h = GArr.hstack(Seq(a, b))
    assert(h.shape == Seq(6L))
    assert(cells(h)(3L) == 4.0)
    val m1 = arr2(Array(1, 2, 3, 4), 2, 2, 1, 2)
    val m2 = arr2(Array(5, 6, 7, 8), 2, 2, 1, 2)
    val h2 = GArr.hstack(Seq(m1, m2))
    assert(h2.shape == Seq(2L, 4L))
    assert(cells(h2)(2L) == 5.0 && cells(h2)(6L) == 7.0)
    val d = GArr.dstack(Seq(m1, m2))
    assert(d.shape == Seq(2L, 2L, 2L))
    assert(cells(d)(0L) == 1.0 && cells(d)(1L) == 5.0 && cells(d)(7L) == 8.0)
  }

  test("tri and diagMatrix") {
    val t = cells(GArr.tri(spark, 4L, 2, k = 0L))
    for (i <- 0 until 4; j <- 0 until 4)
      assert(t(i.toLong * 4 + j) == (if (j <= i) 1.0 else 0.0), s"tri($i,$j)")
    val t1 = cells(GArr.tri(spark, 4L, 3, k = -1L))
    assert(t1(0L) == 0.0 && t1(4L) == 1.0)
    val v = arr1(Array(3, 1, 4, 1, 5), 2)
    val d = GArr.diagMatrix(v)
    assert(d.shape == Seq(5L, 5L))
    val dc = cells(d)
    for (i <- 0 until 5; j <- 0 until 5)
      assert(dc(i.toLong * 5 + j) == (if (i == j) Array(3.0, 1, 4, 1, 5)(i) else 0.0),
        s"diag($i,$j)=${dc(i.toLong * 5 + j)}")
  }

  test("repeatAxis and tileAxis") {
    val a = arr2(Array(1, 2, 3, 4, 5, 6), 2, 3, 1, 2)
    val r = GArr.repeatAxis(a, 1, 2) // each col doubled: 1 1 2 2 3 3 / ...
    assert(r.shape == Seq(2L, 6L))
    val rc = cells(r)
    assert(rc(0L) == 1.0 && rc(1L) == 1.0 && rc(2L) == 2.0 && rc(5L) == 3.0
      && rc(6L) == 4.0 && rc(11L) == 6.0)
    val r0 = GArr.repeatAxis(a, 0, 3)
    assert(r0.shape == Seq(6L, 3L))
    assert(cells(r0)(3L * 3 + 1) == 5.0) // rows 0,0,0,1,1,1
    val ti = GArr.tileAxis(a, 0, 2) // rows 0,1,0,1
    assert(ti.shape == Seq(4L, 3L))
    assert(cells(ti)(2L * 3) == 1.0 && cells(ti)(3L * 3 + 2) == 6.0)
  }

  test("weighted average along an axis") {
    val a = arr2(Array(1, 2, 3, 4, 5, 6), 2, 3, 1, 2)
    val w = arr2(Array(1, 0, 3, 2, 1, 1), 2, 3, 1, 2)
    val av = cells(GArr.average(a, 0, w))
    // col 0: (1*1 + 4*2)/(1+2) = 3 ; col 1: (2*0 + 5*1)/1 = 5 ; col 2: (3*3+6*1)/4
    assert(math.abs(av(0L) - 3.0) < 1e-12)
    assert(math.abs(av(1L) - 5.0) < 1e-12)
    assert(math.abs(av(2L) - 15.0 / 4) < 1e-12)
  }

  test("kron matches the dense Kronecker product") {
    val a = arr2(Array(1, 2, 3, 4), 2, 2, 1, 2)
    val b = arr2(Array(0, 5, 6, 7, 8, 9), 2, 3, 2, 2)
    val k = GArr.kron(a, b, targetChunk = 16)
    assert(k.shape == Seq(4L, 6L))
    val kc = cells(k)
    val ad = Array(Array(1.0, 2.0), Array(3.0, 4.0))
    val bd = Array(Array(0.0, 5.0, 6.0), Array(7.0, 8.0, 9.0))
    for (i <- 0 until 4; j <- 0 until 6) {
      val want = ad(i / 2)(j / 3) * bd(i % 2)(j % 3)
      assert(kc(i.toLong * 6 + j) == want, s"kron($i,$j)=${kc(i.toLong * 6 + j)} vs $want")
    }
  }

  test("applyAlongAxis: 1-D kernel over lanes with axis restore") {
    val a = arr2(Array(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12), 3, 4, 2, 3)
    // kernel: (sum, max) per lane along axis 0 (columns)
    val r = GArr.applyAlongAxis(a, 0, 2)(lane => Array(lane.sum, lane.max))
    assert(r.shape == Seq(2L, 4L))
    val rc = cells(r)
    for (j <- 0 until 4) {
      val lane = Array(a, a).head // readability only
      val col = (0 until 3).map(i => (i * 4 + j + 1).toDouble)
      assert(rc(j.toLong) == col.sum, s"sum col $j")
      assert(rc(4L + j) == col.max, s"max col $j")
    }
    // along the last axis: reverse each row
    val rev = GArr.applyAlongAxis(a, 1, 4)(lane => lane.reverse)
    assert(rev.shape == Seq(3L, 4L))
    assert(cells(rev)(0L) == 4.0 && cells(rev)(11L) == 9.0)
  }
}
