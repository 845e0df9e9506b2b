package graft.operators

import graft.SparkTestBase

/** Chunked-ndarray module (SURVEY §2.11: blockwise/map_blocks/gufunc,
  * slicing, rechunk, reshape, transpose, fft, array shuffle) — every op
  * checked against a driver-local dense reference.
  */
class BlockArraySpec extends SparkTestBase {

  import spark.implicits._

  private def indexed(a: GArr): Map[Long, Double] =
    a.toIndexedDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  /** Dense C-order reference vector for fromFunction(f). */
  private def dense(shape: Seq[Long])(f: Array[Long] => Double): Array[Double] = {
    val n = shape.product.toInt
    val nd = shape.length
    Array.tabulate(n) { i =>
      val g = new Array[Long](nd)
      var rem = i.toLong
      var d = nd - 1
      while (d >= 0) { g(d) = rem % shape(d); rem /= shape(d); d -= 1 }
      f(g)
    }
  }

  private val f2: Array[Long] => Double = g => 1.0 + 7.0 * g(0) + 13.0 * (if (g.length > 1) g(1) else 0L)

  test("fromFunction + toIndexedDF round-trips a 2-D array with uneven chunks") {
    val a = GArr.fromFunction(spark, Seq(7L, 5L), Seq(3, 2))(f2)
    assert(a.grid == Seq(3, 3))
    assert(a.chunks == Seq(Seq(3, 3, 1), Seq(2, 2, 1)))
    val ref = dense(Seq(7L, 5L))(f2)
    val got = indexed(a)
    assert(got.size == 35)
    ref.zipWithIndex.foreach { case (v, i) => assert(got(i.toLong) == v, s"idx $i") }
  }

  test("fromColumn: sorted order, block packing, blockSums") {
    val df = Seq((3, 30.0), (1, 10.0), (2, 20.0), (5, 50.0), (4, 40.0))
      .toDF("k", "v")
    val a = GArr.fromColumn(df, "v", Seq("k"), chunk = 2)
    assert(a.shape == Seq(5L) && a.chunks == Seq(Seq(2, 2, 1)))
    val got = indexed(a)
    assert(got == Map(0L -> 10.0, 1L -> 20.0, 2L -> 30.0, 3L -> 40.0, 4L -> 50.0))
    val bs = a.blockSums.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(bs == Map(0 -> 30.0, 1 -> 70.0, 2 -> 50.0))
  }

  test("mapBlocks / scalarMap / elemwise / reduceAll") {
    val a = GArr.fromFunction(spark, Seq(10L), Seq(3))(g => g(0).toDouble)
    val b = GArr.fromFunction(spark, Seq(10L), Seq(3))(g => 2.0 * g(0))
    val z = a.elemwise(b)(_ * _).scalarMap(_ + 1.0)
    // sum of 2i^2+1 for i=0..9 = 2*285+10
    assert(z.sumAll == 580.0)
    assert(z.numElements == 10L)
    val w = a.mapBlocks((bid, d) => d.map(_ + bid.head * 100.0))
    val got = indexed(w)
    assert(got(0L) == 0.0 && got(3L) == 103.0 && got(9L) == 309.0)
  }

  test("slice 1-D with start/stop/step and uneven destination chunks") {
    val n = 101L
    val a = GArr.fromFunction(spark, Seq(n), Seq(7))(g => g(0) * 3.0)
    val s = a.slice(Seq((5L, 95L, 4L)), targetChunk = 6)
    val expLen = (95L - 5 + 3) / 4 // ceil(90/4) = 23
    assert(s.shape == Seq(expLen))
    val got = indexed(s)
    (0L until expLen).foreach { j =>
      assert(got(j) == (5 + j * 4) * 3.0, s"j=$j")
    }
  }

  test("slice 2-D: both dims restricted, values correct") {
    val a = GArr.fromFunction(spark, Seq(9L, 8L), Seq(4, 3))(f2)
    val s = a.slice(Seq((1L, 8L, 2L), (2L, 8L, 3L)), targetChunk = 5)
    assert(s.shape == Seq(4L, 2L))
    val got = indexed(s)
    for (r <- 0 until 4; c <- 0 until 2) {
      val srcR = 1 + 2 * r; val srcC = 2 + 3 * c
      assert(got((r * 2 + c).toLong) == f2(Array(srcR.toLong, srcC.toLong)), s"($r,$c)")
    }
  }

  test("rechunk preserves every element; new grid structure") {
    val a = GArr.fromFunction(spark, Seq(11L, 6L), Seq(4, 4))(f2)
    val r = a.rechunk(Seq(3, 5))
    assert(r.chunks == Seq(Seq(3, 3, 3, 2), Seq(5, 1)))
    assert(indexed(r) == indexed(a))
  }

  test("reshape 1-D -> 2-D -> 3-D keeps C-order flat identity") {
    val a = GArr.fromFunction(spark, Seq(24L), Seq(5))(g => g(0) * 1.5)
    val b = a.reshape(Seq(4L, 6L), Seq(3, 4))
    assert(indexed(b) == indexed(a))
    val c = b.reshape(Seq(2L, 3L, 4L), Seq(1, 2, 3))
    assert(indexed(c) == indexed(a))
    val back = c.reshape(Seq(24L), Seq(7))
    assert(indexed(back) == indexed(a))
  }

  test("transpose 2-D: narrow block permutation matches dense reference") {
    val a = GArr.fromFunction(spark, Seq(6L, 4L), Seq(4, 3))(f2)
    val t = a.transpose(Seq(1, 0))
    assert(t.shape == Seq(4L, 6L) && t.chunks == Seq(Seq(3, 1), Seq(4, 2)))
    val got = indexed(t)
    for (i <- 0 until 6; j <- 0 until 4)
      assert(got((j * 6 + i).toLong) == f2(Array(i.toLong, j.toLong)), s"($i,$j)")
  }

  test("sumAxis reduces one axis with partial-then-merge") {
    val a = GArr.fromFunction(spark, Seq(6L, 4L), Seq(2, 3))(f2)
    val rows = a.sumAxis(1) // sum over columns -> length 6
    val gotR = indexed(rows)
    for (i <- 0 until 6) {
      val exp = (0 until 4).map(j => f2(Array(i.toLong, j.toLong))).sum
      assert(gotR(i.toLong) == exp, s"row $i")
    }
    val cols = a.sumAxis(0)
    val gotC = indexed(cols)
    for (j <- 0 until 4) {
      val exp = (0 until 6).map(i => f2(Array(i.toLong, j.toLong))).sum
      assert(gotC(j.toLong) == exp, s"col $j")
    }
  }

  test("shuffleAxis: regroup with duplicates and drops, position-exact") {
    val a = GArr.fromFunction(spark, Seq(10L), Seq(4))(g => g(0) * 10.0)
    // group 0: [9,0,0], group 1: [2,4,6] — index 0 duplicated, odd>7 dropped
    val s = a.shuffleAxis(0, Seq(Seq(9L, 0L, 0L), Seq(2L, 4L, 6L)))
    assert(s.shape == Seq(6L) && s.chunks == Seq(Seq(3, 3)))
    val got = indexed(s)
    assert(got == Map(0L -> 90.0, 1L -> 0.0, 2L -> 0.0, 3L -> 20.0, 4L -> 40.0, 5L -> 60.0))
  }

  test("shuffleAxis on axis 0 of a 2-D array moves whole rows") {
    val a = GArr.fromFunction(spark, Seq(5L, 3L), Seq(2, 2))(f2)
    val s = a.shuffleAxis(0, Seq(Seq(4L, 1L), Seq(3L)))
    assert(s.shape == Seq(3L, 3L))
    val got = indexed(s)
    for ((srcRow, dstRow) <- Seq((4, 0), (1, 1), (3, 2)); c <- 0 until 3)
      assert(got((dstRow * 3 + c).toLong) == f2(Array(srcRow.toLong, c.toLong)), s"$srcRow->$dstRow c$c")
  }

  test("applyGufunc (i)->(j): per-row kernel over single-chunk core dim") {
    val a = GArr.fromFunction(spark, Seq(5L, 4L), Seq(2, 4))(f2)
    // kernel: (x0..x3) -> (sum, max)
    val g = a.applyGufunc(2)(row => Array(row.sum, row.max))
    assert(g.shape == Seq(5L, 2L))
    val got = indexed(g)
    for (r <- 0 until 5) {
      val row = (0 until 4).map(j => f2(Array(r.toLong, j.toLong)))
      assert(got((r * 2).toLong) == row.sum && got((r * 2 + 1).toLong) == row.max, s"row $r")
    }
  }

  // ---- FFT -------------------------------------------------------------

  private def naiveDft(x: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    val re = new Array[Double](n); val im = new Array[Double](n)
    for (k <- 0 until n; t <- 0 until n) {
      val ang = -2.0 * math.Pi * k * t / n
      re(k) += x(t) * math.cos(ang)
      im(k) += x(t) * math.sin(ang)
    }
    (re, im)
  }

  test("fftLocal matches naive DFT") {
    val rnd = new scala.util.Random(42)
    val x = Array.fill(64)(rnd.nextDouble() * 10 - 5)
    val re = x.clone(); val im = new Array[Double](64)
    SpectralFft.fftLocal(re, im)
    val (er, ei) = naiveDft(x)
    for (k <- 0 until 64) {
      assert(math.abs(re(k) - er(k)) < 1e-9, s"re k=$k")
      assert(math.abs(im(k) - ei(k)) < 1e-9, s"im k=$k")
    }
  }

  test("fft1d: distributed four-step matches naive DFT across strip shapes") {
    val rnd = new scala.util.Random(7)
    for ((n, chunk, target) <- Seq((256, 32, 64), (128, 128, 16), (64, 7, 8), (4, 1, 2), (2, 2, 4), (1, 1, 4))) {
      val x = Array.fill(n)(rnd.nextDouble() * 4 - 2)
      val a = GArr.fromFunction(spark, Seq(n.toLong), Seq(chunk))(g => x(g(0).toInt))
      val res = SpectralFft.fft1d(a, targetElems = target).collect()
        .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
      assert(res.size == n, s"n=$n bins")
      val (er, ei) = naiveDft(x)
      for (k <- 0 until n) {
        val (gr, gi) = res(k.toLong)
        assert(math.abs(gr - er(k)) < 1e-8, s"n=$n re k=$k: $gr vs ${er(k)}")
        assert(math.abs(gi - ei(k)) < 1e-8, s"n=$n im k=$k: $gi vs ${ei(k)}")
      }
    }
  }

  test("fft1d recovers exact-bin tones: energy only at injected frequencies") {
    val n = 512
    val amps = Map(5 -> 3.0, 37 -> 2.0, 100 -> 1.0)
    val a = GArr.fromFunction(spark, Seq(n.toLong), Seq(64)) { g =>
      amps.map { case (f, amp) => amp * math.cos(2 * math.Pi * f * g(0) / n) }.sum
    }
    val pw = SpectralFft.fft1d(a).collect()
      .map(r => r.getLong(0) -> (math.pow(r.getDouble(1), 2) + math.pow(r.getDouble(2), 2)))
      .toMap
    for (k <- 0 until n) {
      val expected = amps.get(k).orElse(amps.get(n - k))
        .map(amp => math.pow(amp * n / 2.0, 2)).getOrElse(0.0)
      assert(math.abs(pw(k.toLong) - expected) < 1e-6, s"k=$k: ${pw(k.toLong)} vs $expected")
    }
  }
}
