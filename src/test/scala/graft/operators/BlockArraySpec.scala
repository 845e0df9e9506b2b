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

  test("fftLocalAny (Bluestein) matches naive DFT on non-pow2 lengths") {
    val rnd = new scala.util.Random(5)
    for (n <- Seq(3, 5, 6, 12, 17, 81, 96, 100)) {
      val x = Array.fill(n)(rnd.nextDouble() * 6 - 3)
      val re = x.clone(); val im = new Array[Double](n)
      SpectralFft.fftLocalAny(re, im)
      val (er, ei) = naiveDft(x)
      for (k <- 0 until n) {
        assert(math.abs(re(k) - er(k)) < 1e-8, s"n=$n re k=$k")
        assert(math.abs(im(k) - ei(k)) < 1e-8, s"n=$n im k=$k")
      }
    }
  }

  test("fft1d handles arbitrary (non-pow2, prime) lengths distributed") {
    val rnd = new scala.util.Random(13)
    for ((n, chunk, target) <- Seq((96, 10, 16), (100, 7, 25), (60, 60, 8),
                                   (17, 4, 4), (121, 11, 11))) {
      val x = Array.fill(n)(rnd.nextDouble() * 4 - 2)
      val a = GArr.fromFunction(spark, Seq(n.toLong), Seq(chunk))(g => x(g(0).toInt))
      val res = SpectralFft.fft1d(a, targetElems = target).collect()
        .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
      assert(res.size == n, s"n=$n bins")
      val (er, ei) = naiveDft(x)
      for (k <- 0 until n) {
        val (gr, gi) = res(k.toLong)
        assert(math.abs(gr - er(k)) < 1e-7, s"n=$n re k=$k: $gr vs ${er(k)}")
        assert(math.abs(gi - ei(k)) < 1e-7, s"n=$n im k=$k: $gi vs ${ei(k)}")
      }
    }
  }

  test("rfft/fftfreq/rfftfreq/fftshift match numpy semantics") {
    // rfft: bins 0..n/2 of the full transform
    val rnd = new scala.util.Random(3)
    val x = Array.fill(10)(rnd.nextDouble() * 2 - 1)
    val a = GArr.fromFunction(spark, Seq(10L), Seq(4))(g => x(g(0).toInt))
    val rf = SpectralFft.rfft1d(a).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(rf.keySet == (0L to 5L).toSet)
    val (er, ei) = naiveDft(x)
    for (k <- 0 to 5) {
      assert(math.abs(rf(k.toLong)._1 - er(k)) < 1e-9 &&
             math.abs(rf(k.toLong)._2 - ei(k)) < 1e-9, s"k=$k")
    }
    // fftfreq(8, d=0.5) = [0, .25, .5, .75, -1, -.75, -.5, -.25]
    val ff = indexed(SpectralFft.fftfreq(spark, 8L, 0.5, chunk = 3))
    assert((0 until 8).map(i => ff(i.toLong)) ==
      Seq(0.0, 0.25, 0.5, 0.75, -1.0, -0.75, -0.5, -0.25))
    // odd n: fftfreq(5) = [0, .2, .4, -.4, -.2]
    val f5 = indexed(SpectralFft.fftfreq(spark, 5L, 1.0, chunk = 2))
    assert((0 until 5).map(i => f5(i.toLong)) == Seq(0.0, 0.2, 0.4, -0.4, -0.2))
    // rfftfreq(8, d=0.5) = [0, .25, .5, .75, 1]
    val rff = indexed(SpectralFft.rfftfreq(spark, 8L, 0.5, chunk = 2))
    assert((0 until 5).map(i => rff(i.toLong)) == Seq(0.0, 0.25, 0.5, 0.75, 1.0))
    // fftshift/ifftshift invert each other; shift of fftfreq is monotonic
    val sh = indexed(SpectralFft.fftshift(SpectralFft.fftfreq(spark, 8L, 0.5, chunk = 3)))
    assert((0 until 8).map(i => sh(i.toLong)) ==
      Seq(-1.0, -0.75, -0.5, -0.25, 0.0, 0.25, 0.5, 0.75))
    val round = SpectralFft.ifftshift(SpectralFft.fftshift(a))
    assert(indexed(round) == indexed(a))
    // odd-length shift matches numpy (floor(n/2) roll)
    val sh5 = indexed(SpectralFft.fftshift(SpectralFft.fftfreq(spark, 5L, 1.0, chunk = 2)))
    assert((0 until 5).map(i => sh5(i.toLong)) == Seq(-0.4, -0.2, 0.0, 0.2, 0.4))
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

  test("matmul: blocked product matches dense reference across chunkings") {
    val p = 7L; val q = 9L; val r = 5L
    val fa: Array[Long] => Double = g => (g(0) * 3 + g(1) * 2 - 4).toDouble
    val fb: Array[Long] => Double = g => (g(0) - 2 * g(1) + 1).toDouble
    val denseC = Array.tabulate((p * r).toInt) { idx =>
      val i = idx / r.toInt; val j = idx % r.toInt
      (0 until q.toInt).map(k => fa(Array(i, k)) * fb(Array(k.toLong, j))).sum
    }
    for ((ca, cb, cc) <- Seq((3, 4, 2), (7, 9, 5), (2, 2, 2), (1, 1, 1))) {
      val a = GArr.fromFunction(spark, Seq(p, q), Seq(ca, cb))(fa)
      val b = GArr.fromFunction(spark, Seq(q, r), Seq(cb, cc))(fb)
      val c = a.matmul(b)
      assert(c.shape == Seq(p, r) && c.chunks == Seq(a.chunks.head, b.chunks(1)))
      val got = indexed(c)
      assert(got.size == (p * r).toInt, s"chunks ($ca,$cb,$cc)")
      denseC.zipWithIndex.foreach { case (v, i) =>
        assert(got(i.toLong) == v, s"chunks ($ca,$cb,$cc) idx $i: ${got(i.toLong)} vs $v")
      }
    }
    val a = GArr.fromFunction(spark, Seq(p, q), Seq(3, 4))(fa)
    val bBad = GArr.fromFunction(spark, Seq(q, r), Seq(5, 2))(fb)
    intercept[IllegalArgumentException](a.matmul(bBad))
  }

  test("min/max/mean/var/argmin/argmax along an axis match dense references") {
    val sh = Seq(6L, 8L)
    val rnd = new scala.util.Random(11)
    val vals = Array.fill(48)(math.floor(rnd.nextDouble() * 19) - 9)
    val f: Array[Long] => Double = g => vals((g(0) * 8 + g(1)).toInt)
    for (axis <- Seq(0, 1); (c0, c1) <- Seq((2, 3), (6, 8), (1, 1))) {
      val a = GArr.fromFunction(spark, sh, Seq(c0, c1))(f)
      val keep = if (axis == 0) 8 else 6
      val red = if (axis == 0) 6 else 8
      def lane(k: Int): Seq[Double] =
        (0 until red).map(i => if (axis == 0) f(Array(i, k)) else f(Array(k, i)))
      def check(got: GArr, expect: Int => Double, tag: String): Unit = {
        val m = indexed(got)
        assert(got.shape == Seq(keep.toLong), s"$tag shape")
        (0 until keep).foreach { k =>
          assert(math.abs(m(k.toLong) - expect(k)) < 1e-12,
            s"$tag axis=$axis chunks=($c0,$c1) k=$k: ${m(k.toLong)} vs ${expect(k)}")
        }
      }
      check(a.minAxis(axis), k => lane(k).min, "min")
      check(a.maxAxis(axis), k => lane(k).max, "max")
      check(a.meanAxis(axis), k => lane(k).sum / red, "mean")
      check(a.varAxis(axis), { k =>
        val l = lane(k); val m = l.sum / red
        l.map(x => (x - m) * (x - m)).sum / red
      }, "var")
      check(a.varAxis(axis, ddof = 1), { k =>
        val l = lane(k); val m = l.sum / red
        l.map(x => (x - m) * (x - m)).sum / (red - 1)
      }, "var1")
      check(a.argminAxis(axis), k => lane(k).zipWithIndex.minBy(_._1)._2.toDouble, "argmin")
      check(a.argmaxAxis(axis), k => lane(k).zipWithIndex.maxBy(_._1)._2.toDouble, "argmax")
    }
  }

  test("argmin/argmax: first occurrence wins ties across chunk boundaries; NaN wins") {
    // lane 0: tie of 1.0 at coords 1 and 5 (different chunks) -> 1
    // lane 1: NaN at coord 3 -> 3 (numpy semantics)
    val grid = Array(
      5.0, 7.0,
      1.0, 2.0,
      3.0, 4.0,
      2.0, Double.NaN,
      4.0, 0.0,
      1.0, 6.0)
    val a = GArr.fromFunction(spark, Seq(6L, 2L), Seq(2, 2))(g => grid((g(0) * 2 + g(1)).toInt))
    val mn = indexed(a.argminAxis(0))
    assert(mn(0L) == 1.0 && mn(1L) == 3.0)
    val mx = indexed(a.argmaxAxis(0))
    assert(mx(0L) == 0.0 && mx(1L) == 3.0)
  }

  test("concatenate and stack relabel blocks without reshuffling data") {
    val a = GArr.fromFunction(spark, Seq(3L, 4L), Seq(2, 3))(g => (g(0) * 10 + g(1)).toDouble)
    val b = GArr.fromFunction(spark, Seq(2L, 4L), Seq(2, 3))(g => (100 + g(0) * 10 + g(1)).toDouble)
    val c = GArr.concatenate(0, Seq(a, b))
    assert(c.shape == Seq(5L, 4L) && c.chunks.head == Seq(2, 1, 2))
    val got = indexed(c)
    for (i <- 0 until 5; j <- 0 until 4) {
      val exp = if (i < 3) i * 10 + j else 100 + (i - 3) * 10 + j
      assert(got((i * 4 + j).toLong) == exp.toDouble, s"($i,$j)")
    }
    val st = GArr.stack(Seq(a, a.scalarMap(_ + 1000.0)))
    assert(st.shape == Seq(2L, 3L, 4L))
    val gs = indexed(st)
    for (i <- 0 until 3; j <- 0 until 4) {
      assert(gs((i * 4 + j).toLong) == (i * 10 + j).toDouble)
      assert(gs((12 + i * 4 + j).toLong) == (1000 + i * 10 + j).toDouble)
    }
    intercept[IllegalArgumentException](
      GArr.concatenate(0, Seq(a, GArr.fromFunction(spark, Seq(2L, 4L), Seq(2, 2))(_ => 0.0))))
  }

  test("cumsumAxis: two-phase scan matches dense prefix sums on both axes") {
    val sh = Seq(7L, 5L)
    val f: Array[Long] => Double = g => (g(0) * 2 - g(1) * 3 + 1).toDouble
    for (axis <- Seq(0, 1); (c0, c1) <- Seq((3, 2), (7, 5), (1, 1), (2, 5))) {
      val a = GArr.fromFunction(spark, sh, Seq(c0, c1))(f)
      val got = indexed(a.cumsumAxis(axis))
      assert(got.size == 35)
      for (i <- 0 until 7; j <- 0 until 5) {
        val exp =
          if (axis == 0) (0 to i).map(k => f(Array(k, j))).sum
          else (0 to j).map(k => f(Array(i, k))).sum
        assert(got((i * 5 + j).toLong) == exp,
          s"axis=$axis chunks=($c0,$c1) ($i,$j): ${got((i * 5 + j).toLong)} vs $exp")
      }
    }
    // 1-D
    val v = GArr.fromFunction(spark, Seq(11L), Seq(3))(g => (g(0) + 1).toDouble)
    val gv = indexed(v.cumsumAxis(0))
    (0 until 11).foreach(i => assert(gv(i.toLong) == (i + 1) * (i + 2) / 2.0))
  }

  test("mapOverlapAxis: halo exchange gives each block its neighbor planes") {
    // kernel: centered sum of up to depth=2 neighbors along the axis;
    // edges see truncated windows (boundary='none' trim semantics)
    val n = 13
    val xs = Array.tabulate(n)(i => (i * i % 7 + 1).toDouble)
    def expect(i: Int): Double =
      (math.max(0, i - 2) to math.min(n - 1, i + 2)).map(xs).sum
    for (chunk <- Seq(3, 5, 13, 1)) {
      val a = GArr.fromFunction(spark, Seq(n.toLong), Seq(chunk))(g => xs(g(0).toInt))
      val sm = a.mapOverlapAxis(0, 2) { (halo, before, after, hdims) =>
        val len = hdims(0) - before - after
        Array.tabulate(len) { c =>
          val center = before + c
          (math.max(0, center - 2) to math.min(hdims(0) - 1, center + 2))
            .map(halo).sum
        }
      }
      val got = indexed(sm)
      (0 until n).foreach { i =>
        assert(got(i.toLong) == expect(i), s"chunk=$chunk i=$i: ${got(i.toLong)} vs ${expect(i)}")
      }
    }
    // 2-D: vertical (axis 0) 3-point sum, all columns present in halos
    val g2 = GArr.fromFunction(spark, Seq(6L, 4L), Seq(2, 3))(g => (g(0) * 10 + g(1)).toDouble)
    val sm2 = g2.mapOverlapAxis(0, 1) { (halo, before, after, hdims) =>
      val rows = hdims(0) - before - after
      val cols = hdims(1)
      Array.tabulate(rows * cols) { idx =>
        val r = before + idx / cols; val c = idx % cols
        (math.max(0, r - 1) to math.min(hdims(0) - 1, r + 1))
          .map(rr => halo(rr * cols + c)).sum
      }
    }
    val got2 = indexed(sm2)
    for (i <- 0 until 6; j <- 0 until 4) {
      val exp = (math.max(0, i - 1) to math.min(5, i + 1)).map(r => r * 10 + j).sum.toDouble
      assert(got2((i * 4 + j).toLong) == exp, s"($i,$j)")
    }
  }

  test("cumprod/cummax/cummin: generalized scan matches dense references") {
    val sh = Seq(6L, 5L)
    val rnd = new scala.util.Random(23)
    val vals = Array.fill(30)(math.floor(rnd.nextDouble() * 5) - 2) // in -2..2
    val f: Array[Long] => Double = g => vals((g(0) * 5 + g(1)).toInt)
    for (axis <- Seq(0, 1); (c0, c1) <- Seq((2, 2), (6, 5), (1, 3))) {
      val a = GArr.fromFunction(spark, sh, Seq(c0, c1))(f)
      def lanePrefix(op: (Double, Double) => Double): Map[Long, Double] = {
        (for (i <- 0 until 6; j <- 0 until 5) yield {
          val lane = if (axis == 0) (0 to i).map(k => f(Array(k, j)))
                     else (0 to j).map(k => f(Array(i, k)))
          (i * 5 + j).toLong -> lane.reduce(op)
        }).toMap
      }
      assert(indexed(a.cumprodAxis(axis)) == lanePrefix(_ * _),
        s"cumprod axis=$axis chunks=($c0,$c1)")
      assert(indexed(a.cummaxAxis(axis)) == lanePrefix(math.max),
        s"cummax axis=$axis chunks=($c0,$c1)")
      assert(indexed(a.cumminAxis(axis)) == lanePrefix(math.min),
        s"cummin axis=$axis chunks=($c0,$c1)")
    }
    // NaN propagation (np.maximum.accumulate): once NaN, stays NaN
    val withNan = GArr.fromFunction(spark, Seq(6L), Seq(2))(g =>
      if (g(0) == 2L) Double.NaN else g(0).toDouble)
    val cm = indexed(withNan.cummaxAxis(0))
    assert(cm(0L) == 0.0 && cm(1L) == 1.0)
    (2 until 6).foreach(i => assert(cm(i.toLong).isNaN, s"i=$i"))
  }

  test("prod/any/all/countNonzero along an axis") {
    val grid = Array(
      2.0, 0.0, 1.0,
      3.0, 4.0, 1.0,
      1.0, 0.0, 1.0,
      -1.0, 2.0, 1.0)
    val a = GArr.fromFunction(spark, Seq(4L, 3L), Seq(2, 2))(g => grid((g(0) * 3 + g(1)).toInt))
    assert(indexed(a.prodAxis(0)) == Map(0L -> -6.0, 1L -> 0.0, 2L -> 1.0))
    assert(indexed(a.anyAxis(0)) == Map(0L -> 1.0, 1L -> 1.0, 2L -> 1.0))
    assert(indexed(a.allAxis(0)) == Map(0L -> 1.0, 1L -> 0.0, 2L -> 1.0))
    assert(indexed(a.countNonzeroAxis(0)) == Map(0L -> 4.0, 1L -> 2.0, 2L -> 4.0))
    assert(indexed(a.anyAxis(1)) == Map(0L -> 1.0, 1L -> 1.0, 2L -> 1.0, 3L -> 1.0))
    assert(indexed(a.allAxis(1)) == Map(0L -> 0.0, 1L -> 1.0, 2L -> 0.0, 3L -> 1.0))
    // NaN is truthy for any/all (numpy semantics)
    val n = GArr.fromFunction(spark, Seq(2L), Seq(1))(g => if (g(0) == 0) Double.NaN else 0.0)
    assert(indexed(n.anyAxis(0)) == Map(0L -> 1.0))
  }

  test("nan-reduction family skips NaN and detects all-NaN lanes") {
    // col 0: plain values; col 1: mixed with NaN; col 2: all NaN
    val grid = Array(
      1.0, Double.NaN, Double.NaN,
      2.0, 5.0,        Double.NaN,
      3.0, Double.NaN, Double.NaN,
      4.0, 7.0,        Double.NaN)
    val a = GArr.fromFunction(spark, Seq(4L, 3L), Seq(2, 2))(g => grid((g(0) * 3 + g(1)).toInt))
    val ns = indexed(a.nansumAxis(0))
    assert(ns(0L) == 10.0 && ns(1L) == 12.0 && ns(2L) == 0.0) // numpy nansum all-NaN -> 0
    val nm = indexed(a.nanmeanAxis(0))
    assert(nm(0L) == 2.5 && nm(1L) == 6.0 && nm(2L).isNaN)
    val mn = indexed(a.nanminAxis(0))
    assert(mn(0L) == 1.0 && mn(1L) == 5.0 && mn(2L).isNaN)
    val mx = indexed(a.nanmaxAxis(0))
    assert(mx(0L) == 4.0 && mx(1L) == 7.0 && mx(2L).isNaN)
    val nv = indexed(a.nanvarAxis(0))
    assert(nv(0L) == 1.25 && nv(1L) == 1.0 && nv(2L).isNaN)
    val nv1 = indexed(a.nanvarAxis(0, ddof = 1))
    assert(math.abs(nv1(0L) - 5.0 / 3) < 1e-12 && nv1(1L) == 2.0 && nv1(2L).isNaN)
  }

  test("topkAxis: k largest (desc) / smallest (asc) per lane, any chunking") {
    val rnd = new scala.util.Random(31)
    val vals = Array.fill(40)(math.floor(rnd.nextDouble() * 100))
    val f: Array[Long] => Double = g => vals((g(0) * 5 + g(1)).toInt)
    for ((c0, c1) <- Seq((3, 2), (8, 5), (1, 1))) {
      val a = GArr.fromFunction(spark, Seq(8L, 5L), Seq(c0, c1))(f)
      val top3 = a.topkAxis(0, 3)
      assert(top3.shape == Seq(3L, 5L))
      val got = indexed(top3)
      for (j <- 0 until 5) {
        val lane = (0 until 8).map(i => f(Array(i, j))).sorted.reverse.take(3)
        for (r <- 0 until 3)
          assert(got((r * 5 + j).toLong) == lane(r), s"chunks($c0,$c1) col $j rank $r")
      }
      val bot2 = a.topkAxis(1, -2)
      assert(bot2.shape == Seq(8L, 2L))
      val gb = indexed(bot2)
      for (i <- 0 until 8) {
        val lane = (0 until 5).map(j => f(Array(i, j))).sorted.take(2)
        for (r <- 0 until 2)
          assert(gb((i * 2 + r).toLong) == lane(r), s"chunks($c0,$c1) row $i rank $r")
      }
    }
    // k > n clamps
    val v = GArr.fromFunction(spark, Seq(3L), Seq(2))(g => g(0).toDouble)
    assert(indexed(v.topkAxis(0, 10)) == Map(0L -> 2.0, 1L -> 1.0, 2L -> 0.0))
  }

  test("diffAxis and gradientAxis match numpy semantics") {
    val xs = Array(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0)
    for (chunk <- Seq(3, 8, 1)) {
      val a = GArr.fromFunction(spark, Seq(8L), Seq(chunk))(g => xs(g(0).toInt))
      val d = indexed(a.diffAxis(0))
      assert(d.size == 7)
      (0 until 7).foreach(i => assert(d(i.toLong) == xs(i + 1) - xs(i), s"chunk=$chunk diff i=$i"))
      val gr = indexed(a.gradientAxis(0))
      assert(gr(0L) == xs(1) - xs(0) && gr(7L) == xs(7) - xs(6))
      (1 until 7).foreach(i =>
        assert(gr(i.toLong) == (xs(i + 1) - xs(i - 1)) / 2.0, s"chunk=$chunk grad i=$i"))
    }
    // 2-D along axis 1
    val g2 = GArr.fromFunction(spark, Seq(3L, 6L), Seq(2, 2))(g => (g(0) * g(1) * g(1)).toDouble)
    val d2 = indexed(g2.diffAxis(1))
    for (i <- 0 until 3; j <- 0 until 5)
      assert(d2((i * 5 + j).toLong) == (i * (j + 1) * (j + 1) - i * j * j).toDouble, s"($i,$j)")
  }

  test("flipAxis: zero-shuffle reversal on both axes of an uneven grid") {
    val a = GArr.fromFunction(spark, Seq(5L, 4L), Seq(2, 3))(f2)
    val f0 = indexed(a.flipAxis(0))
    for (i <- 0 until 5; j <- 0 until 4)
      assert(f0((i * 4 + j).toLong) == f2(Array((4 - i).toLong, j.toLong)), s"flip0 ($i,$j)")
    val f1 = indexed(a.flipAxis(1))
    for (i <- 0 until 5; j <- 0 until 4)
      assert(f1((i * 4 + j).toLong) == f2(Array(i.toLong, (3 - j).toLong)), s"flip1 ($i,$j)")
    // double flip = identity
    assert(indexed(a.flipAxis(0).flipAxis(0)) == indexed(a))
  }

  test("rollAxis: circular shift incl. negative and > n shifts") {
    val xs = Array.tabulate(7)(i => (i * 11 % 5).toDouble)
    val a = GArr.fromFunction(spark, Seq(7L), Seq(3))(g => xs(g(0).toInt))
    for (shift <- Seq(0L, 2L, -3L, 9L, 7L)) {
      val got = indexed(a.rollAxis(0, shift))
      (0 until 7).foreach { i =>
        val src = (((i - shift) % 7) + 7) % 7
        assert(got(i.toLong) == xs(src.toInt), s"shift=$shift i=$i")
      }
    }
    // 2-D roll along axis 1 moves whole columns
    val g2 = GArr.fromFunction(spark, Seq(3L, 5L), Seq(2, 2))(g => (g(0) * 10 + g(1)).toDouble)
    val r2 = indexed(g2.rollAxis(1, 2))
    for (i <- 0 until 3; j <- 0 until 5)
      assert(r2((i * 5 + j).toLong) == (i * 10 + (((j - 2) % 5) + 5) % 5).toDouble, s"($i,$j)")
  }

  test("padAxis: constant pads on either side; squeeze/expandDims relabel") {
    val a = GArr.fromFunction(spark, Seq(3L, 4L), Seq(2, 3))(g => (g(0) * 10 + g(1) + 1).toDouble)
    val p = a.padAxis(0, 2, 1, value = -5.0)
    assert(p.shape == Seq(6L, 4L))
    val got = indexed(p)
    for (i <- 0 until 6; j <- 0 until 4) {
      val exp = if (i < 2 || i == 5) -5.0 else ((i - 2) * 10 + j + 1).toDouble
      assert(got((i * 4 + j).toLong) == exp, s"($i,$j)")
    }
    val e = a.expandDims(1)
    assert(e.shape == Seq(3L, 1L, 4L) && e.chunks(1) == Seq(1))
    assert(indexed(e) == indexed(a))
    assert(e.squeeze(1).shape == Seq(3L, 4L))
    assert(indexed(e.squeeze(1)) == indexed(a))
    intercept[IllegalArgumentException](a.squeeze(0))
  }

  test("fromColumns: 2-D bridge packs rows x columns in total order") {
    val df = Seq((3, 30.0, 1.0), (1, 10.0, 4.0), (2, 20.0, 9.0), (5, 50.0, 25.0), (4, 40.0, 16.0))
      .toDF("k", "v", "w")
    val a = GArr.fromColumns(df, Seq("v", "w"), Seq("k"), chunk = 2)
    assert(a.shape == Seq(5L, 2L) && a.chunks == Seq(Seq(2, 2, 1), Seq(2)))
    val got = indexed(a)
    val expV = Seq(10.0, 20.0, 30.0, 40.0, 50.0)
    val expW = Seq(4.0, 9.0, 1.0, 16.0, 25.0)
    for (i <- 0 until 5) {
      assert(got((i * 2).toLong) == expV(i), s"row $i col v")
      assert(got((i * 2 + 1).toLong) == expW(i), s"row $i col w")
    }
    // composes with axis ops: per-column sums
    val s = indexed(a.sumAxis(0))
    assert(s == Map(0L -> 150.0, 1L -> 55.0))
  }

  test("tensordot: arbitrary axis pairs match dense contraction") {
    // A: (3,4,5), B: (4,2,5); contract A axes (1,2) with B axes (0,2) -> (3,2)
    val fa: Array[Long] => Double = g => (g(0) + 2 * g(1) - g(2) + 1).toDouble
    val fb: Array[Long] => Double = g => (3 * g(0) - g(1) + g(2)).toDouble
    val a = GArr.fromFunction(spark, Seq(3L, 4L, 5L), Seq(2, 3, 2))(fa)
    val b = GArr.fromFunction(spark, Seq(4L, 2L, 5L), Seq(3, 1, 4))(fb)
    val c = a.tensordot(b, Seq(1, 2), Seq(0, 2), targetChunk = 16)
    assert(c.shape == Seq(3L, 2L))
    val got = indexed(c)
    for (i <- 0 until 3; j <- 0 until 2) {
      val exp = (for (p <- 0 until 4; q <- 0 until 5)
        yield fa(Array(i, p, q)) * fb(Array(p.toLong, j, q))).sum
      assert(got((i * 2 + j).toLong) == exp, s"($i,$j)")
    }
    // full contraction -> scalar as length-1 array
    val v1 = GArr.fromFunction(spark, Seq(6L), Seq(2))(g => (g(0) + 1).toDouble)
    val v2 = GArr.fromFunction(spark, Seq(6L), Seq(3))(g => (2 * g(0)).toDouble)
    val sc = v1.tensordot(v2, Seq(0), Seq(0))
    assert(sc.shape == Seq(1L))
    val expDot = (0 until 6).map(i => (i + 1.0) * (2.0 * i)).sum
    assert(indexed(sc)(0L) == expDot)
    // dot() on mismatched chunk grids regrids internally
    assert(v1.dot(v2) == expDot)
  }

  test("creation suite: zeros/ones/full/arange/linspace/eye") {
    assert(GArr.zeros(spark, Seq(3L, 3L), Seq(2, 2)).sumAll == 0.0)
    assert(GArr.ones(spark, Seq(3L, 3L), Seq(2, 2)).sumAll == 9.0)
    assert(GArr.full(spark, Seq(4L), Seq(3), 2.5).sumAll == 10.0)
    val ar = indexed(GArr.arange(spark, 3.0, 12.0, 2.5, chunk = 2))
    assert(ar == Map(0L -> 3.0, 1L -> 5.5, 2L -> 8.0, 3L -> 10.5))
    val ls = indexed(GArr.linspace(spark, 0.0, 1.0, 5, chunk = 2))
    assert(ls == Map(0L -> 0.0, 1L -> 0.25, 2L -> 0.5, 3L -> 0.75, 4L -> 1.0))
    val ey = indexed(GArr.eye(spark, 4L, chunk = 3))
    for (i <- 0 until 4; j <- 0 until 4)
      assert(ey((i * 4 + j).toLong) == (if (i == j) 1.0 else 0.0), s"($i,$j)")
    val ey1 = indexed(GArr.eye(spark, 4L, chunk = 2, k = 1))
    for (i <- 0 until 4; j <- 0 until 4)
      assert(ey1((i * 4 + j).toLong) == (if (j - i == 1) 1.0 else 0.0), s"k=1 ($i,$j)")
  }

  test("tril/triu zero the correct halves using global coordinates") {
    val a = GArr.fromFunction(spark, Seq(5L, 5L), Seq(2, 3))(g => (g(0) * 5 + g(1) + 1).toDouble)
    val lo = indexed(a.tril())
    val hi = indexed(a.triu())
    val lo1 = indexed(a.tril(k = -1))
    for (i <- 0 until 5; j <- 0 until 5) {
      val v = (i * 5 + j + 1).toDouble
      assert(lo((i * 5 + j).toLong) == (if (j <= i) v else 0.0), s"tril ($i,$j)")
      assert(hi((i * 5 + j).toLong) == (if (j >= i) v else 0.0), s"triu ($i,$j)")
      assert(lo1((i * 5 + j).toLong) == (if (j <= i - 1) v else 0.0), s"tril-1 ($i,$j)")
    }
    // tril(0) + triu(1) partitions the matrix exactly
    val sum = a.tril().elemwise(a.triu(k = 1))(_ + _)
    assert(indexed(sum) == indexed(a))
  }

  test("stdAxis / nanstdAxis / ptpAxis wrappers") {
    val grid = Array(
      1.0, Double.NaN,
      5.0, 3.0,
      3.0, 7.0)
    val a = GArr.fromFunction(spark, Seq(3L, 2L), Seq(2, 1))(g => grid((g(0) * 2 + g(1)).toInt))
    val sd = indexed(a.stdAxis(0))
    // col 0: var of (1,5,3) ddof=0 = 8/3
    assert(math.abs(sd(0L) - math.sqrt(8.0 / 3)) < 1e-12)
    assert(sd(1L).isNaN) // NaN propagates through plain var
    val nsd = indexed(a.nanstdAxis(0, ddof = 1))
    // col 1 non-NaN: (3,7) sample std = sqrt(8)
    assert(math.abs(nsd(1L) - math.sqrt(8.0)) < 1e-12)
    val ptp = indexed(a.ptpAxis(0))
    assert(ptp(0L) == 4.0 && ptp(1L).isNaN)
  }

  test("coarsen: block-reduce downsampling matches dense reference") {
    // (6,8) grid, factors (2,4) -> (3,2); sum and max reductions
    val f: Array[Long] => Double = g => (g(0) * 8 + g(1)).toDouble
    val a = GArr.fromFunction(spark, Seq(6L, 8L), Seq(2, 4))(f)
    val cs = indexed(a.coarsen(Seq(2, 4))(_ + _))
    val cm = indexed(a.coarsen(Seq(2, 4))(math.max))
    for (r <- 0 until 3; c <- 0 until 2) {
      val cells = for (i <- 0 until 2; j <- 0 until 4)
        yield f(Array(r * 2 + i, c * 4 + j))
      assert(cs((r * 2 + c).toLong) == cells.sum, s"sum ($r,$c)")
      assert(cm((r * 2 + c).toLong) == cells.max, s"max ($r,$c)")
    }
    // indivisible chunks are rejected (dask's contract)
    val odd = GArr.fromFunction(spark, Seq(6L, 8L), Seq(3, 4))(f)
    intercept[IllegalArgumentException](odd.coarsen(Seq(2, 4))(_ + _))
    // but rechunking first makes it legal
    assert(indexed(odd.rechunk(Seq(2, 4)).coarsen(Seq(2, 4))(_ + _)) == cs)
    // factor 1 along an axis is identity there
    assert(indexed(a.coarsen(Seq(1, 1))(_ + _)) == indexed(a))
  }

  test("where: three-way blockwise select with numpy truthiness") {
    val a = GArr.fromFunction(spark, Seq(3L, 4L), Seq(2, 3))(g => (g(0) * 4 + g(1)).toDouble)
    val b = a.scalarMap(v => -v)
    val cond = GArr.fromFunction(spark, Seq(3L, 4L), Seq(2, 3))(g =>
      if ((g(0) + g(1)) % 2 == 0) 1.0 else 0.0)
    val got = indexed(a.where(cond, b))
    for (i <- 0 until 3; j <- 0 until 4) {
      val v = (i * 4 + j).toDouble
      val exp = if ((i + j) % 2 == 0) v else -v
      assert(got((i * 4 + j).toLong) == exp, s"($i,$j)")
    }
    // NaN condition is truthy (numpy semantics)
    val nanCond = GArr.fromFunction(spark, Seq(3L, 4L), Seq(2, 3))(_ => Double.NaN)
    assert(indexed(a.where(nanCond, b)) == indexed(a))
    intercept[IllegalArgumentException](
      a.where(GArr.fromFunction(spark, Seq(3L, 4L), Seq(3, 2))(_ => 1.0), b))
  }

  test("persist/unpersist: cached grid serves multiple consumers identically") {
    val a = GArr.fromFunction(spark, Seq(6L, 4L), Seq(2, 3))(f2).persist()
    try {
      assert(indexed(a.sumAxis(0)) == indexed(a.sumAxis(0)))
      val viaCache = indexed(a.cumsumAxis(1))
      val fresh = indexed(GArr.fromFunction(spark, Seq(6L, 4L), Seq(2, 3))(f2).cumsumAxis(1))
      assert(viaCache == fresh)
    } finally a.unpersist(): Unit
  }

  test("padEdgeAxis / padReflectAxis replicate numpy pad modes") {
    val xs = Array(3.0, 1.0, 4.0, 1.0, 5.0)
    val a = GArr.fromFunction(spark, Seq(5L), Seq(2))(g => xs(g(0).toInt))
    // edge: [3,3,3,1,4,1,5,5]
    val e = indexed(a.padEdgeAxis(0, 2, 1))
    assert((0 until 8).map(i => e(i.toLong)) == Seq(3.0, 3.0, 3.0, 1.0, 4.0, 1.0, 5.0, 5.0))
    // reflect: numpy pad([3,1,4,1,5],(2,2),'reflect') = [4,1,3,1,4,1,5,1,4]
    val r = indexed(a.padReflectAxis(0, 2, 2))
    assert((0 until 9).map(i => r(i.toLong)) == Seq(4.0, 1.0, 3.0, 1.0, 4.0, 1.0, 5.0, 1.0, 4.0))
    // 2-D along axis 0 keeps whole rows
    val g2 = GArr.fromFunction(spark, Seq(3L, 4L), Seq(2, 3))(g => (g(0) * 10 + g(1)).toDouble)
    val ge = indexed(g2.padEdgeAxis(0, 1, 1))
    for (j <- 0 until 4) {
      assert(ge(j.toLong) == j.toDouble, s"top edge col $j")
      assert(ge((4 * 4 + j).toLong) == (20 + j).toDouble, s"bottom edge col $j")
    }
    val gr = indexed(g2.padReflectAxis(0, 1, 1))
    for (j <- 0 until 4) {
      assert(gr(j.toLong) == (10 + j).toDouble, s"top reflect col $j")
      assert(gr((4 * 4 + j).toLong) == (10 + j).toDouble, s"bottom reflect col $j")
    }
    intercept[IllegalArgumentException](a.padReflectAxis(0, 5, 0))
  }

  test("broadcastAxis replicates a unit axis with correct C-order tiling") {
    val a = GArr.fromFunction(spark, Seq(3L, 4L), Seq(2, 3))(g => (g(0) * 10 + g(1)).toDouble)
    // middle axis: (3,1,4) -> (3,5,4)
    val b = a.expandDims(1).broadcastAxis(1, 5L, chunk = 2)
    assert(b.shape == Seq(3L, 5L, 4L) && b.chunks(1) == Seq(2, 2, 1))
    val got = indexed(b)
    for (i <- 0 until 3; r <- 0 until 5; j <- 0 until 4)
      assert(got((i * 20 + r * 4 + j).toLong) == (i * 10 + j).toDouble, s"($i,$r,$j)")
    // leading axis
    val l = a.expandDims(0).broadcastAxis(0, 3L, chunk = 2)
    assert(l.shape == Seq(3L, 3L, 4L))
    val gl = indexed(l)
    for (rep <- 0 until 3; i <- 0 until 3; j <- 0 until 4)
      assert(gl((rep * 12 + i * 4 + j).toLong) == (i * 10 + j).toDouble, s"($rep,$i,$j)")
  }
}
