package graft.operators

import graft.SparkTestBase

/** The `dask/array/fft.py` transform surface — fft/ifft/fft2/fftn,
  * rfft/irfft, hfft/ihfft, and the distributed complex four-step —
  * checked against direct O(n²) DFTs on multi-chunk arrays.
  */
class ComplexFftSpec extends SparkTestBase {

  private def arr1d(vals: Seq[Double], chunk: Int): GArr = {
    val v = vals.toArray
    GArr.fromFunction(spark, Seq(v.length.toLong), Seq(chunk))(g => v(g(0).toInt))
  }

  private def arr2d(rows: Seq[Seq[Double]], cr: Int, cc: Int): GArr = {
    val v = rows.map(_.toArray).toArray
    GArr.fromFunction(spark, Seq(v.length.toLong, v.head.length.toLong), Seq(cr, cc))(
      g => v(g(0).toInt)(g(1).toInt))
  }

  private def cellsC(x: CArr): (Map[Long, Double], Map[Long, Double]) = {
    val re = x.reArr.toIndexedDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val im = x.imArr.toIndexedDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    (re, im)
  }

  /** Direct DFT of a complex sequence, sign e^{-2πikn/N}. */
  private def dft(re: Array[Double], im: Array[Double]): (Array[Double], Array[Double]) = {
    val n = re.length
    val or = new Array[Double](n); val oi = new Array[Double](n)
    for (k <- 0 until n; j <- 0 until n) {
      val ang = -2.0 * math.Pi * k * j / n
      val c = math.cos(ang); val s = math.sin(ang)
      or(k) += re(j) * c - im(j) * s
      oi(k) += re(j) * s + im(j) * c
    }
    (or, oi)
  }

  private val eps = 1e-9

  test("fftAxis on a multi-chunk 1-D array matches the direct DFT (n=12, non-pow2)") {
    val v = (0 until 12).map(i => math.sin(i * 0.7) + i % 3)
    val x = ComplexFft.fftArr(arr1d(v, 5), 0)
    val (re, im) = cellsC(x)
    val (er, ei) = dft(v.toArray, new Array[Double](12))
    for (k <- 0 until 12) {
      assert(math.abs(re(k) - er(k)) < eps, s"re[$k]")
      assert(math.abs(im(k) - ei(k)) < eps, s"im[$k]")
    }
  }

  test("ifftAxis inverts fftAxis on complex input with nonzero imaginary part") {
    val vr = (0 until 10).map(i => (i * i % 7).toDouble)
    val vi = (0 until 10).map(i => (3 * i % 5).toDouble)
    val x = CArr.fromParts(arr1d(vr, 4), arr1d(vi, 4))
    val back = ComplexFft.ifftAxis(ComplexFft.fftAxis(x, 0), 0)
    val (re, im) = cellsC(back)
    for (k <- 0 until 10) {
      assert(math.abs(re(k) - vr(k)) < eps, s"re[$k]")
      assert(math.abs(im(k) - vi(k)) < eps, s"im[$k]")
    }
  }

  test("fft2 on a 2-D multi-chunk array matches the direct 2-D DFT; ifft2 inverts it") {
    val rows = (0 until 6).map(r => (0 until 8).map(c => ((r * 8 + c) % 11).toDouble))
    val a = arr2d(rows, 4, 3)
    val f = ComplexFft.fft2(CArr.fromReal(a))
    // direct: DFT rows then columns (separable)
    val tmpR = Array.ofDim[Double](6, 8); val tmpI = Array.ofDim[Double](6, 8)
    for (r <- 0 until 6) {
      val (or, oi) = dft(rows(r).toArray, new Array[Double](8))
      tmpR(r) = or; tmpI(r) = oi
    }
    val expR = Array.ofDim[Double](6, 8); val expI = Array.ofDim[Double](6, 8)
    for (c <- 0 until 8) {
      val (or, oi) = dft(Array.tabulate(6)(tmpR(_)(c)), Array.tabulate(6)(tmpI(_)(c)))
      for (r <- 0 until 6) { expR(r)(c) = or(r); expI(r)(c) = oi(r) }
    }
    val (re, im) = cellsC(f)
    for (r <- 0 until 6; c <- 0 until 8) {
      assert(math.abs(re(r * 8L + c) - expR(r)(c)) < 1e-8, s"re[$r,$c]")
      assert(math.abs(im(r * 8L + c) - expI(r)(c)) < 1e-8, s"im[$r,$c]")
    }
    val back = ComplexFft.ifft2(f).reArr.toIndexedDF.collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    for (r <- 0 until 6; c <- 0 until 8)
      assert(math.abs(back(r * 8L + c) - rows(r)(c)) < 1e-8, s"roundtrip[$r,$c]")
  }

  test("rfftAxis keeps bins 0..n/2 of the full transform; irfft inverts for even and odd n") {
    val v = (0 until 8).map(i => math.cos(i * 1.1) * 3 + i)
    val a = arr1d(v, 3)
    val half = ComplexFft.rfftAxis(a, 0)
    assert(half.shape == Seq(5L))
    val (hr, hi) = cellsC(half)
    val (er, ei) = dft(v.toArray, new Array[Double](8))
    for (k <- 0 to 4) {
      assert(math.abs(hr(k) - er(k)) < eps, s"rfft re[$k]")
      assert(math.abs(hi(k) - ei(k)) < eps, s"rfft im[$k]")
    }
    val back = ComplexFft.irfftAxis(half, 0)
    assert(back.shape == Seq(8L))
    val bv = back.toIndexedDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (k <- 0 until 8) assert(math.abs(bv(k) - v(k)) < eps, s"irfft[$k]")
    // odd n needs the explicit length (numpy irfft(x, n=9))
    val v9 = (0 until 9).map(i => (i % 4).toDouble - 1)
    val h9 = ComplexFft.rfftAxis(arr1d(v9, 4), 0)
    assert(h9.shape == Seq(5L))
    val b9 = ComplexFft.irfftAxis(h9, 0, 9L).toIndexedDF.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (k <- 0 until 9) assert(math.abs(b9(k) - v9(k)) < eps, s"irfft odd[$k]")
  }

  test("irfft zero-pads the half-spectrum when n > 2*(m-1) — numpy pad semantics") {
    val v = (0 until 8).map(i => math.sin(i * 0.7) * 2 + (i % 3))
    val half = ComplexFft.rfftAxis(arr1d(v, 3), 0) // m = 5 bins
    val n = 16 // > 2*(m-1) = 8: bins 5..8 must be ZERO-padded before the mirror
    val back = ComplexFft.irfftAxis(half, 0, n.toLong)
    assert(back.shape == Seq(n.toLong), s"got ${back.shape}")
    // reference: inverse DFT of the Hermitian extension of the zero-padded
    // half spectrum [X0..X4, 0, 0, 0, 0, conj mirror]
    val (er, ei) = dft(v.toArray, new Array[Double](8))
    val yr = new Array[Double](n); val yi = new Array[Double](n)
    for (k <- 0 to 4) { yr(k) = er(k); yi(k) = ei(k) }
    for (k <- n / 2 + 1 until n) { yr(k) = yr(n - k); yi(k) = -yi(n - k) }
    val exp = Array.tabulate(n) { t =>
      (0 until n).map(k => yr(k) * math.cos(2 * math.Pi * k * t / n)
        - yi(k) * math.sin(2 * math.Pi * k * t / n)).sum / n
    }
    val bv = back.toIndexedDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (t <- 0 until n) assert(math.abs(bv(t) - exp(t)) < 1e-8, s"irfft pad[$t]")
    // hfft rides the same path: hfft(x, n) = n * irfft(conj(x), n)
    val hf = ComplexFft.hfftAxis(half, 0, n.toLong)
    assert(hf.shape == Seq(n.toLong))
    val hv = hf.toIndexedDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // conj flips the imaginary plane: same real-part formula with +yi
    val expH = Array.tabulate(n) { t =>
      (0 until n).map(k => yr(k) * math.cos(2 * math.Pi * k * t / n)
        + yi(k) * math.sin(2 * math.Pi * k * t / n)).sum
    }
    for (t <- 0 until n) assert(math.abs(hv(t) - expH(t)) < 1e-7, s"hfft pad[$t]")
  }

  test("hfft(ihfft(a), n) == a — the numpy Hermitian pair identity") {
    val v = (0 until 10).map(i => (i * 7 % 13).toDouble)
    val a = arr1d(v, 4)
    val spec = ComplexFft.ihfftAxis(a, 0)
    assert(spec.shape == Seq(6L))
    val back = ComplexFft.hfftAxis(spec, 0, 10L)
    val bv = back.toIndexedDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (k <- 0 until 10) assert(math.abs(bv(k) - v(k)) < eps, s"hfft∘ihfft[$k]")
  }

  test("fftn over a 3-D array equals axis-by-axis composition and inverts under ifftn") {
    val f3 = GArr.fromFunction(spark, Seq(3L, 4L, 5L), Seq(2, 3, 2))(
      g => ((g(0) * 20 + g(1) * 5 + g(2)) % 7).toDouble)
    val fwd = ComplexFft.fftn(CArr.fromReal(f3))
    val byAxis = ComplexFft.fftAxis(ComplexFft.fftAxis(ComplexFft.fftArr(f3, 0), 1), 2)
    val (ar, ai) = cellsC(fwd)
    val (br, bi) = cellsC(byAxis)
    for (i <- 0L until 60L) {
      assert(math.abs(ar(i) - br(i)) < 1e-8, s"fftn re[$i]")
      assert(math.abs(ai(i) - bi(i)) < 1e-8, s"fftn im[$i]")
    }
    val back = ComplexFft.ifftn(fwd).reArr.toIndexedDF.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (i <- 0 until 60)
      assert(math.abs(back(i) - ((i / 20 * 20 + i % 20 / 5 * 5 + i % 5) % 7)) < 1e-8)
  }

  test("rfftn halves only the last axis; irfftn∘rfftn is the identity (even and odd n)") {
    for (cols <- Seq(6L, 5L)) { // even and odd last-axis lengths
      val a = GArr.fromFunction(spark, Seq(4L, cols), Seq(2, 2))(
        g => ((g(0) * 13 + g(1) * 7) % 11).toDouble)
      val half = ComplexFft.rfftn(a)
      assert(half.shape == Seq(4L, cols / 2 + 1), s"cols=$cols")
      val back = ComplexFft.irfftn(half, n0 = cols)
      val bv = back.toIndexedDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      for (i <- 0L until 4L * cols)
        assert(math.abs(bv(i) - ((i / cols * 13 + i % cols * 7) % 11)) < 1e-8,
          s"irfftn∘rfftn cols=$cols [$i]")
      // rfft2 on explicit axes agrees with the default full-axes rfftn here
      val (ar, ai) = cellsC(ComplexFft.rfft2(a))
      val (br, bi) = cellsC(half)
      for (i <- 0L until 4L * (cols / 2 + 1)) {
        assert(math.abs(ar(i) - br(i)) < 1e-8, s"rfft2 re[$i]")
        assert(math.abs(ai(i) - bi(i)) < 1e-8, s"rfft2 im[$i]")
      }
    }
  }

  test("distributed four-step fft1dC matches the direct DFT on complex multi-chunk input") {
    val n = 24 // n2=4, n1=6 — both phases non-trivial at targetElems=8
    val vr = (0 until n).map(i => math.sin(i * 0.37) + (i % 5))
    val vi = (0 until n).map(i => math.cos(i * 0.21) - (i % 3))
    val x = CArr.fromParts(arr1d(vr, 7), arr1d(vi, 7))
    val got = ComplexFft.fft1dC(x, targetElems = 8).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val (er, ei) = dft(vr.toArray, vi.toArray)
    for (k <- 0 until n) {
      assert(math.abs(got(k)._1 - er(k)) < 1e-8, s"re[$k]")
      assert(math.abs(got(k)._2 - ei(k)) < 1e-8, s"im[$k]")
    }
  }

  test("distributed ifft1d recovers the signal from its directly-computed spectrum") {
    val n = 18
    val v = (0 until n).map(i => ((i * 11) % 7).toDouble)
    val (sr, si) = dft(v.toArray, new Array[Double](n))
    val spec = CArr.fromParts(
      arr1d(sr.toIndexedSeq, 5), arr1d(si.toIndexedSeq, 5))
    val got = ComplexFft.ifft1d(spec, targetElems = 8).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    for (k <- 0 until n) {
      assert(math.abs(got(k)._1 - v(k)) < 1e-8, s"re[$k]")
      assert(math.abs(got(k)._2) < 1e-8, s"im[$k]")
    }
  }

  test("hadamard / magnitude / angle complex cell ops") {
    val x = CArr.fromParts(arr1d(Seq(1, 0, 2).map(_.toDouble), 2),
                           arr1d(Seq(0, 1, -1).map(_.toDouble), 2))
    val y = CArr.fromParts(arr1d(Seq(3, 2, 0).map(_.toDouble), 2),
                           arr1d(Seq(1, -1, 2).map(_.toDouble), 2))
    val (hr, hi) = cellsC(x.hadamard(y))
    // (1+0i)(3+1i)=3+1i ; (0+1i)(2-1i)=1+2i ; (2-1i)(0+2i)=2+4i
    assert(hr(0) == 3.0 && hi(0) == 1.0)
    assert(hr(1) == 1.0 && hi(1) == 2.0)
    assert(hr(2) == 2.0 && hi(2) == 4.0)
    val mag = x.magnitude.toIndexedDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(mag(0) == 1.0 && mag(1) == 1.0 && math.abs(mag(2) - math.sqrt(5)) < eps)
    val ang = x.angle.toIndexedDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ang(0) == 0.0 && math.abs(ang(1) - math.Pi / 2) < eps)
  }

  test("fftConvolve 'full' matches the direct integer convolution on multi-chunk inputs") {
    val av = Seq(1, 2, 3, 4, 5, 0, 2, 1).map(_.toDouble)
    val bv = Seq(2, 0, 1, 3).map(_.toDouble)
    val out = ComplexFft.fftConvolve(arr1d(av, 3), arr1d(bv, 2))
    assert(out.shape == Seq(11L))
    val got = out.toIndexedDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (k <- 0 until 11) {
      val expect = (0 until 8).map(i =>
        if (k - i >= 0 && k - i < 4) av(i) * bv(k - i) else 0.0).sum
      assert(math.abs(got(k) - expect) < 1e-9, s"conv[$k]: ${got(k)} vs $expect")
    }
  }

  test("overlap-add convolution matches direct convolution across block boundaries") {
    val av = (0 until 50).map(i => ((i * 17) % 23 - 5).toDouble)
    val bv = Seq(2.0, -1.0, 0.5, 3.0, 1.0)
    // oa path explicitly (multi-chunk signal, kernel spans block joins)
    val out = ComplexFft.oaConvolve(arr1d(av, 7), bv.toArray)
    assert(out.shape == Seq(54L))
    val got = out.toIndexedDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (k <- 0 until 54) {
      val expect = av.indices.map(i =>
        if (k - i >= 0 && k - i < 5 ) av(i) * bv(k - i) else 0.0).sum
      assert(math.abs(got(k) - expect) < 1e-9, s"oa[$k]")
    }
    // the dispatcher picks overlap-add for a small kernel (nb*4 <= na) and
    // must agree with the local-FFT per-block path (nb > 32 branch)
    val bigK = (0 until 40).map(i => ((i * 7) % 11 - 3).toDouble)
    val sig = (0 until 400).map(i => ((i * 29) % 31 - 9).toDouble)
    val viaDispatch = ComplexFft.fftConvolve(arr1d(sig, 64), arr1d(bigK, 16))
      .toIndexedDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (k <- 0 until 439) {
      val expect = sig.indices.map(i =>
        if (k - i >= 0 && k - i < 40) sig(i) * bigK(k - i) else 0.0).sum
      assert(math.abs(viaDispatch(k) - expect) < 1e-7, s"dispatch[$k]")
    }
  }

  test("fft1dArr chunked spectrum matches fft1dC rows bin-for-bin; ifft1dArr inverts") {
    val n = 24
    val vr = (0 until n).map(i => (i * 5 % 11).toDouble)
    val vi = (0 until n).map(i => (i % 4).toDouble)
    val x = CArr.fromParts(arr1d(vr, 7), arr1d(vi, 7))
    val arr = ComplexFft.fft1dArr(x, targetElems = 8, outChunk = 5)
    assert(arr.chunks == Seq(Seq(5, 5, 5, 5, 4)))
    val (ar, ai) = cellsC(arr)
    val rows = ComplexFft.fft1dC(x, targetElems = 8).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    for (k <- 0 until n) {
      assert(math.abs(ar(k) - rows(k)._1) < 1e-12, s"re[$k]")
      assert(math.abs(ai(k) - rows(k)._2) < 1e-12, s"im[$k]")
    }
    val back = ComplexFft.ifft1dArr(arr, targetElems = 8, outChunk = 7)
    val (br, bi) = cellsC(back)
    for (k <- 0 until n) {
      assert(math.abs(br(k) - vr(k)) < 1e-9, s"inv re[$k]")
      assert(math.abs(bi(k) - vi(k)) < 1e-9, s"inv im[$k]")
    }
  }

  test("complex rechunk moves both planes in one packed shuffle and preserves values") {
    val vr = (0 until 15).map(_.toDouble)
    val vi = (0 until 15).map(i => (i * i).toDouble)
    val x = CArr.fromParts(arr1d(vr, 4), arr1d(vi, 4))
    val y = x.rechunkTo(Seq(Seq(6, 6, 3)))
    assert(y.chunks == Seq(Seq(6, 6, 3)))
    val (re, im) = cellsC(y)
    for (k <- 0 until 15) {
      assert(re(k) == vr(k)); assert(im(k) == vi(k))
    }
  }
}
