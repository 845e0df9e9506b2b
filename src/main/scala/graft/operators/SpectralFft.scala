package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Complex strip piece shuffled between FFT phases. */
final case class CPiece(strip: Int, offs: Array[Int],
                        re: Array[Double], im: Array[Double])

/** Distributed 1-D FFT over a chunked [[GArr]] — the dask `array/fft.py`
  * surface re-expressed as the four-step (transpose) Cooley–Tukey
  * algorithm, the standard distributed-memory FFT:
  *
  *   view x (N = N1·N2, both powers of two) as A[n1][n2] with
  *   n = n1·N2 + n2; then  X[k1 + N1·k2] =
  *   FFT_n2( e^{-2πi·n2·k1/N} · FFT_n1(A[·][n2]) )[k2]
  *
  * Phase 1 regroups the 1-D blocks into column strips (shuffle #1), each
  * task FFTs its columns locally and applies the twiddle factors; phase 2
  * transposes to row strips (shuffle #2) and FFTs rows locally. Strip
  * widths are sized to ~`targetElems` doubles per task, so both local
  * FFTs stay cache-resident regardless of N — exactly two all-to-all
  * exchanges of packed arrays at any scale (the communication lower bound
  * for a transpose FFT).
  *
  * Dask wraps numpy's FFT per-chunk and can only batch over the OTHER
  * axes (`array/fft.py:1-316` requires the FFT axis be single-chunk);
  * this implementation genuinely distributes the transform axis.
  */
object SpectralFft {
  import GArr.startsOf

  /** In-place iterative radix-2 complex FFT (sign convention e^{-2πikn/N}).
    * Twiddles come from ONE precomputed quarter-table of n/2 direct-trig
    * values (every level reads it at stride n/len), so accuracy matches
    * per-butterfly direct trig — |error| ~ε·log₂n relative — at 1/log₂n
    * of the trig cost; the table is 8·n bytes, allocated per call and
    * bounded by the strip size the four-step feeds in (never the whole
    * distributed axis).
    */
  def fftLocal(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require((n & (n - 1)) == 0, s"fftLocal length $n not a power of two")
    if (n <= 1) return
    var j = 0
    var i = 1
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    val half0 = n >> 1
    val cosT = new Array[Double](half0)
    val sinT = new Array[Double](half0)
    val ang0 = -2.0 * math.Pi / n
    var k0 = 0
    while (k0 < half0) {
      cosT(k0) = math.cos(ang0 * k0); sinT(k0) = math.sin(ang0 * k0)
      k0 += 1
    }
    var len = 2
    while (len <= n) {
      val half = len >> 1
      val step = n / len
      var base = 0
      while (base < n) {
        var k = 0
        while (k < half) {
          val cr = cosT(k * step)
          val ci = sinT(k * step)
          val ur = re(base + k); val ui = im(base + k)
          val vr0 = re(base + k + half); val vi0 = im(base + k + half)
          val vr = vr0 * cr - vi0 * ci
          val vi = vr0 * ci + vi0 * cr
          re(base + k) = ur + vr; im(base + k) = ui + vi
          re(base + k + half) = ur - vr; im(base + k + half) = ui - vi
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Arbitrary-length local FFT: radix-2 for powers of two, Bluestein's
    * chirp-z otherwise (three pow2 FFTs of length m = nextPow2(2n-1); the
    * k² chirp angle is reduced mod 2n in exact Long arithmetic so large k
    * loses no precision). numpy supports any n — this closes the same
    * surface locally, and [[fft1d]] composes it per strip.
    */
  def fftLocalAny(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    if (n <= 1) return
    if ((n & (n - 1)) == 0) { fftLocal(re, im); return }
    val m = Integer.highestOneBit(2 * n - 1) << 1
    val cosC = new Array[Double](n); val sinC = new Array[Double](n)
    var k = 0
    while (k < n) {
      val k2 = (k.toLong * k % (2L * n)).toDouble
      val ang = -math.Pi * k2 / n
      cosC(k) = math.cos(ang); sinC(k) = math.sin(ang)
      k += 1
    }
    val ar = new Array[Double](m); val ai = new Array[Double](m)
    k = 0
    while (k < n) {
      ar(k) = re(k) * cosC(k) - im(k) * sinC(k)
      ai(k) = re(k) * sinC(k) + im(k) * cosC(k)
      k += 1
    }
    val br = new Array[Double](m); val bi = new Array[Double](m)
    br(0) = cosC(0); bi(0) = -sinC(0)
    k = 1
    while (k < n) {
      br(k) = cosC(k); bi(k) = -sinC(k)
      br(m - k) = br(k); bi(m - k) = bi(k)
      k += 1
    }
    fftLocal(ar, ai); fftLocal(br, bi)
    k = 0
    while (k < m) {
      val r = ar(k) * br(k) - ai(k) * bi(k)
      val i2 = ar(k) * bi(k) + ai(k) * br(k)
      ar(k) = r; ai(k) = i2
      k += 1
    }
    k = 0; while (k < m) { ai(k) = -ai(k); k += 1 }
    fftLocal(ar, ai)
    k = 0; while (k < m) { ar(k) = ar(k) / m; ai(k) = -ai(k) / m; k += 1 }
    k = 0
    while (k < n) {
      re(k) = ar(k) * cosC(k) - ai(k) * sinC(k)
      im(k) = ar(k) * sinC(k) + ai(k) * cosC(k)
      k += 1
    }
  }

  /** Distributed FFT of a real-valued 1-D [[GArr]], any length N (the
    * four-step decimation X[k1 + k2·n1] works for ANY factorization
    * N = n1·n2; strips use the arbitrary-length [[fftLocalAny]]). A prime
    * N degenerates to n2 = 1 — one strip runs a local Bluestein, exactly
    * what numpy does on a single machine. Returns (k, re, im) rows for
    * all N bins.
    */
  def fft1d(a: GArr, targetElems: Int = 65536): DataFrame = {
    require(a.ndim == 1, "fft1d takes a 1-D array")
    val n = a.shape.head
    require(n >= 1, s"fft1d needs a nonempty array")
    val s = a.blocks.sparkSession
    import s.implicits._
    // largest divisor of n that is <= sqrt(n) (for pow2 this is the usual
    // half-split; for primes it is 1)
    val n2 = {
      var d = math.sqrt(n.toDouble).toLong
      while (d > 1 && n % d != 0) d -= 1
      math.max(1L, d).toInt
    }
    val n1 = (n / n2).toInt
    val w2 = math.max(1, math.min(n2, targetElems / math.max(n1, 1)))
    val w1 = math.max(1, math.min(n1, targetElems / math.max(n2, 1)))
    val starts = startsOf(a.chunks.head)
    val nL = n

    // ---- phase 1: 1-D blocks -> column strips ---------------------------
    val colPieces: Dataset[CPiece] = a.blocks.flatMap { b =>
      val g0 = starts(b.bid.head)
      val bufs = scala.collection.mutable.LinkedHashMap[Int, (scala.collection.mutable.ArrayBuilder[Int], scala.collection.mutable.ArrayBuilder[Double])]()
      var i = 0
      while (i < b.data.length) {
        val gi = g0 + i
        val n1i = (gi / n2).toInt
        val n2i = (gi % n2).toInt
        val strip = n2i / w2
        val wCols = math.min(w2, n2 - strip * w2)
        val (ob, vb) = bufs.getOrElseUpdate(strip,
          (scala.collection.mutable.ArrayBuilder.make[Int],
           scala.collection.mutable.ArrayBuilder.make[Double]))
        ob += n1i * wCols + (n2i - strip * w2)
        vb += b.data(i)
        i += 1
      }
      bufs.iterator.map { case (strip, (ob, vb)) =>
        CPiece(strip, ob.result(), vb.result(), Array.emptyDoubleArray)
      }
    }

    // ---- phase 2: per-strip column FFTs + twiddle, re-strip by rows -----
    val rowPieces: Dataset[CPiece] = colPieces.groupByKey(_.strip).flatMapGroups {
      (strip, it) =>
        val wCols = math.min(w2, n2 - strip * w2)
        val re = new Array[Double](n1 * wCols)
        val im = new Array[Double](n1 * wCols)
        it.foreach { p =>
          var i = 0
          while (i < p.offs.length) { re(p.offs(i)) = p.re(i); i += 1 }
        }
        val tre = new Array[Double](n1)
        val tim = new Array[Double](n1)
        var c = 0
        while (c < wCols) {
          var r = 0
          while (r < n1) { tre(r) = re(r * wCols + c); tim(r) = im(r * wCols + c); r += 1 }
          fftLocalAny(tre, tim)
          val g2 = strip * w2 + c
          var k1 = 0
          while (k1 < n1) {
            val ang = -2.0 * math.Pi * g2 * k1 / nL
            val cr = math.cos(ang); val ci = math.sin(ang)
            val vr = tre(k1) * cr - tim(k1) * ci
            val vi = tre(k1) * ci + tim(k1) * cr
            re(k1 * wCols + c) = vr
            im(k1 * wCols + c) = vi
            k1 += 1
          }
          c += 1
        }
        // emit per destination row-strip
        val nStrips3 = (n1 + w1 - 1) / w1
        (0 until nStrips3).iterator.map { t =>
          val rows = math.min(w1, n1 - t * w1)
          val offs = new Array[Int](rows * wCols)
          val ore = new Array[Double](rows * wCols)
          val oim = new Array[Double](rows * wCols)
          var idx = 0
          var rr = 0
          while (rr < rows) {
            val k1 = t * w1 + rr
            var cc = 0
            while (cc < wCols) {
              offs(idx) = rr * n2 + (strip * w2 + cc)
              ore(idx) = re(k1 * wCols + cc)
              oim(idx) = im(k1 * wCols + cc)
              idx += 1; cc += 1
            }
            rr += 1
          }
          CPiece(t, offs, ore, oim)
        }
    }

    // ---- phase 3: per-row-strip FFTs over n2, emit final bins -----------
    rowPieces.groupByKey(_.strip).flatMapGroups { (t, it) =>
      val rows = math.min(w1, n1 - t * w1)
      val re = new Array[Double](rows * n2)
      val im = new Array[Double](rows * n2)
      it.foreach { p =>
        var i = 0
        while (i < p.offs.length) { re(p.offs(i)) = p.re(i); im(p.offs(i)) = p.im(i); i += 1 }
      }
      val tre = new Array[Double](n2)
      val tim = new Array[Double](n2)
      val out = scala.collection.mutable.ArrayBuffer[(Long, Double, Double)]()
      var r = 0
      while (r < rows) {
        val k1 = t * w1 + r
        System.arraycopy(re, r * n2, tre, 0, n2)
        System.arraycopy(im, r * n2, tim, 0, n2)
        fftLocalAny(tre, tim)
        var k2 = 0
        while (k2 < n2) {
          out += ((k1 + n1.toLong * k2, tre(k2), tim(k2)))
          k2 += 1
        }
        r += 1
      }
      out
    }.toDF("k", "re", "im")
  }

  /** numpy/dask `fft.rfft` for real input: the spectrum of a real signal
    * is Hermitian, so only bins 0..n/2 carry information — one filter on
    * the full transform.
    */
  def rfft1d(a: GArr, targetElems: Int = 65536): DataFrame = {
    val half = a.shape.head / 2
    fft1d(a, targetElems).where(org.apache.spark.sql.functions.col("k") <= half)
  }

  /** numpy/dask `fft.fftfreq(n, d)` — grid-parallel creation, zero driver
    * data: freq[k] = k/(n·d) for k < ⌈n/2⌉, else (k-n)/(n·d).
    */
  def fftfreq(s: org.apache.spark.sql.SparkSession, n: Long, d: Double = 1.0,
              chunk: Int = 65536): GArr = {
    val split = (n + 1) / 2
    GArr.fromFunction(s, Seq(n), Seq(chunk))(g =>
      (if (g(0) < split) g(0) else g(0) - n) / (n * d))
  }

  /** numpy/dask `fft.rfftfreq(n, d)`: k/(n·d) for k = 0..n/2. */
  def rfftfreq(s: org.apache.spark.sql.SparkSession, n: Long, d: Double = 1.0,
               chunk: Int = 65536): GArr =
    GArr.fromFunction(s, Seq(n / 2 + 1), Seq(chunk))(g => g(0) / (n * d))

  /** numpy/dask `fft.fftshift` / `ifftshift` along an axis — pure roll
    * compositions (two strided slices + zero-shuffle concat).
    */
  def fftshift(a: GArr, axis: Int = 0): GArr =
    a.rollAxis(axis, a.shape(axis) / 2)

  def ifftshift(a: GArr, axis: Int = 0): GArr =
    a.rollAxis(axis, -(a.shape(axis) / 2))
}
