package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** One chunk of a distributed complex ndarray: same grid contract as
  * [[ABlock]], with the real and imaginary planes stored side by side so
  * every elementwise/FFT kernel sees both without a join.
  */
final case class CBlock(bid: Seq[Int], re: Array[Double], im: Array[Double])

/** Distributed chunked COMPLEX ndarray — the complex128 arrays dask's FFT
  * surface produces (reference `dask/array/fft.py:118-251`, where every
  * `fft_wrap`ped transform returns a complex dask array that downstream
  * transforms consume). Representation mirrors [[GArr]]: driver-held
  * `shape`/`chunks`, worker-held blocks, and movement between chunk grids
  * done by packing re/im into one interleaved [[GArr]] (trailing axis of
  * length 2) so a complex rechunk is ONE scatter shuffle of the same byte
  * count a complex128 array would move — not two shuffles plus a join.
  */
final case class CArr(shape: Seq[Long], chunks: Seq[Seq[Int]], blocks: Dataset[CBlock]) {
  import GArr._

  def ndim: Int = shape.length
  def grid: Seq[Int] = chunks.map(_.length)
  private def spark: SparkSession = blocks.sparkSession

  /** Real / imaginary parts as ordinary [[GArr]]s (narrow maps). */
  def reArr: GArr = {
    val s = spark; import s.implicits._
    GArr(shape, chunks, blocks.map(b => ABlock(b.bid, b.re)))
  }
  def imArr: GArr = {
    val s = spark; import s.implicits._
    GArr(shape, chunks, blocks.map(b => ABlock(b.bid, b.im)))
  }

  /** dask `persist` for complex arrays (multi-consumer spectra — e.g. a
    * DC probe plus a Parseval sum off one transform — compute the FFT
    * lineage once).
    */
  def persist(): CArr =
    copy(blocks = blocks.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER))

  def unpersist(): CArr = copy(blocks = blocks.unpersist())

  /** Complex conjugate — narrow. */
  def conj: CArr = mapParts((r, i) => (r, negated(i)))

  /** Multiply by a real scalar — narrow. */
  def scale(k: Double): CArr =
    mapParts((r, i) => (scaled(r, k), scaled(i, k)))

  private def negated(a: Array[Double]): Array[Double] = {
    val o = new Array[Double](a.length)
    var j = 0; while (j < a.length) { o(j) = -a(j); j += 1 }; o
  }
  private def scaled(a: Array[Double], k: Double): Array[Double] = {
    val o = new Array[Double](a.length)
    var j = 0; while (j < a.length) { o(j) = a(j) * k; j += 1 }; o
  }

  def mapParts(f: (Array[Double], Array[Double]) => (Array[Double], Array[Double])): CArr = {
    val s = spark; import s.implicits._
    copy(blocks = blocks.map { b =>
      val (r, i) = f(b.re, b.im)
      CBlock(b.bid, r, i)
    })
  }

  /** Pack into one real [[GArr]] with a trailing interleave axis of length
    * 2 (C order ⇒ re/im adjacent per element) — the bridge that lets every
    * GArr movement primitive (rechunk/slice/flip/concat) run on complex
    * data in a single shuffle.
    */
  def packed: GArr = {
    val s = spark; import s.implicits._
    val out = blocks.map { b =>
      val o = new Array[Double](b.re.length * 2)
      var j = 0
      while (j < b.re.length) { o(2 * j) = b.re(j); o(2 * j + 1) = b.im(j); j += 1 }
      ABlock(b.bid :+ 0, o)
    }
    GArr(shape :+ 2L, chunks :+ Seq(2), out)
  }

  /** Complex rechunk: pack → one scatter shuffle → unpack. */
  def rechunkTo(newChunks: Seq[Seq[Int]]): CArr =
    CArr.unpack(packed.rechunkTo(newChunks :+ Seq(2)))

  /** Basic slice over the complex grid (one shuffle via the packed form). */
  def slice(specs: Seq[(Long, Long, Long)], targetChunk: Int = 65536): CArr =
    CArr.unpack(packed.slice(specs :+ (0L, 2L, 1L), targetChunk))

  def flipAxis(axis: Int): CArr = CArr.unpack(packed.flipAxis(axis))
}

object CArr {
  /** Lift a real array to complex (im = 0) — narrow. */
  def fromReal(a: GArr): CArr = {
    val s = a.blocks.sparkSession; import s.implicits._
    CArr(a.shape, a.chunks,
      a.blocks.map(b => CBlock(b.bid, b.data, new Array[Double](b.data.length))))
  }

  /** Zip two co-gridded real arrays into a complex one (one equi-join on
    * the numeric block id, as [[GArr.elemwise]]).
    */
  def fromParts(re: GArr, im: GArr): CArr = {
    require(re.shape == im.shape && re.chunks == im.chunks,
      s"fromParts requires identical chunk grids: ${re.shape} vs ${im.shape}")
    val s = re.blocks.sparkSession; import s.implicits._
    val g = re.grid
    val l = re.blocks.map(b => (GArr.linearBidL(b.bid, g), b.bid, b.data))
    val r = im.blocks.map(b => (GArr.linearBidL(b.bid, g), b.data))
    val joined = l.joinWith(r, l("_1") === r("_1"))
    CArr(re.shape, re.chunks, joined.map { case ((_, bid, rr), (_, ii)) =>
      CBlock(bid, rr, ii)
    })
  }

  /** Inverse of [[CArr.packed]] — narrow deinterleave. */
  def unpack(p: GArr): CArr = {
    require(p.shape.last == 2L && p.chunks.last == Seq(2),
      s"unpack expects a trailing interleave axis of 2: ${p.shape}")
    val s = p.blocks.sparkSession; import s.implicits._
    val out = p.blocks.map { b =>
      val n = b.data.length / 2
      val re = new Array[Double](n); val im = new Array[Double](n)
      var j = 0
      while (j < n) { re(j) = b.data(2 * j); im(j) = b.data(2 * j + 1); j += 1 }
      CBlock(b.bid.init, re, im)
    }
    CArr(p.shape.init, p.chunks.init, out)
  }

  def concatenate(axis: Int, arrs: Seq[CArr]): CArr =
    unpack(GArr.concatenate(axis, arrs.map(_.packed)))
}

/** The dask `array/fft.py` transform surface over [[CArr]]/[[GArr]] —
  * fft/ifft (+2/n variants), rfft/irfft, hfft/ihfft, all along any axis of
  * an ndim chunked array.
  *
  * Axis contract: like the reference (`fft.py:169-214` raises unless the
  * transform axes are single-chunk), the transform axis is made block-local
  * — here by an automatic one-shuffle rechunk instead of an error — and
  * the per-lane transform is then a NARROW map batched over every other
  * axis's chunking. For a 1-D array too large for one block, use the
  * genuinely distributed four-step [[SpectralFft.fft1d]] /
  * [[ComplexFft.fft1dC]] instead, which this module complements.
  */
object ComplexFft {
  import GArr.{startsOf, chunkDim, cStridesI}
  import SpectralFft.fftLocalAny

  /** FFT (or inverse FFT, numpy "backward" norm: ifft scales by 1/n) along
    * one axis. One rechunk shuffle if the axis is multi-chunk, then narrow.
    */
  def fftAxis(x: CArr, axis: Int, inverse: Boolean = false): CArr = {
    require(axis >= 0 && axis < x.ndim, s"fftAxis: bad axis $axis for ndim ${x.ndim}")
    val n = x.shape(axis)
    require(n <= Int.MaxValue / 2,
      s"fftAxis: axis length $n exceeds the block-local limit; use the distributed fft1dC")
    val single =
      if (x.chunks(axis).length == 1) x
      else x.rechunkTo(x.chunks.updated(axis, Seq(n.toInt)))
    val s = single.blocks.sparkSession
    import s.implicits._
    val nd = x.ndim
    val ax = axis
    val inv = inverse
    val srcStarts = single.chunks.map(startsOf)
    val out = single.blocks.map { b =>
      val dims = Array.tabulate(nd)(d => chunkDim(srcStarts(d), b.bid(d)))
      val alen = dims(ax)
      val str = cStridesI(dims)
      val astr = str(ax)
      val restDims = Array.tabulate(nd - 1)(j => dims(if (j < ax) j else j + 1))
      val restTotal = if (restDims.isEmpty) 1 else restDims.product
      val re = new Array[Double](b.re.length)
      val im = new Array[Double](b.im.length)
      System.arraycopy(b.re, 0, re, 0, re.length)
      System.arraycopy(b.im, 0, im, 0, im.length)
      val tre = new Array[Double](alen)
      val tim = new Array[Double](alen)
      val t = new Array[Int](nd)
      var r = 0
      while (r < restTotal) {
        var rem = r; var j = nd - 2
        while (j >= 0) {
          val d = if (j < ax) j else j + 1
          t(d) = rem % restDims(j); rem /= restDims(j)
          j -= 1
        }
        var base = 0; var d = 0
        while (d < nd) { if (d != ax) base += t(d) * str(d); d += 1 }
        var a = 0
        // ifft(x) = conj(fft(conj(x))) / n — one local pass per lane
        if (inv) {
          while (a < alen) { tre(a) = re(base + a * astr); tim(a) = -im(base + a * astr); a += 1 }
          fftLocalAny(tre, tim)
          a = 0
          while (a < alen) {
            re(base + a * astr) = tre(a) / alen
            im(base + a * astr) = -tim(a) / alen
            a += 1
          }
        } else {
          while (a < alen) { tre(a) = re(base + a * astr); tim(a) = im(base + a * astr); a += 1 }
          fftLocalAny(tre, tim)
          a = 0
          while (a < alen) {
            re(base + a * astr) = tre(a)
            im(base + a * astr) = tim(a)
            a += 1
          }
        }
        r += 1
      }
      CBlock(b.bid, re, im)
    }
    CArr(single.shape, single.chunks, out)
  }

  def ifftAxis(x: CArr, axis: Int): CArr = fftAxis(x, axis, inverse = true)

  /** numpy/dask `fft.fft` of a real ndim array along `axis`. */
  def fftArr(a: GArr, axis: Int = 0): CArr = fftAxis(CArr.fromReal(a), axis)

  /** numpy/dask `fft.fft2` / `ifft2` (axes default to the last two). */
  def fft2(x: CArr, axes: (Int, Int) = (-2, -1)): CArr =
    fftn(x, Seq(axes._1, axes._2))
  def ifft2(x: CArr, axes: (Int, Int) = (-2, -1)): CArr =
    ifftn(x, Seq(axes._1, axes._2))

  /** numpy/dask `fft.fftn` / `ifftn`: one [[fftAxis]] per requested axis
    * (an n-D DFT is separable), each narrow after its rechunk.
    */
  def fftn(x: CArr, axes0: Seq[Int] = Nil): CArr = {
    val axes = if (axes0.isEmpty) x.shape.indices else axes0.map(norm(_, x.ndim))
    axes.foldLeft(x)((acc, ax) => fftAxis(acc, ax))
  }
  def ifftn(x: CArr, axes0: Seq[Int] = Nil): CArr = {
    val axes = if (axes0.isEmpty) x.shape.indices else axes0.map(norm(_, x.ndim))
    axes.foldLeft(x)((acc, ax) => ifftAxis(acc, ax))
  }

  private def norm(ax: Int, nd: Int): Int = if (ax < 0) ax + nd else ax

  /** numpy/dask `fft.rfft` along an axis: real input, bins 0..n/2 kept
    * (Hermitian redundancy dropped) — one fft + one packed slice.
    */
  def rfftAxis(a: GArr, axis: Int = 0): CArr = {
    val full = fftArr(a, axis)
    val keep = a.shape(axis) / 2 + 1
    val specs = full.shape.indices.map(d =>
      if (d == axis) (0L, keep, 1L) else (0L, full.shape(d), 1L))
    full.slice(specs)
  }

  /** numpy/dask `fft.irfft`: rebuild the full Hermitian spectrum
    * X[k] = conj(X[n-k]) for k > n/2 from the half spectrum (a flip + conj
    * + concat, all one-shuffle packed ops), inverse-transform, return the
    * real plane. `n` defaults to 2·(m−1) as in numpy.
    */
  def irfftAxis(x: CArr, axis: Int = 0, n0: Long = -1L): GArr = {
    val m = x.shape(axis)
    val n = if (n0 > 0) n0 else 2L * (m - 1)
    require(n >= 1, s"irfft output length $n must be >= 1")
    val mUse = math.min(m, n / 2 + 1)
    val headSpecs = x.shape.indices.map(d =>
      if (d == axis) (0L, mUse, 1L) else (0L, x.shape(d), 1L))
    val head = x.slice(headSpecs)
    val tailLen = n - mUse
    val full =
      if (tailLen <= 0) head
      else {
        // mirror bins n-k for k in [mUse, n-1] ⇔ reversed bins [1, n-mUse]
        val mirrorSpecs = x.shape.indices.map(d =>
          if (d == axis) (1L, 1L + tailLen, 1L) else (0L, x.shape(d), 1L))
        val mirror = x.slice(mirrorSpecs).flipAxis(axis).conj
        CArr.concatenate(axis, Seq(head, mirror))
      }
    ifftAxis(full, axis).reArr
  }

  /** numpy/dask `fft.hfft` (spectrum of a signal with Hermitian symmetry —
    * real output): hfft(x, n) = n · irfft(conj(x), n) in numpy's backward
    * norm, so it rides [[irfftAxis]] directly.
    */
  def hfftAxis(x: CArr, axis: Int = 0, n0: Long = -1L): GArr = {
    val n = if (n0 > 0) n0 else 2L * (x.shape(axis) - 1)
    irfftAxis(x.conj, axis, n).scalarMap(_ * n)
  }

  /** numpy/dask `fft.ihfft`: inverse of hfft — conj(rfft(a))/n. */
  def ihfftAxis(a: GArr, axis: Int = 0): CArr = {
    val n = a.shape(axis)
    rfftAxis(a, axis).conj.scale(1.0 / n)
  }

  // --------------------------------------------------------------------
  // Distributed 1-D complex-input four-step (the scale path for a
  // transform axis too large for one block; see SpectralFft.fft1d for the
  // real-input variant and the algorithm notes).
  // --------------------------------------------------------------------

  /** Four-step FFT of a COMPLEX 1-D [[CArr]] — identical phase structure
    * to [[SpectralFft.fft1d]] (two all-to-all strip exchanges, local FFTs
    * sized to `targetElems`), with the imaginary plane carried through
    * phase 1 (the real-input variant elides it). Returns (k, re, im).
    */
  def fft1dC(x: CArr, targetElems: Int = 65536): DataFrame = {
    require(x.ndim == 1, "fft1dC takes a 1-D array")
    val n = x.shape.head
    require(n >= 1, "fft1dC needs a nonempty array")
    val s = x.blocks.sparkSession
    import s.implicits._
    val n2 = {
      var d = math.sqrt(n.toDouble).toLong
      while (d > 1 && n % d != 0) d -= 1
      math.max(1L, d).toInt
    }
    val n1 = (n / n2).toInt
    val w2 = math.max(1, math.min(n2, targetElems / math.max(n1, 1)))
    val w1 = math.max(1, math.min(n1, targetElems / math.max(n2, 1)))
    val starts = startsOf(x.chunks.head)
    val nL = n

    // phase 1: 1-D blocks -> column strips (complex payload)
    val colPieces: Dataset[CPiece] = x.blocks.flatMap { b =>
      val g0 = starts(b.bid.head)
      val bufs = scala.collection.mutable.LinkedHashMap[Int,
        (scala.collection.mutable.ArrayBuilder[Int],
         scala.collection.mutable.ArrayBuilder[Double],
         scala.collection.mutable.ArrayBuilder[Double])]()
      var i = 0
      while (i < b.re.length) {
        val gi = g0 + i
        val n1i = (gi / n2).toInt
        val n2i = (gi % n2).toInt
        val strip = n2i / w2
        val wCols = math.min(w2, n2 - strip * w2)
        val (ob, rb, ib) = bufs.getOrElseUpdate(strip,
          (scala.collection.mutable.ArrayBuilder.make[Int],
           scala.collection.mutable.ArrayBuilder.make[Double],
           scala.collection.mutable.ArrayBuilder.make[Double]))
        ob += n1i * wCols + (n2i - strip * w2)
        rb += b.re(i)
        ib += b.im(i)
        i += 1
      }
      bufs.iterator.map { case (strip, (ob, rb, ib)) =>
        CPiece(strip, ob.result(), rb.result(), ib.result())
      }
    }

    // phase 2: per-strip column FFTs + twiddle, re-strip by rows
    val rowPieces: Dataset[CPiece] = colPieces.groupByKey(_.strip).flatMapGroups {
      (strip, it) =>
        val wCols = math.min(w2, n2 - strip * w2)
        val re = new Array[Double](n1 * wCols)
        val im = new Array[Double](n1 * wCols)
        it.foreach { p =>
          var i = 0
          while (i < p.offs.length) {
            re(p.offs(i)) = p.re(i)
            if (p.im.nonEmpty) im(p.offs(i)) = p.im(i)
            i += 1
          }
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

    // phase 3: per-row-strip FFTs over n2, emit final bins
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

  /** Distributed 1-D inverse FFT (backward norm): conj → four-step fft →
    * conj/n, folded into the output projection so it adds no extra pass.
    */
  def ifft1d(x: CArr, targetElems: Int = 65536): DataFrame = {
    val n = x.shape.head
    import org.apache.spark.sql.functions.col
    fft1dC(x.conj, targetElems)
      .select(col("k"), (col("re") / n).as("re"), (-col("im") / n).as("im"))
  }
}
