package graft.operators

import graft.SparkTestBase

/** Randomized property suite for the chunked-ndarray module: deterministic
  * pseudo-random shapes, chunkings, and op chains, each checked cell-exact
  * against a driver-local dense reference. This pins the distributed
  * machinery (scatter regrids, halo routing, scan offsets, partial-merge
  * reductions) on inputs no hand-written case would pick.
  */
class BlockArrayPropSpec extends SparkTestBase {

  private def indexed(a: GArr): Map[Long, Double] =
    a.toIndexedDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  /** Dense C-order reference. */
  private final class Dense(val shape: Seq[Long], val data: Array[Double]) {
    def apply(g: Seq[Int]): Double = {
      var off = 0L; var d = 0
      while (d < shape.length) { off = off * shape(d) + g(d); d += 1 }
      data(off.toInt)
    }
  }

  private def checkEqual(a: GArr, ref: Dense, tag: String): Unit = {
    assert(a.shape == ref.shape, s"$tag shape ${a.shape} vs ${ref.shape}")
    val got = indexed(a)
    assert(got.size == ref.data.length, s"$tag cell count")
    var i = 0
    while (i < ref.data.length) {
      val g = got(i.toLong)
      val e = ref.data(i)
      assert(g == e || (g.isNaN && e.isNaN), s"$tag idx $i: $g vs $e")
      i += 1
    }
  }

  test("random 2-D chains: slice/rechunk/transpose/flip/scan/reduce vs dense") {
    val rnd = new scala.util.Random(1234)
    for (trial <- 0 until 8) {
      val rows = 2 + rnd.nextInt(11)
      val cols = 2 + rnd.nextInt(9)
      val c0 = 1 + rnd.nextInt(rows)
      val c1 = 1 + rnd.nextInt(cols)
      val vals = Array.fill(rows * cols)(math.floor(rnd.nextDouble() * 9) - 4)
      val a0 = GArr.fromFunction(spark, Seq(rows.toLong, cols.toLong), Seq(c0, c1))(
        g => vals((g(0) * cols + g(1)).toInt))
      var dense = vals.clone()
      var shape = Seq(rows.toLong, cols.toLong)
      var arr = a0

      // op 1: strided slice on both dims
      val (s0, st0) = (rnd.nextInt(rows), 1 + rnd.nextInt(3))
      val (s1, st1) = (rnd.nextInt(cols), 1 + rnd.nextInt(3))
      val keep0 = (s0 until rows by st0).toArray
      val keep1 = (s1 until cols by st1).toArray
      if (keep0.nonEmpty && keep1.nonEmpty) {
        arr = arr.slice(Seq((s0.toLong, rows.toLong, st0.toLong),
          (s1.toLong, cols.toLong, st1.toLong)), targetChunk = 1 + rnd.nextInt(16))
        dense = for (i <- keep0; j <- keep1) yield dense(i * cols + j)
        shape = Seq(keep0.length.toLong, keep1.length.toLong)

        // op 2: rechunk to a random grid
        arr = arr.rechunk(Seq(1 + rnd.nextInt(keep0.length), 1 + rnd.nextInt(keep1.length)))

        // op 3: maybe transpose, maybe flip
        if (rnd.nextBoolean()) {
          arr = arr.transpose(Seq(1, 0))
          val (r2, c2) = (shape(1).toInt, shape(0).toInt)
          dense = (for (i <- 0 until r2; j <- 0 until c2) yield dense(j * r2 + i)).toArray
          shape = Seq(r2.toLong, c2.toLong)
        }
        if (rnd.nextBoolean()) {
          val ax = rnd.nextInt(2)
          arr = arr.flipAxis(ax)
          val (r2, c2) = (shape(0).toInt, shape(1).toInt)
          dense = (for (i <- 0 until r2; j <- 0 until c2) yield {
            val (si, sj) = if (ax == 0) (r2 - 1 - i, j) else (i, c2 - 1 - j)
            dense(si * c2 + sj)
          }).toArray
        }

        // op 4: cumulative scan along a random axis
        val sax = rnd.nextInt(2)
        val scanOp = rnd.nextInt(3)
        val (r2, c2) = (shape(0).toInt, shape(1).toInt)
        arr = scanOp match {
          case 0 => arr.cumsumAxis(sax)
          case 1 => arr.cummaxAxis(sax)
          case 2 => arr.cumminAxis(sax)
        }
        val fn: (Double, Double) => Double = scanOp match {
          case 0 => _ + _
          case 1 => math.max
          case 2 => math.min
        }
        val scanned = dense.clone()
        if (sax == 0)
          for (j <- 0 until c2; i <- 1 until r2)
            scanned(i * c2 + j) = fn(scanned((i - 1) * c2 + j), scanned(i * c2 + j))
        else
          for (i <- 0 until r2; j <- 1 until c2)
            scanned(i * c2 + j) = fn(scanned(i * c2 + j - 1), scanned(i * c2 + j))
        dense = scanned
        checkEqual(arr, new Dense(shape, dense), s"trial $trial chain")

        // op 5: reduce a random axis and compare
        val rax = rnd.nextInt(2)
        val redOp = rnd.nextInt(3)
        val red = redOp match {
          case 0 => arr.sumAxis(rax)
          case 1 => arr.minAxis(rax)
          case 2 => arr.maxAxis(rax)
        }
        val keep = if (rax == 0) c2 else r2
        val other = if (rax == 0) r2 else c2
        val redRef = Array.tabulate(keep) { k =>
          val lane = (0 until other).map(o =>
            if (rax == 0) dense(o * c2 + k) else dense(k * c2 + o))
          redOp match {
            case 0 => lane.sum
            case 1 => lane.min
            case 2 => lane.max
          }
        }
        checkEqual(red, new Dense(Seq(keep.toLong), redRef), s"trial $trial reduce")
      }
    }
  }

  test("random 3-D: reshape round-trips and axis reductions vs dense") {
    val rnd = new scala.util.Random(99)
    for (trial <- 0 until 5) {
      val dims = Seq.fill(3)(2 + rnd.nextInt(4))
      val n = dims.product
      val vals = Array.fill(n)(math.floor(rnd.nextDouble() * 20) - 10)
      val a = GArr.fromFunction(spark,
        dims.map(_.toLong), dims.map(d => 1 + rnd.nextInt(d)))(
        g => vals(((g(0) * dims(1) + g(1)) * dims(2) + g(2)).toInt))
      // reshape to 1-D and back keeps the C-order identity
      val flat = a.reshape(Seq(n.toLong), Seq(1 + rnd.nextInt(n)))
      checkEqual(flat, new Dense(Seq(n.toLong), vals), s"t$trial flat")
      val back = flat.reshape(dims.map(_.toLong), dims.map(d => 1 + rnd.nextInt(d)))
      checkEqual(back, new Dense(dims.map(_.toLong), vals), s"t$trial back")
      // reduce a random axis
      val ax = rnd.nextInt(3)
      val red = a.sumAxis(ax)
      val keepDims = dims.indices.filterNot(_ == ax).map(dims)
      val ref = new Array[Double](keepDims.product)
      for (i <- 0 until dims(0); j <- 0 until dims(1); k <- 0 until dims(2)) {
        val v = vals((i * dims(1) + j) * dims(2) + k)
        val rest = Seq(i, j, k).zipWithIndex.filterNot(_._2 == ax).map(_._1)
        ref(rest.head * keepDims(1) + rest(1)) += v
      }
      checkEqual(red, new Dense(keepDims.map(_.toLong), ref), s"t$trial red ax=$ax")
    }
  }

  test("random mapOverlap depths (may span chunks) vs dense windowed sum") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 6) {
      val n = 4 + rnd.nextInt(20)
      val chunk = 1 + rnd.nextInt(n)
      val depth = 1 + rnd.nextInt(6) // may exceed chunk
      val xs = Array.fill(n)(math.floor(rnd.nextDouble() * 10))
      val a = GArr.fromFunction(spark, Seq(n.toLong), Seq(chunk))(g => xs(g(0).toInt))
      val sm = a.mapOverlapAxis(0, depth) { (halo, before, after, hdims) =>
        val len = hdims(0) - before - after
        Array.tabulate(len) { c =>
          val ctr = before + c
          (math.max(0, ctr - depth) to math.min(hdims(0) - 1, ctr + depth))
            .map(halo).sum
        }
      }
      val ref = Array.tabulate(n)(i =>
        (math.max(0, i - depth) to math.min(n - 1, i + depth)).map(xs).sum)
      checkEqual(sm, new Dense(Seq(n.toLong), ref),
        s"trial $trial n=$n chunk=$chunk depth=$depth")
    }
  }

  test("mapOverlapAxisBoundary modes vs dense padded windowed sum") {
    val rnd = new scala.util.Random(31)
    for (trial <- 0 until 5; mode <- Seq("reflect", "nearest", "periodic", "constant")) {
      val n = 5 + rnd.nextInt(16)
      val chunk = 1 + rnd.nextInt(n)
      val depth = 1 + rnd.nextInt(math.min(4, n - 1)) // reflect needs depth < n
      val cval = -3.0
      val xs = Array.fill(n)(math.floor(rnd.nextDouble() * 10))
      // dense reference: extend by depth per mode, then full-window sum
      def ext(i: Int): Double = {
        if (i >= 0 && i < n) xs(i)
        else mode match {
          case "nearest"  => if (i < 0) xs(0) else xs(n - 1)
          case "reflect"  => if (i < 0) xs(-i) else xs(2 * n - 2 - i)
          case "periodic" => xs(((i % n) + n) % n)
          case "constant" => cval
        }
      }
      val ref = Array.tabulate(n)(i => (i - depth to i + depth).map(ext).sum)
      val a = GArr.fromFunction(spark, Seq(n.toLong), Seq(chunk))(g => xs(g(0).toInt))
      val sm = a.mapOverlapAxisBoundary(0, depth, mode, cval) { (halo, before, after, hdims) =>
        val len = hdims(0) - before - after
        Array.tabulate(len) { c =>
          val ctr = before + c
          (math.max(0, ctr - depth) to math.min(hdims(0) - 1, ctr + depth))
            .map(halo).sum
        }
      }
      assert(sm.chunks == a.chunks,
        s"boundary mode must preserve chunk structure: ${sm.chunks} vs ${a.chunks}")
      checkEqual(sm, new Dense(Seq(n.toLong), ref),
        s"trial $trial mode=$mode n=$n chunk=$chunk depth=$depth")
    }
    // 2-D: boundary along axis 0 only, other axis untouched
    val xs2 = Array.tabulate(7 * 4)(i => math.floor((i * 13 % 9)).toDouble)
    val a2 = GArr.fromFunction(spark, Seq(7L, 4L), Seq(3, 2))(
      g => xs2((g(0) * 4 + g(1)).toInt))
    def at(i: Int, j: Int): Double = {
      val ii = if (i < 0) -i else if (i >= 7) 2 * 7 - 2 - i else i // reflect
      xs2(ii * 4 + j)
    }
    val ref2 = Array.tabulate(7 * 4) { idx =>
      val i = idx / 4; val j = idx % 4
      (i - 2 to i + 2).map(at(_, j)).sum
    }
    val sm2 = a2.mapOverlapAxisBoundary(0, 2, "reflect") { (halo, before, after, hdims) =>
      val cols = hdims(1)
      val coreRows = hdims(0) - before - after
      Array.tabulate(coreRows * cols) { idx =>
        val r = before + idx / cols; val c = idx % cols
        (math.max(0, r - 2) to math.min(hdims(0) - 1, r + 2))
          .map(rr => halo(rr * cols + c)).sum
      }
    }
    checkEqual(sm2, new Dense(Seq(7L, 4L), ref2), "2-D reflect")
  }

  test("medianAxis/quantileAxis vs dense sorted lanes (multi-chunk axis rechunks)") {
    val rnd = new scala.util.Random(53)
    for (trial <- 0 until 4) {
      val rows = 3 + rnd.nextInt(12)
      val cols = 2 + rnd.nextInt(6)
      val c0 = 1 + rnd.nextInt(rows)
      val c1 = 1 + rnd.nextInt(cols)
      val vals = Array.fill(rows * cols)(math.floor(rnd.nextDouble() * 19) - 9)
      val a = GArr.fromFunction(spark, Seq(rows.toLong, cols.toLong), Seq(c0, c1))(
        g => vals((g(0) * cols + g(1)).toInt))
      for (q <- Seq(0.0, 0.25, 0.5, 0.9, 1.0)) {
        val got = indexed(a.quantileAxis(0, q))
        for (j <- 0 until cols) {
          val lane = (0 until rows).map(i => vals(i * cols + j)).sorted
          val pos = q * (rows - 1)
          val lo = pos.toInt; val hi = math.min(lo + 1, rows - 1)
          val want = lane(lo) * (1.0 - (pos - lo)) + lane(hi) * (pos - lo)
          assert(math.abs(got(j.toLong) - want) < 1e-12,
            s"trial $trial q=$q col $j: ${got(j.toLong)} vs $want")
        }
      }
      val med = indexed(a.medianAxis(1))
      for (i <- 0 until rows) {
        val lane = (0 until cols).map(j => vals(i * cols + j)).sorted
        val pos = 0.5 * (cols - 1)
        val lo = pos.toInt; val hi = math.min(lo + 1, cols - 1)
        val want = lane(lo) * (1.0 - (pos - lo)) + lane(hi) * (pos - lo)
        assert(math.abs(med(i.toLong) - want) < 1e-12, s"median row $i")
      }
    }
  }

  test("nanargmin/nanargmax: skip NaN, first-occurrence ties, all-NaN -> -1") {
    val grid = Array(
      5.0, Double.NaN, Double.NaN,
      1.0, 2.0, Double.NaN,
      1.0, Double.NaN, Double.NaN,
      3.0, 2.0, Double.NaN)
    val a = GArr.fromFunction(spark, Seq(4L, 3L), Seq(2, 2))(
      g => grid((g(0) * 3 + g(1)).toInt))
    val mn = indexed(a.nanargminAxis(0))
    assert(mn(0L) == 1.0 && mn(1L) == 1.0 && mn(2L) == -1.0)
    val mx = indexed(a.nanargmaxAxis(0))
    assert(mx(0L) == 0.0 && mx(1L) == 1.0 && mx(2L) == -1.0)
  }

  test("random ndim updatedFancy along every axis vs dense last-wins reference") {
    val rnd = new scala.util.Random(20260815)
    for (trial <- 0 until 10) {
      val nd = 1 + rnd.nextInt(3)
      val shape = Seq.fill(nd)(2 + rnd.nextInt(6))
      val chunks = shape.map(s => 1 + rnd.nextInt(s))
      val n = shape.product
      val vals = Array.fill(n)(math.floor(rnd.nextDouble() * 90))
      val strides = shape.scanRight(1)(_ * _).tail
      val a = GArr.fromFunction(spark, shape.map(_.toLong), chunks)(g =>
        vals(g.zip(strides).map { case (x, s) => x * s }.sum.toInt))
      val ax = rnd.nextInt(nd)
      val k = 1 + rnd.nextInt(shape(ax) + 2) // duplicates + negatives likely
      val idxVals = Array.fill(k)(rnd.nextInt(2 * shape(ax)) - shape(ax))
      val idx = GArr.fromFunction(spark, Seq(k.toLong), Seq(1 + rnd.nextInt(k)))(g =>
        idxVals(g(0).toInt).toDouble)
      val vShape = shape.updated(ax, k)
      val vChunks = vShape.map(s => 1 + rnd.nextInt(s))
      val vStrides = vShape.scanRight(1)(_ * _).tail
      val v = GArr.fromFunction(spark, vShape.map(_.toLong), vChunks)(g =>
        1000.0 + g.zip(vStrides).map { case (x, s) => x * s }.sum)
      val got = a.updatedFancy(idx, v, ax)
      // dense last-wins reference: apply writes in index order
      val dense = vals.clone()
      for (j <- 0 until k) {
        val tgt = if (idxVals(j) < 0) idxVals(j) + shape(ax) else idxVals(j)
        // every cell of value-slab j writes into base-slab tgt
        val lanes = vShape.updated(ax, 1)
        val t = Array.fill(nd)(0)
        var p = 0
        val total = lanes.product
        while (p < total) {
          val vg = t.toSeq.updated(ax, j)
          val bg = t.toSeq.updated(ax, tgt)
          val vOff = vg.zip(vStrides).map { case (x, s) => x * s }.sum
          val bOff = bg.zip(strides).map { case (x, s) => x * s }.sum
          dense(bOff) = 1000.0 + vOff
          // odometer over non-axis dims
          var d = nd - 1
          var carry = true
          while (carry && d >= 0) {
            if (d == ax) d -= 1
            else {
              t(d) += 1
              if (t(d) == lanes(d)) { t(d) = 0; d -= 1 } else carry = false
            }
          }
          p += 1
        }
      }
      checkEqual(got, new Dense(shape.map(_.toLong), dense),
        s"trial$trial nd=$nd ax=$ax shape=$shape chunks=$chunks k=$k idx=${idxVals.toSeq}")
      assert(got.chunks == a.chunks, s"trial$trial output keeps the base grid")
    }
  }

  test("random ndim maskedAssign vs dense global-C-order reference") {
    val rnd = new scala.util.Random(9915)
    for (trial <- 0 until 8) {
      val nd = 1 + rnd.nextInt(3)
      val shape = Seq.fill(nd)(2 + rnd.nextInt(6))
      val chunks = shape.map(s => 1 + rnd.nextInt(s))
      val n = shape.product
      val vals = Array.fill(n)(math.floor(rnd.nextDouble() * 90))
      val sel = Array.fill(n)(rnd.nextBoolean())
      if (!sel.exists(identity)) sel(0) = true // empty-selection edge is q-gated elsewhere
      val strides = shape.scanRight(1)(_ * _).tail
      def off(g: Seq[Int]) = g.zip(strides).map { case (x, s) => x * s }.sum
      val a = GArr.fromFunction(spark, shape.map(_.toLong), chunks)(g => vals(off(g.map(_.toInt)).toInt))
      val mask = GArr.fromFunction(spark, shape.map(_.toLong), chunks)(g =>
        if (sel(off(g.map(_.toInt)).toInt)) 1.0 else 0.0)
      val k = sel.count(identity)
      val values = GArr.fromFunction(spark, Seq(k.toLong), Seq(1 + rnd.nextInt(k + 1)))(g =>
        500.0 + g(0))
      val got = a.maskedAssign(mask, values)
      val dense = vals.clone()
      var r = 0
      for (i <- 0 until n if sel(i)) { dense(i) = 500.0 + r; r += 1 }
      checkEqual(got, new Dense(shape.map(_.toLong), dense),
        s"trial$trial nd=$nd shape=$shape chunks=$chunks k=$k")
    }
  }

  test("random vindex: 1..3-D bases, random indexed-axis subsets, broadcast index shapes") {
    val rnd = new scala.util.Random(20821)
    for (trial <- 0 until 8) {
      val nd = 1 + rnd.nextInt(3)
      val shape = Seq.fill(nd)(2 + rnd.nextInt(6))
      val chunks = shape.map(s => 1 + rnd.nextInt(s))
      val n = shape.product
      val vals = Array.fill(n)(math.floor(rnd.nextDouble() * 99))
      def off(g: Seq[Int]): Long = g.zip(shape).foldLeft(0L) { case (acc, (i, s)) => acc * s + i }
      val a = GArr.fromFunction(spark, shape.map(_.toLong), chunks)(
        g => vals(off(g.map(_.toInt)).toInt))
      // pick a nonempty axis subset to index; the rest stay whole
      val axes = (0 until nd).filter(_ => rnd.nextBoolean()) match {
        case s if s.nonEmpty => s
        case _               => Seq(rnd.nextInt(nd))
      }
      val npts = 1 + rnd.nextInt(7)
      // one array may ride a broadcastable (npts,1)/(1,npts)-style shape;
      // keep it 1-D here (broadcast shapes are pinned by the unit tests)
      // and let entries include negative wraps
      val arrs: Map[Int, (Seq[Long], Array[Long])] = axes.map { ax =>
        val idx = Array.fill(npts)(
          (rnd.nextInt(2 * shape(ax)) - shape(ax)).toLong) // in [-s, s)
        ax -> ((Seq(npts.toLong), idx))
      }.toMap
      val salt = 1 + rnd.nextInt(2)
      val got = a.vindex(arrs, targetChunk = 1 + rnd.nextInt(8), salt = salt)
      val rest = (0 until nd).filterNot(axes.contains)
      val outShape = npts.toLong +: rest.map(shape(_).toLong)
      // dense reference: point-major, then the untouched axes in order
      val restSizes = rest.map(shape)
      val dense = new Array[Double](npts * restSizes.product)
      var w = 0
      for (p <- 0 until npts) {
        val fixed = axes.map(ax => {
          val raw = arrs(ax)._2(p)
          (if (raw < 0) raw + shape(ax) else raw).toInt
        })
        def walk(d: Int, g: Array[Int]): Unit =
          if (d == rest.length) { dense(w) = vals(off(g.toSeq).toInt); w += 1 }
          else { var i = 0; while (i < shape(rest(d))) { g(rest(d)) = i; walk(d + 1, g); i += 1 } }
        val g = new Array[Int](nd)
        axes.zip(fixed).foreach { case (ax, v) => g(ax) = v }
        walk(0, g)
      }
      checkEqual(got, new Dense(outShape, dense),
        s"trial$trial nd=$nd shape=$shape chunks=$chunks axes=$axes npts=$npts salt=$salt")
    }
  }
}
