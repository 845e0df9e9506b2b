package graft.operators

import org.apache.spark.sql.functions._

/** The `dask/array/routines.py` long tail as compositions over [[GArr]]:
  * outer/vdot products, set ops (isin/union1d), nonzero families
  * (flatnonzero/nonzero/argwhere/extract), selection (select/choose/
  * piecewise), approximate equality (isclose/allclose), axis
  * reorientations (swapaxes/flipud/fliplr/rot90), and 1-D editing
  * (ediff1d/append/insert/delete). Everything here composes existing
  * narrow maps / block joins / the boolean-mask compaction — no new
  * shuffle shapes, so each inherits the underlying op's scale story.
  */
object ArrayRoutines {

  /** `np.ravel` — C-order flatten (reference `routines.py` ravel =
    * reshape((-1,))). One scatter shuffle via [[GArr.reshape]].
    */
  def ravel(a: GArr, chunk: Int = 65536): GArr =
    if (a.ndim == 1) a else a.reshape(Seq(a.numElements), Seq(chunk))

  /** `np.outer(a, b)` (`routines.py` outer): 1-D × 1-D → 2-D block grid
    * by a block-level cartesian (grid×grid tasks, the same task shape as
    * the reference's blockwise outer).
    */
  def outer(a: GArr, b: GArr): GArr = {
    require(a.ndim == 1 && b.ndim == 1, "outer needs 1-D inputs")
    val s = a.blocks.sparkSession
    import s.implicits._
    val out = a.blocks.rdd.cartesian(b.blocks.rdd).map { case (x, y) =>
      val o = new Array[Double](x.data.length * y.data.length)
      var i = 0
      while (i < x.data.length) {
        val xv = x.data(i); var j = 0
        while (j < y.data.length) { o(i * y.data.length + j) = xv * y.data(j); j += 1 }
        i += 1
      }
      ABlock(Seq(x.bid(0), y.bid(0)), o)
    }.toDS()
    GArr(Seq(a.shape(0), b.shape(0)), Seq(a.chunks(0), b.chunks(0)), out)
  }

  /** `np.vdot(a, b)` — flattened dot product (conjugation is identity on
    * reals): one co-gridded elemwise + the two-level tree reduction.
    */
  def vdot(a: GArr, b: GArr): Double = {
    val af = ravel(a); val bf0 = ravel(b)
    val bf = if (bf0.chunks == af.chunks) bf0 else bf0.rechunkTo(af.chunks)
    af.elemwise(bf)(_ * _).sumAll
  }

  /** `np.isin(a, values)` (`routines.py` isin): membership against a
    * driver-small test set, as a pure narrow map (the set ships in the
    * task closure, exactly like the reference's broadcasted kernel).
    */
  def isin(a: GArr, values: Iterable[Double]): GArr = {
    val set = values.toSet
    a.scalarMap(x => if (set.contains(x)) 1.0 else 0.0)
  }

  /** `np.union1d(a, b)` — sorted distinct union of the flattened inputs.
    * Distinct + range-sort shuffle; the output length is data-dependent
    * (compute barrier), as in the reference.
    */
  def union1d(a: GArr, b: GArr, chunk: Int = 65536): GArr = {
    val df = ravel(a).toIndexedDF.select(col("value"))
      .union(ravel(b).toIndexedDF.select(col("value")))
      .distinct().orderBy(col("value"))
    GArr.fromColumn(df, "value", Seq("value"), chunk)
  }

  /** `np.ediff1d(a)` — consecutive differences of the flattened array. */
  def ediff1d(a: GArr, chunk: Int = 65536): GArr = ravel(a, chunk).diffAxis(0)

  /** `np.unique(a)` values form (`routines.py:1769`): sorted distinct
    * values of the flattened input. Distinct + range-sort shuffle; the
    * data-dependent output length forces a compute barrier exactly as the
    * reference's unknown-chunks output does.
    */
  def unique(a: GArr, chunk: Int = 65536): GArr = {
    val df = ravel(a).toIndexedDF.select(col("value")).distinct()
    GArr.fromColumn(df, "value", Seq("value"), chunk)
  }

  /** `np.unique(a, return_counts=True)` — (values, counts) as two aligned
    * sorted 1-D arrays (one groupBy replaces the reference's per-chunk
    * unique + merge).
    */
  def uniqueCounts(a: GArr, chunk: Int = 65536): (GArr, GArr) = {
    val df = ravel(a).toIndexedDF.groupBy(col("value"))
      .agg(count(lit(1)).cast("double").as("cnt"))
    (GArr.fromColumn(df, "value", Seq("value"), chunk),
      GArr.fromColumn(df, "cnt", Seq("value"), chunk))
  }

  /** `np.tril_indices(n, k, m)` (`routines.py:2594` — nonzero over the
    * rectangular tri mask, the reference's own composition): Seq(rows,
    * cols) coordinate arrays of the lower triangle in C order.
    */
  def trilIndices(s: org.apache.spark.sql.SparkSession, n: Long, k: Long = 0L,
                  m: Long = -1L, chunk: Int = 4096): Seq[GArr] = {
    val cols = if (m > 0) m else n
    nonzero(GArr.fromFunction(s, Seq(n, cols), Seq(chunk, chunk))(g =>
      if (g(1) - g(0) <= k) 1.0 else 0.0))
  }

  /** `np.triu_indices(n, k, m)` (`routines.py:2606`). */
  def triuIndices(s: org.apache.spark.sql.SparkSession, n: Long, k: Long = 0L,
                  m: Long = -1L, chunk: Int = 4096): Seq[GArr] = {
    val cols = if (m > 0) m else n
    nonzero(GArr.fromFunction(s, Seq(n, cols), Seq(chunk, chunk))(g =>
      if (g(1) - g(0) >= k) 1.0 else 0.0))
  }

  /** dask `push(array, n=None, axis)` (`overlap.py:895`, bottleneck-style
    * forward-fill of NaN along an axis): the reference's cumreduction
    * with "fill with last seen" is exactly a two-phase [[GArr.scanAxis]]
    * in the last-non-NaN monoid — leading NaNs stay NaN. The n-limited
    * variant composes per the reference (arange distance + where).
    */
  def push(a: GArr, axis: Int): GArr =
    a.scanAxis(axis)((acc, x) => if (x.isNaN) acc else x)

  /** `np.extract(cond, a)` — compacted values where cond ≠ 0 (C order);
    * rides the boolean-mask counts-prefix path.
    */
  def extract(cond: GArr, a: GArr, chunk: Int = 65536): GArr = {
    val af = ravel(a, chunk)
    val cf0 = ravel(cond, chunk)
    val cf = if (cf0.chunks == af.chunks) cf0 else cf0.rechunkTo(af.chunks)
    af.booleanMask(cf)
  }

  /** `np.flatnonzero(a)` — flat C-order indices of nonzero cells:
    * boolean-mask an arange with the nonzero condition.
    */
  def flatnonzero(a: GArr, chunk: Int = 65536): GArr = {
    val af = ravel(a, chunk)
    val idx0 = GArr.arange(a.blocks.sparkSession, 0.0, af.shape(0).toDouble, 1.0, chunk)
    val idx = if (idx0.chunks == af.chunks) idx0 else idx0.rechunkTo(af.chunks)
    idx.booleanMask(af.scalarMap(x => if (x != 0.0) 1.0 else 0.0))
  }

  /** `np.nonzero(a)` — per-dimension coordinate arrays of nonzero cells
    * (C order): each dimension boolean-masks its own coordinate field
    * built on a's exact grid (narrow) — ndim compactions, no transposes.
    */
  def nonzero(a: GArr): Seq[GArr] = {
    val s = a.blocks.sparkSession
    val cond = a.scalarMap(x => if (x != 0.0) 1.0 else 0.0)
    val starts = a.chunks.map(c => c.scanLeft(0L)(_ + _))
    (0 until a.ndim).map { d =>
      val dd = d
      val startsB = starts.map(_.toArray)
      val coords = GArr.fromChunksGrid(s, a.shape, a.chunks) { (bid, dims) =>
        val base = Array.tabulate(dims.length)(k => startsB(k)(bid(k)))
        val o = new Array[Double](dims.product)
        val t = new Array[Int](dims.length)
        var p = 0
        while (p < o.length) {
          o(p) = (base(dd) + t(dd)).toDouble
          var k = dims.length - 1
          while (k >= 0) { t(k) += 1; if (t(k) < dims(k)) k = -2 else { t(k) = 0; k -= 1 } }
          p += 1
        }
        o
      }
      coords.booleanMask(cond)
    }
  }

  /** `np.argwhere(a)` — (k, ndim) array of nonzero coordinates: stack of
    * [[nonzero]] along a new trailing axis.
    */
  def argwhere(a: GArr): GArr = {
    val cols = nonzero(a)
    GArr.stack(cols).transpose(Seq(1, 0))
  }

  /** `np.select(condlist, choicelist, default)` — first matching
    * condition wins: a right-to-left fold of co-gridded `where`s.
    */
  def select(condlist: Seq[GArr], choicelist: Seq[GArr], default: Double = 0.0): GArr = {
    require(condlist.nonEmpty && condlist.length == choicelist.length,
      "select: condlist/choicelist length mismatch")
    val d = default
    val init = choicelist.head.scalarMap(_ => d)
    condlist.zip(choicelist).foldRight(init) { case ((c, v), acc) =>
      v.where(c, acc)
    }
  }

  /** `np.choose(idx, choices)` — cell (…) takes `choices(idx(…))(…)`. A
    * fold of k `where`s (k = #choices, driver-small as in numpy).
    */
  def choose(idx: GArr, choices: Seq[GArr]): GArr = {
    require(choices.nonEmpty, "choose of nothing")
    val init = choices.head.scalarMap(_ => 0.0)
    choices.zipWithIndex.foldLeft(init) { case (acc, (v, k)) =>
      val kk = k.toDouble
      v.where(idx.scalarMap(x => if (x == kk) 1.0 else 0.0), acc)
    }
  }

  /** `np.piecewise(x, conds, funcs)` with predicate/value functions — a
    * pure narrow map (the scalar functions ship in the closure).
    */
  def piecewise(x: GArr, conds: Seq[Double => Boolean],
                funcs: Seq[Double => Double],
                default: Double => Double = identity): GArr = {
    require(conds.length == funcs.length, "piecewise: conds/funcs length mismatch")
    val cs = conds; val fs = funcs; val df = default
    x.scalarMap { v =>
      val i = cs.indexWhere(p => p(v))
      if (i >= 0) fs(i)(v) else df(v)
    }
  }

  /** `np.isclose(a, b, rtol, atol, equal_nan)` — elementwise 0/1. */
  def isclose(a: GArr, b: GArr, rtol: Double = 1e-5, atol: Double = 1e-8,
              equalNan: Boolean = false): GArr = {
    val r = rtol; val t = atol; val en = equalNan
    val b2 = if (b.chunks == a.chunks) b else b.rechunkTo(a.chunks)
    a.elemwise(b2) { (x, y) =>
      val close =
        if (x.isNaN || y.isNaN) en && x.isNaN && y.isNaN
        else if (x.isInfinite || y.isInfinite) x == y
        else math.abs(x - y) <= t + r * math.abs(y)
      if (close) 1.0 else 0.0
    }
  }

  /** `np.allclose` — [[isclose]] AND-reduced (min) over the array. */
  def allclose(a: GArr, b: GArr, rtol: Double = 1e-5, atol: Double = 1e-8,
               equalNan: Boolean = false): Boolean =
    isclose(a, b, rtol, atol, equalNan).reduceAll(1.0)(math.min, math.min) == 1.0

  /** `np.swapaxes` — a two-element transpose permutation (narrow). */
  def swapaxes(a: GArr, ax1: Int, ax2: Int): GArr = {
    val perm = (0 until a.ndim).map(d => if (d == ax1) ax2 else if (d == ax2) ax1 else d)
    a.transpose(perm)
  }

  /** `np.flipud` / `np.fliplr` — axis flips (narrow index remaps). */
  def flipud(a: GArr): GArr = a.flipAxis(0)
  def fliplr(a: GArr): GArr = { require(a.ndim >= 2, "fliplr needs ndim>=2"); a.flipAxis(1) }

  /** `np.rot90(m, k)` on axes (0,1) — the numpy composition
    * `flip(transpose(m), 0)` iterated k mod 4 times.
    */
  def rot90(a: GArr, k: Int = 1): GArr = {
    require(a.ndim == 2, "rot90 here rotates 2-D arrays")
    ((k % 4 + 4) % 4) match {
      case 0 => a
      case 1 => a.transpose(Seq(1, 0)).flipAxis(0)
      case 2 => a.flipAxis(0).flipAxis(1)
      case _ => a.transpose(Seq(1, 0)).flipAxis(1)
    }
  }

  /** `np.atleast_2d` / `np.atleast_3d` — leading unit-axis promotion. */
  def atleast2d(a: GArr): GArr = if (a.ndim >= 2) a else a.expandDims(0)
  def atleast3d(a: GArr): GArr = a.ndim match {
    case 1 => a.expandDims(0).expandDims(2)
    case 2 => a.expandDims(2)
    case _ => a
  }

  /** `np.append(a, b, axis)` — concatenate (flattens both when axis is
    * unset, per numpy).
    */
  def append(a: GArr, b: GArr, axis: Option[Int] = None): GArr = axis match {
    case Some(ax) => GArr.concatenate(ax, Seq(a, b))
    case None     => GArr.concatenate(0, Seq(ravel(a), ravel(b)))
  }

  /** `np.delete(a, indices)` on a 1-D array — keep-mask compaction
    * (negative indices wrap, as np.delete).
    */
  def delete1d(a: GArr, indices: Iterable[Long]): GArr = {
    require(a.ndim == 1, "delete1d is the 1-D form")
    val n = a.shape(0)
    val drop = indices.map(i => if (i < 0) i + n else i).toSet
    val starts = a.chunks(0).scanLeft(0L)(_ + _).toArray
    val keep = GArr.fromChunksGrid(a.blocks.sparkSession, a.shape, a.chunks) { (bid, dims) =>
      val base = starts(bid(0))
      Array.tabulate(dims(0))(i => if (drop.contains(base + i)) 0.0 else 1.0)
    }
    a.booleanMask(keep)
  }

  /** `np.insert(a, pos, values)` on a 1-D array — three-way concat of the
    * split halves around the insertion point (narrow).
    */
  def insert1d(a: GArr, pos: Long, values: GArr): GArr = {
    require(a.ndim == 1 && values.ndim == 1, "insert1d is the 1-D form")
    val n = a.shape(0)
    val p = if (pos < 0) pos + n else pos
    require(p >= 0 && p <= n, s"insert1d: position $pos out of bounds for length $n")
    val parts = Seq(
      if (p > 0) Some(a.slice(Seq((0L, p, 1L)))) else None,
      Some(values),
      if (p < n) Some(a.slice(Seq((p, n, 1L)))) else None).flatten
    GArr.concatenate(0, parts)
  }

  /** `np.unravel_index(indices, dims)` (`routines.py` unravel_index):
    * per-output-dimension narrow maps — coordinate d of flat index i is
    * `(i / stride(d)) % dims(d)`, exact in Long for any index < 2⁵³.
    */
  def unravelIndex(a: GArr, dims: Seq[Long]): Seq[GArr] = {
    require(dims.forall(_ > 0), s"unravelIndex: bad dims $dims")
    val strides = dims.scanRight(1L)(_ * _).tail
    dims.indices.map { d =>
      val str = strides(d); val dim = dims(d)
      a.scalarMap(x => ((x.toLong / str) % dim).toDouble)
    }
  }

  /** `np.ravel_multi_index(coords, dims)` (`routines.py`
    * ravel_multi_index): a left fold of co-gridded blockwise zips —
    * acc·dims(d) + coord(d), exact in the double's 53-bit integer range.
    */
  def ravelMultiIndex(coords: Seq[GArr], dims: Seq[Long]): GArr = {
    require(coords.nonEmpty && coords.length == dims.length,
      "ravelMultiIndex: one coordinate array per dimension")
    coords.tail.zip(dims.tail).foldLeft(coords.head) { case (acc, (c, dim)) =>
      acc.elemwise(c)((a, b) => a * dim + b)
    }
  }

  /** `np.meshgrid` over 1-D chunked inputs (`routines.py` meshgrid —
    * dask lowers it to broadcast ops; same here): output i keeps array
    * i's values along its own axis and is tiled along every other, via
    * [[GArr.expandDims]] + the narrow [[GArr.broadcastAxis]]. With
    * evenly-chunked inputs the N outputs land on ONE shared chunk grid,
    * so downstream elementwise combinations (the typical use) are
    * co-partitioned block zips.
    */
  def meshgrid(arrs: Seq[GArr], indexing: String = "xy"): Seq[GArr] = {
    require(arrs.nonEmpty && arrs.forall(_.ndim == 1), "meshgrid takes 1-D arrays")
    require(indexing == "xy" || indexing == "ij", s"meshgrid: bad indexing '$indexing'")
    val n = arrs.length
    // numpy 'xy' (the default) swaps the first two output axes vs 'ij'
    def axisOf(i: Int): Int =
      if (indexing == "xy" && n >= 2) (if (i == 0) 1 else if (i == 1) 0 else i) else i
    val ownerOf = (0 until n).map(pos => (0 until n).find(i => axisOf(i) == pos).get)
    val outShape = ownerOf.map(arrs(_).shape.head)
    val chunkOf = ownerOf.map(arrs(_).chunks.head.head)
    arrs.zipWithIndex.map { case (x, i) =>
      val ax = axisOf(i)
      var g = x
      var d = 0
      while (d < ax) { g = g.expandDims(0); d += 1 }
      d = ax + 1
      while (d < n) { g = g.expandDims(d); d += 1 }
      (0 until n).filter(_ != ax).foldLeft(g)((acc, pos) =>
        acc.broadcastAxis(pos, outShape(pos), chunkOf(pos)))
    }
  }

  /** `np.indices(shape)` — one grid-parallel [[GArr.fromFunction]] per
    * dimension, zero driver data (the creation-suite pattern).
    */
  def indicesArr(s: org.apache.spark.sql.SparkSession, shape: Seq[Long],
                 chunkSizes: Seq[Int]): Seq[GArr] =
    shape.indices.map(d => GArr.fromFunction(s, shape, chunkSizes)(g => g(d).toDouble))

  /** `np.apply_over_axes(func, a, axes)` (`routines.py` apply_over_axes):
    * fold `f` over the axes in order; when `f` reduces the axis away
    * (our reduction methods drop it), re-insert it at length 1 exactly as
    * numpy does, so later axis numbers keep their meaning.
    */
  def applyOverAxes(a: GArr, axes: Seq[Int])(f: (GArr, Int) => GArr): GArr =
    axes.foldLeft(a) { (acc, ax0) =>
      val ax = if (ax0 < 0) ax0 + acc.ndim else ax0
      val r = f(acc, ax)
      if (r.ndim == acc.ndim) r
      else if (r.ndim == acc.ndim - 1) r.expandDims(ax)
      else throw new IllegalArgumentException(
        s"applyOverAxes: function changed ndim ${acc.ndim} -> ${r.ndim}")
    }
}
