package graft.operators

/** Masked chunked arrays — the reference's `dask/array/ma.py` module
  * re-expressed as a (data, mask) pair of co-gridded [[GArr]]s. The mask
  * uses numpy's convention: 1.0 = MASKED (invalid), 0.0 = valid. Every
  * constructor/transform is a narrow per-block map or a co-gridded
  * block join (the same shapes [[GArr.elemwise]]/[[GArr.where]] use), so
  * the tier adds zero new shuffle patterns.
  *
  * Masked reductions follow `np.ma` semantics: masked cells contribute
  * nothing (sum treats them as 0 with a separate validity count; mean /
  * average divide by the count of VALID cells, not the axis length).
  */
final case class MaskedArr(data: GArr, mask: GArr, fillValue: Double = 1e20) {
  require(data.shape == mask.shape && data.chunks == mask.chunks,
    s"masked array: data/mask grids differ: ${data.shape} vs ${mask.shape}")

  /** `ma.filled(a, v)` (`ma.py:25`): data with masked cells replaced. */
  def filled(fill: Double = fillValue): GArr = {
    val f = fill
    data.elemwise(mask)((x, m) => if (m != 0.0) f else x)
  }

  /** `ma.getdata` (`ma.py:110`) — the raw payload, mask ignored. */
  def getdata: GArr = data

  /** `ma.getmaskarray` (`ma.py:116`) — the mask as a 0/1 array. */
  def getmaskarray: GArr = mask

  /** `ma.set_fill_value` (`ma.py:165`) — metadata-only, returns a copy. */
  def withFillValue(fv: Double): MaskedArr = copy(fillValue = fv)

  /** `ma.count(a, axis)` (`ma.py:185`): VALID cells along the axis. */
  def countAxis(axis: Int): GArr = mask.scalarMap(m => 1.0 - m).sumAxis(axis)

  /** Total valid-cell count. */
  def count(): Long = math.round(mask.scalarMap(m => 1.0 - m).sumAll)

  /** Masked sum along an axis — masked cells contribute 0. */
  def sumAxis(axis: Int): GArr =
    data.elemwise(mask)((x, m) => if (m != 0.0) 0.0 else x).sumAxis(axis)

  /** Masked mean along an axis: sum / count-of-valid (NaN where the whole
    * lane is masked, matching np.ma's `masked` result lifted to float).
    */
  def meanAxis(axis: Int): GArr =
    sumAxis(axis).elemwise(countAxis(axis))((s, c) => if (c == 0.0) Double.NaN else s / c)

  /** `ma.average(a, weights)` over the whole array (`ma.py:176`):
    * Σ wᵢxᵢ / Σ wᵢ over VALID cells only.
    */
  def average(weights: Option[GArr] = None): Double = weights match {
    case None =>
      val s = data.elemwise(mask)((x, m) => if (m != 0.0) 0.0 else x).sumAll
      val c = mask.scalarMap(m => 1.0 - m).sumAll
      if (c == 0.0) Double.NaN else s / c
    case Some(w) =>
      val wx = data.elemwise(w)(_ * _).elemwise(mask)((v, m) => if (m != 0.0) 0.0 else v)
      val wv = w.elemwise(mask)((v, m) => if (m != 0.0) 0.0 else v)
      val den = wv.sumAll
      if (den == 0.0) Double.NaN else wx.sumAll / den
  }

  /** Elementwise map on the payload, mask carried through (`_wrap_masked`
    * shape, `ma.py:30`).
    */
  def mapData(f: Double => Double): MaskedArr = copy(data = data.scalarMap(f))

  /** Union of masks under a binary op (np.ma arithmetic semantics). */
  def binop(other: MaskedArr)(op: (Double, Double) => Double): MaskedArr =
    MaskedArr(data.elemwise(other.data)(op),
      mask.elemwise(other.mask)((a, b) => if (a != 0.0 || b != 0.0) 1.0 else 0.0),
      fillValue)

  /** `ma.fix_invalid` (`ma.py:104`): mask NaN/Inf cells and replace their
    * payload with the fill value.
    */
  def fixInvalid(fill: Double = fillValue): MaskedArr = {
    val f = fill
    val bad = data.scalarMap(x => if (x.isNaN || x.isInfinite) 1.0 else 0.0)
    MaskedArr(
      data.scalarMap(x => if (x.isNaN || x.isInfinite) f else x),
      mask.elemwise(bad)((a, b) => if (a != 0.0 || b != 0.0) 1.0 else 0.0),
      fillValue)
  }

  /** `np.ma.compressed` — the VALID cells as a 1-D array (C order):
    * boolean-mask compaction with the inverted mask.
    */
  def compressed(chunk: Int = 65536): GArr = {
    val df = ArrayRoutines.ravel(data, chunk)
    val mf0 = ArrayRoutines.ravel(mask.scalarMap(m => 1.0 - m), chunk)
    val mf = if (mf0.chunks == df.chunks) mf0 else mf0.rechunkTo(df.chunks)
    df.booleanMask(mf)
  }

  /** `ma.nonzero` (`ma.py:217`): nonzero of `data * ~mask` — masked cells
    * never count as nonzero.
    */
  def nonzero(): Seq[GArr] =
    ArrayRoutines.nonzero(data.elemwise(mask)((x, m) => if (m != 0.0) 0.0 else x))

  /** `ma.where(cond, x, y)` (`ma.py:222`) — per-cell pick; chosen cell's
    * mask travels with its payload (np.ma.where semantics).
    */
  def maWhere(cond: GArr, other: MaskedArr): MaskedArr =
    MaskedArr(data.where(cond, other.data), mask.where(cond, other.mask), fillValue)

  /** `ma.ones_like` / `ma.zeros_like` (`ma.py:199,205`): payload replaced,
    * mask preserved, per np.ma.
    */
  def onesLike: MaskedArr = copy(data = data.scalarMap(_ => 1.0))
  def zerosLike: MaskedArr = copy(data = data.scalarMap(_ => 0.0))
}

object MaskedArr {

  /** `ma.masked_array(data, mask)` (`ma.py:128`); no mask = all-valid. */
  def apply(data: GArr): MaskedArr =
    new MaskedArr(data, data.scalarMap(_ => 0.0))

  /** `ma.masked_where(condition, a)` (`ma.py:77`). */
  def maskedWhere(cond: GArr, a: GArr): MaskedArr =
    new MaskedArr(a, cond.scalarMap(c => if (c != 0.0) 1.0 else 0.0))

  /** `ma.masked_equal(a, value)` (`ma.py:51`). */
  def maskedEqual(a: GArr, value: Double): MaskedArr = {
    val v = value
    new MaskedArr(a, a.scalarMap(x => if (x == v) 1.0 else 0.0))
  }

  /** `ma.masked_values(a, value, rtol, atol)` (`ma.py:94`) — approximate
    * equality masking for floats.
    */
  def maskedValues(a: GArr, value: Double,
                   rtol: Double = 1e-5, atol: Double = 1e-8): MaskedArr = {
    val v = value; val r = rtol; val t = atol
    new MaskedArr(a,
      a.scalarMap(x => if (math.abs(x - v) <= t + r * math.abs(v)) 1.0 else 0.0))
  }

  /** `ma.masked_invalid(a)` (`ma.py:60`): mask NaN and ±Inf. */
  def maskedInvalid(a: GArr): MaskedArr =
    new MaskedArr(a, a.scalarMap(x => if (x.isNaN || x.isInfinite) 1.0 else 0.0))

  /** `ma.masked_inside(x, v1, v2)` (`ma.py:65`) — interval is inclusive,
    * order-insensitive, per the numpy contract.
    */
  def maskedInside(a: GArr, v1: Double, v2: Double): MaskedArr = {
    val lo = math.min(v1, v2); val hi = math.max(v1, v2)
    new MaskedArr(a, a.scalarMap(x => if (x >= lo && x <= hi) 1.0 else 0.0))
  }

  /** `ma.masked_outside(x, v1, v2)` (`ma.py:71`). */
  def maskedOutside(a: GArr, v1: Double, v2: Double): MaskedArr = {
    val lo = math.min(v1, v2); val hi = math.max(v1, v2)
    new MaskedArr(a, a.scalarMap(x => if (x < lo || x > hi) 1.0 else 0.0))
  }

  /** The `_wrap_masked` comparison family (`ma.py:30-48`):
    * masked_greater / greater_equal / less / less_equal / not_equal.
    */
  def maskedGreater(a: GArr, v: Double): MaskedArr =
    new MaskedArr(a, a.scalarMap(x => if (x > v) 1.0 else 0.0))
  def maskedGreaterEqual(a: GArr, v: Double): MaskedArr =
    new MaskedArr(a, a.scalarMap(x => if (x >= v) 1.0 else 0.0))
  def maskedLess(a: GArr, v: Double): MaskedArr =
    new MaskedArr(a, a.scalarMap(x => if (x < v) 1.0 else 0.0))
  def maskedLessEqual(a: GArr, v: Double): MaskedArr =
    new MaskedArr(a, a.scalarMap(x => if (x <= v) 1.0 else 0.0))
  def maskedNotEqual(a: GArr, v: Double): MaskedArr =
    new MaskedArr(a, a.scalarMap(x => if (x != v) 1.0 else 0.0))
}
