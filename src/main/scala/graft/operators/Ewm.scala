package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Decay parameterization + option surface of pandas/dask `ewm` (pandas
  * `core/window/ewm.py`): `com`, `span` and `halflife` are pure alpha
  * transforms; `adjust` and `ignoreNa` change the weight scheme:
  *
  *   - adjust=true  (default): w_i = (1-α)^{d_i} — the expanding-window
  *     weighted mean, mean = S/W.
  *   - adjust=false: the recurrence y_t = (1-α)·y_{t-1} + α·x_t seeded
  *     with y_0 = x_0 — equivalently the SAME decayed sums with the
  *     first observation weighted 1 and every later one weighted α
  *     (total weight is exactly 1 from the first observation on).
  *   - ignoreNa=false (default): nulls decay the accumulators (weights
  *     count ROW distance); ignoreNa=true: nulls are skipped entirely
  *     (weights count OBSERVATION distance).
  *
  * Variance always uses the pandas bias=False correction
  * W²/(W²−W2)·(S2/W − mean²) over whichever weight scheme is active.
  */
final case class EwmParams(alpha: Double, adjust: Boolean = true,
                           ignoreNa: Boolean = false) {
  require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1): $alpha")
}

object EwmParams {
  def alpha(a: Double): EwmParams = EwmParams(a)
  /** center of mass: alpha = 1/(1+com), com >= 0 */
  def com(c: Double): EwmParams = {
    require(c >= 0.0, s"com must be >= 0: $c"); EwmParams(1.0 / (1.0 + c))
  }
  /** span: alpha = 2/(span+1), span >= 1 */
  def span(s: Double): EwmParams = {
    require(s >= 1.0, s"span must be >= 1: $s"); EwmParams(2.0 / (s + 1.0))
  }
  /** halflife: alpha = 1 - exp(-ln2 / halflife), halflife > 0 */
  def halflife(h: Double): EwmParams = {
    require(h > 0.0, s"halflife must be > 0: $h")
    EwmParams(1.0 - math.exp(-math.log(2.0) / h))
  }
}

/** Distributed exponentially-weighted moving statistics — pandas/dask
  * `Series.ewm(...).mean()/var()/std()` (reference:
  * `dask/dataframe/dask_expr/_rolling.py` ewm surface; pandas
  * `core/window/ewm.py` semantics), full parameter surface via
  * [[EwmParams]].
  *
  * A naive SQL restatement needs an unbounded self-join or a
  * single-task window; the distributable form is the same two-phase
  * prefix scan as [[Cumulative]] with DECAY-COMPOSED carry state: the
  * per-row recurrences
  *
  *   S  = q·S  + wt·x    (decayed value sum,      q = 1-α)
  *   W  = q·W  + wt      (decayed weight sum)
  *   S2 = q·S2 + wt·x²   (decayed square sum)
  *   W2 = q²·W2 + wt²    (decayed SQUARED-weight sum, bias correction)
  *
  * compose across a segment of length L by decaying the left state by
  * q^L (q²^L for W2) — so phase 1 emits (end-state, decay factors) per
  * partition, the driver prefix-combines N tiny tuples, and phase 2
  * re-runs each partition seeded with its carry. Two narrow passes,
  * zero shuffles on top of the caller's sort, any npartitions.
  * adjust=false makes the per-obs weight depend on "is this the global
  * first observation", so phase 1 computes BOTH variants (first-obs in
  * segment weighted 1 vs weighted α) and the driver fold picks per
  * partition based on whether any earlier partition observed a value.
  *
  * Null rows contribute no weight but (ignoreNa=false) decay the
  * accumulators; the emitted mean carries the last available estimate,
  * as pandas does. `ewm_var` is null until two observations are seen.
  *
  * DELIBERATELY NOT on [[TreeCarry]] (r14): the carry combine
  * (`cs·d + s`) is floating-point affine composition, and the √n tree
  * reassociates it — a left-fold-order bit-exactness the q157/q162
  * oracle hashes pin would break by an ulp. The flat collect here is
  * O(npartitions × ~60 B) of plain scalars (≈50 MB at the 8×10⁵-
  * partition 100 TB point, one-shot) — acceptable where the ROW-buffer
  * carries (Cumulative/Expanding/Fill/MapOverlap, integral or
  * arithmetic-free merges) were worth the tree.
  */
object Ewm {

  /** One sequential EWM scan state (the four decayed sums). */
  private final class St(var s: Double = 0.0, var w: Double = 0.0,
                         var s2: Double = 0.0, var w2: Double = 0.0,
                         var seen: Boolean = false) {
    def step(xOrNull: java.lang.Double, p: EwmParams): Unit = {
      val q = 1.0 - p.alpha
      val isObs = xOrNull != null
      if (isObs || !p.ignoreNa) {
        s *= q; w *= q; s2 *= q; w2 *= q * q
      }
      if (isObs) {
        val x = xOrNull.doubleValue()
        val wt = if (p.adjust) 1.0 else if (seen) p.alpha else 1.0
        s += wt * x; w += wt; s2 += wt * x * x; w2 += wt * wt
        seen = true
      }
    }
    def mean: Any = if (w > 0) s / w else null
    def varU: Any = {
      val denom = w * w - w2
      if (w > 0 && denom > 0) {
        val m = s / w
        math.max(0.0, (s2 / w - m * m) * w * w / denom)
      } else null
    }
    def snapshot: Array[Double] = Array(s, w, s2, w2)
    def load(a: Array[Double], hadObs: Boolean): Unit = {
      s = a(0); w = a(1); s2 = a(2); w2 = a(3); seen = hadObs
    }
  }

  /** Back-compat: the adjust=True, ignoreNa=False default of round 6. */
  def statsIndexed(df: DataFrame, valueCol: String, alpha: Double): DataFrame =
    statsIndexed(df, valueCol, EwmParams(alpha))

  /** Returns (rn BIGINT, ewm_mean DOUBLE, ewm_var DOUBLE) in the input's
    * global row order — `rn` is the 0-based global index, so callers can
    * sample/join positionally. Input must already be globally sorted
    * (e.g. `df.sort(...)`): partition index order IS row order, exactly
    * the contract [[Cumulative]] documents.
    */
  def statsIndexed(df: DataFrame, valueCol: String, p: EwmParams): DataFrame = {
    val spark = df.sparkSession
    val vIdx = df.schema.fieldIndex(valueCol)
    val q = 1.0 - p.alpha
    // InternalRow scan (r15): same flat O(npartitions)-scalar carry — the
    // float recurrence must not reassociate (oracle-hashed ulps) — but
    // the per-row plumbing no longer decodes external Rows
    val rdd = InternalScan.rddOf(df)
    val getD = InternalScan.doubleGetter(df.schema(vIdx).dataType, vIdx)

    def valueAt(r: org.apache.spark.sql.catalyst.InternalRow): java.lang.Double =
      if (r.isNullAt(vIdx)) null
      else java.lang.Double.valueOf(getD(r))

    // phase 1: per-partition end state under BOTH first-obs conventions
    // (identical when adjust=true), plus segment decay factors
    val totals: Array[(Int, Array[Double], Array[Double], Double, Double, Boolean, Long)] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        val asFirst = new St()            // no prior observation anywhere
        val asLater = new St(seen = true) // some earlier partition saw one
        var d = 1.0; var d2 = 1.0; var cnt = 0L
        it.foreach { r =>
          val x = valueAt(r)
          if (x != null || !p.ignoreNa) { d *= q; d2 *= q * q }
          asFirst.step(x, p); asLater.step(x, p)
          cnt += 1
        }
        Iterator.single((pid, asFirst.snapshot, asLater.snapshot, d, d2,
          asFirst.seen, cnt))
      }.collect().sortBy(_._1)

    // driver: exclusive prefix-combine (O(npartitions) scalars)
    val nP = totals.length
    val carry = Array.ofDim[Double](nP, 4)
    val carrySeen = new Array[Boolean](nP)
    val startIdx = new Array[Long](nP)
    var cs = 0.0; var cw = 0.0; var cs2 = 0.0; var cw2 = 0.0
    var seen = false; var idx0 = 0L
    var i = 0
    while (i < nP) {
      carry(i) = Array(cs, cw, cs2, cw2); carrySeen(i) = seen; startIdx(i) = idx0
      val t = totals(i)
      val st = if (seen) t._3 else t._2
      cs = cs * t._4 + st(0); cw = cw * t._4 + st(1)
      cs2 = cs2 * t._4 + st(2); cw2 = cw2 * t._5 + st(3)
      seen = seen || t._6
      idx0 += t._7
      i += 1
    }

    // phase 2: per-partition re-scan seeded with the carry
    val outSchema = StructType(Seq(
      StructField("rn", LongType, nullable = false),
      StructField("ewm_mean", DoubleType, nullable = true),
      StructField("ewm_var", DoubleType, nullable = true)))
    val bc = spark.sparkContext.broadcast((carry, carrySeen, startIdx))
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      val (c, cSeen, sIdx) = bc.value
      val st = new St()
      st.load(c(pid), cSeen(pid))
      var rn = sIdx(pid)
      val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(outSchema.fields.map(_.dataType))
      val buf = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
      it.map { r =>
        st.step(valueAt(r), p)
        buf.update(0, rn); buf.update(1, st.mean); buf.update(2, st.varU)
        rn += 1
        proj(buf): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    InternalScan.toDF(spark, out, outSchema)
  }

  /** pandas `ewm(halflife=timedelta, times=col).mean()` — IRREGULAR
    * time-based decay: observation i weighs `0.5^((t_now - t_i) /
    * halflife)`, so gaps decay more than dense stretches (pandas allows
    * only `mean` for times-based halflife; same here). Null values
    * contribute nothing but time still passes. Input must be sorted by
    * `tsCol` (nondecreasing), as pandas requires monotonic times.
    *
    * Distribution: the same two-phase decay-composed scan as
    * [[statsIndexed]] — the left segment's end-state decays by
    * `0.5^((t_endRight - t_endLeft)/h)` when composed, so phase 1 emits
    * (endState, lastTs) per partition and phase 2 re-scans seeded with
    * (carry, previous partition's last ts). Returns
    * (rn BIGINT, ewm_mean DOUBLE).
    */
  def statsIndexedTimes(df: DataFrame, valueCol: String, tsCol: String,
                        halflifeSec: Double): DataFrame = {
    require(halflifeSec > 0.0, s"halflife must be > 0: $halflifeSec")
    val spark = df.sparkSession
    val vIdx = df.schema.fieldIndex(valueCol)
    val tIdx = df.schema.fieldIndex(tsCol)
    val rdd = InternalScan.rddOf(df)
    val getD = InternalScan.doubleGetter(df.schema(vIdx).dataType, vIdx)

    // InternalRow timestamps are MICROSECONDS; the former Row path read
    // java.sql.Timestamp.getTime (floorDiv(micros,1000) MILLIS) / 1000.0.
    // Reproduce that exact millisecond truncation — µs-resolution seconds
    // would move every decay factor by an ulp and break the oracle hash.
    val tsOf: org.apache.spark.sql.catalyst.InternalRow => Double =
      df.schema(tIdx).dataType match {
        case org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.TimestampNTZType =>
          r => Math.floorDiv(r.getLong(tIdx), 1000L) / 1000.0
        case dt => InternalScan.doubleGetter(dt, tIdx)
      }
    def valueAt(r: org.apache.spark.sql.catalyst.InternalRow): java.lang.Double =
      if (r.isNullAt(vIdx)) null
      else java.lang.Double.valueOf(getD(r))
    def decay(dtSec: Double): Double = math.pow(0.5, dtSec / halflifeSec)

    // phase 1: per-partition end state + boundary timestamps
    val totals: Array[(Int, Double, Double, Double, Boolean, Long)] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        var s = 0.0; var w = 0.0; var lastTs = 0.0
        var any = false; var cnt = 0L
        it.foreach { r =>
          val t = tsOf(r)
          if (any) {
            val d = decay(t - lastTs)
            s *= d; w *= d
          }
          val x = valueAt(r)
          if (x != null) { s += x.doubleValue(); w += 1.0 }
          lastTs = t; any = true; cnt += 1
        }
        Iterator.single((pid, s, w, lastTs, any, cnt))
      }.collect().sortBy(_._1)

    // driver: exclusive prefix-combine with time-gap decay
    val nP = totals.length
    val carryS = new Array[Double](nP); val carryW = new Array[Double](nP)
    val carryTs = new Array[Double](nP); val carryHas = new Array[Boolean](nP)
    val startIdx = new Array[Long](nP)
    var cs = 0.0; var cw = 0.0; var cts = 0.0; var has = false; var idx0 = 0L
    var i = 0
    while (i < nP) {
      carryS(i) = cs; carryW(i) = cw; carryTs(i) = cts; carryHas(i) = has
      startIdx(i) = idx0
      val (_, s, w, lastTs, any, cnt) = totals(i)
      if (any) {
        if (has) {
          val d = decay(lastTs - cts)
          cs = cs * d + s; cw = cw * d + w
        } else { cs = s; cw = w }
        cts = lastTs; has = true
      }
      idx0 += cnt
      i += 1
    }

    // phase 2: re-scan seeded with (carry, previous partition's last ts)
    val outSchema = StructType(Seq(
      StructField("rn", LongType, nullable = false),
      StructField("ewm_mean", DoubleType, nullable = true)))
    val bc = spark.sparkContext.broadcast((carryS, carryW, carryTs, carryHas, startIdx))
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      val (cS, cW, cTs, cHas, sIdx) = bc.value
      var s = cS(pid); var w = cW(pid); var lastTs = cTs(pid); var any = cHas(pid)
      var rn = sIdx(pid)
      val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(outSchema.fields.map(_.dataType))
      val buf = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
      it.map { r =>
        val t = tsOf(r)
        if (any) {
          val d = decay(t - lastTs)
          s *= d; w *= d
        }
        val x = valueAt(r)
        if (x != null) { s += x.doubleValue(); w += 1.0 }
        lastTs = t; any = true
        val mean: Any = if (w > 0) s / w else null
        buf.update(0, rn); buf.update(1, mean)
        rn += 1
        proj(buf): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    InternalScan.toDF(spark, out, outSchema)
  }

  /** Back-compat: the adjust=True, ignoreNa=False default of round 6. */
  def statsKeyed(df: DataFrame, keyCol: String, orderCols: Seq[String],
                 valueCol: String, alpha: Double): DataFrame =
    statsKeyed(df, keyCol, orderCols, valueCol, EwmParams(alpha))

  /** Keyed EWM — pandas `groupby(key).ewm(...).mean()/var()`: one
    * shuffle on the key, each group's rows sorted by `orderCols` inside
    * the group and run through the same recurrences (groups are the unit
    * of memory, the same contract as every groupby-apply path here).
    * Returns (key, order..., grn, ewm_mean, ewm_var) rows, `grn` being
    * the 0-based index within the group (for positional sampling/joins).
    * Null group keys are dropped, as pandas groupby does; null order
    * values sort first (Spark/pandas NULLS FIRST default).
    */
  def statsKeyed(df: DataFrame, keyCol: String, orderCols: Seq[String],
                 valueCol: String, p: EwmParams): DataFrame = {
    val spark = df.sparkSession
    val cols = (keyCol +: orderCols) :+ valueCol
    import org.apache.spark.sql.functions.col
    val base = df.filter(col(keyCol).isNotNull)
      .select(cols.map(col): _*)
    val schema = StructType(base.schema.fields.dropRight(1) ++ Seq(
      StructField("grn", LongType, nullable = false),
      StructField("ewm_mean", DoubleType, nullable = true),
      StructField("ewm_var", DoubleType, nullable = true)))
    val nOrd = orderCols.length
    val vPos = 1 + nOrd
    val outEnc = org.apache.spark.sql.Encoders.row(schema)
    base.groupByKey((r: Row) => String.valueOf(r.get(0)))(
        org.apache.spark.sql.Encoders.STRING)
      .flatMapGroups { (_: String, it: Iterator[Row]) =>
        val rows = it.toArray
        // order keys compare as native Comparables (numeric order, not
        // stringified); nulls first, matching the SQL default
        java.util.Arrays.sort(rows, new java.util.Comparator[Row] {
          def compare(a: Row, b: Row): Int = {
            var i = 0
            while (i < nOrd) {
              val av = a.get(1 + i); val bv = b.get(1 + i)
              val c =
                if (av == null && bv == null) 0
                else if (av == null) -1
                else if (bv == null) 1
                else av.asInstanceOf[Comparable[Any]].compareTo(bv)
              if (c != 0) return c
              i += 1
            }
            0
          }
        })
        val st = new St()
        var grn = -1L
        rows.iterator.map { r =>
          val x: java.lang.Double =
            if (r.isNullAt(vPos)) null
            else java.lang.Double.valueOf(r.get(vPos).asInstanceOf[Number].doubleValue())
          st.step(x, p)
          grn += 1
          Row.fromSeq(r.toSeq.dropRight(1) ++ Seq(grn, st.mean, st.varU))
        }
      }(outEnc)
  }
}
