package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Distributed exponentially-weighted moving statistics — pandas/dask
  * `Series.ewm(alpha, adjust=True).mean()/var()/std()` (reference:
  * `dask/dataframe/dask_expr/_rolling.py` ewm surface; pandas
  * `core/window/ewm.py` semantics).
  *
  * A naive SQL restatement needs an unbounded self-join or a
  * single-task window; the distributable form is the same two-phase
  * prefix scan as [[Cumulative]] with DECAY-COMPOSED carry state: the
  * per-row recurrences
  *
  *   S  = q·S  + x      (decayed value sum,       q = 1-α)
  *   W  = q·W  + 1      (decayed weight sum — adjust=True)
  *   S2 = q·S2 + x²     (decayed square sum)
  *   W2 = q²·W2 + 1     (decayed SQUARED-weight sum, for bias correction)
  *
  * compose across a segment of length L by decaying the left state by
  * q^L (q² ^L for W2) — so phase 1 emits (end-state, q^L) per partition,
  * the driver prefix-combines N tiny tuples, and phase 2 re-runs each
  * partition seeded with its carry. Two narrow passes, zero shuffles on
  * top of the caller's sort, any npartitions.
  *
  * Semantics: adjust=True, ignore_na=False (a null row decays the
  * accumulators but contributes no weight; the emitted mean carries the
  * last available estimate, as pandas does). `ewm_var` is the
  * bias-corrected (pandas default `bias=False`) variance W²/(W²−W2) ·
  * (S2/W − mean²), null until two observations are seen.
  */
object Ewm {

  /** Returns (rn BIGINT, ewm_mean DOUBLE, ewm_var DOUBLE) in the input's
    * global row order — `rn` is the 0-based global index, so callers can
    * sample/join positionally. Input must already be globally sorted
    * (e.g. `df.sort(...)`): partition index order IS row order, exactly
    * the contract [[Cumulative]] documents.
    */
  def statsIndexed(df: DataFrame, valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1): $alpha")
    val spark = df.sparkSession
    val vIdx = df.schema.fieldIndex(valueCol)
    val q = 1.0 - alpha
    val rdd = df.rdd

    // phase 1: per-partition end state + segment decay factors
    val totals: Array[(Int, Array[Double], Long)] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        var s = 0.0; var w = 0.0; var s2 = 0.0; var w2 = 0.0
        var d = 1.0; var d2 = 1.0; var cnt = 0L
        it.foreach { r =>
          s *= q; w *= q; s2 *= q; w2 *= q * q; d *= q; d2 *= q * q
          if (!r.isNullAt(vIdx)) {
            val x = r.get(vIdx).asInstanceOf[Number].doubleValue()
            s += x; w += 1.0; s2 += x * x; w2 += 1.0
          }
          cnt += 1
        }
        Iterator.single((pid, Array(s, w, s2, w2, d, d2), cnt))
      }.collect().sortBy(_._1)

    // driver: exclusive prefix-combine (O(npartitions) scalars)
    val nP = totals.length
    val carry = Array.ofDim[Double](nP, 4)
    val startIdx = new Array[Long](nP)
    var cs = 0.0; var cw = 0.0; var cs2 = 0.0; var cw2 = 0.0; var idx0 = 0L
    var i = 0
    while (i < nP) {
      carry(i) = Array(cs, cw, cs2, cw2); startIdx(i) = idx0
      val t = totals(i)._2
      cs = cs * t(4) + t(0); cw = cw * t(4) + t(1)
      cs2 = cs2 * t(4) + t(2); cw2 = cw2 * t(5) + t(3)
      idx0 += totals(i)._3
      i += 1
    }

    // phase 2: per-partition re-scan seeded with the carry
    val bc = spark.sparkContext.broadcast((carry, startIdx))
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      val (c, sIdx) = bc.value
      var s = c(pid)(0); var w = c(pid)(1); var s2 = c(pid)(2); var w2 = c(pid)(3)
      var rn = sIdx(pid)
      it.map { r =>
        s *= q; w *= q; s2 *= q; w2 *= q * q
        if (!r.isNullAt(vIdx)) {
          val x = r.get(vIdx).asInstanceOf[Number].doubleValue()
          s += x; w += 1.0; s2 += x * x; w2 += 1.0
        }
        val mean: Any = if (w > 0) s / w else null
        val varU: Any = {
          val denom = w * w - w2
          if (w > 0 && denom > 0) {
            val m = s / w
            val biased = s2 / w - m * m
            math.max(0.0, biased * w * w / denom)
          } else null
        }
        val row = Row(rn, mean, varU)
        rn += 1
        row
      }
    }
    spark.createDataFrame(out, StructType(Seq(
      StructField("rn", LongType, nullable = false),
      StructField("ewm_mean", DoubleType, nullable = true),
      StructField("ewm_var", DoubleType, nullable = true))))
  }

  /** Keyed EWM — pandas `groupby(key).ewm(alpha).mean()/var()`: one
    * shuffle on the key, each group's rows sorted by `orderCols` inside
    * the group and run through the same recurrences (groups are the unit
    * of memory, the same contract as every groupby-apply path here).
    * Returns (key, order..., grn, ewm_mean, ewm_var) rows, `grn` being
    * the 0-based index within the group (for positional sampling/joins).
    */
  def statsKeyed(df: DataFrame, keyCol: String, orderCols: Seq[String],
                 valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1): $alpha")
    val spark = df.sparkSession
    val q = 1.0 - alpha
    val cols = (keyCol +: orderCols) :+ valueCol
    val base = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
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
        // stringified)
        java.util.Arrays.sort(rows, new java.util.Comparator[Row] {
          def compare(a: Row, b: Row): Int = {
            var i = 0
            while (i < nOrd) {
              val c = a.get(1 + i).asInstanceOf[Comparable[Any]].compareTo(b.get(1 + i))
              if (c != 0) return c
              i += 1
            }
            0
          }
        })
        var s = 0.0; var w = 0.0; var s2 = 0.0; var w2 = 0.0
        var grn = -1L
        rows.iterator.map { r =>
          s *= q; w *= q; s2 *= q; w2 *= q * q
          if (!r.isNullAt(vPos)) {
            val x = r.get(vPos).asInstanceOf[Number].doubleValue()
            s += x; w += 1.0; s2 += x * x; w2 += 1.0
          }
          grn += 1
          val mean: Any = if (w > 0) s / w else null
          val varU: Any = {
            val denom = w * w - w2
            if (w > 0 && denom > 0) {
              val m = s / w
              math.max(0.0, (s2 / w - m * m) * w * w / denom)
            } else null
          }
          Row.fromSeq(r.toSeq.dropRight(1) ++ Seq(grn, mean, varU))
        }
      }(outEnc)
  }
}
