package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tabular re-expressions of the reference's array-module data algorithms
  * (SURVEY §2.11): histogram (`dask/array/routines.py:861-1517`), bincount
  * (`:750`), digitize (`:795`), searchsorted (`:811`), pairwise cov/corr
  * (`:1523-1632`).
  *
  * Each is a single-scan groupBy/agg over a bucket expression, so the plan
  * is one partial→final hash aggregate: no driver-side loops, no second
  * pass, and the bucket count (not the row count) bounds the shuffle — the
  * shape that survives a 100 TB scan.
  */
object ArrayAlgs {

  /** `np.histogram(x, bins=nbins, range=(lo, hi))`.
    *
    * Fixed-width bins; the last bin is closed on the right (numpy
    * semantics). Values outside [lo, hi] are dropped, as numpy does with
    * an explicit range.
    */
  def histogram(df: DataFrame, valueCol: String, lo: Double, hi: Double, nbins: Int): DataFrame = {
    require(nbins > 0 && hi > lo, s"bad histogram spec [$lo, $hi) x $nbins")
    val width = (hi - lo) / nbins
    val c = col(valueCol).cast("double")
    val bin = least(floor((c - lit(lo)) / lit(width)), lit(nbins - 1)).cast("int")
    df.filter(c >= lo && c <= hi)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", lit(lo) + col("bin") * lit(width))
      .withColumn("bin_hi", lit(lo) + (col("bin") + 1) * lit(width))
  }

  /** `np.histogram2d` — joint fixed-width binning of two columns; same
    * single-aggregate shape as [[histogram]] with a composite bucket key.
    */
  def histogram2d(df: DataFrame, xCol: String, yCol: String,
                  xLo: Double, xHi: Double, yLo: Double, yHi: Double,
                  nx: Int, ny: Int): DataFrame = {
    require(nx > 0 && ny > 0 && xHi > xLo && yHi > yLo, "bad histogram2d spec")
    val wx = (xHi - xLo) / nx
    val wy = (yHi - yLo) / ny
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    df.filter(x >= xLo && x <= xHi && y >= yLo && y <= yHi)
      .groupBy(
        least(floor((x - lit(xLo)) / lit(wx)), lit(nx - 1)).cast("int").as("bin_x"),
        least(floor((y - lit(yLo)) / lit(wy)), lit(ny - 1)).cast("int").as("bin_y"))
      .agg(count(lit(1)).as("n"))
  }

  /** `np.histogramdd` (`dask/array/routines.py:861-1517` family) — joint
    * fixed-width binning over N columns; the same ONE partial→final
    * aggregate as [[histogram]] with an N-part composite bucket key, so
    * the shuffle carries at most ∏nbins rows regardless of input size.
    */
  def histogramDd(df: DataFrame, specs: Seq[(String, Double, Double, Int)]): DataFrame = {
    require(specs.nonEmpty, "histogramDd needs at least one dimension")
    specs.foreach { case (c, lo, hi, n) =>
      require(n > 0 && hi > lo, s"bad histogramDd spec [$lo, $hi) x $n for $c") }
    val inRange = specs.map { case (c, lo, hi, _) =>
      col(c).cast("double") >= lo && col(c).cast("double") <= hi }.reduce(_ && _)
    val bins = specs.map { case (c, lo, hi, n) =>
      val w = (hi - lo) / n
      least(floor((col(c).cast("double") - lit(lo)) / lit(w)), lit(n - 1))
        .cast("int").as(s"bin_$c")
    }
    df.filter(inRange).groupBy(bins: _*).agg(count(lit(1)).as("n"))
  }

  /** `np.bincount` — counts of non-negative integer values. */
  def bincount(df: DataFrame, intCol: String): DataFrame =
    df.filter(col(intCol) >= 0)
      .groupBy(col(intCol).cast("long").as("value"))
      .agg(count(lit(1)).as("n"))

  /** `np.digitize(x, boundaries)` — index of the bucket each value falls
    * into (count of boundaries <= x, i.e. right-closed `right=False`).
    * Boundaries are a small sorted literal array, so the bucket expression
    * is pure codegen — no join, no shuffle beyond the caller's plan.
    * Returns an unbound Column: apply it to any frame with `valueCol`.
    */
  def digitize(valueCol: String, boundaries: Seq[Double],
               out: String = "bucket"): Column = {
    require(boundaries == boundaries.sorted, "boundaries must be sorted")
    val c = col(valueCol).cast("double")
    boundaries.foldLeft(lit(0)) { (acc, b) => acc + when(c >= lit(b), 1).otherwise(0) }
      .cast("int").as(out)
  }

  /** `np.searchsorted(sorted, x, side)` (`dask/array/routines.py:811`) —
    * the insertion index that keeps `sorted` sorted.  side='left' counts
    * strictly-smaller boundaries, side='right' counts ≤ (== [[digitize]]).
    * Same codegen'd comparison chain as digitize: the boundary list is a
    * driver-side constant (numpy's is an in-memory array), so no join.
    */
  def searchsorted(valueCol: String, sorted: Seq[Double], side: String = "left",
                   out: String = "idx"): Column = {
    require(sorted == sorted.sorted, "searchsorted needs a sorted array")
    require(side == "left" || side == "right", s"side must be left|right, got $side")
    val c = col(valueCol).cast("double")
    val cmp: Double => Column =
      if (side == "right") b => when(c >= lit(b), 1).otherwise(0)
      else b => when(c > lit(b), 1).otherwise(0)
    val idx = sorted.foldLeft(lit(0)) { (acc, b) => acc + cmp(b) }
    // numpy: NaN sorts after everything → insertion index = len; NULL has
    // no numpy analogue — propagate it rather than alias it to bucket 0
    when(c.isNull, lit(null))
      .when(isnan(c), lit(sorted.length))
      .otherwise(idx).cast("int").as(out)
  }

  /** Pairwise correlation matrix in long form `(var1, var2, corr)` —
    * reference `da.corrcoef` / frame-level pairwise `corr`
    * (`_collection.py:4042`). All n·(n-1)/2 coefficients come from ONE
    * aggregation pass over the data (a single scan at 100 TB), then a
    * constant-size literal unpivot.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String], scale: Int = 6): DataFrame = {
    require(cols.size >= 2, s"corrMatrix needs at least 2 columns, got $cols")
    val pairs = for {
      (a, i) <- cols.zipWithIndex
      b <- cols.drop(i + 1)
    } yield (a, b)
    // index-based aliases: column names themselves may contain any chars
    val aggs = pairs.zipWithIndex.map { case ((a, b), i) =>
      round(corr(col(a), col(b)), scale).as(s"__corr_$i")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = pairs.zipWithIndex.map { case ((a, b), i) =>
      struct(lit(a).as("var1"), lit(b).as("var2"), col(s"__corr_$i").as("corr"))
    }
    wide.select(explode(array(stacked: _*)).as("p"))
      .select(col("p.var1").as("var1"), col("p.var2").as("var2"), col("p.corr").as("corr"))
  }
}
