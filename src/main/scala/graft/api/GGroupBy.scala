package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Groupby surface (reference: `dask_expr/_groupby.py`).
  *
  * Every decomposable aggregation here compiles to Spark's partial→final
  * hash aggregate — exactly the reference's ApplyConcatApply
  * chunk/combine/aggregate pattern (`_reductions.py:399-573`) but executed
  * by Tungsten with map-side combine, so the tree-reduce/`split_every`
  * machinery is unnecessary.  Holistic aggregations (exact median/quantile)
  * shuffle whole groups, mirroring `HolisticGroupbyAggregation`
  * (`_groupby.py:468`).
  */
final class GGroupBy(gdf: GDF, keys: Seq[String], dropna: Boolean) {

  // windowed per-group ops exchange by the group keys, destroying any
  // range-partitioned sorted layout — carry the index DEMOTED to
  // sorted=false so a later order-dependent op re-sorts instead of
  // trusting a layout that no longer exists
  private def demotedIndex = gdf.index.map(_.copy(sorted = false))

  private def base: DataFrame =
    if (dropna) keys.foldLeft(gdf.df)((d, k) => d.filter(col(k).isNotNull)) else gdf.df
  private def grouped = base.groupBy(keys.map(col): _*)

  /** Multi-agg `agg(spec)`: pairs of (column, function[, alias]). */
  def agg(spec: (String, String)*): GDF = aggAliased(spec.map { case (c, f) => (c, f, s"${c}_$f") }: _*)

  def aggAliased(spec: (String, String, String)*): GDF = {
    val exprs = spec.map { case (c, f, alias) => GGroupBy.fn(f, c).as(alias) }
    new GDF(grouped.agg(exprs.head, exprs.tail: _*), None)
  }

  def sum(cols: String*): GDF = agg(cols.map(_ -> "sum"): _*)
  def mean(cols: String*): GDF = agg(cols.map(_ -> "mean"): _*)
  def min(cols: String*): GDF = agg(cols.map(_ -> "min"): _*)
  def max(cols: String*): GDF = agg(cols.map(_ -> "max"): _*)
  def countRows(alias: String = "size"): GDF =
    new GDF(grouped.agg(count(lit(1)).as(alias)), None)

  def nunique(c: String, alias: String = "nunique"): GDF =
    new GDF(grouped.agg(countDistinct(col(c)).as(alias)), None)

  /** HLL-approximate distinct (reference: `hyperloglog.py:20-83` → Spark
    * built-in HLL++).
    */
  def nuniqueApprox(c: String, rsd: Double = 0.05, alias: String = "nunique_approx"): GDF =
    new GDF(grouped.agg(approx_count_distinct(col(c), rsd).as(alias)), None)

  /** idxmin/idxmax — `min_by`/`max_by` (SURVEY §2.5), expressed as
    * min/max over a (value, idx) struct so that value ties resolve
    * deterministically by idx (bare min_by/max_by tie-break is arbitrary).
    */
  // null-value rows wrap to a null struct, which min/max aggregates skip —
  // matching pandas idxmin/idxmax skipna (a bare struct would sort a null
  // leading field FIRST and make it the group minimum)
  def idxmin(valueCol: String, idxCol: String, alias: String = "idxmin"): GDF =
    new GDF(grouped.agg(org.apache.spark.sql.functions
      .min(when(col(valueCol).isNotNull, struct(col(valueCol), col(idxCol))))
      .getField(idxCol).as(alias)), None)
  // idxmax ties must resolve to the SMALLEST index (pandas "first
  // occurrence"), so the struct carries the NEGATED index: max picks the
  // largest value and, among ties, the largest negated index = smallest
  // index; the sign is undone outside the aggregate.  Requires a numeric
  // index column (as does the reference's RangeIndex-positional idxmax).
  def idxmax(valueCol: String, idxCol: String, alias: String = "idxmax"): GDF =
    new GDF(grouped.agg((-org.apache.spark.sql.functions
      .max(when(col(valueCol).isNotNull, struct(col(valueCol), (-col(idxCol)).as("__neg"))))
      .getField("__neg")).as(alias)), None)

  /** Exact per-group median — holistic (sort-based `percentile`). */
  def median(c: String, alias: String = "median"): GDF =
    new GDF(grouped.agg(percentile(col(c), lit(0.5)).as(alias)), None)

  def quantile(c: String, q: Double, alias: String = "quantile"): GDF =
    new GDF(grouped.agg(percentile(col(c), lit(q)).as(alias)), None)

  def quantileApprox(c: String, q: Double, alias: String = "quantile_approx"): GDF =
    new GDF(grouped.agg(percentile_approx(col(c), lit(q), lit(10000)).as(alias)), None)

  def varStd(c: String): GDF =
    new GDF(grouped.agg(var_samp(col(c)).as(s"${c}_var"), stddev_samp(col(c)).as(s"${c}_std")), None)

  def covCorr(x: String, y: String): GDF =
    new GDF(grouped.agg(covar_samp(col(x), col(y)).as("cov"), corr(col(x), col(y)).as("corr")), None)

  /** first/last by explicit ordering (dask's first/last are
    * position-dependent; Spark needs the order spelled out — SURVEY §2.5).
    */
  def firstBy(valueCol: String, ordCol: String, alias: String = "first"): GDF =
    new GDF(grouped.agg(min_by(col(valueCol), col(ordCol)).as(alias)), None)
  def lastBy(valueCol: String, ordCol: String, alias: String = "last"): GDF =
    new GDF(grouped.agg(max_by(col(valueCol), col(ordCol)).as(alias)), None)

  /** first/last with a composite ordering (ties broken by later columns)
    * — `min_by`/`max_by` over a struct key stays a single decomposable
    * aggregate (no window, no per-group sort).
    */
  def firstByOrd(valueCol: String, ordCols: Seq[String], alias: String = "first"): GDF =
    new GDF(grouped.agg(min_by(col(valueCol), struct(ordCols.map(col): _*)).as(alias)), None)
  def lastByOrd(valueCol: String, ordCols: Seq[String], alias: String = "last"): GDF =
    new GDF(grouped.agg(max_by(col(valueCol), struct(ordCols.map(col): _*)).as(alias)), None)

  /** collect distinct values per group (dask `GroupBy.unique`). */
  def uniqueList(c: String, alias: String = "unique"): GDF =
    new GDF(grouped.agg(array_sort(collect_set(col(c))).as(alias)), None)

  /** dask `GroupBy.value_counts` (`_groupby.py:2238`): counts per
    * (group keys, value) — ONE partial→final hash aggregate on the widened
    * key, no second shuffle.  `normalize` divides by the group total via a
    * whole-partition window on the group keys (group count ≪ rows, and the
    * aggregate has already collapsed to one row per distinct value).
    */
  def valueCounts(c: String, alias: String = "count", normalize: Boolean = false,
                  dropnaValues: Boolean = true): GDF = {
    // pandas value_counts drops null VALUES by default (independent of
    // the groupby's key-level dropna); they would otherwise form a
    // (key, null) row and inflate the normalize denominator
    val rows = if (dropnaValues) base.filter(col(c).isNotNull) else base
    val counted = rows.groupBy((keys :+ c).map(col): _*).agg(count(lit(1)).as(alias))
    if (!normalize) new GDF(counted, None)
    else {
      val w = Window.partitionBy(keys.map(col): _*)
      new GDF(counted.withColumn(alias,
        col(alias) / org.apache.spark.sql.functions.sum(col(alias)).over(w)), None)
    }
  }

  // ---- windowed per-group ops (no aggregation of rows) ------------------

  private def w(orderBy: String) = Window.partitionBy(keys.map(col): _*).orderBy(col(orderBy))
  private def wOrd(orderBy: Seq[String]) =
    Window.partitionBy(keys.map(col): _*).orderBy(orderBy.map(col): _*)

  /** per-group shift (lag). */
  def shift(c: String, periods: Int, orderBy: String, alias: String): GDF =
    new GDF(base.withColumn(alias, lag(col(c), periods).over(w(orderBy))), demotedIndex)

  /** per-group cumulative sum. */
  def cumsum(c: String, orderBy: String, alias: String): GDF =
    new GDF(
      base.withColumn(
        alias,
        org.apache.spark.sql.functions.sum(col(c))
          .over(w(orderBy).rowsBetween(Window.unboundedPreceding, Window.currentRow))),
      demotedIndex)

  /** per-group cumulative product (reference `GroupByCumulative`,
    * `_groupby.py:1352-1505`): Spark's `product` aggregate over the
    * running frame multiplies the actual values in window order — no
    * exp∘Σlog detour, so zeros/signs/precision behave like pandas.  A
    * null value yields null at its own row (pandas skipna) without
    * poisoning later products.
    */
  def cumprod(c: String, orderBy: Seq[String], alias: String): GDF =
    new GDF(
      base.withColumn(
        alias,
        when(col(c).isNull, lit(null)).otherwise(
          product(col(c)).over(
            wOrd(orderBy).rowsBetween(Window.unboundedPreceding, Window.currentRow)))),
      demotedIndex)

  /** Skew-resilient grouped cumsum — the scale alternative to [[cumsum]]
    * (same contract as exact percentile vs `quantileApprox`): the window
    * path gives one task per group (pandas-bit-identical, but a zipf-hot
    * group is a single straggler task at 100 TB); this path range-splits
    * hot groups across partitions and stitches them with a segmented
    * √n tree carry ([[graft.operators.Cumulative.grouped]]). Integral
    * inputs are exact under any split; float partials reassociate.
    */
  def cumsumTree(c: String, orderBy: Seq[String], alias: String): GDF =
    new GDF(graft.operators.Cumulative.grouped(
      base, keys, orderBy, c, graft.operators.Cumulative.CumSum, alias), demotedIndex)

  /** Skew-resilient grouped cumprod; see [[cumsumTree]]. */
  def cumprodTree(c: String, orderBy: Seq[String], alias: String): GDF =
    new GDF(graft.operators.Cumulative.grouped(
      base, keys, orderBy, c, graft.operators.Cumulative.CumProd, alias), demotedIndex)

  /** Skew-resilient grouped forward fill — see [[cumsumTree]] for the
    * range-split contract. Carried values are verbatim (no arithmetic),
    * so unlike the cumulative ops this is bit-exact under ANY
    * partitioning.
    */
  def ffillTree(c: String, orderBy: Seq[String]): GDF =
    new GDF(graft.operators.Fill.groupedFfill(base, keys, orderBy, c), demotedIndex)

  /** Skew-resilient grouped backward fill: [[ffillTree]] walked in
    * descending order.
    */
  def bfillTree(c: String, orderBy: Seq[String]): GDF =
    new GDF(graft.operators.Fill.groupedFfill(base, keys, orderBy, c,
      descendingOrder = true), demotedIndex)

  def cumcount(orderBy: String, alias: String = "cumcount"): GDF =
    new GDF(base.withColumn(alias, row_number().over(w(orderBy)) - 1), demotedIndex)

  def cumcountOrd(orderBy: Seq[String], alias: String = "cumcount"): GDF =
    new GDF(base.withColumn(alias, row_number().over(wOrd(orderBy)) - 1), demotedIndex)

  /** pandas `GroupBy.rolling` (reference `dask/dataframe/dask_expr/_groupby.py:2141`):
    * per-group rolling windows over the frame's index order.  Delegates to
    * [[GDF.rolling]] with the group keys as the partition spec — the
    * fully-parallel native-SQL-window path (one exchange on the keys, then
    * whole-stage-codegen window aggregates; no MapOverlap ghost rows
    * needed because every window lives inside one group).
    */
  def rolling(window: Int, minPeriods: Int = -1): GRolling =
    // route through `base` so dropna=true excludes null-key groups, like
    // every other member of this class
    new GDF(base, gdf.index).rolling(window, keys, minPeriods)

  /** dask `GroupBy.transform(func)` for decomposable aggs: the group
    * aggregate broadcast back onto every row (`_groupby.py:1033`). A
    * whole-partition window (no ORDER BY) — one shuffle on the keys, no
    * join back. Transform preserves the frame's shape: null-key rows are
    * kept and get a null result (pandas semantics), not dropped.
    */
  def transform(c: String, fn: String, alias: String): GDF = {
    require(fn != "nunique",
      "transform(nunique) is not window-expressible in Spark (DISTINCT window); " +
        "use nunique() + a join instead")
    val w = Window.partitionBy(keys.map(col): _*)
    val keysNotNull = keys.map(col(_).isNotNull).reduce(_ && _)
    // dropna governs whether null-key rows form a real group: with
    // dropna=false the window already groups null keys together, so the
    // null-out guard must not apply (pandas dropna=False semantics)
    val agg = GGroupBy.fn(fn, c).over(w)
    val out = if (dropna) when(keysNotNull, agg).otherwise(lit(null)) else agg
    new GDF(gdf.df.withColumn(alias, out), demotedIndex)
  }

  /** per-group forward-fill. */
  def ffill(c: String, orderBy: String): GDF =
    new GDF(
      base.withColumn(
        c,
        last(col(c), ignoreNulls = true)
          .over(w(orderBy).rowsBetween(Window.unboundedPreceding, Window.currentRow))),
      demotedIndex)

  /** per-group backward-fill (pandas `GroupBy.bfill`): the first non-null
    * value at or after the row in the group's index order — the mirror
    * frame of [[ffill]].
    */
  def bfill(c: String, orderBy: String): GDF =
    new GDF(
      base.withColumn(
        c,
        first(col(c), ignoreNulls = true)
          .over(w(orderBy).rowsBetween(Window.currentRow, Window.unboundedFollowing))),
      demotedIndex)

  /** per-group head — first n rows by `orderBy` within each group. */
  def headPerGroup(n: Int, orderBy: String): GDF =
    new GDF(
      base.withColumn("__rn__", row_number().over(w(orderBy)))
        .filter(col("__rn__") <= n).drop("__rn__"),
      None)

  def headPerGroupOrd(n: Int, orderBy: Seq[String]): GDF =
    new GDF(
      base.withColumn("__rn__", row_number().over(wOrd(orderBy)))
        .filter(col("__rn__") <= n).drop("__rn__"),
      None)

  /** per-group tail — last n rows by `orderBy` within each group. */
  def tailPerGroupOrd(n: Int, orderBy: Seq[String]): GDF = {
    val wDesc = Window.partitionBy(keys.map(col): _*).orderBy(orderBy.map(col(_).desc): _*)
    new GDF(
      base.withColumn("__rn__", row_number().over(wDesc))
        .filter(col("__rn__") <= n).drop("__rn__"),
      None)
  }

  def getGroup(values: Seq[Any]): GDF =
    new GDF(keys.zip(values).foldLeft(base) { case (d, (k, v)) => d.filter(col(k) === v) }, gdf.index)

  /** UDTF-style per-group apply (dask `GroupBy.apply` → `flatMapGroups`,
    * SURVEY §2.10).
    */
  def applyGroups[K: org.apache.spark.sql.Encoder, T: org.apache.spark.sql.Encoder,
                  U: org.apache.spark.sql.Encoder](
      keyFn: T => K)(f: (K, Iterator[T]) => IterableOnce[U]): org.apache.spark.sql.Dataset[U] =
    base.as[T].groupByKey(keyFn).flatMapGroups((k: K, it: Iterator[T]) => f(k, it).iterator)
}

object GGroupBy {
  /** agg-spec name → Spark function (reference spec names,
    * `_groupby.py:564-627`).
    */
  def fn(name: String, c: String): Column = name match {
    case "sum"            => sum(col(c))
    case "prod" | "product" => product(col(c))
    case "mean" | "avg"   => avg(col(c))
    case "min"            => min(col(c))
    case "max"            => max(col(c))
    case "count"          => count(col(c))
    case "size"           => count(lit(1))
    case "var"            => var_samp(col(c))
    case "std"            => stddev_samp(col(c))
    case "sem"            => stddev_samp(col(c)) / sqrt(count(col(c)))
    // pandas-ADJUSTED sample statistics (G1/G2), not Spark's biased
    // population g1/g2 — same semantics as the rolling paths, derived
    // from the builtins: G1 = g1·√(n(n−1))/(n−2),
    // G2 = ((n+1)·g2 + 6)(n−1)/((n−2)(n−3)); n < 3 (resp. 4) → null,
    // matching pandas NaN (the when-guard also keeps ANSI mode from
    // tripping on the zero denominator)
    case "skew" =>
      val n = count(col(c)).cast("double")
      when(n > 2, skewness(col(c)) * sqrt(n * (n - lit(1))) / (n - lit(2)))
    case "kurt" | "kurtosis" =>
      val n = count(col(c)).cast("double")
      when(n > 3,
        ((n + lit(1)) * kurtosis(col(c)) + lit(6)) * (n - lit(1)) /
          ((n - lit(2)) * (n - lit(3))))
    case "nunique"        => countDistinct(col(c))
    case "median"         => percentile(col(c), lit(0.5))
    case "any"            => max(col(c).cast("boolean"))
    case "all"            => min(col(c).cast("boolean"))
    case other            => throw new IllegalArgumentException(s"unknown agg: $other")
  }
}
