package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** As-of (nearest-key) join — `merge_asof` in the reference
  * (`dask/dataframe/dask_expr/_merge_asof.py:19-440`,
  * `_collection.py:5687`).
  *
  * The reference repartitions both sides to common divisions and
  * propagates partition tails across boundaries so each partition can run
  * a local pandas `merge_asof`.  Spark-first re-expression: **union the
  * two sides, order by (by, on, side-tag) and window-carry the most recent
  * right-side row onto every left row** — one exchange, one sort, no
  * cross-partition boundary bookkeeping, and whole-stage codegen handles
  * the carry.  That is exactly the prefix-propagation the reference hand
  * rolls with `compute_tails`/`prefix_reduction`, done by Spark's native
  * window machinery.
  *
  * `nearest` computes the backward and the forward carry as two window
  * columns over the SAME union (two sorts, one exchange) and picks the
  * nearer side per row — no row-id bookkeeping or self-join, so the result
  * is deterministic even over nondeterministic upstreams (sample, unstable
  * shuffle order), where a join keyed on `monotonically_increasing_id`
  * could silently misalign rows.
  *
  * Semantics implemented: direction ∈ backward / forward / nearest,
  * optional `by` grouping keys, `tolerance` (in units of `on`; for
  * timestamps pass seconds), `allowExactMatches`.
  *
  * Scale note: with `by` keys the window partitions by them and the plan
  * is fully parallel.  Without `by` the carry is still parallel: `on` is
  * range-bucketed into a synthetic partition key (one O(1)-row min/max
  * aggregate picks the span), the window carry runs per bucket, and the
  * cross-bucket seed — the last right row of every earlier bucket — is a
  * running scan over O(nBuckets) per-bucket tail rows collected to the
  * driver, the same boundary-row pattern as the two-pass cumulative
  * operators.  No unpartitioned window anywhere.
  */
object MergeAsof {

  def apply(
      left: DataFrame,
      right: DataFrame,
      on: String,
      by: Seq[String] = Nil,
      direction: String = "backward",
      tolerance: Option[Double] = None,
      allowExactMatches: Boolean = true,
      rightSuffix: String = "_right"): DataFrame = {

    require(left.columns.contains(on) && right.columns.contains(on), s"both sides need '$on'")
    direction match {
      case "backward" | "forward" =>
        joinOneDirection(left, right, on, by, direction, tolerance, allowExactMatches, rightSuffix)
      case "nearest" => nearest(left, right, on, by, tolerance, allowExactMatches, rightSuffix)
      case other => throw new IllegalArgumentException(s"direction=$other")
    }
  }

  /** numeric view of the `on` column (timestamps → epoch seconds as double) */
  private def onNum(df: DataFrame, on: String): Column = {
    df.schema(on).dataType.typeName match {
      case "timestamp" | "timestamp_ntz" => unix_micros(col(on).cast("timestamp")).cast("double") / 1e6
      case "date"                        => col(on).cast("timestamp").cast("double")
      case _                             => col(on).cast("double")
    }
  }

  private val IsLeft = "__asof_isleft__"
  private val OnNum = "__asof_on__"
  private val Bucket = "__asof_bucket__"

  private def numBuckets(df: DataFrame): Int =
    math.max(1, df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt)

  /** Synthetic `by` key for the global (no-`by`) case: equi-width range
    * buckets over the numeric `on`.  Equal `on` values always land in the
    * same bucket, so the within-bucket tag ordering (exact-match
    * visibility) is preserved exactly.
    */
  private def withRangeBucket(unioned: DataFrame, nBuckets: Int): DataFrame = {
    val r = unioned.agg(
      org.apache.spark.sql.functions.min(col(OnNum)),
      org.apache.spark.sql.functions.max(col(OnNum))).head()
    if (r.isNullAt(0) || r.getDouble(0) == r.getDouble(1))
      unioned.withColumn(Bucket, lit(0L))
    else {
      val mn = r.getDouble(0)
      val span = (r.getDouble(1) - mn) / nBuckets
      unioned.withColumn(Bucket,
        least(floor((col(OnNum) - lit(mn)) / lit(span)), lit(nBuckets - 1L)).cast("long"))
    }
  }

  /** payload columns the right side contributes (renamed if clashing) */
  private def rightPayload(left: DataFrame, right: DataFrame, on: String, by: Seq[String],
                           suffix: String): Seq[(String, String)] = {
    val keys = Set(on) ++ by
    right.columns.toSeq.filterNot(keys.contains).map { c =>
      c -> (if (left.columns.contains(c)) c + suffix else c)
    }
  }

  /** Union schema: by ++ on-num ++ isleft ++ left payload ++ right payload,
    * with each side null-padded for the other's columns.
    * Returns (unioned, leftCols, outRight).
    */
  private def buildUnion(left: DataFrame, right: DataFrame, on: String, by: Seq[String],
                         suffix: String): (DataFrame, Seq[String], Seq[String]) = {
    val payload = rightPayload(left, right, on, by, suffix)
    val outRight = payload.map(_._2)

    val leftCols = left.columns.toSeq
    val l = left
      .withColumn(OnNum, onNum(left, on))
      .withColumn(IsLeft, lit(true))
    val lPadded = payload.foldLeft(l) { case (d, (src, dst)) =>
      d.withColumn(dst, lit(null).cast(right.schema(src).dataType))
    }
    var r = right.withColumn(OnNum, onNum(right, on)).withColumn(IsLeft, lit(false))
    for ((src, dst) <- payload) if (src != dst) r = r.withColumnRenamed(src, dst)
    val rPadded = leftCols.filterNot(c => by.contains(c) || outRight.contains(c))
      .foldLeft(r) { (d, c) =>
        if (d.columns.contains(c)) d else d.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }

    val cols = by ++ Seq(OnNum, IsLeft) ++ leftCols.filterNot(by.contains) ++ outRight
    val unioned = lPadded.select(cols.distinct.map(col): _*)
      .unionByName(rPadded.select(cols.distinct.map(col): _*))
    (unioned, leftCols, outRight)
  }

  /** Carry window for one direction.  Tag ordering decides whether an
    * exact-timestamp right row is visible: the carry always looks backwards
    * in ITERATION order (forward just iterates descending), so in both
    * directions an exact-match right row is visible iff it sorts before the
    * left row at equal `on`.
    */
  private def tagOrd(allowExact: Boolean): Column =
    when(col(IsLeft), lit(if (allowExact) 1 else 0))
      .otherwise(lit(if (allowExact) 0 else 1))

  private def carryWindow(by: Seq[String], backward: Boolean, allowExact: Boolean): WindowSpec = {
    val t = tagOrd(allowExact)
    val ord: Seq[Column] =
      if (backward) Seq(col(OnNum).asc, t.asc) else Seq(col(OnNum).desc, t.asc)
    // callers guarantee non-empty keys: real `by` columns or the synthetic
    // range bucket — an unpartitioned window never appears in the plan
    Window.partitionBy(by.map(col): _*)
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
  }

  /** add `prefix<c>` carry columns (plus `prefix__asof_on__`) for one
    * direction.  The WHOLE right row is carried as one struct so the match
    * is atomic: a matched right row with null payload fields yields those
    * nulls (pandas semantics) instead of per-column ignoreNulls carries
    * silently mixing values from different right rows.
    */
  private def carry(unioned: DataFrame, outRight: Seq[String], by: Seq[String],
                    backward: Boolean, allowExact: Boolean, prefix: String): DataFrame = {
    val fields = outRight :+ OnNum
    val src = when(!col(IsLeft), struct(fields.map(col): _*))
    val tmp = prefix + "__row"
    val carried =
      if (by.nonEmpty)
        unioned.withColumn(tmp, last(src, ignoreNulls = true).over(
          carryWindow(by, backward, allowExact)))
      else {
        // global case: per-bucket window carry (parallel), then seed each
        // bucket with the last right row of all earlier buckets in
        // iteration order.  The seed scan collects one tail row per
        // bucket — O(nBuckets), the two-pass-operator boundary pattern.
        val w = carryWindow(Seq(Bucket), backward, allowExact)
        val withCarry = unioned.withColumn(tmp, last(src, ignoreNulls = true).over(w))
        // the bucket's final carry = tmp at the iteration-LAST row of the
        // bucket: max/min over (on, tag) picks that row without a sort
        val iterKey =
          if (backward) struct(col(OnNum), tagOrd(allowExact))
          else struct(col(OnNum), -tagOrd(allowExact))
        val tailAgg = if (backward) max_by(col(tmp), iterKey) else min_by(col(tmp), iterKey)
        val tails = withCarry.groupBy(col(Bucket)).agg(tailAgg.as("__tail"))
        val ordered = tails
          .orderBy(if (backward) col(Bucket).asc else col(Bucket).desc)
          .collect()
        var run: Any = null
        val prevRows = ordered.map { r =>
          val out = org.apache.spark.sql.Row(r.get(0), run)
          if (!r.isNullAt(1)) run = r.get(1)
          out
        }.toSeq
        val prevSchema = org.apache.spark.sql.types.StructType(Seq(
          tails.schema.fields(0).copy(name = Bucket),
          tails.schema.fields(1).copy(name = "__prev", nullable = true)))
        val spark = unioned.sparkSession
        val prev = spark.createDataFrame(
          spark.sparkContext.parallelize(prevRows, 1), prevSchema)
        withCarry.join(broadcast(prev), Seq(Bucket), "left")
          .withColumn(tmp, coalesce(col(tmp), col("__prev")))
          .drop("__prev")
      }
    fields.foldLeft(carried) {
      (d, c) => d.withColumn(prefix + c, col(tmp).getField(c))
    }.drop(tmp)
  }

  private def joinOneDirection(
      left: DataFrame, right: DataFrame, on: String, by: Seq[String],
      direction: String, tolerance: Option[Double], allowExact: Boolean,
      suffix: String): DataFrame = {

    val (unioned0, leftCols, outRight) = buildUnion(left, right, on, by, suffix)
    val unioned = if (by.isEmpty) withRangeBucket(unioned0, numBuckets(unioned0)) else unioned0
    val backward = direction == "backward"
    val carried = carry(unioned, outRight, by, backward, allowExact, "__carry_")

    val withinTol: Column = tolerance match {
      case Some(t) =>
        val diff = if (backward) col(OnNum) - col(s"__carry_$OnNum")
                   else col(s"__carry_$OnNum") - col(OnNum)
        diff <= lit(t)
      case None => lit(true)
    }

    carried
      .filter(col(IsLeft))
      .select(
        (leftCols.map(col) ++
          outRight.map(c => when(withinTol, col(s"__carry_$c")).otherwise(lit(null)).as(c))): _*)
  }

  /** nearest = min(backward-dist, forward-dist); ties → backward (pandas). */
  private def nearest(
      left: DataFrame, right: DataFrame, on: String, by: Seq[String],
      tolerance: Option[Double], allowExact: Boolean, suffix: String): DataFrame = {

    val (unioned0, leftCols, outRight) = buildUnion(left, right, on, by, suffix)
    val unioned = if (by.isEmpty) withRangeBucket(unioned0, numBuckets(unioned0)) else unioned0
    val carried = carry(
      carry(unioned, outRight, by, backward = true, allowExact, "__bwd_"),
      outRight, by, backward = false, allowExact, "__fwd_")

    val distBwd = col(OnNum) - col(s"__bwd_$OnNum")
    val distFwd = col(s"__fwd_$OnNum") - col(OnNum)
    def inTol(d: Column): Column = tolerance match {
      case Some(t) => d.isNotNull && d <= lit(t)
      case None    => d.isNotNull
    }
    val validBwd = inTol(distBwd)
    val validFwd = inTol(distFwd)
    val useBwd = validBwd && (!validFwd || distBwd <= distFwd)

    carried
      .filter(col(IsLeft))
      .select(
        (leftCols.map(col) ++ outRight.map { c =>
          when(useBwd, col(s"__bwd_$c"))
            .when(validFwd, col(s"__fwd_$c"))
            .otherwise(lit(null)).as(c)
        }): _*)
  }
}
