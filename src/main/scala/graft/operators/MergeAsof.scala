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
  * is fully parallel.  Without `by` Spark plans a single-partition window;
  * for that case callers at cluster scale should pre-bucket `on` into
  * coarse ranges and pass the bucket as a `by` key, or use
  * [[MapOverlap]]-style ghost rows — the fixture queries all carry `by`.
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
  private def carryWindow(by: Seq[String], backward: Boolean, allowExact: Boolean): WindowSpec = {
    val rightFirst = allowExact
    val tagOrd = when(col(IsLeft), lit(if (rightFirst) 1 else 0))
      .otherwise(lit(if (rightFirst) 0 else 1))
    val ord: Seq[Column] =
      if (backward) Seq(col(OnNum).asc, tagOrd.asc) else Seq(col(OnNum).desc, tagOrd.asc)
    (if (by.nonEmpty) Window.partitionBy(by.map(col): _*) else Window.partitionBy())
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
    val w = carryWindow(by, backward, allowExact)
    val fields = outRight :+ OnNum
    val src = when(!col(IsLeft), struct(fields.map(col): _*))
    val tmp = prefix + "__row"
    fields.foldLeft(
        unioned.withColumn(tmp, last(src, ignoreNulls = true).over(w))) {
      (d, c) => d.withColumn(prefix + c, col(tmp).getField(c))
    }.drop(tmp)
  }

  private def joinOneDirection(
      left: DataFrame, right: DataFrame, on: String, by: Seq[String],
      direction: String, tolerance: Option[Double], allowExact: Boolean,
      suffix: String): DataFrame = {

    val (unioned, leftCols, outRight) = buildUnion(left, right, on, by, suffix)
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

    val (unioned, leftCols, outRight) = buildUnion(left, right, on, by, suffix)
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
