package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series resampling — reference `dask/dataframe/tseries/resample.py:
  * 106-277`: bin rows into fixed time buckets and aggregate per bucket.
  *
  * The reference repartitions to rule-aligned divisions then runs pandas
  * `resample` per partition; on Spark a tumbling bucket is just a
  * deterministic grouping key (`date_trunc` / floored epoch arithmetic),
  * so resample = groupBy(bucket).agg(...) — one partial→final hash
  * aggregate, fully parallel, no special partitioning requirement at all.
  */
object Resample {

  /** Floor `ts` to a bucket of `seconds` width (epoch-aligned).  Arbitrary
    * widths (90s, 2h, …) — more general than `date_trunc`.
    */
  def bucket(ts: Column, seconds: Long): Column =
    timestamp_seconds(floor(unix_micros(ts) / lit(seconds * 1000000L)) * lit(seconds))

  /** resample(rule).agg — returns one row per non-empty bucket (pandas
    * emits empty buckets too; callers needing them can join a generated
    * bucket range via sequence()).
    */
  def agg(df: DataFrame, tsCol: String, seconds: Long, aggs: Seq[(String, Column)]): DataFrame = {
    val exprs = aggs.map { case (alias, c) => c.as(alias) }
    df.groupBy(bucket(col(tsCol), seconds).as(tsCol))
      .agg(exprs.head, exprs.tail: _*)
  }

  /** OHLC — open/high/low/close per bucket; open/close are order-dependent
    * so they tie-break on a secondary unique column (`ordCol`), matching
    * the reference's first/last-in-bin semantics.
    */
  def ohlc(df: DataFrame, tsCol: String, seconds: Long, valueCol: String,
           ordCol: String): DataFrame = {
    val tie = struct(col(tsCol), col(ordCol))
    df.groupBy(bucket(col(tsCol), seconds).as(tsCol))
      .agg(
        min_by(col(valueCol), tie).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), tie).as("close"))
  }

  /** Dense resample: include empty buckets between global min and max,
    * pandas-style.  The bucket spine is generated distributively with
    * `sequence` + explode (no driver loop).
    */
  def aggDense(df: DataFrame, tsCol: String, seconds: Long,
               aggs: Seq[(String, Column)]): DataFrame = {
    val sparse = agg(df, tsCol, seconds, aggs)
    val bounds = df.agg(min(bucket(col(tsCol), seconds)).as("lo"),
                        max(bucket(col(tsCol), seconds)).as("hi"))
    val spine = bounds.select(
      explode(sequence(col("lo"), col("hi"), expr(s"INTERVAL $seconds SECONDS"))).as(tsCol))
    spine.join(sparse, Seq(tsCol), "left")
  }
}
