package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Structured Streaming surface.
  *
  * The reference has NO streaming engine (SURVEY §2.6 — dask defers to
  * the external `streamz`/distributed projects), so this module is a
  * graft extension: the batch operators (resample → windowed agg,
  * groupby → keyed state) re-expressed over unbounded input.  The same
  * tumbling-bucket semantics as [[graft.operators.Resample]] come from
  * `window()` + watermark; custom per-key state uses
  * `mapGroupsWithState`.
  */
object StreamOps {

  /** Tumbling-window aggregate with late-data handling: the streaming
    * twin of `Resample.agg` (same bucket edges, same output schema plus
    * the window struct).
    */
  def windowedAgg(events: DataFrame, tsCol: String, windowDur: String,
                  watermark: String, valueCol: String = "value"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))
      .select(col("window.start").as(tsCol), col("n"), col("sum_value"))

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(nEvents: Long, total: Double, lastTs: Long)
  final case class SessionOut(user_id: Long, n_events: Long, total: Double)

  /** Session aggregation with an inactivity gap via `mapGroupsWithState`
    * (the `KeyValueGroupedDataset` custom-state path from the brief).
    *
    * Micro-batch rows are sorted by event time before folding — Spark
    * gives no intra-batch ordering, and a backwards `lastTs` would
    * corrupt the gap detection.  Idle keys are evicted by an EVENT-time
    * timeout at `lastTs + gapSeconds` once the watermark passes it (the
    * key's final session is emitted as it closes), so state stays
    * bounded on a firehose of ever-new keys.  (Event-time, not
    * processing-time: a processing-time timeout keeps scheduling no-data
    * batches, which livelocks `processAllAvailable` in tests and burns
    * cluster cycles on idle streams.)
    */
  def sessionize(events: Dataset[SessionEvent], gapSeconds: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", s"$gapSeconds seconds")
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.EventTimeTimeout)(
        (user: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val prev = state.get
            state.remove()
            SessionOut(user, prev.nEvents, prev.total)
          } else {
            val prev = state.getOption.getOrElse(SessionState(0L, 0.0, Long.MinValue))
            var (n, tot, last) = (prev.nEvents, prev.total, prev.lastTs)
            rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime / 1000
              if (last != Long.MinValue && t - last > gapSeconds) { n = 0; tot = 0.0 }
              n += 1; tot += e.value; last = t
            }
            state.update(SessionState(n, tot, last))
            // eviction target must sit past the current watermark
            state.setTimeoutTimestamp(math.max(
              (last + gapSeconds) * 1000L, state.getCurrentWatermarkMs + 1))
            SessionOut(user, n, tot)
          }
        })
  }

  /** Streaming exact dedup — the ingestion twin of
    * [[graft.operators.Dedup.exact]]: drop records whose key was already
    * seen, with state bounded by the watermark
    * (`dropDuplicatesWithinWatermark`: a duplicate arriving within the
    * watermark delay of the first occurrence is dropped; state for keys
    * older than the watermark is evicted, so the operator runs forever on
    * a firehose without unbounded key state).  `keyCols` is typically a
    * content hash (e.g. `md5(text)`) computed upstream.
    */
  def dedupStream(events: DataFrame, tsCol: String, watermark: String,
                  keyCols: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-static enrichment join: each micro-batch of the stream joins
    * the (small) static dimension, broadcast so the stream side never
    * shuffles — the standard metadata/quality-score enrichment step in an
    * ingestion pipeline.  Left join keeps stream rows with no dimension
    * match (nulls), mirroring `merge(how='left')`.
    */
  /** Stream-stream INNER interval join: rows pair when keys match and
    * `right.ts ∈ [left.ts + lowerSec, left.ts + upperSec]`. Both sides
    * carry watermarks so the join state is bounded — Spark buffers each
    * side only within the watermark + interval horizon, then evicts
    * (the standard event-time-constrained stream-stream join; a batch
    * engine has no counterpart, dask defers to streamz). Column names
    * must be disjoint apart from `key`; the right side's ts column is
    * `rightTs`.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   lowerSec: Long, upperSec: Long,
                   watermark: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) + expr(s"INTERVAL $lowerSec SECONDS") &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $upperSec SECONDS"),
      "inner")
      .drop(r(key))
  }

  def enrich(stream: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), keys, "left")

  /** File-sink pipeline starter: parquet-in → transform → parquet-out with
    * checkpointing (exactly-once file sink).
    */
  def fileSinkPipeline(spark: SparkSession, inPath: String, schema: org.apache.spark.sql.types.StructType,
                       outPath: String, checkpoint: String)(
      transform: DataFrame => DataFrame): StreamingQuery =
    transform(spark.readStream.schema(schema).parquet(inPath))
      .writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .start()
}
