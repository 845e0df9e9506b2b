package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the watermark-commit convention q144's fixture design relies on
  * (SparkEntry q144 scaladoc): the stateful windowed aggregation in
  * micro-batch N evaluates late rows against the watermark committed
  * BEFORE batch N-1's progress report — one batch EARLIER than the value
  * the report shows. q144 pins its advancer row AT max(ts) and forces
  * the max-ts row into batch 1 precisely so both conventions coincide;
  * if a Spark upgrade changes the commit timing, THIS test fails with a
  * pointed message instead of q144 diverging as a mystery hash mismatch.
  */
class WatermarkConventionSpec extends SparkTestBase {

  test("stateful op sees the watermark one batch behind the progress report") {
    import spark.implicits._
    val run = java.util.UUID.randomUUID.toString.replace("-", "")
    val watch = s"/tmp/graft_stream/wmconv_in_$run"
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 12:00:00")
    def at(offMs: Long) = new java.sql.Timestamp(t0.getTime + offMs)
    def rows(id: Long, ts: java.sql.Timestamp) =
      Seq((id, ts, 1L)).toDF("event_id", "ts", "cents")

    val base = java.lang.System.currentTimeMillis()
    // batch 1: the advancer — after it, the PROGRESS REPORT shows
    // watermark = t0 - 2h
    graft.SparkEntry.writeStreamFile(rows(1L, t0), watch, "b1", base - 30000)
    // batch 2: a row 10 HOURS late; its window [t0-10h, t0-9h) ended far
    // before the reported watermark (t0-2h). If the operator enforced the
    // reported watermark it would be DROPPED; under the one-batch-early
    // convention the operator still sees the pre-batch-1 watermark
    // (epoch), so it must be KEPT and aggregated.
    graft.SparkEntry.writeStreamFile(rows(2L, at(-10L * 3600 * 1000)),
      watch, "b2", base - 20000)
    // batch 3: far-future flush so every real window closes and append
    // mode emits it
    graft.SparkEntry.writeStreamFile(rows(3L, at(90L * 24 * 3600 * 1000)),
      watch, "b3", base - 10000)

    val schema = rows(0L, t0).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(watch)
    val qn = s"wmconv_$run"
    val query = StreamOps.windowedAgg(stream, "ts", "1 hour", "2 hours", "cents")
      .writeStream.format("memory").queryName(qn).outputMode("append")
      .option("checkpointLocation", s"/tmp/graft_stream/wmconv_ck_$run")
      .start()
    query.processAllAvailable()
    query.stop()

    val got = spark.table(qn).select(col("ts"), col("n")).collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    val lateWindow = at(-10L * 3600 * 1000)
    assert(got.contains(lateWindow) && got(lateWindow) == 1L,
      "WATERMARK CONVENTION CHANGED: a row arriving one batch after the " +
        "advancer was dropped against the advancer's own watermark — the " +
        "engine now commits watermarks in the same batch as the progress " +
        "report. q144's oracle (SparkEntry) assumes the one-batch-early " +
        s"convention; revisit its kept-set cutoff. Sink contents: $got")
    assert(got.contains(t0) && got(t0) == 1L, s"advancer window missing: $got")
  }
}
