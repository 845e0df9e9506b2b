package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join: deterministic file replay on
  * both sides, memory sink, pairs checked against the batch-join truth.
  */
class IntervalJoinSpec extends SparkTestBase {

  test("purchases join clicks within [0, 1h] after the click, state bounded by watermark") {
    import spark.implicits._
    val run = java.util.UUID.randomUUID.toString.replace("-", "")
    val lDir = s"/tmp/graft_stream/ij_l_$run"
    val rDir = s"/tmp/graft_stream/ij_r_$run"
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 09:00:00")
    def at(mins: Long) = new java.sql.Timestamp(t0.getTime + mins * 60000L)

    val clicks = Seq(
      (1L, at(0), "a"), (1L, at(90), "b"), (2L, at(10), "c"), (3L, at(20), "d")
    ).toDF("user", "cts", "page")
    val buys = Seq(
      (1L, at(30), 10.0),  // joins click(1,@0,a) only (30m after; 90m click is later)
      (1L, at(95), 20.0),  // joins click(1,@0)? 95m > 60m -> no; joins (1,@90,b): +5m yes
      (2L, at(80), 30.0),  // 70m after click(2,@10) -> outside [0,60] -> no match
      (4L, at(15), 40.0)   // no click for user 4
    ).toDF("user", "pts", "amount")
    // far-future flush rows advance both watermarks so all state closes
    val lFlush = Seq((98L, at(200000L), "zz")).toDF("user", "cts", "page")
    val rFlush = Seq((99L, at(200001L), 0.0)).toDF("user", "pts", "amount")

    val base = java.lang.System.currentTimeMillis()
    graft.SparkEntry.writeStreamFile(clicks, lDir, "b1", base - 40000)
    graft.SparkEntry.writeStreamFile(lFlush, lDir, "b2", base - 30000)
    graft.SparkEntry.writeStreamFile(buys, rDir, "b1", base - 40000)
    graft.SparkEntry.writeStreamFile(rFlush, rDir, "b2", base - 30000)

    val lStream = spark.readStream.schema(clicks.schema).parquet(lDir)
    val rStream = spark.readStream.schema(buys.schema).parquet(rDir)
    val qn = s"ij_$run"
    val q = StreamOps.intervalJoin(lStream, rStream, "user",
        "cts", "pts", lowerSec = 0L, upperSec = 3600L, watermark = "10 minutes")
      .select(col("user"), col("page"), col("amount"))
      .writeStream.format("memory").queryName(qn).outputMode("append")
      .option("checkpointLocation", s"/tmp/graft_stream/ij_ck_$run")
      .start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table(qn).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val want = Set((1L, "a", 10.0), (1L, "b", 20.0))
    assert(got == want, s"got $got want $want")
  }
}
