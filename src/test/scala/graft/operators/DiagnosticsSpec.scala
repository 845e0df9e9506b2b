package graft.operators

import graft.SparkTestBase
import graft.diagnostics.Diagnostics

/** `dask/diagnostics` on the Spark listener bus: task profiler, progress
  * bar, cache profiler, resource sampler — each driven by a real job.
  */
class DiagnosticsSpec extends SparkTestBase {

  test("Profiler records per-task timing/worker/metrics for a shuffle job") {
    val (sum, tasks) = Diagnostics.withProfiler(spark) {
      import spark.implicits._
      spark.range(100000).map(i => (i % 7, i)).toDF("k", "v")
        .groupBy("k").sum("v").collect().map(_.getLong(1)).sum
    }
    assert(sum == (0L until 100000L).sum)
    assert(tasks.nonEmpty, "no task records")
    assert(tasks.forall(t => t.finishTime >= t.launchTime))
    assert(tasks.forall(_.workerId.nonEmpty))
    // a groupBy writes and reads shuffle data somewhere in the job
    assert(tasks.exists(_.shuffleWriteBytes > 0), "no shuffle write seen")
    assert(tasks.exists(_.shuffleReadBytes > 0), "no shuffle read seen")
  }

  test("ProgressBar emits monotone progress ending at 100%") {
    val bar = new Diagnostics.ProgressBar(spark, out = _ => (), minIntervalMs = 0)
    bar.register()
    try {
      import spark.implicits._
      spark.range(10000).map(_ * 2).toDF("v").agg(org.apache.spark.sql.functions.sum("v")).collect()
    } finally bar.unregister()
    val lines = bar.lines
    assert(lines.nonEmpty, "no progress lines")
    assert(lines.last.contains("100%"), s"last line: ${lines.last}")
    val pcts = lines.map(l => l.split('|')(1).trim.takeWhile(_ != '%').trim.toInt)
    assert(pcts == pcts.sorted, "progress not monotone")
  }

  test("CacheProfiler sees a persist enter the cache and unpersist free it") {
    val prof = new Diagnostics.CacheProfiler(spark)
    prof.register()
    try {
      import spark.implicits._
      val df = spark.range(50000).toDF("v")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      // give the async block-update events a moment, then free
      Thread.sleep(300)
      df.unpersist(blocking = true)
    } finally prof.unregister()
    val recs = prof.results
    assert(recs.nonEmpty, "no cache records")
    assert(recs.forall(_.bytes > 0))
    assert(recs.exists(_.freeTime > 0), "no block observed leaving the cache")
    recs.filter(_.freeTime > 0).foreach(r => assert(r.freeTime >= r.cacheTime))
  }

  test("ResourceProfiler samples heap and load while a job runs") {
    val rp = new Diagnostics.ResourceProfiler(intervalMs = 20)
    rp.register()
    try {
      import spark.implicits._
      spark.range(200000).map(i => math.sqrt(i.toDouble)).reduce(_ + _)
      Thread.sleep(100)
    } finally rp.unregister()
    val samples = rp.results
    assert(samples.size >= 3, s"only ${samples.size} samples")
    assert(samples.forall(_.usedHeapBytes > 0))
    assert(samples.map(_.ts) == samples.map(_.ts).sorted)
  }

  test("Counters surface ccRounds and the last SemDeDup stats programmatically") {
    import org.apache.spark.sql.functions._
    // a 4-node path graph needs >0 contraction rounds; the counter must
    // reflect the run that just happened
    val edges = spark.range(3).select(col("id").as("a"), (col("id") + 1).as("b"))
    Dedup.connectedComponents(edges, "a", "b").collect()
    assert(Diagnostics.Counters.ccRounds >= 1,
      s"a 4-node path graph needs at least one contraction round, counter says ${Diagnostics.Counters.ccRounds}")
    // a star pair set converges in zero rounds — the counter must move
    val star = spark.range(3).select(lit(0L).as("a"), (col("id") + 1).as("b"))
    Dedup.connectedComponents(star, "a", "b").collect()
    assert(Diagnostics.Counters.ccRounds == 0,
      s"star input should converge in 0 rounds, counter says ${Diagnostics.Counters.ccRounds}")
    // SemDeDup stats land in the counter after a run with a tight cap
    import spark.implicits._
    val df = (0 until 40).map(i => (i.toLong, Array.fill(4)(1.0f + (i % 3) * 0.001f)))
      .toDF("vec_id", "embedding")
    val (_, stats) = Similarity.semanticDedupWithStats(df, "vec_id", "embedding",
      k = 1, iters = 1, tau = 0.999, maxCellSize = 5)
    assert(Diagnostics.Counters.semDedupStats.contains(stats))
  }
}
