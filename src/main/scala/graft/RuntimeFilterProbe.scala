package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Measures what Spark's runtime bloom-filter join pruning buys on the
  * macro fact-fact joins at the 100 TB shape (no broadcastable side) —
  * the companion measurement to `RuntimeFilterSpec`.
  *
  * For each query it runs bloom-OFF then bloom-ON (min-of-`runs` wall
  * each) under disabled broadcasts, and reports the per-scan output
  * rows read from the executed plan's SQL metrics: the bloom probe
  * drops non-joining fact rows AT THE SCAN, so the pruned row count —
  * not the wall clock of a 32-thread toy run — is the number that
  * scales: every dropped row is a row that never enters the fact-fact
  * shuffle on a 1000-executor cluster.
  *
  * Usage: `runMain graft.RuntimeFilterProbe <sfDir> [prefix,...]`.
  */
object RuntimeFilterProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val prefixes: Seq[String] =
      if (args.length > 1) args(1).split(',').toSeq
      else Seq("q209", "q212", "q214")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = GraftSession.getOrCreate(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    // scale the byte gates to the fixture: at 100 TB the DEFAULTS
    // (creation <= 10 MB plan size, application scan >= 10 GB) pass on
    // their own — locally lineitem is ~350 MB, so the gates must shrink
    // for the rule to engage at all
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1MB")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")

    def scanRows(p: SparkPlan): Seq[(String, Long)] = {
      val self = p match {
        case s if s.nodeName.contains("Scan") =>
          s.metrics.get("numOutputRows").map(m =>
            s.nodeName + ":" + s.schema.fieldNames.take(2).mkString(",") -> m.value).toSeq
        case e if e.nodeName.contains("Exchange") =>
          // shuffle records written = rows that actually crossed the wire;
          // the bloom probe's whole value is shrinking this number
          e.metrics.get("shuffleRecordsWritten").map(m =>
            "Shuffle:" + e.schema.fieldNames.take(2).mkString(",") -> m.value).toSeq
        case _ => Seq.empty
      }
      val kids = p.children ++ p.subqueries ++ (p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => Seq.empty
      })
      self ++ kids.flatMap(scanRows)
    }

    SparkEntry.queries
      .filter { case (name, _) => prefixes.exists(name.startsWith) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        for (bloom <- Seq(false, true)) {
          spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", bloom.toString)
          var best = Double.MaxValue
          var lastDf: org.apache.spark.sql.DataFrame = null
          (0 until runs).foreach { _ =>
            spark.catalog.clearCache()
            val df = fn(spark, dir)
            val t0 = System.nanoTime()
            df.collect()
            best = math.min(best, (System.nanoTime() - t0) / 1e9)
            lastDf = df
          }
          val scans = scanRows(lastDf.queryExecution.executedPlan)
          println(f"[rtf] $name bloom=$bloom secs=$best%.2f " +
            scans.map { case (s, n) => s"$s=$n" }.mkString(" "))
        }
      }
    spark.stop()
  }
}
