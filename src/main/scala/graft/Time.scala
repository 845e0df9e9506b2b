package graft

/** Single-query timing harness: `runMain graft.Time <sfDir> <name...>` —
  * executes each named query through the noop sink (same methodology as
  * [[Bench]]) and prints per-query wall time, twice (cold + warm), so a
  * bench anomaly can be reproduced outside the full-suite JVM state.
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.getOrCreate(cpus)
    names.foreach { n =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[time] $n run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
