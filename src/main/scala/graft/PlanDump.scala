package graft

/** Prints one query's AQE-final executed plan (after an action) — the
  * plan-audit companion to [[MacroPlanProbe]] when the full tree, not
  * just the join-node census, is the question.
  *
  * Usage: `runMain graft.PlanDump <name> [sfDir]`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.getOrCreate(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val df = SparkEntry.queries(name)(spark, dir)
    df.count(): Unit
    println("===PLAN===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
