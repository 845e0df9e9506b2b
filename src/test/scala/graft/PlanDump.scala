package graft
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate(16)
    for (n <- args.drop(1)) {
      val df = SparkEntry.queries(n)(spark, args(0))
      df.collect()
      println(s"===== $n =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
