package graft

/** Plan auditor: prints the formatted physical plan of selected queries
  * (`runMain graft.Explain [sfDir] [name...]`). Used to check the
  * scale-critical plan properties per SURVEY §4: parquet `PushedFilters`
  * + pruned `ReadSchema`, broadcast vs shuffle join selection, partial→
  * final aggregation, and WholeStageCodegen coverage.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.getOrCreate(8)
    names.foreach { n =>
      println(s"\n===== $n =====")
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"error: ${e.getMessage}") }
    }
    spark.stop()
  }
}
