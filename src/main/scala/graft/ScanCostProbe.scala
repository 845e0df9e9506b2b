package graft

import org.apache.spark.sql.functions._

/** Component-cost breakdown of the grouped tree-scan path (round-15):
  * times each constituent pass of `Cumulative.grouped` separately so the
  * window-vs-tree gap can be attributed (scan, range shuffle, sort,
  * phase-1 job, full tree) instead of guessed.  min-of-`runs` wall each.
  *
  * Usage: `runMain graft.ScanCostProbe <sfDir>`.
  */
object ScanCostProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = GraftSession.getOrCreate(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    import org.apache.spark.sql.DataFrame

    val li = GraftSession.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity").cast("long").as("qty"))
    val ord = Seq("l_linenumber", "l_partkey", "l_suppkey", "qty")
    val arrangeCols = (Seq("l_orderkey") ++ ord).map(col)

    def time(label: String)(body: => Unit): Unit = {
      var best = Double.MaxValue
      (0 until runs).foreach { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        body
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[scancost] $label secs=$best%.2f")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("A scan only")(noop(li))
    time("A2 hash repartition 64")(noop(li.repartition(64, col("l_orderkey"))))
    time("A3 range repartition on 1 key")(noop(li.repartitionByRange(64, col("l_orderkey"))))
    time("A4 global orderBy (range+sort)")(noop(li.orderBy(arrangeCols: _*)))
    time("B scan+sample+rangeShuffle")(noop(li.repartitionByRange(64, arrangeCols: _*)))
    val arranged = li.repartitionByRange(64, arrangeCols: _*)
      .sortWithinPartitions(arrangeCols: _*)
    time("C B+sortWithinPartitions")(noop(arranged))
    time("C2 two jobs over one arranged RDD") {
      val rdd = graft.operators.InternalScan.rddOf(arranged)
      rdd.foreach(_ => ())
      rdd.foreach(_ => ())
    }
    time("D full tree cumsum")(noop(graft.operators.Cumulative.grouped(
      li, Seq("l_orderkey"), ord, "qty", graft.operators.Cumulative.CumSum, "cum_qty")))
    time("E window cumsum") {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey")
        .orderBy(ord.map(col): _*)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      noop(li.withColumn("cum_qty", sum(col("qty")).over(w)))
    }
    spark.stop()
  }
}
