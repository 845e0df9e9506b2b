package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measures the straggler effect the skew-resilient grouped cumulative
  * exists for (`Cumulative.grouped`, q215): the same grouped cumsum over
  * lineitem, once through the SQL-window path (one task per whole group)
  * and once through the range-split + segmented-tree-carry path, on a
  * given replica. On a zipf replica the window path's wall clock is
  * pinned by the hot-group task; the tree path spreads that group over
  * range partitions. min-of-`SPARK_GRAFT_BENCH_RUNS` wall each.
  *
  * Usage: `runMain graft.GroupedScanProbe <sfDir>`.
  */
object GroupedScanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1z")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = GraftSession.getOrCreate(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    // enough partitions that the hot group is many multiples of the
    // median partition — the straggler shape a 1000-executor cluster sees
    spark.conf.set("spark.sql.shuffle.partitions", "64")

    val li = GraftSession.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity").cast("long").as("qty"))

    def time(label: String)(make: => org.apache.spark.sql.DataFrame): Unit = {
      var best = Double.MaxValue
      (0 until runs).foreach { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        // same noop-style sink as Bench: full plan runs, nothing collected
        make.write.format("noop").mode("overwrite").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[gscan] $label secs=$best%.2f")
    }

    val ord = Seq("l_linenumber", "l_partkey", "l_suppkey", "qty")
    time("window (one task per group)") {
      val w = Window.partitionBy("l_orderkey")
        .orderBy(ord.map(col): _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      li.withColumn("cum_qty", sum(col("qty")).over(w))
    }
    time("tree (range-split groups)") {
      graft.operators.Cumulative.grouped(
        li, Seq("l_orderkey"), ord, "qty", graft.operators.Cumulative.CumSum, "cum_qty")
    }

    // deep-skew variant: half the fact on ONE key (deterministic hash
    // pick) — the shape where the window path's wall clock IS the hot
    // task and the crossover to the tree path shows up locally
    val deep = li.withColumn("l_orderkey",
      when(pmod(hash(col("l_linenumber"), col("l_partkey"), col("l_suppkey")),
        lit(2)) === 0, lit(0L)).otherwise(col("l_orderkey")))
    time("window deep-skew (50% one key)") {
      val w = Window.partitionBy("l_orderkey")
        .orderBy(ord.map(col): _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      deep.withColumn("cum_qty", sum(col("qty")).over(w))
    }
    time("tree deep-skew (50% one key)") {
      graft.operators.Cumulative.grouped(
        deep, Seq("l_orderkey"), ord, "qty", graft.operators.Cumulative.CumSum, "cum_qty")
    }

    // the family's rolling member on the same deep-skew shape
    time("rolling window deep-skew (w=4)") {
      val w = Window.partitionBy("l_orderkey")
        .orderBy(ord.map(col): _*).rowsBetween(-3, Window.currentRow)
      deep.withColumn("roll_qty", sum(col("qty")).over(w))
    }
    time("rolling tree deep-skew (w=4)") {
      graft.operators.MapOverlap.rollingAggGrouped(
        deep, Seq("l_orderkey"), ord, "qty", 4, "roll_qty", 1)(_.sum)
    }

    // the family's HOLISTIC member (q218): grouped exact percentiles on
    // the natural hot-group shape — 3 dictionary-valued groups over the
    // whole fact, each group's value-count map a third of the fact in
    // ONE agg buffer on the builtin path. timed in-full including the
    // operator's metadata jobs (the tree result is a 3-row frame, so the
    // noop sink times the compute, not the sink).
    val liFlag = GraftSession.table(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"))
    time("grouped percentile builtin (map per group)") {
      liFlag.groupBy(col("l_returnflag"))
        .agg(percentile(col("l_extendedprice"),
          array(lit(0.25), lit(0.5), lit(0.75))).as("ps"))
    }
    time("grouped percentile tree (range-split)") {
      graft.operators.Quantile.exactGrouped(
        liFlag, "l_returnflag", "l_extendedprice", Seq(0.25, 0.5, 0.75))
    }
    spark.stop()
  }
}
