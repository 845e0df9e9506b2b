package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hive-partitioned parquet write + partition pruning on read — the
  * reference's hive-partitioning support in `read_parquet`/`to_parquet`
  * (`io/parquet.py`, SURVEY §2.1). At 100 TB, pruning entire directories
  * is the difference between scanning one partition and scanning all.
  */
class PartitionedIOSpec extends SparkTestBase {

  import spark.implicits._

  test("partitionBy write; predicate on partition column prunes directories") {
    val dir = "/tmp/graft_io/part_orders"
    val df = Seq(
      (1L, "F", 10.0), (2L, "F", 20.0), (3L, "O", 30.0), (4L, "P", 40.0)
    ).toDF("id", "status", "price")
    IO.toParquet(df, dir, partitionBy = Seq("status"))

    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/status=F")))

    val read = IO.readParquet(spark, dir).filter(col("status") === "F")
    assert(read.df.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    val plan = read.df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("isnotnull(status"),
      s"expected partition filters in:\n$plan")
    // only the matching directory's files are planned
    val scanned = read.df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }
    assert(scanned.contains(1), s"expected 1 pruned partition, got $scanned")
  }

  test("bag to_textfiles writes line-per-element text") {
    val dir = "/tmp/graft_io/bag_text"
    graft.api.GBag.fromSeq(spark, Seq("alpha", "beta", "gamma"), npartitions = 2)
      .toTextfiles(dir)
    val back = spark.read.text(dir).collect().map(_.getString(0)).toSet
    assert(back == Set("alpha", "beta", "gamma"))
  }

  test("repartitionFreq: one range partition per interval, no interval splits") {
    val df = spark.range(0, 600).select(
      col("id"),
      timestamp_seconds(lit(1700000000L) + col("id") * 10).as("ts"))
    val out = graft.api.GDF(df).repartitionFreq("ts", 1000L) // 6 x 1000s intervals
    assert(out.df.rdd.getNumPartitions == 6)
    // RangePartitioner never splits equal bucket keys: every 1000s
    // interval lives in exactly one partition
    val spans = out.df
      .select(spark_partition_id().as("p"),
        floor(unix_micros(col("ts").cast("timestamp")) / lit(1000L * 1000000L)).as("b"))
      .distinct().groupBy(col("b")).count().collect()
    assert(spans.forall(_.getLong(1) == 1L))
  }

  test("repartitionTargetSize derives partition count from plan stats") {
    val df = spark.range(0, 100000).toDF("id")
    val tiny = graft.api.GDF(df).repartitionTargetSize(64 * 1024L)
    val coarse = graft.api.GDF(df).repartitionTargetSize(1024L * 1024 * 1024)
    assert(tiny.df.rdd.getNumPartitions > coarse.df.rdd.getNumPartitions)
    assert(coarse.df.rdd.getNumPartitions == 1)
    assert(tiny.df.count() == 100000)
  }
}
