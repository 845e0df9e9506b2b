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
}
