package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Shuffle avoidance via bucketing — the engine-native answer to the
  * reference's "already partitioned on join keys → skip shuffle" rule
  * (`_merge.py:270-300`, SURVEY §4.2 shuffle elision): tables bucketed on
  * the join key join WITHOUT any exchange.
  */
class BucketingSpec extends SparkTestBase {

  import spark.implicits._

  test("bucketed-by-key tables join with zero exchanges") {
    val left = (1L to 1000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (500L to 1500L).map(i => (i, s"r$i")).toDF("k", "rv")
    left.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_left")
    right.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_right")

    // below the broadcast threshold a broadcast would also avoid the
    // shuffle trivially — disable it so the bucketed sort-merge path is
    // what's being proven
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), Seq("k"))
      assert(joined.count() == 501)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }
}
