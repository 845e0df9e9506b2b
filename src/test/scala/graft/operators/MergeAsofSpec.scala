package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

/** merge_asof semantics (mirrors reference test_merge_asof.py cases):
  * directions, tolerance, allow_exact_matches, by-keys, unmatched rows.
  */
class MergeAsofSpec extends SparkTestBase {
  import spark.implicits._

  private def left = Seq(
    ("a", 1.0), ("a", 5.0), ("a", 10.0),
    ("b", 2.0), ("b", 7.0)).toDF("k", "t")
  private def right = Seq(
    ("a", 1.0, 100.0), ("a", 4.0, 200.0), ("a", 8.0, 300.0),
    ("b", 3.0, 400.0)).toDF("k", "t", "v")

  private def collectMap(df: org.apache.spark.sql.DataFrame): Map[(String, Double), Option[Double]] =
    df.collect().map { r =>
      (r.getString(r.fieldIndex("k")), r.getDouble(r.fieldIndex("t"))) ->
        (if (r.isNullAt(r.fieldIndex("v"))) None else Some(r.getDouble(r.fieldIndex("v"))))
    }.toMap

  test("backward with by-keys") {
    val out = collectMap(MergeAsof(left, right, on = "t", by = Seq("k")))
    assert(out(("a", 1.0)).contains(100.0)) // exact match allowed
    assert(out(("a", 5.0)).contains(200.0))
    assert(out(("a", 10.0)).contains(300.0))
    assert(out(("b", 2.0)).isEmpty) // no right row ≤ 2
    assert(out(("b", 7.0)).contains(400.0))
  }

  test("backward, allowExactMatches=false skips equal timestamps") {
    val out = collectMap(MergeAsof(left, right, on = "t", by = Seq("k"),
      allowExactMatches = false))
    assert(out(("a", 1.0)).isEmpty) // the t=1 right row no longer matches
    assert(out(("a", 5.0)).contains(200.0))
  }

  test("forward direction") {
    val out = collectMap(MergeAsof(left, right, on = "t", by = Seq("k"),
      direction = "forward"))
    assert(out(("a", 1.0)).contains(100.0))
    assert(out(("a", 5.0)).contains(300.0)) // next right at t=8
    assert(out(("a", 10.0)).isEmpty) // nothing after 10
    assert(out(("b", 2.0)).contains(400.0))
  }

  test("tolerance nulls out matches that are too far") {
    val out = collectMap(MergeAsof(left, right, on = "t", by = Seq("k"),
      tolerance = Some(1.5)))
    assert(out(("a", 5.0)).contains(200.0)) // 5-4=1 ≤ 1.5
    assert(out(("a", 10.0)).isEmpty) // 10-8=2 > 1.5
  }

  test("nearest picks the closer side, ties go backward") {
    val out = collectMap(MergeAsof(left, right, on = "t", by = Seq("k"),
      direction = "nearest"))
    assert(out(("a", 5.0)).contains(200.0)) // dist 1 back vs 3 fwd
    assert(out(("a", 10.0)).contains(300.0)) // only backward exists
    assert(out(("b", 2.0)).contains(400.0)) // only forward exists
  }

  test("right payload column name collision gets suffixed") {
    val r2 = right.withColumnRenamed("v", "t2").withColumnRenamed("t2", "v")
    val l2 = left.withColumn("v", org.apache.spark.sql.functions.lit(-1.0))
    val out = MergeAsof(l2, right, on = "t", by = Seq("k"))
    assert(out.columns.contains("v_right"))
    assert(out.columns.count(_ == "v") == 1)
  }
}
