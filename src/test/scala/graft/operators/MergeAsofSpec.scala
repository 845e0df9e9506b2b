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

  test("reference fixture: indexed backward merge across partitions") {
    // test_merge_asof_indexed (dask_expr/tests/test_merge_asof.py): A/B on
    // integer indexes, npartitions 4/3; expected = pandas merge_asof
    val aIdx = Seq(1, 3, 7, 9, 10, 13, 14, 17, 20, 24, 25, 28)
    val aVal = "abcd" * 3
    val bIdx = Seq(1, 2, 3, 6, 7, 10, 12, 14, 16, 19, 23, 26)
    val bVal = "xyz" * 4
    val a = aIdx.zip(aVal).map { case (i, v) => (i, v.toString) }.toDF("idx", "left_val")
      .repartition(4)
    val b = bIdx.zip(bVal).map { case (i, v) => (i, v.toString) }.toDF("idx", "right_val")
      .repartition(3)
    val out = MergeAsof(a, b, on = "idx")
      .collect().map(r => r.getInt(0) -> r.getString(2)).toMap
    val expected = Map(1 -> "x", 3 -> "z", 7 -> "y", 9 -> "y", 10 -> "z", 13 -> "x",
      14 -> "y", 17 -> "z", 20 -> "x", 24 -> "y", 25 -> "y", 28 -> "z")
    assert(out == expected)
  }

  test("reference fixture: on-column basic and exact-nearest") {
    // test_merge_asof_on_basic
    val a = Seq((1, "a"), (5, "b"), (10, "c")).toDF("a", "left_val").repartition(2)
    val b = Seq((1, 1), (2, 2), (3, 3), (6, 6), (7, 7)).toDF("a", "right_val").repartition(2)
    val out = MergeAsof(a, b, on = "a")
      .collect().map(r => r.getInt(0) -> r.getInt(2)).toMap
    assert(out == Map(1 -> 1, 5 -> 3, 10 -> 7))

    // test_merge_asof_one_partition (nearest, all keys exact)
    val l = Seq((1, 4), (2, 5), (3, 6)).toDF("a", "b")
    val r = Seq((1, 4), (2, 5), (3, 6)).toDF("a", "c")
    val near = MergeAsof(l, r, on = "a", direction = "nearest")
      .collect().map(x => x.getInt(0) -> x.getInt(2)).toMap
    assert(near == Map(1 -> 4, 2 -> 5, 3 -> 6))
  }

  test("global (no-by) asof: bucket-parallel carry matches brute force in all directions") {
    // ts values chosen so some left/right timestamps coincide exactly
    // (exact-match visibility crosses the synthetic bucket key too)
    val lrows = (0 until 500).map(i => (i.toLong, i * 3.0 + (i % 7) * 0.1))
    val rrows = (0 until 80).map(j => (j.toLong, j * 15.0, j * 1.0))
    val l = lrows.toDF("lid", "t").repartition(8)
    val r = rrows.toDF("rid", "t", "v").repartition(5)
    for (dir <- Seq("backward", "forward", "nearest")) {
      val out = MergeAsof(l, r, on = "t", direction = dir).collect().map { row =>
        row.getLong(row.fieldIndex("lid")) ->
          (if (row.isNullAt(row.fieldIndex("v"))) None
           else Some(row.getDouble(row.fieldIndex("v"))))
      }.toMap
      lrows.foreach { case (lid, t) =>
        val bwd = rrows.filter(_._2 <= t).sortBy(_._2).lastOption
        val fwd = rrows.filter(_._2 >= t).sortBy(_._2).headOption
        val exp = dir match {
          case "backward" => bwd.map(_._3)
          case "forward"  => fwd.map(_._3)
          case "nearest" => (bwd, fwd) match {
            case (Some(b), Some(f)) => Some(if (t - b._2 <= f._2 - t) b._3 else f._3)
            case (b, f)             => b.orElse(f).map(_._3)
          }
        }
        assert(out(lid) == exp, s"dir=$dir lid=$lid t=$t")
      }
    }
  }

  test("right payload column name collision gets suffixed") {
    val r2 = right.withColumnRenamed("v", "t2").withColumnRenamed("t2", "v")
    val l2 = left.withColumn("v", org.apache.spark.sql.functions.lit(-1.0))
    val out = MergeAsof(l2, right, on = "t", by = Seq("k"))
    assert(out.columns.contains("v_right"))
    assert(out.columns.count(_ == "v") == 1)
  }
}
