package graft.api

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The pandas-API long tail: combine, align, select_dtypes,
  * memory_usage_per_partition — small frames, several partitions,
  * pandas-documented expectations.
  */
class GdfLongTailSpec extends SparkTestBase {
  import spark.implicits._

  private def left = GDF(Seq(
    (1L, 10.0, "x"), (2L, 20.0, "y"), (3L, 30.0, "z")
  ).toDF("id", "v", "s").repartition(2)).withIndex("id")

  private def right = GDF(Seq(
    (2L, 200.0, true), (3L, 300.0, false), (4L, 400.0, true)
  ).toDF("id", "v", "flag").repartition(2)).withIndex("id")

  test("combine applies func to shared columns and passes one-sided columns through") {
    val out = left.combine(right)((a, b) =>
      coalesce(greatest(a, b), a, b)).df
    val rows = out.select("id", "v").as[(Long, Double)].collect().toMap
    assert(rows == Map(1L -> 10.0, 2L -> 200.0, 3L -> 300.0, 4L -> 400.0))
    // one-sided columns survive with nulls on absent labels
    assert(out.columns.toSet == Set("id", "v", "s", "flag"))
    val s4 = out.where(col("id") === 4).select("s").collect().head
    assert(s4.isNullAt(0))
  }

  test("align outer/inner/left reindex both frames to the same label set") {
    val (lo, ro) = left.align(right, "outer")
    val ids = lo.df.select("id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L, 4L))
    assert(ro.df.select("id").as[Long].collect().sorted.toSeq == ids)
    // label 1 exists only left: right side aligned row is null-filled
    assert(ro.df.where(col("id") === 1).select("v").collect().head.isNullAt(0))
    val (li, _) = left.align(right, "inner")
    assert(li.df.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    val (_, rl) = left.align(right, "left")
    assert(rl.df.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("dotSeries: index-aligned product sum; autocorr matches driver Pearson") {
    assert(left.dotSeries("v", right, "v") == 20.0 * 200 + 30.0 * 300)
    // autocorr over a sorted index: lag-1 Pearson of a known series
    val xs = Seq(1.0, 3.0, 2.0, 5.0, 4.0, 6.0, 8.0, 7.0)
    val g = GDF(xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v").repartitionByRange(3, col("id"))).setIndex("id")
    val got = g.autocorr("v", 1)
    val (a, b) = (xs.dropRight(1), xs.drop(1))
    def mean(s: Seq[Double]) = s.sum / s.length
    val (ma, mb) = (mean(a), mean(b))
    val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
    val ref = cov / math.sqrt(a.map(x => (x - ma) * (x - ma)).sum *
      b.map(y => (y - mb) * (y - mb)).sum)
    assert(math.abs(got - ref) < 1e-12, s"$got vs $ref")
  }

  test("select_dtypes by category and exclusion keeps the index") {
    val g = left
    val num = g.selectDtypes(include = Seq("number"))
    assert(num.columns.toSet == Set("id", "v"))
    val noStr = g.selectDtypes(exclude = Seq("object"))
    assert(noStr.columns.toSet == Set("id", "v"))
    val strs = g.selectDtypes(include = Seq("string"))
    assert(strs.columns.toSet == Set("id", "s"))
    val bools = right.selectDtypes(include = Seq("bool"))
    assert(bools.columns.toSet == Set("id", "flag"))
  }

  test("memory_usage_per_partition: rows sum to total, bytes positive on non-empty parts") {
    val g = GDF(spark.range(1000).toDF("v").repartition(4))
    val rep = g.memoryUsagePerPartition().collect()
    assert(rep.map(_.getLong(1)).sum == 1000L)
    assert(rep.forall(r => r.getLong(1) == 0 || r.getLong(2) > 0))
    assert(rep.map(_.getInt(0)).distinct.length == rep.length)
  }
}
