package graft.operators

import graft.SparkTestBase
import graft.api.GDF
import graft.functions.Aggregators
import org.apache.spark.sql.functions._

/** Array-module data algorithms (SURVEY §2.11) + custom Aggregators
  * (§2.10) + set/reshape additions (§2.8).
  */
class ArrayAlgsSpec extends SparkTestBase {

  import spark.implicits._

  test("histogram: fixed bins, numpy right-closed last bin, range filter") {
    val df = Seq(0.5, 1.5, 2.5, 3.5, 9.9, 10.0, 10.1, -1.0).toDF("x")
    // range [0, 10), 5 bins of width 2; 10.0 lands in the last bin
    // (right-closed), 10.1 and -1.0 are dropped
    val h = ArrayAlgs.histogram(df, "x", 0.0, 10.0, 5)
      .orderBy("bin").collect()
    assert(h.map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((0, 2L), (1, 2L), (4, 2L)))
    val row0 = h.head
    assert(row0.getDouble(2) == 0.0 && row0.getDouble(3) == 2.0)
  }

  test("histogramDd: joint bins, right-closed upper edges, range filter") {
    val df = Seq(
      (0.5, 0.5), (0.5, 1.5), (1.5, 0.5), (1.5, 1.5),
      (2.0, 2.0),            // both at hi → last bin each
      (2.5, 1.0), (1.0, -1.0) // out of range → dropped
    ).toDF("x", "y")
    val h = ArrayAlgs.histogramDd(df, Seq(("x", 0.0, 2.0, 2), ("y", 0.0, 2.0, 2)))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(h == Map((0, 0) -> 1L, (0, 1) -> 1L, (1, 0) -> 1L, (1, 1) -> 2L))
    // 1-dim degenerate case agrees with histogram counts
    val h1 = ArrayAlgs.histogramDd(df, Seq(("x", 0.0, 2.0, 2)))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(h1 == Map(0 -> 2L, 1 -> 4L))
  }

  test("bincount counts non-negative ints") {
    val df = Seq(0, 1, 1, 2, 2, 2, -3).toDF("v")
    val got = ArrayAlgs.bincount(df, "v").orderBy("value").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 1L), (1L, 2L), (2L, 3L)))
  }

  test("digitize: bucket = count of boundaries <= x") {
    val df = Seq(-5.0, 0.0, 0.5, 1.0, 2.5).toDF("x")
    val got = df.select(col("x"), ArrayAlgs.digitize("x", Seq(0.0, 1.0, 2.0)))
      .orderBy("x").collect().map(_.getInt(1)).toSeq
    assert(got == Seq(0, 1, 1, 2, 3))
  }

  test("searchsorted: left/right insertion indices match numpy") {
    val df = Seq(0.5, 1.0, 1.5, 2.0, 3.0).toDF("x")
    val bounds = Seq(1.0, 2.0)
    val got = df.select(col("x"),
        ArrayAlgs.searchsorted("x", bounds, "left", "l"),
        ArrayAlgs.searchsorted("x", bounds, "right", "r"))
      .collect().map(r => (r.getDouble(0), r.getInt(1), r.getInt(2))).toSeq
    // numpy: searchsorted([1,2], x, 'left'/'right')
    assert(got == Seq((0.5, 0, 0), (1.0, 0, 1), (1.5, 1, 1), (2.0, 1, 2), (3.0, 2, 2)))
    // NaN sorts last (numpy: index = len); NULL propagates
    val edge = Seq(Some(Double.NaN), None).toDF("x")
      .select(ArrayAlgs.searchsorted("x", bounds, "left", "i")).collect()
    assert(edge(0).getInt(0) == 2 && edge(1).isNullAt(0))
  }

  test("corrMatrix: long-form pairwise, single pass") {
    val df = Seq((1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0))
      .toDF("a", "b", "c")
    val m = ArrayAlgs.corrMatrix(df, Seq("a", "b", "c")).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    assert(m(("a", "b")) == 1.0)
    assert(m(("a", "c")) == -1.0)
    assert(m.size == 3)
  }

  test("geometricMean and weightedMean aggregators") {
    val df = Seq(("g", 2.0, 1.0), ("g", 8.0, 3.0)).toDF("k", "v", "w")
    val row = df.groupBy($"k").agg(
      Aggregators.geometricMean($"v").as("gm"),
      Aggregators.weightedMean($"v", $"w").as("wm")).collect().head
    assert(math.abs(row.getDouble(1) - 4.0) < 1e-12) // sqrt(2*8)
    assert(math.abs(row.getDouble(2) - 6.5) < 1e-12) // (2*1+8*3)/4
  }

  test("concatAxis1 aligns on key via full outer join; setops") {
    val l = GDF(Seq((1, "a"), (2, "b")).toDF("k", "x"))
    val r = GDF(Seq((2, "B"), (3, "C")).toDF("k", "y"))
    val joined = l.concatAxis1(r, "k").df.orderBy("k").collect()
    assert(joined.length == 3)
    assert(joined(0).getString(1) == "a" && joined(0).isNullAt(2))
    assert(joined(2).isNullAt(1) && joined(2).getString(2) == "C")

    val a = GDF(Seq(1, 2, 3).toDF("v"))
    val b = GDF(Seq(2, 3, 4).toDF("v"))
    assert(a.intersect(b).df.collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 3))
    assert(a.exceptRows(b).df.collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("modeOf: deterministic smallest-value tie-break; nulls dropped") {
    val df = Seq(3, 1, 1, 3, 2).toDF("v")
    assert(GDF(df).modeOf("v").df.collect().head.getInt(0) == 1)
    val withNulls = Seq[Option[Int]](None, None, None, Some(1), Some(1), Some(2)).toDF("v")
    assert(GDF(withNulls).modeOf("v").df.collect().head.getInt(0) == 1)
  }

  test("vec_dot: null on ragged pair or null element, exact otherwise") {
    import org.apache.spark.sql.graftx.VecColumns
    val df = Seq(
      (Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)),
      (Seq(1.0f), Seq(3.0f, 4.0f))
    ).toDF("a", "b")
    val out = df.select(VecColumns.vecDot($"a", $"b").as("d")).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))
    val withNullElem = Seq((Seq(Some(1.0f), None), Seq(Some(1.0f), Some(2.0f))))
      .toDF("a", "b")
    assert(withNullElem.select(VecColumns.vecDot($"a", $"b")).collect().head.isNullAt(0))
  }

  test("categorize: sorted codes, -1 sentinel for null categories") {
    val df = Seq(Some("b"), Some("a"), None, Some("b")).toDF("c")
    val out = graft.functions.CatFunctions.categorize(df, "c", "code")
      .collect().map(r => (if (r.isNullAt(0)) null else r.getString(0)) -> r.getInt(1)).toSet
    assert(out == Set("a" -> 0, "b" -> 1, (null: String) -> -1))
  }
}
