package graft.api

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Interleaved concat, from_array/from_dict constructors, iterrows. */
class ConcatFromSpec extends SparkTestBase {
  import spark.implicits._

  test("concatInterleaved merges overlapping ranges into one sorted frame") {
    val a = new GDF(Seq((1L, "a"), (4L, "d"), (7L, "g")).toDF("idx", "v").repartition(3),
      Some(IndexMeta(Seq("idx"), sorted = false)))
    val b = new GDF(Seq((2L, "b"), (3L, "c"), (6L, "f")).toDF("idx", "v").repartition(2),
      Some(IndexMeta(Seq("idx"), sorted = false)))
    val m = a.concatInterleaved(b)
    assert(m.index.exists(_.sorted))
    // global order is restored: a cumulative count by physical order equals
    // the index order
    val rows = m.cumsum("idx", "run").df
      .orderBy("idx").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 6L, 7L))
    assert(rows.map(_._2).toSeq == Seq(1L, 3L, 6L, 10L, 16L, 23L))
  }

  test("concatInterleaved requires matching index columns") {
    val a = new GDF(Seq((1L, "a")).toDF("idx", "v"), Some(IndexMeta(Seq("idx"), false)))
    val b = new GDF(Seq((1L, "a")).toDF("other", "v"), Some(IndexMeta(Seq("other"), false)))
    intercept[IllegalArgumentException](a.concatInterleaved(b))
  }

  test("fromArray materializes the positional index") {
    val g = GDF.fromArray(spark, Seq(10.5, 20.5, 30.5), "x", numPartitions = 2)
    val rows = g.df.orderBy("idx").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((0L, 10.5), (1L, 20.5), (2L, 30.5)))
    assert(g.index.exists(_.cols == Seq("idx")))
  }

  test("multi-partition fromArray frames support ordered ops directly") {
    val g = GDF.fromArray(spark, Seq(1.0, 2.0, 3.0, 4.0), "x", numPartitions = 3)
    assert(g.index.exists(_.sorted))
    val run = g.cumsum("x", "run").df.orderBy("idx")
      .collect().map(_.getDouble(2)).toSeq
    assert(run == Seq(1.0, 3.0, 6.0, 10.0))
  }

  test("fromDict promotes mixed numerics to double and rejects incompatible mixes") {
    val g = GDF.fromDict(spark, Seq("m" -> Seq(1, 2.5, 3L)))
    assert(g.df.schema("m").dataType == org.apache.spark.sql.types.DoubleType)
    assert(g.df.orderBy("idx").collect().map(_.getDouble(1)).toSeq == Seq(1.0, 2.5, 3.0))
    intercept[IllegalArgumentException](
      GDF.fromDict(spark, Seq("bad" -> Seq(1, "two"))))
  }

  test("fromDict zips columns positionally with inferred types") {
    val g = GDF.fromDict(spark, Seq(
      "name" -> Seq("a", "b", "c"),
      "n" -> Seq(1, 2, 3),
      "x" -> Seq(1.5, null, 3.5)))
    val rows = g.df.orderBy("idx").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("a", "b", "c"))
    assert(rows.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L))
    assert(rows(1).isNullAt(3) && rows(2).getDouble(3) == 3.5)
  }

  test("iterRows streams without a full collect") {
    val g = GDF(Seq(1, 2, 3, 4).toDF("x"))
    val it = g.iterRows()
    val seen = scala.collection.mutable.ArrayBuffer[Int]()
    while (it.hasNext) seen += it.next().getInt(0)
    assert(seen.sorted.toSeq == Seq(1, 2, 3, 4))
  }
}
