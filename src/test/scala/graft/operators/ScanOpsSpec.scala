package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Distributed order-dependent operators (MapOverlap / Cumulative / Fill):
  * multi-partition results must equal the single-task window semantics.
  */
class ScanOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def df8 = // 100 rows over 8 partitions, sorted by id
    spark.range(0, 100).toDF("id")
      .withColumn("v", (col("id") * 7 % 13).cast("double"))
      .repartitionByRange(8, col("id"))
      .sortWithinPartitions("id")

  test("fromDelayed materializes driver thunks as partitions") {
    val base = 100
    val thunks: Seq[() => IterableOnce[(Long, String)]] = (0 until 4).map { p => () =>
      (0 until 3).map(i => ((p * base + i).toLong, s"p$p-$i"))
    }
    val gdf = graft.sources.IO.fromDelayed(spark, thunks)
    assert(gdf.df.rdd.getNumPartitions == 4) // one partition per thunk
    val got = gdf.df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 12 && got(201L) == "p2-1")
  }

  test("bag avro round-trip: to_avro container files read back with read_avro") {
    val dir = java.nio.file.Files.createTempDirectory("graft_avro").toString
    val lines = (0 until 123).map(i => s"""rec $i ${"y" * (i % 7)}""")
    import spark.implicits._
    graft.sources.IO.toAvro(lines.toDF("value").repartition(3), dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".avro")) == 3)
    val back = graft.sources.IO.readAvro(spark, dir)
    assert(back.df.count() == 123)
    // records come back as Avro's canonical JSON — parse and compare
    val parsed = spark.read.json(back.df.as[String](org.apache.spark.sql.Encoders.STRING))
    assert(parsed.select("value").collect().map(_.getString(0)).toSet == lines.toSet)
  }

  test("read_avro splits one multi-block container at sync markers, rows exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_split").toString
    val lines = (0 until 20000).map(i => f"rec $i%06d ${"z" * 40}")
    graft.sources.IO.toAvro(lines.toDF("value").coalesce(1), dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".avro")) == 1)
    // ~1.2 MB single container, default 64 KB sync interval → many blocks;
    // a 64 KB split target must yield many partitions with no dup/loss
    val back = graft.sources.IO.readAvro(spark, dir, maxSplitBytes = 64 * 1024)
    assert(back.df.rdd.getNumPartitions > 4)
    val parsed = spark.read.json(back.df.as[String](org.apache.spark.sql.Encoders.STRING))
    val got = parsed.select("value").collect().map(_.getString(0))
    assert(got.length == 20000 && got.toSet == lines.toSet)
  }

  test("bag read_text round-trips lines written as text files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_read_text").toString
    val lines = (0 until 257).map(i => s"line $i: payload ${"x" * (i % 13)}")
    graft.api.GBag.fromSeq(spark, lines, npartitions = 5).toTextfiles(dir)
    val back = graft.sources.IO.readText(spark, dir)
    assert(back.df.count() == 257)
    assert(back.df.collect().map(_.getString(0)).toSet == lines.toSet)
  }

  test("MapOverlap.rollingSum equals single-partition window result") {
    val got = MapOverlap.rollingSum(df8, "v", 5, "rs")
      .select("id", "rs").as[(Long, Double)].collect().toMap
    val exp = df8.coalesce(1).sortWithinPartitions("id")
      .withColumn("rs", sum(col("v")).over(
        org.apache.spark.sql.expressions.Window.orderBy("id").rowsBetween(-4, 0)))
      .select("id", "rs").as[(Long, Double)].collect().toMap
    assert(got == exp)
  }

  test("MapOverlap.shift carries values across partition boundaries") {
    val got = MapOverlap.shift(df8, "v", 3, "pv")
      .select("id", "pv").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(0L).isEmpty && got(1L).isEmpty && got(2L).isEmpty)
    assert(got(3L).contains(0.0)) // v(0) = 0
    assert(got(50L).contains(((50L - 3) * 7 % 13).toDouble))
  }

  test("Cumulative.cumsum equals sequential prefix sums; nulls stay null") {
    val withNulls = df8.withColumn("v", when(col("id") % 10 === 0, lit(null)).otherwise(col("v")))
    val got = Cumulative(withNulls, "v", Cumulative.CumSum, "cs")
      .select("id", "cs").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    var acc = 0.0
    for (id <- 0L until 100L) {
      if (id % 10 == 0) assert(got(id).isEmpty, s"id=$id should be null")
      else { acc += (id * 7 % 13).toDouble; assert(got(id).contains(acc), s"id=$id") }
    }
  }

  test("Cumulative.cummax is monotone and correct across partitions") {
    val got = Cumulative(df8, "v", Cumulative.CumMax, "cm")
      .select("id", "cm").as[(Long, Double)].collect().sortBy(_._1).map(_._2)
    assert(got.zip(got.tail).forall { case (a, b) => b >= a })
    assert(got.last == 12.0)
  }

  test("Fill.ffill propagates across partition boundaries, bfill backwards") {
    val sparse = spark.range(0, 40).toDF("id")
      .withColumn("v", when(col("id") === 7, 1.0).when(col("id") === 23, 2.0))
      .repartitionByRange(5, col("id")).sortWithinPartitions("id")
    val f = Fill.ffill(sparse, "v").select("id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(f(6L).isEmpty)
    assert(f(7L).contains(1.0) && f(22L).contains(1.0) && f(23L).contains(2.0) && f(39L).contains(2.0))
    val b = Fill.bfill(sparse, "v").select("id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(b(0L).contains(1.0) && b(8L).contains(2.0) && b(23L).contains(2.0))
    assert(b(24L).isEmpty)
  }

  test("Resample.bucket aligns to epoch multiples; aggDense fills gaps") {
    val ts = Seq("2024-01-01 00:10:00", "2024-01-01 00:50:00", "2024-01-01 03:05:00")
      .toDF("s").withColumn("ts", to_timestamp(col("s"))).withColumn("v", lit(1.0))
    val sparse = Resample.agg(ts, "ts", 3600, Seq("n" -> count(lit(1))))
    assert(sparse.count() == 2) // hours 00 and 03
    val dense = Resample.aggDense(ts, "ts", 3600, Seq("n" -> count(lit(1))))
    assert(dense.count() == 4) // hours 00,01,02,03
  }
}
