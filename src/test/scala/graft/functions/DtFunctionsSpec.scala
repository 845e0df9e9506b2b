package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** .dt accessor semantics (SURVEY §2.9), especially the hand-rolled
  * ceil/round epoch arithmetic.
  */
class DtFunctionsSpec extends SparkTestBase {

  import spark.implicits._

  private val t = java.sql.Timestamp.valueOf("2024-03-15 10:37:21")

  private def eval1(c: org.apache.spark.sql.Column): Any =
    Seq(t).toDF("ts").select(c.as("out")).collect().head.get(0)

  test("ceil / round to arbitrary second buckets") {
    assert(eval1(DtFunctions.ceil(col("ts"), 3600)).toString == "2024-03-15 11:00:00.0")
    assert(eval1(DtFunctions.roundTo(col("ts"), 3600)).toString == "2024-03-15 11:00:00.0")
    assert(eval1(DtFunctions.roundTo(col("ts"), 86400)).toString == "2024-03-15 00:00:00.0")
    // already aligned → ceil is identity
    val aligned = java.sql.Timestamp.valueOf("2024-03-15 11:00:00")
    val out = Seq(aligned).toDF("ts").select(DtFunctions.ceil(col("ts"), 3600)).collect().head.get(0)
    assert(out.toString == "2024-03-15 11:00:00.0")
  }

  test("names, periods, month boundaries") {
    assert(eval1(DtFunctions.dayName(col("ts"))) == "Friday")
    assert(eval1(DtFunctions.monthName(col("ts"))) == "March")
    assert(eval1(DtFunctions.toPeriodMonth(col("ts"))) == "2024-03")
    assert(eval1(DtFunctions.daysInMonth(col("ts"))) == 31)
    assert(eval1(DtFunctions.isMonthStart(col("ts"))) == false)
    assert(eval1(DtFunctions.dayofweek(col("ts"))) == 4) // Friday, Monday=0
  }

  test("isQuarterEnd: quarter-final month ends only") {
    def at(s: String): Boolean =
      Seq(java.sql.Timestamp.valueOf(s)).toDF("ts")
        .select(DtFunctions.isQuarterEnd(col("ts")).as("o")).head.getBoolean(0)
    assert(at("2024-03-31 12:00:00"))   // Q1 end (and a leap year)
    assert(at("2024-06-30 00:00:00"))
    assert(at("2024-12-31 23:59:59"))
    assert(!at("2024-03-30 12:00:00"))  // right month, not last day
    assert(!at("2024-04-30 12:00:00"))  // month end, not quarter-final
  }

  test("cat dictionary ops: set/rename/unused (explicit-dictionary model)") {
    val df = Seq("b", "a", "c", "b").toDF("c")
    // set_categories(['c','a']): codes by new position, 'b' falls out (null, -1)
    val set = graft.functions.CatFunctions.setCategories(df, "c", "code", Seq("c", "a"))
      .collect().map(r => (if (r.isNullAt(0)) null else r.getString(0), r.getInt(1))).toSeq
    assert(set == Seq((null, -1), ("a", 1), ("c", 0), (null, -1)))
    val ren = graft.functions.CatFunctions.renameCategories(df, "c", Map("b" -> "B"))
      .collect().map(_.getString(0)).toSeq
    assert(ren == Seq("B", "a", "c", "B"))
    val unused = graft.functions.CatFunctions.removeUnusedCategories(df, "c")
      .collect().map(_.getString(0)).toSeq
    assert(unused == Seq("a", "b", "c"))
    val codes = graft.functions.CatFunctions.codes(df, "c").collect().map(_.getInt(0)).sorted
    assert(codes.toSeq == Seq(0, 1, 1, 2)) // a=0, b=1 (twice), c=2
  }

  test("fwf reader slices fixed-width columns") {
    val dir = "/tmp/graft_io/fwf_test"
    val lines = Seq("alice  42x", "bob    7 y")
    spark.createDataset(lines).coalesce(1).write.mode("overwrite").text(dir)
    val got = graft.sources.IO.readFwf(spark, dir, Seq(7, 2, 1), Seq("name", "n", "flag"))
      .df.orderBy("name").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq(("alice", "42", "x"), ("bob", "7", "y")))
  }
}
