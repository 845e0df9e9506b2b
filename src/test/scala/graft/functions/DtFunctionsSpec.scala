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
