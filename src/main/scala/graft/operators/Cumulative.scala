package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}

/** Distributed global cumulative aggregates (cumsum / cumprod / cummax /
  * cummin / cumcount) — reference:
  * `dask/dataframe/dask_expr/_cumulative.py:20-160`.
  *
  * A SQL window `sum(x) OVER (ORDER BY idx ROWS UNBOUNDED PRECEDING)`
  * without PARTITION BY collapses to ONE task in Spark — fine at 60k rows,
  * fatal at 100 TB.  The reference's answer is a two-phase prefix scan
  * (per-partition cumagg + carried per-partition totals) and that is
  * exactly what we build here on Spark primitives:
  *
  *  phase 1 (narrow):  per range-partition aggregate → N tiny values
  *  driver:            exclusive prefix-combine of the N values (free)
  *  phase 2 (narrow):  per-partition running agg seeded with the prefix
  *
  * Two narrow passes over data that is already range-partitioned+sorted by
  * the index (post-`setIndex`), zero extra shuffles, arbitrary npartitions.
  *
  * Integral inputs keep an integral (long) accumulator and a long output
  * column, matching pandas cumsum on int64; floats accumulate as double.
  */
object Cumulative {

  sealed trait Op {
    def zero: Double
    def combine(a: Double, b: Double): Double
    def zeroL: Long
    def combineL(a: Long, b: Long): Long
  }
  case object CumSum extends Op {
    val zero = 0.0; def combine(a: Double, b: Double): Double = a + b
    val zeroL = 0L; def combineL(a: Long, b: Long): Long = a + b
  }
  case object CumProd extends Op {
    val zero = 1.0; def combine(a: Double, b: Double): Double = a * b
    val zeroL = 1L; def combineL(a: Long, b: Long): Long = a * b
  }
  case object CumMax extends Op {
    val zero = Double.NegativeInfinity; def combine(a: Double, b: Double): Double = math.max(a, b)
    val zeroL = Long.MinValue; def combineL(a: Long, b: Long): Long = math.max(a, b)
  }
  case object CumMin extends Op {
    val zero = Double.PositiveInfinity; def combine(a: Double, b: Double): Double = math.min(a, b)
    val zeroL = Long.MaxValue; def combineL(a: Long, b: Long): Long = math.min(a, b)
  }

  /** Adds `outCol` = running aggregate of `valueCol` in global index order.
    * Nulls behave pandas-style: they don't advance the accumulator and the
    * output at a null position is null.
    */
  def apply(df: DataFrame, valueCol: String, op: Op, outCol: String): DataFrame = {
    val integral = df.schema(valueCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _                                             => false
    }
    if (integral)
      scan[Long](df, valueCol, outCol, "long", op.zeroL, op.combineL, _.longValue())
    else
      scan[Double](df, valueCol, outCol, "double", op.zero, op.combine, _.doubleValue())
  }

  private def scan[T: scala.reflect.ClassTag](
      df: DataFrame, valueCol: String, outCol: String, outType: String,
      zero: T, combine: (T, T) => T, conv: Number => T): DataFrame = {
    val spark = df.sparkSession
    val vIdx = df.schema.fieldIndex(valueCol)

    // phase 1: per-partition totals (narrow — no shuffle).  pid alignment
    // uses the RDD's own split index (mapPartitionsWithIndex), NOT
    // TaskContext.getPartitionId(): a downstream coalesce() collapses the
    // narrow chain into fewer tasks and the task id would disagree with
    // this pass, silently mis-seeding every partition's prefix
    val partTotals: Array[(Int, T, Boolean)] = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = zero; var any = false
      it.foreach { r =>
        val v = r.get(vIdx)
        if (v != null) { acc = combine(acc, conv(v.asInstanceOf[Number])); any = true }
      }
      Iterator.single((pid, acc, any))
    }.collect()

    // driver: exclusive prefix per partition id (the `any` flag only keeps
    // all-null prefixes at the op identity, which the combine absorbs)
    val prefixes = scala.collection.mutable.Map[Int, T]()
    var run = zero
    for ((pid, tot, any) <- partTotals.sortBy(_._1)) {
      prefixes(pid) = run
      if (any) run = combine(run, tot)
    }
    val bc = spark.sparkContext.broadcast(prefixes.toMap)

    // phase 2: seeded running aggregate (narrow)
    val outSchema = df.schema.add(outCol, outType)
    val outRdd = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = bc.value.getOrElse(pid, zero)
      it.map { r =>
        val v = r.get(vIdx)
        val out: Any =
          if (v == null) null
          else { acc = combine(acc, conv(v.asInstanceOf[Number])); acc }
        Row.fromSeq(r.toSeq :+ out)
      }
    }
    spark.createDataFrame(outRdd, outSchema)
  }
}
