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
    val spark = df.sparkSession
    import org.apache.spark.TaskContext
    val vIdx = df.schema.fieldIndex(valueCol)
    val integral = df.schema(valueCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _                                             => false
    }

    if (integral) {
      // phase 1: per-partition totals (narrow — no shuffle)
      val partTotals: Array[(Int, Long, Boolean)] = df.rdd.mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var acc = op.zeroL; var any = false
        it.foreach { r =>
          val v = r.get(vIdx)
          if (v != null) { acc = op.combineL(acc, v.asInstanceOf[Number].longValue()); any = true }
        }
        Iterator.single((pid, acc, any))
      }.collect()

      val byPid = partTotals.sortBy(_._1)
      val prefixes = scala.collection.mutable.Map[Int, (Long, Boolean)]()
      var run = op.zeroL; var runAny = false
      for ((pid, tot, any) <- byPid) {
        prefixes(pid) = (run, runAny)
        if (any) { run = op.combineL(run, tot); runAny = true }
      }
      val bc = spark.sparkContext.broadcast(prefixes.toMap)

      val outSchema = df.schema.add(outCol, "long")
      val outRdd = df.rdd.mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        val (seed, seedAny) = bc.value.getOrElse(pid, (op.zeroL, false))
        var acc = seed; var any = seedAny
        it.map { r =>
          val v = r.get(vIdx)
          val out: Any =
            if (v == null) null
            else { acc = op.combineL(acc, v.asInstanceOf[Number].longValue()); any = true; acc }
          Row.fromSeq(r.toSeq :+ out)
        }
      }
      spark.createDataFrame(outRdd, outSchema)
    } else {
      val partTotals: Array[(Int, Double, Boolean)] = df.rdd.mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var acc = op.zero; var any = false
        it.foreach { r =>
          val v = r.get(vIdx)
          if (v != null) { acc = op.combine(acc, v.asInstanceOf[Number].doubleValue()); any = true }
        }
        Iterator.single((pid, acc, any))
      }.collect()

      val byPid = partTotals.sortBy(_._1)
      val prefixes = scala.collection.mutable.Map[Int, (Double, Boolean)]()
      var run = op.zero; var runAny = false
      for ((pid, tot, any) <- byPid) {
        prefixes(pid) = (run, runAny)
        if (any) { run = op.combine(run, tot); runAny = true }
      }
      val bc = spark.sparkContext.broadcast(prefixes.toMap)

      val outSchema = df.schema.add(outCol, "double")
      val outRdd = df.rdd.mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        val (seed, seedAny) = bc.value.getOrElse(pid, (op.zero, false))
        var acc = seed; var any = seedAny
        it.map { r =>
          val v = r.get(vIdx)
          val out: Any =
            if (v == null) null
            else { acc = op.combine(acc, v.asInstanceOf[Number].doubleValue()); any = true; acc }
          Row.fromSeq(r.toSeq :+ out)
        }
      }
      spark.createDataFrame(outRdd, outSchema)
    }
  }
}
