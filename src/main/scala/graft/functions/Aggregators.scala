package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom-reduction surface (SURVEY §2.10): the reference's
  * `dd.Aggregation(name, chunk, agg, finalize)` (`_groupby.py:98-157`) and
  * `reduction(chunk, aggregate, combine)` (`_collection.py:2132`) map to
  * Spark `Aggregator[IN, BUF, OUT]` — the buffer is the chunk state,
  * `merge` is the combine step, `finish` the finalize step. Registered via
  * `udaf()` they run inside Tungsten hash aggregation with map-side
  * partial aggregation, which the reference builds by hand with its
  * ApplyConcatApply trees.
  */
object Aggregators {

  /** Geometric mean: exp(mean(ln x)) over positive values.
    * Buffer = (sum of logs, count) — decomposable, so it combines
    * associatively across partitions like any built-in agg.
    */
  final class GeometricMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), x: Double): (Double, Long) =
      if (x > 0) (b._1 + math.log(x), b._2 + 1) else b
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Long)): Double =
      if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
    def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Weighted mean: sum(w*x)/sum(w). Input = (value, weight). */
  final class WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
      (b._1 + in._1 * in._2, b._2 + in._2)
    def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Double)): Double = if (b._2 == 0) Double.NaN else b._1 / b._2
    def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column form of [[GeometricMean]] for untyped `groupBy().agg()`. */
  def geometricMean(c: Column): Column =
    udaf(new GeometricMean).apply(c)

  /** Column form of [[WeightedMean]]. */
  def weightedMean(value: Column, weight: Column): Column =
    udaf(new WeightedMean).apply(value, weight)
}
