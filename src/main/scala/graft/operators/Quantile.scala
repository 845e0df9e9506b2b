package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel

/** Distributed EXACT interpolated percentiles (round-14 optimization).
  *
  * Spark's builtin `percentile` aggregate is exact but holistic: every
  * partial buffer is an OpenHashMap of (value -> count) over the
  * partition's DISTINCT values, and the final merge folds ALL of them
  * into ONE reducer task — an O(n_distinct) single-task memory bound.
  * On a ~unique double column (money amounts) that is O(n) on one task:
  * the same class of scale ceiling as one-task-per-group, except no
  * spill path exists for the aggregation buffer itself. Measured at
  * sf0.1 it is also the slow path locally (q12: 1.6 s for three cut
  * points over 600 k rows).
  *
  * This operator computes the identical value with no single-task
  * bound, guide §2.5/§5 style: range-partitioned distributed sort of
  * the column (Spark samples bounds; every task holds only its range
  * slice), one tiny job for per-partition counts, then a positional
  * pick of the ≤ 2·|ps| order statistics each percentile interpolates
  * between. Driver state: the partition-count array (O(npartitions)
  * longs) and the picked scalars — metadata-sized, same class as the
  * boundary collects the engine already does.
  *
  * Bit-exactness contract: the result reproduces Spark's
  * `Percentile.getPercentile` arithmetic exactly —
  * `position = p * (n-1)`; if `floor == ceil` (or the two neighboring
  * order statistics are equal) the statistic itself, else
  * `(ceil - position) * lower + (position - floor) * upper` in that
  * operation order. Nulls are dropped like the builtin; NaN is COUNTED
  * like the builtin (a value ordered greatest). QuantileSpec pins
  * equality `==` against the builtin on fixture data and on the edge
  * shapes (single row, ties, p = 0/1, exact-integer positions, NaN).
  *
  * The reference computes dataframe quantiles via per-partition
  * sketches merged on one worker (`dask_expr/_quantile.py`) —
  * approximate by default; its exact path (`quantile(method=...)`) has
  * the same concentrate-then-select bound this removes.
  */
object Quantile {

  /** Exact percentiles of `colName` (cast to double, nulls dropped) at
    * probabilities `ps`. One distributed sort + two metadata jobs;
    * requires a non-empty column, like the declared queries it serves.
    */
  def exact(df: DataFrame, colName: String, ps: Seq[Double]): Array[Double] = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentile probabilities must be in [0,1]: $ps")
    // isNotNull, NOT na.drop(): the builtin counts NaN as a value
    // (ordered greatest) and na.drop would silently drop it too
    val vals = df.select(col(colName).cast("double"))
      .filter(col(colName).isNotNull)
      .rdd.map(_.getDouble(0))
    // sortBy inherits the SCAN's partition count, which follows file
    // layout, not data size — a 2-file replica gave the 40x sort ~4
    // partitions and its tasks spilled (measured: 40x slower than 100x).
    // Use the session's shuffle parallelism as the floor: scale-adaptive
    // (conf-driven), not a local core count.
    val sortParts = math.max(vals.getNumPartitions,
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt)
    // TotalOrdering = NaN greatest / -0.0 < 0.0, matching the builtin's
    // physical double ordering
    val sorted = vals.sortBy(identity[Double], ascending = true,
        numPartitions = sortParts)(Ordering.Double.TotalOrdering,
        implicitly).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val counts = sorted.mapPartitions(it => Iterator(it.size.toLong),
        preservesPartitioning = true).collect()
      val offsets = counts.scanLeft(0L)(_ + _) // offsets(p) = global index of partition p's first row
      val n = offsets.last
      require(n > 0, s"exact percentile over an empty column: $colName")
      val maxPos = (n - 1).toDouble
      val positions = ps.map(maxPos * _)
      val needed = positions.flatMap(pos =>
        Seq(pos.floor.toLong, pos.ceil.toLong)).distinct
      // global index -> (owning partition, index within it); empty
      // partitions make offsets non-strict, so take the LAST partition
      // whose range still contains g
      def locate(g: Long): (Int, Long) = {
        var p = 0
        while (p + 1 < counts.length && offsets(p + 1) <= g) p += 1
        (p, g - offsets(p))
      }
      val byPart: Map[Int, Seq[(Long, Long)]] = // partition -> (localIdx, globalIdx)
        needed.map { g => val (p, l) = locate(g); (p, (l, g)) }
          .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2) }
      val bc = sorted.sparkContext.broadcast(byPart)
      val picked: Map[Long, Double] = sorted.mapPartitionsWithIndex { (p, it) =>
        bc.value.get(p) match {
          case None => Iterator.empty
          case Some(wanted) =>
            val want = wanted.toMap // localIdx -> globalIdx
            var i = 0L
            val out = Seq.newBuilder[(Long, Double)]
            while (it.hasNext) {
              val v = it.next()
              want.get(i).foreach(g => out += ((g, v)))
              i += 1
            }
            out.result().iterator
        }
      }.collect().toMap
      bc.destroy()
      positions.map { pos =>
        val lower = pos.floor.toLong
        val higher = pos.ceil.toLong
        val lowerVal = picked(lower)
        if (higher == lower) lowerVal
        else {
          val higherVal = picked(higher)
          if (higherVal == lowerVal) lowerVal
          else (higher - pos) * lowerVal + (pos - lower) * higherVal
        }
      }.toArray
    } finally { sorted.unpersist(blocking = false); () }
  }

  /** Grouped exact percentiles with NO whole-group task: the holistic
    * counterpart of the r14 skew-resilient grouped-scan family. The
    * builtin grouped `percentile` holds one value-count map PER GROUP in
    * the aggregation buffer — fine for well-distributed groups (each map
    * is group-sized), a single-task ceiling when one group is huge
    * (3 dictionary-valued groups over the whole fact = one third of the
    * fact in one buffer at 100 TB). Here the (group, value) pairs are
    * range-sorted so groups are contiguous AND hot groups span
    * partitions; per-partition (group, count, localStart) run summaries —
    * O(npartitions + ngroups) driver metadata, the documented regime is
    * low-cardinality/hot groups — locate each group's target order
    * statistics, and one pick job fetches them. Interpolation reproduces
    * the builtin bit-for-bit (same contract as [[exact]], QuantileSpec
    * pins it per group).
    *
    * Groups are dictionary-encoded to dense ints up front (one small
    * distinct job, broadcast back) so the heavy sort runs on primitive
    * (Int, Double) keys — the first cut of this operator sorted on
    * per-row `String.valueOf` keys and paid ~2x for the allocations.
    * Output columns: the group column (original type) + one double
    * column `p<i>` per probability.
    */
  def exactGrouped(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentile probabilities must be in [0,1]: $ps")
    val spark = df.sparkSession
    val groupField = df.schema(groupCol)
    val base = df.select(col(groupCol), col(valueCol).cast("double"))
      .filter(col(valueCol).isNotNull)
    // dictionary-encode the groups: O(ngroups) driver metadata, the
    // operator's documented regime (hot/low-cardinality groups)
    val groupVals: Array[Any] = base.select(col(groupCol)).distinct()
      .collect().map(_.get(0))
    val groupIdx: Map[Any, Int] = groupVals.zipWithIndex.toMap
    val bcIdx = spark.sparkContext.broadcast(groupIdx)
    val pairs = base.rdd.map(r => (bcIdx.value(r.get(0)), r.getDouble(1)))
    implicit val ordD: Ordering[Double] = Ordering.Double.TotalOrdering
    // same scan-layout-independent sort parallelism as [[exact]]
    val sortParts = math.max(pairs.getNumPartitions,
      spark.conf.get("spark.sql.shuffle.partitions", "200").toInt)
    val sorted = pairs.sortBy(identity[(Int, Double)], ascending = true,
        numPartitions = sortParts)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // contiguous (group, count, within-partition offset) runs
      val segments: Array[(Int, Seq[(Int, Long, Long)])] =
        sorted.mapPartitionsWithIndex { (p, it) =>
          val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
          var local = 0L
          var curKey = -1
          var curStart = 0L
          var curCount = 0L
          for ((g, _) <- it) {
            if (g != curKey) {
              if (curKey >= 0) runs += ((curKey, curCount, curStart))
              curKey = g; curStart = local; curCount = 0L
            }
            curCount += 1; local += 1
          }
          if (curKey >= 0) runs += ((curKey, curCount, curStart))
          Iterator.single((p, runs.toSeq))
        }.collect().sortBy(_._1)
      // per group: ordered segment list (partition, localStart, count)
      val perGroup = scala.collection.mutable.LinkedHashMap
        .empty[Int, scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]]
      for ((p, runs) <- segments; (k, count, localStart) <- runs)
        perGroup.getOrElseUpdate(k,
          scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]) +=
          ((p, localStart, count))
      // group's k-th value -> (partition, local index), via the segment walk
      def locate(segs: Seq[(Int, Long, Long)], k: Long): (Int, Long) = {
        var seen = 0L
        for ((p, start, c) <- segs) {
          if (k < seen + c) return (p, start + (k - seen))
          seen += c
        }
        throw new IllegalStateException(s"order statistic $k beyond group size $seen")
      }
      val wanted = scala.collection.mutable.Map
        .empty[Int, scala.collection.mutable.Map[Long, (Int, Long)]]
      val positionsByGroup = perGroup.map { case (k, segs) =>
        val n = segs.map(_._3).sum
        val maxPos = (n - 1).toDouble
        val positions = ps.map(maxPos * _)
        positions.flatMap(pos => Seq(pos.floor.toLong, pos.ceil.toLong))
          .distinct.foreach { idx =>
            val (p, local) = locate(segs.toSeq, idx)
            wanted.getOrElseUpdate(p, scala.collection.mutable.Map.empty)
              .update(local, (k, idx))
          }
        k -> positions
      }
      val bc = sorted.sparkContext.broadcast(
        wanted.map { case (p, m) => p -> m.toMap }.toMap)
      val picked: Map[(Int, Long), Double] =
        sorted.mapPartitionsWithIndex { (p, it) =>
          bc.value.get(p) match {
            case None => Iterator.empty
            case Some(want) =>
              var i = 0L
              val out = Seq.newBuilder[((Int, Long), Double)]
              for ((_, v) <- it) {
                want.get(i).foreach(slot => out += ((slot, v)))
                i += 1
              }
              out.result().iterator
          }
        }.collect().toMap
      bc.destroy()
      val rows = positionsByGroup.map { case (k, positions) =>
        val vals = positions.map { pos =>
          val lower = pos.floor.toLong
          val higher = pos.ceil.toLong
          val lowerVal = picked((k, lower))
          if (higher == lower) lowerVal
          else {
            val higherVal = picked((k, higher))
            if (higherVal == lowerVal) lowerVal
            else (higher - pos) * lowerVal + (pos - lower) * higherVal
          }
        }
        org.apache.spark.sql.Row.fromSeq(groupVals(k) +: vals)
      }.toSeq
      val schema = org.apache.spark.sql.types.StructType(
        groupField.copy(nullable = true) +:
          ps.indices.map(i => org.apache.spark.sql.types.StructField(
            s"p$i", org.apache.spark.sql.types.DoubleType, nullable = false)))
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    } finally {
      sorted.unpersist(blocking = false)
      bcIdx.destroy()
      ()
    }
  }
}
