package graft.operators

import org.apache.spark.sql.{DataFrame, Row}

/** Distributed global forward/backward fill — reference `FFill/BFill`
  * (`dask_expr/_expr.py:3405-3438`, map_overlap-based).
  *
  * Same two-phase prefix-scan shape as [[Cumulative]]: an un-partitioned
  * `last(x, ignoreNulls) OVER (ORDER BY …)` window would run in one task;
  * instead phase 1 collects each partition's last non-null value (N tiny
  * values), the driver carries them forward, and phase 2 fills within each
  * partition seeded by its predecessor's carry.  Two narrow passes, no
  * shuffle (input already range-partitioned+sorted by the index).
  */
object Fill {

  def ffill(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val vIdx = df.schema.fieldIndex(valueCol)

    // mapPartitionsWithIndex, not TaskContext.getPartitionId(): a
    // downstream coalesce() collapses tasks and would misalign the carries
    // between the two passes (see MapOverlap)
    val lastNonNull: Array[(Int, Any)] = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      var last: Any = null
      it.foreach { r => val v = r.get(vIdx); if (v != null) last = v }
      Iterator.single((pid, last))
    }.collect()

    val carry = scala.collection.mutable.Map[Int, Any]()
    var run: Any = null
    for ((pid, v) <- lastNonNull.sortBy(_._1)) {
      carry(pid) = run
      if (v != null) run = v
    }
    val bc = spark.sparkContext.broadcast(carry.toMap)

    val outRdd = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      var last: Any = bc.value.getOrElse(pid, null)
      it.map { r =>
        val v = r.get(vIdx)
        if (v != null) { last = v; r }
        else Row.fromSeq(r.toSeq.updated(vIdx, last))
      }
    }
    spark.createDataFrame(outRdd, df.schema)
  }

  /** bfill = ffill run over the reversed partition order; implemented
    * directly with suffix carries to avoid a global re-sort.
    */
  def bfill(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val vIdx = df.schema.fieldIndex(valueCol)

    val firstNonNull: Array[(Int, Any)] = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      var first: Any = null
      var found = false
      it.foreach { r =>
        if (!found) { val v = r.get(vIdx); if (v != null) { first = v; found = true } }
      }
      Iterator.single((pid, first))
    }.collect()

    val carry = scala.collection.mutable.Map[Int, Any]()
    var run: Any = null
    for ((pid, v) <- firstNonNull.sortBy(-_._1)) {
      carry(pid) = run
      if (v != null) run = v
    }
    val bc = spark.sparkContext.broadcast(carry.toMap)

    val outRdd = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      val carryFromNext: Any = bc.value.getOrElse(pid, null)
      // need the partition's own next-non-null lookahead: buffer rows until
      // a non-null is seen (bounded by the null-run length, not partition
      // size)
      new Iterator[Row] {
        private val pending = new scala.collection.mutable.ArrayDeque[Row]()
        private val ready = new scala.collection.mutable.ArrayDeque[Row]()
        private def refill(): Unit = {
          while (ready.isEmpty && it.hasNext) {
            val r = it.next()
            val v = r.get(vIdx)
            if (v != null) {
              pending.foreach(p => ready.append(Row.fromSeq(p.toSeq.updated(vIdx, v))))
              pending.clear()
              ready.append(r)
            } else pending.append(r)
          }
          if (ready.isEmpty && !it.hasNext && pending.nonEmpty) {
            pending.foreach { p =>
              ready.append(
                if (carryFromNext == null) p
                else Row.fromSeq(p.toSeq.updated(vIdx, carryFromNext)))
            }
            pending.clear()
          }
        }
        def hasNext: Boolean = { refill(); ready.nonEmpty }
        def next(): Row = { refill(); ready.removeHead() }
      }
    }
    spark.createDataFrame(outRdd, df.schema)
  }
}
