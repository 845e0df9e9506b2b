package graft.operators

import org.apache.spark.Partitioner
import org.apache.spark.rdd.RDD

import scala.reflect.ClassTag

/** √n tree-carry for the two-phase prefix-scan operators (round-14,
  * VERDICT r13 #5).
  *
  * The prefix-carry operators (Cumulative, Expanding) need, for every
  * partition `p`, the combined state of all partitions before `p`. The
  * round-11→13 implementation collected ONE state per partition to the
  * driver and broadcast the prefix map back — correct, but an
  * O(npartitions) driver payload: ~20–80 MB in one collect at the
  * 8×10⁵-partition 100 TB point (CarryProbe-measured, PLANS.md r12).
  *
  * This helper keeps every hop at O(√n):
  *
  *   1. the n per-partition states shuffle (tiny rows) into ⌈√n⌉ bucket
  *      partitions — each bucket task holds ⌈√n⌉ states;
  *   2. each bucket emits its bucket TOTAL and the within-bucket
  *      exclusive prefixes (distributed, never collected);
  *   3. the driver collects only the ⌈√n⌉ bucket totals, folds them into
  *      exclusive bucket prefixes, and broadcasts that ⌈√n⌉-entry array;
  *   4. per-partition seeds = bucketPrefix ⊕ withinBucketPrefix, shuffled
  *      by partition id so seed `p` lands in partition `p` of the result —
  *      phase 2 then picks its seed up via `zipPartitions`, and the full
  *      n-entry prefix map never exists on the driver OR in any single
  *      task.
  *
  * Requires `merge` associative with two-sided identity `empty` (all the
  * carry ops qualify: +/0, ×/1, max/−∞, min/+∞, Expanding's state merge
  * with the empty state, last-non-null with null).
  *
  * Reference behavior: dask's cumulative graph builds the same carry
  * chain blockwise (`dask/dataframe/dask_expr/_cumulative.py:20-160`);
  * its scheduler walks the chain serially, Spark gets the tree.
  */
object TreeCarry {

  private final class IdPartitioner(n: Int) extends Partitioner {
    def numPartitions: Int = n
    def getPartition(key: Any): Int = key.asInstanceOf[Int]
  }

  /** Exclusive prefix over per-partition states: input one `(pid, state)`
    * row per partition of an n-partition RDD, output an RDD with exactly
    * `nParts` partitions whose partition `p` holds the single row
    * `(p, merge of states 0..p-1)` — ready to `zipPartitions` against the
    * data RDD. `nParts` must be ≥ 1.
    */
  def exclusivePrefix[S: ClassTag](totals: RDD[(Int, S)], nParts: Int,
      empty: () => S, merge: (S, S) => S): RDD[(Int, S)] = {
    require(nParts >= 1, s"exclusivePrefix over $nParts partitions")
    val sc = totals.sparkContext
    val bucketSize = math.max(1, math.ceil(math.sqrt(nParts.toDouble)).toInt)
    val nBuckets = (nParts + bucketSize - 1) / bucketSize
    val byBucket = totals.map { case (pid, s) => (pid / bucketSize, (pid, s)) }
      .partitionBy(new IdPartitioner(nBuckets))
    // per-bucket scan — O(√n) states per task; the shuffle files make the
    // second traversal below cheap without a persist
    val scanned: RDD[(Int, S, Array[(Int, S)])] =
      byBucket.mapPartitionsWithIndex { (b, it) =>
        val items = it.map(_._2).toArray.sortBy(_._1)
        var run = empty()
        val within = items.map { case (pid, s) =>
          val w = (pid, run); run = merge(run, s); w
        }
        Iterator.single((b, run, within))
      }
    // driver materializes ⌈√n⌉ bucket totals, never the n partition states
    val bucketTotals = scanned.map { case (b, tot, _) => (b, tot) }
      .collect().sortBy(_._1)
    val bucketPrefix = new Array[S](nBuckets)
    var run = empty()
    for ((b, tot) <- bucketTotals) { bucketPrefix(b) = run; run = merge(run, tot) }
    val bc = sc.broadcast(bucketPrefix)
    scanned.flatMap { case (b, _, within) =>
      val bp = bc.value(b)
      within.iterator.map { case (pid, w) => (pid, merge(bp, w)) }
    }.partitionBy(new IdPartitioner(nParts))
  }

  /** Exclusive SUFFIX (the carry flows backward — partition p sees the
    * merge of states p+1..n-1, later partitions merged first): the
    * prefix tree over flipped partition ids, with one extra tiny shuffle
    * to land seed p back in partition p. Used by backward fill.
    */
  def exclusiveSuffix[S: ClassTag](totals: RDD[(Int, S)], nParts: Int,
      empty: () => S, merge: (S, S) => S): RDD[(Int, S)] =
    exclusivePrefix(totals.map { case (p, s) => (nParts - 1 - p, s) },
      nParts, empty, merge)
      .map { case (q, s) => (nParts - 1 - q, s) }
      .partitionBy(new IdPartitioner(nParts))
}
