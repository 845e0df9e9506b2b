package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequency sketches for corpus-scale "what dominates this column"
  * questions — the sketch→candidates→exact-verify shape that keeps the
  * answer EXACT while never shuffling the raw data.
  *
  * The reference reaches the same use case through
  * `Bag.frequencies().topk()` (`dask/bag/core.py:1452,1036`), which
  * shuffles every distinct key to a reducer; at 100 TB of tokens the
  * distinct-key space itself is the bottleneck. Misra–Gries summaries fix
  * that: pass 1 is narrow (each partition keeps ≤ `budget` counters), the
  * union of surviving keys is a small candidate set, and pass 2 exact-
  * counts only those candidates via a broadcast semi-join.
  */
object Sketches {

  /** Exact top-k heavy hitters of `keyCol`.
    *
    * Guarantee (pigeonhole over the per-partition Misra–Gries bound): any
    * key with global frequency > N/budget survives pass 1 in at least one
    * partition, so the candidate set contains every true heavy hitter and
    * the exact-counted top-k is the true top-k whenever the k-th true
    * count exceeds N/budget — size `budget` ≫ k·(expected skew) for
    * headroom. Shuffle volume: ≤ budget·numPartitions candidate keys
    * (pass 1 output) plus one hash aggregate over the semi-joined rows —
    * never the full distinct-key space.
    *
    * Ties resolve deterministically (count desc, then key asc) so the
    * result is engine-independent and oracle-checkable.
    */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int, budget: Int): DataFrame = {
    require(k >= 1 && budget > k, s"need budget ($budget) > k ($k)")
    val spark = df.sparkSession
    import spark.implicits._

    val keys = df.select(col(keyCol).cast("string")).na.drop().as[String]
    // Pass 1: per-partition Misra–Gries summary; emit surviving keys only
    // (their counts are lower bounds — we re-count exactly anyway).
    val candidates = keys.mapPartitions { it =>
      val counters = new java.util.HashMap[String, Long]()
      it.foreach { s =>
        val cur = counters.getOrDefault(s, 0L)
        if (cur > 0L || counters.size < budget) counters.put(s, cur + 1L)
        else {
          // decrement-all step: drop every counter by one, evict zeros
          val eit = counters.entrySet().iterator()
          while (eit.hasNext) {
            val e = eit.next()
            if (e.getValue == 1L) eit.remove() else e.setValue(e.getValue - 1L)
          }
        }
      }
      counters.keySet().iterator().asScala
    }.distinct().toDF("__hh_key")

    // Pass 2: exact count restricted to the candidate set. The candidate
    // frame is ≤ budget·P rows — broadcast, so the big side never moves.
    df.join(broadcast(candidates), col(keyCol).cast("string") === col("__hh_key"), "left_semi")
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(keyCol).asc)
      .limit(k)
  }
}
