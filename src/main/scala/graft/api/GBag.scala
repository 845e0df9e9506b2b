package graft.api

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

/** Bag-parity functional API (reference `dask/bag/core.py:455`):
  * unordered partitioned collections with a free-form functional surface
  * — map/filter/fold/foldby/frequencies/topk/distinct/join/product.
  *
  * Spark-first: `Dataset[T]` is the typed equivalent (encoder-backed,
  * Tungsten-serialized); fold/foldby compile to `reduceGroups`-style
  * partial aggregation, so the reference's `split_every` combine trees
  * (`bag/core.py:867,1236`) are Spark's map-side combine for free.
  */
final class GBag[T](val ds: Dataset[T]) extends Serializable {

  def spark: SparkSession = ds.sparkSession

  def map[U: Encoder](f: T => U): GBag[U] = new GBag(ds.map(f))
  def filter(p: T => Boolean): GBag[T] = new GBag(ds.filter(p))
  def flatMap[U: Encoder](f: T => IterableOnce[U]): GBag[U] = new GBag(ds.flatMap(f))
  def mapPartitions[U: Encoder](f: Iterator[T] => Iterator[U]): GBag[U] =
    new GBag(ds.mapPartitions(f))

  /** bag `fold(binop)` — tree-reduced on executors (`bag/core.py:867`). */
  def fold(binop: (T, T) => T): T = ds.reduce(binop)

  /** bag `foldby(key, binop, initial, combine)` (`bag/core.py:1236`):
    * per-key fold with true partial aggregation — each partition folds its
    * rows locally (`seq`), only the per-partition partials shuffle, and
    * `comb` merges them per key. This IS the reference's ACA pattern; a
    * plain groupByKey would shuffle every raw row.
    */
  /** dask `Bag.foldby` (`bag/core.py:1236`).  `initial` is shared across
    * every key in a partition and `seq`/`comb` may run in any grouping —
    * like Spark's own `aggregateByKey` zero value, `initial` must be
    * IMMUTABLE and `seq` must return a fresh value rather than mutating
    * its accumulator in place (a mutable shared zero would merge all
    * keys' state into one object).
    */
  def foldby[K: Encoder, B: Encoder](key: T => K, initial: B)(seq: (B, T) => B)(
      comb: (B, B) => B)(implicit kb: Encoder[(K, B)]): Dataset[(K, B)] = {
    val partials: Dataset[(K, B)] = ds.mapPartitions { it =>
      val acc = scala.collection.mutable.Map[K, B]()
      it.foreach { t =>
        val k = key(t)
        acc(k) = seq(acc.getOrElse(k, initial), t)
      }
      acc.iterator
    }
    partials.groupByKey(_._1).mapGroups { (k, it) =>
      (k, it.map(_._2).reduce(comb))
    }
  }

  /** bag `accumulate(binop, initial)` (`bag/core.py:1465`, tlz semantics):
    * the running fold over elements in partition order — same length as
    * the bag, or length+1 with `initial` prepended. Two-phase distributed
    * scan (the Cumulative pattern): pass 1 folds each partition locally
    * and ships only the O(npartitions) per-partition totals to the
    * driver; pass 2 re-scans each partition seeded with the combined
    * prefix of all earlier partitions. `binop` must be associative.
    */
  def accumulate(binop: (T, T) => T, initial: Option[T] = None)(
      implicit e: Encoder[T], ct: scala.reflect.ClassTag[T]): GBag[T] = {
    val rdd = ds.rdd
    val totals = rdd.mapPartitionsWithIndex { (pi, it) =>
      var acc: Option[T] = None
      it.foreach(t => acc = Some(acc.fold(t)(a => binop(a, t))))
      Iterator.single((pi, acc))
    }.collect().sortBy(_._1).map(_._2)
    val prefixes = new Array[Option[T]](totals.length)
    var run: Option[T] = initial
    var i = 0
    while (i < totals.length) {
      prefixes(i) = run
      run = (run, totals(i)) match {
        case (Some(a), Some(b)) => Some(binop(a, b))
        case (None, b) => b
        case (a, None) => a
      }
      i += 1
    }
    val bc = spark.sparkContext.broadcast(prefixes)
    val scanned = spark.createDataset(rdd.mapPartitionsWithIndex { (pi, it) =>
      var acc: Option[T] = bc.value(pi)
      it.map { t => acc = Some(acc.fold(t)(a => binop(a, t))); acc.get }
    })
    new GBag(initial match {
      case Some(i0) => spark.createDataset(Seq(i0)).union(scanned)
      case None => scanned
    })
  }

  /** bag `frequencies` (`bag/core.py:934`). */
  def frequencies(implicit e: Encoder[(T, Long)], ek: Encoder[T]): Dataset[(T, Long)] =
    ds.groupByKey(identity[T] _).count()

  /** bag `topk(k)(ordering)` (`bag/core.py:953`): per-partition top-k
    * (`takeOrdered` runs a bounded heap per partition, then merges
    * npartitions·k candidates on the driver).
    */
  def topk(k: Int)(implicit ord: Ordering[T]): Seq[T] =
    ds.rdd.takeOrdered(k)(ord.reverse).toSeq

  def distinct(): GBag[T] = new GBag(ds.distinct())

  /** bag `product` (`bag/core.py:1219`) — cartesian. */
  def product[U](other: GBag[U])(implicit e: Encoder[(T, U)]): Dataset[(T, U)] =
    ds.joinWith(other.ds, org.apache.spark.sql.functions.lit(true), "cross")

  /** bag `join(other, key)` — equi-join by derived key. */
  def joinBy[U, K](other: GBag[U], kl: T => K, kr: U => K)(
      implicit ek: Encoder[K], et: Encoder[(K, T)], eu: Encoder[(K, U)],
      out: Encoder[(T, U)]): Dataset[(T, U)] = {
    val l = ds.map(t => (kl(t), t))
    val r = other.ds.map(u => (kr(u), u))
    l.joinWith(r, l("_1") === r("_1"), "inner").map { case ((_, t), (_, u)) => (t, u) }
  }

  def toDF(cols: String*): org.apache.spark.sql.DataFrame =
    if (cols.isEmpty) ds.toDF() else ds.toDF(cols: _*)
  def compute(): Array[T] = ds.collect()

  /** dask `Bag.to_textfiles` (`bag/core.py:818`): one text file per
    * partition, elements stringified line-per-element.
    */
  def toTextfiles(path: String): Unit =
    ds.map(x => String.valueOf(x))(org.apache.spark.sql.Encoders.STRING)
      .toDF("value").write.mode("overwrite").text(path)

  /** bag `take(k)` (`bag/core.py:1420`) — first k elements; like the
    * reference, reads as few partitions as satisfy k.
    */
  def take(k: Int): Seq[T] = ds.head(k).toSeq

  /** bag `remove(predicate)` (`bag/core.py:709`) — filter-out. */
  def remove(p: T => Boolean): GBag[T] = new GBag(ds.filter((t: T) => !p(t)))

  /** bag `flatten` (`bag/core.py:1474`) — concat one nesting level. */
  def flatten[U: Encoder](implicit ev: T => IterableOnce[U]): GBag[U] =
    new GBag(ds.flatMap(t => ev(t)))

  /** bag `random_sample(prob, random_state)` (`bag/core.py:674`):
    * Bernoulli per element, deterministic for a given seed AND layout
    * (the reference's contract is the same — its per-partition Random
    * streams change if the bag repartitions).
    */
  def randomSample(prob: Double, seed: Long)(
      implicit e: Encoder[T], ct: scala.reflect.ClassTag[T]): GBag[T] = {
    require(prob >= 0 && prob <= 1, s"prob must be in [0, 1]: $prob")
    val p = prob; val s0 = seed
    val sampled = ds.rdd.mapPartitionsWithIndex { (pi, it) =>
      val rng = new java.util.Random(s0 * 1099511628211L + pi) // per-partition substream
      it.filter(_ => rng.nextDouble() < p)
    }
    new GBag(spark.createDataset(sampled))
  }

  /** The scalar reduction tier (`bag/core.py:1077-1147`): count / sum /
    * min / max / any / all / mean / var / std. sum/mean/var ship one
    * (count, sum, sumsq) triple per partition — the reference's
    * split_every combine tree is Spark's tree aggregation.
    */
  def count(): Long = ds.count()
  def sum()(implicit num: Numeric[T]): T = ds.reduce((a, b) => num.plus(a, b))
  def min()(implicit ord: Ordering[T]): T = ds.reduce((a, b) => ord.min(a, b))
  def max()(implicit ord: Ordering[T]): T = ds.reduce((a, b) => ord.max(a, b))
  def any(p: T => Boolean): Boolean = !ds.filter(p).isEmpty
  def all(p: T => Boolean): Boolean = ds.filter((t: T) => !p(t)).isEmpty

  private def moments()(implicit num: Numeric[T]): (Long, Double, Double) =
    ds.rdd.mapPartitions { it =>
      var n = 0L; var s = 0.0; var ss = 0.0
      it.foreach { t => val x = num.toDouble(t); n += 1; s += x; ss += x * x }
      Iterator.single((n, s, ss))
    }.reduce { case ((n1, s1, q1), (n2, s2, q2)) => (n1 + n2, s1 + s2, q1 + q2) }

  /** bag `mean` (`bag/core.py:1125`). */
  def mean()(implicit num: Numeric[T]): Double = {
    val (n, s, _) = moments(); s / n
  }

  /** bag `var(ddof)` (`bag/core.py:1141`) — population variance at
    * ddof=0, matching the reference default.
    */
  def variance(ddof: Int = 0)(implicit num: Numeric[T]): Double = {
    val (n, s, ss) = moments()
    (ss - s * s / n) / (n - ddof)
  }

  def std(ddof: Int = 0)(implicit num: Numeric[T]): Double =
    math.sqrt(variance(ddof))
}

object GBag {
  def apply[T](ds: Dataset[T]): GBag[T] = new GBag(ds)
  def fromSeq[T: Encoder](spark: SparkSession, xs: Seq[T], npartitions: Int = 4): GBag[T] =
    new GBag(spark.createDataset(xs).repartition(npartitions))
}
