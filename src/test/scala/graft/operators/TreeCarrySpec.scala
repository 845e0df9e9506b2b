package graft.operators

import graft.SparkTestBase

/** [[TreeCarry.exclusivePrefix]]: the √n tree must equal the flat
  * driver-side fold for every partition-count shape (bucket boundaries,
  * single partition, n a perfect square, n prime).
  */
class TreeCarrySpec extends SparkTestBase {

  private def check(nParts: Int): Unit = {
    val sc = spark.sparkContext
    // partition p holds state p+1; exclusive prefix of sums = p(p+1)/2
    val totals = sc.parallelize((0 until nParts).map(p => (p, (p + 1).toLong)), nParts)
      // place row p in partition p, as the operators' phase-1 output does
      .partitionBy(new org.apache.spark.HashPartitioner(nParts) {
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
    val seeds = TreeCarry.exclusivePrefix[Long](totals, nParts, () => 0L, _ + _)
    assert(seeds.getNumPartitions == nParts)
    val got = seeds.collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == (0 until nParts), s"n=$nParts pids: ${got.toSeq}")
    for ((pid, s) <- got)
      assert(s == pid.toLong * (pid + 1) / 2, s"n=$nParts pid=$pid got $s")
    // seed p must live IN partition p (zipPartitions alignment)
    val placed = seeds.mapPartitionsWithIndex { (i, it) =>
      it.map { case (pid, _) => (i, pid) } }.collect()
    assert(placed.forall { case (i, pid) => i == pid }, placed.toSeq.toString)
  }

  test("tree prefix equals flat fold across partition-count shapes") {
    for (n <- Seq(1, 2, 3, 7, 9, 16, 31, 33)) check(n)
  }

  test("exclusiveSuffix: backward carry lands in the right partitions") {
    val n = 11
    val sc = spark.sparkContext
    // only partitions 3 and 8 have a non-null boundary value
    val totals = sc.parallelize((0 until n).map(p =>
      (p, if (p == 3) "x3" else if (p == 8) "x8" else null): (Int, Any)), n)
      .partitionBy(new org.apache.spark.HashPartitioner(n) {
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
    val seeds = TreeCarry.exclusiveSuffix[Any](totals, n,
      () => null, (a, b) => if (b != null) b else a)
    val got = seeds.collect().toMap
    for (p <- 0 until n) {
      val want = if (p < 3) "x3" else if (p < 8) "x8" else null
      assert(got(p) == want, s"pid=$p got ${got(p)} want $want")
    }
    val placed = seeds.mapPartitionsWithIndex { (i, it) =>
      it.map { case (pid, _) => (i, pid) } }.collect()
    assert(placed.forall { case (i, pid) => i == pid }, placed.toSeq.toString)
  }

  test("non-commutative merge keeps partition order (string concat)") {
    val n = 13
    val sc = spark.sparkContext
    val totals = sc.parallelize((0 until n).map(p => (p, ('a' + p).toChar.toString)), n)
      .partitionBy(new org.apache.spark.HashPartitioner(n) {
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
    val seeds = TreeCarry.exclusivePrefix[String](totals, n, () => "", _ + _)
    for ((pid, s) <- seeds.collect())
      assert(s == (0 until pid).map(p => ('a' + p).toChar).mkString,
        s"pid=$pid got '$s'")
  }
}
