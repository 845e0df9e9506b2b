package graft.operators

import graft.SparkTestBase

/** Seeded random chunked arrays (SURVEY §2.11 random suite; reference
  * `dask/array/random.py`): the counter-based design must be deterministic
  * across CHUNKINGS (stronger than dask's same-chunking determinism) and
  * each distribution must land near its analytic moments.
  */
class RandomArrSpec extends SparkTestBase {

  private def vec(a: GArr): Array[Double] = {
    val m = a.toIndexedDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    Array.tabulate(a.numElements.toInt)(i => m(i.toLong))
  }

  test("uniform: identical values under different chunk grids and rechunk") {
    val a = GArrRandom.uniform(spark, Seq(200L), Seq(7), seed = 42L)
    val b = GArrRandom.uniform(spark, Seq(200L), Seq(13), seed = 42L)
    assert(vec(a).toSeq == vec(b).toSeq)
    assert(vec(a.rechunk(Seq(31))).toSeq == vec(a).toSeq)
    val c = GArrRandom.uniform(spark, Seq(200L), Seq(7), seed = 43L)
    assert(vec(a).toSeq != vec(c).toSeq)
  }

  test("uniform(low,high): bounds and mean") {
    val v = vec(GArrRandom.uniform(spark, Seq(4000L), Seq(512), 7L, low = 2.0, high = 6.0))
    assert(v.forall(x => x >= 2.0 && x < 6.0))
    assert(math.abs(v.sum / v.length - 4.0) < 0.1)
  }

  test("normal: moments of a 2-D draw") {
    val v = vec(GArrRandom.normal(spark, Seq(100L, 80L), Seq(32, 32), 11L, loc = 3.0, scale = 2.0))
    val n = v.length
    val mean = v.sum / n
    val varr = v.map(x => (x - mean) * (x - mean)).sum / n
    assert(math.abs(mean - 3.0) < 0.1, s"mean $mean")
    assert(math.abs(varr - 4.0) < 0.2, s"var $varr")
  }

  test("randint: integral values covering the range") {
    val v = vec(GArrRandom.randint(spark, Seq(3000L), Seq(512), 5L, 10L, 15L))
    assert(v.forall(x => x == math.floor(x) && x >= 10.0 && x < 15.0))
    assert(v.distinct.sorted.toSeq == Seq(10.0, 11.0, 12.0, 13.0, 14.0))
  }

  test("poisson / exponential / binomial: analytic means") {
    val p = vec(GArrRandom.poisson(spark, Seq(4000L), Seq(512), 3L, lam = 4.0))
    assert(p.forall(x => x == math.floor(x) && x >= 0.0))
    assert(math.abs(p.sum / p.length - 4.0) < 0.15)
    val e = vec(GArrRandom.exponential(spark, Seq(4000L), Seq(512), 9L, scale = 2.0))
    assert(e.forall(_ >= 0.0))
    assert(math.abs(e.sum / e.length - 2.0) < 0.15)
    val b = vec(GArrRandom.binomial(spark, Seq(4000L), Seq(512), 13L, n = 10, p = 0.3))
    assert(b.forall(x => x == math.floor(x) && x >= 0.0 && x <= 10.0))
    assert(math.abs(b.sum / b.length - 3.0) < 0.15)
  }

  test("choice: values drawn from the list, roughly uniformly") {
    val v = vec(GArrRandom.choice(spark, Seq(3000L), Seq(512), 17L, Seq(2.5, -1.0, 7.0)))
    assert(v.toSet == Set(2.5, -1.0, 7.0))
    val counts = v.groupBy(identity).map(_._2.length)
    assert(counts.forall(c => c > 800 && c < 1200))
  }
}
