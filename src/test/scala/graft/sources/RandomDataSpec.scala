package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RandomDataSpec extends SparkTestBase {

  test("values are a pure function of (id, seed): partition-layout independent") {
    val a = RandomData.frame(spark, 500, seed = 7, numPartitions = 1).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val b = RandomData.frame(spark, 500, seed = 7, numPartitions = 13).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(a == b)
  }

  test("different seeds give different streams") {
    val a = RandomData.frame(spark, 100, seed = 1).select("u").collect().map(_.getDouble(0))
    val b = RandomData.frame(spark, 100, seed = 2).select("u").collect().map(_.getDouble(0))
    assert(a.toSeq != b.toSeq)
  }

  test("distribution moments are in the right place") {
    val n = 20000L
    val stats = RandomData.frame(spark, n, seed = 11)
      .agg(avg("u").as("mu_u"), avg("gauss").as("mu_g"), stddev("gauss").as("sd_g"),
        avg("expo").as("mu_e"), avg("pois").as("mu_p"), avg("bern").as("mu_b"),
        min("ri").as("lo"), max("ri").as("hi"))
      .head()
    assert(math.abs(stats.getDouble(0) - 0.5) < 0.01)       // uniform mean
    assert(math.abs(stats.getDouble(1)) < 0.03)             // normal mean 0
    assert(math.abs(stats.getDouble(2) - 1.0) < 0.03)       // normal sd 1
    assert(math.abs(stats.getDouble(3) - 0.5) < 0.02)       // exp(λ=2) mean 1/2
    assert(math.abs(stats.getDouble(4) - 4.0) < 0.05)       // poisson λ=4 mean
    assert(math.abs(stats.getDouble(5) - 0.25) < 0.02)      // bernoulli p
    assert(stats.getLong(6) >= 10 && stats.getLong(7) <= 99) // randint [10,100)
  }

  test("choice only emits listed options") {
    val picks = RandomData.frame(spark, 1000, seed = 3)
      .select("pick").distinct().collect().map(_.getString(0)).toSet
    assert(picks == Set("red", "green", "blue"))
  }

  test("poisson inverse-CDF matches a direct driver-side computation") {
    // same recurrence as the UDF, evaluated locally on the same uniforms
    def unif(id: Long, seed: Long): Double =
      (graft.functions.Hashing.mix64(id ^ graft.functions.Hashing.mix64(seed)) >>> 11).toDouble /
        (1L << 53).toDouble
    def pois(u: Double, lambda: Double): Int = {
      var k = 0; var p = math.exp(-lambda); var cdf = p
      while (u >= cdf && k < 200) { k += 1; p *= lambda / k; cdf += p }
      k
    }
    val got = RandomData.frame(spark, 200, seed = 7).select("id", "pois")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    (0L until 200L).foreach { id =>
      assert(got(id) == pois(unif(id, 14), 4.0), s"id=$id")
    }
  }
}
