package graft.sources

import graft.api.{GDF, IndexMeta}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Seeded synthetic timeseries generator — the reference's canonical
  * ordered fixture `dask.datasets.timeseries` (`dask/datasets.py:10`,
  * `io/demo.py:259-415`): one row per `freq` tick between start/end with
  * columns {id: poisson-ish int around 1000, name: choice of strings,
  * x,y: uniform(-1,1)}.
  *
  * Spark-first: `spark.range(n)` is already a parallel, partitioned
  * source; seeded `rand(seed)` columns make the output deterministic per
  * (seed, n) regardless of cluster layout, so fixtures reproduce anywhere.
  */
object Timeseries {

  val names: Seq[String] = Seq("Alice", "Bob", "Charlie", "Dan", "Edith", "Frank",
    "George", "Hannah", "Ingrid", "Jerry", "Kevin", "Laura", "Michael", "Norbert",
    "Oliver", "Patricia", "Quinn", "Ray", "Sarah", "Tim", "Ursula", "Victor",
    "Wendy", "Xavier", "Yvonne", "Zelda")

  /** uniform(0,1) derived from the portable splitmix64 finalizer: unlike
    * `rand()` (whose stream depends on the partition layout), this is a
    * pure function of the logical row, so the fixture is bit-identical on
    * any cluster shape — and unlike xxhash64 the mix is plain 64-bit
    * multiply/xor/shift arithmetic, so an external oracle (DuckDB HUGEINT
    * macros) can replicate every generated value bit-for-bit.  The top 53
    * hash bits become an exact dyadic rational in [0, 1).
    */
  private val uUdf = udf((id: Long, seed: Long) =>
    (graft.functions.Hashing.mix64(id ^ graft.functions.Hashing.mix64(seed)) >>> 11).toDouble /
      (1L << 53).toDouble)

  private def u(id: org.apache.spark.sql.Column, seed: Long): org.apache.spark.sql.Column =
    uUdf(id, lit(seed))

  /** @param startEpochSec inclusive start (UTC seconds)
    * @param rows          number of ticks
    * @param freqSec       seconds between ticks
    */
  def apply(spark: SparkSession, startEpochSec: Long, rows: Long, freqSec: Long = 1,
            seed: Long = 42L, numPartitions: Int = 0): GDF = {
    val base =
      if (numPartitions > 0) spark.range(0, rows, 1, numPartitions) else spark.range(rows)
    val nameArr = array(names.map(lit): _*)
    val rid = col("id")
    // Box-Muller normal from two hash-uniforms (for the poisson-ish id)
    val gauss = sqrt(lit(-2.0) * log(u(rid, seed + 3) + lit(1e-300))) *
      cos(lit(2.0 * math.Pi) * u(rid, seed + 4))
    val df = base
      .withColumn("timestamp", timestamp_seconds(lit(startEpochSec) + rid * freqSec))
      .withColumn("name", element_at(nameArr, (floor(u(rid, seed) * names.size) + 1).cast("int")))
      .withColumn("x", u(rid, seed + 1) * 2 - 1)
      .withColumn("y", u(rid, seed + 2) * 2 - 1)
      // poisson(λ=1000) ≈ round(normal(1000, sqrt(1000))) at this λ
      .withColumn("id", round(gauss * math.sqrt(1000.0) + 1000).cast("int"))
      .select("timestamp", "id", "name", "x", "y")
    new GDF(df, Some(IndexMeta(Seq("timestamp"), sorted = true)))
  }
}
