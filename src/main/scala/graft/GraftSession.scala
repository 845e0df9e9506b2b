package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory with the engine's scale-oriented defaults.
  *
  * The reference (dask) hand-tunes partition sizing (128 MiB chunks,
  * `dask/dask.yaml:17,23`), broadcast-join selection
  * (`dask_expr/_merge.py:233-252`) and shuffle staging
  * (`_shuffle.py:379-496`); on Spark all of that is AQE + Catalyst, so the
  * engine's job is just to switch the right knobs on.  These settings are
  * what we would ship on a 1000-executor cluster: AQE coalescing replaces
  * static `split_out` tuning, byte-based broadcast selection replaces the
  * reference's log-rule, and 128 MB scan partitions match the reference's
  * chunk-size target.
  */
object GraftSession {

  /** Local-mode builder used by tests/bench; on a real cluster the same
    * confs apply, only `master` changes.
    */
  def builder(cpus: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      // SPARK_GRAFT_AQE=false/0/no turns runtime re-planning off for
      // small-data latency experiments; production default is on
      .config("spark.sql.adaptive.enabled",
        (!Set("false", "0", "no", "off")
          .contains(sys.env.getOrElse("SPARK_GRAFT_AQE", "true").toLowerCase)).toString)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      // parquet TIMESTAMP(NANOS) (events fixture) is unreadable natively;
      // read as long and convert via GraftSession.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")

  def getOrCreate(cpus: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    registerOptimizations(spark)
    spark
  }

  /** The engine's custom optimizer rules, registered through the
    * end-of-optimizer user batch (`experimental.extraOptimizations` —
    * settable on a live session, unlike SparkSessionExtensions).
    * Idempotent.
    */
  def registerOptimizations(spark: SparkSession): Unit = {
    val rules = Seq(graft.plans.PushSemiThroughFilteredAggregate)
    val missing = rules.filterNot(spark.experimental.extraOptimizations.contains)
    if (missing.nonEmpty)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations ++ missing
  }

  /** Read one fixture table from a scale-factor directory. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** events fixture: ns-precision `ts` arrives as long (see
    * `nanosAsLong` above); convert to a µs timestamp.  Fixture timestamps
    * are unique well above µs spacing, so ordering semantics survive.
    * ScaleGen replicas already carry a timestamp column — pass through.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val t = table(spark, sfDir, "events")
    t.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        t.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // µs-precision fixture (round-6 regeneration) loads as NTZ; the
        // session timezone is UTC, so the cast is an instant-identity —
        // it just restores the TIMESTAMP type the ts-arithmetic
        // (unix_micros etc.) and the ns-era fixture path produce
        t.withColumn("ts", col("ts").cast("timestamp"))
      case _ => t
    }
  }
}
