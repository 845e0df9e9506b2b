package graft

/** Runtime bloom-filter join pruning at the 100 TB shape (round 14).
  *
  * At cluster scale the TPC-H fact-fact joins (q214 lineitem⋈orders,
  * q209's core) have NO broadcastable side; the date/nation-pruned fact
  * still shuffles the UNPRUNED fact in full.  Spark's
  * `InjectRuntimeFilter` closes exactly that gap: it plants a
  * `BloomFilterAggregate` subquery on the pruned (creation) side and a
  * `might_contain` predicate on the unpruned (application) side, so
  * non-joining rows drop BEFORE the big shuffle — the same role dask's
  * predicate pushdown cannot play at all (the reference has no runtime
  * filtering; its shuffle always moves the full fact,
  * `dask/dataframe/shuffle.py`).
  *
  * The rule is ON by default (`runtime.bloomFilter.enabled=true`) but
  * gated by byte thresholds sized for real clusters: creation side
  * ≤ 10 MB plan size, application scan ≥ 10 GB.  At 100 TB those gates
  * pass on their own — lineitem alone is tens of TB — so production
  * needs NO config change; this spec scales the gates down to fixture
  * bytes to prove the machinery engages on our plans, and that the
  * filter is semantics-preserving.
  *
  * Self-cancels when the 10× replica is absent (GRAFT_MACRO_SF /
  * -Dgraft.macro.sf override, same as MacroJoinDecisionSpec).
  */
class RuntimeFilterSpec extends SparkTestBase {

  private val sfDir = sys.props.get("graft.macro.sf")
    .orElse(sys.env.get("GRAFT_MACRO_SF"))
    .getOrElse("/tmp/sf1")

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally olds.foreach { case (k, o) =>
      o.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  /** The 100 TB shape: no broadcastable side, bloom byte-gates scaled to
    * the 10× fixture (~350 MB lineitem, ~40 MB orders).
    */
  private val hundredTbShape = Seq(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1MB",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "1GB")

  test("production default: runtime bloom filters are enabled") {
    assert(spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true")
  }

  test("q214 at the 100 TB shape: bloom filter prunes the orders scan before the shuffle") {
    assume(new java.io.File(sfDir).isDirectory, s"10x replica $sfDir absent")
    withConfs(hundredTbShape: _*) {
      val df = SparkEntry.queries("q214_tpch_q12")(spark, sfDir)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"InjectRuntimeFilter did not plant a bloom probe:\n$optimized")
      assert(optimized.contains("bloom_filter_agg") ||
        optimized.contains("BloomFilter"),
        s"no bloom creation side in the optimized plan:\n$optimized")
      // and it is semantics-preserving: same result as with the rule off
      val withBloom = df.collect().map(_.toString).sorted
      withConfs("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        val without = SparkEntry.queries("q214_tpch_q12")(spark, sfDir)
          .collect().map(_.toString).sorted
        assert(withBloom.sameElements(without),
          "bloom-filtered result differs from unfiltered")
      }
    }
  }

  test("q209 at the 100 TB shape: bloom probes reach the fact-fact join") {
    assume(new java.io.File(sfDir).isDirectory, s"10x replica $sfDir absent")
    withConfs(hundredTbShape: _*) {
      val df = SparkEntry.queries("q209_tpch_q7")(spark, sfDir)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"InjectRuntimeFilter did not plant a bloom probe:\n$optimized")
    }
  }
}
