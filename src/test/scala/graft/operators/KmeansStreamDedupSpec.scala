package graft.operators

import graft.SparkTestBase
import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class KmeansStreamDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def vecRow(id: Long, v: Array[Float]) = (id, v)

  test("kmeans separates two obvious clusters") {
    // cluster A around (0,0), cluster B around (10,10); ids interleaved so
    // the k=2 init (ids 0 and 1) starts with one seed in each cluster
    val rows = (0L until 40L).map { i =>
      val base = if (i % 2 == 0) 0.0f else 10.0f
      vecRow(i, Array(base + (i % 5) * 0.1f, base - (i % 3) * 0.1f))
    }
    val df = spark.createDataset(rows).toDF("vec_id", "embedding").repartition(4)
    val out = Similarity.kmeans(df, "vec_id", "embedding", k = 2, iters = 3)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(0)._1 == 20L && out(1)._1 == 20L)
    assert(math.abs(out(0)._2 - 0.2) < 0.5)   // near cluster A mean
    assert(math.abs(out(1)._2 - 10.2) < 0.5)  // near cluster B mean
  }

  test("kmeans result is partition-layout independent") {
    val rows = (0L until 60L).map(i => vecRow(i, Array((i % 7).toFloat, (i % 11).toFloat)))
    def run(parts: Int) = {
      val df = spark.createDataset(rows).toDF("vec_id", "embedding").repartition(parts)
      Similarity.kmeans(df, "vec_id", "embedding", k = 3, iters = 2)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    }
    assert(run(1) == run(13))
  }

  test("kmeans matches a driver-side reference Lloyd on random data") {
    val rng = new scala.util.Random(11)
    val dim = 5
    val rows = (0L until 200L).map(i =>
      (i, Array.fill(dim)(rng.nextFloat() * 10 - 5)))
    val k = 4; val iters = 3
    // reference implementation: same init, tie-break, and 1e-6 rounding
    var cents = rows.sortBy(_._1).take(k).map(_._2.map(_.toDouble))
    def assign(v: Array[Float], cs: Seq[Array[Double]]): Int = {
      var best = 0; var bd = Double.MaxValue
      cs.zipWithIndex.foreach { case (c, ci) =>
        var d = 0.0; var i = 0
        while (i < dim) { val t = v(i) - c(i); d += t * t; i += 1 }
        if (d < bd) { bd = d; best = ci }
      }
      best
    }
    for (_ <- 1 to iters) {
      val byCell = rows.groupBy(r => assign(r._2, cents.toSeq))
      cents = cents.zipWithIndex.map { case (old, ci) =>
        byCell.get(ci) match {
          case Some(members) =>
            Array.tabulate(dim) { d =>
              val m = members.map(_._2(d).toDouble).sum / members.size
              math.floor(m * 1e6 + 0.5) / 1e6
            }
          case None => old
        }
      }
    }
    val expCounts = rows.groupBy(r => assign(r._2, cents.toSeq))
      .map { case (c, ms) => c -> ms.size.toLong }
    val df = spark.createDataset(rows).toDF("vec_id", "embedding").repartition(7)
    val got = Similarity.kmeans(df, "vec_id", "embedding", k = k, iters = iters)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    (0 until k).foreach { c =>
      assert(got(c)._1 == expCounts.getOrElse(c, 0L), s"cell $c count")
      assert(got(c)._2 == cents(c)(0), s"cell $c c0")
      assert(got(c)._3 == cents(c)(1), s"cell $c c1")
    }
  }

  test("kmeans rejects k larger than the corpus") {
    val df = Seq(vecRow(1L, Array(1f, 2f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException](
      Similarity.kmeans(df, "vec_id", "embedding", k = 5, iters = 1))
  }

  test("dedupStream drops duplicate keys within the watermark") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "key", "value")
    val out = StreamOps.dedupStream(df, "ts", "10 minutes", Seq("key"))
    val q = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    mem.addData((t(0), "a", 1.0), (t(1), "a", 2.0), (t(1), "b", 3.0))
    q.processAllAvailable()
    mem.addData((t(2), "a", 4.0), (t(3), "c", 5.0)) // 'a' still within watermark
    q.processAllAvailable()
    val got = spark.table("dedup_stream").select("key", "value")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    q.stop()
    // one row per key, the first occurrence's value
    assert(got == Map("a" -> 1.0, "b" -> 3.0, "c" -> 5.0))
  }

  test("dedupStream: eviction past the watermark re-admits a key; late rows dropped") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "key", "value")
    val out = StreamOps.dedupStream(df, "ts", "100 seconds", Seq("key"))
    val q = out.writeStream.format("memory").queryName("dedup_evict")
      .outputMode("append").start()
    def t(sec: Int) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    // batch 0: two short-lived keys + one far-future row that will pull
    // the watermark to t(9900), far past a/b's state expiry at t(100)
    mem.addData((t(0), "a", 1.0), (t(0), "b", 2.0), (t(10000), "m", 3.0))
    q.processAllAvailable()
    // two advancer batches: the stateful operator's effective watermark
    // lags the progress-reported one by a batch, so give the eviction
    // two boundaries to land before the probes arrive
    mem.addData((t(10000), "n1", 0.0)); q.processAllAvailable()
    mem.addData((t(10000), "n2", 0.0)); q.processAllAvailable()
    // probes: 'a' re-arrives ABOVE the watermark after its state was
    // evicted → re-emitted (a fresh dedup epoch, the documented
    // dropDuplicatesWithinWatermark contract); 'b' re-arrives BELOW the
    // watermark → dropped as late data, no re-emission
    mem.addData((t(9950), "a", 4.0), (t(5000), "b", 5.0))
    q.processAllAvailable()
    val got = spark.table("dedup_evict").select("key", "value").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).toSet).toMap
    q.stop()
    assert(got("a") == Set(1.0, 4.0), s"evicted key must re-emit: $got")
    assert(got("b") == Set(2.0), s"late duplicate below the watermark must be dropped: $got")
    assert(got("m") == Set(3.0))
  }

  test("semanticDedup drops near-identical vectors within a cluster, keeps lowest id") {
    // cluster A around (0,1): ids 0,2,4 nearly parallel (cos≈1) + id 6
    // orthogonal-ish; cluster B around (10,0): ids 1,3 nearly parallel.
    val rows = Seq(
      vecRow(0L, Array(0.0f, 1.0f)),
      vecRow(2L, Array(0.001f, 1.0f)),    // dup of 0
      vecRow(4L, Array(0.0f, 0.98f)),     // dup of 0 (same direction)
      vecRow(6L, Array(1.0f, 1.0f)),      // 45° off — survives at tau=.99
      vecRow(1L, Array(10.0f, 0.0f)),
      vecRow(3L, Array(10.0f, 0.05f)),    // dup of 1
      vecRow(5L, Array(0.0f, 0.0f))       // zero-norm: always kept
    )
    val df = spark.createDataset(rows).toDF("vec_id", "embedding").repartition(3)
    val out = Similarity.semanticDedup(df, "vec_id", "embedding", k = 2, iters = 2,
      tau = 0.99).collect().map(_.getLong(0)).toSet
    assert(out == Set(0L, 1L, 5L, 6L), s"survivors: $out")
    // partition-layout independence (content-keyed, like every dedup tier)
    val out1 = Similarity.semanticDedup(
      spark.createDataset(rows).toDF("vec_id", "embedding").repartition(1),
      "vec_id", "embedding", k = 2, iters = 2, tau = 0.99)
      .collect().map(_.getLong(0)).toSet
    assert(out1 == out)
  }

  test("semanticDedup caps a degenerate all-one-cell corpus (bounded pair space)") {
    // adversarial shape: every vector points into the same narrow cone, so
    // Lloyd puts ALL of them in one cell — without the cap that is one n²
    // task. maxCellSize=8 splits the 60-distinct-vector cell into hash
    // sub-cells. tau = 1.0: only EXACT duplicates collapse (the documented
    // tau-boundary semantics), and they collapse BEFORE the split, so the
    // sub-cells cannot separate them; every distinct vector must survive.
    val distinct = (0 until 60).map { i =>
      vecRow(i.toLong, Array(100.0f, i * 1e-3f))
    }
    val dups = Seq(vecRow(100L, Array(100.0f, 7e-3f)),   // exact dup of id 7
                   vecRow(101L, Array(100.0f, 7e-3f)))   // and again
    val nanRow = Seq(vecRow(102L, Array(Float.NaN, 1.0f))) // non-comparable: kept
    val df = spark.createDataset(distinct ++ dups ++ nanRow)
      .toDF("vec_id", "embedding").repartition(4)
    val out = Similarity.semanticDedup(df, "vec_id", "embedding",
      k = 4, iters = 2, tau = 1.0, maxCellSize = 8)
      .collect().map(_.getLong(0)).toSet
    assert(out.contains(7L) && !out.contains(100L) && !out.contains(101L),
      s"exact replicas must collapse to min id even under the cell split: $out")
    assert(out.contains(102L), s"NaN-norm row must keep its original fate: $out")
    assert((0 until 60).forall(i => out.contains(i.toLong)),
      s"distinct vectors must all survive at tau=1.0: $out")
    assert(out.size == 61, s"60 distinct + the NaN row: $out")
  }

  test("semanticDedupWithStats reports the split-cell count and exact skipped-pair fraction") {
    // same adversarial one-cell corpus: the stats variant must surface the
    // cap's coverage loss (no-silent-caps) instead of leaving it to docs
    val distinct = (0 until 60).map { i =>
      vecRow(i.toLong, Array(100.0f, i * 1e-3f))
    }
    val df = spark.createDataset(distinct).toDF("vec_id", "embedding").repartition(4)
    val (outDf, stats) = Similarity.semanticDedupWithStats(df, "vec_id", "embedding",
      k = 4, iters = 2, tau = 1.0, maxCellSize = 8)
    assert(outDf.count() == 60)
    assert(stats.splitCells >= 1, s"the one oversized cell must be reported: $stats")
    assert(stats.withinCellPairs > stats.comparedPairs,
      s"a split cell skips cross-sub-cell pairs: $stats")
    assert(stats.skippedPairFraction > 0.0 && stats.skippedPairFraction < 1.0, s"$stats")
    // exact accounting: compared = sum over sub-cells of n*(n-1)/2, pairs =
    // sum over cells of pop*(pop-1)/2 — both over distinct representatives
    assert(stats.comparedPairs > 0, s"sub-cells still compare within themselves: $stats")

    // a well-behaved corpus (no cell over the bound) reports zero loss
    val (_, clean) = Similarity.semanticDedupWithStats(df, "vec_id", "embedding",
      k = 4, iters = 2, tau = 1.0, maxCellSize = 100000)
    assert(clean.splitCells == 0 && clean.skippedPairFraction == 0.0, s"$clean")
    assert(clean.withinCellPairs == clean.comparedPairs, s"$clean")
  }
}
