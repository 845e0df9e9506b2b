package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests: the distributed custom operators (MapOverlap ghost
  * rows, two-phase Cumulative, Fill, MergeAsof) must agree with the
  * single-task SQL-window ground truth on randomized inputs across
  * varying partition counts — the dask `assert_eq` testing stance
  * (SURVEY §5) with the partition axis parametrized.
  */
class DistributedOpsPropSpec extends SparkTestBase {

  import spark.implicits._

  private def randomDoubles(seed: Long, n: Int): List[Double] =
    Gen.listOfN(n, Gen.choose(-100.0, 100.0)).apply(Gen.Parameters.default, Seed(seed)).get

  private def frame(seed: Long, n: Int, parts: Int): DataFrame =
    randomDoubles(seed, n).zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("idx", "v")
      .repartitionByRange(parts, col("idx"))
      .sortWithinPartitions("idx")

  private def col2map(df: DataFrame, value: String): Map[Long, Option[Double]] =
    df.select(col("idx"), col(value)).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

  test("MapOverlap rolling sum/shift == SQL window, any partitioning") {
    for (seed <- Seq(1L, 2L); parts <- Seq(1, 3, 7); window <- Seq(1, 4)) {
      val df = frame(seed, 50, parts)
      val got = col2map(MapOverlap.rollingSum(df, "v", window, "out"), "out")
      val w = Window.orderBy("idx").rowsBetween(-(window - 1), Window.currentRow)
      val exp = col2map(df.withColumn("out", sum(col("v")).over(w)), "out")
      for (k <- exp.keys)
        assert(got(k).zip(exp(k)).forall { case (a, b) => math.abs(a - b) < 1e-9 },
          s"rollingSum seed=$seed parts=$parts window=$window idx=$k")

      val gotS = col2map(MapOverlap.shift(df, "v", 2, "out"), "out")
      val expS = col2map(df.withColumn("out", lag(col("v"), 2).over(Window.orderBy("idx"))), "out")
      assert(gotS == expS, s"shift seed=$seed parts=$parts")

      val gotL = col2map(MapOverlap.lead(df, "v", 3, "out"), "out")
      val expL = col2map(df.withColumn("out", lead(col("v"), 3).over(Window.orderBy("idx"))), "out")
      assert(gotL == expL, s"lead seed=$seed parts=$parts")

      val gotG = col2map(MapOverlap.gradient(df, "v", "out"), "out")
      val w1 = Window.orderBy("idx")
      val expG = col2map(
        df.withColumn("p", lag(col("v"), 1).over(w1))
          .withColumn("n", lead(col("v"), 1).over(w1))
          .withColumn("out",
            when(col("p").isNull, col("n") - col("v"))
              .when(col("n").isNull, col("v") - col("p"))
              .otherwise((col("n") - col("p")) / 2))
          .drop("p", "n"), "out")
      for (k <- expG.keys)
        assert(gotG(k).zip(expG(k)).forall { case (a, b) => math.abs(a - b) < 1e-9 },
          s"gradient seed=$seed parts=$parts idx=$k")
    }
  }

  test("MapOverlap centered rolling == SQL centered window, any partitioning") {
    for (seed <- Seq(5L, 6L); parts <- Seq(1, 3, 7); window <- Seq(2, 5)) {
      val df = frame(seed, 50, parts)
      val got = col2map(
        MapOverlap.rollingCenteredAgg(df, "v", window, "out", 1)(_.sum), "out")
      val w = Window.orderBy("idx")
        .rowsBetween(-(window / 2), window - window / 2 - 1)
      val exp = col2map(df.withColumn("out", sum(col("v")).over(w)), "out")
      for (k <- exp.keys)
        assert(got(k).zip(exp(k)).forall { case (a, b) => math.abs(a - b) < 1e-9 },
          s"centered seed=$seed parts=$parts window=$window idx=$k")
    }
  }

  test("MapOverlap range rolling == SQL range window (unique ords), any partitioning") {
    // parts=25 over 50 rows makes partition spans narrower than the larger
    // ranges — the ghost walk must then cross MULTIPLE partitions
    for (seed <- Seq(9L, 10L); parts <- Seq(1, 3, 7, 25); range <- Seq(2.0, 10.0, 45.0)) {
      // idx doubles as the (unique) order value, with irregular gaps
      val df = frame(seed, 50, parts)
        .withColumn("ord", (col("idx") * 3).cast("double"))
        .repartitionByRange(parts, col("ord")).sortWithinPartitions("ord")
      val got = col2map(
        MapOverlap.rollingRangeAgg(df, "v", "ord", range, "out")(_.sum), "out")
      val w = Window.orderBy(col("ord").cast("long")).rangeBetween(-range.toLong, 0)
      val exp = col2map(df.withColumn("out", sum(col("v")).over(w)), "out")
      for (k <- exp.keys)
        assert(got(k).zip(exp(k)).forall { case (a, b) => math.abs(a - b) < 1e-9 },
          s"rangeAgg seed=$seed parts=$parts range=$range idx=$k")
    }
  }

  test("MapOverlap range rolling is pandas-POSITIONAL on replicated ties") {
    // ScaleGen-style replication: every ord value appears `reps` times.
    // A SQL RANGE frame would include LATER peers at the same ord; the
    // positional window holds rows at or before the current position
    // with ord >= ord_i - range — the divergence only ties expose.
    for (seed <- Seq(15L, 16L); parts <- Seq(1, 3, 7); reps <- Seq(2, 5)) {
      val base = randomDoubles(seed, 20).map(v => math.floor(math.abs(v) % 30))
      val rows = for {
        (o, i) <- base.zipWithIndex
        r <- 0 until reps
      } yield ((i.toLong * reps + r), o, (i * 31 + r * 7).toDouble)
      val df = rows.toDF("idx", "ord", "v")
        .repartitionByRange(parts, col("ord"), col("idx"))
        .sortWithinPartitions("ord", "idx")
      val got = col2map(MapOverlap.rollingRangeAgg(df, "v", "ord", 5.0, "out")(_.sum), "out")
      // driver reference over the same (ord, idx) total order
      val seq = rows.sortBy(r => (r._2, r._1))
      val exp = seq.zipWithIndex.map { case ((idx, o, _), i) =>
        idx -> seq.take(i + 1).collect { case (_, oj, vj) if oj >= o - 5.0 => vj }.sum
      }.toMap
      for ((idx, e) <- exp)
        assert(got(idx).exists(a => math.abs(a - e) < 1e-9),
          s"positional range seed=$seed parts=$parts reps=$reps idx=$idx: ${got(idx)} vs $e")
    }
  }

  test("MapOverlap ghosts span partitions shorter than the window") {
    // partition layout [4 rows][1 row][0 rows][4 rows]: window 4 ghosts
    // for the last partition must come from BOTH preceding non-empty ones
    val slices = Seq(Seq(0L, 1L, 2L, 3L), Seq(4L), Seq.empty[Long], Seq(5L, 6L, 7L, 8L))
    val rowRdd = spark.sparkContext.parallelize(0 until slices.size, slices.size)
      .mapPartitionsWithIndex { (pid, _) =>
        slices(pid).iterator.map(i => org.apache.spark.sql.Row(i, i.toDouble))
      }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("idx", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType)))
    val df = spark.createDataFrame(rowRdd, schema)
    assert(df.rdd.getNumPartitions == 4)
    val got = col2map(MapOverlap.rollingSum(df, "v", 4, "out"), "out")
    val w = Window.orderBy("idx").rowsBetween(-3, Window.currentRow)
    val exp = col2map(df.withColumn("out", sum(col("v")).over(w)), "out")
    assert(got == exp)

    val gotS = col2map(MapOverlap.shift(df, "v", 3, "out"), "out")
    val expS = col2map(df.withColumn("out", lag(col("v"), 3).over(Window.orderBy("idx"))), "out")
    assert(gotS == expS)
  }

  test("MapOverlap rolling pair cov/corr == SQL window, any partitioning, with nulls") {
    // NaN-aware compare: keyed Spark corr and the global kernel both emit
    // NaN for a zero-variance side (pandas), null only for n < 2 pairs
    def same(a: Option[Double], b: Option[Double]): Boolean = (a, b) match {
      case (Some(x), Some(y)) => (x.isNaN && y.isNaN) || math.abs(x - y) < 1e-9
      case _                  => a == b
    }
    for (seed <- Seq(11L, 12L); parts <- Seq(1, 3, 7); window <- Seq(2, 5)) {
      // independent null masks on x and y: valid-PAIR counting is the point
      val xs = randomDoubles(seed, 60)
      val ys = randomDoubles(seed + 50, 60)
      val df = xs.zip(ys).zipWithIndex.map { case ((x, y), i) =>
          (i.toLong,
            if (i % 4 == 0) None else Some(x),
            if (i % 5 == 1) None else Some(y))
        }.toDF("idx", "x", "y")
        .repartitionByRange(parts, col("idx"))
        .sortWithinPartitions("idx")
      val w = Window.orderBy("idx").rowsBetween(-(window - 1), Window.currentRow)
      val roll = new graft.api.GRolling(df, window, Seq("idx"), Seq(), 1)
      val gotC = col2map(roll.covWith("x", "y", "out"), "out")
      val expC = col2map(df.withColumn("out", covar_samp(col("x"), col("y")).over(w)), "out")
      for (k <- expC.keys)
        assert(same(gotC(k), expC(k)),
          s"cov seed=$seed parts=$parts window=$window idx=$k: ${gotC(k)} vs ${expC(k)}")
      val gotR = col2map(roll.corrWith("x", "y", "out"), "out")
      val expR = col2map(df.withColumn("out", corr(col("x"), col("y")).over(w)), "out")
      for (k <- expR.keys)
        assert(same(gotR(k), expR(k)),
          s"corr seed=$seed parts=$parts window=$window idx=$k: ${gotR(k)} vs ${expR(k)}")
    }
    // constant column → zero variance: corr must be NaN (not null) once
    // n ≥ 2, on both physical paths
    val cdf = (0L until 8L).map(i => (i, 1.0, i.toDouble)).toDF("idx", "x", "y")
      .repartitionByRange(3, col("idx")).sortWithinPartitions("idx")
    val g = col2map(new graft.api.GRolling(cdf, 4, Seq("idx"), Seq(), 1)
      .corrWith("x", "y", "out"), "out")
    assert(g(0L).isEmpty, "n=1 window must be null")
    assert((1L until 8L).forall(k => g(k).exists(_.isNaN)), s"zero-variance corr must be NaN: $g")
  }

  test("Cumulative two-phase scan == SQL running aggregate") {
    for (seed <- Seq(3L, 4L); parts <- Seq(1, 5)) {
      val df = frame(seed, 60, parts)
      val w = Window.orderBy("idx").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      for ((op, ex) <- Seq[(Cumulative.Op, org.apache.spark.sql.Column)](
        Cumulative.CumSum -> sum(col("v")).over(w),
        Cumulative.CumMax -> max(col("v")).over(w),
        Cumulative.CumMin -> min(col("v")).over(w))) {
        val got = col2map(Cumulative(df, "v", op, "out"), "out")
        val exp = col2map(df.withColumn("out", ex), "out")
        for (k <- exp.keys)
          assert(got(k).zip(exp(k)).forall { case (a, b) => math.abs(a - b) < 1e-9 },
            s"$op seed=$seed parts=$parts idx=$k")
      }
    }
  }

  test("Fill ffill/bfill == SQL ignore-nulls window") {
    for (seed <- Seq(5L, 6L); parts <- Seq(2, 6)) {
      val base = frame(seed, 50, parts)
        .withColumn("v", when(col("idx") % 3 === 0, lit(null)).otherwise(col("v")))
      val gotF = col2map(Fill.ffill(base, "v"), "v")
      val wF = Window.orderBy("idx").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val expF = col2map(base.withColumn("v", last(col("v"), ignoreNulls = true).over(wF)), "v")
      assert(gotF == expF, s"ffill seed=$seed parts=$parts")

      val gotB = col2map(Fill.bfill(base, "v"), "v")
      val wB = Window.orderBy("idx").rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val expB = col2map(base.withColumn("v", first(col("v"), ignoreNulls = true).over(wB)), "v")
      assert(gotB == expB, s"bfill seed=$seed parts=$parts")
    }
  }

  test("MergeAsof backward/forward == window-carry reference on random data") {
    for (seed <- Seq(7L, 8L)) {
      val lv = randomDoubles(seed, 40).map(v => math.abs(v) % 50)
      val rv = randomDoubles(seed + 100, 15).map(v => math.abs(v) % 50)
      val left = lv.zipWithIndex.map { case (t, i) => (i.toLong, 1L + i % 2, math.floor(t)) }
        .toDF("lid", "k", "t").repartition(3)
      val right = rv.zipWithIndex.map { case (t, i) => (1L + i % 2, math.floor(t), i * 10.0) }
        .toDF("k", "t", "payload")
        // dedup (k, t) so the matched payload is unique
        .groupBy("k", "t").agg(max("payload").as("payload")).repartition(2)

      for (dir <- Seq("backward", "forward")) {
        val got = MergeAsof(left, right, on = "t", by = Seq("k"), direction = dir)
          .select("lid", "payload").collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
        // reference: per left row, scan the right side driver-side
        val rRows = right.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
        val lRows = left.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        for ((lid, k, t) <- lRows) {
          val cands = rRows.filter(c => c._1 == k &&
            (if (dir == "backward") c._2 <= t else c._2 >= t))
          val exp =
            if (cands.isEmpty) None
            else if (dir == "backward") Some(cands.maxBy(c => (c._2, c._3))._3)
            else Some(cands.minBy(_._2)._3)
          // forward ties on t: payload is unique per (k,t) after dedup
          assert(got(lid) == exp, s"asof $dir seed=$seed lid=$lid")
        }
      }
    }
  }

  test("MergeAsof GLOBAL (no by) == driver reference: direction × tolerance × partitioning") {
    for (seed <- Seq(21L, 22L); parts <- Seq(1, 3, 7)) {
      val lv = randomDoubles(seed, 60).map(v => math.floor(math.abs(v) % 50))
      // unique right on-values (shifted off the integer grid) so backward/
      // forward tie-breaking is never ambiguous in the reference
      val rv = randomDoubles(seed + 7, 20).map(v => math.floor(math.abs(v) % 50) + 0.5)
        .distinct
      val left = lv.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("lid", "t").repartition(parts)
      val right = rv.zipWithIndex.map { case (t, i) =>
          (t, if (i % 5 == 0) None else Some(i * 10.0)) // null payloads ride along
        }.toDF("t", "payload").repartition(2)
      val rRows = rv.zipWithIndex.map { case (t, i) =>
        (t, if (i % 5 == 0) None else Some(i * 10.0)) }

      for (dir <- Seq("backward", "forward", "nearest");
           tol <- Seq(None, Some(5.0))) {
        val got = MergeAsof(left, right, on = "t", by = Nil, direction = dir,
            tolerance = tol)
          .select("lid", "payload").collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
        for ((t, lid) <- lv.zipWithIndex) {
          val within = rRows.filter { case (rt, _) =>
            tol.forall(x => math.abs(rt - t) <= x) }
          val cand = dir match {
            case "backward" => within.filter(_._1 <= t).sortBy(_._1).lastOption
            case "forward"  => within.filter(_._1 >= t).sortBy(_._1).headOption
            case "nearest"  =>
              within.sortBy(c => (math.abs(c._1 - t), if (c._1 <= t) 0 else 1)).headOption
          }
          val exp = cand.flatMap(_._2)
          assert(got(lid.toLong) == exp,
            s"global asof $dir tol=$tol seed=$seed parts=$parts lid=$lid t=$t: " +
              s"${got(lid.toLong)} vs $exp")
        }
      }
    }
  }

  test("Expanding two-phase scan == SQL window, any partitioning, with nulls") {
    for (seed <- Seq(5L, 6L); parts <- Seq(1, 3, 7)) {
      // every 5th value null: exercises the observation-vs-row counting
      val df = frame(seed, 60, parts)
        .withColumn("v", when(col("idx") % 5 === 0, lit(null)).otherwise(col("v")))
      val specs = Seq("s" -> "sum", "m" -> "mean", "lo" -> "min", "hi" -> "max",
        "c" -> "count", "vr" -> "var", "sd" -> "std")
      val got = Expanding.aggs(df, "v", Seq("idx"), specs)
      val w = Window.orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val exp = df.withColumn("s", sum(col("v")).over(w))
        .withColumn("m", avg(col("v")).over(w))
        .withColumn("lo", min(col("v")).over(w))
        .withColumn("hi", max(col("v")).over(w))
        .withColumn("c", count(col("v")).over(w))
        .withColumn("vr", var_samp(col("v")).over(w))
        .withColumn("sd", stddev_samp(col("v")).over(w))
      for ((out, _) <- specs if out != "c") {
        val g = col2map(got, out); val e = col2map(exp, out)
        for (k <- e.keys) (g(k), e(k)) match {
          case (Some(a), Some(b)) =>
            assert(math.abs(a - b) < 1e-9, s"$out seed=$seed parts=$parts idx=$k: $a vs $b")
          case (a, b) => assert(a == b, s"$out seed=$seed parts=$parts idx=$k: $a vs $b")
        }
      }
      val gc = got.select(col("idx"), col("c")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ec = exp.select(col("idx"), col("c")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gc == ec, s"count seed=$seed parts=$parts")
    }
  }

  test("Expanding integral sum/min/max keep long outputs; minPeriods guards") {
    import spark.implicits._
    val df = Seq((0L, Some(3L)), (1L, None), (2L, Some(5L)), (3L, Some(1L)))
      .toDF("idx", "v").repartitionByRange(2, col("idx"))
    val out = Expanding.aggs(df, "v", Seq("idx"),
      Seq("s" -> "sum", "lo" -> "min", "c" -> "count"), minPeriods = 2)
    val rows = out.orderBy("idx").collect()
    assert(out.schema("s").dataType == org.apache.spark.sql.types.LongType)
    assert(out.schema("lo").dataType == org.apache.spark.sql.types.LongType)
    // minPeriods=2 observations: idx 0 (1 obs) and idx 1 (still 1 obs) null
    assert(rows(0).isNullAt(rows(0).fieldIndex("s")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("s")))
    assert(rows(2).getLong(rows(2).fieldIndex("s")) == 8L)
    assert(rows(3).getLong(rows(3).fieldIndex("lo")) == 1L)
    // count's min_periods counts window ROWS (pandas): idx 0 has 1 row ->
    // null, idx 1 has 2 rows (1 obs) -> 1
    assert(rows(0).isNullAt(rows(0).fieldIndex("c")))
    assert(rows(1).getLong(rows(1).fieldIndex("c")) == 1L)
  }

  test("Expanding longs above 2^53 keep exact min/max/sum; huge x^2 falls back for var") {
    import spark.implicits._
    val big = (1L << 53) + 1 // not representable as a double
    val df = Seq((0L, big), (1L, big + 2), (2L, big + 1))
      .toDF("idx", "v").repartitionByRange(2, col("idx"))
    val out = Expanding.aggs(df, "v", Seq("idx"),
      Seq("s" -> "sum", "lo" -> "min", "hi" -> "max", "vr" -> "var"))
      .orderBy("idx").collect()
    // double-tracked accumulators would round these to the 2^53 grid
    assert(out(2).getLong(out(2).fieldIndex("lo")) == big)
    assert(out(1).getLong(out(1).fieldIndex("hi")) == big + 2)
    assert(out(2).getLong(out(2).fieldIndex("s")) == 3 * big + 3)
    // |x| > sqrt(2^63): x*x would overflow the exact path, so var falls
    // back to the Welford doubles — bounded by double REPRESENTATION of
    // the inputs (adjacent 2^53-scale longs collapse to the same double),
    // not garbage from a silent long overflow (which lands anywhere)
    val vr = out(2).getDouble(out(2).fieldIndex("vr"))
    assert(vr >= 0.0 && vr <= 4.0, s"var=$vr")
  }

  test("Expanding RUNNING Σx² overflow falls back to Welford though every x² fits") {
    import spark.implicits._
    // |x| = 2×10⁹ → x² = 4×10¹⁸ fits a Long, but the running Σx² wraps
    // 2⁶³ on the third row — the case a per-value magnitude guard misses.
    // Constant series: the Welford fallback must give mean exactly x and
    // var exactly 0 (delta = 0 after the first add); the wrapped intVar
    // would return garbage.
    val x = 2000000000L
    val df = Seq.tabulate(6)(i => (i.toLong, x)).toDF("idx", "v")
      .repartitionByRange(2, col("idx")).sortWithinPartitions("idx")
    val out = Expanding.aggs(df, "v", Seq("idx"),
      Seq("s" -> "sum", "m" -> "mean", "vr" -> "var", "sd" -> "std"))
      .orderBy("idx").collect()
    assert(out(5).getLong(out(5).fieldIndex("s")) == 6 * x) // Σx itself still exact
    for (i <- 0 until 6)
      assert(out(i).getDouble(out(i).fieldIndex("m")) == x.toDouble, s"mean at $i")
    for (i <- 1 until 6) {
      assert(out(i).getDouble(out(i).fieldIndex("vr")) == 0.0, s"var at $i")
      assert(out(i).getDouble(out(i).fieldIndex("sd")) == 0.0, s"std at $i")
    }
  }

  test("rollingPairAgg: NaN evictee recovers immediately; constant runs exact across rebuilds") {
    import spark.implicits._
    // Reference: a FRESH PairMoments per window — the from-scratch
    // recompute the incremental kernel (anchored sums + periodic rebuild)
    // must agree with.  Replicates covWith/corrWith's agg lambdas.
    def ref(wx: Seq[Double], wy: Seq[Double], corrMode: Boolean): Option[Double] = {
      val m = new MapOverlap.PairMoments
      wx.zip(wy).foreach { case (a, b) => m.add(a, b) }
      if (m.n < 2) None
      else if (!corrMode) Some(m.cxy / (m.n - 1))
      else if (m.constX || m.constY) Some(Double.NaN)
      else if (m.cxx <= 0.0 || m.cyy <= 0.0) Some(Double.NaN)
      else Some(math.max(-1.0, math.min(1.0, m.cxy / math.sqrt(m.cxx * m.cyy))))
    }
    val n = 80
    val xs = randomDoubles(31L, n).toArray
    val ys = randomDoubles(81L, n).toArray
    for (i <- 20 until 33) { xs(i) = 7.5; ys(i) = -2.25 } // both constant: run ≫ window,
    for (i <- 50 until 58) { xs(i) = 3.0 }                // so windows straddle rebuilds
    xs(65) = Double.NaN // poisons the running sums until evicted
    for (parts <- Seq(1, 3); window <- Seq(4, 6)) {
      val df = (0 until n).map(i => (i.toLong, xs(i), ys(i)))
        .toDF("idx", "x", "y")
        .repartitionByRange(parts, col("idx")).sortWithinPartitions("idx")
      val roll = new graft.api.GRolling(df, window, Seq("idx"), Seq(), 1)
      val gotC = col2map(roll.covWith("x", "y", "out"), "out")
      val gotR = col2map(roll.corrWith("x", "y", "out"), "out")
      for (i <- 0 until n) {
        val lo = math.max(0, i - window + 1)
        val expC = ref((lo to i).map(xs), (lo to i).map(ys), corrMode = false)
        val expR = ref((lo to i).map(xs), (lo to i).map(ys), corrMode = true)
        val inConstRun = lo >= 20 && i < 33
        def same(g: Option[Double], e: Option[Double]): Boolean = (g, e) match {
          case (Some(a), Some(b)) =>
            (a.isNaN && b.isNaN) || math.abs(a - b) < 1e-9
          case _ => g == e
        }
        assert(same(gotC(i.toLong), expC),
          s"cov parts=$parts window=$window idx=$i: ${gotC(i.toLong)} vs $expC")
        assert(same(gotR(i.toLong), expR),
          s"corr parts=$parts window=$window idx=$i: ${gotR(i.toLong)} vs $expR")
        // the kernel's hard guarantee on constant windows is EXACT (deque
        // extrema, not an fp threshold): corr must be bit-NaN even when
        // the window straddles a periodic rebuild boundary
        if (inConstRun)
          assert(gotR(i.toLong).exists(_.isNaN),
            s"const-run corr must be exactly NaN at idx=$i (parts=$parts window=$window)")
        // the row after the NaN pair leaves the window must be finite
        // again IMMEDIATELY (pre-fix: NaN persisted until the periodic
        // rebuild, up to `window` rows later)
        if (lo > 65)
          assert(gotC(i.toLong).exists(v => !v.isNaN) && gotR(i.toLong).exists(v => !v.isNaN),
            s"post-NaN window at idx=$i must be finite: ${gotC(i.toLong)} ${gotR(i.toLong)}")
      }
    }
  }
}
