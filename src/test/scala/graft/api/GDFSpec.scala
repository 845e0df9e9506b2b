package graft.api

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** GDF wrapper API semantics (reference test style: small frames, several
  * partitions, compare to expected — SURVEY §5).
  */
class GDFSpec extends SparkTestBase {
  import spark.implicits._

  private def df = GDF(Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0),
    (4L, "c", 40.0), (5L, "b", 50.0), (6L, "a", 60.0)
  ).toDF("id", "k", "v").repartition(3))

  test("select/filter/assign/drop/rename compose") {
    val out = df.filter(col("v") > 15)
      .assign("v2", col("v") * 2)
      .drop("v")
      .rename("v2" -> "doubled")
      .select("id", "doubled")
    assert(out.columns == Seq("id", "doubled"))
    assert(out.df.as[(Long, Double)].collect().toMap == Map(
      2L -> 40.0, 3L -> 60.0, 4L -> 80.0, 5L -> 100.0, 6L -> 120.0))
  }

  test("groupby agg spec with aliases") {
    val out = df.groupby("k").aggAliased(("v", "sum", "total"), ("v", "count", "n")).df
    assert(out.columns.toSeq == Seq("k", "total", "n"))
    val m = df.groupby("k").aggAliased(("v", "sum", "total"))
      .df.as[(String, Double)].collect().toMap
    assert(m == Map("a" -> 100.0, "b" -> 70.0, "c" -> 40.0))
  }

  test("groupby value_counts, cumprod, pivot first/last") {
    val d = GDF(Seq(
      ("a", "x", 1L, 2.0), ("a", "x", 2L, 3.0), ("a", "y", 3L, 4.0),
      ("b", "x", 4L, -1.0), ("b", "x", 5L, 0.5)).toDF("k", "c", "ord", "v"))
    // value_counts: one row per (key, value) with the count
    val vc = d.groupby("k").valueCounts("c", "n").df
      .as[(String, String, Long)].collect().toSet
    assert(vc == Set(("a", "x", 2L), ("a", "y", 1L), ("b", "x", 2L)))
    val vn = d.groupby("k").valueCounts("c", "frac", normalize = true).df
      .as[(String, String, Double)].collect().toSet
    assert(vn == Set(("a", "x", 2.0 / 3), ("a", "y", 1.0 / 3), ("b", "x", 1.0)))
    // cumprod in ord order; a null value nulls its own row only
    val withNull = GDF(Seq(
      ("a", 1L, Some(2.0)), ("a", 2L, None), ("a", 3L, Some(3.0)))
      .toDF("k", "ord", "v"))
    val cp = withNull.groupby("k").cumprod("v", Seq("ord"), "cum").df
      .select("ord", "cum").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(cp == Map(1L -> Some(2.0), 2L -> None, 3L -> Some(6.0)))
    // pivot first/last by explicit order; missing combos stay null
    val pf = d.pivotTable("k", "c", "v", "first", Seq("x", "y"), Some("ord")).df
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(pf == Map("a" -> (Some(2.0), Some(4.0)), "b" -> (Some(-1.0), None)))
    val pl = d.pivotTable("k", "c", "v", "last", Seq("x", "y"), Some("ord")).df
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(pl == Map("a" -> (Some(3.0), Some(4.0)), "b" -> (Some(0.5), None)))
    // positional first/last without ordCol is refused, not nondeterministic
    intercept[IllegalArgumentException] {
      d.pivotTable("k", "c", "v", "first", Seq("x", "y"))
    }
  }

  test("merge inner/left with suffixes") {
    val right = GDF(Seq((1L, 100.0), (2L, 200.0)).toDF("id", "v"))
    val m = df.merge(right, on = Seq("id"), how = "inner")
    assert(m.columns.toSet == Set("id", "k", "v_x", "v_y"))
    assert(m.count() == 2)
    val l = df.merge(right, on = Seq("id"), how = "left")
    assert(l.count() == 6)
  }

  test("setIndex records sorted divisions; loc prunes by range") {
    val ix = df.setIndex("id", numPartitions = 3)
    assert(ix.index.contains(IndexMeta(Seq("id"), sorted = true)))
    assert(ix.loc(2L, 4L).count() == 3)
  }

  test("dropDuplicatesKeep first/last via index order") {
    val ix = df.setIndex("id", numPartitions = 2)
    val first = ix.dropDuplicatesKeep(Seq("k"), "first").df
      .select("k", "id").as[(String, Long)].collect().toMap
    assert(first == Map("a" -> 1L, "b" -> 2L, "c" -> 4L))
    val last = ix.dropDuplicatesKeep(Seq("k"), "last").df
      .select("k", "id").as[(String, Long)].collect().toMap
    assert(last == Map("a" -> 6L, "b" -> 5L, "c" -> 4L))
  }

  test("valueCounts orders by count desc") {
    val vc = df.valueCounts("k").df.as[(String, Long)].collect()
    assert(vc.head == ("a", 3L))
    assert(vc.toMap == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("melt produces long format") {
    val m = GDF(Seq((1L, 2.0, 3.0)).toDF("id", "x", "y"))
      .melt(Seq("id"), Seq("x", "y")).df.collect()
    assert(m.length == 2)
  }

  test("pivotTable + getDummies") {
    val p = df.pivotTable("k", "k", "v", "count", knownValues = Seq("a", "b", "c")).df
    assert(p.columns.toSet == Set("k", "a", "b", "c"))
    val dums = df.getDummies("k", Seq("a", "b", "c")).df
    assert(dums.columns.count(_.startsWith("k_")) == 3)
    assert(dums.agg(sum(col("k_a"))).head().getLong(0) == 3L)
  }

  test("rolling via index: global path uses MapOverlap, keyed path uses window") {
    val ix = df.setIndex("id", numPartitions = 3)
    // pandas default min_periods = window → first row is null
    val got = ix.rolling(2).sum("v", "rs").select("id", "rs").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L).isEmpty && got(2L).contains(30.0) && got(6L).contains(110.0))
    // explicit minPeriods = 1 emits from the first row
    val eager = ix.rolling(2, minPeriods = 1).sum("v", "rs")
      .select("id", "rs").as[(Long, Double)].collect().toMap
    assert(eager(1L) == 10.0)
    val keyed = ix.rolling(2, partitionBy = Seq("k")).sum("v", "rs")
      .select("id", "rs").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(keyed(3L).contains(40.0)) // a: 10 + 30
    assert(keyed(1L).isEmpty)        // first row of group a
  }

  test("pipe chains, reverse flips index order, partitionSlice selects one") {
    val ix = df.setIndex("id", numPartitions = 3)
    assert(ix.pipe(_.filter(col("v") > 15)).count() == 5)
    val rev = ix.reverse().df.select("id").collect().map(_.getLong(0)).toSeq
    assert(rev == Seq(6L, 5L, 4L, 3L, 2L, 1L))
    val total = (0 until 3).map(i => ix.partitionSlice(i).count()).sum
    assert(total == 6)
  }

  test("keyed rolling min_periods counts non-null observations, like pandas") {
    val d = GDF(Seq(
      (1L, "a", Some(1.0)), (2L, "a", None), (3L, "a", Some(3.0)), (4L, "a", Some(4.0))
    ).toDF("id", "k", "v")).withIndex("id")
    val out = d.rolling(2, partitionBy = Seq("k")).sum("v", "rs")
      .select("id", "rs").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // windows [1], [1,null], [null,3]: <2 observations each → null;
    // [3,4]: 2 observations → 7 (pandas rolling(2).sum() on [1,NaN,3,4])
    assert(out(1L).isEmpty && out(2L).isEmpty && out(3L).isEmpty && out(4L).contains(7.0))
  }

  test("GroupBy.rolling mirrors the keyed rolling path and drops null-key groups") {
    val ix = df.setIndex("id", numPartitions = 3)
    val viaGroupby = ix.groupby("k").rolling(2).sum("v", "rs")
      .select("id", "rs").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val viaKeyed = ix.rolling(2, partitionBy = Seq("k")).sum("v", "rs")
      .select("id", "rs").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(viaGroupby == viaKeyed)
    // pandas GroupBy.rolling excludes null-key rows (groupby dropna=True)
    val d = GDF(Seq(
      (1L, Some("a"), 1.0), (2L, Some("a"), 2.0), (3L, None, 9.0)
    ).toDF("id", "k", "v")).withIndex("id")
    val out = d.groupby("k").rolling(2, minPeriods = 1).sum("v", "rs")
    assert(out.count() == 2)
    assert(out.filter(col("id") === 2L).head().getDouble(out.columns.indexOf("rs")) == 3.0)
  }

  test("groupby bfill mirrors ffill; Rolling.agg dispatches by name") {
    val d = GDF(Seq(
      (1L, "a", None), (2L, "a", Some(2.0)), (3L, "a", None), (4L, "a", Some(4.0))
    ).toDF("id", "k", "v"))
    val bf = d.groupby("k").bfill("v", "id").df
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // pandas GroupBy.bfill on [NaN,2,NaN,4] -> [2,2,4,4]
    assert(bf == Map(1L -> Some(2.0), 2L -> Some(2.0), 3L -> Some(4.0), 4L -> Some(4.0)))
    val ix = df.setIndex("id", numPartitions = 3)
    val viaAgg = ix.rolling(2, partitionBy = Seq("k")).agg("v", "sum", "rs")
      .select("id", "rs").collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val direct = ix.rolling(2, partitionBy = Seq("k")).sum("v", "rs")
      .select("id", "rs").collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(viaAgg == direct)
    intercept[IllegalArgumentException] {
      ix.rolling(2, partitionBy = Seq("k")).agg("v", "nope", "rs")
    }
  }

  test("groupby transform keeps null-key rows with null result") {
    val d = GDF(Seq(
      (1L, Some("a"), 10.0), (2L, Some("a"), 20.0), (3L, None, 30.0)
    ).toDF("id", "k", "v"))
    val out = d.groupby("k").transform("v", "sum", "total").df
      .select("id", "total").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out == Map(1L -> Some(30.0), 2L -> Some(30.0), 3L -> None))
    intercept[IllegalArgumentException](d.groupby("k").transform("v", "nunique", "n"))
  }

  test("mapValues substitutes from a literal dict, null for unmapped") {
    val out = df.mapValues("k", "k2", Map("a" -> "A", "b" -> "B")).df
      .select("id", "k2").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap
    assert(out(1L).contains("A") && out(2L).contains("B") && out(4L).isEmpty)
  }

  test("cumsum/shift/diff/ffill require a sorted index") {
    intercept[IllegalArgumentException](df.cumsum("v", "cs"))
    val ix = df.setIndex("id", numPartitions = 3)
    val cs = ix.cumsum("v", "cs").df.select("id", "cs").as[(Long, Double)].collect().toMap
    assert(cs(6L) == 210.0)
    val sh = ix.shift("v", 1, "pv").df.select("id", "pv").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(sh(1L).isEmpty && sh(2L).contains(10.0))
  }

  test("alignedBinop outer-aligns on the index before the op") {
    val l = GDF(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")).withIndex("id")
    val r = GDF(Seq((2L, 2.0), (3L, 3.0)).toDF("id", "v"))
    val out = l.alignedBinop(r, "v", "v", "sum")(_ + _).df
      .select("id", "sum").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getDouble(1)))).toMap
    assert(out == Map(1L -> None, 2L -> Some(22.0), 3L -> None))
  }

  test("mergeIndicator marks both/left_only/right_only and suffixes overlaps") {
    val l = GDF(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"))
    val r = GDF(Seq((2L, 20.0), (3L, 30.0)).toDF("id", "v"))
    val out = l.mergeIndicator(r, Seq("id"))
    assert(out.columns.toSet == Set("id", "v_x", "v_y", "_merge"))
    val m = out.df.select("id", "_merge")
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(m == Map(1L -> "left_only", 2L -> "both", 3L -> "right_only"))
  }

  test("alignedBinop: right-side-only index works; index-name output rejected") {
    val l = GDF(Seq((1L, 10.0)).toDF("id", "v"))
    val r = GDF(Seq((1L, 2.0), (2L, 3.0)).toDF("id", "v")).withIndex("id")
    val out = l.alignedBinop(r, "v", "v", "prod")(_ * _).df
      .select("id", "prod").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getDouble(1)))).toMap
    assert(out == Map(1L -> Some(20.0), 2L -> None))
    intercept[IllegalArgumentException](l.withIndex("id").alignedBinop(r, "v", "v", "id")(_ + _))
  }

  test("combineFirst fills nulls and absent labels from the other frame") {
    val l = GDF(Seq((1L, Some(10.0)), (2L, None)).toDF("id", "v")).withIndex("id")
    val r = GDF(Seq((2L, 2.0), (3L, 3.0)).toDF("id", "v"))
    val out = l.combineFirst(r, "v").df.select("id", "v").collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(out == Map(1L -> 10.0, 2L -> 2.0, 3L -> 3.0))
  }

  test("sortValues honors na_position (pandas: NaN last by default)") {
    val d = GDF(Seq(Some(2.0), None, Some(1.0)).toDF("v"))
    def order(na: String, asc: Boolean) =
      d.sortValues(Seq("v"), Seq(asc), naPosition = na).df.collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(order("last", true) == Seq(Some(1.0), Some(2.0), None))
    assert(order("first", true) == Seq(None, Some(1.0), Some(2.0)))
    assert(order("last", false) == Seq(Some(2.0), Some(1.0), None))
  }

  test("concat unions by name with missing columns") {
    val other = GDF(Seq((7L, "d")).toDF("id", "k"))
    val c = df.concat(other)
    assert(c.count() == 7)
    assert(c.df.filter(col("id") === 7).head().isNullAt(2))
  }

  test("hashSample/hashSplit are deterministic, disjoint, and layout-independent") {
    val d = GDF(spark.range(10000).toDF("id"))
    val kept = d.hashSample(col("id"), 0.1).df.select("id").as[Long].collect().toSet
    // pure function of the key → identical under a different partitioning
    val kept2 = GDF(spark.range(10000).repartition(13).toDF("id"))
      .hashSample(col("id"), 0.1).df.select("id").as[Long].collect().toSet
    assert(kept == kept2)
    assert(kept.size > 800 && kept.size < 1200) // ~10%
    val Array(tr, te) = d.hashSplit(col("id"), Array(0.8, 0.2))
    val trIds = tr.df.select("id").as[Long].collect().toSet
    val teIds = te.df.select("id").as[Long].collect().toSet
    assert(trIds.intersect(teIds).isEmpty)
    assert(trIds.size + teIds.size == 10000)
    assert(math.abs(trIds.size - 8000) < 200)
    // a different seed is an effectively independent draw
    val seeded = d.hashSample(col("id"), 0.1, seed = 1).df.select("id").as[Long].collect().toSet
    val overlap = kept.intersect(seeded).size.toDouble / kept.size
    assert(overlap < 0.2, s"seed draws too correlated: $overlap")
  }

  test("hashSampleBy: per-stratum rates, drop-unlisted, layout-independent") {
    val d = GDF(spark.range(10000)
      .select(col("id"), (col("id") % 3).cast("string").as("grp")))
    val fr = Map("0" -> 0.5, "1" -> 1.0) // "2" unlisted -> dropped
    val kept = d.hashSampleBy(col("grp"), col("id"), fr)
      .df.select("id", "grp").as[(Long, String)].collect()
    val byGrp = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(!byGrp.contains("2"), "unlisted stratum must be dropped")
    assert(byGrp("1") == (0 until 10000).count(_ % 3 == 1), "rate 1.0 keeps the stratum whole")
    val half = (0 until 10000).count(_ % 3 == 0)
    assert(math.abs(byGrp("0") - half / 2.0) < half * 0.1, s"~half expected, got ${byGrp("0")}")
    // pure function of (key, stratum, seed): stable under repartitioning
    val kept2 = GDF(spark.range(10000)
      .select(col("id"), (col("id") % 3).cast("string").as("grp")).repartition(17))
      .hashSampleBy(col("grp"), col("id"), fr)
      .df.select("id", "grp").as[(Long, String)].collect()
    assert(kept.toSet == kept2.toSet)
    intercept[IllegalArgumentException] {
      d.hashSampleBy(col("grp"), col("id"), Map("0" -> 1.5))
    }
  }

  test("rolling skew/kurt match pandas adjusted statistics on both paths") {
    val d = Seq((0L, "k", 1.0), (1L, "k", 2.0), (2L, "k", 4.0),
        (3L, "k", 8.0), (4L, "k", 3.0), (5L, "k", 5.0))
      .toDF("idx", "k", "v").repartitionByRange(3, col("idx")).sortWithinPartitions("idx")
    // pandas: Series([1,2,4,8,3,5]).rolling(4, min_periods=3).skew() / .kurt()
    val expSkew = Map(2L -> 0.93521953, 3L -> 1.13762437, 4L -> 1.44305884, 5L -> 1.19034013)
    val expKurt = Map(3L -> 0.75765595, 4L -> 2.23486718, 5L -> 1.5)
    def got(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.select("idx", "out").collect()
        .collect { case r if !r.isNullAt(1) => r.getLong(0) -> r.getDouble(1) }.toMap
    for (keys <- Seq(Nil, Seq("k"))) {
      val s = got(new graft.api.GRolling(d, 4, Seq("idx"), keys, 3).skew("v", "out"))
      assert(s.keySet == expSkew.keySet, s"skew keys keys=$keys")
      expSkew.foreach { case (k, e) => assert(math.abs(s(k) - e) < 1e-6, s"skew $k keys=$keys") }
      val kt = got(new graft.api.GRolling(d, 4, Seq("idx"), keys, 4).kurt("v", "out"))
      assert(kt.keySet == expKurt.keySet, s"kurt keys keys=$keys")
      expKurt.foreach { case (k, e) => assert(math.abs(kt(k) - e) < 1e-6, s"kurt $k keys=$keys") }
    }
  }

  test("keyed rolling custom kernel (applyKeyed) slides per key across partitions") {
    val d = Seq(("a", 1L, 1.0), ("a", 2L, 5.0), ("a", 3L, 3.0),
        ("b", 4L, 10.0), ("b", 5L, 20.0))
      .toDF("k", "ord", "v").repartition(3)
    val out = new graft.api.GRolling(d, 2, Seq("ord"), Seq("k"), 1)
      .applyKeyed("v", "rng")(xs => xs.max - xs.min)
      .select("ord", "rng").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(1L -> 0.0, 2L -> 4.0, 3L -> 2.0, 4L -> 0.0, 5L -> 10.0))
    // min_periods gates on non-null observations
    val withNull = Seq(("a", 1L, Some(1.0)), ("a", 2L, None), ("a", 3L, Some(3.0)))
      .toDF("k", "ord", "v")
    val mp = new graft.api.GRolling(withNull, 2, Seq("ord"), Seq("k"), 2)
      .applyKeyed("v", "s")(_.sum)
      .select("ord", "s").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(mp == Map(1L -> None, 2L -> None, 3L -> None))
  }

  test("keyed rolling skew/kurt survive |mean| >> std (anchor-shifted power sums)") {
    // same shape as above but offset by 1e8: raw power sums would cancel
    // catastrophically (m2 = s2/n - mean^2 with ~16 shared digits); the
    // anchor shift keeps the keyed path equal to the two-pass global path
    val off = 1e8
    val d = Seq((0L, "k", off + 1.0), (1L, "k", off + 2.0), (2L, "k", off + 4.0),
        (3L, "k", off + 8.0), (4L, "k", off + 3.0), (5L, "k", off + 5.0))
      .toDF("idx", "k", "v").repartitionByRange(3, col("idx")).sortWithinPartitions("idx")
    val expSkew = Map(2L -> 0.93521953, 3L -> 1.13762437, 4L -> 1.44305884, 5L -> 1.19034013)
    val expKurt = Map(3L -> 0.75765595, 4L -> 2.23486718, 5L -> 1.5)
    def got(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.select("idx", "out").collect()
        .collect { case r if !r.isNullAt(1) => r.getLong(0) -> r.getDouble(1) }.toMap
    val s = got(new graft.api.GRolling(d, 4, Seq("idx"), Seq("k"), 3).skew("v", "out"))
    expSkew.foreach { case (k, e) => assert(math.abs(s(k) - e) < 1e-4, s"skew $k: ${s(k)}") }
    val kt = got(new graft.api.GRolling(d, 4, Seq("idx"), Seq("k"), 4).kurt("v", "out"))
    expKurt.foreach { case (k, e) => assert(math.abs(kt(k) - e) < 1e-4, s"kurt $k: ${kt(k)}") }
  }

  test("timeseries generator is deterministic and index-sorted") {
    val ts = graft.sources.Timeseries(spark, 1704067200L, 1000, freqSec = 1, numPartitions = 4)
    assert(ts.index.exists(_.sorted))
    // per-row values are a pure function of the row id → bit-identical
    // across partition layouts (sum order may differ, so compare rows)
    val a = ts.df.select("timestamp", "x").orderBy("timestamp").limit(20).collect().toSeq
    val b = graft.sources.Timeseries(spark, 1704067200L, 1000, freqSec = 1, numPartitions = 8)
      .df.select("timestamp", "x").orderBy("timestamp").limit(20).collect().toSeq
    assert(a == b)
    assert(ts.df.select("name").distinct().count() > 5)
  }

  test("clip leaves null and NaN untouched (pandas missing-value rule)") {
    val d = GDF(Seq(Some(-5.0), Some(5.0), Some(15.0), None, Some(Double.NaN))
      .toDF("x"))
    val out = d.clip("x", 0.0, 10.0).df.collect().map(r =>
      if (r.isNullAt(0)) "null" else r.getDouble(0).toString).toSet
    assert(out == Set("0.0", "5.0", "10.0", "null", "NaN"))
  }

  test("dropDuplicatesKeep with no subset dedups on all columns") {
    val d = GDF(Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("id", "k")).withIndex("id")
    assert(d.dropDuplicatesKeep(Nil, "first").df.count() == 2)
  }

  test("group valueCounts drops null values; transform honors dropna=false") {
    val d = GDF(Seq(("a", Some(1.0)), ("a", Some(1.0)), ("a", None), ("b", Some(2.0)))
      .toDF("k", "v"))
    val vc = d.groupby("k").valueCounts("v", normalize = true).df.collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    // the (a, null) row neither appears nor inflates a's denominator
    assert(vc == Set(("a", 1.0, 1.0), ("b", 2.0, 1.0)))
    val nullKey = GDF(Seq((Some("a"), 1.0), (None, 2.0), (None, 3.0))
      .toDF("k", "v"))
    val t = nullKey.groupbyDropna(false, "k").transform("v", "sum", "s").df
      .collect().map(r => (if (r.isNullAt(0)) "ø" else r.getString(0)) -> r.getDouble(2)).toSet
    assert(t == Set("a" -> 1.0, "ø" -> 5.0)) // null keys form a real group
    val tDrop = nullKey.groupby("k").transform("v", "sum", "s").df
      .collect().map(r => if (r.isNullAt(2)) -1.0 else r.getDouble(2)).toSet
    assert(tDrop == Set(1.0, -1.0)) // dropna=true nulls them out, as before
  }

  test("keyed range rolling keeps fractional numeric order resolution") {
    // rows at 0.5 and 1.6 with range 1: window at 1.6 is [0.6, 1.6] and
    // must EXCLUDE 0.5 (a long-truncated order would include it)
    val d = Seq(("a", 0.5, 1.0), ("a", 1.6, 10.0)).toDF("k", "t", "v")
    val out = new graft.api.GRolling(d, 0, Seq("t"), Seq("k"), 1)
      .sumRange("v", "s", 1L).collect().map(r => r.getDouble(1) -> r.getDouble(3)).toMap
    assert(out(0.5) == 1.0 && out(1.6) == 10.0)
  }

  test("hashSample rejects non-numeric keys; repartitionFreq rejects outliers") {
    val d = GDF(Seq(("u_1", 1.0)).toDF("uid", "v"))
    intercept[IllegalArgumentException] { d.hashSample(col("uid"), 0.5) }
    val ts2 = GDF(Seq(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      java.sql.Timestamp.valueOf("9999-01-01 00:00:00")).toDF("t"))
    intercept[IllegalArgumentException] { ts2.repartitionFreq("t", 1L) }
  }

  test("group-windowed ops demote the sorted index (layout is destroyed)") {
    val d = GDF(Seq((1L, "a", 1.0), (2L, "a", 2.0)).toDF("id", "k", "v"))
      .setIndex("id")
    val shifted = d.groupby("k").shift("v", 1, "id", "prev")
    assert(shifted.index.exists(!_.sorted))
    // a later order-dependent op must demand a re-sort, not run MapOverlap
    // over the hash-shuffled layout
    intercept[IllegalArgumentException] { shifted.shift("v", 1, "out2") }
  }
}
