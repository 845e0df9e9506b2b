package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[PushSemiThroughFilteredAggregate]]: the HAVING-shaped semi/anti
  * pushdown Spark's builtin misses (PushDownLeftSemiAntiJoin handles a
  * bare Aggregate but is blocked by a Filter on aggregate outputs).
  */
class PushSemiRuleSpec extends SparkTestBase {

  import spark.implicits._

  /** 40 facts over 8 keys; the aggregate filter keeps high-sum keys and
    * the semi side holds keys {1,3,5}.
    */
  private def fact: DataFrame =
    (0 until 40).map(i => (i.toLong % 8, i.toLong)).toDF("k", "v")
  private def keys: DataFrame = Seq(1L, 3L, 5L).toDF("pk")

  private def naturalSemi(how: String): DataFrame =
    fact.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("c"))
      .filter(col("s") >= 80 && col("c") >= 5)
      .join(keys, col("k") === col("pk"), how)

  private def planOf(df: DataFrame): String = df.queryExecution.optimizedPlan.toString

  /** The join sits below the aggregate iff the (outermost) Join node
    * prints after the Aggregate node in the tree dump.
    */
  private def joinBelowAgg(df: DataFrame): Boolean = {
    val p = planOf(df)
    p.indexOf("Join Left") > p.indexOf("Aggregate")
  }

  test("natural HAVING+semi form: the rule jumps the join below Filter AND Aggregate") {
    val df = naturalSemi("left_semi")
    assert(joinBelowAgg(df), s"semi stayed above the aggregate:\n${planOf(df)}")
    // results must equal the hand-pushed form (semi on the fact first)
    val hand = fact.join(keys, col("k") === col("pk"), "left_semi")
      .groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("c"))
      .filter(col("s") >= 80 && col("c") >= 5)
    assert(df.collect().toSet == hand.collect().toSet)
    assert(df.count() > 0, "fixture selects nothing — the test is vacuous")
  }

  test("anti variant commutes identically") {
    val df = naturalSemi("left_anti")
    assert(joinBelowAgg(df), s"anti stayed above the aggregate:\n${planOf(df)}")
    val hand = fact.join(keys, col("k") === col("pk"), "left_anti")
      .groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("c"))
      .filter(col("s") >= 80 && col("c") >= 5)
    assert(df.collect().toSet == hand.collect().toSet)
  }

  test("column-pruned Project between join and filter still rewrites") {
    val df = fact.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("c"))
      .filter(col("c") >= 5)
      .select("k", "s") // attribute-only projection over the filter
      .join(keys, col("k") === col("pk"), "left_semi")
    assert(joinBelowAgg(df), s"projected semi stayed above the aggregate:\n${planOf(df)}")
  }

  test("guard: a nondeterministic HAVING filter is NOT reordered") {
    val df = fact.groupBy("k").agg(sum("v").as("s"))
      .filter(col("s") + (rand(7) * 0).cast("long") >= 80) // nondeterministic predicate
      .join(keys, col("k") === col("pk"), "left_semi")
    assert(!joinBelowAgg(df),
      s"rule reordered a nondeterministic filter:\n${planOf(df)}")
  }

  test("guard: a join keyed on an aggregate OUTPUT (not a grouping key) is untouched") {
    val df = fact.groupBy("k").agg(sum("v").as("s"))
      .filter(col("s") >= 0)
      .join(Seq(80L, 90L).toDF("pk"), col("s") === col("pk"), "left_semi")
    assert(!joinBelowAgg(df),
      s"rule pushed a join conditioned on an aggregate result:\n${planOf(df)}")
  }

  test("r14: a grouping EXPRESSION key (groupBy(expr.as(k)) + semi on k) now pushes") {
    val df = fact.groupBy((col("k") % 4).as("kb"))
      .agg(sum("v").as("s"), count(lit(1)).as("c"))
      .filter(col("c") >= 5)
      .join(Seq(1L, 3L).toDF("pk"), col("kb") === col("pk"), "left_semi")
    assert(joinBelowAgg(df),
      s"expression-keyed semi stayed above the aggregate:\n${planOf(df)}")
    val hand = fact.filter(col("k") % 4 === 1 || col("k") % 4 === 3)
      .groupBy((col("k") % 4).as("kb"))
      .agg(sum("v").as("s"), count(lit(1)).as("c"))
      .filter(col("c") >= 5)
    assert(df.collect().toSet == hand.collect().toSet)
    assert(df.count() > 0, "fixture selects nothing — the test is vacuous")
  }

  test("guard: a nondeterministic grouping expression key is NOT pushed") {
    // The DataFrame route can't reach this guard: the analyzer's
    // PullOutNondeterministic materializes such keys into a Project, so
    // the Aggregate's key is a plain attribute (and the push is sound).
    // A hand-built raw plan with the nondeterministic expression still
    // in the Alias exercises the refusal.
    import org.apache.spark.sql.catalyst.expressions.{Add, Alias, AttributeReference, Cast, EqualTo, GreaterThanOrEqual, Literal, Rand}
    import org.apache.spark.sql.catalyst.expressions.aggregate.Sum
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, JoinHint, LocalRelation}
    import org.apache.spark.sql.types.LongType
    val k = AttributeReference("k", LongType)()
    val v = AttributeReference("v", LongType)()
    val pk = AttributeReference("pk", LongType)()
    val rel = LocalRelation(k, v)
    val key = Add(k, Cast(Rand(Literal(7)), LongType))
    val kbAlias = Alias(key, "kb")()
    val sAlias = Alias(Sum(v).toAggregateExpression(), "s")()
    val agg = Aggregate(Seq(key), Seq(kbAlias, sAlias), rel)
    val filtered = Filter(GreaterThanOrEqual(sAlias.toAttribute, Literal(0L)), agg)
    val joined = Join(filtered, LocalRelation(pk), LeftSemi,
      Some(EqualTo(kbAlias.toAttribute, pk)), JoinHint.NONE)
    val out = PushSemiThroughFilteredAggregate(joined)
    assert(out == joined,
      s"rule pushed a nondeterministic grouping key:\n$out")
  }

  test("guard: self-join exprId conflict refuses the push (ADVICE r13 #1)") {
    // Hand-built logical plan: the join's RIGHT side shares attribute `v`
    // (same ExprId) with the aggregate's child, so after a push the
    // condition's right-bound `v` would resolve ambiguously. DataFrame
    // self-joins get deduplicated exprIds by the analyzer; only a raw
    // plan exercises the conflict path.
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualTo, GreaterThanOrEqual, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.Sum
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, JoinHint, LocalRelation}
    import org.apache.spark.sql.types.LongType
    val k = AttributeReference("k", LongType)()
    val v = AttributeReference("v", LongType)()
    val pk = AttributeReference("pk", LongType)()
    val w = AttributeReference("w", LongType)()
    val rel = LocalRelation(k, v)
    val sAlias = Alias(Sum(v).toAggregateExpression(), "s")()
    val agg = Aggregate(Seq(k), Seq(k, sAlias), rel)
    val filtered = Filter(GreaterThanOrEqual(sAlias.toAttribute, Literal(0L)), agg)
    val rightRel = LocalRelation(pk, v) // v leaks the exprId
    val joined = Join(filtered, rightRel, LeftSemi, Some(EqualTo(k, v)), JoinHint.NONE)
    val out = PushSemiThroughFilteredAggregate(joined)
    assert(out == joined, s"rule pushed through an exprId conflict:\n$out")
    // sanity: the same shape with a conflict-free right side DOES push
    val cleanRight = LocalRelation(pk, w)
    val cleanJoin = Join(filtered, cleanRight, LeftSemi,
      Some(EqualTo(k, pk)), JoinHint.NONE)
    val pushed = PushSemiThroughFilteredAggregate(cleanJoin)
    assert(pushed != cleanJoin, "conflict-free control case failed to push")
  }

  test("TPC-H Q20 natural form plans like the hand-pushed q206 and matches its rows") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(sfDir).isDirectory)
    def t(n: String) = spark.read.parquet(s"$sfDir/$n.parquet")
    val pairs = t("lineitem")
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity").cast("long")).as("st"),
        sum(when(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1997-07-01"),
          col("l_quantity").cast("long")).otherwise(lit(0L))).as("sw"))
    val smallParts = t("part").filter(col("p_name").startsWith("small")).select("p_partkey")
    val natural = pairs
      .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"), "left_semi")
      .filter(col("sw") === 0 && col("st") >= 100)
      .select("l_suppkey")
    // the semi lands below the pair aggregate — the plan the hand-pushed
    // q206 builds explicitly (its 40x win: 11.2 -> 3.5 s, PLANS.md r12)
    val p = planOf(natural)
    assert(p.indexOf("Join LeftSemi") > p.indexOf("Aggregate"),
      s"natural Q20 semi stayed above the pair aggregate:\n$p")
    val hand = graft.SparkEntry.queries("q206_tpch_q20")(spark, sfDir)
    val naturalNames = t("supplier").select("s_suppkey", "s_name")
      .join(natural, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_name").orderBy("s_name")
    assert(naturalNames.collect().toSeq == hand.collect().toSeq)
  }
}
