package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Connected components (large-star/small-star) vs a driver-side
  * union-find oracle, plus the dedupClusters keep decision.
  */
class DedupClusterSpec extends SparkTestBase {
  import spark.implicits._

  /** brute-force union-find for the expected components */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.foreach { case (a, b) => union(a, b) }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(x => x -> find(x)).toMap
  }

  private def check(edges: Seq[(Long, Long)], parts: Int = 5): Unit = {
    val df = spark.createDataset(edges).toDF("a", "b").repartition(parts)
    val got = Dedup.connectedComponents(df, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exp = unionFind(edges.size, edges)
    assert(got == exp)
  }

  test("long chain collapses to one component (exercises multiple rounds)") {
    check((0L until 40L).map(i => (i, i + 1)))
  }

  test("disjoint cliques and isolated pairs") {
    val cliqueA = for (i <- 0L to 4L; j <- (i + 1) to 5L) yield (i, j)
    val cliqueB = for (i <- 10L to 13L; j <- (i + 1) to 14L) yield (i, j)
    check(cliqueA ++ cliqueB ++ Seq((100L, 101L), (200L, 201L)))
  }

  test("random graph matches union-find") {
    val rng = new scala.util.Random(7)
    val edges = Seq.fill(120)((rng.nextInt(60).toLong, rng.nextInt(60).toLong))
      .filter(e => e._1 != e._2)
    check(edges)
  }

  test("sparse 800-node random graph (many components) matches union-find") {
    val rng = new scala.util.Random(41)
    val edges = Seq.fill(500)((rng.nextInt(800).toLong, rng.nextInt(800).toLong))
      .filter(e => e._1 != e._2)
    check(edges, parts = 8)
  }

  test("self-loops and duplicate edges are harmless") {
    check(Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (3L, 4L)))
  }

  test("star already rooted at min converges immediately (zero contraction rounds)") {
    check(Seq((0L, 5L), (0L, 6L), (0L, 7L)))
    // the is-star probe must exit BEFORE the first contraction round —
    // this is the common LSH-pairs shape (2-3 node clusters)
    assert(Dedup.lastCcRounds.get() == 0)
  }

  test("forest of 2-node components exits in zero rounds") {
    check((0L until 20L by 2).map(i => (i, i + 1)))
    assert(Dedup.lastCcRounds.get() == 0)
  }

  test("is-star probe rejects a root that is a member elsewhere") {
    // (1,2),(2,3): node 2 is member of 1 AND root of 3 — NOT converged;
    // a naive "u-side/v-side disjoint per edge" check would miss this
    check(Seq((1L, 2L), (2L, 3L)))
    assert(Dedup.lastCcRounds.get() >= 1)
  }

  test("is-star probe rejects a member with two distinct roots") {
    check(Seq((1L, 3L), (2L, 3L)))
    assert(Dedup.lastCcRounds.get() >= 1)
  }

  test("refuses to return partially-contracted components at maxIter") {
    val chain = spark.createDataset((0L until 30L).map(i => (i, i + 1))).toDF("a", "b")
    intercept[IllegalStateException](
      Dedup.connectedComponents(chain, "a", "b", maxIter = 1).collect())
  }

  test("empty edge set: every doc keeps itself") {
    val docs = Seq(7L, 8L).toDF("doc_id")
    val pairs = spark.emptyDataset[(Long, Long)].toDF("id_a", "id_b")
    val out = Dedup.dedupClusters(docs, pairs, "doc_id", "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out == Set((7L, 7L, true), (8L, 8L, true)))
  }

  test("connectedComponents on a single edge") {
    check(Seq((5L, 3L)))
  }

  test("dedupClusters keeps the smallest id per cluster, singletons keep themselves") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 9L).toDF("doc_id")
    val pairs = Seq((2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val out = Dedup.dedupClusters(docs, pairs, "doc_id", "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out == Set(
      (1L, 1L, true), (2L, 2L, true), (3L, 2L, false), (4L, 2L, false),
      (5L, 5L, true), (9L, 9L, true)))
  }
}
