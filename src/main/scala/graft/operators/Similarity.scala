package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set,
  * one narrow pass over the corpus, per-query top-k.  Scale path: sign-LSH
  * (random hyperplanes) bucketing — an IVF-style candidate restriction
  * that turns the corpus scan into a bucket-local join.
  *
  * All vector math is expressed with Spark's higher-order functions
  * (`zip_with`/`aggregate`), which stay inside codegen — no Scala UDF in
  * the hot path.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in index order (deterministic double accumulation). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine = dot/(‖a‖·‖b‖), all in double. */
  def cosine(a: Column, b: Column): Column = {
    val ad = transform(a, _.cast("double"))
    val bd = transform(b, _.cast("double"))
    dot(ad, bd) / (norm(ad) * norm(bd))
  }

  import org.apache.spark.sql.graftx.VecColumns.{vecDot, vecNorm}

  /** Brute-force top-k cosine neighbors for each query vector.
    *
    * `queries` is expected to be small (it is broadcast); the corpus scan
    * is a single narrow pass and the only shuffle is the per-query top-k
    * (rows ≤ queries × corpus-partition count after partial filtering).
    * Norms are precomputed per side (O(n)); each of the O(n·q) pairs pays
    * one codegen'd [[org.apache.spark.sql.graftx.FloatVecDot]] loop.
    * Zero-norm rows are excluded on BOTH sides (cosine undefined — a
    * 0/0 = NaN sim would rank FIRST under desc ordering, since Spark
    * sorts NaN above every double); same rule in [[annTopK]]/[[ivfTopK]].
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      vecNorm(col(vecCol)).as("__qn")).filter(col("__qn") > 0))
    val scored = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
        vecNorm(col(vecCol)).as("__cn"))
      .filter(col("__cn") > 0)
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", vecDot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rk").cast("int").as("rk"))
  }

  /** Recall@k of an approximate top-k result against the exact one: both
    * inputs are (query_id, neighbor_id, ...) frames as produced by
    * [[bruteForceTopK]] / [[annTopK]] / [[ivfTopK]] / [[pqTopK]]. Returns
    * (query_id, hits, truth_n, recall) per query — the evaluation harness
    * every ANN deployment needs before trusting a bucketing config (the
    * reference ships no counterpart; recall tuning there is ad hoc). One
    * semi-join-shaped inner join on (query, neighbor) + one aggregate;
    * broadcast-eligible when the query set is small.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    val a = approx.select(col("query_id"), col("neighbor_id")).distinct()
    val t = exact.select(col("query_id"), col("neighbor_id")).distinct()
    val truth = t.groupBy("query_id").agg(count(lit(1)).as("truth_n"))
    val hits = t.join(a, Seq("query_id", "neighbor_id"))
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    truth.join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        col("truth_n"),
        (coalesce(col("hits"), lit(0L)).cast("double") / col("truth_n")).as("recall"))
  }

  private val bucketUdf = udf((v: Seq[Float], planes: Int) =>
    Hashing.signBucket(v.toArray, planes))

  /** Sign-LSH bucket assignment: `planes`-bit bucket key per vector.
    * Deterministic hyperplanes are derived from (plane, dim) hashes — no
    * broadcast state, reproducible on any executor.
    */
  def lshBuckets(vectors: DataFrame, idCol: String, vecCol: String,
                 planes: Int = 12): DataFrame =
    vectors.select(col(idCol), bucketUdf(col(vecCol), lit(planes)).as("bucket"))

  /** (representative frame with norms, member mapping) shared by the
    * exact and bucketed near-dup tiers: byte-identical vectors collapse to
    * one representative; zero-norm groups (cosine undefined) are excluded
    * from the pair space entirely.
    */
  private def collapseVectors(vectors: DataFrame, idCol: String, vecCol: String)
      : (DataFrame, DataFrame) = {
    val grp = vectors.groupBy(col(vecCol).as("__v"))
      .agg(min(col(idCol)).as("__rep"), collect_list(col(idCol)).as("__ids"))
      .withColumn("__n", vecNorm(col("__v")))
    // carry the group norm onto members so degenerate (zero-norm) groups —
    // whose cosine is undefined — can be excluded from same-group pairs
    val members = grp.select(col("__rep"), explode(col("__ids")).as("__m"), col("__n"))
    (grp.select(col("__rep"), col("__v"), col("__n")).filter(col("__n") > 0), members)
  }

  /** Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥
    * threshold) — the embedding leg of the dedup suite (SURVEY §7.2 M5).
    *
    * Byte-identical vectors are collapsed FIRST (group on the vector
    * value): the quadratic all-pairs verification runs on one
    * representative per distinct vector, and duplicate-group pairs
    * (cosine exactly 1) plus cross-group member pairs are expanded
    * afterward — output unchanged, but the corpus duplication factor
    * drops out of the O(n²) core.
    *
    * EXACT all-pairs baseline: O(reps²) by construction, so it refuses
    * to run past `maxExactVectors` distinct vectors or
    * `maxBroadcastBytes` of broadcast payload — at corpus scale use
    * [[bucketedNearDupPairs]], which blocks the pair space on sign-LSH
    * bucket keys instead of broadcasting the whole distinct-vector side.
    */
  def exactNearDupPairs(vectors: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, maxExactVectors: Long = 2000000L,
                        maxBroadcastBytes: Long = 1L << 30): DataFrame = {
    require(threshold <= 1.0, s"cosine threshold must be <= 1, got $threshold")
    val (prepped, members) = collapseVectors(vectors, idCol, vecCol)
    // ONE fused guard job: count + the LARGEST dim (jagged inputs must not
    // underestimate the broadcast payload). No persist: the pair-join
    // query below consumes prepped twice but shares the collapse exchange
    // via ReuseExchange within its single plan, so the guard is the only
    // extra pass — bounded by contract, and nothing is left pinned in the
    // block manager for the session's lifetime.
    val guard = prepped.agg(count(lit(1)).as("n"),
      coalesce(max(size(col("__v"))), lit(0)).as("dim")).first()
    val nReps = guard.getLong(0)
    val dim = guard.getInt(1)
    require(nReps <= maxExactVectors,
      s"exactNearDupPairs is the all-pairs oracle baseline ($nReps distinct vectors > " +
        s"$maxExactVectors); use bucketedNearDupPairs at corpus scale")
    // the row-count guard alone does not bound broadcast BYTES — size it:
    // ~4 bytes per float element + per-row overhead
    val estBytes = nReps * (dim.toLong * 4 + 32)
    require(estBytes <= maxBroadcastBytes,
      s"exactNearDupPairs would broadcast ~$estBytes bytes of distinct vectors " +
        s"($nReps x $dim dims) > $maxBroadcastBytes; use bucketedNearDupPairs")
    // norms are an O(n) pre-pass; each of the O(reps²) pairs then pays
    // exactly one codegen'd primitive dot loop (FloatVecDot)
    val a = prepped.select(col("__rep").as("id_a"), col("__v").as("__va"), col("__n").as("__na"))
    val b = prepped.select(col("__rep").as("id_b"), col("__v").as("__vb"), col("__n").as("__nb"))
    val repPairs = a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("sim", vecDot(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))

    // cosine of byte-identical non-degenerate vectors: exactly 1 up to ulp
    Dedup.expandPairs(repPairs, members, "id_a", "id_b", "sim", lit(1.0),
      sameFilter = col("__n") > 0)
  }

  /** Corpus-scale embedding near-dup pairs: the pair space is BLOCKED on
    * sign-LSH bucket keys — side A probes its own bucket plus every
    * 1-bit-flipped bucket (multi-probe), so candidate pairs are exactly
    * those whose bucket keys differ in ≤ 1 plane sign, found by a plain
    * shuffle equi-join on the probe key.  No broadcast of the corpus, no
    * O(reps²) enumeration: shuffle ∝ reps × (planes+1), candidates are
    * bucket-local.  Candidates are then verified with the same exact
    * codegen'd cosine as the baseline, and exact-dup members expanded
    * back, so the output is a deterministic pure function of the input
    * (oracle-checkable) — recall relative to the all-pairs baseline is
    * the usual LSH trade, tuned by `planes` (with planes = 1 the probe
    * set covers both buckets and the output equals the exact baseline).
    */
  def bucketedNearDupPairs(vectors: DataFrame, idCol: String, vecCol: String,
                           threshold: Double, planes: Int = 8): DataFrame = {
    require(threshold <= 1.0, s"cosine threshold must be <= 1, got $threshold")
    require(planes >= 1 && planes <= 62, s"planes must be in [1, 62], got $planes")
    val (prepped, members) = collapseVectors(vectors, idCol, vecCol)
    val bucketed = prepped.withColumn("__bkt", bucketUdf(col("__v"), lit(planes)))
    val a = bucketed.select(col("__rep").as("id_a"), col("__v").as("__va"),
        col("__n").as("__na"),
        explode(array((col("__bkt") +:
          (0 until planes).map(p => col("__bkt").bitwiseXOR(lit(1L << p)))): _*))
          .as("__probe"))
    val b = bucketed.select(col("__rep").as("id_b"), col("__v").as("__vb"),
      col("__n").as("__nb"), col("__bkt").as("__probe"))
    val repPairs = a.join(b, Seq("__probe"))
      .filter(col("id_a") < col("id_b"))
      // a distance-0 pair meets on every shared probe — dedup BEFORE the
      // cosine so each candidate pays the dot product exactly once
      .select(col("id_a"), col("id_b"), col("__va"), col("__vb"), col("__na"), col("__nb"))
      .distinct()
      .withColumn("sim", vecDot(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
    Dedup.expandPairs(repPairs, members, "id_a", "id_b", "sim", lit(1.0),
      sameFilter = col("__n") > 0)
  }

  /** IVF (inverted-file) ANN: assign every corpus vector to its nearest
    * centroid ("cell") in ONE narrow pass (centroids ride inside the
    * assignment function — the coarse codebook is small by construction,
    * exactly how IVF coarse quantizers ship), probe only the `nProbe`
    * nearest cells per query, exact cosine re-rank inside the probed
    * cells.  The only wide operation is the per-query top-k over the
    * probed candidates — candidate count is cell-local, never O(corpus).
    *
    * `centroids` stands in for a trained k-means codebook; any small
    * deterministic vector set works (the fixture query uses the first
    * corpus vectors), and the plumbing — assignment pass, inverted cell
    * join, probe restriction — is independent of how centroids were fit.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
              idCol: String, vecCol: String, k: Int, nProbe: Int = 2,
              maxCodebook: Int = 65536): DataFrame = {
    // The coarse codebook is driver-sized by contract (k ≈ √n cells at
    // scale); enforce it instead of letting an oversized centroid frame
    // OOM the driver — limit(max+1) bounds what the guard itself pulls.
    val rows = centroids.select(col(idCol).cast("long"), col(vecCol))
      .limit(maxCodebook + 1)
      .collect()
    require(rows.length <= maxCodebook,
      s"IVF centroid codebook exceeds maxCodebook=$maxCodebook entries; " +
        "coarse codebooks must stay driver-sized (k ≈ sqrt(corpus))")
    val cents: Array[(Long, Array[Double])] =
      rows.map(r => (r.getLong(0),
          r.getSeq[Float](1).iterator.map(_.toDouble).toArray))
        .sortBy(_._1)

    def cosTo(v: Seq[Float], c: Array[Double]): Double = {
      var dot = 0.0; var nv = 0.0; var nc = 0.0
      var i = 0
      while (i < c.length) {
        val x = v(i).toDouble
        dot += x * c(i); nv += x * x; nc += c(i) * c(i)
        i += 1
      }
      dot / (math.sqrt(nv) * math.sqrt(nc))
    }
    // ties break toward the smallest centroid id (cents is id-sorted and
    // `>` keeps the first maximum)
    val cellsOf = (v: Seq[Float], n: Int) =>
      cents.map { case (id, c) => (id, cosTo(v, c)) }
        .sortBy { case (id, s) => (-s, id) }
        .take(n).map(_._1)
    // corpus-side assignment is the ONE narrow pass over the whole
    // corpus: a plain O(k) argmax scan, no tuple array / sort per row
    // (same tie rule: strict > keeps the first = smallest centroid id)
    val assignUdf = udf((v: Seq[Float]) => {
      var best = cents(0)._1; var bestS = Double.NegativeInfinity
      var ci = 0
      while (ci < cents.length) {
        val s = cosTo(v, cents(ci)._2)
        if (s > bestS) { bestS = s; best = cents(ci)._1 }
        ci += 1
      }
      best
    })
    // query-side multi-probe (tiny, broadcast side) keeps the sort form
    val probeUdf = udf((v: Seq[Float], n: Int) => cellsOf(v, n))

    val assigned = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      vecNorm(col(vecCol)).as("__cn"), assignUdf(col(vecCol)).as("cell"))
      .filter(col("__cn") > 0) // zero-norm: cosine undefined, NaN would rank first
    val probes = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      vecNorm(col(vecCol)).as("__qn"),
      explode(probeUdf(col(vecCol), lit(nProbe))).as("cell")).filter(col("__qn") > 0))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    assigned.join(probes, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", vecDot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rk").cast("int").as("rk"))
  }

  /** Distributed Lloyd's k-means over an embedding column — trains the
    * coarse codebook [[ivfTopK]] consumes (reference concept: IVF coarse
    * quantizer training; dask analog would be `da.linalg`-style iterated
    * blockwise reductions).
    *
    * Scale shape: per iteration, ONE narrow assignment pass (centroids
    * ride in a broadcast, k·dim doubles) and one partial→final aggregate
    * over (cell, dim) — k·dim rows cross the shuffle, never the corpus.
    * The only driver traffic per iteration is the k·dim updated centroid
    * matrix, which is driver-sized by the same contract as the IVF
    * codebook (k ≈ √corpus).
    *
    * Determinism contract (what makes this oracle-checkable): init = the
    * k lowest-id vectors, cells numbered in that id order; assignment by
    * squared L2 with ties to the smallest cell; updated centroid
    * components are rounded half-up to 1e-6 so distributed summation
    * order cannot leak into the next iteration's assignments.
    *
    * Returns one row per cell: (cell, n, c0, c1) — member count and the
    * first two centroid components (enough to pin the whole fit, since
    * any divergence propagates through the final assignment counts).
    */
  /** The Lloyd assignment UDF: nearest centroid by squared L2, smallest
    * cell on ties (strict `<`) — shared by [[kmeans]] and
    * [[semanticDedup]].
    */
  private def cellAssigner(spark: org.apache.spark.sql.SparkSession,
                           c: Array[Array[Double]]) = {
    val bc = spark.sparkContext.broadcast(c)
    udf((v: Seq[Float]) => {
      val cs = bc.value
      var best = 0; var bestD = Double.MaxValue
      var ci = 0
      while (ci < cs.length) {
        val ce = cs(ci); var d = 0.0; var i = 0
        while (i < ce.length) { val t = v(i) - ce(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = ci } // strict < keeps smallest cell on ties
        ci += 1
      }
      best
    })
  }

  /** Rounded Lloyd training (k lowest-id seeds, centroid means rounded
    * half-up to 1e-6 per update for engine-independence): the centroid
    * array [[kmeans]] summarizes and [[semanticDedup]] clusters with.
    */
  private def lloydTrain(corpus: DataFrame, idCol: String, vecCol: String,
                         k: Int, iters: Int): Array[Array[Double]] = {
    val spark = corpus.sparkSession
    val init = corpus.select(col(idCol).cast("long"), col(vecCol))
      .orderBy(col(idCol).cast("long")).limit(k).collect()
    require(init.length == k, s"corpus has fewer than k=$k vectors")
    var cents: Array[Array[Double]] =
      init.map(_.getSeq[Float](1).iterator.map(_.toDouble).toArray)
    for (_ <- 1 to iters) {
      val assigned = corpus.select(cellAssigner(spark, cents)(col(vecCol)).as("cell"),
        col(vecCol).as("__v"))
      val updated = assigned
        .select(col("cell"), posexplode(col("__v")).as(Seq("dim", "x")))
        .groupBy("cell", "dim")
        .agg(avg(col("x").cast("double")).as("m"))
        .collect()
      val next = cents.map(_.clone()) // empty cells keep their centroid
      updated.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = math.floor(r.getDouble(2) * 1e6 + 0.5) / 1e6
      }
      cents = next
    }
    cents
  }

  def kmeans(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
             iters: Int = 2, maxCodebook: Int = 65536): DataFrame = {
    require(k >= 1 && k <= maxCodebook, s"k must be in [1, $maxCodebook]")
    val spark = corpus.sparkSession
    val cents = lloydTrain(corpus, idCol, vecCol, k, iters)
    def assigner(c: Array[Array[Double]]) = cellAssigner(spark, c)

    // return contract reports the first two centroid components; pad a
    // 1-dim space with 0.0 rather than crashing on c(1)
    val centFrame = spark.createDataFrame(
      spark.sparkContext.parallelize(cents.zipWithIndex.toIndexedSeq.map { case (c, i) =>
        org.apache.spark.sql.Row(i, c(0), if (c.length > 1) c(1) else 0.0)
      }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cell", org.apache.spark.sql.types.IntegerType, false),
        org.apache.spark.sql.types.StructField("c0", org.apache.spark.sql.types.DoubleType, false),
        org.apache.spark.sql.types.StructField("c1", org.apache.spark.sql.types.DoubleType, false))))
    corpus.select(assigner(cents)(col(vecCol)).as("cell"))
      .groupBy("cell").agg(count(lit(1)).as("n"))
      .join(broadcast(centFrame), Seq("cell"), "right")
      .select(col("cell"), coalesce(col("n"), lit(0L)).as("n"), col("c0"), col("c1"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication of an embedding corpus. Coarse k-means clustering
    * (the rounded Lloyd of [[kmeans]], so cluster assignment is
    * engine-replicable), then EXACT pairwise cosine *within each
    * cluster only*; a vector is dropped when a same-cluster mate with a
    * smaller id sits at cosine ≥ `tau` (keep-lowest-id, the paper's
    * "keep one per semantic duplicate group" rule made deterministic).
    *
    * Scale shape: the pair join is keyed by cluster cell — the corpus
    * never self-joins globally. Cluster population is ~n/k, so pair work
    * is n²/k; k is the knob the paper also turns (their 50k clusters on
    * LAION). Zero-norm vectors have no cosine and are always kept.
    *
    * Degenerate-cell guard (`maxCellSize`, the [[Dedup.lshCandidates]]
    * maxBucketSize idea): a Lloyd cell whose DISTINCT-representative
    * population exceeds the bound is split into ceil(pop/maxCellSize)
    * hash-derived sub-cells before the pairwise join, so a pathological
    * embedding distribution (all vectors in one cell) still produces
    * bounded per-task pair counts instead of one n² task. Within-sub-cell
    * comparison is the documented approximation for oversized cells —
    * exact duplicates are unaffected (they collapse to one representative
    * BEFORE splitting), and normal corpora (pop ≤ maxCellSize everywhere)
    * are byte-identical to the uncapped rule.
    *
    * Returns the SURVIVORS: (id, cell).
    */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
                    k: Int, iters: Int = 2, tau: Double = 0.95,
                    maxCellSize: Int = 100000): DataFrame =
    semanticDedupCore(corpus, idCol, vecCol, k, iters, tau, maxCellSize)._1

  /** Cell-cap accounting for one [[semanticDedup]] run (the no-silent-caps
    * contract): how many Lloyd cells were split by `maxCellSize`, and the
    * exact fraction of within-cell candidate pairs the split skipped
    * (pairs straddling two hash sub-cells of a split cell are never
    * compared — the documented bounded-work tradeoff). Pair counts are
    * over DISTINCT representatives, the population the join actually sees.
    */
  final case class SemDedupStats(cells: Long, splitCells: Long,
                                 withinCellPairs: Long, comparedPairs: Long) {
    def skippedPairFraction: Double =
      if (withinCellPairs == 0L) 0.0
      else 1.0 - comparedPairs.toDouble / withinCellPairs.toDouble
  }

  /** [[semanticDedup]] plus its [[SemDedupStats]]: one extra bounded
    * aggregate (O(#cells + #sub-cells) rows, never row data) over the
    * sub-celled representatives, logged when any cell was split. Use this
    * form when the corpus may be pathological (tight embedding mass in few
    * cells) and the skipped-pair fraction needs to be observable instead
    * of silent.
    */
  def semanticDedupWithStats(corpus: DataFrame, idCol: String, vecCol: String,
                             k: Int, iters: Int = 2, tau: Double = 0.95,
                             maxCellSize: Int = 100000): (DataFrame, SemDedupStats) = {
    val (out, subbed) =
      semanticDedupCore(corpus, idCol, vecCol, k, iters, tau, maxCellSize)
    // `div` keeps the pair counts in exact long arithmetic (Spark's `/` is
    // double division, which loses precision past 2^53 pairs)
    val perCell = subbed.groupBy(col("cell"), col("__sub"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("cell"))
      .agg(sum(col("n")).as("pop"),
        sum(expr("n * (n - 1) div 2")).as("compared"))
    val r = perCell.agg(
      count(lit(1)).as("cells"),
      sum(when(col("pop") > maxCellSize, 1L).otherwise(0L)).as("split"),
      sum(expr("pop * (pop - 1) div 2")).as("pairs"),
      sum(col("compared")).as("compared")).collect()(0)
    def l(i: Int): Long = if (r.isNullAt(i)) 0L else r.getLong(i)
    val stats = SemDedupStats(l(0), l(1), l(2), l(3))
    if (stats.splitCells > 0)
      org.slf4j.LoggerFactory.getLogger("graft.Similarity").warn(
        s"semanticDedup: ${stats.splitCells}/${stats.cells} cells exceeded " +
          s"maxCellSize=$maxCellSize and were hash-split; " +
          f"${stats.skippedPairFraction * 100}%.2f%% of within-cell pairs " +
          "were not compared (bounded-work tradeoff)")
    graft.diagnostics.Diagnostics.Counters.lastSemDedupStats.set(Some(stats))
    (out, stats)
  }

  private def semanticDedupCore(corpus: DataFrame, idCol: String, vecCol: String,
                                k: Int, iters: Int, tau: Double,
                                maxCellSize: Int): (DataFrame, DataFrame) = {
    require(maxCellSize >= 1, s"maxCellSize must be >= 1, got $maxCellSize")
    val spark = corpus.sparkSession
    val cents = lloydTrain(corpus, idCol, vecCol, k, iters)
    val assigned = corpus.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("__v"),
      cellAssigner(spark, cents)(col(vecCol)).as("cell"),
      vecNorm(col(vecCol)).as("__n"))
    // COLLAPSE-EXACT-FIRST (the q61/q103 lesson applied to SemDeDup): the
    // quadratic within-cluster join runs on one representative per
    // DISTINCT vector, never on replicas. This is semantics-preserving,
    // not an approximation: an identical pair has cosine exactly 1 >= tau,
    // so every non-minimal replica is dropped by its own group's min-id
    // mate, and a representative survives iff no distinct cluster-mate
    // with a smaller MIN replica id clears tau — precisely the original
    // "exists a smaller-id cluster-mate above threshold" rule. Identical
    // vectors always share a cell (assignment is a pure function of the
    // vector), so collapsing cannot split a group across cells. Pair
    // space becomes (#distinct)^2/k regardless of how many times a crawl
    // replicates a document — the axis a real corpus actually grows on.
    // Participation filter: comparable rows need a positive FINITE norm.
    // Spark orders NaN LARGER than any numeric (unlike IEEE), so a bare
    // `__n > 0` would let a NaN-norm row into the pair join where its NaN
    // cosine compares >= tau and wrongly drops it — exclude NaN explicitly.
    val participating = assigned.filter(col("__n") > 0 && !isnan(col("__n")))
    val groups = participating
      .groupBy(col("__v"))
      .agg(min(col("id")).as("id"), min(col("cell")).as("cell"),
        min(col("__n")).as("__n"))
    // Oversized-cell split: cellPop has <= k rows (broadcast-cheap); a cell
    // over the bound gets a deterministic sub-cell key from the vector hash
    // so the pair join's per-task work stays bounded.
    val cellPop = groups.groupBy(col("cell")).agg(count(lit(1)).as("__pop"))
    val nSub = when(col("__pop") > maxCellSize,
      ceil(col("__pop").cast("double") / maxCellSize).cast("int")).otherwise(lit(1))
    val subbed = groups.join(broadcast(cellPop), Seq("cell"))
      .withColumn("__sub", pmod(hash(col("__v")), nSub).cast("int"))
    val a = subbed.select(col("id"), col("cell"), col("__sub"), col("__v"), col("__n"))
    val b = a.select(col("id").as("id_b"), col("cell"), col("__sub"),
      col("__v").as("__vb"), col("__n").as("__nb"))
    // dropped representative = has a smaller-min-id distinct cluster-mate
    // above the threshold.
    // Tau-boundary note (documented semantics): exact duplicates are ALWAYS
    // collapsed to their min-id representative, even at tau = 1.0 where a
    // floating-point cosine dot(v,v)/(norm*norm) could round to 0.999...;
    // "identical vectors are semantic duplicates at any threshold" is the
    // paper's intent and the behavior we commit to.
    val droppedRep = a.join(b, Seq("cell", "__sub"))
      .filter(col("id_b") < col("id"))
      .filter(vecDot(col("__v"), col("__vb")) / (col("__n") * col("__nb")) >= tau)
      .select(col("id")).distinct()
    val keptRep = a.select(col("id"))
      .join(droppedRep, Seq("id"), "left_anti")
    // Keep-by-default for non-comparable rows: whatever the participation
    // filter rejected (zero / NaN / null norms — Spark's NaN ordering
    // differs from IEEE, so we complement the SAME filter via left_anti
    // rather than risk a second predicate disagreeing with it) keeps its
    // original fate. Everything comparable survives only as a surviving
    // representative (non-minimal exact replicas collapse to min id).
    val out = participating.join(keptRep, Seq("id")).select(col("id"), col("cell"))
      .unionByName(assigned.join(participating.select(col("id")), Seq("id"), "left_anti")
        .select(col("id"), col("cell")))
    (out, subbed)
  }

  /** Bucketed ANN: candidates restricted to the query's bucket, then exact
    * cosine rank within the bucket — the IVF pattern (coarse quantize →
    * exact re-rank).  Recall is tunable by `planes` (fewer planes → bigger
    * buckets → higher recall, more compute).  Zero-norm rows excluded as
    * in [[bruteForceTopK]].
    */
  def annTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, planes: Int = 8): DataFrame = {
    val cb = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      vecNorm(col(vecCol)).as("__cn"),
      bucketUdf(col(vecCol), lit(planes)).as("bucket"))
      .filter(col("__cn") > 0)
    val qb = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      vecNorm(col(vecCol)).as("__qn"),
      bucketUdf(col(vecCol), lit(planes)).as("bucket")).filter(col("__qn") > 0))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    cb.join(qb, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", vecDot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rk").cast("int").as("rk"))
  }

  // ---- Product quantization: the compressed-ANN path at corpus scale ----

  /** Per-subspace PQ codebooks (FAISS-style IVF-PQ decomposition; the
    * reference has no PQ — this extends the similarity tier the same way
    * [[ivfTopK]] does).
    *
    * The D-dim space splits into `numSub` contiguous subspaces of D/numSub
    * dims; each gets a k-way codebook trained by the same rounded Lloyd
    * iterations as [[kmeans]] — but all subspaces train in ONE pass per
    * iteration: assignment is a narrow map (full codebook broadcast,
    * numSub·k·(D/numSub) = k·D doubles), the update one partial→final
    * aggregate keyed (subspace, code, dim) with k·D rows crossing the
    * shuffle — never the corpus. Centroid components are rounded half-up
    * to 1e-6 per update (kmeans' determinism trick), so the fit is
    * engine-independent and the `iters = 0` seeded form (subslices of the
    * k lowest-id vectors) is bit-replicable in the DuckDB oracle (q133).
    *
    * Returns (m, code, cent: array<double>).
    */
  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String,
              numSub: Int, k: Int, iters: Int = 2): DataFrame = {
    require(numSub >= 1 && k >= 1 && k <= 256, s"bad PQ spec numSub=$numSub k=$k")
    val spark = corpus.sparkSession
    val init = corpus.select(col(idCol).cast("long"), col(vecCol))
      .orderBy(col(idCol).cast("long")).limit(k).collect()
    require(init.length == k, s"corpus has fewer than k=$k vectors")
    val dim = init(0).getSeq[Float](1).length
    require(dim % numSub == 0, s"dim=$dim not divisible by numSub=$numSub")
    val sub = dim / numSub

    var cents: Array[Array[Array[Double]]] = Array.tabulate(numSub, k) { (mi, ci) =>
      init(ci).getSeq[Float](1).slice(mi * sub, (mi + 1) * sub).map(_.toDouble).toArray
    }

    for (_ <- 1 to iters) {
      val assigned = corpus.select(
        posexplode(pqAssigner(spark, cents)(col(vecCol))).as(Seq("m", "code")),
        col(vecCol).as("__v"))
      val updated = assigned
        .select(col("m"), col("code"),
          posexplode(slice(col("__v"), col("m") * sub + 1, lit(sub))).as(Seq("dim", "x")))
        .groupBy("m", "code", "dim")
        .agg(avg(col("x").cast("double")).as("mu"))
        .collect() // ≤ k·D rows — the codebook, not the corpus
      val next = cents.map(_.map(_.clone()))
      updated.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
          math.floor(r.getDouble(3) * 1e6 + 0.5) / 1e6
      }
      cents = next
    }

    val rows = for { mi <- 0 until numSub; ci <- 0 until k }
      yield org.apache.spark.sql.Row(mi, ci, cents(mi)(ci).toSeq)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("m", org.apache.spark.sql.types.IntegerType, false),
        org.apache.spark.sql.types.StructField("code", org.apache.spark.sql.types.IntegerType, false),
        org.apache.spark.sql.types.StructField("cent",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType, false), false))))
  }

  // argmin sub-centroid per subspace; strict < keeps the lowest code on
  // ties, matching `row_number() OVER (ORDER BY d, code)` in the oracle.
  private def pqAssigner(spark: org.apache.spark.sql.SparkSession,
                         cents: Array[Array[Array[Double]]]) = {
    val bc = spark.sparkContext.broadcast(cents)
    udf((v: Seq[Float]) => {
      val cs = bc.value
      val sub = cs(0)(0).length
      val out = new Array[Int](cs.length)
      var mi = 0
      while (mi < cs.length) {
        val cb = cs(mi); var best = 0; var bestD = Double.MaxValue
        var ci = 0
        while (ci < cb.length) {
          val ce = cb(ci); var d = 0.0; var i = 0
          while (i < ce.length) { val t = v(mi * sub + i) - ce(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = ci }
          ci += 1
        }
        out(mi) = best; mi += 1
      }
      out
    })
  }

  /** Encode each vector as its per-subspace nearest-code array — a narrow
    * map with the codebook broadcast; 100 TB of float vectors become
    * numSub small ints per row (the compression that makes billion-scale
    * ANN storage feasible).
    */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
               codebooks: DataFrame, maxCodebook: Int = 65536): DataFrame = {
    val spark = corpus.sparkSession
    val rows = codebooks.select(col("m"), col("code"), col("cent")).limit(maxCodebook + 1).collect()
    require(rows.length <= maxCodebook,
      s"PQ codebook exceeds maxCodebook=$maxCodebook entries")
    val numSub = rows.iterator.map(_.getInt(0)).max + 1
    val k = rows.iterator.map(_.getInt(1)).max + 1
    val cents = Array.ofDim[Array[Double]](numSub, k)
    rows.foreach { r => cents(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray }
    corpus.select(col(idCol), pqAssigner(spark, cents)(col(vecCol)).as("codes"))
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes.
    *
    * The per-query lookup table — squared L2 from the query's subvector
    * to every (subspace, code) centroid — is built with builtin array
    * functions over the (small) queries × codebooks cross join, then
    * broadcast; each corpus row is scored by numSub `element_at` lookups
    * folded in subspace order (`zip_with` + `aggregate`, fully codegen'd —
    * no per-row float-vector reads, no UDF in the hot path). Top-k per
    * query is a keyed window, ties broken by neighbor id.
    */
  def pqTopK(encoded: DataFrame, queries: DataFrame, codebooks: DataFrame,
             idCol: String, vecCol: String, k: Int): DataFrame = {
    val qd = queries.select(col(idCol).as("query_id"),
      transform(col(vecCol), _.cast("double")).as("__qv"))
    val dists = qd.crossJoin(broadcast(codebooks))
      .select(col("query_id"), col("m"), col("code"),
        aggregate(
          zip_with(
            slice(col("__qv"), col("m") * size(col("cent")) + 1, size(col("cent"))),
            col("cent"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x).as("d"))
    val lutPerM = dists.groupBy("query_id", "m")
      .agg(transform(array_sort(collect_list(struct(col("code"), col("d")))),
        s => s.getField("d")).as("row"))
    val lut = lutPerM.groupBy("query_id")
      .agg(transform(array_sort(collect_list(struct(col("m"), col("row")))),
        s => s.getField("row")).as("__lut"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").asc, col("neighbor_id").asc)
    encoded.select(col(idCol).as("neighbor_id"), col("codes"))
      .crossJoin(broadcast(lut))
      // self-match exclusion, consistent with the other top-k paths
      // (a query drawn from the corpus has ADC distance ~0 to itself)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", aggregate(
        zip_with(col("codes"), col("__lut"), (c, l) => element_at(l, c + 1)),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("score"), col("rk").cast("int").as("rk"))
  }
}
