package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operator family for large-scale training-data pipelines.
  *
  * Four tiers, all shuffle-frugal and cluster-scale by construction:
  *
  *  1. exact       — hash-groupBy on a canonicalized text key (one
  *                   partial→final aggregate; AQE handles skew)
  *  2. MinHash-LSH — per-doc signature UDF (narrow) → band explode →
  *                   self-join on band key (shuffle proportional to
  *                   docs×bands, not docs²) → exact-Jaccard verify on the
  *                   candidate pairs only
  *  3. SimHash     — per-doc 64-bit fingerprint (narrow) → pigeonhole
  *                   chunk join for hamming-distance candidates → popcount
  *                   verify
  *  4. embedding   — sign-LSH bucketing of vectors; see [[Similarity]]
  *
  * The per-bucket pair expansion is capped (`maxBucketSize`) so a
  * degenerate bucket (boilerplate docs) cannot produce O(n²) pairs — the
  * standard guard in web-scale dedup pipelines.
  */
object Dedup {

  private val ccLog = org.slf4j.LoggerFactory.getLogger("graft.Dedup")

  /** Contraction-round count of the most recent [[connectedComponents]]
    * call (0 = input was already star-shaped).  Audit/test hook — the CC
    * round count is the latency driver of the dedup-clusters pipeline, so
    * it is observable rather than buried.
    */
  val lastCcRounds = new java.util.concurrent.atomic.AtomicInteger(-1)

  /** Canonical key for order-insensitive exact dedup: sorted word
    * multiset.  `exact=true` keeps byte-exact text instead.
    */
  def canonicalKey(text: Column, exact: Boolean): Column =
    if (exact) md5(text)
    else md5(concat_ws(" ",
      array_sort(filter(split(text, "\\s+"), x => length(x) > 0))))

  /** Exact dedup: keep the lowest-id doc per canonical key. */
  def exact(docs: DataFrame, idCol: String, textCol: String,
            byteExact: Boolean = false): DataFrame = {
    docs
      .groupBy(canonicalKey(col(textCol), byteExact).as("dup_key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("group_size"))
  }

  private val sigUdf = udf((text: String, shingleSize: Int, numHashes: Int) =>
    Hashing.minhashSignature(text, shingleSize, numHashes))
  private val bandsUdf = udf((sig: Seq[Long], bands: Int, rows: Int) =>
    Hashing.bandKeys(sig.toArray, bands, rows))
  private val jaccardUdf = udf((a: String, b: String, n: Int) => Hashing.ngramJaccard(a, b, n))
  private val simhashUdf = udf((text: String) => Hashing.simhash64(text))
  private val fingerprintUdf = udf((text: String) => Hashing.winnowFingerprint(text))

  /** Per-doc MinHash signatures (numHashes = bands × rowsPerBand). */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        shingleSize: Int = 3, numHashes: Int = 32): DataFrame =
    docs.select(col(idCol),
      sigUdf(col(textCol), lit(shingleSize), lit(numHashes)).as("minhash_sig"))

  /** LSH candidate pairs: docs sharing ≥1 band bucket. */
  def lshCandidates(docs: DataFrame, idCol: String, textCol: String,
                    shingleSize: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
                    maxBucketSize: Int = 1000): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, textCol, shingleSize, bands * rowsPerBand)
    val banded = sigs.select(col(idCol),
      posexplode(bandsUdf(col("minhash_sig"), lit(bands), lit(rowsPerBand)))
        .as(Seq("band_idx", "band_key")))
    // bucket join: group then pair within bucket (capped), cheaper than a
    // raw self-join when buckets are small and safe when they aren't
    banded
      .groupBy(col("band_idx"), col("band_key"))
      .agg(slice(array_sort(collect_list(col(idCol))), 1, maxBucketSize).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        "flatten(transform(ids, (x, i) -> transform(slice(ids, i + 2, size(ids)), y -> struct(x as doc1, y as doc2))))"))
        .as("pair"))
      .select(col("pair.doc1"), col("pair.doc2"))
      .distinct()
  }

  /** Collapse byte-identical texts: returns (one-representative-per-text
    * frame with the caller's column names, member mapping __rep → __m).
    * Identical texts have identical signatures/hashes under every tier, so
    * running the candidate machinery on representatives and expanding
    * member pairs afterwards leaves the output unchanged while the corpus
    * duplication factor drops out of the pair space.
    */
  private def collapseTexts(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame) = {
    val grp = docs.groupBy(col(textCol).as("__text"))
      .agg(min(col(idCol)).as("__rep"), collect_list(col(idCol)).as("__ids"))
    (grp.select(col("__rep").as(idCol), col("__text").as(textCol)),
      grp.select(col("__rep"), explode(col("__ids")).as("__m")))
  }

  /** Member-pair expansion shared by the collapse-first near-dup tiers
    * (MinHash, SimHash, Jaccard, embedding-cosine): same-group pairs carry
    * `samePayload` (the identical-content value), cross-group pairs the
    * representative pair's payload.  `repPairs` must have columns
    * (aCol, bCol, payloadCol) with aCol < bCol at representative level;
    * `members` maps __rep → __m.  `sameFilter` can exclude degenerate
    * groups (e.g. zero-norm vectors, whose cosine is undefined).
    */
  private[operators] def expandPairs(repPairs: DataFrame, members: DataFrame,
                                     aCol: String, bCol: String,
                                     payloadCol: String, samePayload: Column,
                                     sameFilter: Column = lit(true)): DataFrame = {
    val sameGroup = members.filter(sameFilter)
      .select(col("__rep"), col("__m").as(aCol))
      .join(members.select(col("__rep"), col("__m").as(bCol)), Seq("__rep"))
      .filter(col(aCol) < col(bCol))
      .select(col(aCol), col(bCol), samePayload.as(payloadCol))
    val crossGroup = repPairs
      .join(members.select(col("__rep").as(aCol), col("__m").as("__ma")), Seq(aCol))
      .join(members.select(col("__rep").as(bCol), col("__m").as("__mb")), Seq(bCol))
      .select(least(col("__ma"), col("__mb")).as(aCol),
        greatest(col("__ma"), col("__mb")).as(bCol), col(payloadCol))
    sameGroup.unionByName(crossGroup)
  }

  /** Verified near-duplicates: LSH candidates with exact n-gram Jaccard ≥
    * threshold.  Verification cost is O(candidates over DISTINCT texts),
    * not O(n²): identical texts are collapsed first and expanded back.
    */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                     threshold: Double, shingleSize: Int = 3,
                     bands: Int = 8, rowsPerBand: Int = 4): DataFrame = {
    require(threshold <= 1.0, s"jaccard threshold must be <= 1, got $threshold")
    val (reps, members) = collapseTexts(docs, idCol, textCol)
    val cands = lshCandidates(reps, idCol, textCol, shingleSize, bands, rowsPerBand)
    val t = reps.select(col(idCol), col(textCol))
    val repPairs = cands
      .join(t.select(col(idCol).as("doc1"), col(textCol).as("__t1")), Seq("doc1"))
      .join(t.select(col(idCol).as("doc2"), col(textCol).as("__t2")), Seq("doc2"))
      .withColumn("jaccard", jaccardUdf(col("__t1"), col("__t2"), lit(shingleSize)))
      .filter(col("jaccard") >= threshold)
      .select(col("doc1"), col("doc2"), col("jaccard"))
    expandPairs(repPairs, members, "doc1", "doc2", "jaccard", lit(1.0))
      .select(col("doc1"), col("doc2"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Per-doc 64-bit SimHash fingerprints. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), simhashUdf(col(textCol)).as("simhash"))

  /** SimHash near-dup pairs with hamming distance ≤ maxDistance, found via
    * the pigeonhole trick: split the 64-bit hash into `chunks` pieces —
    * any pair within distance `chunks-1` must agree on ≥1 whole chunk, so
    * an equi-join per chunk finds all candidates without an O(n²) scan.
    */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      maxDistance: Int = 3, chunks: Int = 4): DataFrame = {
    val (reps, members) = collapseTexts(docs, idCol, textCol)
    val hashed = simhash(reps, idCol, textCol)
    val bits = 64 / chunks
    val chunked = hashed.select(col(idCol), col("simhash"),
      posexplode(array((0 until chunks).map(i =>
        shiftrightunsigned(col("simhash"), i * bits).bitwiseAND(lit((1L << bits) - 1))): _*))
        .as(Seq("chunk_idx", "chunk_val")))
    val a = chunked.select(col(idCol).as("doc1"), col("simhash").as("sh1"),
      col("chunk_idx"), col("chunk_val"))
    val b = chunked.select(col(idCol).as("doc2"), col("simhash").as("sh2"),
      col("chunk_idx"), col("chunk_val"))
    val repPairs = a.join(b, Seq("chunk_idx", "chunk_val"))
      .filter(col("doc1") < col("doc2"))
      .select(col("doc1"), col("doc2"),
        bit_count(col("sh1").bitwiseXOR(col("sh2"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDistance)
    // identical texts hash identically → hamming 0
    expandPairs(repPairs, members, "doc1", "doc2", "hamming", lit(0))
  }

  /** Winnowing fingerprints (rolling-hash document signatures). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), fingerprintUdf(col(textCol)).as("fingerprint"))

  /** Connected components over an undirected pair graph — the step that
    * turns near-duplicate PAIRS into dedup DECISIONS (one keeper per
    * transitive duplicate cluster).
    *
    * Alternating large-star / small-star contraction (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond"): every iteration is a
    * groupBy + join over the edge set, converging in O(log n) rounds
    * regardless of component diameter — unlike naive label propagation,
    * whose round count is the graph diameter (fatal when a boilerplate
    * chain links millions of docs).  No driver-side state: the only
    * per-round action is a single-row convergence probe, and each
    * round's shuffle is proportional to the current edge count, which
    * contracts monotonically toward one edge per non-root node.
    *
    * Convergence is detected by an **is-star probe**, not by comparing
    * successive edge-set checksums: with the u<v edge invariant, the set
    * is a fixed point of large-star∘small-star iff no node appears as
    * both a root (u side) and a member (v side) and every member has
    * exactly one distinct root — and any such star is necessarily rooted
    * at its component minimum.  The probe is ONE groupBy job over the
    * just-persisted contracted set; checksum-equality detection instead
    * costs a full redundant contraction round (~4 shuffles recomputing
    * an identical set) to observe "nothing changed".  The probe also
    * exits in ZERO rounds when the input pair set is already
    * star-shaped — the common case for LSH dedup pairs, where most
    * duplicate clusters are 2–3 nodes.
    *
    * Returns (node, component) for every node appearing in `edges`, where
    * component = smallest node id reachable (the canonical keeper id).
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 25): DataFrame = {
    // canonical undirected edge (small, large); drop self-loops
    var e = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

    // large-star: every node links its LARGER neighbors to the smallest
    // node in its closed neighborhood; small-star then does the same for
    // smaller-or-equal neighbors.  Alternating the two contracts every
    // component to a star rooted at its minimum.
    def largeStar(ed: DataFrame): DataFrame = {
      // both union children re-alias every column: a union of a plan with a
      // swapped projection of ITSELF shares attribute ids across children,
      // which trips Catalyst's union constraint rewrite
      val nbrs = ed.select(col("u").as("u"), col("v").as("v"))
        .unionByName(ed.select(col("v").as("u"), col("u").as("v")))
      val mins = nbrs.groupBy("u").agg(min(col("v")).as("__mn"))
        .select(col("u"), least(col("u"), col("__mn")).as("__m"))
      // no distinct here: duplicates are tolerated through smallStar, whose
      // round-final distinct dedups once — saves one shuffle per round
      nbrs.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(least(col("v"), col("__m")).as("u"),
          greatest(col("v"), col("__m")).as("v"))
        .filter(col("u") =!= col("v"))
    }
    def smallStar(ed: DataFrame): DataFrame = {
      // each edge processed at its larger endpoint: u = large, v = small
      val dir = ed.select(col("v").as("n"), col("u").as("s"))
      val mins = dir.groupBy("n").agg(min(col("s")).as("__m"))
      val relink = dir.join(mins, "n")
        .select(least(col("s"), col("__m")).as("u"),
          greatest(col("s"), col("__m")).as("v"))
      val self = mins.select(col("__m").as("u"), col("n").as("v"))
      relink.unionByName(self)
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    val spark = edges.sparkSession

    // checkpoint via an explicitly-held RDD so the PREVIOUS round's blocks
    // can be released deterministically (localCheckpoint on the Dataset
    // offers no unpersist handle; 20 retained edge-set generations would
    // crowd block storage on a big graph)
    def materialize(df: DataFrame)
        : (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow]) = {
      // InternalRow checkpoint (r15): the former df.rdd path deserialized
      // every edge to an external Row each round and re-encoded it on the
      // way back in. toRdd iterators reuse buffers, so rows are copied
      // before they are pinned in block storage.
      val rdd = InternalScan.rddOf(df).map(_.copy())
      rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      rdd.localCheckpoint()
      (InternalScan.toDF(spark, rdd, df.schema), rdd)
    }

    // is-star probe (see Scaladoc): one groupBy job over the persisted
    // set; returns (converged, edgeCount)
    def isStar(ed: DataFrame): (Boolean, Long) = {
      val nodes = ed
        .select(col("u").as("n"), lit(true).as("isRoot"), col("u").as("r"))
        .unionByName(ed.select(col("v").as("n"), lit(false).as("isRoot"), col("u").as("r")))
      val row = nodes.groupBy("n")
        .agg(
          max(when(col("isRoot"), 1).otherwise(0)).as("root"),
          countDistinct(when(!col("isRoot"), col("r"))).as("roots"),
          count(when(!col("isRoot"), 1)).as("m"))
        .agg(
          count(when(col("roots") > 1 || (col("root") === 1 && col("m") > 0), 1)).as("bad"),
          sum(col("m")).as("edges"))
        .head()
      (row.getLong(0) == 0L, if (row.isNullAt(1)) 0L else row.getLong(1))
    }

    var iter = 0
    var (cur, curRdd) = materialize(e)
    var (converged, nEdges) = isStar(cur)
    while (!converged && iter < maxIter) {
      val (next, nextRdd) = materialize(smallStar(largeStar(cur)))
      iter += 1
      // the probe is the FIRST action on the new round's RDD, and the new
      // round's lineage reads the previous localCheckpointed blocks — so
      // the previous generation may only be unpersisted AFTER the probe
      // has materialized the new one (localCheckpoint truncates lineage;
      // an early async unpersist races the probe into "Checkpoint block
      // not found")
      val probe = isStar(next)
      curRdd.unpersist(blocking = false)
      cur = next; curRdd = nextRdd
      converged = probe._1
      nEdges = probe._2
      ccLog.info(s"connectedComponents round $iter: edges=$nEdges converged=$converged")
    }
    lastCcRounds.set(iter)
    e = cur
    // partially-contracted output would silently mark duplicates as
    // keepers downstream — refuse instead (star contraction converges in
    // O(log n) alternations, so hitting this means maxIter is far too low
    // for the graph, not a marginal miss)
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds; raise maxIter")
    // star edges (root, member) + roots themselves
    e.select(col("v").as("node"), col("u").as("component"))
      .unionByName(e.select(col("u").as("node"), col("u").as("component")))
      .groupBy("node").agg(min(col("component")).as("component"))
  }

  /** End-to-end dedup decision: cluster near-duplicate pairs (transitive
    * closure) and keep the smallest id per cluster.  Docs in no pair keep
    * themselves.  Output: (idCol, component, keep).
    */
  def dedupClusters(docs: DataFrame, pairs: DataFrame, idCol: String,
                    aCol: String, bCol: String): DataFrame = {
    val comps = connectedComponents(pairs, aCol, bCol)
      .select(col("node").as(idCol), col("component"))
    docs.select(col(idCol))
      .join(comps, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("component"))
      .withColumn("keep", col(idCol) === col("component"))
  }

  /** Exact word n-gram Jaccard near-duplicate pairs.  Three structural
    * guarantees keep the pair space far below O(n²) while the OUTPUT stays
    * exact:
    *
    *  1. **Exact-dup collapse first.**  Identical (blockCols, text) docs
    *     are grouped; the quadratic candidate machinery runs on one
    *     REPRESENTATIVE per distinct text, so the duplication factor of
    *     the corpus (the thing that grows fastest in web crawls) drops
    *     out of the hard part entirely.  Member pairs are expanded back
    *     afterwards (same text ⟹ same Jaccard), output unchanged.
    *  2. **Inverted-index pair counting.**  |A∩B| is a COUNT over the
    *     exploded gram postings joined on (blockCols, gram, length-band),
    *     not a per-pair array intersect — partial→final aggregate, all
    *     codegen.  The length band rides IN the join key (side A explodes
    *     to bands b-1,b,b+1), so band-distant docs never even hash-match.
    *  3. **Grams hashed to int64** — intersection cardinality is
    *     unchanged (64-bit collisions negligible) and long keys shuffle
    *     and compare far cheaper than strings.
    *
    * Everything is portable relational computation, so unlike the
    * MinHash/SimHash tiers (engine-specific hash families) this tier is
    * oracle-checkable bit-for-bit.
    *
    * Default `ngram=2`: token-SET (1-gram) Jaccard degenerates on
    * small-vocabulary corpora (unrelated docs share most of the
    * vocabulary); bigram sets keep word order and stay discriminative.
    * Convention: identical texts are duplicates (jaccard 1.0) even when
    * their gram sets are empty (single-token docs).
    */
  def jaccardNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                          blockCols: Seq[String] = Nil, bandWidth: Int = 16,
                          threshold: Double = 0.5, ngram: Int = 2): DataFrame = {
    require(ngram == 1 || ngram == 2, s"ngram must be 1 or 2, got $ngram")

    // 1) collapse exact duplicates: one representative per distinct text
    val keyed = docs.select(
      (Seq(col(idCol).as("__docid"), col(textCol).as("__text"),
        xxhash64((blockCols.map(col) :+ col(textCol)): _*).as("__tkey")) ++
        blockCols.map(col)): _*)
    val grp = keyed.groupBy((col("__tkey") +: blockCols.map(col)): _*)
      .agg(min(col("__docid")).as("__rep"), first(col("__text")).as("__text"))
    val members = keyed.select(col("__docid"), col("__tkey"))
      .join(grp.select(col("__tkey"), col("__rep")), Seq("__tkey"))
      .select(col("__docid"), col("__rep"))

    // 2) representative-level inverted index with the band in the key.
    // Gram construction + hashing is the native one-pass NgramHashes
    // kernel (graftx/RepStatsExpr.scala) — this subplan is consumed by
    // THREE branches (sizes, a-side, b-side) and Spark shares no
    // subplans, so the per-doc gram cost is paid three times; keeping it
    // a codegen'd single scan instead of an interpreted zip_with chain
    // matters threefold here.
    val base = grp.select(
      (Seq(col("__rep"),
        org.apache.spark.sql.graftx.TextColumns.ngramHashesWs(col("__text"), ngram)
          .as("__toks"),
        floor(length(col("__text")) / bandWidth).as("__bk")) ++
        blockCols.map(col)): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = base.select(col("__rep"), size(col("__toks")).as("__sz"))
    val a = base.select(
      (Seq(col("__rep").as("__ra"),
        explode(array(col("__bk") - 1, col("__bk"), col("__bk") + 1)).as("__probe")) ++
        blockCols.map(c => col(c).as(s"__a_$c")) :+ col("__toks")): _*)
      .select(
        (Seq(col("__ra"), col("__probe")) ++ blockCols.map(c => col(s"__a_$c")) :+
          explode(col("__toks")).as("__gram")): _*)
    val b = base.select(
      (Seq(col("__rep").as("__rb"), col("__bk")) ++
        blockCols.map(c => col(c).as(s"__b_$c")) :+
        explode(col("__toks")).as("__gram_b")): _*)
    val joinKeys = Seq(
      col("__gram") === col("__gram_b"), col("__probe") === col("__bk")) ++
      blockCols.map(c => col(s"__a_$c") === col(s"__b_$c"))
    val repPairs = a.join(b, joinKeys.reduce(_ && _) && col("__ra") < col("__rb"))
      .groupBy(col("__ra"), col("__rb"))
      .agg(count(lit(1)).cast("double").as("__inter"))
      .join(sizes.select(col("__rep").as("__ra"), col("__sz").as("__sa")), Seq("__ra"))
      .join(sizes.select(col("__rep").as("__rb"), col("__sz").as("__sb")), Seq("__rb"))
      .withColumn("jaccard",
        col("__inter") / (col("__sa") + col("__sb") - col("__inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("__ra").as("id_a"), col("__rb").as("id_b"), col("jaccard"))

    // 3) expand representatives back to member pairs (output-proportional)
    expandPairs(repPairs,
      members.select(col("__rep"), col("__docid").as("__m")),
      "id_a", "id_b", "jaccard", lit(1.0))
  }
}
