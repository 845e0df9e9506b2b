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

  /** Verified near-duplicates: LSH candidates with exact n-gram Jaccard ≥
    * threshold.  Verification cost is O(candidates), not O(n²).
    */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                     threshold: Double, shingleSize: Int = 3,
                     bands: Int = 8, rowsPerBand: Int = 4): DataFrame = {
    val cands = lshCandidates(docs, idCol, textCol, shingleSize, bands, rowsPerBand)
    val t = docs.select(col(idCol), col(textCol))
    cands
      .join(t.select(col(idCol).as("doc1"), col(textCol).as("__t1")), Seq("doc1"))
      .join(t.select(col(idCol).as("doc2"), col(textCol).as("__t2")), Seq("doc2"))
      .withColumn("jaccard", jaccardUdf(col("__t1"), col("__t2"), lit(shingleSize)))
      .filter(col("jaccard") >= threshold)
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
    val hashed = simhash(docs, idCol, textCol)
    val bits = 64 / chunks
    val chunked = hashed.select(col(idCol), col("simhash"),
      posexplode(array((0 until chunks).map(i =>
        shiftrightunsigned(col("simhash"), i * bits).bitwiseAND(lit((1L << bits) - 1))): _*))
        .as(Seq("chunk_idx", "chunk_val")))
    val a = chunked.select(col(idCol).as("doc1"), col("simhash").as("sh1"),
      col("chunk_idx"), col("chunk_val"))
    val b = chunked.select(col(idCol).as("doc2"), col("simhash").as("sh2"),
      col("chunk_idx"), col("chunk_val"))
    a.join(b, Seq("chunk_idx", "chunk_val"))
      .filter(col("doc1") < col("doc2"))
      .select(col("doc1"), col("doc2"),
        bit_count(col("sh1").bitwiseXOR(col("sh2"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDistance)
  }

  /** Winnowing fingerprints (rolling-hash document signatures). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), fingerprintUdf(col(textCol)).as("fingerprint"))

  /** Exact word n-gram Jaccard near-duplicate pairs with length-band
    * blocking: candidates must share `blockCols` AND sit in the
    * same-or-adjacent `bandWidth`-char length band (a near-dup differs by
    * a few edits, so lengths are near-equal), keeping the pair space
    * band-local, never O(n²).  N-grams are hashed to 64-bit longs before
    * the per-pair set intersection — the intersection CARDINALITY (all
    * Jaccard needs) is unchanged up to negligible 64-bit collisions, and
    * long intersects are far cheaper than string intersects.  The gram
    * construction, blocking, and Jaccard are all portable relational
    * operations, so unlike the MinHash/SimHash tiers (engine-specific
    * hash families) this tier is oracle-checkable bit-for-bit.
    *
    * Default `ngram=2`: token-SET (1-gram) Jaccard degenerates on
    * small-vocabulary corpora (unrelated docs share most of the
    * vocabulary); bigram sets keep word order and stay discriminative.
    */
  def jaccardNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                          blockCols: Seq[String] = Nil, bandWidth: Int = 16,
                          threshold: Double = 0.5, ngram: Int = 2): DataFrame = {
    require(ngram == 1 || ngram == 2, s"ngram must be 1 or 2, got $ngram")
    val toks = org.apache.spark.sql.functions.filter(
      split(lower(col(textCol)), "\\s+"), t => t =!= lit(""))
    val grams =
      if (ngram == 1) array_distinct(toks)
      else array_distinct(org.apache.spark.sql.functions.filter(
        // zip each token with its successor; the null-padded tail drops out
        zip_with(toks, slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
          (x, y) => concat(x, lit(" "), y)),
        g => g.isNotNull))
    val hashed = transform(grams, g => xxhash64(g))
    val bk = floor(length(col(textCol)) / bandWidth)
    val base = docs.select(
      (Seq(col(idCol).as("__id"), hashed.as("__toks"), bk.as("__bk")) ++
        blockCols.map(col)): _*)

    // Inverted-index shape: |A∩B| is a pair COUNT over the exploded gram
    // postings, not a per-pair array intersect — one equi-join on
    // (blockCols, gram) + one partial→final aggregate, both codegen'd.
    // Pairs sharing zero grams never materialize (they cannot pass any
    // threshold > 0), and the denominator is ≥ the count, so no
    // divide-by-zero path exists.  Skew guard at corpus scale: a gram
    // shared by d docs contributes d² join rows — the length-band residual
    // bounds it, and a df-cap prefilter is the standard extra guard when
    // semantics may be approximate.
    val sizes = base.select(col("__id"), size(col("__toks")).as("__sz"))
    val postings = base.select(
      (Seq(col("__id"), col("__bk")) ++ blockCols.map(col) :+
        explode(col("__toks")).as("__gram")): _*)
    val a = postings.select(
      (Seq(col("__id").as("id_a"), col("__bk").as("__bka"), col("__gram")) ++
        blockCols.map(c => col(c).as(s"__a_$c"))): _*)
    val b = postings.select(
      (Seq(col("__id").as("id_b"), col("__bk").as("__bkb"),
        col("__gram").as("__gram_b")) ++
        blockCols.map(c => col(c).as(s"__b_$c"))): _*)
    val joinCond = ((col("__gram") === col("__gram_b")) +: blockCols.map(c =>
      col(s"__a_$c") === col(s"__b_$c"))).reduce(_ && _) &&
      col("id_a") < col("id_b") &&
      abs(col("__bka") - col("__bkb")) <= 1
    a.join(b, joinCond)
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).cast("double").as("__inter"))
      .join(sizes.select(col("__id").as("id_a"), col("__sz").as("__sa")), Seq("id_a"))
      .join(sizes.select(col("__id").as("id_b"), col("__sz").as("__sb")), Seq("id_b"))
      .withColumn("jaccard",
        col("__inter") / (col("__sa") + col("__sb") - col("__inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
