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

  /** Exact token-set (word 1-gram) Jaccard near-duplicate pairs with
    * length-band blocking: candidates must share `blockCols` AND sit in
    * the same-or-adjacent `bandWidth`-char length band (near-dups have
    * near-equal lengths), so the pair space is band-local, never O(n²).
    * Everything is native array functions — codegen, no UDF — and the
    * whole computation is portable SQL, so unlike the MinHash/SimHash
    * tiers (whose hash families are engine-specific) this one is
    * oracle-checkable bit-for-bit.  For n-gram (n>1) Jaccard at scale use
    * [[nearDuplicates]], which verifies candidates with
    * `Hashing.ngramJaccard`.
    */
  def jaccardNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                          blockCols: Seq[String] = Nil, bandWidth: Int = 64,
                          threshold: Double = 0.5): DataFrame = {
    val toks = array_distinct(
      org.apache.spark.sql.functions.filter(
        split(lower(col(textCol)), "\\s+"), t => t =!= lit("")))
    val bk = floor(length(col(textCol)) / bandWidth)
    val base = docs.select(
      (Seq(col(idCol), toks.as("__toks"), bk.as("__bk")) ++ blockCols.map(col)): _*)
    val a = base.select(
      (Seq(col(idCol).as("id_a"), col("__toks").as("__ta"),
        explode(array(col("__bk") - 1, col("__bk"), col("__bk") + 1)).as("__probe")) ++
        blockCols.map(c => col(c).as(s"__a_$c"))): _*)
    val b = base.select(
      (Seq(col(idCol).as("id_b"), col("__toks").as("__tb"), col("__bk")) ++
        blockCols.map(c => col(c).as(s"__b_$c"))): _*)
    val blockCond = (col("__probe") === col("__bk")) +: blockCols.map(c =>
      col(s"__a_$c") === col(s"__b_$c"))
    val inter = size(array_intersect(col("__ta"), col("__tb"))).cast("double")
    a.join(b, blockCond.reduce(_ && _) && col("id_a") < col("id_b"))
      .withColumn("jaccard",
        inter / (size(col("__ta")) + size(col("__tb")) - inter))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
