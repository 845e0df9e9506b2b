package graft.functions

/** Deterministic 64-bit hashing kernels shared by the dedup / similarity
  * operators.  Plain public-domain constructions (FNV-1a, splitmix64
  * finalizer) — no dependency on Spark's internal hash expressions so the
  * same bits are reproducible anywhere (tests, other engines).
  */
object Hashing {

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{floor, lit, pmod, shiftright, shiftrightunsigned}

  /** Column-level bucket hash that is a pure function of the key value and
    * is expressible in portable SQL (multiply / xor / shift / mod only), so
    * an external oracle (DuckDB) can replicate it bit-for-bit.  One
    * multiply-xorshift round per multiplier, buckets taken from the TOP of
    * the 32-bit space (low bits of a multiplicative hash are weak).
    * Constants chosen so no intermediate exceeds int64.
    *
    * This backs deterministic content-keyed sampling / splits: the kept set
    * is stable across runs, engines, partition layouts — unlike seeded RNG
    * `sample()`, which depends on partition boundaries.
    */
  def portableBucket(key: Column, buckets: Int, seed: Int = 0): Column = {
    // fold the high bits in BEFORE the range reduction: a bare mod would
    // make any two keys congruent mod 1e8 (e.g. snowflake ids 1e8 apart)
    // collide in the same bucket under EVERY seed — a train/test-leak
    // hazard for content-keyed splits.  xor + logical shift stays exact
    // in both engines (no overflow, DuckDB-replicable).
    val kl = key.cast("long")
    val folded = kl.bitwiseXOR(shiftrightunsigned(kl, 27))
    val k = pmod(folded, lit(100000000L)) + lit(seed.toLong * 7919L)
    val h1 = pmod(k * lit(2654435761L), lit(4294967296L))
    val x1 = h1.bitwiseXOR(shiftright(h1, 16))
    val h2 = pmod(x1 * lit(1597334677L), lit(4294967296L))
    val x2 = h2.bitwiseXOR(shiftright(h2, 13))
    // exact: x2*buckets < 2^53 and /2^32 only shifts the exponent
    floor(x2 * lit(buckets.toLong) / lit(4294967296L)).cast("int")
  }

  /** splitmix64 finalizer — standard public-domain mixing function. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64-bit over UTF-8 bytes, then mixed. */
  def hashString(s: String): Long = {
    var h = 0xCBF29CE484222325L
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xFFL)
      h *= 0x100000001B3L
      i += 1
    }
    mix64(h)
  }

  /** k-th independent hash of a base value (seeded re-mix). */
  @inline def seeded(h: Long, seed: Int): Long = mix64(h ^ mix64(seed.toLong))

  /** Sliding word n-gram ("shingle") hashes of a whitespace-tokenized
    * text.  One pass, no materialized shingle strings.
    */
  def shingleHashes(text: String, n: Int): Array[Long] = {
    val tokens = text.split("\\s+").filter(_.nonEmpty)
    if (tokens.length < n) {
      if (tokens.isEmpty) Array.empty else Array(hashString(tokens.mkString(" ")))
    } else {
      Array.tabulate(tokens.length - n + 1) { i =>
        var h = 0L
        var j = 0
        while (j < n) { h = mix64(h ^ hashString(tokens(i + j))); j += 1 }
        h
      }
    }
  }

  /** MinHash signature: `numHashes` independent min-hashes over the
    * shingle set (reference concept: MinHash-LSH dedup for web-scale
    * corpora; the permutation family is h_i(x) = mix64(x ^ seed_i)).
    */
  def minhashSignature(text: String, shingleSize: Int, numHashes: Int): Array[Long] = {
    val shingles = shingleHashes(text, shingleSize)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var s = 0
    while (s < shingles.length) {
      val base = shingles(s)
      var i = 0
      while (i < numHashes) {
        val h = seeded(base, i)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      s += 1
    }
    sig
  }

  /** Band keys for LSH banding: hash each band (consecutive `rows`-slice
    * of the signature) to one 64-bit key.  Docs sharing any band key are
    * candidate duplicates.
    */
  def bandKeys(sig: Array[Long], bands: Int, rows: Int): Array[Long] = {
    Array.tabulate(bands) { b =>
      var h = mix64(b.toLong)
      var r = 0
      while (r < rows) { h = mix64(h ^ sig(b * rows + r)); r += 1 }
      h
    }
  }

  /** 64-bit SimHash over whitespace tokens (Charikar's construction):
    * each token votes ±1 per bit of its hash; sign of the tally is the
    * fingerprint bit.
    */
  def simhash64(text: String): Long = {
    val counts = new Array[Int](64)
    for (tok <- text.split("\\s+") if tok.nonEmpty) {
      val h = hashString(tok)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken scheme):
    * rolling k-char-gram hashes, min per sliding window, XOR-fold the
    * selected mins to one stable 64-bit fingerprint.
    */
  def winnowFingerprint(text: String, k: Int = 8, window: Int = 16): Long = {
    val s = text.toLowerCase.replaceAll("\\s+", " ")
    if (s.length < k) return hashString(s)
    val grams = Array.tabulate(s.length - k + 1)(i => hashString(s.substring(i, i + k)))
    // fewer grams than one window: select the min over ALL grams (the
    // single-window degenerate case).  Without this, every text of
    // normalized length k..k+window-2 returned the constant 0 — all short
    // docs collided into one false dedup cluster.
    if (grams.length < window) {
      var minIdx = 0
      var j = 1
      while (j < grams.length) { if (grams(j) <= grams(minIdx)) minIdx = j; j += 1 }
      return mix64(grams(minIdx) ^ minIdx.toLong)
    }
    var fp = 0L
    var lastMinIdx = -1
    var i = 0
    while (i + window <= grams.length) {
      var minIdx = i
      var j = i + 1
      while (j < i + window) { if (grams(j) <= grams(minIdx)) minIdx = j; j += 1 }
      if (minIdx != lastMinIdx) { fp ^= mix64(grams(minIdx) ^ minIdx.toLong); lastMinIdx = minIdx }
      i += 1
    }
    fp
  }

  /** Exact word-n-gram Jaccard similarity between two texts. */
  def ngramJaccard(a: String, b: String, n: Int): Double = {
    val sa = shingleHashes(a, n).toSet
    val sb = shingleHashes(b, n).toSet
    if (sa.isEmpty && sb.isEmpty) 1.0
    else {
      val inter = sa.intersect(sb).size
      inter.toDouble / (sa.size + sb.size - inter)
    }
  }

  /** Seeded pseudo-random hyperplane component for sign-LSH over
    * embeddings: gaussian-ish value derived from (plane, dim) — the same
    * plane is reproducible on every executor with no broadcast state.
    */
  def hyperplaneComponent(plane: Int, dim: Int): Double = {
    val h = mix64(mix64(plane.toLong) ^ dim.toLong)
    // map to (-1, 1) uniformly; adequate for sign-LSH bucketing
    (h.toDouble / Long.MaxValue.toDouble)
  }

  /** Sign-LSH bucket key: one bit per hyperplane = sign of <v, plane>. */
  def signBucket(vec: Array[Float], planes: Int): Long = {
    var key = 0L
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var d = 0
      while (d < vec.length) { dot += vec(d) * hyperplaneComponent(p, d); d += 1 }
      if (dot > 0) key |= (1L << p)
      p += 1
    }
    key
  }
}
