package graft.operators

import graft.SparkTestBase
import graft.functions.Hashing
import org.apache.spark.sql.functions._

/** Dedup / similarity / text-analysis operator semantics. */
class LlmOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "dog lazy the over jumps fox brown quick the"), // word-shuffle of 1
    (4L, "completely different content about spark engines and shuffles"),
    (5L, "the quick brown fox jumps over the lazy cat") // one word changed
  ).toDF("doc_id", "text").repartition(3)

  test("exact dedup groups word-multiset-equal docs") {
    val groups = Dedup.exact(docs, "doc_id", "text").collect()
    val g = groups.map(r => r.getLong(r.fieldIndex("keep_id")) ->
      r.getLong(r.fieldIndex("group_size"))).toMap
    assert(g(1L) == 3L) // docs 1,2,3 share a word multiset
    assert(g(4L) == 1L && g(5L) == 1L)
    // byte-exact mode separates the shuffled copy
    val exactG = Dedup.exact(docs, "doc_id", "text", byteExact = true).collect()
      .map(r => r.getLong(r.fieldIndex("keep_id")) -> r.getLong(r.fieldIndex("group_size"))).toMap
    assert(exactG(1L) == 2L && exactG(3L) == 1L)
  }

  test("minhash near-dups finds the high-jaccard pairs and skips low ones") {
    val pairs = Dedup.nearDuplicates(docs, "doc_id", "text",
      threshold = 0.5, shingleSize = 1, bands = 16, rowsPerBand = 2)
      .select("doc1", "doc2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(pairs.forall { case (a, b) => Set(a, b).intersect(Set(4L)).isEmpty })
  }

  test("jaccardNearDupPairs: blocking finds same-band pairs, Jaccard exact") {
    // 1-gram mode: word order ignored → shuffled copy is a perfect dup
    val uni = Dedup.jaccardNearDupPairs(docs, "doc_id", "text",
        threshold = 0.5, ngram = 1)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(uni((1L, 2L)) == 1.0 && uni((1L, 3L)) == 1.0 && uni((2L, 3L)) == 1.0)
    // one-word-changed doc: 8 distinct tokens each, 7 shared → 7/9
    assert(math.abs(uni((1L, 5L)) - 7.0 / 9.0) < 1e-12)
    assert(!uni.keySet.exists { case (a, b) => a == 4L || b == 4L })
    // bigram mode (default): order matters — the shuffled copy drops out,
    // the one-word edit keeps 7 of 9 distinct bigrams
    val bi = Dedup.jaccardNearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(bi((1L, 2L)) == 1.0)
    assert(!bi.contains((1L, 3L)) && !bi.contains((2L, 3L)))
    assert(math.abs(bi((1L, 5L)) - 7.0 / 9.0) < 1e-12)
    // length-band blocking is ±1 band: a short vs very long doc never pairs
    val longDoc = Seq((6L, ("word " * 40).trim), (7L, "word")).toDF("doc_id", "text")
    val none = Dedup.jaccardNearDupPairs(longDoc, "doc_id", "text", threshold = 0.0)
    assert(none.count() == 0)
  }

  test("jaccardNearDupPairs equals brute-force pairwise Jaccard (randomized)") {
    val rnd = new scala.util.Random(271)
    val vocab = Vector("red", "blue", "green", "gold", "onyx", "jade", "ruby")
    val texts = (1L to 25L).map(i =>
      (i, (0 until 6 + rnd.nextInt(4)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    def grams(t: String, n: Int): Set[String] = {
      val ws = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      if (n == 1) ws.toSet
      else if (ws.length < 2) Set.empty
      else ws.sliding(2).map(_.mkString(" ")).toSet
    }
    for (n <- Seq(1, 2)) {
      val expected = (for {
        (a, ta) <- texts; (b, tb) <- texts if a < b
        ga = grams(ta, n); gb = grams(tb, n)
        inter = (ga & gb).size if inter > 0
        j = inter.toDouble / (ga ++ gb).size if j >= 0.3
      } yield (a, b) -> j).toMap
      // bandWidth large enough that every doc shares band 0 (no blocking)
      val got = Dedup.jaccardNearDupPairs(texts.toDF("doc_id", "text"),
          "doc_id", "text", bandWidth = 1000, threshold = 0.3, ngram = n)
        .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
        .map { case (a, b, j) => (a, b) -> j }.toMap
      assert(got.keySet == expected.keySet, s"ngram=$n pair sets differ")
      expected.foreach { case (k, j) =>
        assert(math.abs(got(k) - j) < 1e-12, s"ngram=$n $k: ${got(k)} vs $j") }
    }
  }

  test("exactNearDupPairs: dup collapse emits the same pairs as all-pairs") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)), (5L, Array(1.0f, 0.0f)),
      (3L, Array(0.99f, 0.14f)),   // near 1/2/5
      (4L, Array(0.0f, 1.0f))      // far from everything
    ).toDF("vec_id", "embedding").repartition(3)
    val got = Similarity.exactNearDupPairs(vecs, "vec_id", "embedding", 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // identical trio pairs + each of them with the near vector
    assert(got == Set((1L, 2L), (1L, 5L), (2L, 5L), (1L, 3L), (2L, 3L), (3L, 5L)))
    val sims = Similarity.exactNearDupPairs(vecs, "vec_id", "embedding", 0.95)
      .select("id_a", "id_b", "sim").as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    assert(sims((1L, 2L)) == 1.0 && math.abs(sims((1L, 3L)) - 0.990) < 0.01)
    // zero-norm vectors: cosine undefined → never paired, never thrown
    val withZeros = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(0.0f, 0.0f)), (3L, Array(1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    assert(Similarity.exactNearDupPairs(withZeros, "vec_id", "embedding", 0.5).count() == 0)
  }

  test("bucketedNearDupPairs: planes=1 probe set covers both buckets → equals exact") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)), (5L, Array(1.0f, 0.0f)),
      (3L, Array(0.99f, 0.14f)),
      (4L, Array(0.0f, 1.0f)),
      (6L, Array(0.0f, 0.0f))     // zero-norm: never paired
    ).toDF("vec_id", "embedding").repartition(3)
    val exact = Similarity.exactNearDupPairs(vecs, "vec_id", "embedding", 0.95)
      .select("id_a", "id_b", "sim").as[(Long, Long, Double)].collect().toSet
    val bucketed = Similarity.bucketedNearDupPairs(vecs, "vec_id", "embedding", 0.95, planes = 1)
      .select("id_a", "id_b", "sim").as[(Long, Long, Double)].collect().toSet
    assert(bucketed == exact)
    // higher planes: output is a subset of exact (candidates restricted),
    // and identical-vector groups always survive (distance-0 bucket)
    val p8 = Similarity.bucketedNearDupPairs(vecs, "vec_id", "embedding", 0.95, planes = 8)
      .select("id_a", "id_b", "sim").as[(Long, Long, Double)].collect().toSet
    assert(p8.subsetOf(exact))
    assert(p8.exists { case (a, b, s) => a == 1L && b == 2L && s == 1.0 })
  }

  test("exactNearDupPairs refuses corpora past the all-pairs guard") {
    val vecs = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Similarity.exactNearDupPairs(vecs, "vec_id", "embedding", 0.9, maxExactVectors = 2L)
        .count()
    }
    assert(ex.getMessage.contains("bucketedNearDupPairs"))
  }

  test("ivfTopK rejects an oversized centroid codebook instead of collecting it") {
    val vecs = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val bigCents = spark.range(100).select(col("id").as("vec_id"),
      array(lit(1.0f), lit(0.0f)).as("embedding"))
    val ex = intercept[IllegalArgumentException] {
      Similarity.ivfTopK(vecs, vecs, bigCents, "vec_id", "embedding",
        k = 1, nProbe = 1, maxCodebook = 10)
    }
    assert(ex.getMessage.contains("maxCodebook"))
  }

  test("ivfTopK matches bruteForceTopK when all cells are probed") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(0.0f, 1.0f, 0.0f)),
      (10L, Array(0.9f, 0.1f, 0.0f)), (11L, Array(0.8f, 0.2f, 0.1f)),
      (12L, Array(0.1f, 0.9f, 0.2f)), (13L, Array(0.2f, 0.8f, 0.1f)),
      (14L, Array(0.7f, 0.1f, 0.2f))
    ).toDF("vec_id", "embedding").repartition(3)
    val queries = vecs.filter(col("vec_id") === 10L)
    val cents = vecs.filter(col("vec_id") < 2)
    // nProbe = all cells → IVF must equal brute force exactly
    val ivf = Similarity.ivfTopK(vecs, queries, cents, "vec_id", "embedding",
      k = 3, nProbe = 2).select("query_id", "neighbor_id", "rk")
      .as[(Long, Long, Int)].collect().toSet
    val bf = Similarity.bruteForceTopK(vecs, queries, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id", "rk").as[(Long, Long, Int)].collect().toSet
    assert(ivf == bf)
    // nProbe = 1 restricts to the query's own cell (x-axis cluster)
    val probed = Similarity.ivfTopK(vecs, queries, cents, "vec_id", "embedding",
      k = 5, nProbe = 1).select("neighbor_id").as[Long].collect().toSet
    assert(probed.forall(id => Set(0L, 11L, 14L).contains(id)))
  }

  test("recallAtK: exact-vs-self is 1.0; a pruned approximation scores its overlap") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(0.0f, 1.0f, 0.0f)),
      (10L, Array(0.9f, 0.1f, 0.0f)), (11L, Array(0.8f, 0.2f, 0.1f)),
      (12L, Array(0.1f, 0.9f, 0.2f)), (14L, Array(0.7f, 0.1f, 0.2f))
    ).toDF("vec_id", "embedding").repartition(3)
    val queries = vecs.filter(col("vec_id") === 10L)
    val bf = Similarity.bruteForceTopK(vecs, queries, "vec_id", "embedding", 3)
    val self = Similarity.recallAtK(bf, bf).head()
    assert(self.getLong(1) == 3L && self.getLong(2) == 3L && self.getDouble(3) == 1.0)
    // an "approximation" missing one true neighbor scores 2/3
    val pruned = bf.filter(col("rk") <= 2)
    val r = Similarity.recallAtK(pruned, bf).head()
    assert(r.getLong(1) == 2L && r.getLong(2) == 3L && math.abs(r.getDouble(3) - 2.0 / 3) < 1e-12)
    // a query with NO approx rows still appears, recall 0
    val none = bf.filter(col("rk") > 99)
    val z = Similarity.recallAtK(none, bf).head()
    assert(z.getLong(1) == 0L && z.getDouble(3) == 0.0)
  }

  test("ngramJaccard is 1 for identical, 0 for disjoint") {
    assert(Hashing.ngramJaccard("a b c", "a b c", 2) == 1.0)
    assert(Hashing.ngramJaccard("a b c", "x y z", 2) == 0.0)
  }

  test("simhash: identical multisets collide, near texts are close") {
    val h1 = Hashing.simhash64(docs.filter($"doc_id" === 1).head().getString(1))
    val h3 = Hashing.simhash64(docs.filter($"doc_id" === 3).head().getString(1))
    val h4 = Hashing.simhash64(docs.filter($"doc_id" === 4).head().getString(1))
    assert(h1 == h3) // order-independent
    assert(java.lang.Long.bitCount(h1 ^ h4) > 10)
    val pairs = Dedup.simhashNearDups(docs, "doc_id", "text", maxDistance = 3)
      .select("doc1", "doc2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
  }

  test("cosine similarity: known vectors") {
    val df = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)), (3L, Seq(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val topk = Similarity.bruteForceTopK(df, df.filter($"vec_id" === 1), "vec_id", "embedding", 2)
      .select("neighbor_id", "sim").as[(Long, Double)].collect().toMap
    assert(math.abs(topk(3L) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(topk(2L)) < 1e-12)
  }

  test("lsh buckets: identical vectors share a bucket") {
    val df = Seq((1L, Seq(1.0f, 2.0f, 3.0f)), (2L, Seq(1.0f, 2.0f, 3.0f)),
      (3L, Seq(-1.0f, -2.0f, -3.0f))).toDF("vec_id", "embedding")
    val b = Similarity.lshBuckets(df, "vec_id", "embedding", planes = 8)
      .as[(Long, Long)].collect().toMap
    assert(b(1L) == b(2L))
    assert(b(1L) != b(3L)) // antipodal vector flips every sign bit
  }

  test("langId: marker words decide; tie-break by list order") {
    val d = Seq((1L, "the cat is in the house"), (2L, "der hund ist nicht da"),
      (3L, "xyzzy qwerty")).toDF("doc_id", "text")
    val out = TextAnalysis.langId(d, "text").select("doc_id", "lang_pred")
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "en" && out(2L) == "de")
    assert(out(3L) == "en") // zero hits everywhere → first language wins
  }

  test("tokenCounts and quality metrics") {
    val d = Seq((1L, "hello world, this is a test!")).toDF("doc_id", "text")
    val tc = TextAnalysis.tokenCounts(d, "text").head()
    assert(tc.getAs[Long]("ws_tokens") == 6L)
    assert(tc.getAs[Long]("re_tokens") == 8L) // 6 words + ',' + '!'
    val q = TextAnalysis.qualityScore(d, "text").head()
    val score = q.getAs[Double]("quality_score")
    assert(score >= 0.0 && score <= 1.0)
    assert(q.getAs[Double]("stopword_ratio") > 0.0) // "this/is/a" markers: is, a
  }

  test("multimodal plumbing: schema, byte_len, deterministic stub features") {
    val media = Multimodal.fromDocuments(docs, "doc_id", "text")
    assert(media.schema.fieldNames.toSet == Set("media_id", "modality", "payload", "meta"))
    val feats = Multimodal.extractFeatures(media, featureDim = 4).collect()
    val fIdx = feats.head.fieldIndex("features")
    assert(feats.forall(_.getSeq[Float](fIdx).length == 4))
    val f1 = feats.find(_.getLong(0) == 1L).get.getSeq[Float](fIdx)
    val f2 = feats.find(_.getLong(0) == 2L).get.getSeq[Float](fIdx)
    assert(f1.toList == f2.toList) // same payload → same stub features
    val doc1len = docs.filter($"doc_id" === 1).head().getString(1).length
    assert(feats.find(_.getLong(0) == 1L).get.getAs[Long]("byte_len") == doc1len)
  }

  test("dedupSpans drops exactly the tokens covered by cross-doc duplicate k-grams") {
    val d = Seq(
      (1L, "alpha beta gamma delta unique one tail a"),
      (2L, "alpha beta gamma delta unique two tail b"),  // shares a 4-gram prefix with 1
      (3L, "totally different words without any overlap here"),
      (4L, "short doc"),                                  // < k tokens: untouched
      (5L, "copy copy copy copy copy copy"),
      (6L, "copy copy copy copy copy copy")               // exact dup of 5: fully scrubbed
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dedupSpans(d, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // docs 1/2 share the 4-grams starting at 0 ("alpha beta gamma
    // delta") and 1 ("beta gamma delta unique") → positions 0-4 covered
    assert(out(1L) == ((8L, 5L, "one tail a")), out(1L))
    assert(out(2L) == ((8L, 5L, "two tail b")), out(2L))
    assert(out(3L) == ((7L, 0L, "totally different words without any overlap here")))
    assert(out(4L) == ((2L, 0L, "short doc")))
    // exact dup docs: every position covered → empty clean text
    assert(out(5L) == ((6L, 6L, "")))
    assert(out(6L) == ((6L, 6L, "")))
  }

  test("dedupSpans native interval kernel == HOF reference, incl. span-dense docs") {
    val rnd = new scala.util.Random(7)
    // tiny vocabulary → heavy cross-doc gram duplication; plus a pair of
    // identical 300-token docs where EVERY gram is duplicated (S → T,
    // the span-dense regime the sorted-interval merge exists for)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    def doc(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val dense = doc(300)
    val docs = ((1 to 30).map(i => (i.toLong, doc(20 + rnd.nextInt(60)))) ++
      Seq((100L, dense), (101L, dense), (102L, ""), (103L, "one"))) // sub-k edges
      .toDF("doc_id", "text").repartition(5)
    for (k <- Seq(2, 5)) {
      val a = TextAnalysis.dedupSpans(docs, "doc_id", "text", k)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      val b = TextAnalysis.dedupSpans(docs, "doc_id", "text", k, hof = true)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(a == b, s"k=$k")
    }
    // the identical pair must be fully scrubbed
    val full = TextAnalysis.dedupSpans(docs, "doc_id", "text", 5)
      .filter($"doc_id" === 100L).head()
    assert(full.getLong(full.fieldIndex("n_dropped")) == 300L &&
      full.getString(full.fieldIndex("clean_text")).isEmpty)
  }

  test("BMP24 codec: encode/decode round-trips, padding and both row orders") {
    // w=15 → 45-byte rows padded to 48: the padding path is exercised
    val rgb = Array.tabulate(15 * 8 * 3)(i => ((i * 37 + 11) % 256).toByte)
    val bmp = Multimodal.encodeBmp24(15, 8, rgb)
    assert(bmp.length == 54 + 48 * 8)
    val (w, h, back) = Multimodal.decodeBmp24(bmp)
    assert(w == 15 && h == 8)
    assert(back.toSeq == rgb.toSeq) // exact pixel round-trip, top-down RGB
    // top-down variant (negative biHeight): same pixels, rows stored
    // first-to-last — decoder must NOT flip them again
    val td = bmp.clone()
    val bb = java.nio.ByteBuffer.wrap(td).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -8)
    val rowSize = 48
    for (row <- 0 until 8; b <- 0 until rowSize) // re-store rows top-down
      td(54 + row * rowSize + b) = bmp(54 + (7 - row) * rowSize + b)
    val (_, h2, back2) = Multimodal.decodeBmp24(td)
    assert(h2 == 8 && back2.toSeq == rgb.toSeq)
    // rejects wrong magic / unsupported bpp
    val bad = bmp.clone(); bad(0) = 'X'.toByte
    intercept[IllegalArgumentException](Multimodal.decodeBmp24(bad))
    val bpp8 = bmp.clone()
    java.nio.ByteBuffer.wrap(bpp8).order(java.nio.ByteOrder.LITTLE_ENDIAN).putShort(28, 8)
    intercept[IllegalArgumentException](Multimodal.decodeBmp24(bpp8))
  }

  test("WAV PCM16 codec: round-trip, chunk walking, format validation") {
    val samples = Array.tabulate(257)(i => ((i * 523 - 31000) % 32768).toShort)
    val wav = Multimodal.encodeWavPcm16(8000, samples)
    val (rate, back) = Multimodal.decodeWavPcm16(wav)
    assert(rate == 8000 && back.toSeq == samples.toSeq)
    // an extra unknown chunk BEFORE fmt/data must be skipped (odd size →
    // pad byte honored)
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4, 5, 0)
    val withChunk = wav.take(12) ++ extra ++ wav.drop(12)
    java.nio.ByteBuffer.wrap(withChunk).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, withChunk.length - 8)
    val (rate2, back2) = Multimodal.decodeWavPcm16(withChunk)
    assert(rate2 == 8000 && back2.toSeq == samples.toSeq)
    // stereo rejected
    val stereo = wav.clone()
    java.nio.ByteBuffer.wrap(stereo).order(java.nio.ByteOrder.LITTLE_ENDIAN).putShort(22, 2)
    intercept[IllegalArgumentException](Multimodal.decodeWavPcm16(stereo))
  }

  test("extractFeatures dispatches on meta.format: real BMP decode vs byte fallback") {
    val rgb = Array.tabulate(15 * 8 * 3)(i => (i % 256).toByte)
    val bmp = Multimodal.encodeBmp24(15, 8, rgb)
    val rows = Seq(
      (1L, "image", bmp, (15, 8, "bmp/rgb24")),
      (2L, "image", bmp, (15, 8, "opaque/unknown")))
      .toDF("media_id", "modality", "payload", "meta")
      .withColumn("meta", struct(
        col("meta._1").as("width"), col("meta._2").as("height"),
        col("meta._3").as("format")))
    val feats = Multimodal.extractFeatures(rows, featureDim = 6).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](r.fieldIndex("features"))).toMap
    // decoded path: features lead with true dimensions and channel means
    assert(feats(1L)(0) == 15.0f && feats(1L)(1) == 8.0f)
    val meanR = (0 until 120).map(p => (rgb(p * 3) & 0xFF)).sum / 120.0
    assert(math.abs(feats(1L)(2) - meanR) < 1e-3)
    // same payload through the opaque fallback gives different features
    assert(feats(2L) != feats(1L))
  }

  test("decoders accept third-party files not produced by our encoders") {
    // Hand-assembled top-down BMP with a pixel-data gap (pixelOffset 64 >
    // 54) — two quirks encodeBmp24 never emits, so a symmetric
    // encode/decode bug cannot cancel here.  2×2 pixels, rows top-down:
    // (255,0,0) (0,255,0) / (0,0,255) (255,255,255), rowSize 8 (2 pad).
    val bmp = java.nio.ByteBuffer.allocate(64 + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bmp.put('B'.toByte).put('M'.toByte).putInt(64 + 16)
      .putShort(0).putShort(0).putInt(64)      // pixelOffset past a gap
      .putInt(40).putInt(2).putInt(-2)          // NEGATIVE height: top-down
      .putShort(1).putShort(24).putInt(0)
      .putInt(16).putInt(0).putInt(0).putInt(0).putInt(0)
    bmp.put(Array.fill[Byte](10)(0x7F.toByte))  // gap bytes (ignored)
    bmp.put(Array[Byte](0, 0, -1, 0, -1, 0, 0, 0))          // row0 BGR + pad
    bmp.put(Array[Byte](-1, 0, 0, -1, -1, -1, 0, 0))        // row1 BGR + pad
    val (w, h, rgb) = Multimodal.decodeBmp24(bmp.array())
    assert(w == 2 && h == 2)
    assert(rgb.toSeq == Seq[Byte](-1, 0, 0, 0, -1, 0, 0, 0, -1, -1, -1, -1))

    // Hand-assembled WAV with a LIST/INFO chunk between fmt and data —
    // encodeWavPcm16 never writes one.  5 samples at 11025 Hz.
    val samples = Array[Short](1000, -1000, 2000, -2000, 0)
    val list = "LIST".getBytes("US-ASCII") ++ Array[Byte](5, 0, 0, 0) ++
      Array[Byte]('I', 'N', 'F', 'O', 'x', 0) // odd size → pad byte
    val wav = java.nio.ByteBuffer.allocate(12 + 24 + list.length + 8 + 10)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    wav.put("RIFF".getBytes("US-ASCII")).putInt(4 + 24 + list.length + 18)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(11025).putInt(22050).putShort(2).putShort(16)
      .put(list)
      .put("data".getBytes("US-ASCII")).putInt(10)
    samples.foreach(wav.putShort)

    // end-to-end through the dispatched batch path with known statistics
    val rows = Seq(
      (1L, "image", bmp.array(), (2, 2, "bmp/rgb24")),
      (2L, "audio", wav.array(), (0, 0, "wav/pcm16")))
      .toDF("media_id", "modality", "payload", "meta")
      .withColumn("meta", struct(
        col("meta._1").as("width"), col("meta._2").as("height"),
        col("meta._3").as("format")))
    val feats = Multimodal.extractFeatures(rows, featureDim = 6).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](r.fieldIndex("features"))).toMap
    // image: [w, h, meanR, meanG, meanB, std] — all channels mean 127.5,
    // six 255s over 12 channel-values → std exactly 127.5
    assert(feats(1L) == Seq(2f, 2f, 127.5f, 127.5f, 127.5f, 127.5f), feats(1L))
    // audio: [n, rate, mean, rms, min, max]
    assert(feats(2L)(0) == 5f && feats(2L)(1) == 11025f && feats(2L)(2) == 0f)
    assert(math.abs(feats(2L)(3) - 1414.2136f) < 1e-2)
    assert(feats(2L)(4) == -2000f && feats(2L)(5) == 2000f)
  }

  test("frameSample explodes each payload into n distinct deterministic frames") {
    val media = Multimodal.fromDocuments(docs, "doc_id", "text")
    val nDocs = media.filter($"payload".isNotNull).count()
    val frames = Multimodal.frameSample(media, nFrames = 3, featureDim = 4)
    assert(frames.count() == nDocs * 3)
    val doc1 = frames.filter($"media_id" === 1L).collect()
      .map(r => r.getInt(1) -> r.getSeq[Float](2)).toMap
    assert(doc1.keySet == Set(0, 1, 2))
    assert(doc1(0) != doc1(1)) // frame index perturbs the decode
    // determinism: re-running yields identical features
    val again = Multimodal.frameSample(media, nFrames = 3, featureDim = 4)
      .filter($"media_id" === 1L).collect()
      .map(r => r.getInt(1) -> r.getSeq[Float](2)).toMap
    assert(again == doc1)
    // the zero-copy tag-seeded featurizer is bit-identical to hashing
    // the materialized [tag ++ payload] concatenation it replaced
    val payload = "some payload bytes".getBytes("UTF-8")
    for (tag <- Seq(0, 1, 255, 256, 65537)) {
      val tagged = Array[Byte](
        (tag >>> 24).toByte, (tag >>> 16).toByte, (tag >>> 8).toByte, tag.toByte) ++ payload
      assert(Multimodal.taggedByteFeatures(payload, 4, tag).toSeq ==
        Multimodal.byteFeatures(tagged, 4).toSeq, s"tag=$tag")
    }
  }
}
