package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("tfidf scores follow tf × smoothed idf") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the log"),
      (3L, "the cat and the dog met a zebra")).toDF("doc_id", "text")
    val all = TextAnalysis.tfidf(docs, "doc_id", "text", k = 10)
    // 'the': tf=2 in doc 3, df=3 of N=3 → idf = ln(4/4)+1 = 1 → score 2.0,
    // the top term of doc 3 despite zero discriminative power
    val doc3 = all.filter(col("doc_id") === 3).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(doc3("the") == (2L, 2.0))
    // 'zebra': unique to doc 3 → idf = ln(4/2)+1
    val expZebra = math.log(2.0) + 1.0
    assert(math.abs(doc3("zebra")._2 - expZebra) < 1e-6)
    // 'cat': in 2 of 3 docs → idf = ln(4/3)+1, ranks below zebra
    assert(doc3("cat")._2 < doc3("zebra")._2)
    assert(all.filter(col("doc_id") === 3 && col("rk") === 1)
      .head().getString(1) == "the")
  }

  test("tfidf top-k emits at most k rows per doc, ranked") {
    val docs = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidf(docs, "doc_id", "text", k = 3).collect()
    assert(out.length == 3)
    assert(out.map(_.getInt(4)).sorted.toSeq == Seq(1, 2, 3))
  }

  test("scrub replaces emails, urls and digit runs with typed tokens") {
    val docs = Seq(
      (1L, "contact bob@example.com or visit https://example.com/a?b=1 ref 1234567"),
      (2L, "no pii here"),
      (3L, "two mails a@b.io c@d.org and 99999 88888")).toDF("doc_id", "text")
    val out = TextAnalysis.scrub(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) == 1 && out(1L).getInt(2) == 1 && out(1L).getInt(3) == 1)
    assert(out(1L).getString(4) == "contact <EMAIL> or visit <URL> ref <NUM>")
    assert(out(2L).getInt(1) == 0 && out(2L).getString(4) == "no pii here")
    assert(out(3L).getInt(1) == 2 && out(3L).getInt(3) == 2)
    assert(out(3L).getString(4) == "two mails <EMAIL> <EMAIL> and <NUM> <NUM>")
  }

  test("tfidf on empty and null texts yields no rows for them") {
    val docs = Seq((1L, "real content here"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.tfidf(docs, "doc_id", "text", k = 5)
    assert(out.select("doc_id").distinct().collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("scrub passes null text through as null") {
    val docs = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val r = TextAnalysis.scrub(docs, "doc_id", "text").head()
    assert(r.isNullAt(1) && r.isNullAt(4))
  }

  test("scrub does not double-count digits inside urls") {
    val docs = Seq((1L, "see https://x.io/p/1234567890 now")).toDF("doc_id", "text")
    val r = TextAnalysis.scrub(docs, "doc_id", "text").head()
    assert(r.getInt(2) == 1)  // one url
    assert(r.getInt(3) == 0)  // digits were inside the url → not counted
    assert(r.getString(4) == "see <URL> now")
  }

  test("repetitionMetrics: known fractions on hand-counted docs") {
    val docs = Seq(
      (1L, "a a a b"),          // top=3/4, distinct=2/4, bigrams: aa,aa,ab → dup 1/3
      (2L, "x y z"),            // no repeats at all
      (3L, "w"),                // single word, zero bigrams
      (4L, "go go go go")).toDF("doc_id", "text") // fully repetitious
    val m = TextAnalysis.repetitionMetrics(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    def d(r: org.apache.spark.sql.Row, i: Int) = r.getDouble(i)
    assert(m(1L).getLong(1) == 4)
    assert(math.abs(d(m(1L), 2) - 0.75) < 1e-9)       // top_word_frac
    assert(math.abs(d(m(1L), 3) - 0.5) < 1e-9)        // dup_word_frac
    assert(math.abs(d(m(1L), 4) - (1.0 - 2.0 / 3)) < 1e-6) // dup_bigram_frac
    assert(d(m(2L), 3) == 0.0 && d(m(2L), 4) == 0.0)
    assert(d(m(3L), 4) == 0.0)                        // no bigrams → 0, not null
    assert(math.abs(d(m(4L), 2) - 1.0) < 1e-9 && math.abs(d(m(4L), 3) - 0.75) < 1e-9)
    assert(math.abs(d(m(4L), 4) - (1.0 - 1.0 / 3)) < 1e-6)
  }

  test("decontaminate flags n-gram overlap with the benchmark side only") {
    val train = Seq(
      (1L, "the quick brown fox jumps"),   // shares 'the quick brown' with bench
      (2L, "totally clean document text"),
      (3L, "the quick brown fox runs away fast")).toDF("doc_id", "text")
    val bench = Seq((100L, "the quick brown fox jumps over")).toDF("doc_id", "text")
    val out = TextAnalysis.decontaminate(train, bench, "doc_id", "text",
        n = 3, minOverlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    // doc1 shares 3 trigrams (the-quick-brown, quick-brown-fox, brown-fox-jumps),
    // doc3 shares 2, doc2 none; threshold 2 flags docs 1 and 3
    assert(out == Set((1L, 3L, true), (2L, 0L, false), (3L, 2L, true)))
  }

  test("decontaminate counts distinct grams once per train doc") {
    val train = Seq((1L, "a b a b a b")).toDF("doc_id", "text") // 'a b'/'b a' repeat
    val bench = Seq((9L, "a b c")).toDF("doc_id", "text")
    val r = TextAnalysis.decontaminate(train, bench, "doc_id", "text", n = 2).head()
    assert(r.getLong(1) == 1L && r.getBoolean(2)) // only 'a b' overlaps, counted once
  }

  test("native kernels: unicode splits like the regex tokenizers") {
    // alnum mode: 'é' is a separator (not in [a-z0-9]) — "héllo héllo"
    // yields tokens h,llo,h,llo → 4 words, top=2, dup_word_frac=0.5
    val m = TextAnalysis.repetitionMetrics(
      Seq((1L, "héllo héllo")).toDF("doc_id", "text"), "doc_id", "text").head()
    assert(m.getLong(1) == 4 && m.getDouble(2) == 0.5 && m.getDouble(3) == 0.5)
    // ws mode (via jaccard dedup): accented tokens survive whitespace
    // tokenization, so the identical accented texts still pair up
    val pairs = Dedup.jaccardNearDupPairs(
      Seq((1L, "héllo wörld one"), (2L, "héllo wörld two")).toDF("doc_id", "text"),
      "doc_id", "text", bandWidth = 64, threshold = 0.3, ngram = 1)
    assert(pairs.count() == 1)
  }

  test("repetitionMetrics and decontaminate handle empty/degenerate inputs") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.repetitionMetrics(empty, "doc_id", "text").count() == 0)
    // null and empty texts drop out; a doc of only separators drops too
    val weird = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "!!! ???"), (4L, "ok"))
      .toDF("doc_id", "text")
    assert(TextAnalysis.repetitionMetrics(weird, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(4L))
    // empty benchmark → nothing is contaminated, every train doc present
    val out = TextAnalysis.decontaminate(weird, empty, "doc_id", "text", n = 1)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L) && out.values.forall(_ == false))
  }

  // ---- randomized agreement with driver-side brute force ---------------

  private def randWords(seed: Long, n: Int): String = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
  }

  test("repetitionMetrics agrees with brute force on random word streams") {
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val docs = (1L to 40L).map(i => (i, randWords(i * 31, 1 + (i % 23).toInt)))
    val exp = docs.map { case (id, text) =>
      val ws = text.split(" ").toSeq
      val total = ws.length
      val top = ws.groupBy(identity).values.map(_.size).max
      val bgs = if (ws.length < 2) Nil else ws.sliding(2).map(_.mkString(" ")).toSeq
      id -> ((total.toLong, r6(top.toDouble / total),
        r6(1.0 - ws.distinct.size.toDouble / total),
        if (bgs.isEmpty) 0.0 else r6(1.0 - bgs.distinct.size.toDouble / bgs.size)))
    }.toMap
    val got = TextAnalysis.repetitionMetrics(
        docs.toDF("doc_id", "text").repartition(7), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got == exp)
  }

  test("decontaminate agrees with brute-force set intersection") {
    val n = 3
    def grams(text: String): Set[String] = {
      val ws = text.split(" ").toSeq
      if (ws.length < n) Set.empty
      else ws.sliding(n).map(_.mkString(" ")).toSet
    }
    val train = (1L to 30L).map(i => (i, randWords(i * 17, 2 + (i % 19).toInt)))
    val bench = (1L to 5L).map(i => (100 + i, randWords(i * 911, 15)))
    val benchGrams = bench.flatMap(b => grams(b._2)).toSet
    val exp = train.map { case (id, text) =>
      val k = (grams(text) & benchGrams).size.toLong
      id -> ((k, k >= 2))
    }.toMap
    val got = TextAnalysis.decontaminate(
        train.toDF("doc_id", "text").repartition(5),
        bench.toDF("doc_id", "text"), "doc_id", "text", n = n, minOverlap = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got == exp)
  }
}
