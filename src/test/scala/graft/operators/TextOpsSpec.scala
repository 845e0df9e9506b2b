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
}
