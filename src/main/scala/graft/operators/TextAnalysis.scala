package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting.  Everything here is built from
  * codegen'd `org.apache.spark.sql.functions` (no UDFs) so the whole
  * stage fuses into the scan at any scale.
  */
object TextAnalysis {

  /** Function-word markers per language for the n-gram-free heuristic
    * language ID: score = count of marker-word hits; argmax wins, ties
    * broken by list order.  (A real pipeline would use char-3-gram
    * profiles; the plumbing — per-language score columns + argmax — is
    * identical.)
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans"),
    "es" -> Seq("el", "los", "las", "es", "una", "en", "por"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和"))

  private def markerCount(text: Column, words: Seq[String]): Column =
    regexp_count(text, lit("\\b(" + words.mkString("|") + ")\\b"))

  /** Adds `lang_pred` + per-language hit counts. */
  def langId(docs: DataFrame, textCol: String): DataFrame = {
    val scored = langMarkers.foldLeft(docs) { case (d, (lang, words)) =>
      d.withColumn(s"__hits_$lang", markerCount(lower(col(textCol)), words))
    }
    // argmax via greatest over (count, -order) structs
    val best = langMarkers.zipWithIndex.map { case ((lang, _), i) =>
      struct(col(s"__hits_$lang").as("hits"), lit(-i).as("ord"), lit(lang).as("lang"))
    }
    scored
      .withColumn("lang_pred", greatest(best: _*).getField("lang"))
      .drop(langMarkers.map { case (l, _) => s"__hits_$l" }: _*)
  }

  /** whitespace token count, empty tokens excluded (matches pandas
    * `str.split()` and DuckDB `list_filter(string_split_regex(...))`).
    */
  def wsTokens(t: Column): Column =
    size(filter(split(t, "\\s+"), x => length(x) > 0))

  /** Quality metrics + composite score in [0, 1]:
    * length/punctuation/stopword/word-length signals — the standard cheap
    * pre-filters in corpus cleaning pipelines.
    */
  /** half-up 6-decimal rounding via exact float ops — `round(x, 6)` is
    * half-even in DuckDB and half-up in Spark, which flips on exact
    * boundaries (seen: a quality score of exactly 0.5046875); this form is
    * bit-identical in any engine for non-negative x
    */
  private def r6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6

  def qualityScore(docs: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    // wsTokens is an interpreted lambda expression (outside whole-stage
    // codegen) referenced by three ratios — compute it ONCE as n_tokens
    // and let the ratios read the column (a withColumn chain collapses to
    // one Project, which would otherwise inline the split per consumer)
    docs
      .withColumn("n_chars_q", length(t).cast("long"))
      .withColumn("n_tokens", wsTokens(t).cast("long"))
      .withColumn("punct_ratio",
        r6(regexp_count(t, lit("[.,;:!?]")).cast("double") / greatest(length(t), lit(1))))
      .withColumn("stopword_ratio",
        r6(regexp_count(lower(t), lit("\\b(the|a|of|and|to|in|is)\\b")).cast("double") /
          greatest(col("n_tokens"), lit(1L))))
      .withColumn("mean_word_len",
        r6((length(t) - regexp_count(t, lit("\\s"))).cast("double") /
          greatest(col("n_tokens"), lit(1L))))
      .withColumn("quality_score",
        r6(least(lit(1.0), greatest(lit(0.0),
          lit(0.25) * least(col("n_tokens").cast("double") / 100.0, lit(1.0))
            + lit(0.25) * (lit(1.0) - col("punct_ratio") * 10)
            + lit(0.25) * least(col("stopword_ratio") * 5, lit(1.0))
            + lit(0.25) * least(col("mean_word_len") / 8.0, lit(1.0))))))
  }

  /** Token counts: whitespace tokens and a BPE-ish regex segmentation
    * (letter runs / digit runs / single other-glyphs) — the usual cheap
    * proxy for tokenizer cost estimation.
    */
  def tokenCounts(docs: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("ws_tokens", wsTokens(t).cast("long"))
      .withColumn("re_tokens",
        size(regexp_extract_all(t, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long"))
  }

  /** Top-k TF-IDF terms per document.
    *
    * tf = term count within the doc; df = number of docs containing the
    * term; idf = ln((N + 1) / (df + 1)) + 1 (smoothed, sklearn-style).
    *
    * Shape at scale: the token stream is exploded and aggregated ONCE
    * (partial→final, map-side combined, so the shuffle carries distinct
    * (doc, term) rows, never raw tokens); document frequency is a count
    * window over that same tf frame partitioned by term — a lazy engine
    * cannot share subplans across a self-join, so the window form avoids
    * re-scanning and re-exploding the corpus for df.  The doc count N is
    * a broadcast 1-row aggregate over the id column only (column-pruned
    * scan).  Final top-k is a per-doc window; Spark inserts
    * WindowGroupLimit, so each partition pre-filters to its local top-k
    * BEFORE the exchange.
    */
  def tfidf(docs: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => t =!= lit("")))
        .as("term"))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val df = count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("term")))
    // N as a broadcast 1-row frame: no separate driver action
    val n = docs.agg(countDistinct(col(idCol)).as("__n"))
    val scored = tf.withColumn("df", df)
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf") * (log((col("__n") + 1.0) / (col("df") + 1.0)) + 1.0))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("tfidf").desc, col("term"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(idCol), col("term"), col("tf"),
        round(col("tfidf"), 6).as("tfidf"), col("rk"))
  }

  /** PII / boilerplate scrubbing: replace emails, URLs and long digit runs
    * with typed placeholder tokens, collapse the resulting whitespace, and
    * report per-category hit counts.  Pure `regexp_replace`/`regexp_count`
    * — fuses into the scan, no UDF.  Patterns avoid lookaround and
    * backreferences so they mean the same thing in Java regex and RE2
    * (portable to an external oracle).
    */
  val emailRe  = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
  val urlRe    = "https?://[^ \\t\\n]+"
  val digitsRe = "[0-9][0-9][0-9][0-9][0-9]+"

  /** Gopher-style repetition signals per document (Rae et al. 2021 §A1.1,
    * the standard "repetitious document" filters in corpus cleaning):
    *
    *   - `top_word_frac`   — occurrences of the most frequent word / total
    *     words (ties resolved by taking the max count, so tie order is
    *     irrelevant);
    *   - `dup_word_frac`   — fraction of word occurrences that are repeats
    *     of an earlier occurrence (1 − distinct/total);
    *   - `dup_bigram_frac` — same over adjacent word 2-grams.
    *
    * Shape at scale: a PURE NARROW MAP — per-doc statistics never need a
    * shuffle; the whole operator fuses into the parquet scan: zero
    * exchanges at any corpus size, embarrassingly parallel on 1000
    * executors.  The five counting statistics come from ONE pass over
    * each string via the native codegen'd [[org.apache.spark.sql.graftx.RepStats]]
    * expression (the declarative HOF form — split + zip_with bigrams +
    * array_distinct + sorted run-length aggregate — evaluates its lambdas
    * outside whole-stage codegen, interpreted, with every intermediate
    * array materialized; the native kernel measured ~4× faster on the 10×
    * corpus).  Docs with no words drop out, matching an explode
    * formulation and the SQL oracle's unnest (the pushed-down filter
    * re-evaluates the kernel once — two cheap passes still beat one
    * interpreted HOF pass by far).
    * Reference: dask has no equivalent; this extends the quality-filter
    * tier (qualityScore above) the way a training-data pipeline needs.
    */
  def repetitionMetrics(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.graftx.TextColumns
    val st = col("__st")
    docs.select(col(idCol), TextColumns.repStats(col(textCol)).as("__st"))
      .filter(st.getField("n_words") > 0)
      .select(
        col(idCol),
        st.getField("n_words").as("n_words"),
        r6(st.getField("top").cast("double") / st.getField("n_words"))
          .as("top_word_frac"),
        r6(lit(1.0) - st.getField("n_distinct").cast("double") / st.getField("n_words"))
          .as("dup_word_frac"),
        r6(when(st.getField("n_bigrams") > 0,
            lit(1.0) - st.getField("n_bigrams_distinct").cast("double") /
              st.getField("n_bigrams"))
          .otherwise(lit(0.0))).as("dup_bigram_frac"))
  }

  /** Benchmark decontamination: flag training documents that share at
    * least `minOverlap` distinct word `n`-grams with any benchmark
    * document — the standard n-gram-overlap eval-contamination check run
    * before training (e.g. GPT-3 appendix C / PaLM-style 8-gram rules;
    * `n` and the threshold are caller-tunable).
    *
    * Shape at scale: each side is reduced to DISTINCT (gram) /
    * (doc, gram) rows before the join, so the shuffle carries the gram
    * vocabulary, not token occurrences.  Gram construction + hashing is
    * the native codegen'd [[org.apache.spark.sql.graftx.NgramHashes]]
    * expression — one string scan emitting the distinct 64-bit gram
    * hashes directly (the declarative zip_with-chain form evaluated an
    * interpreted lambda per chain link and materialized ever-longer gram
    * strings; output is identical because consumers only test hash
    * equality).  Join keys are fixed-width int64 — gram text never
    * shuffles.  The benchmark side (eval sets: thousands of docs, not
    * billions) is broadcast, making the whole check a narrow map over the
    * training corpus followed by one partial→final count per doc.  A
    * 100 TB corpus therefore pays one scan + one broadcast-join — no
    * all-pairs, no corpus-side shuffle at all.
    */
  def decontaminate(train: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, n: Int = 5, minOverlap: Int = 1): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    import org.apache.spark.sql.graftx.TextColumns
    def grams(d: DataFrame, id: Seq[Column]): DataFrame =
      d.select((id :+ explode(TextColumns.ngramHashes(col(textCol), n)).as("__gh")): _*)
    // (doc, gram) rows are already distinct: the kernel emits each doc's
    // gram-hash set — no extra shuffle
    val trainGrams = grams(train, Seq(col(idCol)))
    val benchGrams = grams(bench, Nil).distinct()
    val hits = trainGrams.join(broadcast(benchGrams), Seq("__gh"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_overlap"))
    // idCol is unique per doc (the module-wide convention, as in Dedup):
    // joining the raw id column — not a distinct of it — drops a wasted
    // corpus-wide exchange.  No broadcast hint on `hits`: in the normal
    // case (contaminated docs ≪ corpus) AQE sees its runtime size and
    // converts to a broadcast join, keeping the train side exchange-free;
    // in the adversarial all-contaminated case it falls back to a shuffle
    // join instead of OOMing a forced broadcast.
    train.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) >= minOverlap).as("contaminated"))
  }

  /** Exact duplicated-SPAN scrub — the token-level companion of document
    * dedup (the "exact substring deduplication" of Lee et al.,
    * *Deduplicating Training Data Makes Language Models Better*;
    * reference-adjacent to `Dedup.exact`, which only removes whole
    * documents): any token whose surrounding `k`-gram occurs in ≥ 2
    * DISTINCT documents is dropped, and the cleaned text re-joined.
    *
    * Plan shape at corpus scale: one narrow pass builds positional
    * `k`-gram keys (64-bit hashes — grams themselves never shuffle; as
    * with `decontaminate`, any collision-free hash family is
    * observationally equivalent to gram-string equality), ONE shuffle
    * groups them by gram to find cross-doc duplicates, a leftsemi join
    * flags the duplicated gram STARTS, and a per-doc native
    * [[org.apache.spark.sql.graftx.SpanScrub]] kernel drops covered
    * positions with a sorted-interval merge — O(T + S log S) per doc
    * (S = duplicated starts), parallel per doc, no all-pairs anywhere.
    * `hof = true` selects the declarative `exists(starts, s ≤ p < s+k)`
    * filter-HOF form instead (O(T·S), interpreted lambdas) — kept as the
    * independently-written reference the property suite checks the
    * kernel against.
    */
  def dedupSpans(docs: DataFrame, idCol: String, textCol: String,
                 k: Int = 8, hof: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = docs.select(col(idCol),
      filter(split(col(textCol), "\\s+"), t => t =!= "").as("__toks"))
    // positional gram hashes: start s (0-based) → hash of tokens [s, s+k)
    val gramArr = when(size(col("__toks")) < k, array().cast("array<bigint>"))
      .otherwise(transform(
        sequence(lit(1), size(col("__toks")) - (k - 1)),
        s => xxhash64(concat_ws(" ", slice(col("__toks"), s, lit(k))))))
    // the positional-gram subplan feeds TWO consumers (the duplicate-gram
    // aggregate and the postings semi-join) and Spark shares no subplans,
    // so the tokenize+slice+hash kernel would run twice — persist the
    // postings per-invocation (freed by the session's cache clear, same
    // pattern as the jaccard gram index)
    val grams = toks.select(col(idCol), posexplode(gramArr).as(Seq("__s", "__gh")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // grams occurring in >= 2 distinct docs (partial→final agg on the hash)
    val dup = grams.groupBy(col("__gh"))
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= 2)
      .select(col("__gh"))
    val dupStarts = grams.join(dup, Seq("__gh"), "leftsemi")
      .groupBy(col(idCol)).agg(collect_list(col("__s")).as("__starts"))
    val joined = toks.join(dupStarts, Seq(idCol), "left")
      .select(col(idCol), col("__toks"),
        coalesce(col("__starts"), array().cast("array<int>")).as("__starts"))
    if (hof)
      joined
        .select(col(idCol),
          size(col("__toks")).cast("long").as("n_tokens"),
          filter(col("__toks"), (t, p) =>
            !exists(col("__starts"), s => s <= p && p < s + k)).as("__clean"))
        .select(col(idCol), col("n_tokens"),
          (col("n_tokens") - size(col("__clean"))).cast("long").as("n_dropped"),
          concat_ws(" ", col("__clean")).as("clean_text"))
    else
      joined
        .select(col(idCol), org.apache.spark.sql.graftx.TextColumns
          .spanScrub(col("__toks"), col("__starts"), k).as("__sc"))
        .select(col(idCol), col("__sc.n_tokens").as("n_tokens"),
          col("__sc.n_dropped").as("n_dropped"),
          col("__sc.clean_text").as("clean_text"))
  }

  def scrub(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(col(idCol),
      regexp_count(t, lit(emailRe)).as("n_emails"),
      regexp_count(t, lit(urlRe)).as("n_urls"),
      // count digit runs AFTER the email/url passes so an id inside a URL
      // is not double-counted
      regexp_count(
        regexp_replace(regexp_replace(t, emailRe, "<EMAIL>"), urlRe, "<URL>"),
        lit(digitsRe)).as("n_numbers"),
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(t, emailRe, "<EMAIL>"),
            urlRe, "<URL>"),
          digitsRe, "<NUM>"),
        "[ \\t]+", " ").as("scrubbed"))
  }
}
