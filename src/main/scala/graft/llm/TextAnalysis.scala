package graft.llm

import graft.queries.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table: language-ID
  * (marker-token heuristic), quality scoring (length / punctuation /
  * stopword ratios), token counting (whitespace + BPE-ish regex), and
  * document fingerprinting (polynomial rolling hash).
  *
  * Every operator is a pure column-expression pipeline (codegen'd, no
  * UDFs) whose arithmetic the DuckDB oracle reproduces exactly; ratios
  * guard division with nullif so the plans stay ANSI-safe.
  */
object TextAnalysis {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")

  // -------------------------------------------------- q32: language ID

  /** Marker stopword profiles. Tiny on purpose: language-ID at pipeline
    * scale is a per-token lookup + ratio, not a model.
    */
  private[llm] val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "les", "et", "est", "une")
  )

  /** (doc_id, pred_lang, score_en) over any (doc_id, text) frame —
    * q32's scored frame, shared with q171's per-language
    * tokenizer-fertility rollup (which feeds a marker-mangled corpus).
    */
  private[llm] def langScored(docsDf: DataFrame): DataFrame = {
    val withScores = langMarkers.foldLeft(
      docsDf.select(col("doc_id"), split(col("text"), " ").as("w"))
    ) { case (df, (lang, markers)) =>
      df.withColumn(
        s"score_$lang",
        size(filter(col("w"), x => x.isin(markers: _*))) /
          nullIfZero(size(col("w")).cast("double"))
      )
    }
    // deterministic argmax with fixed priority order en > es > de > fr
    val pred = langMarkers.map(_._1) match {
      case Seq(l1, l2, l3, l4) =>
        when(
          col(s"score_$l1") >= greatest(col(s"score_$l2"), col(s"score_$l3"), col(s"score_$l4")),
          lit(l1)
        ).when(col(s"score_$l2") >= greatest(col(s"score_$l3"), col(s"score_$l4")), lit(l2))
          .when(col(s"score_$l3") >= col(s"score_$l4"), lit(l3))
          .otherwise(lit(l4))
    }
    withScores.select(col("doc_id"), pred.as("pred_lang"), col("score_en"))
  }

  private def q32(s: SparkSession, dir: String): DataFrame =
    langScored(docs(s, dir))
      .select(
        col("doc_id"),
        col("pred_lang"),
        round(col("score_en"), 4).as("score_en")
      )
      .orderBy("doc_id")

  // ---------------------------------------------- q33: quality scoring

  /** q33c: character-entropy quality signal — Shannon entropy of each
    * document's a–z letter distribution, the Gopher-family screen that
    * catches keyboard-mash and single-character spam which length and
    * stopword ratios (q33) miss (natural English sits near ~2.9 nats;
    * degenerate text collapses toward 0).
    *
    * Determinism contract: NO explode and NO data-dependent float sum —
    * the alphabet is a FIXED 26-letter vocabulary, so per-letter counts
    * are 26 map-side `length(replace(...))` integer columns and the
    * entropy is a LITERAL a→z-ordered sum of 26 terms with exact
    * rational p = c/total inputs; the only libm call is ln (the
    * q51/q57/q90 precedent) under the round-4 grid. Corpus cost: one
    * map-only pass, zero shuffles beyond the oracle-compare sort.
    */
  private def q33c(s: SparkSession, dir: String): DataFrame = {
    val letters = ('a' to 'z').map(_.toString)
    val base = docs(s, dir).select(
      (col("doc_id") +: letters.map(ch =>
        (length(col("text")) - length(expr(s"replace(text, '$ch', '')"))).as(s"c_$ch")
      )): _*
    )
    val total = letters.map(ch => col(s"c_$ch")).reduce(_ + _)
    val withTotal = base.withColumn("n_letters", total.cast("long"))
    val terms = letters.map { ch =>
      val p = col(s"c_$ch").cast("double") / col("n_letters").cast("double")
      when(col(s"c_$ch") > 0, p * log(p)).otherwise(lit(0.0))
    }
    withTotal
      .select(
        col("doc_id"),
        col("n_letters"),
        when(
          col("n_letters") > 0,
          round(-terms.reduce(_ + _), 4) + lit(0.0)
        ).as("char_entropy")
      )
      .orderBy("doc_id")
  }

  private def q33(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), col("text"), split(col("text"), " ").as("w"))
      .select(
        col("doc_id"),
        size(col("w")).as("n_tokens"),
        round(
          length(regexp_replace(col("text"), "[^a-z]", "")) /
            nullIfZero(length(col("text")).cast("double")),
          4
        ).as("alpha_ratio"),
        round(
          length(regexp_replace(col("text"), "[^.,!?;:]", "")) /
            nullIfZero(length(col("text")).cast("double")),
          4
        ).as("punct_ratio"),
        round(
          size(filter(col("w"), x => x.isin("the", "a", "of", "and", "is", "to", "in"))) /
            nullIfZero(size(col("w")).cast("double")),
          4
        ).as("stopword_ratio"),
        round(
          length(col("text")) / nullIfZero(size(col("w")).cast("double")),
          4
        ).as("avg_token_len")
      )
      .orderBy("doc_id")

  /** q33b: adaptive length filter — keep the middle 80% of the corpus by
    * n_chars, thresholds derived FROM the data (the "drop the tails"
    * step real curation pipelines run before training). Semantics in
    * pure integer rank arithmetic so both engines agree bit-for-bit
    * (interpolated percentiles differ across engines by ulps, which
    * flips membership of boundary documents): keep a document iff
    *   cume_dist  = |docs with n_chars ≤ mine| / n > 0.10   and
    *   lower_frac = |docs with n_chars < mine| / n < 0.90
    * compared as `10·cum_le > n` and `10·cum_lt < 9·n` — no division,
    * no floats, reproducible everywhere.
    *
    * Scale shape: one hash aggregate per DISTINCT length (bounded by the
    * max document length, not the corpus), a cumulative-sum window over
    * that small per-length frame — NOT over the corpus — and an
    * unhinted equi-join back on n_chars (AQE broadcasts the per-length
    * frame when it is small, which it always is). The corpus streams
    * once; nothing corpus-sized is sorted or single-partitioned.
    */
  private def q33b(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(s, dir)
    val perLength = d.groupBy("n_chars").agg(count(lit(1)).as("c"))
    val cum = perLength
      .withColumn("cum_le", sum("c").over(Window.orderBy("n_chars")))
      .withColumn("cum_lt", col("cum_le") - col("c"))
    val total = d.agg(count(lit(1)).as("n"))
    d.join(cum, "n_chars")
      .crossJoin(broadcast(total)) // 1-row count: bounded by construction
      .filter(col("cum_le") * 10 > col("n") && col("cum_lt") * 10 < col("n") * 9)
      .select(col("doc_id"), col("n_chars"))
      .orderBy("doc_id")
  }

  // ----------------------------------------------- q34: token counting

  /** Whitespace tokens and a BPE-ish regex tokenization ([a-z]+ words,
    * single digits, single punctuation marks) — the pre-tokenizer shape
    * most BPE vocabularies assume.
    */
  private val BpeTokenRe = "[a-z]+|[0-9]|[^a-z0-9\\s]"

  private def q34(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(
        col("lang"),
        size(split(col("text"), " ")).as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit(BpeTokenRe), lit(0))).as("bpe_tokens"),
        length(col("text")).as("n_chars")
      )
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ws_tokens")).as("total_ws_tokens"),
        sum(col("bpe_tokens")).as("total_bpe_tokens"),
        round(avg(col("n_chars")), 2).as("avg_chars")
      )
      .orderBy("lang")

  // --------------------------------------------- q35: fingerprinting

  /** Polynomial rolling hash mod 2³¹−1 over the character stream — a
    * deterministic 31-bit document fingerprint (the building block of
    * rolling-window fingerprint schemes like winnowing). acc stays
    * < 2³¹ so acc*31+c never overflows a Long.
    */
  private def q35(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(
        col("doc_id"),
        aggregate(
          transform(split(col("text"), ""), c => ascii(c)),
          lit(0L),
          (acc, c) => (acc * 31 + c) % 2147483647L
        ).as("fingerprint")
      )
      .orderBy("doc_id")

  /** DuckDB fragment for a marker-stopword ratio over `text` — the SQL
    * twin of the q32/q47 score columns, kept here so the two oracles can
    * never drift from the Scala marker lists.
    */
  private[llm] def markerScoreSql(words: Seq[String]): String = {
    val list = words.map(w => s"'$w'").mkString(",")
    s"len(list_filter(string_split(text, ' '), x -> x IN ($list))) / nullif(len(string_split(text, ' ')), 0)::DOUBLE"
  }

  private[llm] def nullIfZero(c: Column): Column =
    when(c === 0, lit(null)).otherwise(c)

  /** q34b: corpus-level vocabulary top-k — the frequency profile used to
    * spot boilerplate/templated text in a training corpus. Shape at
    * scale: explode → partial map-side count per token → one shuffle on
    * the token (vocabulary-sized, not corpus-sized) → final count →
    * TakeOrderedAndProject (top-k never materializes a full sort).
    */
  private def q34b(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("w"))
      .limit(20)

  /** q57b: bigram-LM surprisal — mean negative log conditional
    * probability -avg(ln P(w2|w1)) with P(w2|w1) = c(w1 w2)/c(w1·),
    * both counts from the corpus itself (the step from q57's unigram
    * stand-in toward real perplexity filtering; repetitive/templated
    * docs score near 0, token-salad scores high). The bigram table is
    * vocabulary²-sized so BOTH count joins run unhinted (the q51/q57
    * rationale: AQE broadcasts only what it measures small); the pair
    * stream comes from the same Generate shape as q34c — no self-join.
    */
  private def q57b(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val pairs = docs(s, dir)
      .filter(size(toks) >= 2)
      .select(
        col("doc_id"),
        explode(
          zip_with(
            slice(toks, lit(1), size(toks) - 1),
            slice(toks, lit(2), size(toks) - 1),
            (a, b) => struct(a.as("w1"), b.as("w2"))
          )
        ).as("p")
      )
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val big = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val pre = pairs.groupBy("w1").agg(count(lit(1)).as("c1"))
    pairs
      .join(big, Seq("w1", "w2"))
      .join(pre, Seq("w1"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(-avg(log(col("c12") / col("c1"))), 4).as("bigram_surprisal")
      )
      .orderBy("doc_id")
  }

  /** q34d: vocabulary coverage / OOV rate — the go/no-go metric for a
    * fixed tokenizer vocabulary over a new corpus: what fraction of
    * token occurrences the top-K vocabulary covers, per language. The
    * vocab frame is top-K by construction (LIMIT), so its broadcast is
    * bounded no matter the corpus; the token stream joins it map-side
    * and aggregates with partial counts — one pass, one shuffle on lang.
    */
  private val VocabK = 20

  private def q34d(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val vocab = toks
      .groupBy("w")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("w"))
      .limit(VocabK)
      .select(col("w"), lit(1).as("in_vocab"))
    toks
      .join(broadcast(vocab), Seq("w"), "left") // bounded: VocabK rows
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(coalesce(col("in_vocab"), lit(0))).cast("long").as("covered")
      )
      .select(
        col("lang"),
        col("n_tokens"),
        col("covered"),
        round(col("covered") / col("n_tokens").cast("double"), 4).as("coverage")
      )
      .orderBy("lang")
  }

  /** q34c: adjacent-pair (bigram) frequency — the merge-candidate count
    * at the heart of one BPE training iteration, at token granularity.
    * The pair column materializes inside a Generate (`explode` of a
    * `zip_with` over two shifted slices — no self-join, no shuffle of
    * the corpus beyond the final pair aggregation, which partial-aggs
    * map-side); top-20 with a full deterministic tie-break.
    */
  private def q34c(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    docs(s, dir)
      .filter(size(toks) >= 2)
      .select(
        explode(
          zip_with(
            slice(toks, lit(1), size(toks) - 1),
            slice(toks, lit(2), size(toks) - 1),
            (a, b) => concat_ws(" ", a, b)
          )
        ).as("pair")
      )
      .groupBy("pair")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("pair"))
      .limit(20)
  }

  /** q51: TF-IDF top-3 terms per document — the classic salient-term
    * profile used for topic tagging and template detection in corpus
    * curation. Shape at scale: tf is the only corpus-sized frame (one
    * shuffle on (doc_id, term)); df joins back UNHINTED — a real web
    * corpus's vocabulary (typos, numbers, code) runs 10⁸–10⁹ terms, past
    * any broadcast limit, so AQE decides: broadcast when df is actually
    * small, shuffled equi-join on the term otherwise. Only the 1-row doc
    * count keeps an explicit broadcast (bounded by construction). The
    * per-doc top-3 ranks with WindowGroupLimit so no full sort of the
    * scored frame materializes.
    * idf = ln((N+1)/(df+1)) (smoothed; double ln agrees across engines
    * well past the round(4) horizon).
    */
  private def q51(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "w")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val n = docs(s, dir).agg(count(lit(1)).as("n_docs"))
    val rankW = Window.partitionBy("doc_id").orderBy(desc("tfidf"), col("w"))
    tf.join(df, "w")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", col("tf") * log((col("n_docs") + 1.0) / (col("df") + 1.0)))
      .withColumn("rn", row_number().over(rankW))
      .filter(col("rn") <= 3)
      .select(
        col("doc_id"),
        col("rn"),
        col("w"),
        col("tf"),
        col("df"),
        round(col("tfidf"), 4).as("tfidf")
      )
      .orderBy("doc_id", "rn")
  }

  /** q53: redaction/scrubbing pass — the PII-removal stage of a curation
    * pipeline, demonstrated with a lexicon of whole-word targets plus a
    * digit-run pattern (the shape email/phone/SSN scrubbing takes; the
    * synthetic corpus has no real PII, the lexicon words stand in).
    * Pure regexp_replace column pipeline; the md5 of the scrubbed text
    * pins byte-exact replacement behavior against the oracle, and the
    * redaction count is measured BEFORE replacement so it can't drift
    * from the scrub itself.
    */
  private val ScrubRe = "\\b(customer|order|user|[0-9]+)\\b"

  private def q53(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(ScrubRe), lit(0)))
          .as("n_redactions"),
        md5(regexp_replace(col("text"), ScrubRe, "[REDACTED]"))
          .as("scrubbed_md5"),
        length(regexp_replace(col("text"), ScrubRe, "[REDACTED]"))
          .as("scrubbed_len")
      )
      .orderBy("doc_id")

  /** q55: repetition detection — the max-repeated-3-gram ratio, the
    * standard boilerplate/templated-text signal (Rae et al.'s Gopher
    * rules use exactly this family). Non-distinct 3-grams per doc, one
    * (doc, gram) count, one per-doc rollup; docs with < 3 tokens have no
    * 3-grams and drop out (both engines agree).
    */
  private def q55(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(
        col("doc_id"),
        explode(
          expr(
            "CASE WHEN size(w) >= 3 THEN " +
              "transform(sequence(1, size(w)-2), i -> concat_ws('_', w[i-1], w[i], w[i+1])) " +
              "ELSE array() END"
          )
        ).as("g")
      )
      .groupBy("doc_id", "g")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(
        sum("cnt").as("n_grams"),
        max("cnt").as("max_rep")
      )
      .withColumn("rep_ratio", round(col("max_rep") / col("n_grams"), 4))
      .orderBy("doc_id")

  /** q57: unigram-LM surprisal — mean negative log-probability of a
    * document under the corpus's own unigram distribution (the cheap
    * stand-in for CCNet-style perplexity filtering: outlier docs score
    * high). The vocabulary-sized frequency table joins back onto the
    * token stream UNHINTED (same rationale as q51: a web-scale vocab is
    * not driver-broadcastable; AQE broadcasts only when it measures
    * small); only the 1-row total keeps an explicit broadcast. One
    * per-doc aggregation after the join.
    */
  private def q57(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val freq = toks.groupBy("w").agg(count(lit(1)).as("freq"))
    val total = toks.agg(count(lit(1)).as("n_total"))
    toks
      .join(freq, "w")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        round(-avg(log(col("freq") / col("n_total"))), 4).as("surprisal")
      )
      .orderBy("doc_id")
  }

  /** q67: per-language corpus statistics — the health dashboard a corpus
    * build emits per snapshot: document/token/type counts, type-token
    * ratio, hapax-legomenon count, and the Zipf slope (regr_slope of
    * ln(freq) on ln(rank) over the top-100 terms; natural text ≈ −1,
    * template/boilerplate corpora flatten toward 0 — a cheap drift
    * alarm between crawls).
    *
    * Scale shape: one token-count aggregation (vocabulary-sized, the
    * q51/q57 rationale), then everything downstream operates on
    * per-language or vocabulary-sized frames — the rank window
    * partitions BY LANGUAGE over the vocab frame, never the corpus, and
    * the regression runs over ≤100 rows per language. regr_slope is
    * algebraic (partial-aggregable sums), so Spark computes it with
    * map-side combine — no value collection anywhere.
    */
  private def q67(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(s, dir)
    val toks = d
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val tf = toks.groupBy("lang", "w").agg(count(lit(1)).as("c"))
    val stats = tf
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_types"),
        sum("c").as("n_tokens"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax")
      )
    val nDocs = d.groupBy("lang").agg(count(lit(1)).as("n_docs"))
    val zipf = tf
      .withColumn(
        "rn",
        row_number().over(
          Window.partitionBy("lang").orderBy(col("c").desc, col("w"))
        )
      )
      .filter(col("rn") <= 100)
      .select(col("lang"), log(col("c")).as("ln_c"), log(col("rn")).as("ln_rn"))
      .groupBy("lang")
      .agg((round(expr("regr_slope(ln_c, ln_rn)"), 4) + 0.0).as("zipf_slope"))
    stats
      .join(nDocs, "lang")
      .join(zipf, "lang")
      .select(
        col("lang"),
        col("n_docs"),
        col("n_tokens"),
        col("n_types"),
        round(col("n_types") * lit(1.0) / col("n_tokens"), 4).as("type_token_ratio"),
        col("hapax"),
        col("zipf_slope")
      )
      .orderBy("lang")
  }

  /** q69: token-distribution drift between corpus splits — Laplace-
    * smoothed unigram KL (both directions) and Jensen-Shannon divergence
    * between the q43 train bucket (md5 < 80) and the rest, per language.
    * The alarm a corpus build runs between snapshots / between train and
    * validation: a drifting crawl or a skewed split shows up as rising
    * divergence long before eval metrics move.
    *
    * Scale shape: ONE token aggregation produces both splits' counts
    * (sum-of-when, no join of two token streams), per-language totals
    * broadcast back (a #languages-row frame, bounded by construction),
    * and the divergences are algebraic sums over the vocabulary frame —
    * map-side combinable, nothing corpus-sized past the first aggregate.
    * Smoothing is over the UNION vocabulary, so both distributions sum
    * to exactly 1 and absent-in-one-split tokens contribute their full
    * penalty instead of being dropped.
    */
  private def q69(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir)
      .select(
        col("lang"),
        (Sampling.bucket100(col("doc_id")) < 80).as("is_a"),
        explode(split(col("text"), " ")).as("w")
      )
      .filter(col("w") =!= "")
    val cnt = toks
      .groupBy("lang", "w")
      .agg(
        sum(when(col("is_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("cb")
      )
    val tot = cnt
      .groupBy("lang")
      .agg(sum("ca").as("na"), sum("cb").as("nb"), count(lit(1)).as("vocab"))
    val pq = cnt
      .join(broadcast(tot), "lang")
      .select(
        col("lang"),
        ((col("ca") + lit(1.0)) / (col("na") + col("vocab"))).as("p"),
        ((col("cb") + lit(1.0)) / (col("nb") + col("vocab"))).as("q")
      )
    val agg = pq
      .groupBy("lang")
      .agg(
        (round(sum(col("p") * log(col("p") / col("q"))), 4) + 0.0).as("kl_ab"),
        (round(sum(col("q") * log(col("q") / col("p"))), 4) + 0.0).as("kl_ba"),
        (round(
          lit(0.5) * sum(col("p") * log(col("p") / ((col("p") + col("q")) / 2))) +
            lit(0.5) * sum(col("q") * log(col("q") / ((col("p") + col("q")) / 2))),
          4
        ) + 0.0).as("js")
      )
    agg
      .join(tot, "lang")
      .select("lang", "na", "nb", "vocab", "kl_ab", "kl_ba", "js")
      .orderBy("lang")
  }

  // ------------------------------------------ q149: NFC normalization

  /** q149: Unicode NFC canonical normalization — the zeroth scrub of a
    * multilingual corpus build (canonically-equivalent byte sequences
    * must hash/dedup/join identically; skipping it makes exact dedup
    * silently miss duplicates). The kernel is the codegen'd
    * [[graft.functions.UnicodeNfc]] expression — zero-copy on
    * already-normalized rows, which dominate real corpora, so the scan
    * stays at parquet speed. The gate prepends a crafted combining-mark
    * sequence to every document so the normalizer is load-bearing on
    * every row (the synthetic corpus itself is ASCII = already NFC);
    * DuckDB's utf8proc-backed `nfc_normalize` is the independent oracle
    * — both sides implement UAX #15, bit-identical on assigned code
    * points by Unicode's normalization stability policy.
    */
  private def q149(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expr => cexpr}
    // C a f e U+0301 ␠ n i n U+0303 o ␠  — composes to "Café niño "
    val raw  = concat(lit("Cafe\u0301 nin\u0303o "), col("text"))
    val norm = column(graft.functions.UnicodeNfc(cexpr(raw)))
    docs(s, dir)
      .select(
        col("doc_id"),
        length(raw).as("len_raw"),
        length(norm).as("len_norm"),
        md5(norm).as("norm_md5")
      )
      .orderBy("doc_id")
  }

  /** q159: corpus-level n-gram diversity (distinct-n) — the metric a
    * synthetic-data or dedup pipeline tracks round over round: the
    * distinct/total ratio of 1/2/3-grams ACROSS the corpus (per-doc
    * repetition is q55's job; cross-doc mode collapse only shows up
    * here — a generator emitting the same fluent paragraph everywhere
    * scores perfect per-doc diversity and craters this one). All three
    * gram orders ride ONE map pass (tagged structs flattened from the
    * shifted-slice zip_with gram builders — see the body comment for
    * the measured 8× over a per-index walk) into ONE (n, gram) hash
    * aggregate with map-side combine; the per-n rollup then runs over
    * the distinct-gram frame. The gram shuffle is vocabulary-sized
    * (distinct grams), not corpus-sized — the one-shuffle shape; at
    * extreme scale approx_count_distinct is the documented swap-in for
    * the same ratio.
    */
  private def q159(s: SparkSession, dir: String): DataFrame =
    ngramDiversity(s, dir, useApprox = false)

  /** The q159 computation with its 100 TB swap-in as CODE, not prose:
    * `useApprox = true` replaces the exact (n, gram) count aggregate
    * with `approx_count_distinct` (HLL++, rsd 1%) — the distinct side
    * then never shuffles grams at all (partial sketches merge,
    * ~1.5 KB/sketch), turning the vocabulary-sized shuffle into a
    * constant-sized one; `total_ngrams` is a plain count either way.
    * TextAnalysisApproxSpec pins the approx ratios within 5% of the
    * exact gate's on the test corpus. The exact form stays the GATE:
    * hash-checkable, and right up to the corpus size where vocabulary
    * ≫ executor memory.
    */
  private[graft] def ngramDiversity(
      s: SparkSession,
      dir: String,
      useApprox: Boolean
  ): DataFrame = {
    // Gram construction is the q135 pairCounts SHIFTED-SLICE zip_with
    // (n slices offset by 0..n−1, zipped with concat), NOT a per-index
    // transform+slice walk: the index walk re-slices inside a
    // non-codegen HOF once per gram position and measured 6.3 s at
    // sf0.1 where this form measures 0.8 s (8×) for identical output.
    // Short docs guard to empty arrays on both engines.
    val ws = col("ws")
    val g2 = when(
      size(ws) >= 2,
      zip_with(
        slice(ws, lit(1), size(ws) - 1),
        slice(ws, lit(2), size(ws) - 1),
        (a, b) => concat(a, lit(" "), b)
      )
    ).otherwise(array().cast("array<string>"))
    val g3 = when(
      size(ws) >= 3,
      zip_with(
        zip_with(
          slice(ws, lit(1), size(ws) - 2),
          slice(ws, lit(2), size(ws) - 2),
          (a, b) => concat(a, lit(" "), b)
        ),
        slice(ws, lit(3), size(ws) - 2),
        (ab, c) => concat(ab, lit(" "), c)
      )
    ).otherwise(array().cast("array<string>"))
    val tagged = flatten(
      array(
        transform(ws, x => struct(lit(1).as("n"), x.as("g"))),
        transform(g2, x => struct(lit(2).as("n"), x.as("g"))),
        transform(g3, x => struct(lit(3).as("n"), x.as("g")))
      )
    )
    val exploded = docs(s, dir)
      .select(filter(split(col("text"), " "), w => w =!= "").as("ws"))
      .select(explode(tagged).as("p"))
    val perN =
      if (useApprox)
        // one aggregate keyed by n alone: count + merged HLL sketch —
        // no gram ever crosses the wire
        exploded
          .groupBy(col("p.n").as("n"))
          .agg(
            count(lit(1)).as("total_ngrams"),
            approx_count_distinct(col("p.g"), rsd = 0.01)
              .as("distinct_ngrams")
          )
      else
        exploded
          .groupBy(col("p.n").as("n"), col("p.g").as("g"))
          .agg(count(lit(1)).as("c"))
          .groupBy("n")
          .agg(
            sum("c").as("total_ngrams"),
            count(lit(1)).as("distinct_ngrams")
          )
    perN
      .select(
        col("n"),
        col("total_ngrams"),
        col("distinct_ngrams"),
        (round(
          col("distinct_ngrams").cast("double") / col("total_ngrams").cast("double"),
          6
        ) + 0.0).as("distinct_ratio")
      )
      .orderBy("n")
  }

  /** Head-of-vocabulary size for the q168 Zipf fit — the power law is a
    * head phenomenon (the tail is hapax noise), and a fixed K makes the
    * fit comparable corpus-to-corpus.
    */
  private val ZipfK = 500

  /** q168: Zipf-law fit over the corpus vocabulary — the one-number
    * naturalness check a data pipeline runs on anything synthetic or
    * scraped: natural language's rank-frequency head follows
    * freq ∝ rank^(−s) with s ≈ 1; template spam, boilerplate floods,
    * and collapsed generators bend the log-log line visibly before any
    * downstream eval does. Computed as the OLS fit of
    * ln(freq) ~ ln(rank) over the top-[[ZipfK]] words (rank ties
    * broken alphabetically — deterministic across engines).
    *
    * Determinism (the q120 moment discipline, log-grid flavor): each
    * ln snaps to the micro grid (floor ×10⁶) per ROW, moments are
    * exact DECIMAL(38) sums of BIGINT products, and
    * slope/intercept/R² are a fixed dag of IEEE ops on the moment
    * scalars — no float ever accumulates across rows.
    *
    * Scale shape: one corpus token aggregate (map-side combined,
    * vocabulary-sized shuffle), a TakeOrdered top-K (never a global
    * sort), a K-row window for ranks (bounded by construction — the
    * q71 post-limit convention), one 1-row aggregate.
    */
  private def q168(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("word"))
    val top = docs(s, dir)
      .select(explode(filter(split(col("text"), " "), x => x =!= "")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(ZipfK)
      .withColumn("rank", row_number().over(w))
      .select(
        floor(log(col("rank").cast("double")) * 1000000.0).cast("long").as("x"),
        floor(log(col("cnt").cast("double")) * 1000000.0).cast("long").as("y")
      )
    top
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("x").cast("decimal(38,0)")).cast("double").as("sx"),
        sum(col("y").cast("decimal(38,0)")).cast("double").as("sy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).cast("double").as("sxx"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).cast("double").as("sxy"),
        sum((col("y") * col("y")).cast("decimal(38,0)")).cast("double").as("syy")
      )
      .select(
        col("n").cast("long").as("n_words"),
        // un-grid (×10⁻⁶ each axis) folds into the ratios: slope is
        // grid-free, intercept carries one 10⁻⁶ factor
        (round(
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")),
          4
        ) + 0.0).as("zipf_slope"),
        (round(
          (col("sy") - col("sx") *
            ((col("n") * col("sxy") - col("sx") * col("sy")) /
              (col("n") * col("sxx") - col("sx") * col("sx")))) /
            col("n") / 1000000.0,
          4
        ) + 0.0).as("intercept_ln"),
        (round(
          ((col("n") * col("sxy") - col("sx") * col("sy")) *
            (col("n") * col("sxy") - col("sx") * col("sy"))) /
            ((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy"))),
          4
        ) + 0.0).as("r_squared")
      )
  }

  // ------------- q180: vocabulary richness estimators (Chao1 + Good–Turing)

  /** q180: how much vocabulary has the crawl NOT seen yet — the
    * collection-planning companion of q168's naturalness check (Zipf
    * says the head is natural; this says how much TAIL is left): the
    * bias-corrected Chao1 species-richness estimate
    * V + f1·(f1−1)/(2·(f2+1)) (defined even when no doubletons exist)
    * and the Good–Turing unseen-probability mass f1/N (singleton share
    * of tokens — also the corpus "coverage" via its complement), from
    * the singleton/doubleton counts of the q168-convention word
    * frequency table. A corpus whose Chao1 keeps rising crawl over
    * crawl still has vocabulary to harvest; a GT mass near zero says
    * new text mostly re-uses known words.
    *
    * Scale shape: the corpus aggregates to the vocabulary-sized count
    * frame (the one shuffle, map-side combined), then ONE 1-row reduce
    * over it; everything downstream is arithmetic on five exact
    * integers — no windows, no joins.
    */
  private def q180(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(explode(filter(split(col("text"), " "), x => x =!= "")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .agg(
        count(lit(1)).as("v_obs"),
        sum(col("cnt")).as("n_tokens"),
        sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("cnt") === 2, 1L).otherwise(0L)).as("f2")
      )
      .select(
        col("v_obs"),
        col("n_tokens"),
        col("f1"),
        col("f2"),
        (round(
          col("v_obs").cast("double") +
            (col("f1") * (col("f1") - 1)).cast("double") /
              ((col("f2") + 1) * 2).cast("double"),
          4
        ) + 0.0).as("chao1"),
        (round(
          col("f1").cast("double") / nullif(col("n_tokens"), lit(0L)).cast("double"),
          6
        ) + 0.0).as("gt_unseen_mass"),
        (round(
          lit(1.0d) - col("f1").cast("double") /
            nullif(col("n_tokens"), lit(0L)).cast("double"),
          6
        ) + 0.0).as("coverage")
      )

  // ------------- q188: token-frequency concentration (vocabulary Gini)

  /** q188: Gini coefficient of the token-frequency distribution — how
    * much of the corpus a few words own (natural text is heavily
    * concentrated; a dedup/cleaning round that DROPS concentration is
    * removing boilerplate, one that RAISES it is collapsing toward
    * templates — the round-over-round dial next to q168's Zipf slope
    * and q180's richness). q114 ranks per-source documents with a
    * partitioned window; frequencies need the TIE-GROUPED value-frame
    * spelling instead (a per-word global rank window would sort the
    * whole vocabulary in one task): group words by COUNT VALUE c with
    * multiplicity m, under the count-ascending order the group's rank
    * sum is m·R_before + m(m+1)/2, so Σ rank·x = Σ_c c·(that) — exact
    * DECIMAL(38) integer arithmetic throughout, G = 2S/(V·N) − (V+1)/V
    * one final IEEE dag.
    *
    * Scale shape: corpus → vocabulary-sized count frame (one shuffle)
    * → distinct-count VALUE frame (≲ √N rows by Zipf; the cum window
    * runs there, allowlisted) → 1-row reduce.
    */
  private def q188(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("c")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs(s, dir)
      .select(explode(filter(split(col("text"), " "), x => x =!= "")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("c"))
      .groupBy("c")
      .agg(count(lit(1)).as("m"))
      .withColumn("r_before", coalesce(sum(col("m")).over(w), lit(0L)))
      .withColumn(
        "term",
        expr(
          "CAST(c AS DECIMAL(38,0)) * (CAST(m AS DECIMAL(38,0)) * CAST(r_before AS DECIMAL(38,0)) " +
            "+ CAST(m * (m + 1) div 2 AS DECIMAL(38,0)))"
        )
      )
      .agg(
        sum(col("m")).as("v_words"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * CAST(m AS DECIMAL(38,0))")).as("nt"),
        sum(col("term")).as("s")
      )
      .select(
        col("v_words"),
        col("nt").cast("long").as("n_tokens"),
        (round(
          lit(2.0d) * col("s").cast("double") /
            (col("v_words").cast("double") * col("nt").cast("double")) -
            (col("v_words") + 1).cast("double") / col("v_words").cast("double"),
          6
        ) + 0.0).as("gini_concentration")
      )
  }

  // ------------------------------ q189: Heaps'-law vocabulary growth fit

  /** q189: Heaps'-law fit V(N) ≈ K·N^β — how fast vocabulary grows as
    * the corpus grows, THE scaling input a tokenizer-budget or
    * dedup-capacity plan needs (q180 estimates the asymptote; this
    * fits the GROWTH CURVE, so "how big is the vocab at 10× the
    * crawl?" has a measured answer; natural English β ≈ 0.4–0.6 —
    * template floods bend it low, synthetic id-spam bends it high):
    * V(N) = distinct words among the first N tokens under the
    * canonical (doc_id, position) corpus order, sampled at N = 2^k
    * checkpoints, then the q168 OLS dag on (ln N, ln V).
    *
    * Determinism and scale: global token positions come from q52's
    * two-pass shard prefix sum (never a corpus-wide rank window) plus
    * the within-doc index; first-occurrence positions are one exact
    * min-aggregate on the vocabulary frame; V(N) counts ride a
    * broadcast of ≤31 checkpoint rows; ln is micro-grid-snapped, the
    * moments exact DECIMAL(38) (q168 discipline).
    */
  private def q189(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counted = docs(s, dir)
      .select(
        col("doc_id"),
        filter(split(col("text"), " "), x => x =!= "").as("ws")
      )
      .withColumn("n", size(col("ws")).cast("long"))
      .withColumn("shard", expr("doc_id div 4096"))
    val offsets = counted
      .groupBy("shard")
      .agg(sum("n").as("sn"))
      .withColumn(
        "off",
        coalesce(
          sum("sn").over(
            Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
      .select("shard", "off")
    val local = Window
      .partitionBy("shard")
      .orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val fp = counted
      .join(broadcast(offsets), "shard")
      .withColumn("doc_off", col("off") + coalesce(sum("n").over(local), lit(0L)))
      .select(col("doc_off"), posexplode(col("ws")).as(Seq("i", "w")))
      .select(col("w"), (col("doc_off") + col("i")).as("pos"))
      .groupBy("w")
      .agg(min("pos").as("fp"))
    val ck = counted
      .agg(sum("n").as("nt"))
      .select(col("nt"), explode(array((10 to 40).map(lit(_)): _*)).as("k"))
      .withColumn("ncap", expr("shiftleft(CAST(1 AS BIGINT), k)"))
      .filter(col("ncap") >= 1024 && col("ncap") <= col("nt"))
      .select("ncap")
    val pts = fp
      .crossJoin(broadcast(ck))
      .filter(col("fp") < col("ncap"))
      .groupBy("ncap")
      .agg(count(lit(1)).as("v"))
      .select(
        floor(log(col("ncap").cast("double")) * 1000000.0).cast("long").as("x"),
        floor(log(col("v").cast("double")) * 1000000.0).cast("long").as("y")
      )
    pts
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("x").cast("decimal(38,0)")).cast("double").as("sx"),
        sum(col("y").cast("decimal(38,0)")).cast("double").as("sy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).cast("double").as("sxx"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).cast("double").as("sxy"),
        sum((col("y") * col("y")).cast("decimal(38,0)")).cast("double").as("syy")
      )
      // nullif degeneracy guards (q120 convention) on every division:
      // a SATURATED vocabulary makes y constant at every checkpoint
      // (measured at sf0.1 — V(N)=31 from the first checkpoint on), so
      // n·syy − sy² is EXACTLY 0 and the unguarded r² divided 0/0 —
      // NULL-by-accident under ANSI-off, a DIVIDE_BY_ZERO crash under
      // ANSI. The guard makes the NULL deliberate and identical on
      // both engines (DuckDB's /0 is NULL natively; the oracle carries
      // the same nullif spelling). sf0.001 masks this: the vocab is
      // NOT yet saturated at the first checkpoint there, so the
      // degenerate frame is a SCALE regime, not a small-data one.
      .select(
        col("n").cast("long").as("n_points"),
        (round(
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            nullif(col("n") * col("sxx") - col("sx") * col("sx"), lit(0.0d)),
          4
        ) + 0.0).as("heaps_beta"),
        (round(
          (col("sy") - col("sx") *
            ((col("n") * col("sxy") - col("sx") * col("sy")) /
              nullif(col("n") * col("sxx") - col("sx") * col("sx"), lit(0.0d)))) /
            col("n") / 1000000.0,
          4
        ) + 0.0).as("intercept_ln"),
        (round(
          ((col("n") * col("sxy") - col("sx") * col("sy")) *
            (col("n") * col("sxy") - col("sx") * col("sy"))) /
            nullif(
              (col("n") * col("sxx") - col("sx") * col("sx")) *
                (col("n") * col("syy") - col("sy") * col("sy")),
              lit(0.0d)
            ),
          4
        ) + 0.0).as("r_squared")
      )
  }

  // --------------------- q190: per-source log-odds term enrichment

  /** q190: per-source term enrichment — "which words are
    * over-represented in source X vs the rest of the corpus", the
    * signature-mining readout a curation pipeline reads to understand
    * WHAT a source contributes before weighting it (q56) or capping it
    * (q77): Haldane-corrected log-odds
    * δ = ln((c_s+½)/(n_s−c_s+½)) − ln((c_r+½)/(n_r−c_r+½)) with the
    * standard variance 1/(c_s+½)+1/(c_r+½), top-5 per source by the
    * gridded z (ties alphabetical).
    *
    * Determinism: both ln terms are floor-snapped to the 1e-9 grid so
    * δ is an EXACT BIGINT difference; z is one gridded division.
    * Scale shape: one (source, word) count aggregate (map-side
    * combined, the only corpus shuffle), totals broadcast back, top-5
    * per source compiles to WindowGroupLimit over the
    * vocabulary-sized frame — never a global sort.
    */
  private def q190(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnt = docs(s, dir)
      .select(col("source"), explode(filter(split(col("text"), " "), x => x =!= "")).as("w"))
      .groupBy("source", "w")
      .agg(count(lit(1)).as("cs"))
    val wordTot = cnt.groupBy("w").agg(sum("cs").as("cw"))
    val srcTot = cnt.groupBy("source").agg(sum("cs").as("ns"))
    val grand = srcTot.agg(sum("ns").as("n"))
    val scored = cnt
      .join(broadcast(wordTot), "w")
      .join(broadcast(srcTot), "source")
      .crossJoin(broadcast(grand))
      .withColumn("cr", col("cw") - col("cs"))
      .withColumn("nr", col("n") - col("ns"))
      .withColumn(
        "d9",
        expr(
          "CAST(floor(ln((CAST(cs AS DOUBLE) + 0.5) / (CAST(ns - cs AS DOUBLE) + 0.5)) * 1.0e9) AS BIGINT) " +
            "- CAST(floor(ln((CAST(cr AS DOUBLE) + 0.5) / (CAST(nr - cr AS DOUBLE) + 0.5)) * 1.0e9) AS BIGINT)"
        )
      )
      .withColumn(
        "z",
        round(
          col("d9").cast("double") / 1.0e9 /
            sqrt(
              lit(1.0d) / (col("cs").cast("double") + 0.5) +
                lit(1.0d) / (col("cr").cast("double") + 0.5)
            ),
          6
        ) + 0.0
      )
    scored
      .withColumn(
        "rnk",
        row_number().over(
          Window.partitionBy("source").orderBy(col("z").desc, col("w"))
        )
      )
      .filter(col("rnk") <= 5)
      .select(col("source"), col("rnk"), col("w").as("word"), col("cs"), col("z"))
      .orderBy("source", "rnk")
  }

  // ----------------------- q196: Flesch readability per language

  /** q196: Flesch reading-ease per language slice — the classic
    * quality-screen complement to q33's ratios (length and stopword
    * share miss "grammatical but impenetrable"; Flesch scores sentence
    * and word COMPLEXITY): 206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/words), with syllables approximated by vowel-group
    * count (the standard heuristic — exact syllabification needs a
    * dictionary; the APPROXIMATION is deterministic: one regex both
    * engines run identically) and sentences by non-empty period
    * splits, floored at 1. Per-doc scores are floor-snapped to the
    * 1e-6 grid and summed as EXACT BIGINTs into per-language means;
    * the structural ratios (words/sentence, syllables/word) are
    * single divisions of exact corpus sums.
    *
    * Scale shape: one map-side projection per document (two splits +
    * one regex — no explode), one language-keyed aggregate. Zero
    * joins, zero windows.
    */
  private def q196(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(
        col("lang"),
        size(filter(split(col("text"), " "), x => x =!= "")).cast("long").as("w"),
        greatest(
          size(filter(split(col("text"), "\\."), x => trim(x) =!= "")),
          lit(1)
        ).cast("long").as("sent"),
        size(expr("regexp_extract_all(text, '[aeiouy]+', 0)")).cast("long").as("syl")
      )
      .filter(col("w") > 0)
      .withColumn(
        "f6",
        expr(
          "CAST(floor((206.835 - 1.015 * (CAST(w AS DOUBLE) / CAST(sent AS DOUBLE)) " +
            "- 84.6 * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE))) * 1.0e6) AS BIGINT)"
        )
      )
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("w")).as("sw"),
        sum(col("sent")).as("ssent"),
        sum(col("syl")).as("ssyl"),
        sum(col("f6")).as("sf6")
      )
      .select(
        col("lang"),
        col("n_docs"),
        (round(
          col("sf6").cast("double") / (col("n_docs").cast("double") * 1.0e6),
          4
        ) + 0.0).as("mean_flesch"),
        (round(col("sw").cast("double") / col("ssent").cast("double"), 4) + 0.0)
          .as("words_per_sentence"),
        (round(col("ssyl").cast("double") / col("sw").cast("double"), 4) + 0.0)
          .as("syllables_per_word")
      )
      .orderBy("lang")

  // ----------- q202: cross-split bigram perplexity (generalization)

  /** q202: add-one-smoothed bigram perplexity of a language model
    * TRAINED on the train split, scored on BOTH splits — the
    * generalization probe q57b's whole-corpus surprisal cannot give
    * (train-vs-eval perplexity GAP is the overfit/contamination dial:
    * a gap near zero with a leaky split is exactly what q58/q62
    * decontamination exists to prevent): P(w2|w1) =
    * (c12_train+1)/(c1_train+V), unseen histories fall back to 1/V
    * through the same formula via the LEFT joins.
    *
    * Determinism: −ln P is floor-snapped to the 1e-9 grid PER DISTINCT
    * (split, w1, w2) and weighted by exact occurrence counts into
    * exact BIGINT sums; the mean is one division, the perplexity one
    * exp (the q174 convention).
    *
    * Scale shape: bigram extraction is the q57b zip_with map pass;
    * model and scores live on vocabulary-bounded frames (pair counts,
    * predecessor counts); the only corpus-sized shuffles are the two
    * count aggregates.
    */
  /** The md5-split bigram stream (split, w1, w2) — q202's corpus
    * framing, shared verbatim by q210's Kneser–Ney twin so the two
    * LMs always score the identical eval stream.
    */
  private def bigramSplitPairs(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    docs(s, dir)
      .filter(size(toks) >= 2)
      .withColumn(
        "split",
        when(Sampling.bucket100(col("doc_id")) < 80, "train").otherwise("eval")
      )
      .select(
        col("split"),
        explode(
          zip_with(
            slice(toks, lit(1), size(toks) - 1),
            slice(toks, lit(2), size(toks) - 1),
            (a, b) => struct(a.as("w1"), b.as("w2"))
          )
        ).as("p")
      )
      .select(col("split"), col("p.w1").as("w1"), col("p.w2").as("w2"))
  }

  private def q202(s: SparkSession, dir: String): DataFrame = {
    val pairs = bigramSplitPairs(s, dir)
    val train = pairs.filter(col("split") === "train")
    val big = train.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val pre = train.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vf = train
      .select(col("w1").as("w"))
      .union(train.select(col("w2").as("w")))
      .distinct()
      .agg(count(lit(1)).as("vv"))
    pairs
      .groupBy("split", "w1", "w2")
      .agg(count(lit(1)).as("ec"))
      .join(big, Seq("w1", "w2"), "left")
      .join(pre, Seq("w1"), "left")
      .crossJoin(broadcast(vf))
      .withColumn(
        "nll9",
        expr(
          "CAST(-floor(ln((CAST(coalesce(c12, 0) + 1 AS DOUBLE)) " +
            "/ (CAST(coalesce(c1, 0) AS DOUBLE) + CAST(vv AS DOUBLE))) * 1.0e9) AS BIGINT)"
        )
      )
      .groupBy("split")
      .agg(
        sum(col("ec")).as("n_bigrams"),
        sum(col("nll9") * col("ec")).as("s9")
      )
      .select(
        col("split"),
        col("n_bigrams"),
        (round(
          col("s9").cast("double") / (col("n_bigrams") * 1000000000L).cast("double"),
          6
        ) + 0.0).as("mean_nll"),
        (round(
          exp(col("s9").cast("double") / (col("n_bigrams") * 1000000000L).cast("double")),
          4
        ) + 0.0).as("perplexity")
      )
      .orderBy("split")
  }

  // -------------- q203: source-pair vocabulary-overlap matrix

  /** q203: vocabulary Jaccard between every SOURCE pair — "which
    * sources are lexical near-duplicates of each other" at the
    * CORPUS-SLICE level (q27 finds duplicate documents; two mirrors
    * of the same site duplicate each other's VOCABULARY long before
    * any single page matches, and a mixing stage double-counts them):
    * |Va∩Vb| / |Va∪Vb| over distinct-word sets, for all source pairs.
    *
    * Scale shape: the (source, word) distinct frame is the one corpus
    * shuffle; intersections come from the word-keyed self-join whose
    * per-word expansion is ≤ C(#sources, 2) — source count is a
    * catalog-bounded domain, so the join is vocabulary × a small
    * constant, never corpus²; sizes broadcast back; Jaccard is one
    * division of exact integers.
    */
  private def q203(s: SparkSession, dir: String): DataFrame = {
    val sw = docs(s, dir)
      .select(col("source"), explode(filter(split(col("text"), " "), x => x =!= "")).as("w"))
      .distinct()
    val sizes = sw.groupBy("source").agg(count(lit(1)).as("vsz"))
    val inter = sw
      .as("l")
      .join(sw.as("r"), col("l.w") === col("r.w") && col("l.source") < col("r.source"))
      .groupBy(col("l.source").as("sa"), col("r.source").as("sb"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(broadcast(sizes.select(col("source").as("sa"), col("vsz").as("va"))), "sa")
      .join(broadcast(sizes.select(col("source").as("sb"), col("vsz").as("vb"))), "sb")
      .select(
        col("sa"),
        col("sb"),
        col("va"),
        col("vb"),
        col("i").as("v_common"),
        (round(
          col("i").cast("double") / (col("va") + col("vb") - col("i")).cast("double"),
          6
        ) + 0.0).as("vocab_jaccard")
      )
      .orderBy("sa", "sb")
  }

  // ----------------- q208: term burstiness (variance-to-mean ratio)

  /** q208: Church–Gale burstiness — per word, the variance-to-mean
    * ratio of its per-document count over ALL documents (zeros
    * included): a Poisson-scattered word has VMR ≈ 1 (function words,
    * uniform templates), a CONTENT word concentrates in few documents
    * and reads VMR ≫ 1 — the signal separating topical vocabulary
    * from glue that raw frequency (q33/q168 Zipf) cannot give, and the
    * input a keyword extractor or stopword-list builder reads. Top-20
    * by VMR among words in ≥ [[BurstMinDf]] documents (df floor keeps
    * one-document hapaxes — trivially "bursty" — out of the report).
    *
    * Determinism: the algebra collapses zeros exactly —
    * VMR = (E[x²] − μ²)/μ = Σtf²/Σtf − Σtf/N — so the statistic is
    * TWO divisions of exact BIGINT sums and one subtraction, never a
    * float aggregate; the top-20 orders on the 1e-6 grid, ties on the
    * word.
    *
    * Scale shape: one (doc, word) count aggregate (map-side combined,
    * the only corpus shuffle), then a vocabulary-bounded moment
    * aggregate and a TakeOrdered top-20. Σtf² is BIGINT-safe to 3M
    * occurrences of a word in one doc; the DECIMAL(38) swap-in is the
    * q169 convention.
    */
  private val BurstMinDf = 20L

  private def q208(s: SparkSession, dir: String): DataFrame = {
    val tf = docs(s, dir)
      .select(
        col("doc_id"),
        explode(filter(split(col("text"), " "), x => x =!= "")).as("w")
      )
      .groupBy("doc_id", "w")
      .agg(count(lit(1)).as("tf"))
    val n = docs(s, dir).agg(count(lit(1)).as("n_docs"))
    tf.groupBy("w")
      .agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("s1"),
        sum(col("tf") * col("tf")).as("s2")
      )
      .filter(col("df") >= BurstMinDf)
      .crossJoin(broadcast(n))
      .select(
        col("w").as("word"),
        col("df"),
        col("s1").as("total_tf"),
        (round(
          col("s2").cast("double") / col("s1").cast("double") -
            col("s1").cast("double") / col("n_docs").cast("double"),
          6
        ) + 0.0).as("burstiness_vmr")
      )
      .orderBy(desc("burstiness_vmr"), col("word"))
      .limit(20)
  }

  // ------- q210: interpolated Kneser–Ney bigram perplexity

  /** q210: interpolated Kneser–Ney — the smoothing real LM tooling
    * uses, next to q202's add-one twin (add-one crushes probability
    * mass onto unseen events and its perplexity gap overstates
    * contamination; KN discounts each seen bigram a fixed D and
    * redistributes via the CONTINUATION distribution "how many
    * contexts does this word complete?", the correction that made
    * n-gram LMs competitive):
    * P(w₂|w₁) = max(c₁₂ − D, 0)/c₁ + D·N1p(w₁)/c₁ · Pc(w₂), D = ¾
    * (exactly representable), Pc(w₂) = (N1s(w₂)+1)/(N1t + V + 1) —
    * the continuation distribution itself add-one smoothed over the
    * train vocab + unk so every eval bigram has P > 0; an unseen
    * history backs off to bare Pc (the interpolation weight is 1 when
    * c₁ = 0). Both splits scored on the identical bigram stream as
    * q202 (shared builder), so the two models' gaps are directly
    * comparable.
    *
    * Determinism: every count is an exact BIGINT; P is ONE fixed
    * IEEE dag on their casts (D = 0.75 and c₁₂ − 0.75 are exact
    * doubles), −ln P floor-snaps to the 1e-9 grid per distinct
    * (split, bigram) and aggregates as exact count-weighted BIGINTs
    * (the q202/q174 convention).
    *
    * Scale shape: the model is FOUR vocabulary-/bigram-type-bounded
    * frames off one train pass (c₁₂, c₁, N1p, N1s) + two 1-row
    * broadcasts; scoring is the same distinct-bigram LEFT joins as
    * q202 — nothing corpus² anywhere.
    */
  private def q210(s: SparkSession, dir: String): DataFrame = {
    val pairs = bigramSplitPairs(s, dir)
    val train = pairs.filter(col("split") === "train")
    val big = train.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val pre = train.groupBy("w1").agg(count(lit(1)).as("c1"))
    val n1p = big.groupBy("w1").agg(count(lit(1)).as("n1p"))
    val n1s = big.groupBy("w2").agg(count(lit(1)).as("n1s"))
    val n1t = big.agg(count(lit(1)).as("n1t"))
    val vf = train
      .select(col("w1").as("w"))
      .union(train.select(col("w2").as("w")))
      .distinct()
      .agg(count(lit(1)).as("vv"))
    pairs
      .groupBy("split", "w1", "w2")
      .agg(count(lit(1)).as("ec"))
      .join(big, Seq("w1", "w2"), "left")
      .join(pre, Seq("w1"), "left")
      .join(n1p, Seq("w1"), "left")
      .join(n1s, Seq("w2"), "left")
      .crossJoin(broadcast(n1t))
      .crossJoin(broadcast(vf))
      .withColumn(
        "pc",
        expr(
          "CAST(coalesce(n1s, 0) + 1 AS DOUBLE) " +
            "/ (CAST(n1t AS DOUBLE) + CAST(vv AS DOUBLE) + 1.0)"
        )
      )
      .withColumn(
        "p",
        expr(
          "CASE WHEN coalesce(c1, 0) > 0 THEN " +
            "(CASE WHEN coalesce(c12, 0) > 0 " +
            "      THEN CAST(c12 AS DOUBLE) - 0.75 ELSE 0.0 END) " +
            "  / CAST(c1 AS DOUBLE) " +
            "+ 0.75 * CAST(coalesce(n1p, 0) AS DOUBLE) " +
            "  / CAST(c1 AS DOUBLE) * pc " +
            "ELSE pc END"
        )
      )
      .withColumn("nll9", expr("CAST(-floor(ln(p) * 1.0e9) AS BIGINT)"))
      .groupBy("split")
      .agg(
        sum(col("ec")).as("n_bigrams"),
        sum(col("nll9") * col("ec")).as("s9")
      )
      .select(
        col("split"),
        col("n_bigrams"),
        (round(
          col("s9").cast("double") / (col("n_bigrams") * 1000000000L).cast("double"),
          6
        ) + 0.0).as("mean_nll"),
        (round(
          exp(col("s9").cast("double") / (col("n_bigrams") * 1000000000L).cast("double")),
          4
        ) + 0.0).as("perplexity")
      )
      .orderBy("split")
  }

  // ------- q226: Jensen–Shannon divergence between source unigrams

  /** floor(ln 2 · 10⁹) — the exact-integer grid value of the
    * exclusive-mass log term, embedded as a LITERAL on both engines
    * (ln 2 = 0.6931471805599453…; a word present in only one source of
    * a pair contributes p·ln(2p/(p+0)) = p·ln 2 exactly).
    */
  private val Ln2Grid9 = 693147180L

  /** q226: Jensen–Shannon divergence between every source pair's
    * unigram DISTRIBUTIONS — the distribution-level companion of
    * q203's vocabulary Jaccard (Jaccard compares word SETS — two
    * sources can share every word yet weight them completely
    * differently, and a mixing stage treating them as interchangeable
    * skews the blend; JSD is symmetric, bounded by ln 2, and defined
    * even where KL diverges, which is why drift dashboards quote it):
    * JSD(P,Q) = ½·KL(P‖M) + ½·KL(Q‖M), M = (P+Q)/2.
    *
    * Determinism: the per-word log argument 2·cₐ·n_b/(cₐ·n_b + c_b·nₐ)
    * is a ratio of exact integer cross-products; its ln floor-snaps to
    * the 1e-9 grid and is weighted by the exact count cₐ, so each
    * pair's sum is EXACT (DECIMAL(38) — count × grid overflows BIGINT
    * at ~10⁹-token sources); words exclusive to one source collapse in
    * CLOSED FORM to (exclusive mass)·[[Ln2Grid9]] — no full-outer join
    * and no 0·ln 0 special case anywhere. One final division dag.
    *
    * Scale shape: one (source, word) count aggregate is the corpus
    * shuffle; the word-keyed self-join expands ≤ C(#sources, 2) per
    * word (the q203 catalog-bounded argument); per-pair sums are a
    * #pairs-row frame.
    */
  private def q226(s: SparkSession, dir: String): DataFrame = {
    val swc = docs(s, dir)
      .select(
        col("source"),
        explode(filter(split(col("text"), " "), x => x =!= "")).as("w")
      )
      .groupBy("source", "w")
      .agg(count(lit(1)).as("c"))
    val ns = swc.groupBy("source").agg(sum("c").as("n"))
    val withN = swc.join(broadcast(ns), "source")
    val l = withN.select(
      col("source").as("sa"), col("w"), col("c").as("ca"), col("n").as("na"))
    val r = withN.select(
      col("source").as("sb"), col("w"), col("c").as("cb"), col("n").as("nb"))
    l.as("l")
      .join(r.as("r"), col("l.w") === col("r.w") && col("sa") < col("sb"))
      .withColumn("da", col("ca") * col("nb"))
      .withColumn("db", col("cb") * col("na"))
      .withColumn(
        "la9",
        floor(
          log(lit(2.0d) * col("da").cast("double") /
            (col("da") + col("db")).cast("double")) * 1.0e9
        ).cast("long")
      )
      .withColumn(
        "lb9",
        floor(
          log(lit(2.0d) * col("db").cast("double") /
            (col("da") + col("db")).cast("double")) * 1.0e9
        ).cast("long")
      )
      .groupBy("sa", "sb")
      .agg(
        count(lit(1)).as("n_common"),
        max("na").as("na"),
        max("nb").as("nb"),
        sum((col("ca") * col("la9")).cast("decimal(38,0)"))
          .cast("double").as("a9"),
        sum((col("cb") * col("lb9")).cast("decimal(38,0)"))
          .cast("double").as("b9"),
        sum("ca").as("sca"),
        sum("cb").as("scb")
      )
      .select(
        col("sa"),
        col("sb"),
        col("n_common"),
        (round(
          ((col("a9") + (col("na") - col("sca")).cast("double") * lit(Ln2Grid9.toDouble)) /
            col("na").cast("double") +
            (col("b9") + (col("nb") - col("scb")).cast("double") * lit(Ln2Grid9.toDouble)) /
            col("nb").cast("double")) / 2.0e9,
          6
        ) + 0.0).as("jsd")
      )
      .orderBy("sa", "sb")
  }

  // ------------- q229: RAKE keyword / keyphrase extraction

  private val RakeStopK = 10 // corpus-derived stopword list size
  private val RakeMaxLen = 3 // candidate phrases longer than this drop
  private val RakeTopK = 20

  /** q229: RAKE (Rapid Automatic Keyword Extraction) — MULTI-WORD
    * keyphrases, which no single-word ranking (q34b frequency, q51
    * TF-IDF, q208 burstiness) can produce and q72's PMI pairs only
    * approximate: candidate phrases are maximal runs of consecutive
    * non-stopword tokens (the document segments stoplist words
    * delimit), scored by Σ_w deg(w)/freq(w) — words that appear in
    * long phrases (high degree) but rarely overall score high, the
    * RAKE signature. Stopwords are the corpus's own top-[[RakeStopK]]
    * words by frequency (deterministic data-derived list, the q63
    * vocabulary convention); runs longer than [[RakeMaxLen]] drop.
    *
    * Determinism: the stoplist cuts on (count desc, word); islands
    * come from the exact integer i − row_number gap trick; word
    * scores floor-snap deg/freq to the 1e-9 grid so every phrase
    * score is an EXACT BIGINT sum; phrase assembly sorts (i, w)
    * structs before concatenation (collect_list order is not
    * deterministic — the sort is load-bearing); top-20 on
    * (score9, phrase).
    *
    * Scale shape: one corpus token pass for the stoplist, one for the
    * islands (per-doc windows, doc-length bounded); the phrase and
    * word-stat frames are phrase-instance-sized; the word-score join
    * is vocabulary-bounded; top-20 via TakeOrdered.
    */
  private def q229(s: SparkSession, dir: String): DataFrame = {
    val tok = docs(s, dir)
      .select(
        col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("i", "w"))
      )
    val stop = tok
      .filter(col("w") =!= "")
      .groupBy("w")
      .agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("w"))
      .limit(RakeStopK)
      .select("w")
    val kept = tok
      .filter(col("w") =!= "")
      .join(broadcast(stop), Seq("w"), "left_anti")
    val isl = kept.withColumn(
      "grp",
      col("i") - row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("i")
      )
    )
    val ph = isl
      .groupBy("doc_id", "grp")
      .agg(sort_array(collect_list(struct(col("i"), col("w")))).as("sw"))
      .select(
        col("doc_id"),
        col("grp"),
        concat_ws(" ", expr("transform(sw, s -> s.w)")).as("phrase"),
        size(col("sw")).as("nw")
      )
      .filter(col("nw") <= RakeMaxLen)
    val pw = ph.select(
      col("doc_id"), col("grp"), col("phrase"), col("nw"),
      explode(split(col("phrase"), " ")).as("w")
    )
    val ws = pw
      .groupBy("w")
      .agg(count(lit(1)).as("freq"), sum("nw").as("deg"))
      .withColumn(
        "s9",
        floor(
          col("deg").cast("double") / col("freq").cast("double") * 1.0e9
        ).cast("long")
      )
      .select("w", "s9")
    val inst = pw
      .join(ws, "w")
      .groupBy("doc_id", "grp", "phrase", "nw")
      .agg(sum("s9").as("inst9"))
    inst
      .groupBy("phrase")
      .agg(
        max("nw").as("n_words"),
        count(lit(1)).as("n_occurrences"),
        max("inst9").as("score9")
      )
      .orderBy(desc("score9"), col("phrase"))
      .limit(RakeTopK)
      .select(
        col("phrase"),
        col("n_words").cast("long").as("n_words"),
        col("n_occurrences"),
        round(col("score9").cast("double") / 1.0e9, 6).as("rake_score")
      )
  }

  // ---------- q236: language-ID confusion matrix

  /** q236: confusion matrix of the q32 language-ID heuristic against
    * the labeled language — the EVALUATION the lang-id gate itself
    * cannot give (q32 emits predictions; a curation pipeline deciding
    * whether the heuristic is good enough to route documents needs the
    * per-language error STRUCTURE — which languages leak into which —
    * not an overall accuracy that the majority class dominates): one
    * row per (actual, predicted) cell with its count, the row share
    * (per-actual recall on the diagonal), and the diagonal flag.
    *
    * Determinism: q32's langScored argmax verbatim (fixed en > es >
    * de > fr priority, exact marker-count ratios); counts exact
    * integers; row share one round-6 division.
    *
    * Scale shape: one corpus projection + one (actual, predicted)
    * hash aggregate (≤ 4×4 cells — catalog-bounded), a broadcast
    * row-total join. No windows.
    */
  private def q236(s: SparkSession, dir: String): DataFrame = {
    val cm = langScored(docs(s, dir))
      .join(
        docs(s, dir).select(col("doc_id"), col("lang").as("actual")),
        "doc_id"
      )
      .groupBy(col("actual"), col("pred_lang").as("predicted"))
      .agg(count(lit(1)).as("n"))
    val rowTot = cm.groupBy("actual").agg(sum("n").as("row_n"))
    cm.join(broadcast(rowTot), "actual")
      .select(
        col("actual"),
        col("predicted"),
        col("n"),
        round(col("n").cast("double") / col("row_n").cast("double"), 6)
          .as("row_share"),
        (col("actual") === col("predicted")).as("diagonal")
      )
      .orderBy("actual", "predicted")
  }

  // ------- q238: Dunning log-likelihood-ratio (G²) collocations

  private val G2MinPair = 5L
  private val G2TopK = 20

  /** q238: Dunning's log-likelihood ratio (G²) for adjacent-pair
    * collocations — the statistically-grounded ranking of "which word
    * pairs co-occur MORE than chance" that raw bigram frequency (q34c)
    * and PMI (q72) both get wrong at the extremes (frequency surfaces
    * stopword pairs; PMI explodes on hapax pairs — G² weights the
    * evidence by COUNT, which is why collocation extraction ships it):
    * for bigram (w1,w2) with k11 = c(w1 w2), c1 = c(w1 ·), c2 = c(· w2),
    * N = total bigrams, G² = 2·Σ_{ij} k_ij·ln(k_ij·N/(r_i·s_j)) over
    * the 2×2 contingency table, zero cells contributing zero.
    *
    * Determinism (the q226 exact-ln-grid convention): every log
    * argument is a ratio of exact integer cross-products k·N/(r·s);
    * its ln floor-snaps to the 1e-9 grid and is weighted by the exact
    * count k, so each pair's G²·10⁹/2 is an exact BIGINT sum of four
    * terms and the top-20 cut orders on (g2_9 desc, w1, w2) — no float
    * enters before the final round-4 render. Pairs below [[G2MinPair]]
    * occurrences drop (rare-pair noise, and the driver hash stays
    * stable under corpus growth).
    *
    * Scale shape: ONE corpus Generate pass (the q57b zip_with shape —
    * no self-join) → the bigram aggregate (vocabulary²-bounded); the
    * two margin joins are vocabulary-bounded and run unhinted (the
    * q51/q57 AQE rationale); the total rides a broadcast 1-row frame;
    * the 2×2 dag is per-pair closed form; TakeOrdered top-20.
    */
  private def q238(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val pairs = docs(s, dir)
      .filter(size(toks) >= 2)
      .select(
        explode(
          zip_with(
            slice(toks, lit(1), size(toks) - 1),
            slice(toks, lit(2), size(toks) - 1),
            (a, b) => struct(a.as("w1"), b.as("w2"))
          )
        ).as("p")
      )
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val k = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("k11"))
    val m1 = pairs.groupBy("w1").agg(count(lit(1)).as("c1"))
    val m2 = pairs.groupBy("w2").agg(count(lit(1)).as("c2"))
    val nn = pairs.agg(count(lit(1)).as("nn"))
    def term(kc: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column,
             c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(
        kc > 0,
        kc * floor(
          log((kc * col("nn")).cast("double") / (r * c).cast("double")) *
            1.0e9
        ).cast("long")
      ).otherwise(lit(0L))
    k.join(m1, "w1")
      .join(m2, "w2")
      .crossJoin(broadcast(nn))
      .filter(col("k11") >= G2MinPair)
      .withColumn("k12", col("c1") - col("k11"))
      .withColumn("k21", col("c2") - col("k11"))
      .withColumn("k22", col("nn") - col("c1") - col("c2") + col("k11"))
      .withColumn(
        "g2_9",
        lit(2L) * (term(col("k11"), col("c1"), col("c2")) +
          term(col("k12"), col("c1"), col("nn") - col("c2")) +
          term(col("k21"), col("nn") - col("c1"), col("c2")) +
          term(col("k22"), col("nn") - col("c1"), col("nn") - col("c2")))
      )
      .select(
        col("w1"),
        col("w2"),
        col("k11"),
        col("g2_9"),
        (round(col("g2_9").cast("double") / 1.0e9, 4) + 0.0).as("g2")
      )
      .orderBy(desc("g2_9"), col("w1"), col("w2"))
      .limit(G2TopK)
  }

  /** q255: Burrows' Delta stylometry — the standard authorship /
    * style-attribution distance (Burrows 2002): which SOURCES write
    * alike, measured not by topic words but by the relative rates of
    * the most frequent (function) words, z-scored per word across
    * sources so every marker word counts equally:
    * Δ(s₁,s₂) = mean over the top-50 corpus words of |z₁ − z₂|. The
    * curation read: the closest pairs are near-duplicate STYLES
    * (mirrors, common boilerplate) that per-document dedup (q26–q29)
    * never sees because no two documents match.
    *
    * Determinism: per-source rates are exact per-million integers via
    * BIGINT `div`; per-word mean/σ across the k sources are exact
    * integer moments with z = (k·f − Σf)/√(k·(k·Σf² − (Σf)²)/(k−1))
    * in ONE dag (the q250 spelling); zero-variance words drop on the
    * raw dag identically on both engines; each pair's |z₁−z₂| is
    * floor-snapped to the 1e9 grid so the ≤50-term sum is exact
    * (the q244 discipline); Δ is one division.
    *
    * Scale shape: one corpus token pass → the (source, word) frame;
    * everything after is bounded by #sources × 50 words and the
    * C(#sources,2) pair frame. Top-10 output.
    */
  private def q255(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnt = docs(s, dir)
      .select(
        col("source"),
        explode(filter(split(col("text"), " "), x => x =!= "")).as("w")
      )
      .groupBy("source", "w")
      .agg(count(lit(1)).as("cs"))
    val top = cnt
      .groupBy("w")
      .agg(sum("cs").as("cw"))
      .orderBy(desc("cw"), col("w"))
      .limit(50)
      .select("w")
    val srcTot = cnt.groupBy("source").agg(sum("cs").as("ns"))
    val universe = srcTot.crossJoin(broadcast(top))
    val rates = universe
      .join(cnt, Seq("source", "w"), "left")
      .withColumn("f6", expr("coalesce(cs, 0) * 1000000 div ns"))
    val wm = rates
      .groupBy("w")
      .agg(
        count(lit(1)).as("k"),
        sum(col("f6").cast("decimal(38,0)")).as("sf"),
        sum((col("f6") * col("f6")).cast("decimal(38,0)")).as("sff")
      )
    val z = rates
      .join(broadcast(wm), "w")
      .withColumn(
        "vnum",
        (col("k") * col("sff") - col("sf") * col("sf")).cast("double")
      )
      .filter(col("vnum") > lit(0.0d))
      .withColumn(
        "z",
        (col("k") * col("f6") - col("sf")).cast("double") /
          sqrt(
            col("k").cast("double") * col("vnum") /
              (col("k") - 1).cast("double")
          )
      )
      .select(col("source"), col("w"), col("z"))
    z.as("a")
      .join(z.as("b"), col("a.w") === col("b.w") && col("a.source") < col("b.source"))
      .select(
        col("a.source").as("s1"),
        col("b.source").as("s2"),
        floor(abs(col("a.z") - col("b.z")) * 1.0e9).cast("long").as("t9")
      )
      .groupBy("s1", "s2")
      .agg(count(lit(1)).as("n_words"), sum("t9").as("st9"))
      .withColumn(
        "delta",
        round(
          col("st9").cast("double") / (col("n_words").cast("double") * 1.0e9),
          6
        ) + 0.0
      )
      .select(col("s1"), col("s2"), col("n_words"), col("delta"))
      .orderBy(col("delta"), col("s1"), col("s2"))
      .limit(10)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q255_burrows_delta" -> q255,
    "q238_collocations_g2" -> q238,
    "q236_lang_confusion" -> q236,
    "q229_rake_keywords" -> q229,
    "q226_js_divergence" -> q226,
    "q210_kn_perplexity" -> q210,
    "q208_burstiness" -> q208,
    "q202_bigram_perplexity" -> q202,
    "q203_source_vocab_overlap" -> q203,
    "q196_flesch_readability" -> q196,
    "q189_heaps_fit" -> q189,
    "q190_term_enrichment" -> q190,
    "q188_vocab_gini" -> q188,
    "q180_vocab_richness" -> q180,
    "q168_zipf_fit" -> q168,
    "q159_ngram_diversity" -> q159,
    "q149_nfc_normalize" -> q149,
    "q69_distribution_drift" -> q69,
    "q67_corpus_stats" -> q67,
    "q32_lang_id" -> q32,
    "q53_scrub" -> q53,
    "q55_repetition" -> q55,
    "q57_surprisal" -> q57,
    "q57b_bigram_surprisal" -> q57b,
    "q33_quality_score" -> q33,
    "q33b_length_filter" -> q33b,
    "q33c_char_entropy" -> q33c,
    "q34_token_count" -> q34,
    "q34b_vocab_topk" -> q34b,
    "q34c_bpe_pairs" -> q34c,
    "q34d_vocab_coverage" -> q34d,
    "q35_fingerprint" -> q35,
    "q51_tfidf" -> q51
  )

  val oracleSql: Map[String, String] = Map(
    // same top-50 word pick, same per-million BIGINT div rates over
    // the source×word universe, same exact z dag with the raw-dag
    // zero-variance drop, same 1e9-grid |z1-z2| sums
    "q255_burrows_delta" ->
      """WITH toks AS (
        |  SELECT source, unnest(list_filter(string_split(text, ' '),
        |                                    x -> x <> '')) AS w
        |  FROM documents),
        |cnt AS (
        |  SELECT source, w, CAST(count(*) AS BIGINT) AS cs
        |  FROM toks GROUP BY 1, 2),
        |top AS (
        |  SELECT w FROM (
        |    SELECT w, CAST(sum(cs) AS BIGINT) AS cw FROM cnt GROUP BY 1)
        |  ORDER BY cw DESC, w LIMIT 50),
        |st AS (SELECT source, CAST(sum(cs) AS BIGINT) AS ns
        |       FROM cnt GROUP BY 1),
        |rates AS (
        |  SELECT st.source, top.w,
        |    coalesce(cnt.cs, 0) * 1000000 // ns AS f6
        |  FROM st CROSS JOIN top
        |  LEFT JOIN cnt ON cnt.source = st.source AND cnt.w = top.w),
        |wm AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS k,
        |    sum(CAST(f6 AS HUGEINT)) AS sf,
        |    sum(CAST(f6 * f6 AS HUGEINT)) AS sff
        |  FROM rates GROUP BY 1),
        |z AS (
        |  SELECT rates.source, rates.w,
        |    CAST(k * f6 - sf AS DOUBLE)
        |      / sqrt(CAST(k AS DOUBLE) * CAST(k * sff - sf * sf AS DOUBLE)
        |             / CAST(k - 1 AS DOUBLE)) AS z
        |  FROM rates JOIN wm ON wm.w = rates.w
        |  WHERE CAST(k * sff - sf * sf AS DOUBLE) > 0.0),
        |pairs AS (
        |  SELECT a.source AS s1, b.source AS s2,
        |    CAST(floor(abs(a.z - b.z) * 1.0e9) AS BIGINT) AS t9
        |  FROM z a JOIN z b ON a.w = b.w AND a.source < b.source),
        |ag AS (
        |  SELECT s1, s2, CAST(count(*) AS BIGINT) AS n_words,
        |    CAST(sum(t9) AS BIGINT) AS st9
        |  FROM pairs GROUP BY 1, 2)
        |SELECT s1, s2, n_words,
        |  round(CAST(st9 AS DOUBLE) / (CAST(n_words AS DOUBLE) * 1.0e9), 6)
        |    + 0.0 AS delta
        |FROM ag ORDER BY delta, s1, s2 LIMIT 10""".stripMargin,
    // same q57b bigram stream, same 2×2 margins, same zero-collapsed
    // k·floor(ln(k·N/(r·s))·1e9) exact-BIGINT terms, same top-20 cut
    "q238_collocations_g2" ->
      """WITH toks AS (
        |  SELECT string_split(text, ' ') AS w FROM documents),
        |pp AS (
        |  SELECT
        |    unnest(list_transform(generate_series(1, len(w) - 1), i -> w[i])) AS w1,
        |    unnest(list_transform(generate_series(1, len(w) - 1), i -> w[i+1])) AS w2
        |  FROM toks WHERE len(w) >= 2),
        |k AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS k11
        |      FROM pp GROUP BY 1, 2),
        |m1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM pp GROUP BY 1),
        |m2 AS (SELECT w2, CAST(count(*) AS BIGINT) AS c2 FROM pp GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM pp),
        |cells AS (
        |  SELECT w1, w2, k11, c1, c2, nn,
        |    c1 - k11 AS k12, c2 - k11 AS k21, nn - c1 - c2 + k11 AS k22
        |  FROM k JOIN m1 USING (w1) JOIN m2 USING (w2) CROSS JOIN nn
        |  WHERE k11 >= 5),
        |g AS (
        |  SELECT w1, w2, k11,
        |    2 * (
        |      (CASE WHEN k11 > 0 THEN k11 * CAST(floor(ln(
        |         CAST(k11 * nn AS DOUBLE) / CAST(c1 * c2 AS DOUBLE)) * 1.0e9)
        |         AS BIGINT) ELSE 0 END) +
        |      (CASE WHEN k12 > 0 THEN k12 * CAST(floor(ln(
        |         CAST(k12 * nn AS DOUBLE) / CAST(c1 * (nn - c2) AS DOUBLE)) * 1.0e9)
        |         AS BIGINT) ELSE 0 END) +
        |      (CASE WHEN k21 > 0 THEN k21 * CAST(floor(ln(
        |         CAST(k21 * nn AS DOUBLE) / CAST((nn - c1) * c2 AS DOUBLE)) * 1.0e9)
        |         AS BIGINT) ELSE 0 END) +
        |      (CASE WHEN k22 > 0 THEN k22 * CAST(floor(ln(
        |         CAST(k22 * nn AS DOUBLE) / CAST((nn - c1) * (nn - c2) AS DOUBLE))
        |         * 1.0e9) AS BIGINT) ELSE 0 END)) AS g2_9
        |  FROM cells)
        |SELECT w1, w2, k11, g2_9, round(CAST(g2_9 AS DOUBLE) / 1.0e9, 4) + 0.0 AS g2
        |FROM g ORDER BY g2_9 DESC, w1, w2 LIMIT 20""".stripMargin,
    // same (doc, word) counts, same zero-collapsed VMR algebra
    // Σtf²/Σtf − Σtf/N on exact BIGINTs, same grid + tie order
    "q208_burstiness" ->
      s"""WITH tf AS (
         |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(list_filter(string_split(text, ' '),
         |                x -> x <> '')) AS w
         |        FROM documents)
         |  GROUP BY 1, 2),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         |m AS (
         |  SELECT w, CAST(count(*) AS BIGINT) AS df,
         |    CAST(sum(tf) AS BIGINT) AS s1,
         |    CAST(sum(tf * tf) AS BIGINT) AS s2
         |  FROM tf GROUP BY w)
         |SELECT w AS word, df, s1 AS total_tf,
         |  round(CAST(s2 AS DOUBLE) / CAST(s1 AS DOUBLE)
         |        - CAST(s1 AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) + 0.0
         |    AS burstiness_vmr
         |FROM m, n WHERE df >= $BurstMinDf
         |ORDER BY burstiness_vmr DESC, word LIMIT 20""".stripMargin,
    // q202's bigram-stream CTEs + the same four KN model frames, the
    // same single-dag P (D = 0.75 exact), −ln P on the 1e-9 grid
    "q210_kn_perplexity" ->
      """WITH toks AS (
        |  SELECT CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |              AS BIGINT) % 100 < 80 THEN 'train' ELSE 'eval' END AS split,
        |    string_split(text, ' ') AS w
        |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
        |pp AS (
        |  SELECT split,
        |    unnest(list_transform(generate_series(1, len(w) - 1), i -> w[i])) AS w1,
        |    unnest(list_transform(generate_series(1, len(w) - 1), i -> w[i+1])) AS w2
        |  FROM toks),
        |tr AS (SELECT w1, w2 FROM pp WHERE split = 'train'),
        |big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM tr GROUP BY 1, 2),
        |pre AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM tr GROUP BY 1),
        |n1p AS (SELECT w1, CAST(count(*) AS BIGINT) AS n1p FROM big GROUP BY 1),
        |n1s AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1s FROM big GROUP BY 1),
        |n1t AS (SELECT CAST(count(*) AS BIGINT) AS n1t FROM big),
        |vf AS (
        |  SELECT CAST(count(*) AS BIGINT) AS vv
        |  FROM (SELECT w1 AS w FROM tr UNION SELECT w2 FROM tr)),
        |sc AS (
        |  SELECT p.split, CAST(count(*) AS BIGINT) AS ec,
        |    CAST(-floor(ln(
        |      CASE WHEN coalesce(r.c1, 0) > 0 THEN
        |        (CASE WHEN coalesce(b.c12, 0) > 0
        |              THEN CAST(b.c12 AS DOUBLE) - 0.75 ELSE 0.0 END)
        |          / CAST(r.c1 AS DOUBLE)
        |        + 0.75 * CAST(coalesce(np.n1p, 0) AS DOUBLE)
        |          / CAST(r.c1 AS DOUBLE)
        |          * (CAST(coalesce(ns.n1s, 0) + 1 AS DOUBLE)
        |             / (CAST(n1t.n1t AS DOUBLE) + CAST(vf.vv AS DOUBLE) + 1.0))
        |      ELSE CAST(coalesce(ns.n1s, 0) + 1 AS DOUBLE)
        |           / (CAST(n1t.n1t AS DOUBLE) + CAST(vf.vv AS DOUBLE) + 1.0)
        |      END) * 1.0e9) AS BIGINT) AS nll9
        |  FROM pp p
        |  LEFT JOIN big b ON b.w1 = p.w1 AND b.w2 = p.w2
        |  LEFT JOIN pre r ON r.w1 = p.w1
        |  LEFT JOIN n1p np ON np.w1 = p.w1
        |  LEFT JOIN n1s ns ON ns.w2 = p.w2
        |  CROSS JOIN n1t CROSS JOIN vf
        |  GROUP BY p.split, p.w1, p.w2, b.c12, r.c1, np.n1p, ns.n1s,
        |           n1t.n1t, vf.vv),
        |a AS (
        |  SELECT split, CAST(sum(ec) AS BIGINT) AS n_bigrams,
        |    CAST(sum(nll9 * ec) AS BIGINT) AS s9
        |  FROM sc GROUP BY 1)
        |SELECT split, n_bigrams,
        |  round(CAST(s9 AS DOUBLE) / CAST(n_bigrams * 1000000000 AS DOUBLE), 6)
        |    + 0.0 AS mean_nll,
        |  round(exp(CAST(s9 AS DOUBLE) / CAST(n_bigrams * 1000000000 AS DOUBLE)), 4)
        |    + 0.0 AS perplexity
        |FROM a ORDER BY split""".stripMargin,
    // same zip-extracted bigrams, same add-one model from the SAME md5
    // split, −ln P on the same 1e-9 grid weighted by exact counts
    "q202_bigram_perplexity" ->
      """WITH toks AS (
        |  SELECT CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |              AS BIGINT) % 100 < 80 THEN 'train' ELSE 'eval' END AS split,
        |    string_split(text, ' ') AS w
        |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
        |pp AS (
        |  SELECT split,
        |    unnest(list_transform(generate_series(1, len(w) - 1), i -> w[i])) AS w1,
        |    unnest(list_transform(generate_series(1, len(w) - 1), i -> w[i+1])) AS w2
        |  FROM toks),
        |tr AS (SELECT w1, w2 FROM pp WHERE split = 'train'),
        |big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM tr GROUP BY 1, 2),
        |pre AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM tr GROUP BY 1),
        |vf AS (
        |  SELECT CAST(count(*) AS BIGINT) AS vv
        |  FROM (SELECT w1 AS w FROM tr UNION SELECT w2 FROM tr)),
        |sc AS (
        |  SELECT p.split, CAST(count(*) AS BIGINT) AS ec,
        |    CAST(-floor(ln((CAST(coalesce(b.c12, 0) + 1 AS DOUBLE))
        |      / (CAST(coalesce(r.c1, 0) AS DOUBLE) + CAST(vf.vv AS DOUBLE)))
        |      * 1.0e9) AS BIGINT) AS nll9
        |  FROM pp p
        |  LEFT JOIN big b ON b.w1 = p.w1 AND b.w2 = p.w2
        |  LEFT JOIN pre r ON r.w1 = p.w1
        |  CROSS JOIN vf
        |  GROUP BY p.split, p.w1, p.w2, b.c12, r.c1, vf.vv),
        |a AS (
        |  SELECT split, CAST(sum(ec) AS BIGINT) AS n_bigrams,
        |    CAST(sum(nll9 * ec) AS BIGINT) AS s9
        |  FROM sc GROUP BY 1)
        |SELECT split, n_bigrams,
        |  round(CAST(s9 AS DOUBLE) / CAST(n_bigrams * 1000000000 AS DOUBLE), 6)
        |    + 0.0 AS mean_nll,
        |  round(exp(CAST(s9 AS DOUBLE) / CAST(n_bigrams * 1000000000 AS DOUBLE)), 4)
        |    + 0.0 AS perplexity
        |FROM a ORDER BY split""".stripMargin,
    // same distinct (source, word) frame, same bounded pair join,
    // Jaccard one division of exact integers
    // q32's scored CTE verbatim + the labeled join, exact cell counts,
    // one round-6 row-share division
    "q236_lang_confusion" ->
      """WITH scored AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split(text, ' '), x -> x IN ('the','a','of','and','is')))
        |      / nullif(len(string_split(text, ' ')), 0)::DOUBLE AS score_en,
        |    len(list_filter(string_split(text, ' '), x -> x IN ('el','la','de','y','que')))
        |      / nullif(len(string_split(text, ' ')), 0)::DOUBLE AS score_es,
        |    len(list_filter(string_split(text, ' '), x -> x IN ('der','die','das','und','ist')))
        |      / nullif(len(string_split(text, ' ')), 0)::DOUBLE AS score_de,
        |    len(list_filter(string_split(text, ' '), x -> x IN ('le','les','et','est','une')))
        |      / nullif(len(string_split(text, ' ')), 0)::DOUBLE AS score_fr
        |  FROM documents),
        |pred AS (
        |  SELECT doc_id,
        |    CASE WHEN score_en >= greatest(score_es, score_de, score_fr) THEN 'en'
        |         WHEN score_es >= greatest(score_de, score_fr) THEN 'es'
        |         WHEN score_de >= score_fr THEN 'de'
        |         ELSE 'fr' END AS predicted
        |  FROM scored),
        |cm AS (
        |  SELECT d.lang AS actual, p.predicted, CAST(count(*) AS BIGINT) AS n
        |  FROM pred p JOIN documents d USING (doc_id)
        |  GROUP BY 1, 2),
        |rt AS (SELECT actual, CAST(sum(n) AS BIGINT) AS row_n FROM cm GROUP BY 1)
        |SELECT cm.actual, cm.predicted, cm.n,
        |  round(CAST(cm.n AS DOUBLE) / CAST(rt.row_n AS DOUBLE), 6) AS row_share,
        |  cm.actual = cm.predicted AS diagonal
        |FROM cm JOIN rt USING (actual)
        |ORDER BY actual, predicted""".stripMargin,
    // same corpus-derived stoplist cut, same i − row_number islands,
    // same 1e-9 deg/freq word grid and exact BIGINT phrase sums
    "q229_rake_keywords" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         |         unnest(range(0, len(string_split(text, ' ')))) AS i
         |  FROM documents),
         |stop AS (
         |  SELECT w FROM (SELECT w, count(*) AS c FROM tok WHERE w <> ''
         |                 GROUP BY 1)
         |  ORDER BY c DESC, w LIMIT $RakeStopK),
         |kept AS (
         |  SELECT doc_id, i, w FROM tok
         |  WHERE w <> '' AND w NOT IN (SELECT w FROM stop)),
         |isl AS (
         |  SELECT doc_id, i, w,
         |    i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
         |  FROM kept),
         |ph AS (
         |  SELECT doc_id, grp, string_agg(w, ' ' ORDER BY i) AS phrase,
         |    CAST(count(*) AS BIGINT) AS nw
         |  FROM isl GROUP BY 1, 2 HAVING count(*) <= $RakeMaxLen),
         |pw AS (
         |  SELECT doc_id, grp, phrase, nw,
         |    unnest(string_split(phrase, ' ')) AS w
         |  FROM ph),
         |ws AS (
         |  SELECT w,
         |    CAST(floor(CAST(sum(nw) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |               * 1.0e9) AS BIGINT) AS s9
         |  FROM pw GROUP BY 1),
         |inst AS (
         |  SELECT pw.doc_id, pw.grp, pw.phrase, pw.nw,
         |    CAST(sum(s9) AS BIGINT) AS inst9
         |  FROM pw JOIN ws USING (w) GROUP BY 1, 2, 3, 4),
         |ag AS (
         |  SELECT phrase, CAST(max(nw) AS BIGINT) AS n_words,
         |    CAST(count(*) AS BIGINT) AS n_occurrences,
         |    CAST(max(inst9) AS BIGINT) AS score9
         |  FROM inst GROUP BY 1)
         |SELECT phrase, n_words, n_occurrences,
         |  round(CAST(score9 AS DOUBLE) / 1.0e9, 6) AS rake_score
         |FROM ag ORDER BY score9 DESC, phrase LIMIT $RakeTopK""".stripMargin,
    // same (source, word) counts, same cross-product log arguments on
    // the 1e-9 floor grid weighted by exact counts, same closed-form
    // exclusive-mass ln2 literal, one final dag
    "q226_js_divergence" ->
      """WITH swc AS (
        |  SELECT source, w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT source, unnest(list_filter(string_split(text, ' '),
        |                x -> x <> '')) AS w
        |        FROM documents)
        |  GROUP BY 1, 2),
        |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM swc GROUP BY 1),
        |wn AS (SELECT swc.source, w, c, n FROM swc JOIN ns USING (source)),
        |pr AS (
        |  SELECT l.source AS sa, r.source AS sb,
        |    l.c AS ca, l.n AS na, r.c AS cb, r.n AS nb,
        |    l.c * r.n AS da, r.c * l.n AS db
        |  FROM wn l JOIN wn r ON l.w = r.w AND l.source < r.source),
        |t AS (
        |  SELECT sa, sb, ca, cb, na, nb,
        |    CAST(floor(ln(2.0 * CAST(da AS DOUBLE) / CAST(da + db AS DOUBLE))
        |               * 1.0e9) AS BIGINT) AS la9,
        |    CAST(floor(ln(2.0 * CAST(db AS DOUBLE) / CAST(da + db AS DOUBLE))
        |               * 1.0e9) AS BIGINT) AS lb9
        |  FROM pr),
        |g AS (
        |  SELECT sa, sb, CAST(count(*) AS BIGINT) AS n_common,
        |    max(na) AS na, max(nb) AS nb,
        |    CAST(sum(CAST(ca * la9 AS HUGEINT)) AS DOUBLE) AS a9,
        |    CAST(sum(CAST(cb * lb9 AS HUGEINT)) AS DOUBLE) AS b9,
        |    CAST(sum(ca) AS BIGINT) AS sca, CAST(sum(cb) AS BIGINT) AS scb
        |  FROM t GROUP BY 1, 2)
        |SELECT sa, sb, n_common,
        |  round(((a9 + CAST(na - sca AS DOUBLE) * 6.9314718E8)
        |           / CAST(na AS DOUBLE)
        |         + (b9 + CAST(nb - scb AS DOUBLE) * 6.9314718E8)
        |           / CAST(nb AS DOUBLE)) / 2.0e9, 6) + 0.0 AS jsd
        |FROM g ORDER BY sa, sb""".stripMargin,
    "q203_source_vocab_overlap" ->
      """WITH sw AS (
        |  SELECT DISTINCT source, w
        |  FROM (SELECT source, unnest(list_filter(string_split(text, ' '),
        |                x -> x <> '')) AS w
        |        FROM documents)),
        |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS vsz FROM sw GROUP BY 1),
        |iv AS (
        |  SELECT l.source AS sa, r.source AS sb, CAST(count(*) AS BIGINT) AS i
        |  FROM sw l JOIN sw r ON l.w = r.w AND l.source < r.source
        |  GROUP BY 1, 2)
        |SELECT sa, sb, a.vsz AS va, b.vsz AS vb, i AS v_common,
        |  round(CAST(i AS DOUBLE) / CAST(a.vsz + b.vsz - i AS DOUBLE), 6) + 0.0
        |    AS vocab_jaccard
        |FROM iv JOIN sz a ON a.source = iv.sa JOIN sz b ON b.source = iv.sb
        |ORDER BY sa, sb""".stripMargin,
    // same vowel-group regex, same period-split sentences, same 1e-6
    // per-doc grid and exact-sum means
    "q196_flesch_readability" ->
      """WITH f AS (
        |  SELECT lang,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS BIGINT) AS w,
        |    CAST(greatest(len(list_filter(string_split(text, '.'),
        |      x -> trim(x) <> '')), 1) AS BIGINT) AS sent,
        |    CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT) AS syl
        |  FROM documents),
        |g AS (
        |  SELECT lang, w, sent, syl,
        |    CAST(floor((206.835
        |      - 1.015 * (CAST(w AS DOUBLE) / CAST(sent AS DOUBLE))
        |      - 84.6 * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE))) * 1.0e6)
        |      AS BIGINT) AS f6
        |  FROM f WHERE w > 0),
        |a AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(w) AS BIGINT) AS sw, CAST(sum(sent) AS BIGINT) AS ssent,
        |    CAST(sum(syl) AS BIGINT) AS ssyl, CAST(sum(f6) AS BIGINT) AS sf6
        |  FROM g GROUP BY 1)
        |SELECT lang, n_docs,
        |  round(CAST(sf6 AS DOUBLE) / (CAST(n_docs AS DOUBLE) * 1.0e6), 4) + 0.0
        |    AS mean_flesch,
        |  round(CAST(sw AS DOUBLE) / CAST(ssent AS DOUBLE), 4) + 0.0
        |    AS words_per_sentence,
        |  round(CAST(ssyl AS DOUBLE) / CAST(sw AS DOUBLE), 4) + 0.0
        |    AS syllables_per_word
        |FROM a ORDER BY lang""".stripMargin,
    // the (doc_id, position) global order spelled as ONE rank window
    // (valid at oracle scale; the Spark side is the two-pass shard
    // scan), same checkpoint set, same micro-grid ln + OLS dag
    "q189_heaps_fit" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '),
        |           x -> x <> '') AS ws
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, unnest(ws) AS w,
        |    unnest(range(1, len(ws) + 1)) AS i
        |  FROM t),
        |p AS (
        |  SELECT w, row_number() OVER (ORDER BY doc_id, i) - 1 AS pos
        |  FROM tok),
        |fp AS (SELECT w, CAST(min(pos) AS BIGINT) AS fp FROM p GROUP BY 1),
        |nt AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM tok),
        |ck AS (
        |  SELECT CAST(1 AS BIGINT) << k AS ncap
        |  FROM (SELECT unnest(range(10, 41)) AS k), nt
        |  WHERE (CAST(1 AS BIGINT) << k) >= 1024
        |    AND (CAST(1 AS BIGINT) << k) <= nt),
        |vn AS (
        |  SELECT ncap, CAST(count(*) AS BIGINT) AS v
        |  FROM fp CROSS JOIN ck WHERE fp < ncap GROUP BY 1),
        |g AS (
        |  SELECT CAST(floor(ln(CAST(ncap AS DOUBLE)) * 1000000.0) AS BIGINT) AS x,
        |         CAST(floor(ln(CAST(v AS DOUBLE)) * 1000000.0) AS BIGINT) AS y
        |  FROM vn),
        |m AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(x * x) AS DOUBLE) AS sxx,
        |    CAST(sum(x * y) AS DOUBLE) AS sxy,
        |    CAST(sum(y * y) AS DOUBLE) AS syy
        |  FROM g)
        |SELECT CAST(n AS BIGINT) AS n_points,
        |  round((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0), 4)
        |    + 0.0 AS heaps_beta,
        |  round((sy - sx * ((n * sxy - sx * sy)
        |                    / nullif(n * sxx - sx * sx, 0.0)))
        |        / n / 1000000.0, 4) + 0.0 AS intercept_ln,
        |  round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
        |        / nullif((n * sxx - sx * sx) * (n * syy - sy * sy), 0.0),
        |        4) + 0.0 AS r_squared
        |FROM m""".stripMargin,
    // same counts, same floor-snapped ln terms (exact BIGINT δ), same
    // gridded z and per-source top-5 (ties alphabetical)
    "q190_term_enrichment" ->
      """WITH cnt AS (
        |  SELECT source, w, CAST(count(*) AS BIGINT) AS cs
        |  FROM (SELECT source, unnest(list_filter(string_split(text, ' '),
        |                x -> x <> '')) AS w
        |        FROM documents)
        |  GROUP BY 1, 2),
        |wt AS (SELECT w, CAST(sum(cs) AS BIGINT) AS cw FROM cnt GROUP BY 1),
        |st AS (SELECT source, CAST(sum(cs) AS BIGINT) AS ns FROM cnt GROUP BY 1),
        |g AS (SELECT CAST(sum(ns) AS BIGINT) AS n FROM st),
        |sc AS (
        |  SELECT c.source, c.w, c.cs, wt.cw - c.cs AS cr,
        |    CAST(floor(ln((CAST(c.cs AS DOUBLE) + 0.5)
        |           / (CAST(st.ns - c.cs AS DOUBLE) + 0.5)) * 1.0e9) AS BIGINT)
        |    - CAST(floor(ln((CAST(wt.cw - c.cs AS DOUBLE) + 0.5)
        |           / (CAST(g.n - st.ns - (wt.cw - c.cs) AS DOUBLE) + 0.5))
        |           * 1.0e9) AS BIGINT) AS d9
        |  FROM cnt c JOIN wt USING (w) JOIN st USING (source) CROSS JOIN g),
        |z AS (
        |  SELECT source, w, cs,
        |    round(CAST(d9 AS DOUBLE) / 1.0e9
        |      / sqrt(1.0 / (CAST(cs AS DOUBLE) + 0.5)
        |             + 1.0 / (CAST(cr AS DOUBLE) + 0.5)), 6) + 0.0 AS z
        |  FROM sc),
        |r AS (
        |  SELECT source, w, cs, z,
        |    row_number() OVER (PARTITION BY source ORDER BY z DESC, w) AS rnk
        |  FROM z)
        |SELECT source, rnk, w AS word, cs, z
        |FROM r WHERE rnk <= 5 ORDER BY source, rnk""".stripMargin,
    // same tie-grouped rank-sum identity on exact integers, same final
    // G dag
    "q188_vocab_gini" ->
      """WITH cnts AS (
        |  SELECT word, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(list_filter(string_split(text, ' '),
        |                x -> x <> '')) AS word
        |        FROM documents)
        |  GROUP BY 1),
        |vc AS (SELECT c, CAST(count(*) AS BIGINT) AS m FROM cnts GROUP BY 1),
        |r AS (
        |  SELECT c, m,
        |    coalesce(sum(m) OVER (ORDER BY c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r_before
        |  FROM vc),
        |t AS (
        |  SELECT m, c * m AS toks,
        |    c * (m * r_before + m * (m + 1) // 2) AS term
        |  FROM r),
        |a AS (
        |  SELECT CAST(sum(m) AS BIGINT) AS v_words,
        |    sum(toks) AS nt, sum(term) AS s
        |  FROM t)
        |SELECT v_words, CAST(nt AS BIGINT) AS n_tokens,
        |  round(2.0 * CAST(s AS DOUBLE)
        |        / (CAST(v_words AS DOUBLE) * CAST(nt AS DOUBLE))
        |        - CAST(v_words + 1 AS DOUBLE) / CAST(v_words AS DOUBLE), 6) + 0.0
        |    AS gini_concentration
        |FROM a""".stripMargin,
    // same word-count frame, five exact integers, identical estimator
    // arithmetic (integer products cast to double once)
    "q180_vocab_richness" ->
      """WITH cnts AS (
        |  SELECT word, CAST(count(*) AS BIGINT) AS cnt
        |  FROM (SELECT unnest(list_filter(string_split(text, ' '),
        |                x -> x <> '')) AS word
        |        FROM documents)
        |  GROUP BY 1),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS v_obs,
        |    CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |    CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        |    CAST(sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
        |  FROM cnts)
        |SELECT v_obs, n_tokens, f1, f2,
        |  round(CAST(v_obs AS DOUBLE)
        |        + CAST(f1 * (f1 - 1) AS DOUBLE) / CAST((f2 + 1) * 2 AS DOUBLE),
        |        4) + 0.0 AS chao1,
        |  round(CAST(f1 AS DOUBLE) / CAST(nullif(n_tokens, 0) AS DOUBLE), 6) + 0.0
        |    AS gt_unseen_mass,
        |  round(CAST(1 AS DOUBLE)
        |        - CAST(f1 AS DOUBLE) / CAST(nullif(n_tokens, 0) AS DOUBLE), 6) + 0.0
        |    AS coverage
        |FROM m""".stripMargin,
    // same top-K head (ties alphabetical), same per-row ln micro grid,
    // exact HUGEINT moments, same closed-form slope/intercept/R² dag
    "q168_zipf_fit" ->
      s"""WITH cnts AS (
         |  SELECT word, CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT unnest(list_filter(string_split(text, ' '),
         |                x -> x <> '')) AS word
         |        FROM documents)
         |  GROUP BY 1),
         |top AS (
         |  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, word) AS rank
         |  FROM cnts ORDER BY cnt DESC, word LIMIT $ZipfK),
         |g AS (
         |  SELECT
         |    CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000.0) AS BIGINT) AS x,
         |    CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1000000.0) AS BIGINT) AS y
         |  FROM top),
         |m AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n,
         |    CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
         |    CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
         |    CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS DOUBLE) AS sxx,
         |    CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS DOUBLE) AS sxy,
         |    CAST(sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS DOUBLE) AS syy
         |  FROM g)
         |SELECT CAST(n AS BIGINT) AS n_words,
         |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) + 0.0
         |    AS zipf_slope,
         |  round((sy - sx * ((n * sxy - sx * sy) / (n * sxx - sx * sx)))
         |        / n / 1000000.0, 4) + 0.0 AS intercept_ln,
         |  round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
         |        / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) + 0.0
         |    AS r_squared
         |FROM m""".stripMargin,
    // same tagged-gram generation (list_slice is inclusive-both-ends,
    // so the n-gram at i spans [i, i+n-1]); the guards mirror Spark's
    // short-doc empty arrays
    "q159_ngram_diversity" ->
      """WITH w AS (
        |  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents),
        |g AS (
        |  SELECT p.n AS n, p.g AS g FROM (
        |    SELECT unnest(list_concat(
        |      CASE WHEN len(ws) >= 1 THEN list_transform(
        |        generate_series(1, len(ws)),
        |        i -> struct_pack(n := 1,
        |               g := array_to_string(list_slice(ws, i, i), ' ')))
        |        ELSE [] END,
        |      list_concat(
        |        CASE WHEN len(ws) >= 2 THEN list_transform(
        |          generate_series(1, len(ws) - 1),
        |          i -> struct_pack(n := 2,
        |                 g := array_to_string(list_slice(ws, i, i + 1), ' ')))
        |          ELSE [] END,
        |        CASE WHEN len(ws) >= 3 THEN list_transform(
        |          generate_series(1, len(ws) - 2),
        |          i -> struct_pack(n := 3,
        |                 g := array_to_string(list_slice(ws, i, i + 2), ' ')))
        |          ELSE [] END))) AS p
        |    FROM w)),
        |pc AS (SELECT n, g, count(*) AS c FROM g GROUP BY 1, 2)
        |SELECT CAST(n AS INTEGER) AS n,
        |  CAST(sum(c) AS BIGINT) AS total_ngrams,
        |  CAST(count(*) AS BIGINT) AS distinct_ngrams,
        |  round(CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6) + 0.0
        |    AS distinct_ratio
        |FROM pc GROUP BY 1 ORDER BY 1""".stripMargin,
    "q149_nfc_normalize" ->
      """SELECT doc_id,
        |  length('Cafe' || chr(769) || ' nin' || chr(771) || 'o ' || text)
        |    AS len_raw,
        |  length(nfc_normalize(
        |    'Cafe' || chr(769) || ' nin' || chr(771) || 'o ' || text))
        |    AS len_norm,
        |  md5(nfc_normalize(
        |    'Cafe' || chr(769) || ' nin' || chr(771) || 'o ' || text))
        |    AS norm_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q33c_char_entropy" -> {
      val letters = ('a' to 'z').map(_.toString)
      val countCols = letters
        .map(ch => s"length(text) - length(replace(text, '$ch', '')) AS c_$ch")
        .mkString(",\n        |    ")
      val totalSum = letters.map(ch => s"c_$ch").mkString(" + ")
      val termSum = letters
        .map(ch =>
          s"CASE WHEN c_$ch > 0 THEN (CAST(c_$ch AS DOUBLE) / CAST(n_letters AS DOUBLE))" +
            s" * ln(CAST(c_$ch AS DOUBLE) / CAST(n_letters AS DOUBLE)) ELSE CAST(0 AS DOUBLE) END"
        )
        .mkString("\n        |    + ")
      s"""WITH c AS (
        |  SELECT doc_id,
        |    $countCols
        |  FROM documents),
        |t AS (SELECT *, CAST($totalSum AS BIGINT) AS n_letters FROM c)
        |SELECT doc_id, n_letters,
        |  CASE WHEN n_letters > 0 THEN round(-($termSum), 4) + 0.0 END
        |    AS char_entropy
        |FROM t ORDER BY doc_id""".stripMargin
    },
    "q69_distribution_drift" -> {
      val b = Sampling.BucketSql
      s"""WITH d AS (
         |  SELECT lang, text, ($b < 80) AS is_a FROM documents),
         |tok AS (SELECT lang, is_a, unnest(string_split(text, ' ')) AS w FROM d),
         |t2 AS (SELECT lang, is_a, w FROM tok WHERE w <> ''),
         |cnt AS (
         |  SELECT lang, w,
         |         CAST(count(*) FILTER (is_a) AS BIGINT) AS ca,
         |         CAST(count(*) FILTER (NOT is_a) AS BIGINT) AS cb
         |  FROM t2 GROUP BY 1, 2),
         |tot AS (
         |  SELECT lang, CAST(sum(ca) AS BIGINT) AS na,
         |         CAST(sum(cb) AS BIGINT) AS nb, count(*) AS vocab
         |  FROM cnt GROUP BY lang),
         |pq AS (
         |  SELECT lang, (ca + 1.0) / (na + vocab) AS p,
         |         (cb + 1.0) / (nb + vocab) AS q
         |  FROM cnt JOIN tot USING (lang)),
         |agg AS (
         |  SELECT lang,
         |    round(sum(p * ln(p / q)), 4) + 0.0 AS kl_ab,
         |    round(sum(q * ln(q / p)), 4) + 0.0 AS kl_ba,
         |    round(0.5 * sum(p * ln(p / ((p + q) / 2)))
         |        + 0.5 * sum(q * ln(q / ((p + q) / 2))), 4) + 0.0 AS js
         |  FROM pq GROUP BY lang)
         |SELECT lang, na, nb, vocab, kl_ab, kl_ba, js
         |FROM agg JOIN tot USING (lang)
         |ORDER BY lang""".stripMargin
    },
    "q67_corpus_stats" ->
      """WITH tok AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents),
        |t2 AS (SELECT lang, w FROM tok WHERE w <> ''),
        |tf AS (SELECT lang, w, count(*) AS c FROM t2 GROUP BY 1, 2),
        |stats AS (
        |  SELECT lang, count(*) AS n_types, CAST(sum(c) AS BIGINT) AS n_tokens,
        |         CAST(count(*) FILTER (c = 1) AS BIGINT) AS hapax
        |  FROM tf GROUP BY lang),
        |nd AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
        |ranked AS (
        |  SELECT lang, c, row_number() OVER (
        |    PARTITION BY lang ORDER BY c DESC, w) AS rn FROM tf),
        |zipf AS (
        |  SELECT lang, round(regr_slope(ln(c), ln(rn)), 4) + 0.0 AS zipf_slope
        |  FROM ranked WHERE rn <= 100 GROUP BY lang)
        |SELECT lang, n_docs, n_tokens, n_types,
        |       round(n_types * 1.0 / n_tokens, 4) AS type_token_ratio,
        |       hapax, zipf_slope
        |FROM stats JOIN nd USING (lang) JOIN zipf USING (lang)
        |ORDER BY lang""".stripMargin,
    "q34d_vocab_coverage" ->
      s"""WITH tok AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents),
        |tok2 AS (SELECT lang, w FROM tok WHERE w <> ''),
        |vocab AS (
        |  SELECT w FROM (
        |    SELECT w, count(*) AS cnt FROM tok2 GROUP BY w
        |    ORDER BY cnt DESC, w LIMIT $VocabK))
        |SELECT lang, count(*) AS n_tokens,
        |  CAST(count(v.w) AS BIGINT) AS covered,
        |  round(CAST(count(v.w) AS DOUBLE) / count(*), 4) AS coverage
        |FROM tok2 LEFT JOIN vocab v USING (w)
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q34c_bpe_pairs" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS w FROM documents),
        |pairs AS (
        |  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
        |    i -> w[i] || ' ' || w[i+1])) AS pair
        |  FROM toks WHERE len(w) >= 2)
        |SELECT pair, count(*) AS cnt FROM pairs
        |GROUP BY pair ORDER BY cnt DESC, pair LIMIT 20""".stripMargin,
    "q33b_length_filter" ->
      """WITH lc AS (SELECT n_chars, count(*) AS c FROM documents GROUP BY n_chars),
        |cum AS (SELECT n_chars,
        |          sum(c) OVER (ORDER BY n_chars) AS cum_le,
        |          sum(c) OVER (ORDER BY n_chars) - c AS cum_lt
        |        FROM lc),
        |t AS (SELECT count(*) AS n FROM documents)
        |SELECT doc_id, d.n_chars
        |FROM documents d JOIN cum ON d.n_chars = cum.n_chars CROSS JOIN t
        |WHERE 10 * cum_le > n AND 10 * cum_lt < 9 * n
        |ORDER BY doc_id""".stripMargin,
    "q34b_vocab_topk" ->
      """SELECT w, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |WHERE w <> ''
        |GROUP BY w ORDER BY cnt DESC, w LIMIT 20""".stripMargin,
    "q32_lang_id" ->
      """WITH scored AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split(text, ' '), x -> x IN ('the','a','of','and','is')))
        |      / nullif(len(string_split(text, ' ')), 0)::DOUBLE AS score_en,
        |    len(list_filter(string_split(text, ' '), x -> x IN ('el','la','de','y','que')))
        |      / nullif(len(string_split(text, ' ')), 0)::DOUBLE AS score_es,
        |    len(list_filter(string_split(text, ' '), x -> x IN ('der','die','das','und','ist')))
        |      / nullif(len(string_split(text, ' ')), 0)::DOUBLE AS score_de,
        |    len(list_filter(string_split(text, ' '), x -> x IN ('le','les','et','est','une')))
        |      / nullif(len(string_split(text, ' ')), 0)::DOUBLE AS score_fr
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN score_en >= greatest(score_es, score_de, score_fr) THEN 'en'
        |       WHEN score_es >= greatest(score_de, score_fr) THEN 'es'
        |       WHEN score_de >= score_fr THEN 'de'
        |       ELSE 'fr' END AS pred_lang,
        |  round(score_en, 4) AS score_en
        |FROM scored ORDER BY doc_id""".stripMargin,
    "q33_quality_score" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  round(length(regexp_replace(text, '[^a-z]', '', 'g'))
        |        / nullif(length(text), 0)::DOUBLE, 4) AS alpha_ratio,
        |  round(length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
        |        / nullif(length(text), 0)::DOUBLE, 4) AS punct_ratio,
        |  round(len(list_filter(string_split(text, ' '),
        |        x -> x IN ('the','a','of','and','is','to','in')))
        |        / nullif(len(string_split(text, ' ')), 0)::DOUBLE, 4) AS stopword_ratio,
        |  round(length(text) / nullif(len(string_split(text, ' ')), 0)::DOUBLE, 4)
        |    AS avg_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q34_token_count" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_ws_tokens,
        |  CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9\s]'))) AS BIGINT)
        |    AS total_bpe_tokens,
        |  round(avg(length(text)), 2) AS avg_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q53_scrub" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '\b(customer|order|user|[0-9]+)\b'))
        |    AS n_redactions,
        |  md5(regexp_replace(text, '\b(customer|order|user|[0-9]+)\b',
        |    '[REDACTED]', 'g')) AS scrubbed_md5,
        |  length(regexp_replace(text, '\b(customer|order|user|[0-9]+)\b',
        |    '[REDACTED]', 'g')) AS scrubbed_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q55_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |grams AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
        |      i -> w[i] || '_' || w[i+1] || '_' || w[i+2])) AS g
        |  FROM toks),
        |counted AS (
        |  SELECT doc_id, g, count(*) AS cnt FROM grams GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_grams,
        |  CAST(max(cnt) AS BIGINT) AS max_rep,
        |  round(max(cnt) * 1.0 / sum(cnt), 4) AS rep_ratio
        |FROM counted GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q57_surprisal" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |freq AS (SELECT w, count(*) AS freq FROM toks GROUP BY w),
        |tot AS (SELECT count(*) AS n_total FROM toks)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(-avg(ln(freq * 1.0 / n_total)), 4) AS surprisal
        |FROM toks JOIN freq USING (w) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q57b_bigram_surprisal" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |pp AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(w) - 1), i -> w[i])) AS w1,
        |    unnest(list_transform(generate_series(1, len(w) - 1), i -> w[i+1])) AS w2
        |  FROM toks WHERE len(w) >= 2),
        |big AS (SELECT w1, w2, count(*) AS c12 FROM pp GROUP BY 1, 2),
        |pre AS (SELECT w1, count(*) AS c1 FROM pp GROUP BY 1)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(-avg(ln(c12 * 1.0 / c1)), 4) AS bigram_surprisal
        |FROM pp JOIN big USING (w1, w2) JOIN pre USING (w1)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q51_tfidf" ->
      """WITH words AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |tfq AS (SELECT doc_id, w, count(*) AS tf FROM words GROUP BY 1, 2),
        |dfq AS (SELECT w, count(*) AS df FROM tfq GROUP BY w),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, tfq.w, tf, df,
        |    tf * ln((n_docs + 1.0) / (df + 1.0)) AS tfidf
        |  FROM tfq JOIN dfq ON tfq.w = dfq.w CROSS JOIN n),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY tfidf DESC, w) AS rn
        |  FROM scored)
        |SELECT doc_id, rn, w, tf, df, round(tfidf, 4) AS tfidf
        |FROM ranked WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,
    "q35_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |    (acc, c) -> (acc * 31 + c) % 2147483647) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
