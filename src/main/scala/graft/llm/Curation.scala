package graft.llm

import graft.queries.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q47: the end-to-end curation pipeline — the composition proof that the
  * individual LLM operators (language ID, quality scoring, exact dedup,
  * deterministic split) chain into one Spark plan a training-data team
  * would actually run:
  *
  *   1. language ID (q32's marker-stopword argmax) → keep pred 'en';
  *   2. quality gates: ≥ 0.05 en-stopword ratio (drops marker-free text,
  *      incl. docs the argmax tie-breaks to 'en' with zero evidence) and
  *      ≥ 20 whitespace tokens;
  *   3. exact dedup on md5(text), keeping the smallest doc_id per digest
  *      (a no-op on corpora without duplicates — the stage still runs);
  *   4. deterministic md5 train/valid/test split (q43's recipe);
  *   5. per-split doc and token totals.
  *
  * Everything stays closed-form (marker ratios, md5 digests/buckets), so
  * the DuckDB oracle replays the ENTIRE pipeline — each stage is already
  * individually oracle-checked (q32/q33/q25/q43); this checks their
  * composition. One narrow scan, two hash aggregations (digest dedup,
  * split rollup); no joins, no driver-side steps.
  */
object Curation {

  private def q47(s: SparkSession, dir: String): DataFrame = {
    // single source with q32/q43: TextAnalysis.langMarkers drives the
    // scores, Sampling.bucket100 drives the split — editing either
    // operator updates this pipeline (and both oracles) with it
    val markers = TextAnalysis.langMarkers.toMap
    def score(lang: String): Column =
      size(filter(col("w"), x => x.isin(markers(lang): _*))) /
        TextAnalysis.nullIfZero(size(col("w")).cast("double"))

    val scored = Tables
      .table(s, dir, "documents")
      .select(col("doc_id"), col("text"), split(col("text"), " ").as("w"))
      .select(
        col("doc_id"),
        col("text"),
        size(col("w")).as("n_tokens"),
        score("en").as("s_en"),
        score("es").as("s_es"),
        score("de").as("s_de"),
        score("fr").as("s_fr")
      )

    val kept = scored
      .filter(
        col("s_en") >= greatest(col("s_es"), col("s_de"), col("s_fr")) &&
          col("s_en") >= 0.05 &&
          col("n_tokens") >= 20
      )

    val deduped = kept
      .groupBy(md5(col("text")).as("digest"))
      // identical texts tokenize identically, so min == any; min keeps
      // the aggregate deterministic (first() is order-dependent)
      .agg(min(col("doc_id")).as("doc_id"), min(col("n_tokens")).as("n_tokens"))

    deduped
      .withColumn("bucket", Sampling.bucket100(col("doc_id")))
      .withColumn(
        "split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "valid")
          .otherwise("test")
      )
      .groupBy("split")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens")
      )
      .orderBy("split")
  }

  /** q56: source-mixing table — per-source doc/token shares plus the
    * resampling weight that would equalize the mix (target = uniform
    * across sources; weight = target_share / actual_doc_share). The
    * output is the small per-source table a sampler joins back onto the
    * corpus; everything is one aggregation plus a broadcast of the 1-row
    * corpus totals (which also carry the distinct-source count).
    */
  private def q56(s: SparkSession, dir: String): DataFrame = {
    val d = Tables
      .table(s, dir, "documents")
      .select(col("source"), size(split(col("text"), " ")).as("n_tokens"))
    val totals = d.agg(
      count(lit(1)).as("total_docs"),
      sum("n_tokens").as("total_tokens"),
      countDistinct("source").as("n_sources")
    )
    d.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens"))
      .crossJoin(broadcast(totals))
      .select(
        col("source"),
        col("n_docs"),
        col("tokens"),
        round(col("n_docs") / col("total_docs"), 6).as("doc_share"),
        round(col("tokens") / col("total_tokens"), 6).as("token_share"),
        round(
          (lit(1.0) / col("n_sources")) / (col("n_docs") / col("total_docs")),
          4
        ).as("uniform_weight")
      )
      .orderBy("source")
  }

  /** q56b: EXECUTE the mixing weights q56 only computes — produce the
    * resampled epoch. Each source's uniform weight w = total_docs /
    * (n_sources · n_docs_s) becomes a per-document copy count:
    * ⌊w⌋ guaranteed copies plus one more when the document's
    * deterministic md5 bucket (as u ∈ [0,1)) falls below frac(w) — so a
    * source with w = 2.3 is duplicated 2× always and 3× for 30% of its
    * docs, and a source with w = 0.4 keeps 40% — exactly the
    * oversample/undersample semantics of temperature-mixing a corpus,
    * with every decision replayable (content-hash, never rand()).
    *
    * Scale shape: one count aggregate per source, a 1-row totals frame,
    * an UNHINTED equi-join of the corpus to the per-source weight table
    * (one row per source — often tiny, but at web scale "source" can be
    * millions of domains, so AQE decides broadcast-vs-shuffle from
    * runtime sizes per the zero-assumption-bounded-hints policy), then a
    * narrow 1→N `explode(sequence(...))` — no driver loop, no second
    * shuffle of the expanded rows. Copy counts are capped at
    * [[MaxCopies]] (every real mixing recipe caps oversampling — an
    * epoch that repeats one document hundreds of times is a training
    * bug, and an uncapped w = total/(n_sources·n_docs) would hand a
    * 1-doc source in a skewed corpus a copies-length array big enough
    * to OOM its task); the cap is applied identically in the oracle.
    */
  val MaxCopies = 100

  private def q56b(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.table(s, dir, "documents").select(col("doc_id"), col("source"))
    val bySource = d.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val totals = d.agg(
      count(lit(1)).as("total_docs"),
      countDistinct("source").as("n_sources")
    )
    val weights = bySource
      .crossJoin(broadcast(totals)) // 1-row totals: bounded by construction
      .select(
        col("source"),
        (col("total_docs").cast("double") / (col("n_sources") * col("n_docs")))
          .as("w")
      )
    d.join(weights, "source")
      .withColumn("u", Sampling.bucket100(col("doc_id")) / lit(100.0))
      .withColumn(
        "copies",
        least(
          floor(col("w")).cast("long") +
            when(col("u") < col("w") - floor(col("w")), 1L).otherwise(0L),
          lit(MaxCopies.toLong)
        )
      )
      .filter(col("copies") > 0)
      .select(
        col("doc_id"),
        col("source"),
        explode(sequence(lit(1L), col("copies"))).as("copy_id")
      )
      .orderBy("doc_id", "copy_id")
  }

  /** q58: train/eval decontamination — flag training documents sharing
    * any word-3-gram with the held-out split (the n-gram-overlap
    * decontamination step of GPT-3-style pipelines), reusing q43's md5
    * split (bucket ≥ 90 = the eval side) and the dedup shingle corpus.
    * Shape at scale: the eval side is a small fraction of the corpus, but
    * a 10% split of 100 TB still has a distinct-3-gram set in the TBs —
    * far past driver broadcast limits — so the join carries NO broadcast
    * hint: AQE broadcasts it when it is actually small and falls back to
    * a shuffled equi-join on the gram when it isn't. Either way the
    * training corpus streams once and nothing all-pairs ever forms —
    * PlanShapeSpec pins q58's gram join to equi hash/merge shapes — and
    * at production sizes Spark's runtime bloom-filter injection (the
    * machinery PlanShapeSpec exercises on a lineitem/orders join with
    * lowered thresholds) can further prune the training scan. Output:
    * each contaminated training doc with its shared-gram count (the
    * evidence a removal pass logs).
    */
  private def q58(s: SparkSession, dir: String): DataFrame = {
    val buckets = Tables
      .table(s, dir, "documents")
      .select(col("doc_id"), Sampling.bucket100(col("doc_id")).as("bucket"))
    val sh = Dedup.cachedShingles(s, dir)
    val evalGrams = sh
      .join(buckets.filter(col("bucket") >= 90), "doc_id")
      .select("g")
      .distinct()
    sh.join(buckets.filter(col("bucket") < 90), "doc_id")
      .join(evalGrams, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared_grams"))
      .orderBy("doc_id")
  }

  /** q62: FUZZY train/eval decontamination — q58 flags exact word-3-gram
    * overlap; this flags NEAR-duplicate contamination (a paraphrased or
    * lightly-edited eval document hiding in the training split) the way
    * production pipelines do: MinHash-LSH candidates ACROSS the split
    * boundary, verified with exact Jaccard ≥ 0.6, aggregated per
    * training doc (match count + strongest match — the evidence a
    * removal pass logs). Reuses q27's banded-signature frame
    * (Dedup.bandedBuckets) and q43's md5 split.
    *
    * Scale shape: signatures cost q27's one partial-aggregate shuffle
    * over the shared shingle corpus; candidates come from an equi-join
    * of train-side band rows against the much smaller eval-side band
    * rows on (band, bucket) — never a train×eval product; exact
    * verification touches candidate docs only (q27's semi-join
    * prefilter recipe). Oracle: at 16×4 banding, LSH recall on the
    * planted jac ≥ 0.9 clusters is ≈ 1 (miss probability ~1e-11), so
    * the exact cross-split Jaccard replayed in DuckDB is the same set.
    */
  private def q62(s: SparkSession, dir: String): DataFrame = {
    // sb = split bucket (bands already carries an LSH "bucket" column)
    val split = Tables
      .table(s, dir, "documents")
      .select(col("doc_id"), Sampling.bucket100(col("doc_id")).as("sb"))
    val bands = Dedup.bandedBuckets(s, dir)
    val trainBands = bands
      .join(split.filter(col("sb") < 90).select("doc_id"), "doc_id")
      .select(col("doc_id").as("da"), col("band"), col("bucket"))
    val evalBands = bands
      .join(split.filter(col("sb") >= 90).select("doc_id"), "doc_id")
      .select(col("doc_id").as("db"), col("band"), col("bucket"))
    // cached: cand feeds the two semi-filters AND the verify join
    val cand = Dedup.tcache(
      s,
      trainBands
        .join(evalBands, Seq("band", "bucket"))
        .select("da", "db")
        .distinct()
    )
    // materialize: three downstream branches (two semi-filters + the
    // verify join) otherwise race the unpopulated cache from concurrent
    // AQE stages and each re-runs the banded join (the Dedup
    // bandedBuckets race note)
    cand.count()

    val sh = Dedup.cachedShingles(s, dir)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh
      .select(col("doc_id").as("da"), col("g"))
      .join(cand.select("da").distinct(), Seq("da"), "left_semi")
    val b = sh
      .select(col("doc_id").as("db"), col("g"))
      .join(cand.select("db").distinct(), Seq("db"), "left_semi")
    val inter = cand
      .join(a, Seq("da"))
      .join(b, Seq("db", "g"))
      .groupBy("da", "db")
      .agg(count(lit(1)).as("i"))

    Dedup
      .jaccardOf(inter, sizes)
      .filter(col("jac") >= Dedup.JaccardThreshold)
      .groupBy(col("da").as("doc_id"))
      .agg(
        count(lit(1)).as("n_eval_matches"),
        round(max(col("jac")), 4).as("max_jac")
      )
      .orderBy("doc_id")
  }

  /** md5-derived signed integer weight in [−1000, 1000] for a token — the
    * deterministic stand-in for a trained classifier's per-feature weight
    * (the container has no model runtime; what matters is the Spark-side
    * shape, and an md5-derived weight lets the DuckDB oracle replay every
    * score bit-for-bit). Integer weights on purpose: the per-doc score is
    * an EXACT BIGINT sum, so the keep decision (score > 0) can never flip
    * on float-summation order the way a double-weight model's would.
    */
  private def tokenWeight(w: Column): Column =
    conv(substring(md5(w.cast("binary")), 1, 15), 16, 10).cast("long") % 2001 - 1000

  private val TokenWeightSql =
    "CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) % 2001 - 1000"

  /** DuckDB CTE replaying [[classifierScoreFrame]] (ends in `agg`):
    * shared by the q63 oracle and the model-eval oracles (Eval). */
  private[llm] lazy val classifierScoreCte =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |tok2 AS (SELECT doc_id, w FROM tok WHERE w <> ''),
       |vocab AS (
       |  SELECT w, $TokenWeightSql AS wt
       |  FROM (SELECT w, count(*) AS cnt FROM tok2 GROUP BY w
       |        ORDER BY cnt DESC, w LIMIT $ClassifierVocabK)),
       |agg AS (
       |  SELECT doc_id, count(*) AS n_tokens, count(wt) AS n_feats,
       |    CAST(sum(coalesce(wt, 0)) AS BIGINT) AS score_int
       |  FROM tok2 LEFT JOIN vocab USING (w) GROUP BY doc_id)""".stripMargin

  /** q63: linear quality-classifier scoring — the fastText-style model
    * filter (CCNet / LLaMA-pipeline "quality classifier" stage) as a
    * Spark plan: a bounded feature vocabulary (top-[[ClassifierVocabK]]
    * corpus tokens) carries one weight per token; each document scores
    * sum(weight of its in-vocab tokens), normalized through a sigmoid.
    *
    * Scale shape: the vocab is LIMIT-bounded by construction (the one
    * case the broadcast-hint policy allows), so scoring is a map-side
    * broadcast join over the token stream plus ONE per-doc hash
    * aggregation — the corpus streams once, nothing vocabulary-sized
    * shuffles. A real trained model swaps the md5 weights for learned
    * ones; the plan is identical.
    */
  private val ClassifierVocabK = 200

  /** The q63 scoring pipeline up to the per-doc aggregate —
    * (doc_id, n_tokens, n_feats, score_int) — shared with the model-eval
    * family (Eval.q111/q111b/q112), which grades these scores against
    * the target-language label.
    */
  private[llm] def classifierScoreFrame(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables
      .table(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val vocab = toks
      .groupBy("w")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("w"))
      .limit(ClassifierVocabK)
      .select(col("w"), tokenWeight(col("w")).as("wt"))
    toks
      .join(broadcast(vocab), Seq("w"), "left") // bounded: ≤ VocabK rows
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        count(col("wt")).as("n_feats"),
        sum(coalesce(col("wt"), lit(0L))).as("score_int")
      )
  }

  private def q63(s: SparkSession, dir: String): DataFrame =
    classifierScoreFrame(s, dir)
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("n_feats"),
        col("score_int"),
        // sigmoid of the mean per-mille weight; always > 0, no −0.0 risk
        round(
          lit(1.0) / (lit(1.0) + exp(-col("score_int") / (col("n_tokens") * lit(1000.0)))),
          4
        ).as("quality_prob"),
        (col("score_int") > 0).as("keep")
      )
      .orderBy("doc_id")

  /** q64: DSIR-style importance weighting (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score
    * every raw document by how much more likely its hashed-feature
    * profile is under a TARGET distribution (here the `lang = 'en'`
    * subset standing in for "high-quality domain") than under the raw
    * corpus — the per-doc mean log-likelihood ratio
    * avg_tokens[ln p_target(bucket) − ln p_raw(bucket)] with hashed
    * unigram features (md5 mod [[DsirBuckets]]) and Laplace smoothing.
    * A resampler then keeps documents proportionally to exp(llr); the
    * score column is the operator.
    *
    * Scale shape: both distributions are ONE hash aggregation over a
    * [[DsirBuckets]]-row frame — bounded by construction regardless of
    * corpus size (that is the point of hashed features: vocabulary
    * explodes, buckets don't), so the score join is a broadcast of a
    * ≤ 256-row table plus one per-doc aggregation. The corpus streams
    * twice (once to count, once to score) and nothing vocabulary- or
    * corpus-sized ever shuffles.
    */
  private val DsirBuckets = 256

  private def q64(s: SparkSession, dir: String): DataFrame = {
    // cached + materialized (r16): three consumers (bucket counts, the
    // totals aggregate, the per-doc score join) otherwise each re-run the
    // tokenize + per-token md5 pass (the Dedup bandedBuckets race note)
    val toks = Dedup.tcache(
      s,
      Tables
        .table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .withColumn(
          "b",
          conv(substring(md5(col("w").cast("binary")), 1, 15), 16, 10)
            .cast("long") % DsirBuckets
        )
    )
    toks.count()
    val buckets = toks
      .groupBy("b")
      .agg(
        count(lit(1)).as("c_raw"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("c_tgt")
      )
    val totals = toks.agg(
      count(lit(1)).as("n_raw"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_tgt")
    )
    toks
      .join(broadcast(buckets), Seq("b")) // bounded: ≤ DsirBuckets rows
      .crossJoin(broadcast(totals)) //       bounded: 1 row
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        (round(
          avg(
            log((col("c_tgt") + 1.0) / (col("n_tgt") + lit(DsirBuckets))) -
              log((col("c_raw") + 1.0) / (col("n_raw") + lit(DsirBuckets)))
          ),
          4
        ) + lit(0d)).as("dsir_llr") // + 0.0: signed-zero parity convention
      )
      .orderBy("doc_id")
  }

  /** Word n-gram width for exact contamination (q62b): the GPT-3
    * appendix convention (13-token overlap), on this corpus's
    * whitespace tokens.
    */
  private val ContamK = 13

  /** q62b: EXACT n-gram contamination — the complement of q62's fuzzy
    * (MinHash-banded near-dup) check and the big-lab eval-hygiene
    * standard: for every TRAIN document, the fraction of its 13-word
    * grams that appear ANYWHERE in the held-out split. A train doc can
    * be nothing like any single eval doc (q62 misses it) yet still
    * contain a verbatim eval sentence (this catches it). Same md5-long
    * gram hashing as q61b (shared on both engines — collisions agree);
    * the eval gram SET is distinct-hash-sized and rides a semi-join, so
    * the per-train-doc count never materializes pairs. Zeros included
    * (short docs have no grams; pct 0 by definition).
    */
  private def q62b(s: SparkSession, dir: String): DataFrame = {
    val d = Tables
      .table(s, dir, "documents")
      .select(
        col("doc_id"),
        split(col("text"), " ").as("w"),
        Sampling.bucket100(col("doc_id")).as("sb")
      )
    val grams = d
      .filter(size(col("w")) >= ContamK)
      .select(
        col("doc_id"),
        col("sb"),
        explode(sequence(lit(1), size(col("w")) - (ContamK - 1))).as("i"),
        col("w")
      )
      .select(
        col("doc_id"),
        col("sb"),
        graft.llm.Winnowing
          .md5Long(array_join(slice(col("w"), col("i"), lit(ContamK)), " "))
          .as("h")
      )
    val evalSet = grams.filter(col("sb") >= 90).select("h").distinct()
    val tg = grams.filter(col("sb") < 90)
    val perDoc = tg
      .join(evalSet, Seq("h"), "left_semi")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nc"))
    val totals = tg.groupBy("doc_id").agg(count(lit(1)).as("ng"))
    d.filter(col("sb") < 90)
      .select("doc_id")
      .join(totals, Seq("doc_id"), "left")
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("ng"), lit(0L)).as("n_grams"),
        coalesce(col("nc"), lit(0L)).as("n_contaminated"),
        when(coalesce(col("ng"), lit(0L)) === 0L, lit(0.0))
          .otherwise(
            round(coalesce(col("nc"), lit(0L)) * 100.0 / col("ng"), 4) + lit(0d)
          )
          .as("contamination_pct")
      )
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q47_curation_pipeline" -> q47,
    "q56_mix_weights" -> q56,
    "q56b_apply_mix" -> q56b,
    "q58_decontaminate" -> q58,
    "q62_fuzzy_decontaminate" -> q62,
    "q62b_exact_ngram_contamination" -> q62b,
    "q63_classifier_score" -> q63,
    "q64_dsir_importance" -> q64
  )

  private def scoreSql(lang: String): String =
    TextAnalysis.markerScoreSql(
      TextAnalysis.langMarkers.toMap.apply(lang)
    )

  val oracleSql: Map[String, String] = Map(
    // exact 13-word-gram contamination: same md5-long gram hashing on
    // both engines; eval grams are an IN-set, counts per train doc
    "q62b_exact_ngram_contamination" ->
      s"""WITH d AS (
         |  SELECT doc_id, string_split(text, ' ') AS w,
         |    ${Sampling.BucketSql} AS sb
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, sb,
         |    CAST('0x' || substr(md5(array_to_string(
         |      list_slice(w, t.i, t.i + ${ContamK - 1}), ' ')), 1, 15)
         |      AS BIGINT) AS h
         |  FROM d, LATERAL unnest(generate_series(1, len(w) - ${ContamK - 1}))
         |    AS t(i)
         |  WHERE len(w) >= $ContamK),
         |ev AS (SELECT DISTINCT h FROM g WHERE sb >= 90),
         |tg AS (SELECT doc_id, h FROM g WHERE sb < 90),
         |agg AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS ng,
         |    CAST(count(*) FILTER (WHERE h IN (SELECT h FROM ev)) AS BIGINT)
         |      AS nc
         |  FROM tg GROUP BY doc_id)
         |SELECT d.doc_id,
         |  coalesce(agg.ng, 0) AS n_grams,
         |  coalesce(agg.nc, 0) AS n_contaminated,
         |  CASE WHEN coalesce(agg.ng, 0) = 0 THEN 0.0
         |       ELSE round(coalesce(agg.nc, 0) * 100.0 / agg.ng, 4) + 0.0
         |  END AS contamination_pct
         |FROM d LEFT JOIN agg USING (doc_id)
         |WHERE d.sb < 90 ORDER BY d.doc_id""".stripMargin,
    "q58_decontaminate" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id,
         |    unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
         |      i -> w[i] || '_' || w[i+1] || '_' || w[i+2])) AS g
         |  FROM toks),
         |b AS (SELECT doc_id, ${Sampling.BucketSql} AS bucket FROM documents),
         |eg AS (SELECT DISTINCT g FROM sh JOIN b USING (doc_id)
         |       WHERE bucket >= 90)
         |SELECT sh.doc_id, count(*) AS n_shared_grams
         |FROM sh JOIN b ON sh.doc_id = b.doc_id
         |JOIN eg ON sh.g = eg.g
         |WHERE b.bucket < 90
         |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin,
    "q56_mix_weights" ->
      """WITH d AS (
        |  SELECT source, len(string_split(text, ' ')) AS n_tokens
        |  FROM documents),
        |tot AS (SELECT count(*) AS total_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  count(DISTINCT source) AS n_sources FROM d)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS tokens,
        |  round(count(*) * 1.0 / total_docs, 6) AS doc_share,
        |  round(sum(n_tokens) * 1.0 / total_tokens, 6) AS token_share,
        |  round((1.0 / n_sources) / (count(*) * 1.0 / total_docs), 4)
        |    AS uniform_weight
        |FROM d CROSS JOIN tot
        |GROUP BY source, total_docs, total_tokens, n_sources
        |ORDER BY source""".stripMargin,
    "q56b_apply_mix" ->
      s"""WITH s AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
         |t AS (SELECT count(*) AS total_docs, count(DISTINCT source) AS n_sources
         |      FROM documents),
         |w AS (SELECT source,
         |        CAST(total_docs AS DOUBLE) / (n_sources * n_docs) AS w
         |      FROM s CROSS JOIN t),
         |c AS (SELECT d.doc_id, d.source,
         |        least(CAST(floor(w) AS BIGINT) +
         |          CASE WHEN (${Sampling.BucketSql}) / 100.0 < w - floor(w)
         |               THEN 1 ELSE 0 END, $MaxCopies) AS copies
         |      FROM documents d JOIN w ON d.source = w.source)
         |SELECT doc_id, source,
         |  CAST(unnest(generate_series(1, CAST(copies AS INT))) AS BIGINT) AS copy_id
         |FROM c WHERE copies > 0
         |ORDER BY doc_id, copy_id""".stripMargin,
    "q47_curation_pipeline" ->
      s"""WITH scored AS (
         |  SELECT doc_id, text,
         |    len(string_split(text, ' ')) AS n_tokens,
         |    ${scoreSql("en")} AS s_en,
         |    ${scoreSql("es")} AS s_es,
         |    ${scoreSql("de")} AS s_de,
         |    ${scoreSql("fr")} AS s_fr
         |  FROM documents),
         |kept AS (
         |  SELECT * FROM scored
         |  WHERE s_en >= greatest(s_es, s_de, s_fr) AND s_en >= 0.05
         |    AND n_tokens >= 20),
         |deduped AS (
         |  SELECT md5(text) AS digest, min(doc_id) AS doc_id,
         |    min(n_tokens) AS n_tokens
         |  FROM kept GROUP BY md5(text)),
         |assigned AS (
         |  SELECT CASE
         |    WHEN ${Sampling.BucketSql} < 80 THEN 'train'
         |    WHEN ${Sampling.BucketSql} < 90 THEN 'valid'
         |    ELSE 'test' END AS split,
         |    n_tokens
         |  FROM deduped)
         |SELECT split, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens
         |FROM assigned GROUP BY split ORDER BY split""".stripMargin,
    // exact cross-split Jaccard — the LSH candidate step has recall ≈ 1
    // at the 0.6 threshold (see q62 scaladoc), so exact == LSH-verified.
    // shingleCte's trailing `inter` CTE is unused here (DuckDB inlines
    // CTEs; an unreferenced one costs nothing).
    "q62_fuzzy_decontaminate" ->
      s"""${Dedup.shingleCte},
         |b AS (SELECT doc_id, ${Sampling.BucketSql} AS bucket FROM documents),
         |xinter AS (
         |  SELECT a.doc_id AS da, b2.doc_id AS db, count(*) AS i
         |  FROM sh a JOIN sh b2 ON a.g = b2.g
         |  JOIN b ba ON ba.doc_id = a.doc_id
         |  JOIN b bb ON bb.doc_id = b2.doc_id
         |  WHERE ba.bucket < 90 AND bb.bucket >= 90
         |  GROUP BY 1, 2),
         |j AS (
         |  SELECT da, db, i * 1.0 / (sa.n + sb.n - i) AS jac
         |  FROM xinter
         |  JOIN sz sa ON sa.doc_id = da
         |  JOIN sz sb ON sb.doc_id = db)
         |SELECT da AS doc_id, count(*) AS n_eval_matches,
         |  round(max(jac), 4) AS max_jac
         |FROM j WHERE jac >= ${Dedup.JaccardThreshold}
         |GROUP BY da ORDER BY doc_id""".stripMargin,
    "q63_classifier_score" ->
      s"""$classifierScoreCte
         |SELECT doc_id, n_tokens, n_feats, score_int,
         |  round(1.0 / (1.0 + exp(-score_int / (n_tokens * 1000.0))), 4)
         |    AS quality_prob,
         |  score_int > 0 AS keep
         |FROM agg ORDER BY doc_id""".stripMargin,
    "q64_dsir_importance" ->
      s"""WITH tok AS (
         |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
         |  FROM documents),
         |tok2 AS (
         |  SELECT doc_id, lang,
         |    CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) % $DsirBuckets AS b
         |  FROM tok WHERE w <> ''),
         |buckets AS (
         |  SELECT b, count(*) AS c_raw,
         |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS c_tgt
         |  FROM tok2 GROUP BY b),
         |totals AS (
         |  SELECT count(*) AS n_raw,
         |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_tgt
         |  FROM tok2)
         |SELECT doc_id, count(*) AS n_tokens,
         |  round(avg(ln((c_tgt + 1.0) / (n_tgt + $DsirBuckets)) -
         |            ln((c_raw + 1.0) / (n_raw + $DsirBuckets))), 4) + 0.0
         |    AS dsir_llr
         |FROM tok2 JOIN buckets USING (b) CROSS JOIN totals
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
