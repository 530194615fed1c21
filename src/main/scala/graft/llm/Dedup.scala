package graft.llm

import graft.queries.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for a large-scale training-data pipeline, over
  * the `documents` table (and a key-dedup over `events`). Five families:
  *
  *  - exact (hash-groupBy on content digest)
  *  - exact n-gram Jaccard (the all-pairs oracle baseline)
  *  - MinHash + LSH banding (the 100 TB scale path: per-doc signatures via
  *    partial aggregation, candidate generation via equi-join on
  *    (band, bucket) — never an all-pairs product; candidates verified
  *    with exact Jaccard)
  *  - SimHash (frequency-weighted 60-bit signature; banded by the
  *    pigeonhole principle: 4 blocks of 15 bits guarantee recall for
  *    hamming distance ≤ 3)
  *  - embedding-cosine near-dup (exact threshold join; ANN variant lives
  *    in Similarity.scala)
  *
  * Everything is built from codegen'd built-ins (no UDFs); hash parity
  * with the DuckDB oracle comes from md5 (both engines emit the same hex),
  * so signatures are bit-identical across engines.
  */
object Dedup {

  // ------------------------------------------------------------- helpers

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")

  /** Distinct word-3-gram shingles per document. w[i] is 0-based in Spark
    * SQL; the CASE guards sequence() against size<3 (sequence(1,0) would
    * count DOWN, not produce an empty array).
    */
  private def shingles(d: DataFrame): DataFrame =
    d.select(col("doc_id"), split(col("text"), " ").as("w"))
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
      .distinct()

  /** One cached shingle frame per (session, dir): q26 and q27 both
    * consume it several times each; a per-query cache would materialize
    * the identical explode twice per Verify/Bench run.
    */
  private val shingleCache =
    scala.collection.mutable.Map.empty[(SparkSession, String), DataFrame]

  /** Per-query cached frames (the q27/q28 signature frames) — tracked so
    * [[releaseCaches]] can unpersist them: repeated Verify/Bench
    * invocations in one JVM must not accumulate executor storage memory.
    */
  private val trackedCaches =
    scala.collection.mutable.Buffer.empty[(SparkSession, DataFrame)]

  private[graft] def tcache(s: SparkSession, df: DataFrame): DataFrame =
    synchronized {
      // idempotent-by-lookup (r14 verdict): two gates can build
      // plan-identical frames (q109/q166 share the rarest-first ordered
      // set construction) — re-caching the second would only emit
      // CacheManager's "already cached" WARN and double-track an
      // unpersist. `storageLevel` is the public CacheManager lookup
      // (plan-equality match), so an already-cached plan is returned
      // as-is and the FIRST tracker keeps sole unpersist ownership.
      if (df.storageLevel != org.apache.spark.storage.StorageLevel.NONE) df
      else {
        val c = df.cache()
        trackedCaches += ((s, c))
        c
      }
    }

  private[llm] def cachedShingles(s: SparkSession, dir: String): DataFrame =
    synchronized {
      shingleCache.getOrElseUpdate(
        (s, dir), {
          val sh = shingles(docs(s, dir))
          // same idempotence guard as tcache: a plan-equal frame may
          // already sit in CacheManager (a tracked per-query cache built
          // from the same scan) — don't double-cache it
          if (sh.storageLevel != org.apache.spark.storage.StorageLevel.NONE) sh
          else sh.cache()
        }
      )
    }

  /** Materialize the shared q26/q27 shingle cache outside a timed region
    * (Bench calls this so per-query numbers measure the operator, not the
    * one-time corpus materialization both queries share).
    */
  def warmShingles(s: SparkSession, dir: String): Unit =
    cachedShingles(s, dir).foreach(_ => ())

  /** Unpersist every frame this module cached for `s` (shingle corpus +
    * tracked per-query signature frames). Call at the end of a
    * Verify/Bench run; safe while no query of this session is executing.
    */
  def releaseCaches(s: SparkSession): Unit = synchronized {
    shingleCache.filterInPlace { case ((sess, _), df) =>
      if (sess eq s) { df.unpersist(); false } else true
    }
    releaseTrackedCaches(s)
  }

  /** Unpersist ONLY the tracked per-query caches (q27/q28 signature and
    * candidate frames), keeping the shared shingle corpus warm. Bench
    * calls this between timed iterations: otherwise iteration 2+ would
    * silently reuse iteration 1's cached signatures (CacheManager matches
    * identical logical plans) and the reported median would exclude the
    * signature computation entirely.
    */
  def releaseTrackedCaches(s: SparkSession): Unit = synchronized {
    val (mine, others) = trackedCaches.partition(_._1 eq s)
    mine.foreach(_._2.unpersist())
    trackedCaches.clear()
    trackedCaches ++= others
  }

  /** Exact Jaccard over candidate pairs: |A∩B| / (|A|+|B|-|A∩B|). The
    * candidate frame is small (LSH output) or the full shingle self-join
    * (oracle baseline); sizes are computed once and joined twice.
    */
  private[llm] def jaccardOf(
      inter: DataFrame, // (da, db, i)
      sizes: DataFrame // (doc_id, n)
  ): DataFrame =
    inter
      .join(sizes.withColumnRenamed("doc_id", "da").withColumnRenamed("n", "na"), "da")
      .join(sizes.withColumnRenamed("doc_id", "db").withColumnRenamed("n", "nb"), "db")
      .withColumn("jac", col("i") / (col("na") + col("nb") - col("i")))

  private[llm] val JaccardThreshold = 0.6

  // ------------------------------------------------- q24: key dedup (events)

  /** dropDuplicates on a key subset — the Spark built-in the reference's
    * partition-key dedup (`main.go:153,169-172`) maps to. Only the key
    * columns are kept so the result is deterministic (which full row
    * survives is not).
    */
  private def q24(s: SparkSession, dir: String): DataFrame =
    Tables
      .table(s, dir, "events")
      .select(col("user_id"), col("event_type"))
      .dropDuplicates("user_id", "event_type")
      .orderBy("user_id", "event_type")

  // ------------------------------------------------- q25: exact text dedup

  /** Exact dedup via content digest: one representative (min doc_id) per
    * distinct md5(text), plus the copy count. Scale: a single hash
    * aggregation, no pairwise work.
    */
  private def q25(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(md5(col("text")).as("digest"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_doc_id"), col("n_copies"))
      .orderBy("keep_doc_id")

  // ------------------------------------------- q26: exact n-gram Jaccard

  /** All-pairs exact word-3-gram Jaccard ≥ 0.6. This is the oracle
    * baseline for near-dup detection: the shingle equi-join bounds the
    * pair space to docs sharing ≥1 shingle (not a cartesian product), but
    * hot shingles still make it quadratic in the worst case — at 100 TB
    * use q27 (MinHash LSH), which this query exists to validate.
    */
  /** Near-dup pairs (da < db, jac unrounded) — q26's body, shared with
    * Clustering.q50 which clusters these edges into components.
    */
  private[llm] def exactJaccardPairs(s: SparkSession, dir: String): DataFrame = {
    val sh = cachedShingles(s, dir)
    // cached + materialized (r16): jaccardOf joins the size frame on BOTH
    // pair ends, so every consumer (q26/q50/q206/q212/q62…) re-ran the
    // doc-size aggregate twice when left lazy; doc-count-sized frame
    val sizes = tcache(s, sh.groupBy("doc_id").agg(count(lit(1)).as("n")))
    sizes.count()
    val a = sh.select(col("doc_id").as("da"), col("g"))
    val b = sh.select(col("doc_id").as("db"), col("g"))
    val inter = a
      .join(b, Seq("g"))
      .filter(col("da") < col("db"))
      .groupBy("da", "db")
      .agg(count(lit(1)).as("i"))
    jaccardOf(inter, sizes).filter(col("jac") >= JaccardThreshold)
  }

  private def q26(s: SparkSession, dir: String): DataFrame =
    exactJaccardPairs(s, dir)
      .select(col("da"), col("db"), round(col("jac"), 4).as("jac"))
      .orderBy("da", "db")

  // ----------------- q206: cross-source duplication matrix

  /** q206: WHICH SOURCES COPY FROM WHICH — q26's near-dup pairs rolled
    * up to the source-pair level (q203's vocabulary overlap says two
    * sources SOUND alike; this counts actual near-duplicate DOCUMENT
    * pairs between them — the readout that decides which source a
    * mixing stage downweights and which ingest feed is a mirror;
    * diagonal rows are within-source template floods): per unordered
    * source pair, the near-dup pair count and mean Jaccard.
    *
    * Determinism: each pair's Jaccard floor-snaps to the 1e-4 grid
    * (one exact integer division), the per-cell mean is an EXACT
    * BIGINT sum over grid values divided once — never a float sum of
    * shuffle-ordered doubles. The oracle composes q26's shingle CTEs
    * verbatim + the source rollup, so a drift in the pair semantics
    * breaks q26 and this gate together (the q177 composition rule).
    *
    * Scale shape: rides exactJaccardPairs (candidates by shared
    * shingle, never all-pairs); the rollup adds two doc-keyed joins to
    * the node-sized source map and one aggregate into the
    * ≤ C(#sources+1, 2)-cell matrix — catalog-bounded, the q203
    * argument.
    */
  private def q206(s: SparkSession, dir: String): DataFrame = {
    val pairs = exactJaccardPairs(s, dir)
      .withColumn(
        "jac4",
        expr("CAST(floor(i * 10000.0 / (na + nb - i)) AS BIGINT)")
      )
    val src = graft.queries.Tables
      .table(s, dir, "documents")
      .select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("da"), col("source").as("sa0")), "da")
      .join(src.select(col("doc_id").as("db"), col("source").as("sb0")), "db")
      .select(
        least(col("sa0"), col("sb0")).as("source_a"),
        greatest(col("sa0"), col("sb0")).as("source_b"),
        col("jac4")
      )
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"), sum("jac4").as("sj4"))
      .select(
        col("source_a"),
        col("source_b"),
        col("n_pairs"),
        (round(
          col("sj4").cast("double") / col("n_pairs").cast("double") / 1.0e4,
          6
        ) + 0.0).as("mean_jaccard")
      )
      .orderBy("source_a", "source_b")
  }

  // ------------------------------------------- q27: MinHash + LSH banding

  private[graft] val MinHashP = 2147483647L // M31 prime; keeps a*h+b in a Long
  // 64 hashes = 16 bands × 4 rows → s-curve threshold (1/16)^(1/4) ≈ 0.5:
  // recall ≈ 1-4e-8 for the jac ≥ 0.9 near-dup clusters this corpus
  // plants. 128 hashes doubles codegen size for no recall change here.
  private[graft] val NumHashes = 64
  private val NumBands = 16

  /** Deterministic affine permutation parameters (seeded). */
  private[graft] lazy val (hashA, hashB) = {
    val rnd = new scala.util.Random(42)
    val a = Array.fill(NumHashes)(1L + rnd.nextInt((MinHashP - 1).toInt))
    val b = Array.fill(NumHashes)(rnd.nextInt(MinHashP.toInt).toLong)
    (a, b)
  }

  /** MinHash signatures + banded LSH candidate generation + exact-Jaccard
    * verification of candidates. Plan shape at scale:
    *   shingle scan → one-pass signature aggregate per doc   [1 shuffle]
    *   → explode NumBands (band, bucket) rows/doc → self equi-join on bucket
    *   → exact verify on the (small) candidate set.
    * No stage is all-pairs; skew is bounded because identical band-buckets
    * only form within true near-dup clusters.
    *
    * The signature is computed by the typed MinHashAggregator (one
    * primitive while-loop per row) — measured ~25% faster at sf0.1 than
    * the 64-separate-min-columns declarative form it replaced, with a far
    * smaller codegen footprint.
    */
  /** Cached (doc_id, band, bucket) LSH banding rows — q27's signature +
    * banding stages, shared with Curation's fuzzy decontamination (q62).
    * Tracked-cached because every consumer joins the frame against itself
    * or a filtered copy: uncached, the whole shingle→signature pipeline
    * would execute once per join side (observed 18 s → 3 s at sf0.1).
    * The cached frame is NumBands small-int rows per doc — cheaper to
    * hold than the signature arrays it replaces.
    */
  private[llm] def bandedBuckets(s: SparkSession, dir: String): DataFrame = {
    val sh = cachedShingles(s, dir)
    val withH = sh.withColumn("h", pmod(xxhash64(col("g")), lit(MinHashP)))
    val minhash = udaf(
      new graft.functions.MinHashAggregator(hashA, hashB, MinHashP)
    )
    val sig = withH
      .groupBy("doc_id")
      .agg(minhash(col("h")).as("sig"))

    val rowsPerBand = NumHashes / NumBands
    val bandCols = (0 until NumBands).map { bi =>
      val cols = (bi * rowsPerBand until (bi + 1) * rowsPerBand)
        .map(j => element_at(col("sig"), j + 1))
      hash(lit(bi) +: cols: _*)
    }
    val banded = tcache(
      s,
      sig.select(
        col("doc_id"),
        posexplode(array(bandCols: _*)).as(Seq("band", "bucket"))
      )
    )
    // MATERIALIZE before returning (r16): every consumer references this
    // frame from at least two join branches (q27/q62's banded self-join
    // sides), and AQE runs independent branch stages CONCURRENTLY — a
    // not-yet-populated cache is then computed once per racing stage
    // (block-store locks dedupe stores, not compute), re-running the
    // whole shingle→signature pipeline per branch. One count() here
    // serializes the build; the racing branches then read blocks.
    banded.count()
    banded
  }

  // --------- q212: MinHash estimator calibration vs exact Jaccard

  /** q212: sketch calibration audit — "how far is the MinHash ESTIMATE
    * from the exact Jaccard it stands in for?", the measurement that
    * justifies (or retunes) q27's 64-hash budget before anyone trusts
    * LSH at a new threshold: over q26's exact near-dup pairs, the
    * per-pair signature estimate m/64 (m = matching components) against
    * the exact i/(na+nb−i), reporting MAE, mean bias, and the worst
    * absolute error. E[m/64] = J exactly (each permutation's min
    * collides with probability J), so bias ≈ 0 and MAE ~ √(J(1−J)/64)
    * ≈ 0.04 at J = 0.9 is the calibrated expectation.
    *
    * Determinism (and the reason this audit re-derives signatures
    * rather than reusing q27's): q27's base hash is Spark's xxhash64 —
    * not replayable in the oracle engine. The audit uses the
    * md5-prefix hash (the q43 bucket spelling, bit-identical in both
    * engines) through the SAME [[MinHashAggregator]] affine
    * permutations with the SAME (a, b, p) constants, embedded into the
    * oracle SQL as literal arrays — so the oracle rebuilds the exact
    * signatures independently. Per-pair: est9 = m·15625000 (1e9/64 is
    * exact), exact9 = (10⁹·i) div (na+nb−i) — both exact BIGINTs, so
    * MAE/bias/max are exact-integer aggregates under one final render.
    *
    * Scale shape: one signature pass (the q27 aggregate shape) + q26's
    * candidate-bounded pairs joined to the doc-keyed signature frame;
    * the component compare is a map-side zip_with over 64-long arrays.
    */
  private def q212(s: SparkSession, dir: String): DataFrame = {
    val sh = cachedShingles(s, dir)
    val withH = sh.withColumn(
      "h",
      expr(s"CAST(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT) % $MinHashP")
    )
    val minhash = udaf(
      new graft.functions.MinHashAggregator(hashA, hashB, MinHashP)
    )
    // cached + materialized (r16): the signature frame is joined on both
    // pair ends below — uncached, the corpus-pass UDAF aggregate ran
    // once per join side (the exactJaccardPairs sizes note)
    val sig = tcache(
      s,
      withH.groupBy("doc_id").agg(minhash(col("h")).as("sig"))
    )
    sig.count()
    exactJaccardPairs(s, dir)
      .join(sig.select(col("doc_id").as("da"), col("sig").as("siga")), "da")
      .join(sig.select(col("doc_id").as("db"), col("sig").as("sigb")), "db")
      .withColumn(
        "m",
        expr("size(filter(zip_with(siga, sigb, (x, y) -> x = y), v -> v))")
      )
      .withColumn("est9", col("m").cast("long") * 15625000L)
      .withColumn("ex9", expr("(1000000000 * i) div (na + nb - i)"))
      .withColumn("d9", col("est9") - col("ex9"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(abs(col("d9"))).as("sad9"),
        sum(col("d9")).as("sd9"),
        max(abs(col("d9"))).as("mx9")
      )
      .select(
        col("n_pairs"),
        (round(
          col("sad9").cast("double") / (col("n_pairs") * 1000000000L).cast("double"),
          6
        ) + 0.0).as("mae"),
        (round(
          col("sd9").cast("double") / (col("n_pairs") * 1000000000L).cast("double"),
          6
        ) + 0.0).as("mean_bias"),
        (round(col("mx9").cast("double") / 1.0e9, 6) + 0.0).as("max_abs_err")
      )
  }

  private def q27(s: SparkSession, dir: String): DataFrame = {
    val sh = cachedShingles(s, dir)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val bands = bandedBuckets(s, dir)

    val x = bands.select(col("doc_id").as("da"), col("band"), col("bucket"))
    val y = bands.select(col("doc_id").as("db"), col("band"), col("bucket"))
    // cached: cand feeds the verify join AND the semi-filter's doc-id
    // list below — uncached, the banded self-join + distinct (the
    // dominant post-signature stage) would execute twice.
    val cand = tcache(
      s,
      x.join(y, Seq("band", "bucket"))
        .filter(col("da") < col("db"))
        .select("da", "db")
        .distinct()
    )
    // materialize: cand feeds the verify join and the semi-filter from
    // CONCURRENT stages (the bandedBuckets race note) — serialize the
    // banded self-join once instead of once per racing branch
    cand.count()

    val a = sh.select(col("doc_id").as("da"), col("g"))
    // Prefilter the (db, g) side to candidate docs with a semi join
    // BEFORE the (db, g) equi join: otherwise the full shingle frame
    // shuffles on (db, g) just to verify a small candidate set — at
    // 10^11 docs that shuffle is the whole corpus, the semi-filtered one
    // is O(candidates). The semi join and the verify join carry NO
    // broadcast hint (round-5 policy: hints only where the build side is
    // bounded BY CONSTRUCTION; candidate-pair count scales with
    // Σ cluster² on a dup-heavy corpus, which is assumption-bounded).
    // AQE broadcasts both while cand is actually small and falls back to
    // shuffled equi joins when it isn't — and at production sizes
    // Spark's runtime bloom-filter injection prunes the shingle scan
    // below the semi join (the machinery PlanShapeSpec pins). Either
    // way nothing all-pairs ever forms: PlanShapeSpec pins q27's
    // candidate joins to equi hash/merge shapes.
    val b = sh
      .select(col("doc_id").as("db"), col("g"))
      .join(cand.select("db").distinct(), Seq("db"), "left_semi")
    val inter = cand
      .join(a, Seq("da"))
      .join(b, Seq("db", "g"))
      .groupBy("da", "db")
      .agg(count(lit(1)).as("i"))

    jaccardOf(inter, sizes)
      .filter(col("jac") >= JaccardThreshold)
      .select(col("da"), col("db"), round(col("jac"), 4).as("jac"))
      .orderBy("da", "db")
  }

  // ------------------------------------------------------- q28: SimHash

  private val SimHashBits = 60 // 15 hex chars of md5 → exact in a Long
  private val SimHashBlocks = 4 // 15-bit blocks: recall ≥ 1 for hd ≤ 3
  private val HammingThreshold = 3

  /** Frequency-weighted 60-bit SimHash per doc (votes weighted by term
    * count — the unweighted variant is not discriminative on short docs),
    * then banded candidate generation (pigeonhole over 4×15-bit blocks)
    * and exact hamming verification. All hash math is md5-derived so the
    * DuckDB oracle reproduces signatures bit-for-bit.
    *
    * Vote accumulation is one typed SimHashAggregator pass over word
    * OCCURRENCES (±1 per occurrence ≡ ±cnt per distinct term): one
    * shuffle of 60-long partial-vote arrays per doc per partition,
    * replacing the former groupBy(doc_id, word) pre-shuffle + 60
    * independent codegen'd sum columns (6.2 s → sub-second at sf0.1).
    */
  private def q28(s: SparkSession, dir: String): DataFrame = {
    val words = docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .withColumn(
        "h",
        expr("cast(conv(substr(md5(w), 1, 15), 16, 10) as bigint)")
      )
    val simhashAgg = udaf(new graft.functions.SimHashAggregator(SimHashBits))
    // cached: feeds both sides of the banded candidate self-join
    val sig = tcache(
      s,
      words.groupBy("doc_id").agg(simhashAgg(col("h")).as("simhash"))
    )
    // materialize: both banded self-join sides race the unpopulated
    // cache from concurrent AQE stages (the bandedBuckets race note)
    sig.count()

    val blockCols = (0 until SimHashBlocks).map { bi =>
      shiftright(col("simhash"), bi * 15).bitwiseAND(lit(0x7fffL))
    }
    val bands = sig.select(
      col("doc_id"),
      col("simhash"),
      posexplode(array(blockCols: _*)).as(Seq("blk", "bval"))
    )
    val x = bands.select(col("doc_id").as("da"), col("simhash").as("ha"), col("blk"), col("bval"))
    val y = bands.select(col("doc_id").as("db"), col("simhash").as("hb"), col("blk"), col("bval"))
    x.join(y, Seq("blk", "bval"))
      .filter(col("da") < col("db"))
      .select(
        col("da"),
        col("db"),
        expr("bit_count(ha ^ hb)").as("hd")
      )
      .distinct()
      .filter(col("hd") <= HammingThreshold)
      .orderBy("da", "db")
  }

  /** DuckDB oracle for q28: full pairwise (fine at oracle scale), same
    * md5-derived signature arithmetic. Built programmatically — 60 bit
    * sums is noise a human shouldn't hand-maintain.
    */
  private def q28Oracle: String = {
    val sums = (0 until SimHashBits)
      .map(j => s"sum(cnt * (CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END)) AS s$j")
      .mkString(", ")
    val combine = (0 until SimHashBits)
      .map(j => s"(CASE WHEN s$j > 0 THEN (1::BIGINT << $j) ELSE 0 END)")
      .mkString(" + ")
    s"""WITH words AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |counted AS (SELECT doc_id, w, count(*) AS cnt FROM words GROUP BY 1, 2),
       |hashed AS (SELECT doc_id, cnt,
       |  CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) AS h FROM counted),
       |sums AS (SELECT doc_id, $sums FROM hashed GROUP BY doc_id),
       |sh AS (SELECT doc_id, $combine AS simhash FROM sums)
       |SELECT a.doc_id AS da, b.doc_id AS db,
       |  bit_count(xor(a.simhash, b.simhash)) AS hd
       |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $HammingThreshold
       |ORDER BY da, db""".stripMargin
  }

  // ------------------------------------- q29: embedding-cosine near-dup

  private val CosineThreshold = 0.4

  /** Hard ceiling on the all-pairs baseline: q29 exists to VERIFY the
    * bucketed scale paths (q29b, q31 family), never to run at corpus
    * scale — above this the guard fails loudly instead of silently
    * launching an O(N²) job someone mistook for a production path.
    * 100k rows ≈ 5e9 scored pairs, the most a verification run should
    * ever pay; the sf tables are 3 orders of magnitude below it.
    */
  private val AllPairsMaxRows = 100000L

  /** Exact cosine near-dup over the embedding column: all pairs with
    * cos ≥ 0.4. Dot products in double with left-to-right accumulation on
    * both engines → bit-identical values. The all-pairs form is the
    * correctness baseline (size-guarded — see AllPairsMaxRows); the
    * LSH-bucketed ANN path is Similarity.q31 (scale path).
    */
  private def q29(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.table(s, dir, "embeddings")
    val n = e.count()
    require(
      n <= AllPairsMaxRows,
      s"q29 is the all-pairs verification BASELINE (O(N²) by design): " +
        s"corpus has $n rows > $AllPairsMaxRows cap. Use the bucketed " +
        s"scale paths (q29b SemDeDup cells, q31/q31b/q31c ANN) at scale."
    )
    val a = e.select(col("vec_id").as("va"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("vb"), col("embedding").as("eb"))
    a.crossJoin(b)
      .filter(col("va") < col("vb"))
      .withColumn("cos", VectorOps.cosine(col("ea"), col("eb")))
      .filter(col("cos") >= CosineThreshold)
      .select(col("va"), col("vb"), round(col("cos"), 4).as("cos_sim"))
      .orderBy("va", "vb")
  }

  /** q25b: normalized exact dedup — the fuzzy-exact step real curation
    * pipelines run before near-dup detection (lowercase, strip
    * non-alphanumerics, collapse whitespace, then hash-group): catches
    * trivially reformatted copies that byte-exact q25 misses, at the
    * same one-shuffle cost. The normalization is a pure column pipeline
    * whose regexes mean the same thing in Spark (Java, global by
    * default) and DuckDB (RE2 with the 'g' flag).
    */
  private def q25b(s: SparkSession, dir: String): DataFrame = {
    val norm = trim(
      regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
        " +",
        " "
      )
    )
    Tables
      .table(s, dir, "documents")
      .select(col("doc_id"), norm.as("norm"))
      .groupBy(md5(col("norm")))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .select("keep_doc_id", "n_copies")
      .orderBy("keep_doc_id")
  }

  /** q25c: incremental (cross-snapshot) dedup — the nightly-crawl
    * question: which of today's documents are NEW against everything
    * already ingested? The seen set is a digest table (here: the
    * doc_id%3==0 slice standing in for yesterday's corpus), today's
    * docs anti-join it on content digest. Scale shape: a left_anti
    * equi-join on the 16-byte digest — never on the text — so the
    * shuffle carries digests; with a persisted seen-table this is the
    * one join a daily ingest pays (optionally pre-filtered by a bloom
    * of the seen digests, the q58 pattern).
    */
  private def q25c(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).withColumn("digest", md5(col("text")))
    val seen = d
      .filter(col("doc_id") % 3 === 0)
      .select(col("digest"))
      .distinct()
    d.join(seen, Seq("digest"), "left_anti")
      .select(col("doc_id"), col("digest"))
      .orderBy("doc_id")
  }

  // ------------------- q29b: cluster-bucketed embedding dedup (SemDeDup)

  private val SemCells = 16

  /** SemDeDup-shaped semantic dedup: assign every vector to its nearest
    * coarse centroid (the deterministic first-SemCells sample, same
    * policy as the IVF quantizer), then find near-dup pairs ONLY within
    * a cell and drop the higher id of each pair. The scale trade vs
    * q29's all-pairs form: the pair join is an EQUI-join on cell id —
    * candidate pairs bounded at Σ(cell size)² instead of N², and the
    * shuffle co-locates by cell. Cross-cell near-dups are missed by
    * design (the SemDeDup recall trade); the oracle replays the same
    * clustered semantics, so the result is still value-exact.
    */
  private def q29b(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.table(s, dir, "embeddings")
    val centroids = e
      .filter(col("vec_id") < SemCells)
      .select(col("vec_id").as("cell"), col("embedding").as("ce"))
    // one-pass argmax cell assignment (map-side-combined; ties → smallest
    // cell), the q31b corpus-side pattern
    val cells = e
      .crossJoin(broadcast(centroids))
      .withColumn("csim", VectorOps.cosine(col("embedding"), col("ce")))
      .groupBy(col("vec_id"))
      .agg(
        max_by(
          struct(col("cell"), col("embedding")),
          struct(col("csim"), -col("cell"))
        ).as("best")
      )
      .select(col("vec_id"), col("best.cell").as("cell"), col("best.embedding").as("emb"))

    val a = cells.select(col("cell"), col("vec_id").as("va"), col("emb").as("ea"))
    val b = cells.select(col("cell"), col("vec_id").as("vb"), col("emb").as("eb"))
    a.join(b, Seq("cell")) // equi-join on cell — never a cross product
      .filter(col("va") < col("vb"))
      .withColumn("cos", VectorOps.cosine(col("ea"), col("eb")))
      .filter(col("cos") >= CosineThreshold)
      .groupBy(col("vb"), col("cell"))
      .agg(min(col("va")).as("keeper_id"), round(max(col("cos")), 4).as("max_sim"))
      .select(col("vb").as("dropped_id"), col("keeper_id"), col("cell"), col("max_sim"))
      .orderBy("dropped_id")
  }

  // ------------------- q160: perceptual-hash near-dup (banded Hamming)

  /** q160: perceptual-hash near-duplicate detection over decoded media
    * feature vectors — the IMAGE-dedup analog of MinHash-LSH (a pHash
    * pipeline: decode → feature vector → sign-quantize against the
    * per-dimension corpus median → 64-bit signature → find signatures
    * within Hamming distance ≤ 3). The embeddings table stands in for
    * the decoded features (the q36 stub-decode convention: the decode
    * is stubbed, the Spark plumbing is real).
    *
    * Scale shape — the pigeonhole band trick, Hamming edition: split
    * the 64-bit signature into 4 × 16-bit bands; two signatures within
    * Hamming 3 MUST agree exactly on ≥ 1 band (4 bands, ≤ 3 differing
    * bits), so candidates come from 4 EQUI-joins on (band_idx, band
    * value) — never an all-pairs scan — and the exact Hamming verify
    * (Σ bit_count(xor)) runs on candidates only, q27's banding argument
    * with bit-bands as buckets. Medians are a 64-row model frame
    * (exact percentile per dimension; approx_percentile is the
    * documented 100 TB swap-in — the SIGNATURE math is unchanged).
    *
    * The gate plants 50 near-twins (dimension 0 negated → exactly the
    * sign bit of dim 0 flips when the median sits between ±v₀) so the
    * detector is load-bearing by construction — the q149 convention;
    * random unit vectors alone would make ≤3-of-64 collisions
    * vanishingly rare.
    */
  private def q160(s: SparkSession, dir: String): DataFrame =
    phashNearDup(s, dir, useApprox = false)

  /** The q160 computation with its 100 TB swap-in as CODE, not prose:
    * `useApprox = true` computes the 64 per-dimension medians with
    * `approx_percentile` (KLL-style sketch, accuracy 10⁴) instead of
    * the buffering exact `percentile` TypedImperativeAggregate — the
    * model frame stays 64 rows; only its builder changes from
    * corpus-buffering to sketch-mergeable. Signature math, banding,
    * and the Hamming verify are untouched. DedupApproxSpec pins the
    * approx pair set against the exact gate's (all 50 planted twins
    * found; symmetric difference empty on the test corpus). The exact
    * form stays the GATE (hash-checkable, IEEE-deterministic).
    */
  private[graft] def phashNearDup(
      s: SparkSession,
      dir: String,
      useApprox: Boolean
  ): DataFrame = {
    val base = Tables
      .table(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val twins = base
      .filter(col("vec_id") < 50)
      .select(
        (col("vec_id") + 1000000L).as("vec_id"),
        concat(
          transform(slice(col("embedding"), 1, 1), x => -x),
          slice(col("embedding"), 2, 1000000)
        ).as("embedding")
      )
    val ex = base
      .unionByName(twins)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i0", "v")))
      .select(
        col("vec_id"),
        col("i0").cast("long").as("i"),
        col("v").cast("double").as("v")
      )
    val med =
      if (useApprox)
        ex.groupBy("i")
          .agg(expr("approx_percentile(v, 0.5, 10000)").as("med"))
      else ex.groupBy("i").agg(expr("percentile(v, 0.5)").as("med"))
    val bands = ex
      .join(broadcast(med), "i")
      .groupBy(col("vec_id"), expr("i div 16").as("k"))
      .agg(
        sum(
          when(
            col("v") > col("med"),
            expr("shiftleft(CAST(1 AS BIGINT), CAST(i % 16 AS INT))")
          ).otherwise(0L)
        ).as("band")
      )
    val cand = bands
      .select(col("k"), col("band"), col("vec_id").as("va"))
      .join(
        bands.select(col("k"), col("band"), col("vec_id").as("vb")),
        Seq("k", "band")
      )
      .filter(col("va") < col("vb"))
      .select("va", "vb")
      .distinct()
    val sa = bands.select(col("vec_id").as("va"), col("k"), col("band").as("ba"))
    val sb = bands.select(col("vec_id").as("vb"), col("k"), col("band").as("bb"))
    cand
      .join(sa, "va")
      .join(sb, Seq("vb", "k"))
      .groupBy("va", "vb")
      .agg(sum(bit_count(col("ba").bitwiseXOR(col("bb")))).as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy("va", "vb")
  }

  // -------------------------------------- q61: paragraph-level dedup

  /** Paragraph stand-in: the corpus has no newlines, so fixed 20-word
    * windows play the role of paragraph boundaries. The machinery is
    * identical either way — only the splitter changes.
    */
  private val ChunkWords = 20

  /** q61: corpus-wide paragraph dedup (the CCNet/RefinedWeb line-dedup
    * step): every repeated paragraph occurrence is dropped except the
    * globally-first one (smallest (doc_id, pos)), and each document is
    * reassembled from its surviving paragraphs in original order.
    *
    * Scale shape: Generate (chunk explode) → hash aggregate
    * min(struct(doc_id, pos)) per content digest [one shuffle, map-side
    * partial] → equi join digest→first-occurrence (the build side is ONE
    * row per distinct paragraph; AQE's skew split handles a
    * mega-duplicated paragraph on the probe side, which a
    * PARTITION BY digest row_number window could not — the whole
    * duplicate group would land on a single task) → reassembly
    * groupBy(doc_id) [one shuffle]. No all-pairs, no global sort, no
    * unbounded window partitions.
    */
  private def q61(s: SparkSession, dir: String): DataFrame = {
    // cached: the chunk frame feeds both the first-occurrence aggregate
    // and the keep-join probe side — uncached, the scan + explode + md5
    // would execute twice
    val chunks = tcache(
      s,
      docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(
          col("doc_id"),
          posexplode(
            expr(
              "CASE WHEN size(w) >= 1 THEN " +
                s"transform(sequence(0, cast(ceil(size(w) / $ChunkWords.0) as int) - 1), " +
                s"i -> array_join(slice(w, i * $ChunkWords + 1, $ChunkWords), ' ')) " +
                "ELSE array() END"
            )
          ).as(Seq("pos", "chunk"))
        )
        .withColumn("h", md5(col("chunk")))
    )
    // materialize: the first-occurrence aggregate and the keep-join
    // probe side race the unpopulated cache otherwise (bandedBuckets
    // race note)
    chunks.count()

    val firsts = chunks
      .groupBy("h")
      .agg(min(struct(col("doc_id"), col("pos"))).as("first"))

    chunks
      .join(firsts, "h")
      .withColumn(
        "keep",
        col("doc_id") === col("first.doc_id") && col("pos") === col("first.pos")
      )
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        // collect_list skips the NULLs the CASE emits for dropped chunks;
        // array_sort on the (pos, chunk) struct restores document order
        expr(
          "array_join(transform(array_sort(" +
            "collect_list(CASE WHEN keep THEN struct(pos, chunk) END)), " +
            "x -> x.chunk), ' ')"
        ).as("clean_text")
      )
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------------ maps

  /** K-gram length for exact duplicated-substring detection (q61b):
    * long enough that a match is memorization, not coincidence (the
    * exact-substring-dedup convention of 50-token spans, scaled to this
    * corpus's short documents), short enough that the corpus HAS spans
    * to find.
    */
  private[llm] val ExactSpanK = 40

  /** q61b: EXACT duplicated-substring spans — the character-level
    * complement of q61's paragraph dedup (fixed chunk grid: a duplicate
    * straddling chunk boundaries is invisible) and q73's winnowing
    * (sampled fingerprints: detection, not exact extents). This is the
    * "remove any substring of length ≥ K that appears twice" pass of
    * exact-substring training-data dedup, re-expressed relationally
    * instead of via suffix arrays: every K-char gram position is hashed
    * (one Generate over the corpus — O(total chars) rows, each narrowed
    * immediately to (doc_id, pos, 8-byte hash)); a global hash-count
    * keeps positions whose gram occurs more than once ANYWHERE; per doc,
    * overlapping/adjacent duplicated positions merge into maximal spans
    * (gaps-and-islands: sorted by position, break when the gap exceeds
    * K — equal-length intervals make ends monotone with starts, so the
    * lag test is exact interval merging). Output: per-doc duplicated
    * position/span/char totals, zeros included (every doc is a row).
    *
    * Scale shape: the gram explode is the honest Lee-at-al cost — one
    * corpus-chars-sized pass; the count shuffle moves 8-byte keys; the
    * dup-join's build side is only the >1-count hashes; the island
    * window partitions by doc_id (never global). At 100 TB this is the
    * same O(total chars) budget a suffix-array build pays, in three
    * shuffles of narrow rows. Both engines hash with the SAME md5
    * prefix, so even a hash collision (≈2⁻⁶⁰ per pair) yields identical
    * output.
    */
  /** The duplicated-span frame shared by q61b (report) and q61c
    * (cleaning transform): one row per maximal merged span —
    * (doc_id, island, s, e, npos), e exclusive.
    */
  private def dupSpans(s: SparkSession, dir: String): DataFrame = {
    val K = ExactSpanK
    val g = docs(s, dir)
      .filter(length(col("text")) >= K)
      .select(
        col("doc_id"),
        explode(sequence(lit(1), length(col("text")) - (K - 1))).as("i"),
        col("text")
      )
      .select(
        col("doc_id"),
        col("i"),
        graft.llm.Winnowing.md5Long(col("text").substr(col("i"), lit(K))).as("h")
      )
    val dupH = g.groupBy("h").agg(count(lit(1)).as("n")).filter(col("n") > 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy("i")
    g.join(dupH, "h")
      .select("doc_id", "i")
      .withColumn(
        "brk",
        when(col("i") - lag("i", 1).over(w) > K, 1).otherwise(0)
      )
      .withColumn("island", sum("brk").over(w))
      .groupBy("doc_id", "island")
      .agg(
        count(lit(1)).as("npos"),
        min(col("i")).as("s"),
        (max(col("i")) + K).as("e")
      )
  }

  private def q61b(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val perDoc = dupSpans(s, dir)
      .groupBy("doc_id")
      .agg(
        sum("npos").as("np"),
        count(lit(1)).as("ns"),
        sum((col("e") - col("s")).cast("long")).as("dc")
      )
    d.select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("np"), lit(0L)).as("n_dup_positions"),
        coalesce(col("ns"), lit(0L)).as("n_spans"),
        coalesce(col("dc"), lit(0L)).as("dup_chars")
      )
      .orderBy("doc_id")
  }

  /** q61c: the CLEANING transform q61b reports on — excise every
    * duplicated span ("remove all occurrences", the stricter variant of
    * exact-substring dedup) and emit the cleaned document's digest and
    * size. The cleaned text is stitched from the KEPT segments — the
    * complement intervals of the q61b spans — as ROWS (one segment
    * before each span via lag, one trailing segment per spanned doc,
    * the whole text for untouched docs), then ordered concatenation per
    * doc. Deliberately NO fold/reduce on either engine (the q137 DuckDB
    * dialect-drift lesson): ordered aggregation only — Spark sorts
    * (seg_start, seg) structs, DuckDB string_agg(… ORDER BY seg_s).
    * Fully-duplicated docs clean to the empty string (md5('')), zeros
    * included. Scale shape: the span frame rides q61b's three narrow
    * shuffles; segment stitching adds one per-doc aggregation whose
    * groups are span-count-bounded.
    */
  private def q61c(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(
      col("doc_id"),
      col("text"),
      (length(col("text")) + 1).as("tend")
    )
    val sp = dupSpans(s, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy("s")
    val pre = sp
      .withColumn("seg_s", coalesce(lag("e", 1).over(w), lit(1)))
      .select(col("doc_id"), col("seg_s"), col("s").as("seg_e"))
    val trail = sp
      .groupBy("doc_id")
      .agg(max("e").as("seg_s"))
      .join(d.select("doc_id", "tend"), "doc_id")
      .select(col("doc_id"), col("seg_s"), col("tend").as("seg_e"))
    val whole = d
      .join(sp.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit(1).as("seg_s"), col("tend").as("seg_e"))
    val segs = pre
      .unionByName(trail)
      .unionByName(whole)
      .filter(col("seg_e") > col("seg_s"))
    val cleaned = segs
      .join(d.select("doc_id", "text"), "doc_id")
      .select(
        col("doc_id"),
        col("seg_s"),
        col("text").substr(col("seg_s"), col("seg_e") - col("seg_s")).as("seg")
      )
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("nseg"),
        sum(length(col("seg")).cast("long")).as("cchars"),
        md5(
          array_join(
            transform(
              array_sort(
                collect_list(struct(col("seg_s"), col("seg").as("seg")))
              ),
              x => x.getField("seg")
            ),
            ""
          )
        ).as("cmd5")
      )
    d.select(col("doc_id"), length(col("text")).cast("long").as("orig"))
      .join(cleaned, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("nseg"), lit(0L)).as("n_segments"),
        coalesce(col("cchars"), lit(0L)).as("clean_chars"),
        (col("orig") - coalesce(col("cchars"), lit(0L))).as("removed_chars"),
        coalesce(col("cmd5"), md5(lit(""))).as("clean_md5")
      )
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_dedup_keys" -> q24,
    "q25_dedup_exact_text" -> q25,
    "q25b_dedup_normalized" -> q25b,
    "q25c_dedup_incremental" -> q25c,
    "q26_dedup_ngram_jaccard" -> q26,
    "q206_source_dup_matrix" -> q206,
    "q212_minhash_calibration" -> q212,
    "q27_dedup_minhash_lsh" -> q27,
    "q28_dedup_simhash" -> q28,
    "q29_dedup_embedding_cosine" -> q29,
    "q29b_dedup_semantic_clustered" -> q29b,
    "q160_phash_neardup" -> q160,
    "q61_paragraph_dedup" -> q61,
    "q61b_exact_substring_spans" -> q61b,
    "q61c_exact_substring_clean" -> q61c
  )

  /** Shared DuckDB shingle CTE (1-based list indexing over there); also
    * the edge source for Clustering.q50's recursive-closure oracle.
    */
  private[llm] val shingleCte =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
      |      i -> w[i] || '_' || w[i+1] || '_' || w[i+2])) AS g
      |  FROM toks),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
      |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)""".stripMargin

  private val jaccardSelect =
    """SELECT da, db, round(i * 1.0 / (sa.n + sb.n - i), 4) AS jac
      |FROM inter
      |JOIN sz sa ON sa.doc_id = da
      |JOIN sz sb ON sb.doc_id = db
      |WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.6
      |ORDER BY da, db""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // identical pHash pipeline: same planted twins, same per-dim
    // medians, same 4×16-bit bands (xor + bit_count on BIGINT), same
    // pigeonhole candidates; 0-based dimension index matches posexplode
    "q160_phash_neardup" ->
      """WITH base AS (SELECT vec_id, embedding FROM embeddings),
        |tw AS (
        |  SELECT vec_id + 1000000 AS vec_id,
        |    list_concat([-embedding[1]], embedding[2:]) AS embedding
        |  FROM base WHERE vec_id < 50),
        |allv AS (SELECT * FROM base UNION ALL SELECT * FROM tw),
        |ex AS (
        |  SELECT vec_id, CAST(p.i - 1 AS BIGINT) AS i,
        |    CAST(p.v AS DOUBLE) AS v
        |  FROM (SELECT vec_id, unnest(list_transform(
        |          generate_series(1, len(embedding)),
        |          j -> struct_pack(i := j, v := embedding[j]))) AS p
        |        FROM allv)),
        |med AS (SELECT i, quantile_cont(v, 0.5) AS med FROM ex GROUP BY 1),
        |bands AS (
        |  SELECT vec_id, i // 16 AS k,
        |    CAST(sum(CASE WHEN v > med
        |         THEN (CAST(1 AS BIGINT) << CAST(i % 16 AS INTEGER))
        |         ELSE 0 END) AS BIGINT) AS band
        |  FROM ex JOIN med USING (i) GROUP BY 1, 2),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
        |  FROM bands a JOIN bands b
        |    ON a.k = b.k AND a.band = b.band AND a.vec_id < b.vec_id),
        |ham AS (
        |  SELECT va, vb,
        |    CAST(sum(bit_count(xor(x.band, y.band))) AS BIGINT) AS hamming
        |  FROM cand
        |  JOIN bands x ON x.vec_id = va
        |  JOIN bands y ON y.vec_id = vb AND y.k = x.k
        |  GROUP BY 1, 2)
        |SELECT va, vb, hamming FROM ham WHERE hamming <= 3
        |ORDER BY va, vb""".stripMargin,
    "q24_dedup_keys" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,
    "q25_dedup_exact_text" ->
      """SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_doc_id""".stripMargin,
    "q25b_dedup_normalized" ->
      """SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies
        |FROM (SELECT doc_id,
        |        trim(regexp_replace(regexp_replace(lower(text),
        |          '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        |      FROM documents)
        |GROUP BY md5(norm) ORDER BY keep_doc_id""".stripMargin,
    "q25c_dedup_incremental" ->
      """WITH d AS (SELECT doc_id, md5(text) AS digest FROM documents),
        |seen AS (SELECT DISTINCT digest FROM d WHERE doc_id % 3 = 0)
        |SELECT doc_id, digest FROM d
        |WHERE NOT EXISTS (SELECT 1 FROM seen WHERE seen.digest = d.digest)
        |ORDER BY doc_id""".stripMargin,
    "q26_dedup_ngram_jaccard" -> s"$shingleCte\n$jaccardSelect",
    // q26's shingle CTEs + an INDEPENDENT signature rebuild: the same
    // md5-prefix base hash, the same (a, b, p) affine permutations
    // embedded as literal arrays, min per (doc, permutation) — then the
    // same exact-integer est9/ex9 calibration aggregate
    "q212_minhash_calibration" -> {
      val aLit = hashA.mkString("[", ", ", "]")
      val bLit = hashB.mkString("[", ", ", "]")
      s"""$shingleCte,
         |hs AS (
         |  SELECT doc_id,
         |    CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) % $MinHashP AS h
         |  FROM sh),
         |consts AS (SELECT $aLit AS a, $bLit AS b),
         |sigs AS MATERIALIZED (
         |  SELECT doc_id, j,
         |    min((a[j + 1] * h + b[j + 1]) % $MinHashP) AS mh
         |  FROM hs, (SELECT unnest(range(0, ${hashA.length})) AS j), consts
         |  GROUP BY doc_id, j),
         |pj AS (
         |  SELECT da, db, i, sa.n AS na, sb.n AS nb
         |  FROM inter
         |  JOIN sz sa ON sa.doc_id = da
         |  JOIN sz sb ON sb.doc_id = db
         |  WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.6),
         |pm AS (
         |  SELECT p.da, p.db,
         |    CAST(sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) AS BIGINT) AS m,
         |    min(p.i) AS i, min(p.na) AS na, min(p.nb) AS nb
         |  FROM pj p
         |  JOIN sigs x ON x.doc_id = p.da
         |  JOIN sigs y ON y.doc_id = p.db AND y.j = x.j
         |  GROUP BY p.da, p.db),
         |dd AS (
         |  SELECT m * 15625000 - (1000000000 * i) // (na + nb - i) AS d9
         |  FROM pm),
         |agg AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         |    CAST(sum(abs(d9)) AS BIGINT) AS sad9,
         |    CAST(sum(d9) AS BIGINT) AS sd9,
         |    CAST(max(abs(d9)) AS BIGINT) AS mx9
         |  FROM dd)
         |SELECT n_pairs,
         |  round(CAST(sad9 AS DOUBLE) / CAST(n_pairs * 1000000000 AS DOUBLE), 6)
         |    + 0.0 AS mae,
         |  round(CAST(sd9 AS DOUBLE) / CAST(n_pairs * 1000000000 AS DOUBLE), 6)
         |    + 0.0 AS mean_bias,
         |  round(CAST(mx9 AS DOUBLE) / 1.0e9, 6) + 0.0 AS max_abs_err
         |FROM agg""".stripMargin
    },
    // q26's shingle CTEs verbatim + the source-pair rollup: per-pair
    // Jaccard on the 1e-4 floor grid, exact BIGINT cell sums, one mean
    // division per cell
    "q206_source_dup_matrix" ->
      s"""$shingleCte,
         |pj AS (
         |  SELECT da, db,
         |    CAST(floor(i * 10000.0 / (sa.n + sb.n - i)) AS BIGINT) AS jac4
         |  FROM inter
         |  JOIN sz sa ON sa.doc_id = da
         |  JOIN sz sb ON sb.doc_id = db
         |  WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.6),
         |lab AS (
         |  SELECT least(x.source, y.source) AS source_a,
         |         greatest(x.source, y.source) AS source_b, jac4
         |  FROM pj
         |  JOIN documents x ON x.doc_id = pj.da
         |  JOIN documents y ON y.doc_id = pj.db)
         |SELECT source_a, source_b,
         |  CAST(count(*) AS BIGINT) AS n_pairs,
         |  round(CAST(sum(jac4) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |        / 1.0e4, 6) + 0.0 AS mean_jaccard
         |FROM lab GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // LSH with 16×4 banding has recall ≈ 1 at the 0.6 threshold (the
    // planted near-dups sit at jac ≥ 0.9, where miss probability is
    // ~1e-11), so the oracle is the same exact-Jaccard result.
    "q27_dedup_minhash_lsh" -> s"$shingleCte\n$jaccardSelect",
    "q28_dedup_simhash" -> q28Oracle,
    "q29_dedup_embedding_cosine" ->
      """WITH cos AS (
        |  SELECT a.vec_id AS va, b.vec_id AS vb,
        |    list_sum(list_transform(generate_series(1, len(a.embedding)),
        |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS c
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
        |SELECT va, vb, round(c, 4) AS cos_sim FROM cos
        |WHERE c >= 0.4 ORDER BY va, vb""".stripMargin,
    // q29b replays the clustered semantics exactly: nearest-of-16 cell
    // assignment (ties → smallest cell), within-cell pairs only
    "q29b_dedup_semantic_clustered" ->
      s"""WITH cs AS (
         |  SELECT e.vec_id, c.vec_id AS cell,
         |    list_sum(list_transform(generate_series(1, len(e.embedding)),
         |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
         |    / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         |       * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS csim
         |  FROM embeddings e JOIN embeddings c ON c.vec_id < $SemCells),
         |cells AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
         |    FROM cs) WHERE rn = 1),
         |pr AS (
         |  SELECT ca.cell, a.vec_id AS va, b.vec_id AS vb,
         |    list_sum(list_transform(generate_series(1, len(a.embedding)),
         |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
         |    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         |       * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS c
         |  FROM embeddings a
         |  JOIN cells ca ON ca.vec_id = a.vec_id
         |  JOIN embeddings b ON a.vec_id < b.vec_id
         |  JOIN cells cb ON cb.vec_id = b.vec_id AND cb.cell = ca.cell)
         |SELECT vb AS dropped_id, min(va) AS keeper_id, cell, round(max(c), 4) AS max_sim
         |FROM pr WHERE c >= $CosineThreshold
         |GROUP BY vb, cell ORDER BY dropped_id""".stripMargin,
    // the oracle's row_number keep-first is value-identical to the Spark
    // side's min(struct(doc_id, pos)) aggregation — the window spelling
    // is fine HERE because DuckDB runs at oracle scale only
    "q61_paragraph_dedup" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |ch AS (
         |  SELECT doc_id, t.i AS pos,
         |    array_to_string(list_slice(w,
         |      t.i * $ChunkWords + 1, t.i * $ChunkWords + $ChunkWords), ' ') AS chunk
         |  FROM toks, LATERAL unnest(generate_series(0,
         |    CAST(ceil(len(w) / $ChunkWords.0) AS INT) - 1)) AS t(i)),
         |rk AS (
         |  SELECT doc_id, pos, chunk,
         |    row_number() OVER (PARTITION BY md5(chunk)
         |                       ORDER BY doc_id, pos) AS rn
         |  FROM ch)
         |SELECT doc_id, count(*) AS n_chunks,
         |  count(*) FILTER (WHERE rn = 1) AS n_kept,
         |  coalesce(string_agg(chunk, ' ' ORDER BY pos) FILTER (WHERE rn = 1),
         |           '') AS clean_text
         |FROM rk GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the identical construction: gram hashes (same md5-prefix long), the
    // >1 global count, and the same gaps-and-islands span merge
    "q61b_exact_substring_spans" ->
      s"""WITH d AS (SELECT doc_id, text FROM documents),
         |g AS (
         |  SELECT doc_id, t.i AS i,
         |    CAST('0x' || substr(md5(substr(text, t.i, $ExactSpanK)), 1, 15)
         |         AS BIGINT) AS h
         |  FROM d, LATERAL unnest(generate_series(1,
         |    len(text) - ${ExactSpanK - 1})) AS t(i)
         |  WHERE len(text) >= $ExactSpanK),
         |c AS (SELECT h FROM g GROUP BY h HAVING count(*) > 1),
         |p AS (SELECT doc_id, i FROM g JOIN c USING (h)),
         |s AS (
         |  SELECT doc_id, i,
         |    CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i)
         |              > $ExactSpanK
         |         THEN 1 ELSE 0 END AS brk
         |  FROM p),
         |isl AS (
         |  SELECT doc_id, i,
         |    sum(brk) OVER (PARTITION BY doc_id ORDER BY i) AS island
         |  FROM s),
         |sp AS (
         |  SELECT doc_id, island, CAST(count(*) AS BIGINT) AS npos,
         |    CAST(max(i) + $ExactSpanK - min(i) AS BIGINT) AS span_chars
         |  FROM isl GROUP BY doc_id, island),
         |pd AS (
         |  SELECT doc_id, CAST(sum(npos) AS BIGINT) AS np,
         |    CAST(count(*) AS BIGINT) AS ns,
         |    CAST(sum(span_chars) AS BIGINT) AS dc
         |  FROM sp GROUP BY doc_id)
         |SELECT d.doc_id,
         |  coalesce(pd.np, 0) AS n_dup_positions,
         |  coalesce(pd.ns, 0) AS n_spans,
         |  coalesce(pd.dc, 0) AS dup_chars
         |FROM d LEFT JOIN pd USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    // the cleaning transform over the SAME span construction: kept
    // segments as rows, ordered concatenation (no fold on either engine)
    "q61c_exact_substring_clean" ->
      s"""WITH d AS (SELECT doc_id, text FROM documents),
         |g AS (
         |  SELECT doc_id, t.i AS i,
         |    CAST('0x' || substr(md5(substr(text, t.i, $ExactSpanK)), 1, 15)
         |         AS BIGINT) AS h
         |  FROM d, LATERAL unnest(generate_series(1,
         |    len(text) - ${ExactSpanK - 1})) AS t(i)
         |  WHERE len(text) >= $ExactSpanK),
         |c AS (SELECT h FROM g GROUP BY h HAVING count(*) > 1),
         |p AS (SELECT doc_id, i FROM g JOIN c USING (h)),
         |s AS (
         |  SELECT doc_id, i,
         |    CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i)
         |              > $ExactSpanK
         |         THEN 1 ELSE 0 END AS brk
         |  FROM p),
         |isl AS (
         |  SELECT doc_id, i,
         |    sum(brk) OVER (PARTITION BY doc_id ORDER BY i) AS island
         |  FROM s),
         |sp AS (
         |  SELECT doc_id, min(i) AS sps, max(i) + $ExactSpanK AS spe
         |  FROM isl GROUP BY doc_id, island),
         |pre AS (
         |  SELECT doc_id,
         |    coalesce(lag(spe) OVER (PARTITION BY doc_id ORDER BY sps), 1)
         |      AS seg_s,
         |    sps AS seg_e
         |  FROM sp),
         |tr AS (
         |  SELECT sp.doc_id, max(sp.spe) AS seg_s, len(d.text) + 1 AS seg_e
         |  FROM sp JOIN d USING (doc_id) GROUP BY sp.doc_id, len(d.text)),
         |whole AS (
         |  SELECT doc_id, 1 AS seg_s, len(text) + 1 AS seg_e
         |  FROM d WHERE doc_id NOT IN (SELECT DISTINCT doc_id FROM sp)),
         |segs AS (
         |  SELECT * FROM pre UNION ALL SELECT * FROM tr
         |  UNION ALL SELECT * FROM whole),
         |ks AS (
         |  SELECT segs.doc_id, seg_s,
         |    substr(d.text, seg_s, seg_e - seg_s) AS seg
         |  FROM segs JOIN d USING (doc_id) WHERE seg_e > seg_s),
         |agg AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS nseg,
         |    CAST(sum(len(seg)) AS BIGINT) AS cchars,
         |    md5(string_agg(seg, '' ORDER BY seg_s)) AS cmd5
         |  FROM ks GROUP BY doc_id)
         |SELECT d.doc_id,
         |  coalesce(agg.nseg, 0) AS n_segments,
         |  coalesce(agg.cchars, 0) AS clean_chars,
         |  CAST(len(d.text) AS BIGINT) - coalesce(agg.cchars, 0)
         |    AS removed_chars,
         |  coalesce(agg.cmd5, md5('')) AS clean_md5
         |FROM d LEFT JOIN agg USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin
  )
}
