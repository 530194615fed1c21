package graft.llm

import graft.queries.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q73: winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
  * SIGMOD'03 — the MOSS algorithm): hash every K-word shingle, slide a
  * W-hash window, keep each window's MINIMUM hash. The guarantee that
  * makes this the local-similarity fingerprint (vs q35's whole-doc
  * rolling hash or q27's global MinHash): any shared run of at least
  * W+K-1 words between two documents is certain to contribute at least
  * one COMMON fingerprint, while storage stays ~2/(W+1) of the shingle
  * count. Variant note: we keep the window-min VALUE (not (value,pos)),
  * the set-matching flavor; position-robust but slightly denser than
  * the positional original.
  *
  * Scale shape: the entire computation is ONE map-side projection per
  * document — gram hashing, window minima, and the distinct-set
  * reduction all happen inside array HOFs over the token array (zero
  * shuffle, zero join, whole-stage codegen; plan-pinned). The hash is
  * the repo's cross-engine md5-prefix bigint (Sampling.bucket100's
  * policy), so every fingerprint is deterministic in both engines and
  * the summary columns are exact integers (the mod-sum is
  * order-insensitive by commutativity — no float anywhere).
  */
object Winnowing {

  private[graft] val K = 4 // words per shingle
  private[graft] val W = 5 // hashes per winnow window
  private val ModP = 1000003L

  /** md5-prefix (15 hex digits) of a string column as a positive long —
    * identical to DuckDB's CAST('0x' || substr(md5(s), 1, 15) AS BIGINT).
    */
  private[graft] def md5Long(s: Column): Column =
    conv(substring(md5(s.cast("binary")), 1, 15), 16, 10).cast("long")

  private def q73(s: SparkSession, dir: String): DataFrame =
    summarized(Tables.table(s, dir, "documents"))

  /** The full fingerprint pipeline over any (doc_id, text) frame —
    * exposed so the winnowing guarantee (a shared ≥ W+K-1-word run ⇒ a
    * shared fingerprint) is property-testable on planted corpora.
    */
  private[graft] def fingerprinted(d: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    val grams = transform(
      sequence(lit(1), size(col("ws")) - (K - 1)),
      i => md5Long(concat_ws(" ", slice(col("ws"), i, lit(K))))
    )
    val mins = transform(
      // docs shorter than W+K-1 words get a single (truncated) window
      sequence(lit(1), greatest(lit(1), size(col("h")) - (W - 1))),
      j => array_min(slice(col("h"), j, lit(W)))
    )
    d
      .select(col("doc_id"), words.as("ws"))
      .filter(size(col("ws")) >= K)
      .select(col("doc_id"), grams.as("h"))
      .select(col("doc_id"), size(col("h")).as("n_grams"), mins.as("mins"))
      .withColumn("fp", array_distinct(col("mins")))
  }

  private def summarized(d: DataFrame): DataFrame =
    fingerprinted(d)
      .select(
        col("doc_id"),
        col("n_grams"),
        size(col("fp")).as("n_fp"),
        array_min(col("fp")).as("fp_min"),
        array_max(col("fp")).as("fp_max"),
        aggregate(col("fp"), lit(0L), (acc, v) => acc + v % ModP)
          .as("fp_modsum")
      )
      .orderBy("doc_id")

  // --------------------------- q73b: fingerprint-join near-dup candidates

  private[graft] val DfCap = 50 // posting-list cap (boilerplate cutoff)
  private val JacThreshold = 0.5

  /** q73b: MOSS-style similarity detection — the USE of q73's
    * fingerprints: explode each document's fingerprint set into postings,
    * drop fingerprints shared by more than DfCap documents (the
    * boilerplate/stopword cutoff every posting-list system applies — and
    * the SKEW BOUND: after the cap, a single fingerprint contributes at
    * most DfCap² candidate pairs, so the self-join cannot degenerate on a
    * hot fingerprint however large the corpus), equi-join postings on the
    * fingerprint, and keep pairs whose Jaccard over the capped
    * fingerprint universe clears the threshold. The winnowing guarantee
    * transfers: two documents sharing enough long runs share many
    * fingerprints, while q26's quadratic shingle self-join is replaced by
    * a bounded candidate join — same candidates-by-construction argument
    * as q27's LSH banding, with fingerprints instead of band buckets.
    */
  private def q73b(s: SparkSession, dir: String): DataFrame = {
    // Two plan disciplines this query lives or dies by (round-8 lesson:
    // the naive spelling ran 312 s at sf0.1 where this one runs ~1 s):
    //  1. PARALLELIZE THE EXPENSIVE MAP. The fingerprint pipeline is
    //     ~100 md5 calls per document; a low-file-count corpus (the
    //     gate's single parquet file ⇒ ONE scan task) would run it
    //     sequentially however many cores exist. Round-robin the raw
    //     docs first — the text shuffle is tiny next to the hashing it
    //     parallelizes. (A many-file 100 TB corpus already scans wide;
    //     the extra exchange is then noise, not a second scan.)
    //  2. COMPUTE IT ONCE. DataFrame references duplicate their
    //     subtree: postings feed dfc, keep (twice — the self-join),
    //     and sizes, so the spelling below would inline the md5
    //     pipeline EIGHT times. Pinning one canonical hash-by-f
    //     exchange right after the explode makes every downstream
    //     reference a child of the SAME shuffle — AQE stage reuse
    //     materializes the expensive map once and replays its output.
    //  3. explode_outer, NOT explode. Plain explode plants an implicit
    //     `size(fp) > 0` pre-filter that Catalyst pushes below the
    //     repartition, INLINING the whole fingerprint expression into a
    //     Filter — where the gram array is re-evaluated inside the
    //     window lambda PER POSITION: O(n_grams²) md5 calls per doc, on
    //     the unparallelized scan. explode_outer has no such filter;
    //     the null row an empty fp would emit is dropped after the
    //     Generate for the same semantics at projection cost.
    val posts = fingerprinted(
      Tables
        .table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
    )
      .select(col("doc_id"), explode_outer(col("fp")).as("f"))
      .filter(col("f").isNotNull)
      .repartition(col("f"))
    val dfc = posts.groupBy("f").agg(count(lit(1)).as("df"))
    val keep = posts.join(dfc.filter(col("df") <= DfCap), "f")
    val sizes = keep.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = keep
      .select(col("doc_id").as("da"), col("f"))
      .join(keep.select(col("doc_id").as("db"), col("f")), "f")
      .filter(col("da") < col("db"))
      .groupBy("da", "db")
      .agg(count(lit(1)).as("c"))
    pairs
      .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .withColumn("jac", col("c") * lit(1.0) / (col("na") + col("nb") - col("c")))
      .filter(col("jac") >= JacThreshold)
      .select(col("da"), col("db"), col("c"), (round(col("jac"), 4) + lit(0d)).as("jac"))
      .orderBy("da", "db")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q73_winnowing" -> q73,
    "q73b_fingerprint_dedup" -> q73b
  )

  /** Shared oracle CTE: per-doc fingerprint lists (d → grams → winnowed
    * distinct minima) — q73 summarizes it, q73b joins over it.
    */
  private val fpCte: String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |g AS (
       |  SELECT doc_id,
       |    list_transform(generate_series(1, len(ws) - ${K - 1}),
       |      i -> CAST('0x' || substr(md5(array_to_string(ws[i:i+${K - 1}], ' ')), 1, 15)
       |           AS BIGINT)) AS h
       |  FROM d WHERE len(ws) >= $K),
       |w AS (
       |  SELECT doc_id, len(h) AS n_grams,
       |    list_distinct(list_transform(
       |      generate_series(1, greatest(1, len(h) - ${W - 1})),
       |      j -> list_min(h[j:j+${W - 1}]))) AS fp
       |  FROM g)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q73_winnowing" ->
      s"""$fpCte
         |SELECT doc_id, CAST(n_grams AS INTEGER) AS n_grams,
         |  CAST(len(fp) AS INTEGER) AS n_fp,
         |  list_min(fp) AS fp_min, list_max(fp) AS fp_max,
         |  CAST(list_sum(list_transform(fp, v -> v % $ModP)) AS BIGINT) AS fp_modsum
         |FROM w ORDER BY doc_id""".stripMargin,
    "q73b_fingerprint_dedup" ->
      s"""$fpCte,
         |post AS (SELECT doc_id, unnest(fp) AS f FROM w),
         |dfc AS (SELECT f, count(*) AS df FROM post GROUP BY f),
         |keep AS (SELECT doc_id, post.f FROM post JOIN dfc USING (f) WHERE df <= $DfCap),
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM keep GROUP BY doc_id),
         |pairs AS (
         |  SELECT a.doc_id AS da, b.doc_id AS db, CAST(count(*) AS BIGINT) AS c
         |  FROM keep a JOIN keep b ON a.f = b.f AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |scored AS (
         |  SELECT da, db, c, c * 1.0 / (sa.n + sb.n - c) AS jac
         |  FROM pairs
         |  JOIN sizes sa ON sa.doc_id = da
         |  JOIN sizes sb ON sb.doc_id = db)
         |SELECT da, db, c, round(jac, 4) + 0.0 AS jac
         |FROM scored WHERE jac >= $JacThreshold
         |ORDER BY da, db""".stripMargin
  )
}
