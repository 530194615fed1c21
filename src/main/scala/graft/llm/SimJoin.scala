package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Tables

/** Exact similarity JOINS with sub-quadratic candidate generation — the
  * two classic lossless-filter algorithms a 100 TB dedup/linkage stage
  * runs when it needs EXACT results (unlike q27/q28's probabilistic
  * LSH) without the all-pairs blowup of q26's full inverted index:
  *
  *  - q109: prefix-filtering set-similarity join (SSJoin/PPJoin family,
  *    Chaudhuri et al. ICDE'06, Xiao et al. WWW'08) — index only each
  *    set's PREFIX under a global rarest-first token order; any pair
  *    with Jaccard ≥ t must collide inside the prefixes, so the
  *    candidate join runs over a frame that shrinks with t while the
  *    verified output is bit-identical to the naive join.
  *  - q110: edit-distance self-join via deletion neighborhoods (FastSS,
  *    Bocek et al. 2007) — for distance ≤ 1, two strings must share a
  *    member of {s} ∪ {s minus one char}; the neighborhood explode is
  *    map-side ×(len+1) and the equi-join on variants replaces the
  *    O(n²) pairwise scan, with a levenshtein verify on the candidates.
  *
  * Reference scope: none (no similarity joins in the reference or its
  * Athena templates); LLM-pipeline extension surface per the build
  * brief. Both oracles replay the NAIVE quadratic/full-index spelling —
  * structurally different algorithms that must land on identical rows.
  */
object SimJoin {

  /** q109 Jaccard threshold — higher than q26's 0.6 on purpose: the
    * prefix length |s| − ⌈t·|s|⌉ + 1 shrinks as t grows, which is the
    * algorithm's whole leverage (at t=0.7 only ~a third of each set is
    * indexed; the full-index q26 plan indexes every token).
    */
  private val T10 = 7 // threshold numerator over denominator 10 (t = 0.7)

  /** q109: exact set-similarity self-join over the q26 word-3-gram
    * shingle sets at jac ≥ 0.7, candidates from PREFIX collisions only.
    *
    * Plan at scale:
    *   1. token df: one hash aggregate over the shingle frame;
    *   2. per-doc sorted set under the global (df ASC, g ASC) order —
    *      rarest shingles first, so prefixes collide as rarely as the
    *      data allows (the PPJoin ordering heuristic);
    *   3. explode ONLY the prefix (|s| − ⌈t·|s|⌉ + 1 tokens) → self
    *      equi-join on the prefix token, with the exact-integer length
    *      filter 10·min ≥ 7·max riding the join condition (jac ≥ t
    *      implies t·max(|a|,|b|) ≤ min(|a|,|b|); both lossless);
    *   4. verify candidates with one codegen'd array_intersect over the
    *      two full sorted sets — candidate-sized work, never pairs².
    * Nothing all-pairs: the only self-join runs on the prefix-token
    * posting lists, which the rarest-first order keeps short (a token
    * shared by every document sorts LAST and never enters a prefix
    * unless a set is almost all common tokens).
    */
  private def q109(s: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.cachedShingles(s, dir) // (doc_id, g), distinct
    val df = sh.groupBy("g").agg(count(lit(1)).as("df"))
    // per-doc shingle array sorted by the global (df, g) order; cached:
    // it feeds the prefix explode AND both verify sides
    val ordered = Dedup.tcache(
      s,
      sh.join(df, "g")
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("df"), col("g")))).as("sg"))
        .select(
          col("doc_id"),
          expr("transform(sg, x -> x.g)").as("gs"),
          size(col("sg")).as("n")
        )
    )
    // materialize: four consumers (both prefix self-join sides, both
    // verify-join arms) otherwise race the unpopulated cache from
    // concurrent AQE stages (the Dedup bandedBuckets race note)
    ordered.count()
    // prefix length n − ⌈t·n⌉ + 1 with ⌈7n/10⌉ = (7n+9) div 10 — exact
    // integer arithmetic, no float boundary
    val pref = ordered.select(
      col("doc_id"),
      col("n"),
      explode(expr(s"slice(gs, 1, size(gs) - (($T10*size(gs)+9) div 10) + 1)"))
        .as("g")
    )
    val cand = pref
      .as("a")
      .join(
        pref.as("b"),
        col("a.g") === col("b.g")
          && col("a.doc_id") < col("b.doc_id")
          && col("a.n") * 10 >= col("b.n") * T10
          && col("b.n") * 10 >= col("a.n") * T10
      )
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    cand
      .join(
        ordered.select(col("doc_id").as("da"), col("gs").as("ga"), col("n").as("na")),
        "da"
      )
      .join(
        ordered.select(col("doc_id").as("db"), col("gs").as("gb"), col("n").as("nb")),
        "db"
      )
      .withColumn("i", size(array_intersect(col("ga"), col("gb"))))
      .withColumn(
        "jac",
        col("i").cast("double") / (col("na") + col("nb") - col("i")).cast("double")
      )
      .filter(col("jac") >= T10 / 10.0)
      .select(col("da"), col("db"), round(col("jac"), 4).as("jac"))
      .orderBy("da", "db")
  }

  /** q110: edit-distance ≤ 1 self-join over supplier names (the
    * spell-variant / near-identical-key linkage primitive). Each name
    * explodes map-side into its deletion neighborhood {s} ∪ {del_i(s)}
    * (array_union dedups repeated-character collisions); a distance-1
    * pair MUST share a neighborhood member (substitution at i ⇒ equal
    * i-th deletions; insert/delete ⇒ the shorter string is a deletion
    * variant of the longer AND of itself), so one equi-join on the
    * variant string yields a candidate superset that a levenshtein
    * verify prunes — false positives exist (equal deletions at
    * DIFFERENT positions can be distance 2), correctness never depends
    * on the blocking.
    *
    * Scale shape: ×(len+1) map-side explode, one hash equi-join on the
    * variant, candidate-sized verify — vs the oracle's O(n²) pairwise
    * levenshtein, the canonical naive spelling. No window, no sort
    * until the final candidate-sized ORDER BY.
    */
  private def q110(s: SparkSession, dir: String): DataFrame = {
    val variants = Tables
      .table(s, dir, "supplier")
      .select(
        col("s_name"),
        explode(
          expr(
            "array_union(array(s_name), " +
              "transform(sequence(0, length(s_name) - 1), " +
              "i -> concat(substring(s_name, 1, i), substring(s_name, i + 2))))"
          )
        ).as("v")
      )
    variants
      .as("a")
      .join(
        variants.as("b"),
        col("a.v") === col("b.v") && col("a.s_name") < col("b.s_name")
      )
      .select(col("a.s_name").as("name_a"), col("b.s_name").as("name_b"))
      .distinct()
      .filter(levenshtein(col("name_a"), col("name_b")) <= 1)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .orderBy("name_a", "name_b")
  }

  /** q121 Jaro-Winkler acceptance threshold (0.85 keeps ~140 of the
    * ~2000 possible distinct-name pairs — a real shortlist, not the
    * near-everything a sequential-ID column would match).
    */
  private val JwT = 0.85

  /** Jaro-Winkler similarity as a Column — the codegen'd
    * [[graft.functions.JaroWinkler]] expression (see its Scaladoc for
    * the pinned textbook semantics and the DuckDB bit-parity contract).
    */
  private def jaroWinkler(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expr => cexpr}
    column(graft.functions.JaroWinkler(cexpr(a), cexpr(b)))
  }

  /** q121: Jaro-Winkler name linkage — the third similarity-join
    * flavor: q109 matches SETS (Jaccard), q110 matches strings at a
    * FIXED edit budget, q121 scores GRADED character-level similarity
    * with prefix emphasis, the standard scorer for entity-resolution /
    * master-data name matching (Winkler's census linkage). Self-join
    * over the DISTINCT part names, scored by the custom codegen'd
    * expression, kept at ≥ [[JwT]].
    *
    * The length filter riding the join is LOSSLESS: jw = j + ℓ·0.1·(1−j)
    * ≤ 0.6·j + 0.4 (ℓ ≤ 4), so jw ≥ 0.85 ⇒ j ≥ 0.75; with m ≤ min(l1,l2)
    * and t ≥ 0, j ≤ (min/max + 2)/3 ⇒ min/max ≥ 1/4 ⇒ 4·min ≥ max —
    * exact integer arithmetic on both engines.
    *
    * Scale shape: names are a DISTINCT-values frame (vocabulary-sized,
    * orders smaller than the corpus — the master-data regime); the
    * self-join broadcasts it. For corpus-sized string sets the
    * candidate generator composes: q110's deletion neighborhoods or
    * q109's prefix filter block first, q121's scorer ranks the
    * survivors. The threshold filter runs on the RAW double (both
    * engines compute bit-identical values — JaroWinklerSpec), the
    * round-6 grid is display-only.
    */
  private def q121(s: SparkSession, dir: String): DataFrame = {
    val names = Tables.table(s, dir, "part").select(col("p_name")).distinct()
    q121Over(names)
  }

  /** The joinable core, parameterized for the spec's crafted corpus. */
  private[graft] def q121Over(names: DataFrame): DataFrame =
    names
      .select(col("p_name").as("name_a"))
      .as("a")
      .join(
        names.select(col("p_name").as("name_b")).as("b"),
        col("name_a") < col("name_b") &&
          lit(4) * least(length(col("name_a")), length(col("name_b")))
          >= greatest(length(col("name_a")), length(col("name_b")))
      )
      .withColumn("jw_raw", jaroWinkler(col("name_a"), col("name_b")))
      .filter(col("jw_raw") >= JwT)
      .select(
        col("name_a"),
        col("name_b"),
        round(col("jw_raw"), 6).as("jw")
      )
      .orderBy("name_a", "name_b")

  /** q139: entity resolution end-to-end — the pipeline the similarity
    * joins exist to feed: block (q121's lossless length filter), score
    * (the codegen'd Jaro-Winkler kernel at ≥ [[JwT]]), cluster the match
    * edges transitively (q50's checkpointed label propagation), and
    * assign every mention a canonical entity id (the lexicographic min
    * of its cluster — Winkler's census-linkage shape). Output: one row
    * per DISTINCT name with its entity and the entity's cluster size;
    * singletons resolve to themselves, so the assignment is total.
    *
    * Scale shape: names are the distinct-values frame (master-data
    * regime); at corpus scale the block swaps to q110's deletion
    * neighborhoods or q109's prefix filter, the scorer and the CC loop
    * are unchanged. The transitive step matters: A~B and B~C without
    * A~C is COMMON under any threshold scorer, and pair-level dedup
    * would split the entity.
    *
    * The oracle replays blocking + scoring with DuckDB's native
    * jaro_winkler (bit-parity pinned by q121) and the closure with a
    * recursive CTE (min reachable name per node) — a fully independent
    * transitive-closure implementation; equality proves the propagation
    * loop labels every component exactly.
    */
  private def q139(s: SparkSession, dir: String): DataFrame = {
    val names = Tables.table(s, dir, "part").select(col("p_name")).distinct()
    val edges = q121Over(names)
      .select(col("name_a").as("src"), col("name_b").as("dst"))
    val comps = Clustering.connectedComponents(edges)
    val lbl = names
      .select(col("p_name").as("name"))
      .join(
        comps.select(col("id").as("name"), col("component").as("entity")),
        Seq("name"),
        "left"
      )
      .select(col("name"), coalesce(col("entity"), col("name")).as("entity"))
    val sz = lbl.groupBy("entity").agg(count(lit(1)).as("cluster_size"))
    lbl
      .join(sz, "entity")
      .select(col("name"), col("entity"), col("cluster_size"))
      .orderBy("name")
  }

  /** q166 containment threshold (numerator over 10) and the minimum
    * contained-set size: a 2-shingle snippet is "contained" in half the
    * corpus by chance — the floor keeps the report about real quoting.
    */
  private val C10 = 8
  private val MinContained = 5

  /** q166: set-CONTAINMENT join — the ASYMMETRIC complement of q109's
    * Jaccard: C(A→B) = |A∩B| / |A| ≥ 0.8 finds documents QUOTED inside
    * larger ones (boilerplate extraction, quote/citation detection,
    * "is this eval answer embedded in some train doc" — the case a
    * symmetric Jaccard join structurally misses, because a 40-shingle
    * snippet inside a 4000-shingle page has Jaccard ≈ 0.01).
    *
    * Plan at scale (the q109 machinery, re-derived for the asymmetric
    * threshold): the contained side A explodes ONLY its prefix under
    * the global rarest-first (df, g) order — for containment the
    * lossless prefix length is |A| − ⌈t·|A|⌉ + 1 exactly as for
    * Jaccard (≥ t·|A| of A's tokens must be in B, so a miss needs
    * > (1−t)·|A| absences, pigeonhole on the prefix) — but joins the
    * FULL posting list on the container side (B's size is unbounded
    * above, so B cannot be prefix-pruned; the prefix tokens being A's
    * RAREST keeps those posting lists short, which is the PPJoin
    * ordering doing the work). The container-size LOWER bound
    * 10·|B| ≥ t·10·|A| rides the join (|B| ≥ |A∩B| ≥ t·|A|,
    * lossless). Verify = one codegen'd array_intersect per candidate,
    * i/|A| in exact-integer-derived doubles. Nothing all-pairs.
    */
  private def q166(s: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.cachedShingles(s, dir) // (doc_id, g), distinct
    val df = sh.groupBy("g").agg(count(lit(1)).as("df"))
    val ordered = Dedup.tcache(
      s,
      sh.join(df, "g")
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("df"), col("g")))).as("sg"))
        .select(
          col("doc_id"),
          expr("transform(sg, x -> x.g)").as("gs"),
          size(col("sg")).as("n")
        )
    )
    // materialize: four consumers (prefix explode, posting list, both
    // verify-join arms) otherwise race the unpopulated cache from
    // concurrent AQE stages (the Dedup bandedBuckets race note)
    ordered.count()
    // prefix |A| − ⌈0.8·|A|⌉ + 1 with ⌈8n/10⌉ = (8n+9) div 10 — exact
    val pref = ordered
      .filter(col("n") >= MinContained)
      .select(
        col("doc_id"),
        col("n"),
        explode(
          expr(s"slice(gs, 1, size(gs) - (($C10*size(gs)+9) div 10) + 1)")
        ).as("g")
      )
    val inv = ordered.select(
      col("doc_id").as("dc"),
      col("n").as("nc"),
      explode(col("gs")).as("g")
    )
    val cand = pref
      .join(
        inv,
        pref("g") === inv("g")
          && pref("doc_id") =!= inv("dc")
          && inv("nc") * 10 >= pref("n") * C10
      )
      .select(pref("doc_id").as("dq"), col("dc"))
      .distinct()
    cand
      .join(
        ordered
          .select(col("doc_id").as("dq"), col("gs").as("gq"), col("n").as("nq")),
        "dq"
      )
      .join(ordered.select(col("doc_id").as("dc"), col("gs").as("gc")), "dc")
      .withColumn("i", size(array_intersect(col("gq"), col("gc"))))
      .withColumn("containment", col("i").cast("double") / col("nq").cast("double"))
      .filter(col("containment") >= C10 / 10.0)
      .select(col("dq"), col("dc"), round(col("containment"), 4).as("containment"))
      .orderBy("dq", "dc")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q109_prefix_jaccard_join" -> q109,
    "q110_edit_distance_join" -> q110,
    "q121_jaro_winkler_linkage" -> q121,
    "q139_entity_resolution" -> q139,
    "q166_containment_join" -> q166
  )

  val oracleSql: Map[String, String] = Map(
    // both directions of the symmetric intersection frame, each scored
    // by ITS OWN size — the naive replay of the asymmetric semantics
    "q166_containment_join" ->
      s"""${Dedup.shingleCte},
         |pairs AS (
         |  SELECT da AS dq, db AS dc, i, sa.n AS nq
         |  FROM inter JOIN sz sa ON sa.doc_id = da
         |  UNION ALL
         |  SELECT db AS dq, da AS dc, i, sb.n AS nq
         |  FROM inter JOIN sz sb ON sb.doc_id = db)
         |SELECT dq, dc, round(i * 1.0 / nq, 4) AS containment
         |FROM pairs
         |WHERE nq >= $MinContained AND i * 1.0 / nq >= 0.8
         |ORDER BY dq, dc""".stripMargin,
    // naive full-inverted-index replay (the q26 oracle shape) at t=0.7 —
    // prefix filtering is lossless, so the rows must match exactly
    "q109_prefix_jaccard_join" ->
      s"""${Dedup.shingleCte}
         |SELECT da, db, round(i * 1.0 / (sa.n + sb.n - i), 4) AS jac
         |FROM inter
         |JOIN sz sa ON sa.doc_id = da
         |JOIN sz sb ON sb.doc_id = db
         |WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.7
         |ORDER BY da, db""".stripMargin,
    // naive pairwise levenshtein; the |len| ≤ 1 filter is implied by
    // distance ≤ 1 (lossless), spelled to bound the quadratic replay
    "q110_edit_distance_join" ->
      """SELECT a.s_name AS name_a, b.s_name AS name_b,
        |       CAST(levenshtein(a.s_name, b.s_name) AS INT) AS dist
        |FROM supplier a JOIN supplier b
        |  ON a.s_name < b.s_name
        | AND abs(length(a.s_name) - length(b.s_name)) <= 1
        |WHERE levenshtein(a.s_name, b.s_name) <= 1
        |ORDER BY name_a, name_b""".stripMargin,
    // DuckDB's NATIVE jaro_winkler_similarity against the custom
    // codegen'd Spark expression — two independent implementations of
    // the textbook algorithm must agree bit-for-bit on every pair AND
    // on every threshold decision (the filter runs on the raw double)
    // transitive closure via a recursive CTE: reach(name, r) = every
    // node reachable from `name` over the (symmetrized) match edges;
    // min(r) per name is the canonical entity — an implementation of
    // connected components entirely independent of the Spark loop
    "q139_entity_resolution" ->
      s"""WITH RECURSIVE n AS (SELECT DISTINCT p_name FROM part),
         |e0 AS (
         |  SELECT a.p_name AS na, b.p_name AS nb
         |  FROM n a JOIN n b
         |    ON a.p_name < b.p_name
         |   AND 4 * least(length(a.p_name), length(b.p_name))
         |       >= greatest(length(a.p_name), length(b.p_name))
         |  WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= $JwT),
         |edges AS (SELECT na, nb FROM e0 UNION ALL SELECT nb AS na, na AS nb FROM e0),
         |reach(name, r) AS (
         |  SELECT p_name, p_name FROM n
         |  UNION
         |  SELECT e.na, rch.r FROM edges e JOIN reach rch ON rch.name = e.nb),
         |lbl AS (SELECT name, min(r) AS entity FROM reach GROUP BY name),
         |sz AS (SELECT entity, CAST(count(*) AS BIGINT) AS cluster_size
         |       FROM lbl GROUP BY entity)
         |SELECT lbl.name, lbl.entity, sz.cluster_size
         |FROM lbl JOIN sz USING (entity)
         |ORDER BY lbl.name""".stripMargin,
    "q121_jaro_winkler_linkage" ->
      s"""WITH n AS (SELECT DISTINCT p_name FROM part)
         |SELECT a.p_name AS name_a, b.p_name AS name_b,
         |       round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
         |FROM n a JOIN n b
         |  ON a.p_name < b.p_name
         | AND 4 * least(length(a.p_name), length(b.p_name))
         |     >= greatest(length(a.p_name), length(b.p_name))
         |WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= $JwT
         |ORDER BY name_a, name_b""".stripMargin
  )
}
