package graft

import org.apache.spark.sql.SparkSession

/** The CLOSED set of train-once/consume-many session models the bench
  * materializes outside its timed regions (the r13/r14 warm
  * convention), enumerated as data so the convention is tamper-evident:
  *
  *   - every family names the DISCOVERY gates that still pay the full
  *     build cost inside their timed readings (a warm may never
  *     swallow a discovery gate's cost — that would delete the build
  *     from the record entirely);
  *   - every family names its CONSUMER gates (the ones whose timed
  *     readings are served by the warm model — the production
  *     train-once/consume-many shape);
  *   - every family names the artifact FIELD its one-time cost is
  *     reported under, so a bench artifact that omits a warm second is
  *     machine-detectably incomplete.
  *
  * `WarmRegistrySpec` pins all three properties against
  * `SparkEntry.queries` and the latest in-repo bench artifact; Bench
  * iterates this registry instead of hand-rolled warm blocks, so adding
  * a fifth family WITHOUT a discovery gate and a reported field fails
  * the audit rather than silently re-pricing a gate.
  */
object WarmRegistry {

  /** One warm family: a shared session model built once per
    * (session, sfDir) and consumed by several gates.
    */
  final case class WarmFamily(
      name: String,
      /** JSON field carrying the one-time build seconds in every
        * FULL-DETAIL bench artifact (the `bench_detail` JSONs — the
        * surface `WarmRegistrySpec` audits; the compact stdout line
        * carries only the etl/bw/rr headline fields).
        */
      field: String,
      /** Gates that pay the full model-build cost in their own timed
        * readings (never served by the warm). Empty ONLY for a
        * corpus-input family ([[corpusInput]]): a TRAINED model (BPE
        * merges, cluster labels) must keep a live gate pricing its
        * training, or the build cost vanishes from every timed reading.
        */
      discoveryGates: Seq[String],
      /** Gates whose timed readings consume the warm model. */
      consumerGates: Seq[String],
      /** True when the warm is a shared INPUT REPRESENTATION of the
        * corpus (the shingle frame), not a trained model: no gate
        * re-derives it, and its full cost is priced solely by the
        * always-reported artifact field. Any new family claiming this
        * flag shows up in the registry diff — the audit spec exempts
        * corpus-input families from the discovery-gate requirement but
        * still requires the reported field.
        */
      corpusInput: Boolean = false,
      /** Materialize the model for (session, sfDir); idempotent. */
      warm: (SparkSession, String) => Unit
  )

  val families: Seq[WarmFamily] = Seq(
    WarmFamily(
      name = "shingle corpus",
      field = "shingle_warm_sec",
      // corpus-input family: the shingle frame is the shared tokenized
      // REPRESENTATION of the corpus, not a trained model — no gate
      // re-derives it, its full materialization cost is priced solely
      // by the always-reported field; every consumer still pays its own
      // banding / signature / join cost per iteration
      // (releaseTrackedCaches drops those between timed readings).
      discoveryGates = Seq.empty,
      consumerGates = Seq(
        "q26_dedup_ngram_jaccard",
        "q27_dedup_minhash_lsh",
        "q50_dedup_clusters",
        "q58_decontaminate",
        "q62_fuzzy_decontaminate",
        "q109_prefix_jaccard_join",
        "q166_containment_join"
      ),
      corpusInput = true,
      warm = (s, dir) => graft.llm.Dedup.warmShingles(s, dir)
    ),
    WarmFamily(
      name = "co-occurrence edges",
      field = "edge_warm_sec",
      // q71 builds its own per-iteration tracked pair frame (released
      // between iterations) — it pays the full fact⋈dim aggregate cost
      // every timed reading, so the pair-count build stays priced in a
      // live gate even with the warm cache populated.
      discoveryGates = Seq("q71_pagerank"),
      consumerGates = Seq(
        "q80_triangle_count",
        "q80b_triangle_sample",
        "q106_recursive_reachability",
        "q148_weighted_sssp",
        "q181_adamic_adar",
        "q182_clustering_coeff"
      ),
      warm = (s, dir) => graft.queries.Graph.warmEdges(s, dir)
    ),
    WarmFamily(
      name = "BPE merge table",
      field = "bpe_warm_sec",
      discoveryGates = Seq("q135_bpe_train", "q135b_bpe_state_digest", "q135c_bpe_train_batched"),
      consumerGates = Seq("q137_bpe_encode", "q137b_bpe_encode_vocab", "q171_tokenizer_fertility"),
      warm = (s, dir) => graft.llm.BpeTrain.warmMerges(s, dir)
    ),
    WarmFamily(
      name = "near-dup cluster labels",
      field = "cluster_warm_sec",
      discoveryGates = Seq("q50_dedup_clusters"),
      consumerGates = Seq("q50b_dedup_keep_list", "q144_leakage_safe_split", "q176_dedup_report"),
      warm = (s, dir) => graft.llm.Clustering.warmClusters(s, dir)
    )
  )
}
