package graft

import graft.catalog.Bucketing
import graft.etl.{ConvertJob, FlowLogParser}
import graft.queries.{SaltedJoin, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Plan-shape regression tests: the physical plans that make these
  * operators scale are part of the contract, not an accident.
  */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def executedPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("ETL parse plan is narrow: no shuffle before the partitioned write") {
    val parsed = FlowLogParser.withPartitionKey(
      FlowLogParser.parse(ConvertJob.readRaw(spark, "/root/reference/samples/sample1.log")).good
    )
    val plan = executedPlan(parsed)
    assert(!plan.contains("Exchange"), s"unexpected shuffle in ETL plan:\n$plan")
  }

  test("q06 joins via BroadcastHashJoin (dimension stays broadcast)") {
    val plan = executedPlan(SparkEntry.queries("q06_join_broadcast")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q30/q37 rank filters push down as WindowGroupLimit (top-k at scale)") {
    assert(executedPlan(SparkEntry.queries("q30_knn_brute")(spark, sf))
      .contains("WindowGroupLimit"))
    assert(executedPlan(SparkEntry.queries("q37_asof_join")(spark, sf))
      .contains("WindowGroupLimit"))
    // q81's per-source weighted top-3 must take the same per-partition
    // heap path — a full per-source sort would pay corpus-sized ordering
    assert(executedPlan(SparkEntry.queries("q81_weighted_sample")(spark, sf))
      .contains("WindowGroupLimit"))
  }

  test("q131 listagg feeds from a WindowGroupLimit-pruned top-5, never a full per-group sort") {
    val plan = executedPlan(SparkEntry.queries("q131_listagg")(spark, sf))
    assert(plan.contains("WindowGroupLimit"), s"rank filter not pushed:\n$plan")
    assert(plan.contains("listagg"), s"listagg missing from plan:\n$plan")
  }

  test("q51 per-doc top-3 ranks under WindowGroupLimit") {
    val plan = executedPlan(SparkEntry.queries("q51_tfidf")(spark, sf))
    assert(plan.contains("WindowGroupLimit"), s"rank filter not pushed:\n$plan")
  }

  test("q52 corpus-sized cumsum window is shard-partitioned, not global") {
    val plan = executedPlan(SparkEntry.queries("q52_sequence_packing")(spark, sf))
    // the doc-level window (sums n_tokens) must carry the shard partition
    // key; only the shards-sized offsets window (sums shard_tokens)
    // may run single-partition
    val docWin = plan.linesIterator
      .filter(_.contains("Window "))
      .find(_.contains("sum(n_tokens"))
      .getOrElse(fail(s"no doc-level window in plan:\n$plan"))
    assert(docWin.contains("windowspecdefinition(shard#"), s"global window:\n$docWin")
  }

  test("q31 candidate dedup aggregates id pairs only — no embedding arrays") {
    // Round-3 regression: distinct() over (ids, pe, ne) shuffled two
    // 64-float arrays per candidate pair (3.1×). The dedup aggregate must
    // key on the bare id pair; embeddings re-attach by join afterwards.
    val plan = executedPlan(SparkEntry.queries("q31_knn_lsh")(spark, sf))
    val dedupAggs = plan.linesIterator
      .filter(l => l.contains("HashAggregate(keys=[") && l.contains("probe_id"))
      .toSeq
    assert(dedupAggs.nonEmpty, s"no dedup aggregate found in q31 plan:\n$plan")
    val embKey = "\\b(pe|ne)#\\d+".r
    dedupAggs.foreach { l =>
      val keys = l.substring(l.indexOf("keys=["), l.indexOf("]", l.indexOf("keys=[")) + 1)
      assert(
        embKey.findFirstIn(keys).isEmpty,
        s"dedup aggregate keys carry embedding arrays: $keys"
      )
    }
  }

  test("q58 de-hinted gram join stays an equi join, never a nested loop") {
    // The broadcast hint was removed (eval-gram set is unbounded at
    // corpus scale); the join must still plan as hash/merge on the gram
    // key — a nested-loop degeneration here would be all-pairs at 100 TB.
    val plan = executedPlan(SparkEntry.queries("q58_decontaminate")(spark, sf))
    assert(!plan.contains("NestedLoop"), s"gram join degenerated:\n$plan")
    assert(
      plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"),
      s"no equi join in q58 plan:\n$plan"
    )
  }

  test("q27 de-hinted candidate joins stay equi joins, never a nested loop") {
    // Round-5 policy: zero assumption-bounded broadcast hints. q27's
    // candidate-pair frame is bounded by the band-collision rate — an
    // assumption a dup-heavy corpus (Σ cluster² growth) can break — so
    // the verify join and the semi prefilter are unhinted. AQE may still
    // broadcast at test scale; what must never happen is a nested-loop
    // degeneration (all-pairs at 100 TB). The semi prefilter must
    // survive as a LeftSemi (that is what keeps verify O(candidates),
    // not a corpus-wide (db, g) shuffle).
    val plan = executedPlan(SparkEntry.queries("q27_dedup_minhash_lsh")(spark, sf))
    assert(!plan.contains("NestedLoop"), s"candidate join degenerated:\n$plan")
    assert(plan.contains("LeftSemi"), s"semi prefilter missing from q27 plan:\n$plan")
    assert(
      plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"),
      s"no equi join in q27 plan:\n$plan"
    )
  }

  test("q34b vocab top-k uses TakeOrderedAndProject (no full sort)") {
    val plan = executedPlan(SparkEntry.queries("q34b_vocab_topk")(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), s"full sort for top-k:\n$plan")
  }

  test("q49c EXISTS/NOT EXISTS decorrelate to semi + anti hash joins") {
    val plan = executedPlan(SparkEntry.queries("q49c_exists")(spark, sf))
    assert(plan.contains("LeftSemi"), s"EXISTS not decorrelated to semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"NOT EXISTS not decorrelated to anti join:\n$plan")
  }

  test("q49 null-safe equality plans as an equi hash join, not a nested loop") {
    val plan = executedPlan(SparkEntry.queries("q49_join_null_safe")(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"null-safe join degenerated:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"))
  }

  test("q01 ACCEPT filter is pushed into the flowlogs parquet scan") {
    val plan = executedPlan(SparkEntry.queries("q01_flow_filter_sort")(spark, sf))
    assert(
      plan.contains("EqualTo(action,ACCEPT)"),
      s"filter not pushed to scan:\n$plan"
    )
  }

  test("q44 CIDR enrichment joins via broadcast (no shuffle of the flow side before agg)") {
    val plan = executedPlan(SparkEntry.queries("q44_ip_enrich")(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin"), s"no broadcast range join:\n$plan")
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q43 hash split is a pure projection: no hash-partitioning exchange") {
    val plan = executedPlan(SparkEntry.queries("q43_hash_split")(spark, sf))
    assert(
      !plan.contains("Exchange hashpartitioning"),
      s"hash split should not shuffle:\n$plan"
    )
  }

  test("q29 custom cosine expression is pushed into the join condition") {
    val plan = executedPlan(
      SparkEntry.queries("q29_dedup_embedding_cosine")(spark, sf)
    )
    val joinLine = plan.linesIterator
      .find(l => l.contains("BroadcastNestedLoopJoin"))
      .getOrElse(fail("no BNLJ in q29 plan"))
    assert(joinLine.contains("float_vector_cosine"))
  }

  test("filters and projection reach the parquet scan (pushdown)") {
    val df = Tables
      .table(spark, sf, "lineitem")
      .filter(col("l_quantity") > 40)
      .select("l_orderkey", "l_quantity")
    val plan = executedPlan(df)
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)]"))
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"))
  }

  test("bucketed join on the bucket key is shuffle-free") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Bucketing.writeBucketed(
        Tables.table(spark, sf, "orders"),
        "graft_orders_bkt",
        "o_custkey",
        8
      )
      Bucketing.writeBucketed(
        Tables.table(spark, sf, "customer")
          .withColumnRenamed("c_custkey", "o_custkey"),
        "graft_customer_bkt",
        "o_custkey",
        8
      )
      val joined = spark
        .table("graft_orders_bkt")
        .join(spark.table("graft_customer_bkt"), "o_custkey")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"))
      assert(!Bucketing.hasShuffleExchange(joined),
        "bucketed join still shuffles")
      // and the unbucketed twin DOES shuffle (the test would be vacuous otherwise)
      val plain = Tables.table(spark, sf, "orders")
        .join(
          Tables.table(spark, sf, "customer")
            .withColumnRenamed("c_custkey", "o_custkey"),
          "o_custkey"
        )
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"))
      assert(Bucketing.hasShuffleExchange(plain))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_orders_bkt")
      spark.sql("DROP TABLE IF EXISTS graft_customer_bkt")
    }
  }

  test("q100 gated bucketed SMB join: zero hash exchanges end-to-end") {
    // the driver-gated query itself (not just the utility above): both
    // sides are pre-bucketed on the join key, the MERGE hint pins the
    // 100 TB join strategy, and the groupBy on the bucket key rides the
    // join's output partitioning — scan → sort → SMB join → agg with NO
    // hash-partitioning Exchange; the only Exchange allowed is the
    // range partition for the deterministic output ORDER BY
    val df = SparkEntry.queries("q100_bucketed_smb_join")(spark, sf)
    val plan = executedPlan(df)
    assert(plan.contains("SortMergeJoin"), s"not a sort-merge join:\n$plan")
    assert(
      !plan.contains("Exchange hashpartitioning"),
      s"bucketed gate still hash-shuffles:\n$plan"
    )
  }

  test("q33b corpus join is an equi join; only the 1-row totals frame nested-loops") {
    val plan = executedPlan(SparkEntry.queries("q33b_length_filter")(spark, sf))
    // the documents⋈per-length-cum join must be hash/merge on n_chars,
    // never a nested loop over the corpus (AQE's toString repeats the
    // plan under "== Initial Plan ==" — count the final section only)
    val finalPlan = plan.split("== Initial Plan ==").head
    val nlj = finalPlan.linesIterator.filter(_.contains("NestedLoopJoin")).toSeq
    assert(nlj.size <= 1, s"unexpected nested loops:\n$plan") // the 1-row count crossJoin only
    assert(
      plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"),
      s"n_chars join is not an equi join:\n$plan"
    )
  }

  test("q56b weights join is an equi join and the resample is a Generate, not a shuffle") {
    val plan = executedPlan(SparkEntry.queries("q56b_apply_mix")(spark, sf))
    assert(
      plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"),
      s"source join is not an equi join:\n$plan"
    )
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.contains("Generate"), s"explode(sequence) missing:\n$plan")
    // the expanded rows reach the output without an extra hash exchange:
    // everything above the Generate (downstream of it in dataflow) may
    // only contain the oracle-determinism ORDER BY's rangepartitioning
    val aboveGenerate = finalPlan.substring(0, finalPlan.indexOf("Generate"))
    assert(
      !aboveGenerate.contains("Exchange hashpartitioning"),
      s"expanded rows re-shuffled after the Generate:\n$plan"
    )
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // At 100 TB this is the difference between scanning the full fact
    // table and scanning ~selectivity of it: a bloom filter built from
    // the filtered dimension side is pushed into the fact scan at
    // runtime. Thresholds are lowered to make the tiny test data
    // eligible; the rewrite itself is what we pin.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    )
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val joined = Tables
        .table(spark, sf, "lineitem")
        .join(
          Tables
            .table(spark, sf, "orders")
            .filter(col("o_orderpriority") === "1-URGENT")
            .select(col("o_orderkey").as("l_orderkey")),
          "l_orderkey"
        )
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n"))
      val plan = executedPlan(joined)
      assert(
        plan.contains("might_contain"),
        s"no runtime bloom filter on the fact scan:\n$plan"
      )
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("salted join returns exactly the plain join result") {
    val orders = Tables.table(spark, sf, "orders")
    val customer = Tables
      .table(spark, sf, "customer")
      .withColumnRenamed("c_custkey", "o_custkey")
    def summarize(df: DataFrame) =
      df.groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("s"))
        .orderBy("o_custkey")
        .collect()
        .toSeq
    val plain = summarize(orders.join(customer, Seq("o_custkey")))
    val salted = summarize(SaltedJoin.inner(orders, customer, "o_custkey", 7))
    assert(plain == salted)
  }

  test("q31c PQ scan: one codes-vs-LUT broadcast cross, equi re-rank, map-side top-R") {
    val plan = executedPlan(SparkEntry.queries("q31c_knn_pq")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    // exactly one nested-loop join — the ADC scan of (id, 8 codes) rows
    // against the broadcast probe LUTs; full vectors re-attach via
    // BroadcastHashJoin equi joins only
    val nlj = finalPlan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(nlj == 1, s"expected exactly 1 code-scan cross join, got $nlj:\n$plan")
    assert(finalPlan.contains("BroadcastHashJoin"), s"re-rank not equi:\n$plan")
    // the top-R selection must run as a partial WindowGroupLimit BEFORE
    // the shuffle — per-partition state bounded at R, map-side
    assert(
      finalPlan.contains("row_number(), " + graft.llm.Similarity.PqRerank + ", Partial"),
      s"no map-side partial top-R:\n$plan"
    )
  }

  test("q21b lateral top-k decorrelates to WindowGroupLimit + equi join") {
    val plan = executedPlan(SparkEntry.queries("q21b_lateral_topk")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    // the correlated LIMIT must become a per-group window limit (state
    // bounded at k), never a per-outer-row re-execution or nested loop
    assert(finalPlan.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$plan")
    assert(
      !finalPlan.contains("NestedLoopJoin") && !finalPlan.contains("CartesianProduct"),
      s"lateral join degenerated to a nested loop:\n$plan"
    )
  }

  test("q59 gap-fill grid is a distributed Generate and an equi left join") {
    val plan = executedPlan(SparkEntry.queries("q59_resample_gapfill")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    // the hourly grid comes from explode(sequence) on executors — a
    // Generate node — never a driver-side loop or a nested-loop join
    assert(finalPlan.contains("Generate"), s"grid explode missing:\n$plan")
    assert(
      !finalPlan.contains("NestedLoopJoin") && !finalPlan.contains("CartesianProduct"),
      s"gap-fill join degenerated to a non-equi join:\n$plan"
    )
  }

  test("q73b fingerprint map runs once (ReusedExchange) and never inside a Filter") {
    val plan = executedPlan(SparkEntry.queries("q73b_fingerprint_dedup")(spark, sf))
    // the round-8 312-second lesson, pinned:
    //  (a) plain explode's implicit size>0 pre-filter must never return —
    //      pushed down, it inlines the gram array INTO the winnow lambda
    //      (O(n_grams²) md5 per doc) on the unparallelized scan
    assert(
      !plan.split("\n").exists(l => l.contains("Filter") && l.contains("md5")),
      s"md5 fingerprinting leaked into a Filter (quadratic pushdown):\n$plan"
    )
    //  (b) the canonical hash-by-f exchange must be REUSED by the dfc /
    //      keep / sizes / pair consumers — without it the md5 pipeline
    //      re-executes once per reference
    assert(
      plan.contains("ReusedExchange"),
      s"posts exchange not reused — fingerprint map duplicated:\n$plan"
    )
  }

  test("q61 keep-first is an aggregate + equi join — no window, no nested loop") {
    val plan = executedPlan(SparkEntry.queries("q61_paragraph_dedup")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    // the design claim: first-occurrence selection must be the
    // min(struct) HASH AGGREGATE (map-side partial, AQE-splittable
    // probe), never a PARTITION BY digest window that lands a
    // mega-duplicated paragraph whole on one task
    assert(
      !finalPlan.contains("WindowExec") && !finalPlan.contains("Window "),
      s"q61 regressed to a window-based keep-first:\n$plan"
    )
    assert(
      !finalPlan.contains("NestedLoopJoin") && !finalPlan.contains("CartesianProduct"),
      s"q61 digest join degenerated:\n$plan"
    )
    assert(finalPlan.contains("Generate"), s"chunk explode missing:\n$plan")
  }

  test("q62 cross-split candidate + verify joins stay equi joins") {
    val plan = executedPlan(SparkEntry.queries("q62_fuzzy_decontaminate")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(
      !finalPlan.contains("NestedLoopJoin") && !finalPlan.contains("CartesianProduct"),
      s"q62 degenerated to a non-equi join:\n$plan"
    )
  }

  test("q65 chunking is map-side only: no shuffle before the output sort") {
    val plan = executedPlan(SparkEntry.queries("q65_chunking")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    // the operator itself is scan → split → explode → slice; the ONLY
    // exchange allowed is the gate-presentation range sort
    assert(!finalPlan.contains("hashpartitioning"), s"q65 shuffles:\n$plan")
    assert(
      !finalPlan.contains("HashAggregate") && !finalPlan.contains("Join"),
      s"q65 grew non-map operators:\n$plan"
    )
    assert(finalPlan.contains("Generate"), s"chunk explode missing:\n$plan")
  }

  test("q67 top-100 rank filter pushes down as WindowGroupLimit") {
    val plan = executedPlan(SparkEntry.queries("q67_corpus_stats")(spark, sf))
    assert(plan.contains("WindowGroupLimit"), s"rank filter not pushed:\n$plan")
  }

  test("q68 per-type median/MAD frames broadcast onto the fact") {
    val plan = executedPlan(SparkEntry.queries("q68_outlier_mad")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(
      !finalPlan.contains("SortMergeJoin"),
      s"q68 shuffled the fact to join a per-type frame:\n$plan"
    )
  }

  test("q89 sessionize: both windows and the aggregate share the user partitioning, no join") {
    val plan = executedPlan(SparkEntry.queries("q89_sessionize")(spark, sf))
    // every window frame is user-partitioned (the islands construction
    // never sorts the corpus globally) and the whole query is
    // window+aggregate — no join of any kind
    plan.linesIterator.filter(_.contains("windowspecdefinition")).foreach { l =>
      assert(l.contains("user_id#"), s"non-user-partitioned window:\n$l")
    }
    assert(!plan.contains("Join"), s"q89 grew a join:\n$plan")
  }

  test("q90 BM25: top-20 via TakeOrderedAndProject; only the 1-row stats frame nested-loops") {
    val plan = executedPlan(SparkEntry.queries("q90_bm25")(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), s"full sort for top-20:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in BM25 plan:\n$plan")
  }

  test("q91 preference pairs: one aggregate, no window, no join") {
    val plan = executedPlan(SparkEntry.queries("q91_preference_pairs")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(!finalPlan.contains("Window"), s"per-stratum window crept in:\n$plan")
    assert(!finalPlan.contains("Join"), s"q91 grew a join:\n$plan")
  }

  test("q80 triangle count: edge-iterator intersect, no cartesian, no wedge frame") {
    val plan = executedPlan(SparkEntry.queries("q80_triangle_count")(spark, sf))
    assert(plan.contains("array_intersect"), s"edge-iterator intersect missing:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in triangle plan:\n$plan")
  }

  test("q84c point-in-time lookup joins EQUI on the key, never a nested loop") {
    val plan = executedPlan(SparkEntry.queries("q84c_pit_lookup")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    // the interval condition must ride as a join filter on a hash/merge
    // equi join — a BroadcastNestedLoopJoin here means Catalyst lost the
    // k equality and every fact scans every version
    assert(
      !finalPlan.contains("BroadcastNestedLoopJoin") && !finalPlan.contains("CartesianProduct"),
      s"q84c degenerated to a non-equi join:\n$plan"
    )
    assert(
      finalPlan.contains("BroadcastHashJoin") || finalPlan.contains("SortMergeJoin") ||
        finalPlan.contains("ShuffledHashJoin"),
      s"no equi join in q84c plan:\n$plan"
    )
  }

  test("q98 skew report: top-5 rank pushes down as WindowGroupLimit") {
    val plan = executedPlan(SparkEntry.queries("q98_skew_report")(spark, sf))
    assert(plan.contains("WindowGroupLimit"), s"rank filter not pushed:\n$plan")
  }

  test("q92 RRF: both lists top-k via TakeOrderedAndProject, no cartesian") {
    val plan = executedPlan(SparkEntry.queries("q92_rrf_fusion")(spark, sf))
    // three TakeOrderedAndProject: one per ranker list + the fused top-20
    val topk = plan.linesIterator.count(_.contains("TakeOrderedAndProject"))
    assert(topk >= 3, s"expected >= 3 TakeOrderedAndProject, got $topk:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in RRF plan:\n$plan")
  }

  test("q93 hard negatives: anchors broadcast, no sort-merge join, no window") {
    val plan = executedPlan(SparkEntry.queries("q93_hard_negatives")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.contains("BroadcastNestedLoopJoin"), s"anchor frame not broadcast:\n$plan")
    assert(!finalPlan.contains("SortMergeJoin"), s"corpus-shuffling join crept in:\n$plan")
    assert(!finalPlan.contains("Window"), s"candidate window crept in (max_by regressed):\n$plan")
  }

  test("q94 SFT assembly: map-only — no exchange except the output sort") {
    val plan = executedPlan(SparkEntry.queries("q94_sft_assembly")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    val exchanges = finalPlan.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("rangepartitioning")
    )
    assert(exchanges == 0, s"q94 grew a non-sort shuffle:\n$plan")
    assert(!finalPlan.contains("Join"), s"q94 grew a join:\n$plan")
  }

  test("q95 curriculum: corpus windows keyed by (bucket, subshard); offsets broadcast") {
    val plan = executedPlan(SparkEntry.queries("q95_curriculum_order")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    // the corpus-sized rank window must carry the compound partition key
    val rowNumberFrames = finalPlan.linesIterator.filter(l =>
      l.contains("row_number") && l.contains("windowspecdefinition")
    )
    rowNumberFrames.foreach { l =>
      assert(
        l.contains("bucket#") && l.contains("subshard#"),
        s"corpus rank window lost the compound shard key:\n$l"
      )
    }
    assert(finalPlan.contains("BroadcastHashJoin"), s"offset frame not broadcast:\n$plan")
    assert(!finalPlan.contains("SortMergeJoin"), s"corpus shuffled to meet offsets:\n$plan")
  }

  test("q160 pHash candidates come from equi-joins — never a nested-loop product") {
    val plan = executedPlan(SparkEntry.queries("q160_phash_neardup")(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"all-pairs scan leaked in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"all-pairs scan leaked in:\n$plan")
  }

  test("q153/q158 rank selection joins stats via broadcast, no corpus SMJ") {
    Seq("q153_weighted_quantiles", "q158_conformal_interval").foreach { q =>
      val plan = executedPlan(SparkEntry.queries(q)(spark, sf))
      assert(plan.contains("BroadcastHashJoin"), s"$q: stats frame not broadcast:\n$plan")
      assert(!plan.contains("SortMergeJoin"), s"$q: corpus shuffled to meet stats:\n$plan")
    }
  }

  test("q157 stats join stays broadcast; the corpus is never sorted") {
    val plan = executedPlan(SparkEntry.queries("q157_int8_quantization")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"64-row stats frame not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus-side SMJ:\n$plan")
  }

  test("q182 wedge stream closes through a broadcast probe — never a shuffle join") {
    // the r16 rework's contract: the Σ deg²/2 map-side wedge stream
    // flows through a BroadcastHashJoin of the pair-space-bounded edge
    // set into the per-center partial aggregate; a SortMergeJoin on the
    // (a, b) closing key would mean the wedge stream shuffled again
    // (the pre-r16 und⋈und spelling's 92M-row exchange at sf0.1)
    val plan = executedPlan(SparkEntry.queries("q182_clustering_coeff")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"edge set not broadcast:\n$plan")
    val closingSmj = plan.linesIterator
      .filter(_.contains("SortMergeJoin"))
      .filter(l => l.contains("a#") && l.contains("b#"))
    assert(closingSmj.isEmpty, s"wedge stream shuffled to close triangles:\n$plan")
  }

  test("q213 phrase adjacency joins postings — no corpus-wide nested loop") {
    val plan = executedPlan(SparkEntry.queries("q213_phrase_search")(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"all-pairs scan leaked in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"non-equi join leaked in:\n$plan")
  }

  test("q226 JSD source-pair join is word-keyed equi — never a cartesian") {
    // the q203 scale argument: per-word expansion ≤ C(#sources, 2);
    // only the catalog-bounded source comparison rides the equi join's
    // residual condition
    val plan = executedPlan(SparkEntry.queries("q226_js_divergence")(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"all-pairs product leaked in:\n$plan")
    assert(
      !plan.contains("BroadcastNestedLoopJoin"),
      s"pair join fell off the equi path:\n$plan"
    )
  }

  test("q227 eventually-follows pair join keys on user_id — never a product") {
    val plan =
      executedPlan(SparkEntry.queries("q227_sequential_patterns")(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"user pair walk went global:\n$plan")
  }

  test("q220 HITS half-steps join edges equi; only 1-row totals nested-loop") {
    // each renorm crossJoins a broadcast 1-row total (the q90 stats
    // convention); the edge⋈score joins themselves must stay hash equi
    // joins — a nested loop there would be |E|×|V| per half-step
    val plan = executedPlan(SparkEntry.queries("q220_hits")(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"cartesian in HITS plan:\n$plan")
    assert(
      plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"),
      s"no equi join in HITS plan:\n$plan"
    )
  }

}
