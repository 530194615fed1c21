package graft.llm

import graft.queries.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q54: per-label embedding centroids — the cluster-summary step behind
  * IVF coarse quantizers, semantic dedup buckets, and domain-mixing
  * diagnostics: elementwise mean vector per label.
  *
  * Shape at scale: posexplode multiplies rows ×dim, but partial
  * aggregation collapses them map-side — the shuffle carries only
  * (#labels × dim) partial (sum, count) states PER PARTITION, never the
  * exploded rows. Output one row per (label, dimension): assembling the
  * arrays back (collect_list over a sorted struct) adds nothing the
  * consumer can't do and would break the streaming-friendly row shape.
  */
object Embeddings {

  private def q54(s: SparkSession, dir: String): DataFrame =
    Tables
      .table(s, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("i0", "v")))
      .groupBy(col("label"), (col("i0") + 1).as("i"))
      .agg(
        // + 0.0 signed-zero grid: a tiny negative mean rounds to -0.0 in
        // DuckDB (sign-preserving round) but 0.0 in Spark — latent at
        // sf0.01, first real instance at sf0.1 (label 1, dim 182)
        (round(avg(col("v").cast("double")), 4) + lit(0d)).as("centroid"),
        count(lit(1)).as("n_vecs")
      )
      .orderBy("label", "i")

  // ------------------- q54b: random-projection dimensionality reduction

  private val InDim = 64
  private val OutDim = 16

  /** Deterministic Rademacher-style sign for matrix cell (i, k): a fixed
    * integer mix both engines compute exactly (stub-grade hashing — a
    * production deployment would use a seeded Gaussian matrix; the
    * OPERATOR SHAPE is identical). 0-based i and k.
    */
  private def sign(i: Int, k: Int): Double = {
    val h = ((i.toLong * 73L + k.toLong * 151L) * 2654435761L) % 97L
    if (h % 2 == 0) 1.0 else -1.0
  }

  /** q54b: project 64-dim embeddings to 16 dims with a fixed ±1 sign
    * matrix (the Johnson–Lindenstrauss shape behind cheap ANN
    * pre-filters and clustering at scale: 4× fewer bytes per vector,
    * distances preserved in expectation — EmbeddingsSpec pins the
    * E[‖Px‖²] = OutDim·‖x‖² energy ratio on this corpus). The matrix
    * is plan-time literals per output dim, the fold is the same
    * left-to-right double accumulation as the DuckDB oracle's
    * list_sum, so the projection is value-exact across engines. Output
    * is one row per (vec_id, k) — the same streaming-friendly shape as
    * q54's centroids.
    */
  private def q54b(s: SparkSession, dir: String): DataFrame = {
    val projCols: Seq[org.apache.spark.sql.Column] =
      (0 until OutDim).map { k =>
        val signs = array((0 until InDim).map(i => lit(sign(i, k))): _*)
        aggregate(
          zip_with(col("embedding"), signs, (x, sg) => x.cast("double") * sg),
          lit(0.0),
          (a, x) => a + x
        )
      }
    Tables
      .table(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(array(projCols: _*)).as(Seq("k0", "v")))
      .select(
        col("vec_id"),
        (col("k0") + 1).as("k"),
        round(col("v"), 4).as("proj")
      )
      .orderBy("vec_id", "k")
  }

  /** q157: per-dimension int8 affine quantization audit — the
    * store-embeddings-4×-smaller decision (a 100 TB embedding store is
    * mostly float32 bytes; int8 with per-dim scale/zero-point is the
    * standard first compression, and this report says what it costs in
    * reconstruction error BEFORE committing the store). Everything is
    * EXACT integer arithmetic on a micro grid: values snap by
    * floor(v·10⁶) (floor, not round — floor of an exact double product
    * is identical cross-engine, the q156 boundary lesson applied ahead
    * of time), the quantized code is nearest-integer by integer
    * cross-multiplication ((2·255·(v−mn) + range) div (2·range)), and
    * the summed squared error is an exact BIGINT — the only floats are
    * the final per-dim RMSE (one sqrt + one division from exact ints,
    * gridded). Constant dims quantize to code 0 with zero error.
    *
    * Scale shape: two corpus-exploded passes, both collapsed map-side
    * (per-dim min/max, then per-dim SSE after a 64-row broadcast join);
    * the shuffle carries #dims-sized partials only. SSE fits BIGINT to
    * ~10¹⁰ rows×dims; the q146 DECIMAL(38) swap-in is the documented
    * path beyond.
    */
  private def q157(s: SparkSession, dir: String): DataFrame = {
    val x = Tables
      .table(s, dir, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("i0", "v")))
      .select(
        (col("i0") + 1).cast("long").as("i"),
        floor(col("v").cast("double") * lit(1000000.0)).cast("long").as("vi")
      )
    val st = x
      .groupBy("i")
      .agg(min("vi").as("mn"), max("vi").as("mx"), count(lit(1)).as("n"))
    x.join(broadcast(st), "i")
      .withColumn(
        "q8",
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(expr("(2 * 255 * (vi - mn) + (mx - mn)) div (2 * (mx - mn))"))
      )
      .withColumn("en", expr("255 * (vi - mn) - q8 * (mx - mn)"))
      .groupBy("i", "mn", "mx", "n")
      .agg(sum(col("en") * col("en")).as("sse"))
      .select(
        col("i"),
        col("n").as("n_vecs"),
        col("mn").as("mn_micro"),
        col("mx").as("mx_micro"),
        col("sse").as("sse_num"),
        (round(
          sqrt(col("sse").cast("double") / col("n").cast("double")) / 255.0,
          4
        ) + 0.0).as("rmse_micro")
      )
      .orderBy("i")
  }

  /** Matryoshka truncation widths audited by q165 (powers of two up to
    * half the stored dimension — the standard MRL ladder).
    */
  private val MrlDims = Seq(8, 16, 32)

  /** q165: Matryoshka truncation-quality audit — the
    * store-a-prefix-and-serve-cheaper decision for an embedding store
    * (Matryoshka-style models pack information front-loaded, so
    * serving the first m dims cuts memory/ANN cost m/64×; this report
    * says what each width costs in angular fidelity BEFORE committing
    * the serving tier). The cosine between a vector and its
    * zero-padded m-prefix collapses algebraically to
    * √(Σ_{i≤m} vᵢ² / Σ vᵢ²) — the retained-energy ratio — so the audit
    * needs no second vector materialized: per (vector, m) one slice
    * fold over the stored array.
    *
    * Determinism: both energy sums are LEFT-TO-RIGHT double folds over
    * the same element order (Spark `aggregate`, DuckDB `list_sum` —
    * the q54b-established parity), the ratio/sqrt are single IEEE ops
    * of identical operands, and the per-vector cosine snaps to a
    * micro grid (floor ×10⁶ — the q157 floor lesson) BEFORE any
    * corpus-level aggregation, so every corpus statistic is exact
    * BIGINT arithmetic: avg = one division of exact sums, min is
    * grid-exact, and the ≥0.90-fraction counts grid integers.
    *
    * Scale shape: one corpus scan, ×|MrlDims| map-side explode, one
    * hash aggregate keyed by m (3 groups) with map-side partials —
    * shuffle carries 3 rows per partition. No joins, no windows.
    */
  private def q165(s: SparkSession, dir: String): DataFrame =
    Tables
      .table(s, dir, "embeddings")
      .select(
        col("embedding"),
        expr(
          "aggregate(embedding, CAST(0.0 AS DOUBLE), " +
            "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
        ).as("te")
      )
      .filter(col("te") > 0.0)
      .select(
        explode(
          array(MrlDims.map(m => lit(m)): _*)
        ).as("m"),
        col("embedding"),
        col("te")
      )
      .select(
        col("m"),
        floor(
          sqrt(
            expr(
              "aggregate(slice(embedding, 1, m), CAST(0.0 AS DOUBLE), " +
                "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
            ) / col("te")
          ) * 1000000.0
        ).cast("long").as("cos_micro")
      )
      .groupBy("m")
      .agg(
        count(lit(1)).as("n_vecs"),
        (round(
          sum(col("cos_micro")).cast("double") /
            count(lit(1)).cast("double") / 1000000.0,
          4
        ) + 0.0).as("avg_cos"),
        (round(min(col("cos_micro")).cast("double") / 1000000.0, 4) + 0.0)
          .as("min_cos"),
        (round(
          sum(when(col("cos_micro") >= 900000L, 1L).otherwise(0L))
            .cast("double") / count(lit(1)).cast("double"),
          4
        ) + 0.0).as("frac_ge_090")
      )
      .orderBy("m")

  /** q170: embedding covariance matrix (upper triangle) — the one-pass
    * input every PCA / ZCA-whitening / anisotropy diagnostic needs
    * (embedding stores are routinely whitened before cosine retrieval;
    * the covariance eigenspectrum is the standard "is this embedding
    * space collapsed?" check — the numeric eigensolve happens driver-
    * side on the 64×64 output, the DISTRIBUTED work is exactly this
    * matrix). cov(i,j) = (n·Σvᵢvⱼ − Σvᵢ·Σvⱼ)/n².
    *
    * Determinism (q157/q120 combined): components snap to the micro
    * grid (floor ×10⁶) per element, pair products are exact BIGINTs
    * summed as DECIMAL(38), per-dim sums ride the diagonal of the same
    * frame (no second pass), and each output is a fixed IEEE dag on
    * two exact-moment scalars.
    *
    * Scale shape: ONE corpus scan, per row a map-side explode of the
    * d(d+1)/2 = 2080 upper-triangle pair products, hash-aggregated
    * into 2080 groups with map-side partials — the shuffle carries
    * 2080 rows per partition regardless of corpus size. No joins
    * except the final broadcast of the 64-row mean frame.
    */
  private def q170(s: SparkSession, dir: String): DataFrame =
    covarianceFrame(s, dir)

  /** The q170 covariance frame (i, j, n_vecs, cov) — upper triangle,
    * cov on the round-8 grid — shared verbatim by q197's power
    * iteration so the eigensolve can never drift from the gated
    * matrix.
    *
    * WarmRegistry adjudication (r15 verdict ask #7): NOT registered as
    * a warm family at two consumers. The registry's families are
    * train-once/consume-MANY models whose build would otherwise be
    * re-priced into several gates per sweep; here q170 IS the build
    * (the gate prices exactly one corpus pass, which is its entire
    * semantics — warming it would delete the gate's cost from the
    * record, the discovery-gate rule), and q197 is the single other
    * consumer, paying the same pass once. A third consumer (e.g. a
    * whitening transform gate) tips the balance: register then, with
    * q170 as the discovery gate and `cov_warm_sec` as the field.
    */
  private def covarianceFrame(s: SparkSession, dir: String): DataFrame = {
    // (vi[i], vi[j]) for i ≤ j via TWO Generate stages (posexplode the
    // anchor dim, then posexplode the tail slice starting AT the
    // diagonal): the single-stage nested-struct flatten materialized a
    // d(d+1)/2 = 2080-struct array per input row before exploding it —
    // the exact pattern q181's wedge generation measured 11.3 s vs
    // 0.98 s against (the q159 materialize-in-chunks lesson). Same
    // (i, j, p, a) stream, row for row: i = i0+1, j = i0+j0+1 (1-based),
    // diagonal included because the slice starts at the anchor itself.
    val pairs = Tables
      .table(s, dir, "embeddings")
      .select(
        expr(
          "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))"
        ).as("vi")
      )
      .select(col("vi"), posexplode(col("vi")).as(Seq("i0", "xi")))
      .select(
        col("i0"),
        col("xi"),
        posexplode(expr("slice(vi, i0 + 1, size(vi) - i0)")).as(Seq("j0", "xj"))
      )
      .select(
        (col("i0") + 1).as("i"),
        (col("i0") + col("j0") + 1).as("j"),
        (col("xi") * col("xj")).as("p"),
        col("xi").as("a")
      )
    val moments = pairs
      .groupBy("i", "j")
      .agg(
        count(lit(1)).as("n"),
        sum(col("p").cast("decimal(38,0)")).as("sp"),
        // per-dim sums ride the diagonal rows (i == j): a is vᵢ there
        sum(col("a").cast("decimal(38,0)")).as("sa")
      )
    val dimSums = moments
      .filter(col("i") === col("j"))
      .select(col("i").as("d"), col("sa").as("sd"))
    moments
      .join(broadcast(dimSums.select(col("d").as("i"), col("sd").as("si"))), "i")
      .join(broadcast(dimSums.select(col("d").as("j"), col("sd").as("sj"))), "j")
      .select(
        col("i"),
        col("j"),
        col("n").as("n_vecs"),
        // (n·Σpq − Σp·Σq) exact in DECIMAL(38), then one cast + the
        // fixed double dag; ×10⁻¹² de-grids the micro² products
        (round(
          (col("n").cast("decimal(38,0)") * col("sp") - col("si") * col("sj"))
            .cast("double") /
            (col("n") * col("n")).cast("double") / 1.0e12,
          8
        ) + 0.0).as("cov")
      )
      .orderBy("i", "j")
  }

  // --------------- q197: top principal component via power iteration

  /** q197: the top principal component of the embedding store — the
    * anisotropy diagnostic an embedding pipeline reads before ANN
    * tuning or whitening (a dominant direction owning a large share of
    * variance means cosine scores are inflated by a common bias
    * vector; the LOADING says which dims carry it): SIX synchronous
    * power-iteration rounds over q170's EXACT covariance frame (shared
    * builder — the eigensolve can never drift from the gated matrix),
    * started from the exact uniform unit vector (1/8 per dim at d=64).
    *
    * Spark-first point: the "driver-side 64×64 eigensolve" q170's
    * scaladoc defers to is here expressed IN THE PLAN — matrix-vector
    * products are joins over the symmetrized 4096-row frame, so the
    * same spelling runs at any dimensionality where the matrix is
    * frame-sized (d ≤ ~10⁴) without collecting anything.
    *
    * Determinism: per-round contributions cov·v floor-snapped to the
    * 1e-12 grid and summed as EXACT BIGINTs (the q192 convention);
    * norms from snapped squares; v re-gridded round(·,12) per round;
    * trace and Rayleigh quotient from snapped terms — every round is
    * engine-exact, and the fixed positive start pins the sign.
    */
  private def q197(s: SparkSession, dir: String): DataFrame = {
    val cov = covarianceFrame(s, dir).select(col("i"), col("j"), col("cov"))
    // CACHED (tracked, released per bench iteration): every power-
    // iteration round references the matrix, and each round's v embeds
    // its u TWICE (the product and its norm) — uncached, the lineage
    // doubles per round and the corpus-sized covariance scan re-ran
    // ~2⁶ times (measured 136.7 s at sf0.1 vs ~3 s with the matrix
    // cached and each round's tiny vector frame pinned)
    // partitioned by the OUTPUT dim i at cache time (guide §2.4): every
    // round's matrix-vector product ends in groupBy(i), and a cache
    // already hash-partitioned on i satisfies that aggregate's
    // distribution — each of the 6 rounds (plus the Rayleigh product)
    // runs as ONE shuffle-free stage over the cached frame instead of
    // paying an Exchange of the matrix per round (measured 5.7 s →
    // 2.6 s at sf0.1). Scale-adaptive: repartition uses
    // spark.sql.shuffle.partitions, so the d²-row frame spreads at any d.
    val sym = graft.llm.Dedup.tcache(
      s,
      cov.union(
        cov
          .filter(col("i") =!= col("j"))
          .select(col("j").as("i"), col("i").as("j"), col("cov"))
      ).repartition(col("i"))
    )
    // Iteration protocol (the q70 literal-centroids convention — a
    // BOUNDED model pull, d rows per round): the DISTRIBUTED work of a
    // round is the matrix-vector product over the cached frame; the
    // d-row result is collected and normalized DRIVER-SIDE with the
    // identical grid arithmetic (exact BIGINT square sums, one sqrt,
    // the shared floor(x·1e12+0.5)/1e12 re-grid spelled the same way
    // in the oracle SQL), then re-enters as a LocalRelation. Two earlier
    // spellings are documented failures: the pure-expression loop
    // DOUBLED the logical tree per round (each round references its u
    // twice — product and norm) and drove analysis to a driver OOM
    // before any job ran; the in-plan-normalize variant spent ~1 s of
    // broadcast/crossJoin job overhead per round on 64-row frames.
    var vLit: Seq[(Int, Double)] =
      Seq.tabulate(InDim)(i => (i + 1, 0.125d)) // 1/√InDim = 1/√64 exactly
    import s.implicits._
    def vDf(xs: Seq[(Int, Double)]) = xs.toDF("d", "r")
    for (_ <- 1 to 6) {
      // broadcast the d-row vector explicitly: the LocalRelation has no
      // stats-backed estimate, and a fallback SMJ would re-shuffle the
      // i-partitioned cache the repartition above exists to protect
      val u = sym
        .join(broadcast(vDf(vLit)), sym("j") === col("d"))
        .withColumn("c12", expr("CAST(floor(cov * r * 1.0e12) AS BIGINT)"))
        .groupBy(col("i"))
        .agg((sum(col("c12")).cast("double") / 1.0e12).as("u"))
        .collect()
        .map(row => (row.getInt(0), row.getDouble(1)))
      val n2 = u.map { case (_, x) => math.floor(x * x * 1.0e12).toLong }.sum
      val nrm = math.sqrt(n2.toDouble / 1.0e12)
      // re-grid with the ONE spelling both engines share —
      // floor(x·1e12 + 0.5)/1e12 — instead of BigDecimal HALF_UP vs
      // DuckDB round(,12), which scale the same double differently in
      // binary and can disagree at the 12th digit on boundary values
      vLit = u.toSeq.sortBy(_._1).map { case (d, x) =>
        (d, if (nrm == 0.0) 0.0
            else math.floor(x / nrm * 1.0e12 + 0.5) / 1.0e12)
      }
    }
    val v = vDf(vLit)
    // Rayleigh quotient λ = vᵀAv and the variance share λ/trace(Σ)
    val av = sym
      .join(broadcast(v), sym("j") === v("d"))
      .withColumn("c12", expr("CAST(floor(cov * r * 1.0e12) AS BIGINT)"))
      .groupBy(col("i").as("d"))
      .agg((sum(col("c12")).cast("double") / 1.0e12).as("u"))
    val lambda = av
      .join(v, "d")
      .withColumn("l12", expr("CAST(floor(u * r * 1.0e12) AS BIGINT)"))
      .agg((sum(col("l12")).cast("double") / 1.0e12).as("lambda"))
    // diagonal rows appear exactly once in sym (only i≠j was flipped),
    // so the trace reads the CACHED matrix, never the covariance scan
    val trace = sym
      .filter(col("i") === col("j"))
      .withColumn("t8", expr("CAST(round(cov * 1.0e8, 0) AS BIGINT)"))
      .agg((sum(col("t8")).cast("double") / 1.0e8).as("trace"))
    v.crossJoin(broadcast(lambda))
      .crossJoin(broadcast(trace))
      .select(
        col("d").as("dim"),
        (round(col("r"), 8) + 0.0).as("loading"),
        (round(col("lambda"), 8) + 0.0).as("eigenvalue"),
        (round(col("lambda") / nullif(col("trace"), lit(0.0d)), 6) + 0.0)
          .as("variance_explained")
      )
      .orderBy("dim")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_embedding_centroids" -> q54,
    "q54b_random_projection" -> q54b,
    "q157_int8_quantization" -> q157,
    "q165_matryoshka_audit" -> q165,
    "q170_embedding_covariance" -> q170,
    "q197_pca_power" -> q197
  )

  /** One q197 power-iteration round as CTEs: matrix-vector product on
    * the 1e-12 grid, snapped-square norm, re-gridded unit vector.
    */
  private def q197IterSql(prev: String, k: Int): String =
    s"""u$k AS MATERIALIZED (
       |  SELECT sym.i AS d,
       |    CAST(sum(CAST(floor(sym.cov * r.r * 1.0e12) AS BIGINT)) AS DOUBLE)
       |      / 1.0e12 AS u
       |  FROM sym JOIN $prev r ON r.d = sym.j GROUP BY sym.i),
       |n$k AS (
       |  SELECT sqrt(CAST(sum(CAST(floor(u * u * 1.0e12) AS BIGINT)) AS DOUBLE)
       |              / 1.0e12) AS nrm
       |  FROM u$k),
       |v$k AS MATERIALIZED (
       |  SELECT d,
       |    floor(u / nullif((SELECT nrm FROM n$k), 0.0) * 1.0e12 + 0.5)
       |      / 1.0e12 AS r
       |  FROM u$k)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // q170's exact covariance CTEs + the same 1e-12-grid synchronous
    // power iterations, Rayleigh quotient, and snapped trace
    "q197_pca_power" -> {
      val iters = (1 to 6)
        .map(k => q197IterSql(if (k == 1) "v0" else s"v${k - 1}", k))
        .mkString(",\n")
      s"""WITH v AS (
         |  SELECT list_transform(embedding,
         |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS vi
         |  FROM embeddings),
         |pr AS (
         |  SELECT unnest(flatten(list_transform(generate_series(1, len(vi)),
         |    i -> list_transform(generate_series(i, len(vi)),
         |      j -> struct_pack(i := i, j := j,
         |                       p := vi[i] * vi[j], a := vi[i]))))) AS q
         |  FROM v),
         |mo AS (
         |  SELECT q.i AS i, q.j AS j, CAST(count(*) AS BIGINT) AS n,
         |    sum(CAST(q.p AS HUGEINT)) AS sp,
         |    sum(CAST(q.a AS HUGEINT)) AS sa
         |  FROM pr GROUP BY 1, 2),
         |ds AS (SELECT i AS d, sa AS sd FROM mo WHERE i = j),
         |cv AS MATERIALIZED (
         |  SELECT mo.i AS i, mo.j AS j,
         |    round(CAST(mo.n * mo.sp - dsi.sd * dsj.sd AS DOUBLE)
         |          / CAST(mo.n * mo.n AS DOUBLE) / 1.0e12, 8) + 0.0 AS cov
         |  FROM mo
         |  JOIN ds dsi ON dsi.d = mo.i
         |  JOIN ds dsj ON dsj.d = mo.j),
         |sym AS MATERIALIZED (
         |  SELECT i, j, cov FROM cv
         |  UNION ALL
         |  SELECT j AS i, i AS j, cov FROM cv WHERE i <> j),
         |v0 AS (SELECT DISTINCT i AS d, 0.125 AS r FROM sym),
         |$iters,
         |av AS (
         |  SELECT sym.i AS d,
         |    CAST(sum(CAST(floor(sym.cov * r.r * 1.0e12) AS BIGINT)) AS DOUBLE)
         |      / 1.0e12 AS u
         |  FROM sym JOIN v6 r ON r.d = sym.j GROUP BY sym.i),
         |lam AS (
         |  SELECT CAST(sum(CAST(floor(av.u * v6.r * 1.0e12) AS BIGINT)) AS DOUBLE)
         |    / 1.0e12 AS lambda
         |  FROM av JOIN v6 ON v6.d = av.d),
         |tr AS (
         |  SELECT CAST(sum(CAST(round(cov * 1.0e8, 0) AS BIGINT)) AS DOUBLE)
         |    / 1.0e8 AS trace
         |  FROM cv WHERE i = j)
         |SELECT v6.d AS dim,
         |  round(v6.r, 8) + 0.0 AS loading,
         |  round(lam.lambda, 8) + 0.0 AS eigenvalue,
         |  round(lam.lambda / nullif(tr.trace, 0.0), 6) + 0.0
         |    AS variance_explained
         |FROM v6 CROSS JOIN lam CROSS JOIN tr
         |ORDER BY dim""".stripMargin
    },
    // same micro-grid snap, same upper-triangle pair products in exact
    // HUGEINT moments, same (n·Σpq − Σp·Σq)/n² double dag
    "q170_embedding_covariance" ->
      """WITH v AS (
        |  SELECT list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS vi
        |  FROM embeddings),
        |pr AS (
        |  SELECT unnest(flatten(list_transform(generate_series(1, len(vi)),
        |    i -> list_transform(generate_series(i, len(vi)),
        |      j -> struct_pack(i := i, j := j,
        |                       p := vi[i] * vi[j], a := vi[i]))))) AS q
        |  FROM v),
        |mo AS (
        |  SELECT q.i AS i, q.j AS j, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(q.p AS HUGEINT)) AS sp,
        |    sum(CAST(q.a AS HUGEINT)) AS sa
        |  FROM pr GROUP BY 1, 2),
        |ds AS (SELECT i AS d, sa AS sd FROM mo WHERE i = j)
        |SELECT CAST(mo.i AS INT) AS i, CAST(mo.j AS INT) AS j,
        |  mo.n AS n_vecs,
        |  round(CAST(mo.n * mo.sp - dsi.sd * dsj.sd AS DOUBLE)
        |        / CAST(mo.n * mo.n AS DOUBLE) / 1.0e12, 8) + 0.0 AS cov
        |FROM mo
        |JOIN ds dsi ON dsi.d = mo.i
        |JOIN ds dsj ON dsj.d = mo.j
        |ORDER BY i, j""".stripMargin,
    // same left-to-right list_sum folds, same single-division ratio and
    // sqrt, same floor×10⁶ grid BEFORE aggregation — corpus stats are
    // exact integer arithmetic on both engines
    "q165_matryoshka_audit" ->
      s"""WITH te AS (
         |  SELECT embedding,
         |    list_sum(list_transform(embedding,
         |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS te
         |  FROM embeddings),
         |g AS (
         |  SELECT m,
         |    CAST(floor(sqrt(
         |      list_sum(list_transform(embedding[1:m],
         |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) / te
         |    ) * 1000000.0) AS BIGINT) AS cos_micro
         |  FROM te CROSS JOIN (
         |    SELECT unnest([${MrlDims.mkString(", ")}]) AS m)
         |  WHERE te > 0.0)
         |SELECT CAST(m AS INT) AS m, CAST(count(*) AS BIGINT) AS n_vecs,
         |  round(CAST(sum(cos_micro) AS DOUBLE)
         |        / CAST(count(*) AS DOUBLE) / 1000000.0, 4) + 0.0 AS avg_cos,
         |  round(CAST(min(cos_micro) AS DOUBLE) / 1000000.0, 4) + 0.0
         |    AS min_cos,
         |  round(CAST(sum(CASE WHEN cos_micro >= 900000 THEN 1 ELSE 0 END)
         |             AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) + 0.0
         |    AS frac_ge_090
         |FROM g GROUP BY m ORDER BY m""".stripMargin,
    // identical integer pipeline: floor-snap to the micro grid, integer
    // nearest-code division (// is floor division on positives, same as
    // Spark's div), exact BIGINT SSE, one sqrt+division at the end
    "q157_int8_quantization" ->
      """WITH x AS (
        |  SELECT p.i AS i,
        |    CAST(floor(CAST(p.v AS DOUBLE) * 1000000.0) AS BIGINT) AS vi
        |  FROM (SELECT unnest(list_transform(
        |          generate_series(1, len(embedding)),
        |          j -> struct_pack(i := j, v := embedding[j]))) AS p
        |        FROM embeddings)),
        |st AS (
        |  SELECT i, CAST(min(vi) AS BIGINT) AS mn, CAST(max(vi) AS BIGINT) AS mx,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM x GROUP BY 1),
        |e AS (
        |  SELECT x.i, st.mn, st.mx, st.n, x.vi,
        |    CASE WHEN st.mx = st.mn THEN 0
        |         ELSE (2 * 255 * (x.vi - st.mn) + (st.mx - st.mn))
        |              // (2 * (st.mx - st.mn)) END AS q8
        |  FROM x JOIN st USING (i)),
        |r AS (
        |  SELECT i, mn, mx, n,
        |    CAST(sum((255 * (vi - mn) - q8 * (mx - mn))
        |           * (255 * (vi - mn) - q8 * (mx - mn))) AS BIGINT) AS sse
        |  FROM e GROUP BY 1, 2, 3, 4)
        |SELECT i, n AS n_vecs, mn AS mn_micro, mx AS mx_micro, sse AS sse_num,
        |  round(sqrt(CAST(sse AS DOUBLE) / CAST(n AS DOUBLE)) / 255.0, 4) + 0.0
        |    AS rmse_micro
        |FROM r ORDER BY i""".stripMargin,
    // dimension count derives from each row's own list length (as the
    // Spark posexplode does) — no hard-coded dim that could silently
    // diverge if a testdata generation ever changes width
    "q54_embedding_centroids" ->
      """WITH e AS (
        |  SELECT label, embedding,
        |    unnest(generate_series(1, len(embedding))) AS i
        |  FROM embeddings)
        |SELECT label, i,
        |  round(avg(CAST(embedding[i] AS DOUBLE)), 4) + 0.0 AS centroid,
        |  count(*) AS n_vecs
        |FROM e GROUP BY label, i ORDER BY label, i""".stripMargin,
    // replays the sign formula with SQL's 1-based i mapped to the
    // Scala 0-based one; same left-to-right double fold
    "q54b_random_projection" ->
      s"""WITH p AS (
         |  SELECT vec_id, k,
         |    list_sum(list_transform(generate_series(1, $InDim), i ->
         |      CAST(embedding[i] AS DOUBLE) *
         |      (CASE WHEN ((((i - 1) * 73 + k * 151) * 2654435761) % 97) % 2 = 0
         |            THEN 1.0 ELSE -1.0 END))) AS v
         |  FROM embeddings CROSS JOIN generate_series(0, ${OutDim - 1}) g(k))
         |SELECT vec_id, CAST(k + 1 AS INT) AS k, round(v, 4) AS proj
         |FROM p ORDER BY vec_id, k""".stripMargin
  )
}
