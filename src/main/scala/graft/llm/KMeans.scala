package graft.llm

import graft.queries.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q70: distributed k-means (Lloyd's algorithm) over the embedding
  * corpus — the clustering step a curation pipeline runs upstream of
  * SemDeDup cell-bucketing (q29b) and IVF coarse quantization (q31b),
  * both of which deterministically stubbed it with "first-k vectors".
  * Reference scope: the reference engine has no ML ops at all (its
  * query half delegates to Athena, which also has none) — this is part
  * of the training-data-pipeline extension surface.
  *
  * Determinism contract (what makes a full value-level DuckDB oracle
  * possible for an iterative ML op):
  *   - init = the first K corpus vectors (vec_id < K), the same policy
  *     the IVF/PQ quantizers document;
  *   - squared-L2 via the dot expansion ‖x‖² − 2·x·c + ‖c‖², each term
  *     a sequential left-to-right double fold (FloatVectorDot's codegen
  *     loop ≡ DuckDB's list_sum(list_transform(...)));
  *   - argmin ties break to the smallest cell id (struct array_min ≡
  *     the oracle's row_number ORDER BY d, cell);
  *   - updated centroid coordinates are round(·,6)::FLOAT on BOTH
  *     engines, re-synchronizing the one order-sensitive reduction
  *     (the per-dimension mean) before it feeds the next iteration;
  *   - an emptied cell keeps its previous centroid (COALESCE in the
  *     oracle, a driver-side fallback here).
  *
  * Scale shape (the part that must survive 100 TB): centroids are
  * MODEL PARAMETERS (K×Dim floats), not data — they live on the driver
  * and enter the plan as literal arrays, so each Lloyd pass is
  *   assignment: a map-only projection over the corpus (array_min over
  *     K dist structs, whole-stage codegen'd, zero shuffle, zero join);
  *   update: one partial-aggregated groupBy(cluster, dim) — the shuffle
  *     carries at most K×Dim rows per map task (map-side combine), and
  *     the collect is K×Dim = 640 values, a model pull, not a data pull.
  * That is the canonical broadcast-centroid k-means; nothing in the
  * plan grows with corpus size except the embarrassingly-parallel scan.
  */
object KMeans {

  private[graft] val K = 10
  private[graft] val Dim = 64
  private[graft] val Iterations = 2 // Lloyd updates; output = final assignment

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")

  /** Assignment projection under literal centroids: per row, the best
    * (dist², cell) struct via array_min — map-only, codegen'd.
    */
  private[graft] def assigned(e: DataFrame, cent: Array[Array[Float]]): DataFrame = {
    val cells: Seq[Column] = cent.toIndexedSeq.zipWithIndex.map { case (c, j) =>
      val cLit = array(c.toIndexedSeq.map(v => lit(v)): _*)
      // ‖c‖² folded driver-side in the same left-to-right order as the
      // kernel's loop and the oracle's list_sum
      val cc = c.foldLeft(0.0)((a, v) => a + v.toDouble * v.toDouble)
      struct(
        (col("xx") - lit(2.0) * VectorOps.dot(col("embedding"), cLit) + lit(cc))
          .as("d"),
        lit(j).as("cell")
      )
    }
    e.withColumn("xx", VectorOps.dot(col("embedding"), col("embedding")))
      .withColumn("best", array_min(array(cells: _*)))
      .select(
        col("vec_id"),
        col("embedding"),
        col("best.cell").as("cluster"),
        col("best.d").as("d2")
      )
  }

  /** One Lloyd update: per-(cluster, dim) mean, round(·,6)::FLOAT (the
    * cross-engine numeric re-sync), collected as K×Dim model values.
    * An emptied cell keeps its previous centroid.
    */
  private def updated(
      a: DataFrame,
      prev: Array[Array[Float]]
  ): Array[Array[Float]] = {
    val rows = a
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("cluster", "pos")
      .agg(round(avg(col("v").cast("double")), 6).cast("float").as("m"))
      .collect()
    val next = Array.tabulate(prev.length)(j => prev(j).clone())
    rows.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getFloat(2))
    next
  }

  /** Lloyd training over any frame carrying `vec_id` + `embedding`
    * columns, returning the k trained centroids under q70's exact
    * determinism protocol (first-k init by `vec_id` — REQUIRED: a
    * frame without it has no deterministic "first k rows", and a
    * limit-without-sort init would silently vary across plans/retries,
    * breaking the oracle-replay contract — L2 argmin with smallest-cell
    * ties, round(·,6)::FLOAT centroid re-sync, emptied cells keep their
    * previous centroid). Exposed so the IVF/PQ quantizers (q136,
    * AnnQuality's trained sweeps) train with the SAME loop the q70 gate
    * pins — one Lloyd implementation repo-wide, one oracle replay
    * recipe.
    */
  private[graft] def train(
      e: DataFrame,
      k: Int,
      iterations: Int = Iterations
  ): Array[Array[Float]] = {
    require(
      e.columns.contains("vec_id"),
      "KMeans.train requires a vec_id column: first-k init must be " +
        "deterministic (limit without sort is not)"
    )
    val init: Array[Array[Float]] =
      e.filter(col("vec_id") < k)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
        .map(_.getSeq[Float](0).toArray)
    require(init.length == k, s"expected $k init vectors, got ${init.length}")
    (0 until iterations).foldLeft(init) { (c, _) =>
      updated(assigned(e, c), c)
    }
  }

  private def q70(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    // init + Lloyd loop: the collects are model pulls bounded by K
    // (first-K init policy, same as pqCodebook)
    val cFinal = train(e, K, Iterations)
    assigned(e, cFinal)
      .select(
        col("vec_id"),
        col("cluster"),
        // + 0.0: the expansion can land an exact-member distance at a
        // tiny negative → round → -0.0 (signed-zero parity convention)
        (round(col("d2"), 4) + lit(0d)).as("dist2")
      )
      .orderBy("vec_id")
  }

  /** q172: simplified (centroid-based) SILHOUETTE per cluster — the
    * standard "is this clustering any good?" audit over q70's trained
    * assignment (full silhouette is O(n²) pairwise; the centroid form
    * s = (b − a)/max(a, b) with a = dist to own centroid, b = dist to
    * nearest OTHER centroid is the O(n·k) production spelling — same
    * decision signal, embarrassingly parallel). The actionable columns:
    * avg silhouette per cluster (collapsed/overlapping clusters read
    * near 0) and the fraction of NEGATIVE scores (points that sit
    * closer to another centroid than their own — assignment-vs-geometry
    * disagreement that only happens after Lloyd moves centroids off
    * the assignment that made them).
    *
    * Determinism: distances are the q70 kernel's exact doubles,
    * sqrt/ratio are fixed IEEE dags per row, clamped at 0 before sqrt
    * (the q70 tiny-negative cancellation case), and each per-vector
    * score snaps to the floor×10⁶ micro grid BEFORE aggregation
    * (q165 discipline) — per-cluster stats are exact-integer
    * arithmetic. Scale shape: one map-only pass under K literal
    * centroids (the q70 assignment projection, widened to keep the
    * runner-up distance), one K-group aggregate. No joins, no windows.
    */
  private def q172(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cent = train(e, K, Iterations)
    val cells: Seq[Column] = cent.toIndexedSeq.zipWithIndex.map { case (c, j) =>
      val cLit = array(c.toIndexedSeq.map(v => lit(v)): _*)
      val cc = c.foldLeft(0.0)((a, v) => a + v.toDouble * v.toDouble)
      struct(
        (col("xx") - lit(2.0) * VectorOps.dot(col("embedding"), cLit) + lit(cc))
          .as("d"),
        lit(j).as("cell")
      )
    }
    val da = sqrt(greatest(col("best.d"), lit(0.0)))
    val db = sqrt(greatest(col("second.d"), lit(0.0)))
    val sRaw = when(greatest(da, db) === 0.0, lit(0.0))
      .otherwise((db - da) / greatest(da, db))
    e.withColumn("xx", VectorOps.dot(col("embedding"), col("embedding")))
      .withColumn("arr", array(cells: _*))
      .withColumn("best", array_min(col("arr")))
      .withColumn(
        "second",
        array_min(filter(col("arr"), x => x.getField("cell") =!= col("best.cell")))
      )
      .select(
        col("best.cell").as("cluster"),
        floor(sRaw * 1000000.0).cast("long").as("s_micro")
      )
      .groupBy("cluster")
      .agg(
        count(lit(1)).as("n_vecs"),
        (round(
          sum(col("s_micro")).cast("double") /
            count(lit(1)).cast("double") / 1000000.0,
          4
        ) + 0.0).as("avg_silhouette"),
        (round(min(col("s_micro")).cast("double") / 1000000.0, 4) + 0.0)
          .as("min_silhouette"),
        (round(
          sum(when(col("s_micro") < 0L, 1L).otherwise(0L)).cast("double") /
            count(lit(1)).cast("double"),
          4
        ) + 0.0).as("frac_negative")
      )
      .orderBy("cluster")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q70_kmeans" -> q70,
    "q172_silhouette" -> q172,
    "q241_cluster_nmi" -> q241
  )

  /** q241: normalized mutual information between q70's trained k-means
    * clusters and the embeddings' ground-truth labels — the
    * EXTERNAL-validity companion of q172's silhouette (silhouette asks
    * "is the geometry tight" with no labels; NMI asks "did the
    * clustering recover the semantic classes", the number a curation
    * pipeline reads before trusting cluster ids as topic shards):
    * NMI = I(C;L)/√(H(C)·H(L)) over the (cluster, label) contingency
    * table of the SAME Lloyd assignment the q70 gate pins.
    *
    * Determinism (the q226/q238 exact-ln-grid convention): every MI
    * log argument n_cl·N/(n_c·n_l) is a ratio of exact integer
    * cross-products floor-snapped to the 1e-9 grid and weighted by the
    * exact cell count, and each entropy term likewise — so MI·N·10⁹
    * and H·N·10⁹ are exact BIGINTs sharing the N·10⁹ factor, which
    * CANCELS in the ratio: NMI = mi9n/√(hc9n·hl9n) is one IEEE
    * division of exact integers, round-6. Sharing [[train]] with
    * q70/q136 means this gate can never drift from the gated
    * clustering.
    *
    * Scale shape: the Lloyd loop is q70's (broadcast-centroid map
    * passes, K-bounded model pulls); the contingency aggregate is
    * ≤ K × |labels| rows; margins and entropies are closed-form over
    * that frame; one-row output.
    */
  private def q241(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cFinal = train(e, K, Iterations)
    val cells = assigned(e, cFinal)
      .select(col("vec_id"), col("cluster"))
      .join(e.select(col("vec_id"), col("label")), "vec_id")
      .groupBy("cluster", "label")
      .agg(count(lit(1)).as("ncl"))
    val nc = cells.groupBy("cluster").agg(sum("ncl").as("nc"))
    val nl = cells.groupBy("label").agg(sum("ncl").as("nl"))
    val nn = cells.agg(sum("ncl").as("nn"))
    val mi = cells
      .join(nc, "cluster")
      .join(nl, "label")
      .crossJoin(broadcast(nn))
      .withColumn(
        "l9",
        floor(
          log((col("ncl") * col("nn")).cast("double") /
            (col("nc") * col("nl")).cast("double")) * 1.0e9
        ).cast("long")
      )
      .agg(
        max("nn").as("nn"),
        count(lit(1)).as("n_cells"),
        sum((col("ncl") * col("l9")).cast("decimal(38,0)"))
          .cast("double")
          .as("mi9n")
      )
    def ent(m: DataFrame, cnt: String, out: String): DataFrame =
      m.crossJoin(broadcast(nn))
        .withColumn(
          "l9",
          floor(
            log(col(cnt).cast("double") / col("nn").cast("double")) * 1.0e9
          ).cast("long")
        )
        .agg(
          (-sum((col(cnt) * col("l9")).cast("decimal(38,0)")))
            .cast("double")
            .as(out),
          count(lit(1)).as(s"k_$out")
        )
    val hc = ent(nc, "nc", "hc9n")
    val hl = ent(nl, "nl", "hl9n")
    mi.crossJoin(broadcast(hc))
      .crossJoin(broadcast(hl))
      .select(
        col("nn").as("n_vecs"),
        col("k_hc9n").as("k_clusters"),
        col("k_hl9n").as("k_labels"),
        col("n_cells"),
        (round(
          col("mi9n") / (col("nn").cast("double") * 1.0e9),
          6
        ) + 0.0).as("mi_nats"),
        (round(
          col("hc9n") / (col("nn").cast("double") * 1.0e9),
          6
        ) + 0.0).as("h_cluster"),
        (round(
          col("hl9n") / (col("nn").cast("double") * 1.0e9),
          6
        ) + 0.0).as("h_label"),
        (round(
          col("mi9n") / nullif(sqrt(col("hc9n") * col("hl9n")), lit(0.0d)),
          6
        ) + 0.0).as("nmi")
      )
  }

  // The oracle replays init → (assign → update) × 2 → final assign with
  // the IDENTICAL fold order, tie-break, and round(·,6)::FLOAT centroid
  // re-sync; `dim` is 1-based there, 0-based here — engine-internal only.
  private val distSql =
    """list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
      |      - 2.0 * list_sum(list_transform(generate_series(1, 64),
      |          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.ce[i] AS DOUBLE)))
      |      + list_sum(list_transform(c.ce, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))""".stripMargin

  // private[graft]: q136's oracle composes the SAME training replay with
  // K=16 — the trained-IVF oracle can never drift from the q70 recipe
  private[graft] def distCteSql(cN: String, srcFrom: String = "e"): String =
    s"""SELECT e.vec_id, c.cell, $distSql AS d
       |  FROM $srcFrom CROSS JOIN $cN c""".stripMargin

  private[graft] def argminSql(dN: String): String =
    s"""SELECT vec_id, cell, d FROM (
       |  SELECT vec_id, cell, d,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
       |  FROM $dN) WHERE rn = 1""".stripMargin

  private[graft] def updateSql(aN: String, prevC: String): String =
    s"""SELECT $prevC.cell, coalesce(u.ce, $prevC.ce) AS ce
       |  FROM $prevC LEFT JOIN (
       |    SELECT cell, list(m ORDER BY i) AS ce FROM (
       |      SELECT a.cell, dim.i,
       |        CAST(round(avg(CAST(e.embedding[dim.i] AS DOUBLE)), 6) AS FLOAT) AS m
       |      FROM $aN a JOIN e USING (vec_id) CROSS JOIN dim
       |      GROUP BY a.cell, dim.i)
       |    GROUP BY cell) u USING (cell)""".stripMargin

  // the shared q70 training-replay chain: a2 = final assignment, d2 =
  // the full (vec, cell, d) distance frame it argmin'd over
  private val trainReplayCtes =
    s"""e AS (SELECT vec_id, embedding FROM embeddings),
       |dim AS (SELECT unnest(generate_series(1, 64)) AS i),
       |c0 AS (SELECT vec_id AS cell, embedding AS ce FROM e WHERE vec_id < $K),
       |d0 AS (${distCteSql("c0")}),
       |a0 AS (${argminSql("d0")}),
       |c1 AS (${updateSql("a0", "c0")}),
       |d1 AS (${distCteSql("c1")}),
       |a1 AS (${argminSql("d1")}),
       |c2 AS (${updateSql("a1", "c1")}),
       |d2 AS (${distCteSql("c2")}),
       |a2 AS (${argminSql("d2")})""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q70_kmeans" ->
      s"""WITH $trainReplayCtes
         |SELECT vec_id, CAST(cell AS INTEGER) AS cluster,
         |  round(d, 4) + 0.0 AS dist2
         |FROM a2 ORDER BY vec_id""".stripMargin,
    // same replayed distances, same clamped sqrt / ratio dag, same
    // floor×10⁶ per-vector snap before the exact-integer rollup
    "q172_silhouette" ->
      s"""WITH $trainReplayCtes,
         |ob AS (
         |  SELECT d2.vec_id, min(d2.d) AS bd
         |  FROM d2 JOIN a2 USING (vec_id)
         |  WHERE d2.cell <> a2.cell
         |  GROUP BY d2.vec_id),
         |sil AS (
         |  SELECT a2.cell AS cluster,
         |    CAST(floor(
         |      CASE WHEN greatest(sqrt(greatest(a2.d, 0.0)),
         |                         sqrt(greatest(ob.bd, 0.0))) = 0.0 THEN 0.0
         |           ELSE (sqrt(greatest(ob.bd, 0.0)) - sqrt(greatest(a2.d, 0.0)))
         |                / greatest(sqrt(greatest(a2.d, 0.0)),
         |                           sqrt(greatest(ob.bd, 0.0))) END
         |      * 1000000.0) AS BIGINT) AS s_micro
         |  FROM a2 JOIN ob USING (vec_id))
         |SELECT CAST(cluster AS INTEGER) AS cluster,
         |  CAST(count(*) AS BIGINT) AS n_vecs,
         |  round(CAST(sum(s_micro) AS DOUBLE)
         |        / CAST(count(*) AS DOUBLE) / 1000000.0, 4) + 0.0
         |    AS avg_silhouette,
         |  round(CAST(min(s_micro) AS DOUBLE) / 1000000.0, 4) + 0.0
         |    AS min_silhouette,
         |  round(CAST(sum(CASE WHEN s_micro < 0 THEN 1 ELSE 0 END) AS DOUBLE)
         |        / CAST(count(*) AS DOUBLE), 4) + 0.0 AS frac_negative
         |FROM sil GROUP BY cluster ORDER BY cluster""".stripMargin,
    // same training replay, same exact-ln-grid MI/entropy sums over
    // the (cluster, label) cells, same cancelled-N·10⁹ NMI division
    "q241_cluster_nmi" ->
      s"""WITH $trainReplayCtes,
         |cells AS (
         |  SELECT a2.cell AS cluster, emb.label, CAST(count(*) AS BIGINT) AS ncl
         |  FROM a2 JOIN embeddings emb USING (vec_id) GROUP BY 1, 2),
         |ncm AS (SELECT cluster, CAST(sum(ncl) AS BIGINT) AS nc
         |        FROM cells GROUP BY 1),
         |nlm AS (SELECT label, CAST(sum(ncl) AS BIGINT) AS nl
         |        FROM cells GROUP BY 1),
         |nt AS (SELECT CAST(sum(ncl) AS BIGINT) AS nn FROM cells),
         |mi AS (
         |  SELECT max(nn) AS nn, CAST(count(*) AS BIGINT) AS n_cells,
         |    CAST(sum(CAST(ncl * CAST(floor(ln(
         |      CAST(ncl * nn AS DOUBLE) / CAST(nc * nl AS DOUBLE)) * 1.0e9)
         |      AS BIGINT) AS HUGEINT)) AS DOUBLE) AS mi9n
         |  FROM cells JOIN ncm USING (cluster) JOIN nlm USING (label)
         |       CROSS JOIN nt),
         |hc AS (
         |  SELECT CAST(-sum(CAST(nc * CAST(floor(ln(
         |      CAST(nc AS DOUBLE) / CAST(nn AS DOUBLE)) * 1.0e9)
         |      AS BIGINT) AS HUGEINT)) AS DOUBLE) AS hc9n,
         |    CAST(count(*) AS BIGINT) AS k_clusters
         |  FROM ncm CROSS JOIN nt),
         |hl AS (
         |  SELECT CAST(-sum(CAST(nl * CAST(floor(ln(
         |      CAST(nl AS DOUBLE) / CAST(nn AS DOUBLE)) * 1.0e9)
         |      AS BIGINT) AS HUGEINT)) AS DOUBLE) AS hl9n,
         |    CAST(count(*) AS BIGINT) AS k_labels
         |  FROM nlm CROSS JOIN nt)
         |SELECT nn AS n_vecs, k_clusters, k_labels, n_cells,
         |  round(mi9n / (CAST(nn AS DOUBLE) * 1.0e9), 6) + 0.0 AS mi_nats,
         |  round(hc9n / (CAST(nn AS DOUBLE) * 1.0e9), 6) + 0.0 AS h_cluster,
         |  round(hl9n / (CAST(nn AS DOUBLE) * 1.0e9), 6) + 0.0 AS h_label,
         |  round(mi9n / nullif(sqrt(hc9n * hl9n), 0.0), 6) + 0.0 AS nmi
         |FROM mi CROSS JOIN hc CROSS JOIN hl""".stripMargin
  )
}
