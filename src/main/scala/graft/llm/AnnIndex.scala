package graft.llm

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** q138: PERSISTED IVF index — the build/serve split every production
  * ANN deployment has, which q31b/q136 (train-and-query in one plan)
  * deliberately do not: those gates pin the math; this gate pins the
  * LAYOUT. Build trains the coarse quantizer once (KMeans.train — the
  * q70/q136 Lloyd recipe), assigns every vector, and writes the index
  * as a CELL-PARTITIONED parquet store (vec_id, embedding under
  * cell=N/ directories) plus a 16-row centroid manifest. Serve never
  * retrains: it collects the manifest (a model pull), routes probes
  * map-only against the stored centroid literals (the q136 probe
  * shape), and equi-joins the broadcast probe-cells frame against the
  * index scan — so partition pruning, not a filter, enforces the IVF
  * contract that a query READS only nprobe/ncells of the index bytes.
  * At 100 TB that is the difference between an ANN query costing a
  * corpus scan and costing ~25% of one (4/16 cells here; cells scale
  * with √N per the BASELINE.md sizing note). AnnIndexSpec pins the
  * mechanism: a one-probe serve's index scan reads exactly nprobe of
  * the 16 cell partitions (numPartitions metric), and q138's served
  * results equal q136's in-plan results row-for-row.
  *
  * The oracle is BY CONSTRUCTION q136's: build/serve moves bytes, not
  * values (stored float arrays round-trip parquet exactly), so the SQL
  * twin is shared verbatim — any divergence is a round-trip bug.
  *
  * Reference scope: the reference engine has no vector surface at all;
  * this extends the training-data-pipeline extension family. Layout
  * conventions (app-id-keyed tmp root, _READY sentinel, atomic
  * publish) follow the q100/q125 gate pattern.
  */
object AnnIndex {

  import Similarity.{IvfCells, IvfProbes, NumProbes}

  /** Appended vectors whose mean assignment distance exceeds this many
    * times the BUILD-time mean flag the index for re-training: the
    * frozen quantizer no longer fits the incoming distribution, so cell
    * routing degrades (recall falls while cost stays constant).
    */
  private[graft] val DriftFactor = 4.0

  /** One maintenance report per [[append]]: how many vectors landed,
    * the batch's mean squared assignment distance, the build-time mean
    * it is judged against, and the re-train recommendation.
    */
  final case class AppendReport(
      version: Int,
      appended: Long,
      meanD2: Double,
      buildMeanD2: Double,
      retrainRecommended: Boolean
  )

  /** Train on `trainFrame`, assign it, write the cell-partitioned store
    * + centroid manifest + version-1 meta line. The caller owns the
    * `_READY` sentinel (a build that is part of a larger setup — e.g.
    * build-then-append — must not look ready halfway).
    */
  private[graft] def buildAt(
      s: SparkSession,
      root: java.io.File,
      trainFrame: DataFrame
  ): Array[Array[Float]] = {
    graft.TempDirs.deleteOnExit(root.getPath)
    val cent = KMeans.train(trainFrame, IvfCells)
    val assigned = KMeans.assigned(trainFrame, cent)
    assigned
      .select(col("vec_id"), col("embedding"), col("cluster").as("cell"))
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy("cell")
      .parquet(new java.io.File(root, "vectors").getPath)
    // centroid manifest: 16 rows of model data, the only thing serve
    // needs besides the store itself
    import s.implicits._
    cent.toIndexedSeq.zipWithIndex
      .map { case (c, j) => (j, c.toSeq) }
      .toDF("cell", "ce")
      .coalesce(1)
      .write
      .mode(SaveMode.Overwrite)
      .parquet(new java.io.File(root, "centroids").getPath)
    val st = assigned.agg(count(lit(1)), avg(col("d2"))).head()
    appendMeta(root, 1, st.getLong(0), st.getDouble(1))
    cent
  }

  /** The version/meta manifest (`_meta.tsv`): one line per build/append
    * commit — `version \t epochMs \t n_vectors \t mean_d2`. The
    * single-writer append discipline of `catalog/Snapshots`' manifest,
    * sized for an index (a handful of lines, no retained generations:
    * vectors are append-only, never rewritten in place).
    */
  private def appendMeta(root: java.io.File, version: Int, n: Long, meanD2: Double): Unit = {
    val f = new java.io.File(root, "_meta.tsv")
    val line = s"$version\t${System.currentTimeMillis()}\t$n\t$meanD2\n"
    java.nio.file.Files.write(
      f.toPath,
      line.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND
    )
  }

  private def readMeta(root: String): Seq[(Int, Long, Double)] =
    new String(
      java.nio.file.Files.readAllBytes(
        new java.io.File(root, "_meta.tsv").toPath
      ),
      java.nio.charset.StandardCharsets.UTF_8
    ).linesIterator
      .filter(_.nonEmpty)
      .map { l =>
        val f = l.split('\t')
        (f(0).toInt, f(2).toLong, f(3).toDouble)
      }
      .toSeq

  /** INCREMENTAL maintenance: route `vecs` through the STORED centroids
    * (map-only literal argmin — the exact assignment a from-scratch
    * build with the same frozen quantizer would produce) and append
    * them into their cell partitions; no existing file is touched and
    * no re-train happens. Serve-after-append is therefore IDENTICAL to
    * rebuild-with-the-same-quantizer by construction (AnnIndexSpec pins
    * it; the q138b oracle replays it value-level). The report carries
    * the drift verdict: a batch whose mean assignment distance blows
    * past [[DriftFactor]]× the build-time mean no longer fits the
    * frozen cells — the caller schedules a re-train (which IS a
    * rebuild: centroids are plan literals, so changing them re-routes
    * everything).
    */
  private[graft] def append(
      s: SparkSession,
      root: String,
      vecs: DataFrame
  ): AppendReport = {
    val cent = loadCentroids(s, root)
    val assigned = KMeans.assigned(vecs, cent)
    assigned
      .select(col("vec_id"), col("embedding"), col("cluster").as("cell"))
      .write
      .mode(SaveMode.Append)
      .partitionBy("cell")
      .parquet(s"$root/vectors")
    val st = assigned.agg(count(lit(1)), avg(col("d2"))).head()
    val (n, meanD2) =
      (st.getLong(0), if (st.isNullAt(1)) 0.0 else st.getDouble(1))
    val meta = readMeta(root)
    val buildMean = meta.head._3 // version-1 line = the build
    val version = meta.map(_._1).max + 1
    appendMeta(new java.io.File(root), version, n, meanD2)
    AppendReport(version, n, meanD2, buildMean, meanD2 > DriftFactor * buildMean)
  }

  /** One built index per (JVM, sfDir): train, assign, write the
    * cell-partitioned store + centroid manifest, publish atomically.
    */
  private def ensureIndex(s: SparkSession, dir: String): String =
    synchronized {
      val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
      val root = new java.io.File(
        sys.props("java.io.tmpdir"),
        s"graft_annindex_${s.sparkContext.applicationId}$tag"
      )
      if (!new java.io.File(root, "_READY").exists()) {
        buildAt(s, root, graft.queries.Tables.table(s, dir, "embeddings"))
        new java.io.File(root, "_READY").createNewFile()
      }
      root.getPath
    }

  /** q138b's fixture: build on the corpus MINUS a deterministic slice,
    * then append that slice — the serve sees the full corpus through an
    * index that was never rebuilt. The append predicate spares
    * vec_id < IvfCells so the subset still carries the first-K init.
    */
  private[graft] def appendSlice(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c % 7 === 3 && c >= IvfCells

  private def ensureIncIndex(s: SparkSession, dir: String): String =
    synchronized {
      val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
      val root = new java.io.File(
        sys.props("java.io.tmpdir"),
        s"graft_annindex_inc_${s.sparkContext.applicationId}$tag"
      )
      if (!new java.io.File(root, "_READY").exists()) {
        val e = graft.queries.Tables.table(s, dir, "embeddings")
        buildAt(s, root, e.filter(!appendSlice(col("vec_id"))))
        val report = append(s, root.getPath, e.filter(appendSlice(col("vec_id"))))
        require(report.appended > 0, "q138b fixture appended nothing")
        new java.io.File(root, "_READY").createNewFile()
      }
      root.getPath
    }

  /** Stored centroids, sorted by cell — the serve-side model pull. */
  private def loadCentroids(s: SparkSession, root: String): Array[Array[Float]] = {
    val rows = s.read
      .parquet(s"$root/centroids")
      .orderBy("cell")
      .collect()
    require(rows.length == IvfCells, s"manifest has ${rows.length} centroids")
    rows.map(_.getSeq[Float](1).toArray)
  }

  /** Serve kNN for the probe frame against the stored index —
    * exposed (with nprobe) for AnnIndexSpec's pruning-metric pin.
    */
  private[graft] def serve(
      s: SparkSession,
      dir: String,
      probeFilter: org.apache.spark.sql.Column,
      nprobe: Int = IvfProbes
  ): DataFrame =
    serveAt(s, ensureIndex(s, dir), dir, probeFilter, nprobe)

  /** Serve against an EXPLICIT index root (q138b's appended index, the
    * spec's rebuild twin) — probes still come from the corpus table.
    */
  private[graft] def serveAt(
      s: SparkSession,
      root: String,
      dir: String,
      probeFilter: org.apache.spark.sql.Column,
      nprobe: Int = IvfProbes
  ): DataFrame = {
    val cent = loadCentroids(s, root)
    // probe routing against the STORED centroids as literals (map-only,
    // the q136 probe shape; ordering identical to the oracle's (d, cell))
    val cellStructs = cent.toIndexedSeq.zipWithIndex.map { case (c, j) =>
      val cLit = array(c.toIndexedSeq.map(v => lit(v)): _*)
      val cc = c.foldLeft(0.0)((a, v) => a + v.toDouble * v.toDouble)
      struct(
        (col("xx") - lit(2.0) * VectorOps.dot(col("embedding"), cLit) + lit(cc))
          .as("d"),
        lit(j).as("cell")
      )
    }
    val probeCells = graft.queries.Tables
      .table(s, dir, "embeddings")
      .filter(probeFilter)
      .withColumn("xx", VectorOps.dot(col("embedding"), col("embedding")))
      .select(
        col("vec_id").as("probe_id"),
        col("embedding").as("pe"),
        explode(slice(array_sort(array(cellStructs: _*)), 1, nprobe)).as("bc")
      )
      .select(col("probe_id"), col("pe"), col("bc.cell").as("cell"))
    // the index scan: candidates come from the probed cell PARTITIONS —
    // the broadcast equi-join on the partition column lets runtime
    // pruning drop the other cells' directories entirely
    val index = s.read
      .parquet(s"$root/vectors")
      .select(
        col("vec_id").as("neighbor_id"),
        col("embedding").as("ne"),
        col("cell")
      )
    Similarity.scoreTopK(
      index
        .join(broadcast(probeCells), Seq("cell"))
        .filter(col("neighbor_id") =!= col("probe_id"))
    )
  }

  private def q138(s: SparkSession, dir: String): DataFrame =
    serve(s, dir, col("vec_id") < NumProbes)

  /** q138b: serve THROUGH the appended index — the quantizer trained on
    * the build subset stays frozen, the appended slice is routed into
    * its cells by [[append]], and the serve covers the full corpus.
    * The oracle replays exactly that: Lloyd over the SUBSET, final
    * routing (corpus cells AND probe cells) over the FULL table against
    * the subset-trained centroids — so equality proves append routed
    * every new vector precisely as a rebuild with the same frozen
    * quantizer would have.
    */
  private def q138b(s: SparkSession, dir: String): DataFrame =
    serveAt(s, ensureIncIndex(s, dir), dir, col("vec_id") < NumProbes)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q138_knn_ivf_index" -> q138,
    "q138b_knn_ivf_index_append" -> q138b
  )

  /** q138 is shared verbatim with q136 — build/serve moves bytes, not
    * values. q138b composes the SAME q70/q136 Lloyd-replay CTEs with
    * training restricted to the build subset and routing over the full
    * corpus (`allv` aliased as `e` inside the final distance CTE so the
    * shared dist expression binds unchanged).
    */
  val oracleSql: Map[String, String] = Map(
    "q138_knn_ivf_index" -> Similarity.oracleSql("q136_knn_ivf_trained"),
    "q138b_knn_ivf_index_append" -> {
      s"""WITH allv AS (SELECT vec_id, embedding FROM embeddings),
         |e AS (SELECT vec_id, embedding FROM allv
         |      WHERE NOT (vec_id % 7 = 3 AND vec_id >= $IvfCells)),
         |dim AS (SELECT unnest(generate_series(1, ${Similarity.Dim})) AS i),
         |c0 AS (SELECT vec_id AS cell, embedding AS ce FROM e WHERE vec_id < $IvfCells),
         |d0 AS (${KMeans.distCteSql("c0")}),
         |a0 AS (${KMeans.argminSql("d0")}),
         |c1 AS (${KMeans.updateSql("a0", "c0")}),
         |d1 AS (${KMeans.distCteSql("c1")}),
         |a1 AS (${KMeans.argminSql("d1")}),
         |c2 AS (${KMeans.updateSql("a1", "c1")}),
         |df AS (${KMeans.distCteSql("c2", "allv e")}),
         |corpus_cells AS (${KMeans.argminSql("df")}),
         |probe_cells AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
         |    FROM df WHERE vec_id < $NumProbes) WHERE rn <= $IvfProbes),
         |${Similarity.scoreTopKSql(s"""cand AS (
         |  SELECT pc.vec_id AS probe_id, cc.vec_id AS neighbor_id
         |  FROM probe_cells pc JOIN corpus_cells cc ON cc.cell = pc.cell
         |  WHERE cc.vec_id <> pc.vec_id)""".stripMargin)}""".stripMargin
    }
  )
}
