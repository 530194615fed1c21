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
        graft.TempDirs.deleteOnExit(root.getPath)
        val e = graft.queries.Tables.table(s, dir, "embeddings")
        val cent = KMeans.train(e, IvfCells)
        KMeans
          .assigned(e, cent)
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
  ): DataFrame = {
    val root = ensureIndex(s, dir)
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q138_knn_ivf_index" -> q138
  )

  /** Shared verbatim with q136 — build/serve moves bytes, not values. */
  val oracleSql: Map[String, String] = Map(
    "q138_knn_ivf_index" -> Similarity.oracleSql("q136_knn_ivf_trained")
  )
}
