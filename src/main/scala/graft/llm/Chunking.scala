package graft.llm

import graft.queries.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q65: document chunking — the RAG / embedding-prep step that splits
  * each document into overlapping fixed-size word windows (size
  * [[ChunkWords]], stride [[StrideWords]]) with deterministic chunk ids
  * and content hashes, ready for an embedding model or an index build.
  *
  * Scale shape: a pure map-side pipeline — `split` → `sequence` →
  * `explode` → `slice` — with NO shuffle at all (the final ORDER BY is
  * gate presentation only). Each document expands to ~n_words/stride
  * rows independently of every other document, so the operator scales
  * embarrassingly to 100 TB: no state, no join, no aggregation, and a
  * task retry reproduces identical chunks because every derived value
  * (chunk index, hash) is a pure function of the row.
  *
  * Chunk-count arithmetic is kept in INTEGER form on both engines —
  * `greatest(0, (n_words - (chunk - stride + 1)) div stride)` — because
  * float `ceil((n-chunk)/stride)` could land on a representability edge
  * and disagree by one chunk. `div` truncates toward zero in Spark while
  * DuckDB's `//` floors, but the only disagreeing inputs are negative
  * numerators, which `greatest(0, …)` collapses to 0 on both engines.
  */
object Chunking {

  val ChunkWords = 40
  val StrideWords = 30

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")

  private def q65(s: SparkSession, dir: String): DataFrame = {
    val c = ChunkWords
    val st = StrideWords
    docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(
        col("doc_id"),
        col("w"),
        size(col("w")).as("n_words"),
        explode(
          sequence(
            lit(0),
            greatest(
              lit(0),
              expr(s"(size(w) - ${c - st + 1}) div $st").cast("int")
            )
          )
        ).as("chunk_idx")
      )
      .select(
        col("doc_id"),
        col("chunk_idx"),
        least(lit(c), col("n_words") - col("chunk_idx") * st).as("chunk_words"),
        md5(array_join(slice(col("w"), col("chunk_idx") * st + 1, lit(c)), " "))
          .as("chunk_hash"),
        array_join(slice(col("w"), col("chunk_idx") * st + 1, lit(c)), " ")
          .as("chunk_text")
      )
      .orderBy("doc_id", "chunk_idx")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q65_chunking" -> q65
  )

  val oracleSql: Map[String, String] = Map(
    "q65_chunking" -> {
      val c = ChunkWords
      val st = StrideWords
      s"""WITH d AS (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
         |), p AS (
         |  SELECT doc_id, w, len(w) AS n_words,
         |         greatest(0, (len(w) - ${c - st + 1}) // $st) AS last_idx
         |  FROM d
         |), e AS (
         |  SELECT doc_id, w, n_words,
         |         unnest(generate_series(0, last_idx)) AS chunk_idx
         |  FROM p
         |)
         |SELECT doc_id, chunk_idx,
         |       least($c, n_words - chunk_idx * $st) AS chunk_words,
         |       md5(array_to_string(list_slice(w, chunk_idx * $st + 1, chunk_idx * $st + $c), ' ')) AS chunk_hash,
         |       array_to_string(list_slice(w, chunk_idx * $st + 1, chunk_idx * $st + $c), ' ') AS chunk_text
         |FROM e
         |ORDER BY doc_id, chunk_idx""".stripMargin
    }
  )
}
