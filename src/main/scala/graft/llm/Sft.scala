package graft.llm

import graft.queries.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q94: SFT sample assembly — the chat-template flattening step that
  * turns curated documents into instruction-tuning rows: split each
  * document into an instruction (the first sentence) and a response
  * (the remainder), render the fixed chat template
  * `<|user|>\n{prompt}\n<|assistant|>\n{response}`, count tokens of the
  * RENDERED sample (template markers cost budget too — counting the raw
  * text undercounts what the trainer packs), and keep samples inside
  * the [MinTokens, MaxTokens] budget. Emits the rendered sample's
  * md5 + lengths, the identity a downstream packer (q52) or exact-dedup
  * pass (q25) keys on.
  *
  * Reference scope: none (extension surface, like the rest of
  * graft.llm).
  *
  * Scale shape: pure per-row string projection — no shuffle at all
  * except the deterministic output ORDER BY the oracle compare needs;
  * at 100 TB this is a map-only pass that fuses into whatever scan
  * feeds it (whole-stage codegen, no UDFs).
  *
  * Parity notes: sentence split = first '.' via instr/strpos (1-based,
  * 0 when absent — identical across engines); ltrim strips the
  * inter-sentence spaces on both; newlines enter the oracle via
  * chr(10) so no escape-string dialect is involved; token count is the
  * family's whitespace convention (q34) over the rendered string, cast
  * to BIGINT on both sides.
  */
object Sft {

  private val MinTokens = 8
  private val MaxTokens = 512

  private def q94(s: SparkSession, dir: String): DataFrame = {
    val base = Tables
      .table(s, dir, "documents")
      .select(col("doc_id"), col("text"), instr(col("text"), ".").as("dot_pos"))
    val sp = base.select(
      col("doc_id"),
      when(col("dot_pos") > 0, expr("substring(text, 1, dot_pos)"))
        .otherwise(col("text"))
        .as("prompt"),
      when(col("dot_pos") > 0, ltrim(expr("substring(text, dot_pos + 1)")))
        .otherwise(lit(""))
        .as("response")
    )
    sp.select(
      col("doc_id"),
      concat(
        lit("<|user|>\n"),
        col("prompt"),
        lit("\n<|assistant|>\n"),
        col("response")
      ).as("rendered")
    ).select(
        col("doc_id"),
        size(split(col("rendered"), " ")).cast("long").as("n_tokens"),
        length(col("rendered")).as("n_chars_out"),
        md5(col("rendered").cast("binary")).as("sample_md5")
      )
      .filter(col("n_tokens").between(MinTokens, MaxTokens))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q94_sft_assembly" -> q94
  )

  val oracleSql: Map[String, String] = Map(
    "q94_sft_assembly" ->
      s"""WITH b AS (
         |  SELECT doc_id, text, strpos(text, '.') AS dot_pos FROM documents),
         |sp AS (
         |  SELECT doc_id,
         |    CASE WHEN dot_pos > 0 THEN substring(text, 1, dot_pos)
         |         ELSE text END AS prompt,
         |    CASE WHEN dot_pos > 0 THEN ltrim(substring(text, dot_pos + 1))
         |         ELSE '' END AS response
         |  FROM b),
         |r AS (
         |  SELECT doc_id,
         |    '<|user|>' || chr(10) || prompt || chr(10) || '<|assistant|>'
         |      || chr(10) || response AS rendered
         |  FROM sp)
         |SELECT doc_id,
         |  CAST(len(string_split(rendered, ' ')) AS BIGINT) AS n_tokens,
         |  length(rendered) AS n_chars_out,
         |  md5(rendered) AS sample_md5
         |FROM r
         |WHERE len(string_split(rendered, ' ')) BETWEEN $MinTokens AND $MaxTokens
         |ORDER BY doc_id""".stripMargin
  )
}
