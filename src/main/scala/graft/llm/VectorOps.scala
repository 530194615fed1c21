package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column helpers over `array<float>` embedding columns.
  *
  * All math is done in DOUBLE with left-to-right accumulation so results
  * are bit-identical to the DuckDB oracle (which evaluates the same fold
  * sequentially). Built from higher-order functions — stays inside
  * Catalyst/codegen, no UDF boxing.
  */
object VectorOps {

  /** Σ aᵢ·bᵢ in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x
    )

  /** ‖a‖₂ in double. */
  def norm(a: Column): Column =
    sqrt(
      aggregate(
        transform(a, x => x.cast("double") * x.cast("double")),
        lit(0.0),
        (acc, x) => acc + x
      )
    )

  /** Cosine similarity; null when either vector has zero norm (keeps the
    * expression ANSI-safe — no division by zero).
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(norm(a) * norm(b), lit(0.0))

  private def nullif(c: Column, v: Column): Column =
    when(c === v, lit(null)).otherwise(c)
}
