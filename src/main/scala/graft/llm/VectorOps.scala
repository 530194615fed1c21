package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column helpers over `array<float>` embedding columns.
  *
  * All math is done in DOUBLE with left-to-right accumulation so results
  * are bit-identical to the DuckDB oracle (which evaluates the same fold
  * sequentially). The hot-path [[dot]]/[[cosine]] are custom codegen'd
  * Catalyst expressions (graft.functions.VectorExpressions) — the HOF
  * forms ([[dotHof]]/[[cosineHof]]) are kept as the executable spec the
  * custom kernels are asserted bit-equal against.
  */
object VectorOps {

  import graft.functions.{FloatVectorCosine, FloatVectorDot}
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expr => cexpr}

  /** Σ aᵢ·bᵢ in double (codegen'd primitive loop). */
  def dot(a: Column, b: Column): Column =
    column(FloatVectorDot(cexpr(a), cexpr(b)))

  /** Cosine similarity in one pass; null on zero norm (ANSI-safe). */
  def cosine(a: Column, b: Column): Column =
    column(FloatVectorCosine(cexpr(a), cexpr(b)))

  /** a/‖a‖ (null on zero norm). Under the session's GraftExtensions,
    * cosine over normalized inputs folds back to cosine of the raw
    * inputs at plan time (SimplifyNormalizedCosine) — normalizing
    * "for cosine" costs nothing.
    */
  def normalize(a: Column): Column =
    column(graft.functions.FloatVectorNormalize(cexpr(a)))

  /** Reference HOF forms — semantically identical, ~50× slower. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x
    )

  def normHof(a: Column): Column =
    sqrt(
      aggregate(
        transform(a, x => x.cast("double") * x.cast("double")),
        lit(0.0),
        (acc, x) => acc + x
      )
    )

  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / nullif(normHof(a) * normHof(b), lit(0.0))

  /** HOF reference for [[normalize]]: same per-element double divide
    * narrowed back to float, same whole-array null on zero norm or null
    * element — the executable spec the kernel is asserted bit-equal
    * against (VectorExpressionsSpec).
    */
  def normalizeHof(a: Column): Column = {
    val n = normHof(a)
    when(n.isNull || n === lit(0.0), lit(null))
      .otherwise(transform(a, x => (x.cast("double") / n).cast("float")))
  }

  private def nullif(c: Column, v: Column): Column =
    when(c === v, lit(null)).otherwise(c)
}
