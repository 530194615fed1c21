package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declarative (Column-expression) re-expression of the reference's
  * line parser (reference `flowlog.go:33-98`): tokenize on single spaces,
  * drop the header row, gate on version == 2, then positionally project 14
  * typed columns with *lenient* numeric casts — a failed numeric parse
  * yields 0, never null, matching the reference's `if err == nil`-guarded
  * `strconv.Atoi` assignments (`flowlog.go:59-90`). This is what makes AWS
  * NODATA/SKIPDATA rows (numeric fields are `-`) come out as 0.
  *
  * All expressions are ANSI-safe (`try_element_at` / `try_cast`) so the
  * semantics do not depend on the session's `spark.sql.ansi.enabled`.
  * Everything stays inside whole-stage codegen — no UDFs.
  */
object FlowLogParser {

  /** Result of parsing a raw-line DataFrame: `good` carries the typed
    * records; `quarantined` carries rejected lines with a reason. The
    * reference aborts the whole object on the first bad line
    * (`convert.go:48-50`) but then swallows the error at the top
    * (`main.go:77-83`); we quarantine instead — documented deviation
    * (SURVEY.md §7.4).
    */
  final case class ParseResult(good: DataFrame, quarantined: DataFrame)

  private val TOKENS = "_graft_tokens"

  /** tok(i): 1-based try_element_at over the token array — null (not an
    * ANSI error) when out of bounds.
    */
  private def tok(i: Int): Column =
    try_element_at(col(TOKENS), lit(i + 1))

  /** Lenient numeric cast: non-numeric (e.g. `-`) becomes 0, matching
    * `flowlog.go:59-90`. The native Column.try_cast keeps this
    * ANSI-mode-proof without round-tripping the column through its
    * (unstable, debug-oriented) string form and the SQL parser.
    */
  private def lenient(c: Column, t: DataType): Column = t match {
    case IntegerType => coalesce(c.try_cast(IntegerType), lit(0))
    case LongType    => coalesce(c.try_cast(LongType), lit(0L))
    case _           => coalesce(c, lit(""))
  }

  private def isHeader: Column = tok(0) === "version" // flowlog.go:42-44
  private def badArity: Column = size(col(TOKENS)) =!= FlowLogSchema.arity // flowlog.go:37-40
  private def badVersion: Column = tok(0) =!= "2" // flowlog.go:46-48

  /** Tokenize + route. Input must have a string column `value` (the shape
    * `spark.read.text` / `readStream.text` produce).
    */
  def parse(raw: DataFrame): ParseResult = {
    val toks = raw.withColumn(TOKENS, split(col("value"), " "))

    val typedCols = FlowLogSchema.columns.zipWithIndex.map {
      case ((name, StringType), i) => coalesce(tok(i), lit("")).as(name)
      case ((name, t), i)          => lenient(tok(i), t).as(name)
    }

    val good = toks
      .filter(!isHeader && !badArity && !badVersion)
      .select(typedCols: _*)

    val quarantined = toks
      .filter(!isHeader && (badArity || badVersion))
      .select(
        col("value").as("raw"),
        when(badArity, lit("arity")).otherwise(lit("version")).as("reason")
      )

    ParseResult(good, quarantined)
  }

  /** Derived event-time column: `ts = time.Unix(start, 0)`
    * (`flowlog.go:86,95`).
    */
  def withEventTime(parsed: DataFrame): DataFrame =
    parsed.withColumn("ts", timestamp_seconds(col("start_ts")))

  /** Partition-key columns, computed from the record's own start timestamp
    * exactly like `newPartitionKey` (`convert.go:20-27`): the date is the
    * record's start date (session TZ; we pin UTC), the account is the
    * record's accountid. `dt` format yyyy-MM-dd matches the Athena
    * partition value built at `main.go:177`.
    */
  def withPartitionKey(parsed: DataFrame): DataFrame =
    withEventTime(parsed)
      .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("account", col("accountid"))
}
