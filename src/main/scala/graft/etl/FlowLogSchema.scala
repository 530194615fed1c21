package graft.etl

import org.apache.spark.sql.types._

/** The one entity type of the reference engine: an AWS VPC Flow Log v2
  * record.
  *
  * Mirrors the reference's Go struct (reference `flowlog.go:14-29`) and its
  * Glue DDL (`template.yml:130-158`). The reference declares `end_ts` as
  * INT32 in Glue but writes Parquet INT64 — a latent schema mismatch; we
  * declare LongType consistently (SURVEY.md §1.2).
  */
final case class FlowLog(
    version: Int,
    accountid: String,
    interfaceid: String,
    srcaddr: String,
    dstaddr: String,
    srcport: Int,
    dstport: Int,
    protocol: Int,
    packets: Int,
    bytes: Int,
    start_ts: Long,
    end_ts: Long,
    action: String,
    logstatus: String
)

object FlowLogSchema {

  /** Text-format positional column order (reference `samples/sample1.log:1`
    * header and positional indexing in `flowlog.go:50-90`).
    */
  val columns: Seq[(String, DataType)] = Seq(
    "version" -> IntegerType,
    "accountid" -> StringType,
    "interfaceid" -> StringType,
    "srcaddr" -> StringType,
    "dstaddr" -> StringType,
    "srcport" -> IntegerType,
    "dstport" -> IntegerType,
    "protocol" -> IntegerType,
    "packets" -> IntegerType,
    "bytes" -> IntegerType,
    "start_ts" -> LongType,
    "end_ts" -> LongType,
    "action" -> StringType,
    "logstatus" -> StringType
  )

  val arity: Int = columns.size // 14, enforced at parse (flowlog.go:37-40)

  val schema: StructType = StructType(columns.map { case (n, t) =>
    StructField(n, t, nullable = false)
  })

  /** Partition columns — not stored in the data files; Hive-style path
    * layout `account=…/dt=…` (reference encodes them in the S3 path,
    * `convert.go:29-35`, and registers them via DDL, `main.go:177`).
    */
  val partitionColumns: Seq[String] = Seq("account", "dt")
}
