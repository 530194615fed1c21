package graft.sources

import java.util.OptionalLong

import scala.collection.JavaConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsReportStatistics}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Avro container-file source/sink as a native DataSource V2 connector —
  * the fourth wire format after JSONL (q60), CSV (q66), and ORC (q74).
  *
  * Why a hand-built connector: this distro ships Avro's CORE library
  * (`avro-1.12.1.jar`) but not the `spark-avro` datasource module, and
  * the build has zero dependency egress — so the capability is
  * re-expressed the Spark-first way: a `TableProvider` with a real
  * scan/write split, registered by class name
  * (`format(classOf[AvroDataSource].getName)`). Reference scope: the
  * reference writes parquet only (`parquet.go:18-55`); Avro is the row-
  * oriented interchange format Kafka/schema-registry shops ask for.
  *
  * Layout contract (the same one Spark's own file sources use): a
  * directory of `part-*.avro` container files plus a `_SUCCESS` marker;
  * one file per write task, one read partition per file. All I/O goes
  * through the Hadoop `FileSystem` API, so the connector is
  * path-scheme-agnostic (local now, HDFS/S3A on a cluster — executors
  * resolve the filesystem from a default `Configuration`; a deployment
  * carrying custom FS conf would broadcast it alongside).
  *
  * Write protocol, crash-safe: each task streams through
  * `DataFileWriter` (snappy codec) into a DOT-PREFIXED temp file (the
  * `_temporary`-style convention: hidden from any concurrent reader's
  * `part-*` glob), and the driver-side `commit` renames every temp into
  * place — plus, under `SaveMode.Overwrite` (`SupportsTruncate`),
  * deletes the previous generation's files at commit time, not at job
  * start, so a mid-write crash leaves the OLD data fully readable (the
  * `catalog/Maintenance` swap discipline applied to a connector).
  *
  * Type lattice (both directions, nullable via `union(null, T)`):
  * long/int/double/float/boolean/string/bytes, and timestamp-micros ↔
  * Spark `TimestampType` — the subset every mainstream Avro producer
  * emits. Unknown Avro branches fail loudly at schema mapping, never
  * silently coerce.
  */
object GraftAvro {

  /** Spark → Avro schema (write path). Field order preserved. */
  def toAvroSchema(schema: StructType, recordName: String): Schema = {
    def base(dt: DataType): Schema = dt match {
      case LongType    => Schema.create(Schema.Type.LONG)
      case IntegerType => Schema.create(Schema.Type.INT)
      case DoubleType  => Schema.create(Schema.Type.DOUBLE)
      case FloatType   => Schema.create(Schema.Type.FLOAT)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case StringType  => Schema.create(Schema.Type.STRING)
      case BinaryType  => Schema.create(Schema.Type.BYTES)
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case other =>
        throw new IllegalArgumentException(
          s"graft-avro does not map Spark type ${other.sql}"
        )
    }
    val fields = schema.fields.map { f =>
      val t =
        if (f.nullable)
          Schema.createUnion(Schema.create(Schema.Type.NULL), base(f.dataType))
        else base(f.dataType)
      new Schema.Field(f.name, t, null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(recordName, null, "graft.sources", false, fields.toList.asJava)
  }

  /** Avro → Spark schema (read/infer path). */
  def toSparkSchema(schema: Schema): StructType = {
    def field(s: Schema): (DataType, Boolean) = s.getType match {
      case Schema.Type.UNION =>
        val branches = s.getTypes.asScala
        val nonNull = branches.filter(_.getType != Schema.Type.NULL)
        require(
          nonNull.size == 1 && branches.size <= 2,
          s"graft-avro reads only [null, T] unions, got $s"
        )
        (field(nonNull.head)._1, branches.size == 2)
      case Schema.Type.LONG =>
        val dt =
          if (s.getLogicalType != null &&
              s.getLogicalType.getName == "timestamp-micros") TimestampType
          else LongType
        (dt, false)
      case Schema.Type.INT     => (IntegerType, false)
      case Schema.Type.DOUBLE  => (DoubleType, false)
      case Schema.Type.FLOAT   => (FloatType, false)
      case Schema.Type.BOOLEAN => (BooleanType, false)
      case Schema.Type.STRING  => (StringType, false)
      case Schema.Type.BYTES   => (BinaryType, false)
      case other =>
        throw new IllegalArgumentException(s"graft-avro does not map Avro type $other")
    }
    require(
      schema.getType == Schema.Type.RECORD,
      s"graft-avro expects a record schema at top level, got ${schema.getType}"
    )
    StructType(schema.getFields.asScala.toSeq.map { f =>
      val (dt, nullable) = field(f.schema())
      StructField(f.name(), dt, nullable)
    })
  }

  private[sources] def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft-avro requires a path option")
    p
  }

  private[sources] def listDataFiles(dir: Path, fs: FileSystem): Seq[Path] =
    if (!fs.exists(dir)) Seq.empty
    else
      fs.listStatus(dir)
        .toSeq
        .filter(st =>
          st.isFile && st.getPath.getName.startsWith("part-") &&
            st.getPath.getName.endsWith(".avro")
        )
        .sortBy(_.getPath.getName)
        .map(_.getPath)
}

/** The `TableProvider` entry point: `format("graft-avro")` (registered
  * via the META-INF/services DataSourceRegister file) or the
  * fully-qualified class name — both resolve here.
  */
class AvroDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-avro"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dir = new Path(GraftAvro.pathOf(options))
    val fs = dir.getFileSystem(new Configuration())
    val files = GraftAvro.listDataFiles(dir, fs)
    require(
      files.nonEmpty,
      s"graft-avro: no part-*.avro files under $dir to infer a schema from"
    )
    // container files carry the writer schema in the header; one open
    // suffices (the write path emits one schema for the whole directory)
    val in = fs.open(files.head)
    try {
      val stream =
        new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
      try GraftAvro.toSparkSchema(stream.getSchema)
      finally stream.close()
    } finally in.close()
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]
  ): Table = new AvroTable(schema)
}

class AvroTable(tableSchema: StructType)
    extends Table
    with SupportsRead
    with SupportsWrite {

  override def name(): String = "graft-avro"
  // NOT named `schema`: a constructor param of that name would be
  // shadowed by this very method and recurse
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE
    )

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(tableSchema, GraftAvro.pathOf(options))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new AvroWriteBuilder(info.schema(), GraftAvro.pathOf(info.options()))
}

// --------------------------------------------------------------- stats

/** Per-file column min/max sidecar (`_stats.tsv`) powering file-level
  * filter skipping — the row-format analog of parquet's footer stats.
  * The write path tracks each task's per-column (hasNull, min, max)
  * while streaming rows (no second pass) and the driver commit writes
  * one sidecar for the directory; the scan evaluates pushed filters
  * against each file's stats and SKIPS files that provably cannot hold
  * a matching row. Everything is conservative-by-absence: a file with
  * no sidecar line, a column with no stats, or a filter shape outside
  * the supported set simply reads the file. Spark re-applies every
  * pushed filter above the scan (pushFilters returns all of them as
  * residuals), so skipping is a pure I/O optimization that can never
  * change results.
  *
  * Serialization: one line per (file, column) —
  * `file \t col \t hasNonNull \t hasNull \t min \t max`, column names
  * hive-escaped, string values base64 of their UTF-8 bytes (binary
  * ordering — the SAME ordering `UTF8String.compareTo` uses for the
  * running min/max and the skip compare, so a string filter can never
  * skip a file a collation-aware engine would keep). Timestamps ride
  * their µs longs.
  */
private[sources] object AvroStats {

  val FileName = "_stats.tsv"

  def statable(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | FloatType | BooleanType |
        StringType | TimestampType =>
      true
    case _ => false
  }

  /** Total order per type over the INTERNAL representations the writer
    * tracks (Long/Int/Double/Float/Boolean/UTF8String; timestamps as µs
    * longs). Doubles/floats use java compare (NaN largest — matching
    * Spark's ordering).
    */
  def cmp(dt: DataType, a: Any, b: Any): Int = dt match {
    case LongType | TimestampType =>
      java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case IntegerType => Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
    case DoubleType =>
      java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case FloatType =>
      java.lang.Float.compare(a.asInstanceOf[Float], b.asInstanceOf[Float])
    case BooleanType =>
      java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
    case StringType =>
      a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
    case other => throw new IllegalStateException(s"no ordering for ${other.sql}")
  }

  def serialize(dt: DataType, v: Any): String = dt match {
    case StringType =>
      java.util.Base64.getEncoder.encodeToString(v.asInstanceOf[UTF8String].getBytes)
    case _ => v.toString
  }

  def deserialize(dt: DataType, s: String): Any = dt match {
    case LongType | TimestampType => s.toLong
    case IntegerType              => s.toInt
    case DoubleType               => s.toDouble
    case FloatType                => s.toFloat
    case BooleanType              => s.toBoolean
    case StringType => UTF8String.fromBytes(java.util.Base64.getDecoder.decode(s))
    case other      => throw new IllegalStateException(s"no stats for ${other.sql}")
  }

  /** External filter value (what `org.apache.spark.sql.sources.Filter`
    * carries) → the internal representation `cmp` orders. Returns None
    * for value shapes the skipper doesn't understand (→ no skip).
    */
  def toInternal(dt: DataType, v: Any): Option[Any] = (dt, v) match {
    case (_, null)                             => None
    case (StringType, s: String)               => Some(UTF8String.fromString(s))
    case (StringType, s: UTF8String)           => Some(s)
    case (LongType, n: java.lang.Number)       => Some(n.longValue())
    case (IntegerType, n: java.lang.Number)    => Some(n.intValue())
    case (DoubleType, n: java.lang.Number) =>
      val d = n.doubleValue(); Some(if (d == 0.0d) 0.0d else d)
    case (FloatType, n: java.lang.Number) =>
      val f = n.floatValue(); Some(if (f == 0.0f) 0.0f else f)
    case (BooleanType, b: java.lang.Boolean)   => Some(b.booleanValue())
    case (TimestampType, t: java.sql.Timestamp) =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t))
    case (TimestampType, i: java.time.Instant) =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(i))
    case (TimestampType, n: java.lang.Long) => Some(n.longValue())
    case _                                   => None
  }

  /** One parsed (file, column) stat. min/max are None when the file has
    * no non-null value for the column; `rows` (the file's row count —
    * identical across its columns) is None for v1 six-field lines.
    */
  final case class ColStats(
      hasNull: Boolean,
      min: Option[Any],
      max: Option[Any],
      rows: Option[Long] = None
  )

  /** Running per-column stats inside one write task. */
  final class Tracker(val name: String, val dt: DataType, idx: Int) {
    private var hasNull = false
    private var min: Any = _
    private var max: Any = _
    private var seen = false
    private var rows = 0L

    def observe(row: InternalRow): Unit =
      if (row.isNullAt(idx)) { hasNull = true; rows += 1 }
      else {
        rows += 1
        val v: Any = dt match {
          case LongType | TimestampType => row.getLong(idx)
          case IntegerType              => row.getInt(idx)
          // normalize −0.0 → 0.0: Spark's comparisons equate them, but
          // the skip test's java compare orders them — an un-normalized
          // −0.0 max could wrongly skip an `= 0.0` filter
          case DoubleType =>
            val d = row.getDouble(idx); if (d == 0.0d) 0.0d else d
          case FloatType =>
            val f = row.getFloat(idx); if (f == 0.0f) 0.0f else f
          case BooleanType => row.getBoolean(idx)
          // clone: an unsafe row's UTF8String points into a reused buffer
          case StringType => row.getUTF8String(idx).clone()
          case other      => throw new IllegalStateException(other.sql)
        }
        if (!seen) { min = v; max = v; seen = true }
        else {
          if (cmp(dt, v, min) < 0) min = v
          if (cmp(dt, v, max) > 0) max = v
        }
      }

    def line(fileName: String): String = {
      val esc = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .escapePathName(name)
      val (mn, mx) =
        if (seen) (serialize(dt, min), serialize(dt, max)) else ("-", "-")
      s"$fileName\t$esc\t${if (seen) 1 else 0}\t${if (hasNull) 1 else 0}\t$mn\t$mx\t$rows"
    }
  }

  /** Parse the sidecar into file → column → stats, resolving types from
    * the table schema; unknown columns/types are dropped (conservative).
    */
  def parse(text: String, schema: StructType): Map[String, Map[String, ColStats]] = {
    val types = schema.fields.map(f => f.name -> f.dataType).toMap
    text.linesIterator
      .filter(_.nonEmpty)
      .flatMap { line =>
        // per-line tolerance: a malformed/truncated line drops ITS stat
        // (that file just gets read), never the scan
        try {
          val f = line.split('\t')
          if (f.length != 6 && f.length != 7) None
          else {
            val col = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
              .unescapePathName(f(1))
            types.get(col).filter(statable).map { dt =>
              val seen = f(2) == "1"
              ( f(0),
                col,
                ColStats(
                  hasNull = f(3) == "1",
                  min = if (seen) Some(deserialize(dt, f(4))) else None,
                  max = if (seen) Some(deserialize(dt, f(5))) else None,
                  rows = f.lift(6).map(_.toLong)
                )
              )
            }
          }
        } catch { case _: Exception => None }
      }
      .toSeq
      .groupBy(_._1)
      .map { case (file, rows) => file -> rows.map(r => r._2 -> r._3).toMap }
  }

  import org.apache.spark.sql.sources._

  /** Is `f` a shape the skipper can evaluate, over statable columns of
    * `schema`? Only accepted filters are reported as pushed.
    */
  def supported(f: Filter, schema: StructType): Boolean = {
    def colOk(c: String): Boolean =
      schema.fields.exists(sf => sf.name == c && statable(sf.dataType))
    f match {
      case EqualTo(c, _)            => colOk(c)
      case EqualNullSafe(c, _)      => colOk(c)
      case GreaterThan(c, _)        => colOk(c)
      case GreaterThanOrEqual(c, _) => colOk(c)
      case LessThan(c, _)           => colOk(c)
      case LessThanOrEqual(c, _)    => colOk(c)
      case In(c, _)                 => colOk(c)
      case IsNull(c)                => colOk(c)
      case IsNotNull(c)             => colOk(c)
      case StringStartsWith(c, _) =>
        schema.fields.exists(sf => sf.name == c && sf.dataType == StringType)
      case And(l, r)                => supported(l, schema) && supported(r, schema)
      case Or(l, r)                 => supported(l, schema) && supported(r, schema)
      case _                        => false
    }
  }

  /** MAY the file hold a matching row? Three-valued collapsed to
    * conservative boolean: anything unknown → true (read the file).
    */
  def mayMatch(f: Filter, stats: Map[String, ColStats], schema: StructType): Boolean = {
    val types = schema.fields.map(sf => sf.name -> sf.dataType).toMap
    def range(c: String)(p: (DataType, Any, Any) => Boolean): Boolean =
      (for {
        dt <- types.get(c)
        st <- stats.get(c)
        mn <- st.min
        mx <- st.max
      } yield p(dt, mn, mx)).getOrElse {
        // no non-null values at all: only null-ish filters can match
        stats.get(c).forall(_.min.isDefined)
      }
    def withValue(c: String, v: Any)(p: (DataType, Any, Any, Any) => Boolean): Boolean =
      types.get(c).flatMap(dt => toInternal(dt, v).map(iv =>
        range(c)((d, mn, mx) => p(d, iv, mn, mx))
      )).getOrElse(true)
    f match {
      case EqualTo(c, v) =>
        withValue(c, v)((d, iv, mn, mx) => cmp(d, iv, mn) >= 0 && cmp(d, iv, mx) <= 0)
      case EqualNullSafe(c, null) => stats.get(c).forall(_.hasNull)
      case EqualNullSafe(c, v) =>
        withValue(c, v)((d, iv, mn, mx) => cmp(d, iv, mn) >= 0 && cmp(d, iv, mx) <= 0)
      case GreaterThan(c, v)        => withValue(c, v)((d, iv, _, mx) => cmp(d, mx, iv) > 0)
      case GreaterThanOrEqual(c, v) => withValue(c, v)((d, iv, _, mx) => cmp(d, mx, iv) >= 0)
      case LessThan(c, v)           => withValue(c, v)((d, iv, mn, _) => cmp(d, mn, iv) < 0)
      case LessThanOrEqual(c, v)    => withValue(c, v)((d, iv, mn, _) => cmp(d, mn, iv) <= 0)
      case In(c, vs) =>
        vs.exists(v =>
          v != null &&
            withValue(c, v)((d, iv, mn, mx) => cmp(d, iv, mn) >= 0 && cmp(d, iv, mx) <= 0)
        )
      case IsNull(c)    => stats.get(c).forall(_.hasNull)
      case IsNotNull(c) => stats.get(c).forall(_.min.isDefined)
      case StringStartsWith(c, p) if p != null =>
        // strings with prefix p occupy [p, pNext) in BYTEWISE order,
        // where pNext = p with its last non-0xFF byte incremented (all
        // 0xFF → unbounded above); may-match ⟺ [min,max] intersects it
        range(c) { (d, mn, mx) =>
          val pref = UTF8String.fromString(p)
          val bytes = pref.getBytes
          val cut = bytes.lastIndexWhere(_ != -1) // -1 = 0xFF signed
          val upper =
            if (cut < 0) None
            else {
              val up = java.util.Arrays.copyOf(bytes, cut + 1)
              up(cut) = (up(cut) + 1).toByte
              Some(UTF8String.fromBytes(up))
            }
          cmp(d, mx, pref) >= 0 && upper.forall(u => cmp(d, mn, u) < 0)
        }
      case And(l, r) =>
        mayMatch(l, stats, schema) && mayMatch(r, stats, schema)
      case Or(l, r) =>
        mayMatch(l, stats, schema) || mayMatch(r, stats, schema)
      case _ => true
    }
  }
}

// ---------------------------------------------------------------- read

/** Column pruning reaches the Avro DECODER, not just the row: the scan's
  * pruned schema becomes an Avro READER schema (a field-subset of each
  * file's writer schema), and Avro schema resolution then SKIPS the
  * bytes of every unprojected field instead of materializing
  * strings/boxes for them — the row-format analog of parquet column
  * pruning (I/O still reads whole blocks; CPU and allocation drop to
  * the projected width). AvroSourceSpec pins the plan-level contract:
  * a 1-column projection's BatchScan outputs exactly that column.
  */
class AvroScanBuilder(schema: StructType, path: String)
    extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {

  private var required: StructType = schema
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  private var limit: Option[Int] = None
  private var aggResult: Option[(StructType, Array[Any])] = None

  /** AGGREGATE pushdown, metadata-only (the parquet-footer-aggregate
    * analog over the stats sidecar): a global (no GROUP BY, no residual
    * filter) MIN/MAX/COUNT(*) is answered entirely from `_stats.tsv` —
    * min of file mins, max of file maxes, Σ file row counts — and the
    * scan returns ONE row without opening a single container block. The
    * pushdown is COMPLETE (Spark plans no aggregate above the scan) and
    * all-or-nothing: every listed data file must carry a sidecar line
    * for every referenced column (all-null files qualify — their lines
    * say so; MIN/MAX ignore nulls) and, for COUNT(*), a v2 row-count
    * field; anything short of that refuses and the normal scan + Spark
    * aggregation runs. At 100 TB this answers the "how many rows / what
    * range" opener from catalog-sized metadata instead of a store scan.
    * Known bit-level nuance: double/float extremes come from the
    * signed-zero-NORMALIZED trackers, so a store whose true minimum is
    * −0.0 reports 0.0 — numerically equal (Spark comparisons equate
    * them) but bit-different from what an unpushed scan might return;
    * NaN ordering (greatest) matches Spark's on both paths.
    */
  private def resolveAgg(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation
  ): Option[(StructType, Array[Any])] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    if (pushed.nonEmpty || agg.groupByExpressions.nonEmpty) return None
    val fieldOf: Map[String, StructField] = schema.fields.map(f => f.name -> f).toMap
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[StructField] =
      e match {
        case nr: NamedReference if nr.fieldNames().length == 1 =>
          fieldOf.get(nr.fieldNames()(0)).filter(f => AvroStats.statable(f.dataType))
        case _ => None
      }
    // (kind, field): kind 0 = count(*), 1 = min, 2 = max
    val funcs: Array[(Int, Option[StructField])] =
      agg.aggregateExpressions().map {
        case _: CountStar => (0, None: Option[StructField])
        case m: Min       => (1, Some(colOf(m.column()).getOrElse(return None)))
        case m: Max       => (2, Some(colOf(m.column()).getOrElse(return None)))
        case _            => return None
      }
    val byFile: Map[String, Map[String, AvroStats.ColStats]] =
      try {
        val dir = new Path(path)
        val fs = dir.getFileSystem(new Configuration())
        val files = GraftAvro.listDataFiles(dir, fs).map(_.getName)
        val sidecar = new Path(dir, AvroStats.FileName)
        if (files.isEmpty) Map.empty
        else if (!fs.exists(sidecar)) return None
        else {
          val in = fs.open(sidecar)
          val text =
            try {
              val bos = new java.io.ByteArrayOutputStream()
              val buf = new Array[Byte](8192)
              var n = in.read(buf)
              while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
              new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
            } finally in.close()
          val parsed = AvroStats.parse(text, schema)
          // all-or-nothing: every data file must be covered
          if (!files.forall(parsed.contains)) return None
          parsed.view.filterKeys(files.toSet).toMap
        }
      } catch { case _: Exception => return None }
    val values: Array[Any] = funcs.map {
      case (0, _) =>
        var total = 0L
        byFile.values.foreach { cols =>
          cols.values.flatMap(_.rows).headOption match {
            case Some(r) => total += r
            case None    => return None // v1 sidecar: no row counts
          }
        }
        total
      case (kind, Some(f)) =>
        var acc: Any = null
        byFile.values.foreach { cols =>
          cols.get(f.name) match {
            case None => return None // a file with unknown stats for the column
            case Some(st) =>
              st.min.foreach { _ =>
                val v = if (kind == 1) st.min.get else st.max.get
                if (acc == null) acc = v
                else {
                  val c = AvroStats.cmp(f.dataType, v, acc)
                  if ((kind == 1 && c < 0) || (kind == 2 && c > 0)) acc = v
                }
              }
          }
        }
        acc
      case _ => return None
    }
    val fields = funcs.map {
      case (0, _)       => StructField("count(*)", LongType, nullable = false)
      case (1, Some(f)) => StructField(s"min(${f.name})", f.dataType, nullable = true)
      case (2, Some(f)) => StructField(s"max(${f.name})", f.dataType, nullable = true)
      case _            => return None
    }
    Some((StructType(fields), values))
  }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation
  ): Boolean = resolveAgg(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation
  ): Boolean =
    resolveAgg(agg) match {
      case Some(r) => aggResult = Some(r); true
      case None    => false
    }

  /** LIMIT pushdown: each partition reader stops DECODING after `n`
    * rows (a per-partition truncation — the global Limit stays above,
    * hence `false`). Spark only offers the pushdown when no Filter sits
    * between the Limit and the scan, and the builder additionally
    * refuses it when filters were pushed (a pre-filter truncation could
    * starve a post-scan residual filter of matching rows).
    */
  override def pushLimit(n: Int): Boolean = {
    if (pushed.isEmpty) limit = Some(n)
    false
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    // flat schemas only (the type lattice has no nested fields); Spark
    // hands back a subset of `schema` in table-field order
    required = requiredSchema

  /** Accept the filter shapes the stats sidecar can evaluate; return
    * EVERY filter as a residual — file skipping is a may-contain test,
    * so Spark must keep re-applying the predicates above the scan
    * (exactly parquet's row-group-skip contract).
    */
  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter]
  ): Array[org.apache.spark.sql.sources.Filter] = {
    pushed = filters.filter(AvroStats.supported(_, schema))
    filters
  }

  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed

  override def build(): Scan =
    new AvroScan(
      required,
      path,
      pushed,
      if (pushed.isEmpty) limit else None,
      aggResult
    )
}

class AvroScan(
    schema: StructType,
    path: String,
    pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty,
    limit: Option[Int] = None,
    aggResult: Option[(StructType, Array[Any])] = None
) extends Scan
    with SupportsReportStatistics {

  override def readSchema(): StructType =
    aggResult.map(_._1).getOrElse(schema)
  override def description(): String =
    aggResult match {
      case Some((as, _)) =>
        s"graft-avro $path PushedAggregates (metadata-only): [${as.fieldNames.mkString(", ")}]"
      case None =>
        s"graft-avro $path PushedFilters: [${pushed.mkString(", ")}]"
    }

  // the table schema may be wider than the pruned read schema; filters
  // can reference pruned-away columns, so stat lookups resolve against
  // whatever columns the sidecar knows (parse tolerates extras)
  private lazy val files: Seq[(String, Long)] = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(new Configuration())
    val all = GraftAvro.listDataFiles(dir, fs)
      .map(p => (p, fs.getFileStatus(p).getLen))
    if (pushed.isEmpty) all.map { case (p, len) => (p.toString, len) }
    else {
      val sidecar = new Path(dir, AvroStats.FileName)
      // the sidecar is ADVISORY: a missing/mid-swap/corrupt file (or any
      // read error) disables skipping for this scan, never fails it
      val byFile: Map[String, Map[String, AvroStats.ColStats]] =
        try {
          if (!fs.exists(sidecar)) Map.empty
          else {
            val in = fs.open(sidecar)
            val text =
              try {
                val bos = new java.io.ByteArrayOutputStream()
                val buf = new Array[Byte](8192)
                var n = in.read(buf)
                while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
                new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
              } finally in.close()
            AvroStats.parse(text, statsSchema)
          }
        } catch { case _: Exception => Map.empty }
      all
        .filter { case (p, _) =>
          byFile.get(p.getName) match {
            case None => true // no stats for the file: read it
            case Some(st) =>
              pushed.forall(AvroStats.mayMatch(_, st, statsSchema))
          }
        }
        .map { case (p, len) => (p.toString, len) }
    }
  }

  /** Filters may reference columns pruned out of the read schema; stat
    * evaluation needs their types, so resolve against read schema ∪
    * pushed-filter references (types recovered from the sidecar are
    * keyed by name — the union is what `parse`/`mayMatch` consult).
    */
  private lazy val statsSchema: StructType = {
    val have = schema.fields.map(_.name).toSet
    val extra = pushed
      .flatMap(_.references)
      .distinct
      .filterNot(have)
    if (extra.isEmpty) schema
    else {
      // recover the full table schema from a container header once
      val dir = new Path(path)
      val fs = dir.getFileSystem(new Configuration())
      GraftAvro.listDataFiles(dir, fs).headOption match {
        case None => schema
        case Some(p) =>
          val in = fs.open(p)
          try {
            val stream = new DataFileStream[GenericRecord](
              in,
              new GenericDatumReader[GenericRecord]()
            )
            try GraftAvro.toSparkSchema(stream.getSchema)
            finally stream.close()
          } finally in.close()
      }
    }
  }

  override def estimateStatistics(): Statistics = new Statistics {
    // container bytes on disk AFTER file skipping: the skip tightens the
    // planner's broadcast decision for filtered dims
    override def sizeInBytes(): OptionalLong = OptionalLong.of(files.map(_._2).sum)
    override def numRows(): OptionalLong = OptionalLong.empty()
  }

  override def toBatch: Batch = aggResult match {
    case Some((aggSchema, values)) =>
      new Batch {
        // ONE partition, ONE precomputed row: the sidecar already
        // answered; no container file is listed, opened, or decoded
        override def planInputPartitions(): Array[InputPartition] =
          Array(AvroAggPartition(values))
        override def createReaderFactory(): PartitionReaderFactory =
          new AvroAggReaderFactory(aggSchema.length)
      }
    case None =>
      new Batch {
        override def planInputPartitions(): Array[InputPartition] =
          files.map(f => AvroInputPartition(f._1): InputPartition).toArray
        override def createReaderFactory(): PartitionReaderFactory =
          new AvroReaderFactory(schema, limit)
      }
  }
}

/** The pushed-aggregate result row, shipped to the one task as plain
  * serializable values (boxed primitives + UTF8String).
  */
case class AvroAggPartition(values: Array[Any]) extends InputPartition

class AvroAggReaderFactory(width: Int) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val vals = partition.asInstanceOf[AvroAggPartition].values
      private var emitted = false
      override def next(): Boolean = if (emitted) false else { emitted = true; true }
      override def get(): InternalRow = {
        val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(width)
        var i = 0
        while (i < vals.length) { row.update(i, vals(i)); i += 1 }
        row
      }
      override def close(): Unit = ()
    }
}

case class AvroInputPartition(file: String) extends InputPartition

class AvroReaderFactory(schema: StructType, limit: Option[Int] = None)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new AvroPartitionReader(
      partition.asInstanceOf[AvroInputPartition].file,
      schema,
      limit
    )
}

class AvroPartitionReader(
    file: String,
    schema: StructType,
    limit: Option[Int] = None
) extends PartitionReader[InternalRow] {

  // pushed LIMIT: stop DECODING after this many rows (snappy blocks past
  // the cutoff are never inflated); Long.MaxValue = unbounded
  private val maxRows: Long = limit.map(_.toLong).getOrElse(Long.MaxValue)
  private var produced = 0L

  private val path = new Path(file)
  private val in = path.getFileSystem(new Configuration()).open(path)
  private val datumReader = new GenericDatumReader[GenericRecord]()
  private val stream = new DataFileStream[GenericRecord](in, datumReader)
  // column pruning at the decode level: resolve against a READER schema
  // holding only the projected fields — Avro's resolver skips the bytes
  // of every other field (no string/box materialization for them)
  private val readerSchema: Schema = {
    val writer = stream.getSchema
    schema.fields.foreach { f =>
      require(writer.getField(f.name) != null, s"graft-avro: column ${f.name} absent in $file")
    }
    if (schema.length == writer.getFields.size) writer
    else {
      val keep = schema.fields.map(_.name).toSet
      val fs = writer.getFields.asScala.collect {
        case f if keep(f.name) =>
          new Schema.Field(f.name, f.schema, f.doc, f.defaultVal)
      }
      val rs = Schema.createRecord(
        writer.getName,
        writer.getDoc,
        writer.getNamespace,
        false
      )
      rs.setFields(fs.toSeq.asJava)
      rs
    }
  }
  datumReader.setExpected(readerSchema)
  // positions within the RESOLVED (reader-schema) record
  private val fieldIdx: Array[Int] =
    schema.fields.map(f => readerSchema.getField(f.name).pos())
  private val converters: Array[AnyRef => Any] =
    schema.fields.map(f => AvroConvert.reader(f.dataType))
  private var record: GenericRecord = _
  private val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(schema.length)

  override def next(): Boolean =
    if (produced < maxRows && stream.hasNext) {
      record = stream.next(record); produced += 1; true
    } else false

  override def get(): InternalRow = {
    var i = 0
    while (i < fieldIdx.length) {
      val v = record.get(fieldIdx(i)).asInstanceOf[AnyRef]
      row.update(i, if (v == null) null else converters(i)(v))
      i += 1
    }
    row
  }

  override def close(): Unit = {
    stream.close()
    in.close()
  }
}

// --------------------------------------------------------------- write

class AvroWriteBuilder(schema: StructType, path: String)
    extends WriteBuilder
    with SupportsTruncate {

  private var truncateOnCommit = false

  override def truncate(): WriteBuilder = { truncateOnCommit = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new AvroBatchWrite(schema, path, truncateOnCommit)
  }
}

case class AvroCommitMessage(
    tempFile: String,
    finalFile: String,
    statLines: Seq[String] = Seq.empty
) extends WriterCommitMessage

class AvroBatchWrite(schema: StructType, path: String, truncate: Boolean)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(new Configuration())
    fs.mkdirs(dir)
    new AvroWriterFactory(
      schema.json,
      GraftAvro.toAvroSchema(schema, "graft_record").toString,
      path
    )
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(new Configuration())
    // Overwrite order (the Maintenance swap discipline): snapshot the old
    // generation, rename EVERY staged temp into place, and only then
    // delete the old files that aren't part of the new set (task-id
    // suffixes make new names collision-free against any prior job). A
    // rename failure mid-commit rolls the already-published new files
    // back, leaving the old generation complete — never a directory with
    // neither generation whole.
    val old =
      if (truncate) GraftAvro.listDataFiles(dir, fs) else Seq.empty[Path]
    val published = scala.collection.mutable.ArrayBuffer.empty[Path]
    try {
      messages.foreach {
        case AvroCommitMessage(temp, fin, _) =>
          val t = new Path(temp)
          val f = new Path(fin)
          if (!fs.rename(t, f))
            throw new java.io.IOException(s"graft-avro: rename $temp -> $fin failed")
          published += f
        case other => throw new IllegalStateException(s"unexpected $other")
      }
    } catch {
      case e: Throwable =>
        published.foreach(fs.delete(_, false)) // restore: old set stays whole
        throw e
    }
    if (truncate) {
      val fresh = published.map(_.getName).toSet
      old.filterNot(p => fresh.contains(p.getName)).foreach(fs.delete(_, false))
    }
    writeStatsSidecar(fs, dir, messages)
    val ok = fs.create(new Path(dir, "_SUCCESS"), true)
    ok.close()
  }

  /** Publish `_stats.tsv`: this commit's per-file stat lines plus any
    * prior lines whose file still exists in the directory (append mode
    * keeps the old generation; truncate just deleted it). Staged + rename
    * so a reader never sees a torn sidecar; stats are advisory — any
    * failure here leaves filter-skipping off, never the data wrong.
    */
  private def writeStatsSidecar(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: Path,
      messages: Array[WriterCommitMessage]
  ): Unit = {
    val sidecar = new Path(dir, AvroStats.FileName)
    val existing: Seq[String] =
      if (!fs.exists(sidecar)) Seq.empty
      else {
        val in = fs.open(sidecar)
        try {
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
          new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
            .linesIterator
            .filter(_.nonEmpty)
            .toSeq
        } finally in.close()
      }
    val live = GraftAvro.listDataFiles(dir, fs).map(_.getName).toSet
    val freshLines = messages.toSeq.flatMap {
      case m: AvroCommitMessage => m.statLines
      case _                    => Seq.empty
    }
    val freshFiles = freshLines.map(_.takeWhile(_ != '\t')).toSet
    val kept = existing.filter { l =>
      val f = l.takeWhile(_ != '\t')
      live.contains(f) && !freshFiles.contains(f)
    }
    val tmp = new Path(dir, "." + AvroStats.FileName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(
      (kept ++ freshLines).mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    )
    finally out.close()
    if (fs.exists(sidecar)) fs.delete(sidecar, false)
    if (!fs.rename(tmp, sidecar))
      throw new java.io.IOException(s"graft-avro: cannot publish $tmp")
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(new Configuration())
    messages.foreach {
      case AvroCommitMessage(temp, _, _) => fs.delete(new Path(temp), false)
      case _                          => ()
    }
  }
}

class AvroWriterFactory(schemaJson: String, avroSchemaJson: String, path: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AvroDataWriter(
      DataType.fromJson(schemaJson).asInstanceOf[StructType],
      new Schema.Parser().parse(avroSchemaJson),
      path,
      partitionId,
      taskId
    )
}

class AvroDataWriter(
    schema: StructType,
    avroSchema: Schema,
    path: String,
    partitionId: Int,
    taskId: Long
) extends DataWriter[InternalRow] {

  // dot-prefix: invisible to the reader's part-* listing until commit
  private val finalName = f"part-$partitionId%05d-$taskId.avro"
  private val tempPath = new Path(path, s".$finalName.tmp")
  private val finalPath = new Path(path, finalName)
  private val fs = tempPath.getFileSystem(new Configuration())
  private val out = fs.create(tempPath, true)
  private val writer = {
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](avroSchema))
    w.setCodec(CodecFactory.snappyCodec())
    w.create(avroSchema, out)
  }
  private val getters: Array[InternalRow => AnyRef] =
    schema.fields.zipWithIndex.map { case (f, i) =>
      AvroConvert.writer(f.dataType, i)
    }
  // running min/max per statable column, streamed alongside the encode —
  // the sidecar costs no second pass over the data
  private val trackers: Array[AvroStats.Tracker] =
    schema.fields.zipWithIndex.collect {
      case (f, i) if AvroStats.statable(f.dataType) =>
        new AvroStats.Tracker(f.name, f.dataType, i)
    }

  override def write(row: InternalRow): Unit = {
    val rec = new GenericData.Record(avroSchema)
    var i = 0
    while (i < getters.length) {
      rec.put(i, if (row.isNullAt(i)) null else getters(i)(row))
      i += 1
    }
    var t = 0
    while (t < trackers.length) { trackers(t).observe(row); t += 1 }
    writer.append(rec)
  }

  override def commit(): WriterCommitMessage = {
    writer.close() // closes the underlying stream too
    AvroCommitMessage(
      tempPath.toString,
      finalPath.toString,
      trackers.map(_.line(finalName)).toSeq
    )
  }

  override def abort(): Unit = {
    try writer.close()
    catch { case _: Exception => () }
    fs.delete(tempPath, false)
  }

  override def close(): Unit = ()
}

/** Per-type value converters, resolved once per reader/writer — the
  * row loop stays a flat array dispatch with no type matching.
  */
private[sources] object AvroConvert {

  def reader(dt: DataType): AnyRef => Any = dt match {
    case StringType =>
      v => UTF8String.fromString(v.asInstanceOf[CharSequence].toString)
    case BinaryType =>
      v => {
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val b = new Array[Byte](bb.remaining())
        bb.duplicate().get(b)
        b
      }
    // long/int/double/float/boolean (and timestamp-micros, already a
    // Long of µs — InternalRow's timestamp representation) pass through
    case _ => v => v
  }

  def writer(dt: DataType, i: Int): InternalRow => AnyRef = dt match {
    case LongType | TimestampType => r => java.lang.Long.valueOf(r.getLong(i))
    case IntegerType              => r => java.lang.Integer.valueOf(r.getInt(i))
    case DoubleType               => r => java.lang.Double.valueOf(r.getDouble(i))
    case FloatType                => r => java.lang.Float.valueOf(r.getFloat(i))
    case BooleanType              => r => java.lang.Boolean.valueOf(r.getBoolean(i))
    case StringType               => r => new Utf8(r.getUTF8String(i).getBytes)
    case BinaryType               => r => java.nio.ByteBuffer.wrap(r.getBinary(i))
    case other =>
      throw new IllegalArgumentException(s"graft-avro does not write ${other.sql}")
  }
}
