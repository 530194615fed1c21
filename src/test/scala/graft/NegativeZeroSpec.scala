package graft

import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Guards the signed-zero parity convention (Relational's Scaladoc):
  * DuckDB's round preserves the IEEE sign bit (round(-2e-5, 4) = -0.0)
  * while Spark's BigDecimal round returns +0.0 — numerically equal values
  * that hash differently in the driver's gate (the r7 q20d failure).
  * Negative-capable rounded metrics therefore add `+ 0.0` on BOTH engines.
  *
  * This spec enforces the Spark half across the whole inventory: no query
  * may emit a -0.0 bit pattern in any double/float column. The DuckDB
  * half is structural (`+ 0.0` spelled in the oracle SQL) and replayed
  * bit-exactly by tools/verify_local.py's repr-based compare.
  */
class NegativeZeroSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val negZeroBits = java.lang.Double.doubleToRawLongBits(-0.0d)

  test("no query emits an IEEE -0.0 in any floating-point column") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val floatCols = df.schema.fields.zipWithIndex.collect {
        case (f, i) if f.dataType == DoubleType || f.dataType == FloatType =>
          (f.name, i, f.dataType)
      }
      if (floatCols.nonEmpty) {
        df.collect().foreach { row =>
          floatCols.foreach { case (cname, i, dt) =>
            if (!row.isNullAt(i)) {
              val bits = dt match {
                case DoubleType =>
                  java.lang.Double.doubleToRawLongBits(row.getDouble(i))
                case _ =>
                  java.lang.Double.doubleToRawLongBits(row.getFloat(i).toDouble)
              }
              assert(
                bits != negZeroBits,
                s"$name.$cname emitted -0.0 — wrap the round in `+ 0.0` on both engines"
              )
            }
          }
        }
      }
    }
  }
}
