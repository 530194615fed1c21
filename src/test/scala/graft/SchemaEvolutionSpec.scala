package graft

import graft.catalog.SchemaEvolution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Widening-schema store: v2 files next to v3 files (extra vpcid
  * column), read as one table three ways.
  */
class SchemaEvolutionSpec extends SparkSpec {

  private def writeGenerations(base: String): Unit = {
    import spark.implicits._
    // v2 generation: the reference's record shape (subset of columns)
    Seq((1, "111111111111", 100), (2, "111111111111", 200))
      .toDF("version", "accountid", "bytes")
      .write
      .parquet(s"$base/dt=2024-01-01")
    // v3 generation adds vpcid
    Seq((3, "222222222222", 300, "vpc-abc"))
      .toDF("version", "accountid", "bytes", "vpcid")
      .write
      .parquet(s"$base/dt=2024-01-02")
  }

  test("merged discovery, explicit-schema steady read, and name union agree") {
    val base = tmpDir("graft-evolve")
    writeGenerations(base)

    // discovery: footer union finds the widened schema
    val merged = SchemaEvolution.discoverMerged(spark, base)
    assert(merged.columns.toSet == Set("version", "accountid", "bytes", "vpcid", "dt"))
    assert(merged.count() == 3)
    assert(merged.filter(col("vpcid").isNull).count() == 2) // v2 rows

    // steady state: declared canonical schema, no mergeSchema pass —
    // same values, and pushdown on a common column still prunes
    val canonical = StructType(
      Seq(
        StructField("version", IntegerType),
        StructField("accountid", StringType),
        StructField("bytes", IntegerType),
        StructField("vpcid", StringType)
      )
    )
    val steady = SchemaEvolution.readWithSchema(spark, canonical, base)
    assert(
      steady.select("version", "accountid", "bytes", "vpcid").collect().toSet ==
        merged.select("version", "accountid", "bytes", "vpcid").collect().toSet
    )
    val v3 = steady.filter(col("vpcid") === "vpc-abc")
    assert(v3.count() == 1 && v3.collect()(0).getAs[Int]("bytes") == 300)

    // frame-level: unionByName fills the missing column with nulls and
    // never mismatches on position
    val a = spark.read.parquet(s"$base/dt=2024-01-01")
    val b = spark.read.parquet(s"$base/dt=2024-01-02").select(
      col("vpcid"), col("version"), col("accountid"), col("bytes") // reordered
    )
    val u = SchemaEvolution.unionEvolved(Seq(a, b))
    assert(u.count() == 3)
    assert(u.filter(col("vpcid").isNotNull).count() == 1)
    assert(u.agg(sum("bytes")).collect()(0).getLong(0) == 600)
  }
}
