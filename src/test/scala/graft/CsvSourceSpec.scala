package graft

import graft.etl.CsvSource
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** CsvSource routing semantics + a full closed-form replay of the q66
  * gate aggregates (the generative formula recomputed in plain Scala).
  */
class CsvSourceSpec extends SparkSpec {

  private val schema = StructType(
    Seq(
      StructField("id", LongType),
      StructField("cat", StringType),
      StructField("score", LongType)
    )
  )

  test("type-corrupt rows quarantine with the raw line; quoting survives") {
    val dir = TempDirs.deleteOnExit(
      java.nio.file.Files.createTempDirectory("graft_csv_spec").toString
    )
    import spark.implicits._
    Seq(
      "1,\"a,b\",10", // good: quoted delimiter inside cat
      "2,plain,oops", // corrupt: non-numeric long
      "3,plain,",     // good: empty score → null, NOT corrupt
      "4,\"x\",40"
    ).toDF("value").coalesce(1).write.mode("overwrite").text(dir)

    val r = CsvSource.read(spark, dir, schema)
    val good = r.good.collect().map(x => (x.getLong(0), x.getString(1))).toSet
    assert(good == Set((1L, "a,b"), (3L, "plain"), (4L, "x")))
    assert(
      r.good.where("id = 3").collect().head.isNullAt(2),
      "empty score must be null, not corrupt"
    )
    val q = r.quarantined.collect().map(_.getString(0)).toSet
    assert(q == Set("2,plain,oops"), s"quarantine got $q")
    r.release()
  }

  test("q66 gate aggregates replay from the generative formula") {
    val lines = 20000L
    val rows = (0L until lines).map { i =>
      val corrupt = i % 7 == 3
      val cat = if (corrupt) "_corrupt" else s"c,${i % 5}"
      val score: Option[Long] =
        if (corrupt || i % 13 == 5) None else Some(i * 3)
      (cat, score)
    }
    val expected = rows
      .groupBy(_._1)
      .map { case (cat, rs) =>
        if (cat == "_corrupt") (cat, rs.size.toLong, None: Option[Long], None: Option[Long])
        else
          (
            cat,
            rs.size.toLong,
            Some(rs.flatMap(_._2).sum),
            Some(rs.count(_._2.isEmpty).toLong)
          )
      }
      .toSeq
      .sortBy(_._1)

    val got = SparkEntry
      .queries("q66_csv_ingest")(spark, "/root/testdata/sf0.001")
      .collect()
      .map { r =>
        (
          r.getString(0),
          r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3))
        )
      }
      .toSeq
    assert(got == expected)
  }
}
