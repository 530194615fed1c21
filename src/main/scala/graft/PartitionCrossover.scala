package graft

import org.apache.spark.sql.SparkSession

/** Measurement main for SCALE.md's registration-crossover table: at
  * what partition count does catalog registration via ADD PARTITION DDL
  * (`Partitions.registerAll`, batched 500 specs/statement) lose to a
  * filesystem-walking `MSCK REPAIR TABLE` (`Partitions.repair`)?
  *
  * Synthesizes an empty two-level account=/dt= layout (registration and
  * MSCK both read DIRECTORIES; data files are irrelevant to the
  * measurement), creates a partitioned parquet table over it, and times
  * three strategies per N: batched registerAll, per-partition DDL (the
  * pre-r12 shape, capped at 10k — beyond that it is minutes of catalog
  * round trips and the point is made), and MSCK. Prints one JSON line
  * per N. Run QUIET (the bench-box discipline); numbers land in
  * SCALE.md's "Known scale limits" entry.
  *
  * Usage: tools/run_main.sh graft.PartitionCrossover [N ...]
  * (defaults: 1000 10000 50000)
  */
object PartitionCrossover {

  private def makeLayout(root: java.io.File, n: Int): Unit = {
    // 100 accounts × n/100 dts — the reference's fan-out shape
    val accounts = 100
    val dts = math.max(1, n / accounts)
    (0 until accounts).foreach { a =>
      val ad = new java.io.File(root, f"account=$a%012d")
      ad.mkdirs()
      (0 until dts).foreach { d =>
        new java.io.File(ad, f"dt=2020-01-01-$d%06d").mkdirs()
      }
    }
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val ns = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1000, 10000, 50000)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "graft-partition-crossover")
    ns.foreach { n =>
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_pcross_$n")
        .toFile
      TempDirs.deleteOnExit(root.getPath)
      val (_, tLayout) = timed(makeLayout(root, n))

      def makeTable(name: String): Unit =
        spark.sql(
          s"""CREATE TABLE $name (bytes BIGINT, account STRING, dt STRING)
             |USING PARQUET PARTITIONED BY (account, dt)
             |LOCATION '${root.getPath}'""".stripMargin
        )

      // batched registerAll (the production path since r12)
      makeTable(s"pcross_reg_$n")
      val (regCount, tReg) =
        timed(catalog.Partitions.registerAll(spark, s"pcross_reg_$n", root.getPath))

      // per-partition DDL (the pre-r12 shape) — capped: the point is made
      val tPer: Double =
        if (n > 10000) -1.0
        else {
          makeTable(s"pcross_per_$n")
          val keys = spark.sql(s"SHOW PARTITIONS pcross_reg_$n").collect()
          val (_, t) = timed {
            keys.foreach { r =>
              val Array(a, d) = r.getString(0).split("/").map(_.split("=")(1))
              spark.sql(
                s"ALTER TABLE pcross_per_$n ADD IF NOT EXISTS PARTITION " +
                  s"(account='$a', dt='$d')"
              )
            }
          }
          t
        }

      // MSCK
      makeTable(s"pcross_msck_$n")
      val (_, tMsck) = timed(catalog.Partitions.repair(spark, s"pcross_msck_$n"))
      val msckCount =
        spark.sql(s"SHOW PARTITIONS pcross_msck_$n").count()

      println(
        f"""{"n":$n,"layout_sec":$tLayout%.2f,"register_batched_sec":$tReg%.2f,""" +
          f""""register_per_partition_sec":$tPer%.2f,"msck_sec":$tMsck%.2f,""" +
          f""""registered":$regCount,"msck_registered":$msckCount}"""
      )
      Seq("reg", "per", "msck").foreach { k =>
        spark.sql(s"DROP TABLE IF EXISTS pcross_${k}_$n")
      }
    }
    spark.stop()
  }
}
