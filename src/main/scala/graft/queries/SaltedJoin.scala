package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins: when a handful of hot keys dominate a
  * shuffle (the classic 100 TB failure mode), split each hot fact row
  * across `saltFactor` sub-keys and replicate the dimension side once per
  * sub-key. AQE's skew-join handles moderate skew automatically; explicit
  * salting is the tool when one key is so hot a single task would still
  * exceed executor memory.
  */
object SaltedJoin {

  /** Inner equi-join `fact ⋈ dim` on `key`, salted. The salt hashes the
    * fact row's own columns, so it is stable under task retry (a
    * row-id-based salt would re-randomize on recomputation and corrupt a
    * recovered shuffle); the dim side is exploded `saltFactor`× — keep it
    * the smaller input.
    */
  def inner(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltFactor: Int
  ): DataFrame = {
    require(saltFactor > 0)
    val saltedFact = fact.withColumn(
      "_graft_salt",
      pmod(xxhash64(fact.columns.toIndexedSeq.map(col): _*), lit(saltFactor))
        .cast("int")
    )
    val expandedDim = dim.withColumn(
      "_graft_salt",
      explode(array((0 until saltFactor).map(lit): _*))
    )
    saltedFact
      .join(expandedDim, Seq(key, "_graft_salt"))
      .drop("_graft_salt")
  }
}
