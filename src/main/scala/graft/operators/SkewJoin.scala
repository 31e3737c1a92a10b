package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation for equi-joins (SURVEY.md §4; the builder
  * mandate names salting beside AQE). AQE's skew-join split handles
  * most cases at runtime; salting is the explicit tool for when a
  * handful of hot keys still pins single tasks — e.g. a power-law
  * user_id joined against a per-user dimension at 100 TB.
  */
object SkewJoin {

  /** Inner/left equi-join with the skewed side salted `saltFactor`
    * ways: each skewed row gets a deterministic salt (hash of the
    * whole row — stable under retry/repartition, unlike rand() or
    * monotonically_increasing_id), the other side replicates once per
    * salt value, and the join key becomes (keys, salt) — a hot key's
    * rows spread over `saltFactor` tasks instead of one.
    *
    * Cost model: the other side shuffles `saltFactor`× its size, so
    * keep it the smaller side. Only `inner` and `left` (skewed side
    * preserved) are semantically sound here — the replicated side's
    * unmatched rows would appear `saltFactor` times under right/full.
    */
  def saltedJoin(
      skewed: DataFrame, other: DataFrame, keys: Seq[String],
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    require(Set("inner", "left", "left_outer").contains(joinType),
      s"salting preserves only the skewed side; '$joinType' would duplicate " +
        "unmatched replicated rows (use inner or left)")
    val salt = "_gr_salt"
    val salted = skewed.withColumn(salt,
      pmod(xxhash64(skewed.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val replicated = other.withColumn(salt,
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, keys :+ salt, joinType).drop(salt)
  }
}
