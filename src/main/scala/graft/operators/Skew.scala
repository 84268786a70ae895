package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities for hot keys.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default) handles most skew at runtime; explicit salting is
  * for the pathological producer-side case — a join key carrying a
  * significant fraction of all rows (e.g. a null-ish default FK, a
  * celebrity entity) where even a split partition floods one task.
  *
  * `saltedJoin` replicates the (small) right side `salt` times and
  * scatters the left side uniformly, so a hot key's rows spread over
  * `salt` tasks. Equivalent rows to a plain equi-join — property-
  * checked in SkewSpec.
  */
object Skew {

  /** Left-skew-resistant inner/left equi-join on one key column.
    *
    * @param left   large, possibly skewed side
    * @param right  smaller side (replicated `salt` times)
    * @param key    join column name present on both sides
    * @param salt   number of splits for hot keys (e.g. 16)
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt > 0)
    // scatter: deterministic-ish uniform bucket per left row
    val l = left.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salt)))
    val r = right.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
