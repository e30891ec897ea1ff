package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-strategy helpers for the skew cases the planner can't fix.
  *
  * AQE's skew-join split handles a skewed SHUFFLE side (it splits
  * oversized partitions and replicates the other side's matching
  * partition), but it works at partition granularity AFTER the
  * shuffle — when one join KEY alone carries a large share of the
  * rows AND the other side is too big to broadcast, explicit SALTING
  * is the remaining lever: append a salt in [0, S) to the skewed
  * side's key, replicate each matching row of the other side S times
  * (one per salt value), and equi-join on (key, salt). Every original
  * match survives exactly once (the replicated side carries each salt
  * once), and the hot key's rows now spread across S reducer
  * partitions. Cost: S× replication of the (smaller) replicated side
  * — the knob trades its duplication against the hot partition's
  * width, which is why it is a per-pipeline decision, not a default.
  */
object Joins {

  /** Inner equi-join of `skewed` and `other` on `key`, salted S ways:
    * the skewed side hashes each row to one salt (no replication);
    * `other` replicates into all S salts. Result equals
    * `skewed.join(other, Seq(key))` row-for-row (spec-pinned). The
    * salt derives from a hash of the skewed side's whole row id
    * expression `rowId` so it is deterministic and
    * partitioning-independent. The salt column name is generated to
    * miss every column of BOTH inputs — `withColumn` silently
    * REPLACES an existing column of the same name, which would
    * corrupt the join with no error if a caller's frame already
    * carried a column named like the salt. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 rowId: Column, salts: Int): DataFrame = {
    val taken = (skewed.columns ++ other.columns).toSet
    val saltCol = Iterator.from(0).map(i => s"__salt$i").find(!taken(_)).get
    val salted = skewed.withColumn(saltCol, pmod(hash(rowId), lit(salts)))
    val replicated = other.withColumn(saltCol,
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, saltCol)).drop(saltCol)
  }
}
