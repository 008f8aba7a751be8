package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew-salting for equi-joins on a hot key.
  *
  * AQE's runtime skew split handles most skew, but it only applies to
  * sort-merge joins inside one adaptive stage; a join that feeds a
  * streaming sink, reuses a cached side, or must co-partition with a
  * later stage can still funnel a hot key through one task. Salting
  * fixes that structurally: the skewed side's key becomes
  * (key, salt∈[0,S)) and the other side is replicated ×S with every
  * salt, so a hot key's rows spread over S tasks.
  *
  * The salt must be DETERMINISTIC (derived from a column, not rand())
  * so retried tasks and the DuckDB-style oracle comparisons stay
  * stable. Cost model: replicating the build side ×S is worth it when
  * hot-key rows ≫ build rows × S — the classic fact⋈fact skew shape.
  */
object SaltedJoin {

  /** Inner equi-join of `skewed` and `other` on `key`, with the
    * skewed side salted into `salts` sub-keys by hashing `saltBy`
    * (any column that spreads the hot key's rows, e.g. its event id). */
  def apply(skewed: DataFrame, other: DataFrame, key: String,
    salts: Int, saltBy: Column): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(!skewed.columns.contains("__salt") && !other.columns.contains("__salt"),
      "inputs already carry a __salt column; rename it before salting")
    val l = skewed.withColumn("__salt", pmod(xxhash64(saltBy), lit(salts.toLong)))
    val r = other.withColumn("__salt",
      explode(expr(s"sequence(0L, ${salts - 1}L)")))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
