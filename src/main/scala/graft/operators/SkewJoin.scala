package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A hot key (one aircraft transmitting at 100× the fleet rate, one
  * customer with a million orders) lands an entire shuffle partition on
  * one task. Salting splits each left-side key into `salts` sub-keys
  * and replicates the right side once per salt, so the hot key spreads
  * over `salts` tasks. This is the manual fallback for the cases AQE's
  * runtime skew-join splitting doesn't cover (e.g. aggregations after
  * the join, or non-sort-merge plans).
  *
  * The left salt is derived from row content (xxhash64 of all left
  * columns), not `rand()` — deterministic retries/recomputes, which
  * matters for exactly-once sinks at scale.
  */
object SkewJoin {

  /** Inner equi-join `left ⋈ right` on `key`, with the left side salted
    * `salts` ways and the right side replicated per salt.
    */
  def salted(left: DataFrame, right: DataFrame, key: String,
             salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*),
        lit(salts.toLong)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }
}
