package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join helpers for skewed data.
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; explicit
  * salting is still the tool of choice when one key dominates a
  * shuffled-hash/aggregate path or when the skew is known up front (e.g. the
  * null key, or a handful of hot documents in dedup workloads).
  */
object Joins {

  /** Skew-safe inner equi-join of a large skewed frame against a smaller
    * one. The big side gets a deterministic per-row salt in [0, factor);
    * the small side is exploded `factor`× so every (key, salt) combination
    * matches. The hot key's rows then spread over `factor` shuffle
    * partitions instead of one.
    *
    * `saltSource` must be a deterministic per-row expression on `big`
    * (a distinguishing column, NOT rand() — retries would reshuffle rows).
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String,
      factor: Int, saltSource: Column): DataFrame = {
    val salted = big.withColumn("__graft_salt",
      pmod(xxhash64(saltSource), lit(factor.toLong)).cast("int"))
    val exploded = small.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(exploded, Seq(key, "__graft_salt")).drop("__graft_salt")
  }
}
