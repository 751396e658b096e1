package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic shard export — the last stage of a training-data pipeline:
  * write a corpus as N shards whose ASSIGNMENT and per-shard ORDER are pure
  * functions of the data, so a re-run over the same input produces
  * comparable shards (resumable exports, reproducible training runs,
  * diffable re-exports after an upstream fix).
  *
  * Scale shape: ONE shuffle (repartition by shard id) and a sorted write —
  * no global sort, no driver-side pass. Each shard's rows land in exactly
  * one task (the shard id is the partitioning key), so each `shard=k`
  * directory holds one deterministic file regardless of cluster size.
  */
object Export {

  /** Shard id expression. `hashed=true` spreads arbitrary/clustered ids
    * uniformly via xxhash64; `hashed=false` uses the id's own residue
    * (portable arithmetic — any engine can recompute the assignment).
    */
  def shardColumn(idCol: Column, nShards: Int, hashed: Boolean = true): Column =
    if (hashed) pmod(xxhash64(idCol), lit(nShards.toLong))
    else pmod(idCol, lit(nShards.toLong))

  /** Per-shard route values whose HASH partition is exactly the shard id.
    *
    * `repartition(n, col("shard"))` maps a shard through
    * `murmur3(shard) % n`, which is NOT the identity — two shard ids can
    * collide into one task while other tasks sit empty (up to half the
    * write parallelism lost at large nShards), and range partitioning can't
    * pin it either (its sampled boundaries merge small shards). Instead,
    * invert the partitioner on the driver: for each shard k find a long
    * `r_k` with `murmur3(r_k) % n == k` — the exact Catalyst expression the
    * exchange evaluates — and route rows through `r_shard`. Expected cost
    * is n·ln(n) driver-side hash evals (coupon collector); the result is a
    * bijection, so EVERY task holds exactly one shard, always.
    */
  private[graft] def routeFor(nShards: Int): Array[Long] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash, Pmod}
    val out = new Array[Long](nShards)
    val found = new Array[Boolean](nShards)
    var remaining = nShards
    var cand = 0L
    while (remaining > 0) {
      val part = Pmod(new Murmur3Hash(Seq(Literal(cand))), Literal(nShards))
        .eval(null).asInstanceOf[Int]
      if (!found(part)) { found(part) = true; out(part) = cand; remaining -= 1 }
      cand += 1L
    }
    out
  }

  /** Write `df` as `root/shard=K/` parquet shards, deterministically:
    * assignment by [[shardColumn]] over `idCol`, rows within a shard
    * ordered by (xxhash64(id), id) — an order that is stable, input-order-
    * independent, and uncorrelated with any data column (a free global
    * shuffle: training consumers reading shards sequentially see
    * hash-randomized document order, no "sorted by source" bias).
    * One shuffle, and via [[routeFor]] exactly one task per shard — full
    * write parallelism at any nShards. Returns the re-read of the written
    * tree — the caller summarizes or validates actual persisted bytes, not
    * the pre-write plan.
    */
  def shardedWrite(df: DataFrame, idCol: String, nShards: Int, root: String,
      hashed: Boolean = true, format: String = "parquet"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val withShard = df.withColumn("shard", shardColumn(col(idCol), nShards, hashed))
    val route = routeFor(nShards)
    withShard
      .repartition(nShards, element_at(lit(route), col("shard").cast("int") + 1))
      .sortWithinPartitions(col("shard"), xxhash64(col(idCol)), col(idCol))
      .write.mode("overwrite").partitionBy("shard").format(format).save(root)
    // `format("json")` writes JSONL (one object per line) — the standard
    // LLM-training interchange shape; read back with the WRITTEN schema so
    // inference can neither retype columns nor drop all-null ones.
    val reader = df.sparkSession.read.option("basePath", root)
    (if (format == "parquet") reader
     else reader.schema(org.apache.spark.sql.types.StructType(
       withShard.schema.fields.filterNot(_.name == "shard"))))
      .format(format).load(root)
  }
}
