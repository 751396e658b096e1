package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Frequent-value (heavy-hitter) discovery — vocabulary audits, skew-key
  * detection before a join, boilerplate-token spotting.
  *
  * Two paths:
  *   - [[topK]]: the exact plan — one hash aggregation (map-side combined)
  *     + TakeOrdered. Shuffle volume is the DISTINCT value count, which is
  *     the right plan until the distinct count itself is the problem.
  *   - [[topKCandidates]]: for high-cardinality columns. Pass 1 counts
  *     each partition LOCALLY (per-partition hash map, no shuffle — this
  *     is the rare per-partition imperative case where `mapPartitions`
  *     beats any relational spelling) and emits only its local top-c, so
  *     ≤ partitions·c candidate rows cross the wire instead of the whole
  *     vocabulary. Pass 2 counts ONLY the candidates exactly (broadcast
  *     membership filter pushes to the scan) and takes the top-k.
  *
  * Candidate guarantee (pigeonhole): if a value fails the local top-c in
  * EVERY partition, each partition holds ≥ (c+1)× its local count, so its
  * global count ≤ N/(c+1). Contrapositive: every value with global count
  * > N/(c+1) IS a candidate — so the reported top-k is EXACT whenever the
  * true k-th count exceeds N/(c+1) (callers size c accordingly; at 100 TB
  * c=10k per partition bounds pass-1 output to partitions·10k rows while
  * covering everything above a 0.01% frequency).
  */
object HeavyHitters {

  /** Exact top-k values by count (ties broken by value ascending). */
  def topK(df: DataFrame, valueCol: String, k: Int): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("value"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("value"))
      .limit(k)

  /** Union of per-partition local top-c values — pass 1 of
    * [[topKCandidates]], exposed for sizing experiments.
    */
  def localCandidates(df: DataFrame, valueCol: String, c: Int): Dataset[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("string")).as[String]
      .mapPartitions { it =>
        val counts = new java.util.HashMap[String, Long]()
        it.foreach(v => counts.merge(v, 1L, _ + _))
        import scala.jdk.CollectionConverters._
        counts.asScala.toSeq
          .sortBy { case (v, n) => (-n, v) }
          .take(c).map(_._1).iterator
      }
      .distinct()
  }

  /** Candidate-pruned top-k (exact above the N/(c+1) frequency floor —
    * scaladoc above). Output matches [[topK]] when the k-th true count
    * clears the floor.
    */
  def topKCandidates(df: DataFrame, valueCol: String, k: Int, c: Int): DataFrame = {
    val cand = localCandidates(df, valueCol, c).toDF("value")
    df.filter(col(valueCol).isNotNull)
      .join(broadcast(cand), col(valueCol) === col("value"), "left_semi")
      .groupBy(col(valueCol).as("value"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("value"))
      .limit(k)
  }
}
