package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall gates for the APPROXIMATE retrieval surfaces (IVF probes, PQ ADC,
  * MinHash LSH): every approximate operator in this repo has an exact twin
  * that is oracle-checked for plumbing correctness, but plumbing checks
  * can't see a QUALITY regression — a quantizer change that silently drops
  * recall@k from 0.98 to 0.6 passes every row/schema/hash gate. This
  * operator turns measured recall into a correctness gate.
  *
  * Shape: compare the approximate result's key set against the exact
  * twin's, micro-averaged (total hits / total truth, in exact integer
  * permille), and fold the judgment into ONE status row `(status, truth)`:
  * `ok` when recall clears `minPermille`, `recall_below_threshold` when it
  * doesn't, `truth_too_small` when the truth set is smaller than
  * `minTruth` (a coverage sentinel: an empty or shrunken truth set means
  * the fixture broke, and "0/0 recall" must not read as healthy). The
  * truth COUNT is derivable by an ANSI oracle (it is the exact twin's own
  * cardinality), so `SELECT 'ok', <exact-twin count>` is a full oracle:
  * any recall regression flips the status and hash-mismatches, any fixture
  * break flips it too, and a truth-side drift moves the count.
  *
  * Scale shape: two key-projected distincts, one equi-join on the key
  * tuple, one global aggregate — every wide op shuffles on the key, the
  * output is one row. The measured sets are whatever the caller passes; at
  * 100 TB the caller samples the query set, not this operator.
  */
object Recall {

  /** One-row recall judgment of `approx` against ground truth `exact` on
    * the key tuple `keyCols`. Columns: (status, truth).
    *
    * Null keys: a truth row with a NULL key component can never match
    * (SQL join semantics) — it counts toward `truth` and permanently
    * depresses recall, which is the conservative direction (a gate can
    * only read healthier than reality by EXCLUDING truth, never by null
    * keys). Retrieval keys here are ids/top-k members and non-null by
    * construction; pass keys through `coalesce` first if yours are not.
    */
  def gate(
      approx: DataFrame, exact: DataFrame, keyCols: Seq[String],
      minPermille: Long, minTruth: Long): DataFrame = {
    require(keyCols.nonEmpty, "recall needs at least one key column")
    require(minPermille > 0 && minPermille <= 1000,
      s"minPermille must be in (0, 1000]: $minPermille")
    require(minTruth > 0, s"minTruth must be positive: $minTruth")
    val a = approx.select(keyCols.map(col): _*).distinct()
      .withColumn("__hit", lit(1L))
    val e = exact.select(keyCols.map(col): _*).distinct()
    // one row always, even on empty truth (count over zero rows is 0)
    e.join(a, keyCols, "left")
      .agg(count(lit(1)).as("truth"),
        coalesce(sum("__hit"), lit(0L)).as("hits"))
      .withColumn("recall_permille",
        when(col("truth") > 0, expr("(1000 * hits) div truth"))
          .otherwise(lit(0L)))
      .select(
        when(col("truth") < minTruth, lit("truth_too_small"))
          .when(col("recall_permille") < minPermille,
            lit("recall_below_threshold"))
          .otherwise(lit("ok")).as("status"),
        col("truth"))
  }
}
