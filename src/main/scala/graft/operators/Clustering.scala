package graft.operators

import graft.functions.ZOrderKey
import graft.lake.LakeDataset
import graft.model.StorageSpec
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional clustering layouts (Z-order), the write-side half of
  * zone-map data skipping.
  *
  * A table partitioned (or sorted) by ONE column gives tight per-part
  * [min,max] intervals on that column only — range queries on any other
  * column scan everything. Z-ordering interleaves the quantile-rank bits of
  * N columns into one layout key ([[graft.functions.ZOrderKey]]) and bins
  * rows by its top bits: each bin is a contiguous region of the Z-curve, so
  * every clustered column's values inside one bin span only ~1/2^(bits used
  * for that column) of its range — the per-cell zone maps
  * ([[graft.lake.ZoneMap]]) become selective on ALL clustered columns at
  * once, and the existing engine pruning (Scala and SQL paths alike) skips
  * bins with no further machinery.
  *
  * Scale shape: one `approxQuantile` pass for the boundaries (driver holds
  * 2^bits doubles per column), then the layout key is a codegen'd per-row
  * expression and the binning rides the dataset's normal cell routing — one
  * shuffle by bin, no global sort (a total `orderBy` would range-partition
  * and sort 100 TB; Z-binning only exchanges by the computed bin id).
  */
object Clustering {

  /** Quantile cut points for each clustered column — ONE statistics pass over
    * all columns. `relativeError` trades pass cost for boundary precision;
    * boundaries only steer layout, never query answers.
    */
  def zorderBounds(df: DataFrame, cols: Seq[String], bits: Int,
      relativeError: Double = 0.001): Array[Array[Double]] = {
    require(cols.nonEmpty, "need at least one clustering column")
    val probs = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    val casted = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
    val raw = casted.stat.approxQuantile(cols.toArray, probs, relativeError)
    // A column with no non-null values yields an empty array — substitute
    // all-zero cut points (every value ranks 0; the column contributes no
    // layout bits, which is exactly right for an empty column).
    raw.map(b => if (b.length == probs.length) b else Array.fill(probs.length)(0.0))
  }

  /** The Z-order layout key for `cols` with precomputed boundaries. */
  def zorderKey(cols: Seq[String], bounds: Array[Array[Double]], bits: Int): Column =
    ZOrderKey(cols.map(col), bounds, bits)

  /** A Z-order-clustered lake plus the layout recipe that built it. Later
    * batches must bin with the SAME boundary snapshot: zones widen soundly
    * either way, but rows binned against different boundaries land outside
    * their Z-region and erode pruning selectivity. [[insert]] routes new
    * rows with the build-time recipe — continuous ingest keeps the
    * clustered layout at cost ∝ batch, never a re-sort. (If the data
    * distribution drifts far from the boundary snapshot, rebuild the
    * layout offline — the same recluster-is-maintenance stance as IVF.)
    */
  final case class ZOrderedLake(
      dataset: LakeDataset,
      cols: Seq[String],
      bounds: Array[Array[Double]],
      bits: Int,
      nBins: Int,
      binCol: String) {

    /** Append the bin column to a new batch using the build-time recipe. */
    def bin(df: DataFrame): DataFrame = {
      val totalBits = bits * cols.length
      val binBits = java.lang.Integer.numberOfTrailingZeros(nBins)
      df.withColumn(binCol,
        shiftright(zorderKey(cols, bounds, bits), totalBits - binBits).cast("int"))
    }

    // Post-build insert volume per bin — the boundary-health signal.
    // Maintained from the CATALOG's per-cell counters (a before/after diff
    // around the insert), so monitoring costs zero extra data passes.
    private val recentCounts = scala.collection.concurrent.TrieMap[Int, Long]()
    private val recentTotal = new java.util.concurrent.atomic.AtomicLong(0L)

    private def binRows(): Map[Int, Long] = dataset.partKeys.flatMap { k =>
      k.partValues.collectFirst {
        case (c, v) if c == binCol && v != null => v.toInt
      }.map(b => b -> dataset.partRows(k))
    }.toMap

    /** Ingest a batch: route rows to their Z-region (one exchange by bin,
      * cost ∝ batch — never a layout rebuild). Updates the drift monitor
      * from the catalog's counters.
      */
    def insert(df: DataFrame): Unit = this.synchronized {
      val before = binRows()
      dataset.insert(bin(df))
      binRows().foreach { case (b, n) =>
        val d = n - before.getOrElse(b, 0L)
        if (d > 0L) {
          recentCounts.updateWith(b)(old => Some(old.getOrElse(0L) + d))
          recentTotal.addAndGet(d)
        }
      }
    }

    /** Boundary health: the fraction of POST-BUILD inserted rows that
      * landed in the `topK` hottest bins. Under the build-time boundary
      * snapshot a non-drifting stream spreads ~uniformly (score ≈
      * topK/nBins); a drifted stream (values beyond the old quantiles all
      * rank into the edge bins) concentrates — the layout still ingests
      * and prunes SOUNDLY, but the hot bins' zones widen and stop
      * skipping. Driver-side fold over the monitor map; no jobs.
      */
    def driftScore(topK: Int = math.max(1, nBins / 16)): Double = {
      val total = recentTotal.get
      if (total == 0L) 0.0
      else recentCounts.values.toSeq.sortBy(-_).take(topK).sum.toDouble / total
    }

    /** Whether recent inserts concentrate more than `factor`× the uniform
      * expectation — the "rebuild the layout" signal.
      */
    def drifted(topK: Int = -1, factor: Double = 4.0): Boolean = {
      val k = if (topK > 0) topK else math.max(1, nBins / 16)
      recentTotal.get > 0L && driftScore(k) > factor * k.toDouble / nBins
    }

    /** Rebuild the layout over the CURRENT contents with FRESH quantile
      * boundaries — the drift answer, mirroring the IVF recluster: one
      * table pass (statistics + re-bin exchange), no global sort. Returns
      * the new lake (monitor reset); the receiver stays valid, callers
      * swap references like [[graft.lake.LakeDataset.relayout]].
      */
    def relayout(spark: SparkSession,
        relativeError: Double = 0.001): ZOrderedLake =
      zorderLake(spark, dataset.toDF.drop(binCol), cols, bits, nBins, binCol,
        dataset.storage, relativeError)
  }

  /** Build a Z-order-clustered [[LakeDataset]]: rows are binned by the top
    * `log2(nBins)` bits of their Z-key into a `binCol` partition column, so
    * each bin is one partition directory with tight zone intervals on every
    * clustered column. `nBins` must be a power of two and is the layout's
    * file-count knob — at cluster scale pick `nBins` so a bin is a few GB.
    */
  def zorderLake(
      spark: SparkSession,
      df: DataFrame,
      cols: Seq[String],
      bits: Int = 8,
      nBins: Int = 64,
      binCol: String = "zbin",
      storage: Option[StorageSpec] = None,
      relativeError: Double = 0.001): ZOrderedLake = {
    require(nBins >= 2 && (nBins & (nBins - 1)) == 0, s"nBins must be a power of two, got $nBins")
    val binBits = java.lang.Integer.numberOfTrailingZeros(nBins)
    val totalBits = bits * cols.length
    require(binBits <= totalBits,
      s"log2(nBins)=$binBits exceeds the $totalBits z-key bits")
    require(!df.columns.contains(binCol),
      s"clustered input already has a '$binCol' column")
    val bounds = zorderBounds(df, cols, bits, relativeError)
    val recipe = ZOrderedLake(null, cols, bounds, bits, nBins, binCol)
    val ds = LakeDataset.fromDataFrame(spark, recipe.bin(df),
      partitionCols = Seq(binCol), storage = storage)
    recipe.copy(dataset = ds)
  }
}
