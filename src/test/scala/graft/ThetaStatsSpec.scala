package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.lake.{HllMap, LakeDataset}
import graft.model.StorageSpec

/** Theta TWINS in the sketch stat family ([[HllMap.ThetaPrefix]]): every
  * sketch-tracked column carries a per-part theta sketch beside its HLL, so
  * the catalog answers SET-ALGEBRA questions (partition overlap) zero-scan —
  * EXACTLY while groups stay under the sketch's nominal entries. This suite
  * pins the family discipline: append-fold exactness, mutation invalidation,
  * the manifest round trip, and the exact-regime overlap contract the
  * `lake_stats_theta_overlap` gate hash-checks against DuckDB.
  */
class ThetaStatsSpec extends SparkSpec {

  private def events: DataFrame =
    Fixtures.table(spark, sf(), "events")
      .select(col("event_type"), col("user_id"), col("event_id"))

  /** The exact pairwise matrix the catalog must reproduce in the exact
    * regime: (g_a, g_b, |A|, |B|, |A ∩ B|) over distinct (group, user).
    */
  private def exactMatrix(df: DataFrame): Set[(String, String, Long, Long, Long)] = {
    val d = df.select(col("event_type").as("g"), col("user_id").as("u"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
    val byG = d.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet }
    val gs = byG.keys.toSeq.sorted
    (for {
      i <- gs.indices; j <- (i + 1) until gs.length
      (a, b) = (gs(i), gs(j))
    } yield (a, b, byG(a).size.toLong, byG(b).size.toLong,
      (byG(a) & byG(b)).size.toLong)).toSet
  }

  test("theta twins ride every routing aggregation beside the HLL entry") {
    val root = java.nio.file.Files.createTempDirectory("graft_theta_tw").toString
    val ds = LakeDataset.fromDataFrame(spark, events,
      partitionCols = Seq("event_type"), sketchCols = Seq("user_id"),
      storage = Some(StorageSpec(root)))
    ds.toStorage()
    val m = graft.model.Manifest.read(root)
    assert(m.partSketches.nonEmpty)
    m.partSketches.foreach { case (rel, cols) =>
      assert(cols.contains("user_id"), s"$rel missing HLL entry")
      assert(cols.contains(HllMap.thetaKey("user_id")), s"$rel missing theta twin")
    }
  }

  test("zero-scan overlap is EXACT in the sparse regime, append folds included") {
    val ev = events
    val ds = LakeDataset.fromDataFrame(spark, ev.filter(col("event_id") % 2 === 0),
      partitionCols = Seq("event_type"), sketchCols = Seq("user_id"))
    // append the other half: the theta twins must UNION in losslessly
    ds.insert(ev.filter(col("event_id") % 2 === 1))
    val got = ds.metaPartitionOverlap("user_id", "event_type")
      .getOrElse(fail("pure-append history must stay metadata-answerable"))
      .toSet
    assert(got == exactMatrix(ev), "theta matrix must be exact under nominal")
  }

  test("delete invalidates the matrix; re-analyze re-tightens it") {
    val ds = LakeDataset.fromDataFrame(spark, events,
      partitionCols = Seq("event_type"), sketchCols = Seq("user_id"))
    assert(ds.metaPartitionOverlap("user_id", "event_type").isDefined)
    ds.deleteWhere(col("user_id") % 3 === 0)
    // a deleted row's retained hash cannot be subtracted — fail OPEN
    assert(ds.metaPartitionOverlap("user_id", "event_type").isEmpty,
      "post-delete sketches must not answer")
    ds.analyze()
    val got = ds.metaPartitionOverlap("user_id", "event_type")
      .getOrElse(fail("ANALYZE must re-tighten"))
      .toSet
    assert(got == exactMatrix(events.filter(col("user_id") % 3 =!= 0)))
  }

  test("NETNEW: first-seen counts zero-scan; exact in the sparse regime") {
    val ds = LakeDataset.fromDataFrame(spark, events,
      partitionCols = Seq("event_type"), sketchCols = Seq("user_id"))
    val got = ds.metaPartitionNetNew("user_id", "event_type")
      .getOrElse(fail("tight sketch-tracked table must answer"))
    // ground truth: a user is NET-NEW in the first (sorted) partition
    // value that saw them
    val d = events.select(col("event_type").as("g"), col("user_id").as("u"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
    val firstSeen = d.groupBy(_._2).map { case (u, xs) => u -> xs.map(_._1).min }
    val exactNet = firstSeen.groupBy(_._2).map { case (g, xs) => g -> xs.size.toLong }
    val exactDist = d.groupBy(_._1).map { case (g, xs) => g -> xs.length.toLong }
    got.foreach { case (g, dist, net) =>
      assert(dist == exactDist(g), s"$g distinct")
      assert(net == exactNet.getOrElse(g, 0L), s"$g net-new")
    }
    assert(got.map(_._1) == got.map(_._1).sorted, "values must emit in order")
    // untracked column / non-partition column refuse (fail open)
    assert(ds.metaPartitionNetNew("event_id", "event_type").isEmpty)
    assert(ds.metaPartitionNetNew("user_id", "user_id").isEmpty)
  }

  test("manifest round-trips the theta twins under the tightness vouch") {
    val root = java.nio.file.Files.createTempDirectory("graft_theta_rt").toString
    val ds = LakeDataset.fromDataFrame(spark, events,
      partitionCols = Seq("event_type"), sketchCols = Seq("user_id"),
      storage = Some(StorageSpec(root)))
    ds.toStorage()
    val re = LakeDataset.fromStorage(spark, root)
    val got = re.metaPartitionOverlap("user_id", "event_type")
      .getOrElse(fail("reloaded tight parts must answer zero-scan"))
      .toSet
    assert(got == exactMatrix(events))
    // and the reloaded twins keep folding: append once more, still exact
    re.insert(events.limit(0)) // no-op append is fine
    assert(re.metaPartitionOverlap("user_id", "event_type").isDefined)
  }
}
