package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.lake.{Bloom, LakeDataset}
import graft.model.StorageSpec

/** Per-part key Bloom filters: membership pruning for the probe paths that
  * range zones can never help (hash-scattered keys span every part's whole
  * [min,max] interval).
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  /** Keys deliberately SCATTERED across partitions: every partition holds
    * keys across the full 0..n range, so zone intervals are useless for key
    * probes — the regime blooms exist for.
    */
  private def scatteredDs(n: Int = 400) = {
    val rows = (0 until n).map { k =>
      (('A' + (k * 7 + 3) % 4).toChar.toString, k.toLong, s"v$k")
    }
    LakeDataset.fromDataFrame(spark, rows.toDF("p", "k", "v"),
      partitionCols = Seq("p"), bloomCols = Seq("k"))
  }

  test("hashesOfLong matches the Catalyst-eval'd hashesOf bit-for-bit") {
    val values = Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue,
      0x9e3779b97f4a7c15L) ++ (0 until 100).map(i => i * 2654435761L)
    values.foreach { v =>
      val slow = Bloom.hashesOf(v, org.apache.spark.sql.types.LongType)
      assert(slow.isDefined)
      assert(Bloom.hashesOfLong(v).toSeq == slow.get, s"mismatch for $v")
    }
  }

  test("no false negatives: every present key tests positive, absent keys mostly negative") {
    val ds = scatteredDs()
    import org.apache.spark.sql.types.LongType
    val all = ds.toDF.select("p", "k").collect().map(r => (r.getString(0), r.getLong(1)))
    ds.partKeys.foreach { pk =>
      val part = ds.part(pk).get
      val bloom = part.blooms.get("k")
      val partP = pk.partValues.head._2
      all.filter(_._1 == partP).foreach { case (_, k) =>
        assert(bloom.mightContainHashes(Bloom.hashesOf(k, LongType).get),
          s"present key $k must test positive in part $partP")
      }
    }
    // Absent keys: with 100 keys per part in 3×32768-bit planes the false
    // positive rate is far below 5% — check a band of definitely-absent keys.
    val bloom = ds.part(ds.partKeys.head).get.blooms.get("k")
    val falsePos = (100000L until 100400L).count(k =>
      bloom.mightContainHashes(Bloom.hashesOf(k, LongType).get))
    assert(falsePos < 20, s"false positive rate too high: $falsePos/400")
  }

  test("probe scans strictly fewer parts on scattered keys; delete stays correct") {
    val ds = scatteredDs()
    assert(ds.numParts == 4)
    // Keys living in exactly one partition: the bloom probe should keep ~1
    // part; zones alone would keep all 4 (every part spans the key range).
    val someKeys = Seq(3L, 7L) // (k*7+3)%4: k=3 -> 'A'... just probe and check
    val kept = ds.probeKeptParts(someKeys.toDF("k"), Seq("k"))
    assert(kept.size < ds.numParts,
      s"bloom probe kept ${kept.size} of ${ds.numParts} parts")

    // Located delete goes through the same probe; result must stay exact.
    val before = ds.toDF.count()
    ds.delete(someKeys.toDF("k"), Seq("k"))
    assert(ds.toDF.count() == before - someKeys.size)
    assert(ds.toDF.filter($"k".isin(someKeys: _*)).count() == 0)
  }

  test("blooms widen on insert/upsert and survive the manifest round-trip") {
    import org.apache.spark.sql.types.LongType
    val root = Files.createTempDirectory("graft_bloom").toString
    val ds = scatteredDs()
    ds.storage = Some(StorageSpec(root))
    // Insert new keys; their membership must be visible (widened planes).
    ds.insert(Seq(("A", 9001L, "x"), ("B", 9002L, "y")).toDF("p", "k", "v"))
    val keptNew = ds.probeKeptParts(Seq(9001L).toDF("k"), Seq("k"))
    assert(keptNew.nonEmpty)
    assert(keptNew.exists(_.blooms.get("k")
      .mightContainHashes(Bloom.hashesOf(9001L, LongType).get)))

    ds.toStorage()
    val back = LakeDataset.fromStorage(spark, root)
    assert(back.bloomCols == List("k"))
    // Loaded parts carry blooms from the manifest (no recompute job) and
    // the probe prunes exactly like the live table.
    val keptLoaded = back.probeKeptParts(Seq(3L).toDF("k"), Seq("k"))
    assert(keptLoaded.size < back.numParts,
      s"loaded bloom probe kept ${keptLoaded.size} of ${back.numParts}")
    // Correctness through the loaded table's located-delete path.
    val n0 = back.toDF.count()
    back.delete(Seq(3L).toDF("k"), Seq("k"))
    assert(back.toDF.count() == n0 - 1)
    LakeDataset.deleteRecursively(java.nio.file.Paths.get(root))
  }

  test("probe fails open: too many delta keys, or a column without blooms") {
    val ds = scatteredDs()
    // > MaxBloomProbeKeys distinct keys: blooms skipped, all parts kept
    // (zones also keep everything — scattered) — and the op still works.
    val many = (0L until (LakeDataset.MaxBloomProbeKeys + 10).toLong).toDF("k")
    assert(ds.probeKeptParts(many, Seq("k")).size == ds.numParts)
    // A probe on a non-bloomed column keeps everything too.
    val keptV = ds.probeKeptParts(Seq("v1").toDF("v"), Seq("v"))
    assert(keptV.size == ds.numParts)
  }
}
