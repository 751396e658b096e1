package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.lake.LakeDataset
import graft.model.{Manifest, StorageSpec}

/** Optimistic concurrency on manifest commits: a handle that loaded
  * version V may only commit over V — a concurrent writer's commit aborts
  * the stale handle loudly instead of being silently clobbered (lost
  * update). The lakehouse optimistic-commit loop: abort → reload → retry.
  */
class CommitProtocolSpec extends SparkSpec {

  private def freshLake(root: String): LakeDataset = {
    val o = Fixtures.table(spark, sf(), "orders").limit(300)
      .withColumn("o_batch", (col("o_orderkey") % 3).cast("int"))
    val ds = LakeDataset.fromDataFrame(spark, o, partitionCols = Seq("o_batch"),
      storage = Some(StorageSpec(root)))
    ds.toStorage()
    ds
  }

  test("stale handle aborts; reload-and-retry commits") {
    val root = Files.createTempDirectory("graft_occ").toString
    freshLake(root)
    val v0 = Manifest.read(root).version

    val a = LakeDataset.fromStorage(spark, root)
    val b = LakeDataset.fromStorage(spark, root)

    // A commits: version advances.
    a.deleteWhere(col("o_orderkey") <= 50)
    a.writeManifest()
    assert(Manifest.read(root).version == v0 + 1)

    // B (still at v0) must NOT clobber A's commit.
    b.deleteWhere(col("o_orderkey") > 250)
    intercept[java.util.ConcurrentModificationException](b.writeManifest())
    assert(Manifest.read(root).version == v0 + 1, "B's abort left A's commit")

    // The retry loop: reload at A's version, redo, commit.
    val b2 = LakeDataset.fromStorage(spark, root)
    b2.deleteWhere(col("o_orderkey") > 250)
    b2.writeManifest()
    assert(Manifest.read(root).version == v0 + 2)
  }

  test("toStorage checks the token BEFORE the destructive wipe") {
    val root = Files.createTempDirectory("graft_occ_wipe").toString
    freshLake(root)
    val a = LakeDataset.fromStorage(spark, root)
    val b = LakeDataset.fromStorage(spark, root)
    a.insert(Fixtures.table(spark, sf(), "orders").limit(10)
      .withColumn("o_batch", lit(9)))
    a.saveParts(a.partKeys.filter(_.partValues.exists(_._2 == "9")))
    val committed = Manifest.read(root).version
    // B's full save would wipe the root — it must abort first, leaving
    // A's files AND manifest intact.
    intercept[java.util.ConcurrentModificationException](b.toStorage())
    assert(Manifest.read(root).version == committed)
    assert(LakeDataset.fromStorage(spark, root).rowsCount == a.rowsCount)
  }

  test("a fresh handle's first save is an explicit overwrite (no token)") {
    val root = Files.createTempDirectory("graft_occ_fresh").toString
    freshLake(root)
    val vOld = Manifest.read(root).version
    // Building a NEW table over the same root (relayout, deliberate
    // replace) never engaged the root before — allowed, like
    // mode("overwrite"); the version still advances monotonically.
    val replacement = LakeDataset.fromDataFrame(spark,
      Fixtures.table(spark, sf(), "orders").limit(20),
      storage = Some(StorageSpec(root)))
    replacement.toStorage()
    assert(Manifest.read(root).version > vOld)
    assert(LakeDataset.fromStorage(spark, root).rowsCount == 20L)
  }

  test("disjoint-partition writers both commit via optimistic rebase") {
    val root = Files.createTempDirectory("graft_occ_rebase").toString
    freshLake(root)
    val v0 = Manifest.read(root).version

    val a = LakeDataset.fromStorage(spark, root)
    val b = LakeDataset.fromStorage(spark, root)

    // A rewrites ONLY partition 0, commits first.
    a.deleteWhere(col("o_batch") === 0 && col("o_orderkey") <= 100)
    a.saveParts(a.partKeys.filter(_.partValues.contains("o_batch" -> "0")))
    assert(Manifest.read(root).version == v0 + 1)

    // B (stale, loaded at v0) rewrites ONLY partition 2 — disjoint cells:
    // the commit REBASES over A's instead of aborting (the loser no longer
    // reruns everything).
    b.deleteWhere(col("o_batch") === 2 && col("o_orderkey") > 200)
    b.saveParts(b.partKeys.filter(_.partValues.contains("o_batch" -> "2")))
    assert(Manifest.read(root).version == v0 + 2)

    // BOTH effects visible to a fresh reader — neither commit clobbered.
    val r = LakeDataset.fromStorage(spark, root)
    assert(r.toDF.filter(col("o_batch") === 0 && col("o_orderkey") <= 100).count() == 0)
    assert(r.toDF.filter(col("o_batch") === 2 && col("o_orderkey") > 200).count() == 0)
    assert(r.toDF.filter(col("o_batch") === 1).count() > 0, "untouched partition intact")

    // A rebased handle keeps committing (merge mode): another disjoint
    // change from B lands cleanly.
    b.deleteWhere(col("o_batch") === 2 && col("o_orderkey") <= 20)
    b.saveParts(b.partKeys.filter(_.partValues.contains("o_batch" -> "2")))
    assert(Manifest.read(root).version == v0 + 3)
    val r2 = LakeDataset.fromStorage(spark, root)
    assert(r2.toDF.filter(col("o_batch") === 0 && col("o_orderkey") <= 100).count() == 0)
    assert(r2.toDF.filter(col("o_batch") === 2 && col("o_orderkey") <= 20).count() == 0)
  }

  test("three CONCURRENT disjoint writers all commit via bounded rebase retry") {
    val root = Files.createTempDirectory("graft_occ_three").toString
    freshLake(root)
    val v0 = Manifest.read(root).version
    val handles = (0 to 2).map(_ => LakeDataset.fromStorage(spark, root))
    // Race the whole mutate+commit path from three threads at once: the
    // first conditional write wins, the losers must re-read + re-merge
    // (possibly more than once — writer 3 can lose to both others) and
    // still land without an abort, because the cells are disjoint.
    val latch = new java.util.concurrent.CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = handles.zipWithIndex.map { case (h, b) =>
      new Thread(() => {
        try {
          latch.await()
          h.deleteWhere(col("o_batch") === b && col("o_orderkey") <= 100)
          h.saveParts(h.partKeys.filter(_.partValues.contains("o_batch" -> b.toString)))
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); latch.countDown(); threads.foreach(_.join())
    assert(errs.isEmpty, errs.toArray.mkString("\n"))
    assert(Manifest.read(root).version == v0 + 3,
      s"three commits must land as three versions, got ${Manifest.read(root).version}")
    val r = LakeDataset.fromStorage(spark, root)
    (0 to 2).foreach { b =>
      assert(r.toDF.filter(col("o_batch") === b && col("o_orderkey") <= 100)
        .count() == 0, s"writer $b's commit was lost")
    }
  }

  test("overlapping-cell writers still abort loudly") {
    val root = Files.createTempDirectory("graft_occ_overlap").toString
    freshLake(root)
    val a = LakeDataset.fromStorage(spark, root)
    val b = LakeDataset.fromStorage(spark, root)
    a.deleteWhere(col("o_batch") === 1 && col("o_orderkey") <= 100)
    a.saveParts(a.partKeys.filter(_.partValues.contains("o_batch" -> "1")))
    // B touches the SAME partition — rebase must refuse (lost update).
    b.deleteWhere(col("o_batch") === 1 && col("o_orderkey") > 200)
    val ex = intercept[java.util.ConcurrentModificationException](
      b.saveParts(b.partKeys.filter(_.partValues.contains("o_batch" -> "1"))))
    assert(ex.getMessage.contains("both writers touched"), ex.getMessage)
    // A's commit stands untouched by the aborted writer.
    val r = LakeDataset.fromStorage(spark, root)
    assert(r.toDF.filter(col("o_batch") === 1 && col("o_orderkey") <= 100).count() == 0)
  }

  test("writeIfVersion: conditional semantics (the rebase loop's CAS primitive)") {
    val root = Files.createTempDirectory("graft_occ_cas").toString
    freshLake(root)
    val m = Manifest.read(root)
    // stale expectation: refused, manifest untouched
    assert(!Manifest.writeIfVersion(m.copy(version = m.version + 1), root,
      expected = m.version - 1))
    assert(Manifest.read(root).version == m.version)
    // current expectation: lands
    assert(Manifest.writeIfVersion(m.copy(version = m.version + 1), root,
      expected = m.version))
    assert(Manifest.read(root).version == m.version + 1)
    // fresh root: expected = -1 is the only accepted token
    val empty = Files.createTempDirectory("graft_occ_cas2").toString
    assert(!Manifest.writeIfVersion(m, empty, expected = 0L))
    assert(Manifest.writeIfVersion(m, empty, expected = -1L))
  }

  test("incremental cell saves carry the token too") {
    val root = Files.createTempDirectory("graft_occ_cell").toString
    freshLake(root)
    val a = LakeDataset.fromStorage(spark, root)
    val b = LakeDataset.fromStorage(spark, root)
    a.deleteWhere(col("o_orderkey") <= 10)
    a.writeManifest()
    b.deleteWhere(col("o_orderkey") > 290)
    intercept[java.util.ConcurrentModificationException](
      b.saveParts(b.partKeys))
  }
}
