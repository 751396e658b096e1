package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.lake.{Database, LakeDataset}

/** Multi-table atomic transactions (`Database.transaction`): mutations on
  * every named table commit or roll back as one unit; rollback restores
  * plans, counters, stats AND keeps the pre-transaction snapshot
  * generations alive (the deferred-release seam); persistence inside a
  * transaction is refused.
  */
class TransactionSpec extends SparkSpec {
  import spark.implicits._

  private def orders: DataFrame = Fixtures.table(spark, sf(), "orders")
    .withColumn("o_batch", (col("o_orderkey") / 200).cast("int"))

  private def freshPair(a: String, b: String): (Database, LakeDataset, LakeDataset) = {
    val db = new Database(spark)
    val dsA = LakeDataset.fromDataFrame(spark, orders, partitionCols = Seq("o_batch"))
    val dsB = LakeDataset.fromDataFrame(spark, orders.limit(0))
    db.register(a, dsA)
    db.register(b, dsB)
    (db, dsA, dsB)
  }

  private def contentHash(ds: LakeDataset): java.math.BigDecimal =
    ds.toDF.select(sum(xxhash64(col("o_orderkey"),
      coalesce(col("o_totalprice"), lit(0.0)),
      coalesce(col("o_orderstatus"), lit(""))).cast("decimal(38,0)")))
      .head().getDecimal(0)

  test("commit: mutations on both tables land and the SQL views see them") {
    val (db, dsA, dsB) = freshPair("txc_a", "txc_b")
    val before = dsA.rowsCount
    val moved = orders.filter(col("o_orderkey") <= 100)
    val n = moved.count()
    db.transaction(Seq("txc_a", "txc_b")) {
      dsA.delete(moved.select("o_orderkey"), Seq("o_orderkey"))
      dsB.insert(moved)
    }
    assert(dsA.rowsCount == before - n)
    assert(dsB.rowsCount == n)
    // conservation across the pair — the classic debit/credit shape
    assert(db.executeSql(
      "SELECT (SELECT COUNT(*) FROM txc_a) + (SELECT COUNT(*) FROM txc_b) AS t")
      .head().getLong(0) == before)
  }

  test("rollback: a failing body leaves every named table byte-identical") {
    val (db, dsA, dsB) = freshPair("txr_a", "txr_b")
    val hashA = contentHash(dsA)
    val rowsA = dsA.rowsCount
    val moved = orders.filter(col("o_orderkey") <= 100)
    val boom = intercept[RuntimeException] {
      db.transaction(Seq("txr_a", "txr_b")) {
        dsA.delete(moved.select("o_orderkey"), Seq("o_orderkey"))
        dsB.insert(moved)
        dsA.upsert(moved.withColumn("o_totalprice", lit(0.0)), Seq("o_orderkey"))
        throw new RuntimeException("mid-transaction failure")
      }
    }
    assert(boom.getMessage == "mid-transaction failure")
    assert(dsA.rowsCount == rowsA)
    assert(contentHash(dsA) == hashA)
    assert(dsB.rowsCount == 0L)
    assert(db.executeSql("SELECT COUNT(*) AS n FROM txr_b").head().getLong(0) == 0L)
    // the rolled-back tables stay fully usable: mutate and read again
    dsB.insert(moved)
    assert(dsB.rowsCount == moved.count())
  }

  test("rollback survives an in-transaction compaction (deferred release)") {
    val (db, dsA, _) = freshPair("txk_a", "txk_b")
    val hashA = contentHash(dsA)
    // force plan-churn + a dataset-level rebuild INSIDE the transaction:
    // compact() supersedes the pre-transaction generation — without the
    // deferred-release seam the rollback would resurrect freed checkpoints
    intercept[RuntimeException] {
      db.transaction(Seq("txk_a")) {
        dsA.delete(orders.filter(col("o_orderkey") % 2 === 0)
          .select("o_orderkey"), Seq("o_orderkey"))
        dsA.compact()
        dsA.insert(orders.limit(10))
        throw new RuntimeException("abort after compact")
      }
    }
    // the restored pre-transaction plans must still be computable
    assert(contentHash(dsA) == hashA)
    assert(dsA.toDF.count() == orders.count())
  }

  test("persistence inside a transaction is refused loudly") {
    val root = java.nio.file.Files.createTempDirectory("graft_tx_store").toString
    val db = new Database(spark)
    val ds = LakeDataset.fromDataFrame(spark, orders,
      partitionCols = Seq("o_batch"),
      storage = Some(graft.model.StorageSpec(root, "parquet", "snappy")))
    db.register("txs_a", ds)
    val e = intercept[IllegalStateException] {
      db.transaction(Seq("txs_a")) {
        ds.insert(orders.limit(5))
        ds.toStorage()
      }
    }
    assert(e.getMessage.contains("not allowed inside a transaction"))
    // the refused body rolled back: nothing of the insert survives
    assert(ds.rowsCount == orders.count())
  }

  test("feed-tracked and MV-base tables are refused up front") {
    val (db, dsA, _) = freshPair("txf_a", "txf_b")
    db.executeDml(
      "CREATE MATERIALIZED VIEW txf_mv AS SELECT o_orderstatus, COUNT(*) AS n " +
        "FROM txf_a GROUP BY o_orderstatus")
    val e = intercept[IllegalArgumentException] {
      db.transaction(Seq("txf_a")) { dsA.insert(orders.limit(1)) }
    }
    assert(e.getMessage.contains("materialized views"))
    db.executeDml("DROP MATERIALIZED VIEW txf_mv")
    // unknown table refused before anything locks
    intercept[IllegalArgumentException] {
      db.transaction(Seq("txf_a", "no_such_table")) { () }
    }
  }

  test("SQL script: BEGIN/COMMIT applies every statement atomically") {
    val (db, dsA, dsB) = freshPair("txsql_a", "txsql_b")
    val before = dsA.rowsCount
    // executeDml delegates a BEGIN script to executeTransaction; the tag
    // literal carries a ';' to exercise the quote-aware splitter
    db.executeDml(
      """BEGIN TRANSACTION;
        |INSERT INTO txsql_b SELECT * FROM txsql_a WHERE o_orderkey <= 50;
        |DELETE FROM txsql_a WHERE o_orderkey <= 50;
        |UPDATE txsql_b SET o_orderpriority = 'tag;v1' WHERE o_orderkey <= 20;
        |COMMIT;""".stripMargin)
    val moved = db.executeSql("SELECT COUNT(*) AS n FROM txsql_b").head().getLong(0)
    assert(moved > 0)
    assert(dsA.rowsCount == before - moved)
    assert(db.executeSql(
      "SELECT COUNT(*) AS n FROM txsql_b WHERE o_orderpriority = 'tag;v1'")
      .head().getLong(0) ==
      orders.filter(col("o_orderkey") <= 20).count())
  }

  test("SQL script: a failing mid-script statement rolls earlier ones back") {
    val (db, dsA, dsB) = freshPair("txsf_a", "txsf_b")
    val hashA = contentHash(dsA)
    intercept[Exception] {
      db.executeTransaction(
        """BEGIN;
          |DELETE FROM txsf_a WHERE o_orderkey <= 500;
          |INSERT INTO txsf_b SELECT * FROM txsf_no_such_table;
          |COMMIT""".stripMargin)
    }
    assert(contentHash(dsA) == hashA)
    assert(dsB.rowsCount == 0L)
  }

  test("SQL script: DDL refuses up front — nothing runs, nothing locks") {
    val (db, dsA, _) = freshPair("txsd_a", "txsd_b")
    val rows = dsA.rowsCount
    val e = intercept[IllegalArgumentException] {
      db.executeTransaction(
        """BEGIN;
          |DELETE FROM txsd_a WHERE o_orderkey <= 500;
          |DROP TABLE txsd_a;
          |COMMIT""".stripMargin)
    }
    assert(e.getMessage.contains("only mutation DML"))
    // the refusal happened BEFORE the DELETE executed
    assert(dsA.rowsCount == rows)
    // unterminated scripts refuse too (trailing statements would drop)
    intercept[IllegalArgumentException] {
      db.executeTransaction("BEGIN; DELETE FROM txsd_a WHERE o_orderkey <= 5")
    }
  }

  test("two names aliasing ONE dataset begin once and commit once") {
    val db = new Database(spark)
    val ds = LakeDataset.fromDataFrame(spark, orders, partitionCols = Seq("o_batch"))
    db.register("txa_x", ds)
    db.register("txa_y", ds) // same handle under a second name
    val before = ds.rowsCount
    db.transaction(Seq("txa_x", "txa_y")) { ds.insert(orders.limit(5)) }
    assert(ds.rowsCount == before + 5)
    // and an aborted body still rolls the single dataset back cleanly
    intercept[RuntimeException] {
      db.transaction(Seq("txa_y", "txa_x")) {
        ds.insert(orders.limit(3)); throw new RuntimeException("abort")
      }
    }
    assert(ds.rowsCount == before + 5)
    // the dataset is NOT left in-transaction: persistence works again
    val root = java.nio.file.Files.createTempDirectory("graft_txa").toString
    ds.storage = Some(graft.model.StorageSpec(root))
    ds.toStorage()
  }

  test("aliases cannot invert the lock order (creation-rank, not name, is global)") {
    // dsA ranks before dsB; T1 names them so dsA sorts FIRST by name,
    // T2 through aliases so dsB sorts first by name. Name order would
    // acquire the two monitors in opposite orders — classic deadlock.
    val db = new Database(spark)
    val dsA = LakeDataset.fromDataFrame(spark, orders, partitionCols = Seq("o_batch"))
    val dsB = LakeDataset.fromDataFrame(spark, orders.limit(0))
    db.register("m_first", dsA); db.register("n_second", dsB)   // T1: A < B
    db.register("a_alias", dsB); db.register("z_alias", dsA)    // T2: B < A
    val rowsA = dsA.rowsCount
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val fs = (1 to 4).map { i =>
      Future {
        if (i % 2 == 0) db.transaction(Seq("m_first", "n_second")) {
          dsA.insert(orders.limit(1)); dsB.insert(orders.limit(1))
        } else db.transaction(Seq("a_alias", "z_alias")) {
          dsB.insert(orders.limit(1)); dsA.insert(orders.limit(1))
        }
      }
    }
    fs.foreach(Await.result(_, 120.seconds)) // deadlock would time out here
    assert(dsA.rowsCount == rowsA + 4)
    assert(dsB.rowsCount == 4L)
  }

  test("concurrent transactions on overlapping tables serialize (no deadlock)") {
    val (db, dsA, dsB) = freshPair("txp_a", "txp_b")
    val rowsA = dsA.rowsCount
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    // both transactions name the tables in DIFFERENT user order; the
    // sorted-order lock acquisition must prevent deadlock
    val f1 = Future(db.transaction(Seq("txp_a", "txp_b")) {
      dsA.insert(orders.limit(7)); dsB.insert(orders.limit(3))
    })
    val f2 = Future(db.transaction(Seq("txp_b", "txp_a")) {
      dsB.insert(orders.limit(2)); dsA.insert(orders.limit(5))
    })
    Await.result(f1, 120.seconds)
    Await.result(f2, 120.seconds)
    assert(dsA.rowsCount == rowsA + 12)
    assert(dsB.rowsCount == 5L)
  }
}
