package graft

import graft.lake.{Database, LakeDataset}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The SQL surface of the incremental JOIN view: `CREATE MATERIALIZED VIEW
  * v AS SELECT ... FROM a JOIN b USING (k)` maintained through every DML
  * verb. The operator-level contract lives in MatJoinViewSpec; here we pin
  * the catalog wiring — verb routing, touched-key capture on each mutation
  * shape, rebuild-count observability, cascade/rename/save-load lifecycles,
  * and the loud refusals.
  */
class SqlJoinMvSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def fresh(): (Database, String, String, String) = {
    n += 1
    val (f, d, v) = (s"sjf_$n", s"sjd_$n", s"sjv_$n")
    val db = new Database(spark)
    db.register(f, LakeDataset.fromDataFrame(spark,
      Seq((1L, 10L, 5.0), (2L, 10L, 7.0), (3L, 20L, 1.0), (4L, 30L, 2.0))
        .toDF("id", "k", "v")))
    db.register(d, LakeDataset.fromDataFrame(spark,
      Seq((10L, "x"), (20L, "y"), (40L, "z")).toDF("k", "name")))
    db.executeDml(
      s"CREATE MATERIALIZED VIEW $v AS SELECT k, id, v, name FROM $f JOIN $d USING (k)")
    (db, f, d, v)
  }

  private def rows(db: Database, v: String): Seq[Row] =
    db.executeSql(s"SELECT * FROM $v ORDER BY k, id").collect().toSeq

  private def expect(db: Database, f: String, d: String): Seq[Row] =
    db.executeSql(
      s"SELECT k, id, v, name FROM $f JOIN $d USING (k) ORDER BY k, id")
      .collect().toSeq

  test("create publishes the join; every DML verb maintains it incrementally") {
    val (db, f, d, v) = fresh()
    assert(rows(db, v) == expect(db, f, d))
    db.executeDml(s"INSERT INTO $f VALUES (5, 20, 9.0), (6, 99, 4.0)")
    assert(rows(db, v) == expect(db, f, d))
    db.executeDml(s"UPDATE $d SET name = 'Y2' WHERE k = 20")
    assert(rows(db, v) == expect(db, f, d))
    db.executeDml(s"DELETE FROM $f WHERE k = 10")
    assert(rows(db, v) == expect(db, f, d))
    // the join-key move: rows leave k=20 for k=30
    db.executeDml(s"UPDATE $f SET k = 30 WHERE k = 20")
    assert(rows(db, v) == expect(db, f, d))
    assert(db.mvRebuildCount(v) == 0,
      "every verb above must take the incremental path")
  }

  test("MERGE maintains through the keyed touched-set capture") {
    val (db, f, d, v) = fresh()
    db.executeDml(
      s"""MERGE INTO $f USING (
         |  SELECT CAST(2 AS BIGINT) AS id, CAST(40 AS BIGINT) AS k, 70.0 AS v
         |  UNION ALL
         |  SELECT CAST(9 AS BIGINT) AS id, CAST(40 AS BIGINT) AS k, 9.0 AS v) s
         |ON $f.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(rows(db, v) == expect(db, f, d))
    assert(db.mvRebuildCount(v) == 0)
  }

  test("unfiltered UPDATE (no WHERE) still converges") {
    val (db, f, d, v) = fresh()
    db.executeDml(s"UPDATE $f SET v = v * 2")
    assert(rows(db, v) == expect(db, f, d))
  }

  test("DROP TABLE cascades to join MVs on either side") {
    val (db, f, d, v) = fresh()
    db.executeDml(s"DROP TABLE $d")
    intercept[Exception] { db.executeSql(s"SELECT * FROM $v") }
    intercept[Exception] { db.mvRebuildCount(v) }
  }

  test("RENAME TABLE keeps maintenance working and rewrites the durable query") {
    val (db, f, d, v) = fresh()
    db.executeDml(s"ALTER TABLE $d RENAME TO ${d}_r")
    db.executeDml(s"INSERT INTO $f VALUES (7, 40, 3.0)")
    assert(rows(db, v) == expect(db, f, s"${d}_r"))
    // the rewritten defining query survives a save/load cycle
    val root = java.nio.file.Files.createTempDirectory("sqljmv_ren").toString
    assert(db.saveMaterializedViews(root) == 1)
    val db2 = new Database(spark)
    db2.register(f, LakeDataset.fromDataFrame(spark,
      db.executeSql(s"SELECT * FROM $f")))
    db2.register(s"${d}_r", LakeDataset.fromDataFrame(spark,
      db.executeSql(s"SELECT * FROM ${d}_r")))
    assert(db2.loadMaterializedViews(root) == 1)
    db2.executeDml(s"INSERT INTO $f VALUES (8, 10, 1.0)")
    assert(rows(db2, v) == expect(db2, f, s"${d}_r"))
  }

  test("REFRESH MATERIALIZED VIEW rebuilds a join MV (engine-API escape hatch)") {
    val (db, f, d, v) = fresh()
    db.executeDml(s"REFRESH MATERIALIZED VIEW $v")
    assert(rows(db, v) == expect(db, f, d))
    assert(db.mvRebuildCount(v) == 1)
  }

  test("transactions refuse tables with dependent join MVs") {
    val (db, f, _, _) = fresh()
    val err = intercept[IllegalArgumentException] {
      db.transaction(Seq(f)) { () }
    }
    assert(err.getMessage.contains("dependent materialized views"))
  }

  test("refusals: self-join, expressions in the select list, bad keys") {
    val (db, f, d, _) = fresh()
    intercept[IllegalArgumentException] {
      db.executeDml(
        s"CREATE MATERIALIZED VIEW bad1 AS SELECT k FROM $f JOIN $f USING (k)")
    }
    intercept[IllegalArgumentException] {
      db.executeDml(
        s"CREATE MATERIALIZED VIEW bad2 AS SELECT k, SUM(v) AS s FROM $f JOIN $d USING (k)")
    }
    intercept[IllegalArgumentException] {
      db.executeDml(
        s"CREATE MATERIALIZED VIEW bad3 AS SELECT k FROM $f JOIN $d USING (k + 1)")
    }
    // ON-form equi-joins are not the supported MV shape — loud, not silent
    intercept[IllegalArgumentException] {
      db.executeDml(
        s"CREATE MATERIALIZED VIEW bad4 AS SELECT k FROM $f JOIN $d ON $f.k = $d.k")
    }
  }

  test("SELECT * publishes the full canonical column set") {
    n += 1
    val (f, d, v) = (s"sjf_$n", s"sjd_$n", s"sjv_$n")
    val db = new Database(spark)
    db.register(f, LakeDataset.fromDataFrame(spark,
      Seq((1L, 10L, 5.0)).toDF("id", "k", "v")))
    db.register(d, LakeDataset.fromDataFrame(spark,
      Seq((10L, "x")).toDF("k", "name")))
    db.executeDml(
      s"CREATE MATERIALIZED VIEW $v AS SELECT * FROM $f JOIN $d USING (k)")
    assert(db.executeSql(s"SELECT * FROM $v").columns.toSeq ==
      Seq("k", "id", "v", "name"))
  }
}
