package graft

import graft.operators.MaterializedJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MatJoinViewSpec extends SparkSpec {
  import spark.implicits._

  // Orders-shaped side A (pk id, join key k) and customers-shaped side B
  // (pk = join key k).
  private def a0 = Seq(
    (1L, 10L, 5.0), (2L, 10L, 7.0), (3L, 20L, 1.0), (4L, 30L, 2.0)
  ).toDF("id", "k", "v")
  private def b0 = Seq(
    (10L, "x"), (20L, "y"), (40L, "z")
  ).toDF("k", "name")

  private def sorted(df: DataFrame): Seq[Row] =
    df.orderBy(df.columns.map(col).toIndexedSeq: _*).collect().toSeq

  private def full(a: DataFrame, b: DataFrame): Seq[Row] =
    sorted(a.join(b, Seq("k")).select("k", "id", "v", "name"))

  test("insert / update / delete / key-change all fold from the touched keys") {
    var a = a0; var b = b0
    val view = MaterializedJoin.build(a, b, Seq("k"), Seq("id"), Seq("k"))
    assert(sorted(view.state) == full(a, b))

    // A-side insert: new id under an existing key, one under an unmatched key
    val ins = Seq((5L, 20L, 9.0), (6L, 99L, 4.0)).toDF("id", "k", "v")
    a = a.unionByName(ins)
    view.refreshA(a, ins.select("id"), b)
    assert(sorted(view.state) == full(a, b))

    // A-side value update
    val upd = Seq((2L, 10L, 70.0)).toDF("id", "k", "v")
    a = a.filter($"id" =!= 2L).unionByName(upd)
    view.refreshA(a, upd.select("id"), b)
    assert(sorted(view.state) == full(a, b))

    // A-side KEY change: id 1 moves 10 → 20; the old output row must die
    // under k=10 and reappear under k=20
    val moved = Seq((1L, 20L, 5.0)).toDF("id", "k", "v")
    a = a.filter($"id" =!= 1L).unionByName(moved)
    view.refreshA(a, moved.select("id"), b)
    assert(sorted(view.state) == full(a, b))

    // B-side update fans out to every joined A row of that key
    b = b.withColumn("name", when($"k" === 20L, lit("Y2")).otherwise($"name"))
    view.refreshB(b, Seq(20L).toDF("k"), a)
    assert(sorted(view.state) == full(a, b))

    // A-side delete of every remaining row under one key
    val dead = a.filter($"k" === 10L).select("id")
    a = a.filter($"k" =!= 10L)
    view.refreshA(a, dead, b)
    assert(sorted(view.state) == full(a, b))

    // B-side delete kills the whole key's output
    b = b.filter($"k" =!= 20L)
    view.refreshB(b, Seq(20L).toDF("k"), a)
    assert(sorted(view.state) == full(a, b))

    assert(view.rebuildCount == 0)
  }

  test("randomized mutation script equals full recompute at every step") {
    val rnd = new scala.util.Random(42)
    var a = (1L to 40L).map(i => (i, (rnd.nextInt(8) + 1).toLong, rnd.nextInt(100).toDouble))
      .toDF("id", "k", "v")
    var b = (1L to 8L).map(k => (k, s"n$k")).toDF("k", "name")
    val view = MaterializedJoin.build(a, b, Seq("k"), Seq("id"), Seq("k"))
    var nextId = 41L
    for (step <- 1 to 12) {
      rnd.nextInt(4) match {
        case 0 => // insert a few A rows
          val rows = (0 until 3).map { _ =>
            val r = (nextId, (rnd.nextInt(10) + 1).toLong, rnd.nextInt(100).toDouble)
            nextId += 1; r
          }
          val ins = rows.toDF("id", "k", "v")
          a = a.unionByName(ins)
          view.refreshA(a, ins.select("id"), b)
        case 1 => // re-key a random slice of A
          val m = rnd.nextInt(5) + 2
          val touched = a.filter($"id" % m === 0).select("id")
          a = a.withColumn("k", when($"id" % m === 0, ($"k" % 10) + 1).otherwise($"k"))
          view.refreshA(a, touched, b)
        case 2 => // delete a slice of A
          val m = rnd.nextInt(6) + 3
          val touched = a.filter($"id" % m === 1).select("id")
          a = a.filter($"id" % m =!= 1)
          view.refreshA(a, touched, b)
        case 3 => // rename a random B key (dimension update)
          val k = (rnd.nextInt(8) + 1).toLong
          b = b.withColumn("name", when($"k" === k, concat($"name", lit(s"_$step")))
            .otherwise($"name"))
          view.refreshB(b, Seq(k).toDF("k"), a)
      }
      assert(sorted(view.state) == full(a, b), s"diverged at step $step")
    }
    assert(view.rebuildCount == 0)
  }

  test("over-cap touched sets fail open to shuffle joins, same result") {
    spark.conf.set(MaterializedJoin.BroadcastCapKey, "0")
    try {
      var a = a0; val b = b0
      val view = MaterializedJoin.build(a, b, Seq("k"), Seq("id"), Seq("k"))
      val ins = Seq((7L, 20L, 3.0)).toDF("id", "k", "v")
      a = a.unionByName(ins)
      view.refreshA(a, ins.select("id"), b)
      assert(sorted(view.state) == full(a, b))
    } finally spark.conf.unset(MaterializedJoin.BroadcastCapKey)
  }

  test("NULL join keys never join; null-safe pk routing still maintains them") {
    var a = Seq((1L, Some(10L), 1.0), (2L, None, 2.0)).toDF("id", "k", "v")
    val b = Seq((10L, "x")).toDF("k", "name")
    val view = MaterializedJoin.build(a, b, Seq("k"), Seq("id"), Seq("k"))
    assert(view.state.count() == 1)
    // the null-keyed row gains a key — its (absent) output must materialize
    val fixed = Seq((2L, Some(10L), 2.0)).toDF("id", "k", "v")
    a = a.filter($"id" =!= 2L).unionByName(fixed)
    view.refreshA(a, fixed.select("id"), b)
    assert(sorted(view.state) == full(a, b))
    assert(view.state.count() == 2)
  }

  test("long maintenance sequence keeps a bounded plan (checkpoint cadence)") {
    var a = a0; val b = b0
    val view = MaterializedJoin.build(a, b, Seq("k"), Seq("id"), Seq("k"))
    for (i <- 0 until 2 * MaterializedJoin.CheckpointEvery + 1) {
      val ins = Seq((100L + i, 10L, i.toDouble)).toDF("id", "k", "v")
      a = a.unionByName(ins)
      view.refreshA(a, ins.select("id"), b)
    }
    assert(sorted(view.state) == full(a, b))
    // after ≥ CheckpointEvery merges the state plan must be a checkpoint
    // scan (+ trailing merges), not a 9-deep join tower: count join nodes
    val joins = view.state.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.size
    assert(joins <= 2 * MaterializedJoin.CheckpointEvery,
      s"state plan accumulated $joins joins — lineage not being cut")
  }

  test("column contract: non-key overlap and missing pks are refused") {
    val aa = Seq((1L, 10L, "dup")).toDF("id", "k", "name") // name also on B
    intercept[IllegalArgumentException] {
      MaterializedJoin.build(aa, b0, Seq("k"), Seq("id"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      MaterializedJoin.build(a0, b0, Seq("k"), Seq("nope"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      MaterializedJoin.build(a0, b0, Seq.empty, Seq("id"), Seq("k"))
    }
  }

  test("fromState re-adopts persisted contents and keeps maintaining") {
    val view0 = MaterializedJoin.build(a0, b0, Seq("k"), Seq("id"), Seq("k"))
    val persisted = view0.state
    val view = MaterializedJoin.fromState(persisted, Seq("k"), Seq("id"), Seq("k"))
    var a = a0
    val ins = Seq((9L, 40L, 1.5)).toDF("id", "k", "v")
    a = a.unionByName(ins)
    view.refreshA(a, ins.select("id"), b0)
    assert(sorted(view.state) == full(a, b0))
  }
}
