package graft

import org.apache.spark.sql.functions._

import graft.functions.ThetaAgg

/** [[ThetaAgg]] — Theta-sketch distinct set algebra. The
  * `q34_theta_overlap` gate is rows-only (sketch estimates are
  * engine-internal); this suite pins the estimates against the
  * oracle-checked exact twin's arithmetic on real data, plus the algebra
  * invariants (merge associativity, empty identity, exactness in the
  * sparse regime).
  */
class ThetaSpec extends SparkSpec {
  import spark.implicits._

  test("sparse regime is exact: estimates equal true distinct counts") {
    // Well under 2^LgK = 4096 retained hashes -> theta = 1, no sampling.
    val a = (0L until 300L).map(i => ("a", i))
    val b = (200L until 500L).map(i => ("b", i))
    val sk = (a ++ b).toDF("g", "id").groupBy("g")
      .agg(ThetaAgg.sketch(col("id")).as("sk"))
    val row = sk.agg(
        ThetaAgg.unionAgg(when(col("g") === "a", col("sk"))).as("sa"),
        ThetaAgg.unionAgg(when(col("g") === "b", col("sk"))).as("sb"))
      .select(
        ThetaAgg.estimate(col("sa")).as("ca"),
        ThetaAgg.estimate(col("sb")).as("cb"),
        ThetaAgg.intersectEstimate(col("sa"), col("sb")).as("inter"),
        ThetaAgg.aNotBEstimate(col("sa"), col("sb")).as("aOnly"))
      .as[(Double, Double, Double, Double)].collect().head
    assert(row == ((300.0, 300.0, 100.0, 200.0)))
  }

  test("estimates stay within 2% of exact on the events corpus") {
    val ev = Fixtures.table(spark, sf("sf0.01"), "events")
      .filter(col("event_type").isin("view", "purchase"))
    val exact = ev.groupBy("user_id")
      .agg(
        max(when(col("event_type") === "view", 1).otherwise(0)).as("v"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("p"))
      .agg(sum("v"), sum("p"), sum(col("v") * col("p")))
      .as[(Long, Long, Long)].collect().head
    val sk = ev.groupBy("event_type").agg(ThetaAgg.sketch(col("user_id")).as("sk"))
    val est = sk.agg(
        ThetaAgg.unionAgg(when(col("event_type") === "view", col("sk"))).as("sv"),
        ThetaAgg.unionAgg(when(col("event_type") === "purchase", col("sk"))).as("sp"))
      .select(
        ThetaAgg.estimate(col("sv")),
        ThetaAgg.estimate(col("sp")),
        ThetaAgg.intersectEstimate(col("sv"), col("sp")))
      .as[(Double, Double, Double)].collect().head
    def closeTo(e: Double, x: Long): Boolean = math.abs(e - x) <= 0.02 * x + 1
    assert(closeTo(est._1, exact._1), s"viewers ${est._1} vs ${exact._1}")
    assert(closeTo(est._2, exact._2), s"buyers ${est._2} vs ${exact._2}")
    assert(closeTo(est._3, exact._3), s"overlap ${est._3} vs ${exact._3}")
  }

  test("union is associative across grouping shapes") {
    val ids = (0L until 1000L).map(i => (i % 7, i))
    val oneShot = ids.toDF("g", "id")
      .agg(ThetaAgg.sketch(col("id")).as("sk"))
      .select(ThetaAgg.estimate(col("sk"))).as[Double].collect().head
    val reAgg = ids.toDF("g", "id").groupBy("g")
      .agg(ThetaAgg.sketch(col("id")).as("sk"))
      .agg(ThetaAgg.unionAgg(col("sk")).as("sk"))
      .select(ThetaAgg.estimate(col("sk"))).as[Double].collect().head
    assert(oneShot == reAgg)
    assert(oneShot == 1000.0)
  }

  test("empty and all-null groups evaluate to the empty sketch, estimate 0") {
    val df = Seq((1L, Option.empty[Long]), (2L, Option.empty[Long]))
      .toDF("g", "id")
    val est = df.groupBy("g").agg(ThetaAgg.sketch(col("id")).as("sk"))
      .select(ThetaAgg.estimate(col("sk"))).as[Double].collect()
    assert(est.toSeq == Seq(0.0, 0.0))
  }

  test("overlapMatrix: sparse regime equals hand-computed set sizes, all pairs present") {
    // a={0..299}, b={200..499}, c={1000..1099} (disjoint from both).
    val df = ((0L until 300L).map(("a", _)) ++
      (200L until 500L).map(("b", _)) ++
      (1000L until 1100L).map(("c", _))).toDF("g", "id")
    val m = graft.functions.ThetaAgg.overlapMatrix(df, "g", "id")
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    assert(m(("a", "b")) == ((200L, 200L, 100L, 500L)))
    assert(m(("a", "c")) == ((300L, 100L, 0L, 400L)))  // zero-overlap pair PRESENT
    assert(m(("b", "c")) == ((300L, 100L, 0L, 400L)))
    assert(m.size == 3)
  }

  test("overlapMatrix refuses unbounded group dimensions loudly") {
    val df = (0L until 2000L).map(i => (s"g$i", i)).toDF("g", "id")
    intercept[IllegalArgumentException] {
      graft.functions.ThetaAgg.overlapMatrix(df, "g", "id", maxGroups = 100)
    }
  }

  test("string and long inputs both sketch; disjoint domains don't intersect") {
    val longs = (0L until 100L).toDF("id").agg(ThetaAgg.sketch(col("id")).as("sk"))
    val strs = (0 until 100).map(i => s"user_$i").toDF("id")
      .agg(ThetaAgg.sketch(col("id")).as("sk"))
    val inter = longs.select(col("sk").as("a"))
      .join(strs.select(col("sk").as("b")))
      .select(ThetaAgg.intersectEstimate(col("a"), col("b")))
      .as[Double].collect().head
    assert(inter == 0.0)
  }
}
