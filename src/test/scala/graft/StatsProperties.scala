package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import org.apache.spark.sql.functions._

import graft.lake.LakeDataset
import graft.operators.Stats

/** THE metadata invariant: `Stats.tableStats` equals the real aggregation
  * after ANY mutation sequence — on the catalog path when the dataset
  * vouches, on the scan fallback otherwise, with no third outcome. A
  * violation here means the tightness bookkeeping let a stale counter or a
  * superset zone masquerade as exact — the one failure mode the feature
  * must never have.
  */
object StatsProperties extends Properties("MetaStats") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private type R = (Long, Option[Double], Option[Long])

  private val rowGen: Gen[R] = for {
    k <- Gen.choose(0L, 30L)
    v <- Gen.option(Gen.choose(-50.0, 50.0).map(x => math.rint(x * 100) / 100))
    w <- Gen.option(Gen.choose(-1000L, 1000L))
  } yield (k, v, w)

  private val batchGen: Gen[List[R]] =
    Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, rowGen)).map(_.distinctBy(_._1))

  private sealed trait Op
  private case class Ins(rows: List[R]) extends Op
  private case class Ups(rows: List[R]) extends Op
  private case class DelKeys(keys: List[Long]) extends Op
  private case class DelWhere(lo: Long, hi: Long) extends Op
  private case class UpdWhere(lo: Long, hi: Long, delta: Double) extends Op
  private case class UpdSum(lo: Long, hi: Long, delta: Long) extends Op
  private case object Mat extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    3 -> batchGen.map(Ins.apply),
    3 -> batchGen.map(Ups.apply),
    2 -> Gen.listOfN(2, Gen.choose(0L, 40L)).map(ks => DelKeys(ks.distinct)),
    2 -> (for { a <- Gen.choose(0L, 40L); w <- Gen.choose(0L, 10L) }
      yield DelWhere(a, a + w)),
    2 -> (for { a <- Gen.choose(0L, 40L); w <- Gen.choose(0L, 10L)
                d <- Gen.choose(-5.0, 5.0) } yield UpdWhere(a, a + w, math.rint(d))),
    2 -> (for { a <- Gen.choose(0L, 40L); w <- Gen.choose(0L, 10L)
                d <- Gen.choose(-7L, 7L) } yield UpdSum(a, a + w, d)),
    2 -> Gen.const(Mat))

  private def toDf(rows: List[R]) =
    rows.toDF("k", "v", "w").withColumn("p", (col("k") / 8).cast("int"))

  property("tableStats == real aggregation after any mutation mix") =
    Prop.forAll(batchGen, Gen.listOfN(4, opGen)) { (base0, ops) =>
      base0.nonEmpty ==> {
        var nextKey = 1000L
        val ds = LakeDataset.fromDataFrame(spark, toDf(base0),
          partitionCols = Seq("p"))
        def check(label: String): Prop = {
          val want = ds.toDF.agg(count(lit(1)),
            min(col("k")), max(col("k")), min(col("v")), max(col("v")))
            .head().toSeq
          val got = Stats.tableStats(spark, ds, Seq("k", "v")).head().toSeq
          // The SUM family rides the same contract: metadata path when the
          // catalog vouches, scan fallback otherwise, equal either way.
          val wantSum = ds.toDF.agg(count(lit(1)).cast("long"),
            sum(col("k")), sum(col("w"))).head().toSeq
          val gotSum = Stats.tableSumStats(spark, ds, Seq("k", "w")).head().toSeq
          ((got == want) :|
            s"$label: got $got want $want (meta=${Stats.metaAnswerable(ds, Seq("k", "v"))})") &&
          ((gotSum == wantSum) :|
            s"$label/sum: got $gotSum want $wantSum (meta=${Stats.sumAnswerable(ds, Seq("k", "w"))})")
        }
        val results = ops.map {
          case Ins(rows) if rows.nonEmpty =>
            val shifted = rows.map { case (k, v, w) => (k + nextKey, v, w) }
            nextKey += 1000L
            ds.insert(toDf(shifted)); check("ins")
          case Ups(rows) if rows.nonEmpty =>
            ds.upsert(toDf(rows), Seq("k")); check("ups")
          case DelKeys(keys) if keys.nonEmpty =>
            ds.delete(keys.toDF("k"), Seq("k")); check("delKeys")
          case DelWhere(lo, hi) =>
            ds.deleteWhere(col("k").between(lo, hi)); check("delWhere")
          case UpdWhere(lo, hi, d) =>
            ds.updateWhere(col("k").between(lo, hi),
              Seq("v" -> (col("v") + d))); check("updWhere")
          case UpdSum(lo, hi, d) =>
            ds.updateWhere(col("k").between(lo, hi),
              Seq("w" -> (col("w") + d))); check("updSum")
          case Mat =>
            ds.materialize()
            // After a recount the catalog MUST be answerable again — and
            // still equal. Evaluate the flags NOW into vals: `Prop.&&`
            // takes its argument by name, so an inline call would read the
            // table's FINAL state at ScalaCheck evaluation time, after
            // later ops already untightened it (a real flake this suite
            // had).
            val zonesOk = Stats.metaAnswerable(ds, Seq("k", "v"))
            val sumsOk = Stats.sumAnswerable(ds, Seq("k", "w"))
            val eq = check("mat")
            (Prop(zonesOk) :| "mat answerable") &&
              (Prop(sumsOk) :| "mat sum answerable") && eq
          case _ => Prop(true)
        }
        results.foldLeft(check("base"))(_ && _)
      }
    }
}
