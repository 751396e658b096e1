package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import org.apache.spark.sql.functions._

import graft.lake.{Database, LakeDataset}

/** Transactions vs an independent model: random transaction scripts over
  * TWO tables — each a random mix of insert/upsert/deleteWhere/compact on
  * either table, each randomly COMMITTED or ABORTED mid-body — applied to
  * the lake and to driver-side maps. A committed script must equal the
  * model with its ops applied; an aborted one must leave both tables
  * byte-identical to the model WITHOUT them, including across an
  * in-transaction compact (the deferred-release seam) and for later
  * transactions building on the survivor state.
  */
object TransactionProperties extends Properties("Transactions") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private type R = (Long, Option[Double])
  private type Model = Map[Long, Option[Double]]

  private val rowGen: Gen[R] = for {
    k <- Gen.choose(0L, 30L)
    v <- Gen.option(Gen.choose(-50.0, 50.0).map(x => math.rint(x * 100) / 100))
  } yield (k, v)

  private val batchGen: Gen[List[R]] =
    Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, rowGen)).map(_.distinctBy(_._1))

  private sealed trait Op
  private case class Ins(t: Int, rows: List[R]) extends Op
  private case class Ups(t: Int, rows: List[R]) extends Op
  private case class DelWhere(t: Int, lo: Long, hi: Long) extends Op
  private case class Compact(t: Int) extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    3 -> (for { t <- Gen.oneOf(0, 1); r <- batchGen } yield Ins(t, r)),
    3 -> (for { t <- Gen.oneOf(0, 1); r <- batchGen } yield Ups(t, r)),
    2 -> (for { t <- Gen.oneOf(0, 1); a <- Gen.choose(0L, 40L)
                w <- Gen.choose(0L, 10L) } yield DelWhere(t, a, a + w)),
    1 -> Gen.oneOf(0, 1).map(Compact.apply))

  /** One transaction: its body ops and whether it aborts after them. */
  private val txGen: Gen[(List[Op], Boolean)] = for {
    n <- Gen.choose(1, 4)
    ops <- Gen.listOfN(n, opGen)
    abort <- Gen.oneOf(true, false)
  } yield (ops, abort)

  private def toDf(rows: List[R]) =
    rows.toDF("k", "v").withColumn("p", (col("k") / 8).cast("int"))

  private def contents(ds: LakeDataset): Seq[(Long, Option[Double])] =
    ds.toDF.select("k", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .sortBy(_._1).toSeq

  private case class Abort() extends RuntimeException("tx abort")

  property("commit applies exactly; abort leaves no trace — across tables") =
    Prop.forAll(batchGen, Gen.listOfN(3, txGen)) { (base0, txs) =>
      base0.nonEmpty ==> {
        var nextKey = 1000L
        val dss = Array(
          LakeDataset.fromDataFrame(spark, toDf(base0), partitionCols = Seq("p")),
          LakeDataset.fromDataFrame(spark, toDf(base0).limit(0),
            partitionCols = Seq("p")))
        val db = new Database(spark)
        db.register("txp_t0", dss(0))
        db.register("txp_t1", dss(1))
        val models = Array[Model](base0.toMap, Map.empty)

        def applyOp(op: Op, toModel: Boolean): Unit = op match {
          case Ins(t, rows) =>
            val shifted = rows.map { case (k, v) => (k + nextKey, v) }
            nextKey += 1000L
            dss(t).insert(toDf(shifted))
            if (toModel) models(t) ++= shifted.toMap
          case Ups(t, rows) =>
            dss(t).upsert(toDf(rows), Seq("k"))
            if (toModel) models(t) = models(t) ++ rows.map { case (k, v) =>
              k -> v.orElse(models(t).getOrElse(k, None))
            }.toMap
          case DelWhere(t, lo, hi) =>
            dss(t).deleteWhere(col("k").between(lo, hi))
            if (toModel)
              models(t) = models(t).filterNot { case (k, _) => k >= lo && k <= hi }
          case Compact(t) =>
            dss(t).compact() // plan/state churn only — contents unchanged
        }

        txs.foreach { case (ops, abort) =>
          if (abort) {
            try db.transaction(Seq("txp_t0", "txp_t1")) {
              ops.foreach(applyOp(_, toModel = false))
              throw Abort()
            } catch { case Abort() => () }
            // nextKey moved for the aborted inserts — the model did not
          } else db.transaction(Seq("txp_t0", "txp_t1")) {
            ops.foreach(applyOp(_, toModel = true))
          }
        }
        val got0 = contents(dss(0)); val want0 = models(0).toSeq.sortBy(_._1)
        val got1 = contents(dss(1)); val want1 = models(1).toSeq.sortBy(_._1)
        ((got0 == want0) :| s"t0 got $got0\nt0 want $want0") &&
          ((got1 == want1) :| s"t1 got $got1\nt1 want $want1")
      }
    }
}
