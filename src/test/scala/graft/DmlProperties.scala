package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import org.apache.spark.sql.functions._

import graft.lake.LakeDataset

/** Predicate DML vs an independent model: random
  * insert/upsert/deleteWhere/updateWhere sequences applied both to the
  * lake and to a driver-side Map must converge to the same table —
  * including SQL NULL semantics (NULL predicates keep rows untouched,
  * NULL update inputs propagate per expression arithmetic).
  */
object DmlProperties extends Properties("PredicateDml") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private type R = (Long, Option[Double])

  private val rowGen: Gen[R] = for {
    k <- Gen.choose(0L, 30L)
    v <- Gen.option(Gen.choose(-50.0, 50.0).map(x => math.rint(x * 100) / 100))
  } yield (k, v)

  private val batchGen: Gen[List[R]] =
    Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, rowGen)).map(_.distinctBy(_._1))

  private sealed trait Op
  private case class Ins(rows: List[R]) extends Op
  private case class Ups(rows: List[R]) extends Op
  private case class DelWhere(lo: Long, hi: Long) extends Op
  private case class DelValueAbove(t: Double) extends Op
  private case class UpdWhere(lo: Long, hi: Long, delta: Double) extends Op
  /** SQL MERGE through Database.executeDml, with the given WHEN clauses. */
  private case class Merge(rows: List[R], matched: Boolean, unmatched: Boolean) extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    3 -> batchGen.map(Ins.apply),
    3 -> batchGen.map(Ups.apply),
    2 -> (for { a <- Gen.choose(0L, 40L); w <- Gen.choose(0L, 10L) }
      yield DelWhere(a, a + w)),
    2 -> Gen.choose(-40.0, 40.0).map(t => DelValueAbove(math.rint(t))),
    2 -> (for { a <- Gen.choose(0L, 40L); w <- Gen.choose(0L, 10L)
                d <- Gen.choose(-5.0, 5.0) } yield UpdWhere(a, a + w, math.rint(d))),
    3 -> (for {
      rows <- batchGen
      // both clauses, insert-only, or update-only — each must do exactly
      // what it says
      shape <- Gen.oneOf((true, true), (false, true), (true, false))
    } yield Merge(rows, shape._1, shape._2)))

  private def toDf(rows: List[R]) =
    rows.toDF("k", "v").withColumn("p", (col("k") / 8).cast("int"))

  property("lake == model after any predicate-DML mix") =
    Prop.forAll(batchGen, Gen.listOfN(5, opGen)) { (base0, ops) =>
      base0.nonEmpty ==> {
        var nextKey = 1000L
        val ds = LakeDataset.fromDataFrame(spark, toDf(base0),
          partitionCols = Seq("p"))
        val db = new graft.lake.Database(spark)
        db.register("pdml_t", ds)
        var model: Map[Long, Option[Double]] = base0.toMap
        ops.foreach {
          case Ins(rows) if rows.nonEmpty =>
            val shifted = rows.map { case (k, v) => (k + nextKey, v) }
            nextKey += 1000L
            ds.insert(toDf(shifted))
            model ++= shifted.toMap
          case Ups(rows) if rows.nonEmpty =>
            ds.upsert(toDf(rows), Seq("k"))
            // engine upsert: incoming wins, incoming NULL preserves old
            model = model ++ rows.map { case (k, v) =>
              k -> v.orElse(model.getOrElse(k, None))
            }.toMap
          case DelWhere(lo, hi) =>
            ds.deleteWhere(col("k").between(lo, hi))
            model = model.filterNot { case (k, _) => k >= lo && k <= hi }
          case DelValueAbove(t) =>
            // predicate on the NULLABLE column: NULL > t is NULL → row stays
            ds.deleteWhere(col("v") > t)
            model = model.filterNot { case (_, v) => v.exists(_ > t) }
          case UpdWhere(lo, hi, d) =>
            ds.updateWhere(col("k").between(lo, hi), Seq("v" -> (col("v") + d)))
            model = model.map { case (k, v) =>
              if (k >= lo && k <= hi) k -> v.map(_ + d) else k -> v
            }
          case Merge(rows, matched, unmatched) if rows.nonEmpty =>
            rows.toDF("k", "v").createOrReplaceTempView("pdml_src")
            val actions =
              (if (matched) " WHEN MATCHED THEN UPDATE SET *" else "") +
                (if (unmatched) " WHEN NOT MATCHED THEN INSERT *" else "")
            db.executeDml(
              "MERGE INTO pdml_t USING (SELECT k, v FROM pdml_src) s " +
                "ON pdml_t.k = s.k" + actions)
            // insert-only must not touch matched keys; update-only must not
            // add unmatched ones; the update half keeps engine coalesce
            // (incoming NULL preserves the old value).
            model = model ++ rows.flatMap { case (k, v) =>
              val exists = model.contains(k)
              if (exists && matched) Some(k -> v.orElse(model(k)))
              else if (!exists && unmatched) Some(k -> v)
              else None
            }.toMap
          case _ => ()
        }
        val got = ds.toDF.select("k", "v").collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
          .sortBy(_._1).toSeq
        val want = model.toSeq.sortBy(_._1)
        (got == want) :| s"got $got\nwant $want"
      }
    }
}
