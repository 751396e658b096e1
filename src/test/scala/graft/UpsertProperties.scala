package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import org.apache.spark.sql.DataFrame

import graft.lake.LakeDataset

/** Property tests for upsert algebra (SURVEY.md §5 / §7.4.3). ScalaCheck
  * runs through sbt's native test framework; table sizes stay tiny so each
  * property evaluates in milliseconds of Spark time.
  */
object UpsertProperties extends Properties("Upsert") {

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private type Tbl = List[(Long, Option[Int], Option[String])]

  private val rowGen: Gen[(Long, Option[Int], Option[String])] = for {
    k <- Gen.choose(0L, 12L)
    v <- Gen.option(Gen.choose(-100, 100))
    s <- Gen.option(Gen.alphaStr.map(_.take(4)))
  } yield (k, v, s)

  /** Distinct keys: the engine's upsert contract assumes unique keys per
    * batch (reference semantics).
    */
  private val tblGen: Gen[Tbl] =
    Gen.listOfN(8, rowGen).map(_.distinctBy(_._1))

  private def df(t: Tbl): DataFrame = t.toDF("k", "v", "s")

  private def resultOf(base: Tbl, batches: List[Tbl]): Tbl = {
    val ds = LakeDataset.fromDataFrame(spark, df(base))
    batches.foreach(b => if (b.nonEmpty) ds.upsert(df(b), Seq("k")))
    ds.toDF.as[(Long, Option[Int], Option[String])].collect().toList.sortBy(_._1)
  }

  property("idempotent: applying a batch twice equals once") =
    Prop.forAll(tblGen, tblGen) { (base, b) =>
      base.nonEmpty ==> (resultOf(base, List(b)) == resultOf(base, List(b, b)))
    }

  property("right wins unless null (per column)") =
    Prop.forAll(tblGen, tblGen) { (base, b) =>
      (base.nonEmpty && b.nonEmpty) ==> {
        val got = resultOf(base, List(b)).toMap2
        val baseM = base.toMap2
        b.forall { case (k, v, s) =>
          val (expV, expS) = baseM.get(k) match {
            case Some((bv, bs)) => (v.orElse(bv), s.orElse(bs))
            case None => (v, s)
          }
          got(k) == ((expV, expS))
        }
      }
    }

  property("keys absent from the batch are untouched") =
    Prop.forAll(tblGen, tblGen) { (base, b) =>
      base.nonEmpty ==> {
        val got = resultOf(base, List(b)).toMap2
        val batchKeys = b.map(_._1).toSet
        base.filterNot(r => batchKeys.contains(r._1)).forall { case (k, v, s) =>
          got(k) == ((v, s))
        }
      }
    }

  property("row count = |base keys ∪ batch keys|") =
    Prop.forAll(tblGen, tblGen) { (base, b) =>
      base.nonEmpty ==> {
        resultOf(base, List(b)).size == (base.map(_._1).toSet ++ b.map(_._1)).size
      }
    }

  private implicit class TblOps(t: Tbl) {
    def toMap2: Map[Long, (Option[Int], Option[String])] =
      t.map { case (k, v, s) => k -> ((v, s)) }.toMap
  }
}
