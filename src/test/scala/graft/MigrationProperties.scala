package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.lake.LakeDataset

/** Property test for the cell-migration regime: on a PARTITIONED dataset
  * whose partition column is not part of the upsert keys, random deltas —
  * including ones that move existing keys to a different partition — must
  * equal the reference's global full-outer-coalesce model exactly (no
  * duplicated keys, no lost rows, coalesce semantics per column).
  */
object MigrationProperties extends Properties("MigratingUpsert") {

  // Each evaluation runs real Spark jobs (create + probe/merge + collect);
  // 20 cases keeps the suite seconds-scale while still exploring narrow,
  // wide, migrating and non-migrating shapes.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private type Row3 = (Long, String, Option[Int])

  private val rowGen: Gen[Row3] = for {
    k <- Gen.choose(0L, 9L)
    p <- Gen.oneOf("A", "B", "C")
    v <- Gen.option(Gen.choose(-100, 100))
  } yield (k, p, v)

  private val tblGen: Gen[List[Row3]] =
    Gen.listOfN(7, rowGen).map(_.distinctBy(_._1))

  property("partitioned upsert == global outer-join-coalesce model") =
    Prop.forAll(tblGen, tblGen) { (base, delta) =>
      base.nonEmpty ==> {
        val ds = LakeDataset.fromDataFrame(spark, base.toDF("k", "p", "v"),
          partitionCols = Seq("p"))
        if (delta.nonEmpty) ds.upsert(delta.toDF("k", "p", "v"), Seq("k"))
        val got = ds.toDF.as[Row3].collect().toList.sortBy(_._1)

        val baseM = base.map(r => r._1 -> r).toMap
        val deltaM = delta.map(r => r._1 -> r).toMap
        val model = (base.map(_._1) ++ delta.map(_._1)).distinct.sorted.map { k =>
          (baseM.get(k), deltaM.get(k)) match {
            // matched: incoming wins per column; incoming NULL keeps old
            case (Some((_, bp, bv)), Some((_, dp, dv))) => (k, dp, dv.orElse(bv))
            case (Some(r), None) => r
            case (None, Some(d)) => d
            case (None, None) => throw new IllegalStateException("unreachable")
          }
        }
        got == model
      }
    }
}
