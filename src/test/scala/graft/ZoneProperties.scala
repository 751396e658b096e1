package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import org.apache.spark.sql.functions.col

import graft.lake.LakeDataset

/** Zone-map soundness under random mutation sequences: after any mix of
  * inserts, (possibly migrating) upserts, and deletes, every part's zone
  * interval must still BOUND the part's actual data, and zone pruning must
  * return exactly what the unpruned filter returns for every probed value.
  */
object ZoneProperties extends Properties("ZoneMaps") {

  // Each case runs several real Spark jobs; keep the count small.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private type Row3 = (Long, String, Option[Int])

  private val rowGen: Gen[Row3] = for {
    k <- Gen.choose(0L, 9L)
    p <- Gen.oneOf("A", "B", "C")
    v <- Gen.option(Gen.choose(-100, 100))
  } yield (k, p, v)

  private val tblGen: Gen[List[Row3]] =
    Gen.listOfN(6, rowGen).map(_.distinctBy(_._1))

  private sealed trait Op
  private case class Ins(rows: List[Row3]) extends Op
  private case class Ups(rows: List[Row3]) extends Op
  private case class Del(keys: List[Long]) extends Op

  private val opGen: Gen[Op] = Gen.oneOf(
    tblGen.map(Ins.apply),
    tblGen.map(Ups.apply),
    Gen.listOfN(2, Gen.choose(0L, 9L)).map(Del.apply))

  property("zones bound actual data and pruning is exact") =
    Prop.forAll(tblGen, Gen.listOfN(3, opGen)) { (base, ops) =>
      base.nonEmpty ==> {
        val ds = LakeDataset.fromDataFrame(spark, base.toDF("k", "p", "v"),
          partitionCols = Seq("p"))
        ops.foreach {
          case Ins(rows) if rows.nonEmpty => ds.insert(rows.toDF("k", "p", "v"))
          case Ups(rows) if rows.nonEmpty =>
            // keys = (k) only: migrating upserts exercise the probe + the
            // global-rebuild zone recompute.
            ds.upsert(rows.toDF("k", "p", "v"), Seq("k"))
          case Del(keys) if keys.nonEmpty =>
            ds.delete(keys.toDF("k"), Seq("k"))
          case _ => ()
        }
        val boundsHold = ds.partKeys.forall { key =>
          val part = ds.part(key).get
          part.zones.forall { zs =>
            val rows = part.view.select("k", "v").collect()
            Seq("k" -> rows.flatMap(r => if (r.isNullAt(0)) None else Some(r.getLong(0): Any)),
              "v" -> rows.flatMap(r => if (r.isNullAt(1)) None else Some(r.getInt(1): Any)))
              .forall { case (c, vals) =>
                zs.get(c).forall(z => vals.forall(z.mayContain))
              }
          }
        }
        val pruneExact = Seq(0L, 5L, 9L, 12345L).forall { probe =>
          val got = ds.zonePrunedDF("k", probe).filter(col("k") === probe)
            .collect().map(_.toSeq).sortBy(_.toString)
          val want = ds.toDF.filter(col("k") === probe)
            .collect().map(_.toSeq).sortBy(_.toString)
          got.toSeq == want.toSeq
        }
        boundsHold && pruneExact
      }
    }

  // ---- pure zone algebra under mixed JVM box types (ADVICE r2): an
  // Integer batch bound widened against a Long part zone is incomparable;
  // the column must DROP (unknown, fail open) — never become a Zone that
  // prunes, and never resurrect into a falsely tight interval.
  import graft.lake.{Zone, ZoneMap}

  private val mixedVal: Gen[Any] = Gen.oneOf(
    Gen.choose(-50, 50).map(Integer.valueOf),
    Gen.choose(-50L, 50L).map(java.lang.Long.valueOf),
    Gen.choose(-50.0, 50.0).map(java.lang.Double.valueOf))

  private val mixedZone: Gen[Zone] = for {
    a <- mixedVal; b <- mixedVal
  } yield {
    val lo = if (ZoneMap.cmp(a, b).exists(_ <= 0)) a else b
    val hi = if (lo == a) b else a
    Zone(Some(lo), Some(hi))
  }

  property("mixed-box widen never prunes a value either side contains") =
    Prop.forAll(mixedZone, mixedZone, mixedVal) { (za, zb, v) =>
      val widened = ZoneMap.widen(Map("c" -> za), Map("c" -> zb))
      // Every value the un-widened zones may contain must still be allowed
      // by the widened map (absence = fail open).
      val inEither = za.mayContain(v) || zb.mayContain(v)
      !inEither || widened.get("c").forall(_.mayContain(v))
    }

  property("incomparable widen drops the column for good") =
    Prop.forAll(Gen.choose(-50L, 50L), Gen.choose(-50, 50)) { (l, i) =>
      val part = Map("c" -> Zone(Some(java.lang.Long.valueOf(l)), Some(java.lang.Long.valueOf(l))))
      val delta = Map("c" -> Zone(Some(Integer.valueOf(i)), Some(Integer.valueOf(i))))
      val dropped = ZoneMap.widen(part, delta)
      val after = ZoneMap.widen(dropped, Map("c" -> Zone(Some(0L), Some(0L))))
      dropped.get("c").isEmpty && after.get("c").isEmpty
    }
}
