package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import org.apache.spark.sql.functions._

import graft.functions.ZOrderKey
import graft.lake.{LakeDataset, TrackedLake}
import graft.operators.MaterializedAgg

/** Z-order key algebra: pure-function invariants of rank/spread. */
object ZOrderProperties extends Properties("ZOrderKey") {

  private val cutsGen: Gen[Array[Double]] = for {
    bits <- Gen.choose(1, 6)
    raw <- Gen.listOfN((1 << bits) - 1, Gen.choose(-1e6, 1e6))
  } yield raw.sorted.toArray

  property("rank is bounded and monotone") =
    Prop.forAll(cutsGen, Gen.choose(-2e6, 2e6), Gen.choose(-2e6, 2e6)) {
      (cuts, a, b) =>
        val (lo, hi) = (math.min(a, b), math.max(a, b))
        val (rl, rh) = (ZOrderKey.rank(cuts, lo), ZOrderKey.rank(cuts, hi))
        rl >= 0 && rh <= cuts.length && rl <= rh
    }

  property("equal values get equal ranks even on duplicate cut runs") =
    Prop.forAll(cutsGen, Gen.choose(0, 100)) { (cuts0, dupAt) =>
      (cuts0.length > 1) ==> {
        // plant a duplicate run
        val i = dupAt % (cuts0.length - 1)
        val cuts = cuts0.clone(); cuts(i + 1) = cuts(i)
        val v = cuts(i)
        ZOrderKey.rank(cuts, v) == ZOrderKey.rank(cuts.clone(), v)
      }
    }

  property("spread uses disjoint bit positions per column and inverts") =
    Prop.forAll(Gen.choose(1, 3), Gen.choose(1, 8)) { (ncols, bits) =>
      Prop.forAll(Gen.listOfN(ncols, Gen.choose(0, (1 << bits) - 1))) { ranks =>
        val spreads = ranks.zipWithIndex.map { case (r, j) =>
          ZOrderKey.spread(r, j, ncols, bits)
        }
        // disjointness: pairwise AND of different columns' spreads is 0
        val disjoint = spreads.combinations(2).forall(p => (p(0) & p(1)) == 0L)
        // inversion: collect bit i*ncols+j back into rank j
        val z = spreads.fold(0L)(_ | _)
        val back = (0 until ncols).map { j =>
          (0 until bits).map(i => (((z >> (i * ncols + j)) & 1L) << i).toInt).sum
        }
        disjoint && back == ranks
      }
    }
}

/** PQ codec invariants: total function, score consistency. */
object PqProperties extends Properties("PqCodec") {

  private val cbGen: Gen[Array[Array[Array[Double]]]] = for {
    m <- Gen.choose(1, 4)
    dsub <- Gen.choose(1, 4)
    k <- Gen.choose(1, 8)
    flat <- Gen.listOfN(m * k * dsub, Gen.choose(-10.0, 10.0))
  } yield flat.grouped(k * dsub).map(_.grouped(dsub).map(_.toArray).toArray).toArray

  private val vecGen: Gen[Array[Float]] =
    Gen.choose(0, 24).flatMap(n => Gen.listOfN(n,
      Gen.oneOf(Gen.choose(-5f, 5f), Gen.const(0f))).map(_.toArray))

  property("encode totals over any vector length, one byte per subspace") =
    Prop.forAll(cbGen, vecGen) { (cb, v) =>
      val code = graft.functions.PqEncode.encode(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(v), cb)
      code.length == cb.length &&
        code.zipWithIndex.forall { case (c, j) => (c & 0xFF) < cb(j).length }
    }

  property("adc score == manual lut sum for any code/lut shapes") =
    Prop.forAll(cbGen, vecGen) { (cb, v) =>
      val code = graft.functions.PqEncode.encode(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(v), cb)
      val lut = cb.map(_.map(_.sum)) // any per-centroid numbers work
      val got = graft.functions.PqAdcDot.score(code, lut)
      val want = code.zipWithIndex.map { case (c, j) => lut(j)(c & 0xFF) }.sum
      math.abs(got - want) < 1e-9
    }
}

/** Change-feed replay: after ANY mix of inserts, (group-moving) upserts,
  * and deletes, a view maintained from the LOG ALONE equals a view rebuilt
  * from the final table — the strongest statement the feed can make.
  */
object ChangeFeedProperties extends Properties("ChangeFeed") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private type R = (Long, String, Option[Double])

  private val rowGen: Gen[R] = for {
    k <- Gen.choose(0L, 7L)
    g <- Gen.oneOf("a", "b", "c")
    v <- Gen.option(Gen.choose(-50.0, 50.0).map(x => math.rint(x * 100) / 100))
  } yield (k, g, v)

  private val batchGen: Gen[List[R]] =
    Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, rowGen)).map(_.distinctBy(_._1))

  private sealed trait Op
  private case class Ins(rows: List[R]) extends Op
  private case class Ups(rows: List[R]) extends Op
  private case class Del(keys: List[Long]) extends Op

  private val opGen: Gen[Op] = Gen.oneOf(
    batchGen.map(Ins.apply), batchGen.map(Ups.apply),
    Gen.listOfN(2, Gen.choose(0L, 7L)).map(ks => Del(ks.distinct)))

  property("log-driven view == view over final table, any mutation mix") =
    Prop.forAll(batchGen, Gen.listOfN(3, opGen)) { (base0, ops) =>
      base0.nonEmpty ==> {
        // distinct keys per INSERT batch vs table: shift inserted keys so
        // inserts never duplicate existing keys (insert is append-only by
        // contract; duplicate-key inserts are an upsert's job)
        var nextKey = 100L
        val t = TrackedLake(spark, LakeDataset.fromDataFrame(spark,
          base0.toDF("k", "g", "v")))
        val mv = MaterializedAgg.build(t.table.toDF, Seq("g"), Seq(
          MaterializedAgg.count("n"),
          MaterializedAgg.sumDecimal("v", "total"),
          MaterializedAgg.min("v", "mn"),
          MaterializedAgg.max("v", "mx")))
        var mark = t.currentSeq
        ops.foreach {
          case Ins(rows) if rows.nonEmpty =>
            val shifted = rows.map { case (k, g, v) => (k + nextKey, g, v) }
            nextKey += 100L
            t.insert(shifted.toDF("k", "g", "v"))
          case Ups(rows) if rows.nonEmpty =>
            t.upsert(rows.toDF("k", "g", "v"), Seq("k"))
          case Del(keys) if keys.nonEmpty =>
            t.delete(keys.toDF("k"), Seq("k"))
          case _ => ()
        }
        mark = t.applyChangesTo(mv, mark)
        val want = t.table.toDF.groupBy("g")
          .agg(count(lit(1)).as("n"),
            sum(col("v").cast("decimal(38,2)")).as("total"),
            min("v").as("mn"), max("v").as("mx"))
          .orderBy("g").collect().toSeq
        val got = mv.state.orderBy("g").collect().toSeq
        (got == want) :| s"got $got want $want"
      }
    }
}
