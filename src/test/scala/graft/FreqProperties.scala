package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.functions.{FreqCodec, FreqSketch}
import graft.lake.FreqMap

/** THE Misra–Gries invariants, against random streams, budgets and merge
  * trees — pure driver-side sketch algebra (no Spark session):
  *
  *  1. bound: `est(v) ≤ true(v) ≤ est(v) + dec` for every stored v;
  *  2. presence: any v with `true(v) > dec` IS stored (absent ⇒ true ≤ dec);
  *  3. budget: `dec ≤ n/(k+1)`, the classic MG guarantee;
  *  4. exactness: cardinality ≤ k ⇒ dec == 0, every value stored with its
  *     exact count, and ANY merge tree over ANY partitioning of the stream
  *     folds to the identical sketch (order independence — what the SQL
  *     collapse's soundness rests on);
  *  5. codec: serialize∘deserialize is the identity on answers.
  */
object FreqProperties extends Properties("FreqSketch") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(40)

  private def build(items: Seq[String], k: Int): FreqSketch = {
    val s = new FreqSketch(k)
    items.foreach(s.insert)
    s
  }

  private val streamGen: Gen[List[String]] = for {
    card <- Gen.choose(1, 40)
    n <- Gen.choose(1, 400)
    xs <- Gen.listOfN(n, Gen.choose(0, card - 1).map(i => s"v$i"))
  } yield xs

  property("bound, presence and budget hold for any stream and k") =
    Prop.forAll(streamGen, Gen.choose(2, 24)) { (xs, k) =>
      val sk = build(xs, k)
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = sk.counters.forall { case (v, est) =>
        est <= truth(v) && truth(v) <= est + sk.dec
      }
      val presence = truth.forall { case (v, t) =>
        t <= sk.dec || sk.counters.contains(v)
      }
      val budget = sk.dec <= xs.length.toLong / (k + 1)
      (bound :| "est <= true <= est+dec") &&
        (presence :| "heavy item missing") &&
        (budget :| s"dec=${sk.dec} > n/(k+1)")
    }

  property("merged sketches keep the bound over partitioned streams") =
    Prop.forAll(streamGen, streamGen, Gen.choose(2, 16)) { (a, b, k) =>
      val merged = build(a, k).mergeIn(build(b, k))
      val truth = (a ++ b).groupBy(identity).view.mapValues(_.size.toLong).toMap
      merged.n == (a.length + b.length).toLong &&
        merged.counters.forall { case (v, est) =>
          est <= truth(v) && truth(v) <= est + merged.dec
        } &&
        truth.forall { case (v, t) => t <= merged.dec || merged.counters.contains(v) }
    }

  property("exact regime: any merge tree folds to the identical answer") =
    Prop.forAll(
      Gen.choose(1, 8).flatMap(c =>
        Gen.listOfN(200, Gen.choose(0, c - 1).map(i => s"v$i"))),
      Gen.choose(2, 6)) { (xs, parts) =>
      // cardinality ≤ 8 << k=64: every partitioning folds exactly
      val slices = xs.grouped(math.max(1, xs.length / parts)).toList
      val chunks = slices.map(s => FreqCodec.serialize(build(s, 64)))
      val lft = chunks.map(FreqCodec.deserialize)
        .reduceLeft((x, y) => x.mergeIn(y))
      val tree = FreqMap.fold(chunks)
      val rev = FreqMap.fold(chunks.reverse)
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      tree.isExact && lft.isExact && rev.isExact &&
        tree.counters.toMap == truth &&
        lft.counters.toMap == truth &&
        rev.counters.toMap == truth
    }

  property("codec round-trips counters, n, dec and k") =
    Prop.forAll(streamGen, Gen.choose(2, 24)) { (xs, k) =>
      val sk = build(xs, k)
      val back = FreqCodec.deserialize(FreqCodec.serialize(sk))
      back.k == sk.k && back.n == sk.n && back.dec == sk.dec &&
        back.counters.toMap == sk.counters.toMap &&
        back.topK(10) == sk.topK(10)
    }
}
