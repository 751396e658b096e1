package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Properties, Test}

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

/** Time-series ops vs independent driver-side models: the Catalyst plans
  * (windows + pmod floor division) must agree bit-for-bit with plain
  * `Math.floorDiv` reference implementations on randomized series —
  * including negative values, where floor and truncation diverge.
  */
object TimeSeriesProperties extends Properties("TimeSeries") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private def ts(day: Int): Timestamp =
    new Timestamp(1704067200000L + day.toLong * 86400000L) // 2024-01-01 UTC + days

  /** A sparse series: distinct days with (possibly negative) long values. */
  private val seriesGen: Gen[List[(Int, Long)]] = for {
    n <- Gen.choose(2, 10)
    days <- Gen.pick(n, 0 until 25)
    vals <- Gen.listOfN(n, Gen.choose(-100000L, 100000L))
  } yield days.toList.sorted.zip(vals)

  property("interpolateLinear equals the Math.floorDiv reference model") =
    Prop.forAll(seriesGen) { series =>
      val df = series.map { case (d, v) => (1L, ts(d), v) }.toDF("k", "day", "v")
      val got = TimeSeries.interpolateLinear(
          TimeSeries.upsample(df, "k", "day", 86400L), "k", "day", "v")
        .select($"day", $"v").as[(Timestamp, Long)].collect()
        .map { case (d, v) => ((d.getTime - 1704067200000L) / 86400000L).toInt -> v }
        .toMap
      val byDay = series.toMap
      val days = series.map(_._1)
      val expect = (days.min to days.max).map { d =>
        d -> byDay.getOrElse(d, {
          val (pd, pv) = series.filter(_._1 < d).last
          val (nd, nv) = series.find(_._1 > d).get
          pv + Math.floorDiv((nv - pv) * (d.toLong - pd), (nd.toLong - pd))
        })
      }.toMap
      got == expect
    }

  property("ewmaWindowed equals the weighted-mean reference model") =
    Prop.forAll(seriesGen, Gen.oneOf((1, 2), (3, 10), (1, 4)), Gen.choose(1, 4)) {
      (series, alpha, window) =>
        val (a, s) = alpha
        val df = series.map { case (d, v) => (1L, ts(d), v) }.toDF("k", "day", "v")
        val got = TimeSeries.ewmaWindowed(df, "k", "day", "v", a, s, window)
          .orderBy("day").select($"ewma").as[Long].collect().toList
        def pw(b: Long, e: Int): Long = (0 until e).foldLeft(1L)((acc, _) => acc * b)
        val vs = series.map(_._2)
        val expect = vs.indices.map { t =>
          val terms = (0 until window).flatMap { k =>
            if (t - k >= 0) {
              val w = pw(s - a, k) * pw(s, window - 1 - k)
              Some((vs(t - k) * w, w))
            } else None
          }
          Math.floorDiv(terms.map(_._1).sum, terms.map(_._2).sum)
        }.toList
        got == expect
    }

  property("rle reconstruction: expanding the runs reproduces the sequence") =
    Prop.forAll(Gen.choose(1, 30), Gen.listOfN(40, Gen.oneOf("a", "b", "c"))) {
      (n, states0) =>
        val states = states0.take(math.max(n, 1))
        val df = states.zipWithIndex.map { case (st, i) => (1L, i, st) }
          .toDF("k", "seq", "state")
        val runs = TimeSeries.rle(df, "k", Seq("seq"), "state")
          .orderBy("run_id")
          .select($"value", $"run_len").as[(String, Long)].collect()
        val rebuilt = runs.flatMap { case (v, len) => Seq.fill(len.toInt)(v) }.toList
        rebuilt == states
    }

  property("sessions equals the gap-count model; sessions partition the events") =
    Prop.forAll(seriesGen, Gen.oneOf(86400L, 2L * 86400L, 3L * 86400L)) {
      (series, gapSec) =>
        val df = series.map { case (d, _) => (1L, ts(d)) }.toDF("k", "day")
        val got = TimeSeries.sessions(df, "k", "day", gapSec)
          .select($"session_id", $"n_events").as[(Long, Long)].collect()
        val days = series.map(_._1).sorted
        val expectedSessions = 1 + days.sliding(2).count {
          case Seq(a, b) => (b - a).toLong * 86400L > gapSec
          case _ => false
        }
        got.length == expectedSessions && got.map(_._2).sum == days.length
    }

  property("fillForward is idempotent and nulls survive only as a per-key prefix") =
    Prop.forAll(seriesGen) { series =>
      val df = series.map { case (d, v) => (1L, ts(d), v) }.toDF("k", "day", "v")
      val up = TimeSeries.upsample(df, "k", "day", 86400L)
        // erase the first observation to manufacture a leading null
        .withColumn("v", when($"day" === lit(ts(series.head._1)), lit(null: java.lang.Long))
          .otherwise($"v"))
      val once = TimeSeries.fillForward(up, "k", "day", Seq("v"))
      val twice = TimeSeries.fillForward(once, "k", "day", Seq("v"))
      val a = once.orderBy("day").select($"v").as[Option[Long]].collect().toList
      val b = twice.orderBy("day").select($"v").as[Option[Long]].collect().toList
      val prefixOnly = !a.dropWhile(_.isEmpty).exists(_.isEmpty)
      a == b && prefixOnly
    }
}
