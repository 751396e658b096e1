package graft

import org.apache.spark.sql.functions._

import graft.operators.{Similarity, Sq}

/** SQ8 scalar quantization: codes bounded to a byte, self-similarity
  * perfect, recall vs the exact float top-k high, zero-vector guard, and
  * the scan stays narrow (codes only).
  */
class SqSpec extends SparkSpec {

  import spark.implicits._

  test("codes are byte-ranged; self-query scores the 1e-6-grid maximum") {
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val enc = Sq.sq8Encode(e, "embedding", "vec_id")
    val bounds = enc.select(
      max(array_max(col("codes"))), min(array_min(col("codes")))).head()
    assert(bounds.getInt(0) <= 127 && bounds.getInt(1) >= -127)
    // the max |element| of every vector quantizes to exactly ±127
    assert(enc.filter(array_max(transform(col("codes"), c => abs(c))) =!= 127)
      .count() == 0)
    val q = e.filter(col("vec_id") === 3).head().getSeq[Float](1).toSeq
    val top = Sq.sq8TopK(enc, "vec_id", q, 1).head()
    assert(top.getLong(0) == 3L && top.getLong(1) == 1000000L,
      s"self-query must rank itself first at cos 1.0: $top")
  }

  test("filtered search: pre-filter before scoring, k survivors, ids in the filter set") {
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val enc = Sq.sq8Encode(e, "embedding", "vec_id", keepCols = Seq("label"))
    val q = e.filter(col("vec_id") === 0).head().getSeq[Float](1).toSeq
    val got = Sq.sq8TopK(enc, "vec_id", q, 10, pred = Some(col("label").isin(2, 7)))
      .collect()
    assert(got.length == 10, "pre-filter must still return k survivors")
    val allowed = e.filter(col("label").isin(2, 7))
      .select("vec_id").as[Long].collect().toSet
    assert(got.forall(r => allowed(r.getLong(0))))
    // identical to filtering the corpus FIRST then encoding + ranking
    val viaPrefilter = Sq.sq8TopK(
      Sq.sq8Encode(e.filter(col("label").isin(2, 7)), "embedding", "vec_id"),
      "vec_id", q, 10).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      viaPrefilter.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("recall@10 vs exact float cosine stays high at 8 bits") {
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val enc = Sq.sq8Encode(e, "embedding", "vec_id").cache()
    val recalls = Seq(0L, 7L, 42L).map { qid =>
      val q = e.filter(col("vec_id") === qid).head().getSeq[Float](1).toSeq
      val exact = Similarity.exactTopKQuantized(e, "embedding", "vec_id", q, 10)
        .select("vec_id").as[Long].collect().toSet
      val sq = Sq.sq8TopK(enc, "vec_id", q, 10)
        .select("vec_id").as[Long].collect().toSet
      (exact & sq).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean SQ8 recall@10 = $mean ($recalls)")
  }

  test("zero vectors encode to zero codes and score 0, never NaN") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(1.0f, -2.0f, 0.5f, 4.0f)))
      .toDF("vec_id", "embedding")
    val enc = Sq.sq8Encode(df, "embedding", "vec_id")
    val zero = enc.filter(col("vec_id") === 1).head().getSeq[Int](1)
    assert(zero.forall(_ == 0))
    val scored = Sq.sq8TopK(enc, "vec_id", Seq(1.0f, -2.0f, 0.5f, 4.0f), 2)
      .as[(Long, Long)].collect().toMap
    assert(scored(2L) == 1000000L && scored(1L) == 0L, scored.toString)
    // a zero QUERY also scores everything 0 (guard on both norms)
    val zq = Sq.sq8TopK(enc, "vec_id", Seq(0.0f, 0.0f, 0.0f, 0.0f), 2)
      .as[(Long, Long)].collect().toMap
    assert(zq.values.forall(_ == 0L))
  }
}
