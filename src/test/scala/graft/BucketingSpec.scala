package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Bucketing

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("numeric buckets are pmod, in [0, n), including negatives") {
    val df = Seq(-7L, -1L, 0L, 1L, 7L, 123L).toDF("x")
    val got = df.select(Bucketing.bucketExpr(col("x"), LongType, 5).as("b"))
      .collect().map(_.getInt(0))
    assert(got.forall(b => b >= 0 && b < 5))
    // pmod semantics: -7 mod 5 = 3 (never negative, unlike Rust's %)
    assert(got.toSeq == Seq(3, 4, 0, 1, 2, 3))
  }

  test("string buckets always modulo (reference bug not replicated) and stable") {
    val df = Seq("foo", "bar", "baz", "foo").toDF("s")
    val got = df.select(Bucketing.bucketExpr(col("s"), StringType, 5).as("b"))
      .collect().map(_.getInt(0))
    assert(got.forall(b => b >= 0 && b < 5))
    assert(got(0) == got(3), "same string must land in same bucket")
  }

  test("date and timestamp columns bucket deterministically") {
    val df = Seq("2024-01-01", "2024-01-02").toDF("d")
      .select(to_date(col("d")).as("d"), to_timestamp(col("d")).as("t"))
    val got = df.select(
      Bucketing.bucketExpr(col("d"), DateType, 5).as("bd"),
      Bucketing.bucketExpr(col("t"), TimestampType, 5).as("bt")).collect()
    assert(got.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 5))
    assert(got.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 5))
  }

  test("unsupported type rejected") {
    intercept[IllegalArgumentException] {
      Bucketing.bucketExpr(col("x"), ArrayType(IntegerType), 5)
    }
  }

  test("same expression used for write-split and read-filter partitions all rows") {
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val counts = li
      .groupBy(Bucketing.bucketExprFor(li, "l_partkey", 5).as("b")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keys.forall(b => b >= 0 && b < 5))
    assert(counts.values.sum == li.count())
  }
}
