package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hash-bucketing of a column into `n` buckets.
  *
  * Mirrors the reference's bucketing capability (reference: src/buckets.rs)
  * as ONE lazy Spark expression used identically at write-split and
  * read-filter time — removing the reference's eager/lazy asymmetry (its
  * lazy Utf8 branch is unimplemented, src/buckets.rs:45-50) and fixing its
  * string-hash-without-modulo bug (src/buckets.rs:21-26): we ALWAYS apply a
  * positive modulo, so bucket ids are in [0, n).
  *
  * Everything here is a Catalyst built-in (`pmod`, `xxhash64`, `unix_date`,
  * `unix_micros`) and stays inside whole-stage codegen — no UDF.
  */
object Bucketing {

  /** Bucket expression for a column of the given type. Result: IntegerType in [0, n). */
  def bucketExpr(c: Column, dt: DataType, n: Int): Column = {
    val m = lit(n.toLong)
    val asLong: Column = dt match {
      case BooleanType => c.cast(IntegerType).cast(LongType)
      case ByteType | ShortType | IntegerType | LongType => c.cast(LongType)
      // Reference buckets floats with `% n` (src/buckets.rs:16-19); we
      // truncate to long first so that bucket ids are stable integers.
      case FloatType | DoubleType => c.cast(LongType)
      case _: DecimalType => c.cast(LongType)
      case DateType => unix_date(c).cast(LongType)
      case TimestampType => unix_micros(c)
      case StringType => xxhash64(c)
      case BinaryType => xxhash64(c)
      case other =>
        throw new IllegalArgumentException(s"Unsupported bucket column type: $other")
    }
    pmod(asLong, m).cast(IntegerType)
  }

  /** Convenience: bucket expression resolved against a DataFrame's schema. */
  def bucketExprFor(df: org.apache.spark.sql.DataFrame, colName: String, n: Int): Column =
    bucketExpr(df(colName), df.schema(colName).dataType, n)
}
