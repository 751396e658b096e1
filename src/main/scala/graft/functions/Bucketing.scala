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

  /** Bucket id of ONE literal value, evaluated DRIVER-SIDE — no Spark job.
    * Same Catalyst expressions as [[bucketExpr]] (`XxHash64` seed and all),
    * just eval'd against an empty row, so a pruning decision costs
    * microseconds instead of a scheduled job per lookup. None for a null
    * value (the NULL-bucket sentinel cell) or an unsupported type.
    */
  def localBucketId(value: Any, dt: DataType, n: Int): Option[Int] = {
    import org.apache.spark.sql.catalyst.CatalystTypeConverters
    import org.apache.spark.sql.catalyst.expressions._
    if (value == null) return None
    val in = Literal.create(CatalystTypeConverters.convertToCatalyst(value), dt)
    val asLong: Expression = dt match {
      case BooleanType => Cast(Cast(in, IntegerType), LongType)
      case ByteType | ShortType | IntegerType | LongType => Cast(in, LongType)
      case FloatType | DoubleType => Cast(in, LongType)
      case _: DecimalType => Cast(in, LongType)
      case DateType => Cast(UnixDate(in), LongType)
      case TimestampType => UnixMicros(in)
      case StringType | BinaryType => new XxHash64(Seq(in))
      case _ => return None
    }
    Option(Pmod(asLong, Literal(n.toLong)).eval(null)).map(_.asInstanceOf[Long].toInt)
  }
}
