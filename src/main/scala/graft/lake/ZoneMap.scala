package graft.lake

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions.{col, max, min}
import org.apache.spark.sql.types._

/** Per-column [min, max] interval of one part's data — the engine's zone
  * maps (a.k.a. data skipping / file-skipping statistics, the design parquet
  * row-group stats and lakehouse formats use per file; here kept per cell in
  * the catalog so pruning needs no file I/O at all).
  *
  * `(None, None)` means "the column holds no non-null values" — such a part
  * can never match an equality/range predicate. A column with UNKNOWN stats
  * is simply absent from the part's zone map (and a part with no statistics
  * at all carries `zones = None`) — absence always disables pruning, never
  * enables it, so stale-but-widened zones stay sound.
  *
  * Scale note: zones are maintained as a by-product of the cell-routing
  * aggregation every mutation already runs (two extra codegen'd min/max
  * aggregates per tracked column — map-side combined, so the shuffle carries
  * one pair per cell), and they prune BEFORE planning: a 10k-part table
  * probes only the parts whose key interval overlaps the delta instead of
  * unioning 10k scans.
  */
final case class Zone(min: Option[Any], max: Option[Any]) {

  /** Widen with `o`; None when any bound pair is INCOMPARABLE (mixed JVM box
    * types, e.g. an Integer batch bound against a Long part bound after an
    * int->bigint coercion). The caller must then drop the COLUMN from the
    * zone map entirely — "unknown" is absence, never a bound: a widened
    * `Zone(None, None)` would read as "provably no values" and prune a part
    * that does hold matches (fail-closed — the one thing stats must never
    * do), and a half-dropped bound could later be resurrected into a falsely
    * tight interval.
    */
  def widen(o: Zone): Option[Zone] =
    for {
      mn <- ZoneMap.bound(min, o.min, keepIfLess = true)
      mx <- ZoneMap.bound(max, o.max, keepIfLess = false)
    } yield Zone(mn, mx)

  /** No non-null values at all (min/max over an all-null column). */
  def isEmptyZone: Boolean = min.isEmpty && max.isEmpty

  /** Could a row with (non-null) value `v` fall in this zone? Unknown or
    * incomparable bounds answer true — pruning must fail open; only the
    * empty zone (no non-null values) and a disjoint interval answer false.
    */
  def mayContain(v: Any): Boolean = (min, max) match {
    case (Some(mn), Some(mx)) =>
      ZoneMap.cmp(v, mn).forall(_ >= 0) && ZoneMap.cmp(v, mx).forall(_ <= 0)
    case (None, None) => false // no non-null values at all
    case _ => true // half-unknown bound (incomparable widen): fail open
  }

  /** Could this PART zone and the QUERY interval `o` share a value?
    * ([mn,mx] ∩ [omn,omx] ≠ ∅). Asymmetric by design: `o` is a query
    * interval, so a missing bound there is an OPEN end (±∞) — one-sided
    * predicates (`col >= v`) still prune — while a half-known bound on this
    * (part) side fails open: part zones are maintained fully-known-or-absent,
    * so a half zone means something degraded and must never prune.
    * Incomparable values (mixed JVM types) always fail open.
    */
  def overlaps(o: Zone): Boolean = {
    if (isEmptyZone || o.isEmptyZone) return false
    (min, max) match {
      case (Some(mn), Some(mx)) =>
        o.min.forall(om => ZoneMap.cmp(om, mx).forall(_ <= 0)) &&
          o.max.forall(om => ZoneMap.cmp(om, mn).forall(_ >= 0))
      case _ => true // defensively fail open on a half-known part zone
    }
  }
}

object ZoneMap {

  /** Max tracked columns per table — bounds catalog memory and the width of
    * the per-mutation routing aggregation on very wide schemas.
    */
  val MaxZoneColumns = 32

  /** Orderable atomic types whose JVM row values implement Comparable.
    * Strings are deliberately NOT tracked: min/max over long text columns
    * measurably doubles the per-mutation routing aggregation (per-row string
    * compares across every text column), while the pruning they buy is thin —
    * categorical strings are partition columns (covered by `prunedDF`) and
    * range predicates cluster on numeric/time columns. The tracked set must
    * be IDENTICAL on the routing and rebuild paths (widening relies on it).
    */
  def zoneable(dt: DataType): Boolean = dt match {
    case _: NumericType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** The columns of `schema` that get zone maps, in schema order. */
  def zoneCols(schema: StructType, exclude: Set[String] = Set.empty): Seq[String] =
    schema.fields.iterator
      .filter(f => zoneable(f.dataType) && !exclude.contains(f.name))
      .map(_.name).take(MaxZoneColumns).toSeq

  /** min/max aggregate pairs for the zone columns, to append to a routing
    * groupBy. Row layout contract: pairs appear at consecutive positions in
    * `cols` order — parse back with [[fromRow]] at the matching offset.
    */
  def aggs(cols: Seq[String]): Seq[Column] =
    cols.flatMap(c => Seq(min(col(c)), max(col(c))))

  /** Parse the min/max pairs appended by [[aggs]] from a collected row. */
  def fromRow(row: Row, offset: Int, cols: Seq[String]): Map[String, Zone] =
    cols.zipWithIndex.map { case (c, i) =>
      c -> Zone(Option(row.get(offset + 2 * i)), Option(row.get(offset + 2 * i + 1)))
    }.toMap

  /** Widen a part's CURRENT zone map with an incoming DELTA's — directional:
    *
    *  - tracked in both: interval widen; incomparable bounds (mixed JVM box
    *    types) DROP the column — absent = unknown = fail open, never a bound
    *    that reads as the empty zone;
    *  - current-only: keep the current zone (the delta lacked the column
    *    entirely, so its rows read as NULL — no effect on min/max; sound
    *    because [[graft.lake.LakeDataset]] fixes one tracked set per table,
    *    so a column the delta HAS is always in its zone map too);
    *  - delta-only: DROPPED. The part having no zone for a column does not
    *    mean its data holds no values for it — the zone may have been
    *    dropped by an earlier incomparable widen or a manifest decode
    *    failure — so adopting the delta's interval alone would be a falsely
    *    tight zone. Unknown stays unknown until a rebuild recomputes tight.
    */
  def widen(current: Map[String, Zone], delta: Map[String, Zone]): Map[String, Zone] =
    current.iterator.flatMap { case (c, x) =>
      (delta.get(c) match {
        case Some(y) => x.widen(y)
        case None => Some(x)
      }).map(c -> _)
    }.toMap

  /** Serialize a zone bound for the manifest — timezone-independent forms
    * for temporal types (Timestamp.toString would bake in the writer JVM's
    * zone and silently SHIFT bounds when loaded elsewhere — an unsound
    * zone, the one thing stats must never be).
    */
  def encodeValue(v: Any): String = v match {
    case t: java.sql.Timestamp => t.toInstant.toString
    case d: java.sql.Date => d.toLocalDate.toString
    case ldt: java.time.LocalDateTime => ldt.toString
    case other => other.toString
  }

  /** Parse a manifest zone bound back to the JVM type Spark rows carry for
    * `dt`. None for unparseable/unsupported — the column's stats then stay
    * unknown (fail open), never wrong.
    */
  def decodeValue(s: String, dt: DataType): Option[Any] =
    try dt match {
      case LongType => Some(java.lang.Long.valueOf(s))
      case IntegerType => Some(Integer.valueOf(s))
      case ShortType => Some(java.lang.Short.valueOf(s))
      case ByteType => Some(java.lang.Byte.valueOf(s))
      case DoubleType => Some(java.lang.Double.valueOf(s))
      case FloatType => Some(java.lang.Float.valueOf(s))
      case _: DecimalType => Some(new java.math.BigDecimal(s))
      case DateType => Some(java.sql.Date.valueOf(java.time.LocalDate.parse(s)))
      case TimestampType => Some(java.sql.Timestamp.from(java.time.Instant.parse(s)))
      case TimestampNTZType => Some(java.time.LocalDateTime.parse(s))
      case _ => None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Runtime comparison via Comparable; None when the JVM types don't line
    * up (caller must fail open).
    */
  def cmp(a: Any, b: Any): Option[Int] =
    try Some(a.asInstanceOf[Comparable[Any]].compareTo(b))
    catch { case _: ClassCastException => None }

  /** Widen one bound pair. Outer None = INCOMPARABLE (caller drops the whole
    * column); Some(None) = both sides tracked no non-null values; Some(v) =
    * the widened bound.
    */
  private[lake] def bound(a: Option[Any], b: Option[Any], keepIfLess: Boolean)
      : Option[Option[Any]] =
    (a, b) match {
      case (Some(x), Some(y)) => cmp(x, y) match {
        case Some(c) => Some(Some(if ((c <= 0) == keepIfLess) x else y))
        case None => None // incomparable: the whole column must be dropped
      }
      case (Some(x), None) => Some(Some(x))
      case (None, Some(y)) => Some(Some(y))
      case _ => Some(None)
    }
}
