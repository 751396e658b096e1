package graft.plans

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions._

import graft.lake.ZoneMap

/** Extraction of catalog-prunable constraints from a predicate expression —
  * shared by the SQL path ([[LakePruneRule]], post-pushdown resolved
  * conditions) and the Scala API paths (`LakeDataset.deleteWhere`, where the
  * user's `Column` carries unresolved attributes; both spell comparisons
  * with the same expression classes).
  *
  * Sound by construction: only top-level conjuncts contribute, unrecognized
  * shapes are ignored, strict bounds relax to inclusive — the result always
  * describes a SUPERSET of the rows the predicate can match, so pruning
  * with it can keep too much, never too little.
  */
object PredicateConstraints {

  /** Over this many IN values the per-value disjunctive prune falls back to
    * the covering interval — bounds driver-side planning work (values ×
    * parts checks).
    */
  val MaxInPruneValues = 256

  /** Split `cond` into per-column equality values, [lo, hi] interval
    * bounds, and IN-list value sets. `isCol` says whether a name is a table
    * column (guards against constraining an alias or a foreign attribute).
    */
  def of(cond: Expression, isCol: String => Boolean)
      : (Map[String, Any], Map[String, (Option[Any], Option[Any])],
         Map[String, Seq[Any]]) = {
    val eqs = scala.collection.mutable.Map[String, Any]()
    val lows = scala.collection.mutable.Map[String, Any]()
    val highs = scala.collection.mutable.Map[String, Any]()
    val ins = scala.collection.mutable.Map[String, Seq[Any]]()

    def name(e: Expression): Option[String] = e match {
      case a: Attribute if isCol(a.name) => Some(a.name)
      case _ => None
    }
    def ext(l: Literal): Any = CatalystTypeConverters.convertToScala(l.value, l.dataType)
    // Keep the TIGHTEST of several bounds on one column; on incomparable
    // values keep the existing one (looser = sound).
    def addLo(c: String, v: Any): Unit =
      lows.updateWith(c) {
        case Some(old) => Some(if (ZoneMap.cmp(v, old).exists(_ > 0)) v else old)
        case None => Some(v)
      }
    def addHi(c: String, v: Any): Unit =
      highs.updateWith(c) {
        case Some(old) => Some(if (ZoneMap.cmp(v, old).exists(_ < 0)) v else old)
        case None => Some(v)
      }

    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }

    // Small IN lists prune per-value (disjunction of full axis checks —
    // skips the gaps BETWEEN scattered values); oversized ones fall back to
    // the covering interval.
    def addIn(c: String, vs: Seq[Any]): Unit =
      if (vs.size <= MaxInPruneValues) ins(c) = vs
      else {
        vs.reduceOption((x, y) => if (ZoneMap.cmp(x, y).exists(_ <= 0)) x else y)
          .foreach(addLo(c, _))
        vs.reduceOption((x, y) => if (ZoneMap.cmp(x, y).exists(_ >= 0)) x else y)
          .foreach(addHi(c, _))
      }

    split(cond).foreach {
      case EqualTo(a, l: Literal) if name(a).isDefined && l.value != null =>
        eqs(name(a).get) = ext(l)
      case EqualTo(l: Literal, a) if name(a).isDefined && l.value != null =>
        eqs(name(a).get) = ext(l)
      case GreaterThanOrEqual(a, l: Literal) if name(a).isDefined && l.value != null =>
        addLo(name(a).get, ext(l))
      case GreaterThan(a, l: Literal) if name(a).isDefined && l.value != null =>
        addLo(name(a).get, ext(l))
      case LessThanOrEqual(a, l: Literal) if name(a).isDefined && l.value != null =>
        addHi(name(a).get, ext(l))
      case LessThan(a, l: Literal) if name(a).isDefined && l.value != null =>
        addHi(name(a).get, ext(l))
      // literal-on-the-left forms flip the comparison direction
      case GreaterThanOrEqual(l: Literal, a) if name(a).isDefined && l.value != null =>
        addHi(name(a).get, ext(l))
      case GreaterThan(l: Literal, a) if name(a).isDefined && l.value != null =>
        addHi(name(a).get, ext(l))
      case LessThanOrEqual(l: Literal, a) if name(a).isDefined && l.value != null =>
        addLo(name(a).get, ext(l))
      case LessThan(l: Literal, a) if name(a).isDefined && l.value != null =>
        addLo(name(a).get, ext(l))
      case In(a, vs) if name(a).isDefined && vs.nonEmpty &&
          vs.forall(v => v.isInstanceOf[Literal] && v.asInstanceOf[Literal].value != null) =>
        addIn(name(a).get, vs.map(v => ext(v.asInstanceOf[Literal])))
      // Catalyst rewrites larger IN lists to InSet (internal values) inside
      // the same optimization batch — handle both spellings.
      case InSet(a: Attribute, hset) if name(a).isDefined && hset.nonEmpty &&
          !hset.contains(null) =>
        addIn(name(a).get, hset.toSeq.map(v =>
          CatalystTypeConverters.convertToScala(v, a.dataType)))
      case _ => ()
    }

    (eqs.toMap, (lows.keySet ++ highs.keySet).iterator
      .map(c => c -> (lows.get(c), highs.get(c))).toMap, ins.toMap)
  }
}
