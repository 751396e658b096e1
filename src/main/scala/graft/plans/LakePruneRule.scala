package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

import graft.lake.ZoneMap

/** Resolves [[LakeScan]] leaves into the engine's (pruned) scan plan.
  *
  * Runs inside the operator-optimization fixed point (injected via
  * [[GraftExtensions]]), i.e. AFTER `PushDownPredicates` has pushed the
  * query's filters down next to the leaves — so a `Filter` sitting directly
  * on a `LakeScan` carries exactly the conjuncts that reach the table, join
  * or no join. The rule extracts the equality / range constraints Catalyst
  * cannot use (they concern the ENGINE's catalog: partition directory
  * values, hash-bucket ids, per-part zone intervals) and asks the dataset
  * for the union of only the parts that can match. The filter itself stays
  * in the plan (pruning is a superset guarantee, not an exact answer), and
  * the surrounding fixed point then pushes it into each surviving part's
  * file scan as usual.
  *
  * Everything here is driver-side metadata work: zone lookups are catalog
  * maps, bucket ids evaluate locally ([[graft.functions.Bucketing.localBucketId]]),
  * no Spark job runs during planning.
  */
final case class LakePruneRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case Filter(cond, scan: LakeScan) =>
      val pruned = dnfBranches(cond) match {
        // A disjunctive condition (`p='a' OR p='b'`, possibly AND-mixed):
        // prune per DNF branch and union the kept part sets — each branch is
        // a conjunction the single-branch machinery understands.
        case Some(branches) if branches.size > 1 =>
          scan.ds.prunedByDisjunction(branches.map(constraintsOf(_, scan)))
        case _ =>
          val (eqs, ranges, ins) = constraintsOf(cond, scan)
          if (eqs.isEmpty && ranges.isEmpty && ins.isEmpty) scan.ds.toDF
          else scan.ds.prunedByConstraints(eqs, ranges, ins)
      }
      Filter(cond, aligned(scan, fragment(pruned)))
    case scan: LakeScan =>
      aligned(scan, fragment(scan.ds.toDF))
  }

  /** Over this many DNF branches the disjunctive prune falls back to the
    * conjunctive extraction (which soundly ignores OR conjuncts) — bounds
    * the driver-side expansion of nested OR-of-AND conditions.
    */
  private val MaxDnfBranches = 16

  /** The condition as a bounded disjunction of conjunctions: `Or` splits
    * into branches, `And` distributes across them. None when the expansion
    * would exceed [[MaxDnfBranches]].
    */
  private def dnfBranches(e: Expression): Option[Seq[Expression]] = e match {
    case Or(l, r) =>
      for {
        a <- dnfBranches(l); b <- dnfBranches(r)
        if a.size + b.size <= MaxDnfBranches
      } yield a ++ b
    case And(l, r) =>
      for {
        a <- dnfBranches(l); b <- dnfBranches(r)
        if a.size * b.size <= MaxDnfBranches
      } yield for { x <- a; y <- b } yield And(x, y)
    case other => Some(Seq(other))
  }

  /** The engine plan as an optimizer-ready fragment: the dataset plan FULLY
    * optimized on its own. Splicing a merely-analyzed plan into
    * mid-optimization leaves behind nodes whose handling ran in earlier
    * once-only batches (`SubqueryAlias` from merge aliases, `Deduplicate`
    * from delete's distinct, RuntimeReplaceable expressions) — none of which
    * have a physical strategy. A fragment can't contain a LakeScan (part
    * views never reference the SQL surface), so the nested optimize cannot
    * recurse into this rule.
    */
  private def fragment(df: org.apache.spark.sql.DataFrame): LogicalPlan =
    df.queryExecution.optimizedPlan

  /** Re-expose the replacement plan under the scan's original attribute ids
    * (the enclosing query references those), aligning columns by name.
    */
  private def aligned(scan: LakeScan, child: LogicalPlan): LogicalPlan = {
    val byName = child.output.map(a => a.name -> a).toMap
    val projections = scan.output.map { oldAttr =>
      val newAttr = byName.getOrElse(oldAttr.name,
        throw new IllegalStateException(
          s"lake table lost column '${oldAttr.name}' between view registration and query"))
      Alias(newAttr, oldAttr.name)(exprId = oldAttr.exprId)
    }
    Project(projections, child)
  }

  /** Over this many IN values the per-value disjunctive prune falls back to
    * the covering interval — bounds driver-side planning work (values ×
    * parts checks).
    */
  private val MaxInPruneValues = 256

  /** Split a pushed-down condition into per-column equality values,
    * [lo, hi] interval bounds, and IN-list value sets the engine can prune
    * with. Unrecognized conjuncts are simply ignored — pruning stays a
    * sound superset. Strict inequalities are relaxed to inclusive bounds
    * (sound: at most one extra boundary part survives).
    */
  private def constraintsOf(cond: Expression, scan: LakeScan)
      : (Map[String, Any], Map[String, (Option[Any], Option[Any])],
         Map[String, Seq[Any]]) = {
    val eqs = scala.collection.mutable.Map[String, Any]()
    val lows = scala.collection.mutable.Map[String, Any]()
    val highs = scala.collection.mutable.Map[String, Any]()
    val ins = scala.collection.mutable.Map[String, Seq[Any]]()

    def name(e: Expression): Option[String] = e match {
      case a: Attribute if scan.outputSet.contains(a) => Some(a.name)
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
