package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** Session extensions installing the lake's Catalyst integration.
  *
  * Register via `spark.sql.extensions=graft.plans.GraftExtensions` (every
  * session builder in this repo does). The one rule injected is
  * [[LakePruneRule]] — it joins the operator-optimization fixed point, so it
  * sees filters after pushdown and its rewritten unions get the full
  * standard optimization treatment in the same pass.
  */
final class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(session => LakePruneRule(session))
  }
}
