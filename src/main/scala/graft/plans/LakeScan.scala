package graft.plans

import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, Statistics}
import org.apache.spark.sql.internal.SQLConf

import graft.lake.LakeDataset

/** Logical leaf standing for "the CURRENT contents of a lake table".
  *
  * `graft.lake.Database` registers this node (not a materialized union plan)
  * as each table's SQL temp view; [[LakePruneRule]] replaces it with the real
  * scan at optimization time. Two things fall out of that late binding:
  *
  *  1. `spark.sql` queries get ENGINE pruning — the rule sees the pushed-down
  *     filter and plans only the parts whose partition values / bucket id /
  *     zone intervals can match, instead of the fixed union-of-every-part the
  *     view used to capture (at 10k parts the unpruned union is a
  *     driver-side planning hazard, and the reference's own pruning
  *     (src/dataset.rs:66-71) never reached its SQL surface either);
  *  2. views never go stale — the rewrite reads the dataset's live part set,
  *     so SQL between mutations needs no per-mutation view refresh.
  *
  * The node never reaches physical planning: the rule (installed by
  * [[GraftExtensions]]) always rewrites it during logical optimization.
  */
final case class LakeScan(
    @transient ds: LakeDataset,
    output: Seq[Attribute]) extends LeafNode with MultiInstanceRelation {

  /** Self-joins of the same view need distinct expression ids per branch. */
  override def newInstance(): LakeScan = copy(output = output.map(_.newInstance()))

  /** Known row counters when every part has one; otherwise the session's
    * default (conservatively huge, so an unknown-size lake table is never
    * broadcast by mistake).
    */
  override def computeStats(): Statistics = {
    val sizeEstimate = ds.knownRowsOption match {
      case Some(rows) =>
        val rowBytes = output.map(_.dataType.defaultSize).sum.max(1)
        BigInt(rows).max(1) * rowBytes
      case None => BigInt(SQLConf.get.defaultSizeInBytes)
    }
    Statistics(sizeInBytes = sizeEstimate, rowCount = ds.knownRowsOption.map(BigInt(_)))
  }

  override def simpleString(maxFields: Int): String =
    s"LakeScan [${output.map(_.name).mkString(", ")}]"
}
