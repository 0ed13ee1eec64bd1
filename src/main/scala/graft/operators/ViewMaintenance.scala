package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a materialized JOIN view — the second half
  * of the lakehouse view-maintenance story beside the store's incremental
  * AGGREGATE maintenance (`MetadataStore.maintainCategoryStats`, the s12
  * entry): keep `V = A ⋈ B` current under changes to either side at cost
  * proportional to the CHANGES (× their join fan-out), never a full
  * recompute.
  *
  * Change model (the s10/s12 discipline): the caller knows the NET
  * changed identities per side for the window — `changedAIds` (A rows
  * inserted, deleted, or updated, by A's unique id) and `changedBKeys`
  * (B rows changed, by B's join key, which is B's identity in the view).
  * Both lists are feed-window-bounded driver values, exactly like the
  * id-set point lookups s12 performs.
  *
  * Fold rule — affected-slice replacement, exact under inserts, deletes,
  * AND updates (including an update that MOVES a row's join key):
  *
  *  - `keep`: view rows touching NO changed identity pass through.
  *  - `addA`: changed A rows (as they exist NOW — deleted ids simply no
  *    longer exist) re-join the full current B.
  *  - `addB`: UNCHANGED A rows re-join only the changed B slice (the
  *    changed-A × changed-B overlap is already covered by `addA`, so no
  *    pair is emitted twice and no dedup stage exists).
  *
  * At 100 TB: every filter above is a LITERAL id/key predicate — it
  * pushes to the scans (row-group stats / bloom layouts x12, bucket
  * pruning x5), so `addA` reads |ΔA| rows plus B's matching slice, and
  * `addB`'s probe of the big A side is a broadcast join whose pushed key
  * filter prunes A's layout (lay the view and A out keyed on the join
  * key — the x5/x6 discipline — and the retraction/probe both prune to
  * the touched partitions). The one cost that scales with the VIEW is
  * `keep`'s rewrite of the view itself; partition the materialized view
  * on the join key and dynamic partition overwrite rewrites only touched
  * partitions (the x15 day-refresh shape applied to a view).
  */
object ViewMaintenance {

  def maintainJoinView(viewOld: DataFrame, aNew: DataFrame, bNew: DataFrame,
                       aIdCol: String, aKeyCol: String, bKeyCol: String,
                       changedAIds: Seq[Any], changedBKeys: Seq[Any]): DataFrame = {
    val dA = changedAIds
    val dB = changedBKeys
    def notIn(c: String, vs: Seq[Any]) =
      if (vs.isEmpty) lit(true) else !col(c).isin(vs: _*)
    def in(c: String, vs: Seq[Any]) =
      if (vs.isEmpty) lit(false) else col(c).isin(vs: _*)
    val keep = viewOld.where(notIn(aIdCol, dA) && notIn(bKeyCol, dB))
    val addA = aNew.where(in(aIdCol, dA))
      .join(bNew, col(aKeyCol) === col(bKeyCol))
    val addB = aNew.where(notIn(aIdCol, dA))
      .join(bNew.where(in(bKeyCol, dB)), col(aKeyCol) === col(bKeyCol))
    keep.unionByName(addA).unionByName(addB)
  }
}
