package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared window-partitioning helpers. */
object WindowKeys {

  /** Constant-but-NOT-foldable partition key for a window that is
    * intentionally global over a BOUNDED (post-limit) slice.
    *
    * Why not `lit(0)`: the optimizer's EliminateWindowPartitions rule
    * strips foldable partition expressions, which resurrects the
    * "WindowExec: No Partition Defined" warning the key exists to
    * silence — and that warning must stay meaningful (a REAL unbounded
    * window should be the only thing that triggers it). Anchoring the
    * expression on an input attribute (`length(cast(c)) * 0`, value 0
    * for every key) keeps it in the plan while preserving
    * single-partition semantics for any column type. A NULL input
    * would make the key NULL (its own partition → duplicate rank 1s),
    * so the product is coalesced back to 0 — coalesce of a
    * non-foldable child is itself non-foldable, so the rule still
    * can't strip it. */
  def boundedRankKey(c: Column): Column =
    coalesce(length(c.cast("string")) * lit(0), lit(0))
}
