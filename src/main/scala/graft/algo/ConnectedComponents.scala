package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation
  * with pointer jumping.
  *
  * `nodes` carries one `id` column; `edges` carries (`src`, `dst`) and is
  * symmetrized here. Each round is: (1) every node takes the min of its
  * own label and its neighbors' labels (one shuffle on the edge key);
  * (2) pointer jumping — label ← label's label, halving every node's
  * distance to the component minimum, so rounds are O(log diameter)
  * rather than O(diameter). The min fixpoint is unique, so the result is
  * deterministic regardless of partitioning or round count.
  *
  * Convergence is detected in the SAME pass that computes the round:
  * `old_label` rides through the propagation + pointer-jump projections
  * and the changed-row count is a filter over the round's checkpointed
  * output — no extra join against the previous labels (that join used to
  * roughly double per-round cost).
  *
  * Lineage is cut per round so the plan stays flat over arbitrarily many
  * rounds. The cut honors [[Lineage]]'s two modes: by default the
  * `graft.checkpoint.dir` conf picks localCheckpoint (unset) or reliable
  * checkpoint (set — the mode a 100 TB run must use so a lost executor
  * recomputes from storage instead of failing the job); an explicit
  * `checkpointDir` argument forces reliable mode to that directory.
  *
  * Returns (`id`, `label`) with `label` = min node id in the component —
  * the standard cluster-representative convention for dedup.
  */
object ConnectedComponents {
  def run(nodes: DataFrame, edges: DataFrame,
      checkpointDir: Option[String] = None): DataFrame = {
    val cut: DataFrame => DataFrame = checkpointDir match {
      case Some(dir) => Lineage.cutTo(_, dir)
      case None      => Lineage.cut
    }
    val sym = cut(edges
      .union(edges.select(col("dst").as("src"), col("src").as("dst"))))
    var labels = cut(nodes.select(col("id"), col("id").as("label")))
    var changed = 1L
    while (changed > 0) {
      val nbr = sym.join(labels, sym("dst") === labels("id"))
        .groupBy(sym("src")).agg(min(labels("label")).as("nbr_label"))
      val prop = labels.join(nbr, labels("id") === nbr("src"), "left")
        .select(labels("id"), labels("label").as("old_label"),
          least(labels("label"), coalesce(col("nbr_label"), labels("label")))
            .as("label"))
      val next = cut(prop.as("x")
        .join(prop.select(col("id").as("jid"), col("label").as("jlabel")),
          col("x.label") === col("jid"))
        .select(col("x.id").as("id"), col("jlabel").as("label"),
          (col("jlabel") =!= col("x.old_label")).as("chg")))
      // `next` is materialized by the lineage cut above, so this count is a
      // scan of the round's output — not a second propagation join
      changed = next.filter(col("chg")).count()
      labels = next.select("id", "label")
    }
    labels
  }
}
