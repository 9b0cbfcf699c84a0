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
  * rather than O(diameter). Lineage is cut per round with localCheckpoint
  * so the plan stays flat over arbitrarily many rounds. The min fixpoint
  * is unique, so the result is deterministic regardless of partitioning
  * or round count.
  *
  * Returns (`id`, `label`) with `label` = min node id in the component —
  * the standard cluster-representative convention for dedup.
  */
object ConnectedComponents {
  def run(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val sym = edges
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var labels = nodes.select(col("id"), col("id").as("label")).localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      val nbr = sym.join(labels, sym("dst") === labels("id"))
        .groupBy(sym("src")).agg(min(labels("label")).as("nbr_label"))
      val prop = labels.join(nbr, labels("id") === nbr("src"), "left")
        .select(labels("id"),
          least(labels("label"), coalesce(col("nbr_label"), labels("label")))
            .as("label"))
      val next = prop.as("x")
        .join(prop.select(col("id").as("jid"), col("label").as("jlabel")),
          col("x.label") === col("jid"))
        .select(col("x.id").as("id"), col("jlabel").as("label"))
        .localCheckpoint()
      changed = next.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .filter(col("n.label") =!= col("o.label")).count()
      labels = next
    }
    labels
  }
}
