package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Enclosing-subgraph extraction + double-radius node labeling for
  * candidate edges, batched over ALL candidates in one job
  * (reference semantics:
  * /root/reference/src/gnn/lcilp/subgraph_extraction/graph_sampler.py:300-391 —
  * per-link python workers in an mp.Pool; here one edge_id-keyed frontier
  * DataFrame per BFS level, so a million candidates are just more rows).
  *
  * Semantics reproduced exactly:
  *  - nodes = {head, tail} ∪ (N_h(head) ∩ N_h(tail))   (enclosing mode)
  *  - d(v, head) is computed with tail REMOVED from the graph, and
  *    d(v, tail) with head removed (graph_sampler.py:365-391);
  *  - roots keep labels (0,1)/(1,0);
  *  - prune to nodes with max(d_head, d_tail) <= h.
  */
object Subgraphs {

  /** edges(src,dst) symmetric; candidates(edge_id, head, tail).
    * Returns one row per kept subgraph node:
    * (edge_id, node, d_head, d_tail).
    */
  def encloseAndLabel(edges: DataFrame, candidates: DataFrame, h: Int): DataFrame = {

    // BFS from one root per candidate with the OTHER root removed.
    // frontier rows: (edge_id, other, node, dist)
    def bfs(rootCol: String, otherCol: String): DataFrame = {
      var visited = candidates.select(
        col("edge_id"), col(otherCol).as("other"),
        col(rootCol).as("node"), lit(0).as("dist"))
        .localCheckpoint(true)
      var frontier = visited
      var level = 0
      while (level < h && frontier.limit(1).count() > 0) {
        level += 1
        val next = frontier
          .join(edges, frontier("node") === edges("src"))
          .filter(col("dst") =!= col("other")) // other root removed
          .select(col("edge_id"), col("other"), col("dst").as("node"))
          .distinct()
          .join(visited.select(col("edge_id").as("v_eid"), col("node").as("v_node")),
            col("edge_id") === col("v_eid") && col("node") === col("v_node"),
            "left_anti")
        frontier = next
          .select(col("edge_id"), col("other"), col("node"), lit(level).as("dist"))
          .localCheckpoint(true)
        visited = visited.unionAll(frontier).localCheckpoint(true)
      }
      visited.drop("other")
    }

    val fromHead = bfs("head", "tail")
      .withColumnRenamed("dist", "d_head")
    val fromTail = bfs("tail", "head")
      .withColumnRenamed("dist", "d_tail")

    // enclosing: nodes reached from BOTH roots (inner join) …
    val both = fromHead.join(fromTail, Seq("edge_id", "node"))
    // … plus the roots themselves with the reference's fixed labels
    val roots = candidates.select(col("edge_id"),
      col("head").as("node"), lit(0).as("d_head"), lit(1).as("d_tail"))
      .unionAll(candidates.select(col("edge_id"),
        col("tail").as("node"), lit(1).as("d_head"), lit(0).as("d_tail")))

    val nonRoots = both
      .join(candidates, Seq("edge_id"))
      .filter(col("node") =!= col("head") && col("node") =!= col("tail"))
      .select(col("edge_id"), col("node"), col("d_head"), col("d_tail"))
      .filter(greatest(col("d_head"), col("d_tail")) <= h)

    roots.unionAll(nonRoots)
  }

  /** Assemble per-candidate subgraph records: sorted node list + labels
    * (the D4 shape of SURVEY.md §1.1, LMDB record -> table row).
    */
  def records(labeled: DataFrame): DataFrame =
    labeled
      .groupBy(col("edge_id"))
      .agg(
        sort_array(collect_list(struct(col("node"), col("d_head"), col("d_tail"))))
          .as("members"))
      .select(
        col("edge_id"),
        transform(col("members"), m => m("node")).as("nodes"),
        transform(col("members"), m => array(m("d_head"), m("d_tail"))).as("n_labels"),
        size(col("members")).as("subgraph_size"))
}
