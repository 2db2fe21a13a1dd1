package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the step that
  * turns pairwise dedup output (MinHash/LSH, Jaccard, embedding near-dup)
  * into actionable duplicate CLUSTERS with one canonical representative,
  * the final stage of every C4/RefinedWeb-style dedup pipeline.
  *
  * Algorithm: iterative min-label propagation. Every vertex starts labeled
  * with its own id; each round it takes the min of its label and its
  * neighbors' labels, until a fixpoint. Rounds needed = graph diameter —
  * for dedup graphs (small, dense clusters) a handful; the per-round cost
  * is ONE shuffle join (edges × labels) plus a map-side-combined min
  * aggregate, both keyed joins Spark scales horizontally. Lineage is
  * truncated per round (`localCheckpoint`), so plans stay O(1) deep no
  * matter the iteration count; a 100 TB deployment would swap the
  * checkpoint for a persisted table per round. For graphs with large
  * diameters (not dedup's shape) the star-contraction variants converge in
  * O(log n) rounds at the cost of more complex rounds.
  */
object Components {

  /** Component label (= min vertex id reachable) for every vertex.
    *
    * @param vertices one column = vertex id (every id that should appear in
    *                 the output, including isolated vertices)
    * @param edges    two columns (a, b) = undirected edges over vertex ids;
    *                 an endpoint absent from `vertices` is ignored
    * @return (idCol, comp) — comp = min id in the vertex's component
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
      maxIter: Int = 50): DataFrame = {
    val idCol = vertices.columns.head
    val vids = vertices.select(col(idCol).as("vid"))
    val sym = edges.toDF("a", "b")
      // contract: an edge with an endpoint absent from `vertices` is
      // ignored ENTIRELY — absent ids must neither relay connectivity nor
      // become component labels (dedupByClusters keys survivors on
      // comp ∈ vertex ids)
      .join(vids, col("a") === col("vid"), "left_semi")
      .join(vids, col("b") === col("vid"), "left_semi")
    val undirected = sym.select(col("a").as("s"), col("b").as("d"))
      .union(sym.select(col("b").as("s"), col("a").as("d")))
      .localCheckpoint()
    // Propagation runs over the edge-TOUCHED vertices only: an isolated
    // vertex can never change its label, and in a dedup graph touched
    // vertices (2×|pairs| worst case) are a sliver of the corpus — at
    // 100 TB the iterated state is duplicate-set-sized, not corpus-sized.
    // Isolated vertices rejoin as their own singleton component at the end.
    val touched = undirected.select(col("s").as("id")).distinct()
      .localCheckpoint()
    var labels = touched.select(col("id"), col("id").as("comp"))
      .localCheckpoint()
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val nbrMin = undirected
        .join(labels.select(col("id").as("d"), col("comp").as("dcomp")), "d")
        .groupBy(col("s").as("id"))
        .agg(min(col("dcomp")).as("nmin"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("comp").as("prev"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"))
        .localCheckpoint()
      changed = next.filter(col("comp") =!= col("prev")).count()
      labels = next.drop("prev")
      iter += 1
    }
    require(changed == 0, s"connectedComponents did not converge in $maxIter rounds")
    // touched ⊆ vertices (absent-endpoint edges were dropped up front), so
    // labels needs no membership re-filter
    val isolated = vertices.select(col(idCol).as("id"))
      .join(touched, Seq("id"), "left_anti")
      .select(col("id"), col("id").as("comp"))
    labels.unionByName(isolated)
      .select(col("id").as(idCol), col("comp"))
  }

  /** Canonical-survivor dedup: cluster `docs` by the near-dup `pairs` and
    * keep one representative (the min id) per cluster. */
  def dedupByClusters(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val comps = connectedComponents(docs.select(col(idCol)), pairs)
    docs.join(comps.where(col(idCol) === col("comp")).select(col(idCol)), Seq(idCol))
  }
}
