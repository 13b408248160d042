package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: connected components over a near-dup pair
  * graph, labeling every document with the minimum id of its component —
  * the step that turns pairwise near-dup output (MinHash/SimHash/Jaccard)
  * into "keep one representative per cluster" for corpus dedup.
  *
  * Algorithm: iterative min-label propagation (the simple variant of
  * large-star/small-star). Each round is two hash-partitioned shuffles
  * (edge×label join + min aggregate); rounds needed = component diameter,
  * which for near-dup clusters is tiny (dup families are cliques-ish).
  * The driver loop materializes each round via `persist` + a convergence
  * count — the canonical Spark pattern for iterative graph algorithms —
  * and `maxIter` bounds the worst case. Labels-only state shuffles
  * (id, label) pairs: 16 bytes a row at any corpus scale.
  */
object DupClusters {

  /** `vertices`: one column `id`; `edges`: columns `src`, `dst`
    * (undirected pairs, any orientation). Returns (id, cluster_rep). */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIter: Int = 20): DataFrame = {
    // persist the DIRECTED edges before mirroring: the union references the
    // input twice and the propagation join reads it every round — without
    // the persist an expensive upstream edge producer (a whole minhash-LSH
    // pipeline) executes 2× on materialization and again per iteration
    val directed = edges.select(col("src"), col("dst")).persist()
    val und = directed
      .union(directed.select(col("dst").as("src"), col("src").as("dst")))
    var labels = vertices.select(col("id"), col("id").as("label")).persist()
    labels.count()
    var iter = 0
    var converged = false
    try while (!converged && iter < maxIter) {
      val neighborMin = und
        .join(labels.withColumnRenamed("id", "__src"), col("src") === col("__src"))
        .groupBy(col("dst")).agg(min(col("label")).as("__nlabel"))
      val next = labels
        .join(neighborMin, col("id") === col("dst"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("__nlabel"), col("label")))
            .as("label"))
        .persist()
      val changed = next
        .join(labels.withColumnRenamed("label", "__old")
          .withColumnRenamed("id", "__id"), col("id") === col("__id"))
        .filter(col("label") < col("__old")).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    } finally directed.unpersist()
    labels.withColumnRenamed("label", "cluster_rep")
  }

  /** Cluster sizes + representative, for "how much of the corpus is
    * duplicated" reporting. */
  def clusterSizes(labeled: DataFrame): DataFrame =
    labeled.groupBy(col("cluster_rep"))
      .agg(count(lit(1)).as("n_members"))
}
