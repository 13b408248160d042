package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.slf4j.LoggerFactory

/** Duplicate-cluster resolution: connected components over a near-dup pair
  * graph, labeling every document with the minimum id of its component —
  * the step that turns pairwise near-dup output (MinHash/SimHash/Jaccard)
  * into "keep one representative per cluster" for corpus dedup.
  *
  * Algorithm: iterative min-label propagation (the simple variant of
  * large-star/small-star), restricted to the vertices that actually touch
  * an edge. In any real corpus the overwhelming majority of documents are
  * isolated (near-dup families are small), and an isolated vertex's label
  * is its own id by definition — so the iteration works only over the
  * edge-incident vertex set and the isolated rest is unioned back with
  * `label = id` at the end. Per-round cost is O(dup-set), not O(corpus).
  *
  * Each round is two hash-partitioned shuffles (edge×label join + min
  * aggregate); rounds needed = component diameter, which for near-dup
  * clusters is tiny (dup families are cliques-ish). If a component is NOT
  * shallow, rounds 6+ add a pointer-jumping step (label ← label[label],
  * halving the remaining distance each round) so even a diameter-d chain
  * converges in ~5 + log₂(d) rounds instead of d — deep components can
  * slip past maxIter only in theory, not in practice. Shallow graphs
  * converge before the jumping kicks in and never pay for it. Rounds
  * materialize via `persist` + a convergence probe, and every third round
  * goes through `localCheckpoint` so lineage (and with it plan size and
  * recovery cost) stays bounded regardless of iteration count.
  * Labels-only state shuffles (id, label) pairs: 16 bytes a row at any
  * corpus scale.
  */
object DupClusters {

  private val log = LoggerFactory.getLogger(getClass)

  /** The working set of the propagation loop: every vertex that appears as
    * an endpoint of some edge, restricted to the given vertex universe. */
  def incidentVertices(vertices: DataFrame, edges: DataFrame): DataFrame =
    edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
      .distinct()
      .join(vertices.select(col("id")), Seq("id"), "left_semi")

  /** `vertices`: one column `id`; `edges`: columns `src`, `dst`
    * (undirected pairs, any orientation). Returns (id, cluster_rep).
    *
    * Exiting at `maxIter` without convergence means long-chain components
    * may carry partially-propagated labels; that is logged as a warning,
    * or thrown when `failOnNonConvergence` is set — non-converged output
    * is never returned silently. */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIter: Int = 20,
                          failOnNonConvergence: Boolean = false): DataFrame = {
    // persist + MATERIALIZE the directed edges before anything reads them:
    // the incident-vertex derivation and the mirrored union each reference
    // the input again, and the propagation join reads it every round —
    // without an eager persist an expensive upstream edge producer (a
    // whole minhash-LSH pipeline) executes once per reference instead of
    // once total
    val directed = edges.select(col("src"), col("dst")).persist()
    directed.count()
    val und = directed
      .union(directed.select(col("dst").as("src"), col("src").as("dst")))
    // iterate ONLY over edge-incident vertices; isolated ones are done at
    // round 0 and never need to enter (or be re-shuffled by) the loop.
    // Derived from the CACHED directed relation, not the raw edges plan.
    val incident = directed.select(col("src").as("id"))
      .union(directed.select(col("dst").as("id")))
      .distinct()
      .join(vertices.select(col("id")), Seq("id"), "left_semi")
      .persist()
    var labels = incident.select(col("id"), col("id").as("label")).persist()
    // convergence probe: min-label propagation only ever DECREASES labels,
    // so the label sum is strictly monotone until fixpoint — an unchanged
    // sum IS convergence. One cheap aggregate per round instead of a
    // changed-rows self-join. decimal(38) so huge id sums cannot overflow.
    def labelSum(df: DataFrame): Any =
      df.agg(sum(col("label").cast("decimal(38,0)"))).collect()(0).get(0)
    var prevSum = labelSum(labels) // also materializes the persist
    var iter = 0
    var converged = false
    try {
      while (!converged && iter < maxIter) {
        val neighborMin = und
          .join(labels.withColumnRenamed("id", "__src"), col("src") === col("__src"))
          .groupBy(col("dst")).agg(min(col("label")).as("__nlabel"))
        val oneHop = labels
          .join(neighborMin, col("id") === col("dst"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("__nlabel"), col("label")))
              .as("label"))
        // still not converged after 5 rounds → the graph has deep
        // components; compress paths with label ← label[label] (every
        // label IS a working-set vertex id, so the self-join is total).
        // oneHop is persisted for the round: the self-join references it
        // twice and would otherwise evaluate the propagation join twice
        val jumping = iter >= 5
        val hop = if (jumping) oneHop.persist() else oneHop
        val propagated =
          if (!jumping) hop
          else hop.as("a")
            .join(hop.withColumnRenamed("id", "__pid")
              .withColumnRenamed("label", "__plabel"),
              col("a.label") === col("__pid"))
            .select(col("a.id").as("id"),
              least(col("a.label"), col("__plabel")).as("label"))
        // localCheckpoint every 3rd round: persist alone caches rows but
        // keeps the full lineage, so the logical plan (and failure-recovery
        // chain) would otherwise grow with the iteration count
        // (localCheckpoint caches the underlying RDD itself — no extra persist)
        val next =
          if (iter % 3 == 2) propagated.localCheckpoint(eager = false)
          else propagated.persist()
        val nextSum = labelSum(next) // materializes next
        if (jumping) hop.unpersist()
        labels.unpersist()
        labels = next
        converged = nextSum == prevSum
        prevSum = nextSum
        iter += 1
      }
      if (!converged) {
        val msg = s"connectedComponents exited at maxIter=$maxIter without " +
          "converging: components with diameter > maxIter carry " +
          "partially-propagated labels"
        if (failOnNonConvergence) throw new IllegalStateException(msg)
        log.warn(msg)
      }
      val isolated = vertices.select(col("id"))
        .join(incident, Seq("id"), "left_anti")
        .select(col("id"), col("id").as("cluster_rep"))
      labels.withColumnRenamed("label", "cluster_rep").union(isolated)
    } finally directed.unpersist()
  }

  /** Cluster sizes + representative, for "how much of the corpus is
    * duplicated" reporting. */
  def clusterSizes(labeled: DataFrame): DataFrame =
    labeled.groupBy(col("cluster_rep"))
      .agg(count(lit(1)).as("n_members"))
}
