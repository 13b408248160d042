package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.slf4j.LoggerFactory

import scala.collection.mutable

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

  /** Total ordering used to pick the component-minimum representative in
    * the local-finish path, for the id types the engine's tables use.
    * An id type outside this set simply keeps the iterative path. */
  private def minOrdering(dt: DataType): Option[Ordering[Any]] = {
    def o[T](ord: Ordering[T]): Option[Ordering[Any]] =
      Some(ord.asInstanceOf[Ordering[Any]])
    dt match {
      case LongType    => o(Ordering.Long)
      case IntegerType => o(Ordering.Int)
      case ShortType   => o(Ordering.Short)
      case ByteType    => o(Ordering.Byte)
      case StringType  => o(Ordering.String)
      case _           => None
    }
  }

  /** `vertices`: one column `id`; `edges`: columns `src`, `dst`
    * (undirected pairs, any orientation). Returns (id, cluster_rep).
    *
    * When the edge set is small — `edgeCount <= localMaxEdges`, known for
    * free because the edges are counted to materialize their persist —
    * the components are resolved by a single-task union-find over the
    * edge list instead of the distributed loop. This is the common case
    * by construction: near-dup families are a vanishingly small fraction
    * of any real corpus, so even a 100 TB corpus's verified near-dup EDGE
    * set is millions of rows, not billions. The corpus-scale work (edge
    * production, the isolated-vertex anti-join) stays fully distributed;
    * only the O(dup-set) contraction runs in one task — the same
    * "finish small graphs locally" regime production CC implementations
    * use, and ~10× fewer Spark jobs than the loop at bench scale. Above
    * the threshold (default 1M edges ≈ tens of MB in one task) the
    * iterative min-label/pointer-jumping path below takes over.
    *
    * Exiting at `maxIter` without convergence means long-chain components
    * may carry partially-propagated labels; that is logged as a warning,
    * or thrown when `failOnNonConvergence` is set — non-converged output
    * is never returned silently. */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIter: Int = 20,
                          failOnNonConvergence: Boolean = false,
                          localMaxEdges: Long = 1000000L): DataFrame = {
    // persist + MATERIALIZE the directed edges before anything reads them:
    // the incident-vertex derivation and the mirrored union each reference
    // the input again, and the propagation join reads it every round —
    // without an eager persist an expensive upstream edge producer (a
    // whole minhash-LSH pipeline) executes once per reference instead of
    // once total
    val directed = edges.select(col("src"), col("dst")).persist()
    val edgeCount = directed.count()
    val und = directed
      .union(directed.select(col("dst").as("src"), col("src").as("dst")))
    // iterate ONLY over edge-incident vertices; isolated ones are done at
    // round 0 and never need to enter (or be re-shuffled by) the loop.
    // Derived from the CACHED directed relation, not the raw edges plan.
    val endpoints = directed.select(col("src").as("id"))
      .union(directed.select(col("dst").as("id")))
      .distinct()
    val idType = directed.schema("src").dataType
    val localOrd =
      if (edgeCount <= localMaxEdges) minOrdering(idType) else None
    // endpoints ∩ vertex universe. In the small-edge regime the endpoint
    // set is broadcast so the (possibly corpus-sized) vertex scan is
    // streamed map-side — the big regime keeps the plain semi-join and
    // lets the planner shuffle both sides.
    val incident = (localOrd match {
      case Some(_) => vertices.select(col("id"))
        .join(broadcast(endpoints), Seq("id"), "left_semi")
      case None => endpoints
        .join(vertices.select(col("id")), Seq("id"), "left_semi")
    }).persist()
    localOrd match {
      case Some(ord) =>
        // materialize ONCE before the fan-out: the union-find input
        // references incident three times (self-edges + two broadcast
        // semi-joins), and concurrent broadcast jobs against an
        // unmaterialized persist each recompute its plan — measured 3×
        incident.count()
        val labeled =
          localUnionFind(directed, incident, idType, ord).persist()
        // materialize labeled BEFORE releasing its inputs: the returned
        // DataFrame is lazy, so unpersisting first would make the
        // caller's eventual action recompute the whole upstream edge
        // pipeline inside the single coalesced task (measured 3.5 s for
        // a 768-row union-find)
        labeled.count()
        directed.unpersist()
        incident.unpersist()
        // one broadcast left join instead of anti-join + union: the
        // labeled set is bounded by 2·localMaxEdges rows, so the corpus
        // scan stays map-side — no shuffle of the (possibly huge)
        // vertex set at all
        vertices.select(col("id"))
          .join(broadcast(labeled), Seq("id"), "left")
          .select(col("id"),
            coalesce(col("cluster_rep"), col("id")).as("cluster_rep"))
      case None =>
        iterativeMinLabel(vertices, directed, und, incident,
          maxIter, failOnNonConvergence)
    }
  }

  /** Single-task exact contraction for the small-edge-set regime: the
    * incident vertices enter as self-edges (so vertices whose only edges
    * point outside the universe still label themselves), edges are
    * restricted to universe-internal pairs with broadcast semi-joins
    * against the (small) incident set — identical semantics to the
    * propagation loop, where an out-of-universe endpoint never carries a
    * label. Union-by-min roots make each root the component minimum. */
  private def localUnionFind(directed: DataFrame, incident: DataFrame,
                             idType: DataType,
                             ord: Ordering[Any]): DataFrame = {
    val validEdges = directed
      .join(broadcast(incident.withColumnRenamed("id", "src")),
        Seq("src"), "left_semi")
      .join(broadcast(incident.withColumnRenamed("id", "dst")),
        Seq("dst"), "left_semi")
      .select(col("src"), col("dst"))
    val selfEdges = incident.select(col("id").as("src"), col("id").as("dst"))
    val out = StructType(Seq(
      StructField("id", idType), StructField("cluster_rep", idType)))
    selfEdges.union(validEdges).coalesce(1).mapPartitions { rows =>
      val parent = mutable.HashMap.empty[Any, Any]
      def find(x: Any): Any = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x // path compression
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      def add(x: Any): Unit = if (!parent.contains(x)) parent(x) = x
      rows.foreach { row =>
        val a = row.get(0); val b = row.get(1)
        add(a); add(b)
        val ra = find(a); val rb = find(b)
        if (ra != rb) {
          // attach the larger root under the smaller: roots stay minima
          if (ord.lt(ra, rb)) parent(rb) = ra else parent(ra) = rb
        }
      }
      parent.keysIterator.map(k => Row(k, find(k)))
    }(Encoders.row(out))
  }

  private def iterativeMinLabel(vertices: DataFrame, directed: DataFrame,
                                und: DataFrame, incident: DataFrame,
                                maxIter: Int,
                                failOnNonConvergence: Boolean): DataFrame = {
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
