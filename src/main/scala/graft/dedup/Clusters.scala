package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Duplicate-cluster formation: connected components over a near-dup pair
  * graph. Pair detection (d2/d3/d4) yields *edges*; a curation pipeline
  * needs *clusters* — "keep one doc per component" — which is transitive:
  * a~b and b~c put a,c in one cluster even when a~c was never emitted.
  *
  * Algorithm: iterative min-label propagation to the fixpoint — each vertex
  * repeatedly takes the minimum label among itself and its neighbors; at
  * convergence every component is labeled by its minimum doc_id. The
  * fixpoint is unique (min over a connected set), so the result is
  * deterministic regardless of iteration schedule or partitioning, and an
  * engine-independent DuckDB `WITH RECURSIVE` transitive closure can gate
  * it exactly.
  *
  * Scale shape: each iteration is one shuffle join on vertex id + one
  * combiner-friendly min-aggregation; iterations = graph diameter, which
  * for near-dup graphs is small (clusters are cliques-with-chips, not long
  * paths). `localCheckpoint` truncates the growing lineage each round —
  * the standard Spark iterative-algorithm pattern (same family as MLlib's
  * k-means driver loop). For adversarial long-chain graphs at 100 TB the
  * literature upgrade is large-star/small-star (Kiveris et al., "Connected
  * Components in MapReduce", SoCC'14) which converges in O(log n) rounds;
  * the per-round dataflow (join + min-agg) is identical to this one.
  *
  * Ref: the reference dedupes statements per account-month by last-wins
  * (database.py upsert); clustering generalizes that to transitive
  * near-dup groups, the shape LLM-corpus dedup actually needs.
  */
object Clusters {

  /** Connected components of an undirected edge list `(a_id, b_id)`.
    * Returns `(doc_id, cluster_id, cluster_size)` for every vertex that
    * appears in at least one edge; `cluster_id` = min doc_id in the
    * component. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val spark = edges.sparkSession
    // symmetrize once; both directions participate in every round. The
    // checkpoint pins hashpartitioning(dst, N) — the key every round's
    // label join probes — so iterations re-shuffle only the vertex-sized
    // label frame, never the pair list (see graft.util.Checkpoints for the
    // AQE claim-loss this guards against).
    val sym = graft.util.Checkpoints.partitioned(
      edges.select(col("a_id").as("src"), col("b_id").as("dst"))
        .unionByName(edges.select(col("b_id").as("src"), col("a_id").as("dst"))),
      "dst")
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("label").as("nl")), "dst")
        .groupBy("src").agg(min("nl").as("nbr_min"))
      // Carry the previous label through the propagation so convergence is
      // read off the materialized checkpoint itself — one job per round
      // (the lazy checkpoint caches on the count action) instead of a
      // second join+count job against the previous round's frame.
      val next = labels
        .join(nbrMin.withColumnRenamed("src", "id"), Seq("id"), "left")
        .select(col("id"), col("label").as("prev"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
        .localCheckpoint(false) // lazy: materialized by the count below
      val changed = next.filter(col("label") =!= col("prev")).count()
      labels = next.select("id", "label")
      converged = changed == 0L
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    val size = Window.partitionBy("cluster_id")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
      .withColumn("cluster_size", count(lit(1)).over(size))
  }

  /** Large-star operation (Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14): every vertex connects its strictly
    * larger neighbors to the minimum of its closed neighborhood. Input and
    * output edges are canonical `(hi, lo)` with `hi > lo`. One shuffle
    * (min-agg on vertex) + one join — same per-round dataflow as the label
    * propagation above, but the tree height halves each application. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("hi").as("u"), col("lo").as("v"))
      .unionByName(e.select(col("lo").as("u"), col("hi").as("v")))
    val mins = sym.groupBy("u").agg(min("v").as("mv"))
      .select(col("u"), least(col("u"), col("mv")).as("m"))
    sym.join(mins, "u").filter(col("v") > col("u"))
      .select(col("v").as("hi"), col("m").as("lo"))
      .distinct()
  }

  /** Small-star operation: every vertex connects its smaller neighbors
    * (and itself) to the minimum of that set. Self-loops are dropped;
    * output stays canonical `(hi, lo)`, `hi > lo`. */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy("hi").agg(min("lo").as("m"))
    e.join(mins, "hi").filter(col("lo") =!= col("m"))
      .select(col("lo").as("hi"), col("m").as("lo"))
      .unionByName(mins.select(col("hi"), col("m").as("lo")))
      .distinct()
  }

  /** Connected components via the alternating large-star/small-star
    * algorithm — logarithmic rounds on ANY graph shape (Kiveris SoCC'14:
    * O(log² n) worst-case, ~log n observed), vs diameter rounds for plain
    * min-label propagation. This is the adversarial-graph upgrade
    * [[connectedComponents]]'s scaladoc cites: at 100 TB a long-chain pair
    * graph (e.g. shingled near-dups of a boilerplate ladder) makes
    * diameter-bound propagation unboundedly slow, while star rounds stay
    * logarithmic.
    *
    * Convergence test: the child→parent edge set is a union of FLAT stars
    * iff every `hi` carries exactly one edge and no parent (`lo`) is itself
    * a child (`hi`) — a direct structural fixpoint test (both ops leave
    * flat stars unchanged), sound without reasoning about which
    * intermediate shapes the alternation can reach. Both conditions come
    * out of one aggregate over the already-checkpointed round output. Both
    * operations preserve the original graph's connectivity, so flat stars
    * ⟺ every vertex points at its component minimum. Returns the same
    * `(doc_id, cluster_id, cluster_size)` contract as
    * [[connectedComponents]], plus the round count for specs. */
  def connectedComponentsStar(edges: DataFrame, maxIter: Int = 30): (DataFrame, Int) = {
    var cur = edges
      .select(greatest(col("a_id"), col("b_id")).as("hi"),
        least(col("a_id"), col("b_id")).as("lo"))
      .filter(col("hi") =!= col("lo"))
      .distinct()
      .localCheckpoint()
    var iter = 0
    var converged = cur.isEmpty
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(cur)).localCheckpoint()
      val notFlat = next
        .select(col("hi").as("v"), lit(1).as("hi_deg"), lit(0).as("is_lo"))
        .unionByName(next.select(col("lo").as("v"), lit(0).as("hi_deg"), lit(1).as("is_lo")))
        .groupBy("v").agg(sum("hi_deg").as("hd"), max("is_lo").as("il"))
        .filter(col("hd") > 1 || (col("hd") === 1 && col("il") === 1))
      cur = next
      converged = notFlat.isEmpty
      iter += 1
    }
    require(converged, s"connectedComponentsStar did not converge in $maxIter rounds")
    val size = Window.partitionBy("cluster_id")
    val labels = cur.select(col("hi").as("doc_id"), col("lo").as("cluster_id"))
      .unionByName(cur.select(col("lo").as("doc_id"), col("lo").as("cluster_id")).distinct())
      .distinct()
    (labels.withColumn("cluster_size", count(lit(1)).over(size)), iter)
  }

  /** d7: duplicate clusters over the MinHash-LSH near-dup pairs (d3's
    * exact output is the edge list, so the oracle can rebuild it in SQL). */
  def d7DupClusters(spark: SparkSession, dir: String): DataFrame =
    connectedComponents(
      Dedup.minHashLshPairs(Tables.documents(spark, dir), 0.5)
        .select("a_id", "b_id"))
      .orderBy("doc_id")

  /** d7b: identical contract to d7 but via [[connectedComponentsStar]] —
    * same edges, same unique fixpoint, same oracle; proves the O(log n)
    * formulation end-to-end instead of just citing it. */
  def d7bDupClustersStar(spark: SparkSession, dir: String): DataFrame =
    connectedComponentsStar(
      Dedup.minHashLshPairs(Tables.documents(spark, dir), 0.5)
        .select("a_id", "b_id"))._1
      .orderBy("doc_id")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d7_dup_clusters" -> (d7DupClusters _),
    "d7b_dup_clusters_star" -> (d7bDupClustersStar _)
  )

  /** The oracle states the SPEC — transitive closure via `WITH RECURSIVE`
    * (every vertex reaches its whole component; min reached id = cluster) —
    * rather than mirroring the propagation schedule; both converge to the
    * same unique fixpoint. Edges are d3's pair query verbatim. */
  private val closureSql: String =
    s"""WITH RECURSIVE ${Dedup.minhashPairsSqlCtes},
       |edges AS (
       |  SELECT a_id AS src, b_id AS dst FROM pairs
       |  UNION ALL SELECT b_id, a_id FROM pairs),
       |reach(id, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst),
       |comp AS (
       |  SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id)
       |SELECT doc_id, cluster_id,
       |  COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
       |FROM comp ORDER BY doc_id""".stripMargin

  def oracle: Map[String, String] = Map(
    "d7b_dup_clusters_star" -> closureSql,
    "d7_dup_clusters" -> closureSql
  )
}
