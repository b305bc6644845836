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
    // symmetrize once; both directions participate in every round
    val sym = edges.select(col("a_id").as("src"), col("b_id").as("dst"))
      .unionByName(edges.select(col("b_id").as("src"), col("a_id").as("dst")))
      .localCheckpoint()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("label").as("nl")), "dst")
        .groupBy("src").agg(min("nl").as("nbr_min"))
      val next = labels
        .join(nbrMin.withColumnRenamed("src", "id"), Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
        .localCheckpoint() // truncate lineage; also materializes for the count
      val changed = next.select(col("id"), col("label").as("nl"))
        .join(labels, "id")
        .filter(col("nl") =!= col("label"))
        .count()
      labels = next
      converged = changed == 0L
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    val size = Window.partitionBy("cluster_id")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
      .withColumn("cluster_size", count(lit(1)).over(size))
  }

  /** d7: duplicate clusters over the MinHash-LSH near-dup pairs (d3's
    * exact output is the edge list, so the oracle can rebuild it in SQL). */
  def d7DupClusters(spark: SparkSession, dir: String): DataFrame =
    connectedComponents(
      Dedup.minHashLshPairs(Tables.documents(spark, dir), 0.5)
        .select("a_id", "b_id"))
      .orderBy("doc_id")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d7_dup_clusters" -> (d7DupClusters _)
  )

  /** The oracle states the SPEC — transitive closure via `WITH RECURSIVE`
    * (every vertex reaches its whole component; min reached id = cluster) —
    * rather than mirroring the propagation schedule; both converge to the
    * same unique fixpoint. Edges are d3's pair query verbatim. */
  def oracle: Map[String, String] = Map(
    "d7_dup_clusters" ->
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
  )
}
