package graft.dedup

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ClustersSpec extends SparkSpec {
  import spark.implicits._

  def cc(edges: Seq[(Long, Long)]) =
    Clusters.connectedComponents(edges.toDF("a_id", "b_id"))
      .select("doc_id", "cluster_id", "cluster_size")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq

  test("components: chain, pair, and triangle resolve to min-id labels") {
    val got = cc(Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L)))
    assert(got === Seq(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (10L, 10L, 2L), (11L, 10L, 2L),
      (20L, 20L, 3L), (21L, 20L, 3L), (22L, 20L, 3L)))
  }

  test("long path converges past one hop per round (diameter > 1)") {
    // path 1-2-...-8: min label must walk 7 hops; also reversed edge order
    val got = cc((1L to 7L).map(i => (i + 1, i)))
    assert(got === (1L to 8L).map(i => (i, 1L, 8L)))
  }

  test("components are partition-invariant") {
    val edges = (1L to 7L).map(i => (i + 1, i)) ++ Seq((100L, 200L))
    val a = cc(edges)
    val b = Clusters.connectedComponents(edges.toDF("a_id", "b_id").repartition(13))
      .select("doc_id", "cluster_id", "cluster_size")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a === b)
  }

  test("empty edge list yields an empty clustering (no crash, converged)") {
    assert(cc(Seq.empty) === Seq.empty)
  }

  def ccStar(edges: Seq[(Long, Long)]) = {
    val (df, rounds) = Clusters.connectedComponentsStar(edges.toDF("a_id", "b_id"))
    (df.select("doc_id", "cluster_id", "cluster_size")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq, rounds)
  }

  test("star components match min-label propagation on mixed shapes") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L))
    assert(ccStar(edges)._1 === cc(edges))
  }

  test("star converges in logarithmic rounds on a long chain") {
    // path 1-2-...-200: diameter 199 — min-label propagation would need
    // ~199 rounds; the alternating star algorithm must stay logarithmic.
    val edges = (1L to 199L).map(i => (i + 1, i))
    val (got, rounds) = ccStar(edges)
    assert(got === (1L to 200L).map(i => (i, 1L, 200L)))
    assert(rounds <= 12, s"expected O(log n) rounds on a 200-chain, got $rounds")
  }

  test("star components are partition-invariant and handle empty input") {
    val edges = (1L to 7L).map(i => (i + 1, i)) ++ Seq((100L, 200L))
    val a = ccStar(edges)._1
    val b = Clusters.connectedComponentsStar(edges.toDF("a_id", "b_id").repartition(13))._1
      .select("doc_id", "cluster_id", "cluster_size")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a === b)
    assert(ccStar(Seq.empty)._1 === Seq.empty)
  }

  test("d7 clusters cover exactly the docs that appear in d3 pairs") {
    val pairs = Dedup.minHashLshPairs(Tables.documents(spark, sf001), 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect()
    val clustered = Clusters.connectedComponents(
        Dedup.minHashLshPairs(Tables.documents(spark, sf001), 0.5)
          .select("a_id", "b_id"))
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    val vertices = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(clustered.keySet === vertices)
    // every emitted pair lands inside one cluster
    assert(pairs.forall(p => clustered(p._1) === clustered(p._2)))
    // cluster label is a member of its own cluster
    assert(clustered.values.toSet.subsetOf(vertices))
  }
}
