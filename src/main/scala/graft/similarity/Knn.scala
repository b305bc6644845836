package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.dedup.Dedup.md5Hash60

/** Similarity search over an embedding column (`array<float>`).
  *
  *  - [[bruteForceTopK]]: exact top-k by inner product (= cosine here: the
  *    test vectors are unit-norm). The query set broadcasts; scoring is a
  *    BroadcastNestedLoopJoin + a per-pair ordered fold (`zip_with` +
  *    `aggregate`, left-to-right), so the double arithmetic is bit-identical
  *    across engines and partition counts — no shuffle at all on the corpus
  *    side beyond the final per-query top-k.
  *  - [[lshTopK]]: sign-random-projection LSH — L hash tables of b-bit
  *    bucket codes; only same-bucket vectors are scored. The 100 TB path:
  *    candidate generation is an equi-join on (table, code), cost ∝ bucket
  *    collisions instead of |queries|×|corpus|. Hyperplanes are md5-derived,
  *    so fully deterministic.
  */
object Knn {

  /** Ordered left-fold dot product of two float arrays, in double — the
    * summation order is the array order in both Spark (`ArrayAggregate`)
    * and DuckDB (`list_reduce`), making results engine-exact. */
  def dotFold(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** Exact top-k inner-product neighbors for query vectors (`vec_id % 20 = 0`).
    * Norms are one fold per *vector* (broadcast-joined in), not per pair —
    * per-pair norm recomputation cost |queries|·|corpus| redundant folds. */
  def bruteForceTopK(emb: DataFrame, k: Int): DataFrame = {
    val q = emb.select(col("vec_id").as("a_id"), col("embedding").as("ea"))
      .filter(col("a_id") % 20 === 0)
    val c = emb.select(col("vec_id").as("b_id"), col("embedding").as("eb"))
    val norms = emb.select(col("vec_id").as("id"),
      dotFold(col("embedding"), col("embedding")).as("n2"))
    val scored = c.join(broadcast(q), col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"), dotFold(col("ea"), col("eb")).as("dot"))
    val rk = Window.partitionBy("a_id").orderBy(col("dot").desc, col("b_id").asc)
    scored.withColumn("rk", row_number().over(rk))
      .filter(col("rk") <= k)
      .join(broadcast(norms.toDF("a_id", "na2")), "a_id")
      .join(broadcast(norms.toDF("b_id", "nb2")), "b_id")
      .select(col("a_id"), col("rk"), col("b_id"), col("dot"),
        (col("dot") / (sqrt(col("na2")) * sqrt(col("nb2")))).as("cosine"))
  }

  val lshBits = 8
  val lshTables = 4
  val maxDims = 64

  /** Deterministic md5-derived hyperplane matrix, computed once on the
    * driver and shipped as a literal array — zero runtime hashing, zero
    * extra shuffle. planes((t*lshBits + j)*maxDims + i) ∈ [-0.5, 0.5). */
  lazy val planes: Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(lshTables * lshBits * maxDims) { flat =>
      val t = flat / (lshBits * maxDims)
      val j = (flat / maxDims) % lshBits
      val i = flat % maxDims
      val hex = md.digest(s"plane|$t|$j|$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16).toDouble / 1152921504606846976.0 /* 2^60 */ - 0.5
    }
  }

  /** (vec id, table, bucket code): L × b-bit sign-random-projection codes.
    * One explode + one wide aggregation (L·b projection sums per vector),
    * planes indexed from the broadcast literal. */
  def srpCodes(emb: DataFrame): DataFrame = {
    val planesLit = typedLit(planes.toSeq)
    val projSums = (0 until lshTables * lshBits).map { flat =>
      sum(col("v").cast("double") *
        element_at(planesLit, lit(flat * maxDims) + col("i") + 1)).as(s"p$flat")
    }
    val codes = (0 until lshTables).map { t =>
      struct(lit(t).as("t"),
        (0 until lshBits)
          .map(j => when(col(s"p${t * lshBits + j}") > 0, lit(1L << j)).otherwise(0L))
          .reduce(_ + _).as("code"))
    }
    emb.select(col("vec_id").as("id"), posexplode(col("embedding")).as(Seq("i", "v")))
      .groupBy("id").agg(projSums.head, projSums.tail: _*)
      .select(col("id"), explode(array(codes: _*)).as("tc"))
      .select(col("id"), col("tc.t").as("t"), col("tc.code").as("code"))
  }

  /** Approximate top-k: union of same-bucket candidates over all tables.
    * Recall vs [[bruteForceTopK]] is asserted in KnnSpec. */
  def lshTopK(emb: DataFrame, k: Int): DataFrame = {
    // both sides of the bucket self-join read the codes; pushdown of the
    // query-side filter differentiates the subtrees and defeats exchange
    // reuse, so cache the sketch (a few KB per thousand vectors)
    val codes = graft.util.Caches.scoped(srpCodes(emb))
    val qc = codes.filter(col("id") % 20 === 0).toDF("a_id", "t", "code")
    val bc = codes.toDF("b_id", "t", "code")
    val cand = qc.join(bc, Seq("t", "code")).filter(col("a_id") =!= col("b_id"))
      .select("a_id", "b_id").distinct()
    val q = emb.select(col("vec_id").as("a_id"), col("embedding").as("ea"))
    val c = emb.select(col("vec_id").as("b_id"), col("embedding").as("eb"))
    val dots = cand.join(c, "b_id").join(broadcast(q), "a_id")
      .select(col("a_id"), col("b_id"), dotFold(col("ea"), col("eb")).as("dot"))
    val rk = Window.partitionBy("a_id").orderBy(col("dot").desc, col("b_id").asc)
    dots.withColumn("rk", row_number().over(rk))
      .filter(col("rk") <= k)
      .select(col("a_id"), col("rk"), col("b_id"), col("dot"))
  }

  /** Embedding-cosine near-dup pairs: LSH-bucketed candidate generation +
    * exact cosine verify ≥ threshold. The dedup-tier twin of lshTopK —
    * cost ∝ bucket collisions, never |corpus|². */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val codes = graft.util.Caches.scoped(srpCodes(emb))
    val cand = codes.toDF("a_id", "t", "code")
      .join(codes.toDF("b_id", "t", "code"), Seq("t", "code"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    val va = emb.select(col("vec_id").as("a_id"), col("embedding").as("ea"))
    val vb = emb.select(col("vec_id").as("b_id"), col("embedding").as("eb"))
    val norms = emb.select(col("vec_id").as("id"),
      sqrt(dotFold(col("embedding"), col("embedding"))).as("nrm"))
    cand.join(broadcast(va), "a_id").join(broadcast(vb), "b_id")
      .join(broadcast(norms.toDF("a_id", "na")), "a_id")
      .join(broadcast(norms.toDF("b_id", "nb")), "b_id")
      .select(col("a_id"), col("b_id"),
        (dotFold(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  def s1KnnExact(spark: SparkSession, dir: String): DataFrame =
    bruteForceTopK(Tables.embeddings(spark, dir), 5).orderBy("a_id", "rk")

  def s2KnnLsh(spark: SparkSession, dir: String): DataFrame =
    lshTopK(Tables.embeddings(spark, dir), 5).orderBy("a_id", "rk")

  def d5EmbeddingNearDup(spark: SparkSession, dir: String): DataFrame =
    cosineNearDupPairs(Tables.embeddings(spark, dir), 0.3).orderBy("a_id", "b_id")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_knn_exact" -> (s1KnnExact _),
    "s2_knn_lsh" -> (s2KnnLsh _),
    "d5_embedding_neardup" -> (d5EmbeddingNearDup _)
  )

  /** s2 has no oracle entry (sketch-based candidate set is engine-internal;
    * its guarantee is recall vs s1, asserted in KnnSpec) → driver records a
    * rows-only check for it. */
  def oracle: Map[String, String] = Map(
    "s1_knn_exact" ->
      """WITH q AS (
        |  SELECT vec_id AS a_id, embedding AS ea FROM embeddings WHERE vec_id % 20 = 0),
        |norms AS (
        |  SELECT vec_id AS id,
        |    list_reduce(list_transform(range(1, len(embedding) + 1),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
        |      (acc, x) -> acc + x) AS n2
        |  FROM embeddings),
        |scored AS (
        |  SELECT a_id, b.vec_id AS b_id,
        |    list_reduce(list_transform(range(1, len(ea) + 1),
        |      i -> CAST(ea[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)),
        |      (acc, x) -> acc + x) AS dot
        |  FROM q JOIN embeddings b ON b.vec_id <> a_id),
        |ranked AS (
        |  SELECT a_id, b_id, dot,
        |    row_number() OVER (PARTITION BY a_id ORDER BY dot DESC, b_id) AS rk
        |  FROM scored)
        |SELECT a_id, rk, b_id, dot,
        |  dot / (sqrt(na.n2) * sqrt(nb.n2)) AS cosine
        |FROM ranked JOIN norms na ON na.id = a_id JOIN norms nb ON nb.id = b_id
        |WHERE rk <= 5 ORDER BY a_id, rk""".stripMargin
  )
}
