package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (`Array[Float]` 64-d).
  *
  * Float-parity rule: dot products are LEFT FOLDS over the element
  * order (Spark `aggregate`, DuckDB `list_reduce`) with every element
  * cast to double first — both engines then execute the identical IEEE
  * op sequence, so cosines are bit-identical and rank identically.
  *
  * Scale design: brute-force top-k broadcasts the (small) query set
  * against the full table — a broadcast nested-loop join that scans
  * the big side once, the right baseline at any scale. The bucketed
  * variant (sign-LSH on leading dimensions) prunes the candidate set
  * by joining on the bucket key instead — the IVF/LSH "scale path".
  */
object VectorOps {
  type Q = (SparkSession, String) => DataFrame

  /** Left-fold dot product of two double-cast float arrays. */
  private def dot(a: String, b: String): String =
    s"""aggregate(
          transform(sequence(1, size($a)), i ->
            CAST(element_at($a, i) AS DOUBLE) * CAST(element_at($b, i) AS DOUBLE)),
          CAST(0 AS DOUBLE), (acc, x) -> acc + x)"""

  /** DuckDB twin of [[dot]]. */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(
          list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1, len($a)), i ->
              CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
          (acc, x) -> acc + x)"""

  // ------------------------------------------------------------- stats
  /** Per-label embedding profile: count, dim, min/max L2 norm (min/max
    * of bit-identical doubles are exact across engines). */
  val q61NormStats: Q = (s, d) => {
    import s.implicits._
    Tables.embeddings(s, d)
      .withColumn("norm", sqrt(expr(dot("embedding", "embedding"))))
      .groupBy($"label")
      .agg(count(lit(1)).as("n_vecs"),
        min(size($"embedding")).as("dim"),
        min($"norm").as("min_norm"),
        max($"norm").as("max_norm"))
  }
  val o61: String = s"""
    SELECT label, COUNT(*) AS n_vecs,
           MIN(len(embedding)) AS dim,
           MIN(norm) AS min_norm, MAX(norm) AS max_norm
    FROM (SELECT label, embedding,
            sqrt(${dotSql("embedding", "embedding")}) AS norm
          FROM embeddings)
    GROUP BY label"""

  // --------------------------------------------------------- brute kNN
  /** Brute-force cosine top-k: queries = vec_id % 100 = 0, k = 5,
    * ranked by (cosine desc, vec_id asc). The exact baseline every ANN
    * variant is measured against. */
  val q62KnnBrute: Q = (s, d) => {
    import s.implicits._
    val e = Tables.embeddings(s, d)
      .withColumn("norm", sqrt(expr(dot("embedding", "embedding"))))
    val q = e.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"),
        $"norm".as("q_norm"))
    val c = e.select($"vec_id".as("neighbor_id"), $"embedding".as("n_emb"),
      $"norm".as("n_norm"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"cosine".desc, $"neighbor_id".asc)
    broadcast(q).join(c, $"query_id" =!= $"neighbor_id")
      .withColumn("cosine",
        expr(dot("q_emb", "n_emb")) / ($"q_norm" * $"n_norm"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"query_id", $"neighbor_id", $"rank", $"cosine")
  }
  val o62: String = s"""
    WITH e AS (
      SELECT vec_id, embedding,
             sqrt(${dotSql("embedding", "embedding")}) AS norm
      FROM embeddings),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        ${dotSql("q.embedding", "c.embedding")} / (q.norm * c.norm) AS cosine
      FROM e q JOIN e c ON q.vec_id % 100 = 0 AND q.vec_id <> c.vec_id)
    SELECT query_id, neighbor_id, rank, cosine FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM pairs)
    WHERE rank <= 5"""

  // ------------------------------------------------------ bucketed ANN
  /** Sign-LSH bucketed ANN: bucket = sign bits of dims 1..4 (16
    * buckets); top-3 within the query's bucket only. Trades recall for
    * a 16× candidate cut — the partition-pruned scale path. */
  private val bucketExpr =
    """CAST(CASE WHEN element_at(embedding, 1) > 0 THEN 1 ELSE 0 END
         + CASE WHEN element_at(embedding, 2) > 0 THEN 2 ELSE 0 END
         + CASE WHEN element_at(embedding, 3) > 0 THEN 4 ELSE 0 END
         + CASE WHEN element_at(embedding, 4) > 0 THEN 8 ELSE 0 END AS BIGINT)"""
  private val bucketSql =
    """CAST(CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
         + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
         + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END
         + CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END AS BIGINT)"""

  val q63AnnBucketed: Q = (s, d) => {
    import s.implicits._
    val e = Tables.embeddings(s, d)
      .withColumn("norm", sqrt(expr(dot("embedding", "embedding"))))
      .withColumn("bucket", expr(bucketExpr))
    val q = e.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"),
        $"norm".as("q_norm"), $"bucket")
    val c = e.select($"vec_id".as("neighbor_id"), $"embedding".as("n_emb"),
      $"norm".as("n_norm"), $"bucket")
    val w = Window.partitionBy($"query_id")
      .orderBy($"cosine".desc, $"neighbor_id".asc)
    broadcast(q).join(c, Seq("bucket"))
      .filter($"query_id" =!= $"neighbor_id")
      .withColumn("cosine",
        expr(dot("q_emb", "n_emb")) / ($"q_norm" * $"n_norm"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"query_id", $"neighbor_id", $"bucket", $"rank", $"cosine")
  }
  val o63: String = s"""
    WITH e AS (
      SELECT vec_id, embedding,
             sqrt(${dotSql("embedding", "embedding")}) AS norm,
             $bucketSql AS bucket
      FROM embeddings),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.bucket,
        ${dotSql("q.embedding", "c.embedding")} / (q.norm * c.norm) AS cosine
      FROM e q JOIN e c ON q.bucket = c.bucket
       AND q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id)
    SELECT query_id, neighbor_id, bucket, rank, cosine FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM pairs)
    WHERE rank <= 3"""

  // ---------------------------------------------------- cosine near-dup
  /** Embedding-cosine near-duplicate pairs: same-label blocking (the
    * cluster id is the coarse quantizer), sampled ids, cosine ≥ 0.3.
    * At 100 TB the label comes from a trained IVF coarse quantizer;
    * the join stays keyed on it either way. */
  val q64CosineNearDup: Q = (s, d) => {
    import s.implicits._
    val e = Tables.embeddings(s, d)
      .filter($"vec_id" % 5 === 0)
      .withColumn("norm", sqrt(expr(dot("embedding", "embedding"))))
    val a = e.select($"label", $"vec_id".as("id_a"),
      $"embedding".as("emb_a"), $"norm".as("norm_a"))
    val b = e.select($"label", $"vec_id".as("id_b"),
      $"embedding".as("emb_b"), $"norm".as("norm_b"))
    a.join(b, Seq("label")).filter($"id_a" < $"id_b")
      .withColumn("cosine",
        expr(dot("emb_a", "emb_b")) / ($"norm_a" * $"norm_b"))
      .filter($"cosine" >= 0.3)
      .select($"label", $"id_a", $"id_b", $"cosine")
  }
  val o64: String = s"""
    WITH e AS (
      SELECT label, vec_id, embedding,
             sqrt(${dotSql("embedding", "embedding")}) AS norm
      FROM embeddings WHERE vec_id % 5 = 0)
    SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
      ${dotSql("a.embedding", "b.embedding")} / (a.norm * b.norm) AS cosine
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE ${dotSql("a.embedding", "b.embedding")} / (a.norm * b.norm) >= 0.3"""

  val queries: Map[String, Q] = Map(
    "q61_norm_stats" -> q61NormStats,
    "q62_knn_brute" -> q62KnnBrute,
    "q63_ann_bucketed" -> q63AnnBucketed,
    "q64_cosine_neardup" -> q64CosineNearDup)

  val oracles: Map[String, String] = Map(
    "q61_norm_stats" -> o61,
    "q62_knn_brute" -> o62,
    "q63_ann_bucketed" -> o63,
    "q64_cosine_neardup" -> o64)
}
