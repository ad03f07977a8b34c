package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (ARRAY<FLOAT>).
 *
 * Determinism discipline: dot products are sequential left folds of
 * double-promoted floats (`zip_with` + `aggregate`), the exact op
 * sequence the DuckDB oracle uses (`list_zip` + `list_reduce`), so
 * scores are bit-identical and rank order transfers across engines.
 *
 * Scale shape: brute force is the O(n²) baseline (fine to ~10⁴ rows /
 * bucket); the LSH path buckets by random-hyperplane sign bits so the
 * quadratic join only happens within buckets — at 100 TB the bucket
 * join is a keyed shuffle with bounded per-bucket cost, and the
 * hyperplane bits are computed in one projection, no driver state.
 */
object Similarity {

  /** Sequential-fold dot product (deterministic across engines). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** All-pairs cosine (a < b) above `minCos` — brute-force baseline. */
  def cosinePairs(emb: DataFrame, idCol: String, vecCol: String, minCos: Double): DataFrame = {
    val l = emb.select(col(idCol).as("a"), col(vecCol).as("va"))
    val r = emb.select(col(idCol).as("b"), col(vecCol).as("vb"))
    l.crossJoin(r).filter(col("a") < col("b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (norm(col("va")) * norm(col("vb"))))
      .filter(col("cos") >= minCos)
      .select("a", "b", "cos")
  }

  /** Brute-force cosine top-k neighbors per query vector. */
  def topK(emb: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val l = emb.select(col(idCol).as("a"), col(vecCol).as("va"))
    val r = emb.select(col(idCol).as("b"), col(vecCol).as("vb"))
    val scored = l.crossJoin(r).filter(col("a") =!= col("b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (norm(col("va")) * norm(col("vb"))))
    val wRank = Window.partitionBy(col("a")).orderBy(col("cos").desc, col("b"))
    scored.withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= k)
      .select("a", "rank", "b")
  }

  /** Integer-valued pseudo-random hyperplane component for (plane j, dim d). */
  def planeCoef(j: Int, d: Int): Long = ((j * 131 + d * 137) % 19) - 9

  /** Sign-bit bucket id from `nPlanes` hyperplanes. */
  def lshBucket(vec: Column, nPlanes: Int, dims: Int): Column = {
    val bits = (0 until nPlanes).map { j =>
      val proj = (0 until dims)
        .map(d => element_at(vec, d + 1).cast("double") * planeCoef(j, d))
        .reduce(_ + _)
      when(proj > 0, 1L << j).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed cosine top-k: the quadratic join stays within buckets. */
  def topKLsh(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      nPlanes: Int, dims: Int): DataFrame = {
    val bucketed = emb.select(col(idCol), col(vecCol),
      lshBucket(col(vecCol), nPlanes, dims).as("bucket"))
    val l = bucketed.select(col("bucket"), col(idCol).as("a"), col(vecCol).as("va"))
    val r = bucketed.select(col("bucket"), col(idCol).as("b"), col(vecCol).as("vb"))
    val scored = l.join(r, Seq("bucket")).filter(col("a") =!= col("b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (norm(col("va")) * norm(col("vb"))))
    val wRank = Window.partitionBy(col("a")).orderBy(col("cos").desc, col("b"))
    scored.withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= k)
      .select("a", "rank", "b")
  }
}
