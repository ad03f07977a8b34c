package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Durable storage for the CONSTANT-SIZE index artifacts the engine
 * trains (k-means centroids, BPE merge tables, unigram vocabularies) —
 * the piece of the train → persist → serve lifecycle that survives a
 * session/cluster RESTART. In-session the artifacts live as
 * driver-resident state / checkpointed local relations (the
 * [[graft.ml.Similarity]] discipline); a real pipeline trains nightly,
 * writes the artifact next to the bucketed postings table
 * ([[Sinks.appendBucketed]]), and every serving job loads it back with
 * one tiny parquet read — no retraining in any serve plan.
 *
 * All artifacts are plain parquet with stable column names, so they
 * are also readable by any other engine (the DuckDB oracle could load
 * them directly). Loaders restore the exact in-memory form the
 * training functions produce, ordered deterministically, so
 * save → load → serve is bit-identical to serving from the training
 * session (spec-proved).
 */
object IndexStore {

  /** Persist a centroid table ((cid, vector) — the
    * [[graft.ml.Similarity.kmeansCentroids]] shape) as parquet. One
    * file: the artifact is nCells rows. */
  def saveCentroids(cents: DataFrame, path: String): Unit =
    cents.coalesce(1).write.mode("overwrite").parquet(path)

  /** Load a persisted centroid table for
    * [[graft.ml.Similarity.ivfAssignFromCentroids]] / serveTopK. */
  def loadCentroids(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Persist the jointly-trained PQ codebooks ((mi, cid, cq, cnt) — the
    * [[graft.ml.Similarity.pqTrainArtifacts]] shape, m·pqK rows of
    * integer sums + member counts; the codeword mean cq/cnt is exactly
    * reconstructible, so save → load → serve is bit-identical). */
  def savePqCodebooks(cb: DataFrame, path: String): Unit =
    cb.coalesce(1).write.mode("overwrite").parquet(path)

  /** Load persisted PQ codebooks for
    * [[graft.ml.Similarity.topKIvfPqServe]]. */
  def loadPqCodebooks(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .select(col("mi").cast("int").as("mi"), col("cid").cast("long").as("cid"),
        col("cq").cast("array<long>").as("cq"),
        col("cnt").cast("long").as("cnt"))

  /** Persist a BPE merge table (rank order = application order). */
  def saveBpeRules(spark: SparkSession, lhs: Array[String],
      rhs: Array[String], path: String): Unit = {
    import spark.implicits._
    require(lhs.length == rhs.length, "ragged rule table")
    lhs.indices.map(i => (i.toLong, lhs(i), rhs(i))).toDF("step", "lhs", "rhs")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a BPE merge table in step order — the arrays
    * [[graft.functions.VectorFunctions.bpeSegment]] takes. */
  def loadBpeRules(spark: SparkSession, path: String): (Array[String], Array[String]) = {
    val rows = spark.read.parquet(path)
      .orderBy("step").select("lhs", "rhs").collect()
    (rows.map(_.getString(0)), rows.map(_.getString(1)))
  }

  /** Persist a unigram vocabulary (piece → usage weight). */
  def saveUnigramVocab(spark: SparkSession, pieces: Array[String],
      cnts: Array[Long], path: String): Unit = {
    import spark.implicits._
    require(pieces.length == cnts.length, "ragged vocabulary")
    pieces.zip(cnts).toSeq.toDF("piece", "usage")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a unigram vocabulary, piece-ordered — the arrays a
    * [[graft.functions.UnigramVocab]] is built from. */
  def loadUnigramVocab(spark: SparkSession, path: String): (Array[String], Array[Long]) = {
    val rows = spark.read.parquet(path)
      .orderBy("piece").select(col("piece"), col("usage").cast("long")).collect()
    (rows.map(_.getString(0)), rows.map(_.getLong(1)))
  }
}
