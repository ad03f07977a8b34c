package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Text-analysis and deduplication operators for large-scale training-data
 * pipelines: tokenization, language ID, quality scoring, fingerprinting,
 * MinHash+LSH / SimHash / n-gram-Jaccard dedup.
 *
 * Everything is integer/rational arithmetic over deterministic token ids
 * so results are exactly reproducible across engines (the DuckDB oracle
 * computes the identical pipeline). Scale note: the rank-based vocabulary
 * (dense_rank over sorted distinct shingles) exists for oracle exactness;
 * at 100 TB swap `vocabId` for `xxhash64(shingle)` — the pipeline shape
 * (explode → per-shingle min → band → bucket join) is unchanged and every
 * step remains a keyed shuffle, never a driver collect.
 */
object TextOps {

  /** Lowercase alphanumeric tokens. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), x => length(x) > 0)

  /** Word k-grams ("shingles") joined by spaces. Guarded: Spark's
    * `sequence(1, 0)` would count DOWN, so short docs get an empty array. */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(
        sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
      .otherwise(array().cast("array<string>"))

  /** Rolling polynomial fingerprint of the raw characters:
    * fold(acc*31 + ascii(char)) mod 1e9+7 — exact in 64-bit. */
  def fingerprint(text: Column): Column =
    aggregate(
      sequence(lit(1), length(text)),
      lit(0L),
      (acc, i) => (acc * 31 + ascii(text.substr(i, lit(1)))) % 1000000007L)

  // ------------------------------------------------------------------
  // Language ID: stopword-hit heuristic with a fixed priority tie-break.
  // ------------------------------------------------------------------

  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "les", "des", "et", "une", "dans"))

  def stopwordHits(toks: Column, lang: String): Column =
    size(filter(toks, x => x.isInCollection(stopwords(lang))))

  /** Deterministic argmax over per-language hits, priority en>es>de>fr. */
  def langGuess(en: Column, es: Column, de: Column, fr: Column): Column =
    when(en > 0 && en >= es && en >= de && en >= fr, "en")
      .when(es > 0 && es >= de && es >= fr, "es")
      .when(de > 0 && de >= fr, "de")
      .when(fr > 0, "fr")
      .otherwise("und")

  // ------------------------------------------------------------------
  // MinHash + LSH: numBands bands of rowsPerBand hashes each.
  // h_j(id) = (a_j * id + b_j) mod P with id = rank of shingle in the
  // sorted distinct-shingle vocabulary.
  // ------------------------------------------------------------------

  val P: Long = 2147483647L
  def aCoef(j: Int): Long = 2L * j + 3
  def bCoef(j: Int): Long = 7919L * j + 13

  /** (doc_id, shingle) edges, distinct. */
  def shingleEdges(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    docs.select(col(idCol), explode(shingles(tokens(col(textCol)), k)).as("shingle"))
      .distinct()

  /** Deterministic vocabulary: shingle → dense rank in sorted order.
    * Small output, built once; swap for xxhash64 at scale. */
  def vocab(edges: DataFrame): DataFrame =
    edges.select("shingle").distinct()
      .withColumn("sid", row_number().over(Window.orderBy(col("shingle"))).cast("long"))

  /** One row per doc: minhash signature columns h0..h{n-1}. */
  def minhashSignatures(edges: DataFrame, idCol: String, numHashes: Int): DataFrame = {
    val withIds = edges.join(vocab(edges), "shingle")
    val aggs = (0 until numHashes).map { j =>
      min((col("sid") * aCoef(j) + bCoef(j)) % P).as(s"h$j")
    }
    withIds.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** (doc, band, key) rows; equal keys within a band = candidate pair. */
  def lshBands(sigs: DataFrame, idCol: String, numBands: Int, rowsPerBand: Int): DataFrame = {
    val bands = (0 until numBands).map { b =>
      val key = concat_ws("_",
        (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}")): _*)
      sigs.select(col(idCol), lit(b).as("band"), key.as("key"))
    }
    bands.reduce(_.unionByName(_))
  }

  /** Distinct candidate pairs (a < b) colliding in at least one band. */
  def lshCandidates(bandsDf: DataFrame, idCol: String): DataFrame = {
    val l = bandsDf.select(col("band"), col("key"), col(idCol).as("a"))
    val r = bandsDf.select(col("band"), col("key"), col(idCol).as("b"))
    l.join(r, Seq("band", "key")).filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  // ------------------------------------------------------------------
  // SimHash: nBits-bit signature over distinct unigram token ids.
  // bit_k votes +1/-1 by ((id * (2k+7919)) mod 131071) mod 2.
  // ------------------------------------------------------------------

  def simhash(edgesWithIds: DataFrame, idCol: String, nBits: Int): DataFrame = {
    val bitAggs = (0 until nBits).map { k =>
      val vote = when((col("sid") * (2L * k + 7919) % 131071L) % 2 === 1, 1L).otherwise(-1L)
      (sum(vote) > 0).cast("long").as(s"b$k")
    }
    val withBits = edgesWithIds.groupBy(col(idCol)).agg(bitAggs.head, bitAggs.tail: _*)
    val sig = (0 until nBits).map(k => col(s"b$k") * (1L << k)).reduce(_ + _)
    withBits.select(col(idCol), sig.as("simhash"))
  }
}
