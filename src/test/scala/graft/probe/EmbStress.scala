package graft.probe
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ml.Similarity

/** Synthetic 4×/16×/40× embeddings stress (no sf1 fixtures exist):
  * the sf0.1 table unioned s times with deterministic per-copy
  * perturbations, through the scale-sensitive ANN paths with their
  * production sizing rules (corpus-derived LSH planes; IVF cells
  * ∝ √n). Prints wall seconds per scale and the fitted scaling
  * exponent log(t_s/t_1)/log(s) — SCALE.md's round-9 table. */
object EmbStress {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select("vec_id", "embedding")
    val n0 = base.count()
    def scaled(s: Int): DataFrame = {
      val copies = (0 until s).map { k =>
        if (k == 0) base
        else base.select(
          (col("vec_id") + lit(k * n0)).as("vec_id"),
          // deterministic per-(copy, dim) perturbation, ±0.15 swing —
          // copies are corpus-mates, not exact dups of the original.
          // d's multiplier must be coprime with the modulus: d * 7 % 7
          // degenerates to a constant shift per copy, which leaves
          // every copy in its base vector's LSH bucket (measured:
          // 1785 candidates/vector instead of ~400 at 40×)
          expr(s"transform(embedding, (x, d) -> x + " +
            s"cast(((vec_id * 31 + $k * 17 + d * 5) % 7 - 3) as float) * 0.05f)")
            .as("embedding"))
      }
      copies.reduce(_.unionByName(_)).repartition(
        spark.sparkContext.defaultParallelism).localCheckpoint(true)
    }
    // frees only the RDDs an op pinned (its internal checkpoints),
    // never the shared input's
    def time(f: => Long): Double = {
      val keep = spark.sparkContext.getPersistentRDDs.keySet
      val t0 = System.nanoTime(); f
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs
        .filterNot(kv => keep(kv._1)).values.foreach(_.unpersist(false))
      dt
    }
    val scales = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 16, 40)
    val rows = scales.map { s =>
      val e = scaled(s)
      val n = s * n0
      // production sizing: LSH planes and IVF cells from the corpus
      // count (expected cell size tracks the target as data grows)
      val planes = Similarity.lshPlanesFor(n, 96L, 2)
      val cells = Similarity.ivfCellsFor(n, 128L, 16)
      val tL = time(Similarity.topKLshMulti(e, "vec_id", "embedding", 3,
        planes, 64, 4, planeStride = 4, bucketCap = 1024).count())
      val tD = time(Similarity.cosinePairsLsh(e, "vec_id", "embedding",
        0.4, Similarity.lshPlanesFor(n, 192L, 3), 64, 3).count())
      val tI = time(Similarity.topKIvfKmeans(e, "vec_id", "embedding", 3,
        cells, 2, 64, 2, trainMod = 4).count())
      // semdedup at production sizing: JOIN-on-cell pair generation,
      // derived cell count, sampled training — the q_semdedup shape
      val tS = time(Similarity.semDedup(e, "vec_id", "embedding", 0.9,
        cells, 2, 64, 4).count())
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      println(f"s=$s%3d n=$n%8d planes=$planes%2d cells=$cells%3d " +
        f"lsh_multi=$tL%7.2f cos_lsh=$tD%7.2f ivf_kmeans=$tI%7.2f semdedup=$tS%7.2f")
      (s, tL, tD, tI, tS)
    }
    val (s1, l1, d1, i1, m1) = rows.head
    rows.tail.foreach { case (s, l, d, i, m) =>
      def ex(t: Double, t1: Double) = math.log(t / t1) / math.log(s.toDouble / s1)
      println(f"s=$s%3d exponents: lsh_multi=${ex(l, l1)}%.2f " +
        f"cos_lsh=${ex(d, d1)}%.2f ivf_kmeans=${ex(i, i1)}%.2f " +
        f"semdedup=${ex(m, m1)}%.2f")
    }
    spark.stop()
  }
}
