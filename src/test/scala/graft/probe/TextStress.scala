package graft.probe
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.TextOps
import graft.multimodal.Multimodal

/** Synthetic 4×/16×/40× TEXT dedup stress (the EmbStress counterpart
  * for the minhash/phash family): the sf0.1 documents table unioned s
  * times under two deterministic perturbations —
  *
  *  - corpus-mate (default): a copy-specific token between every pair
  *    of words rewrites EVERY shingle, so copies relate within their
  *    copy generation only and near-dup structure stays linear in s;
  *  - near-dup (the degenerate shape, largest scale only): one
  *    appended token changes only the tail shingles, so all s copies
  *    of a doc share LSH buckets — the mega-bucket shape
  *    LSH_BUCKET_CAP (collectMinK) must bound.
  *
  * Runs the q_dedup_minhash candidate shape (sig → bands → capped
  * in-bucket pairs) and the q_dedup_phash shape (real PNG encode →
  * codec decode → hash-word band keys → capped bucket join → exact
  * hamming) at production sizing, prints wall seconds, candidate
  * counts, fitted scaling exponents, and the join strategies of the
  * largest-scale plans (the Generate-broadcast trap check: candidate
  * frames must reach their joins via shuffle, never a static
  * broadcast of an explode chain). */
object TextStress {
  private val K = 3; private val H = 12
  private val BANDS = 4; private val R = 3
  private val CAP = 1024

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val n0 = base.count()

    def scaled(s: Int, nearDup: Boolean): DataFrame = {
      val copies = (0 until s).map { k =>
        if (k == 0) base
        else if (nearDup) base.select(
          (col("doc_id") + lit(k * n0)).as("doc_id"),
          concat(col("text"), lit(s" tk$k")).as("text"))
        else base.select(
          (col("doc_id") + lit(k * n0)).as("doc_id"),
          // copy-tag PREFIX on every word: trigram overlap within a
          // copy mirrors the base corpus exactly, and copies k ≠ j
          // share no trigrams (a separate inserted token would itself
          // bridge shingles across docs — measured 1.59M candidates
          // at s=2 instead of the linear ~3.5k)
          regexp_replace(col("text"), "\\b(\\w)", s"c$k$$1").as("text"))
      }
      copies.reduce(_.unionByName(_)).repartition(
        spark.sparkContext.defaultParallelism).localCheckpoint(true)
    }

    def minhashCand(d: DataFrame): DataFrame = {
      val sigs = TextOps.minhashSigArray(d, "doc_id", "text", K, H)
      val bands = TextOps.lshBandsArr(sigs, "doc_id", BANDS, R)
      TextOps.lshCandidatesCapped(bands, "doc_id", CAP)
    }

    def phashPairs(d: DataFrame): DataFrame = {
      val items = d.repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          Multimodal.MediaItem(id, "image",
            Multimodal.encodePng(Multimodal.docPixels(text.take(64), 16), 16, 16),
            16, 16)
        }
      val words = Multimodal.phashWords(items).localCheckpoint()
      val cand = words.groupBy("w", "v")
        .agg(graft.functions.Aggregators.collectMinK(col("media_id"), CAP).as("ms"))
        .filter(size(col("ms")) > 1)
        .select(explode(col("ms")).as("a"), col("ms"))
        .select(col("a"), explode(col("ms")).as("b"))
        .filter(col("a") < col("b"))
        .select("a", "b").distinct()
      val wa = words.select(col("media_id").as("a"), col("w"), col("v").as("va"))
      val wb = words.select(col("media_id").as("b"), col("w"), col("v").as("vb"))
      cand.join(wa, "a").join(wb, Seq("b", "w"))
        .groupBy("a", "b")
        .agg(sum(bit_count(col("va").bitwiseXOR(col("vb")))).as("ham"))
        .filter(col("ham") <= 8)
    }

    // frees only the RDDs an op pinned (its internal checkpoints),
    // never the shared input's
    def time[T](f: => T): (T, Double) = {
      val keep = spark.sparkContext.getPersistentRDDs.keySet
      val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs
        .filterNot(kv => keep(kv._1)).values.foreach(_.unpersist(false))
      (r, dt)
    }

    val scales = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 16, 40)
    // JIT warmup: one untimed pass of both pipelines so the s=1
    // baseline isn't first-pass codegen compilation (measured 6.1 s
    // cold vs 2.7 s steady on the minhash chain)
    locally {
      val w = scaled(1, nearDup = false)
      minhashCand(w).count(); phashPairs(w).count()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    val rows = scales.map { s =>
      val d = scaled(s, nearDup = false)
      val (nM, tM) = time(minhashCand(d).count())
      val (nP, tP) = time(phashPairs(d).count())
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      println(f"s=$s%3d n=${s * n0}%8d minhash=$tM%7.2f ($nM%9d cand) " +
        f"phash=$tP%7.2f ($nP%9d pairs)")
      (s, tM, tP)
    }
    val (s1, m1, p1) = rows.head
    rows.tail.foreach { case (s, m, p) =>
      def ex(t: Double, t1: Double) = math.log(t / t1) / math.log(s.toDouble / s1)
      println(f"s=$s%3d exponents: minhash=${ex(m, m1)}%.2f phash=${ex(p, p1)}%.2f")
    }

    // degenerate near-dup shape at the largest scale: every copy of a
    // doc shares its buckets — the cap must bound the quadratic term
    val sMax = scales.last
    val dn = scaled(sMax, nearDup = true)
    val (nN, tN) = time(minhashCand(dn).count())
    println(f"neardup s=$sMax%3d minhash=$tN%7.2f ($nN%9d cand)")

    // Generate-broadcast trap check (the round-9 EmbStress crash
    // class): at the largest scale, NO static BroadcastExchange may
    // sit over an explode chain of the scaled corpus — Generate does
    // not scale sizeInBytes by fanout, so such a broadcast is an
    // O(n·fanout) driver collect waiting to happen. Everything below
    // these plans IS the big corpus (a localCheckpoint leaf), so any
    // Generate under a broadcast is an offender.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.GenerateExec
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def hasGen(p: SparkPlan): Boolean = p match {
      case _: GenerateExec => true
      case other => other.children.exists(hasGen)
    }
    def offenders(p: SparkPlan): Seq[String] = p match {
      case a: AdaptiveSparkPlanExec => offenders(a.inputPlan)
      case b: BroadcastExchangeExec if hasGen(b.child) =>
        Seq(b.child.toString.takeWhile(_ != '\n').take(70)) ++
          b.children.flatMap(offenders)
      case other => other.children.flatMap(offenders)
    }
    for ((nm, df) <- Seq(
        ("minhash", minhashCand(scaled(sMax, nearDup = false))),
        ("phash", phashPairs(scaled(sMax, nearDup = false)))) ) {
      val bad = offenders(df.queryExecution.executedPlan)
      println(s"$nm@${sMax}x generate-broadcast offenders: " +
        (if (bad.isEmpty) "NONE" else bad.mkString("; ")))
    }
    spark.stop()
  }
}
