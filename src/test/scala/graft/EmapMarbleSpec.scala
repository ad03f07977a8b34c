package graft

import org.apache.spark.sql.functions._
import graft.engine.EventStream
import graft.sources.Sources

/**
 * Higher-order (emap family) goldens from the reference's marble-diagram
 * tests (`/root/reference/tests/transform_test.py:117-166`). Child v is
 * spawned at t = v seconds (range(3) emits one value per tick); marble
 * char positions are seconds within the child.
 */
class EmapMarbleSpec extends SparkSpec {

  /** Parent stream (seq = v, ts = v seconds) whose `children` column is
    * the marble rows of marbles(v), shifted by the spawn time. */
  private def parentWithChildren(marbles: Seq[String]) = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = marbles.zipWithIndex.map { case (m, v) =>
      val kids = Sources.marbleRows(m).map { case (j, tsUs, c) =>
        Row(j, tsUs + v * 1000000L, c)
      }
      Row(v.toLong, new java.sql.Timestamp(1704067200000L + v * 1000L), kids)
    }
    val schema = StructType(Seq(
      StructField("seq", LongType),
      StructField("ts", TimestampType),
      StructField("children", ArrayType(StructType(Seq(
        StructField("j", LongType),
        StructField("cts", LongType),
        StructField("c", StringType)))))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    EventStream(df, keys = Nil)
  }

  private def outValues(es: EventStream): Seq[String] =
    es.df.orderBy("__outseq").select("__child.c").collect().map(_.getString(0)).toSeq

  test("mergemap (transform_test.py:117-127)") {
    val marbles = Seq(
      "A   B    C    D",
      "_1   2  3    4",
      "__K   L     M   N")
    val got = outValues(parentWithChildren(marbles).emapMerge(col("children"), "cts"))
    assert(got == Seq("A", "1", "K", "B", "2", "L", "3", "C", "M", "4", "D", "N"))
  }

  test("chainmap (transform_test.py:146-156)") {
    val marbles = Seq(
      "A    B    C    D           ",
      "_       1    2    3    4",
      "__                  K    L      M   N")
    val got = outValues(parentWithChildren(marbles).emapChain(col("children"), "j"))
    assert(got == Seq("A", "B", "C", "D", "1", "2", "3", "4", "K", "L", "M", "N"))
  }

  test("concatmap (transform_test.py:135-146)") {
    val marbles = Seq(
      "A    B    C    D",
      "_       1    2    3    4",
      "__                  K    L      M   N")
    val got = outValues(parentWithChildren(marbles).emapConcat(col("children"), "cts"))
    assert(got == Seq("A", "B", "1", "2", "3", "K", "L", "M", "N"))
  }

  test("switchmap via the switch scan (transform_test.py:156-166)") {
    // The last child to EMIT preempts — child 2 (created last) emits
    // before child 1, so the lead-rule shortcut does not apply; compose
    // Emap with the general Switch joiner exactly like the reference.
    val marbles = Seq(
      "A    B    C    D           ",
      "_                 K    L      M   N",
      "__      1    2      3    4")
    val sources = marbles.zipWithIndex.map { case (m, v) =>
      EventStream(Sources.marble(spark, m), keys = Nil)
        .delay(s"$v SECONDS")
    }
    val got = EventStream.switch(sources, "src", "o")
      .df.orderBy("o").select("value").collect().map(_.getString(0)).toSeq
    assert(got == Seq("A", "B", "1", "2", "K", "L", "M", "N"))
  }

  test("generic emap accepts a custom joiner (Emap(constr, joiner), transform.py:291-318)") {
    // A user-defined JoinOp: reverse-chain — drain the LAST child first.
    // Not one of the four canonical joiners, so it exercises the open
    // strategy surface.
    val reverseChain = new EventStream.Joiner {
      def apply(p: EventStream, children: org.apache.spark.sql.Column) =
        (p.df.withColumn("__child", explode(children)),
          Seq(col(p.seqCol).desc, col("__child.j")))
    }
    val marbles = Seq("A B", "_1 2")
    val got = outValues(parentWithChildren(marbles).emap(col("children"), reverseChain))
    assert(got == Seq("1", "2", "A", "B"))
    // and the canonical variants still route through the same surface
    val viaGeneric = outValues(parentWithChildren(marbles)
      .emap(col("children"), EventStream.Joiners.Merge("cts")))
    val viaNamed = outValues(parentWithChildren(marbles).emapMerge(col("children"), "cts"))
    assert(viaGeneric == viaNamed)
  }
}
