package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Algebraic invariants of the corpus-assembly operators over
  * deterministic pseudo-random documents.
  */
class CurationPropSpec extends SparkSpec {

  private def randomDocs(seed: Int, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed * 104729)
    (0 until n).map { i =>
      val nTok = rnd.nextInt(40) // includes empty docs
      (i.toLong, List.fill(nTok)(s"w${rnd.nextInt(50)}").mkString(" "))
    }
  }

  test("chunkDocuments invariants: coverage, bounds, ordering, reconstruction") {
    import spark.implicits._
    for (seed <- 1 to 4) {
      val docs = randomDocs(seed, 30)
      val df = docs.toDF("doc_id", "text")
      val size = 2 + seed // vary window/stride per round
      val stride = 1 + seed
      val chunks = Curation.chunkDocuments(df, size, stride).collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getInt(2), r.getString(3))))
      val byDoc = chunks.groupBy(_._1._1)
      docs.foreach { case (id, text) =>
        val toks = text.split("\\s+").filter(_.nonEmpty)
        val got = byDoc.getOrElse(id, Array.empty).sortBy(_._1._2)
        if (toks.isEmpty) assert(got.isEmpty, s"doc $id: empty doc must yield no chunks")
        else {
          // chunk c must be exactly tokens [c*stride, c*stride+size)
          got.foreach { case ((_, c), (n, txt)) =>
            val expect = toks.slice(c * stride, c * stride + size)
            assert(txt == expect.mkString(" "), s"doc $id chunk $c: <$txt> != <${expect.mkString(" ")}>")
            assert(n == expect.length)
            assert(n > 0 && n <= size)
          }
          // chunk ids are the contiguous range covering every token
          val ids = got.map(_._1._2)
          val expectedChunks = 0 to ((toks.length - 1) / stride)
          assert(ids.toSeq == expectedChunks.toSeq,
            s"doc $id: chunk ids ${ids.toSeq} != ${expectedChunks.toSeq}")
          // disjoint config reconstructs the document exactly
        }
      }
      // stride == size: concatenating chunks in order reconstructs each doc
      val disjoint = Curation.chunkDocuments(df, size, size).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(3)))
        .groupBy(_._1)
      docs.foreach { case (id, text) =>
        val toks = text.split("\\s+").filter(_.nonEmpty)
        if (toks.nonEmpty) {
          val rebuilt = disjoint(id).sortBy(_._2).map(_._3).mkString(" ")
          assert(rebuilt == toks.mkString(" "), s"doc $id: disjoint chunks must reconstruct")
        }
      }
    }
  }

  test("assignSplit partitions: exhaustive, disjoint by construction, monotone nesting") {
    import spark.implicits._
    val df = (0L until 1000L).toDF("doc_id")
    // a row's split under (a, b, c) nests: growing the first fraction
    // only MOVES rows into it (hash thresholds are monotone)
    def trainSet(f: Double) =
      Curation.assignSplit(df, Seq("train" -> f, "rest" -> (1.0 - f)))
        .where(col("split") === "train").collect().map(_.getLong(0)).toSet
    val t50 = trainSet(0.5); val t70 = trainSet(0.7); val t90 = trainSet(0.9)
    assert(t50.subsetOf(t70) && t70.subsetOf(t90), "hash-threshold splits must nest")
  }
}
