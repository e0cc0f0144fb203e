package graft.ops

import graft.SparkSpec

/** [[TextOps.lmScore]] — CCNet-style bigram LM scoring with add-1
  * smoothing on the half-up 1e-6 integer grid.
  */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force reference of the exact same formula. */
  private def reference(model: Seq[String], docs: Seq[String]): Seq[(Long, Long, Option[Double])] = {
    def toks(t: String): Seq[String] =
      t.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
        .split("\\s+").toSeq.filter(_.nonEmpty)
    def bigrams(ts: Seq[String]): Seq[String] = ts.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
    val uni = model.flatMap(toks).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val bi = model.flatMap(t => bigrams(toks(t))).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val v = uni.size.toLong
    docs.map { t =>
      val micros = bigrams(toks(t)).map { bg =>
        val prev = bg.split(" ").head
        val p = (bi.getOrElse(bg, 0L) + 1).toDouble / (uni.getOrElse(prev, 0L) + v).toDouble
        math.floor(math.log(p) * 1e6 + 0.5).toLong
      }
      val n = micros.size.toLong
      (n, micros.sum, if (n == 0) None else Some(micros.sum.toDouble / 1e6 / n))
    }
  }

  private def run(model: Seq[(Long, String)], docs: Seq[(Long, String)]) =
    TextOps.lmScore(docs.toDF("doc_id", "text"), model.toDF("doc_id", "text"))
      .orderBy("doc_id").collect()

  test("self-scored corpus matches a brute-force replay of the formula") {
    val corpus = Seq(
      1L -> "the cat sat on the mat",
      2L -> "the cat ate the fish",
      3L -> "dogs chase the cat daily",
    )
    val got = run(corpus, corpus)
    val exp = reference(corpus.map(_._2), corpus.map(_._2))
    got.zip(exp).foreach { case (r, (n, micro, score)) =>
      assert(r.getAs[Long]("n_bigrams") == n)
      assert(r.getAs[Long]("lm_micro") == micro)
      assert(math.abs(r.getAs[Double]("lm_logprob") - score.get) < 1e-12)
    }
  }

  test("common phrasing scores higher than junk under the same model") {
    val corpus = (1L to 20L).map(i => i -> "the quick brown fox jumps over the lazy dog")
    val scored = run(corpus, Seq(100L -> "the quick brown fox", 101L -> "zq xv qqq www"))
    val byId = scored.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("lm_logprob")).toMap
    assert(byId(100L) > byId(101L))
  }

  test("documents under two tokens get n_bigrams 0 and null scores; rows survive") {
    val model = Seq(1L -> "a b c d")
    val got = run(model, Seq(10L -> "solo", 11L -> "", 12L -> "a b"))
    val rows = got.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_bigrams"), r.isNullAt(r.fieldIndex("lm_micro")))).toMap
    assert(rows(10L) == (0L, true) && rows(11L) == (0L, true))
    assert(rows(12L)._1 == 1L && !rows(12L)._2)
  }

  test("out-of-vocabulary bigrams score the smoothed floor against a separate model") {
    val model = Seq(1L -> "alpha beta gamma") // V = 3, all unigram counts 1
    val got = run(model, Seq(10L -> "delta epsilon"))
    // unseen prev: ln((0+1)/(0+3)) on the 1e-6 half-up grid
    val expected = math.floor(math.log(1.0 / 3.0) * 1e6 + 0.5).toLong
    assert(got.head.getAs[Long]("lm_micro") == expected)
    // seen prev, unseen bigram: ln(1/(c1+V)) = ln(1/4)
    val got2 = run(model, Seq(10L -> "alpha delta"))
    val expected2 = math.floor(math.log(1.0 / 4.0) * 1e6 + 0.5).toLong
    assert(got2.head.getAs[Long]("lm_micro") == expected2)
  }
}
