package graft

import java.io.File

/** [[Queries.ccnetBuckets]] — CCNet head/middle/tail per-language
  * partitioning (Wenzek et al. 2020 §4.3). The DuckDB gate pins the
  * exact output; this spec pins the SEMANTIC invariants that make the
  * output the CCNet artifact rather than an arbitrary labeling:
  * buckets are per-language tertiles ordered by score (head is the
  * best-scoring third), sizes are balanced to within ntile's ±1, and
  * unscorable documents never receive a bucket.
  */
class CcnetBucketsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("per-language buckets are balanced score-ordered tertiles; unscorable docs excluded") {
    assume(new File(sfDir).exists(), s"$sfDir not present")
    val rows = Queries.ccnetBuckets(spark, sfDir).collect()

    val byLang = rows.groupBy(_.getAs[String]("lang"))
    assert(byLang.nonEmpty)
    byLang.foreach { case (lang, rs) =>
      val sizes = rs.groupBy(_.getAs[String]("bucket")).map { case (b, v) => b -> v.length }
      assert(sizes.keySet.subsetOf(Set("head", "middle", "tail")), s"$lang: ${sizes.keySet}")
      // ntile(3) balance: any two bucket sizes differ by at most 1
      if (sizes.size > 1)
        assert(sizes.values.max - sizes.values.min <= 1, s"$lang: $sizes")
      // score ordering: worst head >= best tail score-wise is too strong
      // under ties broken by doc_id, but bucket MEANS must be monotone
      // and every head score >= every tail score (head and tail never
      // share a tied boundary: middle sits between them)
      val sc = rs.groupBy(_.getAs[String]("bucket"))
        .map { case (b, v) => b -> v.map(_.getAs[Double]("lm_logprob")) }
      for (h <- sc.get("head"); t <- sc.get("tail"))
        assert(h.min >= t.max, s"$lang: head min ${h.min} < tail max ${t.max}")
      for (h <- sc.get("head"); m <- sc.get("middle"))
        assert(h.min >= m.min, s"$lang: head/middle order")
    }

    // exclusion: exactly the scorable (n_bigrams > 0) docs are bucketed
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val scorable = graft.ops.TextOps.lmScore(docs, docs)
      .where(org.apache.spark.sql.functions.col("n_bigrams") > 0).count()
    assert(rows.length.toLong == scorable)
  }
}
