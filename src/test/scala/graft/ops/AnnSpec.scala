package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnnSpec extends SparkSpec {

  private val dim = 16
  private def vecs(n: Int) = {
    import spark.implicits._
    // deterministic pseudo-random vectors
    (0 until n).map { i =>
      val v = Array.tabulate(dim) { d =>
        var x = 77L + i * 131L + d * 31L
        x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
        ((x * 0x2545F4914F6CDD1DL >>> 11).toFloat / (1L << 53).toFloat) * 2f - 1f
      }
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("brute-force top-k: self excluded, ranks dense, cosine descending") {
    val df = vecs(50)
    val out = Ann.bruteForceTopK(df, df.where(col("vec_id") < 2), k = 5).collect()
    assert(out.length == 10)
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to 5))
      val cos = sorted.map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
      assert(!rows.exists(r => r.getAs[Long]("neighbor_id") == r.getAs[Long]("query_id")))
    }
  }

  test("LSH top-k achieves reasonable recall vs brute force") {
    val df = vecs(200)
    val q = df.where(col("vec_id") < 5)
    val exact = Ann.bruteForceTopK(df, q, k = 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = Ann.lshTopK(df, q, k = 10, dim = dim, numPlanes = 16, bands = 8).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall > 0.4, s"LSH recall too low: $recall")
  }

  test("cluster assignment is deterministic and in range") {
    val centroids = Ann.hyperplanes(4, dim, seed = 7)
    val df = vecs(30).withColumn("cluster", Ann.assignCluster(col("embedding"), centroids))
    val clusters = df.select("cluster").collect().map(_.getInt(0))
    assert(clusters.forall(c => c >= 0 && c < 4))
    val again = vecs(30).withColumn("cluster", Ann.assignCluster(col("embedding"), centroids))
      .select("cluster").collect().map(_.getInt(0))
    assert(clusters.toSeq == again.toSeq)
  }
}
