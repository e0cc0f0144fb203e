package graft

import graft.ops.Ann
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev driver: the ANN recall surface — measured recall@k of each
  * approximate operating point against brute-force ground truth on the
  * driver's embeddings fixture, so operating-point choices at scale are
  * data-driven rather than asserted. The gate rows pin ONE operating
  * point each (`ann_lsh_topk`, `rp_topk`, `ann_pipeline`); this sweeps
  * the knobs:
  *
  *   - LSH: numPlanes × bands (more bands ⇒ shorter band keys ⇒ more
  *     candidate collisions ⇒ higher recall, higher cost);
  *   - Random projection: output dimension (JL distortion shrinks as
  *     outDim grows; cost is the projected brute-force scan);
  *   - IVF: nProbe over trained centroids (probes bound the partitions
  *     read; recall is the fraction of true neighbors living in them).
  *
  * Prints one markdown table (stdout) ready to paste into SCALE.md.
  * Usage: `sbt "runMain graft.RecallSurface [sfDir] [nQueries] [k]"`
  * Ground truth and per-point hits are collected to the driver — both
  * bounded by nQueries × k, a dev-scale table, not corpus-sized.
  */
object RecallSurface {

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val nQueries = args.lift(1).map(_.toInt).getOrElse(20)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ivfDir = java.nio.file.Files.createTempDirectory("graft_recall_ivf")
    try run(spark, sfDir, nQueries, k, ivfDir.toString)
    finally {
      deleteRecursively(ivfDir.toFile)
      spark.stop()
    }
  }

  private def run(spark: SparkSession, sfDir: String, nQueries: Int, k: Int,
      ivfDir: String): Unit = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.where(col("vec_id") < nQueries)
    val dim = 64

    // ground truth: exact cosine top-k per query
    val truth: Map[Long, Set[Long]] = pairs(Ann.bruteForceTopK(emb, queries, k))
    require(truth.nonEmpty,
      s"no ground-truth neighbors: fixture $sfDir has no vec_id < $nQueries " +
        "(every recall would print NaN instead of failing here)")

    def recallOf(approx: DataFrame): Double = {
      val got = pairs(approx)
      val per = truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }
      per.sum / per.size
    }

    val rows = scala.collection.mutable.ArrayBuffer[(String, String, Double)]()

    for (planes <- Seq(16, 32); bands <- Seq(2, 4, 8)) {
      val r = recallOf(Ann.lshTopK(emb, queries, k, dim,
        numPlanes = planes, bands = bands, seed = 7L))
      rows += (("LSH", s"numPlanes=$planes bands=$bands (bandBits=${planes / bands})", r))
    }

    for (outDim <- Seq(8, 16, 32)) {
      val proj = Ann.randomProject(col("embedding"), dim, outDim, seed = 7L)
      val corpusP = emb.select(col("vec_id"), proj.as("embedding"))
      val queriesP = queries.select(col("vec_id"), proj.as("embedding"))
      rows += (("RP", s"outDim=$outDim", recallOf(Ann.bruteForceTopK(corpusP, queriesP, k))))
    }

    rows += (("INT8", "symmetric per-vector max-abs",
      recallOf(Ann.int8TopK(emb, queries, k))))

    val init = Ann.hyperplanes(4, dim, seed = 7L)
    val trained = Ann.trainCentroids(emb, init, iterations = 1)
    Ann.ivfWrite(emb, ivfDir, trained)
    for (nProbe <- 1 to 4) {
      val r = recallOf(Ann.ivfTopK(ivfDir, queries, trained, k, nProbe = nProbe))
      rows += (("IVF", s"clusters=4 nProbe=$nProbe", r))
    }

    println(s"\n## ANN recall surface ($sfDir, nQueries=$nQueries, k=$k)\n")
    println("| family | operating point | recall@k |")
    println("|---|---|---|")
    rows.foreach { case (fam, point, r) => println(f"| $fam | $point | $r%.3f |") }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** (query_id -> neighbor ids) of an ANN result, collected (bounded by
    * nQueries × k rows).
    */
  private def pairs(df: DataFrame): Map[Long, Set[Long]] =
    df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
}
