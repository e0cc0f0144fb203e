package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Dev probe: characterize the pairs SimHash loses at the saturation
  * wall. Reads the exact truth dump (minhash_near_dups_sample) and the
  * SimhashSaturation window dump, takes the difference, and prints the
  * missed pairs' hamming-distance histogram plus how many sit INSIDE
  * the bands-1 pigeonhole envelope (hamming ≤ 7 at bands = 8) — i.e.
  * pairs the banding would guarantee in an uncapped run, sacrificed by
  * saturation, vs pairs outside any banding contract.
  *
  * Usage: runMain graft.MissedPairsProbe [sfDir] [truthDir] [simhashDir]
  */
object MissedPairsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("target/sf100")
    val truthDir = args.lift(1).getOrElse("/tmp/verify_sf100_r16/minhash_near_dups_sample")
    val shDir = args.lift(2).getOrElse("/tmp/simhash_saturation/simhash_window_pairs")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val truth = spark.read.parquet(truthDir).select("id_a", "id_b")
    val found = spark.read.parquet(shDir).select("id_a", "id_b")
    val missed = truth.except(found)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val hashes = Dedup.simHashes(docs) // (doc_id, _sh); id filter pushes via the joins below
    val withH = missed
      .join(hashes.select(col("doc_id").as("id_a"), col("_sh").as("_ha")), Seq("id_a"))
      .join(hashes.select(col("doc_id").as("id_b"), col("_sh").as("_hb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        Dedup.hammingDistance(col("_ha"), col("_hb")).as("hamming"))
      .cache()
    val hist = withH.groupBy("hamming").count().orderBy("hamming").collect()
    println("[probe] missed-pair hamming histogram:")
    hist.foreach(r => println(f"[probe]   hamming ${r.getInt(0)}%3d: ${r.getLong(1)}"))
    val inEnvelope = withH.where(col("hamming") <= 7).count()
    val total = withH.count()
    println(s"[probe] missed total $total; inside the bands-8 pigeonhole envelope " +
      s"(hamming <= 7, sacrificed by saturation): $inEnvelope; " +
      s"outside any banding contract: ${total - inEnvelope}")
    spark.stop()
  }
}
