package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Dev driver: turn the sub-band pass's documented SATURATION bound
  * ("the measured sf100 wall", Dedup.simHashCandidates pass-3 comment)
  * into a measured number. Runs the production simhash near-dup
  * operating point (maxDistance 16, bands 8, cap 1000) on the FULL
  * corpus of a fixture dir, restricts the verified (jaccard ≥ 0.6)
  * output to the 1-in-50 replica readout window (the
  * `minhash_near_dups_sample` discipline), and writes:
  *
  *   - `<out>/simhash_window_pairs` — the window-restricted pairs;
  *   - stdout: the (band,key) census by regime — cool / hot-adjacent
  *     (cap < n ≤ 8·cap, sub-band recovery applies) / saturated
  *     (n > 8·cap, star+sorted-neighbor only) — plus max bucket size
  *     and per-regime membership, i.e. exactly the quantities the
  *     saturation contract is written in.
  *
  * Recall against exact truth: compare the dump with the
  * `minhash_near_dups_sample` gate dump (hash-verified == the
  * prefix-filtered All-Pairs oracle on the same window) — done by the
  * caller in DuckDB; this main only produces the Spark side.
  *
  * Usage: runMain graft.SimhashSaturation [sfDir] [outDir]
  */
object SimhashSaturation {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("target/sf100")
    val outDir = args.lift(1).getOrElse("/tmp/simhash_saturation")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cap = 1000
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // census first: cheap (one aggregate), and it prints even if the
    // pair run is then killed for time
    val census = Dedup.simHashBucketCensus(docs, bands = 8)
      .agg(
        count(lit(1)).as("buckets"),
        max("_n").as("max_bucket"),
        sum(when(col("_n") > cap, 1L).otherwise(0L)).as("hot_buckets"),
        sum(when(col("_n") > 8L * cap, 1L).otherwise(0L)).as("saturated_buckets"),
        sum(when(col("_n") > cap && col("_n") <= 8L * cap, col("_n")).otherwise(0L)).as("adjacent_membership"),
        sum(when(col("_n") > 8L * cap, col("_n")).otherwise(0L)).as("saturated_membership"),
        sum(when(col("_n") <= cap, col("_n")).otherwise(0L)).as("cool_membership"))
      .collect()(0)
    println(s"[saturation] census: $census")

    val t0 = System.nanoTime()
    val cands = Dedup.simHashCandidates(docs, maxDistance = 16, bands = 8,
      maxBucketSize = cap).select("id_a", "id_b")
    val sh = docs.select(col("doc_id"), Dedup.shingleHashes(col("text")).as("_sh"))
    val a = sh.select(col("doc_id").as("id_a"), col("_sh").as("_sha"))
    val b = sh.select(col("doc_id").as("id_b"), col("_sh").as("_shb"))
    val pairs = cands.join(a, Seq("id_a")).join(b, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Dedup.jaccardHashes(col("_sha"), col("_shb")), 6).as("jaccard"))
      .where(col("jaccard") >= 0.6)
    // MATERIALIZE the full-corpus output BEFORE the window filter: the
    // whole point is measuring the operator at 5M-doc bucket density,
    // and Catalyst would otherwise push the id predicate through the
    // verify joins into the banding self-join's sides — turning this
    // into a 100k-doc run whose thinner sorted-neighbor windows
    // INFLATE recall. (The minhash gate tolerates that pushdown —
    // banding recall there is per-pair — but simhash's recovery passes
    // are bucket-population-dependent, which is the thing under test.)
    // normal write parallelism: a coalesce(1) here would collapse the
    // final post-shuffle stage (the exact-Jaccard verify join, the most
    // expensive part of the 5M-doc run) to a single task. The output is
    // a few thousand rows — many small files is the cheap side of that
    // trade; the window dump below is the one that gets a single file.
    pairs.write.mode("overwrite").parquet(s"$outDir/simhash_full_pairs")
    val full = spark.read.parquet(s"$outDir/simhash_full_pairs")
    val nFull = full.count()
    full.where(expr("(id_a div 100000000) % 50 = 0 AND (id_b div 100000000) % 50 = 0"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/simhash_window_pairs")
    val n = spark.read.parquet(s"$outDir/simhash_window_pairs").count()
    println(f"[saturation] full-corpus pairs: $nFull, window pairs: $n  (${(System.nanoTime() - t0) / 1e9}%.1f s end-to-end)")
    spark.stop()
  }
}
