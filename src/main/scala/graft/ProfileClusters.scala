package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler: break dedup_clusters into stages and time each. */
object ProfileClusters {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    // warm
    spark.read.parquet(s"$sfDir/region.parquet").limit(1)
      .write.mode("overwrite").format("noop").save()

    (1 to 2).foreach { round =>
      println(s"--- iteration $round ---")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val pairs = time("minhash_near_dups")(
        { val p = Queries.minhashNearDups(spark, sfDir).select("id_a", "id_b"); p.count(); p })
      // pre-materialized pair list, so clusters timing excludes pair gen
      val cached = pairs.persist()
      time("pairs cache fill")(println("pairs=" + cached.count()))
      // hand-rolled replica of duplicateClusters' structure with stage timing
      import org.apache.spark.storage.StorageLevel
      def starForestViolations(df: org.apache.spark.sql.DataFrame): Long = {
        val sides = df.select(col("_eu").as("_n"), lit(1L).as("_leaf"), lit(0L).as("_ctr"))
          .union(df.select(col("_ev").as("_n"), lit(0L).as("_leaf"), lit(1L).as("_ctr")))
        sides.groupBy("_n")
          .agg(sum(col("_leaf")).as("_leaves"), sum(col("_ctr")).as("_ctrs"))
          .where(col("_leaves") > 1 || (col("_leaves") > 0 && col("_ctrs") > 0))
          .limit(1).count()
      }
      val edges = time("canon distinct persist")({
        val e = cached
          .select(greatest(col("id_a"), col("id_b")).as("_eu"),
            least(col("id_a"), col("id_b")).as("_ev"))
          .where(col("_eu") =!= col("_ev"))
          .distinct()
          .persist(StorageLevel.MEMORY_AND_DISK)
        e.count(); e
      })
      val v0 = time("round-0 probe")(starForestViolations(edges))
      println(s"round-0 violations=$v0")
      time("duplicateClusters")(
        graft.ops.Dedup.duplicateClusters(docs.select("doc_id"), cached)
          .write.mode("overwrite").format("noop").save())
      edges.unpersist()
      cached.unpersist()
      spark.catalog.clearCache()
      time("full gate query")(
        Queries.dedupClusters(spark, sfDir).write.mode("overwrite").format("noop").save())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
