package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling main for the 39-year real-archive DAG: times the plan
  * BUILD (driver-side metadata compile + analysis) per year and for the
  * one-call 39-year composition, so plan-build regressions are
  * attributable to a year/era rather than a lump sum. No data is
  * executed unless `exec` is passed.
  */
object ProfileMultiYear {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.engine.{RepoConfig, TableRepo}
    import graft.meta.RealMeta
    val repo = new TableRepo(spark, RealMeta.tables, RealMeta.schema,
      rawReader = (name, year) => RealPipeline.rawMultiYear(spark, sfDir, name, year),
      classifications = Map("Duration" -> RealMeta.commodities("Duration")),
      config = RepoConfig(availability = RealMeta.tableAvailability))
    for (y <- 1363 to 1401) {
      val t0 = System.nanoTime()
      repo.table("Total_Expenditure", Seq(y))
      println(f"[profile] year $y build ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val t0 = System.nanoTime()
    val df = RealPipeline.realTotalExpenditureMultiYear(spark, sfDir)
    println(f"[profile] 39-year one-call build ${(System.nanoTime() - t0) / 1e9}%.2fs")
    if (args.contains("exec")) {
      val t1 = System.nanoTime()
      val n = df.count()
      println(f"[profile] execute ${(System.nanoTime() - t1) / 1e9}%.2fs, $n households")
    }
    spark.stop()
  }
}
