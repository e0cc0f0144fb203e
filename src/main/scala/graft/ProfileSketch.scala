package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.WeightedQuantileSketch

/** Dev microbench: udaf vs native weighted-quantile sketch on the
  * hicard shape (one group per l_orderkey), alternated and repeated in
  * ONE warm JVM so JIT state is shared — the bench artifact's 3-query
  * cold sessions can't resolve sub-second deltas. Usage:
  *   runMain graft.ProfileSketch [sfDir] [reps]
  */
object ProfileSketch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("G"),
        col("l_quantity").cast("double").as("V"),
        (round(col("l_extendedprice") * 100, 0)).cast("double").as("W"))
      .cache()
    df.count()
    def time(tag: String)(mk: () => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-8s min ${ts.min}%.3fs  runs ${ts.map(t => f"$t%.3f").mkString(", ")}")
    }
    val udafAgg = WeightedQuantileSketch.weightedPercentileAgg(0.5)
    val natAgg = WeightedQuantileSketch.weightedPercentilesNativeAgg(Seq(0.5))
    for (_ <- 1 to 2) {
      time("udaf") { () =>
        df.groupBy("G").agg(udafAgg(col("V"), col("W")).as("m"))
      }
      time("native") { () =>
        df.groupBy("G").agg(element_at(natAgg(col("V"), col("W")), 1).as("m"))
      }
    }
    spark.stop()
  }
}
