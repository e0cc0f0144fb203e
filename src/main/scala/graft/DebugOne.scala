package graft
import org.apache.spark.sql.SparkSession

/** Dev helper: run a single catalog query by name against a sf dir,
  * print rows + the formatted plan. Usage:
  *   runMain graft.DebugOne <name> [sfDir] [explain]
  */
object DebugOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // match the Verify/Bench sessions (see Verify.scala)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = Queries.catalog.collectFirst { case (`name`, f, _) => f }
      .getOrElse(sys.error(s"unknown query $name"))
    val df = fn(spark, sfDir)
    if (args.contains("explain")) df.explain("formatted")
    df.show(20, truncate = false)
    println(s"rows=${df.count()}")
    spark.stop()
  }
}
