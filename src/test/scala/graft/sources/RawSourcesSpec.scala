package graft.sources

import graft.SparkSpec
import graft.meta._
import org.apache.spark.sql.functions._
import java.nio.file.Files

class RawSourcesSpec extends SparkSpec {

  private val tableMeta = Meta.fromYaml("""
file_code:
  1380: "001"
  1390: "002"
urban:
  file_code: "U01"
  columns:
    ADDRESS: {new_name: ID, type: unsigned}
    VAL: {new_name: Value, type: float}
rural:
  file_code: "R01"
  columns:
    ADDRESS: {new_name: ID, type: unsigned}
""")

  test("csv path follows the reference naming convention") {
    val simple = Meta.fromYaml("""
file_code:
  1380: "001"
  1390: "002"
columns: {}
""")
    assert(RawSources.csvPath("/base", simple, "food", 1385, urban = true)
      == "/base/1385/U85001.csv")
    assert(RawSources.csvPath("/base", simple, "food", 1401, urban = false)
      == "/base/1401/R1401002.csv")
  }

  test("urban/rural csv clean-then-union end to end") {
    val dir = Files.createTempDirectory("graft_csv").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/1400"))
    Files.writeString(java.nio.file.Paths.get(s"$dir/1400/U1400U01.csv"),
      "ADDRESS,VAL\n10000001,1.5\n10000002,2.5\n")
    Files.writeString(java.nio.file.Paths.get(s"$dir/1400/R1400R01.csv"),
      "ADDRESS\n20000001\n")
    val out = RawSources.openAndCleanTable(spark, dir, tableMeta, "food", 1400)
    assert(out.columns.toSet == Set("ID", "Value"))
    assert(out.count() == 3)
    // rural side has no Value column -> null-filled
    assert(out.where(col("Value").isNull).count() == 1)
  }

  test("partitioned write + year-pruned read") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_part").toString + "/t"
    val df = Seq((1399, 1L), (1399, 2L), (1400, 3L)).toDF("Year", "ID")
    RawSources.writePartitioned(df, dir)
    val pruned = RawSources.readPartitioned(spark, dir, Seq(1400))
    assert(pruned.count() == 1)
    // the year filter must reach the scan as a partition filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("Year"))
  }

  test("csv sink round-trips") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_csvout").toString + "/out"
    RawSources.writeCsv(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() == 2)
  }
}
