package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The actual query catalog lives in [[Queries]].
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q1Agg(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.catalog.map { case (name, fn, _) => name -> fn }.toMap
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Every catalog row carries one:
    * hash-function-specific ops (MinHash/SimHash/LSH) are gated through
    * verifiable invariants — planted-copy equalities, recall audits
    * against the exactly-oracled brute-force path — rather than raw
    * hash values (see the per-query scaladocs in [[Queries]]).
    */
  def oracleSql: Map[String, String] =
    Queries.catalog.collect { case (name, _, Some(sql)) => name -> sql }.toMap
}
