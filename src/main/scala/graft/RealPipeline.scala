package graft

import graft.engine.{RepoConfig, TableRepo}
import graft.meta.RealMeta
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end EXECUTION of a real schema.yaml standard-table DAG — the
  * Scala twin of the reference's golden example test
  * (tests/test_package/package/test_by_examples.py:7-69), which runs the
  * whole stack over real survey data. Raw survey data is not in this
  * sandbox, so the achievable form is: synthetic raw tables shaped by the
  * REAL tables.yaml column specs (era-correct raw column names per year),
  * pushed through the REAL metadata —
  *
  *   raw → CleanOps(tables.yaml) → per-table schema.yaml instructions
  *       → Original_Expenditures → Expenditures → Total_Expenditure
  *
  * across two coding eras at once: year 1382 (COL-named raw files, the
  * 9-table 1363 table_list, schema.yaml:594-603) and year 1400
  * (DYCOL-named raw files, the 13-table 1383 list, schema.yaml:605-618).
  * RealMetadataSpec proves every instruction COMPILES; this gate proves
  * the composed DAG EXECUTES and matches a DuckDB oracle whose pipeline
  * math (clean column mapping, null-as-zero derivations, annualization,
  * household roll-up) is hand-written from the YAML text
  * (schema.yaml:621-714, tables.yaml:1299-1548) — only the synthetic
  * input mapping is shared by construction.
  *
  * Numeric design: every Expenditure/Secondhand_Sale value is an exact
  * multiple of 720, so `x / 30 * 360` and `x / 360 * 360`
  * (schema.yaml:663-671) are exact integer-valued doubles and the
  * household sums are order-independent (all < 2^53).
  */
object RealPipeline {

  private def cents(c: Column): Column = round(c * 100, 0).cast(LongType)

  /** Original_Expenditures dependency lists, per coding era
    * (schema.yaml:591-618). Index order matters only to the synthetic
    * slice assignment; `durable` is last in both eras.
    */
  private val tables1383 = Vector("food", "tobacco", "cloth", "home", "furniture",
    "medical", "transportation", "communication", "entertainment", "education",
    "hotel", "miscellaneous", "durable")
  private val tables1363 = Vector("food", "cloth", "home", "furniture", "medical",
    "transportation", "entertainment", "miscellaneous", "durable")

  /** Deterministic per-lineitem-row survey attributes, reproduced
    * verbatim in the oracle's `base` CTE: household address, year slice
    * (even/odd order key), per-era table slice, commodity code, and the
    * two money columns (exact multiples of 720, with planted NULLs to
    * exercise the reference's fillna(0) create_column semantics).
    */
  private def base(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/lineitem.parquet").select(
      (lit(1L) + col("l_orderkey") % 400L).as("address"),
      (col("l_orderkey") % 2L).as("ypar"),
      (col("l_partkey") % 13L).as("t13"),
      (col("l_partkey") % 9L).as("t9"),
      (lit(11111L) + col("l_partkey") % 8000L).as("code"),
      when(col("l_suppkey") % 11L === 0L, lit(null).cast(DoubleType))
        .otherwise((lit(720L) * (lit(1L) + cents(col("l_extendedprice")) % 997L))
          .cast(DoubleType)).as("exp"),
      when(col("l_linenumber") % 3 === 0, lit(null).cast(DoubleType))
        .otherwise((lit(720L) * (cents(col("l_discount")) % 7L))
          .cast(DoubleType)).as("shs"),
      (lit(1L) + col("l_linenumber") % 3).as("pm"))

  /** Synthetic raw file for one (table, year): the era-correct raw
    * column names from tables.yaml —
    *   1400: DYCOL-era specs (food tables.yaml:1381-1386, tobacco
    *         :1400-1405, home-1384 :1424-1428, durable-1388 :1535-1548,
    *         common-structure-1374 :1312-1319,1337)
    *   1382: COL-era specs (food-1374 :1346-1379, durable-1374
    *         :1524-1526, common-structure-1374 :1312-1319)
    * Auxiliary columns (grams/kilos/price/security-deposit/insurance/
    * lender) carry deterministic filler: they flow through the clean and
    * pipeline stages but are projected away before Total_Expenditure.
    * `DYCOL07`/tobacco-`DYCOL03` are emitted to exercise the explicit
    * `drop` spec (tables.yaml:1386,1401) against the default
    * `missings: error` policy.
    */
  def raw(s: SparkSession, dir: String, name: String, year: Int): Option[DataFrame] = {
    val b = base(s, dir)
    def fill(mod: Long): Column = (col("code") % mod).cast(DoubleType)
    if (year == 1400) {
      val i = tables1383.indexOf(name)
      if (i < 0) None else {
        val sl = b.where(col("t13") === i.toLong && col("ypar") === 0L)
        Some(name match {
          case "food" => sl.select(
            col("address").as("ADDRESS"), col("code").as("DYCOL01"),
            col("pm").as("DYCOL02"), fill(500L).as("DYCOL03"),
            fill(20L).as("DYCOL04"), fill(9000L).as("DYCOL05"),
            col("exp").as("DYCOL06"), lit("x").as("DYCOL07"))
          case "tobacco" => sl.select(
            col("address").as("ADDRESS"), col("code").as("DYCOL01"),
            col("pm").as("DYCOL02"), lit("x").as("DYCOL03"),
            fill(20L).as("DYCOL04"), fill(9000L).as("DYCOL05"),
            col("exp").as("DYCOL06"), lit("x").as("DYCOL07"))
          case "home" => sl.select(
            col("address").as("ADDRESS"), col("code").as("DYCOL01"),
            fill(50L).as("DYCOL02"), col("pm").as("DYCOL03"),
            col("exp").as("DYCOL04"))
          case "durable" => sl.select(
            col("address").as("ADDRESS"), col("code").as("DYCOL01"),
            fill(70L).as("DYCOL02"),
            concat(lit("L"), col("pm").cast(StringType)).as("DYCOL03"),
            col("pm").as("DYCOL04"), col("exp").as("DYCOL05"),
            col("shs").as("DYCOL06"))
          case _ => sl.select(
            col("address").as("ADDRESS"), col("code").as("DYCOL01"),
            col("pm").as("DYCOL02"), col("exp").as("DYCOL03"))
        })
      }
    } else if (year == 1382) {
      val i = tables1363.indexOf(name)
      if (i < 0) None else {
        val sl = b.where(col("t9") === i.toLong && col("ypar") === 1L)
        Some(name match {
          case "food" => sl.select(
            col("address").as("ADDRESS"), col("code").as("COL1"),
            col("pm").as("COL3"), fill(20L).as("COL4_5"),
            fill(9000L).as("COL6"), col("exp").as("COL7"))
          case "durable" => sl.select(
            col("address").as("ADDRESS"), col("code").as("COL1"),
            col("pm").as("COL3"), col("exp").as("COL4"),
            col("shs").as("COL5"))
          case _ => sl.select(
            col("address").as("ADDRESS"), col("code").as("COL1"),
            col("pm").as("COL3"), col("exp").as("COL4"))
        })
      }
    } else None
  }

  /** The gate: run the real DAG for both eras through [[TableRepo]] over
    * the real metadata corpus. One Catalyst plan per year — 13 (resp. 9)
    * leaf scans, one union, pure projections, one hash aggregate; no
    * shuffle before the (Year, ID) aggregation, which at survey scale is
    * bounded by the household count, not the line-item count.
    */
  def realTotalExpenditure(s: SparkSession, dir: String): DataFrame = {
    require(RealMeta.available, "reference metadata corpus not found")
    val repo = new TableRepo(s, RealMeta.tables, RealMeta.schema,
      rawReader = (name, year) => raw(s, dir, name, year),
      config = RepoConfig(availability = RealMeta.tableAvailability))
    repo.table("Total_Expenditure", Seq(1382, 1400)).orderBy("Year", "ID")
  }

  /** Hand-written oracle. The `base` CTE mirrors the synthetic input
    * mapping; everything after it re-derives the REAL pipeline from the
    * YAML text, independently of the Scala metadata interpreter:
    *   - which raw column is Expenditure/Secondhand_Sale per (table, era)
    *     collapses to "durable is the only Secondhand_Sale carrier"
    *     (tables.yaml:1505-1548) — every other synthetic table feeds
    *     `exp` into its era's Expenditure column;
    *   - Duration = 360 for durable, 30 otherwise (schema.yaml:458-461
    *     vs the per-table `expression: 30` blocks);
    *   - Gross = fillna0(Expenditure), Net = fillna0(Expenditure) -
    *     fillna0(Secondhand_Sale) (schema.yaml:663-671 via the
    *     reference's fillna(0) create_column, data_engine.py:347-368);
    *   - annualize x/Duration*360 (schema.yaml:704-712 Expenditures);
    *   - sum per (Year, ID) (schema.yaml:697-714 Total_Expenditure).
    */
  val realTotalExpenditureSql: String = """
    WITH base AS (
      SELECT 1 + l_orderkey % 400 AS address,
             l_orderkey % 2 AS ypar,
             l_partkey % 13 AS t13,
             l_partkey % 9 AS t9,
             CASE WHEN l_suppkey % 11 = 0 THEN NULL
                  ELSE CAST(720 * (1 + CAST(round(l_extendedprice*100,0) AS BIGINT) % 997) AS DOUBLE) END AS exp,
             CASE WHEN l_linenumber % 3 = 0 THEN NULL
                  ELSE CAST(720 * (CAST(round(l_discount*100,0) AS BIGINT) % 7) AS DOUBLE) END AS shs
      FROM lineitem),
    items AS (
      SELECT 1400 AS Year, CAST(address AS BIGINT) AS ID,
             CASE WHEN t13 = 12 THEN 360 ELSE 30 END AS dur,
             coalesce(exp, 0) AS g,
             coalesce(exp, 0) - (CASE WHEN t13 = 12 THEN coalesce(shs, 0) ELSE 0 END) AS n
      FROM base WHERE ypar = 0
      UNION ALL
      SELECT 1382, CAST(address AS BIGINT),
             CASE WHEN t9 = 8 THEN 360 ELSE 30 END,
             coalesce(exp, 0),
             coalesce(exp, 0) - (CASE WHEN t9 = 8 THEN coalesce(shs, 0) ELSE 0 END)
      FROM base WHERE ypar = 1)
    SELECT CAST(Year AS INTEGER) AS Year, ID,
           sum(g / dur * 360) AS Gross_Expenditure,
           sum(n / dur * 360) AS Net_Expenditure
    FROM items GROUP BY 1, 2"""
}
