package graft

import graft.api.Api
import graft.engine.{RepoConfig, TableRepo}
import graft.meta._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gate queries that drive the ENGINE itself — metadata document ->
  * schema DAG -> clean -> pipeline -> (cache) — over the driver's
  * testdata parquet, so the whole load_table path (the reference's most
  * used entry point, hbsir/api.py:94-191 over core/data_engine.py:462-679)
  * earns a DuckDB-oracle correctness row, not just unit coverage.
  *
  * The fixture treats `orders.parquet` as a year-partitioned raw source
  * (rawReader filters by year(o_orderdate), mirroring per-year survey
  * files), with a tables.yaml-shaped clean spec and a schema DAG:
  *
  *   ord (original: clean + add_year)
  *    └─ OrdStd   (standard: apply_order)
  *        └─ OrdTotals (standard: groupby-sum)
  *   OrdCached (standard over ord, cache_result: true)
  */
object EngineQueries {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** tables.yaml fixture: clean spec for the `ord` original table.
    * Numeric-only columns (string scrub is gated by b1_clean); unlisted
    * raw columns are dropped per the explicit missings policy.
    */
  private val tablesYaml = """
ord:
  settings: {missings: drop}
  columns:
    O_ORDERKEY: {new_name: OrderKey, type: unsigned}
    O_CUSTKEY: {new_name: CustKey, type: unsigned}
    O_TOTALPRICE: {new_name: Total, type: float}
"""

  /** schema.yaml fixture: the standard-table DAG (E2/C16/C17 shapes). */
  private val schemaYaml = """
ord:
  instructions:
    - add_year
OrdStd:
  table_list: ord
  instructions:
    - apply_order:
        - Year
        - OrderKey
        - CustKey
        - Total
OrdCached:
  table_list: ord
  cache_result: true
"""

  private def repo(
      s: SparkSession, dir: String, cacheDir: Option[String] = None,
      availability: Map[String, Argham] = Map.empty,
      cacheBucketKeys: Seq[String] = Seq.empty): TableRepo =
    new TableRepo(
      s,
      tablesMeta = Meta.fromYaml(tablesYaml),
      schemaMeta = Meta.fromYaml(schemaYaml),
      rawReader = (name, yr) =>
        if (name == "ord")
          Some(T(s, dir, "orders").where(year(col("o_orderdate")) === yr))
        else None,
      depSize = (name, _) =>
        if (name == "ord") Some(new java.io.File(s"$dir/orders.parquet").length) else None,
      config = RepoConfig(
        resolver = ResolverSettings(yearRange = (1350, 2100)),
        cacheDir = cacheDir,
        availability = availability,
        cacheBucketKeys = cacheBucketKeys,
        cacheBucketCount = 8),
    )

  // ------------------------------------------------------------------ E1

  /** E1 load_table("processed"): raw -> clean -> instructions for one
    * original table and year (api.py:94-191).
    */
  def e1LoadTable(s: SparkSession, dir: String): DataFrame =
    new Api(s, repo(s, dir)).loadTable("ord", Seq(1996))

  private[graft] val e1Sql = """
    SELECT o_orderkey AS OrderKey, o_custkey AS CustKey,
           o_totalprice AS Total, 1996 AS Year
    FROM orders WHERE year(o_orderdate) = 1996"""

  // ------------------------------------------------------------- C17/E17

  /** C17 multi-year concat through the schema DAG (standard table over
    * the original, data_engine.py:648-679), with the year list given in
    * the reference's year-string syntax (E17: "1995-1997").
    */
  def c17MultiYear(s: SparkSession, dir: String): DataFrame =
    new Api(s, repo(s, dir)).loadTable(
      "OrdStd", "1995-1997", "processed", YearParser.YearBounds(1995, 2001))

  private[graft] val c17Sql = """
    SELECT 1995 AS Year, o_orderkey AS OrderKey, o_custkey AS CustKey, o_totalprice AS Total
    FROM orders WHERE year(o_orderdate) = 1995
    UNION ALL
    SELECT 1996, o_orderkey, o_custkey, o_totalprice FROM orders WHERE year(o_orderdate) = 1996
    UNION ALL
    SELECT 1997, o_orderkey, o_custkey, o_totalprice FROM orders WHERE year(o_orderdate) = 1997"""

  // ----------------------------------------------------------------- E18

  /** E18 table-year availability: the fixture declares `ord` available
    * only for [1995, 1997) (an Argham half-open range, the reference's
    * `{start, end}` year-spec notation); a 1995-1998 load then silently
    * skips 1997 and 1998 — `create_table_year_pairs` drops unavailable
    * (table, year) pairs instead of erroring (parsing_utils.py:104-143).
    * The oracle is the two surviving years only.
    */
  def e18Availability(s: SparkSession, dir: String): DataFrame =
    new Api(s, repo(s, dir, availability =
      Map("ord" -> Argham(Meta.fromYaml("{start: 1995, end: 1997}")))))
      .loadTable("ord", "1995-1998", "processed", YearParser.YearBounds(1995, 2001))

  private[graft] val e18Sql = """
    SELECT o_orderkey AS OrderKey, o_custkey AS CustKey,
           o_totalprice AS Total, 1995 AS Year
    FROM orders WHERE year(o_orderdate) = 1995
    UNION ALL
    SELECT o_orderkey, o_custkey, o_totalprice, 1996
    FROM orders WHERE year(o_orderdate) = 1996"""

  // ------------------------------------------------------------------ E2

  /** E2 create_table_with_schema: an ad-hoc schema doc (table_list +
    * instructions) registered over the packaged metadata and built
    * through the same DAG (api.py:194-257). The aggregation sums an
    * exact integer column so the oracle hash is order-independent.
    */
  def e2SchemaTable(s: SparkSession, dir: String): DataFrame = {
    val schema = Meta.fromYaml("""
table_list: OrdStd
instructions:
  - apply_pandas_function: 'table.groupby(["Year", "CustKey"])[["OrderKey"]].sum().reset_index()'
""")
    new Api(s, repo(s, dir)).createTableWithSchema("OrdKeySums", schema, Seq(1995, 1996))
  }

  private[graft] val e2Sql = """
    SELECT CAST(year(o_orderdate) AS INTEGER) AS Year, o_custkey AS CustKey,
           CAST(sum(o_orderkey) AS BIGINT) AS OrderKey
    FROM orders WHERE year(o_orderdate) IN (1995, 1996)
    GROUP BY 1, 2"""

  // ------------------------------------------------------------------ A9

  /** A9 dependency-fingerprint cache: the first build writes the
    * cache_result table as parquet keyed by (metadata subtree + dep
    * sizes); the second build — a fresh repo, same fingerprint — must
    * serve from the cache (data_engine.py:515-610). The returned frame
    * IS the cache read, so the gate checks the round-trip.
    */
  /** One cache dir per (JVM × fixture dir × flavor) — repeated gate/
    * bench invocations reuse it instead of leaking a full materialized
    * cache copy into the system temp dir per run; Scratch deletes it at
    * process exit.
    */
  private def a9Dir(dir: String, flavor: String): String =
    graft.engine.Scratch.dir(s"graft_${flavor}_gate:$dir")

  def a9Cache(s: SparkSession, dir: String): DataFrame = {
    val cacheDir = a9Dir(dir, "a9")
    // building the table materializes the cache parquet (eager write;
    // a repeat invocation serves straight from the existing entry)
    repo(s, dir, Some(cacheDir)).table("OrdCached", Seq(1996))
    val files = new java.io.File(cacheDir).listFiles()
    require(files != null && files.exists(_.getName.startsWith("OrdCached_1996_")),
      s"A9 cache file not written under $cacheDir")
    // fresh repo instance: only the fingerprint can find the cache entry
    repo(s, dir, Some(cacheDir)).table("OrdCached", Seq(1996))
  }

  // same logical result as e1 (cache must be transparent)
  private[graft] val a9Sql = e1Sql

  /** A9 cache in the BUCKETED at-rest configuration, full lifecycle
    * under hash verification: build writes the cache bucketed+sorted by
    * OrderKey and registers it in the catalog; the catalog entry is
    * then dropped (files survive — simulating a NEW session finding the
    * files without metadata) and a fresh repo re-attaches the bucket
    * metadata through readCache's DDL re-registration path
    * ([[graft.sources.RawSources.registerBucketed]]). The returned
    * frame is the re-registered bucketed read — layout must be
    * transparent to values (same oracle as the plain cache row), while
    * TableRepoSpec separately asserts the zero-shuffle property.
    */
  def a9CacheBucketed(s: SparkSession, dir: String): DataFrame = {
    val cacheDir = a9Dir(dir, "a9b")
    repo(s, dir, Some(cacheDir), cacheBucketKeys = Seq("OrderKey"))
      .table("OrdCached", Seq(1996))
    val t = s.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith("graft_cache_ordcached_1996_"))
    require(t.length == 1, s"expected one registered bucketed cache table, got ${t.toSeq}")
    s.sql(s"DROP TABLE ${t.head}")
    repo(s, dir, Some(cacheDir), cacheBucketKeys = Seq("OrderKey"))
      .table("OrdCached", Seq(1996))
  }

  // ------------------------------------------------------------------ E14

  /** E14 external_data registry: alias -> goto -> from(union of
    * materialized store entries) resolution
    * (hbsir/external_data/__init__.py:23-45, external_data_cleaner.py).
    */
  def e14External(s: SparkSession, dir: String): DataFrame = {
    val registry = Meta.fromYaml("""
cpi:
  alias: annual
  annual:
    goto: reg.both
reg:
  both:
    from: [reg.r1, reg.r2]
  r1: manual
  r2: manual
""")
    val store: String => Option[String] = {
      case "reg.r1" | "reg.r2" => Some(s"$dir/region.parquet")
      case _                   => None
    }
    val ext = new graft.external.ExternalData(s, registry, store)
    new Api(s, repo(s, dir), external = Some(ext)).externalTable("cpi")
  }

  private[graft] val e14Sql = """
    SELECT * FROM region UNION ALL SELECT * FROM region"""

  /** E14 with a NON-TRIVIAL cleaning function: a raw workbook-shaped
    * grid dump (title/blank/footer junk rows around one data row, all
    * cells strings, `_row` ordinals — the shape the reference's
    * cleaning scripts receive from read_excel) goes through the
    * registered cleaner, which slices the value row, transposes it to
    * an annual series, generates the Year index, and nulls the
    * dash/blank missing markers — the sci_gini_annual shape
    * (cleaning_scripts.py:113-116). The grid is derived from
    * region.parquet so DuckDB can recompute the expectation directly.
    */
  def e14Cleaned(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.StringType
    val region = T(s, dir, "region")
    // one wide row of values: v<k> = length(r_name) of region k
    val vCols = (0 to 4).map(k => max(when(col("r_regionkey") === k,
      length(col("r_name")))).cast(StringType).as(s"v$k"))
    val wide = region.agg(vCols.head, vCols.tail: _*)
    def junkRow(r: Long, cells: Seq[String]) = wide.select(
      lit(r).as("_row") +: cells.zipWithIndex.map { case (v, i) =>
        (if (v == null) lit(null).cast(StringType) else lit(v)).as(s"c$i")
      }: _*)
    val dataRow = wide.select(lit(2L).as("_row"), lit("Gini").as("c0"),
      col("v0").as("c1"), col("v1").as("c2"), col("v2").as("c3"),
      col("v3").as("c4"), col("v4").as("c5"), lit(" - ").as("c6"))
    val grid = junkRow(0L, Seq("Gini coefficient workbook", " ", "-", "", null, " - ", ""))
      .unionByName(junkRow(1L, Seq(null, null, null, null, null, null, null)))
      .unionByName(dataRow)
      .unionByName(junkRow(3L, Seq("source: household survey", "", "", "", "", "", "")))
    // process-unique scratch (a fixed shared path would let two
    // concurrent sessions overwrite each other's grid mid-read)
    val gridPath = graft.engine.Scratch.dir(s"graft_e14_grid:$dir")
    grid.write.mode("overwrite").parquet(gridPath)
    val ext = new graft.external.ExternalData(
      s,
      Meta.fromYaml("gini: manual"),
      store = { case "gini" => Some(gridPath); case _ => None },
      cleaners = graft.external.ExternalData.defaultCleaners +
        ("gini" -> graft.external.ExternalData.gridSeries(2L, 1, "Gini", 1390)),
    )
    ext.loadTable("gini").orderBy("Year")
  }

  // the trailing " - " cell is the workbooks' missing marker -> null
  private[graft] val e14CleanedSql = """
    SELECT CAST(1390 + r_regionkey AS INTEGER) AS Year,
           CAST(length(r_name) AS DOUBLE) AS Gini
    FROM region
    UNION ALL SELECT 1395, NULL
    ORDER BY Year"""

  // ------------------------------------------------------------------ E15

  /** E15 `view` accessor sugar (hbsir/hbsframe.py:9-34): identical
    * output to d1_classification, driven through the Api + implicit.
    */
  def e15View(s: SparkSession, dir: String): DataFrame = {
    val classRepo = new TableRepo(
      s,
      tablesMeta = MNull,
      schemaMeta = MNull,
      rawReader = (_, _) => None,
      classifications = Map("part_class" -> Meta.fromYaml(Queries.partClassYaml)),
      config = RepoConfig(resolver = ResolverSettings(yearRange = (1350, 2100))),
    )
    implicit val api: Api = new Api(s, classRepo)
    import Api.RichDF
    val df = T(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      year(col("l_shipdate")).as("Year"), col("l_partkey").as("Code"))
    df.view("part_class")
  }
}
