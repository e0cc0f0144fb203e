package graft.ops

import graft.meta._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** E16 — geographic enrichment join (reference: hbsir/map_drawer.py:8-43,
  * metadata: hbsir/metadata/maps.yaml).
  *
  * The reference builds a per-area "geoseries" by joining a shapefile's
  * attribute table (`code_column`, geometry) to the survey-code → map-code
  * pairs in maps.yaml, renamed to household area names
  * (map_drawer.py:8-24), then left-joins any analysis table on its area
  * column (map_drawer.py:27-43).
  *
  * Spark-first re-expression: geometries are opaque values (WKT strings —
  * no geometry dependency; shapefile decode is the upstream
  * `gpd.read_file`, out of scope per SURVEY §2 A-row policy) and both the
  * code mapping and the geometry table are DIMENSION-sized (≤ a few
  * hundred national admin areas), so the whole enrichment is a broadcast
  * hash join against the fact table: the fact side never shuffles, which
  * is exactly the 100 TB shape — a map join of a ~31-row dim.
  */
object Geo {

  /** One area's map spec (maps.yaml `humandata.Province`-shaped block):
    * the shapefile attribute column holding the admin code, plus the
    * survey-code → map-code (PCODE) pairs. `code: null` (Country) means
    * no per-area codes — the whole map is one feature.
    */
  final case class AreaMap(codeColumn: String, codes: Map[Long, String])

  /** Parse one `maps.yaml` area block: `maps[mapName][area]`. */
  def areaMap(mapsMeta: Meta, mapName: String, area: String): AreaMap = {
    val block = mapsMeta(mapName)(area)
    val codes = block("code") match {
      case MNull => Map.empty[Long, String]
      case m =>
        m.asMap.map {
          case (IKey(k), v) => k -> v.asStr
          case (SKey(k), v) => k.trim.toLong -> v.asStr
        }.toMap
    }
    AreaMap(block("code_column").asStr, codes)
  }

  /** The geoseries of map_drawer.py:8-24: shapefile attributes
    * (`codeColumn`, `geometry`) joined to survey names. `geomDf` stands in
    * for `gpd.read_file(path)[[column_name, "geometry"]]`; `areaNames` is
    * `metadata.household[area]["name"]` (survey code → name). Mirrors the
    * pandas left-join semantics: shapefile features whose PCODE has no
    * survey code keep a NULL area name (they can never match a fact row,
    * so downstream results are identical to an inner join).
    *
    * Output: a dim-sized DataFrame (area, geometry).
    */
  def createGeoSeries(
      geomDf: DataFrame,
      am: AreaMap,
      areaNames: Map[Long, String],
      area: String): DataFrame = {
    val spark = geomDf.sparkSession
    import spark.implicits._
    // survey code -> pcode becomes pcode -> name, the join key for the
    // shapefile side (map_drawer.py:14: {value: area_names[key]})
    val nameByPcode: Seq[(String, String)] = am.codes.toSeq.collect {
      case (code, pcode) if areaNames.contains(code) => pcode -> areaNames(code)
    }
    require(nameByPcode.map(_._1).distinct.size == nameByPcode.size,
      s"duplicate map code in $area mapping — geoseries index would fan out")
    val mapping = nameByPcode.toDF("_pcode", area)
    geomDf
      .join(broadcast(mapping), geomDf(am.codeColumn) === mapping("_pcode"), "left")
      .select(col(area), col("geometry"))
  }

  /** map_drawer.py:27-43 `add_geometry`: left-join an analysis table to
    * the geoseries on its area column. Area auto-detection follows the
    * reference exactly: an explicit `area` must exist as a column;
    * otherwise Region is preferred over Province; neither present is an
    * error. The geoseries is dim-sized by construction → broadcast.
    */
  def addGeometry(
      table: DataFrame,
      geoseries: DataFrame,
      area: Option[String] = None): DataFrame = {
    val names = table.columns.toSet
    val detected = area match {
      case Some(a) =>
        require(names.contains(a), s"requested area column '$a' not in table")
        a
      case None if names.contains("Region")   => "Region"
      case None if names.contains("Province") => "Province"
      case None => throw new IllegalArgumentException(
        "no Region/Province column to join geometry on (map_drawer.py:39)")
    }
    require(geoseries.columns.contains(detected),
      s"geoseries was built for '${geoseries.columns.headOption.getOrElse("?")}', table has '$detected'")
    table.join(broadcast(geoseries), Seq(detected), "left")
  }
}
