package graft.ops

import graft.SparkSpec
import graft.meta._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** E16 geo join (map_drawer.py:8-43) — semantics on an inline fixture
  * plus the REAL maps.yaml metadata parsed through Meta.fromYaml.
  */
class GeoSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private val mapsYaml = """
testmap:
  Province:
    file_name: provinces.shp
    code_column: ADM1_PCODE
    code:
      0: 'IR019'
      1: 'IR007'
      23: 'IR028'
  Country:
    file_name: country.shp
    code_column: ADM0_PCODE
    code: null
"""

  private val names = Map(0L -> "Markazi", 1L -> "Gilan", 23L -> "Tehran")

  test("areaMap parses a maps.yaml block, including code: null") {
    val m = Meta.fromYaml(mapsYaml)
    val am = Geo.areaMap(m, "testmap", "Province")
    assert(am.codeColumn == "ADM1_PCODE")
    assert(am.codes == Map(0L -> "IR019", 1L -> "IR007", 23L -> "IR028"))
    assert(Geo.areaMap(m, "testmap", "Country").codes.isEmpty)
  }

  test("createGeoSeries mirrors the pandas left-join: unmapped shapefile rows keep null name") {
    val am = Geo.areaMap(Meta.fromYaml(mapsYaml), "testmap", "Province")
    val geom = Seq(
      ("IR019", "WKT_MARKAZI"), ("IR007", "WKT_GILAN"),
      ("IR028", "WKT_TEHRAN"), ("IR099", "WKT_ORPHAN"),
    ).toDF("ADM1_PCODE", "geometry")
    val gs = Geo.createGeoSeries(geom, am, names, "Province")
    val got = gs.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("Markazi", "WKT_MARKAZI"), ("Gilan", "WKT_GILAN"),
      ("Tehran", "WKT_TEHRAN"), (null, "WKT_ORPHAN")))
  }

  test("addGeometry left-joins on the area column; unmatched facts keep null geometry") {
    val am = Geo.areaMap(Meta.fromYaml(mapsYaml), "testmap", "Province")
    val geom = Seq(("IR019", "WKT_MARKAZI"), ("IR028", "WKT_TEHRAN"))
      .toDF("ADM1_PCODE", "geometry")
    val gs = Geo.createGeoSeries(geom, am, names, "Province")
    val fact = Seq((1L, "Tehran"), (2L, "Markazi"), (3L, "Gilan"), (4L, "Tehran"))
      .toDF("id", "Province")
    val out = Geo.addGeometry(fact, gs)
    assert(out.columns.toSeq == Seq("Province", "id", "geometry"))
    val byId = out.collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("geometry")).toMap
    assert(byId == Map(1L -> "WKT_TEHRAN", 2L -> "WKT_MARKAZI", 3L -> null, 4L -> "WKT_TEHRAN"))
  }

  test("area auto-detect prefers Region over Province; explicit wins; neither is an error") {
    val gsRegion = Seq(("R1", "WKT_R")).toDF("Region", "geometry")
    val gsProv = Seq(("Tehran", "WKT_T")).toDF("Province", "geometry")
    val both = Seq((1L, "R1", "Tehran")).toDF("id", "Region", "Province")
    assert(Geo.addGeometry(both, gsRegion).collect().head.getAs[String]("geometry") == "WKT_R")
    assert(Geo.addGeometry(both, gsProv, area = Some("Province"))
      .collect().head.getAs[String]("geometry") == "WKT_T")
    val neither = Seq((1L, "x")).toDF("id", "other")
    intercept[IllegalArgumentException](Geo.addGeometry(neither, gsProv))
  }

  test("the geoseries join broadcasts — fact side has no exchange") {
    val am = Geo.areaMap(Meta.fromYaml(mapsYaml), "testmap", "Province")
    val geom = Seq(("IR019", "W")).toDF("ADM1_PCODE", "geometry")
    val gs = Geo.createGeoSeries(geom, am, names, "Province")
    // key must VARY: a constant key lets Catalyst fold the equi-condition
    // away and degrade the join to a nested loop
    val fact = spark.range(1000).select(col("id"),
      element_at(typedlit(names.map { case (k, v) => k -> v }), col("id") % 24).as("Province"))
    val out = Geo.addGeometry(fact, gs)
    out.collect()
    val plan = out.queryExecution.executedPlan
    val bhj = collectWithSubqueries(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bhj.size == 2, s"expected both geo dim joins broadcast, got:\n$plan")
    val shuffles = collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, s"geo enrichment must not shuffle the fact side:\n$plan")
  }

  test("REAL maps.yaml: humandata Province block joins the real household names completely") {
    assume(RealMeta.available)
    val am = Geo.areaMap(RealMeta.maps, "humandata", "Province")
    val nm = RealMeta.areaNames("Province")
    assert(am.codeColumn == "ADM1_PCODE")
    assert(am.codes.size == 31) // 31 provinces (maps.yaml humandata.Province)
    assert(am.codes.keySet == nm.keySet,
      "every survey province code must carry both a PCODE and a name")
    assert(am.codes.values.toSeq.distinct.size == 31, "PCODEs must be unique")
    assert(nm(23L) == "Tehran" && am.codes(23L) == "IR028")
    // Region block parses with unique PCODEs. (household.yaml carries NO
    // `Region` name block, so the reference's own Region branch
    // (map_drawer.py:30-35) cannot resolve names against the current
    // corpus either — names for Region are out of metadata, by parity.)
    val amR = Geo.areaMap(RealMeta.maps, "humandata", "Region")
    assert(amR.codes.nonEmpty)
    assert(amR.codes.values.toSeq.distinct.size == amR.codes.size, "Region PCODEs must be unique")
  }
}
