package graft.api

import graft.meta.{Meta, YearParser}

/** Layered runtime settings — the reference's `collect_settings`
  * (hbsir/core/metadata_reader.py:216-256): packaged defaults
  * (config/default_settings.yaml:37-41,73-91), overlaid by an optional
  * package-level doc, overlaid by an optional user doc; later layers
  * win leaf-by-leaf. The reference flattens nested dicts to leaf paths
  * and updates per leaf — exactly a recursive map merge, so the overlay
  * is [[Meta.deepMerge]] folded left-to-right (a documented superset:
  * deepMerge also admits NEW keys, which `_update_settings` ignores).
  *
  * Only the settings the library consumes are surfaced as typed
  * accessors; the full merged doc stays available for user extensions.
  */
final class Settings private (val doc: Meta) {

  private def str(path: String*): String =
    path.foldLeft(doc)((m, k) => m(k)).asStr

  /** Default survey-year bounds for year-spec parsing
    * (default_settings.yaml:40-41).
    */
  def yearBounds: YearParser.YearBounds =
    YearParser.YearBounds(doc("first_year").asLong.toInt, doc("last_year").asLong.toInt)

  /** Default column names (default_settings.yaml:73-78). */
  def yearCol: String = str("columns", "year")
  def idCol: String = str("columns", "household_id")
  def commodityCodeCol: String = str("columns", "commodity_code")
  def jobCodeCol: String = str("columns", "job_code")
  def weightCol: String = str("columns", "weight")

  /** Columns deflated by adjust_by_cpi when none are given
    * (default_settings.yaml:80-87).
    */
  def nominalColumns: Seq[String] = doc("nominal_columns").asList.map(_.asStr)

  /** Default grouping columns (default_settings.yaml:89-91). */
  def groupbyColumns: Seq[String] = doc("groupby_columns").asList.map(_.asStr)
}

object Settings {

  /** Mirrors the consumed subset of the reference's packaged
    * config/default_settings.yaml.
    */
  val packagedDefaults: Meta = Meta.fromYaml("""
first_year: 1363
last_year: 1401
columns:
  year: Year
  household_id: ID
  commodity_code: Code
  job_code: Job_Code
  weight: Weight
nominal_columns:
  - Expenditure
  - Net_Expenditure
  - Gross_Expenditure
  - Price
  - Income
  - Net_Income
  - Gross_Income
groupby_columns:
  - Year
  - Urban_Rural
""")

  /** Packaged defaults, no overlays. */
  val default: Settings = new Settings(packagedDefaults)

  /** `setup_config` semantics (hbsir/__init__.py:35-48): fold the given
    * override docs (package-level first, user-level last) over the
    * packaged defaults; rightmost wins.
    */
  def apply(overlays: Meta*): Settings =
    new Settings(overlays.foldLeft(packagedDefaults)(Meta.deepMerge))

  /** Convenience: overlay docs given as YAML strings. */
  def fromYaml(overlays: String*): Settings =
    apply(overlays.map(Meta.fromYaml): _*)
}
