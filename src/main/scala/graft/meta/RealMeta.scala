package graft.meta

/** Loader for the reference's REAL public metadata corpus — the YAML
  * documents under hbsir/metadata/ that drive the original engine:
  * commodities.yaml (3,969 lines, `{{…}}` templated), occupations.yaml
  * (23,618 lines), household.yaml, tables.yaml, schema.yaml.
  *
  * The corpus is data, not code: parsing it through [[Meta.fromYaml]] →
  * [[VersionResolver]] → [[graft.ops.Classifier.compile]] is the
  * credibility gate between "an engine with HBSIR-shaped semantics" and
  * "an engine that runs HBSIR's actual metadata"
  * (tests/test_metadata/test_tables.py:27-146 is the reference's own
  * exhaustive load-matrix test). Everything here is lazy and cached; the
  * corpus root is overridable for environments that relocate it.
  */
object RealMeta {

  /** 1363–1401, the survey coverage window
    * (hbsir/config/default_settings.yaml:40-41). */
  val FirstYear = 1363
  val LastYear = 1401
  val AllYears: Seq[Int] = FirstYear to LastYear

  def root: String =
    sys.env.getOrElse("GRAFT_REFERENCE_METADATA", "/root/reference/hbsir/metadata")

  def available: Boolean = new java.io.File(root).isDirectory

  private def read(name: String): String = {
    val p = java.nio.file.Paths.get(root, name)
    require(java.nio.file.Files.isReadable(p),
      s"reference metadata corpus not found at $p — set GRAFT_REFERENCE_METADATA")
    new String(java.nio.file.Files.readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8)
  }

  /** commodities.yaml uses the `{{name}}` / `{{name.item}}` template
    * notation (commodities.yaml:1784-1830) — parse templated. */
  lazy val commodities: Meta = Meta.fromYamlTemplated(read("commodities.yaml"))
  lazy val occupations: Meta = Meta.fromYaml(read("occupations.yaml"))
  lazy val household: Meta = Meta.fromYaml(read("household.yaml"))
  lazy val tables: Meta = Meta.fromYaml(read("tables.yaml"))
  lazy val schema: Meta = Meta.fromYaml(read("schema.yaml"))
  lazy val maps: Meta = Meta.fromYaml(read("maps.yaml"))

  /** household.yaml area name map (survey code → English name) for a
    * non-versioned area block like Province (household.yaml:34-71). */
  def areaNames(area: String): Map[Long, String] =
    household(area)("name").asMap.map {
      case (IKey(k), v) => k -> v.asStr
      case (SKey(k), v) => k.trim.toLong -> v.asStr
    }.toMap

  /** [[areaNames]] for a YEAR-VERSIONED name block (County,
    * household.yaml:395-435: reassigned counties null out their code in
    * later years): entries are version-resolved at `year`, null-resolved
    * codes are dropped. The reference's map_drawer reads the block raw
    * (map_drawer.py:13) and would hand a year-dict to the geoseries
    * index for such codes — resolving is the semantics it intends.
    */
  def areaNamesAt(area: String, year: Int): Map[Long, String] =
    household(area)("name").asMap.flatMap { case (k, v) =>
      val code = k match { case IKey(i) => i; case SKey(s) => s.trim.toLong }
      val resolved = v match {
        case m: MMap => new VersionResolver(m, year).getVersion
        case other   => other
      }
      if (resolved.isNull) None else Some(code -> resolved.asStr)
    }.toMap

  /** Top-level classification names of a commodities/occupations-shaped
    * document: every key whose value carries an `items` subtree. */
  def classificationNames(doc: Meta): Seq[String] =
    doc.asMap.collect { case (SKey(k), v: MMap) if v.keys.contains(SKey("items")) => k }

  /** The (table -> years) availability matrix
    * (tables.yaml `yearly_table_availability`), each value an Argham
    * with the corpus year window as the default bounds. */
  lazy val tableAvailability: Map[String, Argham] =
    tables("yearly_table_availability").asMap.map { case (k, v) =>
      k.asString -> Argham(v, defaultStart = Some(FirstYear.toLong),
        defaultEnd = Some(LastYear.toLong + 1))
    }.toMap

  /** Every (table, year) pair the reference's own exhaustive test loads
    * (tests/test_metadata/test_tables.py `build_table_year_pairs`). */
  lazy val tableYearPairs: Seq[(String, Int)] =
    for {
      (t, avail) <- tableAvailability.toSeq.sortBy(_._1)
      y <- AllYears if avail.contains(y.toLong)
    } yield (t, y)

  /** schema.yaml standard-table names (every top-level key except the
    * shared `ANCHORS` block). */
  lazy val schemaTableNames: Seq[String] =
    schema.asMap.collect { case (SKey(k), _) if k != "ANCHORS" => k }
}
