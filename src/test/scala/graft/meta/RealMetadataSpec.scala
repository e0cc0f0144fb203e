package graft.meta

import graft.ops.{Classifier, CleanOps, IdDecoder, Pipeline}
import org.scalatest.funsuite.AnyFunSuite

/** Runs the reference's REAL public metadata corpus
  * (the YAML files under hbsir/metadata/) through the full compile chain —
  * Meta.fromYaml → VersionResolver/CategoryResolver →
  * Classifier/IdDecoder/CleanOps/Pipeline compile — for every year
  * 1363–1401, the Scala twin of the reference's exhaustive load-matrix
  * test (tests/test_metadata/test_tables.py:27-146).
  *
  * Zero tolerance: any resolver error, any unparseable instruction, any
  * cross-item range overlap within a (classification, year, level) fails
  * the suite with the offending coordinates.
  */
class RealMetadataSpec extends AnyFunSuite {

  import RealMeta.AllYears

  def corpus(): Unit = assume(RealMeta.available,
    s"reference metadata corpus not present at ${RealMeta.root}")

  /** Cross-item overlap scan for one classification's compiled items:
    * sort ranges per (year, level) by start and sweep with a running
    * max-end; a range starting inside another ITEM's live range is a D1
    * ambiguity (decoder.py:436-444 would raise on any code in the
    * intersection). Same-item overlap is legal (range + contained
    * singleton).
    */
  def overlapErrors(name: String, items: Seq[Classifier.ClassItem]): Seq[String] =
    items.groupBy(i => (i.year, i.level)).toSeq.flatMap { case ((y, l), its) =>
      val rs = (for { it <- its; r <- it.codes.ranges } yield (r, it.key))
        .sortBy { case (r, _) => (r.start, r.end) }
      var maxEnd = Long.MinValue
      var maxKey = ""
      val errs = Seq.newBuilder[String]
      rs.foreach { case (r, key) =>
        if (r.start < maxEnd && key != maxKey)
          errs += s"$name year=$y level=$l: item '$key' [${r.start},${r.end}) overlaps item '$maxKey' (ends $maxEnd)"
        if (r.end > maxEnd) { maxEnd = r.end; maxKey = key }
      }
      errs.result()
    }

  /** Compile every classification of a commodities/occupations-shaped
    * document for every year it is defined; returns
    * (name -> (availableYears, compiledItems)). A classification whose
    * `items` resolve to null for a year is unavailable that year (the
    * reference only instantiates decoders for defined years).
    */
  def compileAll(doc: Meta): Map[String, (Seq[Int], Seq[Classifier.ClassItem])] =
    RealMeta.classificationNames(doc).map { name =>
      val cls = doc(name)
      val settings = Classifier.settingsFromMeta(cls)
      val extraAspects = settings.aspects.filterNot(_ == "item_key")
      val years = AllYears.filter { y =>
        new VersionResolver(cls, y).getVersion.get("items").exists(!_.isNull)
      }
      val items = Classifier.compile(cls, years, extraAspects)
      name -> (years, items)
    }.toMap

  // ------------------------------------------------------------ commodities

  test("commodities.yaml: all 15 classifications compile for all defined years") {
    corpus()
    val all = compileAll(RealMeta.commodities)
    assert(all.keySet == Set(
      "sci_coicop_1363", "sci_coicop_1383", "sci_coicop",
      "original_1363", "original_1383", "original",
      "Food_NonFood", "Duration", "Durability", "Imputed_Rent",
      "Insurance_Benefits", "sci_main_categories", "sci_food_categories",
      "coicop_2018", "coicop_1999"),
      s"classification inventory drifted: ${all.keySet.toSeq.sorted}")
    // the API-facing classifications cover the full corpus window
    for (name <- Seq("original", "Food_NonFood", "Duration", "sci_coicop"))
      assert(all(name)._1 == AllYears, s"$name not defined for all years: ${all(name)._1}")
    all.foreach { case (name, (years, items)) =>
      assert(years.nonEmpty, s"$name defined for no year")
      assert(items.nonEmpty, s"$name compiled to zero items")
    }
    // the templated splice carries real ranges: original@1400 level 1
    // food group is the sci_coicop_1383 food+beverage range
    val l1 = all("original")._2.filter(i => i.year == 1400 && i.level == 1)
    assert(l1.exists(i => i.key == "food_and_non_alcoholic_beverages" &&
      i.codes.contains(11500L) && !i.codes.contains(21100L)),
      s"original@1400 level1: ${l1.map(i => i.key -> i.codes.toString)}")
  }

  test("commodities.yaml: D1 uniqueness — no cross-item overlap per (year, level)") {
    corpus()
    val errs = compileAll(RealMeta.commodities).toSeq.flatMap { case (name, (_, items)) =>
      // Era-suffixed entries (sci_coicop_1383 / original_1383) are the
      // anchor building blocks `original` splices in for years >= 1383
      // (commodities.yaml:1779-1796); resolving them BEFORE their era
      // mixes two coding schemes (their items carry the pre-1383 codes
      // of the ranges that changed) and genuinely overlaps. The
      // reference never instantiates them outside their era, so the
      // uniqueness claim is scoped to it.
      val scoped =
        if (name.endsWith("_1383")) items.filter(_.year >= 1383) else items
      overlapErrors(name, scoped)
    }
    assert(errs.isEmpty, s"${errs.size} overlaps:\n${errs.take(40).mkString("\n")}")
  }

  test("commodities.yaml: aspect-carrying classifications expose their aspects") {
    corpus()
    val duration = RealMeta.commodities("Duration")
    val s = Classifier.settingsFromMeta(duration)
    assert(s.aspects == Seq("duration") && s.levels == Seq(4) &&
      s.columnNames == Seq("Duration"))
    val items = Classifier.compile(duration, Seq(1390), extraAspects = Seq("duration"))
    val withAspect = items.filter(_.aspects.contains("duration"))
    assert(withAspect.nonEmpty, "Duration items lost their duration aspect")
    assert(withAspect.forall(i => i.aspects("duration").matches("\\d+")),
      s"non-numeric duration: ${withAspect.map(_.aspects).take(5)}")
    // Food_NonFood: missing-value replacement + column_names from defaults
    val fnf = Classifier.settingsFromMeta(RealMeta.commodities("Food_NonFood"))
    assert(fnf.columnNames == Seq("Food_NonFood") &&
      fnf.missingValueReplacements == Map("Food_NonFood" -> "NonFood"))
  }

  // ------------------------------------------------------------ occupations

  test("occupations.yaml: isco + original compile for all years with uniqueness") {
    corpus()
    val all = compileAll(RealMeta.occupations)
    assert(all.keySet == Set("isco", "original"),
      s"occupation inventory drifted: ${all.keySet}")
    all.foreach { case (name, (years, items)) =>
      assert(years == AllYears, s"$name not defined for all years: $years")
      // 10 major groups at level 1, and the full 4-level ISCO tree
      val byLevel = items.filter(_.year == 1400).groupBy(_.level).view.mapValues(_.size).toMap
      assert(byLevel.getOrElse(1, 0) == 10, s"$name level1 groups: $byLevel")
      assert((1 to 4).forall(l => byLevel.getOrElse(l, 0) > 0), s"$name levels: $byLevel")
      val errs = overlapErrors(name, items)
      assert(errs.isEmpty, s"${errs.size} overlaps:\n${errs.take(20).mkString("\n")}")
    }
    // aspect extraction: titles ride along
    val items = Classifier.compile(RealMeta.occupations("isco"), Seq(1400),
      extraAspects = Seq("title"))
    assert(items.exists(i => i.key == "managers" && i.aspects.get("title").contains("Managers")))
  }

  // ----------------------------------------------------- hand-pinned goldens

  /** (year, code, level) -> expected item key, transcribed BY HAND from
    * the YAML text (line cites on each row). These literals never touch
    * Classifier.compile — they are the independent truth that the
    * YAML→range compilation parses boundaries, year-keyed code dicts,
    * the `original` era splice, and level numbers faithfully. The other
    * tests in this suite prove inventory/availability/non-overlap; a
    * mis-parsed boundary could survive all of those AND the
    * d1_real_commodities gate (whose oracle VALUES are generated from
    * the same compiled ranges) — only a hand-written golden catches it.
    */
  private val commodityGoldens: Seq[(Int, Long, Int, Option[String])] = Seq(
    // ---- pre-1383 era (original splices sci_coicop_1363, commodities.yaml:13)
    (1370, 10500L, 1, Some("food_beverages_and_tobacco")),     // :17-20 [10_000,20_000)
    (1363, 11000L, 3, Some("cereals_and_cereal_products")),    // :23-29 1363-keyed [11_000,12_000), start-inclusive
    (1382, 11999L, 3, Some("cereals_and_cereal_products")),    // :23-29 last pre-era year, end-exclusive side
    // meat_and_sea_foods sits under a "LEVEL 3" banner comment but its
    // DATA says `level: 5` (:55-61) — the parser must read the data
    (1370, 12500L, 3, None),
    (1370, 12500L, 5, Some("meat_and_sea_foods")),             // :55-61 1363-keyed [12_000,13_000)
    (1375, 13500L, 3, Some("milk_other_dairy_product_and_eggs")), // :81-84 [13_000,14_000)
    (1370, 14500L, 3, Some("oils_and_fats")),                  // :109-112 [14_000,15_000)
    (1375, 15000L, 3, Some("fruits_and_vegetables")),          // :128-131 [15_000,16_000), start boundary
    (1380, 16999L, 3, Some("nuts_and_pulses")),                // :177-180 [16_000,17_000)
    (1378, 17000L, 3, Some("sugar_confectionery_and_desserts_tea_coffee_and_cocoa_drinks")), // :197-199, proves 17_000 left nuts_and_pulses (end-exclusive)
    (1370, 18500L, 3, Some("spices_condiments_and_other_food_products")), // :221-224 [18_000,19_000)
    (1370, 19999L, 3, Some("soft_drinks_prepared_foods_and_tobacco")),    // :248-251 [19_000,20_000)
    (1370, 31500L, 2, Some("housing")),                        // :312-315 [31_000,32_000)
    (1382, 41000L, 2, Some("rentals_for_housing")),            // :318-321 [41_000,42_000)
    (1370, 11500L, 2, None), // pre-1383 defines EXACTLY two level-2 items (:313, :319); 11_500 is in neither
    // ---- post-1383 era (original splices sci_coicop_1383, commodities.yaml:364)
    (1383, 10000L, 1, Some("food_and_non_alcoholic_beverages")), // :372-377 1383-keyed [10_000,20_000), first era year
    (1390, 11500L, 2, Some("food")),                           // :380-385 1383-keyed [11_000,12_000)
    (1390, 11150L, 3, Some("cereals_and_cereal_products")),    // :388-394 1383-keyed [11_100,11_200) — the code dict flipped with the era
    (1390, 11000L, 3, None), // 1383-era level-3 coverage starts at 11_100 (:388-394); [11_000,11_100) has no level-3 owner
    (1401, 11250L, 3, Some("meat")),                           // :618-622 [11_200,11_300)
    (1395, 11350L, 3, Some("fish_and_other_sea_foods")),       // :709-713 [11_300,11_400)
    (1390, 11550L, 3, Some("oils_fats_and_butter")),           // :861-865 [11_500,11_600)
    (1385, 11650L, 3, Some("fruits_and_nuts")),                // :919-923 [11_600,11_700)
    (1400, 11700L, 3, Some("vegetables_and_pulses")),          // :1050-1054 [11_700,11_800), start boundary
    (1390, 12150L, 3, Some("tea_coffee_and_cocoa_drinks")),    // :1377-1381 [12_100,12_200)
    (1390, 12500L, 2, Some("non_alcoholic_beverages")),        // :1369-1373 [12_000,13_000)
    // NOTE: YAML keys like `_tobacco` disambiguate duplicate map keys;
    // the reference presents them with underscores stripped from both
    // ends (metadata_utils.py:344 `key.strip("_")`) — goldens pin the
    // PRESENTED key
    (1390, 22150L, 3, Some("tobacco")),                        // :1501-1504 [22_100,22_200), key `_tobacco` -> `tobacco`
    (1390, 22999L, 2, Some("tobacco")),                        // :1494-1497 [22_000,23_000)
    (1390, 23000L, 2, Some("norcotics")),                      // :1515-1518 [23_000,24_000) — tobacco's end is exclusive, norcotics' start inclusive
    (1390, 31500L, 2, Some("clothing")),                       // :1544-1547 [31_000,32_000) — ERA FLIP: same (code, level) was `housing` pre-1383
    (1401, 32100L, 3, Some("shoes_and_other_footwear")),       // :1592-1595 [32_100,32_200)
    (1390, 41500L, 2, Some("actual_rentals_for_housing")),     // :1613-1616 [41_000,42_000) — era flip of the pre-1383 `rentals_for_housing` key
    (1395, 42000L, 2, Some("imputed_rentals_for_housing")),    // :1620-1623 [42_000,43_000)
    (1390, 112050L, 3, Some("accommodation_services")),        // :1717-1721 [112_000,112_100) ("Yes! it is true!"), key `_accommodation_services`
    (1390, 139500L, 2, Some("transfer_payments")),             // :1746-1749 [139_000,140_000), key `_transfer_payments`
    (1400, 33500L, 2, Some("investing_in_construction")),      // :1761-1764 [33_000,34_000)
    (1390, 34999L, 2, Some("other_investments")),              // :1768-1771 [34_000,35_000)
  )

  private val occupationGoldens: Seq[(Int, Long, Int, Option[String])] = Seq(
    (1380, 1500L, 1, Some("managers")),                        // occupations.yaml:8-12 [1000,2000)
    (1400, 1100L, 2, Some("chief_executives_senior_officials_and_legislators")), // :64-69 [1100,1200), start boundary
    (1390, 2999L, 1, Some("professionals")),                   // :2001-2005 [2000,3000)
    (1375, 5000L, 1, Some("service_and_sales_workers")),       // :13080-13084 [5000,6000)
    (1401, 9999L, 1, Some("elementary_occupations")),          // :21761-21765 [9000,10000)
  )

  private def checkGoldens(name: String, doc: Meta,
      goldens: Seq[(Int, Long, Int, Option[String])]): Unit = {
    val years = goldens.map(_._1).distinct.sorted
    val items = Classifier.compile(doc, years)
    val errs = goldens.flatMap { case (y, code, lvl, want) =>
      val hits = items.filter(i => i.year == y && i.level == lvl && i.codes.contains(code))
        .map(_.key).distinct
      (want, hits) match {
        case (Some(k), Seq(h)) if h == k => None
        case (None, Seq())               => None
        case _ => Some(s"$name ($y, $code, level $lvl): want ${want.getOrElse("<none>")}, got ${hits.mkString("[", ",", "]")}")
      }
    }
    assert(errs.isEmpty, s"${errs.size} golden mismatches:\n${errs.mkString("\n")}")
  }

  test("hand-pinned goldens: commodities `original` reproduces YAML-transcribed truths") {
    corpus()
    checkGoldens("original", RealMeta.commodities("original"), commodityGoldens)
  }

  test("hand-pinned goldens: occupations isco + original reproduce YAML-transcribed truths") {
    corpus()
    checkGoldens("isco", RealMeta.occupations("isco"), occupationGoldens)
    checkGoldens("original", RealMeta.occupations("original"), occupationGoldens)
  }

  // -------------------------------------------------------------- household

  test("household.yaml: ID layouts + attribute availability for every year") {
    corpus()
    val hh = RealMeta.household
    // ID lengths, the digit-substring foundation (household.yaml:2-8)
    val expectLen = Seq(1363 -> 7, 1374 -> 8, 1375 -> 7, 1377 -> 9, 1387 -> 10, 1392 -> 11)
    for (y <- AllYears) {
      val len = new VersionResolver(hh, y).getVersion("ID_Length").asLong.toInt
      val want = expectLen.filter(_._1 <= y).last._2
      assert(len == want, s"ID_Length@$y = $len, want $want")
    }
    // Urban_Rural and Province decode positionally every year, with labels
    for (attr <- Seq("Urban_Rural", "Province")) {
      val layouts = IdDecoder.compileOpt(hh, attr, AllYears)
      assert(layouts.forall(_.isInstanceOf[IdDecoder.Positional]), s"$attr: $layouts")
      layouts.collect { case IdDecoder.Positional(v) =>
        assert(v.labels.nonEmpty, s"$attr@${v.fromYear}: no labels")
      }
    }
    // Urban_Rural label flip at 1387 (household.yaml:17-23)
    val ur = IdDecoder.compileOpt(hh, "Urban_Rural", Seq(1380, 1390))
      .collect { case IdDecoder.Positional(v) => v }
    assert(ur(0).labels == Map(0L -> "Rural", 1L -> "Urban"))
    assert(ur(1).labels == Map(1L -> "Urban", 2L -> "Rural"))
    // Province: 31 distinct codes by 1400 (31 provinces)
    val prov = IdDecoder.compileOpt(hh, "Province", Seq(1400))
      .collect { case IdDecoder.Positional(v) => v }.head
    assert(prov.labels.size == 31, s"provinces: ${prov.labels.size}")
    // County: positional 1377-1386 and 1392+, external 'counties' 1387-1391,
    // unavailable before 1377 (household.yaml:180-196)
    val county = IdDecoder.compileOpt(hh, "County", AllYears)
    val byYear = AllYears.zip(county).toMap
    for (y <- 1363 to 1376)
      assert(byYear(y) == IdDecoder.Unavailable(y), s"County@$y: ${byYear(y)}")
    for (y <- 1377 to 1386)
      assert(byYear(y).isInstanceOf[IdDecoder.Positional], s"County@$y: ${byYear(y)}")
    for (y <- 1387 to 1391) byYear(y) match {
      case IdDecoder.ExternalFile(yy, f, labels) =>
        assert(yy == y && f == "counties" && labels.nonEmpty, s"County@$y: ${byYear(y)}")
      case other => fail(s"County@$y: $other")
    }
    for (y <- 1392 to 1401)
      assert(byYear(y).isInstanceOf[IdDecoder.Positional], s"County@$y: ${byYear(y)}")
  }

  // ------------------------------------------------------------- tables.yaml

  test("tables.yaml: every (table, year) in the availability matrix cleans") {
    corpus()
    val pairs = RealMeta.tableYearPairs
    // the reference's matrix: 27 tables; food spans the whole window
    assert(pairs.map(_._1).distinct.size == 27, s"tables: ${pairs.map(_._1).distinct.size}")
    assert(pairs.count(_._1 == "food") == AllYears.size)
    assert(pairs.size == 691, s"matrix drifted: ${pairs.size} pairs")
    val errs = pairs.flatMap { case (t, y) =>
      try {
        // urban/rural-split tables carry one spec per side
        // (data_cleaner.py:88-99); mirror RawSources.openAndCleanTable
        val resolved = new VersionResolver(RealMeta.tables(t), y).getVersion
        val sideMetas = Seq("urban", "rural").flatMap(resolved.get) match {
          case Nil   => Seq(resolved)
          case sides => sides
        }
        sideMetas.flatMap { sm =>
          val spec = CleanOps.compileSpec(sm, y)
          if (spec.columns.isEmpty) Some(s"$t@$y: zero columns")
          else if (spec.columns.exists(_.newName.isEmpty)) Some(s"$t@$y: empty new_name")
          else None
        }
      } catch { case e: Exception => Seq(s"$t@$y: ${e.getClass.getSimpleName} ${e.getMessage}".take(300)) }
    }
    assert(errs.isEmpty, s"${errs.size} failures:\n${errs.take(30).mkString("\n")}")
  }

  // ------------------------------------------------------------- schema.yaml

  test("schema.yaml: every standard table's instructions compile for every year") {
    corpus()
    val names = RealMeta.schemaTableNames
    assert(names.size > 35, s"schema tables: ${names.size}")
    assert(Seq("Expenditures", "Total_Expenditure", "Weights", "Equivalence_Scale",
      "Income_Breakdown").forall(names.contains), s"missing flagships in $names")
    val errs = for {
      t <- names
      y <- AllYears
      err <- try {
        val resolved = new VersionResolver(RealMeta.schema(t), y).getVersion
        resolved.get("instructions") match {
          case None | Some(MNull) => None
          case Some(ins) =>
            Pipeline.compile(ins)
            // table_list (the upstream DAG edge set) must also resolve
            resolved.get("table_list").foreach {
              case MList(ts) => ts.foreach(_.asStr)
              case MStr(_)   => () // single-upstream shorthand (schema.yaml:97-99)
              case MNull     => ()
              case other     => sys.error(s"bad table_list $other")
            }
            None
        }
      } catch { case e: Exception => Some(s"$t@$y: ${e.getClass.getSimpleName} ${e.getMessage}") }
    } yield err
    assert(errs.isEmpty, s"${errs.size} failures:\n${errs.take(30).mkString("\n")}")
    // spot-check a compiled pipeline: Expenditures@1390 is the annualizer
    val exp = Pipeline.compile(
      new VersionResolver(RealMeta.schema("Expenditures"), 1390).getVersion("instructions"))
    assert(exp.collect { case Pipeline.CreateColNumeric(n, Right(e)) => n -> e }.toMap ==
      Map("Gross_Expenditure" -> "Gross_Expenditure / Duration * 360",
        "Net_Expenditure" -> "Net_Expenditure / Duration * 360"))
  }
}
