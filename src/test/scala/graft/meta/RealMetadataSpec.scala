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
    for (y <- 1387 to 1391)
      assert(byYear(y) == IdDecoder.ExternalFile(y, "counties"), s"County@$y: ${byYear(y)}")
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
