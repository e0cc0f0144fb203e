package graft.meta

import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference's executable spec for the metadata algebra:
  * hbsir/metadata/_instruction.yaml (samples) and
  * tests/test_package/utils/test_metadata_utils.py (local cases).
  */
class MetaSpec extends AnyFunSuite {

  /** Order-insensitive structural normalization for equality asserts. */
  def norm(m: Meta): Meta = m match {
    case MMap(e)  => MMap(e.map { case (k, v) => k -> norm(v) }.sortBy(_._1.asString))
    case MList(e) => MList(e.map(norm))
    case other    => other
  }
  def resolve(m: Meta, year: Int): Meta = new VersionResolver(m, year).getVersion
  def assertResolve(doc: Meta, name: String, year: Int, expectName: String): Unit =
    assert(norm(resolve(doc(name), year)) == norm(doc(expectName)),
      s"$name @ $year != $expectName")

  val instruction: Meta = Meta.fromYaml(Spec.instructionYaml)

  test("simple versioned (spec)") {
    for (y <- 1350 until 1360) assertResolve(instruction, "simple_versioned", y, "simple_versioned_0")
    for (y <- 1360 until 1380 by 4) assertResolve(instruction, "simple_versioned", y, "simple_versioned_1360")
    for (y <- 1380 until 1400 by 4) assertResolve(instruction, "simple_versioned", y, "simple_versioned_1380")
  }

  test("keyword versioned (spec)") {
    for (y <- Seq(1350, 1359)) assertResolve(instruction, "keyword_versioned", y, "keyword_versioned_0")
    for (y <- Seq(1360, 1379)) assertResolve(instruction, "keyword_versioned", y, "keyword_versioned_1360")
    for (y <- Seq(1380, 1399)) assertResolve(instruction, "keyword_versioned", y, "keyword_versioned_1380")
  }

  test("sample_1") {
    for (y <- Seq(1350, 1359)) assertResolve(instruction, "sample_1", y, "sample_1_0")
    for (y <- Seq(1360, 1369)) assertResolve(instruction, "sample_1", y, "sample_1_1360")
    for (y <- Seq(1370, 1379)) assertResolve(instruction, "sample_1", y, "sample_1_1370")
    for (y <- Seq(1380, 1399)) assertResolve(instruction, "sample_1", y, "sample_1_1380")
  }

  test("sample_2 (nested type-changing versions)") {
    for (y <- Seq(1350, 1359)) assertResolve(instruction, "sample_2", y, "sample_2_0")
    for (y <- Seq(1360, 1369)) assertResolve(instruction, "sample_2", y, "sample_2_1360")
    for (y <- Seq(1370, 1379)) assertResolve(instruction, "sample_2", y, "sample_2_1370")
    for (y <- Seq(1380, 1399)) assertResolve(instruction, "sample_2", y, "sample_2_1380")
  }

  test("sample_3 (versions nested under simple version)") {
    for (y <- Seq(1350, 1359)) assertResolve(instruction, "sample_3", y, "sample_3_0")
    for (y <- Seq(1360, 1369)) assertResolve(instruction, "sample_3", y, "sample_3_1360")
    for (y <- Seq(1370, 1374)) assertResolve(instruction, "sample_3", y, "sample_3_1370")
    for (y <- Seq(1375, 1379)) assertResolve(instruction, "sample_3", y, "sample_3_1375")
    for (y <- Seq(1380, 1399)) assertResolve(instruction, "sample_3", y, "sample_3_1380")
  }

  test("local cases: not versioned / simple / keyword overlay") {
    val simple = Meta.fromYaml("{key: 1380, other_key: other_value}")
    assert(norm(resolve(simple, 1370)) == norm(simple))

    val sv = Meta.fromYaml("1363: {key: 1363}\n1383: {key: 1383}")
    assert(resolve(sv, 1350) == MNull)
    assert(norm(resolve(sv, 1370)) == norm(Meta.fromYaml("{key: 1363}")))
    assert(norm(resolve(sv, 1390)) == norm(Meta.fromYaml("{key: 1383}")))

    val kv = Meta.fromYaml(
      """shared_key: shared_value
        |overwritten_key: old_value
        |versions:
        |  1363: {key: 1363}
        |  1383: {key: 1383, overwritten_key: new_value}
        |""".stripMargin)
    assert(norm(resolve(kv, 1355)) ==
      norm(Meta.fromYaml("{shared_key: shared_value, overwritten_key: old_value}")))
    assert(norm(resolve(kv, 1370)) ==
      norm(Meta.fromYaml("{shared_key: shared_value, overwritten_key: old_value, key: 1363}")))
    assert(norm(resolve(kv, 1390)) ==
      norm(Meta.fromYaml("{shared_key: shared_value, overwritten_key: new_value, key: 1383}")))
  }

  test("categorizer (spec)") {
    val got = new CategoryResolver(instruction("categorized"), 1390).categorizeMetadata
    assert(norm(got) == norm(instruction("categorized_opened")))
  }

  test("isVersioned") {
    assert(new VersionResolver(instruction("sample_1"), 1390).isVersioned)
    assert(!new VersionResolver(Meta.fromYaml("{a: 1, b: [x, y]}"), 1390).isVersioned)
  }

  test("year parser") {
    assert(YearParser.parse("1365, 80-83, 99") == List(1365, 1380, 1381, 1382, 1383, 1399))
    assert(YearParser.parse(1399, YearParser.DefaultBounds) == List(1399))
    assert(YearParser.parse(Seq(98, 99, 1400), YearParser.DefaultBounds) == List(1398, 1399, 1400))
    assert(YearParser.parse("all").size == 1401 - 1363 + 1)
    assert(YearParser.parse("last") == List(1401))
    assert(YearParser.checkValidity(99) == 1399)
    assert(YearParser.checkValidity(1) == 1401) // two-digit pivot: <=60 -> +1400
    intercept[IllegalArgumentException](YearParser.parse("1350"))
    intercept[IllegalArgumentException](YearParser.checkValidity(60)) // 1460 out of range
  }

  test("argham: parse, membership, predicate shapes, union") {
    val a = Argham(Meta.fromYaml("[1, 2, 3, 4, {start: 6, end: 10}]"))
    assert(a.contains(2) && !a.contains(5) && a.contains(6) && a.contains(9) && !a.contains(10))
    val stepped = Argham(Meta.fromYaml("{start: 0, end: 10, step: 2}"))
    assert(stepped.contains(4) && !stepped.contains(5))
    val union = a.union(stepped)
    assert(union.contains(0) && union.contains(3))
    // keyword extraction + default_range filtering of bare ints
    val kw = Argham(Meta.fromYaml("{code: [100, 200]}"), keywords = Seq("code"))
    assert(kw.contains(100) && kw.contains(200) && !kw.contains(150))
    val dr = Argham(Meta.fromYaml("[5, 1500]"), defaultRange = Some((0L, 1000L)))
    assert(dr.contains(5) && !dr.contains(1500))
  }

  test("table-year availability") {
    val avail = Map("food" -> Argham(Meta.fromYaml("{start: 1363, end: 1384}")))
    val pairs = YearParser.tableYearPairs(Seq("food", "other"), Seq(1383, 1384), avail)
    assert(pairs == List(("food", 1383), ("other", 1383), ("other", 1384)))
  }

  test("deepMerge: recursive local override over a packaged doc") {
    val packaged = Meta.fromYaml("""
food:
  settings: {missings: error}
  columns:
    CODE: {new_name: Code, type: unsigned}
    VALUE: {new_name: Expenditure, type: float}
other:
  columns:
    X: {new_name: X, type: string}
""")
    val local = Meta.fromYaml("""
food:
  columns:
    VALUE: {type: integer}
    NEW: {new_name: Extra, type: string}
added:
  columns: {}
""")
    val merged = Meta.deepMerge(packaged, local)
    // untouched subtrees survive
    assert(merged("food")("settings")("missings").asStr == "error")
    assert(merged("food")("columns")("CODE")("new_name").asStr == "Code")
    assert(merged("other")("columns")("X")("type").asStr == "string")
    // leaf-level patch: type changed, sibling key kept
    assert(merged("food")("columns")("VALUE")("type").asStr == "integer")
    assert(merged("food")("columns")("VALUE")("new_name").asStr == "Expenditure")
    // additions at any depth
    assert(merged("food")("columns")("NEW")("new_name").asStr == "Extra")
    assert(merged.has("added"))
    // non-map override replaces the subtree wholesale
    val repl = Meta.deepMerge(Meta.fromYaml("a: {b: 1}"), Meta.fromYaml("a: [1, 2]"))
    assert(repl("a").asList.map(_.asLong) == Vector(1L, 2L))
  }
}
