package graft.meta

import org.scalatest.funsuite.AnyFunSuite

/** `{{placeholder}}` template resolution, commodities.yaml-style
  * (metadata_reader.py:366-381; usage commodities.yaml:1784-1830).
  */
class TemplateSpec extends AnyFunSuite {

  private val doc = """
sci_1363:
  items:
    food:
      level: 1
      code: {start: 10000, end: 20000}
    cereals:
      level: 3
      code:
        1363: {start: 11000, end: 12000}
        1383: {start: 11100, end: 11200}

original:
  defaults:
    levels: [2, 3]
  items:
    1363: {{sci_1363}}

Food_NonFood:
  defaults:
    levels: [1]
    missing_value_replacements: {Food_NonFood: NonFood}
  items:
    1363:
      Food:
        level: 1
        code:
          - {{sci_1363.food}}
      NonFood:
        level: 1
"""

  test("whole-items splice: {{name}} becomes the items subtree") {
    val m = Meta.fromYamlTemplated(doc)
    val spliced = m("original")("items").get(1363L).get match {
      case mm: MMap => mm
      case other => fail(s"not a map: $other")
    }
    assert(spliced.has("food") && spliced.has("cereals"))
    assert(spliced("cereals")("level").asLong == 3)
  }

  test("single-item splice inside a list: {{name.item}}") {
    val m = Meta.fromYamlTemplated(doc)
    val foodCodes = m("Food_NonFood")("items").get(1363L).get("Food")("code").asList
    assert(foodCodes.length == 1)
    // the spliced item carries the whole item dict; Argham with
    // keywords=["code"] digs out the ranges like the reference
    val argham = Argham(foodCodes.head, keywords = Seq("code"))
    assert(argham.contains(15000) && !argham.contains(25000))
  }

  test("year-versioned code inside a spliced subtree still resolves") {
    val m = Meta.fromYamlTemplated(doc)
    val items = new CategoryResolver(m("original"), 1390).categorizeMetadata
    // 1363 (simple-versioned items key) selected for year 1390; cereals
    // code resolved to the 1383 version
    val cereal = items("items").asList
      .find(_.get("item_key").exists(_.asStr == "cereals")).get
    val a = Argham(cereal("code"), keywords = Seq("code"))
    assert(a.contains(11150) && !a.contains(11500))
  }
}
