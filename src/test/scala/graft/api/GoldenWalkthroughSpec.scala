package graft.api

import graft.SparkSpec
import graft.engine.HbsFixtures
import org.apache.spark.sql.functions._

/** The reference README's flagship analysis (README.md:62-435) as an
  * executable doc-test: the EXACT call chain — load_table →
  * add_attribute ×2 → filter Urban Tehran → add_classification →
  * add_weight → weighted expenditure → weights-sum denominator →
  * per-class k-Toman means — run step for step on the HbsFixtures
  * survey, with every intermediate asserted against hand-derived
  * goldens. The fixture-scale twin of the README's published numbers
  * (weights_sum = 4,466,717.0; food breakdown summing to 2,255
  * k Tomans): same pipeline, fixture-derived goldens.
  *
  * Fixture arithmetic (HbsFixtures): urban-Tehran households are
  * U1 (ID 12300001, weight 2) and U2 (12300002, weight 3). Their food
  * rows: (U1, 11100, 300), (U1, 21000, 100), (U2, 11200, 600).
  * Codes in [11000, 20000) classify Food, the rest NonFood —
  * so weights_sum = 2 + 3 = 5, weighted expenditure is
  * Food: 300·2 + 600·3 = 2400, NonFood: 100·2 = 200, and the final
  * per-class means are 2400/5/1e4 = 0.048 and 200/5/1e4 = 0.004.
  */
class GoldenWalkthroughSpec extends SparkSpec {
  import HbsFixtures.{U1, U2}

  private def api(): Api = new Api(spark, HbsFixtures.repo(spark))

  test("README flagship walkthrough: urban-Tehran food expenditure per class") {
    import spark.implicits._
    val a = api()

    // 1. hbsir.load_table("food", 1400)          (README.md:64-66)
    val food = a.loadTable("food", Seq(1400))
    assert(food.count() == 4)

    // 2. drop the provisioning columns            (README.md:127-129)
    val slim = food.drop("Table_Name", "Duration")

    // 3. add_attribute Urban_Rural + Province     (README.md:130-136)
    val attributed = a.addAttribute(a.addAttribute(slim, "Urban_Rural"), "Province")
    assert(attributed.where($"ID" === U1).select("Urban_Rural", "Province")
      .distinct().as[(String, String)].collect().toSeq == Seq(("Urban", "Tehran")))

    // 4. filter to urban Tehran                   (README.md:138-140)
    val urbanTehran = attributed
      .where($"Urban_Rural" === "Urban" && $"Province" === "Tehran")
      .drop("Urban_Rural", "Province")
    assert(urbanTehran.count() == 3)

    // 5. add_classification                       (README.md:213-216)
    val classified = a.addClassification(urbanTehran, "Food_NonFood")
    val byCode = classified.select("Code", "Food_NonFood")
      .as[(Long, String)].collect().toMap
    assert(byCode == Map(11100L -> "Food", 21000L -> "NonFood", 11200L -> "Food"))

    // 6. add_weight                               (README.md:218-219)
    val weighted = a.addWeight(classified)
    val wById = weighted.select("ID", "Weight").distinct()
      .as[(Long, Double)].collect().toMap
    assert(wById == Map(U1 -> 2.0, U2 -> 3.0))

    // 7. Weighted_Expenditure = Expenditure * Weight   (README.md:221-222)
    val wexp = weighted.withColumn("Weighted_Expenditure",
      $"Expenditure" * $"Weight")

    // 8. the weights-sum denominator: load the weights, re-attribute,
    //    filter, sum                              (README.md:297-360)
    val weights = a.loadTable("household_information", Seq(1400))
    val weightsSum = a.addAttribute(a.addAttribute(weights, "Urban_Rural"), "Province")
      .where($"Urban_Rural" === "Urban" && $"Province" === "Tehran" &&
        $"Weight".isNotNull)
      .agg(sum($"Weight")).as[Double].head()
    assert(weightsSum == 5.0) // the fixture's 4,466,717.0 (README.md:361)

    // 9. per-class weighted mean in "k Tomans"    (README.md:363-375)
    val perClass = wexp.groupBy("Food_NonFood")
      .agg(sum($"Weighted_Expenditure").as("wsum"))
      .select($"Food_NonFood", ($"wsum" / weightsSum / 1e4).as("Food_Expenditure"))
      .as[(String, Double)].collect().toMap
    assert(perClass == Map(
      "Food" -> 2400.0 / 5.0 / 1e4,     // 0.048
      "NonFood" -> 200.0 / 5.0 / 1e4))  // 0.004
    assert(perClass.values.sum == (2400.0 / 5.0 / 1e4) + (200.0 / 5.0 / 1e4))
  }
}
