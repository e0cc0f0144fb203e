package graft.plans

import graft.SparkSpec
import graft.meta.{Meta, ResolverSettings}
import graft.ops.Classifier
import org.apache.spark.sql.functions._

class RangeSetSpec extends SparkSpec {

  test("binary-search range membership: matches, misses, nulls") {
    import spark.implicits._
    val df = Seq(Some(5L), Some(150L), Some(999L), None, Some(25L))
      .toDF("code")
    val out = df.select(col("code"),
      RangeSet.search(col("code"), Seq((0L, 10L), (20L, 30L), (100L, 200L))).as("idx"))
      .collect().map(r => Option(r.get(0)) -> Option(r.get(1))).toMap
    assert(out(Some(5L)) == Some(0))
    assert(out(Some(25L)) == Some(1))
    assert(out(Some(150L)) == Some(2))
    assert(out(Some(999L)) == None)
    assert(out(None) == None)
  }

  test("lookup maps to labels with default fill") {
    import spark.implicits._
    val df = (0L to 30L by 10).toDF("code")
    val out = df.select(col("code"),
      RangeSet.lookup(col("code"),
        Seq((0L, 15L, "low"), (15L, 25L, "mid")), Some("other")).as("label"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(0L -> "low", 10L -> "low", 20L -> "mid", 30L -> "other"))
  }

  test("overlapping ranges are rejected at plan time") {
    import spark.implicits._
    val df = Seq(1L).toDF("code")
    intercept[IllegalArgumentException] {
      df.select(RangeSet.search(col("code"), Seq((0L, 10L), (5L, 15L)))).collect()
    }
  }

  test("inverted ranges (lo > hi) are rejected at plan time, even in last position") {
    import spark.implicits._
    val df = Seq(1L).toDF("code")
    // last range inverted — the pairwise sorted/disjoint loop never
    // inspects it, so only a per-range lo <= hi check can catch it
    intercept[IllegalArgumentException] {
      df.select(RangeSet.search(col("code"), Seq((0L, 10L), (20L, 15L)))).collect()
    }
    // inverted SINGLE range — no pairs at all
    intercept[IllegalArgumentException] {
      df.select(RangeSet.search(col("code"), Seq((10L, 5L)))).collect()
    }
  }

  test("large range set works under codegen (O(log n) search)") {
    import spark.implicits._
    // 500 disjoint ranges — a when-ladder of this size would strain
    // codegen; the expression stays one tight loop
    val ranges = (0 until 500).map(i => (i * 10L, i * 10L + 5L, s"r$i"))
    val df = (0L until 5000L).toDF("code")
    val hits = df.select(RangeSet.lookup(col("code"), ranges).as("l"))
      .where(col("l").isNotNull).count()
    assert(hits == 500 * 5) // 5 matching codes per range
  }

  test("expression-compiled classification equals the join path") {
    import spark.implicits._
    val meta = Meta.fromYaml("""
defaults:
  levels: [1]
items:
  small:
    level: 1
    code: {start: 0, end: 1000}
  large:
    level: 1
    code:
      1995: {start: 1000, end: 1900}
      1998: {start: 1000, end: 2000}
""")
    val resolver = ResolverSettings(yearRange = (1350, 2100))
    val years = 1995 to 2001
    val items = Classifier.compile(meta, years, resolver = resolver)
    val rnd = new scala.util.Random(11)
    val df = (1 to 2000).map(_ => (1995 + rnd.nextInt(7), rnd.nextInt(2200).toLong))
      .toDF("Year", "Code")

    val joined = Classifier.addClassification(df, items,
      Classifier.Settings(levels = Seq(1)))
      .select("Year", "Code", "item_key_1")
    val expr = df.select(col("Year"), col("Code"),
      Classifier.levelExpr(items, 1, col("Year"), col("Code")).as("item_key_1"))

    assert(expr.exceptAll(joined).count() == 0)
    assert(joined.exceptAll(expr).count() == 0)
  }
}
