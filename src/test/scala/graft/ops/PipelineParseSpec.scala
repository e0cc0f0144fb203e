package graft.ops

import graft.meta._
import org.scalatest.funsuite.AnyFunSuite

/** The pipeline compiler against the exact instruction shapes that occur
  * in the reference's schema.yaml (verbatim strings).
  */
class PipelineParseSpec extends AnyFunSuite {

  test("every apply_pandas_function string used by the reference parses") {
    val gb1 = Pipeline.parsePandasFunction(
      ".groupby([\"Year\", \"ID\"], as_index=False) [[\"Gross_Expenditure\", \"Net_Expenditure\"]].sum()\n")
    assert(gb1 == Pipeline.GroupBySum(Seq("Year", "ID"),
      Some(Seq("Gross_Expenditure", "Net_Expenditure"))))

    val gb2 = Pipeline.parsePandasFunction(
      ".groupby([\"Year\", \"ID\", \"Income_Type\"], as_index=False).sum()\n")
    assert(gb2 == Pipeline.GroupBySum(Seq("Year", "ID", "Income_Type"), None))

    val gb3 = Pipeline.parsePandasFunction(
      ".groupby([\"Year\", \"ID\"], as_index=False).sum(numeric_only=True)\n")
    assert(gb3 == Pipeline.GroupBySum(Seq("Year", "ID"), None))

    val gb4 = Pipeline.parsePandasFunction(
      ".groupby(\n  [\"Year\", \"ID\", \"Member_Number\", \"Income_Type\"],\n  as_index=False,\n  observed=True\n) .sum()\n")
    assert(gb4 == Pipeline.GroupBySum(
      Seq("Year", "ID", "Member_Number", "Income_Type"), None))

    val melt = Pipeline.parsePandasFunction(
      ".drop(columns=['Table_Name']) .set_index(['Year', 'ID', 'Member_Number']) .stack() .to_frame() .reset_index() .set_axis(['Year', 'ID', 'Member_Number', 'Type', 'Value'], axis='columns')\n")
    assert(melt == Pipeline.Melt(Seq("Table_Name"),
      Seq("Year", "ID", "Member_Number"), "Type", "Value"))
  }

  test("year-versioned instruction wrappers resolve to step-or-skip") {
    // `- create_column: {1363: {...}, 1369: null}` resolved per year
    val doc = Meta.fromYaml("""
instructions:
  - create_column:
      1363: {name: Price, type: numerical, expression: "Expenditure / Amount"}
      1369: null
  - create_column:
      name: Amount
      type: numerical
      versions:
        1363: {expression: Kilos}
        1383: {expression: Kilos + 0.001 * Grams}
""")
    def stepsAt(year: Int) = Pipeline.compile(
      new VersionResolver(doc, year).getVersion.apply("instructions"))
    val at1365 = stepsAt(1365)
    assert(at1365.exists {
      case Pipeline.CreateColNumeric("Price", Right(e)) => e.contains("Amount")
      case _ => false
    })
    assert(at1365.exists {
      case Pipeline.CreateColNumeric("Amount", Right("Kilos")) => true
      case _ => false
    })
    val at1390 = stepsAt(1390)
    // Price instruction nulled from 1369 -> skipped
    assert(!at1390.exists {
      case Pipeline.CreateColNumeric("Price", _) => true
      case _ => false
    })
    assert(at1390.exists {
      case Pipeline.CreateColNumeric("Amount", Right(e)) => e.contains("Grams")
      case _ => false
    })
  }

  test("string-only and no-input instructions") {
    assert(Pipeline.compile(Meta.fromYaml("[add_year, add_table_name, add_weights]"))
      == Vector(Pipeline.AddYear, Pipeline.AddTableName, Pipeline.AddWeights))
  }

}
