package graft.engine

import graft.meta._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared HBSIR-shaped synthetic fixtures (FIXTURES.md §2) used by the
  * engine and API specs.
  */
object HbsFixtures {

  val tablesYaml: String = """
food:
  settings: {missings: error}
  columns:
    ADDRESS: {new_name: ID, type: unsigned}
    CODE: {new_name: Code, type: unsigned}
    EXPENDITURE: {new_name: Expenditure, type: float}
durable:
  columns:
    ADDRESS: {new_name: ID, type: unsigned}
    CODE: {new_name: Code, type: unsigned}
    EXPENDITURE: {new_name: Expenditure, type: float}
household_information:
  columns:
    ADDRESS: {new_name: ID, type: unsigned}
    WEIGHT: {new_name: Weight, type: unsigned}
members_properties:
  columns:
    ADDRESS: {new_name: ID, type: unsigned}
    MEMBER: {new_name: Member_Number, type: unsigned}
    AGE: {new_name: Age, type: unsigned}
"""

  val schemaYaml: String = """
food:
  instructions:
    - add_year
    - add_table_name
    - create_column: {name: Duration, type: numerical, expression: 30}
durable:
  instructions:
    - add_year
    - add_table_name
    - create_column: {name: Duration, type: numerical, expression: 360}
household_information:
  instructions:
    - add_year
members_properties:
  instructions:
    - add_year
Original_Expenditures:
  table_list: [food, durable]
  instructions:
    - create_column: {name: Gross_Expenditure, type: numerical, expression: "Expenditure / Duration * 360"}
Expenditures:
  table_list: Original_Expenditures
  cache_result: true
Total_Expenditure:
  table_list: Expenditures
  instructions:
    - apply_pandas_function: 'table.groupby(["Year", "ID"])[["Gross_Expenditure"]].sum().reset_index()'
Number_of_Members:
  table_list: members_properties
  instructions:
    - apply_external_function: schema_functions.number_of_members
Equivalence_Scale:
  table_list: Number_of_Members
  instructions:
    - apply_external_function: schema_functions.equivalence_scale
"""

  val commoditiesYaml: String = """
Food_NonFood:
  defaults:
    levels: [1]
    column_names: [Food_NonFood]
    missing_value_replacements: {Food_NonFood: NonFood}
  items:
    Food:
      level: 1
      code: {start: 11000, end: 20000}
    NonFood:
      level: 1
"""

  val householdYaml: String = """
ID_Length: 8
Urban_Rural:
  code:
    position: {start: 0, end: 1}
  name: {1: Urban, 2: Rural}
Province:
  code:
    position: {start: 1, end: 3}
  name: {23: Tehran, 11: Gilan}
"""

  // household IDs: digit0 urban(1)/rural(2); digits1-3 province
  val U1 = 12300001L; val U2 = 12300002L
  val R1 = 21100001L; val R2 = 21100002L

  def raw(spark: SparkSession)(name: String): Option[DataFrame] = {
    import spark.implicits._
    name match {
      case "food" => Some(Seq(
        (U1, 11100L, 300.0), (U1, 21000L, 100.0),
        (U2, 11200L, 600.0),
        (R1, 12000L, 150.0),
      ).toDF("ADDRESS", "CODE", "EXPENDITURE"))
      case "durable" => Some(Seq(
        (U2, 31000L, 720.0),
        (R2, 32000L, 360.0),
      ).toDF("ADDRESS", "CODE", "EXPENDITURE"))
      case "household_information" => Some(Seq(
        (U1, 2L), (U2, 3L), (R1, 4L), (R2, 1L),
      ).toDF("ADDRESS", "WEIGHT"))
      case "members_properties" => Some(Seq(
        (U1, 1L, 30L), (U1, 2L, 10L),
        (U2, 1L, 40L),
        (R1, 1L, 50L), (R1, 2L, 16L), (R1, 3L, 2L),
        (R2, 1L, 60L),
      ).toDF("ADDRESS", "MEMBER", "AGE"))
      case _ => None
    }
  }

  def repo(spark: SparkSession, cacheDir: Option[String] = None,
           config: Option[RepoConfig] = None): TableRepo = {
    require(config.isEmpty || cacheDir.isEmpty,
      "pass cacheDir inside the explicit config — a config overrides ALL of RepoConfig")
    new TableRepo(
      spark,
      tablesMeta = Meta.fromYaml(tablesYaml),
      schemaMeta = Meta.fromYaml(schemaYaml),
      rawReader = (n, _) => raw(spark)(n),
      classifications = Map("Food_NonFood" -> Meta.fromYaml(commoditiesYaml)("Food_NonFood")),
      householdMeta = Meta.fromYaml(householdYaml),
      config = config.getOrElse(RepoConfig(cacheDir = cacheDir)),
    )
  }
}
