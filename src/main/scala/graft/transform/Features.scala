package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Derived-column projection blocks (SURVEY.md §2.8 M4; reference:
  * house_predict.py:150-178 script block, Sol_2.ipynb cell 4 notebook
  * block). A block is data — a list of (name, expression) — applied in one
  * `withColumns` projection: pure Catalyst, codegen'd, zero shuffles.
  */
object Features {

  def derive(df: DataFrame, block: Seq[(String, Column)]): DataFrame =
    df.withColumns(block.toMap)

  /** Guarded ratio a/(b+1) — reference F2 (never divides by zero). */
  def ratio1(a: Column, b: Column): Column = a / (b + lit(1))

  /** The 7-feature script block (house_predict.py:150-178) for the house
    * schema; `referenceYear` parameterized per SURVEY §7.4.6 (2025 in the
    * script, 2024 in the notebook — never hard-code).
    */
  def houseScriptBlock(referenceYear: Int): Seq[(String, Column)] = Seq(
    "affordability_ratio" -> ratio1(col("customer_salary"), col("price")),
    "loan_to_value" -> ratio1(col("loan_amount"), col("price")),
    "property_age" -> (lit(referenceYear) - col("constructed_year")),
    "payment_capacity" -> (col("customer_salary") - col("monthly_expenses")),
    "down_payment_ratio" -> ratio1(col("down_payment"), col("price")),
    "risk_score" ->
      (col("crime_cases_reported") + col("legal_cases_on_property")),
    "quality_score" -> (col("satisfaction_score") +
      col("neighbourhood_rating") + col("connectivity_score")))

  /** Fixed-edge labeled cut (Sol_2.ipynb cell 4 `property_age_category`:
    * pd.cut(age, [0,10,25,50,100], labels=[New, Recent, Old, Very_Old])).
    * Right-closed intervals; outside -> null (pandas NaN). pandas' default
    * is include_lowest=False, so the first interval is LEFT-OPEN: a value
    * equal to edges.head (age 0, i.e. constructed_year == referenceYear)
    * is null in the reference — `includeLowest = false` matches that.
    */
  def labeledCut(
      c: Column, edges: Seq[Double], labels: Seq[String],
      includeLowest: Boolean = false): Column = {
    require(labels.length == edges.length - 1)
    val lowGuard =
      if (includeLowest) c < lit(edges.head) else c <= lit(edges.head)
    val base = when(c.isNull || lowGuard || c > lit(edges.last),
      lit(null).cast("string"))
    val chained = edges.tail.init.zipWithIndex.foldLeft(base) {
      case (acc, (e, i)) => acc.when(c <= lit(e), lit(labels(i)))
    }
    chained.otherwise(lit(labels.last))
  }

  /** Notebook additions (Sol_2.ipynb cell 4, JSON L335) — 12 features
    * total; the weighted property_quality_score uses the published
    * 0.3/0.3/0.2/0.1/0.1 weights.
    */
  def houseNotebookBlock(referenceYear: Int): Seq[(String, Column)] =
    houseScriptBlock(referenceYear) ++ Seq(
      "property_age_category" -> labeledCut(
        lit(referenceYear) - col("constructed_year"),
        Seq(0, 10, 25, 50, 100),
        Seq("New", "Recent", "Old", "Very_Old")),
      "price_to_salary_ratio" -> ratio1(col("price"), col("customer_salary")),
      "loan_to_price_ratio" -> ratio1(col("loan_amount"), col("price")),
      "affordability_score" ->
        ratio1(col("customer_salary") - col("monthly_expenses"), col("price")),
      "price_per_sqft" -> ratio1(col("price"), col("property_size_sqft")),
      "rooms_per_sqft" -> ratio1(col("rooms"), col("property_size_sqft")),
      "expense_ratio" -> ratio1(col("monthly_expenses"), col("customer_salary")),
      "loan_tenure_risk" ->
        (col("loan_tenure_years") * col("emi_to_income_ratio")),
      "property_quality_score" -> (col("satisfaction_score") * 0.3 +
        col("neighbourhood_rating") * 0.3 + col("connectivity_score") * 0.2 +
        (lit(1) - col("crime_cases_reported") / 10) * 0.1 +
        (lit(1) - col("legal_cases_on_property") / 10) * 0.1),
      "total_risk_score" -> (col("crime_cases_reported") +
        col("legal_cases_on_property") + col("previous_owners") * 0.5))
}
