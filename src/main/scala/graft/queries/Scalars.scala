package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Extended scalar-function surface beyond the reference's §2.8 set — the
  * string / date / null-handling functions a complete engine carries.
  * Regex patterns stay within the Java-regex ∩ RE2 common subset
  * (character classes, no backrefs) so both engines agree.
  */
object Scalars {
  import Tables._
  import Det._
  type Q = (SparkSession, String) => DataFrame

  /** String functions over part names: case, trim/pad, substring, search,
    * replace, regex strip, reverse, repeat-free concat. */
  val stringFuncs: Q = (spark, dir) =>
    part(spark, dir)
      .select(
        col("p_partkey"),
        col("p_name"),
        upper(col("p_name")).as("upper_name"),
        lower(col("p_brand")).as("lower_brand"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_name"), 1, 5).as("prefix5"),
        expr("instr(p_name, 'a')").cast("long").as("first_a"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("no_vowels"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        reverse(col("p_type")).as("rev_type"),
        lpad(col("p_brand"), 12, "_").as("padded_brand"),
        trim(lit(" x "), lit(" ")).as("trimmed"),
        expr("replace(p_type, ' ', '-')").as("dashed_type"),
        expr("left(p_name, 3)").as("left3"),
        expr("right(p_name, 3)").as("right3"),
        split(col("p_name"), " ").getItem(0).as("tok0"),
        // serialized: the driver's pandas row-sort can't hash raw arrays,
        // so the array op is verified through its csv projection.
        array_join(expr("regexp_extract_all(p_name, '[a-z]+', 0)"), ",")
          .as("all_words_csv")
      )
      .orderBy(col("p_partkey"))

  val stringFuncsSql: String =
    """SELECT p_partkey, p_name,
      |  upper(p_name) AS upper_name,
      |  lower(p_brand) AS lower_brand,
      |  CAST(length(p_name) AS BIGINT) AS name_len,
      |  substr(p_name, 1, 5) AS prefix5,
      |  CAST(instr(p_name, 'a') AS BIGINT) AS first_a,
      |  regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels,
      |  regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
      |  reverse(p_type) AS rev_type,
      |  lpad(p_brand, 12, '_') AS padded_brand,
      |  trim(' x ', ' ') AS trimmed,
      |  replace(p_type, ' ', '-') AS dashed_type,
      |  left(p_name, 3) AS left3,
      |  right(p_name, 3) AS right3,
      |  string_split(p_name, ' ')[1] AS tok0,
      |  array_to_string(regexp_extract_all(p_name, '[a-z]+'), ',') AS all_words_csv
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Date/time functions over orders: truncation, month arithmetic,
    * boundary days, field extraction, ISO week. */
  val dateFuncs: Q = (spark, dir) =>
    orders(spark, dir)
      .select(
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("d"),
        // cast: Spark date_trunc returns TIMESTAMP, DuckDB returns DATE
        // for day-or-coarser granularities — align on DATE.
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        add_months(to_date(col("o_orderdate")), 3).as("plus3m"),
        last_day(col("o_orderdate")).as("month_end"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        weekofyear(col("o_orderdate")).cast("long").as("iso_week"),
        date_add(to_date(col("o_orderdate")), 30).as("plus30d"),
        expr("date_sub(to_date(o_orderdate), 7)").as("minus7d")
      )
      .orderBy(col("o_orderkey"))

  val dateFuncsSql: String =
    """SELECT o_orderkey,
      |  CAST(o_orderdate AS DATE) AS d,
      |  date_trunc('month', o_orderdate) AS month_start,
      |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
      |  CAST(last_day(o_orderdate) AS DATE) AS month_end,
      |  CAST(year(o_orderdate) AS BIGINT) AS y,
      |  CAST(month(o_orderdate) AS BIGINT) AS m,
      |  CAST(day(o_orderdate) AS BIGINT) AS dom,
      |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
      |  CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
      |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS plus30d,
      |  CAST(CAST(o_orderdate AS DATE) - INTERVAL 7 DAY AS DATE) AS minus7d
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Null-handling + safe math: coalesce/nullif chains, null-aware
    * comparison, and the exactly-rounded math subset (sqrt is
    * correctly-rounded IEEE; transcendentals are deliberately excluded —
    * libm implementations differ in the last ulp across engines).
    */
  val nullMathFuncs: Q = (spark, dir) =>
    customer(spark, dir)
      .select(
        col("c_custkey"),
        coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")), lit("(machinery)")).as("seg_or_tag"),
        when(col("c_acctbal") < 0, lit(null).cast("double")).otherwise(col("c_acctbal"))
          .as("nonneg_bal"),
        coalesce(when(col("c_acctbal") < 0, lit(null).cast("double")).otherwise(col("c_acctbal")),
          lit(0.0)).as("bal_or_zero"),
        (col("c_acctbal") <=> lit(null).cast("double")).as("null_safe_eq_null"),
        abs(col("c_acctbal")).as("abs_bal"),
        ceil(col("c_acctbal")).cast("long").as("ceil_bal"),
        floor(col("c_acctbal")).cast("long").as("floor_bal"),
        signum(col("c_acctbal")).cast("long").as("sign_bal"),
        (col("c_custkey") % 7).cast("long").as("mod7"),
        r6(sqrt(abs(col("c_acctbal")))).as("sqrt_abs"),
        r6(col("c_acctbal") * col("c_acctbal")).as("bal_sq"),
        greatest(col("c_acctbal"), lit(0.0)).as("clamped_low"),
        least(col("c_acctbal"), lit(5000.0)).as("clamped_high")
      )
      .orderBy(col("c_custkey"))

  val nullMathFuncsSql: String =
    s"""SELECT c_custkey,
       |  coalesce(nullif(c_mktsegment, 'MACHINERY'), '(machinery)') AS seg_or_tag,
       |  CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS nonneg_bal,
       |  coalesce(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS bal_or_zero,
       |  c_acctbal IS NOT DISTINCT FROM NULL AS null_safe_eq_null,
       |  abs(c_acctbal) AS abs_bal,
       |  CAST(ceil(c_acctbal) AS BIGINT) AS ceil_bal,
       |  CAST(floor(c_acctbal) AS BIGINT) AS floor_bal,
       |  CAST(sign(c_acctbal) AS BIGINT) AS sign_bal,
       |  c_custkey % 7 AS mod7,
       |  ${sqlR6("sqrt(abs(c_acctbal))")} AS sqrt_abs,
       |  ${sqlR6("c_acctbal * c_acctbal")} AS bal_sq,
       |  greatest(c_acctbal, 0.0) AS clamped_low,
       |  least(c_acctbal, 5000.0) AS clamped_high
       |FROM customer ORDER BY c_custkey""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_string_funcs" -> stringFuncs,
    "q_date_funcs" -> dateFuncs,
    "q_null_math_funcs" -> nullMathFuncs
  )

  val oracles: Map[String, String] = Map(
    "q_string_funcs" -> stringFuncsSql,
    "q_date_funcs" -> dateFuncsSql,
    "q_null_math_funcs" -> nullMathFuncsSql
  )
}
