package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Norm, Tables}

/** Scalar function surface (SURVEY.md §2.C q_str_funcs, q_date_funcs,
  * q_math_funcs, q_array_map_funcs, q_to_json, q_from_json). All built-in
  * Catalyst expressions — fully codegen'd, no UDFs (north-star scale rule:
  * "Functions, not UDFs").
  */
object Scalars {

  /** substr/upper/lower/trim/concat/split/regexp_extract/like over part +
    * customer names.
    */
  def strFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("name_upper"),
        lower(col("c_mktsegment")).as("seg_lower"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        trim(concat(lit("  "), col("c_mktsegment"), lit(" "))).as("seg_trim"),
        concat_ws("-", col("c_mktsegment"), col("c_custkey")).as("seg_key"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("name_digits"),
        element_at(split(col("c_name"), "#"), 1).as("name_stem"),
        col("c_name").like("%1%").as("has_one"),
        length(col("c_name")).as("name_len"))
      .orderBy("c_custkey")

  /** year/month/day/quarter/date_trunc/datediff/add_months on order dates.
    * date_trunc surfaces as epoch ms; add_months as a yyyy-MM-dd string
    * (date-level, timezone-free under the UTC session).
    */
  def dateFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        dayofmonth(col("o_orderdate")).as("o_day"),
        quarter(col("o_orderdate")).as("o_quarter"),
        Norm.ms(date_trunc("month", col("o_orderdate"))).as("month_start_ms"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
          .as("days_to_2002"),
        date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd")
          .as("plus3m"))
      .orderBy("o_orderkey")

  /** round/abs/ceil/floor/power/ln/sqrt/mod — money math kept decimal-exact,
    * transcendentals rounded to kill cross-libm ulp drift.
    */
  def mathFuncs(s: SparkSession, dir: String): DataFrame =
    // dump order BEFORE the math (same round-13 shape as q_from_json):
    // sorting the derived rows makes the range-sampling pass evaluate all
    // eight expressions and ships them through the shuffle; sorting the
    // two raw columns first evaluates each expression exactly once,
    // post-shuffle, and Norm.totalOrder keeps the sort parallel under AQE.
    Norm.totalOrder(
      Tables.orders(s, dir).select(col("o_orderkey"), col("o_totalprice")),
      "o_orderkey")
      .select(
        col("o_orderkey"),
        Norm.r2(col("o_totalprice")).as("price_r1"),
        abs(col("o_totalprice") - 100000.0).as("abs_diff"),
        ceil(col("o_totalprice")).as("price_ceil"),
        floor(col("o_totalprice")).as("price_floor"),
        (col("o_totalprice") * col("o_totalprice")).as("price_sq"),
        Norm.r4(ln(col("o_totalprice"))).as("price_ln"),
        Norm.r4(sqrt(col("o_totalprice"))).as("price_sqrt"),
        pmod(col("o_orderkey"), lit(97L)).as("key_mod"))

  /** Higher-order array functions over the 64-dim embedding vectors:
    * size/slice/transform/aggregate (fold) — the dot-product building blocks
    * for q_sim_cosine, all codegen-free but whole-row (no explode, no
    * shuffle).
    */
  def arrayFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        Norm.r4(aggregate(slice(col("embedding"), 1, 4),
          lit(0.0), (acc, x) => acc + x.cast("double"))).as("head4_sum"),
        Norm.r4(sqrt(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double"))))
          .as("l2_norm"),
        Norm.r4(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + abs(x.cast("double")))).as("l1_norm"),
        Norm.r4(array_max(transform(col("embedding"),
          x => abs(x.cast("double"))))).as("linf_norm"))
      .orderBy("vec_id")

  /** Row → JSON document encoding — the reference sink's core transform
    * (HiveStreamDataWriter.scala:96-100 re-encodes every row as JSON before
    * the Hive write). Catalyst StructsToJson replaces json4s reflection.
    * Int/string columns only: their JSON rendering is byte-identical across
    * engines.
    */
  def toJson(s: SparkSession, dir: String): DataFrame =
    // sort BEFORE the encode (the q_from_json lesson, r19): ordering by
    // the computed `doc` makes the range-exchange sampling pass AND the
    // shuffle map side both evaluate to_json, and the encoded strings
    // ride the wire. Sorting the raw 4-column projection ships parquet
    // columns and encodes once, post-shuffle. Order-equivalent: doc is a
    // function of the 4 sort columns with fixed field structure, so
    // lexicographic doc order within (l_orderkey, l_linenumber) ties IS
    // (l_returnflag, l_linestatus) order — the dump stays deterministic
    // and byte-identical to the previous output.
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag"), col("l_linestatus"))
      .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
      .select(col("l_orderkey"), col("l_linenumber"),
        to_json(struct(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("l_linestatus"))).as("doc"))

  /** JSON field extraction from events.props (the inverse of the sink's A6
    * encode): props is a JSON object like {"k": 87}. `from_json` with an
    * explicit one-field schema parses each document exactly once into a
    * typed struct (prunable, no per-path re-parse the way repeated
    * `get_json_object` calls would).
    */
  def fromJson(s: SparkSession, dir: String): DataFrame =
    // dump order BEFORE the parse: ordering the parsed rows instead makes
    // the range-exchange sampling pass AND the shuffle map side both
    // evaluate from_json, so every document parsed ~twice and the parsed
    // structs rode the wire. Sorting the raw (event_id, props) projection
    // samples only cheap parquet columns and parses each document exactly
    // once, post-shuffle (projection preserves intra-partition order).
    // Interleaved A/B at sf0.1, round 13: 0.95 s -> 0.27 s median of 3×3.
    Norm.totalOrder(
      Tables.events(s, dir).select(col("event_id"), col("props")),
      "event_id")
      .select(col("event_id"),
        from_json(col("props"), "k INT", Map.empty[String, String])
          .getField("k").as("k"))
      .withColumn("k_bucket", col("k") % 10)
}
