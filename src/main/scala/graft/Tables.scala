package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md /
  * FIXTURES.md). Every query receives the scale-factor directory and reads
  * only what it needs — column pruning and filter pushdown then reach the
  * parquet scan via Catalyst.
  */
object Tables {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, dir: String): DataFrame    = t(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame    = t(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame  = t(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame  = t(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame      = t(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame    = t(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame  = t(s, dir, "lineitem")
  /** events.parquet's physical ts type has varied across fixture
    * generations: INT64 TIMESTAMP(NANOS) (rejected by Spark's vectorized
    * reader unless read as raw longs) and plain timestamp[us] (surfacing as
    * TIMESTAMP_NTZ under Spark 4's NTZ inference). Mirror the reference's
    * read-what-the-table-serves behavior (HiveSourceProvider.scala:46-58) by
    * dispatching on the type the scan actually reports and normalizing to a
    * session-zone TimestampType — the ms grain every query compares at is
    * identical in all branches under the UTC session.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // nanos-as-long fixtures: floor to micros and rebuild a timestamp
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // timestamp[us] fixtures: NTZ wall-clock == instant under UTC session
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ =>
        raw
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame = t(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = t(s, dir, "embeddings")
}

/** Determinism helpers so Spark results hash-match the DuckDB oracle
  * (FIXTURES.md "Determinism rules"): exact decimal sums surfaced as doubles,
  * bounded rounding for float aggregates, epoch-millis instead of raw
  * timestamps (the fixtures carry nanosecond timestamps; both engines floor
  * identically to milliseconds).
  */
object Norm {
  /** Exact money sum: decimal accumulation (associative, order-independent),
    * surfaced as double. Matches CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE).
    */
  def dsum2(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** Same with 4 fractional digits for derived money expressions. */
  def dsum4(c: Column): Column = sum(c.cast("decimal(18,4)")).cast("double")

  /** Round a double to 4 places — hides sub-ulp cross-engine FP noise.
    *
    * Expressed as round(x*10^4)/10^4 rather than round(x, 4): Spark's
    * round(double, d) rounds the SHORTEST decimal rendering (BigDecimal
    * .valueOf), while DuckDB multiplies the binary value by 10^d and rounds.
    * For doubles sitting an ulp below a .5 boundary (e.g. 343/800 =
    * 0.42874999…, shortest repr "0.42875") the two disagree by a full final
    * digit. Multiplying first makes both engines round the identical double
    * at scale 0, where HALF_UP and round-half-away-from-zero coincide.
    */
  def r4(c: Column): Column = round(c * 10000) / 10000

  def r2(c: Column): Column = round(c * 100) / 100

  /** Timestamp → epoch milliseconds (bigint); identical floor in DuckDB via
    * epoch_ms(ts). Avoids all timezone / render-format divergence.
    */
  def ms(c: Column): Column = unix_millis(c)

  /** Total order over `cols` for the deterministic cross-engine dump,
    * expressed as explicit repartitionByRange + sortWithinPartitions
    * rather than orderBy: orderBy's ENSURE_REQUIREMENTS range exchange is
    * AQE-partition-coalesced whenever the result sits under the 64 MB
    * advisory size — i.e. for every fixture-scale dump — which collapses
    * the final sort into ONE task (measured 1.03 s vs 0.67 s on
    * q_scan_project, and the r12 scan/math/from_json perf regressions). A
    * REPARTITION_BY_NUM shuffle is exempt from coalescing, so the sort
    * stays parallel at every scale; range partitioning over the full sort
    * key makes partition-index concatenation a total order — the same
    * contract orderBy gives, which Verify's coalesce(1) dump relies on.
    */
  def totalOrder(df: org.apache.spark.sql.DataFrame, cols: String*)
      : org.apache.spark.sql.DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartitionByRange(n, cols.map(col): _*)
      .sortWithinPartitions(cols.head, cols.tail: _*)
  }
}
