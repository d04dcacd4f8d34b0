package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Norm, Tables}

/** Event-time operators (SURVEY.md §2.C q_stream_*, q_join_range,
  * q_join_asof, q_partition_route). Batch-checkable analogues of the
  * streaming semantics; the streaming forms (withWatermark + window /
  * session_window over MemoryStream) are exercised in the ScalaTest streaming
  * suite where no SQL oracle can run.
  *
  * All comparisons use epoch milliseconds: the fixture timestamps are
  * nanosecond-precision and Spark (µs) and DuckDB (ns) floor identically to
  * ms, so ms arithmetic is the cross-engine-stable grain.
  */
object TimeOps {

  /** Tumbling 1-hour window aggregate via the streaming-compatible window()
    * function (same expression works under readStream+watermark).
    */
  def tumbling(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      // decimal accumulation: double SUM order differs between engines'
      // partial aggregates; values carry exactly 2 decimals so the decimal
      // sum is exact and order-independent
      .agg(count(lit(1)).as("cnt"), Norm.dsum2(col("value")).as("sum_value"))
      .select(Norm.ms(col("w.start")).as("window_start_ms"), col("event_type"),
        col("cnt"), col("sum_value"))
      .orderBy("window_start_ms", "event_type")

  /** Sliding window (1 h length, 30 min slide): each event lands in 2
    * windows; window() expands in place (no self-join).
    */
  def sliding(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(Norm.ms(col("w.start")).as("window_start_ms"), col("cnt"))
      .orderBy("window_start_ms")

  /** Active-user report under SLIDING windows (1 h window, 30 min slide):
    * distinct users + event volume per window — the DAU/engagement
    * composite, distinct aggregation under overlapping event-time
    * windows. `window()` expands each event into its ≤2 covering windows
    * in place (a Generate, no self-join); the distinct rides Spark's
    * partial-dedup aggregate, so the shuffle carries (window, user)
    * partials — bounded by per-window distinct users per task, not event
    * volume.
    */
  def dau(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(countDistinct(col("user_id")).as("active_users"),
        count(lit(1)).as("events"))
      .select(Norm.ms(col("w.start")).as("window_start_ms"),
        col("active_users"), col("events"))
      .orderBy("window_start_ms")

  /** Session windows per user, 30-minute gap — batch analogue via
    * lag + cumulative sum of session-break flags; matches streaming
    * session_window gap semantics (gap measured event-to-event; a gap of
    * EXACTLY the threshold merges in both formulations — streaming merges
    * sessions whose intervals touch, this breaks only on `> gap`;
    * parity is pinned by the StreamingSurfaceSpec batch↔stream case).
    */
  def session(s: SparkSession, dir: String): DataFrame =
    sessionOn(Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("value"),
        Norm.ms(col("ts")).as("ts_ms")))

  /** [[session]] over an arbitrary (event_id, user_id, value, ts_ms)
    * frame — event_id is the deterministic equal-timestamp tiebreak.
    */
  def sessionOn(events: DataFrame,
      gapMs: Long = 30L * 60 * 1000): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts_ms").asc, col("event_id").asc)
    events
      .withColumn("new_session",
        when(col("ts_ms") - lag("ts_ms", 1).over(byUser) > gapMs, 1)
          .when(lag("ts_ms", 1).over(byUser).isNull, 1).otherwise(0))
      .withColumn("session_id",
        sum("new_session").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("ts_ms").as("session_start_ms"),
        max("ts_ms").as("session_end_ms"),
        Norm.dsum2(col("value")).as("sum_value"))
      .orderBy("user_id", "session_id")
  }

  /** Per-user inactivity gaps: lag each user's event stream, measure the
    * millisecond gap to the previous event, and roll up count/max/mean
    * plus the number of long (> longGapMs) silences — the
    * activity-continuity profile behind churn flags and session-gap
    * tuning. ONE user-keyed exchange serves both the lag window and the
    * rollup: the aggregate keys on the window's own partition column,
    * so Catalyst reuses the sort-partitioning instead of re-shuffling.
    * avg stays exact cross-engine: it divides an exact integer
    * millisecond sum by an exact count on both sides.
    */
  def eventGaps(s: SparkSession, dir: String): DataFrame =
    eventGapsOn(Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), Norm.ms(col("ts")).as("ts_ms")))

  /** [[eventGaps]] over an arbitrary (event_id, user_id, ts_ms) frame —
    * event_id is the deterministic equal-timestamp tiebreak.
    */
  def eventGapsOn(events: DataFrame,
      longGapMs: Long = 6L * 3600 * 1000): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts_ms").asc, col("event_id").asc)
    events
      .withColumn("gap_ms", col("ts_ms") - lag("ts_ms", 1).over(byUser))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        count(col("gap_ms")).as("n_gaps"),
        sum(when(col("gap_ms") > longGapMs, 1L).otherwise(0L)).as("long_gaps"),
        max(col("gap_ms")).as("max_gap_ms"),
        Norm.r4(avg(col("gap_ms"))).as("avg_gap_ms"))
      .orderBy("user_id")
  }

  /** Bounded range join: pairs of events by the same user within 5 minutes
    * (strictly later). The user_id equi-key makes this a hash/sort-merge
    * join with a residual range predicate — NOT a cartesian product, so it
    * scales with per-user density, not |events|².
    */
  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), Norm.ms(col("ts")).as("ts_ms"))
    val a = e.select(col("event_id").as("a_id"), col("user_id"),
      col("ts_ms").as("a_ms"))
    val b = e.select(col("event_id").as("b_id"),
      col("user_id").as("b_user"), col("ts_ms").as("b_ms"))
    a.join(b,
        col("user_id") === col("b_user") &&
        col("b_ms") > col("a_ms") &&
        col("b_ms") <= col("a_ms") + (5L * 60 * 1000))
      .groupBy("user_id")
      .agg(count(lit(1)).as("pair_cnt"))
      .orderBy("user_id")
  }

  /** As-of join: for each purchase event, the latest click by the same user
    * at-or-before the purchase (deterministic max-click-id tiebreak at
    * equal timestamps).
    *
    * Single ordered pass with carry-forward — the scalable as-of
    * formulation (what time-series engines execute): union both sides
    * into one per-user timeline and carry the most recent click along via
    * `last(..., ignoreNulls)` over an unbounded-preceding row frame. ONE
    * shuffle on user_id, per-user work linear in events. The join+window
    * formulation it replaces (equi-join on user + `c_ms <= p_ms`, then
    * row_number per purchase) materializes |purchases|×|clicks| rows per
    * user before discarding all but one per purchase — quadratic in
    * per-user activity, the classic hot-user blowup at 100 TB. Results are
    * identical: clicks sort BEFORE purchases at equal timestamps (a click
    * AT the purchase instant is eligible), and ascending id order makes
    * `last` pick the max click id at the max eligible timestamp, matching
    * the old (c_ms DESC, c_id DESC) row_number tiebreak.
    */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        Norm.ms(col("ts")).as("ts_ms"))
      .filter(col("event_type").isin("purchase", "click"))
    val kind = when(col("event_type") === "click", 0).otherwise(1)
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_ms").asc, kind.asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val clickId = when(col("event_type") === "click", col("event_id"))
    val clickMs = when(col("event_type") === "click", col("ts_ms"))
    ev
      .withColumn("c_id", last(clickId, ignoreNulls = true).over(w))
      .withColumn("c_ms", last(clickMs, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("c_id").isNotNull)
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts_ms").as("p_ms"), col("c_id"), col("c_ms"))
      .orderBy("p_id")
  }

  /** Nearest-direction as-of fixture (registry `q_join_asof_nearest`):
    * for each purchase, the click CLOSEST in time either way —
    * equidistant ties backward, same-instant matches counting as
    * backward — through the generic [[asofJoinOn]] surface, so the
    * oracle pins the direction machinery itself (the backward fixture
    * `q_join_asof` pins the carry).
    */
  def asofNearest(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        Norm.ms(col("ts")).as("ts_ms"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts_ms").as("p_ms"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("c_id"),
        col("ts_ms").as("c_ms"))
    asofJoinOn(purchases, clicks, Seq("user_id"), "p_ms", "c_ms",
        rightOrder = Seq("c_id"), direction = "nearest")
      .filter(col("c_id").isNotNull)
      .select(col("p_id"), col("user_id"), col("p_ms"), col("c_id"),
        col("c_ms"))
      .orderBy("p_id")
  }

  /** General as-of join over ARBITRARY frames — [[asofJoin]]'s linear
    * carry-forward formulation factored out as reusable library surface.
    * For each left row, attaches the latest right row with the same `on`
    * keys whose `rightTime` ≤ the left row's `leftTime` (a right row AT
    * the left instant is eligible). LEFT-OUTER: unmatched left rows keep
    * null right fields — callers filter if they want inner semantics.
    *
    * Same scalability contract the oracled q_join_asof proved: both sides
    * union into one per-key timeline, ONE shuffle on the `on` keys, per-key
    * work linear in rows — never the |left|×|right| per-key blowup of the
    * join+window formulation.
    *
    * `rightOrder` breaks ties among right rows sharing `rightTime`
    * deterministically (the LARGEST ordering value wins under `backward`
    * — "latest row" semantics — and the SMALLEST under `forward`, the
    * mirror). `tolerance` (same units as the time columns, which must be
    * numeric when it is set) drops matches farther than `tolerance` in
    * the match direction. Right output columns keep their names (they
    * must not collide with left's) unless `rightPrefix` is given.
    *
    * `direction` (r15 — pandas `merge_asof` parity):
    *  - `backward` (default): latest right with rightTime ≤ leftTime;
    *  - `forward`: earliest right with rightTime ≥ leftTime;
    *  - `nearest`: whichever of the two is closer in absolute time,
    *    ties (equidistant, including an at-instant match) breaking
    *    BACKWARD. Runs BOTH carries over the same single exchange (two
    *    window passes, one shuffle) — still linear per key.
    */
  def asofJoinOn(
      left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String,
      tolerance: Option[Long] = None,
      rightOrder: Seq[String] = Seq.empty,
      rightPrefix: String = "",
      direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"unknown direction '$direction'; supported: backward, forward, nearest")
    val leftCols = left.columns.toSeq
    val rightPayload = right.columns.toSeq.filterNot(on.contains)
    // validate the POST-prefix output names: a prefix that still collides
    // (left "r_v" vs prefixed right "r_" + "v") would emit duplicate
    // columns and ambiguous downstream references
    val collisions =
      rightPayload.map(rightPrefix + _).toSet.intersect(leftCols.toSet)
    require(collisions.isEmpty,
      s"output column collision $collisions; pass a distinct rightPrefix")
    val lStruct = struct(leftCols.map(col): _*)
    val rStruct = struct(rightPayload.map(col): _*)
    val lType = left.select(lStruct.as("s")).schema("s").dataType
    val rType = right.select(rStruct.as("s")).schema("s").dataType
    val lNorm = left.select(on.map(col) ++ Seq(col(leftTime).as("_t"),
      lit(1).as("_kind"), lStruct.as("_lrow"),
      lit(null).cast(rType).as("_rrow")): _*)
    val rNorm = right.select(on.map(col) ++ Seq(col(rightTime).as("_t"),
      lit(0).as("_kind"), lit(null).cast(lType).as("_lrow"),
      rStruct.as("_rrow")): _*)
    // BACKWARD: rights sort BEFORE lefts at equal _t (at-instant
    // eligibility); ties among rights break on rightOrder so `last`
    // deterministically carries the greatest-ordered right row
    val wBack = Window.partitionBy(on.map(col): _*)
      .orderBy(col("_t").asc +: col("_kind").asc +:
        rightOrder.map(c => col("_rrow")(c).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // FORWARD mirror: lefts sort BEFORE rights at equal _t (so an
    // at-instant right falls inside the current-row..following frame) and
    // `first` carries the smallest-ordered right row. Same partitioning
    // as wBack — one exchange serves both; only the intra-partition sort
    // differs.
    val wFwd = Window.partitionBy(on.map(col): _*)
      .orderBy(col("_t").asc +: col("_kind").desc +:
        rightOrder.map(c => col("_rrow")(c).asc): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val timeline = lNorm.unionByName(rNorm)
    val carried = (direction match {
      case "backward" =>
        timeline.withColumn("_r", last(col("_rrow"), ignoreNulls = true).over(wBack))
      case "forward" =>
        timeline.withColumn("_r", first(col("_rrow"), ignoreNulls = true).over(wFwd))
      case "nearest" =>
        timeline
          .withColumn("_rb", last(col("_rrow"), ignoreNulls = true).over(wBack))
          .withColumn("_rf", first(col("_rrow"), ignoreNulls = true).over(wFwd))
          .withColumn("_r",
            when(col("_rb").isNull, col("_rf"))
              .when(col("_rf").isNull, col("_rb"))
              // equidistant ties (incl. an at-instant match) go backward
              .when(col("_t") - col("_rb")(rightTime) <=
                col("_rf")(rightTime) - col("_t"), col("_rb"))
              .otherwise(col("_rf")))
          .drop("_rb", "_rf")
    }).filter(col("_kind") === 1)
    val gated = tolerance match {
      case Some(tol) =>
        val dist = direction match {
          case "backward" => col("_t") - col("_r")(rightTime)
          case "forward" => col("_r")(rightTime) - col("_t")
          case "nearest" => abs(col("_t") - col("_r")(rightTime))
        }
        carried.withColumn("_r", when(dist <= tol, col("_r")))
      case None => carried
    }
    gated.select(
      leftCols.map(c => col("_lrow")(c).as(c)) ++
      rightPayload.map(c => col("_r")(c).as(rightPrefix + c)): _*)
  }

  /** The sink's per-row partition routing (reference
    * HiveStreamDataWriter.scala:74-83: rows fan out to per-partition-value
    * writers) as a batch-checkable query: rows per partition key.
    */
  def partitionRoute(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type")

  /** ORDERED event-funnel analysis: how many users reach each step of a
    * step sequence IN ORDER (each step strictly after the previous
    * step's first completion) — the classic product-analytics query, and
    * the ordered-pattern counterpart of [[asofJoin]]'s carry-forward.
    *
    * Scale shape: one chained per-step reduction. Step i's frame is
    * (user_id, tᵢ = min ts of step-i events strictly after tᵢ₋₁): a
    * filter on the step's event type, a user-keyed join against the
    * (already user-bounded) previous frame, and a min-aggregate — each
    * stage's shuffle is bounded by that step's event count, every join is
    * an equi-join on user_id, and step frames only shrink down the
    * funnel. All step counts come from ONE action (a union of the step
    * frames aggregated together); the conversion column's window runs
    * over |steps| rows — metadata at any corpus size.
    */
  /** Day-N cohort retention: users grouped by their FIRST active day
    * (epoch-day — integer day arithmetic on both engines, no date-type
    * round-trip), with day-1 and day-7 return counts and rates — the
    * standard activation/retention report.
    *
    * Scale shape: ONE user-keyed aggregate collapses each user to
    * (cohort_day, active-day set) — the set is bounded by the dataset's
    * CALENDAR span (≤ 365 entries/user-year), metadata-sized however many
    * events a user has, and the offset flags (`array_contains`) are
    * map-side on the aggregated row. The cohort rollup then sums flags
    * per cohort_day: two shuffles total (user_id, then cohort_day), no
    * Expand (the naive 3-way `countDistinct` form plans one), no join.
    */
  def retention(s: SparkSession, dir: String): DataFrame =
    retentionOn(Tables.events(s, dir)
      .select(col("user_id"), Norm.ms(col("ts")).as("ts_ms")))

  /** [[retention]] over an arbitrary (user_id, ts_ms) frame. */
  def retentionOn(events: DataFrame, offsets: Seq[Int] = Seq(1, 7)): DataFrame = {
    require(offsets.nonEmpty && offsets.forall(_ > 0),
      s"retention offsets must be positive day counts; got $offsets")
    val per = events
      .select(col("user_id"), floor(col("ts_ms") / 86400000L).as("day"))
      .groupBy("user_id")
      .agg(min(col("day")).as("cohort_day"),
        collect_set(col("day")).as("days"))
    val flags = offsets.map(o =>
      sum(array_contains(col("days"), col("cohort_day") + lit(o.toLong))
        .cast("int")).cast("bigint").as(s"d${o}_retained"))
    val rates = offsets.map(o =>
      Norm.r4(col(s"d${o}_retained") / col("n_users")).as(s"d${o}_rate"))
    per.groupBy("cohort_day")
      .agg(count(lit(1)).as("n_users"), flags: _*)
      .select(col("cohort_day") +: col("n_users") +:
        (offsets.map(o => col(s"d${o}_retained")) ++ rates): _*)
      .orderBy("cohort_day")
  }

  def funnel(s: SparkSession, dir: String): DataFrame =
    funnelOn(Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), Norm.ms(col("ts")).as("ts_ms")),
      Seq("view", "click", "purchase"))

  /** [[funnel]] over an arbitrary (user_id, event_type, ts_ms) frame. */
  def funnelOn(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min(col("ts_ms")).as("t"))
    val frames = steps.tail.scanLeft(first) { (prev, step) =>
      events.filter(col("event_type") === step)
        .join(prev.select(col("user_id"), col("t").as("t_prev")), "user_id")
        .filter(col("ts_ms") > col("t_prev"))
        .groupBy("user_id").agg(min(col("ts_ms")).as("t"))
    }
    // per-step counts are GLOBAL aggregates (one row each, 0 included),
    // not a groupBy over the union: a step nobody reaches must still
    // appear with users = 0 — a grouped count would silently drop it,
    // diverging from the oracle's per-CTE COUNT(1) on any corpus with an
    // unreachable step (caught in review; the fixture reaches all steps)
    val perStep = frames.zipWithIndex.map { case (f, i) =>
      f.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("step_n"), lit(steps(i)).as("step"),
          col("users"))
    }.reduce(_ union _)
    // conversion vs the previous step: |steps| rows — metadata-sized window
    val w = Window.partitionBy().orderBy("step_n")
    perStep
      // an unreachable step carries users = 0 BY CONTRACT (the union arm
      // above emits it), so the next step's conversion must be null, not
      // an ANSI DIVIDE_BY_ZERO that kills the query
      .withColumn("conv_from_prev",
        Norm.r4(when(lag(col("users"), 1).over(w) > 0,
          col("users") / lag(col("users"), 1).over(w))))
      .select(col("step_n"), col("step"), col("users"),
        col("conv_from_prev"))
      .orderBy("step_n")
  }
}
