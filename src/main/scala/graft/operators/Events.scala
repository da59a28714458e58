package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over a timestamped fact table: time-bucketed
  * aggregation, sessionization, as-of alignment. The reference's `events`
  * role-model is the mortar fact table (time-range + id filters) — these
  * operators extend it with the batch shapes a telemetry pipeline needs.
  *
  * Shuffle shapes: bucketed aggregation is one map-side-combinable
  * hash agg; sessionization and as-of are ONE shuffle each (partition by
  * entity, sort by time) — the window functions then run within partitions.
  */
object Events {

  /** Epoch micros of a timestamp column, NTZ-tolerant: `unix_micros`
    * rejects TIMESTAMP_NTZ outright, so cast first (a no-op for
    * TimestampType; for NTZ it reinterprets wall-clock in the session tz —
    * all graft entry points pin UTC, making it the identity relabel). */
  private def tsUs(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Time-bucketed aggregate: counts + exact decimal sums per
    * (bucket, event_type). */
  def timeBucketStats(events: DataFrame, bucket: String = "hour"): DataFrame =
    events
      .groupBy(date_trunc(bucket, col("ts")).as("bucket"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))

  /** Assign session ids per user: a new session starts after `gapSeconds`
    * of inactivity. Adds `session_id` (0-based per user). */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    events
      .withColumn("_prev_us", lag(tsUs(col("ts")), 1).over(byUser))
      .withColumn("_new_session",
        when(col("_prev_us").isNull ||
          tsUs(col("ts")) - col("_prev_us") > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("_new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)) - 1)
      .drop("_prev_us", "_new_session")
  }

  /** Per-session stats: event count, span in µs (exact integers). */
  def sessionStats(events: DataFrame, gapSeconds: Long = 1800): DataFrame =
    sessionize(events, gapSeconds)
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        (tsUs(max(col("ts"))) - tsUs(min(col("ts")))).as("duration_us"))

  /** As-of join: for each left row, the latest right row with
    * `right.ts <= left.ts` for the same key. Implemented as a UNION +
    * single window pass (one shuffle, no row explosion — scales to skewed
    * keys far better than a join + filter + re-rank). `valueCol` from the
    * right side is carried as `asof_<valueCol>`, its timestamp as
    * `asof_ts`. Ties (equal ts) take the right row (inclusive semantics,
    * matching standard ASOF joins). */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, valueCol: String): DataFrame = {
    val vType = right.schema(valueCol).dataType
    val lTagged = left.withColumn("_side", lit(1))
      .withColumn("_rv", lit(null).cast(vType))
      .withColumn("_rts", lit(null).cast("timestamp"))
    val rTagged = right.select(
      col(keyCol), col(tsCol), lit(0).as("_side"),
      col(valueCol).cast(vType).as("_rv"), col(tsCol).as("_rts"))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // right rows sort BEFORE left rows at equal ts (inclusive as-of)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn("asof_" + valueCol, last(col("_rv"), ignoreNulls = true).over(w))
      .withColumn("asof_ts", last(col("_rts"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side", "_rv", "_rts")
  }

  /** Trailing-window daily stats per event_type: each day's exact decimal
    * value total + the trailing `windowDays`-row window sum (rows, not
    * range: "the last N observed days", deterministic with or without
    * calendar gaps — and mirrored as ROWS BETWEEN in SQL).
    *
    * The window runs over the DAILY aggregate (|types|×|days| rows), not
    * raw events — the one shuffle that matters is the map-side-combinable
    * daily rollup; the window pass is negligible at any scale. */
  def movingDailyStats(events: DataFrame, windowDays: Int = 7): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("_rev"),
        count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-(windowDays - 1), 0)
    daily.select(col("event_type"), col("day"), col("n"),
      col("_rev").cast("double").as("day_value"),
      sum(col("_rev")).over(w).cast("double").as("window_value"),
      sum(col("n")).over(w).as("window_n"))
  }

  /** Funnel analysis: how many users completed step 1, steps 1-2, 1-2-3, …
    * in ORDER, with every later step inside `windowSeconds` of the user's
    * first step-1 event. Returns one row per funnel stage
    * (step_idx, step, n_users), lazily (composable — nothing is cached or
    * counted eagerly; there is nothing to leak).
    *
    * Shape: ONE shuffle — a hash aggregate collecting each user's event
    * TIMES per step (events of non-step types are filtered before the
    * shuffle), then the whole per-user funnel recurrence runs as a
    * codegen'd array-expression chain and a single global aggregate emits
    * the stage counts. Memory bound: the aggregation buffer holds one
    * user's step-event timestamps (8 bytes each) — the same per-key bound
    * sessionize accepts. A pathological hot key (a bot with ~10⁸ events
    * of the funnel's own step types) concentrates in one buffer; pass
    * `maxEventsPerUser` to EXCLUDE such keys before the collect (per-user
    * count + semi-join over one shared shuffle — see inline note). The
    * alternative iterative shape (one join pass per stage, |users| state)
    * costs O(steps) corpus scans and needed per-stage caching — strictly
    * worse at every realistic skew. */
  def funnelReport(
      events: DataFrame, steps: Seq[String],
      windowSeconds: Long = 7L * 86400L,
      maxEventsPerUser: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(maxEventsPerUser.forall(_ > 0), "maxEventsPerUser must be > 0")
    // Single-pass shape (round 9, replacing an iterative join chain that
    // needed per-stage caching): ONE hash aggregate groups each user's
    // event times per step, then the funnel recurrence
    //   t_1 = min(times_1)
    //   t_k = min{ t ∈ times_k | t > t_{k-1} ∧ t ≤ t_1 + W }
    // runs as a codegen'd expression chain over the arrays — no persist,
    // no O(steps) join passes over the corpus, no driver-side loop, and
    // the result composes lazily. Array sizes are per-user-per-STEP event
    // counts (non-step events are filtered before the shuffle), the same
    // per-key bound sessionize already accepts.
    val ev0 = events
      .select(col("user_id"), col("event_type"), tsUs(col("ts")).as("_us"))
      .filter(col("event_type").isin(steps: _*))
    // Enforceable hot-key cap (round 10): the collecting aggregate below
    // concentrates one user's step-event timestamps in one buffer, so a
    // pathological key (a bot with ~10⁸ funnel-step events) OOMs an
    // executor at 100 TB. With maxEventsPerUser set, such keys are
    // EXCLUDED before the collect — a per-user count + semi-join on the
    // compact (user_id, n) relation. The count's exchange and the semi
    // join's probe exchange hash the same ev0 subtree by user_id, so
    // ReuseExchange collapses them: one corpus scan, one shuffle of ev0,
    // and the grouped collect downstream is already user_id-partitioned.
    // Excluded-not-truncated is deliberate: a truncated bot would still
    // CONVERT in the report; dropping the key keeps stage counts honest
    // (a bot is not a user) and the report composable.
    val ev = maxEventsPerUser match {
      case None => ev0
      case Some(cap) =>
        val ok = ev0.groupBy(col("user_id")).agg(count(lit(1)).as("_n"))
          .filter(col("_n") <= cap).select(col("user_id"))
        ev0.join(ok, Seq("user_id"), "left_semi")
    }
    val arrs = steps.zipWithIndex.map { case (st, i) =>
      collect_list(when(col("event_type") === st, col("_us"))).as(s"_a$i")
    }
    val byUser = ev.groupBy(col("user_id")).agg(arrs.head, arrs.tail: _*)
    val t1 = array_min(col("_a0"))
    val bound = t1 + lit(windowSeconds * 1000000L)
    val stageTimes = steps.indices.drop(1).scanLeft(t1) { (tPrev, k) =>
      array_min(filter(col(s"_a$k"), t => t > tPrev && t <= bound))
    }
    // stage counts in one global agg row (sum of empty set → 0), exploded
    // back to the (step_idx, step, n_users) contract
    val cnts = stageTimes.zipWithIndex.map { case (t, i) =>
      coalesce(sum(when(t.isNotNull, 1L).otherwise(0L)), lit(0L)).as(s"_n$i")
    }
    val row = byUser.agg(cnts.head, cnts.tail: _*)
    val stepRows = array(steps.zipWithIndex.map { case (st, i) =>
      struct(lit(i + 1L).as("step_idx"), lit(st).as("step"),
        col(s"_n$i").as("n_users"))
    }: _*)
    row.select(explode(stepRows).as("_r")).select("_r.*")
  }

  /** Weekly cohort retention: users grouped by the week of their first
    * event; for each (cohort_week, week_offset), how many of that cohort
    * were active. The classic growth-analytics triangle.
    *
    * Two hash aggs + one join, all keyed on `user_id` until the final
    * (cohort, offset) agg — the distinct pass collapses events to
    * (user, week) first, so the join input is bounded by users × weeks,
    * not by raw event count. */
  def cohortRetention(events: DataFrame): DataFrame = {
    // week kept as TIMESTAMP (midnight Monday): engine-portable — DATE vs
    // TIMESTAMP logical types round-trip differently through parquet
    val weeks = events
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .distinct()
    val cohorts = weeks.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    weeks.join(cohorts, "user_id")
      .groupBy(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")).cast("long") / 7)
          .cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Event-type transition matrix: counts of consecutive (prev → next)
    * event-type pairs per user timeline (ordered by ts, tie-broken by
    * event_id). The Markov-chain input for sequence modeling / anomaly
    * baselines. ONE shuffle (partition by user, sort by time) + one
    * map-side-combinable hash agg. */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events.select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** CDC-style log compaction: the LATEST row per key (by ts, tie-broken
    * by event_id) — upsert semantics over an append-only change log.
    *
    * Implemented as `max_by` over a struct ordering key: ONE hash
    * aggregate with map-side combine, no sort and no window — at 100 TB
    * the per-partition state is |keys|, and a `row_number() OVER (ORDER BY
    * ts DESC)` window (the naive shape) would instead sort every
    * partition's full event history. */
  def latestState(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(max_by(
        struct(col("event_type"), col("value"), col("ts")),
        struct(col("ts"), col("event_id"))).as("_s"))
      .select(col("user_id"), col("_s.event_type").as("last_type"),
        col("_s.value").as("last_value"), col("_s.ts").as("last_ts"))

  /** Range (point-in-interval) join: every point row paired with each
    * interval containing its timestamp (`start <= t < end`).
    *
    * Spark plans a raw inequality join as BroadcastNestedLoopJoin (fine
    * only while one side broadcasts) or a cartesian product — at millions
    * of intervals both die. This is the bucketed EQUI-join shape instead:
    * time is cut into `bucketWidth`-second buckets; each point carries its
    * one bucket, each interval is exploded to the buckets it overlaps, and
    * the join is a plain hash equi-join on the bucket id refined by the
    * exact containment predicate. A point's bucket equals exactly one of a
    * containing interval's buckets, so no post-join dedup is needed.
    * Choose `bucketWidth` near the typical interval length: explode factor
    * = interval span / width + 1. */
  def rangeJoinBucketed(
      points: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long = 3600L): DataFrame = {
    val pB = points.withColumn("_bkt",
      floor(unix_timestamp(col(tsCol)) / bucketWidth))
    val iB = intervals.withColumn("_bkt",
      explode(sequence(floor(unix_timestamp(col(startCol)) / bucketWidth),
        floor((unix_timestamp(col(endCol)) - 1) / bucketWidth))))
    pB.join(iB, Seq("_bkt"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("_bkt")
  }

  /** Statistical outlier report: events whose value deviates from their
    * type's mean by more than `k` standard deviations, decided in EXACT
    * integer arithmetic (engine-portable, no float epsilon at the
    * boundary). With x the milli-unit value, n/S/SS the per-type count,
    * sum and sum-of-squares, the float test |x−μ| > kσ is equivalent to
    *
    *   (n·x − S)² > k²·(n·SS − S²)
    *
    * — both sides integers, so the comparison has no rounding anywhere.
    * Decimal widths are sized for v_m < 10^6 and n < 10^11 rows per type;
    * intermediate magnitudes stay under 10^35 < decimal(38).
    *
    * Shape: ONE map-side-combinable hash agg builds the per-type moment
    * table (|event types| rows), which broadcasts back onto the scan — the
    * corpus is read once and never shuffled. */
  def anomalyReport(events: DataFrame, k: Int = 3): DataFrame = {
    // null values would inflate n but not S/SS — exclude them so the
    // moments describe exactly the rows being judged
    val v = events.filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"),
        floor(col("value") * 1000).cast("long").as("v_m"))
    val x = col("v_m").cast("decimal(12,0)")
    val st = v.groupBy("event_type").agg(
      count(lit(1)).cast("decimal(11,0)").as("_n"),
      sum(x).as("_s"),
      sum(x * x).as("_ss"))
    val d = col("_n") * x - col("_s")
    val lhs = d * d
    val rhs = lit(k.toLong * k).cast("decimal(3,0)") *
      (col("_n") * col("_ss") - col("_s") * col("_s"))
    v.join(broadcast(st), "event_type")
      .filter(lhs > rhs)
      .select(col("event_id"), col("event_type"), col("v_m"))
  }

  /** Sparse daily rollup: exact integer counts + milli-unit sums per
    * (event_type, day) — the mergeable building block for
    * [[mergeRollups]] incremental maintenance. */
  def dailyRollup(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 1000).cast("long")).as("sum_m"))

  /** Incremental materialized-rollup maintenance: merge an existing
    * rollup with a delta batch's rollup — union + one re-aggregate by the
    * same key, both measures algebraic (SUM), so
    * `mergeRollups(rollup(base), rollup(delta)) == rollup(base ∪ delta)`
    * EXACTLY. This is the 100 TB refresh shape: the nightly delta
    * aggregates alone (delta-sized shuffle), and the merge touches only
    * |keys| rows — the base corpus is never re-scanned. */
  def mergeRollups(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("n")).as("n"), sum(col("sum_m")).as("sum_m"))

  /** Gap-filled daily rollup: the complete (event_type, day) grid over the
    * observed day range, absent cells zero-filled and marked `filled=1` —
    * the densification step before any trailing-window or forecasting pass
    * (a window over a rollup WITH HOLES silently averages over the wrong
    * denominator).
    *
    * Shape: one hash agg builds the sparse rollup; the grid is
    * |types|×|days| rows built from the rollup's own bounds (a 1-row agg
    * + `sequence` explode — never a scan of the corpus), then one join
    * back. All three relations after the first agg are dimension-sized. */
  def gapFillDaily(events: DataFrame): DataFrame = {
    val d = events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 1000).cast("long")).as("sum_m"))
    val days = d.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 1 DAY"))).as("day"))
    val grid = d.select(col("event_type")).distinct().crossJoin(days)
    grid.join(d, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_m"), lit(0L)).as("sum_m"),
        when(col("n").isNull, lit(1L)).otherwise(lit(0L)).as("filled"))
  }

  /** Winsorization report with EXACT order statistics: per event type the
    * (lower) median and the cap threshold (`cap_m`, the value at rank
    * ⌈capBp·n/10000⌉ — p99 at the default) as integer milli-unit order
    * statistics — well-defined under ties, no interpolation, no float —
    * plus the capped sum and how many rows the cap touched.
    * The outlier-capping step of value cleaning, oracle-exact where
    * interpolated percentiles never are.
    *
    * Shape: one shuffle sorts values WITHIN each type partition (the
    * honest cost of an exact order statistic; the approximate path at
    * extreme scale is the q91 histogram + cumulative scan), one tiny
    * threshold table joined back broadcast. */
  def winsorizeReport(events: DataFrame, capBp: Int = 9900): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = events.filter(col("value").isNotNull)
      .select(col("event_type"), floor(col("value") * 1000).cast("long").as("v_m"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("v_m"))
    val ranked = v
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
    val th = ranked.groupBy(col("event_type")).agg(
      max(col("n")).as("n"),
      max(when(col("rn") === expr("(n + 1) DIV 2"), col("v_m"))).as("med_m"),
      max(when(col("rn") === expr(s"($capBp * n + 9999) DIV 10000"), col("v_m")))
        .as("cap_m"))
    v.join(broadcast(th), "event_type")
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"), max(col("med_m")).as("med_m"),
        max(col("cap_m")).as("cap_m"),
        sum(least(col("v_m"), col("cap_m"))).as("capped_sum_m"),
        sum(when(col("v_m") > col("cap_m"), 1L).otherwise(0L)).as("n_capped"))
  }

  /** Fixed-width value histogram per event type: bucket = milli-unit
    * value DIV `widthM`. The distribution-profiling primitive behind
    * sizing decisions (salt factors, partition counts) — one map-side
    * combinable hash agg over (type, bucket), output is |types|×|buckets|
    * rows regardless of corpus size. */
  def valueHistogram(events: DataFrame, widthM: Long = 25000L): DataFrame =
    events
      .select(col("event_type"),
        floor(col("value") * 1000).cast("long").as("_v"))
      // FLOOR division (DIV truncates toward zero): negative milli-values
      // must land in bucket -1, not merge into bucket 0 — subtracting the
      // nonnegative pmod first makes the DIV exact floor in pure longs
      .groupBy(col("event_type"),
        expr(s"(_v - pmod(_v, $widthM)) DIV $widthM").as("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("_v")).as("sum_m"))

  /** EXACT interpolated percentiles per group WITHOUT buffering groups
    * in memory. Spark's `percentile()` is an ObjectHashAggregate that
    * collects every value of a group into one in-memory buffer — the
    * canonical per-group OOM at 100 TB (one hot group = one executor's
    * heap). This computes the identical result from the per-(group,
    * value) HISTOGRAM: two map-side-combinable hash aggregates plus a
    * window over the histogram relation — which is distinct-value-sized,
    * not row-count-sized (sensor/metric domains are bounded-decimal, so
    * the histogram collapses by orders of magnitude; worst-case all-
    * distinct it degrades to a sort of what the buffer would hold, never
    * a single-task buffer).
    *
    * Interpolation replicates Spark's Percentile formula EXACTLY —
    * `pos = p·(n−1); (⌈pos⌉−pos)·v_lo + (pos−⌊pos⌋)·v_hi` with the
    * `⌈pos⌉ = ⌊pos⌋ → v_lo` short-circuit — same double arithmetic,
    * bit-identical output (differential-spec'd, ties included).
    *
    * Output: one row per group with `p<i>` columns in `ps` order. */
  def exactPercentiles(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    // Spark's percentile() IGNORES null values — drop them before the
    // histogram, or they'd count into _n (and sort first in the window),
    // silently breaking the bit-identical contract on null-bearing columns.
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(g: _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nW = Window.partitionBy(g: _*)
    val cum = hist
      .withColumn("_cum", sum(col("_c")).over(w))
      .withColumn("_n", sum(col("_c")).over(nW))
    // order statistic k (0-based) = least value with cumulative count > k
    val aggs = ps.zipWithIndex.flatMap { case (p, i) =>
      val pos = lit(p) * (col("_n") - 1).cast("double")
      val lo = floor(pos)
      val hi = ceil(pos)
      Seq(
        min(when(col("_cum") > lo, col(valueCol))).as(s"_vlo$i"),
        min(when(col("_cum") > hi, col(valueCol))).as(s"_vhi$i"),
        first(pos).as(s"_pos$i"), first(lo).as(s"_lo$i"), first(hi).as(s"_hi$i"))
    }
    val out = cum.groupBy(g: _*).agg(aggs.head, aggs.tail: _*)
    val cols = g ++ ps.indices.map { i =>
      when(col(s"_hi$i") === col(s"_lo$i"), col(s"_vlo$i"))
        .otherwise((col(s"_hi$i") - col(s"_pos$i")) * col(s"_vlo$i")
          + (col(s"_pos$i") - col(s"_lo$i")) * col(s"_vhi$i"))
        .as(s"p$i")
    }
    out.select(cols: _*)
  }
}
