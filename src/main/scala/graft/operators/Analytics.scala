package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Money

/** Behavioral analytics over the event stream: funnel conversion and
  * cohort retention — the two dashboard queries every product-analytics
  * deployment of the reference's event tables runs (the reference's
  * events feed its Superset dashboards; these are the standard shapes
  * those dashboards are built from).
  *
  * Both are user-grain: every wide operation shuffles on `user_id`
  * once, and every frame after the first aggregation is user- or
  * cohort-sized, never event-sized. At 100 TB of events the plans are
  * a handful of co-keyed exchanges over progressively tiny frames.
  */
object Analytics {

  /** Ordered funnel: how many users reach each stage, where a stage
    * counts only if it happens at-or-after the user's first time
    * reaching the previous stage (the standard "ordered funnel"
    * semantic — a purchase before ever viewing does not convert).
    *
    * Computed as a left fold over the stages: stage k's frame is
    * (user_id, first_ts) of users whose earliest qualifying event
    * exists. Each step is one filter + one user-keyed join + one
    * user-grain min — k small co-keyed shuffles, no windows over the
    * raw event stream. Emits one row per stage with absolute counts
    * and conversion ratios (vs the previous stage and vs the top).
    */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel: need at least one stage")

    // fold: (users who reached stage k-1 with their first-reach ts)
    val reached: Seq[DataFrame] = stages.zipWithIndex.scanLeft(
      Option.empty[DataFrame]) { case (prev, (stage, _)) =>
      val ev = events.filter(col("event_type") === stage)
        .select(col("user_id"), col("ts"))
      val qualified = prev match {
        case None => ev
        case Some(p) => ev.join(p.select(col("user_id"),
            col("first_ts").as("prev_ts")), Seq("user_id"))
          .filter(col("ts") >= col("prev_ts"))
          .select(col("user_id"), col("ts"))
      }
      Some(qualified.groupBy("user_id").agg(min("ts").as("first_ts")))
    }.flatten

    val counts = reached.zip(stages).zipWithIndex.map {
      case ((df, stage), i) =>
        df.groupBy().agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("stage_idx"), lit(stage).as("stage"),
            col("n_users"))
    }
    val all = counts.reduce(_ union _)
    // adjacent-stage and top-of-funnel denominators via lag/first over
    // the stages.length-row frame (single partition by construction) —
    // the old self-join + crossBroadcast re-evaluated every stage count
    // (a fact aggregation each) once per consumer
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)).orderBy("stage_idx")
    all.select(col("stage_idx"), col("stage"), col("n_users"),
        Money.ratio2(col("n_users"),
          coalesce(lag("n_users", 1).over(w), col("n_users"))).as("conv_prev"),
        Money.ratio2(col("n_users"), first("n_users").over(w)).as("conv_top"))
      .orderBy("stage_idx")
  }

  /** Weekly cohort retention: users cohorted by the ISO week of their
    * first event; a cohort-week cell counts users with any activity in
    * that week offset. `retention` is the cell count over the cohort
    * size (the offset-0 diagonal is 1.0 by construction — a user's
    * first event is activity in week 0).
    *
    * Shape: one user-grain min (first event), one co-keyed join back to
    * the event stream, then a distinct and aggs at (user, week) and
    * (cohort, week) grain — the only corpus-grain exchange is the
    * first-event agg; everything downstream is user-sized or smaller.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val first = events.groupBy("user_id")
      .agg(min("ts").as("first_ts"))
      .select(col("user_id"),
        date_trunc("week", col("first_ts")).cast("date").as("cohort_week"))
    val activity = events.select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("act_week"))
      .join(first, Seq("user_id"))
      .select(col("user_id"), col("cohort_week"),
        (datediff(col("act_week"), col("cohort_week")) / 7)
          .cast("int").as("week_offset"))
      .distinct()
    val cells = activity.groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_active"))
    val sizes = first.groupBy("cohort_week")
      .agg(count(lit(1)).as("cohort_size"))
    cells.join(sizes, Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("cohort_size"),
        col("n_active"),
        Money.ratio2(col("n_active"), col("cohort_size")).as("retention"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Running exponentially-weighted moving average over a per-key daily
    * series — the time-series smoother next to [[funnel]]/
    * [[cohortRetention]] (trend lines on the same dashboards; at
    * pipeline scale, the drift detector for per-source daily volumes).
    *
    * The recursion e₁ = x₁, eₜ = α·xₜ + (1−α)·eₜ₋₁ is evaluated as a
    * LEFT FOLD over each key's date-ordered value array: pure
    * multiply/add in a fixed order, so both engines derive
    * bit-identical doubles (a closed-form pow() version would hang
    * determinism on two libms' pow rounding — rejected). One fold per
    * key emits the whole trajectory — O(days) lambda evaluations,
    * bounded by the TIME dimension (n ≈ days), never by corpus size —
    * the per-key series frame is (keys × days) however large the fact
    * table is, and the only corpus-grain work is the daily
    * pre-aggregation (decimal money sums, one shuffle).
    *
    * @param daily (key, day, value) frame; (key, day) must be unique
    * @param alpha smoothing weight, passed as BOTH literals (α and
    *              1−α) to keep cross-engine double identity — never
    *              derive one from the other at runtime
    */
  /** [[ewmaSmooth]] over per-payment-mode daily units sold — the
    * query-entry composition (integer daily sums, exactly
    * representable as doubles, then the fold).
    */
  def dailySalesEwma(sales: DataFrame): DataFrame =
    ewmaSmooth(dailyUnits(sales),
      "payment_mode", "sale_date", "daily_total")

  /** [[ewmaAnomaly]] over the same per-mode daily units series. */
  def dailySalesAnomaly(sales: DataFrame): DataFrame =
    ewmaAnomaly(dailyUnits(sales),
      "payment_mode", "sale_date", "daily_total")

  // Memoized: five consumers (q_ewma/q_holt/q_cusum/q_seasonal/
  // q_anomaly) fold over the SAME per-mode daily series, and each was
  // re-aggregating the sales fact to build it. The frame is
  // |payment modes| × |days| — bounded by the data SPAN and the mode
  // vocabulary, not the corpus volume, so it needs no size gate (a
  // 100 TB fact still yields ~modes × span rows).
  private def dailyUnits(sales: DataFrame): DataFrame =
    graft.core.PlanMemo.cached("analytics.dailyUnits",
      sales.groupBy(col("payment_mode"), col("sale_date"))
        .agg(sum(col("quantity")).cast("double").as("daily_total")))

  /** EWMA-forecast anomaly detection over a per-key daily series: each
    * day's residual against the PREVIOUS day's EWMA (the one-step
    * forecast) is z-scored against the key's residual deviation; days
    * with |residual| > 3σ are flagged — the volume-drift alarm a
    * per-source ingest pipeline runs on its daily counts.
    *
    * Determinism: residuals subtract two already-bit-identical doubles;
    * Σr² crosses an order-free DECIMAL(38,12) accumulator; sqrt is
    * IEEE-exact (unlike pow — fine to use); the z division re-rounds
    * decimal-9. Keys with fewer than 2 residuals or zero deviation get
    * NULL z and a false flag (guarded — a 0/0 or x/0 would otherwise
    * turn into engine-specific inf/NaN casts).
    *
    * Shape: [[ewmaSmooth]]'s fold, one lag window and one key-grain
    * aggregation on the (keys × days)-sized series frame — nothing at
    * corpus grain beyond the daily pre-aggregation.
    */
  def ewmaAnomaly(daily: DataFrame, keyCol: String, dayCol: String,
                  valCol: String, alpha: Double = 0.3,
                  oneMinusAlpha: Double = 0.7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val Acc = org.apache.spark.sql.types.DecimalType(38, 12)
    val ew = ewmaSmooth(daily, keyCol, dayCol, valCol, alpha, oneMinusAlpha)
    val w = Window.partitionBy(keyCol).orderBy(dayCol)
    val r = ew
      .withColumn("forecast", lag("ewma", 1).over(w))
      .withColumn("resid", col(valCol) - col("forecast"))
    val stats = r.filter(col("resid").isNotNull)
      .groupBy(col(keyCol))
      .agg(sum((col("resid") * col("resid")).cast(Acc)).cast("double")
        .as("ss"), count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .select(col(keyCol), sqrt(col("ss") / (col("n") - 1)).as("sigma"))
    r.join(stats, Seq(keyCol), "left")
      .select(col(keyCol), col(dayCol), col(valCol), col("forecast"),
        when(col("sigma") > 0,
          round((col("resid") / col("sigma"))
            .cast(org.apache.spark.sql.types.DecimalType(20, 12)), 9)
            .cast("double")).as("z"),
        coalesce(abs(col("resid")) > lit(3) * col("sigma"), lit(false))
          .as("is_anomaly"))
      .orderBy(keyCol, dayCol)
  }

  /** Per-step decimal scale for the recursive-series family (EWMA /
    * Holt / CUSUM). The recursion state lives in DECIMAL(26,12) and
    * every step lands back on that grid, so there is NO free-running
    * double anywhere in the chain — the round-7 sf1 gate showed why
    * doubles can't carry it: Spark casts double→decimal through the
    * SHORTEST decimal string (Java `Double.toString`) while DuckDB
    * scales the binary value in double and rounds, so two engines
    * rounding the same raw recursion double to 9 dp disagree whenever
    * the value sits within ~ulp of the .5e-9 boundary — ~0.2 % of rows
    * once the series magnitude reaches 10⁴ (ulp 2e-12), measured as
    * 43 diverging rows across the family at sf1. Decimal steps are
    * exact-value arithmetic on both engines; the only double↔decimal
    * crossings left are the value entry (exact for integer-valued
    * series like daily units; a one-time 12-dp quantization otherwise)
    * and the final 9-dp emission (a 9-dp decimal → double cast, exact
    * and engine-agreed for |v| ≲ 10⁶ — above that DuckDB's
    * double-scaled cast loses its half-ulp margin).
    */
  private val StepDec = org.apache.spark.sql.types.DecimalType(26, 12)
  /** Smoothing weights as decimal literals via the shortest string —
    * 0.3 becomes DECIMAL '0.3' exactly, matching the SQL twin's
    * literal. */
  private def dlit(x: Double) =
    lit(java.math.BigDecimal.valueOf(x))

  def ewmaSmooth(daily: DataFrame, keyCol: String, dayCol: String,
                 valCol: String, alpha: Double = 0.3,
                 oneMinusAlpha: Double = 0.7): DataFrame = {
    require(math.abs(alpha + oneMinusAlpha - 1.0) < 1e-9,
      s"ewmaSmooth: alpha $alpha + $oneMinusAlpha must be 1")
    val series = daily
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col(dayCol).as("d"),
        col(valCol).as("v")))).as("s"))
      .select(col(keyCol), transform(col("s"), p => p.getField("d")).as("ds"),
        transform(col("s"), p => p.getField("v")).as("vs"),
        transform(col("s"), p => p.getField("v").cast(StepDec)).as("dvs"))
    // ONE fold per key emitting the whole trajectory [e₁,e₂,…]
    // (running value = the array's last slot): O(days) lambda
    // evaluations instead of the per-t prefix refold's O(days²). State
    // is DECIMAL(26,12), each step exact-decimal then rounded back to
    // the grid (see [[StepDec]]) — bit-identical across engines by
    // construction, at any magnitude.
    val traj = reduce(
      transform(slice(col("dvs"), lit(2), size(col("dvs")) - 1),
        v => array(v)),
      array(element_at(col("dvs"), lit(1))),
      (a, x) => concat(a, array(
        round(dlit(alpha) * element_at(x, 1)
          + dlit(oneMinusAlpha) * element_at(a, -1), 12).cast(StepDec))))
    series
      .withColumn("traj", traj) // materialized once per key
      .select(col(keyCol), posexplode(
        transform(sequence(lit(1), size(col("vs"))), t =>
          struct(
            element_at(col("ds"), t).as("d"),
            element_at(col("vs"), t).as("v"),
            round(element_at(col("traj"), t), 9)
              .cast("double").as("e")))))
      .select(col(keyCol), col("col.d").as(dayCol),
        col("col.v").as(valCol), col("col.e").as("ewma"))
      .orderBy(keyCol, dayCol)
  }

  /** Two-proportion z-test over an A/B split — the experiment readout
    * next to [[funnel]]: users assigned to arms by a deterministic key
    * predicate, conversion = reaching the goal event at least once,
    *
    *   z = (p_a − p_b) / sqrt( p̂(1−p̂)(1/n_a + 1/n_b) ),  p̂ pooled
    *
    * Shape: one user-grain aggregation (the same single fact shuffle as
    * every user-grain operator here), then a 1-row conditional
    * aggregate. Counts are exact integers; the z pipeline is one fixed
    * IEEE sequence over their double casts (sqrt is IEEE-exact),
    * decimal-9 rounded. Degenerate splits (an empty arm, or p̂ ∈ {0,1}
    * making the standard error 0) emit NULL z, not an inf/NaN.
    *
    * @param inA arm-assignment predicate over the user key (must be
    *            deterministic — the oracle twin repeats it verbatim)
    */
  def abTest(events: DataFrame, inA: org.apache.spark.sql.Column,
             goal: String = "purchase"): DataFrame = {
    val d2012 = org.apache.spark.sql.types.DecimalType(20, 12)
    def round9(c: org.apache.spark.sql.Column) =
      round(c.cast(d2012), 9).cast("double")
    val users = events.groupBy(col("user_id"))
      .agg(max(when(col("event_type") === goal, 1L).otherwise(0L))
        .as("converted"))
      .select(inA.as("in_a"), col("converted"))
    val g = users.agg(
      sum(when(col("in_a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("in_a"), 1L).otherwise(0L)).as("n_b"),
      sum(when(col("in_a"), col("converted")).otherwise(0L)).as("conv_a"),
      sum(when(!col("in_a"), col("converted")).otherwise(0L)).as("conv_b"))
    def d(c: String) = col(c).cast("double")
    val pa = d("conv_a") / d("n_a")
    val pb = d("conv_b") / d("n_b")
    val pooled = (d("conv_a") + d("conv_b")) / (d("n_a") + d("n_b"))
    val se = sqrt(pooled * (lit(1.0) - pooled)
      * (lit(1.0) / d("n_a") + lit(1.0) / d("n_b")))
    g.select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
      when(col("n_a") > 0, round9(pa)).as("p_a"),
      when(col("n_b") > 0, round9(pb)).as("p_b"),
      when(col("n_a") > 0 && col("n_b") > 0, round9(pa - pb)).as("lift"),
      when(col("n_a") > 0 && col("n_b") > 0 && se > 0,
        round9((pa - pb) / se)).as("z"))
  }

  /** Holt's linear (double-exponential) smoothing over a per-key daily
    * series — [[ewmaSmooth]] plus a trend component, the next step up
    * for drifting volumes (an EWMA permanently lags a ramp; Holt tracks
    * it):
    *
    *   ℓ₁ = x₁, b₁ = 0
    *   ℓₜ = α·xₜ + (1−α)(ℓₜ₋₁ + bₜ₋₁)
    *   bₜ = β(ℓₜ − ℓₜ₋₁) + (1−β)bₜ₋₁
    *
    * Same determinism discipline as EWMA: the recursion is a LEFT FOLD
    * over the date-ordered value array with a TWO-ELEMENT ARRAY
    * accumulator [level, trend] — fixed-order multiply/add only, both
    * engines derive bit-identical doubles, outputs decimal-9 rounded.
    * An array, not a struct, deliberately: DuckDB 1.0's `list_reduce`
    * mis-evaluates struct accumulators whose field expressions
    * reference OTHER fields (probed: `{'l': a.l+1, 'b': a.b+a.l}` over
    * [1,2,3] folds to b=4 where foldl gives 3), while list-element
    * references fold correctly — the oracle twin must stay on the
    * array encoding. ℓₜ is deliberately recomputed inside the bₜ
    * branch (both texts verbatim) rather than let-bound: both engines
    * execute the identical IEEE sequence. One fold per key emits the
    * WHOLE trajectory — O(days) lambda evaluations (see the inline
    * note); the only corpus-grain work is the daily pre-aggregation
    * upstream.
    */
  def holtSmooth(daily: DataFrame, keyCol: String, dayCol: String,
                 valCol: String, alpha: Double = 0.3,
                 oneMinusAlpha: Double = 0.7, beta: Double = 0.2,
                 oneMinusBeta: Double = 0.8): DataFrame = {
    require(math.abs(alpha + oneMinusAlpha - 1.0) < 1e-9 &&
      math.abs(beta + oneMinusBeta - 1.0) < 1e-9,
      s"holtSmooth: weights must pair to 1 ($alpha/$oneMinusAlpha, " +
        s"$beta/$oneMinusBeta)")
    val series = daily
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col(dayCol).as("d"),
        col(valCol).as("v")))).as("s"))
      .select(col(keyCol), transform(col("s"), p => p.getField("d")).as("ds"),
        transform(col("s"), p => p.getField("v")).as("vs"),
        transform(col("s"), p => p.getField("v").cast(StepDec)).as("dvs"))
    // ONE fold per key producing the whole trajectory [ℓ₁,b₁,ℓ₂,b₂,…]
    // (running state = the array's last two slots, read via negative
    // element_at on both engines) — O(days) lambda evaluations. The
    // per-t prefix-refold form is O(days²) and measured 12.6 s at
    // sf0.1 for this operator. State is decimal per [[StepDec]]; the
    // trend step reads the ROUNDED new level (the same grid value both
    // engines emit), repeated textually in the SQL twin.
    val traj = reduce(
      transform(slice(col("dvs"), lit(2), size(col("dvs")) - 1),
        v => array(v)),
      array(element_at(col("dvs"), lit(1)), lit(0).cast(StepDec)),
      (a, x) => {
        val lNew = round(dlit(alpha) * element_at(x, 1)
          + dlit(oneMinusAlpha)
            * (element_at(a, -2) + element_at(a, -1)), 12).cast(StepDec)
        val bNew = round(dlit(beta) * (lNew - element_at(a, -2))
          + dlit(oneMinusBeta) * element_at(a, -1), 12).cast(StepDec)
        concat(a, array(lNew, bNew))
      })
    series
      .withColumn("traj", traj) // materialized once per key
      .select(col(keyCol), posexplode(
        transform(sequence(lit(1), size(col("vs"))), t =>
          struct(
            element_at(col("ds"), t).as("d"),
            element_at(col("vs"), t).as("v"),
            round(element_at(col("traj"), t * 2 - 1), 9)
              .cast("double").as("l"),
            round(element_at(col("traj"), t * 2), 9)
              .cast("double").as("b")))))
      .select(col(keyCol), col("col.d").as(dayCol),
        col("col.v").as(valCol), col("col.l").as("level"),
        col("col.b").as("trend"))
      .orderBy(keyCol, dayCol)
  }

  /** [[holtSmooth]] over the per-mode daily units series. */
  def dailySalesHolt(sales: DataFrame): DataFrame =
    holtSmooth(dailyUnits(sales), "payment_mode", "sale_date", "daily_total")

  /** One-sided CUSUM change detection over a per-key daily series —
    * the LOCALIZER next to [[ewmaAnomaly]]'s outlier flags: CUSUM
    * accumulates small persistent drifts that never individually clear
    * a z-threshold,
    *
    *   S₁ = max(0, x₁ − μ − slack),
    *   Sₜ = max(0, Sₜ₋₁ + (xₜ − μ − slack)),   flag Sₜ > h
    *
    * with μ the key's decimal-exact mean (decimal-9-rounded double so
    * both engines fold from the identical baseline), `slack` the
    * allowed per-day drift and `h` the alarm threshold. Same
    * trajectory-fold shape as [[ewmaSmooth]]: O(days) lambda
    * evaluations per key, fixed-order double arithmetic, outputs
    * decimal-9 rounded.
    */
  def cusum(daily: DataFrame, keyCol: String, dayCol: String,
            valCol: String, slack: Double, threshold: Double): DataFrame = {
    val d2012 = org.apache.spark.sql.types.DecimalType(20, 12)
    val acc = org.apache.spark.sql.types.DecimalType(28, 6)
    // μ is pinned at SIX decimal places, not the usual 9: the baseline
    // re-enters the decimal fold below via a double→decimal cast, and
    // DuckDB converts double→DECIMAL(p,s) by multiplying by 10^s in
    // DOUBLE space — lossy once |μ|·10^s exceeds 2^53, i.e. |μ| > ~9007
    // at s=12 (Spark's shortest-decimal conversion is exact there). The
    // r13 sf10 gate caught exactly this: μ ≈ 24k at 100×, the twin's
    // CAST(mu AS DECIMAL(26,12)) came back 8e-12 off, and the
    // trajectory accumulated the skew into visible 1e-9 diffs. At 6 dp
    // the twin casts through DECIMAL(26,6) first (exact while
    // |μ|·10^6 < 2^53, i.e. μ < 9e9 — any plausible rung), then
    // promotes decimal→decimal losslessly.
    def round6(c: org.apache.spark.sql.Column) =
      round(c.cast(d2012), 6).cast("double")
    val series = daily
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col(dayCol).as("d"),
        col(valCol).as("v")))).as("s"),
        round6(sum(col(valCol).cast(acc)).cast("double")
          / count(lit(1)).cast("double")).as("mu"))
      .select(col(keyCol), col("mu"),
        transform(col("s"), p => p.getField("d")).as("ds"),
        transform(col("s"), p => p.getField("v")).as("vs"),
        transform(col("s"), p => p.getField("v").cast(StepDec)).as("dvs"))
    // decimal recursion (see [[StepDec]]); unlike EWMA/Holt no per-step
    // round is even needed — x, μ (a 9-dp value) and slack all sit on
    // fixed decimal scales, so every Sₜ is EXACT at scale 12: the sum
    // never leaves the grid. (μ's double→decimal re-cast is exact and
    // engine-agreed because μ is a 9-dp value — the general free-double
    // cast is what isn't portable.) Spark's `greatest` preserves the
    // decimal type; the SQL twin must clamp with CASE instead, because
    // DuckDB's greatest(DECIMAL, DECIMAL) returns DOUBLE and would
    // round-trip the 16-significant-digit state through 53 bits.
    val traj = reduce(
      transform(col("dvs"), v => array(v)),
      array(lit(0).cast(StepDec)),
      (a, x) => concat(a, array(
        greatest(lit(0).cast(StepDec),
          (element_at(a, -1) + (element_at(x, 1) - col("mu").cast(StepDec)
            - dlit(slack))).cast(StepDec)))))
    series
      .withColumn("traj", traj) // slot t+1 holds Sₜ (slot 1 is the seed)
      .select(col(keyCol), col("mu"), posexplode(
        transform(sequence(lit(1), size(col("vs"))), t =>
          struct(
            element_at(col("ds"), t).as("d"),
            element_at(col("vs"), t).as("v"),
            round(element_at(col("traj"), t + 1), 9)
              .cast("double").as("s")))))
      .select(col(keyCol), col("col.d").as(dayCol),
        col("col.v").as(valCol), col("mu"), col("col.s").as("cusum"),
        (col("col.s") > threshold).as("is_change"))
      .orderBy(keyCol, dayCol)
  }

  /** [[cusum]] over the per-mode daily units series. */
  def dailySalesCusum(sales: DataFrame): DataFrame =
    cusum(dailyUnits(sales), "payment_mode", "sale_date", "daily_total",
      slack = 5.0, threshold = 200.0)

  /** Day-of-week seasonality profile per key: mean daily value per
    * weekday and its index against the key's overall daily mean (index
    * 1.0 = no weekly seasonality) — the calendar decomposition read
    * before interpreting any daily drift alarm. Weekday is pinned to
    * Monday = 0 on both engines (Spark `weekday`; DuckDB `isodow − 1`
    * — their `dayofweek`s disagree on the base). Exact integer counts
    * and decimal sums; means and the index divide doubles in one fixed
    * sequence, decimal-9 rounded.
    */
  def seasonalProfile(daily: DataFrame, keyCol: String, dayCol: String,
                      valCol: String): DataFrame = {
    val d2012 = org.apache.spark.sql.types.DecimalType(20, 12)
    val acc = org.apache.spark.sql.types.DecimalType(28, 6)
    def round9(c: org.apache.spark.sql.Column) =
      round(c.cast(d2012), 9).cast("double")
    val byDow = daily
      .groupBy(col(keyCol), weekday(col(dayCol)).as("dow"))
      .agg(count(lit(1)).as("n_days"),
        sum(col(valCol).cast(acc)).as("sum_v"))
    val totals = byDow.groupBy(col(keyCol))
      .agg(sum("n_days").as("n_all"), sum("sum_v").as("sum_all"))
    val mDow = col("sum_v").cast("double") / col("n_days").cast("double")
    val mAll = col("sum_all").cast("double") / col("n_all").cast("double")
    byDow.join(broadcast(totals), Seq(keyCol))
      .select(col(keyCol), col("dow"), col("n_days"),
        round9(mDow).as("mean_value"),
        round9(mDow / mAll).as("seasonal_index"))
      .orderBy(keyCol, "dow")
  }

  /** [[seasonalProfile]] over the per-mode daily units series. */
  def dailySalesSeasonality(sales: DataFrame): DataFrame =
    seasonalProfile(dailyUnits(sales), "payment_mode", "sale_date",
      "daily_total")

  /** Mutual information between two categorical columns — the
    * feature-relevance screen before training on event attributes
    * (MI(x;y)=0 means y carries no signal about x; dashboards rank
    * candidate features by it):
    *
    *   MI = Σ_cells p(x,y) · ln( p(x,y) / (p(x)·p(y)) )
    *
    * Shape: ONE corpus aggregation to the contingency table, then
    * cell-grain frames only — marginals are grouped off the cells (not
    * the corpus) and broadcast back; at 100 TB the fact is touched once
    * and everything downstream is |x|·|y|-sized. Determinism follows
    * the PSI discipline: exact integer counts, IEEE-exact divisions,
    * each ln decimal-rounded to 9 places, terms re-rounded, total
    * decimal-summed.
    *
    * @return one row per observed cell (x, y, n, term) with the
    *         repeated decimal-summed `mi` total, ordered by (x, y)
    */
  def mutualInformation(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val d2012 = org.apache.spark.sql.types.DecimalType(20, 12)
    val acc = org.apache.spark.sql.types.DecimalType(28, 12)
    def round9(c: org.apache.spark.sql.Column) =
      round(c.cast(d2012), 9).cast("double")
    val cells = df.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("n"))
    // Marginals, total and the MI sum are all aggregates OVER the
    // |x|·|y|-bounded cell frame — computed as windows on that frame
    // (marginals keyed, totals unpartitioned) so the corpus aggregation
    // runs exactly once. The previous broadcast-marginal form
    // re-evaluated the cells subtree once per broadcast side (the
    // q_benford finding: 4+ corpus scans for a cell-sized answer).
    val wX = org.apache.spark.sql.expressions.Window.partitionBy("x")
    val wY = org.apache.spark.sql.expressions.Window.partitionBy("y")
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
    cells
      .withColumn("nn", sum("n").over(wAll))
      .withColumn("pxy", col("n").cast("double") / col("nn").cast("double"))
      .withColumn("px",
        sum("n").over(wX).cast("double") / col("nn").cast("double"))
      .withColumn("py",
        sum("n").over(wY).cast("double") / col("nn").cast("double"))
      .withColumn("term",
        round9(col("pxy") * round9(log(col("pxy") / (col("px") * col("py"))))))
      .withColumn("mi", sum(col("term").cast(acc)).over(wAll).cast("double"))
      .select(col("x"), col("y"), col("n"), col("term"), col("mi"))
      .orderBy("x", "y")
  }

  /** Per-key ordinary-least-squares trend over a daily series — the
    * "is this metric growing?" fit behind every volume dashboard, and at
    * pipeline scale the per-source ingest-trend monitor next to
    * [[ewmaAnomaly]] (EWMA flags spikes; the OLS slope names the drift).
    *
    * Closed-form over exact sums: with x the integer day index (epoch
    * base 2000-01-01 — absolute, so no per-key min join) and y the
    * daily value as an exact decimal,
    *
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    *   intercept = (Σy·Σx² − Σx·Σxy) / (n·Σx² − (Σx)²)
    *   r² = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)·(n·Σy² − (Σy)²))
    *
    * Every Σ crosses an order-free exact accumulator (BIGINT for the
    * integer x moments, DECIMAL for the y ones), so partial aggregation
    * order can't move a bit; the assembled moments are THEN cast to
    * double and combined in one fixed IEEE sequence, decimal-9 rounded —
    * the [[mutualInformation]] determinism discipline. Zero-variance
    * keys (den = 0) emit NULL fit columns rather than an engine-specific
    * inf/NaN.
    *
    * Shape: one corpus aggregation to (key, day) grain, then key-grain
    * moments — the fact is touched once; nothing downstream exceeds
    * (keys × days).
    */
  def trendFit(daily: DataFrame, keyCol: String, dayCol: String,
               valCol: String): DataFrame = {
    // (18,6) keeps y·y at precision 37 ≤ 38: EXACT decimal products on
    // both engines — a (38,6) accumulator would push products into
    // Spark's precision-loss scale reduction, a cross-engine cliff
    val Acc = org.apache.spark.sql.types.DecimalType(18, 6)
    val d2012 = org.apache.spark.sql.types.DecimalType(20, 12)
    def round9(c: org.apache.spark.sql.Column) =
      round(c.cast(d2012), 9).cast("double")
    val m = daily
      .select(col(keyCol),
        datediff(col(dayCol), lit(java.sql.Date.valueOf("2000-01-01")))
          .cast("long").as("x"),
        col(valCol).cast(Acc).as("y"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        sum("y").as("sy"),
        sum(col("y") * col("x")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
    // exact moments → double, one fixed IEEE sequence per fit column
    val n = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val num = n * d("sxy") - d("sx") * d("sy")
    val den = n * d("sxx") - d("sx") * d("sx")
    val deny = n * d("syy") - d("sy") * d("sy")
    m.select(col(keyCol), col("n").as("n_days"),
        when(den > 0, round9(num / den)).as("slope"),
        when(den > 0,
          round9((d("sy") * d("sxx") - d("sx") * d("sxy")) / den))
          .as("intercept"),
        when(den > 0 && deny > 0, round9(num * num / (den * deny)))
          .as("r2"))
      .orderBy(keyCol)
  }

  /** [[trendFit]] over the per-payment-mode daily units series (the
    * same daily frame [[dailySalesEwma]] smooths).
    */
  def dailySalesTrend(sales: DataFrame): DataFrame =
    trendFit(dailyUnits(sales), "payment_mode", "sale_date", "daily_total")

  /** Pearson chi-squared test of independence between two categorical
    * columns, with Cramér's V — [[mutualInformation]]'s
    * significance-flavored twin (MI ranks the signal, χ² says whether
    * the association clears noise; V normalizes it to [0,1] across
    * tables of different shape).
    *
    *   χ² = Σ_cells (n − e)²/e,  e = nx·ny/nn
    *   V  = sqrt(χ² / (nn · min(R−1, C−1)))
    *
    * Same contingency-table shape as MI: ONE corpus aggregation to
    * cells, marginals grouped off the cells and broadcast back, exact
    * integer counts, per-cell terms decimal-9 rounded, decimal-summed
    * total, IEEE-exact sqrt. Cells with zero expected count cannot occur
    * (observed cells have nx, ny ≥ n ≥ 1).
    *
    * @return one cell-grain row (x, y, n, expected, term) with the
    *         table-level chi2, dof, and cramers_v repeated, (x, y)-ordered
    */
  def chiSquare(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val d2012 = org.apache.spark.sql.types.DecimalType(20, 12)
    val acc = org.apache.spark.sql.types.DecimalType(28, 12)
    def round9(c: org.apache.spark.sql.Column) =
      round(c.cast(d2012), 9).cast("double")
    // The R×C grid fill needs the cell frame from several branches
    // (both marginals, the total, the zero-fill join, the table agg) —
    // each crossBroadcast side re-evaluates its subtree, so an uncached
    // cell frame re-runs the corpus aggregation per branch (the
    // q_benford finding). Cells are |x|·|y|-bounded by the categorical
    // contract: memoize once, every branch reads the cached frame — but
    // the API accepts arbitrary columns, and a high-cardinality pair
    // makes the cell frame near-fact-sized, so the memo is gated on the
    // source plan-stats size like basket_sets/bigramDocCounts (above
    // the gate each branch re-aggregates: slower, never pins a
    // corpus-sized frame in executor storage).
    val cellsPlan = df.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("n"))
    val cells =
      if (df.queryExecution.optimizedPlan.stats.sizeInBytes < (8L << 30))
        graft.core.PlanMemo.cached("chi2.cells", cellsPlan)
      else cellsPlan
    // χ² runs over the FULL R×C grid: a zero-observed cell with positive
    // expected count contributes (0−e)²/e — dropping it (as MI correctly
    // does, 0·ln0 → 0) would understate association. The grid is the
    // cross product of the two marginal frames — cell-grain tiny, built
    // as a constant-key hash join (crossBroadcast), not a nested loop.
    // Table-level values (nn, r, c, chi2, cramers_v) ride unpartitioned
    // windows over the grid-sized frames instead of further broadcast
    // seams: each crossBroadcast side is a separate broadcast JOB, and
    // the old xm/ym/tot/table chain stacked ~10 of them — ~0.8 s of pure
    // job overhead at any SF for a 40-row answer (ProbeChi at sf1:
    // 1.07 s → ~0.35 s with two broadcasts and the same memoized cells).
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
    val xm = cells.groupBy("x").agg(sum("n").as("nx"))
      .withColumn("r", count(lit(1)).over(wAll))
      .withColumn("nn", sum("nx").over(wAll))
    val ym = cells.groupBy("y").agg(sum("n").as("ny"))
      .withColumn("c", count(lit(1)).over(wAll))
    val grid = graft.core.Scalars.crossBroadcast(xm, ym)
      .join(broadcast(cells), Seq("x", "y"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val terms = grid
      .withColumn("expected", round9(
        col("nx").cast("double") * col("ny").cast("double")
          / col("nn").cast("double")))
      .withColumn("term", round9(
        (col("n").cast("double") - col("expected"))
          * (col("n").cast("double") - col("expected")) / col("expected")))
    terms
      .withColumn("chi2",
        sum(col("term").cast(acc)).over(wAll).cast("double"))
      .select(col("x"), col("y"), col("n"), col("expected"), col("term"),
        col("chi2"),
        ((col("r") - 1) * (col("c") - 1)).as("dof"),
        round9(sqrt(col("chi2") / (col("nn").cast("double")
          * least(col("r") - 1, col("c") - 1).cast("double"))))
          .as("cramers_v"))
      .orderBy("x", "y")
  }

  /** Recency-weighted activity score: per key, Σ value · 2^(−⌊age/halfLife⌋)
    * — the decayed engagement/value metric ranking users (or sources) by
    * recent activity without a full time-series model.
    *
    * The weight is a POWER OF TWO by construction: bucketed integer age
    * makes the decay factor 2^(−b), and dividing an IEEE double by 2^b
    * only decrements the exponent — exact on both engines, no libm pow
    * in sight (a fractional-exponent decay would hang cross-engine
    * determinism on two pow implementations). Weighted terms then cross
    * the usual order-free decimal accumulator.
    *
    * Shape: one narrow projection + one key-grain aggregation — a single
    * corpus pass, no windows, no joins.
    *
    * @param anchor  "now" for age computation (data-set fixed so runs
    *                reproduce); rows after the anchor clamp to age 0
    * @param halfLifeDays bucket width b = ⌊age/halfLife⌋, clamped to
    *                [0, 62]: a JVM `1L << b` MASKS the shift amount mod
    *                64 (bucket 64 would silently weigh a decade-old row
    *                at FULL weight), and 2⁻⁶² ≈ 2·10⁻¹⁹ is zero at any
    *                aggregation scale — the clamp is both the overflow
    *                guard and semantically free
    */
  def recencyScore(df: DataFrame, keyCol: String, tsCol: String,
                   valCol: String, anchor: java.sql.Date,
                   halfLifeDays: Int): DataFrame = {
    require(halfLifeDays > 0, s"recencyScore: halfLife $halfLifeDays")
    val Acc = org.apache.spark.sql.types.DecimalType(38, 12)
    val bucket = least(greatest(
      floor(datediff(lit(anchor), col(tsCol).cast("date"))
        / halfLifeDays), lit(0)), lit(62)).cast("int")
    df.select(col(keyCol),
        (col(valCol).cast("double")
          / call_function("shiftleft", lit(1L), bucket).cast("double"))
          .as("w"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("w").cast(Acc)), 2).cast("double").as("score"))
      .orderBy(keyCol)
  }

  /** Pareto / ABC concentration analysis with the Gini coefficient
    * riding along — "which customers are the 80 %" plus the one-number
    * inequality summary:
    *
    *   class A while cumulative revenue share ≤ 0.80, B ≤ 0.95, C rest;
    *   G = 2·Σⱼ j·xⱼ / (n·Σx) − (n+1)/n   (x ascending, rank j)
    *
    * Determinism: the per-key revenue is the 2-dp money double, cast
    * BACK to DECIMAL(38,6) (exact) as the basis for the cumulative and
    * rank-weighted sums — decimal windows/aggregates are order-free
    * exact, the final shares/G divide doubles decimal-9 rounded, and
    * both rank orders are tie-broken by key. Shape: one fact
    * aggregation to key grain, then key-grain windows (the RFM
    * single-partition-rank note applies).
    */
  def paretoAbc(orders: DataFrame, aShare: Double = 0.80,
                bShare: Double = 0.95): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(aShare > 0 && aShare < bShare && bShare < 1,
      s"paretoAbc: bad thresholds $aShare/$bShare")
    val d2012 = org.apache.spark.sql.types.DecimalType(20, 12)
    // (18,2): exact for 2-dp money, and products with DECIMAL(10,0)
    // ranks stay inside precision 38 on BOTH engines (a (38,6) basis
    // would push rank products into precision-loss territory)
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    def round9(c: org.apache.spark.sql.Column) =
      round(c.cast(d2012), 9).cast("double")
    val base = orders.groupBy(col("o_custkey").as("customer_id"))
      .agg(Money.round2(Money.moneySum(col("o_totalprice"))).as("monetary"))
      .withColumn("m_dec", col("monetary").cast(dec))
    val byDesc = Window.orderBy(col("monetary").desc, col("customer_id").asc)
    val byAsc = Window.orderBy(col("monetary").asc, col("customer_id").asc)
    val ranked = base.withColumn("j", row_number().over(byAsc)
      .cast(org.apache.spark.sql.types.DecimalType(10, 0)))
    // totals as unpartitioned windows over the SAME frame the cum
    // window already single-partitions (the crossBroadcast form
    // re-evaluated the fact aggregation for its broadcast side — one
    // extra orders pass for three scalars); the global-order window is
    // this operator's inherent shape (range-partitioned ranking at
    // 100 TB, per the RFM note), so the total/n/rank_weighted windows
    // add zero exchanges
    val wAll = Window.partitionBy(lit(0))
    ranked
      .withColumn("cum",
        sum("m_dec").over(byDesc.rowsBetween(
          Window.unboundedPreceding, 0)))
      .withColumn("total", sum("m_dec").over(wAll))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("rank_weighted", sum(col("m_dec") * col("j")).over(wAll))
      .select(col("customer_id"), col("monetary"),
        round9(col("cum").cast("double") / col("total").cast("double"))
          .as("cum_share"),
        col("n"), col("total"), col("rank_weighted"))
      .withColumn("abc_class",
        when(col("cum_share") <= aShare, "A")
          .when(col("cum_share") <= bShare, "B")
          .otherwise("C"))
      .withColumn("gini",
        round9(lit(2.0) * col("rank_weighted").cast("double")
          / (col("n").cast("double") * col("total").cast("double"))
          - (col("n").cast("double") + lit(1.0)) / col("n").cast("double")))
      .select("customer_id", "monetary", "cum_share", "abc_class", "gini")
      .orderBy("customer_id")
  }

  /** Benford first-digit audit — the fraud / fabricated-data screen an
    * ingest pipeline runs over money-like columns: naturally occurring
    * multiplicative amounts follow P(d) = log₁₀(1 + 1/d); invented or
    * truncated figures don't. Emits the per-digit observed share vs
    * the Benford expectation and their absolute deviation, with the
    * mean absolute deviation (the standard conformity statistic)
    * riding along.
    *
    * The first significant digit comes from the DECIMAL(18,2) STRING
    * rendering (first [1-9]) — exact on both engines, where a
    * log₁₀/power extraction would hang the digit on libm rounding at
    * powers of ten. Counts are exact; shares and the log expectations
    * divide/evaluate in doubles decimal-9 rounded; the MAD crosses an
    * order-free decimal accumulator. Non-positive rows are excluded
    * (Benford is defined on magnitudes).
    */
  def benford(df: DataFrame, valCol: String): DataFrame = {
    val d2012 = org.apache.spark.sql.types.DecimalType(20, 12)
    val acc = org.apache.spark.sql.types.DecimalType(28, 12)
    def round9(c: org.apache.spark.sql.Column) =
      round(c.cast(d2012), 9).cast("double")
    val digit = regexp_extract(
      col(valCol).cast(org.apache.spark.sql.types.DecimalType(18, 2))
        .cast("string"), "[1-9]", 0).cast("int")
    // Values in (0, 0.005) render as "0.00" — no [1-9] anywhere — and
    // would form a NULL digit group; Benford's law is about nonzero
    // leading digits, so that group is dropped explicitly (the SQL twin
    // TRY_CASTs and filters the same way, keeping both engines total on
    // any positive input rather than crashing on sub-cent values).
    val counts = df.filter(col(valCol) > 0)
      .select(digit.as("digit"))
      .filter(col("digit").isNotNull)
      .groupBy("digit").agg(count(lit(1)).as("n"))
    // The totals (nn, mad) are whole-frame aggregates over the ≤9-row
    // digit frame — computed as unpartitioned windows OVER that frame so
    // the base scan runs exactly once. The previous crossBroadcast form
    // re-evaluated the counts subtree once per broadcast side (4 scans
    // of the fact for one 9-row answer: ProfCm-style attribution at sf1
    // measured 1.65 s → this form ~0.4 s). 9 rows on one partition is
    // the intended degenerate window.
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
    counts
      .withColumn("observed",
        round9(col("n").cast("double")
          / sum("n").over(wAll).cast("double")))
      .withColumn("expected", round9(
        log(lit(1.0) + lit(1.0) / col("digit").cast("double"))
          / log(lit(10.0))))
      .withColumn("deviation",
        round9(abs(col("observed") - col("expected"))))
      .withColumn("mad",
        round9(sum(col("deviation").cast(acc)).over(wAll).cast("double")
          / count(lit(1)).over(wAll).cast("double")))
      .select("digit", "n", "observed", "expected", "deviation", "mad")
      .orderBy("digit")
  }

  /** RFM customer segmentation — the classic lifecycle grid: per
    * customer, Recency (days since last purchase), Frequency (order
    * lines), Monetary (decimal-summed spend), each cut into quintiles
    * over a TIE-BROKEN total order (metric, then customer_id — ntile
    * over a non-total order is nondeterministic by partition layout,
    * the usual RFM-in-SQL trap). Quintile 1 is the BEST bucket on every
    * axis (most recent / most frequent / highest spend); `segment`
    * concatenates the three codes.
    *
    * Shape: one fact aggregation to customer grain, then three
    * customer-grain window ranks — ntile's single-partition window is
    * customer-grain, and at 100 TB becomes a range-partitioned rank
    * (the ts_shards argument) — nothing corpus-grain past the first
    * aggregation.
    */
  def rfm(orders: DataFrame, anchor: java.sql.Date): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = orders.groupBy(col("o_custkey").as("customer_id"))
      .agg(datediff(lit(anchor), max(col("o_orderdate").cast("date")))
          .as("recency_days"),
        count(lit(1)).as("frequency"),
        Money.round2(Money.moneySum(col("o_totalprice"))).as("monetary"))
    base
      .withColumn("r_quintile", ntile(5).over(
        Window.orderBy(col("recency_days").asc, col("customer_id").asc)))
      .withColumn("f_quintile", ntile(5).over(
        Window.orderBy(col("frequency").desc, col("customer_id").asc)))
      .withColumn("m_quintile", ntile(5).over(
        Window.orderBy(col("monetary").desc, col("customer_id").asc)))
      .withColumn("segment", concat(col("r_quintile"), col("f_quintile"),
        col("m_quintile")))
      .orderBy("customer_id")
  }

  /** Laplace-noised count release — the differential-privacy-shaped
    * publication step next to the k-anonymity/l-diversity audits: each
    * group's exact count is released with additive Laplace(b) noise
    * (b = sensitivity/ε; counts have sensitivity 1). The noise draw is
    * DETERMINISTIC — an md5-derived uniform per group key (the
    * engine's seeded-randomness idiom, as in the A-ES sampler) through
    * the inverse CDF `−b·sign(u−½)·ln(1−2|u−½|)` — so runs reproduce
    * and the oracle twin re-derives every draw; a production release
    * would swap in a CSPRNG draw per release, which is the ONE line
    * that changes. ln rides the decimal-9 guard (libm), everything
    * else is exact.
    *
    * Shape: one aggregation at group grain, then per-row arithmetic.
    */
  /* Null key values must fail loudly, not collide: concat_ws SKIPS
   * nulls, so (null, "x") and ("x", null) would share one seed — two
   * releases drawing the SAME noise, which quietly halves the privacy
   * the two draws were supposed to provide. The guard below raises
   * in-plan on the first null key row; callers coalesce first. */
  def laplaceNoisedCounts(df: DataFrame, keyCols: Seq[String],
                          b: Double): DataFrame = {
    require(keyCols.nonEmpty && b > 0,
      s"laplaceNoisedCounts: keys $keyCols, scale $b")
    val d2012 = org.apache.spark.sql.types.DecimalType(20, 12)
    def round9(c: org.apache.spark.sql.Column) =
      round(c.cast(d2012), 9).cast("double")
    val anyNull = keyCols.map(col(_).isNull).reduce(_ || _)
    val keyStr = when(anyNull, raise_error(lit(
      "laplaceNoisedCounts: NULL key value — coalesce key columns " +
        "first (NULL-skipping seed concat would collide draws)")))
      .otherwise(concat_ws(":",
        keyCols.map(c => col(c).cast("string")) :+ lit("dp"): _*))
    val u = (conv(substring(md5(keyStr), 1, 8), 16, 10)
      .cast("long").cast("double") + lit(0.5)) / lit(4294967296.0)
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("noise", round9(
        lit(-b) * signum(u - lit(0.5))
          * log(lit(1.0) - lit(2.0) * abs(u - lit(0.5)))))
      .withColumn("noised",
        round9(col("n").cast("double") + col("noise")))
      .orderBy(keyCols.head, keyCols.tail: _*)
  }

  /** Market-basket association rules over 2-item sets: for part pairs
    * co-occurring in the same order, support, directional confidence,
    * and lift — the co-purchase affinity feeding "bought together"
    * recommendations (and, on a training corpus, tag/domain
    * co-occurrence mining; same algebra).
    *
    * Candidate generation is the classic scale trap: pairs per basket
    * grow quadratically in basket size, so baskets above `maxBasket`
    * items are DROPPED before pairing (the standard cap — a 10k-item
    * basket is a bot/aggregator, not affinity signal; the analogue of
    * the dedup stack's `maxDf` stop-shingle caps, and the oracle twin
    * applies the identical cap so the semantics stay pinned). One fact
    * shuffle builds per-basket distinct-item sets; the pair self-join
    * re-explodes them and joins on orderkey zero-exchange — never
    * all-pairs across baskets. Rules below `minSupport` occurrences
    * drop.
    *
    * Determinism: counts are exact integers; support/confidence/lift
    * divide them in doubles, decimal-9 rounded. Lift is computed as
    * n·N/(na·nb) in one sequence (confidence/expected would re-divide a
    * rounded value).
    *
    * @return (part_a, part_b, n_pair, n_a, n_b, support, conf_ab,
    *         conf_ba, lift), part_a < part_b, ordered
    */
  def basketRules(lineitem: DataFrame, minSupport: Int = 2,
                  maxBasket: Int = 100): DataFrame = {
    val d2012 = org.apache.spark.sql.types.DecimalType(20, 12)
    def round9(c: org.apache.spark.sql.Column) =
      round(c.cast(d2012), 9).cast("double")
    // ONE aggregation builds the basket sets: collect_set(pk) by order
    // IS the per-basket distinct, so the former distinct → basket-size
    // groupBy → size-filter join-back chain (three shuffles of the
    // fact-grain frame) collapses to a single fact shuffle, memoized
    // across the three consumers. Pairs come from re-exploding the
    // cached baskets and self-joining on ok — the agg output is
    // already hash-partitioned by ok and explode preserves it, so the
    // join is ZERO-EXCHANGE; the codegen'd join beats the in-place
    // array-HOF expansion of the same pairs by ~2× (interpreted
    // lambdas — measured, ProfAssoc: 1.05 s vs 1.98 s for the
    // packed-long HOF form at sf1; old shape 2.5 s warm, this 1.3 s).
    val basketsPlan = lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy("ok").agg(sort_array(collect_set(col("pk"))).as("ps"))
      .filter(size(col("ps")) <= maxBasket)
    // size-gated on the fact scan (an order-grain basket frame is not
    // pinnable at 100 TB — the duplicateSpans rule); below the gate the
    // memo serves the three consumers, above it the plan recomputes
    val factSmall =
      lineitem.queryExecution.optimizedPlan.stats.sizeInBytes < (8L << 30)
    val baskets =
      if (factSmall) graft.core.PlanMemo.cached("basket_sets", basketsPlan)
      else basketsPlan
    val nBaskets = baskets.agg(count(lit(1)).as("n_baskets"))
    val ex = baskets.select(col("ok"), explode(col("ps")).as("pk"))
    val pairs = ex.select(col("ok"), col("pk").as("part_a"))
      .join(ex.select(col("ok"), col("pk").as("part_b")), Seq("ok"))
      .filter(col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minSupport)
    val itemCountsPlan = ex.groupBy(col("pk")).agg(count(lit(1)).as("n_item"))
    // item-grain counts have TWO broadcast consumers (part_a / part_b
    // probes): memoized under the same gate as the basket memo, so each
    // broadcast build scans an item-dictionary-sized cache instead of
    // re-exploding + re-aggregating the basket cache twice
    val itemCounts =
      if (factSmall)
        graft.core.PlanMemo.cached("assoc_item_counts", itemCountsPlan)
      else itemCountsPlan
    // item-grain counts broadcast only while the FACT scan is small
    // (the same gate as the memo above): the item dictionary of a
    // 100 TB fact is itself huge, and an ungated broadcast would OOM
    // the driver — past the gate these degrade to shuffle joins on the
    // pair frame's existing partitioning
    val bcastIfSmall: DataFrame => DataFrame =
      if (factSmall) broadcast(_) else identity
    graft.core.Scalars.crossBroadcast(
      pairs
        .join(bcastIfSmall(itemCounts.select(col("pk").as("part_a"),
          col("n_item").as("n_a"))), Seq("part_a"))
        .join(bcastIfSmall(itemCounts.select(col("pk").as("part_b"),
          col("n_item").as("n_b"))), Seq("part_b")), nBaskets)
      .select(col("part_a"), col("part_b"), col("n_pair"),
        col("n_a"), col("n_b"),
        round9(col("n_pair").cast("double")
          / col("n_baskets").cast("double")).as("support"),
        round9(col("n_pair").cast("double") / col("n_a").cast("double"))
          .as("conf_ab"),
        round9(col("n_pair").cast("double") / col("n_b").cast("double"))
          .as("conf_ba"),
        round9(col("n_pair").cast("double") * col("n_baskets").cast("double")
          / (col("n_a").cast("double") * col("n_b").cast("double")))
          .as("lift"))
      .orderBy("part_a", "part_b")
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: P(next event type | current event type). The
    * behavioral-analytics companion to [[funnel]] — funnel counts a
    * FIXED path, transitions measure every observed step, feeding
    * next-action models and drop-off diagnostics.
    *
    * Shape: one user-keyed window (lead over (ts, event_id) — the same
    * single fact shuffle every user-grain operator here pays), then
    * type-pair-grain frames only. Transition probabilities divide
    * exact counts; row ends (a user's last event) drop out via the
    * lead null.
    *
    * @return (from_type, to_type, n, p) ordered by (from, to)
    */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val steps = events
      .withColumn("to_type", lead("event_type", 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val fromTotals = steps.groupBy("from_type").agg(sum("n").as("n_from"))
    steps.join(broadcast(fromTotals), "from_type")
      .withColumn("p",
        round((col("n").cast("double") / col("n_from").cast("double"))
          .cast(org.apache.spark.sql.types.DecimalType(20, 12)), 9)
          .cast("double"))
      .select("from_type", "to_type", "n", "p")
      .orderBy("from_type", "to_type")
  }
}
