package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.TestSpark

class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // u1 converts fully in order; u2 clicks BEFORE ever viewing (the
  // click must not count); u3 purchases before clicking (stages 1-2
  // only); u4 clicks at the exact view instant (at-or-after counts)
  // and purchased before everything (must not count)
  private val events = Seq(
    (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
    (2L, ts("2024-01-01 10:05:00"), 1L, "click"),
    (3L, ts("2024-01-01 10:10:00"), 1L, "purchase"),
    (4L, ts("2024-01-01 09:00:00"), 2L, "click"),
    (5L, ts("2024-01-01 09:30:00"), 2L, "view"),
    (6L, ts("2024-01-01 08:00:00"), 3L, "purchase"),
    (7L, ts("2024-01-01 08:30:00"), 3L, "view"),
    (8L, ts("2024-01-01 08:45:00"), 3L, "click"),
    (9L, ts("2024-01-01 07:00:00"), 4L, "purchase"),
    (10L, ts("2024-01-01 07:30:00"), 4L, "view"),
    (11L, ts("2024-01-01 07:30:00"), 4L, "click"))
    .toDF("event_id", "ts", "user_id", "event_type")

  test("funnel: ordered semantics with at-or-after stage boundaries") {
    val out = Analytics.funnel(events, Seq("view", "click", "purchase"))
      .collect()
      .map(r => r.getInt(0) ->
        (r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(out(1) == (("view", 4L, 1.0, 1.0)))
    // u1, u3, u4 click at-or-after first view; u2's early click is out
    assert(out(2) == (("click", 3L, 0.75, 0.75)))
    // only u1 purchases after the click chain
    assert(out(3)._1 == "purchase")
    assert(out(3)._2 == 1L)
    assert(out(3)._3 == 0.33, "conversion vs previous stage")
    assert(out(3)._4 == 0.25, "conversion vs funnel top")
  }

  test("funnel: a stage nobody reaches yields a zero row, not absence") {
    val out = Analytics.funnel(events, Seq("view", "signup"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(out(1) == 4L)
    assert(out(2) == 0L, "empty stage must still report its row")
  }

  test("cohortRetention: weekly cohorts, offset-0 diagonal is 1.0") {
    // 2024-01-01 and 2024-01-08 are both Mondays: u1/u2 cohort week 1,
    // u3 cohort week 2; u1 returns in week 2, u2 does not
    val ev = Seq(
      (1L, ts("2024-01-02 10:00:00"), 1L, "view"),
      (2L, ts("2024-01-09 10:00:00"), 1L, "view"),
      (3L, ts("2024-01-03 10:00:00"), 2L, "view"),
      (4L, ts("2024-01-10 10:00:00"), 3L, "view"),
      (5L, ts("2024-01-10 12:00:00"), 3L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Analytics.cohortRetention(ev).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out(("2024-01-01", 0)) == ((2L, 2L, 1.0)))
    assert(out(("2024-01-01", 1)) == ((2L, 1L, 0.5)))
    assert(out(("2024-01-08", 0)) == ((1L, 1L, 1.0)))
    assert(out.size == 3, "no empty cells emitted")
  }

  test("ewmaSmooth replays the recursion per key in date order") {
    import spark.implicits._
    // rows deliberately unordered; k1: e=[10, .3*20+.7*10=13,
    // .3*30+.7*13=18.1]; k2 independent single point
    val daily = Seq(
      ("k1", java.sql.Date.valueOf("2024-01-03"), 30.0),
      ("k1", java.sql.Date.valueOf("2024-01-01"), 10.0),
      ("k2", java.sql.Date.valueOf("2024-01-01"), 5.0),
      ("k1", java.sql.Date.valueOf("2024-01-02"), 20.0))
      .toDF("k", "d", "v")
    val out = Analytics.ewmaSmooth(daily, "k", "d", "v")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(out(("k1", "2024-01-01")) == ((10.0, 10.0)))
    assert(out(("k1", "2024-01-02")) == ((20.0, 13.0)))
    assert(math.abs(out(("k1", "2024-01-03"))._2 - 18.1) < 1e-12)
    assert(out(("k2", "2024-01-01")) == ((5.0, 5.0)))
  }

  test("ewmaAnomaly flags a spike against the forecast residual band") {
    import spark.implicits._
    // 12 flat days of 10 then a spike to 100: every earlier residual is
    // 0, so sigma = sqrt(90^2 / 11) ≈ 27.14 and |90| > 3σ ≈ 81.4 flags
    // exactly the spike; the flat run and the first (NULL-forecast) day
    // stay unflagged
    val daily = ((1 to 12).map(i =>
      ("k", java.sql.Date.valueOf(f"2024-01-$i%02d"), 10.0)) :+
      (("k", java.sql.Date.valueOf("2024-01-13"), 100.0)))
      .toDF("k", "d", "v")
    val out = Analytics.ewmaAnomaly(daily, "k", "d", "v").collect()
      .map(r => r.getDate(1).toString ->
        ((Option(r.get(4)).map(_.asInstanceOf[Double]), r.getBoolean(5))))
      .toMap
    assert(out("2024-01-13")._2, "spike must be flagged")
    assert(out.filter(_._2._2).keySet == Set("2024-01-13"),
      "only the spike is flagged")
    assert(out("2024-01-01")._1.isEmpty, "first day has no forecast")
    val z = out("2024-01-13")._1.get
    assert(math.abs(z - 90.0 / math.sqrt(8100.0 / 11)) < 1e-9, s"z=$z")
  }

  test("ewmaAnomaly: constant series has zero deviation, nothing flagged") {
    import spark.implicits._
    val daily = (1 to 5).map(i =>
      ("k", java.sql.Date.valueOf(f"2024-01-$i%02d"), 7.0))
      .toDF("k", "d", "v")
    val out = Analytics.ewmaAnomaly(daily, "k", "d", "v").collect()
    assert(out.forall(!_.getBoolean(5)), "no flags on a constant series")
    assert(out.forall(r => r.get(4) == null), "z is NULL when sigma is 0")
  }

  test("ewmaSmooth rejects weights that do not sum to one") {
    import spark.implicits._
    val daily = Seq(("k", java.sql.Date.valueOf("2024-01-01"), 1.0))
      .toDF("k", "d", "v")
    val ex = intercept[IllegalArgumentException](
      Analytics.ewmaSmooth(daily, "k", "d", "v", alpha = 0.3,
        oneMinusAlpha = 0.5))
    assert(ex.getMessage.contains("must be 1"))
  }

  test("mutualInformation: independent features score zero") {
    // perfectly independent 2×2 table: every cell p(x,y) = p(x)p(y)
    val rows = for { x <- Seq("a", "b"); y <- Seq(0L, 1L); _ <- 1 to 5 }
      yield (x, y)
    val out = Analytics.mutualInformation(rows.toDF("x", "y"), "x", "y")
    val mi = out.collect().head.getAs[Double]("mi")
    assert(mi == 0.0, s"independent features must carry zero MI, got $mi")
  }

  test("mutualInformation: deterministic mapping reaches the entropy") {
    // y == f(x), two equiprobable values → MI = H(X) = ln 2
    val rows = Seq.fill(10)(("a", 0L)) ++ Seq.fill(10)(("b", 1L))
    val out = Analytics.mutualInformation(rows.toDF("x", "y"), "x", "y")
    val mi = out.collect().head.getAs[Double]("mi")
    assert(math.abs(mi - math.log(2)) < 1e-8, s"mi=$mi vs ln2=${math.log(2)}")
  }

  test("transitionMatrix: counts, probabilities, last-event drop") {
    // u1: v→c→p ; u2: v→v ; u3 single event (emits no transition)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "v"),
      (2L, ts("2024-01-01 10:01:00"), 1L, "c"),
      (3L, ts("2024-01-01 10:02:00"), 1L, "p"),
      (4L, ts("2024-01-01 11:00:00"), 2L, "v"),
      (5L, ts("2024-01-01 11:01:00"), 2L, "v"),
      (6L, ts("2024-01-01 12:00:00"), 3L, "p")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = Analytics.transitionMatrix(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Double]("p"))).toMap
    assert(out(("v", "c")) == (1L, 0.5) && out(("v", "v")) == (1L, 0.5))
    assert(out(("c", "p")) == (1L, 1.0))
    assert(out.size == 3, s"single-event users emit nothing: $out")
  }

  test("transitionMatrix: equal timestamps order by event_id") {
    val t0 = ts("2024-01-01 10:00:00")
    val ev = Seq((2L, t0, 1L, "b"), (1L, t0, 1L, "a"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Analytics.transitionMatrix(ev).collect()
    assert(out.length == 1 && out.head.getString(0) == "a" &&
      out.head.getString(1) == "b", out.mkString(","))
  }

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("trendFit recovers an exact line with r2 = 1") {
    // y = 2x + 5 with x the day offset from 2000-01-01
    val daily = Seq(1, 2, 5, 9).map(x =>
      ("k", d("2000-01-01").toLocalDate.plusDays(x).toString, 2.0 * x + 5))
      .map { case (k, ds, y) => (k, d(ds), y) }
      .toDF("k", "day", "v")
    val r = Analytics.trendFit(daily, "k", "day", "v").collect().head
    assert(r.getAs[Long]("n_days") == 4L)
    assert(r.getAs[Double]("slope") == 2.0)
    assert(r.getAs[Double]("intercept") == 5.0)
    assert(r.getAs[Double]("r2") == 1.0)
  }

  test("trendFit: constant series has zero slope and NULL r2") {
    val daily = Seq(1, 2, 3).map(x =>
      ("k", d("2000-01-01").toLocalDate.plusDays(x).toString, 7.0))
      .map { case (k, ds, y) => (k, d(ds), y) }
      .toDF("k", "day", "v")
    val r = Analytics.trendFit(daily, "k", "day", "v").collect().head
    assert(r.getAs[Double]("slope") == 0.0)
    assert(r.getAs[Double]("intercept") == 7.0)
    assert(r.get(r.fieldIndex("r2")) == null, "zero y-variance ⇒ NULL r2")
  }

  test("trendFit: a single point cannot be fit — NULL columns, no NaN") {
    val daily = Seq(("k", d("2000-01-05"), 3.0)).toDF("k", "day", "v")
    val r = Analytics.trendFit(daily, "k", "day", "v").collect().head
    assert(r.get(r.fieldIndex("slope")) == null)
    assert(r.get(r.fieldIndex("intercept")) == null)
    assert(r.get(r.fieldIndex("r2")) == null)
  }

  test("chiSquare: independence scores zero, perfect association V = 1") {
    val indep = (for { x <- Seq("a", "b"); y <- Seq(0L, 1L); _ <- 1 to 5 }
      yield (x, y)).toDF("x", "y")
    val r0 = Analytics.chiSquare(indep, "x", "y").collect().head
    assert(r0.getAs[Double]("chi2") == 0.0)
    assert(r0.getAs[Double]("cramers_v") == 0.0)
    assert(r0.getAs[Long]("dof") == 1L)

    // diagonal 2×2: chi2 = nn·min(R−1,C−1) = 20, V = 1 — and the two
    // ZERO-observed cells must appear with term (0−5)²/5 = 5, not drop
    val assoc = (Seq.fill(10)(("a", 0L)) ++ Seq.fill(10)(("b", 1L)))
      .toDF("x", "y")
    val rows = Analytics.chiSquare(assoc, "x", "y").collect()
    assert(rows.length == 4, "full R×C grid, zero cells included")
    val byCell = rows.map(r => (r.getString(0), r.getLong(1)) ->
      ((r.getAs[Long]("n"), r.getAs[Double]("term")))).toMap
    assert(byCell(("a", 1L)) == ((0L, 5.0)), s"zero cell term: $byCell")
    val r1 = rows.head
    assert(r1.getAs[Double]("chi2") == 20.0, r1.toString)
    assert(r1.getAs[Double]("cramers_v") == 1.0)
  }

  test("chiSquare: expected counts come from the marginals") {
    // 2×2 with skewed marginals: row a 30, row b 10; col 0 20, col 1 20
    val rows = Seq.fill(15)(("a", 0L)) ++ Seq.fill(15)(("a", 1L)) ++
      Seq.fill(5)(("b", 0L)) ++ Seq.fill(5)(("b", 1L))
    val out = Analytics.chiSquare(rows.toDF("x", "y"), "x", "y").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getAs[Double]("expected"))
      .toMap
    assert(out(("a", 0L)) == 15.0 && out(("b", 1L)) == 5.0,
      s"expected = nx·ny/nn: $out")
  }

  test("recencyScore: power-of-two decay, future rows clamp to weight 1") {
    val ev = Seq(
      ("u1", ts("2024-01-30 10:00:00"), 8.0),  // 2 days old, bucket 0
      ("u1", ts("2024-01-10 10:00:00"), 8.0),  // 22 days old, bucket 3 → /8
      ("u2", ts("2024-02-05 10:00:00"), 4.0),  // after anchor → bucket 0
      ("u3", ts("1970-01-01 00:00:00"), 8.0))  // ancient → bucket clamps 62
      .toDF("k", "ts", "v")
    val out = Analytics.recencyScore(ev, "k", "ts", "v",
      d("2024-02-01"), 7).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out("u1") == ((2L, 9.0)), s"8 + 8/8: $out")
    assert(out("u2") == ((1L, 4.0)), s"future event keeps full weight: $out")
    // without the 62-clamp the JVM shift masks mod 64 and an ancient
    // row would come back at FULL weight; clamped it rounds to zero
    assert(out("u3") == ((1L, 0.0)), s"ancient row must decay out: $out")
  }

  test("recencyScore rejects a non-positive half-life") {
    val ev = Seq(("u", ts("2024-01-01 00:00:00"), 1.0)).toDF("k", "ts", "v")
    intercept[IllegalArgumentException](
      Analytics.recencyScore(ev, "k", "ts", "v", d("2024-02-01"), 0))
  }

  test("abTest: rates, pooled-SE z, hand-checked") {
    import org.apache.spark.sql.functions.{col, lit}
    // A = even users {2,4,6,8}: 2 and 4 convert; B = odd {1,3,5,7}: 1 does
    val ev = (1L to 8L).map(u => (u * 10, ts("2024-01-01 10:00:00"), u,
      "view")) ++ Seq(2L, 4L, 1L).map(u =>
      (u * 10 + 1, ts("2024-01-01 11:00:00"), u, "purchase"))
    val r = Analytics.abTest(
      ev.toDF("event_id", "ts", "user_id", "event_type"),
      col("user_id") % 2 === 0).collect().head
    assert(r.getAs[Long]("n_a") == 4 && r.getAs[Long]("n_b") == 4)
    assert(r.getAs[Double]("p_a") == 0.5 && r.getAs[Double]("p_b") == 0.25)
    assert(r.getAs[Double]("lift") == 0.25)
    // z = 0.25 / sqrt(0.375·0.625·(1/4+1/4)) = 0.730296743…
    assert(r.getAs[Double]("z") == 0.730296743, s"z=${r.getAs[Double]("z")}")

    // degenerate: empty B arm and zero pooled SE both yield NULL, not NaN
    val allA = Analytics.abTest(
      ev.toDF("event_id", "ts", "user_id", "event_type"), lit(true))
      .collect().head
    assert(allA.get(allA.fieldIndex("p_b")) == null &&
      allA.get(allA.fieldIndex("z")) == null)
    val noConv = Analytics.abTest(
      ev.filter(_._4 == "view")
        .toDF("event_id", "ts", "user_id", "event_type"),
      col("user_id") % 2 === 0).collect().head
    assert(noConv.get(noConv.fieldIndex("z")) == null,
      "zero pooled variance must not divide")
  }

  test("holtSmooth replays the coupled level/trend recursion") {
    val daily = Seq(
      ("k", d("2024-01-03"), 30.0),
      ("k", d("2024-01-01"), 10.0),
      ("k", d("2024-01-02"), 20.0))
      .toDF("k", "day", "v")
    val out = Analytics.holtSmooth(daily, "k", "day", "v").collect()
      .map(r => r.getDate(1).toString ->
        ((r.getDouble(3), r.getDouble(4)))).toMap
    assert(out("2024-01-01") == ((10.0, 0.0)))
    // l2 = .3·20+.7·10 = 13, b2 = .2·3 = 0.6
    assert(out("2024-01-02") == ((13.0, 0.6)))
    // l3 = .3·30+.7·13.6 = 18.52, b3 = .2·5.52+.8·0.6 = 1.584
    assert(out("2024-01-03") == ((18.52, 1.584)), out.toString)
  }

  test("holtSmooth rejects unpaired weights") {
    val daily = Seq(("k", d("2024-01-01"), 1.0)).toDF("k", "day", "v")
    intercept[IllegalArgumentException](
      Analytics.holtSmooth(daily, "k", "day", "v", beta = 0.2,
        oneMinusBeta = 0.5))
  }

  test("cusum accumulates a persistent shift EWMA-style outliers miss") {
    // 10 days at 100, then 10 days at 130: each +30 day is well under
    // any 3σ outlier bar, but CUSUM ramps once the shift starts.
    // μ = 115, slack 5 ⇒ pre-shift increments are 100−120 = −20
    // (clamped at 0); post-shift increments are +10 per day.
    val daily = ((1 to 10).map(i =>
      ("k", d(f"2024-01-$i%02d"), 100.0)) ++ (11 to 20).map(i =>
      ("k", d(f"2024-01-$i%02d"), 130.0))).toDF("k", "day", "v")
    val out = Analytics.cusum(daily, "k", "day", "v",
      slack = 5.0, threshold = 45.0).collect()
      .map(r => r.getDate(1).toString ->
        ((r.getDouble(4), r.getBoolean(5)))).toMap
    assert(out("2024-01-10") == ((0.0, false)), "flat run stays clamped")
    assert(out("2024-01-11") == ((10.0, false)), "shift starts the ramp")
    assert(out("2024-01-15") == ((50.0, true)),
      "five shifted days cross the threshold")
    assert(out("2024-01-20") == ((100.0, true)), "ramp keeps climbing")
    assert(out.count(_._2._2) == 6, "exactly the post-crossing days flag")
  }

  test("seasonalProfile: weekday means and index against the key mean") {
    // two Mondays at 10, one Tuesday at 40 → overall mean 20;
    // Monday index 0.5, Tuesday index 2.0 (2024-01-01 is a Monday)
    val daily = Seq(
      ("k", d("2024-01-01"), 10.0), ("k", d("2024-01-08"), 10.0),
      ("k", d("2024-01-02"), 40.0)).toDF("k", "day", "v")
    val out = Analytics.seasonalProfile(daily, "k", "day", "v").collect()
      .map(r => r.getInt(1) -> ((r.getLong(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    assert(out(0) == ((2L, 10.0, 0.5)), s"Monday: $out")
    assert(out(1) == ((1L, 40.0, 2.0)), s"Tuesday: $out")
  }

  test("benford: string-exact first digits, shares, expectation, MAD") {
    val vals = Seq(1.0, 12.34, 150.0, 2.5, 29.99, 3.0, 0.45, -5.0, 999.0)
      .map(Tuple1(_)).toDF("v")
    val out = Analytics.benford(vals, "v").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    // digits of the 8 positives: 1,1,1,2,2,3,4 (0.45 → '4'), 9
    assert(out.keySet == Set(1, 2, 3, 4, 9), s"got ${out.keySet}")
    assert(out(1)._1 == 3L && out(1)._2 == 0.375)
    assert(out(1)._3 == 0.301029996, "log10(2) decimal-9")
    assert(out(1)._4 == 0.073970004)
    assert(out(4)._1 == 1L, "0.45's first significant digit is 4")
    // MAD identical on every row and equals the mean of deviations
    val mads = Analytics.benford(vals, "v").collect()
      .map(_.getDouble(5)).distinct
    assert(mads.length == 1 && mads.head > 0)
  }

  test("rfm: quintile orientation — 1 is best on every axis") {
    val orders = Seq(
      (10L, 1L, 100.0, ts("2001-08-01 00:00:00")),
      (11L, 1L, 100.0, ts("2001-08-01 00:00:00")),
      (12L, 1L, 100.0, ts("2001-07-01 00:00:00")),
      (13L, 2L, 50.0, ts("2000-01-01 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val out = Analytics.rfm(orders, d("2001-09-01")).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getString(7)))).toMap
    assert(out(1L) == ((31, 3L, 300.0, "111")),
      s"recent/frequent/high-spend customer takes 1 on every axis: $out")
    assert(out(2L) == ((609, 1L, 50.0, "222")), s"got $out")
  }

  test("paretoAbc: cumulative classes and the hand-computed Gini") {
    // revenues 80/10/6/4 of 100: cum shares .8 (A), .9 (B), .96, 1.0 (C)
    // gini over asc [4,6,10,80]: 2·366/(4·100) − 5/4 = 0.58
    val orders = Seq(
      (1L, 10L, 80.0, ts("2001-01-01 00:00:00")),
      (2L, 20L, 10.0, ts("2001-01-01 00:00:00")),
      (3L, 30L, 6.0, ts("2001-01-01 00:00:00")),
      (4L, 40L, 4.0, ts("2001-01-01 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val out = Analytics.paretoAbc(orders).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2),
        r.getString(3), r.getDouble(4)))).toMap
    assert(out(10L) == ((80.0, 0.8, "A", 0.58)), s"got $out")
    assert(out(20L)._3 == "B" && out(20L)._2 == 0.9)
    assert(out(30L)._3 == "C" && out(30L)._2 == 0.96)
    assert(out(40L) == ((4.0, 1.0, "C", 0.58)))
    intercept[IllegalArgumentException](
      Analytics.paretoAbc(orders, aShare = 0.9, bShare = 0.8))
  }

  test("laplaceNoisedCounts: deterministic draws, scale tracks b") {
    val df = (1 to 40).map(i => (s"g${i % 4}", i)).toDF("k", "x")
    val out1 = Analytics.laplaceNoisedCounts(df, Seq("k"), b = 2.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val out2 = Analytics.laplaceNoisedCounts(df, Seq("k"), b = 2.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out1 == out2, "seeded draws must reproduce exactly")
    assert(out1.values.forall(_._1 == 10L))
    assert(out1.values.map(_._2).toSet.size == 4,
      "distinct keys draw distinct noise")
    out1.foreach { case (k, (n, noise, noised)) =>
      assert(noise != 0.0 && math.abs(noise) < 100,
        s"$k: Laplace(2) draw far tail is vanishingly unlikely: $noise")
      assert(math.abs(noised - (n + noise)) < 1e-9)
    }
    // doubling b doubles every draw (same uniform, linear scale)
    val wide = Analytics.laplaceNoisedCounts(df, Seq("k"), b = 4.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    out1.foreach { case (k, (_, noise, _)) =>
      assert(math.abs(wide(k) - 2 * noise) < 1e-8, s"$k: $noise vs ${wide(k)}")
    }
    intercept[IllegalArgumentException](
      Analytics.laplaceNoisedCounts(df, Seq.empty, 1.0))
  }

  test("laplaceNoisedCounts: NULL key values fail loudly, not collide") {
    // (null,'x') and ('x',null) would concat_ws to the SAME seed string
    // and share one noise draw — the guard must raise instead
    val df = Seq((Option.empty[String], Option("x")),
      (Option("x"), Option.empty[String])).toDF("a", "b")
    val e = intercept[Exception](
      Analytics.laplaceNoisedCounts(df, Seq("a", "b"), b = 2.0).collect())
    def msgs(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage}|${msgs(t.getCause)}"
    assert(msgs(e).contains("NULL key value"), s"got: ${msgs(e)}")
    // non-null keys still work through the guard branch
    val ok = Analytics.laplaceNoisedCounts(
      Seq(("x", "y"), ("y", "x")).toDF("a", "b"), Seq("a", "b"), b = 2.0)
      .collect()
    assert(ok.length == 2 &&
      ok.map(_.getDouble(3)).toSet.size == 2)
  }

  test("basketRules: support, directional confidence, lift") {
    // o1{A,B} o2{A,B} o3{A,C} o4{B}; the duplicate (o1,A) row must not
    // double-count the basket
    val li = Seq((1L, 10L), (1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 30L), (4L, 20L))
      .toDF("l_orderkey", "l_partkey")
    val out = Analytics.basketRules(li, minSupport = 2).collect()
    assert(out.length == 1, s"only (A,B) clears min support: ${out.toSeq}")
    val r = out.head
    assert(r.getAs[Long]("n_pair") == 2 && r.getAs[Long]("n_a") == 3 &&
      r.getAs[Long]("n_b") == 3)
    assert(r.getAs[Double]("support") == 0.5)
    assert(r.getAs[Double]("conf_ab") == 0.666666667, "2/3 decimal-9")
    assert(r.getAs[Double]("lift") == 0.888888889, "2·4/(3·3) decimal-9")
  }

  test("basketRules: oversized baskets drop out of candidate generation") {
    // o1 is a 3-item basket; with maxBasket = 2 it contributes nothing,
    // and the pair (10,20) from o2/o3 survives with n_baskets = 2
    val li = Seq((1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L), (3L, 10L), (3L, 20L))
      .toDF("l_orderkey", "l_partkey")
    val out = Analytics.basketRules(li, minSupport = 2, maxBasket = 2)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_pair") == 2)
    assert(out.head.getAs[Double]("support") == 1.0,
      "capped basket must not count in the universe either")
  }
}
