package graft.quality

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class RaptorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame(rows: (Int, String, Double)*) =
    rows.toDF("id", "name", "amount")

  test("diff of identical frames is empty with zero-mismatch summary") {
    val df = frame((1, "a", 1.5), (2, "b", 2.5))
    val r = Raptor.compare(df, df, Seq("id"))
    assert(r.colMismatch.isEmpty)
    assert(r.sourceExtra.isEmpty && r.targetExtra.isEmpty)
    val values = r.summary.collect()
      .map(x => x.getString(1) -> x.getString(2)).toMap
    assert(values("Number of rows mismatch ") == "0")
    assert(values("Number of rows in common ") == "2")
  }

  test("empty frames produce an all-zero summary (no null-sum crash)") {
    val empty = frame().limit(0)
    val r = Raptor.compare(empty, empty, Seq("id"))
    val values = r.summary.collect()
      .map(x => x.getString(1) -> x.getString(2)).toMap
    assert(values("Number of rows in Source [source]") == "0")
    assert(values("Number of rows in common ") == "0")
    assert(values("Number of rows mismatch ") == "0")
  }

  test("duplicate keys count like the reference's join algebra (M×N)") {
    // two source rows and two target rows under one key: the one-pass
    // full-outer counts must match what inner-join/left_anti counted
    val src = frame((1, "a", 1.5), (1, "a", 9.9), (2, "b", 2.5))
    val tgt = frame((1, "a", 1.5), (1, "a", 1.5), (3, "c", 3.5))
    val r = Raptor.compare(src, tgt, Seq("id"))
    val values = r.summary.collect()
      .map(x => x.getString(1) -> x.getString(2)).toMap
    assert(values("Number of rows in Source [source]") == "3")
    assert(values("Number of rows in Target [target]") == "3")
    assert(values("Number of rows in common ") == "4", "2×2 join pairs")
    assert(values("Number of rows mismatch ") == "2", "the 9.9 row × 2")
    assert(values("Number of rows in Source source but not in Target target") == "1")
    assert(values("Number of rows in Target target but not in Source source") == "1")
  }

  test("cell mutations attributed to the right column; extras partitioned") {
    val src = frame((1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5))
    val tgt = frame((1, "a", 9.9), (2, "B", 2.5), (4, "d", 4.5))
    val r = Raptor.compare(src, tgt, Seq("id"))
    val mism = r.colMismatch.collect()
      .map(x => (x.getString(0), x.getString(3))).toSet
    assert(mism == Set(("1", "amount"), ("2", "name")))
    assert(r.sourceExtra.select("id").as[String].collect().toSet == Set("3"))
    assert(r.targetExtra.select("id").as[String].collect().toSet == Set("4"))
    val colSum = r.columnSummary.collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(colSum == Map("amount" -> 1L, "name" -> 1L))
  }

  test("null and empty string both normalize to '' (reference semantics)") {
    val src = Seq((1, Option("x")), (2, None)).toDF("id", "v")
    val tgt = Seq((1, Option("x")), (2, Option(""))).toDF("id", "v")
    val r = Raptor.compare(src, tgt, Seq("id"))
    assert(r.colMismatch.isEmpty,
      "NULL vs '' is not a mismatch under na.fill('') — documented pitfall")
  }

  test("typed compare distinguishes NULL from '' and keeps native types") {
    val src = Seq((1, Option("x"), 1.5), (2, None, 2.5), (3, Option("z"), 3.5))
      .toDF("id", "v", "amount")
    val tgt = Seq((1, Option("x"), 1.5), (2, Option(""), 2.5), (3, Option("z"), 3.50001))
      .toDF("id", "v", "amount")
    // fingerprint mode conflates NULL and '' (reference semantics):
    assert(Raptor.compare(src, tgt, Seq("id")).colMismatch
      .filter($"id" === "2").isEmpty)
    // typed mode catches both the NULL≠'' and the tiny double diff:
    val typed = Raptor.compareTyped(src, tgt, Seq("id")).collect()
      .map(r => (r.getInt(0), r.getString(3))).toSet
    assert(typed == Set((2, "v"), (3, "amount")))
  }

  test("profile: per-column stats in one pass, nulls and dups counted") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 10.0), (3.0, 10.0), (null, 20.0))
      .toDF("a", "b")
    val rows = Raptor.profile(df, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = rows("a")
    assert(a.getLong(1) == 2L && a.getLong(2) == 1L, "a: n=2, n_null=1")
    assert(a.getLong(3) == 2L, "a: 2 distinct non-null values")
    assert(a.getDouble(4) == 1.0 && a.getDouble(5) == 3.0)
    assert(a.getDouble(6) == 2.0, "a: mean of {1,3}")
    val b = rows("b")
    assert(b.getLong(1) == 3L && b.getLong(2) == 0L && b.getLong(3) == 2L)
    assert(b.getDouble(6) == 13.333333333, "b: mean rounded to 9 dp")
  }

  test("checksum: single-cell drift flips exactly its bucket") {
    def sums(df: org.apache.spark.sql.DataFrame) =
      Raptor.checksum(df, "id", Seq("id", "name", "amount"), buckets = 4)
        .collect()
        .map(r => r.getAs[Number](0).longValue ->
          (r.getLong(1), r.getDecimal(2).longValueExact)).toMap
    val src = frame((1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0),
      (4, "d", 4.0), (5, "e", 5.0), (6, "f", 6.0))
    val tgt = frame((1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0),
      (4, "d", 4.0), (5, "e", 99.0), (6, "f", 6.0))
    val (a, b) = (sums(src), sums(tgt))
    assert(a.keySet == b.keySet)
    val drifted = a.keySet.filter(k => a(k) != b(k))
    assert(drifted == Set(5L % 4), "only the mutated row's bucket differs")
    assert(a.forall { case (k, (n, _)) => b(k)._1 == n },
      "row counts agree — the drift is content, not cardinality")
    // checksum is order-independent: a shuffled frame checksums identically
    val shuffled = sums(src.orderBy(org.apache.spark.sql.functions.rand(7)))
    assert(shuffled == a)
  }

  test("keyOverlapSketch: exact degradation when k covers the key sets") {
    // source 1..40, target 21..60 → 20 shared keys; with k = 128 ≥ all
    // cardinalities the sketch holds every hash and the estimators must
    // DEGRADE TO EXACT counts (the KmvSketch contract)
    val src = (1 to 40).map(i => (i, s"n$i", i.toDouble))
    val tgt = (21 to 60).map(i => (i, s"n$i", i.toDouble))
    val r = Raptor.keyOverlapSketch(frame(src: _*), frame(tgt: _*),
      Seq("id")).collect()(0)
    assert(r.getAs[Long]("n_src") == 40 && r.getAs[Long]("n_tgt") == 40)
    assert(r.getAs[Long]("n_union") == 60 && r.getAs[Long]("n_inter") == 20)
    assert(r.getAs[Int]("m_size") == 60)
    assert(r.getAs[Double]("est_union") == 60.0,
      "undersized union sketch estimates exactly")
    assert(r.getAs[Double]("est_jaccard") == 20.0 / 60.0)
    assert(r.getAs[Double]("est_inter") == (20.0 / 60.0) * 60.0)
  }

  test("keyOverlapSketch: estimation path engages when keys exceed k") {
    // 500 vs 500 keys with 250 shared — k=32 forces the θ estimator;
    // the estimate must land within a loose 3σ-ish band of truth while
    // the exact columns stay exact (they come from the real key sets)
    val src = (1 to 500).map(i => (i, s"n$i", i.toDouble))
    val tgt = (251 to 750).map(i => (i, s"n$i", i.toDouble))
    val r = Raptor.keyOverlapSketch(frame(src: _*), frame(tgt: _*),
      Seq("id"), k = 32).collect()(0)
    assert(r.getAs[Long]("n_union") == 750 && r.getAs[Long]("n_inter") == 250)
    assert(r.getAs[Int]("m_size") == 32)
    val estU = r.getAs[Double]("est_union")
    assert(estU > 750 * 0.45 && estU < 750 * 2.2,
      s"union estimate $estU wildly off 750 (k=32 ⇒ ~18% rel. error per σ)")
    val estJ = r.getAs[Double]("est_jaccard")
    assert(estJ > 0.0 && estJ < 1.0)
  }

  test("compare preflightK appends exact-degraded KMV rows 15-18") {
    // k = 128 covers both key sets, so every estimate degrades to the
    // exact value: union 6, common 2, J = 2/6, containment = 2/4
    val src = frame((1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (4, "d", 4.0))
    val tgt = frame((3, "c", 3.0), (4, "d", 4.0), (5, "e", 5.0), (6, "f", 6.0))
    val r = Raptor.compare(src, tgt, Seq("id"), preflightK = 128)
    val rows = r.summary.collect().map(x => (x.getInt(0), x.getString(2))).toMap
    assert(rows(15) == "6.000000" && rows(16) == "2.000000")
    assert(rows(17) == "0.333333" && rows(18) == "0.500000")
    // default stays reference-shaped: no ord past 14
    val plain = Raptor.compare(src, tgt, Seq("id"))
    assert(plain.summary.collect().map(_.getInt(0)).max <= 14)
  }

  test("keyOverlapSketch containment estimates are asymmetric and exact at small k coverage") {
    // src 1..10 fully contained in tgt 1..20: contain_src = 1.0,
    // contain_tgt = 0.5 (the asymmetry Jaccard alone cannot show)
    val src = (1 to 10).map(i => (i, s"n$i", i.toDouble))
    val tgt = (1 to 20).map(i => (i, s"n$i", i.toDouble))
    val r = Raptor.keyOverlapSketch(frame(src: _*), frame(tgt: _*),
      Seq("id")).collect()(0)
    assert(r.getAs[Double]("est_contain_src") == 1.0)
    assert(r.getAs[Double]("est_contain_tgt") == 0.5)
  }

  test("summary percentage uses exact half-up rendering") {
    // 1 mismatch out of 3 common = 33.33%
    val src = frame((1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0))
    val tgt = frame((1, "a", 9.0), (2, "b", 2.0), (3, "c", 3.0))
    val r = Raptor.compare(src, tgt, Seq("id"))
    val values = r.summary.collect()
      .map(x => x.getString(1) -> x.getString(2)).toMap
    assert(values("Row Mismatch Percentage ") == "33.33%")
    val pct = r.columnSummary.collect().head.getString(2)
    assert(pct == "33.33%")
  }
}
