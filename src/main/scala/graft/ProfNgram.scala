package graft

import graft.core.GraftSession
import org.apache.spark.sql.functions._
import graft.functions.{Dedup, TextAnalysis}

/** Dev-only: attribute dd_ngram_jaccard's sf1 cost — shingle build vs
  * df-cap vs postings-join candidate volume vs verify — to decide
  * whether a prefix-filter (AllPairs/PPJoin) candidate stage is worth
  * it at equal semantics (VERDICT r8 #5).
  */
object ProfNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata_sf1")
    val spark = GraftSession.builder(appName = "graft-prof-ngram",
      master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val docs = graft.sources.Tables.documents(spark, sfDir)
    t("docs count") { docs.count() }

    // stage 1: normalized shingle explode + distinct
    val raw = docs
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        split(TextAnalysis.normalized(col("text")), " ").as("toks"))
      .select(col("doc_id"),
        explode(Dedup.shinglesFromTokens(col("toks"), 3)).as("shingle"))
      .distinct()
    val rawN = t("shingle explode+distinct") { raw.count() }
    println(s"[prof]   postings rows: $rawN")

    // stage 2: df distribution — what does the 1000 cap actually bite?
    val dfTab = raw.groupBy("shingle").agg(count(lit(1)).as("df"))
    t("df table") {
      val q = dfTab.agg(count(lit(1)), max("df"),
        sum(when(col("df") > 1000, 1).otherwise(0)),
        sum(when(col("df") > 1, col("df") * (col("df") - 1) / 2)
          .otherwise(0)).as("cand_all"),
        sum(when(col("df").between(2, 1000), col("df") * (col("df") - 1) / 2)
          .otherwise(0)).as("cand_capped")).collect()(0)
      println(s"[prof]   distinct shingles=${q.get(0)} maxDf=${q.get(1)} " +
        s"over1000=${q.get(2)} candAll=${q.get(3)} candCapped=${q.get(4)}")
    }

    val ds = Dedup.docShingles(docs, 3, 1000)
    t("docShingles (cached seed)") { ds.count() }
    val a = ds.toDF("doc_a", "shingle")
    val b = ds.toDF("doc_b", "shingle")
    val joined = a.join(b, "shingle").filter(col("doc_a") < col("doc_b"))
    t("postings join raw output") {
      println("[prof]   join rows: " + joined.count())
    }
    val common = joined.groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_common"))
    t("grouped candidate pairs") {
      println("[prof]   candidate pairs: " + common.count())
    }
    // exact dictionary encoding: transient long ids for shingles so the
    // self-join + pair groupBy shuffle longs instead of ~20-char strings
    val dict = ds.select("shingle").distinct()
      .withColumn("sid", monotonically_increasing_id())
    val enc = ds.join(dict, "shingle").select("doc_id", "sid")
      .persist()
    t("dict-encode postings") { enc.count() }
    val ea = enc.toDF("doc_a", "sid")
    val eb = enc.toDF("doc_b", "sid")
    t("sid self-join + group") {
      println("[prof]   pairs: " + ea.join(eb, "sid")
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1))).count())
    }
    t("sid self-join + group again") {
      ea.join(eb, "sid").filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1))).count()
    }

    // prefix-filtered candidate volume at both the gate's threshold
    // (0.2, TrainingQueries dd_ngram_jaccard) and a selective one
    for (t0 <- Seq(0.2, 0.5)) {
      val w = org.apache.spark.sql.expressions.Window
      val dfT = ds.groupBy("shingle").agg(count(lit(1)).as("df"))
      val ranked = ds.join(dfT, "shingle")
        .select(col("doc_id"), col("shingle"),
          row_number().over(
            w.partitionBy("doc_id").orderBy(col("df"), col("shingle"))).as("pos"),
          count(lit(1)).over(w.partitionBy("doc_id")).as("sz"))
      val prefix = ranked.filter(col("pos") <=
        col("sz") - ceil(lit(t0) * col("sz") - lit(1e-9)) + 1)
      t(s"prefix postings t=$t0") {
        println("[prof]   prefix rows: " + prefix.count())
      }
      val cand = prefix.select(col("doc_id").as("doc_a"), col("shingle"))
        .join(prefix.select(col("doc_id").as("doc_b"), col("shingle")),
          "shingle")
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      t(s"prefix candidates t=$t0") {
        println("[prof]   candidate pairs: " + cand.count())
      }
      t(s"full ngramJaccard t=$t0") {
        println("[prof]   result pairs: " +
          Dedup.ngramJaccard(docs, 3, t0, 1000).count())
      }
      t(s"full ngramJaccard t=$t0 again") {
        Dedup.ngramJaccard(docs, 3, t0, 1000).count()
      }
    }
    spark.stop()
  }
}
