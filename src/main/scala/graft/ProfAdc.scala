package graft

import graft.core.GraftSession
import org.apache.spark.sql.functions._
import graft.functions.Similarity
import graft.sources.Tables

/** Dev-only: attribute ann_pq_adc's per-row cost (recon build vs cosine
  * vs rounding) and check whether the projection stays in codegen.
  */
object ProfAdc {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata_sf1")
    val spark = GraftSession.builder(appName = "graft-prof-adc",
      master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val e = Tables.embeddings(spark, sfDir)
    val cents = e.filter(col("vec_id").between(1, 16))
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val q = e.filter(col("vec_id") === 0)

    t("embeddings count") { e.count() }
    t("pqEncode count") { Similarity.pqEncode(e, cents, 8).count() }
    t("pqEncode again") { Similarity.pqEncode(e, cents, 8).count() }

    // recon inline (mirror of Similarity.reconOf literal-map path)
    val collected = cents
      .select(col("centroid_id").cast("int"),
        transform(col("cvec"), _.cast("double")))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
    val dim = collected.head._2.length
    val sub = dim / 8
    val recon = flatten(array((0 until 8).map { s =>
      val m = collected.map { case (cid, v) =>
        cid -> v.slice(s * sub, (s + 1) * sub)
      }.toMap
      element_at(typedLit(m), element_at(col("codes"), s + 1))
    }: _*))
    val enc = Similarity.pqEncode(e, cents, 8)
    t("recon only (sum first elem)") {
      enc.select(element_at(recon, 1).as("r0")).agg(sum("r0")).collect()
    }
    val withR = enc.withColumn("__recon", recon)
    val qv = graft.core.Scalars.crossBroadcast(withR,
      q.select(col("embedding").as("qvec")))
    t("recon + raw dot") {
      qv.select(Similarity.dot(col("__recon"), col("qvec")).as("d"))
        .agg(sum("d")).collect()
    }
    t("recon + full cosine") {
      qv.select((Similarity.dot(col("__recon"), col("qvec")) /
          (sqrt(Similarity.dot(col("__recon"), col("__recon"))) *
           sqrt(Similarity.dot(col("qvec"), col("qvec"))))).as("d"))
        .agg(sum("d")).collect()
    }
    t("full pqTopK") {
      Similarity.pqTopK(e, cents, q, k = 10, m = 8).count()
    }
    t("full pqTopK again") {
      Similarity.pqTopK(e, cents, q, k = 10, m = 8).count()
    }
    val plan = Similarity.pqTopK(e, cents, q, k = 10, m = 8)
      .queryExecution.executedPlan.toString
    println("[prof] codegen spans: " +
      plan.linesIterator.filter(_.contains("WholeStageCodegen")).mkString(" | "))
    println("[prof] non-codegen nodes: " + plan.linesIterator
      .filter(l => l.contains("Project") || l.contains("Generate"))
      .take(8).mkString(" || "))
    spark.stop()
  }
}
