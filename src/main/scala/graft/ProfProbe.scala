package graft

import graft.core.GraftSession
import org.apache.spark.sql.functions._
import graft.functions.Similarity

/** Dev-only: pin probeAssign's behavior on a dim-mismatched embedding
  * (what does the struct sort do with null csims?) before building the
  * native twin.
  */
object ProfProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(appName = "graft-prof-probe",
      master = "local[4]", shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val cents = Seq(
      (1, Seq(1.0, 0.0)), (2, Seq(0.0, 1.0)), (3, Seq(0.5, 0.5)))
      .toDF("centroid_id", "cvec")
    val good = Seq((10L, Seq(0.9f, 0.1f))).toDF("vec_id", "embedding")
    println("[probe] good: " +
      Similarity.probeAssign(good, cents, 2).collect().toSeq)
    val bad = Seq((11L, Seq(0.9f, 0.1f, 0.5f))).toDF("vec_id", "embedding")
    try println("[probe] mismatch: " +
      Similarity.probeAssign(bad, cents, 2).collect().toSeq)
    catch { case e: Throwable =>
      println("[probe] mismatch RAISED: " + e.getMessage.take(120)) }
    val nul = Seq((12L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding")
    try println("[probe] null emb: " +
      Similarity.probeAssign(nul, cents, 2).collect().toSeq)
    catch { case e: Throwable =>
      println("[probe] null emb RAISED: " + e.getMessage.take(120)) }
    // assign on the same cases
    try println("[probe] assign mismatch: " +
      Similarity.assign(bad, cents).collect().toSeq)
    catch { case e: Throwable =>
      println("[probe] assign mismatch RAISED: " + e.getMessage.take(120)) }
    spark.stop()
  }
}
