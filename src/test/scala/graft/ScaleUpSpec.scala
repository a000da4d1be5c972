package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Pins the scale-up's per-replica bijection contract — in particular
  * that the round-9 two-alphabet extension (factors 11..100) leaves
  * replicas 0–9 BYTE-IDENTICAL to the original single-alphabet scheme,
  * so previously generated sf0.3/sf1 trees remain comparable artifacts.
  */
class ScaleUpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Alpha = "aeiourstln"
  private val Beta = "mcdpgbhfwk"

  // covers both alphabets plus untouched characters (q, z, x, spaces)
  private val text = "the quick brown fox jumps over my dog zx"
  private def docs = Seq((7L, text)).toDF("doc_id", "text")

  private def rot(s: String, r: Int) = s.drop(r) + s.take(r)
  private def translate(t: String, from: String, to: String) =
    t.map(c => { val i = from.indexOf(c); if (i >= 0) to(i) else c })

  test("replicas 0-9 match the legacy single-alphabet rotation exactly") {
    val out = ScaleUp.scaleDocuments(docs, 30)
      .select((col("doc_id") / ScaleUp.STRIDE).cast("int").as("r"), col("text"))
      .as[(Int, String)].collect().toMap
    assert(out.size == 30)
    for (r <- 0 until 10)
      assert(out(r) == translate(text, Alpha, rot(Alpha, r)),
        s"replica $r must ignore the BETA alphabet entirely")
  }

  test("composed bijections: 30 pairwise-distinct length-preserving texts") {
    val out = ScaleUp.scaleDocuments(docs, 30)
      .select((col("doc_id") / ScaleUp.STRIDE).cast("int").as("r"), col("text"))
      .as[(Int, String)].collect().toMap
    assert(out.values.toSet.size == 30, "every replica text distinct")
    assert(out.values.forall(_.length == text.length))
    // replica 10 = ALPHA identity + BETA rotation 1: differs from the
    // source ONLY on BETA letters
    val expected10 = translate(text, Beta, rot(Beta, 1))
    assert(out(10) == expected10)
    // replica 23 composes ALPHA rot 3 with BETA rot 2
    val expected23 =
      translate(translate(text, Alpha, rot(Alpha, 3)), Beta, rot(Beta, 2))
    assert(out(23) == expected23)
  }

  test("embedding rotation at factor 30: norm-preserving, r=0 identity") {
    val vec = (1 to 32).map(_.toFloat).toArray
    val emb = Seq((3L, vec)).toDF("vec_id", "embedding")
    val out = ScaleUp.scaleEmbeddings(emb, 30)
      .select((col("vec_id") / ScaleUp.STRIDE).cast("int").as("r"),
        col("embedding"))
      .as[(Int, Array[Float])].collect().toMap
    assert(out.size == 30)
    assert(out(0).sameElements(vec), "replica 0 is the identity")
    assert(out.values.forall(v =>
      v.length == 32 && v.sorted.sameElements(vec.sorted)),
      "cyclic rotation preserves the multiset (hence the norm)")
    assert(out(5).sameElements(vec.drop(5) ++ vec.take(5)))
  }

  test("factor guards: beyond the bijection family or embedding dim fails loudly") {
    val e = intercept[IllegalArgumentException](
      ScaleUp.scaleDocuments(docs, 101))
    assert(e.getMessage.contains("bijection") || e.getMessage.contains("factor"))
  }
}
