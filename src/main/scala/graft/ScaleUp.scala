package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of the driver's testdata (TESTDATA.md): writes a
  * `factor`x copy of an existing sf directory so the full query suite can
  * be exercised at 10x the largest driver-generated scale (the round-6
  * verdict's "prove it at sf1" gate).
  *
  * Design constraints, in order:
  *
  *  1. **Referential integrity per replica.** Every BIGINT key is shifted
  *     by `replica * STRIDE` (STRIDE = 1e6, far above any sf0.1 key), so
  *     replica r of `lineitem` references replica r of `orders`/`part`/
  *     `supplier` exactly as the source does. `region`/`nation` are fixed
  *     dimensions (TPC-H semantics) and are copied unreplicated.
  *  2. **Linear, not quadratic, growth of derived structure.** Naive
  *     replication makes every document an exact factor-way duplicate and
  *     every embedding a factor-way clone — pair-emitting operators
  *     (substring spans, LSH candidates, ANN top-k) would then grow
  *     quadratically in `factor` *by construction of the data*, which
  *     would poison the "does the operator scale linearly" measurement.
  *     Instead each replica gets a bijective re-encoding: document text
  *     through a per-replica letter rotation (equality structure WITHIN a
  *     replica is preserved — a bijection maps equal texts to equal
  *     texts — so planted dup/near-dup rates replicate; overlap ACROSS
  *     replicas is destroyed), and embeddings through a per-replica
  *     cyclic rotation of the vector (norm-preserving, so cosine
  *     geometry within a replica is identical and cross-replica
  *     similarity is incoherent).
  *  3. **Determinism.** No randomness anywhere: same source + factor →
  *     byte-identical values (file layout aside).
  *
  * Names that are key-derived in the source (`Customer#%09d`,
  * `Supplier#%09d`) are re-derived from the shifted key so name-keyed
  * joins keep per-key cardinality instead of fanning out factor-fold.
  * `p_name` ("large ring" style) is already heavily duplicated in the
  * source and is left as-is — its distinct count is vocabulary-bounded,
  * not row-bounded, exactly like real catalogs.
  *
  * Usage: `runMain graft.ScaleUp <srcDir> <dstDir> [factor=10]`
  */
object ScaleUp {

  /** Key shift per replica. Max sf0.1 key is 600 000 (lineitem-derived
    * order keys stay below it), so 1e6 keeps replica key ranges disjoint
    * for any factor. */
  val STRIDE = 1000000L

  /** Ten common letters; rotating this alphabet by r gives `factor`
    * distinct bijections on text (r=0 is the identity, so replica 0 is
    * byte-identical to the source). */
  private val ALPHA = "aeiourstln"

  /** Second, DISJOINT common-letter alphabet for replicas ≥ 10 (the
    * round-8 verdict's sf3 stretch needs factor 30 > |ALPHA|): replica
    * r composes rotation `r % 10` of [[ALPHA]] with rotation `r / 10`
    * of BETA, giving 100 distinct text bijections. Replicas 0–9 have
    * BETA rotation 0 (identity), so every previously generated scale-up
    * (sf0.3, sf1) is BYTE-IDENTICAL under the extended scheme — the
    * existing artifacts stay comparable. Same duplicate-risk class as
    * the single-alphabet design: two replicas sharing an ALPHA rotation
    * collapse only for texts containing NO BETA letter (m c d p g b h
    * f w k — vanishingly unlikely for sentence-length English-like
    * text, exactly as a text with no ALPHA letter always collapsed). */
  private val BETA = "mcdpgbhfwk"

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: graft.ScaleUp <srcDir> <dstDir> [factor]")
    val src = args(0)
    val dst = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.core.GraftSession.builder(appName = "graft-scaleup",
      master = s"local[$cpus]", shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    writeAll(spark, src, dst, factor)
    spark.stop()
  }

  def writeAll(spark: SparkSession, src: String, dst: String, factor: Int): Unit = {
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String, files: Int): Unit =
      df.repartition(files).write.mode("overwrite").parquet(s"$dst/$t.parquet")

    // Validate the documented preconditions instead of assuming them —
    // each failure mode below is SILENT corruption, not an error:
    //  - factor > |ALPHA|: replica r and r+|ALPHA| share the identity
    //    rotation, reintroducing exact cross-replica duplicates and
    //    defeating design constraint 2 (linear derived-structure growth);
    //  - a source key >= STRIDE (e.g. chaining a scale-up, or a larger
    //    source sf): replica key ranges overlap and the __r
    //    reconstruction in scaleDocuments/scaleEmbeddings mis-assigns
    //    replicas — corrupt referential integrity with no error;
    //  - factor > embedding dim: the cyclic slice in scaleEmbeddings
    //    produces malformed vectors.
    require(factor >= 1 && factor <= ALPHA.length * BETA.length,
      s"ScaleUp: factor $factor outside [1, ${ALPHA.length * BETA.length}]" +
        " — the composed ALPHA×BETA rotation family provides only " +
        s"${ALPHA.length * BETA.length} distinct text bijections; a " +
        "larger factor would silently reuse the identity rotation")
    val keyCols = Seq(
      "customer" -> "c_custkey", "part" -> "p_partkey",
      "orders" -> "o_orderkey", "lineitem" -> "l_orderkey",
      "supplier" -> "s_suppkey", "events" -> "event_id",
      "documents" -> "doc_id", "embeddings" -> "vec_id")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    keyCols.foreach { case (t, k) =>
      val mx = read(t).agg(max(col(k)).cast("long")).head.getLong(0)
      require(mx < STRIDE,
        s"ScaleUp: max $t.$k = $mx >= STRIDE $STRIDE — replica key " +
          "ranges would overlap (is the source already scaled up?)")
    }
    // embedding rotation wraps modulo the dimension (scaleEmbeddings),
    // so any factor within the key-stride bound is valid

    // Fixed dims: straight copy.
    write(read("region"), "region", 1)
    write(read("nation"), "nation", 1)

    write(scaleCustomer(read("customer"), factor), "customer", 2)
    write(scaleSupplier(read("supplier"), factor), "supplier", 1)
    write(scaleKeys(read("part"), factor, Seq("p_partkey")), "part", 2)
    write(scaleKeys(read("orders"), factor, Seq("o_orderkey", "o_custkey")),
      "orders", 8)
    write(scaleKeys(read("lineitem"), factor,
      Seq("l_orderkey", "l_partkey", "l_suppkey")), "lineitem", 16)
    write(scaleKeys(graft.sources.Tables.microTs(
      { spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true"); read("events") }),
      factor, Seq("event_id", "user_id")), "events", 4)
    write(scaleDocuments(read("documents"), factor), "documents", 4)
    write(scaleEmbeddings(read("embeddings"), factor), "embeddings", 2)
  }

  /** Cross the frame with replica ids 0..factor-1 and shift `keys`. */
  private def replicate(df: DataFrame, factor: Int): DataFrame =
    df.withColumn("__r", explode(typedLit((0 until factor).toArray)))

  def scaleKeys(df: DataFrame, factor: Int, keys: Seq[String]): DataFrame = {
    val rep = replicate(df, factor)
    keys.foldLeft(rep) { (d, k) =>
      d.withColumn(k, col(k) + col("__r").cast("long") * STRIDE)
    }.drop("__r").select(df.columns.map(col).toSeq: _*)
  }

  def scaleCustomer(df: DataFrame, factor: Int): DataFrame =
    scaleKeys(df, factor, Seq("c_custkey"))
      .withColumn("c_name", format_string("Customer#%09d", col("c_custkey")))

  def scaleSupplier(df: DataFrame, factor: Int): DataFrame =
    scaleKeys(df, factor, Seq("s_suppkey"))
      .withColumn("s_name", format_string("Supplier#%09d", col("s_suppkey")))

  /** Per-replica bijective letter rotation of `text` (length-preserving,
    * so `n_chars` stays truthful). */
  def scaleDocuments(df: DataFrame, factor: Int): DataFrame = {
    // re-checked here (not only in writeAll): factor 101 would fold
    // replica 100 back onto the identity bijection SILENTLY
    require(factor >= 1 && factor <= ALPHA.length * BETA.length,
      s"ScaleUp.scaleDocuments: factor $factor outside " +
        s"[1, ${ALPHA.length * BETA.length}] distinct text bijections")
    val rep = scaleKeys(df, factor, Seq("doc_id"))
      .withColumn("__r", (col("doc_id") / lit(STRIDE)).cast("int"))
    val rotated = (1 until factor).foldLeft(
      when(col("__r") === 0, col("text"))) { (acc, r) =>
      // replica r = ALPHA rotation (r % 10) composed with BETA rotation
      // (r / 10); both translates in one pass over the concatenated
      // alphabets (disjoint, so composition = one character map).
      // r < 10 keeps BETA at identity — byte-identical to the original
      // single-alphabet scheme for every previously generated factor.
      val ra = r % ALPHA.length
      val rb = r / ALPHA.length
      val toA = ALPHA.drop(ra) + ALPHA.take(ra)
      val toB = BETA.drop(rb) + BETA.take(rb)
      acc.when(col("__r") === r,
        translate(col("text"), ALPHA + BETA, toA + toB))
    }
    rep.withColumn("text", rotated).drop("__r")
  }

  /** Per-replica cyclic rotation of the embedding vector: norm-preserving
    * (cosine structure within a replica is untouched), deterministic, and
    * r=0 is the identity. */
  def scaleEmbeddings(df: DataFrame, factor: Int): DataFrame = {
    val rep = scaleKeys(df, factor, Seq("vec_id"))
      // rotation wraps past the dimension (factor > dim): replicas
      // r and r+dim carry identical vectors under fresh ids — fine for
      // scale testing, and a no-op (__m == __r) for every factor <= dim,
      // so existing sf1/sf3 trees regenerate byte-identically
      .withColumn("__m",
        ((col("vec_id") / lit(STRIDE)).cast("int")) % size(col("embedding")))
    rep.withColumn("embedding", expr(
      """concat(slice(embedding, __m + 1, size(embedding) - __m),
        |       slice(embedding, 1, __m))""".stripMargin))
      .drop("__m")
  }
}
