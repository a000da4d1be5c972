package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Money
import graft.operators.{KCore, LabelProp, LinkPred, Triangles, PageRank => PageRankOp}
import graft.sources.Tables

/** Verifiable queries for the training-data operators (text analysis,
  * dedup families, similarity search) with DuckDB oracle twins.
  * Shared SQL fragments keep the two sides in lock-step.
  */
object TrainingQueries {
  private type Q = (SparkSession, String) => DataFrame

  // normalized text (lower + collapse whitespace + trim), DuckDB side
  private val normSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
  // 3-word shingle document pipeline over any (doc_id, text) source,
  // DuckDB side — emitted WITHOUT the leading WITH so callers can chain
  private def shingleCtesFor(src: String): String =
    s"""toks AS (
       |  SELECT doc_id, string_split($normSql, ' ') AS t FROM $src),
       |shing AS MATERIALIZED (
       |  SELECT DISTINCT doc_id,
       |         unnest(list_transform(range(1, len(t) - 1),
       |                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
       |  FROM toks),
       |flt AS (SELECT shingle FROM shing GROUP BY shingle HAVING count(*) <= 1000),
       |ds AS MATERIALIZED (SELECT s.doc_id, s.shingle FROM shing s JOIN flt USING (shingle))
       |""".stripMargin
  private val shingleCtes: String = "WITH " + shingleCtesFor("documents")
  // winnowing CTEs shared by ts_winnow / dd_winnow_pairs: k-gram (k=8)
  // hash at positions 1..len-k+1, trailing-window (w=4) min, full
  // windows only (p >= w), distinct at (doc, fp) grain
  private val winnowCtes =
    s"""WITH nt AS (SELECT doc_id, $normSql AS t FROM documents),
       |pos AS (
       |  SELECT doc_id, t, unnest(range(1, length(t) - 6)) AS p
       |  FROM nt WHERE length(t) >= 8),
       |h AS (
       |  SELECT doc_id, p,
       |         CAST(('0x' || substr(md5(substr(t, p, 8)), 1, 8)) AS BIGINT) AS h
       |  FROM pos),
       |wm AS (
       |  SELECT doc_id, p,
       |         min(h) OVER (PARTITION BY doc_id ORDER BY p
       |           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp
       |  FROM h),
       |wfp AS (SELECT DISTINCT doc_id, fp FROM wm WHERE p >= 4)""".stripMargin

  /** MinHash-LSH pair CTE chain (k=8, 2 rows/band) over any
    * (doc_id, text) source; ends with `lshp(doc_a, doc_b, est_jaccard)`.
    * Mirrors [[Dedup.minhashSignatures]]/[[Dedup.minhashLsh]] exactly.
    */
  // average-hash twin CTEs: re-derive every NN-sampled byte from the
  // BMP generator's closed form (bottom-up rows, 4-byte alignment,
  // ((seed+i)*31)&255); ends in ph(asset_id, width, height, mean_gray,
  // hash_hi, hash_lo) — shared by mm_phash and mm_phash_pairs
  private val phashCtes: String =
    """WITH imgs AS (
      |  SELECT doc_id, CAST(1 + doc_id % 8 AS BIGINT) AS w,
      |         CAST(1 + doc_id % 5 AS BIGINT) AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |cells AS (
      |  SELECT i.doc_id, i.w, i.h, gxs.gx, gys.gy,
      |         (gxs.gx * i.w) // 8 AS sx, (gys.gy * i.h) // 8 AS sy,
      |         ((3 * i.w + 3) // 4) * 4 AS rowsize
      |  FROM imgs i
      |  CROSS JOIN (SELECT unnest(range(0, 8)) AS gx) gxs
      |  CROSS JOIN (SELECT unnest(range(0, 8)) AS gy) gys),
      |grays AS (
      |  SELECT doc_id, gy * 8 + gx AS idx,
      |         (((doc_id + ((h - 1 - sy) * rowsize + 3 * sx + 0)) * 31) & 255)
      |       + (((doc_id + ((h - 1 - sy) * rowsize + 3 * sx + 1)) * 31) & 255)
      |       + (((doc_id + ((h - 1 - sy) * rowsize + 3 * sx + 2)) * 31) & 255)
      |           AS gsum
      |  FROM cells),
      |m AS (SELECT doc_id, CAST(SUM(gsum) // 64 AS BIGINT) AS mean_gray
      |      FROM grays GROUP BY 1),
      |packed AS (
      |  SELECT g.doc_id,
      |         CAST(SUM(CASE WHEN g.gsum > m.mean_gray AND g.idx >= 32
      |                  THEN CAST(1 AS BIGINT) << CAST(g.idx - 32 AS INT)
      |                  ELSE 0 END) AS BIGINT) AS hash_hi,
      |         CAST(SUM(CASE WHEN g.gsum > m.mean_gray AND g.idx < 32
      |                  THEN CAST(1 AS BIGINT) << CAST(g.idx AS INT)
      |                  ELSE 0 END) AS BIGINT) AS hash_lo
      |  FROM grays g JOIN m USING (doc_id)
      |  GROUP BY 1),
      |ph AS (
      |  SELECT i.doc_id AS asset_id, CAST(i.w AS INT) AS width,
      |         CAST(i.h AS INT) AS height, m.mean_gray,
      |         p.hash_hi, p.hash_lo
      |  FROM imgs i JOIN m USING (doc_id) JOIN packed p USING (doc_id))
      |""".stripMargin

  private def minhashCtesFor(src: String): String = {
    val mins = (0 until 8)
      .map(i => s"min(substr(md5('${i / 4}|' || shingle), ${1 + 8 * (i % 4)}, 8)) AS mh_$i")
      .mkString(",\n         ")
    val bands = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band, mh_${2 * b} || '|' || mh_${2 * b + 1} AS bucket FROM sigs")
      .mkString("\n  UNION ALL ")
    val simSum = (0 until 8)
      .map(i => s"CASE WHEN a.mh_$i = b.mh_$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    shingleCtesFor(src) +
      s""", sigs AS MATERIALIZED (
         |  SELECT doc_id,
         |         $mins
         |  FROM ds GROUP BY doc_id)
         |, bands AS MATERIALIZED (
         |  $bands)
         |, cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b USING (band, bucket)
         |  WHERE a.doc_id < b.doc_id)
         |, lshp AS (
         |  SELECT doc_a, doc_b, CAST($simSum AS DOUBLE) / 8 AS est_jaccard
         |  FROM cand
         |  JOIN sigs a ON doc_a = a.doc_id
         |  JOIN sigs b ON doc_b = b.doc_id)
         |""".stripMargin
  }
  /** Prefixed signature+band CTEs over any (doc_id, text) source —
    * the [[minhashCtesFor]] front half with `_pfx`-suffixed names so an
    * index population and a wave population can coexist in one query
    * (each keeps its own population-local stop-shingle df cap, exactly
    * as [[Dedup.incrementalMinhash]] documents).
    */
  private def minhashSigCtesFor(src: String, pfx: String): String = {
    val mins = (0 until 8)
      .map(i => s"min(substr(md5('${i / 4}|' || shingle), ${1 + 8 * (i % 4)}, 8)) AS mh_$i")
      .mkString(",\n         ")
    val bands = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band, mh_${2 * b} || '|' || mh_${2 * b + 1} AS bucket FROM sigs_$pfx")
      .mkString("\n  UNION ALL ")
    s"""toks_$pfx AS (
       |  SELECT doc_id, string_split($normSql, ' ') AS t FROM $src),
       |shing_$pfx AS MATERIALIZED (
       |  SELECT DISTINCT doc_id,
       |         unnest(list_transform(range(1, len(t) - 1),
       |                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
       |  FROM toks_$pfx),
       |flt_$pfx AS (SELECT shingle FROM shing_$pfx GROUP BY shingle
       |             HAVING count(*) <= 1000),
       |ds_$pfx AS (SELECT s.doc_id, s.shingle FROM shing_$pfx s
       |            JOIN flt_$pfx USING (shingle)),
       |sigs_$pfx AS MATERIALIZED (
       |  SELECT doc_id,
       |         $mins
       |  FROM ds_$pfx GROUP BY doc_id),
       |bands_$pfx AS MATERIALIZED (
       |  $bands)""".stripMargin
  }
  // double-fold dot product, DuckDB side (matches Similarity.dot)
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
  private def normSqlOf(a: String): String =
    s"sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
  private def cosSql(a: String, b: String): String =
    s"CAST(ROUND(CAST(${dotSql(a, b)} / (${normSqlOf(a)} * ${normSqlOf(b)}) AS DECIMAL(20,12)), 9) AS DOUBLE)"
  // BM25 scoring CTE chain (through per-(doc,term) decimal partials in
  // `p`) — shared by the ts_bm25 ranking and the search_rrf fusion so
  // the two oracles cannot drift apart
  private val bm25Ctes =
    s"""tok AS (
       |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS token
       |  FROM documents),
       |dlen AS (SELECT doc_id, count(*) AS dlen FROM tok GROUP BY 1),
       |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
       |       WHERE token IN ('dup', 'spark', 'customer') GROUP BY 1, 2),
       |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
       |sc AS (SELECT count(*) AS n_docs, sum(dlen) AS tot_len FROM dlen),
       |p AS (
       |  SELECT tf.doc_id,
       |    CAST(CAST(ROUND(CAST(
       |      CAST(ROUND(CAST(ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5)
       |                             / (df + 0.5)) AS DECIMAL(20,12)), 9)
       |           AS DOUBLE)
       |      * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dlen * n_docs / tot_len))
       |      AS DECIMAL(20,12)), 9) AS DOUBLE) AS DECIMAL(20,9)) AS part
       |  FROM tf JOIN df USING (token) JOIN dlen USING (doc_id) CROSS JOIN sc)""".stripMargin
  // ── trained-centroid chain (DuckDB twin of Similarity.trainCentroids,
  // k = 16, iters = 2, dim = 64) — the SHIPPED cell config for the
  // IVF/graph/SemDeDup families. Exact CTE-for-operator parity:
  //   tc0  = seed (the 16 lowest vec_ids, centroid_id = dense order)
  //   taN  = Lloyd assignment (9-dp-rounded argmax cosine, lowest-id
  //          tie-break — the bestCentroid fold's exact semantics)
  //   mean = per-dimension DECIMAL(28,12)-exact sum, double divide,
  //          9-dp round (trainCentroids' order-independent mean)
  // Training in SQL is what makes "trained centroids" an ORACLE config
  // instead of an unverifiable recommendation: both engines re-derive
  // the identical cell geometry from the corpus alone.
  private def trainedAssignCte(from: String, name: String): String =
    s"""$name AS (
       |  SELECT vec_id, embedding, centroid_id FROM (
       |    SELECT e.vec_id, e.embedding, c.centroid_id,
       |           ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cosSql("e.embedding", "c.cvec")} DESC,
       |                      c.centroid_id ASC) AS rn
       |    FROM embeddings e CROSS JOIN $from c) r WHERE rn = 1)""".stripMargin
  private def trainedMeanSelect(from: String, idCol: String): String =
    s"""SELECT centroid_id AS $idCol, list(m ORDER BY p) AS cvec FROM (
       |    SELECT centroid_id, ps.p,
       |           CAST(ROUND(CAST(
       |             CAST(SUM(CAST(CAST(embedding[ps.p] AS DOUBLE)
       |                      AS DECIMAL(28,12))) AS DOUBLE) / count(*)
       |             AS DECIMAL(20,12)), 9) AS DOUBLE) AS m
       |    FROM $from CROSS JOIN (SELECT unnest(range(1, 65)) AS p) ps
       |    GROUP BY centroid_id, ps.p) g
       |  GROUP BY centroid_id""".stripMargin
  /** The full chain, ending in a CTE named `cents(idCol, cvec)`. */
  private def trainedCentsChain(idCol: String): String =
    s"""tc0 AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS centroid_id,
       |         embedding AS cvec
       |  FROM (SELECT vec_id, embedding FROM embeddings
       |        ORDER BY vec_id LIMIT 16) s),
       |${trainedAssignCte("tc0", "ta1")},
       |tc1 AS (
       |  ${trainedMeanSelect("ta1", "centroid_id")}),
       |${trainedAssignCte("tc1", "ta2")},
       |cents AS (
       |  ${trainedMeanSelect("ta2", idCol)})""".stripMargin

  // fixed first-16 PQ codebook — ann_pq / ann_pq_adc stay pinned to it
  // (the CODE semantics config, deliberately independent of cell
  // training; FAISS separates the coarse and fine quantizers the same
  // way)
  private val fixedCentsCid =
    """cents AS (SELECT vec_id AS cid, embedding AS cvec
      |          FROM embeddings WHERE vec_id BETWEEN 1 AND 16)""".stripMargin

  // PQ code assignment, DuckDB side (matches Similarity.pqEncode: 8
  // subspaces of 8 dims over the `cents(cid, cvec)` codebook CTE
  // supplied by the caller; per-subspace argmin of 9dp-rounded squared
  // L2, centroid-id tie-break)
  private def pqBestCtesWith(centsCte: String): String =
    s"""WITH $centsCte,
      |grid AS (
      |  SELECT e.vec_id, ss.s, c.cid,
      |         CAST(ROUND(CAST(list_sum(list_transform(
      |           list_zip(list_slice(e.embedding, ss.s*8 + 1, ss.s*8 + 8),
      |                    list_slice(c.cvec, ss.s*8 + 1, ss.s*8 + 8)),
      |           p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
      |              * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))
      |           AS DECIMAL(20,12)), 9) AS DOUBLE) AS d2
      |  FROM embeddings e
      |  CROSS JOIN (SELECT unnest(range(0, 8)) AS s) ss
      |  CROSS JOIN cents c),
      |best AS (
      |  SELECT vec_id, s, cid FROM (
      |    SELECT vec_id, s, cid,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id, s
      |             ORDER BY d2 ASC, cid ASC) AS rn
      |    FROM grid) WHERE rn = 1)""".stripMargin
  private lazy val pqBestCtes = pqBestCtesWith(fixedCentsCid)
  // trained cells AND trained codebook: the ivfpq/index/batch serving
  // family quantizes against the same trained set it cells by — one
  // geometry per index, as a retrained production index would ship
  private lazy val pqBestCtesTrained =
    pqBestCtesWith(trainedCentsChain("cid"))

  // The approximate kNN graph (ann_knn_graph's full text) as a reusable
  // CTE chain ending in `graph(src, dst, sim, rnk)` — shared verbatim by
  // the graph oracle and the margin rescoring (search_margin) so the
  // edge list the margin scores cannot drift from the graph the query
  // materializes: the ann_ivf argmax assignment caps each cell (dst
  // index), the same ranking extended to rn ≤ 4 probes the src side,
  // then a per-source rank over the cell join.
  // `ranked` and `graph` are AS MATERIALIZED: DuckDB inlines plain CTEs
  // per REFERENCE, and `ranked` is read twice (assigned + probes) while
  // `graph` is read twice by the degree queries (src/dst union) — at
  // large SF an inlined `graph` re-runs the multi-million-pair cell
  // join once per reference (measured: the sf1 gate's degree_dist twin
  // spilled >77 GB inlined, vs minutes materialized).
  //
  // Bounded-disk shape (the 30× gate fix): the top-5 window used to
  // order by the inline cosine EXPRESSION over the raw cell join, so
  // the window sorted pair rows still carrying BOTH 64-dim embedding
  // lists (~1 KB/row × 600M pairs at 30× — the measured disk-full).
  // Now each side's norm is hoisted to per-VECTOR grain (same double
  // expression, computed once per row instead of once per pair — the
  // value, and hence every rounded sim, is bit-identical) and an inner
  // projection reduces pairs to (src, dst, sim) = 24 B/row BEFORE the
  // window, whose ORDER BY references only the projected column.
  private val knnGraphCteSql: String =
    s"""WITH ${trainedCentsChain("centroid_id")},
       |ranked AS MATERIALIZED (
       |  SELECT e.vec_id, e.embedding, c.centroid_id,
       |         ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |           ORDER BY ${cosSql("e.embedding", "c.cvec")} DESC,
       |                    c.centroid_id ASC) AS rn
       |  FROM embeddings e CROSS JOIN cents c),
       |assigned AS (SELECT vec_id, embedding, centroid_id
       |             FROM ranked WHERE rn = 1),
       |capped AS (
       |  SELECT vec_id, embedding, centroid_id,
       |         ${normSqlOf("embedding")} AS nrm FROM (
       |    SELECT vec_id, embedding, centroid_id,
       |           ROW_NUMBER() OVER (PARTITION BY centroid_id ORDER BY vec_id) AS crn
       |    FROM assigned) r
       |  WHERE crn <= 1024),
       |probes AS (SELECT vec_id, embedding, centroid_id,
       |                  ${normSqlOf("embedding")} AS nrm
       |           FROM ranked WHERE rn <= 4),
       |graph AS MATERIALIZED (
       |  SELECT src, dst, sim, CAST(rnk AS INT) AS rnk FROM (
       |    SELECT src, dst, sim,
       |           ROW_NUMBER() OVER (PARTITION BY src
       |             ORDER BY sim DESC, dst ASC) AS rnk
       |    FROM (
       |      SELECT p.vec_id AS src, a.vec_id AS dst,
       |             CAST(ROUND(CAST(${dotSql("p.embedding", "a.embedding")}
       |               / (p.nrm * a.nrm) AS DECIMAL(20,12)), 9) AS DOUBLE) AS sim
       |      FROM probes p JOIN capped a USING (centroid_id)
       |      WHERE p.vec_id <> a.vec_id) s) g
       |  WHERE rnk <= 5)
       |""".stripMargin

  // IVF cell assignment + probe pruning on top of the PQ recon chain;
  // same argmax/tie-break text as ann_ivf, same recon as ann_pq_adc.
  // Shared verbatim by ann_ivfpq (in-memory composition) and
  // ann_index_scan (stored, partition-pruned serving path): the index
  // layout must not change the answer.
  private lazy val ivfPqSql: String = ivfPqSqlWhere("")
  // same chain with a residual predicate on the stored metadata —
  // filtered search: the top-k among matching rows (pre-filter)
  private def ivfPqSqlWhere(where: String): String = pqBestCtesTrained +
    s"""
       |, q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |cell AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT e.vec_id, c.cid,
       |           ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cosSql("e.embedding", "c.cvec")} DESC,
       |                      c.cid ASC) AS rn
       |    FROM embeddings e CROSS JOIN cents c) r WHERE rn = 1),
       |probes AS (
       |  SELECT cid FROM cents CROSS JOIN q
       |  ORDER BY ${cosSql("cvec", "qv")} DESC, cid ASC LIMIT 4),
       |recon AS (
       |  SELECT vec_id,
       |         flatten(list(list_slice(c.cvec, s*8 + 1, s*8 + 8)
       |                      ORDER BY s)) AS rv
       |  FROM best JOIN cents c USING (cid)
       |  GROUP BY vec_id)
       |SELECT r.vec_id, e.label, ${cosSql("r.rv", "qv")} AS sim
       |FROM recon r
       |JOIN cell USING (vec_id)
       |JOIN probes USING (cid)
       |JOIN embeddings e ON r.vec_id = e.vec_id
       |CROSS JOIN q
       |$where
       |ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin

  // The near-dup funnel's pair graph is ONE computation feeding both
  // cluster assignment (dd_cluster) and canonical selection
  // (dd_canonical) — exactly as a production pipeline materializes
  // pairs once and fans out. Memoized+cached per session with only the
  // LAST sfDir retained (the csrAggMemo/SqlLab discipline: a superseded
  // dir's frame is unpersisted on switch, so a long-lived session
  // iterating over scale factors cannot accumulate pinned executor
  // storage); stopped sessions evicted before each lookup.
  private def lastDirMemo(
      memo: java.util.concurrent.ConcurrentHashMap[SparkSession, (String, DataFrame)],
      s: SparkSession, d: String)(build: => DataFrame): DataFrame = {
    memo.keySet.removeIf(k => k.sparkContext.isStopped)
    memo.compute(s, (_, prev) =>
      Option(prev) match {
        case Some(hit @ (dir, _)) if dir == d => hit
        case stale =>
          stale.foreach(_._2.unpersist(blocking = false))
          (d, build.cache())
      })._2
  }
  private val lshMemo = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, (String, DataFrame)]
  private def lshPairs(s: SparkSession, d: String): DataFrame =
    lastDirMemo(lshMemo, s, d)(
      Dedup.minhashLsh(Tables.documents(s, d), minEstSim = 0.25))
  // the shipped-config kNN graph (k = 5, nprobe = 4 over the trained
  // cells) and its mutual restriction, memoized per (session, sfDir).
  // Similarity.knnGraph already memoizes the CACHED frame through
  // PlanMemo, but a memo HIT still costs ~0.3-0.4 s per call: the plan
  // must be re-CONSTRUCTED to be compared (probeAssign + assign each run
  // a collectUpTo driver action against the centroid frame, then
  // sameResult canonicalizes two 16x64-literal trees). Nine queries pay
  // that tax per bench pass — the round-7 graph-family regression was
  // mostly THIS, not candidate volume. Keying the finished frame by
  // (session, sfDir) makes the repeated lookup a map read.
  private val knnGraphMemo = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, (String, DataFrame)]
  private def knnGraph5x4(s: SparkSession, d: String): DataFrame =
    lastDirMemo(knnGraphMemo, s, d)(
      Similarity.knnGraph(Tables.embeddings(s, d), trainedCents(s, d),
        k = 5, nprobe = 4))
  // the mutual (reciprocated-edge) restriction three queries build on:
  // the intersect is two shuffles of the edge list — shared state, not
  // per-query work, exactly like the closure memos above
  private val mutualKnnMemo = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, (String, DataFrame)]
  private def mutualKnnEdges(s: SparkSession, d: String): DataFrame =
    lastDirMemo(mutualKnnMemo, s, d) {
      val g = knnGraph5x4(s, d).select(col("src"), col("dst"))
      g.intersect(g.select(col("dst").as("src"), col("src").as("dst")))
    }
  // ... and its transitive closure, the second expensive funnel stage
  // (iterative star contraction): computed once, read by dd_cluster and
  // dd_canonical
  private val ccMemo = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, (String, DataFrame)]
  private def ccLabels(s: SparkSession, d: String): DataFrame =
    lastDirMemo(ccMemo, s, d)(Dedup.connectedComponents(lshPairs(s, d)))
  // "yesterday's" stored labeling for the incremental-cluster query —
  // amortized state in production (the corpus's dedup index, built once
  // per ingest cycle); memoized so the query's measured cost is the
  // incremental MERGE, not the fixture's state prep
  private val storedCcMemo = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, (String, DataFrame)]
  private def storedClusterLabels(s: SparkSession, d: String): DataFrame =
    lastDirMemo(storedCcMemo, s, d)(
      Dedup.connectedComponents(lshPairs(s, d).filter(
        col("doc_a") % 5 =!= 0 && col("doc_b") % 5 =!= 0)))
  // Shared decode passes for the multimodal family (round 9): the GIF /
  // WAV / BMP decode chains dominate each mm_* query's cost, and
  // several queries consume the SAME decoded product — frame energies
  // feed mm_videoprint + mm_keyframes + mm_scenes, window energies feed
  // mm_audioprint + mm_segments, image hashes feed mm_phash +
  // mm_phash_pairs + the cluster labeling. Decoding per query measured
  // N× the one real pass (the phashStarPairs one-decode finding,
  // Multimodal.scala, extended family-wide); memoizing the finished
  // frame per (session, sfDir) makes every later consumer a map read.
  // All three frames are asset-linear and tiny (≤ 5 frames/clip, ≤ 63
  // windows/track, one hash row/image), so the cache pin is bounded.
  // the generated asset payloads themselves are ALSO shared state: every
  // decode-pass build re-ran the BMP/WAV/GIF ENCODE chain over the
  // corpus before decoding — caching the assets frame (asset-linear,
  // small synthetic payloads) makes each memo build below a pure decode
  private val assetsMemo = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, (String, DataFrame)]
  private def assetsDs(s: SparkSession, d: String)
      : org.apache.spark.sql.Dataset[Multimodal.Asset] = {
    import s.implicits._
    lastDirMemo(assetsMemo, s, d)(
      Multimodal.assets(Tables.documents(s, d)).toDF())
      .as[Multimodal.Asset]
  }
  private val videoEnergyMemo = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, (String, DataFrame)]
  private def videoEnergies(s: SparkSession, d: String): DataFrame =
    lastDirMemo(videoEnergyMemo, s, d)(
      Multimodal.videoFrameEnergies(assetsDs(s, d)).toDF())
  private val audioWindowMemo = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, (String, DataFrame)]
  private def audioWindows(s: SparkSession, d: String)
      : org.apache.spark.sql.Dataset[Multimodal.AudioWindows] = {
    import s.implicits._
    lastDirMemo(audioWindowMemo, s, d)(
      Multimodal.audioWindowEnergies(assetsDs(s, d)).toDF())
      .as[Multimodal.AudioWindows]
  }
  /** Scale-invariant pair-set checksum — the q_range_join interval-
    * grain trick generalized to the pair families: 64 buckets keyed on
    * `a % 64`, each carrying count, min/max of both endpoints, both
    * endpoint sums, and a mod-p mixed second moment
    * Σ ((a mod p)·(b mod p) + payload) mod p (p = 1e9+7; mod BEFORE
    * multiply keeps every term < p² < 2⁶³ at any id magnitude). Output
    * is ≤ 64 rows at ANY corpus size, so the DuckDB twin streams its
    * identical pair derivation into a hash agg instead of
    * materializing a pair list — the shape that makes the quadratic
    * families sf10-gateable. A wrong pair perturbs count, an endpoint
    * sum, AND the mixed moment; compensating-pair cancellation must
    * satisfy all of them simultaneously in the same bucket.
    */
  private def pairChecksum(pairs: DataFrame, a: String, b: String,
                           payload: org.apache.spark.sql.Column): DataFrame = {
    val P = lit(1000000007L)
    val ca = col(a).cast("long")
    val cb = col(b).cast("long")
    pairs.groupBy((ca % 64).as("bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        min(ca).as("min_a"), max(ca).as("max_a"),
        min(cb).as("min_b"), max(cb).as("max_b"),
        sum(ca).as("sum_a"), sum(cb).as("sum_b"),
        sum(((ca % P) * (cb % P) + payload.cast("long")) % P)
          .as("mix_mod"))
      .orderBy("bucket")
  }

  private val imageHashMemo = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, (String, DataFrame)]
  private def imageHashes(s: SparkSession, d: String): DataFrame =
    lastDirMemo(imageHashMemo, s, d)(
      Multimodal.imagePHash(assetsDs(s, d)).toDF())
  // the per-asset feature record (dims + frame counts through the real
  // decoders) is the pipeline's materialize-once product — amortized
  // exactly like the decode passes it shares the assets frame with
  private val featuresMemo = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, (String, DataFrame)]
  private def assetFeatures(s: SparkSession, d: String): DataFrame =
    lastDirMemo(featuresMemo, s, d)(
      Multimodal.extractFeatures(assetsDs(s, d)).toDF())

  // the image near-dup labeling (phash decode → banded pairs → star
  // contraction): the visual corpus' dedup index — amortized exactly
  // like the text closure above
  private val phashCcMemo = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, (String, DataFrame)]
  private def phashClusterLabels(s: SparkSession, d: String): DataFrame =
    lastDirMemo(phashCcMemo, s, d) {
      val ph = imageHashes(s, d).select("asset_id", "hash_hi", "hash_lo")
      val aug = ph.unionByName(ph.filter(col("asset_id") % 30 === 0)
        .select((col("asset_id") + 1000000).as("asset_id"),
          col("hash_hi"), col("hash_lo")))
      // star edges, not all pairs: components are provably identical
      // (members sit at hamming 0 from their rep) and the edge count is
      // linear in corpus depth instead of quadratic in duplicate-group
      // depth — see Multimodal.phashStarPairs
      val pairs = Multimodal.phashStarPairs(aug)
        .select(col("asset_a").as("doc_a"), col("asset_b").as("doc_b"))
      aug.select(col("asset_id"))
        .join(Dedup.connectedComponents(pairs)
          .select(col("v").as("asset_id"), col("label")),
          Seq("asset_id"), "left")
        .select(col("asset_id").as("v"),
          coalesce(col("label"), col("asset_id")).as("label"))
    }

  /** The fixed first-16 PQ codebook config (ann_pq / ann_pq_adc only —
    * see `fixedCentsCid` on the oracle side). */
  private def fixed16Centroids(e: DataFrame): DataFrame =
    e.filter(col("vec_id").between(1, 16))
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))

  /** The SHIPPED cell config for the IVF / kNN-graph / SemDeDup / index
    * families: k-means-trained centroids (k = 16, 2 Lloyd iterations,
    * deterministic seed + order-independent decimal means — the
    * [[Similarity.trainCentroids]] oracle contract, re-derived by the
    * DuckDB twins as unrolled CTEs in `trainedCentsChain`). Memoized per
    * (session, sfDir) like the other amortized corpus state: an index's
    * geometry is trained once per corpus, not once per query.
    */
  private val centsMemo = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, (String, DataFrame)]
  private def trainedCents(s: SparkSession, d: String): DataFrame =
    lastDirMemo(centsMemo, s, d)(
      Similarity.trainCentroids(Tables.embeddings(s, d), k = 16, iters = 2))

  // The stored ANN index the two serving queries probe: ONE build per
  // (session, sfDir) — an index is amortized state in production, built
  // by the indexing job and probed by every query; rebuilding (and
  // deleting) it per query call measured index-build IO as query cost
  // and wrote a fresh index copy per gate run. The scratch tree is
  // removed by a JVM shutdown hook (and eagerly when the sfDir
  // switches), so repeated runs still leave nothing behind.
  private val annIndexMemo = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, (String, String)]
  private def storedIndex(s: SparkSession, d: String): String = {
    annIndexMemo.keySet.removeIf(k => k.sparkContext.isStopped)
    annIndexMemo.compute(s, (_, prev) =>
      Option(prev) match {
        case Some(hit @ (dir, _)) if dir == d => hit
        case stale =>
          stale.foreach(p => graft.core.Scratch.deleteRecursively(
            java.nio.file.Paths.get(p._2)))
          val root = graft.core.Scratch.fastTempDirectory("graft_annidx",
            graft.core.Scratch.tableBytes(d, "embeddings") * 2)
          sys.addShutdownHook {
            try graft.core.Scratch.deleteRecursively(root)
            catch { case _: Throwable => () }
          }
          val e = Tables.embeddings(s, d)
          Similarity.writeIndex(e, trainedCents(s, d), root.toString)
          (d, root.toString)
      })._2
  }

  /** Shared cold-fill stages for Bench (the __sqllab_fill pattern): each
    * entry is (line name, consumer queries, fill thunk). Bench runs a
    * fill before the cold pass iff one of its consumers is selected and
    * times it as its OWN line, so per-query cold numbers mean query
    * cost, not whichever query ran first paying a shared memo fill.
    */
  def coldFills: Seq[(String, Set[String], (SparkSession, String) => Unit)] = Seq(
    // the trained cell geometry every IVF/graph/SemDeDup-family query
    // serves from (k-means, 2 Lloyd passes over the corpus) — FIRST so
    // the index/graph fills below consume it instead of absorbing it
    ("__cents_train_fill",
      Set("ann_ivf", "ann_ivfpq", "ann_batch", "ann_index_scan",
        "ann_filtered", "ann_index_append", "ann_knn_graph",
        "search_margin", "dd_semdedup", "dd_proto_prune",
        "ts_cluster_balance", "graph_pagerank", "graph_label_prop",
        "graph_kcore", "graph_ppr", "graph_triangles", "graph_linkpred",
        "graph_degree_dist"),
      (s, d) => { trainedCents(s, d).count(); () }),
    // the near-dup funnel: LSH signature+pair graph and its transitive
    // closure — read by dd_cluster/dd_canonical (the signature half also
    // serves dd_minhash_lsh through PlanMemo)
    ("__neardup_closure_fill", Set("dd_cluster", "dd_canonical", "dd_reweight"),
      (s, d) => { ccLabels(s, d).count(); () }),
    // the stored band index an incremental wave probes
    ("__band_index_fill", Set("dd_incremental_lsh"),
      (s, d) => {
        Dedup.minhashBands(
          Tables.documents(s, d).filter(col("doc_id") % 5 =!= 0)).count()
        ()
      }),
    // curation's internal signature frame (over its exact-dedup keepers)
    ("__curation_sigs_fill", Set("ts_curation"),
      (s, d) => Curation.prefillShared(Tables.documents(s, d))),
    // yesterday's component labeling the incremental-cluster merge
    // probes (amortized dedup state in production)
    ("__stored_cluster_fill", Set("dd_incremental_cluster"),
      (s, d) => { storedClusterLabels(s, d).count(); () }),
    // the image near-dup labeling (phash decode + pair graph + closure)
    ("__phash_cluster_fill", Set("mm_phash_cluster"),
      (s, d) => { phashClusterLabels(s, d).count(); () }),
    // the stored ANN index both serving queries probe
    ("__ann_index_fill", Set("ann_index_scan", "ann_filtered"),
      (s, d) => { storedIndex(s, d); () }),
    // the kNN edge list the graph query materializes and the margin
    // rescoring reads three times
    ("__knn_graph_fill",
      Set("ann_knn_graph", "search_margin", "graph_pagerank",
        "graph_label_prop", "graph_kcore", "graph_triangles",
        "graph_ppr", "graph_degree_dist", "graph_linkpred"),
      (s, d) => {
        knnGraph5x4(s, d).count()
        mutualKnnEdges(s, d).count()
        ()
      }),
    // the DSIR feature/weight memo (Importance.dsirWeights → PlanMemo
    // "importance.weights.256"): without this line a fresh-JVM driver
    // bench charged the dist/ratio/join fill stack to ts_dsir itself
    // (4.70 s driver vs 0.30 s warm in round 12 — VERDICT r12 defect 1)
    ("__dsir_feats_fill", Set("ts_dsir"),
      (s, d) => {
        Importance.dsirWeights(Tables.documents(s, d),
          col("lang") === "en", buckets = 256).count()
        ()
      }),
    // the conformed sales fact (lineitem⨝orders) every mart / daily-
    // series / pivot consumer re-derives — one memo fill per session
    ("__sales_conform_fill",
      Set("m_customer_metrics", "m_customer_sales_report",
        "m_product_performance", "m_supplier_performance",
        "m_csr_approx_tiers", "m_csr_inplan_tiers", "q_regression",
        "q_holt", "q_cusum", "q_seasonal", "q_ewma", "q_anomaly",
        "q_grouping_sets", "q_pivot", "q_unpivot"),
      (s, d) => { graft.sources.Entities.salesCached(s, d).count(); () }))

  def queries: Map[String, Q] = Map(
    "ts_quality" -> ((s, d) =>
      TextAnalysis.quality(Tables.documents(s, d)).orderBy("doc_id")),
    // metric CALIBRATION: does the quality signal predict duplication?
    // Docs deciled by alpha ratio (tie-broken total order), exact-dup
    // membership rate per decile vs the corpus rate — the validation a
    // curation pipeline publishes before gating on a score. The decile
    // ntile is a corpus-grain rank: exact here for oracle parity; at
    // 100 TB the assignment becomes range-partitioned ranking (the
    // shardAssign argument) or approx-percentile boundaries — the
    // per-decile AGGREGATES this row emits are unchanged either way
    "ts_quality_calibration" -> ((s, d) => {
      val d2012 = org.apache.spark.sql.types.DecimalType(20, 12)
      def round9(c: org.apache.spark.sql.Column) =
        round(c.cast(d2012), 9).cast("double")
      // ONE scan computes fp AND alpha_ratio; the dup flag is a count
      // over Window.partitionBy(fp) instead of the old
      // groupBy(fp)+join-back+join(doc_id) — md5(normalized(text)) now
      // evaluates once (it ran on BOTH sides of the fp self-join), and
      // the plan drops from 3 corpus exchanges (fp-agg, fp-probe,
      // doc_id join) to 1 (fp window). Same rows bit-for-bit: n_fp per
      // doc is identical whichever way it is counted. (r14, guide §2.4)
      val docs = Tables.documents(s, d)
      val scored = docs.select(col("doc_id"),
          (length(regexp_replace(col("text"), "[^a-zA-Z]", ""))
            .cast("double") / length(col("text"))).as("alpha_ratio"),
          md5(TextAnalysis.normalized(col("text"))).as("fp"))
        .withColumn("is_dup",
          (count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy("fp")) >= 2).cast("long"))
        .drop("fp")
        .withColumn("decile", ntile(10).over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("alpha_ratio").asc, col("doc_id").asc)))
      val byDecile = scored.groupBy("decile")
        .agg(count(lit(1)).as("n_docs"), sum("is_dup").as("n_dups"))
      // the overall rate is a whole-frame aggregate over the ≤10-row
      // decile frame — an unpartitioned window, so the fp self-join +
      // corpus ntile upstream runs once (the crossBroadcast form
      // re-evaluated the whole scoring pass for its broadcast side)
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
      byDecile
        .withColumn("dup_rate",
          round9(col("n_dups").cast("double") / col("n_docs").cast("double")))
        .withColumn("overall_rate",
          round9(sum("n_dups").over(wAll).cast("double")
            / sum("n_docs").over(wAll).cast("double")))
        .select("decile", "n_docs", "n_dups", "dup_rate", "overall_rate")
        .orderBy("decile")
    }),
    // the per-source data card a curation run publishes with its output
    "ts_corpus_profile" -> ((s, d) =>
      TextAnalysis.corpusProfile(Tables.documents(s, d))
        .orderBy("source")),
    "ts_langid" -> ((s, d) =>
      TextAnalysis.languageId(Tables.documents(s, d)).orderBy("doc_id")),
    // exact phrase search over a positional inverted index — postings
    // filtered to the phrase terms pre-shuffle, anchor-aligned
    // equi-joins (pos − i) instead of L−1 inequality chains
    "search_phrase" -> ((s, d) =>
      Search.phraseSearch(Tables.documents(s, d), Seq("table", "value"))),
    // langid EVALUATION: confusion matrix against the corpus' lang
    // label — per-language recall + overall accuracy, the QA readout a
    // curation pipeline publishes next to the classifier it ships.
    // Cell-grain frames after one doc-keyed join; marginals window off
    // the cells, the 1-row total rides a broadcast.
    "ts_langid_confusion" -> ((s, d) => {
      val d2012 = org.apache.spark.sql.types.DecimalType(20, 12)
      def round9(c: org.apache.spark.sql.Column) =
        round(c.cast(d2012), 9).cast("double")
      val docs = Tables.documents(s, d)
      // cell-grain and tiny, but feeding BOTH the windowed marginals
      // and the 1-row total — without the memo the doc-keyed join and
      // the full scoring pass would run twice per invocation
      val cells = graft.core.PlanMemo.cached("langid_cells",
        docs.select(col("doc_id"), col("lang"))
          .join(TextAnalysis.languageId(docs)
            .select(col("doc_id"), col("predicted_lang")), Seq("doc_id"))
          .groupBy("lang", "predicted_lang").agg(count(lit(1)).as("n")))
      val byLang = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      val correct = when(col("lang") === col("predicted_lang"), col("n"))
        .otherwise(0L)
      val tot = cells.agg(sum("n").as("nn"), sum(correct).as("ncorr"))
      graft.core.Scalars.crossBroadcast(
        cells
          .withColumn("n_lang", sum("n").over(byLang))
          .withColumn("n_corr", sum(correct).over(byLang)), tot)
        .select(col("lang"), col("predicted_lang"), col("n"),
          round9(col("n_corr").cast("double") / col("n_lang").cast("double"))
            .as("recall"),
          round9(col("ncorr").cast("double") / col("nn").cast("double"))
            .as("accuracy"))
        .orderBy("lang", "predicted_lang")
    }),
    "ts_tokens_fp" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextAnalysis.tokenCounts(docs)
        .join(TextAnalysis.fingerprints(docs).select("doc_id", "md5_fp"),
          "doc_id")
        .orderBy("doc_id")
    }),
    "ts_vocab" -> ((s, d) =>
      TextAnalysis.vocabulary(Tables.documents(s, d), topK = 100)),
    // SpaceSaving sketch at capacity >> |vocab| degenerates to exact
    // counts, making the custom TypedImperativeAggregate oracle-checkable
    "ts_topk_sketch" -> ((s, d) =>
      Tables.documents(s, d)
        .repartition(col("doc_id"))  // corpus arrives as one partition
        .select(explode(split(TextAnalysis.normalized(col("text")), " "))
          .as("token"))
        .agg(SpaceSavingTopK.topkSketch(col("token"), 100000).as("m"))
        .selectExpr("explode(m) AS (token, est_count)")
        .orderBy("token")),
    "ts_tfidf" -> ((s, d) =>
      TextAnalysis.tfIdf(Tables.documents(s, d))
        .orderBy("doc_id", "token")),
    // BM25 keyword search: one rare + two common terms so idf spread is
    // real (the rare term dominates any doc containing it)
    "ts_bm25" -> ((s, d) =>
      Search.bm25TopK(Tables.documents(s, d),
        Seq("dup", "spark", "customer"), k = 10)),
    // hybrid retrieval: reciprocal-rank fusion of the BM25 ranking and
    // the brute cosine ranking (doc_id ≡ vec_id in the fixtures); a doc
    // either retriever finds still scores (full-outer fusion)
    "search_rrf" -> ((s, d) =>
      Search.hybridRrf(Tables.documents(s, d), Tables.embeddings(s, d),
        Seq("dup", "spark", "customer"),
        Tables.embeddings(s, d).filter(col("vec_id") === 0))),
    // balanced per-source eval subset, reproducible by construction
    "ts_stratified" -> ((s, d) =>
      TextAnalysis.stratifiedSample(Tables.documents(s, d), n = 10)
        .select("doc_id", "source", "sample_rank")
        .orderBy("source", "sample_rank")),
    // the sketch's GROUPED path: one SpaceSaving instance per source,
    // partials merged per group across partitions (a different execution
    // shape from the global ts_topk_sketch aggregate); capacity >> vocab
    // keeps it in the exact regime so DuckDB can twin it
    "ts_topk_by_source" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("source")
        .orderBy(col("est_count").desc, col("token").asc)
      Tables.documents(s, d)
        .repartition(col("doc_id"))
        .select(col("source"),
          explode(split(TextAnalysis.normalized(col("text")), " ")).as("token"))
        .groupBy("source")
        .agg(SpaceSavingTopK.topkSketch(col("token"), 100000).as("m"))
        .selectExpr("source", "explode(m) AS (token, est_count)")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .orderBy("source", "rnk")
    }),
    "ts_split" -> ((s, d) =>
      TextAnalysis.hashSplit(Tables.documents(s, d))
        .groupBy("split")
        .agg(count(lit(1)).as("n"), min("doc_id").as("min_doc"))
        .orderBy("split")),
    // one BPE count→merge statistics pass over the word-frequency table
    "ts_bpe_pairs" -> ((s, d) =>
      TextAnalysis.bpePairCounts(Tables.documents(s, d), topK = 50)),
    // the TRAINING loop those statistics feed: five count→argmax→merge
    // rounds over the vocab-sized word table; the learned merge table
    // is the output (subword_encode is the apply stage)
    "ts_bpe_train" -> ((s, d) =>
      TextAnalysis.bpeTrain(Tables.documents(s, d), rounds = 5)),
    // the APPLY stage: corpus-learned trigram vocab run greedily over
    // every distinct word (TextAnalysis.subwordEncode scaladoc); the
    // oracle replays the same greedy scan as a recursive CTE
    "ts_subword_encode" -> ((s, d) =>
      TextAnalysis.subwordEncode(Tables.documents(s, d), vocabSize = 64)),
    // RAG ingestion chunking: 16-token windows advancing by 12 (the
    // documents table's texts are short; production would run 512/384)
    "ts_rag_chunks" -> ((s, d) =>
      TextAnalysis.ragChunks(Tables.documents(s, d), width = 16,
        stride = 12)
        .orderBy("doc_id", "chunk_id")),
    // fraction of each doc's distinct 3-gram phrasing unique to it
    // benchmark decontamination: train docs sharing 3-shingles with the
    // doc_id%97 eval subset, GPT-3-appendix-C-style overlap flagging
    "ts_decontaminate" -> ((s, d) =>
      TextAnalysis.decontaminate(Tables.documents(s, d),
        col("doc_id") % 97 === 0, threshold = 0.5)
        .orderBy("doc_id")),
    // the published regime: GPT-3 appendix C flags train docs on
    // 13-gram collisions with the eval set (3-gram windows flag
    // commonplace phrasing; 13-grams only near-verbatim spans — the
    // synthetic corpus's near-dup families). Same pipeline, n = 13,
    // threshold lowered: 13-gram overlap is sparse-or-saturated
    "ts_decontaminate13" -> ((s, d) =>
      TextAnalysis.decontaminate(Tables.documents(s, d),
        col("doc_id") % 97 === 0, n = 13, threshold = 0.25)
        .orderBy("doc_id")),
    "ts_novelty" -> ((s, d) =>
      TextAnalysis.noveltyScore(Tables.documents(s, d))
        .orderBy("doc_id")),
    // deterministic training-order shuffle + hash-ranged shard layout
    "ts_shards" -> ((s, d) =>
      TextAnalysis.shardAssign(Tables.documents(s, d), nShards = 8)
        .orderBy("shard_id", "shard_pos")),
    // A-ES weighted sample: longer documents proportionally likelier
    "ts_weighted_sample" -> ((s, d) =>
      TextAnalysis.weightedSample(Tables.documents(s, d), k = 50)),
    "dd_exact" -> ((s, d) =>
      Dedup.exact(Tables.documents(s, d)).orderBy("fp")),
    // incremental wave: docs %5==0 arrive as a new batch against the
    // stored index of the rest — classifies corpus_dup / batch_dup /
    // novel without touching corpus text
    "dd_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val index = Dedup.exactIndex(docs.filter(col("doc_id") % 5 =!= 0))
      Dedup.incrementalExact(index, docs.filter(col("doc_id") % 5 === 0))
        .orderBy("doc_id")
    }),
    // Bloom-pruned wave classification: the high-novelty ingest shape —
    // only might-contain suspects reach the stored index join
    "dd_bloom_prune" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val index = Dedup.exactIndex(docs.filter(col("doc_id") % 5 =!= 0))
      Dedup.bloomPrunedIncremental(index, docs.filter(col("doc_id") % 5 === 0))
        .orderBy("doc_id")
    }),
    "dd_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccard(Tables.documents(s, d), threshold = 0.2)
        .orderBy("doc_a", "doc_b")),
    "dd_minhash_lsh" -> ((s, d) =>
      lshPairs(s, d).orderBy("doc_a", "doc_b")),
    // simhash bit-votes come from md5 nibbles — oracle-comparable
    "dd_simhash" -> ((s, d) =>
      Dedup.simhash(Tables.documents(s, d)).orderBy("doc_id")),
    // single-shuffle-join banded pair generation over the fingerprints
    "dd_simhash_pairs" -> ((s, d) =>
      Dedup.simhashPairs(Tables.documents(s, d), maxDist = 8)
        .orderBy("doc_a", "doc_b")),
    // ── aggregate-checksum twins of the pair families (VERDICT r13
    //    task 4): the raw pair rows' DuckDB twins are sf10-infeasible
    //    only because they MATERIALIZE the pair list for the ORDER BY
    //    + hash compare; these rows stream the identical pair
    //    derivation into a 64-bucket pair-set checksum (count, min/max,
    //    sums, and a mod-p mixed second moment over (a, b, payload)) on
    //    BOTH engines — the q_range_join interval-grain trick — so the
    //    families graduate from sf10 invariants to sf10 hashes while
    //    emitting ≤ 64 rows at any SF ───────────────────────────────────
    "dd_simhash_cksum" -> ((s, d) =>
      pairChecksum(Dedup.simhashPairs(Tables.documents(s, d), maxDist = 8),
        "doc_a", "doc_b", col("hamming"))),
    "dd_winnow_cksum" -> ((s, d) =>
      pairChecksum(Dedup.winnowPairs(Tables.documents(s, d), k = 8, w = 4),
        "doc_a", "doc_b", col("n_common"))),
    "mm_phash_cksum" -> ((s, d) => {
      val ph = imageHashes(s, d).select("asset_id", "hash_hi", "hash_lo")
      val aug = ph.unionByName(ph.filter(col("asset_id") % 30 === 0)
        .select((col("asset_id") + 1000000).as("asset_id"),
          col("hash_hi"), col("hash_lo")))
      pairChecksum(Multimodal.phashStarPairs(aug),
        "asset_a", "asset_b", col("hamming"))
    }),
    "ann_brute" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.bruteTopK(e, e.filter(col("vec_id") === 0), k = 10)
    }),
    // MMR diversified reranking over the brute candidate set: greedy
    // λ·qsim − (1−λ)·max-selected-sim selection (λ and 1−λ both parsed
    // literals), driver greedy over in-plan-rounded sims only
    "ann_mmr" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.mmrRerank(e, e.filter(col("vec_id") === 0))
    }),
    // two-stage matryoshka retrieval: coarse rank over the first 16
    // dims, exact cosine re-rank of the 50 survivors
    "ann_prefix_rerank" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.prefixRerank(e, e.filter(col("vec_id") === 0), k = 10)
    }),
    // two-stage retrieval through a Rademacher JL projection — the
    // no-matryoshka-structure counterpart of ann_prefix_rerank
    "ann_jl_rerank" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.jlRerank(e, e.filter(col("vec_id") === 0), k = 10)
    }),
    "ann_ivf" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.ivfTopK(e, trainedCents(s, d),
        e.filter(col("vec_id") === 0), k = 10, nprobe = 4)
    }),
    "dd_embed_cos" -> ((s, d) =>
      Similarity.signLshPairs(Tables.embeddings(s, d), threshold = 0.3)
        .orderBy("vec_a", "vec_b")),
    // approximate k-NN graph: every vector probes its 4 nearest of the
    // trained k=16 cells (the shipped ann_ivf config) and ranks the
    // members top-5; directed, rank filter rides WindowGroupLimit
    "ann_knn_graph" -> ((s, d) =>
      knnGraph5x4(s, d).orderBy("src", "rnk")),
    // DSIR importance resampling (Xie et al. 2023): hashed
    // unigram+bigram bag scored target('en')-vs-raw with add-one
    // smoothing, Gumbel top-k sample without replacement
    "ts_dsir" -> ((s, d) =>
      Importance.dsirSample(Tables.documents(s, d),
        col("lang") === "en", k = 200, buckets = 256)
        .orderBy("rnk")),
    // PageRank centrality over the same kNN graph: prototypicality /
    // hub scoring; 5 power iterations through the CC checkpoint seam
    "graph_pagerank" -> ((s, d) =>
      PageRankOp.pageRank(
        knnGraph5x4(s, d).select(col("src"), col("dst")))),
    // label-propagation communities over the same kNN graph: dense-
    // region clustering (topic-ish groups for balanced sampling) — CC
    // would glue everything reachable; LPA splits along sparse cuts.
    // 5 synchronous integer-only rounds, smallest-label tie-break
    "graph_label_prop" -> ((s, d) =>
      LabelProp.labelPropagate(
        knnGraph5x4(s, d).select(col("src"), col("dst")))),
    // k-core backbone of the MUTUAL-kNN graph (edges kept only when
    // reciprocated — the standard hubness-reducing construction; the
    // raw symmetrized kNN graph has uniform degree ≥ 5, which makes
    // every k-core trivially full or empty). Iterative peel to the
    // Spark-side fixpoint (loud-fail past 12 rounds); the oracle
    // unrolls all 12 — post-convergence rounds are identity, so both
    // engines land on the identical core
    "graph_kcore" -> ((s, d) =>
      KCore.kCore(mutualKnnEdges(s, d), k = 2, maxRounds = 12)),
    // personalized PageRank: restart to the label-0 seed set — the
    // corpus-expansion primitive (seed a curated handful, rank the
    // whole graph by multi-hop similarity to it); unreachable nodes
    // hold exactly 0.0 on both engines
    "graph_ppr" -> ((s, d) =>
      PageRankOp.personalizedPageRank(
        knnGraph5x4(s, d).select(col("src"), col("dst")),
        Tables.embeddings(s, d).filter(col("label") === 0)
          .select(col("vec_id").as("node")))),
    // triangle counts + local clustering coefficient over the mutual
    // graph: degree-ordered orientation (compact-forward) bounds the
    // wedge fan-out — the O(m^1.5) form that survives hubs at scale
    "graph_triangles" -> ((s, d) =>
      Triangles.triangleStats(mutualKnnEdges(s, d))),
    // common-neighbor link prediction over the mutual graph: non-edge
    // pairs sharing neighbors, neighborhood-Jaccard ranked — the
    // densification / retrieval-expansion candidates the stored k missed
    "graph_linkpred" -> ((s, d) =>
      LinkPred.commonNeighborPairs(mutualKnnEdges(s, d))),
    // degree distribution of the symmetrized kNN graph + mean degree —
    // the one-glance hubness/connectivity profile read before tuning k
    // or thresholding mutual edges; reuses the memoized graph, then
    // node-grain → degree-grain frames only
    "graph_degree_dist" -> ((s, d) => {
      val d2012 = org.apache.spark.sql.types.DecimalType(20, 12)
      val g = knnGraph5x4(s, d).select(col("src"), col("dst"))
      val edges = g
        .union(g.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
      val hist = edges.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("degree"))
        .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
      // mean degree is a whole-frame aggregate over the degree-grain
      // histogram (bounded by max degree) — an unpartitioned window, so
      // the union+distinct+two-groupBy chain above runs once instead of
      // once per crossBroadcast side
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
      hist
        .select(col("degree"), col("n_nodes"),
          round((sum(col("degree") * col("n_nodes")).over(wAll).cast("double")
            / sum("n_nodes").over(wAll).cast("double"))
            .cast(d2012), 9).cast("double").as("mean_degree"))
        .orderBy("degree")
    }),
    // margin-scored mining (Artetxe & Schwenk ratio margin) over the
    // same graph config: edges rescored by the two sides' neighborhood
    // densities — the bitext/aligned-pair filtering criterion
    "search_margin" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cents = trainedCents(s, d)
      Similarity.marginPairs(e, cents, k = 5, nprobe = 4)
        .orderBy(desc("margin"), asc("src"), asc("dst"))
    }),
    // SemDeDup: centroid-cell blocking instead of sign-LSH; trained
    // k=16 centroids (the shipped ann_ivf config) — DuckDB re-trains the
    // identical cells in-oracle and mirrors the assignment argmax exactly
    "dd_semdedup" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cents = trainedCents(s, d)
      Similarity.semDedup(e, cents, threshold = 0.25, maxCell = 256)
        .orderBy("vec_a", "vec_b")
    }),
    // unsampled: the (first-token, length-band) composite block bounds
    // per-block size even over the small synthetic first-word vocab
    // STAR form (round 8): the gate's fuzzy row emits one row per
    // duplicate id + one per distinct fuzzy text pair — linear in the
    // corpus — instead of every id pair in every duplicate group
    // (quadratic in group depth: 468M rows at sf1). The all-pairs
    // fuzzyPairs stays spec-pinned (DedupSpec) as the small-scale form.
    "dd_fuzzy" -> ((s, d) =>
      Dedup.fuzzyStarPairs(Tables.part(s, d), "p_partkey", "p_name",
        maxDist = 3).orderBy("id_a", "id_b")),
    "mm_features" -> ((s, d) => assetFeatures(s, d).orderBy("asset_id")),
    // average-hash perceptual fingerprints over the decoded images —
    // the image-dedup primitive; the oracle re-derives every sampled
    // byte from the BMP generator's closed form, so the whole decode →
    // NN-sample → threshold → pack chain is falsifiable bit-for-bit
    "mm_phash" -> ((s, d) => imageHashes(s, d).orderBy("asset_id")),
    // audio energy fingerprints over the decoded PCM — the WAV member
    // of the perceptual family; the oracle re-derives every sample
    // from the generator's closed form, falsifying the decode path
    "mm_audioprint" -> ((s, d) =>
      Multimodal.audioFingerprintOf(audioWindows(s, d))
        .toDF().orderBy("asset_id")),
    // VAD-style silence segmentation over the same decoded window
    // energies: maximal voiced/silent runs → per-utterance segments
    "mm_segments" -> ((s, d) =>
      Multimodal.audioSegmentsOf(audioWindows(s, d))
        .toDF().orderBy("asset_id", "seg_idx")),
    // image near-dup CLUSTERS: the banded phash pair graph (same
    // augmented fixture as mm_phash_pairs) closed into components by
    // the log-round star contraction — pairwise hamming is not
    // transitive, dedup keeps one image per component; every image
    // (clustered or not) gets a labeled row, singletons label themselves
    "mm_phash_cluster" -> ((s, d) =>
      Dedup.clustersOf(phashClusterLabels(s, d))
        .withColumnRenamed("doc_id", "asset_id")
        .orderBy("asset_id")),
    // per-frame video energies through the real GIF decode chain —
    // container parse, LZW, palette lookup all falsified by the
    // closed-form oracle; keyframe pick / temporal near-dup primitive
    "mm_videoprint" -> ((s, d) =>
      videoEnergies(s, d).orderBy("asset_id", "frame_idx")),
    // keyframe selection: the argmax-energy frame per clip (ties → the
    // EARLIEST frame) — the frame a caption/embedding model would get;
    // rank-1 rides WindowGroupLimit like every top-1 in the engine
    "mm_keyframes" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("asset_id")
        .orderBy(desc("frame_energy"), asc("frame_idx"))
      videoEnergies(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("asset_id"), col("n_frames"), col("frame_idx"),
          col("frame_energy"))
        .orderBy("asset_id")
    }),
    // scene-change segmentation over the same decoded frame energies:
    // a frame starts a new scene when its |Δenergy| vs the previous
    // frame EXCEEDS the clip's integer-mean |Δ| (all-integer — sums,
    // abs, DIV — so both engines agree bit-for-bit); single-frame clips
    // are one scene. The temporal counterpart of mm_segments' silence
    // split: keyframes pick a frame, scenes partition the clip.
    "mm_scenes" -> ((s, d) => {
      val en = videoEnergies(s, d)
      val byFrame = org.apache.spark.sql.expressions.Window
        .partitionBy("asset_id").orderBy("frame_idx")
      val dd = en
        .withColumn("ad",
          abs(col("frame_energy") - lag("frame_energy", 1).over(byFrame)))
      val thr = dd.filter(col("ad").isNotNull)
        .groupBy("asset_id")
        .agg(expr("sum(ad) DIV count(ad)").as("thr"))
      dd.join(thr, Seq("asset_id"), "left")
        .withColumn("brk",
          when(col("ad").isNull || col("ad") > col("thr"), 1).otherwise(0))
        .withColumn("scene", sum("brk").over(
          byFrame.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
        .groupBy(col("asset_id"), col("scene"))
        .agg(min("frame_idx").cast("int").as("start_frame"),
          count(lit(1)).cast("int").as("n_frames"))
        .select(col("asset_id"), (col("scene") - 1).cast("int").as("scene_idx"),
          col("start_frame"), col("n_frames"))
        .orderBy("asset_id", "scene_idx")
    }),
    // banded image near-dup pairs (hamming ≤ 3, pigeonhole-exact): the
    // corpus has no natural re-crawls, so every 30th image is injected
    // as a verbatim copy on both engines — those MUST surface as
    // hamming-0 membership rows, alongside any natural near-collisions.
    // CONTRACT (round 8): the gate row emits the linear STAR form
    // (phashStarPairs — exact-hash membership under the lowest-id rep +
    // one bridge per distinct near hash pair); the all-pairs form
    // (phashPairs, quadratic in duplicate-group depth — 1.5M rows at
    // sf1, 93% hamming-0) stays spec-pinned as the small-scale variant
    "mm_phash_pairs" -> ((s, d) => {
      val ph = imageHashes(s, d).select("asset_id", "hash_hi", "hash_lo")
      val aug = ph.unionByName(ph.filter(col("asset_id") % 30 === 0)
        .select((col("asset_id") + 1000000).as("asset_id"),
          col("hash_hi"), col("hash_lo")))
      Multimodal.phashStarPairs(aug).orderBy("asset_a", "asset_b")
    }),
    // composed curation pipeline (quality → dedup → near-dup → split)
    "ts_curation" -> ((s, d) =>
      Curation.curate(Tables.documents(s, d)).orderBy("doc_id")),
    "ts_repetition" -> ((s, d) =>
      TextAnalysis.repetition(Tables.documents(s, d)).orderBy("doc_id")),
    "ts_entropy" -> ((s, d) =>
      TextAnalysis.charEntropy(Tables.documents(s, d)).orderBy("doc_id")),
    // sequence packing into 2048-token context windows, sharded by the
    // md5 hash shard (deterministic, parallel)
    "ts_pack" -> ((s, d) =>
      TextAnalysis.packSequences(Tables.documents(s, d)).orderBy("doc_id")),
    // length-bucketed batching: binary-magnitude buckets, token-budget
    // batches within each, per-batch padding-waste accounting
    "ts_length_batches" -> ((s, d) =>
      TextAnalysis.lengthBucketBatches(Tables.documents(s, d))),
    // unigram log-probability quality score vs the corpus' own unigram
    // distribution (the KenLM-style signal at unigram order)
    "ts_unigram_lp" -> ((s, d) =>
      TextAnalysis.unigramLogProb(Tables.documents(s, d)).orderBy("doc_id")),
    // interpolated bigram LM score (KenLM-shaped, one order up from
    // ts_unigram_lp; unigram back-off so unseen transitions stay finite)
    "ts_bigram_lp" -> ((s, d) =>
      TextAnalysis.bigramLogProb(Tables.documents(s, d)).orderBy("doc_id")),
    // CCNet per-language head/middle/tail perplexity terciles over the
    // same bigram LM (memo-shared with ts_bigram_lp)
    "ts_ccnet_buckets" -> ((s, d) =>
      TextAnalysis.perplexityBuckets(Tables.documents(s, d))
        .orderBy("doc_id")),
    // DataComp-style cluster-balanced curation: per-semantic-cell
    // quality cap over the trained k=16 centroid config (the ann_ivf
    // oracle assignment), rank window rides WindowGroupLimit
    "ts_cluster_balance" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cents = trainedCents(s, d)
      Curation.clusterBalance(Tables.documents(s, d), e, cents, perCell = 20)
    }),
    // D4-style prototypicality pruning: per cell, the floor(0.25·n)
    // vectors closest to their centroid are marked redundant
    "dd_proto_prune" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cents = trainedCents(s, d)
      Curation.protoPrune(e, cents, dropFrac = 0.25)
    }),
    // int8 quantization; q rendered as csv (array hashing is
    // representation-fragile across engines, a string is not)
    "ann_quantize" -> ((s, d) =>
      Similarity.quantizeInt8(Tables.embeddings(s, d))
        .select(col("vec_id"), col("scale"),
          array_join(transform(col("q"), x => x.cast("string")), ",")
            .as("q_csv"))
        .orderBy("vec_id")),
    // product quantization: per-subspace argmin-L2 codes against the
    // fixed first-16 codebook (the pinned PQ-code config); codes
    // rendered csv (array hashing is representation-fragile, ann_quantize
    // precedent)
    "ann_pq" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cents = fixed16Centroids(e)
      Similarity.pqEncode(e, cents, m = 8)
        .select(col("vec_id"),
          array_join(transform(col("codes"), x => x.cast("string")), ",")
            .as("codes_csv"))
        .orderBy("vec_id")
    }),
    // ADC search over the PQ codes: reconstruction vs uncompressed query
    "ann_pq_adc" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cents = fixed16Centroids(e)
      Similarity.pqTopK(e, cents, e.filter(col("vec_id") === 0), k = 10, m = 8)
    }),
    // the STORED serving path: write the IVF+PQ index partitioned by
    // cell, then answer the query from a partition-pruned scan of it
    // (results must equal the in-memory ann_ivfpq composition)
    "ann_index_scan" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.searchIndex(s, storedIndex(s, d), trainedCents(s, d),
        e.filter(col("vec_id") === 0), k = 10, nprobe = 4)
    }),
    // FILTERED search over the stored index: top-k among label = 2 —
    // the predicate pushes into the parquet scan (pre-filter, so the
    // k results are the best MATCHING vectors)
    "ann_filtered" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.searchIndex(s, storedIndex(s, d), trainedCents(s, d),
        e.filter(col("vec_id") === 0), k = 10, nprobe = 4,
        pred = col("label") === 2)
    }),
    // batched retrieval: 3 queries served in ONE index pass (offline
    // k-NN / hard-negative-mining shape), per-query rank <= k
    "ann_batch" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cents = trainedCents(s, d)
      val qs = e.filter(col("vec_id").isin(0L, 17L, 42L))
        .select(col("vec_id").as("qid"), col("embedding"))
      Similarity.searchBatch(e, cents, qs, k = 5, nprobe = 4)
        .orderBy("qid", "rnk")
    }),
    // index MAINTENANCE: build from the base slice, append the wave
    // (touched cell partitions only), serve from the combined index —
    // must equal the one-shot index over the full corpus (same twin)
    "ann_index_append" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cents = trainedCents(s, d)
      val base = e.filter(col("vec_id") % 100 =!= 0)
      val wave = e.filter(col("vec_id") % 100 === 0)
      val root = graft.core.Scratch.fastTempDirectory("graft_annappend",
        graft.core.Scratch.tableBytes(d, "embeddings") * 2)
      try {
        Similarity.writeIndex(base, cents, root.toString)
        Similarity.appendIndex(wave, cents, root.toString)
        val out = Similarity.searchIndex(s, root.toString, cents,
          e.filter(col("vec_id") === 0), k = 10, nprobe = 4)
        // bounded (k rows): pin into memory so the scratch tree can be
        // deleted before the caller consumes the frame
        val rows = out.collect().toIndexedSeq
        s.createDataFrame(
          new java.util.ArrayList(scala.jdk.CollectionConverters
            .SeqHasAsJava(rows).asJava), out.schema)
          .orderBy(desc("sim"), asc("vec_id"))
      } finally graft.core.Scratch.deleteRecursively(root)
    }),
    // the production composition: IVF cells prune to nprobe=4, ADC ranks
    // only the survivors by PQ reconstruction (FAISS IVFx,PQy layout)
    "ann_ivfpq" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cents = trainedCents(s, d)
      Similarity.ivfPqTopK(e, cents, e.filter(col("vec_id") === 0),
        k = 10, nprobe = 4, m = 8)
    }),
    // corpus-level non-overlapping 10-token segment dedup (Lee et al.)
    "dd_chunks" -> ((s, d) =>
      Dedup.chunkDedup(Tables.documents(s, d)).orderBy("fp")),
    // Lee et al.'s exact-substring criterion proper: maximal spans of
    // cross-document duplicated text (k-gram position inverted index +
    // gaps-and-islands merge — the distributed form of the suffix-array
    // pass)
    "dd_substring_spans" -> ((s, d) =>
      Dedup.duplicateSpans(Tables.documents(s, d), k = 5)
        .orderBy("doc_id", "start_pos")),
    // the removal half: every token covered by a duplicated span is
    // scrubbed from every copy (conservative boilerplate removal);
    // per-row HOF filter, no token-grain shuffle
    "dd_span_scrub" -> ((s, d) =>
      Dedup.scrubSpans(Tables.documents(s, d), k = 5)),
    // C4-style heuristic filters. The raw corpus is uniform word-soup
    // (every branch would evaluate identically — a fixture-masked
    // conditional the oracle could never catch), so variants are
    // injected IN-QUERY by doc_id, identically on both engines: each
    // filter rule sees both outcomes on real rows.
    "ts_c4_filters" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val m = col("doc_id") % 5
      val v = docs.select(col("doc_id"),
        when(m === 0, concat(col("text"), lit(" lorem ipsum dolor")))
          .when(m === 1, concat(col("text"), lit(" function() { javascript")))
          .when(m === 2, lit("Too short."))
          .when(m === 3, concat(col("text"), lit(" It ends properly.")))
          .otherwise(col("text")).as("text"))
      TextAnalysis.c4Filters(v).orderBy("doc_id")
    }),
    // PII scrub audit: synthetic emails/phones/IPs injected in-query by
    // doc_id (same fixture-masking rationale as ts_c4_filters)
    "ts_redact" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val m = col("doc_id") % 4
      val v = docs.select(col("doc_id"),
        when(m === 0, concat(col("text"), lit(" contact john.doe@example.com now")))
          .when(m === 1, concat(col("text"), lit(" call 555-123-4567 or 555-000-1111")))
          .when(m === 2, concat(col("text"), lit(" from 10.0.0.1 mail a@b.io")))
          .otherwise(col("text")).as("text"))
      TextAnalysis.redactPii(v).orderBy("doc_id")
    }),
    // transitive closure of the LSH pair graph → canonical keeper per
    // near-dup cluster (pairwise similarity is not transitive; dedup
    // needs components, not pairs). Oracle = recursive-CTE closure.
    "dd_cluster" -> ((s, d) =>
      Dedup.clustersOf(ccLabels(s, d)).orderBy("doc_id")),
    // winnowing (MOSS) rolling k-gram fingerprints: any shared substring
    // of >= k+w-1 chars guarantees a shared fp — the position-robust
    // complement of the whole-document hashes in ts_tokens_fp
    "ts_winnow" -> ((s, d) =>
      TextAnalysis.winnow(Tables.documents(s, d), k = 8, w = 4)
        .orderBy("doc_id", "fp")),
    // pair generation over the winnow fingerprints: catches lifted-
    // paragraph containment that whole-document similarity dilutes
    "dd_winnow_pairs" -> ((s, d) =>
      Dedup.winnowPairs(Tables.documents(s, d), k = 8, w = 4)
        .orderBy("doc_a", "doc_b")),
    // cluster-level MinHash signatures: elementwise min across each
    // near-dup cluster's doc signatures = the signature of the union
    // of their shingle sets (min is associative) — cluster-vs-cluster
    // comparison without re-shingling; singletons keep their own sig
    "dd_cluster_sigs" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val lab = docs.select(col("doc_id"))
        .join(ccLabels(s, d).select(col("v").as("doc_id"), col("label")),
          Seq("doc_id"), "left")
        .select(col("doc_id").as("v"),
          coalesce(col("label"), col("doc_id")).as("label"))
      Dedup.clusterSignatures(Dedup.minhashSignatures(docs), lab)
    }),
    // incremental CLUSTER maintenance: yesterday's corpus (doc_id % 5
    // != 0 endpoints) holds a stored min-doc component labeling; the
    // wave's pairs (any % 5 == 0 endpoint) merge in on the LABEL graph
    // — index-sized CC, no historical-edge recompute. Exact: output
    // equals the full closure over ALL pairs (the oracle)
    "dd_incremental_cluster" -> ((s, d) => {
      val wave = lshPairs(s, d).filter(
        col("doc_a") % 5 === 0 || col("doc_b") % 5 === 0)
      Dedup.clustersOf(Dedup.incrementalClusters(
          storedClusterLabels(s, d), wave,
          Tables.documents(s, d).select(col("doc_id"))))
        .orderBy("doc_id")
    }),
    // incremental near-dup: 80% of the corpus is the stored band index,
    // the doc_id % 5 == 0 slice arrives as the new ingest wave. The raw
    // wave has no internal near-dups at sf0.01 (batch_dup would be a
    // fixture-masked branch), so a verbatim copy of wave doc 0 — novel
    // vs the corpus — is injected in-query, identically on both engines:
    // the copy MUST classify batch_dup with keeper 0
    "dd_incremental_lsh" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val idx = Dedup.minhashBands(docs.filter(col("doc_id") % 5 =!= 0))
      val wave = docs.filter(col("doc_id") % 5 === 0).unionByName(
        docs.filter(col("doc_id") === 0)
          .withColumn("doc_id", col("doc_id") + 1000000))
      Dedup.incrementalMinhash(idx, wave).orderBy("doc_id")
    }),
    // quality-aware canonical selection over the same LSH pair graph:
    // the keeper is the cluster's LONGEST doc (tie → min id), not its
    // min id — what a production dedup actually keeps
    "dd_canonical" -> ((s, d) =>
      Dedup.canonicalOf(Tables.documents(s, d), ccLabels(s, d))
        .orderBy("doc_id")),
    // SoftDeDup: keep every doc, weight each near-dup cluster to unit
    // total mass (1/|cluster|) — the reweighting alternative to
    // dropping; shares the memoized closure with cluster/canonical
    "dd_reweight" -> ((s, d) =>
      Dedup.softWeights(Tables.documents(s, d), ccLabels(s, d))
        .orderBy("doc_id")),
    // data-mixture sampling: per-source token budgets → deterministic
    // rate-based keep verdicts. Budgets exercise every branch: rate<1
    // (src0), rate capped at 1 (src1), rate 0 (src2), default budget
    // (all other sources)
    "ts_mix" -> ((s, d) =>
      TextAnalysis.mixtureSample(Tables.documents(s, d),
        budgets = Map("src0" -> 700L, "src1" -> 1000000L, "src2" -> 0L),
        defaultBudget = 650L)
        .orderBy("doc_id")),
    // FineWeb-style per-source quality pruning: keep the top half of
    // each source by alpha ratio (integer rank boundary, no float tie)
    "ts_quality_prune" -> ((s, d) =>
      Curation.qualityPrune(Tables.documents(s, d), keepFrac = 0.5)
        .orderBy("doc_id")),
    // deterministic fractional-epoch upsampling: floor(f) copies per
    // doc + one more under the salted md5 draw with prob frac(f)
    "ts_epochs" -> ((s, d) =>
      TextAnalysis.epochRepeat(Tables.documents(s, d),
        Map("src0" -> 2.5, "src1" -> 0.25, "src2" -> 1.75),
        defaultFactor = 1.0)
        .orderBy("doc_id", "copy")),
    // temperature-weighted mixture (alpha=0.5 flattens the source
    // distribution; budget splits by tempered share, tail sources
    // upweighted vs a proportional sample)
    "ts_temperature_mix" -> ((s, d) =>
      TextAnalysis.temperatureMix(Tables.documents(s, d),
        budgetTokens = 5000L, alpha = 0.5)
        .orderBy("doc_id")),
    // decontamination vs a held-out "benchmark" slice of the corpus
    "dd_contamination" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.contamination(docs, docs.filter(col("doc_id") % 97 === 0),
        minOverlap = 3)
        .orderBy("doc_id", "bench_id")
    }))

  def oracles: Map[String, String] = {
    val raw = rawOracles
    raw ++ Map(
      // checksum twins reuse the raw pair oracles' own derivations
      // verbatim (one source of truth for the pair semantics), wrapped
      // in the bucket aggregation — see pairCksumSql
      "dd_simhash_cksum" ->
        pairCksumSql(raw("dd_simhash_pairs"), "doc_a", "doc_b", "hamming"),
      "dd_winnow_cksum" ->
        pairCksumSql(raw("dd_winnow_pairs"), "doc_a", "doc_b", "n_common"),
      "mm_phash_cksum" ->
        pairCksumSql(raw("mm_phash_pairs"), "asset_a", "asset_b", "hamming"))
  }

  /** The DuckDB side of [[pairChecksum]]: the raw pair oracle minus its
    * trailing ORDER BY, streamed into the identical 64-bucket checksum
    * aggregation (HUGEINT sums pinned back to BIGINT). The strip is
    * guarded: it must be the OUTER order clause, not one inside a
    * window or subquery.
    */
  private def pairCksumSql(base: String, a: String, b: String,
                           payload: String): String = {
    val cut = base.lastIndexOf("ORDER BY")
    require(cut > 0 && !base.substring(cut).contains(")"),
      "pairCksumSql: expected a trailing ORDER BY to strip")
    s"""SELECT CAST($a % 64 AS BIGINT) AS bucket,
       |       count(*) AS n_pairs,
       |       min($a) AS min_a, max($a) AS max_a,
       |       min($b) AS min_b, max($b) AS max_b,
       |       CAST(sum($a) AS BIGINT) AS sum_a,
       |       CAST(sum($b) AS BIGINT) AS sum_b,
       |       CAST(sum((($a % 1000000007) * ($b % 1000000007) + $payload)
       |                % 1000000007) AS BIGINT) AS mix_mod
       |FROM (
       |${base.substring(0, cut)}) pairs
       |GROUP BY 1 ORDER BY bucket""".stripMargin
  }

  private def rawOracles: Map[String, String] = Map(
    // data-card twin: the dd_exact fp (corpus-global) feeds dup
    // exposure; the mode-lang rank mirrors the engine's (n DESC, lang
    // ASC) tie-break; HUGEINT sums pinned back to BIGINT
    "ts_corpus_profile" -> {
      val r2 = (n: String, d: String) => Money.Sql.ratio2(n, d)
      s"""WITH base AS (
         |  SELECT source, lang, len(string_split(text, ' ')) AS n_tok,
         |         md5($normSql) AS fp
         |  FROM documents),
         |fpc AS (SELECT fp, count(*) AS n_fp FROM base GROUP BY 1),
         |agg AS (
         |  SELECT source, count(*) AS n_docs,
         |         CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         |         count(DISTINCT lang) AS n_langs,
         |         CAST(SUM(CASE WHEN n_fp > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS dup_docs
         |  FROM base JOIN fpc USING (fp) GROUP BY 1),
         |top AS (
         |  SELECT source, lang AS top_lang, n AS top_n FROM (
         |    SELECT source, lang, count(*) AS n,
         |           ROW_NUMBER() OVER (PARTITION BY source
         |             ORDER BY count(*) DESC, lang ASC) AS rn
         |    FROM documents GROUP BY source, lang) r
         |  WHERE rn = 1)
         |SELECT a.source, a.n_docs, a.n_tokens,
         |       ${r2("a.n_tokens", "a.n_docs")} AS avg_tokens,
         |       a.n_langs, t.top_lang,
         |       ${r2("t.top_n", "a.n_docs")} AS top_lang_share,
         |       a.dup_docs,
         |       ${r2("a.dup_docs", "a.n_docs")} AS dup_share
         |FROM agg a JOIN top t USING (source)
         |ORDER BY source""".stripMargin
    },
    // calibration twin: same fingerprint groups, same tie-broken ntile
    "ts_quality_calibration" ->
      s"""WITH fp AS (
         |  SELECT doc_id, md5($normSql) AS fp FROM documents),
         |g AS (SELECT fp, count(*) AS n_fp FROM fp GROUP BY 1),
         |fl AS (
         |  SELECT f.doc_id,
         |         CAST(CASE WHEN g.n_fp >= 2 THEN 1 ELSE 0 END AS BIGINT)
         |           AS is_dup
         |  FROM fp f JOIN g USING (fp)),
         |sc AS (
         |  SELECT d.doc_id,
         |         CAST(length(regexp_replace(d.text, '[^a-zA-Z]', '', 'g'))
         |           AS DOUBLE) / length(d.text) AS alpha_ratio,
         |         fl.is_dup
         |  FROM documents d JOIN fl USING (doc_id)),
         |r AS (
         |  SELECT *, CAST(ntile(10) OVER (ORDER BY alpha_ratio ASC,
         |    doc_id ASC) AS INT) AS decile
         |  FROM sc),
         |bd AS (
         |  SELECT decile, count(*) AS n_docs,
         |         CAST(SUM(is_dup) AS BIGINT) AS n_dups
         |  FROM r GROUP BY 1),
         |ov AS (
         |  SELECT CAST(ROUND(CAST(CAST(SUM(n_dups) AS DOUBLE)
         |    / CAST(SUM(n_docs) AS DOUBLE) AS DECIMAL(20,12)), 9)
         |    AS DOUBLE) AS overall_rate
         |  FROM bd)
         |SELECT decile, n_docs, n_dups,
         |       CAST(ROUND(CAST(CAST(n_dups AS DOUBLE)
         |         / CAST(n_docs AS DOUBLE) AS DECIMAL(20,12)), 9)
         |         AS DOUBLE) AS dup_rate,
         |       overall_rate
         |FROM bd CROSS JOIN ov ORDER BY decile""".stripMargin,
    "ts_quality" ->
      """SELECT doc_id,
        |       CAST(length(text) AS INT) AS n_chars,
        |       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |       CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\s]')) AS INT) AS n_lex_tokens,
        |       CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
        |       CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / length(text) AS alpha_ratio,
        |       CAST(len(list_filter(string_split(text, ' '),
        |            t -> list_contains(['the','a','an','of','and','to','in','is','it','that'], t))) AS DOUBLE)
        |         / len(string_split(text, ' ')) AS stopword_ratio,
        |       CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')) AS avg_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "ts_langid" -> {
      val scoreSql = TextAnalysis.markers.toSeq.sortBy(_._1).map {
        case (lang, ws) =>
          val arr = ws.map(w => s"'$w'").mkString("[", ",", "]")
          s"CAST(len(list_filter(string_split(text, ' '), t -> list_contains($arr, t))) AS INT) AS score_$lang"
      }.mkString(",\n       ")
      val langs = TextAnalysis.markers.keys.toSeq.sorted
      val best = s"greatest(${langs.map(l => s"score_$l").mkString(", ")})"
      val pick = langs.map(l =>
        s"WHEN score_$l = $best AND $best > 0 THEN '$l'").mkString(" ")
      s"""WITH scored AS (
         |  SELECT doc_id,
         |       $scoreSql
         |  FROM documents)
         |SELECT doc_id, ${langs.map(l => s"score_$l").mkString(", ")},
         |       CASE $pick ELSE 'und' END AS predicted_lang
         |FROM scored ORDER BY doc_id""".stripMargin
    },
    // confusion twin: the SAME generated scorer text, cells + windowed
    // per-language marginals + 1-row overall accuracy
    "ts_langid_confusion" -> {
      val scoreSql = TextAnalysis.markers.toSeq.sortBy(_._1).map {
        case (lang, ws) =>
          val arr = ws.map(w => s"'$w'").mkString("[", ",", "]")
          s"CAST(len(list_filter(string_split(text, ' '), t -> list_contains($arr, t))) AS INT) AS score_$lang"
      }.mkString(",\n       ")
      val langs = TextAnalysis.markers.keys.toSeq.sorted
      val best = s"greatest(${langs.map(l => s"score_$l").mkString(", ")})"
      val pick = langs.map(l =>
        s"WHEN score_$l = $best AND $best > 0 THEN '$l'").mkString(" ")
      s"""WITH scored AS (
         |  SELECT doc_id,
         |       $scoreSql
         |  FROM documents),
         |pred AS (SELECT doc_id, CASE $pick ELSE 'und' END AS predicted_lang
         |         FROM scored),
         |cells AS (SELECT d.lang, p.predicted_lang, count(*) AS n
         |          FROM documents d JOIN pred p USING (doc_id)
         |          GROUP BY 1, 2),
         |per AS (SELECT lang, predicted_lang, n,
         |          CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS n_lang,
         |          CAST(SUM(CASE WHEN lang = predicted_lang THEN n ELSE 0 END)
         |            OVER (PARTITION BY lang) AS BIGINT) AS n_corr
         |        FROM cells),
         |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
         |          CAST(SUM(CASE WHEN lang = predicted_lang THEN n ELSE 0 END)
         |            AS BIGINT) AS ncorr
         |        FROM cells)
         |SELECT lang, predicted_lang, n,
         |       CAST(ROUND(CAST(CAST(n_corr AS DOUBLE)
         |         / CAST(n_lang AS DOUBLE) AS DECIMAL(20,12)), 9) AS DOUBLE)
         |         AS recall,
         |       CAST(ROUND(CAST(CAST(ncorr AS DOUBLE)
         |         / CAST(nn AS DOUBLE) AS DECIMAL(20,12)), 9) AS DOUBLE)
         |         AS accuracy
         |FROM per CROSS JOIN tot ORDER BY lang, predicted_lang""".stripMargin
    },
    "ts_tokens_fp" ->
      s"""SELECT doc_id,
         |       CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
         |       CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]')) AS INT) AS lex_tokens,
         |       md5($normSql) AS md5_fp
         |FROM documents ORDER BY doc_id""".stripMargin,
    "ts_topk_sketch" ->
      s"""SELECT token, count(*) AS est_count
         |FROM (SELECT unnest(string_split($normSql, ' ')) AS token FROM documents) t
         |GROUP BY token ORDER BY token""".stripMargin,
    "ts_topk_by_source" ->
      s"""WITH tok AS (
         |  SELECT source, unnest(string_split($normSql, ' ')) AS token
         |  FROM documents),
         |c AS (SELECT source, token, count(*) AS est_count
         |      FROM tok GROUP BY 1, 2),
         |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY source
         |        ORDER BY est_count DESC, token ASC) AS INT) AS rnk
         |      FROM c)
         |SELECT source, token, est_count, rnk FROM r WHERE rnk <= 5
         |ORDER BY source, rnk""".stripMargin,
    "ts_tfidf" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS token
         |  FROM documents),
         |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
         |idf AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
         |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
         |SELECT doc_id, token, tf, df,
         |       CAST(ROUND(CAST(tf * ln(CAST(n_docs AS DOUBLE) / df) AS DECIMAL(20,12)), 9) AS DOUBLE) AS tf_idf
         |FROM tf JOIN idf USING (token) CROSS JOIN n
         |ORDER BY doc_id, token""".stripMargin,
    // incremental-LSH twin: index and wave populations each build their
    // own prefixed signature chain (population-local df caps), then the
    // same best-match / first-occurrence selection the engine windows
    "dd_incremental_lsh" -> {
      val simSum = (0 until 8)
        .map(i => s"CASE WHEN a.mh_$i = b.mh_$i THEN 1 ELSE 0 END")
        .mkString(" + ")
      "WITH " +
        minhashSigCtesFor("(SELECT * FROM documents WHERE doc_id % 5 <> 0)", "o") +
        ",\n" +
        minhashSigCtesFor(
          "(SELECT * FROM documents WHERE doc_id % 5 = 0 UNION ALL " +
            "SELECT * REPLACE (doc_id + 1000000 AS doc_id) " +
            "FROM documents WHERE doc_id = 0)", "n") +
        s"""
           |, xpair AS (
           |  SELECT DISTINCT nb.doc_id AS doc_id, ob.doc_id AS corpus_doc
           |  FROM bands_n nb JOIN bands_o ob USING (band, bucket)),
           |xest AS (
           |  SELECT xpair.doc_id AS doc_id, corpus_doc,
           |         CAST($simSum AS DOUBLE) / 8 AS est
           |  FROM xpair JOIN sigs_n a ON xpair.doc_id = a.doc_id
           |             JOIN sigs_o b ON corpus_doc = b.doc_id),
           |xbest AS (
           |  SELECT doc_id, corpus_doc, est FROM (
           |    SELECT doc_id, corpus_doc, est,
           |           ROW_NUMBER() OVER (PARTITION BY doc_id
           |             ORDER BY est DESC, corpus_doc ASC) AS rn
           |    FROM xest WHERE est >= 0.5) r WHERE rn = 1),
           |wpair AS (
           |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM bands_n a JOIN bands_n b USING (band, bucket)
           |  WHERE a.doc_id < b.doc_id),
           |west AS (
           |  SELECT doc_a, doc_b, CAST($simSum AS DOUBLE) / 8 AS est
           |  FROM wpair JOIN sigs_n a ON doc_a = a.doc_id
           |             JOIN sigs_n b ON doc_b = b.doc_id),
           |wbest AS (
           |  SELECT doc_b AS doc_id, doc_a AS batch_keeper, est FROM (
           |    SELECT doc_a, doc_b, est,
           |           ROW_NUMBER() OVER (PARTITION BY doc_b
           |             ORDER BY doc_a ASC) AS rn
           |    FROM west WHERE est >= 0.5) r WHERE rn = 1)
           |SELECT w.doc_id,
           |       CASE WHEN x.corpus_doc IS NOT NULL THEN 'corpus_dup'
           |            WHEN wb.batch_keeper IS NOT NULL THEN 'batch_dup'
           |            ELSE 'novel' END AS status,
           |       COALESCE(x.corpus_doc, wb.batch_keeper, w.doc_id) AS keeper_doc_id,
           |       COALESCE(x.est, wb.est) AS est_jaccard
           |FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0
           |      UNION ALL SELECT doc_id + 1000000 FROM documents
           |      WHERE doc_id = 0) w
           |LEFT JOIN xbest x USING (doc_id)
           |LEFT JOIN wbest wb ON w.doc_id = wb.doc_id
           |ORDER BY w.doc_id""".stripMargin
    },
    // entropy twin: identical term expression, 9dp round, decimal sum
    "ts_entropy" ->
      s"""WITH nt AS (SELECT doc_id, $normSql AS t FROM documents),
         |ch AS (
         |  SELECT doc_id,
         |         unnest(list_transform(range(1, length(t) + 1),
         |                i -> substr(t, i, 1))) AS ch
         |  FROM nt WHERE length(t) >= 1),
         |c AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2),
         |n AS (SELECT doc_id, sum(c) AS n FROM c GROUP BY 1),
         |terms AS (
         |  SELECT c.doc_id, n,
         |         CAST(ROUND(CAST((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)
         |           AS DECIMAL(20,12)), 9) AS DECIMAL(20,9)) AS term
         |  FROM c JOIN n USING (doc_id))
         |SELECT doc_id, CAST(max(n) AS INT) AS n_chars,
         |       CAST(-sum(term) AS DOUBLE) AS entropy
         |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "ts_stratified" ->
      """SELECT doc_id, source, sample_rank FROM (
        |  SELECT doc_id, source,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY source
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT)
        |           AS sample_rank
        |  FROM documents) r
        |WHERE sample_rank <= 10
        |ORDER BY source, sample_rank""".stripMargin,
    // BM25 twin: identical expression tree (same literal constants and
    // associativity), idf and each partial rounded 9dp through decimal,
    // partials SUMMED AS DECIMAL so aggregation order cannot matter
    "ts_bm25" ->
      s"""WITH $bm25Ctes
         |SELECT doc_id, count(*) AS n_hit, CAST(sum(part) AS DOUBLE) AS score
         |FROM p GROUP BY doc_id ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin,
    // phrase twin: positional postings (parallel unnests zip token and
    // 1-based position), per-term anchor = pos − i, equi-join on anchor
    // — base offset cancels, so 0- vs 1-based positions are invisible
    "search_phrase" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS token,
         |         unnest(range(1, len(string_split($normSql, ' ')) + 1))
         |           AS pos
         |  FROM documents),
         |p1 AS (SELECT doc_id, pos AS anchor FROM tok
         |       WHERE token = 'table'),
         |p2 AS (SELECT doc_id, pos - 1 AS anchor FROM tok
         |       WHERE token = 'value')
         |SELECT doc_id, count(*) AS n_occurrences
         |FROM p1 JOIN p2 USING (doc_id, anchor)
         |GROUP BY 1 ORDER BY doc_id""".stripMargin,
    // RRF fusion twin: both candidate rankings reuse the proven BM25 /
    // cosine CTEs at kCand=50; ranks are integers so the fused score is
    // two deterministic double terms, rounded 9dp through decimal
    "search_rrf" ->
      s"""WITH $bm25Ctes,
         |b AS (SELECT doc_id, CAST(sum(part) AS DOUBLE) AS score
         |      FROM p GROUP BY doc_id ORDER BY score DESC, doc_id ASC LIMIT 50),
         |lex AS (SELECT doc_id AS id,
         |               CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS lex_rank
         |        FROM b),
         |vq AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |vb AS (SELECT vec_id, ${cosSql("embedding", "qv")} AS sim
         |       FROM embeddings CROSS JOIN vq
         |       ORDER BY sim DESC, vec_id ASC LIMIT 50),
         |vec AS (SELECT vec_id AS id,
         |               CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id ASC) AS INT) AS vec_rank
         |        FROM vb)
         |SELECT COALESCE(l.id, v.id) AS doc_id, l.lex_rank, v.vec_rank,
         |       CAST(ROUND(CAST(COALESCE(CAST(1.0 AS DOUBLE) / (60 + l.lex_rank), 0.0)
         |                     + COALESCE(CAST(1.0 AS DOUBLE) / (60 + v.vec_rank), 0.0)
         |            AS DECIMAL(20,12)), 9) AS DOUBLE) AS rrf_score
         |FROM lex l FULL OUTER JOIN vec v ON l.id = v.id
         |ORDER BY rrf_score DESC, doc_id ASC LIMIT 10""".stripMargin,
    "ts_split" ->
      """WITH s AS (
        |  SELECT doc_id,
        |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::INT AS INT) AS b
        |  FROM documents)
        |SELECT CASE WHEN b < 204 THEN 'train'
        |            WHEN b < 230 THEN 'validation'
        |            ELSE 'test' END AS split,
        |       count(*) AS n, min(doc_id) AS min_doc
        |FROM s GROUP BY 1 ORDER BY split""".stripMargin,
    // BPE-pass twin: the vocab-sized word-frequency table, 2-char
    // windows via substr, HUGEINT sum pinned to BIGINT
    "ts_bpe_pairs" ->
      s"""WITH wc AS (
         |  SELECT w, count(*) AS n
         |  FROM (SELECT unnest(string_split($normSql, ' ')) AS w
         |        FROM documents) t
         |  WHERE length(w) >= 2 GROUP BY 1),
         |pairs AS (
         |  SELECT substr(w, CAST(u AS INT), 2) AS pair, n
         |  FROM (SELECT w, n, unnest(range(1, length(w))) AS u FROM wc) x)
         |SELECT pair, CAST(SUM(n) AS BIGINT) AS n_occurrences
         |FROM pairs GROUP BY 1
         |ORDER BY n_occurrences DESC, pair LIMIT 50""".stripMargin,
    // BPE-train twin: five unrolled count→argmax→merge rounds over the
    // same double-space canonical symbol strings (literal replace, then
    // re-canonicalize); every round CTE MATERIALIZED per the iterative-
    // oracle cost discipline; zip-longest null pads filtered
    "ts_bpe_train" -> {
      val rounds = 5
      val base =
        s"""wc AS MATERIALIZED (
           |  SELECT w, count(*) AS freq
           |  FROM (SELECT unnest(string_split($normSql, ' ')) AS w
           |        FROM documents) t
           |  WHERE length(w) >= 2 GROUP BY 1),
           |r0 AS MATERIALIZED (
           |  SELECT freq, ' ' || array_to_string(regexp_extract_all(w, '.'),
           |    '  ') || ' ' AS seq
           |  FROM wc)""".stripMargin
      val roundCtes = (1 to rounds).map { i =>
        s"""p$i AS MATERIALIZED (
           |  SELECT l, r, CAST(SUM(freq) AS BIGINT) AS cnt
           |  FROM (SELECT freq, z[1] AS l, z[2] AS r
           |        FROM (SELECT freq, unnest(list_zip(s, s[2:])) AS z
           |              FROM (SELECT freq,
           |                      string_split_regex(trim(seq), ' +') AS s
           |                    FROM r${i - 1}) t0
           |              WHERE len(s) >= 2) t1) t2
           |  WHERE r IS NOT NULL GROUP BY 1, 2),
           |m$i AS MATERIALIZED (
           |  SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1),
           |r$i AS MATERIALIZED (
           |  SELECT freq, ' ' || array_to_string(string_split_regex(trim(
           |    replace(seq, ' ' || m.l || '  ' || m.r || ' ',
           |            ' ' || m.l || m.r || ' ')), ' +'), '  ') || ' '
           |    AS seq
           |  FROM r${i - 1} CROSS JOIN m$i m)""".stripMargin
      }.mkString(",\n")
      val sel = (1 to rounds).map(i =>
        s"SELECT $i AS round, l AS lhs, r AS rhs, cnt AS pair_count FROM m$i")
        .mkString("\nUNION ALL\n")
      s"WITH $base,\n$roundCtes\n$sel\nORDER BY round"
    },
    // subword-apply twin: identical vocab learning (occurrence-weighted
    // trigrams, ties lexicographic), then the greedy trigram-or-char
    // scan replayed as a recursive CTE over distinct words — one state
    // row per consumed token, terminal state at pos > len(word)
    "ts_subword_encode" ->
      s"""WITH RECURSIVE
         |w AS (SELECT doc_id, unnest(string_split($normSql, ' ')) AS word
         |      FROM documents),
         |dwc AS (SELECT doc_id, word, count(*) AS n_occ FROM w GROUP BY 1, 2),
         |wc AS (SELECT word, SUM(n_occ) AS cnt FROM dwc GROUP BY 1),
         |grams AS (
         |  SELECT substr(word, CAST(i AS INT), 3) AS gram, cnt
         |  FROM (SELECT word, cnt, unnest(range(1, length(word) - 1)) AS i
         |        FROM wc WHERE length(word) >= 3) t),
         |vocab AS (
         |  SELECT gram FROM (
         |    SELECT gram, SUM(cnt) AS c FROM grams GROUP BY 1
         |    ORDER BY c DESC, gram ASC LIMIT 64)),
         |st AS (
         |  SELECT word, 1 AS pos, 0 AS ntok FROM wc
         |  UNION ALL
         |  SELECT word,
         |         CASE WHEN pos + 2 <= length(word)
         |                   AND substr(word, pos, 3) IN (SELECT gram FROM vocab)
         |              THEN pos + 3 ELSE pos + 1 END,
         |         ntok + 1
         |  FROM st WHERE pos <= length(word)),
         |enc AS (SELECT word, ntok FROM st WHERE pos > length(word))
         |SELECT doc_id,
         |       CAST(SUM(n_occ) AS BIGINT) AS n_words,
         |       CAST(SUM(n_occ * ntok) AS BIGINT) AS n_tokens,
         |       CAST(ROUND(CAST(CAST(SUM(n_occ * ntok) AS DOUBLE)
         |           / CAST(SUM(n_occ) AS DOUBLE) AS DECIMAL(20,12)), 9)
         |         AS DOUBLE) AS tokens_per_word
         |FROM dwc JOIN enc USING (word)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // chunk twin: same ceil-based last-start, same inclusive spans,
    // same slice fingerprint
    "ts_rag_chunks" ->
      s"""WITH toks AS (SELECT doc_id, string_split($normSql, ' ') AS t
         |              FROM documents),
         |st AS (
         |  SELECT doc_id, t, len(t) AS L,
         |         GREATEST(CAST(ceil((len(t) - 16) / 12.0) AS INT) * 12 + 1,
         |                  1) AS last_start
         |  FROM toks),
         |ch AS (
         |  SELECT doc_id, t, L,
         |         CAST(generate_subscripts(ss, 1) AS INT) AS chunk_id,
         |         CAST(unnest(ss) AS INT) AS start_tok
         |  FROM (SELECT doc_id, t, L, range(1, last_start + 1, 12) AS ss
         |        FROM st) x)
         |SELECT doc_id, chunk_id, start_tok,
         |       CAST(LEAST(start_tok + 15, L) AS INT) AS end_tok,
         |       md5(array_to_string(
         |         list_slice(t, start_tok, LEAST(start_tok + 15, L)), ' '))
         |         AS chunk_fp
         |FROM ch ORDER BY doc_id, chunk_id""".stripMargin,
    // decontamination twin: same distinct-shingle frame, distinct
    // benchmark shingles, left-join hit count, ratio2 + threshold on
    // the ROUNDED ratio (both engines compare the same 2-dp value)
    "ts_decontaminate" ->
      s"""WITH sh AS MATERIALIZED (
         |  SELECT DISTINCT doc_id,
         |         unnest(list_transform(range(1, len(t) - 1),
         |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
         |  FROM (SELECT doc_id, string_split($normSql, ' ') AS t
         |        FROM documents) x),
         |bs AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
         |tr AS (SELECT doc_id, shingle FROM sh WHERE NOT doc_id % 97 = 0)
         |SELECT tr.doc_id, count(*) AS n_shingles,
         |       CAST(SUM(CASE WHEN bs.shingle IS NOT NULL THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_contaminated,
         |       ${Money.Sql.ratio2(
                   "SUM(CASE WHEN bs.shingle IS NOT NULL THEN 1 ELSE 0 END)",
                   "count(*)")} AS contamination,
         |       ${Money.Sql.ratio2(
                   "SUM(CASE WHEN bs.shingle IS NOT NULL THEN 1 ELSE 0 END)",
                   "count(*)")} >= 0.5 AS flagged
         |FROM tr LEFT JOIN bs USING (shingle)
         |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin,
    // 13-gram decontamination twin: same shape, shingle built by
    // slicing 13 tokens (1-based inclusive list slice) — docs shorter
    // than 13 tokens yield no shingles and drop out on both sides
    "ts_decontaminate13" ->
      s"""WITH sh AS MATERIALIZED (
         |  SELECT DISTINCT doc_id,
         |         unnest(list_transform(range(1, len(t) - 11),
         |           i -> array_to_string(t[i:i+12], ' '))) AS shingle
         |  FROM (SELECT doc_id, string_split($normSql, ' ') AS t
         |        FROM documents) x),
         |bs AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
         |tr AS (SELECT doc_id, shingle FROM sh WHERE NOT doc_id % 97 = 0)
         |SELECT tr.doc_id, count(*) AS n_shingles,
         |       CAST(SUM(CASE WHEN bs.shingle IS NOT NULL THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_contaminated,
         |       ${Money.Sql.ratio2(
                   "SUM(CASE WHEN bs.shingle IS NOT NULL THEN 1 ELSE 0 END)",
                   "count(*)")} AS contamination,
         |       ${Money.Sql.ratio2(
                   "SUM(CASE WHEN bs.shingle IS NOT NULL THEN 1 ELSE 0 END)",
                   "count(*)")} >= 0.25 AS flagged
         |FROM tr LEFT JOIN bs USING (shingle)
         |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin,
    // novelty twin: distinct shingles, min≠max single-doc test,
    // gram join-back, doc-grain agg
    "ts_novelty" ->
      s"""WITH sh AS (
         |  SELECT DISTINCT doc_id,
         |         unnest(list_transform(range(1, len(t) - 1),
         |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
         |  FROM (SELECT doc_id, string_split($normSql, ' ') AS t
         |        FROM documents) x),
         |g AS (SELECT shingle, min(doc_id) AS mn, max(doc_id) AS mx
         |      FROM sh GROUP BY 1)
         |SELECT doc_id, count(*) AS n_shingles,
         |       CAST(SUM(CASE WHEN mn = mx THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_novel,
         |       ${Money.Sql.ratio2(
                   "SUM(CASE WHEN mn = mx THEN 1 ELSE 0 END)",
                   "count(*)")} AS novelty
         |FROM sh JOIN g USING (shingle)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // shard twin: same salted hash, same floor(byte*n/256) range map,
    // same (h, doc_id) within-shard order
    "ts_shards" ->
      """WITH s AS (
        |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':shard') AS h
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, h,
        |         CAST(floor(CAST(('0x' || substr(h, 1, 2))::INT AS INT)
        |           * 8 / 256) AS INT) AS shard_id
        |  FROM s)
        |SELECT doc_id, shard_id,
        |       CAST(ROW_NUMBER() OVER (PARTITION BY shard_id
        |         ORDER BY h, doc_id) AS INT) AS shard_pos
        |FROM b ORDER BY shard_id, shard_pos""".stripMargin,
    "ts_vocab" ->
      s"""SELECT token, count(*) AS occurrences,
         |       count(DISTINCT doc_id) AS doc_frequency
         |FROM (SELECT doc_id, unnest(string_split($normSql, ' ')) AS token
         |      FROM documents) t
         |GROUP BY token
         |ORDER BY occurrences DESC, token ASC LIMIT 100""".stripMargin,
    "ts_repetition" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split($normSql, ' ') AS t FROM documents),
         |tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
         |tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
         |ts AS (
         |  SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct,
         |         max(c) AS top_tok
         |  FROM tc GROUP BY doc_id),
         |bg AS (
         |  SELECT doc_id,
         |         unnest(list_transform(range(1, len(t)),
         |                i -> t[i] || ' ' || t[i+1])) AS bg
         |  FROM toks),
         |bc AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2),
         |bs AS (
         |  SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_big
         |  FROM bc GROUP BY doc_id)
         |SELECT t.doc_id, CAST(t.n_tokens AS INT) AS n_tokens,
         |       1 - CAST(n_distinct AS DOUBLE) / n_tokens AS dup_token_frac,
         |       CAST(top_tok AS DOUBLE) / n_tokens AS top_token_frac,
         |       COALESCE(CAST(top_big AS DOUBLE) / n_bigrams, 0.0) AS top_bigram_frac
         |FROM ts t LEFT JOIN bs USING (doc_id) ORDER BY doc_id""".stripMargin,
    // length-batch twin: the bucket key is an integer (length of the
    // base-2 rendering), not floor(log2(…)) — ln-ratio floats can land
    // an exact power of two on the wrong side of floor
    "ts_length_batches" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |         CAST(len(string_split($normSql, ' ')) AS INT) AS n_tokens
         |  FROM documents),
         |b AS (
         |  SELECT doc_id, n_tokens,
         |         CAST(length(bin(n_tokens)) AS INT) AS bucket
         |  FROM t),
         |c AS (
         |  SELECT *,
         |         COALESCE(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_cum
         |  FROM b)
         |SELECT bucket, CAST(prev_cum // 2048 AS BIGINT) AS batch_id,
         |       CAST(count(*) AS INT) AS n_docs,
         |       CAST(max(n_tokens) AS INT) AS max_tokens,
         |       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |       CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT) AS pad_waste
         |FROM c GROUP BY 1, 2 ORDER BY bucket, batch_id""".stripMargin,
    "ts_unigram_lp" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS token
         |  FROM documents),
         |tc AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
         |n AS (SELECT count(*) AS total FROM tok),
         |lp AS (
         |  SELECT doc_id,
         |         CAST(ROUND(CAST(ln(CAST(c AS DOUBLE) / total) AS DECIMAL(20,12)), 9)
         |              AS DECIMAL(38,12)) AS logp
         |  FROM tok JOIN tc USING (token) CROSS JOIN n)
         |SELECT doc_id, CAST(count(*) AS INT) AS n_tokens,
         |       CAST(ROUND(CAST(CAST(SUM(logp) AS DOUBLE) / count(*)
         |            AS DECIMAL(38,10)), 6) AS DOUBLE) AS avg_logprob
         |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // bigram twin: tokens get positions via lockstep unnest +
    // generate_subscripts, transitions via lag; interpolation weights
    // computed in DOUBLE space with the exact literals the Spark side
    // folds (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE) ≠ a 0.3 literal
    // at the ulp level, and ulp differences can cross the 9-dp rounding
    // boundary); same decimal ln/SUM/mean ladder as ts_unigram_lp
    "ts_bigram_lp" ->
      s"""WITH tok AS (
         |  SELECT doc_id,
         |         generate_subscripts(string_split($normSql, ' '), 1) AS pos,
         |         unnest(string_split($normSql, ' ')) AS token
         |  FROM documents),
         |bg AS (
         |  SELECT doc_id,
         |         lag(token) OVER (PARTITION BY doc_id ORDER BY pos) AS w1,
         |         token AS w2
         |  FROM tok),
         |bgc AS (SELECT w1, w2, count(*) AS c2 FROM bg
         |        WHERE w1 IS NOT NULL GROUP BY 1, 2),
         |uc AS (SELECT token AS w, count(*) AS c1 FROM tok GROUP BY 1),
         |n AS (SELECT count(*) AS total FROM tok),
         |lp2 AS (
         |  SELECT b.doc_id,
         |         CAST(ROUND(CAST(ln(
         |             CAST(0.7 AS DOUBLE) * CAST(bc.c2 AS DOUBLE) / u1.c1
         |           + (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE))
         |             * CAST(u2.c1 AS DOUBLE) / n.total)
         |           AS DECIMAL(20,12)), 9) AS DECIMAL(38,12)) AS lp
         |  FROM bg b
         |  JOIN bgc bc ON b.w1 = bc.w1 AND b.w2 = bc.w2
         |  JOIN uc u1 ON b.w1 = u1.w
         |  JOIN uc u2 ON b.w2 = u2.w
         |  CROSS JOIN n
         |  WHERE b.w1 IS NOT NULL)
         |SELECT doc_id, CAST(count(*) AS INT) AS n_bigrams,
         |       CAST(ROUND(CAST(CAST(SUM(lp) AS DOUBLE) / count(*)
         |            AS DECIMAL(38,10)), 6) AS DOUBLE) AS avg_logprob
         |FROM lp2 GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the bigram-LM CTE chain verbatim, bucketed per language: NTILE(3)
    // over the tie-broken (score DESC, doc_id) order mirrors the
    // engine's window exactly
    "ts_ccnet_buckets" ->
      s"""WITH tok AS (
         |  SELECT doc_id,
         |         generate_subscripts(string_split($normSql, ' '), 1) AS pos,
         |         unnest(string_split($normSql, ' ')) AS token
         |  FROM documents),
         |bg AS (
         |  SELECT doc_id,
         |         lag(token) OVER (PARTITION BY doc_id ORDER BY pos) AS w1,
         |         token AS w2
         |  FROM tok),
         |bgc AS (SELECT w1, w2, count(*) AS c2 FROM bg
         |        WHERE w1 IS NOT NULL GROUP BY 1, 2),
         |uc AS (SELECT token AS w, count(*) AS c1 FROM tok GROUP BY 1),
         |n AS (SELECT count(*) AS total FROM tok),
         |lp2 AS (
         |  SELECT b.doc_id,
         |         CAST(ROUND(CAST(ln(
         |             CAST(0.7 AS DOUBLE) * CAST(bc.c2 AS DOUBLE) / u1.c1
         |           + (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE))
         |             * CAST(u2.c1 AS DOUBLE) / n.total)
         |           AS DECIMAL(20,12)), 9) AS DECIMAL(38,12)) AS lp
         |  FROM bg b
         |  JOIN bgc bc ON b.w1 = bc.w1 AND b.w2 = bc.w2
         |  JOIN uc u1 ON b.w1 = u1.w
         |  JOIN uc u2 ON b.w2 = u2.w
         |  CROSS JOIN n
         |  WHERE b.w1 IS NOT NULL),
         |scores AS (
         |  SELECT doc_id, CAST(count(*) AS INT) AS n_bigrams,
         |         CAST(ROUND(CAST(CAST(SUM(lp) AS DOUBLE) / count(*)
         |              AS DECIMAL(38,10)), 6) AS DOUBLE) AS avg_logprob
         |  FROM lp2 GROUP BY doc_id)
         |SELECT d.doc_id, d.lang, s.n_bigrams, s.avg_logprob,
         |       CASE NTILE(3) OVER (PARTITION BY d.lang
         |              ORDER BY s.avg_logprob DESC, d.doc_id ASC)
         |            WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
         |            ELSE 'tail' END AS bucket
         |FROM documents d JOIN scores s ON d.doc_id = s.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // cluster-balance twin: the ann_ivf assignment CTE (9-dp cosine,
    // centroid-id tie-break) joined to the ts_quality alpha_ratio,
    // per-cell rank capped in a subquery
    "ts_cluster_balance" ->
      s"""WITH ${trainedCentsChain("centroid_id")},
         |assigned AS (
         |  SELECT vec_id AS doc_id, centroid_id FROM (
         |    SELECT e.vec_id, c.centroid_id,
         |           ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${cosSql("e.embedding", "c.cvec")} DESC, c.centroid_id ASC) AS rn
         |    FROM embeddings e CROSS JOIN cents c) r
         |  WHERE rn = 1),
         |q AS (SELECT doc_id,
         |             CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
         |               / length(text) AS alpha_ratio
         |      FROM documents)
         |SELECT centroid_id, doc_id, alpha_ratio, cell_rank FROM (
         |  SELECT a.centroid_id, a.doc_id, q.alpha_ratio,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY a.centroid_id
         |           ORDER BY q.alpha_ratio DESC, a.doc_id ASC) AS INT) AS cell_rank
         |  FROM assigned a JOIN q USING (doc_id)) ranked
         |WHERE cell_rank <= 20
         |ORDER BY centroid_id, cell_rank""".stripMargin,
    "ts_pack" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::INT AS INT) AS shard,
         |         CAST(len(string_split($normSql, ' ')) AS INT) AS n_tokens
         |  FROM documents),
         |c AS (
         |  SELECT *,
         |         COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_cum
         |  FROM t)
         |SELECT doc_id, shard, n_tokens,
         |       CAST(prev_cum // 2048 AS BIGINT) AS bin_id,
         |       CAST(prev_cum % 2048 AS BIGINT) AS bin_offset
         |FROM c ORDER BY doc_id""".stripMargin,
    "ann_quantize" ->
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |         CAST(ROUND(CAST(list_max(list_transform(embedding,
        |                x -> abs(CAST(x AS DOUBLE)))) / 127.0
        |              AS DECIMAL(20,12)), 9) AS DOUBLE) AS scale
        |  FROM embeddings)
        |SELECT vec_id, scale,
        |       CASE WHEN scale = 0
        |            THEN array_to_string(list_transform(embedding, x -> 0), ',')
        |            ELSE array_to_string(list_transform(embedding,
        |              x -> CAST(ROUND(CAST(CAST(x AS DOUBLE) / scale
        |                     AS DECIMAL(20,10)), 0) AS INT)), ',')
        |       END AS q_csv
        |FROM s ORDER BY vec_id""".stripMargin,
    "dd_chunks" ->
      s"""WITH toks AS (SELECT doc_id, string_split($normSql, ' ') AS t FROM documents),
         |pos AS (SELECT doc_id, t, unnest(range(0, greatest(len(t) - 9, 0))) AS p FROM toks),
         |chunks AS (
         |  SELECT doc_id, md5(array_to_string(t[p+1:p+10], ' ')) AS fp
         |  FROM pos WHERE p % 10 = 0)
         |SELECT fp, count(*) AS n_occurrences,
         |       count(DISTINCT doc_id) AS n_docs,
         |       min(doc_id) AS keeper_doc_id
         |FROM chunks GROUP BY fp
         |HAVING count(DISTINCT doc_id) > 1
         |ORDER BY fp""".stripMargin,
    // substring-span twin: same 5-gram position index, cross-doc test
    // via min≠max, islands via the lag/running-sum window pair
    "dd_substring_spans" ->
      s"""WITH toks AS (SELECT doc_id, string_split($normSql, ' ') AS t FROM documents),
         |gl AS (
         |  SELECT doc_id, list_transform(range(1, len(t) - 3),
         |           i -> ('0x' || substr(md5(array_to_string(list_slice(t, i, i + 4), ' ')), 1, 15))::BIGINT) AS gs
         |  FROM toks),
         |grams AS (
         |  SELECT doc_id, CAST(generate_subscripts(gs, 1) AS INT) AS pos,
         |         unnest(gs) AS g
         |  FROM gl),
         |crossdoc AS (SELECT g FROM grams GROUP BY g
         |             HAVING min(doc_id) <> max(doc_id)),
         |marked AS (SELECT doc_id, pos FROM grams JOIN crossdoc USING (g)),
         |brks AS (
         |  SELECT doc_id, pos,
         |         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
         |                ORDER BY pos) = 1 THEN 0 ELSE 1 END AS brk
         |  FROM marked),
         |isl AS (
         |  SELECT doc_id, pos,
         |         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
         |           ROWS UNBOUNDED PRECEDING) AS island
         |  FROM brks)
         |SELECT doc_id, CAST(min(pos) AS INT) AS start_pos,
         |       CAST(max(pos) AS INT) AS end_pos,
         |       CAST(max(pos) - min(pos) + 5 AS INT) AS span_tokens
         |FROM isl GROUP BY doc_id, island
         |ORDER BY doc_id, start_pos""".stripMargin,
    // scrub twin: the SAME span CTEs, coverage window end_pos + k − 1,
    // token positions anti-probed against the doc's covered ranges,
    // kept tokens re-joined in position order; md5('') for fully
    // scrubbed docs mirrors Spark's empty array_join
    "dd_span_scrub" ->
      s"""WITH toks AS (SELECT doc_id, string_split($normSql, ' ') AS t FROM documents),
         |gl AS (
         |  SELECT doc_id, list_transform(range(1, len(t) - 3),
         |           i -> ('0x' || substr(md5(array_to_string(list_slice(t, i, i + 4), ' ')), 1, 15))::BIGINT) AS gs
         |  FROM toks),
         |grams AS (
         |  SELECT doc_id, CAST(generate_subscripts(gs, 1) AS INT) AS pos,
         |         unnest(gs) AS g
         |  FROM gl),
         |crossdoc AS (SELECT g FROM grams GROUP BY g
         |             HAVING min(doc_id) <> max(doc_id)),
         |marked AS (SELECT doc_id, pos FROM grams JOIN crossdoc USING (g)),
         |brks AS (
         |  SELECT doc_id, pos,
         |         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
         |                ORDER BY pos) = 1 THEN 0 ELSE 1 END AS brk
         |  FROM marked),
         |isl AS (
         |  SELECT doc_id, pos,
         |         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
         |           ROWS UNBOUNDED PRECEDING) AS island
         |  FROM brks),
         |cov AS (
         |  SELECT doc_id, min(pos) AS s, max(pos) + 4 AS e
         |  FROM isl GROUP BY doc_id, island),
         |tokpos AS (
         |  SELECT doc_id, CAST(generate_subscripts(t, 1) AS INT) AS p,
         |         unnest(t) AS tok
         |  FROM toks),
         |kept AS (
         |  SELECT tp.doc_id, tp.p, tp.tok
         |  FROM tokpos tp
         |  WHERE NOT EXISTS (SELECT 1 FROM cov c
         |                    WHERE c.doc_id = tp.doc_id
         |                      AND tp.p BETWEEN c.s AND c.e)),
         |agg AS (
         |  SELECT doc_id, CAST(count(*) AS INT) AS n_kept,
         |         md5(string_agg(tok, ' ' ORDER BY p)) AS clean_fp
         |  FROM kept GROUP BY doc_id)
         |SELECT t.doc_id,
         |       coalesce(a.n_kept, 0) AS n_kept,
         |       CAST(len(t.t) - coalesce(a.n_kept, 0) AS INT) AS n_removed,
         |       coalesce(a.clean_fp, md5('')) AS clean_fp
         |FROM toks t LEFT JOIN agg a ON t.doc_id = a.doc_id
         |ORDER BY t.doc_id""".stripMargin,
    "ts_c4_filters" -> {
      val meanLen = Money.Sql.ratio2(
        "length(replace(text, ' ', ''))", "len(string_split(text, ' '))")
      s"""WITH v AS (
         |  SELECT doc_id,
         |         CASE WHEN doc_id % 5 = 0 THEN text || ' lorem ipsum dolor'
         |              WHEN doc_id % 5 = 1 THEN text || ' function() { javascript'
         |              WHEN doc_id % 5 = 2 THEN 'Too short.'
         |              WHEN doc_id % 5 = 3 THEN text || ' It ends properly.'
         |              ELSE text END AS text
         |  FROM documents),
         |f AS (
         |  SELECT doc_id,
         |         regexp_matches(text, '[.!?"]$$') AS has_terminal_punct,
         |         contains(lower(text), 'lorem ipsum') AS has_lorem,
         |         (contains(lower(text), 'javascript') OR contains(text, '{')) AS has_code_marker,
         |         CAST(len(string_split(text, ' ')) AS INT) AS n_words,
         |         $meanLen AS mean_word_len
         |  FROM v)
         |SELECT *,
         |       (has_terminal_punct AND NOT has_lorem AND NOT has_code_marker
         |        AND n_words >= 5 AND mean_word_len BETWEEN 3.0 AND 10.0) AS keep
         |FROM f ORDER BY doc_id""".stripMargin
    },
    "ts_redact" -> {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "\\d{3}-\\d{3}-\\d{4}"
      val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
      // staged intermediates mirror the engine's sequential audit:
      // each kind is counted on the text its redaction pass actually saw
      s"""WITH v AS (
         |  SELECT doc_id,
         |         CASE WHEN doc_id % 4 = 0 THEN text || ' contact john.doe@example.com now'
         |              WHEN doc_id % 4 = 1 THEN text || ' call 555-123-4567 or 555-000-1111'
         |              WHEN doc_id % 4 = 2 THEN text || ' from 10.0.0.1 mail a@b.io'
         |              ELSE text END AS text
         |  FROM documents),
         |r1 AS (SELECT doc_id, text,
         |              regexp_replace(text, '$email', '<EMAIL>', 'g') AS t1
         |       FROM v),
         |r2 AS (SELECT doc_id, text, t1,
         |              regexp_replace(t1, '$phone', '<PHONE>', 'g') AS t2
         |       FROM r1)
         |SELECT doc_id,
         |       CAST(len(regexp_extract_all(text, '$email')) AS INT) AS n_emails,
         |       CAST(len(regexp_extract_all(t1, '$phone')) AS INT) AS n_phones,
         |       CAST(len(regexp_extract_all(t2, '$ip')) AS INT) AS n_ips,
         |       md5(regexp_replace(t2, '$ip', '<IP>', 'g')) AS redacted_md5
         |FROM r2 ORDER BY doc_id""".stripMargin
    },
    "dd_contamination" -> ("WITH " + shingleCtesFor("documents") +
      s""", bshing AS (
         |  SELECT DISTINCT doc_id AS bench_id,
         |         unnest(list_transform(range(1, len(t) - 1),
         |                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
         |  FROM (SELECT doc_id, string_split($normSql, ' ') AS t
         |        FROM documents WHERE doc_id % 97 = 0) b)
         |SELECT doc_id, bench_id, count(*) AS n_common
         |FROM ds JOIN bshing USING (shingle)
         |WHERE doc_id != bench_id
         |GROUP BY doc_id, bench_id
         |HAVING count(*) >= 3
         |ORDER BY doc_id, bench_id""".stripMargin),
    "dd_exact" ->
      s"""SELECT md5($normSql) AS fp,
         |       min(doc_id) AS keeper_doc_id,
         |       count(*) AS n_docs
         |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,
    "dd_incremental" ->
      s"""WITH idx AS (
         |  SELECT md5($normSql) AS fp, min(doc_id) AS corpus_keeper
         |  FROM documents WHERE doc_id % 5 != 0 GROUP BY 1),
         |batch AS (
         |  SELECT doc_id, md5($normSql) AS fp,
         |         min(doc_id) OVER (PARTITION BY md5($normSql)) AS batch_min
         |  FROM documents WHERE doc_id % 5 = 0)
         |SELECT b.doc_id,
         |       CASE WHEN i.corpus_keeper IS NOT NULL THEN 'corpus_dup'
         |            WHEN b.batch_min < b.doc_id THEN 'batch_dup'
         |            ELSE 'novel' END AS status,
         |       COALESCE(i.corpus_keeper, b.batch_min) AS keeper_doc_id
         |FROM batch b LEFT JOIN idx i USING (fp)
         |ORDER BY doc_id""".stripMargin,
    // A-ES twin: same md5 uniform, same ln(u)/w rank key through the
    // 9-decimal rounding
    "ts_weighted_sample" ->
      """SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
        |       CAST(ROUND(CAST(
        |         ln((('0x' || substr(md5('ws:' || doc_id), 1, 8))::BIGINT
        |             + 0.5) / 4294967296.0)
        |         / CAST(n_chars AS DOUBLE) AS DECIMAL(20,12)), 9) AS DOUBLE)
        |         AS samp_key
        |FROM documents WHERE n_chars > 0
        |ORDER BY samp_key DESC, doc_id ASC LIMIT 50""".stripMargin,
    // bloom twin: the filter itself is recomputed — same md5-derived
    // bit positions (k=4, m=2^17), so bloom_hit (not just the exact
    // verdict) must agree bit-for-bit
    "dd_bloom_prune" ->
      s"""WITH idx AS (
         |  SELECT md5($normSql) AS fp, min(doc_id) AS keeper
         |  FROM documents WHERE doc_id % 5 != 0 GROUP BY 1),
         |ks AS (SELECT unnest([0, 1, 2, 3]) AS i),
         |bits AS (
         |  SELECT DISTINCT
         |         ('0x' || substr(md5(fp || ':' || i), 1, 8))::BIGINT
         |           % 131072 AS p
         |  FROM idx CROSS JOIN ks),
         |batch AS (
         |  SELECT doc_id, md5($normSql) AS fp
         |  FROM documents WHERE doc_id % 5 = 0),
         |probe AS (
         |  SELECT b.doc_id, b.fp,
         |         bool_and(('0x' || substr(md5(b.fp || ':' || k.i), 1, 8))::BIGINT
         |                  % 131072 IN (SELECT p FROM bits)) AS bloom_hit
         |  FROM batch b CROSS JOIN ks k GROUP BY 1, 2)
         |SELECT p.doc_id, p.bloom_hit,
         |       CASE WHEN i.keeper IS NOT NULL THEN 'corpus_dup'
         |            ELSE 'novel' END AS status,
         |       i.keeper AS keeper_doc_id
         |FROM probe p LEFT JOIN idx i USING (fp)
         |ORDER BY doc_id""".stripMargin,
    "dd_ngram_jaccard" -> (shingleCtes +
      """, sizes AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id)
        |, common AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        |  FROM ds a JOIN ds b USING (shingle)
        |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT doc_a, doc_b, n_common,
        |       CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
        |FROM common
        |JOIN sizes sa ON doc_a = sa.doc_id
        |JOIN sizes sb ON doc_b = sb.doc_id
        |WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.2
        |ORDER BY doc_a, doc_b""".stripMargin),
    "dd_minhash_lsh" -> ("WITH " + minhashCtesFor("documents") +
      """SELECT doc_a, doc_b, est_jaccard
        |FROM lshp WHERE est_jaccard >= 0.25
        |ORDER BY doc_a, doc_b""".stripMargin),
    // closure of the same lshp pair graph dd_minhash_lsh verifies; the
    // recursive CTE computes min-reachable-vertex per vertex — exactly
    // the label-propagation fixpoint the engine iterates to
    "dd_cluster" -> ("WITH RECURSIVE " + minhashCtesFor("documents") +
      """, prs AS MATERIALIZED (SELECT doc_a, doc_b FROM lshp WHERE est_jaccard >= 0.25)
        |, edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM prs
        |            UNION ALL SELECT doc_b, doc_a FROM prs)
        |, reach(v, r) AS (
        |    SELECT DISTINCT src, src FROM edges
        |    UNION
        |    SELECT reach.v, e.dst FROM reach JOIN edges e ON reach.r = e.src)
        |, comp AS (SELECT v, min(r) AS cluster_id FROM reach GROUP BY v)
        |SELECT v AS doc_id, cluster_id,
        |       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
        |       (v = cluster_id) AS is_keeper
        |FROM comp ORDER BY doc_id""".stripMargin),
    // reweight twin: the same closure, every document labeled (left
    // join → singleton label = own id), weight = decimal-9 1/|cluster|
    "dd_reweight" -> ("WITH RECURSIVE " + minhashCtesFor("documents") +
      """, prs AS MATERIALIZED (SELECT doc_a, doc_b FROM lshp WHERE est_jaccard >= 0.25)
        |, edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM prs
        |            UNION ALL SELECT doc_b, doc_a FROM prs)
        |, reach(v, r) AS (
        |    SELECT DISTINCT src, src FROM edges
        |    UNION
        |    SELECT reach.v, e.dst FROM reach JOIN edges e ON reach.r = e.src)
        |, comp AS (SELECT v, min(r) AS cluster_id FROM reach GROUP BY v)
        |, lab AS (
        |    SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
        |    FROM documents d LEFT JOIN comp c ON d.doc_id = c.v)
        |SELECT doc_id, cluster_id,
        |       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
        |       CAST(ROUND(CAST(CAST(1.0 AS DOUBLE)
        |         / CAST(count(*) OVER (PARTITION BY cluster_id) AS DOUBLE)
        |         AS DECIMAL(20,12)), 9) AS DOUBLE) AS weight
        |FROM lab ORDER BY doc_id""".stripMargin),
    // cluster-signature twin: closure labels + per-cluster elementwise
    // min over the SAME sigs CTE the pair chain derives from
    "dd_cluster_sigs" -> ("WITH RECURSIVE " + minhashCtesFor("documents") +
      s""", prs AS MATERIALIZED (SELECT doc_a, doc_b FROM lshp WHERE est_jaccard >= 0.25)
         |, edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM prs
         |            UNION ALL SELECT doc_b, doc_a FROM prs)
         |, reach(v, r) AS (
         |    SELECT DISTINCT src, src FROM edges
         |    UNION
         |    SELECT reach.v, e.dst FROM reach JOIN edges e ON reach.r = e.src)
         |, comp AS (SELECT v, min(r) AS cluster_id FROM reach GROUP BY v)
         |, lab AS (
         |    SELECT d.doc_id AS v,
         |           coalesce(c.cluster_id, d.doc_id) AS cluster_id
         |    FROM documents d LEFT JOIN comp c ON d.doc_id = c.v)
         |SELECT l.cluster_id, CAST(count(*) AS BIGINT) AS n_docs,
         |       ${(0 until 8).map(i => s"min(s.mh_$i) AS mh_$i")
                   .mkString(",\n       ")}
         |FROM lab l JOIN sigs s ON l.v = s.doc_id
         |GROUP BY 1 ORDER BY 1""".stripMargin),
    // incremental-cluster twin: the FULL closure over all pairs — the
    // equivalence contract (incremental merge ≡ full recompute) IS the
    // oracle; singletons labeled themselves via the documents left join
    "dd_incremental_cluster" -> ("WITH RECURSIVE " +
      minhashCtesFor("documents") +
      """, prs AS MATERIALIZED (SELECT doc_a, doc_b FROM lshp WHERE est_jaccard >= 0.25)
        |, edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM prs
        |            UNION ALL SELECT doc_b, doc_a FROM prs)
        |, reach(v, r) AS (
        |    SELECT DISTINCT src, src FROM edges
        |    UNION
        |    SELECT reach.v, e.dst FROM reach JOIN edges e ON reach.r = e.src)
        |, comp AS (SELECT v, min(r) AS cluster_id FROM reach GROUP BY v)
        |, lab AS (
        |    SELECT d.doc_id AS v,
        |           coalesce(c.cluster_id, d.doc_id) AS cluster_id
        |    FROM documents d LEFT JOIN comp c ON d.doc_id = c.v)
        |SELECT v AS doc_id, cluster_id,
        |       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
        |       (v = cluster_id) AS is_keeper
        |FROM lab ORDER BY doc_id""".stripMargin),
    // winnowing twin: positions 1..len-k+1, trailing-window min, full
    // windows only (p >= w) — the same contract the engine documents
    "ts_winnow" ->
      (winnowCtes + "\nSELECT doc_id, fp FROM wfp ORDER BY doc_id, fp"),
    // inverted-index pair join over the same fingerprints: stop-
    // fingerprint cap (df <= 16 — char-gram boilerplate threshold),
    // lower-id-first, >= 5 shared
    "dd_winnow_pairs" -> (winnowCtes +
      """
        |, kept AS (SELECT fp FROM wfp GROUP BY fp HAVING count(*) <= 16)
        |, wds AS (SELECT doc_id, fp FROM wfp JOIN kept USING (fp))
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        |FROM wds a JOIN wds b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY doc_a, doc_b HAVING count(*) >= 5
        |ORDER BY doc_a, doc_b""".stripMargin),
    // same closure as dd_cluster, keeper re-picked by token count
    "dd_canonical" -> ("WITH RECURSIVE " + minhashCtesFor("documents") +
      """, prs AS MATERIALIZED (SELECT doc_a, doc_b FROM lshp WHERE est_jaccard >= 0.25)
        |, edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM prs
        |            UNION ALL SELECT doc_b, doc_a FROM prs)
        |, reach(v, r) AS (
        |    SELECT DISTINCT src, src FROM edges
        |    UNION
        |    SELECT reach.v, e.dst FROM reach JOIN edges e ON reach.r = e.src)
        |, comp AS (SELECT v, min(r) AS cluster_id FROM reach GROUP BY v)
        |, tk AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
        |         FROM documents)
        |SELECT v AS doc_id, cluster_id, n_tokens,
        |       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
        |       (ROW_NUMBER() OVER (PARTITION BY cluster_id
        |          ORDER BY n_tokens DESC, v ASC) = 1) AS is_keeper
        |FROM comp JOIN tk ON v = doc_id
        |ORDER BY doc_id""".stripMargin),
    "ts_mix" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |         CASE WHEN source = 'src0' THEN 700
        |              WHEN source = 'src1' THEN 1000000
        |              WHEN source = 'src2' THEN 0
        |              ELSE 650 END AS budget
        |  FROM documents),
        |r AS (
        |  SELECT source,
        |         least(1.0, CAST(max(budget) AS DOUBLE)
        |                    / CAST(sum(n_tokens) AS DOUBLE)) AS rate
        |  FROM t GROUP BY source)
        |SELECT doc_id, source, n_tokens,
        |       (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |          / 4294967296.0 < rate) AS keep
        |FROM t JOIN r USING (source)
        |ORDER BY doc_id""".stripMargin,
    // quality-prune twin: same alpha regexp as ts_curation, integer
    // keep boundary floor(0.5·n) per source
    "ts_quality_prune" ->
      """WITH s AS (
        |  SELECT doc_id, source,
        |         CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        |           / nullif(length(text), 0) AS alpha_ratio
        |  FROM documents),
        |c AS (SELECT source, count(*) AS n FROM s GROUP BY 1)
        |SELECT doc_id, source, alpha_ratio, CAST(rn AS INT) AS src_rank,
        |       rn <= CAST(floor(0.5 * n) AS BIGINT) AS kept
        |FROM (SELECT s.doc_id, s.source, s.alpha_ratio, c.n,
        |             ROW_NUMBER() OVER (PARTITION BY s.source
        |               ORDER BY s.alpha_ratio DESC, s.doc_id ASC) AS rn
        |      FROM s JOIN c USING (source)) g
        |ORDER BY doc_id""".stripMargin,
    // epoch twin: double-cast factor literals (a bare 2.5 is DECIMAL in
    // DuckDB), generate_series guarded to n >= 1 (unnest([]) drops)
    "ts_epochs" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |         CASE WHEN source = 'src0' THEN CAST(2.5 AS DOUBLE)
        |              WHEN source = 'src1' THEN CAST(0.25 AS DOUBLE)
        |              WHEN source = 'src2' THEN CAST(1.75 AS DOUBLE)
        |              ELSE CAST(1.0 AS DOUBLE) END AS f,
        |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':epoch'), 1, 8)) AS BIGINT)
        |           / 4294967296.0 AS u
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source,
        |         CAST(floor(f) AS INT)
        |           + CASE WHEN u < f - floor(f) THEN 1 ELSE 0 END AS n_copies
        |  FROM t)
        |SELECT doc_id, source, CAST(copy AS INT) AS copy
        |FROM (SELECT doc_id, source, unnest(generate_series(1, n_copies)) AS copy
        |      FROM c WHERE n_copies >= 1) g
        |ORDER BY doc_id, copy""".stripMargin,
    // temperature-mix twin: pow routed through the 9-dp decimal guard,
    // W summed in decimal, rate division mirrored operand-for-operand
    "ts_temperature_mix" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
        |  FROM documents),
        |s AS (SELECT source, SUM(n_tokens) AS total_tokens FROM t GROUP BY 1),
        |w AS (SELECT source, total_tokens,
        |        ROUND(CAST(pow(CAST(total_tokens AS DOUBLE),
        |          CAST(0.5 AS DOUBLE)) AS DECIMAL(20,12)), 9) AS w
        |      FROM s),
        |wt AS (SELECT SUM(w) AS w_total FROM w),
        |r AS (SELECT source,
        |        LEAST(CAST(1.0 AS DOUBLE),
        |          CAST(5000 AS DOUBLE) * CAST(w.w AS DOUBLE)
        |            / CAST(wt.w_total AS DOUBLE)
        |            / CAST(w.total_tokens AS DOUBLE)) AS rate
        |      FROM w CROSS JOIN wt)
        |SELECT t.doc_id, t.source, t.n_tokens,
        |       (CAST(('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |          / 4294967296.0 < r.rate) AS keep
        |FROM t JOIN r USING (source)
        |ORDER BY t.doc_id""".stripMargin,
    // the full curation pipeline: quality gate → exact-dedup keepers →
    // LSH near-dup removal (drop the higher doc_id of each pair) →
    // deterministic hash split. Every stage reuses a primitive that is
    // oracle-verified on its own; this row proves the COMPOSITION.
    "ts_curation" -> {
      val alpha =
        "CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / length(text)"
      s"""WITH q0 AS (
         |  SELECT doc_id, text,
         |         $alpha AS alpha,
         |         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
         |  FROM documents),
         |fdocs AS (
         |  SELECT doc_id, text, n_tokens FROM q0
         |  WHERE alpha >= 0.8 AND n_tokens >= 25),
         |fps AS (SELECT doc_id, text, n_tokens, md5($normSql) AS fp FROM fdocs),
         |keep1 AS (
         |  SELECT doc_id, text, n_tokens FROM (
         |    SELECT doc_id, text, n_tokens,
         |           MIN(doc_id) OVER (PARTITION BY fp) AS keeper
         |    FROM fps) k
         |  WHERE doc_id = keeper),
         |${minhashCtesFor("keep1")},
         |drops AS (
         |  SELECT DISTINCT doc_b AS doc_id FROM lshp WHERE est_jaccard >= 0.5),
         |keep2 AS (
         |  SELECT doc_id, n_tokens FROM keep1
         |  WHERE doc_id NOT IN (SELECT doc_id FROM drops)),
         |s AS (
         |  SELECT doc_id, n_tokens,
         |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::INT AS INT) AS b
         |  FROM keep2)
         |SELECT doc_id, n_tokens,
         |       CASE WHEN b < 204 THEN 'train'
         |            WHEN b < 230 THEN 'validation'
         |            ELSE 'test' END AS split
         |FROM s ORDER BY doc_id""".stripMargin
    },
    "ann_brute" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, label, ${cosSql("embedding", "qv")} AS sim
         |FROM embeddings CROSS JOIN q
         |ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin,
    // MMR twin: the candidate + pair sims from the same rounded cosine
    // text, then ten unrolled greedy rounds (λ/1−λ as parsed literals;
    // every score combines ALREADY-ROUNDED sims, so selection is
    // bit-deterministic); MATERIALIZED per the iterative-oracle rule
    "ann_mmr" -> {
      val rounds = (2 to 10).map { i =>
        s"""sc$i AS MATERIALIZED (
           |  SELECT c.vec_id, c.qsim,
           |         0.7 * c.qsim - 0.3 * (SELECT max(p.sim) FROM pairs p
           |           WHERE p.pa = c.vec_id
           |             AND p.pb IN (SELECT vec_id FROM sel${i - 1}))
           |           AS score
           |  FROM cand c
           |  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${i - 1})),
           |sel$i AS MATERIALIZED (
           |  SELECT * FROM sel${i - 1}
           |  UNION ALL
           |  SELECT vec_id, qsim, $i FROM (
           |    SELECT vec_id, qsim FROM sc$i
           |    ORDER BY score DESC, vec_id LIMIT 1) t)""".stripMargin
      }.mkString(",\n")
      s"""WITH q AS (SELECT embedding AS qvec FROM embeddings
         |           WHERE vec_id = 0),
         |cand AS MATERIALIZED (
         |  SELECT e.vec_id, e.embedding,
         |         ${cosSql("e.embedding", "qvec")} AS qsim
         |  FROM embeddings e CROSS JOIN q
         |  ORDER BY qsim DESC, e.vec_id LIMIT 50),
         |pairs AS MATERIALIZED (
         |  SELECT a.vec_id AS pa, b.vec_id AS pb,
         |         ${cosSql("a.embedding", "b.embedding")} AS sim
         |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
         |sel1 AS MATERIALIZED (
         |  SELECT vec_id, qsim, 1 AS rnk FROM cand
         |  ORDER BY qsim DESC, vec_id LIMIT 1),
         |$rounds
         |SELECT rnk, vec_id, qsim FROM sel10 ORDER BY rnk""".stripMargin
    },
    // JL twin: the SAME ±1 matrix the engine folds over, embedded as a
    // SQL literal (both sides regenerate from the md5 seed string);
    // list_transform keeps the projection's accumulation order
    "ann_jl_rerank" -> {
      val matrixSql = Similarity.jlMatrix(32, 64)
        .map(_.map(v => if (v > 0) "1.0" else "-1.0")
          .mkString("[", ", ", "]"))
        .mkString("[", ",\n         |   ", "]")
      s"""WITH r AS (SELECT $matrixSql AS m),
         |q AS (SELECT e.embedding AS qv,
         |             list_transform(r.m, row ->
         |               ${dotSql("e.embedding", "row")}) AS pq
         |      FROM embeddings e CROSS JOIN r WHERE e.vec_id = 0),
         |pe AS (SELECT e.vec_id, e.label, e.embedding,
         |              list_transform(r.m, row ->
         |                ${dotSql("e.embedding", "row")}) AS pv
         |       FROM embeddings e CROSS JOIN r),
         |c AS (SELECT pe.vec_id, pe.label, pe.embedding, q.qv,
         |             ${cosSql("pe.pv", "q.pq")} AS coarse_sim
         |      FROM pe CROSS JOIN q
         |      ORDER BY coarse_sim DESC, vec_id ASC LIMIT 100)
         |SELECT vec_id, label, coarse_sim, ${cosSql("embedding", "qv")} AS sim
         |FROM c ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin
    },
    // prefix-rerank twin: list-slice prefixes feed the same rounded
    // cosine; survivors re-ranked with the full-width expression
    "ann_prefix_rerank" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |c AS (
         |  SELECT vec_id, label, embedding, qv,
         |         ${cosSql("embedding[1:16]", "qv[1:16]")} AS coarse_sim
         |  FROM embeddings CROSS JOIN q
         |  ORDER BY coarse_sim DESC, vec_id ASC LIMIT 50)
         |SELECT vec_id, label, coarse_sim, ${cosSql("embedding", "qv")} AS sim
         |FROM c ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin,
    "ann_ivf" ->
      s"""WITH ${trainedCentsChain("centroid_id")},
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |assigned AS (
         |  SELECT vec_id, label, embedding, centroid_id FROM (
         |    SELECT e.vec_id, e.label, e.embedding, c.centroid_id,
         |           ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${cosSql("e.embedding", "c.cvec")} DESC, c.centroid_id ASC) AS rn
         |    FROM embeddings e CROSS JOIN cents c) r
         |  WHERE rn = 1),
         |probes AS (
         |  SELECT centroid_id FROM cents CROSS JOIN q
         |  ORDER BY ${cosSql("cvec", "qv")} DESC, centroid_id ASC LIMIT 4)
         |SELECT a.vec_id, a.label, ${cosSql("a.embedding", "qv")} AS sim
         |FROM assigned a JOIN probes USING (centroid_id) CROSS JOIN q
         |ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin,
    // PQ codes: same per-subspace argmin the engine folds — squared L2
    // in double space, 9dp decimal rounding, cid-ascending tie-break
    "ann_pq" -> (pqBestCtes +
      """
        |SELECT vec_id,
        |       string_agg(CAST(cid AS VARCHAR), ',' ORDER BY s) AS codes_csv
        |FROM best GROUP BY vec_id ORDER BY vec_id""".stripMargin),
    "ann_pq_adc" -> (pqBestCtes +
      s"""
         |, recon AS (
         |  SELECT vec_id,
         |         flatten(list(list_slice(c.cvec, s*8 + 1, s*8 + 8)
         |                      ORDER BY s)) AS rv
         |  FROM best JOIN cents c USING (cid)
         |  GROUP BY vec_id),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT r.vec_id, e.label, ${cosSql("r.rv", "qv")} AS sim
         |FROM recon r JOIN embeddings e USING (vec_id) CROSS JOIN q
         |ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin),
    // IVF cell assignment + probe pruning on top of the PQ recon chain;
    // same argmax/tie-break text as ann_ivf, same recon as ann_pq_adc
    "ann_ivfpq" -> ivfPqSql,
    // the stored index cannot change the answer: same oracle text
    "ann_index_scan" -> ivfPqSql,
    // base ∪ wave is the whole corpus with identical frozen geometry,
    // so the append twin IS the one-shot index twin
    "ann_index_append" -> ivfPqSql,
    "ann_filtered" -> ivfPqSqlWhere("WHERE e.label = 2"),
    // batched twin: per-query probe rank + per-query result rank over
    // the same cell/recon chain
    "ann_batch" -> (pqBestCtesTrained +
      s"""
         |, qs AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |         WHERE vec_id IN (0, 17, 42)),
         |probes AS (
         |  SELECT qid, qv, cid FROM (
         |    SELECT qs.qid, qs.qv, c.cid,
         |           ROW_NUMBER() OVER (PARTITION BY qs.qid
         |             ORDER BY ${cosSql("c.cvec", "qs.qv")} DESC,
         |                      c.cid ASC) AS pr
         |    FROM qs CROSS JOIN cents c) p WHERE pr <= 4),
         |cell AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |           ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${cosSql("e.embedding", "c.cvec")} DESC,
         |                      c.cid ASC) AS rn
         |    FROM embeddings e CROSS JOIN cents c) r WHERE rn = 1),
         |recon AS (
         |  SELECT vec_id,
         |         flatten(list(list_slice(c.cvec, s*8 + 1, s*8 + 8)
         |                      ORDER BY s)) AS rv
         |  FROM best JOIN cents c USING (cid)
         |  GROUP BY vec_id),
         |scored AS (
         |  SELECT p.qid, r.vec_id, e.label, ${cosSql("r.rv", "p.qv")} AS sim
         |  FROM recon r
         |  JOIN cell USING (vec_id)
         |  JOIN probes p USING (cid)
         |  JOIN embeddings e ON r.vec_id = e.vec_id)
         |SELECT qid, rnk, vec_id, label, sim FROM (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid
         |    ORDER BY sim DESC, vec_id ASC) AS INT) AS rnk FROM scored) t
         |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin),
    // first-token blocking only: the engine's extra length-band key is a
    // pure refinement (levenshtein >= length difference), so the result
    // set is identical
    "dd_fuzzy" ->
      """WITH keyed AS (
        |  SELECT p_partkey AS id, p_name AS t, string_split(p_name, ' ')[1] AS blk
        |  FROM part),
        |reps AS (SELECT t, min(id) AS rep FROM keyed GROUP BY t),
        |texts AS (SELECT DISTINCT t, blk FROM keyed)
        |SELECT r.rep AS id_a, k.id AS id_b, CAST(0 AS INT) AS edit_dist
        |FROM keyed k JOIN reps r ON k.t = r.t WHERE k.id <> r.rep
        |UNION ALL
        |SELECT least(ra.rep, rb.rep) AS id_a,
        |       greatest(ra.rep, rb.rep) AS id_b,
        |       CAST(levenshtein(a.t, b.t) AS INT) AS edit_dist
        |FROM texts a JOIN texts b ON a.blk = b.blk AND a.t < b.t
        |JOIN reps ra ON a.t = ra.t JOIN reps rb ON b.t = rb.t
        |WHERE levenshtein(a.t, b.t) <= 3
        |ORDER BY id_a, id_b""".stripMargin,
    // The oracle PREDICTS what the JDK decoders must return: the asset
    // generator pins image dims / audio frame counts / video dims+frames
    // as arithmetic in doc_id, and n_bytes follows from the container
    // layout (BMP: 54-byte headers + 4-aligned 24-bit rows; WAV: 44-byte
    // header + 2 bytes per mono 16-bit frame; GIF: 398-byte fixed header
    // + per frame 12 bytes of descriptors + the uncompressed-LZW stream
    // of 2·W·H+1 byte-aligned codes + its sub-block prefixes). A decode
    // bug cannot agree with this by accident.
    // phash twin: every sampled byte re-derived from the BMP closed
    // form — bottom-up rows, 4-byte row alignment, ((seed+i)*31)&255;
    // integer NN lattice, integer mean, bits packed into two 32-bit
    // BIGINT halves (row-major, idx = gy*8+gx)
    "mm_phash" -> (phashCtes +
      """SELECT asset_id, width, height, mean_gray, hash_hi, hash_lo
        |FROM ph ORDER BY asset_id""".stripMargin),
    // phash-STAR twin (round-8 contract): exact-hash membership under
    // the lowest-id rep + brute hamming over DISTINCT hash pairs. The
    // band join's pigeonhole guarantee (4 16-bit bands, <= 3 differing
    // bits => >= 1 band untouched) makes the banded Spark bridge plan
    // EXACT, so the brute-over-reps twin is the equivalence proof, not
    // an approximation
    "mm_phash_pairs" -> (phashCtes +
      """, aug AS (
        |  SELECT asset_id, hash_hi, hash_lo FROM ph
        |  UNION ALL
        |  SELECT asset_id + 1000000, hash_hi, hash_lo FROM ph
        |  WHERE asset_id % 30 = 0),
        |reps AS (
        |  SELECT hash_hi, hash_lo, min(asset_id) AS rep
        |  FROM aug GROUP BY hash_hi, hash_lo),
        |members AS (
        |  SELECT r.rep AS asset_a, a.asset_id AS asset_b,
        |         CAST(0 AS INT) AS hamming
        |  FROM aug a JOIN reps r
        |    ON a.hash_hi = r.hash_hi AND a.hash_lo = r.hash_lo
        |  WHERE a.asset_id <> r.rep),
        |bridges AS (
        |  SELECT a.rep AS asset_a, b.rep AS asset_b,
        |         CAST(bit_count(xor(a.hash_hi, b.hash_hi))
        |            + bit_count(xor(a.hash_lo, b.hash_lo)) AS INT)
        |           AS hamming
        |  FROM reps a JOIN reps b ON a.rep < b.rep
        |  WHERE bit_count(xor(a.hash_hi, b.hash_hi))
        |      + bit_count(xor(a.hash_lo, b.hash_lo)) <= 3)
        |SELECT * FROM (SELECT * FROM members
        |               UNION ALL SELECT * FROM bridges)
        |ORDER BY asset_a, asset_b""".stripMargin),
    // phash-cluster twin, restructured for the 30× gate (round 12 —
    // the ~80-min sf3 long pole was (a) an O(n²) cross join for the
    // pair set and (b) the recursive closure enumerating (v, every
    // reachable r) at ASSET grain, quadratic in the exact-dup family
    // sizes). Same mathematics, three collapses:
    //  1. exact-hash groups collapse to their min-asset rep FIRST —
    //     hamming(a, b) depends only on the hashes, so the cluster
    //     structure is exactly the component structure of the
    //     hash-GROUP graph (no recursion needed to attach members);
    //  2. rep-to-rep candidate pairs come from the 16-bit band
    //     pigeonhole (hamming ≤ 3 over 4 disjoint bands ⇒ ≥ 1 band
    //     equal — the same exactness argument the mm_phash_pairs row
    //     proves against brute force at every SF), an equi-join;
    //  3. the recursive min-reachable closure runs over the BRIDGE
    //     graph only (distinct-hash reps within hamming 1..3), which
    //     is orders of magnitude smaller than the asset graph.
    // Component min over reps = min asset of the cluster, because each
    // rep is its group's min — labels are bit-identical to the old
    // twin (mm_phash_cluster stayed triple-green at sf0.01/sf1).
    "mm_phash_cluster" -> (phashCtes.replaceFirst("WITH ", "WITH RECURSIVE ") +
      """, aug AS (
        |  SELECT asset_id, hash_hi, hash_lo FROM ph
        |  UNION ALL
        |  SELECT asset_id + 1000000, hash_hi, hash_lo FROM ph
        |  WHERE asset_id % 30 = 0),
        |reps AS MATERIALIZED (
        |  SELECT hash_hi, hash_lo, min(asset_id) AS rep
        |  FROM aug GROUP BY hash_hi, hash_lo),
        |bnd AS (
        |  SELECT rep, hash_hi, hash_lo, b.band_no,
        |         CASE b.band_no
        |           WHEN 0 THEN hash_hi // 65536
        |           WHEN 1 THEN hash_hi % 65536
        |           WHEN 2 THEN hash_lo // 65536
        |           ELSE hash_lo % 65536 END AS band_val
        |  FROM reps, (VALUES (0), (1), (2), (3)) b(band_no)),
        |bridges AS (
        |  SELECT DISTINCT a.rep AS ra, b.rep AS rb
        |  FROM bnd a JOIN bnd b
        |    ON a.band_no = b.band_no AND a.band_val = b.band_val
        |   AND a.rep < b.rep
        |  WHERE bit_count(xor(a.hash_hi, b.hash_hi))
        |      + bit_count(xor(a.hash_lo, b.hash_lo)) <= 3),
        |edges AS (SELECT ra AS src, rb AS dst FROM bridges
        |          UNION ALL SELECT rb, ra FROM bridges),
        |reach(v, r) AS (
        |    SELECT DISTINCT src, src FROM edges
        |    UNION
        |    SELECT reach.v, e.dst FROM reach JOIN edges e ON reach.r = e.src),
        |comp AS (SELECT v, min(r) AS cluster_id FROM reach GROUP BY v),
        |lab AS (
        |    SELECT a.asset_id, coalesce(c.cluster_id, r.rep) AS cluster_id
        |    FROM aug a
        |    JOIN reps r
        |      ON a.hash_hi = r.hash_hi AND a.hash_lo = r.hash_lo
        |    LEFT JOIN comp c ON r.rep = c.v)
        |SELECT asset_id, cluster_id,
        |       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
        |       (asset_id = cluster_id) AS is_keeper
        |FROM lab ORDER BY asset_id""".stripMargin),
    // videoprint twin: every decoded pixel re-derived from the GIF
    // closed form (palette gray 2*idx, idx = (seed*31 + f*7 + i) % 128)
    "mm_videoprint" ->
      """WITH vids AS (
        |  SELECT doc_id, CAST(2 + doc_id % 7 AS BIGINT) AS w,
        |         CAST(2 + doc_id % 4 AS BIGINT) AS h,
        |         CAST(1 + doc_id % 5 AS BIGINT) AS nf
        |  FROM documents WHERE doc_id % 3 = 2),
        |fr AS (SELECT doc_id, w, h, nf, unnest(range(0, nf)) AS f
        |       FROM vids),
        |px AS (SELECT doc_id, nf, f, unnest(range(0, w * h)) AS i
        |       FROM fr),
        |en AS (
        |  SELECT doc_id, f, any_value(nf) AS nf,
        |         CAST(SUM(2 * ((doc_id * 31 + f * 7 + i) % 128))
        |           AS BIGINT) AS fe
        |  FROM px GROUP BY doc_id, f),
        |m AS (SELECT doc_id, CAST(SUM(fe) // any_value(nf) AS BIGINT)
        |        AS mean FROM en GROUP BY 1)
        |SELECT e.doc_id AS asset_id, CAST(e.nf AS INT) AS n_frames,
        |       CAST(e.f AS INT) AS frame_idx, e.fe AS frame_energy,
        |       e.fe > m.mean AS above_mean
        |FROM en e JOIN m USING (doc_id)
        |ORDER BY asset_id, frame_idx""".stripMargin,
    // keyframe twin: same closed-form energies, argmax per clip with
    // the earliest-frame tie-break
    // scene twin: the same closed-form frame energies, lag |Δ|,
    // integer-mean threshold (// ↔ DIV), break-flag running sum
    "mm_scenes" ->
      """WITH vids AS (
        |  SELECT doc_id, CAST(2 + doc_id % 7 AS BIGINT) AS w,
        |         CAST(2 + doc_id % 4 AS BIGINT) AS h,
        |         CAST(1 + doc_id % 5 AS BIGINT) AS nf
        |  FROM documents WHERE doc_id % 3 = 2),
        |fr AS (SELECT doc_id, w, h, nf, unnest(range(0, nf)) AS f
        |       FROM vids),
        |px AS (SELECT doc_id, nf, f, unnest(range(0, w * h)) AS i
        |       FROM fr),
        |en AS (
        |  SELECT doc_id, f,
        |         CAST(SUM(2 * ((doc_id * 31 + f * 7 + i) % 128))
        |           AS BIGINT) AS fe
        |  FROM px GROUP BY doc_id, f),
        |dd AS (
        |  SELECT doc_id, f, fe,
        |         abs(fe - lag(fe) OVER (PARTITION BY doc_id ORDER BY f))
        |           AS ad
        |  FROM en),
        |thr AS (
        |  SELECT doc_id, CAST(SUM(ad) // count(ad) AS BIGINT) AS thr
        |  FROM dd WHERE ad IS NOT NULL GROUP BY 1),
        |b AS (
        |  SELECT d.doc_id, d.f,
        |         CASE WHEN d.ad IS NULL OR d.ad > t.thr THEN 1 ELSE 0 END
        |           AS brk
        |  FROM dd d LEFT JOIN thr t USING (doc_id)),
        |s AS (
        |  SELECT doc_id, f,
        |         SUM(brk) OVER (PARTITION BY doc_id ORDER BY f
        |           ROWS UNBOUNDED PRECEDING) AS scene
        |  FROM b)
        |SELECT doc_id AS asset_id, CAST(scene - 1 AS INT) AS scene_idx,
        |       CAST(min(f) AS INT) AS start_frame,
        |       CAST(count(*) AS INT) AS n_frames
        |FROM s GROUP BY doc_id, scene
        |ORDER BY asset_id, scene_idx""".stripMargin,
    "mm_keyframes" ->
      """WITH vids AS (
        |  SELECT doc_id, CAST(2 + doc_id % 7 AS BIGINT) AS w,
        |         CAST(2 + doc_id % 4 AS BIGINT) AS h,
        |         CAST(1 + doc_id % 5 AS BIGINT) AS nf
        |  FROM documents WHERE doc_id % 3 = 2),
        |fr AS (SELECT doc_id, w, h, nf, unnest(range(0, nf)) AS f
        |       FROM vids),
        |px AS (SELECT doc_id, nf, f, unnest(range(0, w * h)) AS i
        |       FROM fr),
        |en AS (
        |  SELECT doc_id, f, any_value(nf) AS nf,
        |         CAST(SUM(2 * ((doc_id * 31 + f * 7 + i) % 128))
        |           AS BIGINT) AS fe
        |  FROM px GROUP BY doc_id, f),
        |r AS (
        |  SELECT doc_id, nf, f, fe,
        |         ROW_NUMBER() OVER (PARTITION BY doc_id
        |           ORDER BY fe DESC, f ASC) AS rn
        |  FROM en)
        |SELECT doc_id AS asset_id, CAST(nf AS INT) AS n_frames,
        |       CAST(f AS INT) AS frame_idx, fe AS frame_energy
        |FROM r WHERE rn = 1 ORDER BY asset_id""".stripMargin,
    // audioprint twin: every PCM sample re-derived from the WAV closed
    // form ((seed*31 + i*7) % 65536 - 32768); 16-frame |sample| sums,
    // integer-mean threshold, bits packed by window index
    "mm_audioprint" ->
      """WITH auds AS (
        |  SELECT doc_id, CAST(16 + doc_id % 240 AS BIGINT) AS nf
        |  FROM documents WHERE doc_id % 3 = 1),
        |w AS (SELECT doc_id, nf, nf // 16 AS nw FROM auds),
        |wins AS (SELECT doc_id, nf, nw, unnest(range(0, nw)) AS wi FROM w),
        |frames AS (SELECT doc_id, nf, nw, wi,
        |                  unnest(range(0, 16)) AS fi FROM wins),
        |en AS (
        |  SELECT doc_id, wi, any_value(nf) AS nf, any_value(nw) AS nw,
        |         SUM(abs(((doc_id * 31 + (wi * 16 + fi) * 7) % 65536)
        |                 - 32768)) AS esum
        |  FROM frames GROUP BY 1, 2),
        |m AS (
        |  SELECT doc_id, any_value(nf) AS nf, any_value(nw) AS nw,
        |         CAST(SUM(esum) // any_value(nw) AS BIGINT) AS mean_energy
        |  FROM en GROUP BY doc_id),
        |fp AS (
        |  SELECT e.doc_id,
        |         CAST(SUM(CASE WHEN e.esum > m.mean_energy
        |                  THEN CAST(1 AS BIGINT) << CAST(e.wi AS INT)
        |                  ELSE 0 END) AS BIGINT) AS fingerprint
        |  FROM en e JOIN m USING (doc_id) GROUP BY 1)
        |SELECT m.doc_id AS asset_id, CAST(m.nf AS INT) AS n_frames,
        |       CAST(m.nw AS INT) AS n_windows, m.mean_energy,
        |       fp.fingerprint
        |FROM m JOIN fp USING (doc_id) ORDER BY asset_id""".stripMargin,
    // segment twin: the same closed-form window energies and integer-
    // mean threshold; run boundaries via lag-flip + running sum
    "mm_segments" ->
      """WITH auds AS (
        |  SELECT doc_id, CAST(16 + doc_id % 240 AS BIGINT) AS nf
        |  FROM documents WHERE doc_id % 3 = 1),
        |w AS (SELECT doc_id, nf, nf // 16 AS nw FROM auds),
        |wins AS (SELECT doc_id, nf, nw, unnest(range(0, nw)) AS wi FROM w),
        |frames AS (SELECT doc_id, nf, nw, wi,
        |                  unnest(range(0, 16)) AS fi FROM wins),
        |en AS (
        |  SELECT doc_id, wi, any_value(nw) AS nw,
        |         SUM(abs(((doc_id * 31 + (wi * 16 + fi) * 7) % 65536)
        |                 - 32768)) AS esum
        |  FROM frames GROUP BY 1, 2),
        |m AS (
        |  SELECT doc_id,
        |         CAST(SUM(esum) // any_value(nw) AS BIGINT) AS mean_energy
        |  FROM en GROUP BY doc_id),
        |v AS (
        |  SELECT e.doc_id, e.wi, (e.esum > m.mean_energy) AS voiced
        |  FROM en e JOIN m USING (doc_id)),
        |r AS (
        |  SELECT doc_id, wi, voiced,
        |         CASE WHEN lag(voiced) OVER (PARTITION BY doc_id ORDER BY wi)
        |                IS DISTINCT FROM voiced THEN 1 ELSE 0 END AS brk
        |  FROM v),
        |s AS (
        |  SELECT doc_id, wi, voiced,
        |         SUM(brk) OVER (PARTITION BY doc_id ORDER BY wi
        |           ROWS UNBOUNDED PRECEDING) AS seg
        |  FROM r)
        |SELECT doc_id AS asset_id, CAST(seg - 1 AS INT) AS seg_idx,
        |       any_value(voiced) AS is_voiced,
        |       CAST(min(wi) AS INT) AS start_window,
        |       CAST(count(*) AS INT) AS n_windows
        |FROM s GROUP BY doc_id, seg
        |ORDER BY asset_id, seg_idx""".stripMargin,
    "mm_features" ->
      """WITH a AS (
        |  SELECT doc_id, text,
        |         1 + doc_id % 8 AS iw, 1 + doc_id % 5 AS ih,
        |         16 + doc_id % 240 AS af,
        |         2 + doc_id % 7 AS vw, 2 + doc_id % 4 AS vh,
        |         1 + doc_id % 5 AS vf
        |  FROM documents),
        |b AS (SELECT *, 2 * vw * vh + 1 AS dl FROM a)
        |SELECT doc_id AS asset_id,
        |       CASE WHEN doc_id % 3 = 0 THEN 'image'
        |            WHEN doc_id % 3 = 1 THEN 'audio'
        |            ELSE 'video' END AS kind,
        |       CAST(CASE WHEN doc_id % 3 = 0 THEN 54 + ((3 * iw + 3) // 4) * 4 * ih
        |                 WHEN doc_id % 3 = 1 THEN 44 + 2 * af
        |                 ELSE 398 + vf * (12 + dl + (dl + 254) // 255) END AS INT) AS n_bytes,
        |       md5(text) AS src_md5,
        |       CAST(CASE WHEN doc_id % 3 = 0 THEN iw
        |                 WHEN doc_id % 3 = 1 THEN 0
        |                 ELSE vw END AS INT) AS width,
        |       CAST(CASE WHEN doc_id % 3 = 0 THEN ih
        |                 WHEN doc_id % 3 = 1 THEN 0
        |                 ELSE vh END AS INT) AS height,
        |       CAST(CASE WHEN doc_id % 3 = 0 THEN 1
        |                 WHEN doc_id % 3 = 1 THEN af
        |                 ELSE vf END AS INT) AS n_frames
        |FROM b ORDER BY asset_id""".stripMargin,
    "dd_embed_cos" -> {
      // mirrors signLshPairs' skew guard: refine oversized 8-dim buckets
      // to 16 dims, then cap each bucket at its 256 lowest vec_ids
      def bucket(dims: Int) = (0 until dims)
        .map(i => s"CASE WHEN embedding[${i + 1}] >= 0 THEN 'P' ELSE 'N' END")
        .mkString("concat(", ", ", ")")
      s"""WITH wb AS (
         |  SELECT vec_id, embedding, ${bucket(8)} AS b0, ${bucket(16)} AS b1
         |  FROM embeddings),
         |cnt AS (SELECT b0, count(*) AS n FROM wb GROUP BY b0),
         |fin AS (
         |  SELECT vec_id, embedding,
         |         CASE WHEN n > 256 THEN b1 ELSE b0 END AS bucket
         |  FROM wb JOIN cnt USING (b0)),
         |capped AS (
         |  SELECT vec_id, embedding, bucket FROM (
         |    SELECT vec_id, embedding, bucket,
         |           ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) AS rn
         |    FROM fin) r
         |  WHERE rn <= 256)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |       ${cosSql("a.embedding", "b.embedding")} AS sim
         |FROM capped a JOIN capped b USING (bucket)
         |WHERE a.vec_id < b.vec_id
         |  AND ${cosSql("a.embedding", "b.embedding")} >= 0.3
         |ORDER BY vec_a, vec_b""".stripMargin
    },
    // knn-graph twin: the ann_ivf argmax assignment (dst index), the
    // same ranking extended to rn ≤ 4 for the probe side, then a
    // per-source rank over the cell join
    "ann_knn_graph" -> (knnGraphCteSql +
      "SELECT src, dst, sim, rnk FROM graph ORDER BY src, rnk"),
    // DSIR twin: hashed n-gram features via lockstep unnest (unigrams
    // UNION ALL lag-bigrams), bucket = first 8 md5 hex digits mod 256;
    // both distributions from one bucket-grain frame; every ln through
    // the 9-dp decimal rounding, the per-doc weight an exact decimal
    // Σ nf·Δln; Gumbel noise from md5(doc_id || ':dsir') with BOTH
    // nested ln's 9-dp-rounded, exactly as the Spark side
    "ts_dsir" ->
      s"""WITH tok AS (
         |  SELECT doc_id, lang,
         |         generate_subscripts(string_split($normSql, ' '), 1) AS pos,
         |         unnest(string_split($normSql, ' ')) AS token
         |  FROM documents),
         |grams AS (
         |  SELECT doc_id, lang, token AS gram FROM tok
         |  UNION ALL
         |  SELECT doc_id, lang, w1 || ' ' || w2 AS gram FROM (
         |    SELECT doc_id, lang,
         |           lag(token) OVER (PARTITION BY doc_id ORDER BY pos) AS w1,
         |           token AS w2
         |    FROM tok) b WHERE w1 IS NOT NULL),
         |feats AS (
         |  SELECT doc_id, lang,
         |         CAST(('0x' || substr(md5(gram), 1, 8)) AS BIGINT) % 256 AS bucket,
         |         count(*) AS nf
         |  FROM grams GROUP BY 1, 2, 3),
         |dist AS (
         |  SELECT bucket,
         |         SUM(CASE WHEN lang = 'en' THEN nf ELSE 0 END) AS ct,
         |         SUM(nf) AS cr
         |  FROM feats GROUP BY 1),
         |tot AS (SELECT SUM(ct) AS nt, SUM(cr) AS nr FROM dist),
         |ratio AS (
         |  SELECT bucket,
         |         CAST(ROUND(CAST(ln(CAST(ct + 1 AS DOUBLE) / (nt + 256))
         |             AS DECIMAL(20,12)), 9) AS DECIMAL(26,12))
         |       - CAST(ROUND(CAST(ln(CAST(cr + 1 AS DOUBLE) / (nr + 256))
         |             AS DECIMAL(20,12)), 9) AS DECIMAL(26,12)) AS dln
         |  FROM dist CROSS JOIN tot),
         |wts AS (
         |  SELECT doc_id, CAST(SUM(nf) AS INT) AS n_feats,
         |         CAST(ROUND(CAST(CAST(SUM(CAST(nf AS DECIMAL(9,0)) * dln)
         |             AS DOUBLE) AS DECIMAL(38,10)), 6) AS DOUBLE) AS log_weight
         |  FROM feats JOIN ratio USING (bucket)
         |  GROUP BY doc_id),
         |keyed AS (
         |  SELECT doc_id, n_feats, log_weight,
         |         CAST(ROUND(CAST(CAST(log_weight AS DECIMAL(26,12))
         |           + CAST(ROUND(CAST(-ln(
         |               CAST(ROUND(CAST(-ln(
         |                 (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
         |                    || ':dsir'), 1, 8)) AS BIGINT) + 0.5)
         |                 / 4294967296.0) AS DECIMAL(20,12)), 9) AS DOUBLE))
         |             AS DECIMAL(20,12)), 9) AS DECIMAL(26,12))
         |           AS DECIMAL(38,10)), 6) AS DOUBLE) AS sample_key
         |  FROM wts),
         |ranked AS (
         |  SELECT doc_id, n_feats, log_weight, sample_key,
         |         CAST(ROW_NUMBER() OVER (ORDER BY sample_key DESC, doc_id ASC)
         |           AS INT) AS rnk
         |  FROM keyed)
         |SELECT doc_id, n_feats, log_weight, sample_key, rnk
         |FROM ranked WHERE rnk <= 200 ORDER BY rnk""".stripMargin,
    // PageRank twin: the SAME graph CTE, 5 unrolled power iterations —
    // every sum through DECIMAL(28,16), every iteration re-rounded to
    // 12 decimals, teleport/damping as the same parsed literals. The
    // iteration CTEs are AS MATERIALIZED (DuckDB-only syntax; this text
    // never runs on Spark): each pr$i references pr${i-1} three times,
    // and DuckDB's default CTE inlining would expand the kNN-graph
    // build 3^iters times — ~15 min where the materialized form is
    // 0.5 s at sf0.01.
    "graph_pagerank" -> {
      val iters = 5
      val iterCtes = (1 to iters).map { i =>
        val p = if (i == 1) "pr0" else s"pr${i - 1}"
        s"""d$i AS MATERIALIZED (
           |  SELECT coalesce(CAST(SUM(CAST(p.pr AS DECIMAL(28,16)))
           |           AS DOUBLE), 0.0) AS dang
           |  FROM $p p LEFT JOIN deg ON p.node = deg.src
           |  WHERE deg.src IS NULL),
           |s$i AS MATERIALIZED (
           |  SELECT e.dst AS node,
           |         CAST(SUM(CAST(p.pr / deg.deg AS DECIMAL(28,16)))
           |           AS DOUBLE) AS m
           |  FROM edges e JOIN $p p ON e.src = p.node
           |  JOIN deg ON e.src = deg.src
           |  GROUP BY 1),
           |pr$i AS MATERIALIZED (
           |  SELECT n.node,
           |         CAST(ROUND(CAST(0.15 * (SELECT invn FROM nn)
           |           + 0.85 * (coalesce(s.m, 0.0)
           |             + (SELECT dang FROM d$i) * (SELECT invn FROM nn))
           |           AS DECIMAL(28,16)), 12) AS DOUBLE) AS pr
           |  FROM nodes n LEFT JOIN s$i s ON n.node = s.node)""".stripMargin
      }.mkString(",\n")
      knnGraphCteSql +
        s""", edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM graph),
           |nodes AS MATERIALIZED (SELECT src AS node FROM edges
           |          UNION SELECT dst FROM edges),
           |nn AS (SELECT 1.0 / CAST(count(*) AS DOUBLE) AS invn FROM nodes),
           |deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
           |pr0 AS MATERIALIZED (SELECT node, (SELECT invn FROM nn) AS pr FROM nodes),
           |$iterCtes
           |SELECT node, CAST(ROUND(CAST(pr AS DECIMAL(28,16)), 9) AS DOUBLE)
           |         AS pr
           |FROM pr$iters ORDER BY pr DESC, node ASC""".stripMargin
    },
    // label-propagation twin: the SAME graph CTE symmetrized, 5
    // unrolled synchronous rounds — integer counts only, ROW_NUMBER
    // smallest-label tie-break, all iteration CTEs AS MATERIALIZED
    // (each references the previous round twice; default inlining
    // would expand the graph build exponentially, see graph_pagerank)
    "graph_label_prop" -> {
      val iters = 5
      val iterCtes = (1 to iters).map { i =>
        val p = if (i == 1) "lab0" else s"lab${i - 1}"
        s"""cnt$i AS MATERIALIZED (
           |  SELECT node, lab, count(*) AS c FROM (
           |    SELECT e.dst AS node, l.lab
           |    FROM edges e JOIN $p l ON e.src = l.node
           |    UNION ALL
           |    SELECT node, lab FROM $p) v
           |  GROUP BY 1, 2),
           |lab$i AS MATERIALIZED (
           |  SELECT n.node, coalesce(b.lab, p0.lab) AS lab
           |  FROM nodes n
           |  LEFT JOIN (SELECT node, lab FROM (
           |      SELECT node, lab, ROW_NUMBER() OVER (PARTITION BY node
           |        ORDER BY c DESC, lab ASC) AS rn FROM cnt$i) r
           |    WHERE rn = 1) b ON n.node = b.node
           |  JOIN $p p0 ON n.node = p0.node)""".stripMargin
      }.mkString(",\n")
      knnGraphCteSql +
        s""", dirx AS MATERIALIZED (SELECT src, dst FROM graph),
           |edges AS MATERIALIZED (
           |  SELECT src, dst FROM dirx
           |  UNION SELECT dst AS src, src AS dst FROM dirx),
           |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
           |lab0 AS MATERIALIZED (SELECT node, node AS lab FROM nodes),
           |$iterCtes
           |SELECT node, lab AS community FROM lab$iters ORDER BY node""".stripMargin
    },
    // k-core twin: the SAME graph CTE restricted to MUTUAL edges
    // (INTERSECT with its own transpose — already symmetric), 12
    // unrolled peel rounds (Spark fixpoints early and loud-fails past
    // 12; peeling is monotone so the oracle's post-convergence rounds
    // are no-ops) — AS MATERIALIZED against exponential inlining as in
    // the other graph twins
    "graph_kcore" -> {
      val rounds = 12
      val k = 2
      val peelCtes = (1 to rounds).map { i =>
        val p = s"e${i - 1}"
        s"""e$i AS MATERIALIZED (
           |  SELECT e.src, e.dst FROM $p e
           |  JOIN (SELECT src FROM $p GROUP BY src
           |        HAVING count(*) >= $k) a ON e.src = a.src
           |  JOIN (SELECT src FROM $p GROUP BY src
           |        HAVING count(*) >= $k) b ON e.dst = b.src)""".stripMargin
      }.mkString(",\n")
      knnGraphCteSql +
        s""", e0 AS MATERIALIZED (
           |  SELECT src, dst FROM graph
           |  INTERSECT
           |  SELECT dst AS src, src AS dst FROM graph),
           |$peelCtes
           |SELECT src AS node, CAST(count(*) AS INT) AS core_deg
           |FROM e$rounds GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // personalized-PageRank twin: the pagerank iteration scheme with
    // restart weight sw (1/|S∩V| on label-0 seeds, 0.0 elsewhere) in
    // place of the uniform 1/n — teleport AND dangling mass land on
    // the seeds; same DECIMAL(28,16) sums, per-round re-round, AS
    // MATERIALIZED iteration CTEs
    "graph_ppr" -> {
      val iters = 5
      val iterCtes = (1 to iters).map { i =>
        val p = if (i == 1) "pr0" else s"pr${i - 1}"
        s"""d$i AS MATERIALIZED (
           |  SELECT coalesce(CAST(SUM(CAST(p.pr AS DECIMAL(28,16)))
           |           AS DOUBLE), 0.0) AS dang
           |  FROM $p p LEFT JOIN deg ON p.node = deg.src
           |  WHERE deg.src IS NULL),
           |s$i AS MATERIALIZED (
           |  SELECT e.dst AS node,
           |         CAST(SUM(CAST(p.pr / deg.deg AS DECIMAL(28,16)))
           |           AS DOUBLE) AS m
           |  FROM edges e JOIN $p p ON e.src = p.node
           |  JOIN deg ON e.src = deg.src
           |  GROUP BY 1),
           |pr$i AS MATERIALIZED (
           |  SELECT n.node,
           |         CAST(ROUND(CAST((0.15 + 0.85 * (SELECT dang FROM d$i))
           |             * n.sw
           |           + 0.85 * coalesce(s.m, 0.0)
           |           AS DECIMAL(28,16)), 12) AS DOUBLE) AS pr
           |  FROM nodesw n LEFT JOIN s$i s ON n.node = s.node)""".stripMargin
      }.mkString(",\n")
      knnGraphCteSql +
        s""", edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM graph),
           |nodes AS MATERIALIZED (SELECT src AS node FROM edges
           |          UNION SELECT dst FROM edges),
           |seedsv AS MATERIALIZED (
           |  SELECT node FROM nodes WHERE node IN
           |    (SELECT vec_id FROM embeddings WHERE label = 0)),
           |ns AS (SELECT 1.0 / CAST(count(*) AS DOUBLE) AS invs
           |       FROM seedsv),
           |nodesw AS MATERIALIZED (
           |  SELECT n.node,
           |         CASE WHEN s.node IS NULL THEN CAST(0.0 AS DOUBLE)
           |              ELSE (SELECT invs FROM ns) END AS sw
           |  FROM nodes n LEFT JOIN seedsv s ON n.node = s.node),
           |deg AS MATERIALIZED (SELECT src, count(*) AS deg
           |                     FROM edges GROUP BY 1),
           |pr0 AS MATERIALIZED (SELECT node, sw AS pr FROM nodesw),
           |$iterCtes
           |SELECT node, CAST(ROUND(CAST(pr AS DECIMAL(28,16)), 9) AS DOUBLE)
           |         AS pr
           |FROM pr$iters ORDER BY pr DESC, node ASC""".stripMargin
    },
    // linkpred twin: mutual edges, center-wedge pairs, NOT EXISTS
    // edge removal, Jaccard in one double sequence
    "graph_linkpred" -> (knnGraphCteSql +
      """, sym AS MATERIALIZED (
        |  SELECT src, dst FROM graph
        |  INTERSECT
        |  SELECT dst AS src, src AS dst FROM graph),
        |deg AS MATERIALIZED (
        |  SELECT src, count(*) AS deg FROM sym GROUP BY 1),
        |-- mirror of the operator's maxCenterDeg = 256 hub cut
        |-- (LinkPred.commonNeighborPairs): centers above it emit no
        |-- wedges; true degrees still feed the score below. A no-op on
        |-- this mutual-kNN graph (deg <= 5) but kept in lock-step so
        |-- operator and oracle cannot drift on hubby graphs.
        |hubcut AS (
        |  SELECT s.src, s.dst FROM sym s
        |  JOIN deg d ON d.src = s.src AND d.deg <= 256),
        |w AS MATERIALIZED (
        |  SELECT e1.dst AS node_a, e2.dst AS node_b
        |  FROM hubcut e1 JOIN hubcut e2
        |    ON e1.src = e2.src AND e1.dst < e2.dst),
        |cn AS MATERIALIZED (
        |  SELECT node_a, node_b, count(*) AS common FROM w GROUP BY 1, 2),
        |cand AS (
        |  SELECT c.* FROM cn c
        |  WHERE NOT EXISTS (SELECT 1 FROM sym s
        |                    WHERE s.src = c.node_a AND s.dst = c.node_b))
        |SELECT c.node_a, c.node_b, c.common,
        |       da.deg AS deg_a, db.deg AS deg_b,
        |       CAST(ROUND(CAST(CAST(c.common AS DOUBLE)
        |         / CAST(da.deg + db.deg - c.common AS DOUBLE)
        |         AS DECIMAL(20,12)), 9) AS DOUBLE) AS score
        |FROM cand c
        |JOIN deg da ON da.src = c.node_a
        |JOIN deg db ON db.src = c.node_b
        |ORDER BY score DESC, node_a, node_b LIMIT 100""".stripMargin),
    // degree-distribution twin: same symmetrized-distinct edge set,
    // degree → histogram, 1-row mean riding a cross join
    "graph_degree_dist" -> (knnGraphCteSql +
      """, edges AS (SELECT src, dst FROM graph
        |            UNION SELECT dst AS src, src AS dst FROM graph),
        |deg AS (SELECT src AS node, count(*) AS degree FROM edges
        |        GROUP BY 1),
        |hist AS (SELECT degree, count(*) AS n_nodes FROM deg GROUP BY 1),
        |tot AS (SELECT CAST(SUM(degree * n_nodes) AS BIGINT) AS sum_deg,
        |               CAST(SUM(n_nodes) AS BIGINT) AS n FROM hist)
        |SELECT degree, n_nodes,
        |       CAST(ROUND(CAST(CAST(sum_deg AS DOUBLE) / CAST(n AS DOUBLE)
        |         AS DECIMAL(20,12)), 9) AS DOUBLE) AS mean_degree
        |FROM hist CROSS JOIN tot ORDER BY degree""".stripMargin),
    // triangles twin: the SAME mutual restriction, the SAME (deg, id)
    // orientation, the same single-division double coefficient
    "graph_triangles" -> (knnGraphCteSql +
      s""", sym AS MATERIALIZED (
         |  SELECT src, dst FROM graph
         |  INTERSECT
         |  SELECT dst AS src, src AS dst FROM graph),
         |deg AS MATERIALIZED (
         |  SELECT src, count(*) AS deg FROM sym GROUP BY 1),
         |oriented AS MATERIALIZED (
         |  SELECT s.src, s.dst FROM sym s
         |  JOIN deg d1 ON s.src = d1.src
         |  JOIN deg d2 ON s.dst = d2.src
         |  WHERE d1.deg < d2.deg
         |     OR (d1.deg = d2.deg AND s.src < s.dst)),
         |tri AS MATERIALIZED (
         |  SELECT ab.src AS a, ab.dst AS b, bc.dst AS c
         |  FROM oriented ab
         |  JOIN oriented bc ON ab.dst = bc.src
         |  JOIN oriented ac ON ab.src = ac.src AND bc.dst = ac.dst),
         |pern AS MATERIALIZED (
         |  SELECT node, count(*) AS t FROM (
         |    SELECT a AS node FROM tri
         |    UNION ALL SELECT b FROM tri
         |    UNION ALL SELECT c FROM tri) u
         |  GROUP BY 1)
         |SELECT d.src AS node, d.deg AS degree,
         |       coalesce(p.t, 0) AS triangles,
         |       CASE WHEN d.deg >= 2
         |            THEN CAST(coalesce(p.t, 0) * 2 AS DOUBLE)
         |                 / CAST(d.deg * (d.deg - 1) AS DOUBLE)
         |            ELSE CAST(0.0 AS DOUBLE) END AS clustering_coeff
         |FROM deg d LEFT JOIN pern p ON d.src = p.node
         |ORDER BY node""".stripMargin),
    // margin twin: the SAME graph CTE, per-vector mean neighbor cosine
    // through an order-free DECIMAL sum, one double division per side
    "search_margin" -> (knnGraphCteSql +
      s""", stats AS (
         |  SELECT src AS vid,
         |         CAST(SUM(CAST(sim AS DECIMAL(20,12))) AS DOUBLE)
         |           / COUNT(*) AS avgk
         |  FROM graph GROUP BY 1)
         |SELECT g.src, g.dst, g.sim,
         |       CAST(ROUND(CAST(g.sim / ((a.avgk + b.avgk) / 2)
         |                       AS DECIMAL(20,12)), 9) AS DOUBLE) AS margin
         |FROM graph g
         |JOIN stats a ON a.vid = g.src
         |JOIN stats b ON b.vid = g.dst
         |WHERE a.avgk > 0.01 AND b.avgk > 0.01
         |ORDER BY margin DESC, src, dst""".stripMargin),
    // proto-prune twin: the ann_ivf argmax assignment, centroid-cosine
    // re-score, integer drop boundary floor(0.25·n)
    "dd_proto_prune" ->
      s"""WITH ${trainedCentsChain("centroid_id")},
         |assigned AS (
         |  SELECT vec_id, embedding, centroid_id FROM (
         |    SELECT e.vec_id, e.embedding, c.centroid_id,
         |           ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${cosSql("e.embedding", "c.cvec")} DESC,
         |                      c.centroid_id ASC) AS rn
         |    FROM embeddings e CROSS JOIN cents c) r
         |  WHERE rn = 1),
         |scored AS (
         |  SELECT a.vec_id, a.centroid_id,
         |         ${cosSql("a.embedding", "c.cvec")} AS proto
         |  FROM assigned a JOIN cents c USING (centroid_id)),
         |counts AS (SELECT centroid_id, count(*) AS n FROM scored GROUP BY 1)
         |SELECT vec_id, CAST(centroid_id AS BIGINT) AS centroid_id, proto,
         |       CAST(rn2 AS INT) AS cell_rank,
         |       rn2 <= CAST(floor(0.25 * n) AS BIGINT) AS dropped
         |FROM (SELECT s.vec_id, s.centroid_id, s.proto, c.n,
         |             ROW_NUMBER() OVER (PARTITION BY s.centroid_id
         |               ORDER BY s.proto DESC, s.vec_id ASC) AS rn2
         |      FROM scored s JOIN counts c USING (centroid_id)) g
         |ORDER BY vec_id""".stripMargin,
    // mirrors semDedup: the assigned CTE is ann_ivf's argmax assignment,
    // the cap is dd_embed_cos' deterministic row_number guard
    "dd_semdedup" ->
      s"""WITH ${trainedCentsChain("centroid_id")},
         |assigned AS (
         |  SELECT vec_id, embedding, centroid_id FROM (
         |    SELECT e.vec_id, e.embedding, c.centroid_id,
         |           ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${cosSql("e.embedding", "c.cvec")} DESC, c.centroid_id ASC) AS rn
         |    FROM embeddings e CROSS JOIN cents c) r
         |  WHERE rn = 1),
         |capped AS (
         |  SELECT vec_id, embedding, centroid_id FROM (
         |    SELECT vec_id, embedding, centroid_id,
         |           ROW_NUMBER() OVER (PARTITION BY centroid_id ORDER BY vec_id) AS rn
         |    FROM assigned) r
         |  WHERE rn <= 256)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.centroid_id,
         |       ${cosSql("a.embedding", "b.embedding")} AS sim
         |FROM capped a JOIN capped b USING (centroid_id)
         |WHERE a.vec_id < b.vec_id
         |  AND ${cosSql("a.embedding", "b.embedding")} >= 0.25
         |ORDER BY vec_a, vec_b""".stripMargin,
    "dd_simhash" -> (simhashFpsCtes +
      "SELECT doc_id, simhash FROM fps ORDER BY doc_id"),
    // pigeonhole band blocking (maxDist+1 bands, full recall) over the
    // same fingerprints; the engine dedups band meetings with the
    // highest-matching-band filter, the oracle with DISTINCT —
    // identical result sets. Band constants come from the SAME
    // Dedup.simhashBands layout the engine blocks with.
    "dd_simhash_pairs" -> {
      val bandSelects = Dedup.simhashBands(8).map { case (i, start, mask) =>
        s"SELECT doc_id, simhash, $i AS band, (simhash >> $start) & $mask AS bucket FROM fps"
      }.mkString("\n  UNION ALL ")
      simhashFpsCtes +
        s""", bands AS (
           |  $bandSelects)
           |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
           |FROM bands a JOIN bands b USING (band, bucket)
           |WHERE a.doc_id < b.doc_id
           |  AND bit_count(xor(a.simhash, b.simhash)) <= 8
           |ORDER BY doc_a, doc_b""".stripMargin
    })

  /** DuckDB twin of [[Dedup.simhash]], ending in
    * `fps(doc_id, simhash BIGINT)` — shared by the fingerprint and pair
    * oracles.
    */
  private def simhashFpsCtes: String = {
    val votes = (0 until 64).map { b =>
      s"SUM(CASE WHEN (('0x' || substr(h, ${b / 4 + 1}, 1))::INT >> ${b % 4}) & 1 = 1 THEN 1 ELSE -1 END) AS v_$b"
    }.mkString(",\n         ")
    // bit 63 can't be built as 1<<63 (DuckDB checks shift overflow);
    // the bits are disjoint so arithmetic sum == bitwise OR
    val fp = (0 until 64).map { b =>
      val term = if (b == 63) "(-9223372036854775807 - 1)" else s"(1::BIGINT << $b)"
      s"CASE WHEN v_$b > 0 THEN $term ELSE 0 END"
    }.mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS token
       |  FROM documents),
       |hsh AS (SELECT doc_id, md5(token) AS h FROM tok),
       |votes AS (
       |  SELECT doc_id,
       |         $votes
       |  FROM hsh GROUP BY doc_id),
       |fps AS (SELECT doc_id, CAST($fp AS BIGINT) AS simhash FROM votes)
       |""".stripMargin
  }
}
