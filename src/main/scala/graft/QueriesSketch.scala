package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.llm.{Drift, Sketches, TextStats}

/** Portable-sketch operators as driver queries ([[graft.llm.Sketches]]):
  * KMV distinct-count, Count-Min heavy-hitter counts, a Bloom seen-key
  * gate, and binned quantile estimates. Unusually for sketches, every
  * query here is HASH-checked against DuckDB — the sketches are defined
  * over the portable md5-prefix hash, so the oracle reproduces the
  * sketch arithmetic itself (estimates, collision overcounts, membership
  * verdicts), not just an exact companion answer. Each query pairs the
  * sketch with its exact evaluation arm (true distinct / true counts /
  * true membership / true quantile): the arm is the grading harness, and
  * at production scale only the sketch side runs.
  */
object QueriesSketch {

  import Queries.Q

  val KmvK = 256
  val HllP = 8
  val OverlapK = 256
  val CmsDepth = 4
  val CmsWidth = 256
  val CmsProbes = 12
  val BloomHashes = 6
  val BloomBits = 2048
  val QBins = 64
  val Quantiles: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9, 0.99)
  val SampleK = 5
  val HistLo = 0.0
  val HistHi = 4000.0
  val HistBins = 40

  /** Word bigrams of `text` as an array (lowercased, whitespace
    * tokenization shared with the vocab/TF-IDF kernels); < 2 tokens →
    * empty. Column algebra only — explode stays codegen-adjacent.
    */
  private def bigrams(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val t = TextStats.tokens(lower(text))
    when(size(t) < 2, array().cast("array<string>"))
      .otherwise(zip_with(
        slice(t, lit(1), size(t) - 1),
        slice(t, lit(2), size(t) - 1),
        (a, b) => concat(a, lit(" "), b)))
  }

  /** q_kmv_distinct — per-group distinct-count estimation (KMV, k=256)
    * of `l_orderkey` by `l_returnflag`, graded against the exact
    * distinct count: (grp, est_distinct, exact_distinct, rel_err). The
    * sketch arm shuffles only (group, 60-bit hash) pairs; the exact arm
    * is the evaluation harness.
    */
  val qKmvDistinct: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    val est = Sketches.kmvDistinct(li, col("l_returnflag"), col("l_orderkey"), KmvK)
    val ex = li.groupBy(col("l_returnflag").as("grp"))
      .agg(countDistinct("l_orderkey").as("exact_distinct"))
    est.join(ex, "grp")
      .select(col("grp"), col("est_distinct"), col("exact_distinct"),
        round(abs(col("est_distinct") - col("exact_distinct").cast("double")) /
          col("exact_distinct").cast("double"), 4).as("rel_err"))
      .orderBy("grp")
  }

  val qKmvDistinctSql: String =
    s"""WITH vals AS (
      |  SELECT DISTINCT l_returnflag AS grp,
      |    ('0x' || substr(md5(l_orderkey::VARCHAR), 1, 15))::BIGINT AS h
      |  FROM lineitem),
      |ranked AS (
      |  SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rk,
      |    count(*) OVER (PARTITION BY grp) AS n_d
      |  FROM vals),
      |kth AS (SELECT grp, h, n_d FROM ranked WHERE rk = LEAST($KmvK, n_d)),
      |ex AS (SELECT l_returnflag AS grp, count(DISTINCT l_orderkey) AS exact_distinct
      |       FROM lineitem GROUP BY 1),
      |est AS (
      |  SELECT grp,
      |    CASE WHEN n_d < $KmvK THEN n_d::DOUBLE
      |         ELSE round(${KmvK - 1}.0 / (h::DOUBLE / 1152921504606846976.0), 3)
      |    END AS est_distinct
      |  FROM kth)
      |SELECT e.grp, e.est_distinct, x.exact_distinct,
      |  round(abs(e.est_distinct - x.exact_distinct::DOUBLE)
      |    / x.exact_distinct::DOUBLE, 4) AS rel_err
      |FROM est e JOIN ex x USING (grp) ORDER BY grp""".stripMargin

  /** q_hll_distinct — the register-based twin of q_kmv_distinct:
    * HyperLogLog (p=8 → 256 registers) distinct customers per order
    * priority, graded against the exact count: (grp, est_distinct,
    * exact_distinct, rel_err). The sketch arm reduces the scan to ≤ 256
    * (register, max-rank) rows per group via one map-side-combined
    * aggregation; the harmonic mean runs in exact integer arithmetic so
    * the oracle pins the estimate bit-for-bit (see
    * [[graft.llm.Sketches.hllFromRegisters]]).
    */
  val qHllDistinct: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    val est = Sketches.hllDistinct(o, col("o_orderpriority"), col("o_custkey"), HllP)
    val ex = o.groupBy(col("o_orderpriority").as("grp"))
      .agg(countDistinct("o_custkey").as("exact_distinct"))
    est.join(ex, "grp")
      .select(col("grp"), col("est_distinct"), col("exact_distinct"),
        round(abs(col("est_distinct") - col("exact_distinct").cast("double")) /
          col("exact_distinct").cast("double"), 4).as("rel_err"))
      .orderBy("grp")
  }

  val qHllDistinctSql: String = {
    val sb = 60 - HllP
    val m = 1 << HllP
    val num = Sketches.hllNumerator(HllP)
    s"""WITH h AS (
      |  SELECT o_orderpriority AS grp,
      |    ('0x' || substr(md5(o_custkey::VARCHAR), 1, 15))::BIGINT AS h
      |  FROM orders),
      |regs AS (
      |  SELECT grp, h >> $sb AS reg,
      |    CASE WHEN h % ${1L << sb} = 0 THEN ${sb + 1}
      |         ELSE ${sb + 1} - length(ltrim(bin(h % ${1L << sb}), '0'))
      |    END AS rho
      |  FROM h),
      |mx AS (SELECT grp, reg, max(rho) AS mx FROM regs GROUP BY 1, 2),
      |agg AS (
      |  SELECT grp,
      |    (sum(1::BIGINT << (${sb + 1} - mx))
      |      + ($m - count(*)) * ${1L << (sb + 1)})::BIGINT AS s,
      |    $m - count(*) AS v
      |  FROM mx GROUP BY 1),
      |est AS (
      |  SELECT grp,
      |    CASE WHEN $num / s::DOUBLE <= ${2.5 * m} AND v > 0
      |         THEN round($m.0 * ln($m.0 / v::DOUBLE), 3)
      |         ELSE round($num / s::DOUBLE, 3) END AS est_distinct
      |  FROM agg),
      |ex AS (SELECT o_orderpriority AS grp, count(DISTINCT o_custkey) AS exact_distinct
      |       FROM orders GROUP BY 1)
      |SELECT e.grp, e.est_distinct, x.exact_distinct,
      |  round(abs(e.est_distinct - x.exact_distinct::DOUBLE)
      |    / x.exact_distinct::DOUBLE, 4) AS rel_err
      |FROM est e JOIN ex x USING (grp) ORDER BY grp""".stripMargin
  }

  /** q_kmv_overlap — pairwise vocabulary overlap between the 20 document
    * sources FROM THEIR KMV SKETCHES (k=256 over distinct word tokens),
    * graded against the exact Jaccard: (src_a, src_b, est_jaccard,
    * exact_jaccard, abs_err), one row per unordered pair. The corpus is
    * scanned once to build 20 sketches of ≤ k hashes; the 190-pair
    * overlap matrix then costs pairs × k regardless of corpus size —
    * the way source-similarity dashboards stay affordable at 100 TB.
    * The exact arm (distinct token-source self-join) is the evaluation
    * harness.
    */
  val qKmvOverlap: Q = (s, dir) => {
    val st = Tables.documents(s, dir)
      .select(col("source"), explode(TextStats.tokens(lower(col("text")))).as("tok"))
      .distinct()
    val sk = Sketches.kmvHashes(st, col("source"), col("tok"), OverlapK)
    val est = Sketches.kmvOverlap(sk, OverlapK)
    val sizes = st.groupBy("source").agg(count(lit(1)).as("n"))
    val inter = st.as("a").join(st.as("b"),
        col("a.tok") === col("b.tok") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("i"))
    est
      .join(sizes.select(col("source").as("src_a"), col("n").as("na")), "src_a")
      .join(sizes.select(col("source").as("src_b"), col("n").as("nb")), "src_b")
      .join(inter, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"), col("est_jaccard"),
        round(coalesce(col("i"), lit(0L)).cast("double") /
          (col("na") + col("nb") - coalesce(col("i"), lit(0L))).cast("double"), 4)
          .as("exact_jaccard"))
      .withColumn("abs_err", round(abs(col("est_jaccard") - col("exact_jaccard")), 4))
      .orderBy("src_a", "src_b")
  }

  val qKmvOverlapSql: String =
    s"""WITH st AS (
      |  SELECT DISTINCT source, tok
      |  FROM (SELECT source,
      |          unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
      |            x -> len(x) > 0)) AS tok
      |        FROM documents WHERE length(trim(text)) > 0)),
      |hs AS (SELECT DISTINCT source AS grp,
      |         ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
      |       FROM st),
      |sk AS (SELECT grp, h FROM (
      |         SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rk
      |         FROM hs) WHERE rk <= $OverlapK),
      |pairs AS (
      |  SELECT a.grp AS src_a, b.grp AS src_b
      |  FROM (SELECT DISTINCT grp FROM hs) a
      |  JOIN (SELECT DISTINCT grp FROM hs) b ON a.grp < b.grp),
      |u AS (
      |  SELECT p.src_a, p.src_b, s.h,
      |    max(CASE WHEN s.grp = p.src_a THEN 1 ELSE 0 END) AS in_a,
      |    max(CASE WHEN s.grp = p.src_b THEN 1 ELSE 0 END) AS in_b
      |  FROM pairs p JOIN sk s ON s.grp IN (p.src_a, p.src_b)
      |  GROUP BY 1, 2, 3),
      |ur AS (SELECT *, row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rk
      |       FROM u),
      |est AS (
      |  SELECT src_a, src_b,
      |    round(sum(in_a * in_b)::DOUBLE / count(*)::DOUBLE, 4) AS est_jaccard
      |  FROM ur WHERE rk <= $OverlapK GROUP BY 1, 2),
      |sizes AS (SELECT source, count(*) AS n FROM st GROUP BY 1),
      |inter AS (
      |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS i
      |  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
      |  GROUP BY 1, 2),
      |ex AS (
      |  SELECT p.src_a, p.src_b,
      |    round(COALESCE(i.i, 0)::DOUBLE
      |      / (sa.n + sb.n - COALESCE(i.i, 0))::DOUBLE, 4) AS exact_jaccard
      |  FROM pairs p
      |  JOIN sizes sa ON sa.source = p.src_a
      |  JOIN sizes sb ON sb.source = p.src_b
      |  LEFT JOIN inter i ON i.src_a = p.src_a AND i.src_b = p.src_b)
      |SELECT e.src_a, e.src_b, e.est_jaccard, x.exact_jaccard,
      |  round(abs(e.est_jaccard - x.exact_jaccard), 4) AS abs_err
      |FROM est e JOIN ex x USING (src_a, src_b) ORDER BY src_a, src_b""".stripMargin

  /** q_consistent_sample — deterministic bottom-k-by-hash holdout
    * ([[graft.llm.Sketches.bottomKSample]], k=5 per source): the eval
    * rows are a pure function of doc_id, so the IDENTICAL sample comes
    * back from any engine, partitioning, or rerun, shards fold (global
    * bottom-k = bottom-k of shard bottom-ks), and membership is sticky
    * as the corpus grows — reproducible holdouts with no persisted
    * sample list. The oracle reproduces the hash rank directly.
    */
  val qConsistentSample: Q = (s, dir) => {
    val d = Tables.documents(s, dir)
    Sketches.bottomKSample(d, col("source"), col("doc_id"), SampleK)
      .select(col("source"), col("doc_id"), col("lang"))
      .orderBy("source", "doc_id")
  }

  val qConsistentSampleSql: String =
    s"""WITH ranked AS (
      |  SELECT source, doc_id, lang,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT,
      |        doc_id::VARCHAR) AS rk
      |  FROM documents)
      |SELECT source, doc_id, lang FROM ranked WHERE rk <= $SampleK
      |ORDER BY source, doc_id""".stripMargin

  /** q_sketch_drift — snapshot-over-snapshot content drift per language
    * computed FROM PERSISTED SKETCHES: snapshot B is the q_merge_upsert
    * change feed applied to `documents` (≈10% of ids deleted, ≈10%
    * rewritten, ≈10% re-inserted under new ids), each snapshot is
    * reduced once to its ≤ k-hash KMV content sketch per lang, and the
    * drift report — distinct-content estimates for both snapshots plus
    * their Jaccard ([[graft.llm.Sketches.kmvJaccardAcross]]) — folds
    * sketches only. Output: (grp, est_distinct_a, est_distinct_b,
    * est_jaccard, exact_jaccard, abs_err); the exact arm (distinct
    * content-hash sets joined per lang) is the evaluation harness — at
    * production scale only the sketch fold runs, against sketches the
    * ingest of each snapshot already persisted.
    */
  val qSketchDrift: Q = (s, dir) => {
    val a = Tables.documents(s, dir)
    val deletes = a.where(pmod(col("doc_id"), lit(10)) === 0)
      .withColumn("op", lit("delete"))
    val updates = a.where(pmod(col("doc_id"), lit(10)) === 1)
      .withColumn("text", concat(lit("updated "), col("text")))
      .withColumn("op", lit("upsert"))
    val inserts = a.where(pmod(col("doc_id"), lit(10)) === 2)
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .withColumn("op", lit("upsert"))
    val b = graft.llm.Snapshot.applyChanges(
      a, deletes.unionByName(updates).unionByName(inserts), "doc_id", "op")
    val skA = Sketches.kmvHashes(a, col("lang"), col("text"), KmvK)
    val skB = Sketches.kmvHashes(b, col("lang"), col("text"), KmvK)
    val estA = Sketches.kmvFromHashes(skA, KmvK)
      .withColumnRenamed("est_distinct", "est_distinct_a")
    val estB = Sketches.kmvFromHashes(skB, KmvK)
      .withColumnRenamed("est_distinct", "est_distinct_b")
    val est = Sketches.kmvJaccardAcross(skA, skB, KmvK)
    // exact arm over the same distinct content-hash sets (identical md5
    // collisions on both engines, so hash sets and text sets agree)
    val da = a.select(col("lang").cast("string").as("grp"),
      Sketches.h60(col("text")).as("h")).distinct()
    val db = b.select(col("lang").cast("string").as("grp"),
      Sketches.h60(col("text")).as("h")).distinct()
    val na = da.groupBy("grp").agg(count(lit(1)).as("na"))
    val nb = db.groupBy("grp").agg(count(lit(1)).as("nb"))
    val ii = da.join(db, Seq("grp", "h")).groupBy("grp").agg(count(lit(1)).as("i"))
    val exact = na.join(nb, "grp").join(ii, Seq("grp"), "left")
      .select(col("grp"),
        round(coalesce(col("i"), lit(0L)).cast("double") /
          (col("na") + col("nb") - coalesce(col("i"), lit(0L))).cast("double"), 4)
          .as("exact_jaccard"))
    estA.join(estB, "grp").join(est, "grp").join(exact, "grp")
      .select(col("grp"), col("est_distinct_a"), col("est_distinct_b"),
        col("est_jaccard"), col("exact_jaccard"),
        round(abs(col("est_jaccard") - col("exact_jaccard")), 4).as("abs_err"))
      .orderBy("grp")
  }

  val qSketchDriftSql: String =
    s"""WITH changes AS (
      |  SELECT doc_id, 'delete' AS op, text, lang FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id, 'upsert', 'updated ' || text, lang FROM documents WHERE doc_id % 10 = 1
      |  UNION ALL
      |  SELECT doc_id + 1000000, 'upsert', text, lang FROM documents WHERE doc_id % 10 = 2),
      |merged AS (
      |  SELECT d.lang, d.text FROM documents d
      |  LEFT JOIN (SELECT DISTINCT doc_id FROM changes) c USING (doc_id)
      |  WHERE c.doc_id IS NULL
      |  UNION ALL
      |  SELECT lang, text FROM changes WHERE op = 'upsert'),
      |da AS (SELECT DISTINCT lang AS grp,
      |         ('0x' || substr(md5(text), 1, 15))::BIGINT AS h FROM documents),
      |db AS (SELECT DISTINCT lang AS grp,
      |         ('0x' || substr(md5(text), 1, 15))::BIGINT AS h FROM merged),
      |ska AS (SELECT grp, h FROM (
      |          SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rk
      |          FROM da) WHERE rk <= $KmvK),
      |skb AS (SELECT grp, h FROM (
      |          SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rk
      |          FROM db) WHERE rk <= $KmvK),
      |esta AS (
      |  SELECT grp,
      |    CASE WHEN n_d < $KmvK THEN n_d::DOUBLE
      |         ELSE round(${KmvK - 1}.0 / (h::DOUBLE / 1152921504606846976.0), 3)
      |    END AS est_distinct_a
      |  FROM (SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rk,
      |          count(*) OVER (PARTITION BY grp) AS n_d FROM ska)
      |  WHERE rk = LEAST($KmvK, n_d)),
      |estb AS (
      |  SELECT grp,
      |    CASE WHEN n_d < $KmvK THEN n_d::DOUBLE
      |         ELSE round(${KmvK - 1}.0 / (h::DOUBLE / 1152921504606846976.0), 3)
      |    END AS est_distinct_b
      |  FROM (SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rk,
      |          count(*) OVER (PARTITION BY grp) AS n_d FROM skb)
      |  WHERE rk = LEAST($KmvK, n_d)),
      |u AS (
      |  SELECT grp, h,
      |    max(in_a) AS in_a, max(in_b) AS in_b
      |  FROM (SELECT grp, h, 1 AS in_a, 0 AS in_b FROM ska
      |        UNION ALL
      |        SELECT grp, h, 0, 1 FROM skb)
      |  GROUP BY 1, 2),
      |est AS (
      |  SELECT grp,
      |    round(sum(in_a * in_b)::DOUBLE / count(*)::DOUBLE, 4) AS est_jaccard
      |  FROM (SELECT *, row_number() OVER (PARTITION BY grp ORDER BY h) AS rk FROM u)
      |  WHERE rk <= $KmvK GROUP BY 1),
      |ex AS (
      |  SELECT na.grp,
      |    round(COALESCE(ii.i, 0)::DOUBLE
      |      / (na.na + nb.nb - COALESCE(ii.i, 0))::DOUBLE, 4) AS exact_jaccard
      |  FROM (SELECT grp, count(*) AS na FROM da GROUP BY 1) na
      |  JOIN (SELECT grp, count(*) AS nb FROM db GROUP BY 1) nb USING (grp)
      |  LEFT JOIN (SELECT a.grp, count(*) AS i FROM da a
      |             JOIN db b ON a.grp = b.grp AND a.h = b.h GROUP BY 1) ii
      |    USING (grp))
      |SELECT a.grp, a.est_distinct_a, b.est_distinct_b, e.est_jaccard,
      |  x.exact_jaccard,
      |  round(abs(e.est_jaccard - x.exact_jaccard), 4) AS abs_err
      |FROM esta a JOIN estb b USING (grp) JOIN est e USING (grp)
      |JOIN ex x USING (grp) ORDER BY grp""".stripMargin

  /** q_hist_drift — distribution-shift gate over HISTOGRAM SKETCHES
    * ([[graft.llm.Drift.psiFromBins]]): the n_chars histogram of the
    * q_sketch_drift snapshots (B = A with ≈10% of ids deleted, ≈10%
    * rewritten +8 chars, ≈10% re-inserted) on a pinned [0, 4000)×40
    * grid, compared by Laplace-smoothed PSI. Each corpus is reduced
    * ONCE to ≤ 40 bin counts; the PSI is arithmetic over 80 integers —
    * the shape of a per-ingest drift check at 100 TB, where the
    * reference histogram is a persisted artifact and only the delta
    * snapshot is ever scanned. Output: one row per bin with both
    * counts, smoothed shares, the bin's term, and the grid PSI.
    */
  val qHistDrift: Q = (s, dir) => {
    val a = Tables.documents(s, dir)
    val deletes = a.where(pmod(col("doc_id"), lit(10)) === 0)
      .withColumn("op", lit("delete"))
    val updates = a.where(pmod(col("doc_id"), lit(10)) === 1)
      .withColumn("n_chars", col("n_chars") + 8)
      .withColumn("op", lit("upsert"))
    val inserts = a.where(pmod(col("doc_id"), lit(10)) === 2)
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .withColumn("op", lit("upsert"))
    val b = graft.llm.Snapshot.applyChanges(
      a, deletes.unionByName(updates).unionByName(inserts), "doc_id", "op")
    val refBins = Sketches.fixedBins(a, col("n_chars"), HistLo, HistHi, HistBins)
    val liveBins = Sketches.fixedBins(b, col("n_chars"), HistLo, HistHi, HistBins)
    Drift.psiFromBins(refBins, liveBins, HistBins).orderBy("bin")
  }

  val qHistDriftSql: String = {
    val top = HistBins - 1
    val smooth = 0.5 * HistBins
    val w = (HistHi - HistLo) / HistBins
    s"""WITH changes AS (
      |  SELECT doc_id, 'delete' AS op, n_chars FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id, 'upsert', n_chars + 8 FROM documents WHERE doc_id % 10 = 1
      |  UNION ALL
      |  SELECT doc_id + 1000000, 'upsert', n_chars FROM documents WHERE doc_id % 10 = 2),
      |merged AS (
      |  SELECT d.n_chars FROM documents d
      |  LEFT JOIN (SELECT DISTINCT doc_id FROM changes) c USING (doc_id)
      |  WHERE c.doc_id IS NULL
      |  UNION ALL
      |  SELECT n_chars FROM changes WHERE op = 'upsert'),
      |rb AS (SELECT GREATEST(0, LEAST($top, floor((n_chars - $HistLo) / $w)))::BIGINT AS bin,
      |         count(*) AS cnt FROM documents GROUP BY 1),
      |lb AS (SELECT GREATEST(0, LEAST($top, floor((n_chars - $HistLo) / $w)))::BIGINT AS bin,
      |         count(*) AS cnt FROM merged GROUP BY 1),
      |grid AS (SELECT bin FROM range(0, $HistBins) t(bin)),
      |nr AS (SELECT COALESCE(sum(cnt), 0) AS n_ref FROM rb),
      |nl AS (SELECT COALESCE(sum(cnt), 0) AS n_live FROM lb),
      |j AS (
      |  SELECT g.bin, COALESCE(rb.cnt, 0) AS cnt_ref, COALESCE(lb.cnt, 0) AS cnt_live,
      |    (COALESCE(lb.cnt, 0) + 0.5) / (nl.n_live + $smooth) AS p,
      |    (COALESCE(rb.cnt, 0) + 0.5) / (nr.n_ref + $smooth) AS q
      |  FROM grid g LEFT JOIN rb USING (bin) LEFT JOIN lb USING (bin), nr, nl),
      |t AS (SELECT *, round((p - q) * ln(p / q), 6) AS term FROM j),
      |tot AS (SELECT round(sum(term), 4) AS psi FROM t)
      |SELECT bin, cnt_ref, cnt_live, round(p, 6) AS p, round(q, 6) AS q, term, psi
      |FROM t, tot ORDER BY bin""".stripMargin
  }

  /** q_cms_heavy — Count-Min sketch (d=4, w=256) over the corpus word-
    * bigram stream (916 distinct grams at sf0.01 → real collisions),
    * probed at the 12 most frequent grams: (rk, gram, true_cnt, est_cnt,
    * overcount). overcount ≥ 0 always — CMS only overcounts — and the
    * oracle pins the exact collision arithmetic. The cell build is the
    * streaming shape: explode ×4 then ONE map-side-combined groupBy to
    * ≤ d·w rows; the exact top-12 is the evaluation arm.
    */
  val qCmsHeavy: Q = (s, dir) => {
    val grams = Tables.documents(s, dir)
      .select(explode(bigrams(col("text"))).as("gram"))
    val counts = grams.groupBy("gram").agg(count(lit(1)).as("true_cnt"))
    // the eval arm materializes exact counts anyway, so the cells fold
    // them (depth hashes per DISTINCT gram, not per occurrence); a
    // counts-free stream would use cmsCells instead
    val cells = Sketches.cmsCellsFromCounts(counts, col("gram"),
      col("true_cnt"), CmsDepth, CmsWidth)
    val probes = counts
      .orderBy(col("true_cnt").desc, col("gram")).limit(CmsProbes)
      // rank over the ≤ 12 post-limit rows (driver-bounded, not data-sized)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("true_cnt").desc, col("gram")))
          .cast("long"))
    Sketches.cmsEstimate(probes, col("gram"), cells, CmsDepth, CmsWidth)
      .select(col("rk"), col("gram"), col("true_cnt"), col("est_cnt"),
        (col("est_cnt") - col("true_cnt")).as("overcount"))
      .orderBy("rk")
  }

  val qCmsHeavySql: String =
    s"""WITH toks AS (
      |  SELECT list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
      |    x -> len(x) > 0) AS t
      |  FROM documents WHERE length(trim(text)) > 0),
      |bg AS (
      |  SELECT t[i] || ' ' || t[i+1] AS gram
      |  FROM (SELECT t, unnest(range(1, len(t))) AS i FROM toks WHERE len(t) >= 2)),
      |seeds AS (SELECT unnest(range($CmsDepth)) AS seed),
      |cells AS (
      |  SELECT seed,
      |    ('0x' || substr(md5(seed::VARCHAR || ':' || gram), 1, 15))::BIGINT % $CmsWidth AS bucket,
      |    count(*) AS total
      |  FROM bg CROSS JOIN seeds GROUP BY 1, 2),
      |truth AS (SELECT gram, count(*) AS true_cnt FROM bg GROUP BY gram),
      |probes AS (
      |  SELECT gram, true_cnt, row_number() OVER (ORDER BY true_cnt DESC, gram) AS rk
      |  FROM truth ORDER BY true_cnt DESC, gram LIMIT $CmsProbes),
      |est AS (
      |  SELECT p.rk, p.gram, p.true_cnt, min(c.total) AS est_cnt
      |  FROM probes p CROSS JOIN seeds s
      |  JOIN cells c ON c.seed = s.seed
      |    AND c.bucket = ('0x' || substr(md5(s.seed::VARCHAR || ':' || p.gram), 1, 15))::BIGINT % $CmsWidth
      |  GROUP BY 1, 2, 3)
      |SELECT rk, gram, true_cnt, est_cnt, est_cnt - true_cnt AS overcount
      |FROM est ORDER BY rk""".stripMargin

  /** q_bloom_gate — the seen-URL gate of an incremental crawl, with the
    * sketch's own verdicts under test: a Bloom filter (m=2048, k=6) is
    * built over the previously-ingested keys (docs with doc_id % 4 ≠ 0)
    * and probed with EVERY key; per language: probe count, true
    * membership, Bloom hits, false positives (the re-fetch cost of the
    * gate) and false negatives (pinned at zero — the Bloom guarantee).
    * Truth is by construction (doc_id % 4), so the only joins are the
    * broadcast of the ≤ m-row bit relation.
    */
  val qBloomGate: Q = (s, dir) => {
    val docs = Tables.documents(s, dir).select(
      col("doc_id"), col("lang"),
      concat(col("source"), lit("/"), col("doc_id").cast("string")).as("url"))
    val build = docs.where(col("doc_id") % 4 =!= 0)
    val bits = Sketches.bloomBits(build, col("url"), BloomHashes, BloomBits)
    Sketches.bloomProbe(docs, col("url"), bits, BloomHashes, BloomBits)
      .withColumn("seen", col("doc_id") % 4 =!= 0)
      .groupBy("lang").agg(
        count(lit(1)).as("probes"),
        sum(when(col("seen"), 1L).otherwise(0L)).as("true_seen"),
        sum(when(col("bloom_hit"), 1L).otherwise(0L)).as("bloom_hits"),
        sum(when(col("bloom_hit") && !col("seen"), 1L).otherwise(0L)).as("false_pos"),
        sum(when(col("seen") && !col("bloom_hit"), 1L).otherwise(0L)).as("false_neg"))
      .orderBy("lang")
  }

  val qBloomGateSql: String =
    s"""WITH docs AS (
      |  SELECT doc_id, lang, source || '/' || doc_id::VARCHAR AS url
      |  FROM documents),
      |seeds AS (SELECT unnest(range($BloomHashes)) AS seed),
      |bits AS (
      |  SELECT DISTINCT
      |    ('0x' || substr(md5(seed::VARCHAR || ':' || url), 1, 15))::BIGINT % $BloomBits AS pos
      |  FROM docs CROSS JOIN seeds WHERE doc_id % 4 <> 0),
      |ph AS (
      |  SELECT d.doc_id, d.lang, count(b.pos) AS nhit
      |  FROM docs d CROSS JOIN seeds s
      |  LEFT JOIN bits b
      |    ON b.pos = ('0x' || substr(md5(s.seed::VARCHAR || ':' || d.url), 1, 15))::BIGINT % $BloomBits
      |  GROUP BY 1, 2),
      |v AS (SELECT lang, (nhit = $BloomHashes) AS hit, (doc_id % 4 <> 0) AS seen
      |      FROM ph)
      |SELECT lang, count(*) AS probes,
      |  sum(CASE WHEN seen THEN 1 ELSE 0 END)::BIGINT AS true_seen,
      |  sum(CASE WHEN hit THEN 1 ELSE 0 END)::BIGINT AS bloom_hits,
      |  sum(CASE WHEN hit AND NOT seen THEN 1 ELSE 0 END)::BIGINT AS false_pos,
      |  sum(CASE WHEN seen AND NOT hit THEN 1 ELSE 0 END)::BIGINT AS false_neg
      |FROM v GROUP BY lang ORDER BY lang""".stripMargin

  /** q_quantile_sketch — p25/p50/p75/p90/p99 of document length via the
    * 64-bin equi-width sketch, graded against the exact type-1 quantile:
    * (q, est_q, exact_q, abs_err). The sketch reduces the corpus to
    * ≤ 64 bin counts; the exact arm runs on the distinct-length
    * histogram (domain-bounded). Estimate error is bounded by one bin
    * width — visible in abs_err.
    */
  val qQuantileSketch: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val est = Sketches.binnedQuantiles(docs, col("n_chars"), QBins, Quantiles)
    val ex = Sketches.exactQuantiles(docs, col("n_chars"), Quantiles)
    est.join(ex, "q")
      .select(col("q"), col("est_q"), col("exact_q"),
        round(abs(col("est_q") - col("exact_q").cast("double")), 4).as("abs_err"))
      .orderBy("q")
  }

  val qQuantileSketchSql: String =
    s"""WITH stats AS (
      |  SELECT min(n_chars)::DOUBLE AS mn, max(n_chars)::DOUBLE AS mx,
      |    count(*)::BIGINT AS n FROM documents),
      |binned AS (
      |  SELECT CASE WHEN mx = mn THEN 0
      |    ELSE LEAST(floor((n_chars::DOUBLE - mn) / ((mx - mn) / $QBins.0))::BIGINT, ${QBins - 1})
      |    END AS bin,
      |    count(*)::BIGINT AS cnt
      |  FROM documents CROSS JOIN stats GROUP BY 1),
      |cum AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin) AS cum FROM binned),
      |qs AS (SELECT unnest([${Quantiles.mkString(", ")}]::DOUBLE[]) AS q),
      |est AS (
      |  SELECT q.q,
      |    CASE WHEN s.mx = s.mn THEN round(s.mn, 4)
      |    ELSE round(s.mn + ((s.mx - s.mn) / $QBins.0) *
      |      (c.bin::DOUBLE + (q.q * s.n::DOUBLE - (c.cum - c.cnt)::DOUBLE) / c.cnt::DOUBLE), 4)
      |    END AS est_q
      |  FROM qs q CROSS JOIN stats s
      |  JOIN cum c ON c.cum >= q.q * s.n::DOUBLE
      |    AND (c.cum - c.cnt)::DOUBLE < q.q * s.n::DOUBLE),
      |hv AS (SELECT n_chars AS v, count(*)::BIGINT AS cnt FROM documents GROUP BY 1),
      |hcum AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum FROM hv),
      |ex AS (
      |  SELECT q.q, min(h.v) AS exact_q
      |  FROM qs q CROSS JOIN stats s
      |  JOIN hcum h ON h.cum >= ceil(q.q * s.n::DOUBLE)
      |  GROUP BY 1)
      |SELECT e.q, e.est_q, x.exact_q,
      |  round(abs(e.est_q - x.exact_q::DOUBLE), 4) AS abs_err
      |FROM est e JOIN ex x ON e.q = x.q ORDER BY e.q""".stripMargin

  val all: Map[String, Q] = Map(
    "q_kmv_distinct" -> qKmvDistinct,
    "q_hll_distinct" -> qHllDistinct,
    "q_kmv_overlap" -> qKmvOverlap,
    "q_consistent_sample" -> qConsistentSample,
    "q_sketch_drift" -> qSketchDrift,
    "q_hist_drift" -> qHistDrift,
    "q_cms_heavy" -> qCmsHeavy,
    "q_bloom_gate" -> qBloomGate,
    "q_quantile_sketch" -> qQuantileSketch)

  val oracles: Map[String, String] = Map(
    "q_kmv_distinct" -> qKmvDistinctSql,
    "q_hll_distinct" -> qHllDistinctSql,
    "q_kmv_overlap" -> qKmvOverlapSql,
    "q_consistent_sample" -> qConsistentSampleSql,
    "q_sketch_drift" -> qSketchDriftSql,
    "q_hist_drift" -> qHistDriftSql,
    "q_cms_heavy" -> qCmsHeavySql,
    "q_bloom_gate" -> qBloomGateSql,
    "q_quantile_sketch" -> qQuantileSketchSql)
}
