package graft.ops

import graft.functions.OracleMath
import graft.functions.VectorFunctions.r6
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables.t

/** Training-data curation operators (SURVEY §2.B north-star rows):
  * the selection/filtering half of an LLM data pipeline — after dedup
  * (ops/Dedup) and quality scoring (TextOps.docQuality), a corpus is
  * sampled, decontaminated against benchmark sets, repetition-filtered,
  * redacted, balanced across strata, and packed into training shards.
  *
  * Every operator here is oracle-checked (pure built-in expressions,
  * no UDFs) and map-only or single-shuffle by design:
  *
  *  - Sampling is hash-threshold (md5 of the key), never RNG — the
  *    sample is reproducible across runs, engines, and cluster sizes,
  *    and requires zero coordination (pure map, no driver state).
  *  - Decontamination broadcasts the (small) benchmark n-gram set, so
  *    the 100 TB corpus side never shuffles.
  *  - Repetition signals use array HOFs over per-doc token lists
  *    (map-only, O(words²) per doc with tiny constants) instead of
  *    explode + groupBy (which would shuffle the whole token stream).
  *  - Shard packing runs per-source (partition-parallel running sums),
  *    not a global ORDER BY — the global variant would serialize 100 TB
  *    through one reducer.
  */
object Curation {

  private def ws: Column = split(col("text"), " ")

  /** Word n-grams of an already-split token array; 1-based
    * `element_at` matches DuckDB list indexing. Guarded so short docs
    * yield an empty list rather than a descending `sequence`. */
  private def wordGrams(w: Column, n: Int): Column =
    when(size(w) >= n,
      transform(sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(w, i + o)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Deterministic ~10% corpus sample: md5 of a seeded key, keep
    * buckets 0x00-0x19 (26/256). Hash-threshold sampling is THE
    * reproducible sample at scale — a pure map with no RNG state, the
    * same rows survive on 1 or 1000 executors, and the rate is
    * adjusted by moving the threshold, not resampling. */
  def sampleHash(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        substring(md5(concat(lit("s42:"), col("doc_id").cast("string"))), 1, 2)
          .as("bucket"))
      .filter(col("bucket") < "1a")
      .orderBy(col("doc_id"))

  val sampleHashSql: String =
    """SELECT doc_id, lang,
      |  substring(md5('s42:' || CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
      |FROM documents
      |WHERE substring(md5('s42:' || CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
      |ORDER BY doc_id""".stripMargin

  /** Exact 3-gram decontamination over EXPLICIT corpus and benchmark
    * relations — the operator proper (the
    * [[semanticDecontaminateAgainst]] convention): any corpus doc
    * sharing a word 3-gram with the benchmark set is flagged with
    * its shared-gram count. The benchmark gram set is tiny relative
    * to the corpus, so it broadcasts — the corpus side is a map-side
    * semi-join + one aggregation on doc_id; the 100 TB side never
    * shuffles its gram stream. */
  def decontaminateAgainst(corpus: DataFrame, benchDocs: DataFrame): DataFrame = {
    // distinct 3-grams via Dedup's single-pass shingle UDF — the
    // HOF transform-over-split form re-evaluates the split inside
    // every lambda element access (CollapseProject inlines it into
    // the Generate input), measured ~8× slower at bench scale
    val bench = Dedup.shingles(benchDocs)
      .select(col("shingle").as("g")).distinct()
    Dedup.shingles(corpus).withColumnRenamed("shingle", "g")
      .join(broadcast(bench), Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy(col("doc_id"))
  }

  /** The registered decontamination — the fixture's benchmark
    * convention (every 50th doc) split here, scoring delegated. */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    decontaminateAgainst(
      d.filter(col("doc_id") % 50 =!= 0),
      d.filter(col("doc_id") % 50 === 0))
  }

  val decontaminateSql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |g AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
      |      FROM w, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)),
      |b AS (SELECT DISTINCT g FROM g WHERE doc_id % 50 = 0)
      |SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
      |FROM g JOIN b USING (g)
      |WHERE g.doc_id % 50 <> 0
      |GROUP BY g.doc_id
      |ORDER BY g.doc_id""".stripMargin

  // ------------------------------------ contamination grain sweep

  /** Grain grid for [[decontamGrainSweep]] — the published range: the
    * 3-gram grain this suite's exact filter runs at, up through the
    * 8- and 13-word grains the GPT-3/Llama-class decontamination
    * writeups standardized on. */
  val DecontamSweepGrains: Seq[Int] = Seq(3, 5, 8, 13)

  /** ONE pass builds every grain's window-hash stream (the
    * lsh_band_sweep multi-banding trick at the gram grain); hashes
    * via the canonical split/window kernel so parity with every other
    * windowed op — including hostile whitespace — is inherited, not
    * re-proven. */
  private val grainWinUdf = udf { (text: String) =>
    DecontamSweepGrains.flatMap(n =>
      Dedup.windowHashes(text, n).map(h => (n, h)))
  }

  /** The decontamination-grain operating curve — how the n-gram
    * length is actually chosen before a release: contamination flag
    * rate per grain, over the SAME corpus/benchmark pair. Short
    * grains over-flag (any shared idiom is a "leak"); long grains
    * miss lightly-edited copies; this table is the knob audit beside
    * the registered 3-gram filter, the [[substrThresholdSweep]]
    * convention pointed at benchmark overlap.
    *
    * Scale shape: ONE scan per side emits all grains' (n, hash)
    * rows; the benchmark set is bounded by the benchmark-size rule →
    * broadcast LEFT SEMI, the corpus never shuffles for the probe;
    * per-grain flags are one distinct-doc aggregation; the grid is
    * emitted total (explicit-grid convention) with a 1-row corpus
    * count scalar. */
  def decontamGrainSweepAgainst(corpus: DataFrame, benchDocs: DataFrame): DataFrame = {
    import corpus.sparkSession.implicits._
    val bench = benchDocs
      .select(explode(grainWinUdf(col("text"))).as("g"))
      .select(col("g._1").as("n"), col("g._2").as("h")).distinct()
    val flagged = corpus
      .select(col("doc_id"), explode(grainWinUdf(col("text"))).as("g"))
      .select(col("doc_id"), col("g._1").as("n"), col("g._2").as("h"))
      .join(broadcast(bench), Seq("n", "h"), "left_semi")
      .groupBy(col("n"))
      .agg(countDistinct(col("doc_id")).as("n_flagged"))
    val total = corpus.agg(count(lit(1)).as("n_docs"))
    DecontamSweepGrains.toDF("n")
      .join(flagged, Seq("n"), "left")
      .crossJoin(total)
      .select(col("n").cast("long").as("gram_words"),
        coalesce(col("n_flagged"), lit(0L)).as("n_flagged"),
        col("n_docs"),
        r6(when(col("n_docs") === 0, 0.0)
          .otherwise(coalesce(col("n_flagged"), lit(0L)).cast("double") /
            col("n_docs"))).as("flag_rate"))
      .orderBy(col("gram_words"))
  }

  /** The registered sweep — the fixture's benchmark convention
    * (every 50th doc), grid over [[DecontamSweepGrains]]. */
  def decontamGrainSweep(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    decontamGrainSweepAgainst(
      d.filter(col("doc_id") % 50 =!= 0),
      d.filter(col("doc_id") % 50 === 0))
  }

  /** Oracle mirror: a VALUES grain grid laterally unnested over the
    * shared split relation (one gram CTE serves benchmark set and
    * corpus probe), hash60 windows, distinct-doc flags per grain,
    * grid-total output. */
  val decontamGrainSweepSql: String = {
    val grid = DecontamSweepGrains.map(n => s"($n)").mkString(", ")
    val h = graft.functions.CrossHash.sqlHash60(
      "array_to_string(w[i + 1 : i + n], ' ')")
    s"""WITH gs_w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |gs_g AS MATERIALIZED (
       |  SELECT doc_id, n, $h AS h
       |  FROM gs_w, (VALUES $grid) grains(n),
       |    UNNEST(range(0, len(w) - (n - 1))) AS t(i)
       |  WHERE len(w) >= n),
       |gs_b AS (SELECT DISTINCT n, h FROM gs_g WHERE doc_id % 50 = 0),
       |gs_f AS (
       |  SELECT g.n, COUNT(DISTINCT g.doc_id) AS n_flagged
       |  FROM gs_g g JOIN gs_b b ON g.n = b.n AND g.h = b.h
       |  WHERE g.doc_id % 50 <> 0
       |  GROUP BY g.n),
       |gs_c AS (SELECT COUNT(*) AS n_docs FROM documents WHERE doc_id % 50 <> 0)
       |SELECT CAST(grains.n AS BIGINT) AS gram_words,
       |  CAST(COALESCE(f.n_flagged, 0) AS BIGINT) AS n_flagged,
       |  CAST(c.n_docs AS BIGINT) AS n_docs,
       |  round(CASE WHEN c.n_docs = 0 THEN 0.0
       |        ELSE CAST(COALESCE(f.n_flagged, 0) AS DOUBLE) / c.n_docs END, 6) + 0
       |    AS flag_rate
       |FROM (VALUES $grid) grains(n)
       |CROSS JOIN gs_c c
       |LEFT JOIN gs_f f ON f.n = grains.n
       |ORDER BY gram_words""".stripMargin
  }

  // ------------------------------------ exact vs semantic agreement

  /** 2×2 agreement between the two decontamination regimes — the
    * [[filterAgreement]] shape pointed at contamination: corpus docs
    * flagged by BOTH the exact 3-gram overlap and the embedding
    * cosine, by each alone, and by neither. The off-diagonals are
    * the decision cells — exact-only is boilerplate-level overlap a
    * paraphrase detector rightly ignores, semantic-only is the
    * reworded leak the n-gram filter is structurally blind to, and a
    * release picks its regime (or the union) from their sizes.
    *
    * Scale shape: both flag relations are the proven chains; the
    * union report is two doc-keyed left joins onto the corpus ids
    * and ONE 1-row aggregation stacked to 4 category rows —
    * grid-total on an empty corpus by derivation (neither =
    * n − exact − semantic + both). */
  def decontamUnionReport(s: SparkSession, dir: String): DataFrame = {
    val corpus = t(s, dir, "documents")
      .filter(col("doc_id") % 50 =!= 0).select(col("doc_id"))
    val ex = decontaminate(s, dir).select(col("doc_id")).withColumn("e", lit(1L))
    val se = semanticDecontaminate(s, dir).select(col("doc_id")).withColumn("m", lit(1L))
    corpus
      .join(ex, Seq("doc_id"), "left")
      .join(se, Seq("doc_id"), "left")
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("e")), lit(0L)).as("ne"),
        coalesce(sum(col("m")), lit(0L)).as("ns"),
        coalesce(sum(when(col("e") === 1L && col("m") === 1L, 1L).otherwise(0L)),
          lit(0L)).as("nb"))
      .selectExpr(
        """stack(4,
          |  'both',          nb,
          |  'exact_only',    ne - nb,
          |  'semantic_only', ns - nb,
          |  'neither',       n - ne - ns + nb
          |) AS (category, n_docs)""".stripMargin)
      .orderBy(col("category"))
  }

  /** Composes the two proven decontamination oracles (du_-prefixed
    * outer CTEs per the shadowing rule). */
  lazy val decontamUnionReportSql: String =
    s"""WITH du_e AS MATERIALIZED (
       |  SELECT doc_id FROM ($decontaminateSql)),
       |du_s AS MATERIALIZED (
       |  SELECT doc_id FROM ($semanticDecontaminateSql)),
       |du_a AS (
       |  SELECT COUNT(*) AS n,
       |    COALESCE(SUM(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS ne,
       |    COALESCE(SUM(CASE WHEN s.doc_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS ns,
       |    COALESCE(SUM(CASE WHEN e.doc_id IS NOT NULL AND s.doc_id IS NOT NULL
       |                 THEN 1 ELSE 0 END), 0) AS nb
       |  FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) c
       |  LEFT JOIN du_e e USING (doc_id)
       |  LEFT JOIN du_s s USING (doc_id))
       |SELECT category, CAST(n_docs AS BIGINT) AS n_docs FROM (
       |  SELECT 'both' AS category, nb AS n_docs FROM du_a
       |  UNION ALL SELECT 'exact_only', ne - nb FROM du_a
       |  UNION ALL SELECT 'semantic_only', ns - nb FROM du_a
       |  UNION ALL SELECT 'neither', n - ne - ns + nb FROM du_a)
       |ORDER BY category""".stripMargin

  // ------------------------------------------ contamination spans

  /** WHERE a benchmark leak sits inside each contaminated doc — the
    * localization audit run after [[decontaminate]] flags a doc: a
    * count of shared 3-grams says "contaminated", but remediation
    * (scrub the span vs drop the doc) needs the leak's SHAPE — one
    * long verbatim benchmark passage reads very differently from the
    * same count of scattered idiom collisions. Consecutive
    * benchmark-matching 3-gram windows merge gaps-and-islands style
    * (the [[graft.ops.Dedup.memorizationSpans]] machinery pointed at
    * the benchmark set instead of the corpus itself): per corpus doc,
    * the span count and the longest contiguous leaked run. Top-50 by
    * span, ties to the lower doc.
    *
    * Scale shape: the benchmark window-hash set is tiny (the
    * decontaminate size rule) and the probe is one LEFT SEMI join of
    * the corpus's positional 3-gram stream against it; islands run
    * per doc (bounded by doc length, never corpus-wide). */
  def decontamSpans(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = t(s, dir, "documents")
    val wins = d.select(col("doc_id"),
      posexplode(gram3WinUdf(col("text"))).as(Seq("pos", "h")))
    val bench = wins.filter(col("doc_id") % 50 === 0).select(col("h")).distinct()
    val bad = wins.filter(col("doc_id") % 50 =!= 0)
      .join(bench, Seq("h"), "left_semi")
      .select(col("doc_id"), col("pos"))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    bad.withColumn("island", col("pos") - row_number().over(wDoc))
      .groupBy(col("doc_id"), col("island"))
      .agg(count(lit(1)).as("run"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"), max(col("run")).as("longest_run"))
      .withColumn("span_words", col("longest_run") + lit(2))
      .select(col("doc_id"), col("n_spans"), col("longest_run"), col("span_words"))
      .orderBy(col("span_words").desc, col("doc_id"))
      .limit(50)
  }

  private val gram3WinUdf = udf { (text: String) =>
    graft.ops.Dedup.windowHashes(text, 3)
  }

  /** Oracle mirror of [[decontamSpans]]: positional 3-word window
    * hashes, benchmark membership, the memorization_spans islands
    * SQL against the benchmark set. */
  val decontamSpansSql: String = {
    val hWin = graft.functions.CrossHash.sqlHash60(
      "array_to_string(w[i + 1 : i + 3], ' ')")
    s"""WITH dsp_w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |dsp_win AS MATERIALIZED (
       |  SELECT doc_id, i AS pos, $hWin AS h
       |  FROM dsp_w, UNNEST(range(0, len(w) - 2)) AS t(i)
       |  WHERE len(w) >= 3),
       |dsp_b AS MATERIALIZED (
       |  SELECT DISTINCT h FROM dsp_win WHERE doc_id % 50 = 0),
       |dsp_isl AS (
       |  SELECT doc_id,
       |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |  FROM dsp_win
       |  WHERE doc_id % 50 <> 0 AND h IN (SELECT h FROM dsp_b)),
       |dsp_run AS (
       |  SELECT doc_id, island, COUNT(*) AS run FROM dsp_isl
       |  GROUP BY doc_id, island)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
       |  CAST(MAX(run) AS BIGINT) AS longest_run,
       |  CAST(MAX(run) + 2 AS BIGINT) AS span_words
       |FROM dsp_run GROUP BY doc_id
       |ORDER BY span_words DESC, doc_id
       |LIMIT 50""".stripMargin
  }

  // ------------------------------------------ semantic decontamination

  /** Cosine threshold above which a corpus document counts as a
    * semantic (paraphrase-level) leak of a benchmark document.
    * Measured on the fixture: unrelated corpus→benchmark best-match
    * cosine sits at p50 0.57 / p90 0.68; word-ROTATED benchmark
    * copies (every 3-gram destroyed) score ≥ 0.98 and full word
    * REVERSALS 0.61–0.81 — 0.7 clears the unrelated p90 while
    * catching rotations, near-copies, and most reversals. */
  val SemDecontamEps = 0.7

  /** Per-doc hash-ngram embedding of an arbitrary (doc_id, text)
    * relation — the registered [[graft.embed.HashEmbedder]] over the
    * whole text (zero-norm rows excluded: whitespace-only docs embed
    * to the zero vector, quirk Q4's degenerate case). */
  private def embedDocs(docs: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions.l2norm
    docs
      .select(col("doc_id"), graft.embed.EmbedOps.embedUdf()(col("text")).as("ve"))
      .withColumn("nrm", l2norm(col("ve")))
      .filter(col("nrm") > 0)
  }

  private def docEmbeddings(s: SparkSession, dir: String): DataFrame =
    embedDocs(t(s, dir, "documents"))

  /** Embedding-similarity decontamination over EXPLICIT corpus and
    * benchmark relations — the operator proper, decoupled from any
    * fixture split (the [[Multimodal.alignPairs]] convention): both
    * sides are (doc_id, text) relations; output is each flagged
    * corpus doc with its best-matching benchmark doc (max sim, min
    * bench_id tiebreak) and the r6 cosine.
    *
    * Scale shape: the benchmark set is tiny relative to the corpus
    * (the [[decontaminate]] rule), so it embeds once and BROADCASTS;
    * the corpus side is ONE map-only embed + score pass — no corpus
    * shuffle at all; the per-doc argmax window runs over the flagged
    * rows only. When the benchmark itself is too large to broadcast,
    * the cell-assigned variant ([[KMeansVec.semanticDecontaminateCells]])
    * scopes the pair pass to k-means cells instead. */
  def semanticDecontaminateAgainst(
      corpus: DataFrame, benchDocs: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions.dot
    val bench = embedDocs(benchDocs)
      .select(col("doc_id").as("bench_id"), col("ve").as("be"), col("nrm").as("nb"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("sim").desc, col("bench_id"))
    embedDocs(corpus)
      .crossJoin(broadcast(bench))
      .withColumn("sim", r6(try_divide(dot(col("ve"), col("be")), col("nrm") * col("nb"))))
      .filter(col("sim") >= SemDecontamEps)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("bench_id"), col("sim"))
      .orderBy(col("doc_id"))
  }

  /** The registered semantic decontamination — the PARAPHRASE
    * complement of [[decontaminate]]'s exact 3-gram overlap: a
    * benchmark item that was reworded or reordered shares no word
    * 3-gram with its leak, but its hash-ngram embedding (unigram mass
    * unchanged, bigram mass partly) keeps cosine high. THIS function
    * only splits the fixture by [[decontaminate]]'s benchmark
    * convention (every 50th document) and delegates to
    * [[semanticDecontaminateAgainst]]. */
  def semanticDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents", resplit = true)
    semanticDecontaminateAgainst(
      d.filter(col("doc_id") % 50 =!= 0),
      d.filter(col("doc_id") % 50 === 0))
  }

  /** Frozen benchmark side of [[semanticDecontaminate]] for the
    * STREAMING twin: (bench_id, embedding, norm) collected once at
    * stream start. Bounded by the decontaminate size rule — the
    * benchmark is tiny relative to the corpus (the same fact that
    * lets the batch join broadcast), so the collect is
    * parameter-bounded, not corpus-bounded. */
  private[graft] def benchEmbedFrozen(
      s: SparkSession, dir: String): Array[(Long, Array[Float], Double)] =
    docEmbeddings(s, dir).filter(col("doc_id") % 50 === 0)
      .select(col("doc_id"), col("ve"), col("nrm"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2)))

  /** Map-only closure twin of the [[semanticDecontaminate]] scoring
    * chain — the `langidPredictUdf` shape for decontamination: the
    * frozen benchmark rides the closure, each doc embeds + scores
    * against every benchmark vector in one pass (sequential double
    * folds ≡ the native FloatDotProduct order, r6d ≡ the column r6),
    * argmax by (sim desc, bench_id asc) over the sims clearing
    * [[SemDecontamEps]]; None for clean or zero-norm docs. Bit-equal
    * to the batch broadcast join by construction — StreamingSpec pins
    * the per-doc equality. */
  private[graft] def semanticDecontamPredictUdf(
      bench: Array[(Long, Array[Float], Double)]) = udf { (text: String) =>
    val v = graft.embed.HashEmbedder.default.embedOne(text)
    var nv2 = 0.0
    var i = 0
    while (i < v.length) { nv2 += v(i).toDouble * v(i).toDouble; i += 1 }
    val nv = math.sqrt(nv2)
    if (nv == 0.0) None
    else {
      var bestId = Long.MaxValue
      var bestSim = Double.NegativeInfinity
      var found = false
      var b = 0
      while (b < bench.length) {
        val (id, be, nb) = bench(b)
        var d = 0.0
        var j = 0
        while (j < v.length) { d += v(j).toDouble * be(j).toDouble; j += 1 }
        val sim = graft.functions.OracleMath.r6d(d / (nv * nb))
        if (sim >= SemDecontamEps &&
            (sim > bestSim || (sim == bestSim && id < bestId))) {
          bestSim = sim
          bestId = id
          found = true
        }
        b += 1
      }
      if (found) Some((bestId, bestSim)) else None
    }
  }

  /** The hash-ngram embed chain as DuckDB CTEs over `documents` —
    * the [[graft.ops.TextOps.indexPipelineSql]] replay without the
    * chunker (whole doc = one vector): lowercased nonempty words,
    * unigram+bigram `"42|{token}"` md5 keys, signed 64-bucket sums
    * (exact integers), integer norm, IEEE float truncation, vectors
    * DENSIFIED to 64-length lists so the cosine folds over the same
    * 64 elements in the same order as the engine. */
  /** Parameterized form of the embed chain — CTE names carry the
    * caller's prefix (the lsh_band_sweep shadowing rule) and the
    * source can be any relation exposing (doc_id, text), so the
    * media–text alignment oracle reuses the exact chain over caption
    * prefixes. Exposes `${p}_vec AS (doc_id, ve)`. */
  private[ops] def embedChainCte(p: String, srcRel: String): String = {
    val h = graft.functions.CrossHash.sqlHash60("key")
    s"""${p}_w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM $srcRel),
       |${p}_toks AS (
       |  SELECT doc_id, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS p,
       |    ws[i] AS tok
       |  FROM ${p}_w, UNNEST(range(1, len(ws) + 1)) AS t(i)
       |  WHERE length(ws[i]) > 0),
       |${p}_keys AS (
       |  SELECT doc_id, '42|' || tok AS key FROM ${p}_toks
       |  UNION ALL
       |  SELECT a.doc_id, '42|' || a.tok || ' ' || b.tok
       |  FROM ${p}_toks a JOIN ${p}_toks b ON b.doc_id = a.doc_id AND b.p = a.p + 1),
       |${p}_vdim AS (
       |  SELECT doc_id, bucket, SUM(sgn) AS v FROM (
       |    SELECT doc_id, h % 64 AS bucket,
       |      CASE WHEN (h >> 32) & 1 = 0 THEN 1.0 ELSE -1.0 END AS sgn
       |    FROM (SELECT doc_id, $h AS key_h FROM ${p}_keys) k(doc_id, h))
       |  GROUP BY doc_id, bucket),
       |${p}_norm AS (SELECT doc_id, sqrt(SUM(v * v)) AS nrm FROM ${p}_vdim GROUP BY doc_id),
       |${p}_vec AS MATERIALIZED (
       |  SELECT n.doc_id,
       |    list(CAST(coalesce(v.v, 0.0) * (1.0 / n.nrm) AS FLOAT) ORDER BY g.j) AS ve
       |  FROM ${p}_norm n
       |  CROSS JOIN (SELECT unnest(range(0, 64)) AS j) g
       |  LEFT JOIN ${p}_vdim v ON v.doc_id = n.doc_id AND v.bucket = g.j
       |  WHERE n.nrm > 0
       |  GROUP BY n.doc_id)""".stripMargin
  }

  private val docEmbedCte: String = embedChainCte("sd", "documents")

  /** Cosine of two densified 64-float lists — the engine's sequential
    * double fold, verbatim. Unit-norm floats, so no re-division. */
  private[ops] def sdCos(a: String, b: String): String =
    s"""round(list_sum(list_transform(range(1, 65),
       |      i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))
       |    / (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |       * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) + 0""".stripMargin

  /** Oracle mirror of [[semanticDecontaminate]]: the embed-chain CTEs,
    * bench/corpus split on the same % 50 rule, full pairwise cosine
    * (the broadcast join replay), threshold, per-doc argmax. */
  lazy val semanticDecontaminateSql: String =
    s"""WITH $docEmbedCte,
       |sd_b AS (SELECT doc_id AS bench_id, ve AS be FROM sd_vec WHERE doc_id % 50 = 0),
       |sd_c AS (SELECT doc_id, ve FROM sd_vec WHERE doc_id % 50 <> 0),
       |sd_sims AS (
       |  SELECT c.doc_id, b.bench_id, ${sdCos("c.ve", "b.be")} AS sim
       |  FROM sd_c c CROSS JOIN sd_b b)
       |SELECT doc_id, bench_id, sim FROM (
       |  SELECT doc_id, bench_id, sim,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY sim DESC, bench_id) AS rn
       |  FROM sd_sims WHERE sim >= $SemDecontamEps)
       |WHERE rn = 1
       |ORDER BY doc_id""".stripMargin

  /** Flagged-doc counts per BENCHMARK source — the per-benchmark
    * leak report run alongside [[semanticDecontaminate]]: for every
    * source that contributes benchmark documents, how many benchmark
    * docs it holds and how many corpus docs best-match into it.
    * Totality over the benchmark sources via union + re-aggregate
    * (the [[filterAgreement]] grid lesson — no outer join onto the
    * scored chain). */
  def semanticDecontamReport(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents", resplit = true)
    val benchSrc = d.filter(col("doc_id") % 50 === 0)
      .groupBy(col("source")).agg(count(lit(1)).as("nb0"))
      .select(col("source"), col("nb0"), lit(0L).as("nf0"))
    val flagged = semanticDecontaminate(s, dir)
      .join(d.select(col("doc_id").as("bench_id"), col("source")), "bench_id")
      .groupBy(col("source")).agg(count(lit(1)).as("nf0"))
      .select(col("source"), lit(0L).as("nb0"), col("nf0"))
    benchSrc.unionByName(flagged)
      .groupBy(col("source"))
      .agg(sum(col("nb0")).as("n_bench"), sum(col("nf0")).as("n_flagged"))
      .orderBy(col("source"))
  }

  /** Oracle mirror of [[semanticDecontamReport]] — the flagged SQL
    * nested, counts re-aggregated over the benchmark-source rows. */
  lazy val semanticDecontamReportSql: String =
    s"""WITH sr_flagged AS MATERIALIZED (
       |  SELECT bench_id FROM ($semanticDecontaminateSql)),
       |sr_bench AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_bench
       |  FROM documents WHERE doc_id % 50 = 0 GROUP BY source),
       |sr_counts AS (
       |  SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_flagged
       |  FROM sr_flagged f JOIN documents d ON d.doc_id = f.bench_id
       |  GROUP BY d.source)
       |SELECT b.source, b.n_bench,
       |  CAST(coalesce(c.n_flagged, 0) AS BIGINT) AS n_flagged
       |FROM sr_bench b LEFT JOIN sr_counts c USING (source)
       |ORDER BY b.source""".stripMargin

  /** Gopher-style repetition/quality signals, computed map-only with
    * array HOFs (no token-stream shuffle): most-frequent-word
    * fraction, duplicate word-2-gram fraction, mean word length, and
    * the resulting keep/drop decision. The keep flag compares
    * UNROUNDED doubles — both engines compute the identical ratios of
    * identical integers, so the comparison is bit-deterministic. */
  def gopherQuality(s: SparkSession, dir: String): DataFrame =
    gopherScore(t(s, dir, "documents", resplit = true)).orderBy(col("doc_id"))

  /** The gopher scoring on ANY (doc_id, text) relation — ONE
    * definition shared by the batch query and the streaming twin
    * ([[graft.streaming.StreamingIndex.curationStream]]), so batch
    * and stream semantics cannot drift. Map-only (array HOFs, no
    * shuffle), which is exactly why it streams without state. */
  def gopherScore(d: DataFrame): DataFrame = {
    val sig = gopherSignals(d)
    sig.select(
      col("doc_id"),
      col("n_words").cast("long").as("n_words"),
      r6(col("twf")).as("top_word_frac"),
      r6(col("dup_frac")).as("dup_2gram_frac"),
      r6(col("mwl")).as("mean_word_len"),
      gopherKeep(lit(GopherTwfMax)).cast("int").as("keep"))
  }

  /** Registered gopher thresholds (Rae et al. 2021 §A1.1). */
  val GopherTwfMax = 0.12
  val GopherDupMax = 0.1
  val GopherMwlMin = 3.0
  val GopherMwlMax = 10.0

  /** The keep predicate over [[gopherSignals]] columns at a given
    * top-word-frac cutoff — UNROUNDED doubles (identical integer
    * ratios in both engines, so bit-deterministic; the gopherScore
    * convention), shared by the registered filter and the sweep. */
  private def gopherKeep(twfMax: Column): Column =
    col("twf") <= twfMax && col("dup_frac") <= GopherDupMax &&
      col("mwl") >= GopherMwlMin && col("mwl") <= GopherMwlMax

  /** The UNROUNDED gopher signals on ANY (doc_id, text) relation —
    * (doc_id, n_words, twf, dup_frac, mwl); [[gopherScore]] rounds
    * and thresholds these, [[gopherThresholdSweepOf]] sweeps the
    * twf cutoff over them. Map-only. */
  /** `passthrough` names extra input columns carried verbatim into
    * the output — what lets [[releasePipelineOf]] compute every
    * stage flag off ONE corpus scan instead of re-joining scans. */
  private def gopherSignals(
      d: DataFrame, passthrough: Seq[String] = Nil): DataFrame = {
    val base = d.select(
        (Seq(col("doc_id"), col("text"), ws.as("w")) ++
          passthrough.filterNot(Set("doc_id", "text")).map(col)): _*)
      .withColumn("n_words", size(col("w")))
    // max word frequency as the longest run in the SORTED array — one
    // O(n log n) pass; the transform(array_distinct, x -> count(=x))
    // form is O(n·distinct) per doc (measured 4× slower at sf0.1 — the
    // whole cost of this query). Values are identical (max run length
    // of a sorted multiset IS the max multiplicity), so the oracle's
    // list_filter form stays untouched.
    val runMax = expr(
      "aggregate(sort_array(w), " +
        "named_struct('p', CAST(NULL AS STRING), 'r', 0, 'b', 0), " +
        "(a, x) -> named_struct(" +
        "'p', x, " +
        "'r', CASE WHEN a.p <=> x THEN a.r + 1 ELSE 1 END, " +
        "'b', greatest(a.b, CASE WHEN a.p <=> x THEN a.r + 1 ELSE 1 END)), " +
        "a -> a.b)")
    val twf = when(col("n_words") >= 1, runMax).otherwise(lit(null))
      .cast("double") / col("n_words")
    val g2 = wordGrams(col("w"), 2)
    val dupFrac = when(size(col("w")) >= 2,
      lit(1.0) - size(array_distinct(g2)).cast("double") / size(g2))
      .otherwise(lit(0.0))
    val mwl = (length(col("text")) - col("n_words") + 1).cast("double") / col("n_words")
    base.select(
      (Seq(col("doc_id"), col("n_words"),
        twf.as("twf"), dupFrac.as("dup_frac"), mwl.as("mwl")) ++
        passthrough.filterNot(_ == "doc_id").map(col)): _*)
  }

  // ---- Gopher threshold sweep ----

  /** Top-word-frac cutoff grid: permissive → the registered 0.12 →
    * loose — the knob that decides how much looping boilerplate a
    * release tolerates. The other two thresholds stay at their
    * registered values (a full 3-D grid reads as noise; the twf
    * cutoff is the one that moves real corpora). */
  val GopherTwfGrid: Seq[Double] = Seq(0.08, GopherTwfMax, 0.2, 0.5)

  /** Yield curve for the [[gopherScore]] keep filter per twf cutoff:
    * docs kept, words kept, kept fraction. The curve is the release
    * decision — on a corpus where 0.08 → 0.12 doubles the kept docs,
    * the filter is riding the natural-phrase-reuse cliff, not
    * catching boilerplate. ONE [[gopherSignals]] scan; every grid
    * cell is a conditional aggregate of the same pass (map-side
    * partials — no per-cell rescan, no shuffle wider than one global
    * agg row), unpivoted via stack. Total on an empty corpus: the
    * global aggregate always emits its one row, so the full grid
    * reports zeros (kept_frac zero-division-guarded). */
  def gopherThresholdSweepOf(d: DataFrame): DataFrame = {
    val sig = gopherSignals(d)
    val cells = GopherTwfGrid.zipWithIndex.flatMap { case (c, i) =>
      val kept = gopherKeep(lit(c))
      Seq(
        coalesce(sum(when(kept, 1L).otherwise(0L)), lit(0L)).as(s"d$i"),
        coalesce(sum(when(kept, col("n_words").cast("long")).otherwise(0L)),
          lit(0L)).as(s"w$i"))
    }
    val tot = sig.agg(count(lit(1)).as("n_docs"), cells: _*)
    val stackArgs = GopherTwfGrid.zipWithIndex
      .map { case (c, i) => s"CAST($c AS DOUBLE), d$i, w$i" }
      .mkString(", ")
    tot
      .select(col("n_docs"),
        expr(s"stack(${GopherTwfGrid.size}, $stackArgs) AS " +
          "(twf_max, n_docs_kept, n_words_kept)"))
      .select(col("twf_max"),
        col("n_docs_kept"), col("n_words_kept"),
        graft.functions.VectorFunctions.r6(
          when(col("n_docs") === 0, 0.0)
            .otherwise(col("n_docs_kept").cast("double") / col("n_docs")))
          .as("kept_frac"))
      .orderBy(col("twf_max"))
  }

  def gopherThresholdSweep(s: SparkSession, dir: String): DataFrame =
    gopherThresholdSweepOf(t(s, dir, "documents", resplit = true))

  /** Oracle mirror: the same unrounded signal CTE as
    * [[gopherQualitySql]] (prefix `gts_`), one conditional-aggregate
    * row per cutoff, UNION ALL. */
  val gopherThresholdSweepSql: String = {
    val m =
      """SELECT doc_id, n_words,
        |    CAST(list_max(list_transform(list_distinct(w),
        |      x -> len(list_filter(w, y -> y = x)))) AS DOUBLE) / n_words AS twf,
        |    CASE WHEN n_words >= 2 THEN
        |      1.0 - CAST(len(list_distinct([w[i] || ' ' || w[i+1]
        |              FOR i IN generate_series(1, len(w) - 1)])) AS DOUBLE)
        |            / (n_words - 1)
        |    ELSE 0.0 END AS dup_frac,
        |    CAST(length(text) - n_words + 1 AS DOUBLE) / n_words AS mwl
        |  FROM (SELECT doc_id, text, string_split(text, ' ') AS w,
        |          len(string_split(text, ' ')) AS n_words FROM documents)""".stripMargin
    val rows = GopherTwfGrid.map { c =>
      s"""SELECT CAST($c AS DOUBLE) AS twf_max,
         |  CAST(COALESCE(SUM(CASE WHEN keep THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_docs_kept,
         |  CAST(COALESCE(SUM(CASE WHEN keep THEN n_words ELSE 0 END), 0) AS BIGINT) AS n_words_kept,
         |  round(CASE WHEN COUNT(*) = 0 THEN 0.0
         |             ELSE CAST(COALESCE(SUM(CASE WHEN keep THEN 1 ELSE 0 END), 0) AS DOUBLE) / COUNT(*)
         |        END, 6) + 0 AS kept_frac
         |FROM (SELECT n_words,
         |        twf <= $c AND dup_frac <= $GopherDupMax
         |          AND mwl >= $GopherMwlMin AND mwl <= $GopherMwlMax AS keep
         |      FROM gts_m)""".stripMargin
    }
    s"""WITH gts_m AS MATERIALIZED (
       |  $m)
       |SELECT * FROM (
       |${rows.mkString("\nUNION ALL\n")}
       |)
       |ORDER BY twf_max""".stripMargin
  }

  val gopherQualitySql: String =
    """WITH b AS (
      |  SELECT doc_id, text, string_split(text, ' ') AS w,
      |    len(string_split(text, ' ')) AS n_words
      |  FROM documents),
      |m AS (
      |  SELECT doc_id, n_words,
      |    CAST(list_max(list_transform(list_distinct(w),
      |      x -> len(list_filter(w, y -> y = x)))) AS DOUBLE) / n_words AS twf,
      |    CASE WHEN n_words >= 2 THEN
      |      1.0 - CAST(len(list_distinct([w[i] || ' ' || w[i+1]
      |              FOR i IN generate_series(1, len(w) - 1)])) AS DOUBLE)
      |            / (n_words - 1)
      |    ELSE 0.0 END AS dup_frac,
      |    CAST(length(text) - n_words + 1 AS DOUBLE) / n_words AS mwl
      |  FROM b)
      |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
      |  round(twf, 6) + 0 AS top_word_frac,
      |  round(dup_frac, 6) + 0 AS dup_2gram_frac,
      |  round(mwl, 6) + 0 AS mean_word_len,
      |  CASE WHEN twf <= 0.12 AND dup_frac <= 0.1
      |        AND mwl >= 3.0 AND mwl <= 10.0 THEN 1 ELSE 0 END AS keep
      |FROM m
      |ORDER BY doc_id""".stripMargin

  /** PII-style masking mechanism: redact every long alpha run
    * (stand-in for email/phone patterns — the soup fixture has no
    * digits) and report mask counts + length delta. Pure codegen'd
    * `regexp_replace`/`regexp_extract_all`; pattern kept to a
    * POSIX-safe subset so Java regex and RE2 agree. */
  def redactMask(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val red = regexp_replace(col("text"), "[a-z]{7,}", "<MASK>")
    d.select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit("[a-z]{7,}"), lit(0)))
          .cast("long").as("n_masked"),
        length(col("text")).cast("long").as("len_raw"),
        length(red).cast("long").as("len_redacted"))
      .orderBy(col("doc_id"))
  }

  val redactMaskSql: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '[a-z]{7,}')) AS BIGINT) AS n_masked,
      |  CAST(length(text) AS BIGINT) AS len_raw,
      |  CAST(length(regexp_replace(text, '[a-z]{7,}', '<MASK>', 'g')) AS BIGINT)
      |    AS len_redacted
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Per-source PII exposure report — the release-checklist view of
    * [[redactMask]]'s per-doc counts: which ingestion source leaks
    * (docs carrying maskable runs, total matches, exposure rate). A
    * source at 0.9 exposure needs a scrape fix, not per-doc masking.
    * One scan + ONE per-source aggregation; group keys are the
    * handful of sources. */
  def piiReport(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val n = size(regexp_extract_all(col("text"), lit("[a-z]{7,}"), lit(0))).cast("long")
    d.select(col("source"), n.as("n_masked"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(when(col("n_masked") > 0, 1L).otherwise(0L)), lit(0L))
          .as("n_docs_with_pii"),
        coalesce(sum(col("n_masked")), lit(0L)).as("n_matches"))
      .withColumn("exposure_rate",
        r6(col("n_docs_with_pii").cast("double") / col("n_docs")))
      .orderBy(col("source"))
  }

  val piiReportSql: String =
    """SELECT source,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(COALESCE(SUM(CASE WHEN len(regexp_extract_all(text, '[a-z]{7,}')) > 0
      |               THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_docs_with_pii,
      |  CAST(COALESCE(SUM(len(regexp_extract_all(text, '[a-z]{7,}'))), 0) AS BIGINT)
      |    AS n_matches,
      |  round(CAST(SUM(CASE WHEN len(regexp_extract_all(text, '[a-z]{7,}')) > 0
      |             THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) + 0 AS exposure_rate
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin

  /** Source blocklist — the CCNet/RefinedWeb URL-filter gate between
    * ingest and quality scoring, expressed as a CONFIG RELATION (the
    * production shape: a curated domain blocklist joins the corpus,
    * it is not code). Two rule kinds, both exercised: exact source
    * entries and a regex pattern (the "subdomain family" rule).
    * Fixture instantiation follows the % 11 / % 50 convention of
    * planting a deterministic blocked population in the synthetic
    * sources so the gate's discrimination is oracle-checked. */
  val BlockedSourcesExact: Seq[String] = Seq("src3", "src7", "src12")

  /** Pattern rule: blocks the src18/src19 "family". */
  val BlockedSourcePattern: String = "^src1[89]$"

  /** Per-source keep decisions against an EXPLICIT blocklist
    * relation — the operator proper, decoupled from any fixture
    * list: `blocklist` rows are (entry, kind) where kind `exact`
    * matches the source verbatim and kind `pattern` treats the
    * entry as an anchored regex. `rule` names which arm fired (NULL
    * = kept; exact wins over pattern when both match — min over the
    * matched kinds), so the audit shows WHY a source dropped, not
    * only that it did. The doc-level gate a curation run applies is
    * the same broadcast join minus the per-source rollup.
    *
    * Scale shape: the blocklist is a config relation (KBs) —
    * broadcast (the pattern arm is a nested-loop probe against the
    * broadcast side, bounded by sources × rules, never corpus-
    * sized); the corpus side is one per-source count aggregation.
    * Group keys are the handful of sources. */
  def urlFilterAgainst(docs: DataFrame, blocklist: DataFrame): DataFrame =
    docs
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .join(broadcast(blocklist),
        (col("kind") === "exact" && col("source") === col("entry")) ||
          (col("kind") === "pattern" && rlike(col("source"), col("entry"))),
        "left")
      .groupBy(col("source"), col("n_docs"))
      .agg(min(col("kind")).as("rule"))
      .select(col("source"), col("n_docs"), col("rule"),
        when(col("rule").isNull, 1).otherwise(0).as("keep"))
      .orderBy(col("source"))

  /** The registered blocklist gate: [[urlFilterAgainst]] over the
    * fixture config relation ([[BlockedSourcesExact]] +
    * [[BlockedSourcePattern]]). */
  def urlFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bl = (BlockedSourcesExact.map(e => (e, "exact")) :+
        (BlockedSourcePattern, "pattern"))
      .toDF("entry", "kind")
    urlFilterAgainst(t(s, dir, "documents"), bl)
  }

  /** Oracle mirror: the same config VALUES relation, the same
    * exact-or-regex join arms, min(kind) precedence. */
  val urlFilterSql: String = {
    val entries = (BlockedSourcesExact.map(e => s"('$e', 'exact')") :+
      s"('$BlockedSourcePattern', 'pattern')").mkString(", ")
    s"""WITH uf_bl AS (SELECT * FROM (VALUES $entries) b(entry, kind)),
       |uf_c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source)
       |SELECT c.source, CAST(c.n_docs AS BIGINT) AS n_docs,
       |  MIN(b.kind) AS rule,
       |  CASE WHEN MIN(b.kind) IS NULL THEN 1 ELSE 0 END AS keep
       |FROM uf_c c LEFT JOIN uf_bl b
       |  ON (b.kind = 'exact' AND c.source = b.entry)
       |  OR (b.kind = 'pattern' AND regexp_matches(c.source, b.entry))
       |GROUP BY c.source, c.n_docs
       |ORDER BY c.source""".stripMargin
  }

  /** License/robots marker table for [[licenseReport]] — a CONFIG
    * relation of (marker, pattern, class) rows, the license-signal
    * scan a compliance review runs between ingest and training
    * (creative-commons markers, all-rights-reserved phrases,
    * robots/noai opt-outs). The fixture patterns are word-soup
    * stand-ins, the [[piiReport]] `[a-z]{7,}` convention: `vector`
    * plays the permissive CC phrase, `value` the restrictive
    * rights phrase, `dup` the robots/noai opt-out — chosen so every
    * class fires on the synthetic corpus and the per-class
    * accounting is oracle-checked, not vacuously zero. */
  val LicenseMarkers: Seq[(String, String, String)] = Seq(
    ("cc_marker", "\\bvector\\b", "permissive"),
    ("rights_marker", "\\bvalue\\b", "restrictive"),
    ("noai_marker", "\\bdup\\b", "robots"))

  /** Per-(source, marker) license-signal audit: docs scanned, docs
    * flagged, total marker hits, flag rate. A source whose
    * restrictive-rate spikes is a takedown conversation, a robots
    * spike is a crawl-compliance bug — per-source attribution is the
    * actionable grain, the [[piiReport]] convention.
    *
    * Scale shape: ONE corpus pass — every marker counts in the same
    * map-side projection (no per-marker rescan), one per-source
    * aggregation of 2·markers integers, stacked to long format (the
    * threshold-sweep shape: grid × sources rows out of one pass). */
  /** [[licenseReport]] over an EXPLICIT marker table — the operator
    * proper: the (marker, pattern, class) config COMPILES into one
    * map-side projection (a join against a pattern relation would
    * explode the corpus × markers; compiling keeps it ONE scan with
    * every marker counted per row), so a config change is a job
    * restart, the frozen-model convention. */
  def licenseReportFor(
      docs: DataFrame, markers: Seq[(String, String, String)]): DataFrame = {
    val cnts = markers.zipWithIndex.map { case ((_, pat, _), i) =>
      regexp_count(col("text"), lit(pat)).as(s"c$i")
    }
    val aggs = markers.zipWithIndex.flatMap { case (_, i) => Seq(
      coalesce(sum(when(col(s"c$i") > 0, 1L).otherwise(0L)), lit(0L)).as(s"f$i"),
      coalesce(sum(col(s"c$i").cast("long")), lit(0L)).as(s"m$i"))
    }
    val stackExpr = markers.zipWithIndex
      .map { case ((m, _, cls), i) => s"'$m', '$cls', f$i, m$i" }
      .mkString(", ")
    docs.select(col("source") +: cnts: _*)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), aggs: _*)
      .selectExpr("source", "n_docs",
        s"stack(${markers.size}, $stackExpr) " +
          "AS (marker, license_class, n_flagged, n_matches)")
      .withColumn("flag_rate",
        r6(col("n_flagged").cast("double") / col("n_docs")))
      .select(col("source"), col("marker"), col("license_class"),
        col("n_docs"), col("n_flagged"), col("n_matches"), col("flag_rate"))
      .orderBy(col("source"), col("marker"))
  }

  def licenseReport(s: SparkSession, dir: String): DataFrame =
    licenseReportFor(t(s, dir, "documents"), LicenseMarkers)

  val licenseReportSql: String = {
    val cells = LicenseMarkers.zipWithIndex.map { case ((_, pat, _), i) =>
      s"""SUM(CASE WHEN len(regexp_extract_all(text, '$pat')) > 0
         |      THEN 1 ELSE 0 END) AS f$i,
         |    SUM(len(regexp_extract_all(text, '$pat'))) AS m$i""".stripMargin
    }.mkString(",\n    ")
    val rows = LicenseMarkers.zipWithIndex.map { case ((m, _, cls), i) =>
      s"""SELECT source, '$m' AS marker, '$cls' AS license_class,
         |  CAST(n_docs AS BIGINT) AS n_docs,
         |  CAST(f$i AS BIGINT) AS n_flagged, CAST(m$i AS BIGINT) AS n_matches,
         |  round(CAST(f$i AS DOUBLE) / n_docs, 6) + 0 AS flag_rate
         |FROM lr_c""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH lr_c AS MATERIALIZED (
       |  SELECT source, COUNT(*) AS n_docs,
       |    $cells
       |  FROM documents GROUP BY source)
       |$rows
       |ORDER BY source, marker""".stripMargin
  }

  /** Stratified balancing: downsample every language to the smallest
    * language's count, picking survivors in md5 order (deterministic,
    * engine-independent). NOTE the rank-based exact variant here has
    * one reducer per stratum — fine for 5 langs; at 100 TB with many
    * strata use [[sampleHash]] with per-stratum thresholds (pure map)
    * and accept approximate counts. */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val rn = row_number().over(Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id")))
    val ranked = d.select(col("doc_id"), col("lang")).withColumn("rn", rn)
    val counts = d.groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
    val minCount = counts.agg(min(col("n_total")).as("mn"))
    ranked.crossJoin(broadcast(minCount))
      .filter(col("rn") <= col("mn"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"))
      .join(broadcast(counts), Seq("lang"))
      .select(col("lang"), col("n_total"), col("n_sampled"))
      .orderBy(col("lang"))
  }

  val stratifiedSampleSql: String =
    """WITH ranked AS (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents),
      |counts AS (SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY lang),
      |m AS (SELECT MIN(n_total) AS mn FROM counts)
      |SELECT r.lang, c.n_total, COUNT(*) AS n_sampled
      |FROM ranked r JOIN counts c USING (lang) CROSS JOIN m
      |WHERE r.rn <= m.mn
      |GROUP BY r.lang, c.n_total
      |ORDER BY r.lang""".stripMargin

  /** Training-mixture resampling: per-stratum hash-threshold rates
    * (downweight the dominant language to ~5%, keep the rest at
    * ~25%) — how a 100 TB corpus is re-weighted into a training mix
    * without shuffling the corpus: the keep decision is a pure map
    * on (lang, md5(key)); only the tiny per-stratum count
    * aggregation shuffles. Rates move by editing thresholds, and the
    * kept set is stable under cluster resizing and re-runs. */
  def mixtureSample(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val thr = when(col("lang") === "en", lit("0d")).otherwise(lit("40"))
    val bucket =
      substring(md5(concat(lit("mix:"), col("doc_id").cast("string"))), 1, 2)
    val kept = d.filter(bucket < thr)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
    d.groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
      .join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_total"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy(col("lang"))
  }

  val mixtureSampleSql: String =
    """WITH b AS (SELECT lang,
      |    substring(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
      |  FROM documents),
      |k AS (SELECT lang, COUNT(*) AS n_kept FROM b
      |      WHERE bucket < CASE WHEN lang = 'en' THEN '0d' ELSE '40' END
      |      GROUP BY lang),
      |c AS (SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY lang)
      |SELECT c.lang, c.n_total, COALESCE(k.n_kept, 0) AS n_kept
      |FROM c LEFT JOIN k USING (lang)
      |ORDER BY c.lang""".stripMargin

  /** Token-budget shard packing: within each source, docs (in doc_id
    * order) are greedily assigned to ~500-token training shards via
    * a running prefix sum. Per-source windows keep the running sum
    * partition-parallel — a single global ORDER BY would funnel the
    * whole corpus through one task. */
  def shardPack(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val nTokens = size(ws).cast("long")
    val cum = sum(col("n_tokens")).over(
      Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    d.select(col("doc_id"), col("source"), nTokens.as("n_tokens"))
      .withColumn("shard",
        floor((cum - col("n_tokens")) / lit(500.0)).cast("long"))
      .groupBy(col("source"), col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
      .orderBy(col("source"), col("shard"))
  }

  val shardPackSql: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, source, n_tokens,
      |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM d)
      |SELECT source,
      |  CAST(floor((cum - n_tokens) / 500.0) AS BIGINT) AS shard,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
      |FROM c
      |GROUP BY source, CAST(floor((cum - n_tokens) / 500.0) AS BIGINT)
      |ORDER BY source, shard""".stripMargin

  /** The composed per-doc curation decision an actual pipeline
    * runs: exact-dup survivorship (window min over the text group —
    * no join against a survivor list) ∧ Gopher quality ∧ language
    * confidence ∧ length gate. Each signal stays an int flag so the
    * final keep AND the reason for every drop are both in the
    * output — the auditability a 100 TB curation pass needs. */
  def curationPipeline(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents", resplit = true)
    val g = gopherQuality(s, dir)
      .select(col("doc_id"), col("keep").as("gopher_keep"))
    val l = TextOps.langId(s, dir)
      .select(col("doc_id"), (col("marker_hits") >= 1).cast("int").as("lang_ok"))
    val w = Window.partitionBy(col("text"))
    val sv = d.select(col("doc_id"), col("n_chars"),
      (col("doc_id") === min(col("doc_id")).over(w)).cast("int").as("is_survivor"))
    sv.join(g, "doc_id").join(l, "doc_id")
      .withColumn("len_ok", col("n_chars").between(50, 100000).cast("int"))
      .withColumn("keep",
        (col("is_survivor") === 1 && col("gopher_keep") === 1 &&
          col("lang_ok") === 1 && col("len_ok") === 1).cast("int"))
      .select(col("doc_id"), col("is_survivor"), col("gopher_keep"),
        col("lang_ok"), col("len_ok"), col("keep"))
      .orderBy(col("doc_id"))
  }

  val curationPipelineSql: String =
    """WITH b AS (
      |  SELECT doc_id, text, string_split(text, ' ') AS w,
      |    len(string_split(text, ' ')) AS n_words
      |  FROM documents),
      |m AS (
      |  SELECT doc_id, n_words,
      |    CAST(list_max(list_transform(list_distinct(w),
      |      x -> len(list_filter(w, y -> y = x)))) AS DOUBLE) / n_words AS twf,
      |    CASE WHEN n_words >= 2 THEN
      |      1.0 - CAST(len(list_distinct([w[i] || ' ' || w[i+1]
      |              FOR i IN generate_series(1, len(w) - 1)])) AS DOUBLE)
      |            / (n_words - 1)
      |    ELSE 0.0 END AS dup_frac,
      |    CAST(length(text) - n_words + 1 AS DOUBLE) / n_words AS mwl
      |  FROM b),
      |g AS (
      |  SELECT doc_id,
      |    CASE WHEN twf <= 0.12 AND dup_frac <= 0.1
      |          AND mwl >= 3.0 AND mwl <= 10.0 THEN 1 ELSE 0 END AS gopher_keep
      |  FROM m),
      |lh AS (
      |  SELECT doc_id,
      |    greatest(
      |      len(list_filter(w, x -> x IN ('the','a','and','of','is'))),
      |      len(list_filter(w, x -> x IN ('der','die','das','und','ist'))),
      |      len(list_filter(w, x -> x IN ('el','la','los','es','y'))),
      |      len(list_filter(w, x -> x IN ('le','la','les','est','et'))),
      |      len(list_filter(w, x -> x IN ('de','shi','le','zai','he')))) AS hits
      |  FROM b),
      |sv AS (
      |  SELECT doc_id, n_chars,
      |    CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY text)
      |         THEN 1 ELSE 0 END AS is_survivor
      |  FROM documents)
      |SELECT sv.doc_id, sv.is_survivor, g.gopher_keep,
      |  CASE WHEN lh.hits >= 1 THEN 1 ELSE 0 END AS lang_ok,
      |  CASE WHEN sv.n_chars BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS len_ok,
      |  CASE WHEN sv.is_survivor = 1 AND g.gopher_keep = 1
      |        AND lh.hits >= 1 AND sv.n_chars BETWEEN 50 AND 100000
      |       THEN 1 ELSE 0 END AS keep
      |FROM sv
      |JOIN g ON g.doc_id = sv.doc_id
      |JOIN lh ON lh.doc_id = sv.doc_id
      |ORDER BY sv.doc_id""".stripMargin

  /** Domain-level curation — the C4/Gopher "filter by source" step:
    * per-source rollup of doc count, exact-dup rate (md5 fingerprint
    * groups), mean length, mean type-token ratio, and a keep
    * decision. At 100 TB this is the cheap first gate: one
    * hash-partitioned aggregation over ~millions of domains prunes
    * whole sources before any per-document scoring runs. Integer
    * sums stay exact; the TTR mean goes through r6 + the decimal
    * bridge. */
  def sourceCuration(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val per = d.select(
      col("source"), col("n_chars"),
      md5(col("text")).as("fp"),
      TextOps.ttrOf(ws).as("ttr"))
    per.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        r6(lit(1.0) - countDistinct(col("fp")).cast("double") / count(lit(1)))
          .as("dup_rate"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
        r6(graft.functions.OracleMath.davg(col("ttr"))).as("avg_ttr"))
      .withColumn("keep",
        (col("dup_rate") <= 0.2 && col("avg_ttr") >= 0.5 && col("avg_chars") >= 260.0)
          .cast("int"))
      .orderBy(col("source"))
  }

  val sourceCurationSql: String =
    """WITH per AS (
      |  SELECT source, n_chars, md5(text) AS fp,
      |    round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |      / len(string_split(text, ' ')), 6) + 0 AS ttr
      |  FROM documents)
      |SELECT source, n_docs, dup_rate, avg_chars, avg_ttr,
      |  CASE WHEN dup_rate <= 0.2 AND avg_ttr >= 0.5 AND avg_chars >= 260.0
      |       THEN 1 ELSE 0 END AS keep
      |FROM (
      |  SELECT source, COUNT(*) AS n_docs,
      |    round(1.0 - CAST(COUNT(DISTINCT fp) AS DOUBLE) / COUNT(*), 6) + 0 AS dup_rate,
      |    CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
      |    round(CAST(SUM(CAST(ttr AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) + 0 AS avg_ttr
      |  FROM per
      |  GROUP BY source)
      |ORDER BY source""".stripMargin

  /** Token capacity of one packed training sequence. */
  val SeqCapacity = 800L

  /** The next-fit fold as a PURE kernel (KernelPropertySpec laws:
    * order/token conservation, per-bin capacity, contiguous seq
    * ids): docs as (id, n) in pack order, out (id, seq, n). */
  private[graft] def nextFitPack(
      docs: Seq[(Long, Long)], cap: Long = SeqCapacity): Seq[(Long, Long, Long)] = {
    var seq = 0L
    var running = 0L
    docs.map { case (id, n) =>
      if (running > 0 && running + n > cap) { seq += 1; running = n }
      else running += n
      (id, seq, n)
    }
  }

  private val packUdf = udf { (docs: Seq[org.apache.spark.sql.Row]) =>
    nextFitPack(docs.map(r => (r.getLong(0), r.getLong(1))))
  }

  /** Sequence packing — the "fill fixed context windows" step that
    * turns curated documents into training samples: docs in doc_id
    * order pack next-fit into [[SeqCapacity]]-token sequences (a doc
    * that would overflow starts the next sequence; docs longer than
    * the capacity are truncated to it). The fold is inherently
    * sequential WITHIN a source but sources pack independently, so
    * the operator is partition-parallel across the corpus — same
    * parallel shape as shardPack, different semantics (next-fit
    * with reset vs cumulative-offset binning; a doc never straddles
    * two sequences here). A pathological single source with millions
    * of docs would need a pre-pass salting the source key into
    * bounded segments; the fixture's sources are bounded. */
  def seqPack(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    d.select(col("source"),
        struct(col("doc_id"),
          least(size(ws).cast("long"), lit(SeqCapacity)).as("n")).as("dn"))
      .groupBy(col("source"))
      .agg(sort_array(collect_list(col("dn"))).as("docs"))
      .select(col("source"), explode(packUdf(col("docs"))).as("p"))
      .select(col("source"), col("p._2").as("seq"), col("p._3").as("n_eff"))
      .groupBy(col("source"), col("seq"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_eff")).as("sum_tokens"),
        r6(sum(col("n_eff")).cast("double") / SeqCapacity).as("fill"))
      .orderBy(col("source"), col("seq"))
  }

  /** Oracle mirror of [[seqPack]]: the next-fit fold replayed as a
    * recursive CTE stepping one doc per level across all sources at
    * once (same shape as the chunker oracle). */
  val seqPackSql: String =
    s"""WITH RECURSIVE d AS (
       |  SELECT source, doc_id,
       |    LEAST(CAST(len(string_split(text, ' ')) AS BIGINT), $SeqCapacity) AS n
       |  FROM documents),
       |ord AS (
       |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY doc_id) AS i
       |  FROM d),
       |step(source, i, n, running, seq) AS (
       |  SELECT source, i, n, n, CAST(0 AS BIGINT) FROM ord WHERE i = 1
       |  UNION ALL
       |  SELECT o.source, o.i, o.n,
       |    CASE WHEN s.running + o.n > $SeqCapacity THEN o.n
       |         ELSE s.running + o.n END,
       |    CASE WHEN s.running + o.n > $SeqCapacity THEN s.seq + 1 ELSE s.seq END
       |  FROM step s JOIN ord o ON o.source = s.source AND o.i = s.i + 1)
       |SELECT source, seq, COUNT(*) AS n_docs,
       |  CAST(SUM(n) AS BIGINT) AS sum_tokens,
       |  round(CAST(SUM(n) AS DOUBLE) / $SeqCapacity, 6) + 0 AS fill
       |FROM step
       |GROUP BY source, seq
       |ORDER BY source, seq""".stripMargin

  /** Packing-efficiency audit: per source, bins used by the next-fit
    * pack vs the offline lower bound ⌈Σn / capacity⌉, mean fill, and
    * the overhead ratio — the number a training-throughput owner
    * reads before deciding whether smarter packing ([[packBfd]]) is
    * worth running. Pure aggregation over [[seqPack]]'s per-bin
    * relation (cost = the pack it audits). */
  def packEfficiency(s: SparkSession, dir: String): DataFrame =
    seqPack(s, dir)
      .groupBy(col("source"))
      .agg(
        (max(col("seq")) + 1).as("bins_used"),
        sum(col("sum_tokens")).as("total_tokens"),
        r6(OracleMath.davg(col("fill"))).as("mean_fill"))
      .withColumn("lower_bound",
        ceil(col("total_tokens").cast("double") / SeqCapacity).cast("long"))
      .select(col("source"), col("bins_used"), col("total_tokens"),
        col("lower_bound"), col("mean_fill"),
        r6(col("bins_used").cast("double") / col("lower_bound")).as("overhead"))
      .orderBy(col("source"))

  lazy val packEfficiencySql: String =
    s"""WITH pack AS MATERIALIZED (SELECT * FROM ($seqPackSql))
       |SELECT source,
       |  CAST(MAX(seq) + 1 AS BIGINT) AS bins_used,
       |  CAST(SUM(sum_tokens) AS BIGINT) AS total_tokens,
       |  CAST(ceil(CAST(SUM(sum_tokens) AS DOUBLE) / $SeqCapacity) AS BIGINT) AS lower_bound,
       |  round(CAST(SUM(CAST(fill AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) + 0 AS mean_fill,
       |  round(CAST(MAX(seq) + 1 AS DOUBLE)
       |        / ceil(CAST(SUM(sum_tokens) AS DOUBLE) / $SeqCapacity), 6) + 0 AS overhead
       |FROM pack
       |GROUP BY source
       |ORDER BY source""".stripMargin

  /** The best-fit fold as a PURE kernel (KernelPropertySpec laws:
    * capacity, conservation, never-worse-than-next-fit): docs as
    * (id, n) pre-sorted (n DESC, id ASC) by the caller. */
  private[graft] def bfdPack(
      docs: Seq[(Long, Long)], cap: Long = SeqCapacity): Seq[(Long, Long, Long)] = {
    val rem = scala.collection.mutable.ArrayBuffer[Long]()
    docs.map { case (id, n) =>
      var best = -1
      var i = 0
      while (i < rem.length) {
        if (rem(i) >= n && (best < 0 || rem(i) < rem(best))) best = i
        i += 1
      }
      if (best < 0) { rem += (cap - n); best = rem.length - 1 }
      else rem(best) -= n
      (id, best.toLong, n)
    }
  }

  private val bfdUdf = udf { (docs: Seq[org.apache.spark.sql.Row]) =>
    bfdPack(docs.map(r => (r.getLong(0), r.getLong(1))))
  }

  /** Best-fit-decreasing packing — the offline algorithm next-fit
    * leaves throughput on the table against (BFD is an 11/9·OPT+1
    * approximation; next-fit only 2·OPT): docs sorted longest-first,
    * each placed in the OPEN bin with the least remaining room that
    * still fits (ties → lowest bin), new bin only when none fits.
    * Same partition-parallel shape as [[seqPack]] — the fold is
    * sequential within a source (bin state is inherently serial),
    * sources pack independently; the per-source doc list rides one
    * collect_list, the bounded-source caveat shared with seqPack.
    * PackSpec asserts BFD never uses more bins than next-fit and
    * both conserve tokens. */
  def packBfd(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val sortKey = struct((lit(SeqCapacity + 1) - col("dn.n")).as("inv"),
      col("dn.doc_id").as("doc_id"))
    d.select(col("source"),
        struct(col("doc_id"),
          least(size(ws).cast("long"), lit(SeqCapacity)).as("n")).as("dn"))
      .select(col("source"), struct(sortKey.as("k"), col("dn").as("dn")).as("kd"))
      .groupBy(col("source"))
      .agg(sort_array(collect_list(col("kd"))).as("kds"))
      .select(col("source"),
        explode(bfdUdf(expr("transform(kds, x -> x.dn)"))).as("p"))
      .select(col("source"), col("p._2").as("seq"), col("p._3").as("n_eff"))
      .groupBy(col("source"), col("seq"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_eff")).as("sum_tokens"),
        r6(sum(col("n_eff")).cast("double") / SeqCapacity).as("fill"))
      .orderBy(col("source"), col("seq"))
  }

  /** The BFD fold replayed as a recursive CTE: per step, the fitting
    * open bin with minimal (remaining, index) wins via a packed
    * integer argmin; bin state is a remaining-capacity list carried
    * through the recursion (exact integer arithmetic end to end). */
  val packBfdSql: String =
    s"""WITH RECURSIVE d AS (
       |  SELECT source, doc_id,
       |    LEAST(CAST(len(string_split(text, ' ')) AS BIGINT), $SeqCapacity) AS n
       |  FROM documents),
       |ord AS (
       |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY n DESC, doc_id) AS i
       |  FROM d),
       |step(source, i, doc_id, n, bin, rem) AS (
       |  SELECT source, i, doc_id, n, CAST(1 AS BIGINT),
       |    [$SeqCapacity - n] FROM ord WHERE i = 1
       |  UNION ALL
       |  SELECT o.source, o.i, o.doc_id, o.n,
       |    CASE WHEN pick.key IS NULL THEN len(s.rem) + 1
       |         ELSE pick.key % 100000 END,
       |    CASE WHEN pick.key IS NULL THEN list_append(s.rem, $SeqCapacity - o.n)
       |         ELSE [CASE WHEN j = pick.key % 100000 THEN s.rem[j] - o.n
       |                    ELSE s.rem[j] END
       |               FOR j IN range(1, len(s.rem) + 1)] END
       |  FROM step s
       |  JOIN ord o ON o.source = s.source AND o.i = s.i + 1
       |  CROSS JOIN LATERAL (
       |    SELECT list_min([s.rem[j] * 100000 + j
       |                     FOR j IN range(1, len(s.rem) + 1)
       |                     IF s.rem[j] >= o.n]) AS key) pick)
       |SELECT source, CAST(bin - 1 AS BIGINT) AS seq, COUNT(*) AS n_docs,
       |  CAST(SUM(n) AS BIGINT) AS sum_tokens,
       |  round(CAST(SUM(n) AS DOUBLE) / $SeqCapacity, 6) + 0 AS fill
       |FROM step
       |GROUP BY source, bin
       |ORDER BY source, seq""".stripMargin

  /** Per-source unigram KL divergence against the corpus mixture —
    * the training-mix drift monitor: KL(P_src ‖ P_corpus) =
    * Σ_w p_s(w)·ln(p_s(w)/p_c(w)), the signal that a source's token
    * distribution is diverging from the blend it was weighted into
    * (rising KL on a crawl snapshot = re-examine its mixture weight;
    * near-zero = redundant with the blend). Every scored word exists
    * in the corpus by construction, so the unsmoothed ratio is total.
    * Shape at 100 TB: one token-stream aggregation, two marginal hash
    * aggs rejoined on their own keys, then a per-source fold — no
    * static broadcast hints on the vocab-sized sides (the
    * tfidf/unigram rule; the 1-row corpus total stays hinted). All
    * counts are exact integers; per-word terms r6-rounded then
    * decimal-summed, so the fold is order-free and cross-engine
    * exact. */
  def sourceKl(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val toks = d.select(col("source"), explode(split(col("text"), " ")).as("tok"))
    val csw = toks.groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
    val ts = csw.groupBy(col("source")).agg(sum(col("c")).as("ts"))
    val cw = csw.groupBy(col("tok")).agg(sum(col("c")).as("cw"))
    val tot = cw.agg(sum(col("cw")).as("tt"))
    csw.join(cw, "tok")
      .join(ts, "source")
      .crossJoin(broadcast(tot))
      .withColumn("term", r6((col("c").cast("double") / col("ts")) *
        log((col("c").cast("double") * col("tt")) /
          (col("ts").cast("double") * col("cw")))))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_words"),
        r6(graft.functions.OracleMath.dsum(col("term"))).as("kl"))
      .orderBy(col("source"))
  }

  val sourceKlSql: String =
    """WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
      |csw AS (SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
      |ts AS (SELECT source, SUM(c) AS ts FROM csw GROUP BY 1),
      |cw AS (SELECT tok, SUM(c) AS cw FROM csw GROUP BY 1),
      |tot AS (SELECT SUM(cw) AS tt FROM cw),
      |terms AS (
      |  SELECT source, c,
      |    round((CAST(c AS DOUBLE) / ts) *
      |          ln((CAST(c AS DOUBLE) * tt) / (CAST(ts AS DOUBLE) * cw)), 6) + 0 AS term
      |  FROM csw JOIN cw USING (tok) JOIN ts USING (source) CROSS JOIN tot)
      |SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(*) AS BIGINT) AS n_words,
      |  round(CAST(SUM(CAST(term AS DECIMAL(38,6))) AS DOUBLE), 6) + 0 AS kl
      |FROM terms GROUP BY source
      |ORDER BY source""".stripMargin

  /** Exponent of the temperature-sampling law (the multilingual
    * α-sampling convention: α < 1 upsamples small sources). */
  val MixAlpha = 0.3

  /** Temperature-based source sampling weights — the training-mix
    * computation behind multilingual/multi-source blends: w_s ∝ p_s^α
    * with p_s the source's token share, α = [[MixAlpha]] < 1 flattening
    * the natural distribution (small sources upsampled, head sources
    * downsampled — `boost` = w/p is that per-source factor, the rate
    * multiplier to feed [[mixtureSample]]). One aggregation over the
    * corpus, two scalar totals broadcast back — nothing heavier at any
    * corpus size. pow/division results r6-rounded, the rounded shares
    * decimal-summed, so both engines fold identically. */
  def mixtureWeights(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val per = d.groupBy(col("source"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
    val tot = per.agg(sum(col("n_tokens")).as("nt"))
    val scored = per.crossJoin(broadcast(tot))
      .withColumn("p", r6(col("n_tokens").cast("double") / col("nt")))
      .withColumn("q", r6(pow(col("p"), lit(MixAlpha))))
    val qt = scored.agg(graft.functions.OracleMath.dsum(col("q")).as("qt"))
    scored.crossJoin(broadcast(qt))
      .withColumn("w", r6(col("q") / col("qt")))
      .select(col("source"), col("n_tokens"), col("p"), col("w"),
        r6(col("w") / col("p")).as("boost"))
      .orderBy(col("source"))
  }

  val mixtureWeightsSql: String =
    s"""WITH per AS (
       |  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY source),
       |tot AS (SELECT SUM(n_tokens) AS nt FROM per),
       |scored AS (
       |  SELECT source, n_tokens,
       |    round(CAST(n_tokens AS DOUBLE) / nt, 6) + 0 AS p,
       |    round(pow(round(CAST(n_tokens AS DOUBLE) / nt, 6) + 0, $MixAlpha), 6) + 0 AS q
       |  FROM per CROSS JOIN tot),
       |qt AS (SELECT CAST(SUM(CAST(q AS DECIMAL(38,6))) AS DOUBLE) AS qt FROM scored)
       |SELECT source, n_tokens, p,
       |  round(q / qt, 6) + 0 AS w,
       |  round((round(q / qt, 6) + 0) / p, 6) + 0 AS boost
       |FROM scored CROSS JOIN qt
       |ORDER BY source""".stripMargin

  // ---- Temperature-scaled source mixing ----

  /** Sampling-temperature grid for [[sourceTemperatureMix]] —
    * chosen so 1/T is a chain of square roots (p, √p, √√p): IEEE
    * 754 requires sqrt to be CORRECTLY ROUNDED, so the weights are
    * bit-identical in the JVM and DuckDB with no pow()/libm
    * divergence risk (the float-bridge rule §8.5 applied to the
    * exponent choice itself). */
  val MixTemperatures: Seq[Double] = Seq(1.0, 2.0, 4.0)

  /** p^(1/T) as a sqrt chain of depth log2(T) — the ONLY float
    * bridge §8.5 allows for fractional exponents (sqrt is
    * correctly rounded in both engines; pow is not). Rejects
    * non-power-of-2 temperatures at class-init time so an edited
    * grid can never silently fall back to pow(). Both the Spark
    * explode arms and the DuckDB UNION ALL arms derive from THIS,
    * so editing [[MixTemperatures]] keeps operator and oracle in
    * lockstep by construction. */
  private[graft] def sqrtChain(t: Double, inner: String): String = {
    val k = math.round(math.log(t) / math.log(2.0)).toInt
    require(k >= 0 && math.pow(2.0, k.toDouble) == t,
      s"MixTemperatures entry $t is not a power of 2 — no exact sqrt chain")
    (1 to k).foldLeft(inner)((e, _) => s"sqrt($e)")
  }

  /** Temperature-scaled source sampling weights (the mT5/ROOTS
    * data-mixing knob): per source and temperature T, weight ∝
    * (natural word share)^(1/T), normalized — T=1 reproduces the
    * natural mix, higher T flattens toward uniform so low-resource
    * sources are up-sampled. Normalization goes through EXACT
    * integer micro-units (floor(w·1e6) as BIGINT, summed exactly)
    * because a cross-engine float SUM over sources is
    * order-dependent; the micro-unit sum is not. ONE per-source
    * aggregation scans the corpus (map-side partials); everything
    * after runs on ≤|sources| rows (a 3-key window over a 20-row
    * relation — driver-scale arithmetic expressed distributed). */
  /** Shared core of [[sourceTemperatureMixOf]] and
    * [[sourceEpochsReportOf]]: per (temperature, source) — word
    * count, grand total, natural share p, the exact micro-unit
    * weight w_int = floor(p^(1/T)·1e6), and the per-T weight sum.
    * ONE corpus aggregation; the grand total is a window over the
    * ≤|sources| relation (a second aggregate + cross join would
    * re-derive bySrc and scan the corpus twice — PlanSpec pins the
    * single scan); both downstream ops are projections of THIS, so
    * their shares and epochs can never disagree. */
  private def mixWeightsOf(d: DataFrame): DataFrame = {
    val bySrc = d.groupBy(col("source"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("n_words"))
    val wAll = Window.partitionBy(
      graft.functions.WindowKeys.boundedRankKey(col("source")))
    val p = bySrc
      .withColumn("w_total", sum(col("n_words")).over(wAll))
      .withColumn("p", col("n_words").cast("double") / col("w_total"))
    val arms = MixTemperatures.map(tv =>
      s"named_struct('t', CAST($tv AS DOUBLE), 'w', ${sqrtChain(tv, "p")})")
    val expanded = p.select(col("source"), col("n_words"), col("w_total"), col("p"),
        explode(expr(s"array(${arms.mkString(", ")})")).as("tw"))
      .select(col("source"), col("n_words"), col("w_total"), col("p"),
        col("tw.t").as("temperature"),
        floor(col("tw.w") * lit(1e6)).as("w_int"))
    val wT = Window.partitionBy(col("temperature"))
    expanded.withColumn("w_sum", sum(col("w_int")).over(wT))
  }

  def sourceTemperatureMixOf(d: DataFrame): DataFrame =
    mixWeightsOf(d)
      .select(col("temperature"), col("source"), col("n_words"),
        r6(col("p")).as("natural_share"),
        r6(when(col("w_sum") === 0, 0.0)
          .otherwise(col("w_int").cast("double") / col("w_sum"))).as("mix_share"))
      .orderBy(col("temperature"), col("source"))

  def sourceTemperatureMix(s: SparkSession, dir: String): DataFrame =
    sourceTemperatureMixOf(t(s, dir, "documents"))

  /** Oracle mirror — sqrt chains and micro-unit normalization
    * verbatim; the per-T expansion as UNION ALL arms (prefix
    * `tmx_`). */
  /** The shared tmx weight chain with a caller-chosen CTE prefix —
    * both consumers generate their chain from [[MixTemperatures]]
    * and [[sqrtChain]], under DISTINCT prefixes (the global
    * CTE-prefix-uniqueness rule: DuckDB shadowing can poison the
    * connection). */
  private def mixWeightsSqlChain(px: String): String = {
    val arms = MixTemperatures.map(tv =>
      s"""  SELECT source, n_words, p, CAST($tv AS DOUBLE) AS temperature,
         |    CAST(floor(${sqrtChain(tv, "p")} * 1e6) AS BIGINT) AS w_int FROM ${px}_p"""
        .stripMargin).mkString("\n  UNION ALL\n")
    s"""${px}_s AS MATERIALIZED (
      |  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_words
      |  FROM documents GROUP BY source),
      |${px}_p AS MATERIALIZED (
      |  SELECT source, n_words,
      |    CAST(n_words AS DOUBLE) /
      |      CAST((SELECT SUM(n_words) FROM ${px}_s) AS BIGINT) AS p
      |  FROM ${px}_s),
      |${px}_e AS (
      |$arms)""".stripMargin
  }

  val sourceTemperatureMixSql: String =
    s"""WITH ${mixWeightsSqlChain("tmx")}
      |SELECT temperature, source, n_words,
      |  round(p, 6) + 0 AS natural_share,
      |  round(CASE WHEN SUM(w_int) OVER (PARTITION BY temperature) = 0 THEN 0.0
      |             ELSE CAST(w_int AS DOUBLE) /
      |                  SUM(w_int) OVER (PARTITION BY temperature)
      |        END, 6) + 0 AS mix_share
      |FROM tmx_e
      |ORDER BY temperature, source""".stripMargin

  /** Effective epochs per source — the data-constrained-scaling
    * planning table (Muennighoff et al. 2023: past ~4 epochs,
    * repeated tokens stop paying): under the [[BudgetFrac]] token
    * budget and each [[MixTemperatures]] temperature, how many
    * times each source's natural supply is consumed (epochs =
    * allocated / natural tokens). T=1 gives every source the SAME
    * epoch count (the budget fraction — allocation proportional to
    * supply); higher T up-samples low-resource sources PAST 1×
    * exactly where repetition harm begins, which is what this table
    * exists to show before a mix is committed. A projection of the
    * SAME weight relation as [[sourceTemperatureMixOf]] (shares and
    * epochs cannot disagree); the budget is floor(frac·total) and
    * allocations floor(B·w/Σw) in IEEE doubles of exact integers —
    * identical in both engines. ONE corpus aggregation, everything
    * after on ≤|sources|·|T| rows. */
  def sourceEpochsReportOf(d: DataFrame): DataFrame =
    mixWeightsOf(d)
      .withColumn("budget_tokens",
        floor(lit(BudgetFrac) * col("w_total").cast("double")).cast("long"))
      .withColumn("alloc_tokens",
        when(col("w_sum") === 0, 0L).otherwise(
          floor(col("budget_tokens").cast("double") * col("w_int") / col("w_sum"))
            .cast("long")))
      .select(col("temperature"), col("source"), col("n_words"),
        col("budget_tokens"), col("alloc_tokens"),
        r6(when(col("n_words") === 0, 0.0)
          .otherwise(col("alloc_tokens").cast("double") / col("n_words")))
          .as("epochs"))
      .orderBy(col("temperature"), col("source"))

  def sourceEpochsReport(s: SparkSession, dir: String): DataFrame =
    sourceEpochsReportOf(t(s, dir, "documents"))

  /** Oracle mirror (prefix `sep_`): the SAME generated weight chain
    * under its own prefix, budget/alloc floors verbatim. LAZY:
    * [[BudgetFrac]] is declared later in this object, and an eager
    * val would interpolate its pre-init 0.0 (caught by the focused
    * verify — the engine side reads the constant at call time). The
    * require below makes a pre-init read (e.g. a refactor forcing
    * this lazy before [[BudgetFrac]]'s initializer runs) fail loudly
    * instead of silently baking 0.0 into the SQL. */
  lazy val sourceEpochsReportSql: String = {
    require(BudgetFrac > 0,
      "sourceEpochsReportSql forced before BudgetFrac initialization")
    s"""WITH ${mixWeightsSqlChain("sep")},
      |sep_b AS (
      |  SELECT CAST(floor($BudgetFrac *
      |    CAST((SELECT SUM(n_words) FROM sep_s) AS DOUBLE)) AS BIGINT) AS bgt)
      |SELECT temperature, source, n_words,
      |  bgt AS budget_tokens,
      |  CASE WHEN SUM(w_int) OVER (PARTITION BY temperature) = 0 THEN 0
      |       ELSE CAST(floor(CAST(bgt AS DOUBLE) * w_int /
      |                       SUM(w_int) OVER (PARTITION BY temperature)) AS BIGINT)
      |  END AS alloc_tokens,
      |  round(CASE WHEN n_words = 0 THEN 0.0
      |             ELSE CAST(CASE WHEN SUM(w_int) OVER (PARTITION BY temperature) = 0 THEN 0
      |                            ELSE CAST(floor(CAST(bgt AS DOUBLE) * w_int /
      |                                 SUM(w_int) OVER (PARTITION BY temperature)) AS BIGINT)
      |                       END AS DOUBLE) / n_words
      |        END, 6) + 0 AS epochs
      |FROM sep_e CROSS JOIN sep_b
      |ORDER BY temperature, source""".stripMargin
  }

  /** The dataset card — the per-language + grand-total summary a
    * corpus release publishes (HuggingFace dataset-card statistics
    * section): doc/source/token/char counts, mean length, and the
    * exact-duplicate rate, in ONE rollup aggregation. Counting
    * passes a release would otherwise run serially (per-lang, then
    * global) collapse into one grouping-sets Expand — a single scan
    * whatever the corpus size; the two COUNT(DISTINCT)s are the only
    * shuffle-heavy terms and partial-aggregate as usual. */
  def datasetCard(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("lang"), col("source"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("toks"),
        md5(col("text")).as("fp"))
      .rollup(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("toks")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        r6(sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
        r6(lit(1.0) - countDistinct(col("fp")).cast("double") / count(lit(1)))
          .as("dup_rate"),
        grouping(col("lang")).as("g"))
      // grouping() distinguishes the grand-total row from a literal
      // NULL-lang group — coalesce alone would label both 'TOTAL'
      // and make the ordered output nondeterministic
      .select(
        when(col("g") === 1, lit("TOTAL"))
          .otherwise(coalesce(col("lang"), lit("(none)"))).as("lang"),
        col("n_docs"), col("n_sources"), col("n_tokens"), col("n_chars"),
        col("avg_chars"), col("dup_rate"))
      .orderBy(col("lang"))

  val datasetCardSql: String =
    """SELECT CASE WHEN GROUPING(lang) = 1 THEN 'TOTAL'
      |       ELSE COALESCE(lang, '(none)') END AS lang,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
      |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
      |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
      |  round(CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) / COUNT(*), 6) + 0 AS avg_chars,
      |  round(1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*), 6) + 0 AS dup_rate
      |FROM documents
      |GROUP BY ROLLUP(lang)
      |ORDER BY CASE WHEN GROUPING(lang) = 1 THEN 'TOTAL'
      |         ELSE COALESCE(lang, '(none)') END""".stripMargin

  /** Leakage-safe train/val/test split (80/10/10) assigned at SOURCE
    * granularity: the split key is the md5 bucket of the source, not
    * the document, so every document of one source lands in ONE
    * split — the standard guard against near-duplicate leakage
    * across splits (same-source documents are the correlated ones;
    * a doc-keyed split would put a page and its mirror on opposite
    * sides of the train/test wall). Reported per split: document,
    * source, and token counts plus the realized document fraction.
    *
    * Same scale shape as [[sampleHash]]: assignment is a pure map
    * (no RNG state, no coordination — identical on 1 or 1000
    * executors; the rate moves by moving the cuts), one aggregation
    * pass; the 1-row corpus total is the only broadcast. */
  def dataSplit(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val assigned = d.withColumn("split", splitCol)
    val total = d.agg(count(lit(1)).as("n_total"))
    assigned
      .groupBy(col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
      .crossJoin(broadcast(total))
      .select(col("split"), col("n_docs"), col("n_sources"), col("n_tokens"),
        r6(col("n_docs").cast("double") / col("n_total")).as("frac_docs"))
      .orderBy(col("split"))
  }

  val dataSplitSql: String = {
    val h = graft.functions.CrossHash.sqlHash60("'split:' || source")
    s"""WITH a AS (
       |  SELECT CASE WHEN $h % 100 < 80 THEN 'train'
       |              WHEN $h % 100 < 90 THEN 'val'
       |              ELSE 'test' END AS split,
       |    source, len(string_split(text, ' ')) AS n_toks
       |  FROM documents),
       |tot AS (SELECT COUNT(*) AS n_total FROM documents)
       |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
       |  round(CAST(COUNT(*) AS DOUBLE) / n_total, 6) + 0 AS frac_docs
       |FROM a CROSS JOIN tot
       |GROUP BY split, n_total
       |ORDER BY split""".stripMargin
  }

  /** Train/test leakage audit — the check [[dataSplit]]'s
    * source-granular assignment is designed to pass for SAME-source
    * near-dups, and the one that catches what it cannot prevent:
    * near-duplicate pairs (the proven MinHash-LSH detector) whose
    * two documents landed in DIFFERENT splits. Any `leak = 1` row
    * with n_pairs > 0 is test-set contamination by paraphrase — the
    * quiet eval-inflation bug no within-split dedup can see. The
    * pair relation is the sub-quadratic LSH plan; split assignment
    * is a map-only hash; the 6-row split-pair grid left-joins the
    * counts so an empty cell reads 0 instead of vanishing (the
    * recall-report totality rule). */
  def splitLeakage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents")
    val splits = d.select(col("doc_id"), splitCol.as("split"))
    val pairs = Dedup.minhashLsh(s, dir).select(col("doc_a"), col("doc_b"))
    val counted = pairs
      .join(splits.select(col("doc_id").as("doc_a"), col("split").as("sa")), Seq("doc_a"))
      .join(splits.select(col("doc_id").as("doc_b"), col("split").as("sb")), Seq("doc_b"))
      .select(least(col("sa"), col("sb")).as("split_a"),
        greatest(col("sa"), col("sb")).as("split_b"))
      .groupBy(col("split_a"), col("split_b")).agg(count(lit(1)).as("n"))
    val grid = Seq(
      ("test", "test"), ("test", "train"), ("test", "val"),
      ("train", "train"), ("train", "val"), ("val", "val"))
      .toDF("split_a", "split_b")
    grid.join(counted, Seq("split_a", "split_b"), "left")
      .select(col("split_a"), col("split_b"),
        coalesce(col("n"), lit(0L)).as("n_pairs"),
        (col("split_a") =!= col("split_b")).cast("int").as("leak"))
      .orderBy(col("split_a"), col("split_b"))
  }

  lazy val splitLeakageSql: String = {
    val h = graft.functions.CrossHash.sqlHash60("'split:' || source")
    s"""WITH splits AS (
       |  SELECT doc_id, CASE WHEN $h % 100 < 80 THEN 'train'
       |                      WHEN $h % 100 < 90 THEN 'val'
       |                      ELSE 'test' END AS split
       |  FROM documents),
       |pred AS MATERIALIZED (
       |  SELECT doc_a, doc_b FROM (${Dedup.minhashLshSql})),
       |lab AS (
       |  SELECT least(sa.split, sb.split) AS split_a,
       |         greatest(sa.split, sb.split) AS split_b
       |  FROM pred p
       |  JOIN splits sa ON sa.doc_id = p.doc_a
       |  JOIN splits sb ON sb.doc_id = p.doc_b),
       |grid(split_a, split_b) AS (
       |  VALUES ('test','test'), ('test','train'), ('test','val'),
       |         ('train','train'), ('train','val'), ('val','val')),
       |cnt AS (SELECT split_a, split_b, COUNT(*) AS n FROM lab GROUP BY 1, 2)
       |SELECT g.split_a, g.split_b,
       |  CAST(coalesce(cnt.n, 0) AS BIGINT) AS n_pairs,
       |  CASE WHEN g.split_a <> g.split_b THEN 1 ELSE 0 END AS leak
       |FROM grid g LEFT JOIN cnt USING (split_a, split_b)
       |ORDER BY split_a, split_b""".stripMargin
  }

  /** The split hash shared by [[dataSplit]], [[splitLeakage]],
    * [[heldoutPpl]] and [[splitBalance]] — one definition so the
    * wall cannot drift between the assigner and its audits. */
  private def splitCol = {
    val b = graft.functions.CrossHash.md5Hash60Col(
      concat(lit("split:"), col("source"))) % 100
    when(b < 80, "train").when(b < 90, "val").otherwise("test")
  }

  private def splitCaseSql: String = {
    val h = graft.functions.CrossHash.sqlHash60("'split:' || source")
    s"""CASE WHEN $h % 100 < 80 THEN 'train'
       |     WHEN $h % 100 < 90 THEN 'val'
       |     ELSE 'test' END""".stripMargin.replace('\n', ' ').replaceAll(" +", " ")
  }

  /** Held-out perplexity — the train/test discipline the in-corpus
    * LM scores ([[Retrieval.unigramLogprob]] etc.) deliberately skip:
    * fit an add-1-smoothed unigram LM on the TRAIN split only, score
    * every split with the FROZEN model, and report per-split token
    * count, OOV rate, and mean per-doc NLL. Train's self-score is
    * the baseline row; a val/test NLL far above it (or a high OOV
    * rate) means the split wall actually held — memorized duplicates
    * would show as val ≈ train (the generalization-gap read, and the
    * reason eval perplexities must come from a held-out model).
    *
    * Scale: split tag is map-only; the model is ONE token aggregation
    * over the train partition; scoring joins the doc-term relation
    * with the model on the token key (hint-free — the tfidf rule);
    * V/T are a 1-row broadcast. Smoothing p(w) = (c+1)/(T+V+1) keeps
    * every OOV term finite — no special-casing in the fold. */
  def heldoutPpl(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val toks = d.select(col("doc_id"), splitCol.as("split"),
        explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("split"), col("tok"))
      .agg(count(lit(1)).as("n"))
    val model = toks.filter(col("split") === "train")
      .groupBy(col("tok")).agg(sum(col("n")).as("c"))
    val stats = model.agg(sum(col("c")).as("tt"), count(lit(1)).as("v"))
    val scored = toks.join(model, Seq("tok"), "left")
      .crossJoin(broadcast(stats))
      .withColumn("p", (coalesce(col("c"), lit(0L)) + lit(1L)).cast("double") /
        (col("tt") + col("v") + lit(1L)).cast("double"))
      .withColumn("term", r6(col("n") * log(col("p"))))
      .withColumn("oov", when(col("c").isNull, col("n")).otherwise(lit(0L)))
    val perDoc = scored.groupBy(col("doc_id"), col("split"))
      .agg(sum(col("n")).as("n_tokens"), sum(col("oov")).as("n_oov"),
        OracleMath.dsum(col("term")).as("sterm"))
      .withColumn("nll", r6(-col("sterm") / col("n_tokens")))
    perDoc.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        r6(sum(col("n_oov")).cast("double") / sum(col("n_tokens"))).as("oov_frac"),
        r6(OracleMath.davg(col("nll"))).as("mean_nll"))
      .orderBy(col("split"))
  }

  val heldoutPplSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, $splitCaseSql AS split, tok, COUNT(*) AS n
       |  FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
       |        FROM documents)
       |  GROUP BY 1, 2, 3),
       |model AS (SELECT tok, SUM(n) AS c FROM toks WHERE split = 'train' GROUP BY tok),
       |stats AS (SELECT SUM(c) AS tt, COUNT(*) AS v FROM model),
       |scored AS (
       |  SELECT t.doc_id, t.split, t.n,
       |    round(t.n * ln(CAST(coalesce(m.c, 0) + 1 AS DOUBLE)
       |                   / CAST(tt + v + 1 AS DOUBLE)), 6) + 0 AS term,
       |    CASE WHEN m.c IS NULL THEN t.n ELSE 0 END AS oov
       |  FROM toks t LEFT JOIN model m USING (tok) CROSS JOIN stats),
       |per_doc AS (
       |  SELECT doc_id, split, SUM(n) AS n_tokens, SUM(oov) AS n_oov,
       |    round(-CAST(SUM(CAST(term AS DECIMAL(38,6))) AS DOUBLE) / SUM(n), 6) + 0 AS nll
       |  FROM scored GROUP BY doc_id, split)
       |SELECT split, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       |  round(CAST(SUM(n_oov) AS DOUBLE) / SUM(n_tokens), 6) + 0 AS oov_frac,
       |  round(CAST(SUM(CAST(nll AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) + 0 AS mean_nll
       |FROM per_doc GROUP BY split
       |ORDER BY split""".stripMargin

  /** Split representativeness — the stratification audit beside
    * [[splitLeakage]]'s contamination one: per (split, lang) doc
    * share within the split vs the corpus-wide lang share, with the
    * absolute gap. A stratified-representative split reads ~0 gaps;
    * a source-granular split over lang-skewed sources can read
    * large ones (which is the trade [[dataSplit]] documents — this
    * measures it). The (split × lang) grid is total: an absent cell
    * reads share 0, not a missing row. All relations are
    * aggregate-sized; only the 1-row total is hinted. */
  def splitBalance(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val tagged = d.select(splitCol.as("split"), col("lang"))
    val cells = tagged.groupBy(col("split"), col("lang")).agg(count(lit(1)).as("n"))
    val splitTot = cells.groupBy(col("split")).agg(sum(col("n")).as("n_split"))
    val langTot = cells.groupBy(col("lang")).agg(sum(col("n")).as("n_lang"))
    val total = cells.agg(sum(col("n")).as("n_total"))
    val grid = splitTot.select(col("split")).crossJoin(langTot.select(col("lang")))
    grid.join(cells, Seq("split", "lang"), "left")
      .join(splitTot, Seq("split"))
      .join(langTot, Seq("lang"))
      .crossJoin(broadcast(total))
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .select(col("split"), col("lang"), col("n"),
        r6(col("n").cast("double") / col("n_split")).as("share_split"),
        r6(col("n_lang").cast("double") / col("n_total")).as("share_corpus"))
      .withColumn("gap", r6(abs(col("share_split") - col("share_corpus"))))
      .orderBy(col("split"), col("lang"))
  }

  val splitBalanceSql: String =
    s"""WITH tagged AS (
       |  SELECT $splitCaseSql AS split, lang FROM documents),
       |cells AS (SELECT split, lang, COUNT(*) AS n FROM tagged GROUP BY 1, 2),
       |st AS (SELECT split, SUM(n) AS n_split FROM cells GROUP BY split),
       |lt AS (SELECT lang, SUM(n) AS n_lang FROM cells GROUP BY lang),
       |tot AS (SELECT SUM(n) AS n_total FROM cells),
       |grid AS (SELECT st.split, lt.lang FROM st CROSS JOIN lt),
       |j AS (
       |  SELECT g.split, g.lang, CAST(coalesce(c.n, 0) AS BIGINT) AS n,
       |    round(CAST(coalesce(c.n, 0) AS DOUBLE) / st.n_split, 6) + 0 AS share_split,
       |    round(CAST(lt.n_lang AS DOUBLE) / tot.n_total, 6) + 0 AS share_corpus
       |  FROM grid g
       |  LEFT JOIN cells c ON c.split = g.split AND c.lang = g.lang
       |  JOIN st ON st.split = g.split
       |  JOIN lt ON lt.lang = g.lang
       |  CROSS JOIN tot)
       |SELECT split, lang, n, share_split, share_corpus,
       |  round(abs(share_split - share_corpus), 6) + 0 AS gap
       |FROM j
       |ORDER BY split, lang""".stripMargin

  /** Filter-funnel attrition report — the audit table every published
    * curation pipeline ships (C4, Gopher, FineWeb all report it):
    * apply [[curationPipeline]]'s rules in their pipeline order
    * (exact-dedup survivorship → Gopher quality → language ID →
    * length gate) and report, per stage, how many docs entered, how
    * many that stage killed, and how many survived. The numbers are
    * SEQUENTIAL (a stage only sees prior survivors), which is what
    * makes the table actionable — a rule with zero marginal kills is
    * dead weight however many docs it would have flagged alone.
    *
    * Scale shape: the per-doc flags are curationPipeline's proven
    * plan; the funnel itself is ONE scalar aggregation of conjunction
    * prefixes (int multiplies, exact) unpivoted to four rows — no
    * second pass, no per-stage scan. */
  def funnelReport(s: SparkSession, dir: String): DataFrame = {
    val f = curationPipeline(s, dir)
    val s1 = col("is_survivor")
    val s2 = s1 * col("gopher_keep")
    val s3 = s2 * col("lang_ok")
    val s4 = s3 * col("len_ok")
    f.agg(
        count(lit(1)).as("n0"),
        sum(s1.cast("long")).as("n1"),
        sum(s2.cast("long")).as("n2"),
        sum(s3.cast("long")).as("n3"),
        sum(s4.cast("long")).as("n4"))
      .selectExpr(
        """stack(4,
          |  CAST(1 AS BIGINT), 'exact_dedup', n0, n1,
          |  CAST(2 AS BIGINT), 'gopher_quality', n1, n2,
          |  CAST(3 AS BIGINT), 'lang_id', n2, n3,
          |  CAST(4 AS BIGINT), 'length', n3, n4) AS (stage, rule, n_in, n_out)"""
          .stripMargin)
      .select(col("stage"), col("rule"), col("n_in"),
        (col("n_in") - col("n_out")).as("n_killed"), col("n_out"))
      .orderBy(col("stage"))
  }

  val funnelReportSql: String =
    s"""WITH p AS (${curationPipelineSql.replace("ORDER BY sv.doc_id", "")}),
       |a AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n0,
       |    CAST(SUM(is_survivor) AS BIGINT) AS n1,
       |    CAST(SUM(is_survivor * gopher_keep) AS BIGINT) AS n2,
       |    CAST(SUM(is_survivor * gopher_keep * lang_ok) AS BIGINT) AS n3,
       |    CAST(SUM(is_survivor * gopher_keep * lang_ok * len_ok) AS BIGINT) AS n4
       |  FROM p)
       |SELECT stage, rule, n_in, n_in - n_out AS n_killed, n_out
       |FROM (
       |  SELECT CAST(1 AS BIGINT) AS stage, 'exact_dedup' AS rule, n0 AS n_in, n1 AS n_out FROM a
       |  UNION ALL
       |  SELECT CAST(2 AS BIGINT), 'gopher_quality', n1, n2 FROM a
       |  UNION ALL
       |  SELECT CAST(3 AS BIGINT), 'lang_id', n2, n3 FROM a
       |  UNION ALL
       |  SELECT CAST(4 AS BIGINT), 'length', n3, n4 FROM a)
       |ORDER BY stage""".stripMargin

  /** Fraction of the corpus's tokens the budget sample keeps. */
  val BudgetFrac = 0.25

  /** Token-budget sampling — the step that turns "10T-token corpus,
    * 2.5T-token training run" into an actual document selection:
    * a global token budget ([[BudgetFrac]] of the corpus) is
    * allocated across sources by temperature-α=0.5 weights
    * (w ∝ √tokens, the standard up-weight-the-tail allocation
    * [[mixtureWeights]] reports as weights — materialized here as a
    * SELECTION), then each source fills its allocation in
    * deterministic hash order until the next doc would overflow it.
    * Hash-order fill means the kept set is stable under re-runs and
    * cluster resizing, and adjusting [[BudgetFrac]] only moves the
    * waterline — survivors never reshuffle.
    *
    * Scale shape: per-source token totals are one aggregation; the
    * allocation table is sources-sized and broadcast back; the fill
    * is one prefix-sum window per source (partition-parallel, the
    * shardPack shape); the report is one more per-source
    * aggregation. A mega-source makes its window sort-heavy — the
    * documented swap is bucketing the hash into fixed quantile
    * slabs (the sampleHash pattern) at the cost of approximate
    * fill. */
  def tokenBudgetSample(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.OracleMath
    val d = t(s, dir, "documents")
    val docs = d.select(col("doc_id"), col("source"),
      size(ws).cast("long").as("n_tok"),
      md5(concat(lit("tb:"), col("doc_id").cast("string"))).as("h"))
    val per = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        r6(sqrt(sum(col("n_tok")).cast("double"))).as("rt"))
    val tot = per.agg(sum(col("n_tokens")).as("tt"),
      OracleMath.dsum(col("rt")).as("rtsum"))
    val alloc = per.crossJoin(broadcast(tot))
      .withColumn("budget", floor(lit(BudgetFrac) * col("tt").cast("double")))
      .withColumn("w", r6(col("rt") / col("rtsum")))
      .withColumn("alloc_tokens",
        floor(col("budget").cast("double") * col("w")).cast("long"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("alloc_tokens"))
    val wnd = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = docs.withColumn("cum", sum(col("n_tok")).over(wnd))
      .join(alloc.select(col("source"), col("alloc_tokens")), "source")
      .filter(col("cum") <= col("alloc_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_tok")).as("kept_tokens"))
    alloc.join(filled, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"), col("alloc_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
      .orderBy(col("source"))
  }

  val tokenBudgetSampleSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |    md5('tb:' || CAST(doc_id AS VARCHAR)) AS h
       |  FROM documents),
       |per AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       |    round(sqrt(CAST(CAST(SUM(n_tok) AS BIGINT) AS DOUBLE)), 6) + 0 AS rt
       |  FROM docs GROUP BY source),
       |tot AS (
       |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS tt,
       |    CAST(SUM(CAST(rt AS DECIMAL(38,6))) AS DOUBLE) AS rtsum
       |  FROM per),
       |alloc AS (
       |  SELECT source, n_docs, n_tokens,
       |    CAST(floor(floor($BudgetFrac * CAST(tt AS DOUBLE))
       |               * (round(rt / rtsum, 6) + 0)) AS BIGINT) AS alloc_tokens
       |  FROM per CROSS JOIN tot),
       |filled AS (
       |  SELECT d.source, COUNT(*) AS n_kept, SUM(d.n_tok) AS kept_tokens
       |  FROM (
       |    SELECT source, n_tok,
       |      SUM(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |    FROM docs) d
       |  JOIN alloc a ON a.source = d.source
       |  WHERE d.cum <= a.alloc_tokens
       |  GROUP BY d.source)
       |SELECT a.source, a.n_docs, a.n_tokens, a.alloc_tokens,
       |  CAST(coalesce(f.n_kept, 0) AS BIGINT) AS n_kept,
       |  CAST(coalesce(f.kept_tokens, 0) AS BIGINT) AS kept_tokens
       |FROM alloc a LEFT JOIN filled f ON f.source = a.source
       |ORDER BY a.source""".stripMargin

  /** Token-exact sequence packing — [[seqPack]] with the lengths a
    * training run actually bills: per-doc BPE PIECE counts from the
    * trained tokenizer ([[Bpe.bpeEncode]]) instead of whitespace
    * token counts. Whitespace packing under-fills windows exactly
    * where subword fertility is high (rare words split into many
    * pieces), which is why production packers measure in pieces;
    * running both queries side by side quantifies that gap on this
    * corpus. Same partition-parallel per-source next-fit fold; the
    * piece counts add one doc_id-keyed join over the proven encode
    * relation. */
  def bpePack(s: SparkSession, dir: String): DataFrame = {
    val pieces = Bpe.bpeEncode(s, dir)
      .select(col("doc_id"), least(col("n_pieces"), lit(SeqCapacity)).as("n"))
    val d = t(s, dir, "documents").select(col("doc_id"), col("source"))
    d.join(pieces, "doc_id")
      .select(col("source"), struct(col("doc_id"), col("n")).as("dn"))
      .groupBy(col("source"))
      .agg(sort_array(collect_list(col("dn"))).as("docs"))
      .select(col("source"), explode(packUdf(col("docs"))).as("p"))
      .select(col("source"), col("p._2").as("seq"), col("p._3").as("n_eff"))
      .groupBy(col("source"), col("seq"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_eff")).as("sum_pieces"),
        r6(sum(col("n_eff")).cast("double") / SeqCapacity).as("fill"))
      .orderBy(col("source"), col("seq"))
  }

  /** Oracle: the proven BPE encode chain supplies per-doc piece
    * counts; the next-fit fold replays as the seqPack recursive CTE
    * over them. */
  lazy val bpePackSql: String =
    s"""${Bpe.bpeEncodePrefixCtes},
       |pp AS MATERIALIZED (
       |  SELECT doc_id, CAST(SUM(c * np) AS BIGINT) AS n_pieces
       |  FROM tokc JOIN enc USING (word)
       |  GROUP BY doc_id),
       |d AS MATERIALIZED (
       |  SELECT dd.source, dd.doc_id, LEAST(pp.n_pieces, $SeqCapacity) AS n
       |  FROM documents dd JOIN pp ON pp.doc_id = dd.doc_id),
       |ord AS MATERIALIZED (
       |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY doc_id) AS i
       |  FROM d),
       |step(source, i, n, running, seq) AS (
       |  SELECT source, i, n, n, CAST(0 AS BIGINT) FROM ord WHERE i = 1
       |  UNION ALL
       |  SELECT o.source, o.i, o.n,
       |    CASE WHEN s.running + o.n > $SeqCapacity THEN o.n
       |         ELSE s.running + o.n END,
       |    CASE WHEN s.running + o.n > $SeqCapacity THEN s.seq + 1 ELSE s.seq END
       |  FROM step s JOIN ord o ON o.source = s.source AND o.i = s.i + 1)
       |SELECT source, seq, COUNT(*) AS n_docs,
       |  CAST(SUM(n) AS BIGINT) AS sum_pieces,
       |  round(CAST(SUM(n) AS DOUBLE) / $SeqCapacity, 6) + 0 AS fill
       |FROM step
       |GROUP BY source, seq
       |ORDER BY source, seq""".stripMargin

  /** Block width (words) and same-source doc-frequency threshold for
    * [[boilerplateReport]]: a block carried by at least
    * [[BoilerMinDf]] distinct docs of ITS OWN source is template
    * scaffolding, not content. */
  val BoilerBlockWords = 10
  val BoilerMinDf = 3

  /** Per-doc boilerplate fraction — the jusText/CCNet-class template
    * signal the quality suite was missing: navigation, license and
    * footer blocks repeat across a SITE's pages (so the frequency is
    * counted within the doc's source, never globally — a common
    * English sentence is not boilerplate), and a doc dominated by
    * such blocks is scaffolding, not content. Each doc splits into
    * non-overlapping [[BoilerBlockWords]]-word blocks (deterministic
    * alignment, tail partial dropped); a block is boilerplate when ≥
    * [[BoilerMinDf]] distinct same-source docs carry its hash.
    * Report row per document — total even for docs too short to form
    * one block (0 blocks, fraction 0).
    *
    * Scale shape: blocks explode map-side (O(words) per doc); the
    * per-(source, hash) doc-frequency is one aggregation; the rejoin
    * keys on the same (source, hash) pair hint-free (vocab-sized —
    * the tfidf rule); per-doc fold + a doc-keyed left join back to
    * the corpus for totality. No self-join, no window. */
  def boilerplateReport(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val blocks = d.select(col("doc_id"), col("source"),
        explode(when(size(ws) >= BoilerBlockWords,
          expr(s"""transform(sequence(1, int(size(split(text, ' ')) / $BoilerBlockWords)),
                  |  b -> concat_ws(' ', slice(split(text, ' '),
                  |    (b - 1) * $BoilerBlockWords + 1, $BoilerBlockWords)))""".stripMargin))
          .otherwise(array().cast("array<string>"))).as("block"))
      .select(col("doc_id"), col("source"),
        graft.functions.CrossHash.md5Hash60Col(col("block")).as("h"))
    val dfreq = blocks.select(col("source"), col("h"), col("doc_id")).distinct()
      .groupBy(col("source"), col("h")).agg(count(lit(1)).as("df"))
    val perDoc = blocks.join(dfreq, Seq("source", "h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("df") >= BoilerMinDf, 1L).otherwise(0L)).as("n_boiler"))
    d.select(col("doc_id"), col("source"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"))
      .withColumn("boiler_frac",
        when(col("n_blocks") === 0, lit(0.0))
          .otherwise(r6(col("n_boiler").cast("double") / col("n_blocks"))))
      .orderBy(col("doc_id"))
  }

  val boilerplateReportSql: String = {
    val h = graft.functions.CrossHash.sqlHash60("blk")
    s"""WITH w AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
       |blocks AS (
       |  SELECT doc_id, source,
       |    $h AS h
       |  FROM (
       |    SELECT doc_id, source,
       |      array_to_string(w[(b - 1) * $BoilerBlockWords + 1 :
       |                       (b - 1) * $BoilerBlockWords + $BoilerBlockWords], ' ') AS blk
       |    FROM w, UNNEST(range(1, len(w) // $BoilerBlockWords + 1)) AS t(b)
       |    WHERE len(w) >= $BoilerBlockWords)),
       |dfreq AS (
       |  SELECT source, h, COUNT(DISTINCT doc_id) AS df
       |  FROM blocks GROUP BY source, h),
       |per_doc AS (
       |  SELECT doc_id, COUNT(*) AS n_blocks,
       |    SUM(CASE WHEN df >= $BoilerMinDf THEN 1 ELSE 0 END) AS n_boiler
       |  FROM blocks JOIN dfreq USING (source, h)
       |  GROUP BY doc_id)
       |SELECT d.doc_id, d.source,
       |  CAST(COALESCE(p.n_blocks, 0) AS BIGINT) AS n_blocks,
       |  CAST(COALESCE(p.n_boiler, 0) AS BIGINT) AS n_boiler,
       |  CASE WHEN COALESCE(p.n_blocks, 0) = 0 THEN 0.0
       |       ELSE round(CAST(p.n_boiler AS DOUBLE) / p.n_blocks, 6) + 0 END AS boiler_frac
       |FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Boilerplate REMOVAL — the transform twin of
    * [[boilerplateReport]]: the CCNet/jusText pipelines don't just
    * measure template blocks, they STRIP them before training. Every
    * block flagged by the same same-source df ≥ [[BoilerMinDf]] rule
    * is cut from the word stream; the tail words and clean blocks
    * keep their original order; and the rebuilt text is
    * fingerprinted with the cross-engine 60-bit hash, so the oracle
    * verifies the EXACT reconstruction of every document, not just
    * the removal counts.
    *
    * Scale shape: identical to the report up to the flag (map-side
    * blocking, one (source, hash) df aggregation, hint-free rejoin),
    * then only (doc_id, block-index) pairs aggregate per doc —
    * bounded by words/10 — and ONE doc-keyed join carries the text
    * once (the unavoidable enrichment shuffle; AQE picks the
    * strategy, no static hint). The rebuild itself is a map-only
    * array filter. */
  /** Single-pass rebuild: keep tail words (index ≥ nblocks·width)
    * and words of unflagged blocks, joined by single spaces — the
    * exact semantics of the oracle's list comprehension +
    * array_to_string. `split(" ", -1)` matches Spark's split
    * (trailing empties preserved). */
  private[ops] val scrubUdf = udf { (text: String, bad: Seq[Int]) =>
    val w = text.split(" ", -1)
    val nb = w.length / BoilerBlockWords
    val badSet = bad.toSet
    val sb = new StringBuilder
    var i = 0
    var first = true
    while (i < w.length) {
      if (i >= nb * BoilerBlockWords || !badSet.contains(i / BoilerBlockWords + 1)) {
        if (!first) sb.append(' ')
        sb.append(w(i))
        first = false
      }
      i += 1
    }
    sb.toString
  }

  def boilerplateScrub(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents", resplit = true)
    val blocks = d.select(col("doc_id"), col("source"),
        posexplode(when(size(ws) >= BoilerBlockWords,
          expr(s"""transform(sequence(1, int(size(split(text, ' ')) / $BoilerBlockWords)),
                  |  b -> concat_ws(' ', slice(split(text, ' '),
                  |    (b - 1) * $BoilerBlockWords + 1, $BoilerBlockWords)))""".stripMargin))
          .otherwise(array().cast("array<string>"))).as(Seq("b0", "block")))
      .select(col("doc_id"), col("source"), (col("b0") + 1).as("b"),
        graft.functions.CrossHash.md5Hash60Col(col("block")).as("h"))
    val dfreq = blocks.select(col("source"), col("h"), col("doc_id")).distinct()
      .groupBy(col("source"), col("h")).agg(count(lit(1)).as("df"))
    val bad = blocks.join(dfreq, Seq("source", "h"))
      .filter(col("df") >= BoilerMinDf)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("b"))).as("bad"))
    d.select(col("doc_id"), col("text"))
      .join(bad, Seq("doc_id"), "left")
      .withColumn("bad", coalesce(col("bad"), array().cast("array<int>")))
      // closure UDF, not an index-lambda HOF: CollapseProject inlines
      // split(text) into every lambda element access (the
      // decontaminate lesson), turning the rebuild O(words²) per doc
      // — measured 4× the whole query's cost. The UDF is one pass
      // and joins with single spaces exactly like the oracle's
      // array_to_string (no raw-text early-out, so a doc with no
      // flagged blocks still round-trips through the identical
      // split-and-rejoin in both engines).
      .withColumn("clean", scrubUdf(col("text"), col("bad")))
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        (size(col("bad")) * BoilerBlockWords).cast("long").as("n_removed"),
        length(col("clean")).cast("long").as("len_clean"),
        graft.functions.CrossHash.md5Hash60Col(col("clean")).as("clean_h"))
      .orderBy(col("doc_id"))
  }

  /** Oracle mirror of [[boilerplateScrub]]: same block/df chain as
    * the report, per-doc flagged-index lists, and the rebuild as a
    * 1-based list comprehension keeping tail words and clean blocks
    * — the 60-bit hash of the rebuilt string must match the
    * engine's byte-for-byte. */
  val boilerplateScrubSql: String = {
    val hBlk = graft.functions.CrossHash.sqlHash60("blk")
    val hCt = graft.functions.CrossHash.sqlHash60("ct")
    s"""WITH w AS (
       |  SELECT doc_id, source, text, string_split(text, ' ') AS w FROM documents),
       |blocks AS (
       |  SELECT doc_id, source, b, $hBlk AS h
       |  FROM (
       |    SELECT doc_id, source, b,
       |      array_to_string(w[(b - 1) * $BoilerBlockWords + 1 :
       |                       (b - 1) * $BoilerBlockWords + $BoilerBlockWords], ' ') AS blk
       |    FROM w, UNNEST(range(1, len(w) // $BoilerBlockWords + 1)) AS t(b)
       |    WHERE len(w) >= $BoilerBlockWords)),
       |dfreq AS (
       |  SELECT source, h, COUNT(DISTINCT doc_id) AS df
       |  FROM blocks GROUP BY source, h),
       |bad AS (
       |  SELECT doc_id, list(b ORDER BY b) AS bad
       |  FROM blocks JOIN dfreq USING (source, h)
       |  WHERE df >= $BoilerMinDf
       |  GROUP BY doc_id),
       |clean AS (
       |  SELECT d.doc_id, len(d.w) AS n_words,
       |    len(COALESCE(b.bad, CAST([] AS BIGINT[]))) AS n_bad,
       |    -- COALESCE: an all-removed comprehension yields NULL, not
       |    -- [], in DuckDB (the line_dedup all-duplicate-doc lesson)
       |    COALESCE(array_to_string([d.w[i] FOR i IN generate_series(1, len(d.w))
       |      IF i > (len(d.w) // $BoilerBlockWords) * $BoilerBlockWords
       |         OR NOT list_contains(COALESCE(b.bad, CAST([] AS BIGINT[])),
       |                              (i - 1) // $BoilerBlockWords + 1)], ' '), '') AS ct
       |  FROM w d LEFT JOIN bad b USING (doc_id))
       |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       |  CAST(n_bad * $BoilerBlockWords AS BIGINT) AS n_removed,
       |  CAST(length(ct) AS BIGINT) AS len_clean,
       |  $hCt AS clean_h
       |FROM clean
       |ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------ paragraph-level dedup

  /** Corpus-wide paragraph dedup + rebuild — the literal CCNet
    * stage-1 (Wenzek et al. 2020 dedup paragraphs BEFORE any
    * doc-level op), distinct from [[boilerplateScrub]] in BOTH rules:
    * GLOBAL scope (a paragraph repeated across sources dedups;
    * boilerplate is same-source only) and FIRST-OCCURRENCE
    * survivorship (the earliest (doc_id, block) keeps its copy where
    * the scrub removes every instance of a df ≥ 3 block). Documents
    * split into the same non-overlapping [[BoilerBlockWords]]-word
    * blocks (the fixture corpus has no newlines — block = the
    * deterministic paragraph stand-in, same rationale as the scrub);
    * every occurrence of a block hash EXCEPT the global minimum
    * (doc_id, block-index) is cut, and the doc rebuilds byte-exactly
    * ([[scrubUdf]] — tail words always survive).
    *
    * Scale shape: map-side blocking, ONE aggregation per block hash
    * (min-struct first occurrence — no window over the corpus), a
    * hint-free rejoin on the hash (paragraph-vocab-sized relation,
    * the tfidf rule), bounded per-doc removed-index lists, ONE
    * doc-keyed rebuild join. */
  def lineDedup(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents", resplit = true)
    val blocks = d.select(col("doc_id"),
        posexplode(when(size(ws) >= BoilerBlockWords,
          expr(s"""transform(sequence(1, int(size(split(text, ' ')) / $BoilerBlockWords)),
                  |  b -> concat_ws(' ', slice(split(text, ' '),
                  |    (b - 1) * $BoilerBlockWords + 1, $BoilerBlockWords)))""".stripMargin))
          .otherwise(array().cast("array<string>"))).as(Seq("b0", "block")))
      .select(col("doc_id"), (col("b0") + 1).as("b"),
        graft.functions.CrossHash.md5Hash60Col(col("block")).as("h"))
    val first = blocks.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("b"))).as("f"))
    val bad = blocks.join(first, Seq("h"))
      .filter(!(col("doc_id") === col("f.doc_id") && col("b") === col("f.b")))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("b"))).as("bad"))
    d.select(col("doc_id"), col("text"))
      .join(bad, Seq("doc_id"), "left")
      .withColumn("bad", coalesce(col("bad"), array().cast("array<int>")))
      .withColumn("clean", scrubUdf(col("text"), col("bad")))
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        (size(col("bad")) * BoilerBlockWords).cast("long").as("n_removed"),
        length(col("clean")).cast("long").as("len_clean"),
        graft.functions.CrossHash.md5Hash60Col(col("clean")).as("clean_h"))
      .orderBy(col("doc_id"))
  }

  /** Oracle mirror of [[lineDedup]]: same block chain, first
    * occurrence as `row_number() OVER (PARTITION BY h ORDER BY
    * doc_id, b) = 1` (≡ the engine's min-struct), rebuild as the
    * boilerplate-scrub list comprehension — the 60-bit hash of the
    * rebuilt string must match byte-for-byte. */
  val lineDedupSql: String = {
    val hBlk = graft.functions.CrossHash.sqlHash60("blk")
    val hCt = graft.functions.CrossHash.sqlHash60("ct")
    s"""WITH ld_w AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |ld_blocks AS (
       |  SELECT doc_id, b, $hBlk AS h
       |  FROM (
       |    SELECT doc_id, b,
       |      array_to_string(w[(b - 1) * $BoilerBlockWords + 1 :
       |                       (b - 1) * $BoilerBlockWords + $BoilerBlockWords], ' ') AS blk
       |    FROM ld_w, UNNEST(range(1, len(w) // $BoilerBlockWords + 1)) AS t(b)
       |    WHERE len(w) >= $BoilerBlockWords)),
       |ld_rk AS (
       |  SELECT doc_id, b,
       |    row_number() OVER (PARTITION BY h ORDER BY doc_id, b) AS rk
       |  FROM ld_blocks),
       |ld_bad AS (
       |  SELECT doc_id, list(b ORDER BY b) AS bad
       |  FROM ld_rk WHERE rk > 1
       |  GROUP BY doc_id),
       |ld_clean AS (
       |  SELECT d.doc_id, len(d.w) AS n_words,
       |    len(COALESCE(bb.bad, CAST([] AS BIGINT[]))) AS n_bad,
       |    -- a comprehension whose filter drops EVERY element yields
       |    -- NULL, not [], in DuckDB — an all-duplicate doc (every
       |    -- block cut, no tail) must rebuild to '' like the engine
       |    COALESCE(array_to_string([d.w[i] FOR i IN generate_series(1, len(d.w))
       |      IF i > (len(d.w) // $BoilerBlockWords) * $BoilerBlockWords
       |         OR NOT list_contains(COALESCE(bb.bad, CAST([] AS BIGINT[])),
       |                              (i - 1) // $BoilerBlockWords + 1)], ' '), '') AS ct
       |  FROM ld_w d LEFT JOIN ld_bad bb USING (doc_id))
       |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       |  CAST(n_bad * $BoilerBlockWords AS BIGINT) AS n_removed,
       |  CAST(length(ct) AS BIGINT) AS len_clean,
       |  $hCt AS clean_h
       |FROM ld_clean
       |ORDER BY doc_id""".stripMargin
  }

  /** Corpus totals for [[lineDedup]] — the (kept, removed,
    * bytes-saved) one-row audit a paragraph-dedup run reports:
    * paragraph counts in blocks, bytes saved from the byte-exact
    * rebuilt lengths. Total on an empty corpus (zero row counts,
    * never null sums). */
  def lineDedupReport(s: SparkSession, dir: String): DataFrame = {
    val lens = t(s, dir, "documents", resplit = true)
      .select(col("doc_id"), length(col("text")).cast("long").as("len0"))
    lineDedup(s, dir).join(lens, Seq("doc_id"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(expr(s"n_words div $BoilerBlockWords")), lit(0L)).as("n_paragraphs"),
        coalesce(expr(s"sum(n_removed) div $BoilerBlockWords"), lit(0L)).as("n_removed_paragraphs"),
        coalesce(sum(col("len0") - col("len_clean")), lit(0L)).as("bytes_saved"))
  }

  lazy val lineDedupReportSql: String =
    s"""WITH lr AS MATERIALIZED (SELECT * FROM ($lineDedupSql))
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(COALESCE(SUM(l.n_words // $BoilerBlockWords), 0) AS BIGINT) AS n_paragraphs,
       |  CAST(COALESCE(SUM(l.n_removed) // $BoilerBlockWords, 0) AS BIGINT) AS n_removed_paragraphs,
       |  CAST(COALESCE(SUM(length(d.text) - l.len_clean), 0) AS BIGINT) AS bytes_saved
       |FROM lr l JOIN documents d USING (doc_id)""".stripMargin

  // ------------------------------------------ quality signal fusion

  /** Ensemble quality score — the fusion step a production filter
    * stack runs AFTER the individual signals are trusted: three
    * independent per-doc signals (lexical diversity = doc_quality's
    * type-token ratio, fluency = the unigram-LM avg NLL, repetition
    * = gopher's duplicate-2-gram fraction) are min-max normalized
    * over the corpus, orientation-aligned (higher = better), and
    * fused by exact-integer mean; keep = fused ≥ 0.5. Min-max (not
    * rank) normalization on purpose: global RANKS need a total order
    * over the corpus (a single-partition window at 100 TB), while
    * min/max are two mergeable 1-row aggregates broadcast back — the
    * same signal, scale-safe.
    *
    * Arithmetic bridge: each normalized signal is r6 then lifted to
    * micro-units (exact — degenerate max=min pins 0.5); inversion is
    * integer subtraction; the 3-way mean is the (2q+n) div (2n)
    * identity on nonnegative integers; the keep threshold compares
    * integers.
    *
    * Scale shape: the three signal chains are each one corpus pass
    * (already individually oracle-gated); the narrow (doc_id, 3
    * doubles) join is localCheckpointed for its two consumers; the
    * extrema are ONE 6-scalar aggregation broadcast back; fusion is
    * map-only. */
  def qualityEnsemble(s: SparkSession, dir: String): DataFrame = {
    val sig = TextOps.docQuality(s, dir).select(col("doc_id"), col("ttr"))
      .join(Retrieval.unigramLogprob(s, dir)
        .select(col("doc_id"), col("avg_nll").as("nll")), "doc_id")
      .join(gopherQuality(s, dir)
        .select(col("doc_id"), col("dup_2gram_frac").as("rep")), "doc_id")
      .localCheckpoint(true)
    val m = sig.agg(min("ttr").as("t0"), max("ttr").as("t1"),
      min("nll").as("n0"), max("nll").as("n1"),
      min("rep").as("r0"), max("rep").as("r1"))
    def norm6(x: String, lo: String, hi: String) =
      when(col(hi) === col(lo), lit(500000L))
        .otherwise(round(r6((col(x) - col(lo)) / (col(hi) - col(lo))) * 1e6)
          .cast("long"))
    sig.crossJoin(broadcast(m))
      .withColumn("t6", norm6("ttr", "t0", "t1"))
      .withColumn("n6", lit(1000000L) - norm6("nll", "n0", "n1"))
      .withColumn("rp6", lit(1000000L) - norm6("rep", "r0", "r1"))
      .withColumn("fused6", expr("(2 * (t6 + n6 + rp6) + 3) div 6"))
      .select(col("doc_id"),
        (col("t6").cast("double") / 1e6).as("ttr_n"),
        (col("n6").cast("double") / 1e6).as("nll_n"),
        (col("rp6").cast("double") / 1e6).as("rep_n"),
        (col("fused6").cast("double") / 1e6).as("fused"),
        when(col("fused6") >= 500000L, 1).otherwise(0).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** Oracle mirror of [[qualityEnsemble]] — the three proven signal
    * SQLs nested MATERIALIZED, the same min-max micro-unit chain. */
  lazy val qualityEnsembleSql: String = {
    def bare(sql: String) = sql.replace("ORDER BY doc_id", "")
    s"""WITH qe_s AS MATERIALIZED (
       |  SELECT d.doc_id, d.ttr, u.avg_nll AS nll, g.dup_2gram_frac AS rep
       |  FROM (${bare(TextOps.docQualitySql)}) d
       |  JOIN (${bare(Retrieval.unigramLogprobSql)}) u USING (doc_id)
       |  JOIN (${bare(gopherQualitySql)}) g USING (doc_id)),
       |qe_m AS MATERIALIZED (
       |  SELECT MIN(ttr) AS t0, MAX(ttr) AS t1, MIN(nll) AS n0, MAX(nll) AS n1,
       |         MIN(rep) AS r0, MAX(rep) AS r1
       |  FROM qe_s),
       |qe_n AS (
       |  SELECT s.doc_id,
       |    CASE WHEN m.t1 = m.t0 THEN 500000
       |         ELSE CAST(round(1000000 * (round((s.ttr - m.t0) / (m.t1 - m.t0), 6) + 0)) AS BIGINT)
       |    END AS t6,
       |    1000000 - CASE WHEN m.n1 = m.n0 THEN 500000
       |         ELSE CAST(round(1000000 * (round((s.nll - m.n0) / (m.n1 - m.n0), 6) + 0)) AS BIGINT)
       |    END AS n6,
       |    1000000 - CASE WHEN m.r1 = m.r0 THEN 500000
       |         ELSE CAST(round(1000000 * (round((s.rep - m.r0) / (m.r1 - m.r0), 6) + 0)) AS BIGINT)
       |    END AS rp6
       |  FROM qe_s s CROSS JOIN qe_m m)
       |SELECT doc_id,
       |  CAST(t6 AS DOUBLE) / 1000000.0 AS ttr_n,
       |  CAST(n6 AS DOUBLE) / 1000000.0 AS nll_n,
       |  CAST(rp6 AS DOUBLE) / 1000000.0 AS rep_n,
       |  CAST((2 * (t6 + n6 + rp6) + 3) // 6 AS DOUBLE) / 1000000.0 AS fused,
       |  CASE WHEN (2 * (t6 + n6 + rp6) + 3) // 6 >= 500000 THEN 1 ELSE 0 END AS keep
       |FROM qe_n
       |ORDER BY doc_id""".stripMargin
  }

  /** Keep-decision agreement between two INDEPENDENT quality
    * filters — the audit run before swapping or ensembling
    * classifiers: the Gopher-style rule filter ([[gopherQuality]])
    * against the per-source-calibrated LM filter
    * ([[Retrieval.qualityCalibrated]]), as the full 2×2 decision
    * matrix (grid-total, empty cells at 0) plus Cohen's κ —
    * chance-corrected agreement, the standard inter-rater statistic
    * (κ near 0 means the filters keep DIFFERENT corpora even when
    * raw agreement looks high, because marginal keep rates alone
    * predict most of it).
    *
    * Scale shape: two map-only scoring passes (each filter's own
    * shape), ONE doc_id equi-join, a 4-cell aggregation, and the κ
    * scalars riding a 1-row broadcast. po/pe are ratios of exact
    * Long counts, so both engines compute bit-identical doubles;
    * the degenerate pe = 1 case (both filters constant and equal)
    * is defined as κ = 1 and guarded before the ANSI division. */
  def filterAgreement(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // the sort-free internals: each filter's public query ends in a
    // presentation ORDER BY that a 4-cell aggregation never needs
    val g = gopherScore(t(s, dir, "documents"))
      .select(col("doc_id"), col("keep").as("keep_gopher"))
    val c = Retrieval.calibratedScores(s, dir)
      .select(col("doc_id"), col("keep").as("keep_lm"))
    val grid = Seq(0, 1).toDF("keep_gopher").crossJoin(Seq(0, 1).toDF("keep_lm"))
    // grid totality via UNION + re-aggregate, not an outer join: the
    // grid-LEFT-JOIN form planned an AQE SMJ whose stage chain ran
    // 4.5 s on a 4-row problem (measured; union form 1.9 s total) —
    // zero-count grid rows folded into the same aggregation give the
    // identical cells with one trivial stage.
    val cells = g.join(c, Seq("doc_id"))
      .groupBy(col("keep_gopher"), col("keep_lm"))
      .agg(count(lit(1)).as("n0"))
      .unionByName(grid.withColumn("n0", lit(0L)))
      .groupBy(col("keep_gopher"), col("keep_lm"))
      .agg(sum(col("n0")).as("n"))
      // the κ aggregate AND the final report both consume `cells`;
      // one eager 4-row checkpoint serves both instead of re-running
      // the filter chains per consumer
      .localCheckpoint(true)
    val k = cells.agg(
        sum(col("n")).as("nn"),
        sum(when(col("keep_gopher") === col("keep_lm"), col("n")).otherwise(0L)).as("agree"),
        sum(when(col("keep_gopher") === 1, col("n")).otherwise(0L)).as("ga"),
        sum(when(col("keep_lm") === 1, col("n")).otherwise(0L)).as("ca"))
      .select(col("nn"),
        // empty corpus: nn = 0 would divide 0/0 — define po = pe = 1
        // (two filters vacuously agree on nothing), so κ lands on the
        // existing pe = 1 → 1.0 guard; frac guards to 0 below. Both
        // CASEs mirrored in the oracle SQL so the row set stays total
        // and engine-identical (the dedupCapReport n_buckets=0 rule).
        when(col("nn") === 0, lit(1.0))
          .otherwise(col("agree").cast("double") / col("nn")).as("po"),
        when(col("nn") === 0, lit(1.0))
          .otherwise((col("ga") * col("ca") + (col("nn") - col("ga")) * (col("nn") - col("ca")))
            .cast("double") / (col("nn") * col("nn"))).as("pe"))
    cells.crossJoin(broadcast(k))
      .select(col("keep_gopher"), col("keep_lm"), col("n"),
        r6(when(col("nn") === 0, lit(0.0))
          .otherwise(col("n").cast("double") / col("nn"))).as("frac"),
        r6(when(col("pe") === 1.0, lit(1.0))
          .otherwise((col("po") - col("pe")) / (lit(1.0) - col("pe")))).as("kappa"))
      .orderBy(col("keep_gopher"), col("keep_lm"))
  }

  /** Oracle mirror of [[filterAgreement]]: both filter SQLs nested
    * verbatim, explicit 2×2 grid, κ from the same exact-integer
    * marginals with the pe = 1 guard. */
  lazy val filterAgreementSql: String =
    s"""WITH fa_g AS MATERIALIZED (
       |  SELECT doc_id, keep AS keep_gopher FROM ($gopherQualitySql)),
       |fa_c AS MATERIALIZED (
       |  SELECT doc_id, keep AS keep_lm FROM (${Retrieval.qualityCalibratedSql})),
       |fa_cells0 AS (
       |  SELECT keep_gopher, keep_lm, COUNT(*) AS n
       |  FROM fa_g JOIN fa_c USING (doc_id)
       |  GROUP BY keep_gopher, keep_lm),
       |fa_grid AS (
       |  SELECT a.x AS keep_gopher, b.x AS keep_lm
       |  FROM (SELECT unnest([0, 1]) AS x) a, (SELECT unnest([0, 1]) AS x) b),
       |fa_cells AS (
       |  SELECT g.keep_gopher, g.keep_lm,
       |    CAST(COALESCE(c.n, 0) AS BIGINT) AS n
       |  FROM fa_grid g LEFT JOIN fa_cells0 c USING (keep_gopher, keep_lm)),
       |fa_k AS (
       |  SELECT CAST(SUM(n) AS BIGINT) AS nn,
       |    CAST(SUM(CASE WHEN keep_gopher = keep_lm THEN n ELSE 0 END) AS BIGINT) AS agree,
       |    CAST(SUM(CASE WHEN keep_gopher = 1 THEN n ELSE 0 END) AS BIGINT) AS ga,
       |    CAST(SUM(CASE WHEN keep_lm = 1 THEN n ELSE 0 END) AS BIGINT) AS ca
       |  FROM fa_cells),
       |fa_k2 AS (
       |  SELECT nn,
       |    CASE WHEN nn = 0 THEN 1.0 ELSE CAST(agree AS DOUBLE) / nn END AS po,
       |    CASE WHEN nn = 0 THEN 1.0
       |         ELSE CAST(ga * ca + (nn - ga) * (nn - ca) AS DOUBLE) / (nn * nn) END AS pe
       |  FROM fa_k)
       |SELECT c.keep_gopher, c.keep_lm, c.n,
       |  round(CASE WHEN k.nn = 0 THEN 0.0
       |             ELSE CAST(c.n AS DOUBLE) / k.nn END, 6) + 0 AS frac,
       |  round(CASE WHEN k.pe = 1.0 THEN 1.0
       |             ELSE (k.po - k.pe) / (1.0 - k.pe) END, 6) + 0 AS kappa
       |FROM fa_cells c CROSS JOIN fa_k2 k
       |ORDER BY c.keep_gopher, c.keep_lm""".stripMargin

  /** Keep-rate per document-length decile for BOTH quality filters —
    * the length-bias audit every filter ablation runs (rule filters
    * and LM-perplexity filters both correlate with length; a filter
    * that silently drops the short or the long tail skews the token
    * distribution of the kept corpus). Deciles come from the exact
    * n_chars percentile cutoffs broadcast back (the ppl_buckets
    * pattern — no global sort), keep flags from the two sort-free
    * scoring passes, rates as micro-unit exact HALF_UP ratios (a
    * decile of exactly 128 or 640 docs would otherwise land k/n on
    * the 7th-digit half where the engines' roundings disagree).
    *
    * Scale shape: one cutoff aggregation (at 100 TB: the registered
    * approx_percentile sketch swap), two map-only scorings, one
    * doc-keyed join, a ≤10-group aggregation; decile totality via
    * the union+re-aggregate shape ([[filterAgreement]]'s lesson —
    * the grid outer join cost 4.5 s of AQE stages on a tiny
    * problem). */
  def lengthBiasReport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents")
    val cutCols = (1 to 9).map(i =>
      r6(percentile(col("n_chars").cast("double"), lit(i / 10.0))).as(s"c$i"))
    val cuts = d.agg(cutCols.head, cutCols.tail: _*)
    val g = gopherScore(d).select(col("doc_id"), col("keep").as("kg"))
    val c = Retrieval.calibratedScores(s, dir).select(col("doc_id"), col("keep").as("kl"))
    val decile = (1 to 9).foldLeft(lit(1)) { (acc, i) =>
      acc + (col("n_chars") > col(s"c$i")).cast("int")
    }
    val cells = d.select(col("doc_id"), col("n_chars"))
      .join(g, Seq("doc_id")).join(c, Seq("doc_id"))
      .crossJoin(broadcast(cuts))
      .withColumn("decile", decile)
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n0"), sum(col("n_chars")).as("chars0"),
        sum(col("kg").cast("long")).as("kg0"), sum(col("kl").cast("long")).as("kl0"))
      .unionByName(Seq.range(1, 11).toDF("decile")
        .select(col("decile"), lit(0L).as("n0"), lit(0L).as("chars0"),
          lit(0L).as("kg0"), lit(0L).as("kl0")))
      .groupBy(col("decile"))
      .agg(sum(col("n0")).as("n"), sum(col("chars0")).as("chars"),
        sum(col("kg0")).as("kg"), sum(col("kl0")).as("kl"))
    // micro-unit exact HALF_UP ratio q/n at 6 decimals
    def rate(q: String): Column =
      when(col("n") === 0, lit(0.0)).otherwise(
        expr(s"CAST((2 * $q * 1000000 + n) div (2 * n) AS DOUBLE)") / 1e6)
    cells.select(col("decile"), col("n").as("n_docs"),
        when(col("n") === 0, lit(0L))
          .otherwise(expr("(2 * chars + n) div (2 * n)")).as("mean_chars"),
        rate("kg").as("keep_rate_gopher"),
        rate("kl").as("keep_rate_lm"))
      .orderBy(col("decile"))
  }

  /** Oracle mirror of [[lengthBiasReport]]: quantile_cont cutoffs,
    * the same 9-comparison decile, micro-unit HALF_UP rates. */
  lazy val lengthBiasReportSql: String = {
    val cutsSel = (1 to 9).map(i =>
      s"round(quantile_cont(CAST(n_chars AS DOUBLE), ${i / 10.0}), 6) + 0 AS c$i").mkString(",\n|    ")
    val decileExpr = (1 to 9).map(i =>
      s"CASE WHEN d.n_chars > q.c$i THEN 1 ELSE 0 END").mkString("1 + ", " + ", "")
    s"""WITH lb_g AS MATERIALIZED (
       |  SELECT doc_id, keep AS kg FROM ($gopherQualitySql)),
       |lb_c AS MATERIALIZED (
       |  SELECT doc_id, keep AS kl FROM (${Retrieval.qualityCalibratedSql})),
       |lb_q AS (
       |  SELECT
       |    $cutsSel
       |  FROM documents),
       |lb_cells0 AS (
       |  SELECT $decileExpr AS decile,
       |    COUNT(*) AS n0, CAST(SUM(d.n_chars) AS BIGINT) AS chars0,
       |    CAST(SUM(g.kg) AS BIGINT) AS kg0, CAST(SUM(c.kl) AS BIGINT) AS kl0
       |  FROM documents d
       |  JOIN lb_g g USING (doc_id) JOIN lb_c c USING (doc_id)
       |  CROSS JOIN lb_q q
       |  GROUP BY 1),
       |lb_cells AS (
       |  SELECT decile, CAST(SUM(n0) AS BIGINT) AS n,
       |    CAST(SUM(chars0) AS BIGINT) AS chars,
       |    CAST(SUM(kg0) AS BIGINT) AS kg, CAST(SUM(kl0) AS BIGINT) AS kl
       |  FROM (SELECT * FROM lb_cells0
       |        UNION ALL
       |        SELECT t.x, 0, 0, 0, 0 FROM (SELECT unnest(range(1, 11)) AS x) t)
       |  GROUP BY decile)
       |SELECT CAST(decile AS INT) AS decile, n AS n_docs,
       |  CASE WHEN n = 0 THEN 0
       |       ELSE CAST((2 * chars + n) // (2 * n) AS BIGINT) END AS mean_chars,
       |  CASE WHEN n = 0 THEN 0.0
       |       ELSE CAST((2 * kg * 1000000 + n) // (2 * n) AS DOUBLE) / 1000000.0 END
       |    AS keep_rate_gopher,
       |  CASE WHEN n = 0 THEN 0.0
       |       ELSE CAST((2 * kl * 1000000 + n) // (2 * n) AS DOUBLE) / 1000000.0 END
       |    AS keep_rate_lm
       |FROM lb_cells
       |ORDER BY decile""".stripMargin
  }

  // ------------------------------------- quality threshold sweep

  /** Keep thresholds the sweep evaluates, in exact micro-units of the
    * fused [[qualityEnsemble]] score. */
  val QualitySweepTaus: Seq[Int] = Seq(300000, 400000, 500000, 600000, 700000)

  /** Keep-rate curve over the fused quality score — the tuning table
    * a filter threshold is actually chosen from (the semdedup_eps /
    * ivf_probe sweep discipline applied to quality filtering): for
    * each candidate τ, how many documents and words survive. The τ a
    * release picks is a token-budget decision; this is the table that
    * decision reads.
    *
    * Scale shape: the ensemble chain runs ONCE; thresholds are
    * conditional sums inside ONE 1-row aggregation (never a per-τ
    * re-scan, never a grid×corpus expansion), stacked to grid rows.
    * Thresholds compare in exact micro-units (round(fused·1e6) is a
    * lossless round-trip of the ensemble's integer micro score). */
  def qualityThresholdSweep(s: SparkSession, dir: String): DataFrame = {
    val qe = qualityEnsemble(s, dir)
      .select(col("doc_id"), round(col("fused") * 1e6).cast("long").as("f6"))
    val words = t(s, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("nw"))
    val j = qe.join(words, "doc_id")
    val aggs = Seq(
      count(lit(1)).as("n_docs"),
      coalesce(sum(col("nw")), lit(0L)).as("t_words")) ++
      QualitySweepTaus.flatMap(tau => Seq(
        coalesce(sum(when(col("f6") >= tau, 1L).otherwise(0L)), lit(0L)).as(s"k$tau"),
        coalesce(sum(when(col("f6") >= tau, col("nw")).otherwise(0L)), lit(0L)).as(s"w$tau")))
    val one = j.agg(aggs.head, aggs.tail: _*)
    val stackExpr = QualitySweepTaus
      .map(tau => s"CAST(${tau / 1e6} AS DOUBLE), k$tau, w$tau").mkString(", ")
    one.selectExpr("n_docs", "t_words",
        s"stack(${QualitySweepTaus.size}, $stackExpr) AS (tau, n_kept, kept_words)")
      .select(col("tau"), col("n_kept"),
        when(col("n_docs") === 0, lit(0.0))
          .otherwise(r6(col("n_kept").cast("double") / col("n_docs"))).as("keep_frac"),
        col("kept_words"),
        when(col("t_words") === 0, lit(0.0))
          .otherwise(r6(col("kept_words").cast("double") / col("t_words")))
          .as("kept_words_frac"))
      .orderBy(col("tau"))
  }

  /** Composes the proven ensemble oracle; per-τ cells as conditional
    * sums over ONE pass, stacked by UNION ALL. */
  lazy val qualityThresholdSweepSql: String = {
    val cells = QualitySweepTaus.map(tau =>
      s"""COALESCE(SUM(CASE WHEN f6 >= $tau THEN 1 ELSE 0 END), 0) AS k$tau,
         |    COALESCE(SUM(CASE WHEN f6 >= $tau THEN nw ELSE 0 END), 0) AS w$tau""".stripMargin)
      .mkString(",\n    ")
    val rows = QualitySweepTaus.map(tau =>
      s"""SELECT CAST(${tau / 1e6} AS DOUBLE) AS tau, CAST(k$tau AS BIGINT) AS n_kept,
         |  CASE WHEN n_docs = 0 THEN 0.0
         |       ELSE round(CAST(k$tau AS DOUBLE) / n_docs, 6) + 0 END AS keep_frac,
         |  CAST(w$tau AS BIGINT) AS kept_words,
         |  CASE WHEN t_words = 0 THEN 0.0
         |       ELSE round(CAST(w$tau AS DOUBLE) / t_words, 6) + 0 END AS kept_words_frac
         |FROM qt_a""".stripMargin)
      .mkString("\nUNION ALL ")
    s"""WITH qt_s AS MATERIALIZED (
       |  SELECT doc_id, CAST(round(fused * 1e6) AS BIGINT) AS f6
       |  FROM ($qualityEnsembleSql)),
       |qt_w AS (
       |  SELECT q.f6, len(string_split(d.text, ' ')) AS nw
       |  FROM qt_s q JOIN documents d USING (doc_id)),
       |qt_a AS (
       |  SELECT COUNT(*) AS n_docs, COALESCE(SUM(nw), 0) AS t_words,
       |    $cells
       |  FROM qt_w)
       |$rows
       |ORDER BY tau""".stripMargin
  }

  // ------------------------------------- epoch shuffle decorrelation

  /** Key space for the epoch-shuffle audit: 20-bit hashed keys keep
    * every moment (k², k·k') inside exact integer range at any corpus
    * size once the sums ride DECIMAL(38,0) — the mergeable exact path. */
  val EpochKeyMod = 1048576L

  /** Epoch-reshuffle decorrelation audit — verifies the property the
    * salted training order ([[Retrieval.curriculumOrder]]'s shuffle
    * key) is trusted for: re-keying by a different epoch salt
    * produces an ORDER with no linear relationship to the previous
    * epoch's (Pearson r of the per-doc order keys ≈ 0). A broken salt
    * (constant, or concatenated so epochs share prefixes the hash
    * ignores) shows up as |r| → 1 here long before a training run
    * notices its batches repeating.
    *
    * Scale shape: keying is map-only (three hash columns per doc);
    * the whole audit is ONE 1-row aggregation whose moment sums are
    * exact DECIMAL(38,0) (20-bit keys ⇒ products ≤ 2^40 per row —
    * exact at 10¹² docs, and mergeable map-side like any sum);
    * Pearson arithmetic runs on those exact values cast to double,
    * identically in both engines. */
  def epochShuffleReport(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.CrossHash
    def key(e: Int): Column =
      CrossHash.md5Hash60Col(
        concat(lit(s"epoch$e:"), col("doc_id").cast("string"))) % EpochKeyMod
    val keyed = t(s, dir, "documents")
      .select(key(1).as("k1"), key(2).as("k2"), key(3).as("k3"))
    def dsum0(c: Column) = sum(c.cast("decimal(38,0)"))
    val a = keyed.agg(
      count(lit(1)).as("n"),
      dsum0(col("k1")).cast("double").as("s1"),
      dsum0(col("k2")).cast("double").as("s2"),
      dsum0(col("k3")).cast("double").as("s3"),
      dsum0(col("k1") * col("k1")).cast("double").as("q1"),
      dsum0(col("k2") * col("k2")).cast("double").as("q2"),
      dsum0(col("k3") * col("k3")).cast("double").as("q3"),
      dsum0(col("k1") * col("k2")).cast("double").as("p12"),
      dsum0(col("k2") * col("k3")).cast("double").as("p23"))
    val n = col("n").cast("double")
    def pearson(p: Column, sa: Column, sb: Column, qa: Column, qb: Column): Column = {
      val den = (n * qa - sa * sa) * (n * qb - sb * sb)
      when(col("n") < 2 || den <= 0.0, lit(0.0))
        .otherwise(r6((n * p - sa * sb) / sqrt(den)))
    }
    a.select(col("n").as("n_docs"),
        pearson(col("p12"), col("s1"), col("s2"), col("q1"), col("q2")).as("r12"),
        pearson(col("p23"), col("s2"), col("s3"), col("q2"), col("q3")).as("r23"))
      .selectExpr("stack(2, '1-2', n_docs, r12, '2-3', n_docs, r23)" +
        " AS (pair, n_docs, pearson_r)")
      .orderBy(col("pair"))
  }

  /** Oracle mirror: the same hashed keys, exact DECIMAL moments, and
    * guarded Pearson arithmetic. */
  lazy val epochShuffleReportSql: String = {
    def keySql(e: Int) =
      s"(${graft.functions.CrossHash.sqlHash60(s"'epoch$e:' || CAST(doc_id AS VARCHAR)")}) % $EpochKeyMod"
    def r(p: String, sa: String, sb: String, qa: String, qb: String) =
      s"""CASE WHEN n < 2 OR (CAST(n AS DOUBLE) * $qa - $sa * $sa)
         |            * (CAST(n AS DOUBLE) * $qb - $sb * $sb) <= 0 THEN 0.0
         |     ELSE round((CAST(n AS DOUBLE) * $p - $sa * $sb)
         |       / sqrt((CAST(n AS DOUBLE) * $qa - $sa * $sa)
         |              * (CAST(n AS DOUBLE) * $qb - $sb * $sb)), 6) + 0
         |END""".stripMargin
    s"""WITH es_k AS (
       |  SELECT ${keySql(1)} AS k1, ${keySql(2)} AS k2, ${keySql(3)} AS k3
       |  FROM documents),
       |es_a AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(CAST(k1 AS DECIMAL(38,0))) AS DOUBLE) AS s1,
       |    CAST(SUM(CAST(k2 AS DECIMAL(38,0))) AS DOUBLE) AS s2,
       |    CAST(SUM(CAST(k3 AS DECIMAL(38,0))) AS DOUBLE) AS s3,
       |    CAST(SUM(CAST(k1 * k1 AS DECIMAL(38,0))) AS DOUBLE) AS q1,
       |    CAST(SUM(CAST(k2 * k2 AS DECIMAL(38,0))) AS DOUBLE) AS q2,
       |    CAST(SUM(CAST(k3 * k3 AS DECIMAL(38,0))) AS DOUBLE) AS q3,
       |    CAST(SUM(CAST(k1 * k2 AS DECIMAL(38,0))) AS DOUBLE) AS p12,
       |    CAST(SUM(CAST(k2 * k3 AS DECIMAL(38,0))) AS DOUBLE) AS p23
       |  FROM es_k)
       |SELECT '1-2' AS pair, n AS n_docs, ${r("p12", "s1", "s2", "q1", "q2")} AS pearson_r
       |FROM es_a
       |UNION ALL
       |SELECT '2-3', n, ${r("p23", "s2", "s3", "q2", "q3")}
       |FROM es_a
       |ORDER BY pair""".stripMargin
  }

  // ---- Context-window budget report ----

  /** Context lengths audited by [[contextBudgetReport]] (words as
    * the token proxy, like every whitespace-token op here). Sized to
    * the fixtures' ≤100-word docs the way a production run would use
    * {2k, 8k, 32k}: the smallest cell truncates much of the corpus,
    * the largest fits everything. */
  val ContextGrid: Seq[Int] = Seq(32, 64, 128)

  /** Context-window fit audit — the table read before committing a
    * training context length: per candidate length L, how many docs
    * fit whole, how many a truncate-to-one-window policy cuts and
    * how many tokens it loses, how many windows a chunk-into-L
    * policy yields and how many pad tokens it wastes, and the token
    * retention of truncation. Pure integer arithmetic except the one
    * guarded ratio.
    *
    * Scale shape: the [[gopherThresholdSweepOf]] grid rule — ONE
    * corpus scan computes per-doc word counts, every grid cell is a
    * conditional sum of the same single 1-row aggregation (map-side
    * partials), and the L-rows unpivot via stack. No join, no
    * window, no per-cell rescan at any corpus size. Empty corpus:
    * the aggregate still emits its row, the grid reports zeros. */
  def contextBudgetReportOf(d: DataFrame): DataFrame = {
    val docs = d.select(size(ws).cast("long").as("n"))
    val cells = ContextGrid.zipWithIndex.flatMap { case (l, i) =>
      Seq(
        coalesce(sum(when(col("n") <= l, 1L).otherwise(0L)), lit(0L)).as(s"f$i"),
        coalesce(sum(when(col("n") > l, 1L).otherwise(0L)), lit(0L)).as(s"t$i"),
        coalesce(sum(when(col("n") > l, col("n") - l).otherwise(0L)), lit(0L))
          .as(s"lost$i"),
        coalesce(sum(expr(s"(n + ${l - 1}) div $l")), lit(0L)).as(s"w$i"),
        coalesce(sum(expr(s"((n + ${l - 1}) div $l) * $l - n")), lit(0L))
          .as(s"pad$i"),
        coalesce(sum(least(col("n"), lit(l.toLong))), lit(0L)).as(s"k$i"))
    }
    val tot = docs.agg(coalesce(sum(col("n")), lit(0L)).as("tt"), cells: _*)
    val stackArgs = ContextGrid.zipWithIndex
      .map { case (l, i) => s"CAST($l AS BIGINT), f$i, t$i, lost$i, w$i, pad$i, k$i" }
      .mkString(", ")
    tot
      .select(col("tt"), expr(s"stack(${ContextGrid.size}, $stackArgs) AS " +
        "(ctx_len, n_docs_fit, n_docs_trunc, lost_tokens, n_windows, pad_tokens, kept)"))
      .select(col("ctx_len"), col("n_docs_fit"), col("n_docs_trunc"),
        col("lost_tokens"), col("n_windows"), col("pad_tokens"),
        r6(when(col("tt") === 0, 0.0)
          .otherwise(col("kept").cast("double") / col("tt"))).as("kept_frac"))
      .orderBy(col("ctx_len"))
  }

  def contextBudgetReport(s: SparkSession, dir: String): DataFrame =
    contextBudgetReportOf(t(s, dir, "documents"))

  /** Oracle mirror (prefix `cbr_`): one conditional-aggregate arm per
    * context length over one materialized word-count CTE; `//` is
    * DuckDB's integral division matching Spark's `div`. */
  val contextBudgetReportSql: String = {
    val arms = ContextGrid.map { l =>
      s"""SELECT CAST($l AS BIGINT) AS ctx_len,
         |  CAST(COALESCE(SUM(CASE WHEN n <= $l THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_docs_fit,
         |  CAST(COALESCE(SUM(CASE WHEN n > $l THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_docs_trunc,
         |  CAST(COALESCE(SUM(CASE WHEN n > $l THEN n - $l ELSE 0 END), 0) AS BIGINT) AS lost_tokens,
         |  CAST(COALESCE(SUM((n + ${l - 1}) // $l), 0) AS BIGINT) AS n_windows,
         |  CAST(COALESCE(SUM(((n + ${l - 1}) // $l) * $l - n), 0) AS BIGINT) AS pad_tokens,
         |  round(CASE WHEN COALESCE(SUM(n), 0) = 0 THEN 0.0
         |             ELSE CAST(SUM(least(n, $l)) AS DOUBLE) / SUM(n)
         |        END, 6) + 0 AS kept_frac
         |FROM cbr_n""".stripMargin
    }
    s"""WITH cbr_n AS MATERIALIZED (
       |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents)
       |SELECT * FROM (
       |${arms.mkString("\nUNION ALL\n")}
       |)
       |ORDER BY ctx_len""".stripMargin
  }

  // ---- Per-source document cap ----

  /** Documents kept per source by [[sourceCapSample]] — the domain
    * cap (C4's per-host page cap): no source may contribute more
    * than this many docs, whatever its crawl volume. 16 bites most
    * of the fixtures' 20 × ~25-doc sources and everything at larger
    * SFs. */
  val CapDocsPerSource = 16

  /** Per-source document cap — the anti-domination sampling step:
    * each source keeps its first [[CapDocsPerSource]] docs in
    * deterministic hash order (reproducible like every sample here —
    * the [[sampleHash]] rule: no RNG, same survivors on 1 or 1000
    * executors), and the report shows what the cap cost each source.
    *
    * Scale shape: ONE corpus scan; ONE shuffle on source for the
    * row_number window; the per-source aggregation reuses the same
    * partitioning (no second exchange — PlanSpec pins it). A
    * mega-source makes its window sort-heavy; the documented swap is
    * the hash-threshold pre-filter (keep buckets < cap/n̂ estimate)
    * at the cost of an approximate cap. */
  def sourceCapSampleOf(d: DataFrame): DataFrame = {
    val docs = d.select(col("doc_id"), col("source"),
      size(ws).cast("long").as("n_tok"),
      md5(concat(lit("cap:"), col("doc_id").cast("string"))).as("h"))
    val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    docs.withColumn("rn", row_number().over(w))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("rn") <= CapDocsPerSource, 1L).otherwise(0L)).as("n_kept"),
        sum(col("n_tok")).as("total_tokens"),
        sum(when(col("rn") <= CapDocsPerSource, col("n_tok")).otherwise(0L))
          .as("kept_tokens"))
      .select(col("source"), col("n_docs"), col("n_kept"),
        col("total_tokens"), col("kept_tokens"),
        r6((col("n_docs") - col("n_kept")).cast("double") / col("n_docs"))
          .as("drop_frac"))
      .orderBy(col("source"))
  }

  def sourceCapSample(s: SparkSession, dir: String): DataFrame =
    sourceCapSampleOf(t(s, dir, "documents"))

  /** Arrival-order per-doc cap decisions — the batch mirror of the
    * streaming gate ([[graft.streaming.StreamingIndex.sourceCapStream]]):
    * doc_id is the explicit arrival axis (the incremental-scrub
    * convention), each source's first `cap` arrivals keep. Same
    * single source-keyed window as the hash-order report. */
  def sourceCapArrivalOf(d: DataFrame,
      cap: Int = CapDocsPerSource): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    d.select(col("doc_id"), col("source"))
      .withColumn("keep",
        (row_number().over(w) <= cap).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** Oracle mirror (prefix `scs_`): identical hash order and cap. */
  val sourceCapSampleSql: String =
    s"""WITH scs_r AS (
       |  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
       |  FROM documents)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN rn <= $CapDocsPerSource THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       |  CAST(SUM(CASE WHEN rn <= $CapDocsPerSource THEN n_tok ELSE 0 END) AS BIGINT) AS kept_tokens,
       |  round(CAST(COUNT(*) - SUM(CASE WHEN rn <= $CapDocsPerSource THEN 1 ELSE 0 END) AS DOUBLE)
       |        / COUNT(*), 6) + 0 AS drop_frac
       |FROM scs_r
       |GROUP BY source
       |ORDER BY source""".stripMargin

  // ---- Release pipeline ----

  /** The full release composition — what a curated-corpus RELEASE
    * actually runs, as ONE dataflow: exact-dedup survivorship →
    * Gopher quality → language ID → length gate (the
    * [[funnelReport]] stage order), then the per-source cap
    * ([[sourceCapSampleOf]]'s deterministic md5 order, applied to
    * the post-filter survivors — the cap ranks what the release
    * would actually keep, not raw arrivals) and the
    * train/val/test split assignment ([[dataSplit]]'s source-salted
    * hash). Every stage is individually proven elsewhere; this pins
    * that they COMPOSE off ONE corpus scan (the per-doc flags are
    * map-side or windowed over that scan — no stage re-joins its
    * own scan of `documents`; PlanSpec pins ≤2 scans, actual 1).
    *
    * Scale shape: one scan; one text-keyed exchange (survivorship),
    * one source-keyed exchange (cap + split share the key). The
    * released rows are the ONLY thing that crosses the final
    * stage — a 100 TB release writes survivors, never re-derives
    * them per stage. */
  private def releaseRowsOf(d: DataFrame): DataFrame = {
    val sig = gopherSignals(d, Seq("text", "source", "lang", "n_chars"))
    val wTxt = Window.partitionBy(col("text"))
    val kept = sig
      .withColumn("is_survivor",
        (col("doc_id") === min(col("doc_id")).over(wTxt)).cast("int"))
      .withColumn("gopher_keep", gopherKeep(lit(GopherTwfMax)).cast("int"))
      .withColumn("lang_ok",
        (TextOps.markerHitsOf(ws) >= 1).cast("int"))
      .withColumn("len_ok", col("n_chars").between(50, 100000).cast("int"))
      .filter(col("is_survivor") === 1 && col("gopher_keep") === 1 &&
        col("lang_ok") === 1 && col("len_ok") === 1)
    val wSrc = Window.partitionBy(col("source"))
      .orderBy(md5(concat(lit("cap:"), col("doc_id").cast("string"))), col("doc_id"))
    kept.withColumn("rn", row_number().over(wSrc))
      .filter(col("rn") <= CapDocsPerSource)
      .select(col("doc_id"), col("text"), col("source"), col("lang"),
        splitCol.as("split"), col("n_words").cast("long").as("n_tokens"),
        col("n_chars"))
  }

  def releasePipelineOf(d: DataFrame): DataFrame =
    releaseRowsOf(d).drop("text").orderBy(col("doc_id"))

  def releasePipeline(s: SparkSession, dir: String): DataFrame =
    releasePipelineOf(t(s, dir, "documents", resplit = true))

  /** Materialize the release: curated rows (WITH text) written as
    * parquet partitioned by split — the layout a trainer reads
    * split-pruned — plus a `_manifest` JSON of per-(split, lang)
    * doc/token counts (the dataset-card summary shipped beside the
    * data). One job derives both from the same survivor relation. */
  def releaseWrite(s: SparkSession, dir: String, outDir: String): Unit =
    releaseWriteOf(t(s, dir, "documents"), outDir)

  def releaseWriteOf(d: DataFrame, outDir: String): Unit = {
    val rows = releaseRowsOf(d)
    rows.write.mode("overwrite").partitionBy("split").parquet(outDir + "/corpus")
    rows.groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"))
      .orderBy(col("split"), col("lang"))
      .coalesce(1)
      .write.mode("overwrite").json(outDir + "/_manifest")
  }

  /** Oracle mirror (prefix `rel_`): the same flag algebra as
    * [[curationPipelineSql]] carried through the cap window and the
    * split case — one WHERE conjunction, md5 cap order, salted
    * split hash. */
  val releasePipelineSql: String =
    s"""WITH rel_b AS (
       |  SELECT doc_id, text, source, lang, n_chars,
       |    string_split(text, ' ') AS w,
       |    len(string_split(text, ' ')) AS n_words
       |  FROM documents),
       |rel_m AS (
       |  SELECT doc_id, text, source, lang, n_chars, n_words,
       |    CAST(list_max(list_transform(list_distinct(w),
       |      x -> len(list_filter(w, y -> y = x)))) AS DOUBLE) / n_words AS twf,
       |    CASE WHEN n_words >= 2 THEN
       |      1.0 - CAST(len(list_distinct([w[i] || ' ' || w[i+1]
       |              FOR i IN generate_series(1, len(w) - 1)])) AS DOUBLE)
       |            / (n_words - 1)
       |    ELSE 0.0 END AS dup_frac,
       |    CAST(length(text) - n_words + 1 AS DOUBLE) / n_words AS mwl,
       |    greatest(
       |      len(list_filter(w, x -> x IN ('the','a','and','of','is'))),
       |      len(list_filter(w, x -> x IN ('der','die','das','und','ist'))),
       |      len(list_filter(w, x -> x IN ('el','la','los','es','y'))),
       |      len(list_filter(w, x -> x IN ('le','la','les','est','et'))),
       |      len(list_filter(w, x -> x IN ('de','shi','le','zai','he')))) AS hits
       |  FROM rel_b),
       |rel_f AS (
       |  SELECT doc_id, source, lang, n_words, n_chars,
       |    CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY text)
       |         THEN 1 ELSE 0 END AS is_survivor,
       |    CASE WHEN twf <= $GopherTwfMax AND dup_frac <= $GopherDupMax
       |          AND mwl >= $GopherMwlMin AND mwl <= $GopherMwlMax
       |         THEN 1 ELSE 0 END AS gopher_keep,
       |    CASE WHEN hits >= 1 THEN 1 ELSE 0 END AS lang_ok,
       |    CASE WHEN n_chars BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS len_ok
       |  FROM rel_m),
       |rel_s AS (
       |  SELECT doc_id, source, lang, n_words, n_chars,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
       |  FROM rel_f
       |  WHERE is_survivor = 1 AND gopher_keep = 1
       |    AND lang_ok = 1 AND len_ok = 1)
       |SELECT doc_id, source, lang, $splitCaseSql AS split,
       |  CAST(n_words AS BIGINT) AS n_tokens, n_chars
       |FROM rel_s
       |WHERE rn <= $CapDocsPerSource
       |ORDER BY doc_id""".stripMargin

  // ---- Markup / extraction artifacts ----

  /** Extraction-artifact report — the HTML-pipeline QA table
    * ([[boilerplateReport]] catches repeated LINES; this catches
    * markup the extractor failed to strip INSIDE lines): per source,
    * docs carrying residual HTML entities (`&amp;`-style), tag-like
    * openings (`<div`), live URLs, or literal backslash escapes
    * (`\n` as two characters — the serialized-JSON-in-text tell),
    * with per-kind match totals and the flagged-doc rate. A source
    * at a high rate needs an extractor fix upstream, not per-doc
    * scrubbing (the [[piiReport]] release-checklist rule).
    *
    * Scale shape: ONE corpus scan, all four counters as
    * `regexp_extract_all` lengths in the same projection (codegen'd,
    * map-only), ONE per-source aggregation. Patterns avoid `\\s` and
    * backreferences — the Java/RE2 class-parity rule from
    * homoglyph_dedup. */
  def markupArtifactsReportOf(d: DataFrame): DataFrame =
    markupFlagsOf(d)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(lit(1L) - col("keep")).as("n_flagged"),
        sum(col("n_entities")).as("n_entities"),
        sum(col("n_tags")).as("n_tags"),
        sum(col("n_urls")).as("n_urls"),
        sum(col("n_escapes")).as("n_escapes"))
      .select(col("source"), col("n_docs"), col("n_flagged"),
        col("n_entities"), col("n_tags"), col("n_urls"), col("n_escapes"),
        r6(col("n_flagged").cast("double") / col("n_docs")).as("flag_rate"))
      .orderBy(col("source"))

  def markupArtifactsReport(s: SparkSession, dir: String): DataFrame =
    markupArtifactsReportOf(t(s, dir, "documents"))

  /** Per-doc artifact flags — the row-local half of
    * [[markupArtifactsReportOf]], shared verbatim with the streaming
    * gate ([[graft.streaming.StreamingIndex.markupGateStream]]) so
    * batch and stream decisions cannot drift; grouping these rows by
    * source reproduces the report's counters exactly (spec-pinned). */
  def markupFlagsOf(d: DataFrame): DataFrame = {
    def cnt(pat: String): Column =
      size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long")
    d.select(col("doc_id"), col("source"),
      cnt("&[a-z]+;").as("n_entities"), cnt("<[a-z][a-z0-9]*").as("n_tags"),
      cnt("https?://[^ ]+").as("n_urls"), cnt("\\\\[nrt]").as("n_escapes"))
      .withColumn("keep",
        (col("n_entities") + col("n_tags") + col("n_urls") + col("n_escapes") === 0)
          .cast("int"))
  }

  /** Oracle mirror (prefix `mar_`): identical RE2-safe patterns. */
  val markupArtifactsReportSql: String =
    """WITH mar_c AS (
      |  SELECT source,
      |    CAST(len(regexp_extract_all(text, '&[a-z]+;')) AS BIGINT) AS ce,
      |    CAST(len(regexp_extract_all(text, '<[a-z][a-z0-9]*')) AS BIGINT) AS ct,
      |    CAST(len(regexp_extract_all(text, 'https?://[^ ]+')) AS BIGINT) AS cu,
      |    CAST(len(regexp_extract_all(text, '\\[nrt]')) AS BIGINT) AS cx
      |  FROM documents)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN ce + ct + cu + cx > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
      |  CAST(SUM(ce) AS BIGINT) AS n_entities,
      |  CAST(SUM(ct) AS BIGINT) AS n_tags,
      |  CAST(SUM(cu) AS BIGINT) AS n_urls,
      |  CAST(SUM(cx) AS BIGINT) AS n_escapes,
      |  round(CAST(SUM(CASE WHEN ce + ct + cu + cx > 0 THEN 1 ELSE 0 END) AS DOUBLE)
      |        / COUNT(*), 6) + 0 AS flag_rate
      |FROM mar_c
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // ---- encoding-damage (mojibake) report ----

  /** Per-doc encoding-damage counters — the row-local half of
    * [[mojibakeReportOf]], shared verbatim with the streaming gate
    * ([[graft.streaming.StreamingIndex.mojibakeGateStream]]) so batch
    * and stream decisions cannot drift. Four independent signals of
    * UTF-8 text that went through a wrong-codec round-trip:
    *
    *  - `n_latin1`: the classic double-encoding digraph — a UTF-8
    *    lead byte 0xC2/0xC3 decoded as Latin-1 (the char Â/Ã)
    *    followed by a continuation-range char (U+0080–U+00BF).
    *    "Café" damaged reads "CafÃ©".
    *  - `n_punct3`: the 3-byte punctuation family (curly quotes,
    *    dashes, ellipsis) under the same damage — â (U+00E2) plus
    *    two continuation-range chars ("don't" reads "donâ€™t").
    *  - `n_fffd`: U+FFFD replacement chars — a decoder already gave
    *    up once; the original bytes are unrecoverable.
    *  - `n_c1`: bare C1 control chars (U+0080–U+009F) — legal in no
    *    text encoding's output, the windows-1252-decoded-as-latin1
    *    tell.
    *
    * Patterns are `\x{hhhh}` code-point classes — identical semantics
    * in Java regex and DuckDB's RE2 (the homoglyph_dedup parity
    * rule), and no literal non-ASCII chars ride in source or SQL. */
  def mojibakeFlagsOf(d: DataFrame): DataFrame = {
    def cnt(pat: String): Column =
      size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long")
    d.select(col("doc_id"), col("source"),
      cnt("[\\x{00C2}\\x{00C3}][\\x{0080}-\\x{00BF}]").as("n_latin1"),
      cnt("\\x{00E2}[\\x{0080}-\\x{00BF}]{2}").as("n_punct3"),
      cnt("\\x{FFFD}").as("n_fffd"),
      cnt("[\\x{0080}-\\x{009F}]").as("n_c1"))
      .withColumn("keep",
        (col("n_latin1") + col("n_punct3") + col("n_fffd") + col("n_c1") === 0)
          .cast("int"))
  }

  /** Per-source encoding-damage report — the release-checklist view
    * of [[mojibakeFlagsOf]]: a source with a high mojibake rate was
    * scraped or transcoded through the wrong codec and needs a
    * re-ingest, not per-doc scrubbing (the [[piiReport]] rule; cousin
    * of [[markupArtifactsReportOf]], which audits extraction damage —
    * this audits ENCODING damage).
    *
    * Scale shape: ONE corpus scan, all four counters as
    * `regexp_extract_all` lengths in the same codegen'd map-only
    * projection, ONE per-source aggregation. */
  def mojibakeReportOf(d: DataFrame): DataFrame =
    mojibakeFlagsOf(d)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(lit(1L) - col("keep")).as("n_flagged"),
        sum(col("n_latin1")).as("n_latin1"),
        sum(col("n_punct3")).as("n_punct3"),
        sum(col("n_fffd")).as("n_fffd"),
        sum(col("n_c1")).as("n_c1"))
      .select(col("source"), col("n_docs"), col("n_flagged"),
        col("n_latin1"), col("n_punct3"), col("n_fffd"), col("n_c1"),
        r6(col("n_flagged").cast("double") / col("n_docs")).as("flag_rate"))
      .orderBy(col("source"))

  def mojibakeReport(s: SparkSession, dir: String): DataFrame =
    mojibakeReportOf(t(s, dir, "documents"))

  /** Oracle mirror (prefix `moj_`): identical code-point classes. */
  val mojibakeReportSql: String =
    """WITH moj_c AS (
      |  SELECT source,
      |    CAST(len(regexp_extract_all(text, '[\x{00C2}\x{00C3}][\x{0080}-\x{00BF}]')) AS BIGINT) AS cl,
      |    CAST(len(regexp_extract_all(text, '\x{00E2}[\x{0080}-\x{00BF}]{2}')) AS BIGINT) AS cp,
      |    CAST(len(regexp_extract_all(text, '\x{FFFD}')) AS BIGINT) AS cf,
      |    CAST(len(regexp_extract_all(text, '[\x{0080}-\x{009F}]')) AS BIGINT) AS cc
      |  FROM documents)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN cl + cp + cf + cc > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
      |  CAST(SUM(cl) AS BIGINT) AS n_latin1,
      |  CAST(SUM(cp) AS BIGINT) AS n_punct3,
      |  CAST(SUM(cf) AS BIGINT) AS n_fffd,
      |  CAST(SUM(cc) AS BIGINT) AS n_c1,
      |  round(CAST(SUM(CASE WHEN cl + cp + cf + cc > 0 THEN 1 ELSE 0 END) AS DOUBLE)
      |        / COUNT(*), 6) + 0 AS flag_rate
      |FROM moj_c
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // ---- synthetic-text (LLM-boilerplate) contamination report ----

  /** Marker phrases of machine-generated text, matched lowercase.
    * Deliberately the assistant-boilerplate register (refusals,
    * hedges, chat-UI strings) — phrases essentially absent from
    * organic web text but dense in LLM output that leaked back into
    * crawls. Fixed, ordered, ASCII; the order is the deterministic
    * tie-break for the per-source dominant marker. */
  val SyntheticMarkers: Seq[String] = Seq(
    "as an ai language model",
    "as a large language model",
    "as of my knowledge cutoff",
    "i cannot assist with",
    "i hope this helps",
    "it's important to note that",
    "let's delve into",
    "regenerate response")

  /** Per-doc marker-hit counters — the row-local half of
    * [[syntheticTextReportOf]], shared verbatim with the streaming
    * gate ([[graft.streaming.StreamingIndex.syntheticGateStream]]).
    * Hit counting is the exact length-difference identity
    * (len(t) − len(replace(t, m, ''))) / len(m) — literal substring
    * matching, no regex, identical non-overlapping scan semantics in
    * Spark and DuckDB; the division is exact (the difference is a
    * multiple of len(m), both well inside double's exact-integer
    * range for any real document). */
  def syntheticHitsOf(d: DataFrame): DataFrame = {
    val lo = lower(col("text"))
    val hits = SyntheticMarkers.zipWithIndex.map { case (m, i) =>
      ((length(lo) - length(replace(lo, lit(m), lit("")))) / lit(m.length))
        .cast("long").as(s"h$i")
    }
    val total = SyntheticMarkers.indices.map(i => col(s"h$i")).reduce(_ + _)
    d.select(Seq(col("doc_id"), col("source")) ++ hits: _*)
      .withColumn("n_hits", total)
      .withColumn("keep", (col("n_hits") === 0).cast("int"))
  }

  /** Per-source synthetic-text contamination report — the
    * model-collapse audit a post-2022 crawl needs: how much of each
    * source is LLM output that leaked back into the training pool.
    * Flagged docs, total marker hits, the DOMINANT marker per source
    * (max hits, ties to the earlier marker in [[SyntheticMarkers]] —
    * '' with 0 hits when a source is clean), and the flag rate.
    *
    * Scale shape: ONE corpus scan — all eight counters are literal
    * replace/length arithmetic in the same codegen'd projection —
    * then ONE per-source aggregation carrying the eight conditional
    * sums as columns; the dominant-marker argmax runs on the
    * AGGREGATED relation (sources × 8 rows via an exploded literal
    * map, a source-keyed window on megabytes at any corpus size). */
  def syntheticTextReportOf(d: DataFrame): DataFrame = {
    val aggCols = Seq(
      sum(lit(1L) - col("keep")).as("n_flagged"),
      sum(col("n_hits")).as("total_hits")) ++
      SyntheticMarkers.indices.map(i => sum(col(s"h$i")).as(s"s$i"))
    val perSource = syntheticHitsOf(d)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), aggCols: _*)
    val markerMap = map(SyntheticMarkers.zipWithIndex.flatMap {
      case (m, i) => Seq(lit(m), col(s"s$i"))
    }: _*)
    val stacked = perSource
      .select(col("source"), col("n_docs"), col("n_flagged"), col("total_hits"),
        explode(markerMap).as(Seq("marker", "hits")))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("hits").desc, col("marker"))
    stacked
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("source"), col("n_docs"), col("n_flagged"), col("total_hits"),
        r6(col("n_flagged").cast("double") / col("n_docs")).as("flag_rate"),
        when(col("total_hits") === 0, lit("")).otherwise(col("marker")).as("top_marker"),
        when(col("total_hits") === 0, lit(0L)).otherwise(col("hits")).as("top_marker_hits"))
      .orderBy(col("source"))
  }

  def syntheticTextReport(s: SparkSession, dir: String): DataFrame =
    syntheticTextReportOf(t(s, dir, "documents"))

  /** Oracle mirror (prefix `syn_`): the same length-difference hit
    * identity, the argmax as a UNION ALL stack over the aggregated
    * relation + one window. */
  lazy val syntheticTextReportSql: String = {
    def esc(m: String) = m.replace("'", "''")
    val cols = SyntheticMarkers.zipWithIndex.map { case (m, i) =>
      s"CAST((length(lower(text)) - length(replace(lower(text), '${esc(m)}', ''))) // ${m.length} AS BIGINT) AS h$i"
    }.mkString(",\n|    ")
    val sums = SyntheticMarkers.indices.map(i => s"CAST(SUM(h$i) AS BIGINT) AS s$i")
      .mkString(", ")
    val hitSum = SyntheticMarkers.indices.map(i => s"h$i").mkString(" + ")
    val stack = SyntheticMarkers.zipWithIndex.map { case (m, i) =>
      s"SELECT source, '${esc(m)}' AS marker, s$i AS hits FROM syn_a"
    }.mkString("\n|  UNION ALL ")
    s"""WITH syn_c AS (
       |  SELECT source,
       |    $cols
       |  FROM documents),
       |syn_a AS MATERIALIZED (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(CASE WHEN $hitSum > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       |    CAST(SUM($hitSum) AS BIGINT) AS total_hits,
       |    $sums
       |  FROM syn_c
       |  GROUP BY source),
       |syn_s AS (
       |  $stack),
       |syn_r AS (
       |  SELECT source, marker, hits,
       |    row_number() OVER (PARTITION BY source ORDER BY hits DESC, marker) AS rn
       |  FROM syn_s)
       |SELECT a.source, a.n_docs, a.n_flagged, a.total_hits,
       |  round(CAST(a.n_flagged AS DOUBLE) / a.n_docs, 6) + 0 AS flag_rate,
       |  CASE WHEN a.total_hits = 0 THEN '' ELSE r.marker END AS top_marker,
       |  CASE WHEN a.total_hits = 0 THEN 0 ELSE r.hits END AS top_marker_hits
       |FROM syn_a a JOIN syn_r r ON r.source = a.source AND r.rn = 1
       |ORDER BY a.source""".stripMargin
  }

  // ---- code-content ratio report ----

  /** Punctuation-signal floor for [[codeRatioReportOf]]'s is_code
    * flag: a doc with ≥ this many brace/semicolon hits reads as
    * code. */
  val CodePunctMin = 4

  /** Keyword-signal floor: ≥ this many whole-word code keywords. */
  val CodeKwMin = 2

  /** Code-keyword alternation — whole-word (`\b`), case-sensitive
    * (real code keywords are lowercase; prose "Class" or "Return" at
    * sentence start stays out). ASCII word boundaries behave
    * identically in Java regex and RE2. */
  val CodeKwPattern = "\\b(def|class|import|return|void|function)\\b"

  /** Per-source code-content ratio — the MIXTURE statistic (not a
    * quality filter) an LLM data recipe needs: what fraction of each
    * source is source code rather than prose. Code share drives
    * reasoning-benchmark performance and is a headline number of
    * every dataset card, so it must come from the corpus, not from
    * source-name heuristics. A doc flags as code on either of two
    * independent signals: structural punctuation density
    * (braces + semicolons ≥ [[CodePunctMin]]) or whole-word code
    * keywords (≥ [[CodeKwMin]] of [[CodeKwPattern]]).
    *
    * Cousin of [[markupArtifactsReportOf]] (extraction damage) and
    * [[mojibakeReportOf]] (encoding damage) — this one classifies
    * content TYPE; the three share the one-scan/one-agg shape.
    *
    * Scale shape: ONE corpus scan, both counters in the same
    * codegen'd map-only projection, ONE per-source aggregation. */
  def codeRatioReportOf(d: DataFrame): DataFrame = {
    def cnt(pat: String): Column =
      size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long")
    d.select(col("source"),
      cnt("[{};]").as("n_punct"),
      cnt(CodeKwPattern).as("n_kw"))
      .withColumn("is_code",
        (col("n_punct") >= CodePunctMin || col("n_kw") >= CodeKwMin).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("is_code")).as("n_code"),
        sum(col("n_punct")).as("n_punct"),
        sum(col("n_kw")).as("n_keywords"))
      .select(col("source"), col("n_docs"), col("n_code"),
        col("n_punct"), col("n_keywords"),
        r6(col("n_code").cast("double") / col("n_docs")).as("code_rate"))
      .orderBy(col("source"))
  }

  def codeRatioReport(s: SparkSession, dir: String): DataFrame =
    codeRatioReportOf(t(s, dir, "documents"))

  /** Oracle mirror (prefix `cdr_`): identical patterns and floors. */
  val codeRatioReportSql: String =
    s"""WITH cdr_c AS (
       |  SELECT source,
       |    CAST(len(regexp_extract_all(text, '[{};]')) AS BIGINT) AS np,
       |    CAST(len(regexp_extract_all(text, '$CodeKwPattern')) AS BIGINT) AS nk
       |  FROM documents)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN np >= $CodePunctMin OR nk >= $CodeKwMin THEN 1 ELSE 0 END) AS BIGINT) AS n_code,
       |  CAST(SUM(np) AS BIGINT) AS n_punct,
       |  CAST(SUM(nk) AS BIGINT) AS n_keywords,
       |  round(CAST(SUM(CASE WHEN np >= $CodePunctMin OR nk >= $CodeKwMin THEN 1 ELSE 0 END) AS DOUBLE)
       |        / COUNT(*), 6) + 0 AS code_rate
       |FROM cdr_c
       |GROUP BY source
       |ORDER BY source""".stripMargin

  // ---- quality↔length confound report ----

  /** Per-source Pearson correlation between the fused ensemble
    * quality score ([[qualityEnsemble]]'s micro-unit `fused`) and
    * document length — the confound audit every filter ablation
    * needs: a quality filter that correlates strongly with length is
    * a length filter in disguise, and "keep high quality" silently
    * reshapes the corpus length distribution (the
    * [[lengthBiasReport]] signal, reduced to one number per source,
    * plus the corpus-total `(all)` row from the same rollup).
    *
    * Arithmetic bridge: x = the fused score lifted back to exact
    * micro-units (BIGINT), y = n_chars (BIGINT). All five moment
    * sums accumulate in DECIMAL(38,0) — per-doc products x·y ≤ 1e15
    * and x² ≤ 1e12 fit BIGINT at any document size, and the DECIMAL
    * sums hold to ~1e12 docs; r's numerator n·Σxy − Σx·Σy and the
    * two variance terms stay DECIMAL-exact, cast to double only for
    * the final sqrt/divide (both engines round the same exact
    * integers to the same doubles — IEEE), then r6. Zero variance on
    * either side (a constant-score or constant-length source) pins
    * r = 0.
    *
    * Scale shape: the ensemble relation is the one already-gated
    * chain; ONE narrow doc-keyed join against (doc_id, source,
    * n_chars); ONE rollup aggregation serves every source AND the
    * corpus row (never a second agg + union). */
  def qualityLengthConfound(s: SparkSession, dir: String): DataFrame = {
    val q = qualityEnsemble(s, dir).select(col("doc_id"),
      round(col("fused") * 1e6).cast("long").as("x"))
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars").as("y"))
    confoundOf(d.join(q, "doc_id"))
  }

  /** The rollup/Pearson half of [[qualityLengthConfound]] over
    * (source, x: long, y: long) rows — exposed for the crafted-data
    * spec (r = ±1 on exact linear data, 0 on zero variance). */
  private[graft] def confoundOf(xy: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val g = xy
      .rollup(col("source"))
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("x").cast(dec)).as("sx"),
        sum(col("y").cast(dec)).as("sy"),
        sum((col("x") * col("y")).cast(dec)).as("sxy"),
        sum((col("x") * col("x")).cast(dec)).as("sxx"),
        sum((col("y") * col("y")).cast(dec)).as("syy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val vy = col("n") * col("syy") - col("sy") * col("sy")
    g.select(
        coalesce(col("source"), lit("(all)")).as("source"),
        col("n").cast("long").as("n_docs"),
        when(vx <= 0 || vy <= 0, lit(0.0))
          .otherwise(r6(num.cast("double") /
            sqrt(vx.cast("double") * vy.cast("double"))))
          .as("corr_quality_length"))
      .orderBy(col("source"))
  }

  /** Oracle mirror (prefix `qlc_`): HUGEINT moment sums (DuckDB's
    * exact 128-bit twin of the engine's DECIMAL(38,0)), GROUPING
    * SETS for the per-source + `(all)` rows, the same
    * zero-variance guard. */
  lazy val qualityLengthConfoundSql: String =
    s"""WITH qlc_q AS MATERIALIZED (
       |  SELECT doc_id, CAST(round(fused * 1000000) AS BIGINT) AS x
       |  FROM ($qualityEnsembleSql)),
       |qlc_j AS (
       |  SELECT d.source, q.x, d.n_chars AS y
       |  FROM documents d JOIN qlc_q q USING (doc_id)),
       |qlc_g AS (
       |  SELECT source,
       |    CAST(COUNT(*) AS HUGEINT) AS n,
       |    CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
       |    CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
       |    CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
       |    CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
       |    CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
       |  FROM qlc_j
       |  GROUP BY GROUPING SETS ((source), ()))
       |SELECT COALESCE(source, '(all)') AS source,
       |  CAST(n AS BIGINT) AS n_docs,
       |  CASE WHEN n * sxx - sx * sx <= 0 OR n * syy - sy * sy <= 0 THEN 0.0
       |       ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
       |                  / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
       |                         * CAST(n * syy - sy * sy AS DOUBLE)), 6) + 0
       |  END AS corr_quality_length
       |FROM qlc_g
       |ORDER BY source""".stripMargin

  // ---- LM anomaly spans ----

  /** Sliding-window width (words) for [[lmAnomalySpans]]. */
  val LmAnomalyWindow = 8

  /** Flag margin over the corpus-mean per-token NLL, in exact
    * micro-nats: a window flags when its mean NLL exceeds the corpus
    * mean by 0.5 nats. Integer micro-units end to end — the
    * threshold compare is BIGINT arithmetic, never a float half-tie
    * (§8.5 micro-unit rule). */
  val LmAnomalyMarginMicro = 500000L

  /** Intra-document LM anomaly spans — the garbage-segment detector
    * quality filters need but doc-level scores blur: a run of
    * improbable tokens in the MIDDLE of an otherwise-normal doc
    * (extraction failure, encoding junk, injected boilerplate)
    * barely moves [[graft.ops.Retrieval.unigramLogprob]]'s doc mean,
    * but every [[LmAnomalyWindow]]-word window over it spikes. Flag
    * windows whose mean unigram NLL exceeds the corpus mean by
    * [[LmAnomalyMarginMicro]], merge overlapping flagged windows
    * into spans (the [[graft.ops.Dedup.memorizationSpans]]
    * gaps-and-islands rule: r consecutive flagged starts = ONE span
    * of r + W − 1 words), report per doc: span count, longest span,
    * worst window NLL. Top-50 by span length, ties to the lower doc.
    *
    * Scale shape: one posexplode pass (corpus×tokens rows, the LM
    * family's standard cost); the vocabulary join is key-partitioned
    * with NO static hint (the unigramLogprob rule — vocab is
    * billions of rows at web scale, AQE broadcasts when measured
    * small); corpus total and mean are 1-row broadcast scalars; the
    * window sum, islands, and both aggregations are all DOC-keyed —
    * bounded by doc length, never corpus-wide. Per-position NLL
    * rides exact micro-nat BIGINTs (floor(x·1e6) — repr-free,
    * bit-identical cross-engine given bit-identical ln inputs). */
  def lmAnomalySpansOf(d: DataFrame): DataFrame = {
    val W = LmAnomalyWindow
    val toks = d.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cw"))
    val total = vocab.agg(sum(col("cw")).as("t"))
    // per-TOKEN micro-nll lives on the vocabulary relation; the
    // corpus mean is the cw-weighted vocab mean — derived WITHOUT a
    // second corpus pass, in exact integral arithmetic (DECIMAL(38)
    // product sum: Σ cw·m overflows BIGINT past ~2e11 tokens, and
    // `div` is Spark's IntegralDivide — defined on DECIMAL, exact)
    val vocabm = vocab.crossJoin(broadcast(total))
      .withColumn("m",
        floor(-log(col("cw").cast("double") / col("t")) * lit(1e6)).cast("long"))
    val mu = vocabm.agg(
      expr("CAST(sum(CAST(cw AS DECIMAL(38,0)) * m) div CAST(max(t) AS DECIMAL(38,0)) AS BIGINT)")
        .as("mean_m"))
    val nll = toks.join(vocabm.select(col("tok"), col("m")), "tok")
      .select(col("doc_id"), col("pos"), col("m"))
    val wWin = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, W - 1)
    val flagged = nll
      .withColumn("s", sum(col("m")).over(wWin))
      .withColumn("cnt", count(lit(1)).over(wWin))
      .crossJoin(broadcast(mu))
      .filter(col("cnt") === W &&
        col("s") > lit(W) * (col("mean_m") + lit(LmAnomalyMarginMicro)))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    flagged
      .withColumn("island", col("pos") - row_number().over(wDoc))
      .groupBy(col("doc_id"), col("island"))
      .agg(count(lit(1)).as("run"), max(col("s")).as("ws"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        (max(col("run")) + lit(W - 1)).as("longest_span_words"),
        max(col("ws")).as("worst"))
      .select(col("doc_id"), col("n_spans"), col("longest_span_words"),
        r6(col("worst").cast("double") / lit(W * 1e6)).as("worst_win_nll"))
      .orderBy(col("longest_span_words").desc, col("doc_id"))
      .limit(50)
  }

  def lmAnomalySpans(s: SparkSession, dir: String): DataFrame =
    lmAnomalySpansOf(t(s, dir, "documents"))

  /** Oracle mirror (prefix `las_`): the mean divides in HUGEINT
    * (DuckDB's `//` on DECIMAL is true division — only integer
    * types floor-divide; HUGEINT holds the DECIMAL(38) sum exactly),
    * matching Spark's IntegralDivide-on-DECIMAL; same
    * window/island/limit chain. */
  val lmAnomalySpansSql: String = {
    val W = LmAnomalyWindow
    s"""WITH las_d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |las_t AS MATERIALIZED (
       |  SELECT doc_id, i AS pos, w[i + 1] AS tok
       |  FROM las_d, UNNEST(range(0, len(w))) AS t(i)),
       |las_v AS (SELECT tok, COUNT(*) AS cw FROM las_t GROUP BY tok),
       |las_tot AS (SELECT SUM(cw) AS t FROM las_v),
       |las_vm AS MATERIALIZED (
       |  SELECT tok, cw,
       |    CAST(floor(-ln(CAST(cw AS DOUBLE) / t) * 1e6) AS BIGINT) AS m
       |  FROM las_v CROSS JOIN las_tot),
       |las_m AS MATERIALIZED (
       |  SELECT doc_id, pos, m FROM las_t JOIN las_vm USING (tok)),
       |las_mu AS (
       |  SELECT CAST(CAST(SUM(CAST(cw AS DECIMAL(38,0)) * m) AS HUGEINT)
       |              // CAST((SELECT t FROM las_tot) AS HUGEINT) AS BIGINT) AS mean_m
       |  FROM las_vm),
       |las_w AS (
       |  SELECT doc_id, pos,
       |    SUM(m) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN CURRENT ROW AND ${W - 1} FOLLOWING) AS s,
       |    COUNT(*) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN CURRENT ROW AND ${W - 1} FOLLOWING) AS cnt
       |  FROM las_m),
       |las_f AS (
       |  SELECT doc_id, pos, s FROM las_w, las_mu
       |  WHERE cnt = $W AND s > $W * (mean_m + $LmAnomalyMarginMicro)),
       |las_i AS (
       |  SELECT doc_id, s,
       |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |  FROM las_f),
       |las_r AS (
       |  SELECT doc_id, island, COUNT(*) AS run, MAX(s) AS ws
       |  FROM las_i GROUP BY doc_id, island)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
       |  CAST(MAX(run) + ${W - 1} AS BIGINT) AS longest_span_words,
       |  round(CAST(MAX(ws) AS DOUBLE) / ${W}e6, 6) + 0 AS worst_win_nll
       |FROM las_r GROUP BY doc_id
       |ORDER BY longest_span_words DESC, doc_id
       |LIMIT 50""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "context_budget_report" -> (contextBudgetReport _),
    "markup_artifacts_report" -> (markupArtifactsReport _),
    "mojibake_report" -> (mojibakeReport _),
    "synthetic_text_report" -> (syntheticTextReport _),
    "code_ratio_report" -> (codeRatioReport _),
    "quality_length_confound" -> (qualityLengthConfound _),
    "source_epochs_report" -> (sourceEpochsReport _),
    "source_cap_sample" -> (sourceCapSample _),
    "release_pipeline" -> (releasePipeline _),
    "lm_anomaly_spans" -> (lmAnomalySpans _),
    "quality_threshold_sweep" -> (qualityThresholdSweep _),
    "epoch_shuffle_report" -> (epochShuffleReport _),
    "boilerplate_report" -> (boilerplateReport _),
    "boilerplate_scrub" -> (boilerplateScrub _),
    "filter_agreement" -> (filterAgreement _),
    "length_bias_report" -> (lengthBiasReport _),
    "bpe_pack" -> (bpePack _),
    "token_budget_sample" -> (tokenBudgetSample _),
    "funnel_report" -> (funnelReport _),
    "data_split" -> (dataSplit _),
    "split_leakage" -> (splitLeakage _),
    "heldout_ppl" -> (heldoutPpl _),
    "split_balance" -> (splitBalance _),
    "dataset_card" -> (datasetCard _),
    "source_temperature_mix" -> (sourceTemperatureMix _),
    "mixture_weights" -> (mixtureWeights _),
    "source_kl" -> (sourceKl _),
    "seq_pack" -> (seqPack _),
    "pack_efficiency" -> (packEfficiency _),
    "pack_bfd" -> (packBfd _),
    "source_curation" -> (sourceCuration _),
    "curation_pipeline" -> (curationPipeline _),
    "sample_hash" -> (sampleHash _),
    "decontaminate" -> (decontaminate _),
    "decontam_grain_sweep" -> (decontamGrainSweep _),
    "decontam_spans" -> (decontamSpans _),
    "decontam_union_report" -> (decontamUnionReport _),
    "semantic_decontaminate" -> (semanticDecontaminate _),
    "semantic_decontam_report" -> (semanticDecontamReport _),
    "line_dedup" -> (lineDedup _),
    "quality_ensemble" -> (qualityEnsemble _),
    "line_dedup_report" -> (lineDedupReport _),
    "gopher_quality" -> (gopherQuality _),
    "gopher_threshold_sweep" -> (gopherThresholdSweep _),
    "redact_mask" -> (redactMask _),
    "pii_report" -> (piiReport _),
    "url_filter" -> (urlFilter _),
    "license_report" -> (licenseReport _),
    "stratified_sample" -> (stratifiedSample _),
    "mixture_sample" -> (mixtureSample _),
    "shard_pack" -> (shardPack _))

  val oracles: Map[String, String] = Map(
    "context_budget_report" -> contextBudgetReportSql,
    "markup_artifacts_report" -> markupArtifactsReportSql,
    "mojibake_report" -> mojibakeReportSql,
    "synthetic_text_report" -> syntheticTextReportSql,
    "code_ratio_report" -> codeRatioReportSql,
    "quality_length_confound" -> qualityLengthConfoundSql,
    "source_epochs_report" -> sourceEpochsReportSql,
    "source_cap_sample" -> sourceCapSampleSql,
    "release_pipeline" -> releasePipelineSql,
    "lm_anomaly_spans" -> lmAnomalySpansSql,
    "quality_threshold_sweep" -> qualityThresholdSweepSql,
    "epoch_shuffle_report" -> epochShuffleReportSql,
    "boilerplate_report" -> boilerplateReportSql,
    "boilerplate_scrub" -> boilerplateScrubSql,
    "filter_agreement" -> filterAgreementSql,
    "length_bias_report" -> lengthBiasReportSql,
    "bpe_pack" -> bpePackSql,
    "token_budget_sample" -> tokenBudgetSampleSql,
    "funnel_report" -> funnelReportSql,
    "data_split" -> dataSplitSql,
    "split_leakage" -> splitLeakageSql,
    "heldout_ppl" -> heldoutPplSql,
    "split_balance" -> splitBalanceSql,
    "dataset_card" -> datasetCardSql,
    "source_temperature_mix" -> sourceTemperatureMixSql,
    "mixture_weights" -> mixtureWeightsSql,
    "source_kl" -> sourceKlSql,
    "seq_pack" -> seqPackSql,
    "pack_efficiency" -> packEfficiencySql,
    "pack_bfd" -> packBfdSql,
    "source_curation" -> sourceCurationSql,
    "curation_pipeline" -> curationPipelineSql,
    "sample_hash" -> sampleHashSql,
    "decontaminate" -> decontaminateSql,
    "decontam_grain_sweep" -> decontamGrainSweepSql,
    "decontam_spans" -> decontamSpansSql,
    "decontam_union_report" -> decontamUnionReportSql,
    "semantic_decontaminate" -> semanticDecontaminateSql,
    "semantic_decontam_report" -> semanticDecontamReportSql,
    "line_dedup" -> lineDedupSql,
    "quality_ensemble" -> qualityEnsembleSql,
    "line_dedup_report" -> lineDedupReportSql,
    "gopher_quality" -> gopherQualitySql,
    "gopher_threshold_sweep" -> gopherThresholdSweepSql,
    "redact_mask" -> redactMaskSql,
    "pii_report" -> piiReportSql,
    "url_filter" -> urlFilterSql,
    "license_report" -> licenseReportSql,
    "stratified_sample" -> stratifiedSampleSql,
    "mixture_sample" -> mixtureSampleSql,
    "shard_pack" -> shardPackSql)
}
