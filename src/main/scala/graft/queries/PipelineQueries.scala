package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Bpe, Classifier, Curation, Dedup, IndexCatalog, Retrieval, SemDedup, Sft, Similarity, TextAnalysis}

/** Training-data pipeline operators (SURVEY §2.9 north-star): dedup,
  * similarity search, text analysis, multimodal plumbing — each wired as a
  * declared query over `documents` / `embeddings` with a DuckDB oracle
  * where cross-engine determinism is achievable.
  *
  * Oracle notes:
  *  - shingle/Jaccard oracles replicate the tokenization in SQL; Jaccard is
  *    an integer ratio, so the doubles match exactly;
  *  - SimHash uses md5-derived 64-bit token hashes (`md5_lower64` ==
  *    DuckDB `md5_number_lower`), making the sketch itself oracle-checkable;
  *  - cosine values are rounded to 3 decimals on both sides; thresholds are
  *    chosen in empty bands of the observed similarity distribution, so a
  *    sub-1e-12 accumulation difference cannot flip membership;
  *  - MinHash-LSH emits exact-verified pairs, so its output equals the
  *    exact-Jaccard operator's (miss probability ≈ (1-s²)³² ≈ 5e-15 at the
  *    0.8 threshold) while scaling as O(n·bands) instead of O(n²).
  */
object PipelineQueries {

  /** DuckDB Morton interleave of two bucket columns (bit i of `bu` at
    * position 2i+1, `be` at 2i — [[graft.operators.Layout.interleave]]'s
    * convention for d=2).
    */
  private def mortonSql(bu: String, be: String, bits: Int): String =
    (0 until bits).flatMap(i => Seq(
      s"((($bu >> $i) & 1) << ${2 * i + 1})",
      s"((($be >> $i) & 1) << ${2 * i})")).mkString(" | ")

  /** Shared z-order CTE prefix: exact ranges, integer-only shift search
    * (g+bits <= 62 so the shift target can't overflow — same bound as
    * `Layout.shiftFor`), per-row buckets. `su`/`se` are the 8-bit z
    * dimensions, `sl` the 64-bin arrival-order layout the audit compares
    * against.
    */
  private val zorderPreSql =
    "WITH s AS (SELECT min(user_id) mnu, max(user_id) mxu, " +
      "min(event_id) mne, max(event_id) mxe FROM events), " +
      "p AS (SELECT s.*, " +
      "(SELECT min(g) FROM generate_series(0,54) t(g) " +
      "WHERE mxu-mnu+1 <= (1::BIGINT << (g+8))) su, " +
      "(SELECT min(g) FROM generate_series(0,54) t(g) " +
      "WHERE mxe-mne+1 <= (1::BIGINT << (g+8))) se, " +
      "(SELECT min(g) FROM generate_series(0,56) t(g) " +
      "WHERE mxe-mne+1 <= (1::BIGINT << (g+6))) sl FROM s), " +
      "b AS (SELECT user_id, event_id, ((user_id - mnu) >> su) bu, " +
      "((event_id - mne) >> se) be, ((event_id - mne) >> sl) lbin " +
      "FROM events, p) "

  /** Shared DuckDB shingle pipeline (3-word shingles, distinct per doc).
    * Positional unnest + lead windows, not a fixed-bound generate_series —
    * no token-count ceiling to silently truncate at (ADVICE r4).
    */
  private val shingleBaseCte =
    "WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t " +
      "FROM documents), " +
      "tokpos AS (SELECT doc_id, len(t) AS n, unnest(t) AS w, " +
      "generate_subscripts(t, 1) AS pos FROM toks), " +
      "sh AS (SELECT DISTINCT doc_id, concat_ws(' ', w, " +
      "lead(w, 1) OVER win, lead(w, 2) OVER win) AS s FROM tokpos " +
      "WINDOW win AS (PARTITION BY doc_id ORDER BY pos) QUALIFY pos <= n - 2)"

  private val shingleCte =
    shingleBaseCte +
      ", sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), " +
      "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter " +
      "FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2) "

  private val jaccardPairsSql =
    shingleCte +
      "SELECT id_a, id_b, CAST(inter AS DOUBLE)/(s1.n + s2.n - inter) AS jaccard " +
      "FROM pairs JOIN sizes s1 ON id_a = s1.doc_id JOIN sizes s2 ON id_b = s2.doc_id " +
      "WHERE CAST(inter AS DOUBLE)/(s1.n + s2.n - inter) >= 0.8 " +
      "ORDER BY id_a, id_b"

  /** DuckDB 64-bit SimHash replication (md5_number_lower token hashes);
    * bit 63 carries its two's-complement negative weight so the result is
    * the same signed BIGINT Spark produces.
    */
  private val simhashCte =
    "WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok " +
      "FROM documents), " +
      "bits AS (SELECT doc_id, i, CASE WHEN sum(CASE WHEN (md5_number_lower(tok) >> i) & 1 = 1 " +
      "THEN 1 ELSE -1 END) > 0 THEN 1::BIGINT ELSE 0::BIGINT END AS b " +
      "FROM toks CROSS JOIN generate_series(0, 63) g(i) GROUP BY doc_id, i), " +
      "sk AS (SELECT doc_id, CAST(sum(CASE WHEN i = 63 THEN b * (-(1::BIGINT << 62) * 2) " +
      "ELSE b * (1::BIGINT << i) END) AS BIGINT) AS simhash " +
      "FROM bits GROUP BY doc_id) "

  /** DuckDB 128-bit SimHash replication: both md5 halves
    * (`md5_number_upper` bytes [0..8) LE / `md5_number_lower` bytes
    * [8..16) LE — the exact layout `TextHashKernels.simhash128` reads),
    * same signed-bit-63 handling per half.
    */
  private val simhash128Cte =
    "WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok " +
      "FROM documents), " +
      "bits AS (SELECT doc_id, i, " +
      "CASE WHEN sum(CASE WHEN (md5_number_lower(tok) >> i) & 1 = 1 " +
      "THEN 1 ELSE -1 END) > 0 THEN 1::BIGINT ELSE 0::BIGINT END AS bl, " +
      "CASE WHEN sum(CASE WHEN (md5_number_upper(tok) >> i) & 1 = 1 " +
      "THEN 1 ELSE -1 END) > 0 THEN 1::BIGINT ELSE 0::BIGINT END AS bu " +
      "FROM toks CROSS JOIN generate_series(0, 63) g(i) GROUP BY doc_id, i), " +
      "sk AS (SELECT doc_id, " +
      "CAST(sum(CASE WHEN i = 63 THEN bu * (-(1::BIGINT << 62) * 2) " +
      "ELSE bu * (1::BIGINT << i) END) AS BIGINT) AS simhash_hi, " +
      "CAST(sum(CASE WHEN i = 63 THEN bl * (-(1::BIGINT << 62) * 2) " +
      "ELSE bl * (1::BIGINT << i) END) AS BIGINT) AS simhash_lo " +
      "FROM bits GROUP BY doc_id) "

  private def dCos(a: String, b: String) =
    s"round(list_cosine_similarity(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[])), 3)"

  /** UNROUNDED cosine, bit-exact to [[graft.functions.VectorKernels]]
    * `cosine`: per-element double-converted multiplies summed LEFT-TO-
    * RIGHT (DuckDB's `list_sum` is sequential — verified with
    * cancellation probes), `dot / (sqrt(na) * sqrt(nb))` in the kernel's
    * exact association. For ORDER BY positions where the engine ranks on
    * the raw double (IVF batch centroid ranking) — rounding there would
    * change probe selection instead of reproducing it. */
  private def dCosExact(a: String, b: String) =
    s"(list_sum(list_transform($a, (x, i) -> CAST(x AS DOUBLE) * " +
      s"CAST($b[i] AS DOUBLE))) / " +
      s"(sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * " +
      s"CAST(x AS DOUBLE)))) * " +
      s"sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * " +
      s"CAST(x AS DOUBLE))))))"

  /** Exact integer-dot k=5 KNN edges `(id, nbr, w)` over the embeddings
    * table — the INTEGER-EXACT graph (r12-1 discipline: fixed-point
    * 2^20 quantization, int64 dot ranking with ties to the smaller id,
    * milli-weights `w = HALF_UP(1000·dot/2^40)`) shared by every
    * graph-analytics query (propagation, PageRank, HITS, the hashed
    * graph dump). Built once through the IndexCatalog; all consumers
    * read the same cached artifact.
    */
  private def intdotEdges(s: SparkSession, d: String): DataFrame = {
    val embs = Tables.embeddings(s, d)
    val dir = IndexCatalog.ensure(s, "knn-intdot",
      Seq(s"$d/embeddings.parquet"), "k=5 qscale=2^20") { staging =>
      Similarity.intDotTopKBatch(embs, "vec_id", "embedding",
          embs, "vec_id", "embedding", k = 5)
        .select(col("qid").as("id"), col("id").as("nbr"), col("dot"))
        .write.parquet(staging)
    }
    // milli-weights from the exact dot: w = HALF_UP(1000·dot / 2^40)
    // = (2000·dot + 2^40) div 2^41 — exact integer rational, the
    // same magnitude round(cos·1000) produced on unit-norm vectors
    s.read.parquet(dir)
      .filter(col("dot") > 0)
      .withColumn("w",
        expr("(2000 * dot + 1099511627776) div 2199023255552"))
      .filter(col("w") > 0)
      .select("id", "nbr", "w")
  }

  /** DuckDB mirror of [[intdotEdges]], ending at CTE `g(id, nbr, w)` —
    * consumers append further CTEs with a leading comma.
    */
  private val intdotGraphCte =
    "WITH q AS (SELECT vec_id, " +
      "[CAST(floor(CAST(x AS DOUBLE) * 1048576 + 0.5) AS BIGINT) " +
      "FOR x IN embedding] AS qv FROM embeddings), " +
      "pr AS (SELECT a.vec_id AS id, b.vec_id AS nbr, " +
      "CAST(list_sum([a.qv[i] * b.qv[i] FOR i IN " +
      "range(1, len(a.qv) + 1)]) AS BIGINT) AS dot " +
      "FROM q a JOIN q b ON a.vec_id <> b.vec_id), " +
      "rk AS (SELECT id, nbr, dot, row_number() OVER " +
      "(PARTITION BY id ORDER BY dot DESC, nbr) AS rank FROM pr), " +
      "g AS (SELECT id, nbr, " +
      "(2000 * dot + 1099511627776) // 2199023255552 AS w " +
      "FROM rk WHERE rank <= 5 AND dot > 0 AND " +
      "(2000 * dot + 1099511627776) // 2199023255552 > 0)"

  /** Raw top-5 integer-dot rank CTE over a FILTERED embeddings slice —
    * the [[intdotGraphCte]] shape stopped at `rk` (no weight derivation,
    * no dot>0 filter: the INDEX state, not the consumer graph), for the
    * incremental-maintenance rebuild-equivalence oracle.
    */
  private def intdotRkCte(where: String): String =
    "WITH q AS (SELECT vec_id, " +
      "[CAST(floor(CAST(x AS DOUBLE) * 1048576 + 0.5) AS BIGINT) " +
      s"FOR x IN embedding] AS qv FROM embeddings WHERE $where), " +
      "pr AS (SELECT a.vec_id AS id, b.vec_id AS nbr, " +
      "CAST(list_sum([a.qv[i] * b.qv[i] FOR i IN " +
      "range(1, len(a.qv) + 1)]) AS BIGINT) AS dot " +
      "FROM q a JOIN q b ON a.vec_id <> b.vec_id), " +
      "rk AS (SELECT id, nbr, dot, row_number() OVER " +
      "(PARTITION BY id ORDER BY dot DESC, nbr) AS rank FROM pr) "

  /** DuckDB mirror of the ENTIRE 20-merge BPE training loop
    * ([[graft.operators.Bpe.learn]] / `learnLocal`) as `n` UNROLLED CTE
    * rounds, ending at CTEs `v{n}(word, cnt, seg)` (the final per-word
    * segmentation) and `b1..b{n}` (each round's argmax pair) — the merge
    * sequence IS deterministic (ties break on (count desc, left, right)
    * in binary/UTF-8 order, DuckDB's default collation), so the learned
    * tokenizer is fully oracle-able, not just spec-pinned.
    *
    * Encoding trick: a word's symbol sequence is carried as a STRING
    * with each symbol wrapped in `{…}` (neither brace occurs in the
    * corpus alphabet `[a-w,y]` nor in `</w>` — asserted by the brace
    * guard CTE below, so a corpus drift that introduces a brace fails
    * the oracle loudly instead of silently mis-merging). One BPE merge
    * application is then exactly `replace(seg, '{l}{r}', '{lr}')`:
    * DuckDB's replace scans left-to-right non-overlapping and never
    * rescans inserted text, which IS the BPE greedy rewrite ("aaaa"
    * under (a,a) → "aa aa"); a spurious cross-boundary match is
    * impossible because `{` appears only at symbol starts. Pair counts
    * re-derive per round from the seg string via regexp_extract_all.
    * Every `v{t}`/`b{t}` is MATERIALIZED — `v{t}` is referenced twice
    * per round, and inlined CTEs would re-expand the chain 2^n times.
    *
    * Rounds where the best pair's count drops below minPairFreq=2 leave
    * the state unchanged and emit no merge — once stopped, every later
    * round recomputes the same sub-threshold best, so the WHERE c >= 2
    * filter on the b-rows reproduces learnLocal's early-stop exactly.
    */
  private def bpeCtes(n: Int): String = {
    val sb = new StringBuilder(
      // the brace guard is PER VOCAB WORD and load-bearing in the word
      // column itself — an earlier standalone-CTE EXISTS guard was
      // silently column-pruned by DuckDB's optimizer (verified: it never
      // fired on a planted brace corpus), while this form provably does
      "WITH w AS MATERIALIZED (SELECT " +
        "CASE WHEN word LIKE '%{%' OR word LIKE '%}%' THEN " +
        "error('bpe oracle: corpus contains brace delimiter') " +
        "ELSE word END AS word, CAST(count(*) AS BIGINT) AS cnt " +
        "FROM (SELECT unnest(string_split_regex(lower(trim(text)), " +
        "'\\s+')) AS word FROM documents) " +
        "WHERE length(word) > 0 GROUP BY word), " +
        "v0 AS MATERIALIZED (SELECT word, cnt, '{' || " +
        "array_to_string(list_append(string_split(word, ''), '</w>'), " +
        "'}{') || '}' AS seg FROM w)")
    for (t <- 1 to n) {
      sb.append(
        s", p$t AS (SELECT pr.l AS l, pr.r AS r, " +
          "CAST(sum(cnt) AS BIGINT) AS c FROM (SELECT cnt, " +
          "unnest([{'l': s[i], 'r': s[i+1]} FOR i IN " +
          s"range(1, len(s))]) AS pr FROM (SELECT cnt, " +
          "regexp_extract_all(seg, '\\{([^}]*)\\}', 1) AS s " +
          s"FROM v${t - 1})) GROUP BY pr.l, pr.r), " +
          s"b$t AS MATERIALIZED (SELECT l, r, c FROM p$t " +
          "ORDER BY c DESC, l, r LIMIT 1), " +
          s"v$t AS MATERIALIZED (SELECT word, cnt, " +
          s"CASE WHEN (SELECT c FROM b$t) >= 2 THEN replace(seg, " +
          s"'{' || (SELECT l FROM b$t) || '}{' || (SELECT r FROM b$t) " +
          s"|| '}', '{' || (SELECT l FROM b$t) || (SELECT r FROM b$t) " +
          s"|| '}') ELSE seg END AS seg FROM v${t - 1})")
    }
    sb.toString
  }

  /** Number of merges [[bpeModel]] trains (BpeConfig default) — the
    * oracles unroll exactly this many rounds.
    */
  private val BpeMerges = 20

  /** DuckDB mirror of [[graft.operators.Similarity.mmrTopK]] at
    * λ = 0.6: the k greedy selection rounds unroll as materialized CTEs
    * (the [[bpeCtes]] technique — an iterative argmax over a BOUNDED
    * constant k IS SQL-expressible). Float parity rests on three legs,
    * one per implementation in play: the REL path (engine kernel ≡
    * `list_cosine_similarity` to round-3 — proven by
    * `ns_ann_mmr_lambda1`, which exercises exactly that population); the
    * PAIRWISE path (the engine's maxSim comes from mmrTopK's
    * driver-side Scala loop, pinned bit-for-bit to the Catalyst kernel
    * by SimilaritySpec "driverCos ≡ cosine_similarity", with the
    * pairwise population's distance to round-3 boundaries certified by
    * `scripts/margin_audit.py`); and the SCORE arithmetic
    * (`0.6·rel − 0.4·maxSim` evaluates the identical IEEE ops both
    * sides — including the constant: Scala's `1 - 0.6` and the SQL
    * literal `0.4` are the same double bit pattern). Ties break to the
    * smaller id, the engine's total order.
    *
    * Coupling: `k`/`pool` must mirror the declared query's `k` and
    * `k · candidateFactor`, and the 0.6/0.4 literals its `lambda` — a
    * drift shows up as a loud driver rows/hash mismatch, never silently,
    * but change them together.
    */
  private def mmrOracle(k: Int, pool: Int): String = {
    val sb = new StringBuilder(
      "WITH cand AS MATERIALIZED (SELECT vec_id AS id, " +
        "round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), " +
        "q.qv), 3) AS rel, CAST(embedding AS DOUBLE[]) AS vec " +
        "FROM embeddings, (SELECT CAST(embedding AS DOUBLE[]) AS qv " +
        "FROM embeddings WHERE vec_id = 0) q WHERE vec_id <> 0 " +
        s"ORDER BY rel DESC, id LIMIT $pool), " +
        "pc AS MATERIALIZED (SELECT a.id AS ia, b.id AS ib, " +
        "round(list_cosine_similarity(a.vec, b.vec), 3) AS s " +
        "FROM cand a JOIN cand b ON a.id <> b.id), " +
        "b1 AS MATERIALIZED (SELECT id, rel FROM cand " +
        "ORDER BY 0.6 * rel DESC, id LIMIT 1), " +
        "sel1 AS (SELECT id FROM b1)")
    for (t <- 2 to k) {
      sb.append(
        s", m$t AS (SELECT p.ia AS id, max(p.s) AS ms FROM pc p " +
          s"JOIN sel${t - 1} s ON p.ib = s.id GROUP BY p.ia), " +
          s"b$t AS MATERIALIZED (SELECT c.id, c.rel FROM cand c " +
          s"JOIN m$t m ON c.id = m.id WHERE c.id NOT IN " +
          s"(SELECT id FROM sel${t - 1}) " +
          "ORDER BY 0.6 * c.rel - 0.4 * m.ms DESC, c.id LIMIT 1), " +
          s"sel$t AS (SELECT id FROM sel${t - 1} " +
          s"UNION ALL SELECT id FROM b$t)")
    }
    val union = (1 to k)
      .map(t => s"SELECT $t AS rank, id, rel FROM b$t")
      .mkString(" UNION ALL ")
    sb.append(s" SELECT CAST(rank AS INTEGER) AS rank, id AS vec_id, " +
      s"rel FROM ($union) ORDER BY rank")
    sb.toString
  }

  /** [[bpeCtes]] continued to the symbol-id assignment: appends
    * `vid(token, id)` — dense ids by (corpus freq desc, token asc), the
    * [[graft.operators.Bpe.symbolVocab]] rule — and
    * `wids(word, ids)`, each word's final subword-id sequence.
    */
  private def bpeIdCtes(n: Int): String =
    bpeCtes(n) +
      s", wsyms AS MATERIALIZED (SELECT word, " +
      "regexp_extract_all(seg, '\\{([^}]*)\\}', 1) AS syms " +
      s"FROM v$n), " +
      "__symfreq AS (SELECT tok AS token, sum(cnt) AS freq FROM " +
      "(SELECT cnt, unnest(regexp_extract_all(seg, '\\{([^}]*)\\}', 1)) " +
      s"AS tok FROM v$n) GROUP BY tok), " +
      "vid AS MATERIALIZED (SELECT token, " +
      "CAST(row_number() OVER (ORDER BY freq DESC, token) - 1 " +
      "AS INTEGER) AS id, CAST(freq AS BIGINT) AS freq FROM __symfreq), " +
      "wids AS MATERIALIZED (SELECT word, list(id ORDER BY sidx) AS ids " +
      "FROM (SELECT word, unnest(syms) AS tok, " +
      "generate_subscripts(syms, 1) AS sidx FROM wsyms) sy " +
      "JOIN vid ON sy.tok = vid.token GROUP BY word), " +
      // per-document word stream (position-preserving), shared by the
      // encode / encode-ids / pack oracles
      "t AS (SELECT doc_id, string_split_regex(lower(trim(text)), " +
      "'\\s+') AS toks FROM documents), " +
      "tw AS (SELECT doc_id, unnest(toks) AS word, " +
      "generate_subscripts(toks, 1) AS wpos FROM t)"

  /** DuckDB mirror of [[graft.operators.Curation.psiBins]] over document
    * char length (src0 vs rest, 16 bins on [0, 2047]), ending at CTE
    * `t(bin, ca, cb, term)` — integer binning, add-0.5 smoothing,
    * round-6 ln term (expression shapes match the Spark side so every
    * double op is the identical correctly-rounded IEEE step).
    */
  private val psiCte =
    "WITH ax AS (SELECT length(text) AS x FROM documents " +
      "WHERE source = 'src0'), " +
      "bx AS (SELECT length(text) AS x FROM documents " +
      "WHERE source <> 'src0'), " +
      "ac AS (SELECT least(15, greatest(0, (x * 16) // 2048)) AS bin, " +
      "count(*) AS c FROM ax GROUP BY 1), " +
      "bc AS (SELECT least(15, greatest(0, (x * 16) // 2048)) AS bin, " +
      "count(*) AS c FROM bx GROUP BY 1), " +
      "gr AS (SELECT CAST(i AS BIGINT) AS bin FROM " +
      "generate_series(0, 15) s(i)), " +
      "j AS (SELECT gr.bin, coalesce(ac.c, 0) AS ca, " +
      "coalesce(bc.c, 0) AS cb FROM gr " +
      "LEFT JOIN ac ON gr.bin = ac.bin LEFT JOIN bc ON gr.bin = bc.bin), " +
      "tt AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM j), " +
      "t AS (SELECT bin, CAST(ca AS BIGINT) AS ca, " +
      "CAST(cb AS BIGINT) AS cb, " +
      "round(((ca + 0.5) / (na + 0.5 * 16) - (cb + 0.5) / " +
      "(nb + 0.5 * 16)) * round(ln(((ca + 0.5) / (na + 0.5 * 16)) / " +
      "((cb + 0.5) / (nb + 0.5 * 16))), 6), 6) AS term " +
      "FROM j CROSS JOIN tt) "

  /** One synchronous label-propagation round as DuckDB CTEs: `next` from
    * `prev` — weighted vote over the directed KNN out-edges of CTE `g`,
    * argmax with ties to the smaller label, neighbor-less nodes carry
    * their label (mirrors [[graft.operators.KnnGraph.labelPropagation]]).
    */
  private def lpRound(prev: String, next: String): String =
    s", v_$next AS (SELECT g.id, l.lbl, sum(g.w) AS ws FROM g " +
      s"JOIN $prev l ON g.nbr = l.id GROUP BY g.id, l.lbl), " +
      s"b_$next AS (SELECT id, lbl FROM v_$next QUALIFY row_number() " +
      "OVER (PARTITION BY id ORDER BY ws DESC, lbl) = 1), " +
      s"$next AS (SELECT p.id, coalesce(b.lbl, p.lbl) AS lbl " +
      s"FROM $prev p LEFT JOIN b_$next b ON p.id = b.id)"

  /** One synchronous k-core peel sweep as DuckDB CTEs: survivors `next`
    * = nodes of `prev` whose degree in the `prev`-induced subgraph of
    * CTE `und` is ≥ k (mirrors [[graft.operators.KnnGraph.kcorePeel]]).
    */
  private def kcoreRound(prev: String, next: String, k: Int): String =
    s"d_$next AS (SELECT id, count(*) AS dg FROM " +
      s"(SELECT e.a AS id FROM und e JOIN $prev x ON e.a = x.id " +
      s"JOIN $prev y ON e.b = y.id " +
      s"UNION ALL SELECT e.b AS id FROM und e JOIN $prev x ON e.a = x.id " +
      s"JOIN $prev y ON e.b = y.id) u GROUP BY id), " +
      s"$next AS (SELECT id FROM d_$next WHERE dg >= $k), "

  /** Signed-long positive-modulo bucket of a `md5_number_lower` value `u`
    * — DuckDB's UBIGINT md5 converted to the two's-complement long
    * `md5_lower64` yields, then `pmod(·, m)`.
    */
  private def dHashMod(u: String, m: Long) =
    s"((CAST(CASE WHEN $u >= 9223372036854775808 THEN $u - 18446744073709551616 " +
      s"ELSE $u END AS BIGINT) % $m) + $m) % $m"

  /** [[dHashMod]] with a column/expression modulus (callers parenthesize). */
  private def dHashModCol(u: String, m: String) =
    s"((CAST(CASE WHEN $u >= 9223372036854775808 THEN $u - 18446744073709551616 " +
      s"ELSE $u END AS BIGINT) % $m) + $m) % $m"

  /** DuckDB replication of the DSIR hashed-feature model
    * ([[graft.operators.Curation.dsirLogRatios]]): unigram+bigram features
    * per document in position order (one concatenated list — position IS
    * the cross-engine summation order), md5-hashed into 8192 buckets,
    * add-0.5-smoothed ln ratios rounded to 6, position-ordered per-doc
    * sums rounded to 6 (the term grid — a coarser final grid manufactures
    * exact .5 ties). Target slice = `source IN ('src0','src1')`.
    */
  private val dsirCte =
    "WITH rt0 AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t " +
      "FROM documents), " +
      "rf0 AS (SELECT doc_id, list_concat(t, " +
      "[t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]) AS f FROM rt0), " +
      "rf AS (SELECT doc_id, unnest(f) AS feat, generate_subscripts(f, 1) AS fpos " +
      "FROM rf0), " +
      "rb AS (SELECT doc_id, fpos, " + dHashMod("u", 8192L) + " AS b " +
      "FROM (SELECT doc_id, fpos, md5_number_lower(feat) AS u FROM rf)), " +
      "tf AS (SELECT unnest(f) AS feat FROM rf0 JOIN documents USING (doc_id) " +
      "WHERE source IN ('src0', 'src1')), " +
      "tb AS (SELECT " + dHashMod("u", 8192L) + " AS b " +
      "FROM (SELECT md5_number_lower(feat) AS u FROM tf)), " +
      "rc AS (SELECT b, count(*) AS cr FROM rb GROUP BY 1), " +
      "tc AS (SELECT b, count(*) AS ct FROM tb GROUP BY 1), " +
      "rtot AS (SELECT CAST(count(*) AS DOUBLE) AS tr FROM rb), " +
      "ttot AS (SELECT CAST(count(*) AS DOUBLE) AS tt FROM tb), " +
      "w AS (SELECT rc.b, round(ln(((coalesce(tc.ct, 0) + 0.5) / (ttot.tt + 0.5 * 8192)) " +
      "/ ((rc.cr + 0.5) / (rtot.tr + 0.5 * 8192))), 6) AS lnr " +
      "FROM rc LEFT JOIN tc USING (b) CROSS JOIN rtot CROSS JOIN ttot), " +
      "sc AS (SELECT rb.doc_id, count(*) AS n_features, " +
      "round(list_sum(list(w.lnr ORDER BY rb.fpos)), 6) AS dsir_logratio " +
      "FROM rb JOIN w USING (b) GROUP BY rb.doc_id) "

  /** Exact-int64 replication of [[graft.operators.TextAnalysis.quality]]'s
    * composite score (see its scaladoc for why doubles tie): the
    * 4-decimal HALF_UP rounding of N/D as pure integer arithmetic —
    * DuckDB `//` is floor division and its integer ops widen exactly.
    * Args are SQL expressions for char count, token count, stopword
    * token count, and punctuation char count.
    */
  private def qScoreSql(nc: String, nt: String, ns: String, np: String): String = {
    val c = s"CAST($nc AS BIGINT)"
    val t = s"CAST($nt AS BIGINT)"
    val st = s"CAST($ns AS BIGINT)"
    val p = s"CAST($np AS BIGINT)"
    s"((CASE WHEN $t > 0 AND $c > 0 THEN " +
      s"(20000 * (least(100, $t) * $c * $t + 60 * ($c - $p) * $t + 40 * $st * $c) " +
      s"+ 200 * $c * $t) // (400 * $c * $t) ELSE 0 END) / 10000.0)"
  }

  /** DuckDB replication of the hashed-n-gram Naive Bayes pipeline
    * ([[graft.operators.Classifier.nbTrain]]/[[Classifier.nbScore]]):
    * unigram+bigram features per document in position order, md5-hashed
    * into 4096 buckets; train split = md5 doc_id bucket < 80 (the
    * hashSplit convention); per-class add-0.5-smoothed log-likelihoods
    * rounded 6, class priors and the unseen-bucket default rounded 6;
    * per-(doc, class) scores = prior + position-ordered llh sum rounded
    * 4; prediction = arg max score with ties to the lexically smaller
    * label.
    */
  private val nbCte =
    "WITH t0 AS (SELECT doc_id, lang, " +
      "string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents), " +
      "f0 AS (SELECT doc_id, lang, list_concat(t, " +
      "[t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]) AS f FROM t0), " +
      "fx AS (SELECT doc_id, lang, unnest(f) AS feat, " +
      "generate_subscripts(f, 1) AS fpos FROM f0), " +
      "fb AS (SELECT doc_id, lang, fpos, " + dHashMod("u", 4096L) + " AS b " +
      "FROM (SELECT doc_id, lang, fpos, md5_number_lower(feat) AS u FROM fx)), " +
      "sp AS (SELECT doc_id, " + dHashMod("su", 100L) + " < 80 AS is_train " +
      "FROM (SELECT doc_id, md5_number_lower(CAST(doc_id AS VARCHAR)) AS su " +
      "FROM documents)), " +
      "cnts AS (SELECT lang AS label, b, count(*) AS n FROM fb " +
      "JOIN sp USING (doc_id) WHERE is_train GROUP BY 1, 2), " +
      "tot AS (SELECT label, sum(n) AS tt FROM cnts GROUP BY 1), " +
      "model AS (SELECT label, b, round(ln((n + 0.5) / (tt + 0.5 * 4096)), 6) " +
      "AS llh FROM cnts JOIN tot USING (label)), " +
      "pri0 AS (SELECT d.lang AS label, count(*) AS nc FROM documents d " +
      "JOIN sp USING (doc_id) WHERE is_train GROUP BY 1), " +
      "ndoc AS (SELECT sum(nc) AS nd FROM pri0), " +
      "pr AS (SELECT p.label, " +
      "round(ln(CAST(p.nc AS DOUBLE) / (SELECT nd FROM ndoc)), 6) AS prior, " +
      "round(ln(0.5 / (t.tt + 0.5 * 4096)), 6) AS llh0 " +
      "FROM pri0 p JOIN tot t USING (label)), " +
      "sf AS (SELECT fb.doc_id, fb.fpos, fb.b FROM fb " +
      "JOIN sp USING (doc_id) WHERE NOT is_train), " +
      "sx AS (SELECT s.doc_id, p.label, s.fpos, p.prior, " +
      "coalesce(m.llh, p.llh0) AS llh FROM sf s CROSS JOIN pr p " +
      "LEFT JOIN model m ON m.label = p.label AND m.b = s.b), " +
      "sc AS (SELECT doc_id, label, " +
      "round(max(prior) + list_sum(list(llh ORDER BY fpos)), 4) AS score " +
      "FROM sx GROUP BY 1, 2), " +
      "pred AS (SELECT doc_id, label AS predicted, score FROM sc " +
      "QUALIFY row_number() OVER (PARTITION BY doc_id " +
      "ORDER BY score DESC, label) = 1) "

  /** DuckDB replication of the trigram stupid-backoff scorer
    * ([[graft.operators.TextAnalysis.trigramBackoff]]): counts fit on the
    * md5-split train side, held-out docs scored per trigram with the
    * trigram→bigram→add-k-unigram backoff chain (ln rounded 6,
    * position-ordered sum / count rounded 4); `heldout` carries every
    * non-train doc with its source and 0.0 for trigram-less docs. Shared
    * by the scorer query and the perplexity-floor filter built on it.
    */
  private val trigramCte =
    "WITH sp AS (SELECT doc_id, " + dHashMod("su", 100L) + " < 80 " +
      "AS is_train FROM (SELECT doc_id, " +
      "md5_number_lower(CAST(doc_id AS VARCHAR)) AS su FROM documents)), " +
      "tk AS (SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS pos " +
      "FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t " +
      "FROM documents)), " +
      "st AS (SELECT doc_id, pos, w AS w1, lead(w, 1) OVER win AS w2, " +
      "lead(w, 2) OVER win AS w3 FROM tk " +
      "WINDOW win AS (PARTITION BY doc_id ORDER BY pos)), " +
      "trn AS (SELECT st.* FROM st JOIN sp USING (doc_id) WHERE is_train), " +
      "c3 AS (SELECT w1, w2, w3, count(*) AS c3 FROM trn " +
      "WHERE w3 IS NOT NULL GROUP BY 1, 2, 3), " +
      "c2 AS (SELECT w1, w2, count(*) AS c2 FROM trn " +
      "WHERE w2 IS NOT NULL GROUP BY 1, 2), " +
      "c1 AS (SELECT w1 AS wu, count(*) AS c1 FROM trn GROUP BY 1), " +
      "nv AS (SELECT CAST(count(*) AS DOUBLE) AS nn, " +
      "CAST(count(DISTINCT w1) AS DOUBLE) AS v FROM trn), " +
      "sd AS (SELECT st.* FROM st JOIN sp USING (doc_id) " +
      "WHERE NOT is_train AND w3 IS NOT NULL), " +
      "sx AS (SELECT sd.doc_id, sd.pos, round(CASE " +
      "WHEN c3.c3 IS NOT NULL THEN ln(c3.c3 / c2.c2) " +
      "WHEN cb.c2b IS NOT NULL THEN ln(0.4 * cb.c2b / cu.c1) " +
      "ELSE ln(0.4 * 0.4 * (coalesce(cw.c1, 0) + 0.5) / (nv.nn + 0.5 * nv.v)) " +
      "END, 6) AS lns FROM sd " +
      "LEFT JOIN c3 ON sd.w1 = c3.w1 AND sd.w2 = c3.w2 AND sd.w3 = c3.w3 " +
      "LEFT JOIN c2 ON sd.w1 = c2.w1 AND sd.w2 = c2.w2 " +
      "LEFT JOIN (SELECT w1 AS b1, w2 AS b2, c2 AS c2b FROM c2) cb " +
      "ON sd.w2 = cb.b1 AND sd.w3 = cb.b2 " +
      "LEFT JOIN c1 cu ON sd.w2 = cu.wu " +
      "LEFT JOIN c1 cw ON sd.w3 = cw.wu " +
      "CROSS JOIN nv), " +
      "sc AS (SELECT doc_id, count(*) AS n_trigrams, " +
      "round(list_sum(list(lns ORDER BY pos)) / count(*), 4) AS avg_logscore " +
      "FROM sx GROUP BY 1), " +
      "heldout AS (SELECT d.doc_id, d.source, " +
      "CAST(coalesce(sc.n_trigrams, 0) AS BIGINT) AS n_trigrams, " +
      "coalesce(sc.avg_logscore, 0.0) AS avg_logscore " +
      "FROM documents d JOIN sp USING (doc_id) LEFT JOIN sc USING (doc_id) " +
      "WHERE NOT is_train) "

  /** The BM25 oracle for terms (join, stream, dup), k=10, over an
    * arbitrary corpus relation — shared verbatim by the full-scan query,
    * the inverted-index probe (the index contract is bit-equality with
    * the scan), and the delete/merge maintenance query (whose live
    * corpus is a filtered `documents`).
    */
  private def bm25OracleSqlOver(corpus: String) =
    "WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t " +
      s"FROM $corpus), " +
      "d AS (SELECT doc_id, len(t) AS dl, " +
      "CAST(len(list_filter(t, x -> x = 'join')) AS DOUBLE) AS tf0, " +
      "CAST(len(list_filter(t, x -> x = 'stream')) AS DOUBLE) AS tf1, " +
      "CAST(len(list_filter(t, x -> x = 'dup')) AS DOUBLE) AS tf2 FROM toks), " +
      "s AS (SELECT CAST(count(*) AS DOUBLE) AS n, " +
      "CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl, " +
      "CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0, " +
      "CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1, " +
      "CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2 FROM d), " +
      "sc AS (SELECT doc_id, round(" +
      "(ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5)) * (tf0 * 2.2)) / " +
      "(tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl)) + " +
      "(ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) * (tf1 * 2.2)) / " +
      "(tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl)) + " +
      "(ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5)) * (tf2 * 2.2)) / " +
      "(tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 4) AS score FROM d, s) " +
      "SELECT doc_id, score, " +
      "CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS rank " +
      "FROM sc ORDER BY score DESC, doc_id LIMIT 10"

  private val bm25OracleSql = bm25OracleSqlOver("documents")

  /** The batch-retrieval query set: common terms so every query has
    * well over k positive-score candidates at both driver SFs (the
    * regime where batch ≡ per-query topK row-for-row).
    */
  private val bm25BatchQueries: Seq[(String, Seq[String])] = Seq(
    "q_join_stream" -> Seq("join", "stream"),
    "q_hash_scan" -> Seq("hash", "scan"),
    "q_merge_filter" -> Seq("merge", "filter"))

  /** DuckDB oracle for [[graft.operators.Bm25Index.batchTopK]]: per
    * query the same tf/df/score CTE pipeline as the single-query BM25
    * oracle, candidates only, UNION ALL'd under a literal qid —
    * GENERATED from the query list so SQL and Scala cannot drift.
    */
  private def bm25BatchOracleSql(queries: Seq[(String, Seq[String])],
                                 k: Int): String = {
    val ctes = queries.zipWithIndex.map { case ((_, terms), q) =>
      val tfDefs = terms.zipWithIndex.map { case (t, i) =>
        s"CAST(len(list_filter(t, x -> x = '$t')) AS DOUBLE) AS tf$i"
      }.mkString(", ")
      val dfDefs = terms.indices.map(i =>
        s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df$i"
      ).mkString(", ")
      val scoreSum = terms.indices.map(i =>
        s"(ln(1.0 + (n - df$i + 0.5) / (df$i + 0.5)) * (tf$i * 2.2)) / " +
          s"(tf$i + 1.2 * (0.25 + 0.75 * dl / avgdl))").mkString(" + ")
      val candFilter = terms.indices.map(i => s"tf$i > 0").mkString(" OR ")
      s"d$q AS (SELECT doc_id, len(t) AS dl, $tfDefs FROM toks), " +
        s"s$q AS (SELECT CAST(count(*) AS DOUBLE) AS n, " +
        s"CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl, $dfDefs FROM d$q), " +
        s"sc$q AS (SELECT doc_id, round($scoreSum, 4) AS score " +
        s"FROM d$q, s$q WHERE $candFilter), " +
        s"r$q AS (SELECT doc_id, score, CAST(row_number() OVER " +
        s"(ORDER BY score DESC, doc_id) AS INTEGER) AS rank FROM sc$q)"
    }.mkString(", ")
    val sel = queries.zipWithIndex.map { case ((qid, _), q) =>
      s"SELECT '$qid' AS qid, doc_id, score, rank FROM r$q WHERE rank <= $k"
    }.mkString(" UNION ALL ")
    "WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), " +
      "'\\s+') AS t FROM documents), " + ctes +
      " SELECT qid, doc_id, score, rank FROM (" + sel +
      ") ORDER BY qid, rank"
  }

  /** DuckDB CTE chain replicating [[graft.operators.Bm25Index.moreLikeThis]]
    * for anchors (11, 42, 123), m=3, k-unbounded: anchor term profiles,
    * per-term df, the ti-ordered contribution fold (the NB position-fold
    * convention), self-exclusion, per-anchor rank in `r` — shared by the
    * more-like-this query and the retrieval-eval qrels derivation.
    */
  private val bm25MltCtes =
    "toks AS (SELECT doc_id, " +
      "string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents), " +
      "tf AS (SELECT doc_id, term, count(*) AS tf " +
      "FROM (SELECT doc_id, unnest(t) AS term FROM toks) " +
      "WHERE term <> '' GROUP BY doc_id, term), " +
      "dl AS (SELECT doc_id, len(t) AS dl FROM toks), " +
      "s AS (SELECT CAST(count(*) AS DOUBLE) AS n, " +
      "CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl), " +
      "qt AS (SELECT aid, term, CAST(r - 1 AS INTEGER) AS ti FROM (" +
      "SELECT doc_id AS aid, term, row_number() OVER " +
      "(PARTITION BY doc_id ORDER BY tf DESC, term) AS r " +
      "FROM tf WHERE doc_id IN (11, 42, 123)) WHERE r <= 3), " +
      "dfq AS (SELECT t.term, CAST(count(*) AS DOUBLE) AS df FROM tf t " +
      "WHERE t.term IN (SELECT term FROM qt) GROUP BY t.term), " +
      "contrib AS (SELECT q.aid, f.doc_id, q.ti, " +
      "(ln(1.0 + (s.n - d2.df + 0.5) / (d2.df + 0.5)) * " +
      "(CAST(f.tf AS DOUBLE) * 2.2)) / " +
      "(CAST(f.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl)) AS c " +
      "FROM qt q JOIN tf f ON f.term = q.term " +
      "JOIN dfq d2 ON d2.term = q.term " +
      "JOIN dl l ON l.doc_id = f.doc_id, s WHERE f.doc_id <> q.aid), " +
      "sc AS (SELECT aid, doc_id, " +
      "round(list_sum(list(c ORDER BY ti)), 4) AS score " +
      "FROM contrib GROUP BY aid, doc_id), " +
      "r AS (SELECT CAST(aid AS VARCHAR) AS qid, doc_id, score, " +
      "CAST(row_number() OVER (PARTITION BY aid " +
      "ORDER BY score DESC, doc_id) AS INTEGER) AS rank FROM sc)"

  /** One row per named invariant check, `holds` computed by actually
    * running the check — hashed against a constant-true oracle, the
    * ANN-recall-audit pattern generalized: spec-level assertions become
    * driver-visible green rows.
    */
  private def auditDf(s: SparkSession, checks: Seq[(String, Boolean)]): DataFrame = {
    import s.implicits._
    checks.toDF("audit", "holds").orderBy("audit")
  }

  private def auditOracleSql(names: Seq[String]): String =
    "SELECT * FROM (" + names.sorted.map(n =>
      s"SELECT '$n' AS audit, CAST(1 AS BOOLEAN) AS holds")
      .mkString(" UNION ALL ") + ") ORDER BY audit"

  /** DuckDB replication of [[graft.operators.Similarity.binarize]] for the
    * 64-dim fixture: two packed 32-bit sign words per vector (bit j of
    * word w = [embedding[32w+j+1] > 0]).
    */
  private val binaryWordsCte =
    "WITH b AS (SELECT vec_id, " +
      "CAST(list_sum([CASE WHEN embedding[j + 1] > 0 THEN (1::BIGINT << j) " +
      "ELSE 0 END FOR j IN range(32)]) AS BIGINT) AS w0, " +
      "CAST(list_sum([CASE WHEN embedding[j + 33] > 0 THEN (1::BIGINT << j) " +
      "ELSE 0 END FOR j IN range(32)]) AS BIGINT) AS w1 " +
      "FROM embeddings), "

  /** The query vector for `vec_id == qid`, collected driver-side (one row). */
  private def queryVec(embs: DataFrame, qid: Long): Array[Float] =
    embs.filter(col("vec_id") === qid)
      .select("embedding").head().getSeq[Float](0).toArray

  /** Overlap of a single-query index probe against the brute-force top-k:
    * one row `(qid, n_overlap, k)`. Used by the `ns_ann_*_recall` audits,
    * whose probes are exhaustive — so a lossless index yields
    * `n_overlap == k` independent of the data (the oracle constant).
    */
  private def overlapAudit(probe: DataFrame, probeIdCol: String,
                           brute: DataFrame, qid: Long, k: Int): DataFrame =
    probe.select(col(probeIdCol).as("id"))
      .join(brute.select(col("vec_id").as("id")), "id")
      .agg(count(lit(1)).cast("int").as("n_overlap"))
      .select(lit(qid).as("qid"), col("n_overlap"), lit(k).cast("int").as("k"))

  /** Batch form of [[overlapAudit]]: per query id, the overlap of the
    * index probe's `(qid, id)` pairs against the batch brute force's.
    */
  private def overlapAuditBatch(probe: DataFrame, brute: DataFrame,
                                k: Int): DataFrame =
    probe.select("qid", "id")
      .join(brute.select("qid", "id"), Seq("qid", "id"))
      .groupBy("qid").agg(count(lit(1)).cast("int").as("n_overlap"))
      .select(col("qid"), col("n_overlap"), lit(k).cast("int").as("k"))
      .orderBy("qid")

  private def auditOracleSingle(k: Int): String =
    s"SELECT CAST(0 AS BIGINT) AS qid, CAST($k AS INTEGER) AS n_overlap, " +
      s"CAST($k AS INTEGER) AS k"

  private def auditOracleBatch(k: Int): String =
    s"SELECT vec_id AS qid, CAST($k AS INTEGER) AS n_overlap, " +
      s"CAST($k AS INTEGER) AS k FROM embeddings WHERE vec_id < 10 ORDER BY qid"

  /** Materialize the ANN index-catalog entries for `d` if absent (the same
    * entries the `ns_ann_*_index`/`ivf` queries resolve). An index build is
    * a ONE-TIME cost per dataset version by design — callers that benchmark
    * or serve repeated queries warm it here so the query path measures what
    * production runs: the bucket-pruned probe.
    */
  def warmIndexes(s: SparkSession, d: String): Unit = {
    val embs = Tables.embeddings(s, d)
    bpeModel(s, d)
    IndexCatalog.ensure(s, "ann-lsh", Seq(s"$d/embeddings.parquet"), "planes=6")(
      dir => Similarity.buildIndex(embs, "vec_id", "embedding", dir, numPlanes = 6))
    IndexCatalog.ensure(s, "ann-ivf", Seq(s"$d/embeddings.parquet"), "k=16,it=2")(
      dir => graft.operators.IvfIndex.build(embs, "vec_id", "embedding", dir))
    IndexCatalog.ensure(s, "ann-pq", Seq(s"$d/embeddings.parquet"),
      "m=8,ksub=256,it=8")(
      dir => graft.operators.PqIndex.build(embs, "vec_id", "embedding", dir))
    IndexCatalog.ensure(s, "ann-ivfpq", Seq(s"$d/embeddings.parquet"),
      "k=16,m=8,ksub=256")(
      dir => graft.operators.IvfPqIndex.build(embs, "vec_id", "embedding", dir))
    unigramModel(s, d)
    nbModel(s, d)
    dupClusterTable(s, d)
    semanticClusterTable(s, d)
    IndexCatalog.ensure(s, "minhash", Seq(s"$d/documents.parquet"),
      "mod10ne0|n=3|h=32|b=16")(staging =>
      graft.operators.MinHashIndex.build(
        Tables.documents(s, d).filter(col("doc_id") % 10 =!= 0),
        "doc_id", "text", staging))
    // knn-intdot: the exact integer-dot graph shared by propagation,
    // PageRank, PPR, HITS, and the hashed graph dump
    intdotEdges(s, d)
  }

  /** The learned BPE model for `d`'s documents (merge table + word
    * dictionary), memoized through [[IndexCatalog]] — trained ONCE per
    * dataset version, read warm by every tokenizer query (same contract
    * as the ANN indexes: training is an indexing step, not a per-query
    * cost).
    */
  def bpeModel(s: SparkSession, d: String,
               numMerges: Int = 20): (DataFrame, DataFrame) = {
    val dir = IndexCatalog.ensure(s, "bpe",
      Seq(s"$d/documents.parquet"), s"merges=$numMerges") { staging =>
      val (m, v) = Bpe.learn(Tables.documents(s, d), "text",
        Bpe.BpeConfig(numMerges = numMerges))
      m.write.parquet(s"$staging/merges")
      v.write.parquet(s"$staging/vocab")
    }
    (s.read.parquet(s"$dir/merges"), s.read.parquet(s"$dir/vocab"))
  }

  /** The trained NB quality/language model for `d`'s documents (train
    * split = hashSplit md5 bucket < 80, labels = lang), memoized through
    * [[IndexCatalog]] — training is closed-form counts, but three
    * queries (predict, eval, PR curve) consume the same model, and the
    * parquet round-trip preserves the round-6 doubles exactly so the
    * oracle hash is unchanged (the LR round-trip spec precedent).
    */
  def nbModel(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val dir = IndexCatalog.ensure(s, "nb-quality",
      Seq(s"$d/documents.parquet"), "b=4096,label=lang,split=80") { staging =>
      val docs = Tables.documents(s, d)
      val b = Curation.hashBucket(col("doc_id"), 100)
      val (m, p) = Classifier.nbTrain(docs.filter(b < 80), "doc_id", "text",
        "lang", 4096)
      m.write.parquet(s"$staging/model")
      p.write.parquet(s"$staging/priors")
    }
    (s.read.parquet(s"$dir/model"), s.read.parquet(s"$dir/priors"))
  }

  /** The trained Unigram-LM model for `d`'s documents, memoized through
    * [[IndexCatalog]] — same contract as [[bpeModel]]: EM training is an
    * indexing step paid once per dataset version, not a per-query cost.
    */
  def unigramModel(s: SparkSession, d: String): DataFrame = {
    val dir = IndexCatalog.ensure(s, "unigram",
      Seq(s"$d/documents.parquet"), "v=400,len=8,seed=2000,em=4") { staging =>
      graft.operators.Unigram.train(Tables.documents(s, d), "text")
        .write.parquet(staging)
    }
    s.read.parquet(dir)
  }

  /** The near-dup CLUSTER table for `d`'s documents, memoized through
    * [[IndexCatalog]] — clusters are the most-reused dedup artifact in a
    * real pipeline (every keep/drop policy consumes them), and the
    * pairs→connected-components run that produces them is the single most
    * expensive recompute in this suite, so it is content-addressed like
    * the ANN indexes: built ONCE per (input fingerprint, pair parameters),
    * then every consumer (`ns_dedup_clusters`, `ns_curate_keep_best`, a
    * user's own curation query) is a parquet scan of `(id, cluster)`.
    * Input drift rebuilds by construction (the fingerprint changes).
    */
  def dupClusterTable(s: SparkSession, d: String): DataFrame = {
    val dir = IndexCatalog.ensure(s, "dup-clusters",
      Seq(s"$d/documents.parquet"), "minhash,t=0.8,n=3,h=32,b=16") { staging =>
      val docs = Tables.documents(s, d)
      Dedup.dupClusters(
        Dedup.minhashLshPairs(docs, "doc_id", "text", 0.8), docs, "doc_id")
        .write.parquet(staging)
    }
    s.read.parquet(dir)
  }

  /** SEMANTIC cluster table: connected components over the
    * embedding-cosine pair graph ([[Dedup.embeddingDupPairs]] at the 0.4
    * boundary the embeddings fixture is built around) — same memoization
    * contract as [[dupClusterTable]], keyed on the embeddings input.
    */
  def semanticClusterTable(s: SparkSession, d: String): DataFrame = {
    val dir = IndexCatalog.ensure(s, "sem-clusters",
      Seq(s"$d/embeddings.parquet"), "cos,t=0.4") { staging =>
      val embs = Tables.embeddings(s, d)
      Dedup.dupClusters(
        Dedup.embeddingDupPairs(embs, "vec_id", "embedding", 0.4),
        embs, "vec_id")
        .write.parquet(staging)
    }
    s.read.parquet(dir)
  }

  val defs: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

    // ---- exact dedup: hash-groupBy on normalized-text fingerprint ----
    ("ns_dedup_exact",
      (s: SparkSession, d: String) =>
        Dedup.exactGroups(Tables.documents(s, d), "doc_id", "text").orderBy("fp"),
      Some("SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp, " +
        "min(doc_id) AS keep_id, count(*) AS n_docs FROM documents " +
        "GROUP BY fp ORDER BY fp")),

    // ---- exact n-gram Jaccard near-dup pairs ----
    ("ns_dedup_ngram_jaccard",
      (s: SparkSession, d: String) =>
        Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text", 0.8)
          .orderBy("id_a", "id_b"),
      Some(jaccardPairsSql)),

    // ---- asymmetric containment pairs (overlap coefficient >= 0.9):
    // subset-duplication detector Jaccard is blind to ----
    ("ns_dedup_containment",
      (s: SparkSession, d: String) =>
        Dedup.containmentPairs(Tables.documents(s, d), "doc_id", "text", 0.9)
          .orderBy("id_a", "id_b"),
      Some(shingleCte +
        "SELECT id_a, id_b, " +
        "CAST(inter AS DOUBLE)/s1.n AS c_a_in_b, " +
        "CAST(inter AS DOUBLE)/s2.n AS c_b_in_a " +
        "FROM pairs JOIN sizes s1 ON id_a = s1.doc_id " +
        "JOIN sizes s2 ON id_b = s2.doc_id " +
        "WHERE greatest(CAST(inter AS DOUBLE)/s1.n, CAST(inter AS DOUBLE)/s2.n) >= 0.9 " +
        "ORDER BY id_a, id_b")),

    // ---- MinHash + LSH near-dup pairs (exact-verified; scale path) ----
    ("ns_dedup_minhash_lsh",
      (s: SparkSession, d: String) =>
        Dedup.minhashLshPairs(Tables.documents(s, d), "doc_id", "text", 0.8)
          .orderBy("id_a", "id_b"),
      Some(jaccardPairsSql)),

    // ---- near-dup INDEX probe: an incoming shard (doc_id % 10 == 0)
    // checked against a materialized MinHash-LSH index of the rest of the
    // corpus — the rolling-ingest dedup shape (the delta probes bucketed
    // band partitions; the corpus is never rescanned). Oracle = the exact
    // cross-pair Jaccard relation. ----
    ("ns_dedup_minhash_index",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val indexed = docs.filter(col("doc_id") % 10 =!= 0)
        val dir = IndexCatalog.ensure(s, "minhash",
          Seq(s"$d/documents.parquet"), "mod10ne0|n=3|h=32|b=16")(staging =>
          graft.operators.MinHashIndex.build(indexed, "doc_id", "text",
            staging))
        graft.operators.MinHashIndex.probe(s, dir,
            docs.filter(col("doc_id") % 10 === 0), "doc_id", "text",
            threshold = 0.8)
          .orderBy("id_new", "id_old")
      },
      Some(shingleCte +
        "SELECT CASE WHEN id_a % 10 = 0 THEN id_a ELSE id_b END AS id_new, " +
        "CASE WHEN id_a % 10 = 0 THEN id_b ELSE id_a END AS id_old, " +
        "CAST(inter AS DOUBLE)/(s1.n + s2.n - inter) AS jaccard " +
        "FROM pairs JOIN sizes s1 ON id_a = s1.doc_id " +
        "JOIN sizes s2 ON id_b = s2.doc_id " +
        "WHERE CAST(inter AS DOUBLE)/(s1.n + s2.n - inter) >= 0.8 " +
        "AND ((id_a % 10 = 0) <> (id_b % 10 = 0)) " +
        "ORDER BY id_new, id_old")),

    // ---- near-dup index under CDC DELETES: tombstone a fifth of the
    // indexed corpus (doc_id % 5 = 1), then probe the same delta — the
    // pairs must equal the exact cross-pair relation against the LIVE
    // corpus only, with no physical rewrite (probes mask candidates at
    // the band stage; MinHashIndexSpec additionally pins compact and
    // re-merge-after-compact). Mutations run inside the build lambda so
    // the memoized artifact is the final state. ----
    ("ns_dedup_minhash_update",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val indexed = docs.filter(col("doc_id") % 10 =!= 0)
        val dir = IndexCatalog.ensure(s, "minhashupd",
          Seq(s"$d/documents.parquet"),
          "mod10ne0|del=5k+1|n=3|h=32|b=16")(staging => {
          graft.operators.MinHashIndex.build(indexed, "doc_id", "text",
            staging)
          graft.operators.MinHashIndex.delete(s, staging,
            indexed.filter(col("doc_id") % 5 === 1).select("doc_id"),
            "doc_id")
        })
        graft.operators.MinHashIndex.probe(s, dir,
            docs.filter(col("doc_id") % 10 === 0), "doc_id", "text",
            threshold = 0.8)
          .orderBy("id_new", "id_old")
      },
      Some(shingleCte +
        "SELECT CASE WHEN id_a % 10 = 0 THEN id_a ELSE id_b END AS id_new, " +
        "CASE WHEN id_a % 10 = 0 THEN id_b ELSE id_a END AS id_old, " +
        "CAST(inter AS DOUBLE)/(s1.n + s2.n - inter) AS jaccard " +
        "FROM pairs JOIN sizes s1 ON id_a = s1.doc_id " +
        "JOIN sizes s2 ON id_b = s2.doc_id " +
        "WHERE CAST(inter AS DOUBLE)/(s1.n + s2.n - inter) >= 0.8 " +
        "AND ((id_a % 10 = 0) <> (id_b % 10 = 0)) " +
        "AND (CASE WHEN id_a % 10 = 0 THEN id_b ELSE id_a END) % 5 <> 1 " +
        "ORDER BY id_new, id_old")),

    // ---- near-dup clusters: connected components over the 0.8-Jaccard
    // pair graph, min-id labels (the "which doc do we keep" end product).
    // Pairs come from the MinHash-LSH path — half the cost of the exact
    // inverted-index join, and its exact-verified output EQUALS the exact
    // operator's (asserted in DedupSpec + this query's oracle, which is
    // the recursive-CTE closure over the exact pairs). Served from the
    // content-addressed cluster table (dupClusterTable): built once per
    // input version, probed by every consumer. ----
    ("ns_dedup_clusters",
      (s: SparkSession, d: String) => dupClusterTable(s, d).orderBy("id"),
      Some(shingleCte +
        ", dup AS (SELECT id_a, id_b FROM pairs " +
        "JOIN sizes s1 ON id_a = s1.doc_id JOIN sizes s2 ON id_b = s2.doc_id " +
        "WHERE CAST(inter AS DOUBLE)/(s1.n + s2.n - inter) >= 0.8), " +
        "edges AS (SELECT id_a AS a, id_b AS b FROM dup " +
        "UNION ALL SELECT id_b, id_a FROM dup), " +
        "closure AS (WITH RECURSIVE reach(id, r) AS (" +
        "SELECT a, a FROM (SELECT DISTINCT a FROM edges) " +
        "UNION SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id) " +
        "SELECT id, min(r) AS cluster FROM reach GROUP BY id) " +
        "SELECT d.doc_id AS id, coalesce(c.cluster, d.doc_id) AS cluster " +
        "FROM documents d LEFT JOIN closure c ON d.doc_id = c.id ORDER BY id")),

    // ---- SimHash sketches (oracle-checkable hash) ----
    ("ns_dedup_simhash",
      (s: SparkSession, d: String) =>
        Dedup.simhashSketches(Tables.documents(s, d), "doc_id", "text")
          .orderBy("id"),
      Some(simhashCte + "SELECT doc_id AS id, simhash FROM sk ORDER BY id")),

    // ---- SimHash near-dup pairs (banded + exact hamming verify) ----
    ("ns_dedup_simhash_pairs",
      (s: SparkSession, d: String) =>
        Dedup.simhashPairs(Tables.documents(s, d), "doc_id", "text", maxHamming = 3)
          .orderBy("id_a", "id_b"),
      Some(simhashCte +
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming " +
        "FROM sk a JOIN sk b ON a.doc_id < b.doc_id " +
        "WHERE bit_count(xor(a.simhash, b.simhash)) <= 3 ORDER BY id_a, id_b")),

    // ---- 128-bit SimHash sketches (both md5 halves; the scale upgrade
    // past the 64-bit banding's 2^16-key occupancy ceiling) ----
    ("ns_dedup_simhash128",
      (s: SparkSession, d: String) =>
        Dedup.simhash128Sketches(Tables.documents(s, d), "doc_id", "text")
          .orderBy("id"),
      Some(simhash128Cte +
        "SELECT doc_id AS id, simhash_hi, simhash_lo FROM sk ORDER BY id")),

    // ---- 128-bit SimHash near-dup pairs (4×32-bit bands: 2^32 keys/band,
    // same pigeonhole hamming ≤ 3 guarantee, occupancy sub-linear far past
    // the 64-bit ceiling) ----
    ("ns_dedup_simhash128_pairs",
      (s: SparkSession, d: String) =>
        Dedup.simhash128Pairs(Tables.documents(s, d), "doc_id", "text",
          maxHamming = 3)
          .orderBy("id_a", "id_b"),
      Some(simhash128Cte +
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "CAST(bit_count(xor(a.simhash_hi, b.simhash_hi)) + " +
        "bit_count(xor(a.simhash_lo, b.simhash_lo)) AS BIGINT) AS hamming " +
        "FROM sk a JOIN sk b ON a.doc_id < b.doc_id " +
        "WHERE bit_count(xor(a.simhash_hi, b.simhash_hi)) + " +
        "bit_count(xor(a.simhash_lo, b.simhash_lo)) <= 3 ORDER BY id_a, id_b")),

    // ---- embedding-cosine near-dup pairs ----
    ("ns_dedup_embedding",
      (s: SparkSession, d: String) =>
        Dedup.embeddingDupPairs(Tables.embeddings(s, d), "vec_id", "embedding", 0.4)
          .orderBy("id_a", "id_b"),
      Some("SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
        dCos("a.embedding", "b.embedding") + " AS cos " +
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id " +
        "WHERE " + dCos("a.embedding", "b.embedding") + " >= 0.4 " +
        "ORDER BY id_a, id_b")),

    // ---- SEMANTIC near-dup clusters: CC over the embedding-cosine pair
    // graph (the "which embeddings are the same content" end product,
    // complementing the lexical ns_dedup_clusters); served from the
    // memoized semanticClusterTable ----
    ("ns_dedup_embedding_clusters",
      (s: SparkSession, d: String) => semanticClusterTable(s, d).orderBy("id"),
      Some("WITH dup AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b " +
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id " +
        "WHERE " + dCos("a.embedding", "b.embedding") + " >= 0.4), " +
        "edges AS (SELECT id_a AS a, id_b AS b FROM dup " +
        "UNION ALL SELECT id_b, id_a FROM dup), " +
        "closure AS (WITH RECURSIVE reach(id, r) AS (" +
        "SELECT a, a FROM (SELECT DISTINCT a FROM edges) " +
        "UNION SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id) " +
        "SELECT id, min(r) AS cluster FROM reach GROUP BY id) " +
        "SELECT v.vec_id AS id, coalesce(c.cluster, v.vec_id) AS cluster " +
        "FROM embeddings v LEFT JOIN closure c ON v.vec_id = c.id ORDER BY id")),

    // ---- SemDeDup (Abbas et al. 2023): cluster-scoped semantic dedup —
    // assign every vector to its max-cosine centroid, find near-dup pairs
    // ONLY within clusters (the bounded-quadratic trick), CC the pair
    // graph, keep the min id per group. FIXED centroids (vec_id < 8) make
    // every stage SQL-expressible, so the whole policy hash-matches
    // DuckDB; the learned-centroid twin below exercises the memoized
    // k-means path (rows-only — Lloyd is iterative — with the
    // fixed-vs-learned pipeline identity asserted in SemDedupSpec). ----
    ("ns_dedup_semdedup",
      (s: SparkSession, d: String) => {
        val embs = Tables.embeddings(s, d)
        val cents = embs.filter(col("vec_id") < 8)
          .select(col("vec_id").cast("int").as("cid"),
            col("embedding").as("cvec"))
        SemDedup.report(embs, "vec_id", "embedding", cents, eps = 0.4)
          .orderBy("id")
      },
      Some("WITH cent AS (SELECT CAST(vec_id AS INTEGER) AS cid, " +
        "embedding AS cvec FROM embeddings WHERE vec_id < 8), " +
        "a AS (SELECT e.vec_id AS id, c.cid, " +
        dCos("e.embedding", "c.cvec") + " AS cos " +
        "FROM embeddings e CROSS JOIN cent c), " +
        "asg AS (SELECT id, cid FROM a QUALIFY " +
        "row_number() OVER (PARTITION BY id ORDER BY cos DESC, cid) = 1), " +
        "av AS (SELECT asg.id, asg.cid, e.embedding FROM asg " +
        "JOIN embeddings e ON asg.id = e.vec_id), " +
        "p AS (SELECT x.id AS id_a, y.id AS id_b FROM av x " +
        "JOIN av y ON x.cid = y.cid AND x.id < y.id " +
        "WHERE " + dCos("x.embedding", "y.embedding") + " >= 0.4), " +
        "edges AS (SELECT id_a AS a, id_b AS b FROM p " +
        "UNION ALL SELECT id_b, id_a FROM p), " +
        "closure AS (WITH RECURSIVE reach(id, r) AS (" +
        "SELECT a, a FROM (SELECT DISTINCT a FROM edges) " +
        "UNION SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id) " +
        "SELECT id, min(r) AS grp FROM reach GROUP BY id) " +
        "SELECT av.id, av.cid, coalesce(c.grp, av.id) = av.id AS keep " +
        "FROM av LEFT JOIN closure c ON c.id = av.id ORDER BY av.id")),

    // Hash-oracled from the fed LEARNED centroids (round 14): the oracle
    // replays the whole SemDeDup policy — rounded-3/smaller-cid
    // assignment, within-cluster ≥ eps pairing, min-id connected
    // components — from the k-means output it cannot train itself
    // (distributed xxhash64-seeded Lloyd); training correctness stays
    // with ns_dedup_semdedup_kmeans_audit's pipeline-identity check.
    ("ns_dedup_semdedup_kmeans",
      (s: SparkSession, d: String) => {
        val embs = Tables.embeddings(s, d)
        // same catalog key as reportKMeans resolves internally: ensure is
        // idempotent, so this either builds once or reads the memo
        val indexDir = IndexCatalog.ensure(s, "semdedup-kmeans",
          Seq(s"$d/embeddings.parquet"), "k=8,it=2")(dir =>
          graft.operators.IvfIndex.build(embs, "vec_id", "embedding", dir,
            k = 8, iterations = 2))
        OracleFeed.publish("ns_dedup_semdedup_kmeans", "centroids",
          s.read.parquet(s"$indexDir/centroids"))
        SemDedup.reportKMeans(embs, "vec_id", "embedding",
          Seq(s"$d/embeddings.parquet"), k = 8, iterations = 2, eps = 0.4)
          .orderBy("id")
      },
      Some("WITH cent AS (SELECT cid, cvec FROM " +
        OracleFeed.sqlPath("ns_dedup_semdedup_kmeans", "centroids") + "), " +
        "a AS (SELECT e.vec_id AS id, c.cid, " +
        dCos("e.embedding", "c.cvec") + " AS cos " +
        "FROM embeddings e CROSS JOIN cent c), " +
        "asg AS (SELECT id, cid FROM a QUALIFY " +
        "row_number() OVER (PARTITION BY id ORDER BY cos DESC, cid) = 1), " +
        "av AS (SELECT asg.id, asg.cid, e.embedding FROM asg " +
        "JOIN embeddings e ON asg.id = e.vec_id), " +
        "p AS (SELECT x.id AS id_a, y.id AS id_b FROM av x " +
        "JOIN av y ON x.cid = y.cid AND x.id < y.id " +
        "WHERE " + dCos("x.embedding", "y.embedding") + " >= 0.4), " +
        "edges AS (SELECT id_a AS a, id_b AS b FROM p " +
        "UNION ALL SELECT id_b, id_a FROM p), " +
        "closure AS (WITH RECURSIVE reach(id, r) AS (" +
        "SELECT a, a FROM (SELECT DISTINCT a FROM edges) " +
        "UNION SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id) " +
        "SELECT id, min(r) AS grp FROM reach GROUP BY id) " +
        "SELECT av.id, av.cid, coalesce(c.grp, av.id) = av.id AS keep " +
        "FROM av LEFT JOIN closure c ON c.id = av.id ORDER BY av.id")),

    // ---- prototypicality pruning (Sorscher et al. 2022 / D4 stage 2):
    // per cluster, drop the 25% most-prototypical examples (highest
    // cosine to own centroid), keep the harder tail. Fixed centroids
    // (vec_id < 8) make assignment + rank + drop-count SQL-expressible,
    // so the whole policy hash-matches DuckDB. ----
    ("ns_curate_prototype_prune",
      (s: SparkSession, d: String) => {
        val embs = Tables.embeddings(s, d)
        val cents = embs.filter(col("vec_id") < 8)
          .select(col("vec_id").cast("int").as("cid"),
            col("embedding").as("cvec"))
        SemDedup.prototypePrune(embs, "vec_id", "embedding", cents,
            pruneFrac = 0.25)
          .orderBy("id")
      },
      Some("WITH cent AS (SELECT CAST(vec_id AS INTEGER) AS cid, " +
        "embedding AS cvec FROM embeddings WHERE vec_id < 8), " +
        "a AS (SELECT e.vec_id AS id, c.cid, " +
        dCos("e.embedding", "c.cvec") + " AS cos " +
        "FROM embeddings e CROSS JOIN cent c), " +
        "p AS (SELECT id, cid, cos AS proto FROM a QUALIFY " +
        "row_number() OVER (PARTITION BY id ORDER BY cos DESC, cid) = 1), " +
        "r AS (SELECT id, cid, proto, row_number() OVER (PARTITION BY cid " +
        "ORDER BY proto DESC, id) AS rn, " +
        "count(*) OVER (PARTITION BY cid) AS csize FROM p) " +
        "SELECT id, cid, proto, rn > floor(0.25 * csize) AS keep " +
        "FROM r ORDER BY id")),

    // ---- ANN: brute-force cosine top-k (correctness baseline) ----
    ("ns_ann_brute_topk",
      (s: SparkSession, d: String) =>
        Similarity.bruteForceTopK(Tables.embeddings(s, d), "vec_id", "embedding",
          queryId = 0, k = 10),
      Some("SELECT vec_id, " + dCos("embeddings.embedding", "q.q_vec") + " AS cos " +
        "FROM embeddings, (SELECT embedding AS q_vec FROM embeddings WHERE vec_id = 0) q " +
        "WHERE vec_id <> 0 ORDER BY cos DESC, vec_id LIMIT 10")),

    // ---- Matryoshka truncation (Kusupati et al. 2022): the per-vector
    // prefix-energy report and the truncated-scan top-k — the two
    // numbers that decide whether retrieval can run on a 16-dim prefix
    // at a quarter of the scan cost. Both fully oracled (slice + the
    // same cosine/norm conventions as the full-dim queries). ----
    ("ns_embed_matryoshka",
      (s: SparkSession, d: String) =>
        Similarity.matryoshkaEnergy(Tables.embeddings(s, d), "vec_id",
            "embedding", m = 16)
          .orderBy("vec_id"),
      Some("WITH m AS (SELECT vec_id, len(embedding) AS dims, " +
        "list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)) AS sf, " +
        "list_sum(list_transform(CAST(embedding[1:16] AS DOUBLE[]), x -> x * x)) AS sh " +
        "FROM embeddings) " +
        "SELECT vec_id, CAST(dims AS INTEGER) AS dims, " +
        "round(sqrt(sf), 4) AS norm_full, round(sqrt(sh), 4) AS norm_m, " +
        "CASE WHEN sf > 0 THEN round(sh / sf, 6) ELSE 0.0 END " +
        "AS energy_ratio FROM m ORDER BY vec_id")),

    ("ns_ann_matryoshka_topk",
      (s: SparkSession, d: String) =>
        Similarity.matryoshkaTopK(Tables.embeddings(s, d), "vec_id",
          "embedding", queryId = 0, k = 10, m = 16),
      Some("SELECT vec_id, " +
        dCos("embeddings.embedding[1:16]", "q.q_vec") + " AS cos " +
        "FROM embeddings, (SELECT embedding[1:16] AS q_vec FROM embeddings " +
        "WHERE vec_id = 0) q " +
        "WHERE vec_id <> 0 ORDER BY cos DESC, vec_id LIMIT 10")),

    // ---- MMR diversified top-k: distributed candidate scan + driver-side
    // greedy diversification. At lambda=1 the penalty vanishes, so the
    // selection must EQUAL brute-force top-k — a full oracle on the
    // machinery; the diversifying lambda=0.6 twin is now ALSO fully
    // hashed via [[mmrOracle]] (the k selection rounds unroll as
    // materialized CTEs, the BPE-chain technique — greedy argmax IS
    // SQL-expressible when k is a bounded constant). ----
    ("ns_ann_mmr_lambda1",
      (s: SparkSession, d: String) =>
        Similarity.mmrTopK(Tables.embeddings(s, d), "vec_id", "embedding",
            queryId = 0, k = 10, lambda = 1.0)
          .select(col("vec_id"), col("rel").as("cos")),
      Some("SELECT vec_id, " + dCos("embeddings.embedding", "q.q_vec") + " AS cos " +
        "FROM embeddings, (SELECT embedding AS q_vec FROM embeddings WHERE vec_id = 0) q " +
        "WHERE vec_id <> 0 ORDER BY cos DESC, vec_id LIMIT 10")),

    ("ns_ann_mmr_topk",
      (s: SparkSession, d: String) =>
        Similarity.mmrTopK(Tables.embeddings(s, d), "vec_id", "embedding",
          queryId = 0, k = 10, lambda = 0.6),
      Some(mmrOracle(k = 10, pool = 40))),

    // ---- ANN: hyperplane-LSH bucketed top-k (scale path; approximate by
    // design, so no cross-engine oracle — recall vs brute force is asserted
    // in ScalaTest instead) ----
    // Hash-oracled through the OracleFeed (round 14): the engine's own
    // bucket map is published as parquet and DuckDB re-runs the ENTIRE
    // probe from it — Hamming≤2 candidacy over the fed buckets + exact
    // rounded-3 rerank — so candidate selection and ranking are
    // cross-engine-checked; only the bucket CONSTRUCTION (xxhash64
    // hyperplanes) stays engine-side, covered by ns_ann_lsh_recall.
    ("ns_ann_lsh_topk",
      (s: SparkSession, d: String) => {
        val embs = Tables.embeddings(s, d)
        OracleFeed.publish("ns_ann_lsh_topk", "buckets",
          embs.select(col("vec_id").as("id"),
            Similarity.bucketExpr(col("embedding"), 8).as("bucket")))
        Similarity.lshTopK(embs, "vec_id", "embedding", queryId = 0, k = 10)
      },
      Some("WITH b AS (SELECT id, bucket FROM " +
        OracleFeed.sqlPath("ns_ann_lsh_topk", "buckets") + "), " +
        "q AS (SELECT b.bucket AS qb, e.embedding AS qv FROM b " +
        "JOIN embeddings e ON e.vec_id = b.id WHERE b.id = 0) " +
        "SELECT e.vec_id, " + dCos("e.embedding", "q.qv") + " AS cos " +
        "FROM b JOIN embeddings e ON e.vec_id = b.id CROSS JOIN q " +
        "WHERE b.id <> 0 AND bit_count(xor(b.bucket, q.qb)) <= 2 " +
        "ORDER BY cos DESC, e.vec_id LIMIT 10")),

    // ---- ANN: materialized bucket-partitioned index probe (repeated-query
    // scale path: the probe opens ONLY bucket-pruned partitions; recall and
    // pruning are asserted in SimilaritySpec — approximate by design, no
    // cross-engine oracle). The index comes from IndexCatalog: built ONCE
    // per (dataset version, params), every later query goes straight to the
    // probe — rebuilding per query would forfeit the index's amortization. ----
    ("ns_ann_index_topk",
      (s: SparkSession, d: String) => {
        val embs = Tables.embeddings(s, d)
        // 6 planes = 64 buckets, sized so a bucket holds tens of vectors at
        // this SF (at 100 TB you'd raise planes so bucket ≈ a file-split)
        val indexDir = IndexCatalog.ensure(s, "ann-lsh",
          Seq(s"$d/embeddings.parquet"), "planes=6")(dir =>
          Similarity.buildIndex(embs, "vec_id", "embedding", dir, numPlanes = 6))
        // feed the materialized index's bucket map: the oracle re-runs the
        // probe (Hamming≤2 over fed buckets + rounded-3 rerank) from it
        OracleFeed.publish("ns_ann_index_topk", "buckets",
          s.read.parquet(indexDir)
            .select(col("id"), col("bucket").cast("long").as("bucket")))
        val qv = embs.filter(col("vec_id") === 0)
          .select("embedding").head().getSeq[Float](0).toArray
        // k+1 then drop the query point itself: a clean top-10 of neighbors
        Similarity.indexTopK(s, indexDir, qv, k = 11, numPlanes = 6)
          .filter(col("id") =!= 0)
      },
      Some("WITH b AS (SELECT id, bucket FROM " +
        OracleFeed.sqlPath("ns_ann_index_topk", "buckets") + "), " +
        "q AS (SELECT b.bucket AS qb, e.embedding AS qv FROM b " +
        "JOIN embeddings e ON e.vec_id = b.id WHERE b.id = 0), " +
        "top AS (SELECT b.id, " + dCos("e.embedding", "q.qv") + " AS cos " +
        "FROM b JOIN embeddings e ON e.vec_id = b.id CROSS JOIN q " +
        "WHERE bit_count(xor(b.bucket, q.qb)) <= 2 " +
        "ORDER BY cos DESC, b.id LIMIT 11) " +
        "SELECT id, cos FROM top WHERE id <> 0 ORDER BY cos DESC, id")),

    // ---- ANN: IVF-flat inverted lists (data-adaptive scale path: k-means
    // centroids + nprobe-pruned list scan; deterministic build, recall and
    // pruning asserted in SimilaritySpec — approximate by design) ----
    ("ns_ann_ivf_topk",
      (s: SparkSession, d: String) => {
        val embs = Tables.embeddings(s, d)
        val indexDir = IndexCatalog.ensure(s, "ann-ivf",
          Seq(s"$d/embeddings.parquet"), "k=16,it=2")(dir =>
          graft.operators.IvfIndex.build(embs, "vec_id", "embedding", dir))
        // feed the learned centroids + list membership: the oracle re-runs
        // the probe (rounded-3/cid centroid ranking → nprobe=4 list prune →
        // rounded-3 exact top-k) from them; the k-means BUILD stays
        // engine-side, covered by ns_ann_ivf_recall's all-list probe
        OracleFeed.publish("ns_ann_ivf_topk", "centroids",
          s.read.parquet(s"$indexDir/centroids"))
        OracleFeed.publish("ns_ann_ivf_topk", "lists",
          s.read.parquet(s"$indexDir/lists")
            .select(col("cid").cast("int").as("cid"), col("id")))
        val qv = embs.filter(col("vec_id") === 0)
          .select("embedding").head().getSeq[Float](0).toArray
        graft.operators.IvfIndex.topK(s, indexDir, qv, k = 11)
          .filter(col("id") =!= 0)
      },
      Some("WITH q AS (SELECT embedding AS qv FROM embeddings " +
        "WHERE vec_id = 0), " +
        "probe AS (SELECT cid FROM " +
        OracleFeed.sqlPath("ns_ann_ivf_topk", "centroids") +
        " CROSS JOIN q ORDER BY " + dCos("cvec", "q.qv") +
        " DESC, cid LIMIT 4), " +
        "cand AS (SELECT l.id FROM " +
        OracleFeed.sqlPath("ns_ann_ivf_topk", "lists") +
        " l JOIN probe USING (cid)), " +
        "top AS (SELECT e.vec_id AS id, " + dCos("e.embedding", "q.qv") +
        " AS cos FROM cand JOIN embeddings e ON e.vec_id = cand.id " +
        "CROSS JOIN q ORDER BY cos DESC, id LIMIT 11) " +
        "SELECT id, cos FROM top WHERE id <> 0 ORDER BY cos DESC, id")),

    // ---- ANN: product-quantization index — 8 one-byte codes per vector
    // (32x scan reduction vs float32), ADC byte-scan + exact rerank of the
    // top rerankFactor*k (the standard two-stage PQ shape). Deterministic
    // build; recall vs brute force asserted in PqIndexSpec — approximate
    // by design. ----
    // Hash-oracled from the fed codes+codebooks (round 14): DuckDB
    // rebuilds the query LUT BIT-EXACTLY — Scala's `q(i)*c(i)` is an IEEE
    // float32 multiply widened into a sequential double accumulator, and
    // DuckDB's FLOAT*FLOAT + list_sum(list_transform(...)) is the same
    // correctly-rounded chain (list_sum verified left-to-right) — then
    // replays the ADC byte scan, the top-88 candidate cut (rounded-4,
    // id ties) and the exact rounded-3 rerank. Only codebook TRAINING
    // stays engine-side, covered by ns_ann_pq_recall's full-corpus rerank.
    ("ns_ann_pq_topk",
      (s: SparkSession, d: String) => {
        val embs = Tables.embeddings(s, d)
        val indexDir = IndexCatalog.ensure(s, "ann-pq",
          Seq(s"$d/embeddings.parquet"), "m=8,ksub=256,it=8")(dir =>
          graft.operators.PqIndex.build(embs, "vec_id", "embedding", dir,
            m = 8, ksub = 256))
        OracleFeed.publish("ns_ann_pq_topk", "codes",
          s.read.parquet(s"$indexDir/codes"))
        OracleFeed.publish("ns_ann_pq_topk", "books",
          s.read.parquet(s"$indexDir/codebooks"))
        val qv = embs.filter(col("vec_id") === 0)
          .select("embedding").head().getSeq[Float](0).toArray
        graft.operators.PqIndex.topK(s, indexDir, qv, k = 11,
            rerankFrom = Some((embs, "vec_id", "embedding")))
          .filter(col("id") =!= 0)
      },
      Some("WITH qraw AS (SELECT embedding AS qv FROM embeddings " +
        "WHERE vec_id = 0), " +
        "qn AS (SELECT qv, sqrt(list_sum(list_transform(qv, " +
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm FROM qraw), " +
        "qf AS (SELECT list_transform(qv, x -> CAST(x / nrm AS FLOAT)) " +
        "AS u FROM qn), " +
        "lut AS (SELECT j, cid, CAST(list_sum(list_transform(cvec, " +
        "(c, i) -> CAST(qf.u[j*8+i] * c AS DOUBLE))) AS FLOAT) AS dotf " +
        "FROM " + OracleFeed.sqlPath("ns_ann_pq_topk", "books") +
        " CROSS JOIN qf), " +
        "lutl AS (SELECT list(CAST(dotf AS DOUBLE) ORDER BY j, cid) AS l, " +
        "CAST(max(cid) + 1 AS INTEGER) AS ks FROM lut), " +
        "adc AS (SELECT c.id, round(list_sum(list_transform(c.codes, " +
        "(cd, j) -> lutl.l[(j-1)*lutl.ks + ((CAST(cd AS INTEGER)+256)%256) + 1]" +
        ")), 4) AS score FROM " +
        OracleFeed.sqlPath("ns_ann_pq_topk", "codes") +
        " c CROSS JOIN lutl), " +
        "cand AS (SELECT id FROM adc ORDER BY score DESC, id LIMIT 88), " +
        "top AS (SELECT e.vec_id AS id, " + dCos("e.embedding", "qraw.qv") +
        " AS cos FROM cand JOIN embeddings e ON e.vec_id = cand.id " +
        "CROSS JOIN qraw ORDER BY cos DESC, id LIMIT 11) " +
        "SELECT id, cos FROM top WHERE id <> 0 ORDER BY cos DESC, id")),

    // ---- ANN: COLD index builds, timed every invocation (deterministic
    // dir, wiped first). The probe queries above amortize builds through
    // IndexCatalog by design — these entries exist so BENCH still observes
    // build cost and a build-time regression can't hide behind the cache.
    // Returned stats are engine-internal layout (no DuckDB analog). ----
    ("ns_ann_lsh_build",
      (s: SparkSession, d: String) => {
        val root = new org.apache.hadoop.fs.Path(
          s"${System.getProperty("java.io.tmpdir")}/graft_lsh_build_${math.abs(d.hashCode)}")
        val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(root, true)
        Similarity.buildIndex(Tables.embeddings(s, d), "vec_id", "embedding",
          root.toString, numPlanes = 6)
        s.read.parquet(root.toString).groupBy("bucket")
          .agg(count(lit(1)).as("n_vecs")).orderBy("bucket")
      },
      None),

    ("ns_ann_ivf_build",
      (s: SparkSession, d: String) => {
        val root = new org.apache.hadoop.fs.Path(
          s"${System.getProperty("java.io.tmpdir")}/graft_ivf_build_${math.abs(d.hashCode)}")
        val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(root, true)
        graft.operators.IvfIndex.build(Tables.embeddings(s, d), "vec_id",
          "embedding", root.toString)
        s.read.parquet(s"$root/lists").groupBy("cid")
          .agg(count(lit(1)).as("n_vecs")).orderBy("cid")
      },
      None),

    // ---- ANN: IVF-PQ — coarse list pruning AND 32x-compressed in-list
    // scan (residual PQ codes; one global LUT since cos(q,u) = q·c + q·r
    // on unit vectors), exact rerank. The at-scale composition of the two
    // index families above; approximate by design, recall + pruning
    // asserted in IvfPqIndexSpec. ----
    // Hash-oracled from the fed coarse centroids + residual codebooks +
    // code lists (round 14): DuckDB replays the coarse q·c ranking, the
    // residual LUT, the per-list `q·c + adc` byte scan (all bit-exact
    // float-multiply/double-accumulate chains, see ns_ann_pq_topk), the
    // rounded-4 top-88 cut and the exact rounded-3 rerank. Training stays
    // engine-side, covered by ns_ann_ivfpq_recall's all-list full rerank.
    ("ns_ann_ivfpq_topk",
      (s: SparkSession, d: String) => {
        val embs = Tables.embeddings(s, d)
        val indexDir = IndexCatalog.ensure(s, "ann-ivfpq",
          Seq(s"$d/embeddings.parquet"), "k=16,m=8,ksub=256")(dir =>
          graft.operators.IvfPqIndex.build(embs, "vec_id", "embedding", dir))
        OracleFeed.publish("ns_ann_ivfpq_topk", "coarse",
          s.read.parquet(s"$indexDir/centroids"))
        OracleFeed.publish("ns_ann_ivfpq_topk", "books",
          s.read.parquet(s"$indexDir/codebooks"))
        OracleFeed.publish("ns_ann_ivfpq_topk", "codes",
          s.read.parquet(s"$indexDir/codes")
            .select(col("cid").cast("int").as("cid"), col("id"), col("codes")))
        val qv = embs.filter(col("vec_id") === 0)
          .select("embedding").head().getSeq[Float](0).toArray
        graft.operators.IvfPqIndex.topK(s, indexDir, qv, k = 11, nprobe = 4,
            rerankFrom = Some((embs, "vec_id", "embedding")))
          .filter(col("id") =!= 0)
      },
      Some("WITH qraw AS (SELECT embedding AS qv FROM embeddings " +
        "WHERE vec_id = 0), " +
        "qn AS (SELECT qv, sqrt(list_sum(list_transform(qv, " +
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm FROM qraw), " +
        "qf AS (SELECT list_transform(qv, x -> CAST(x / nrm AS FLOAT)) " +
        "AS u FROM qn), " +
        "probe AS (SELECT cid, list_sum(list_transform(cvec, " +
        "(x, i) -> CAST(qf.u[i] * x AS DOUBLE))) AS qc FROM " +
        OracleFeed.sqlPath("ns_ann_ivfpq_topk", "coarse") +
        " CROSS JOIN qf ORDER BY qc DESC, cid LIMIT 4), " +
        "lut AS (SELECT j, cid, CAST(list_sum(list_transform(cvec, " +
        "(c, i) -> CAST(qf.u[j*8+i] * c AS DOUBLE))) AS FLOAT) AS dotf " +
        "FROM " + OracleFeed.sqlPath("ns_ann_ivfpq_topk", "books") +
        " CROSS JOIN qf), " +
        "lutl AS (SELECT list(CAST(dotf AS DOUBLE) ORDER BY j, cid) AS l, " +
        "CAST(max(cid) + 1 AS INTEGER) AS ks FROM lut), " +
        "adc AS (SELECT c.id, round(p.qc + list_sum(list_transform(c.codes, " +
        "(cd, j) -> lutl.l[(j-1)*lutl.ks + ((CAST(cd AS INTEGER)+256)%256) + 1]" +
        ")), 4) AS score FROM " +
        OracleFeed.sqlPath("ns_ann_ivfpq_topk", "codes") +
        " c JOIN probe p USING (cid) CROSS JOIN lutl), " +
        "cand AS (SELECT id FROM adc ORDER BY score DESC, id LIMIT 88), " +
        "top AS (SELECT e.vec_id AS id, " + dCos("e.embedding", "qraw.qv") +
        " AS cos FROM cand JOIN embeddings e ON e.vec_id = cand.id " +
        "CROSS JOIN qraw ORDER BY cos DESC, id LIMIT 11) " +
        "SELECT id, cos FROM top WHERE id <> 0 ORDER BY cos DESC, id")),

    ("ns_ann_pq_build",
      (s: SparkSession, d: String) => {
        val root = new org.apache.hadoop.fs.Path(
          s"${System.getProperty("java.io.tmpdir")}/graft_pq_build_${math.abs(d.hashCode)}")
        val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(root, true)
        graft.operators.PqIndex.build(Tables.embeddings(s, d), "vec_id",
          "embedding", root.toString)
        s.read.parquet(s"$root/codes")
          .select(posexplode(col("codes")).as(Seq("j", "cid")))
          .groupBy("j").agg(countDistinct("cid").as("n_used"))
          .orderBy("j")
      },
      None),

    // ---- ANN: int8-quantized top-k (4x smaller scan; approximate by
    // design — recall vs the float ranking asserted in SimilaritySpec) ----
    // Hash-oracled from the fed QUANTIZED payloads (round 14): the r13
    // rejection stands for emulating the float32 quantization itself
    // (double-divide-then-cast double-rounds), so the feed sidesteps it —
    // the engine's own int8 bytes publish as array<int> and the oracle
    // replays the ranking in EXACT integer arithmetic (int dot / norms,
    // one double division — bit-equal by construction). Quantization
    // correctness stays with ns_ann_quantized_recall.
    ("ns_ann_quantized_topk",
      (s: SparkSession, d: String) => {
        val q = Similarity.quantize(Tables.embeddings(s, d), "vec_id", "embedding")
        import s.implicits._
        OracleFeed.publish("ns_ann_quantized_topk", "qvecs",
          q.select("id", "qvec").as[(Long, Array[Byte])]
            .map { case (id, b) => (id, b.map(_.toInt).toSeq) }
            .toDF("id", "qarr"))
        val qv = q.filter(col("id") === 0).select("qvec").head().getAs[Array[Byte]](0)
        Similarity.quantizedTopK(q, qv, queryId = 0, k = 10)
      },
      Some("WITH qt AS (SELECT id, qarr FROM " +
        OracleFeed.sqlPath("ns_ann_quantized_topk", "qvecs") + "), " +
        "q AS (SELECT qarr AS qa FROM qt WHERE id = 0) " +
        "SELECT qt.id, round(CAST(list_sum(list_transform(qt.qarr, " +
        "(x, i) -> CAST(x AS BIGINT) * CAST(q.qa[i] AS BIGINT))) AS DOUBLE) " +
        "/ (sqrt(CAST(list_sum(list_transform(qt.qarr, " +
        "x -> CAST(x AS BIGINT) * CAST(x AS BIGINT))) AS DOUBLE)) * " +
        "sqrt(CAST(list_sum(list_transform(q.qa, " +
        "x -> CAST(x AS BIGINT) * CAST(x AS BIGINT))) AS DOUBLE))), 3) AS cos " +
        "FROM qt CROSS JOIN q WHERE qt.id <> 0 " +
        "ORDER BY cos DESC, qt.id LIMIT 10")),

    // Driver-visible twin of the quantized probe (kept: the feed oracle
    // above checks the RANKING from the engine's bytes, this checks the
    // QUANTIZATION against float brute force). Unlike the exhaustive
    // `ns_ann_*_recall` audits, int8 quantization is LOSSY by
    // construction — no parameter makes it reproduce brute force — so the
    // auditable invariant is the SimilaritySpec recall floor (>= 8 of the
    // float top-10 survive), stated as a constant-oracle boolean.
    ("ns_ann_quantized_recall",
      (s: SparkSession, d: String) => {
        val embs = Tables.embeddings(s, d)
        val q = Similarity.quantize(embs, "vec_id", "embedding")
        val qv = q.filter(col("id") === 0).select("qvec").head()
          .getAs[Array[Byte]](0)
        val quantTop = Similarity.quantizedTopK(q, qv, queryId = 0, k = 10)
          .select("id").collect().map(_.getLong(0)).toSet
        val floatTop = Similarity
          .bruteForceTopK(embs, "vec_id", "embedding", 0, 10)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        auditDf(s, Seq(
          "quantized_recall_at_least_8_of_10" ->
            ((quantTop & floatTop).size >= 8)))
      },
      Some(auditOracleSql(Seq("quantized_recall_at_least_8_of_10")))),

    // ---- binary-embedding retrieval: sign-bit packed words (32 dims per
    // long) ranked by Hamming distance — exact over the binary space, so
    // fully oracled (unlike lossy int8, the SIGNATURE itself is the
    // contract); and the binary-then-rerank cascade whose shortlist stage
    // scans 1/32 the bytes, with exact cosine restored on survivors. ----
    ("ns_ann_binary_topk",
      (s: SparkSession, d: String) =>
        Similarity.binaryTopK(Tables.embeddings(s, d), "vec_id", "embedding",
          queryId = 0, k = 10),
      Some(binaryWordsCte +
        "q AS (SELECT w0 AS q0, w1 AS q1 FROM b WHERE vec_id = 0) " +
        "SELECT b.vec_id, CAST(bit_count(xor(b.w0, q.q0)) + " +
        "bit_count(xor(b.w1, q.q1)) AS INTEGER) AS hamming " +
        "FROM b, q WHERE vec_id <> 0 ORDER BY hamming, vec_id LIMIT 10")),

    ("ns_ann_binary_rerank",
      (s: SparkSession, d: String) =>
        Similarity.binaryRerank(Tables.embeddings(s, d), "vec_id",
          "embedding", queryId = 0, k = 10, candidateFactor = 4),
      Some(binaryWordsCte +
        "q AS (SELECT w0 AS q0, w1 AS q1 FROM b WHERE vec_id = 0), " +
        "h AS (SELECT b.vec_id, bit_count(xor(b.w0, q.q0)) + " +
        "bit_count(xor(b.w1, q.q1)) AS ham FROM b, q WHERE vec_id <> 0), " +
        "slist AS (SELECT vec_id FROM h ORDER BY ham, vec_id LIMIT 40), " +
        "qq AS (SELECT embedding AS q_vec FROM embeddings WHERE vec_id = 0) " +
        "SELECT e.vec_id, " + dCos("e.embedding", "qq.q_vec") + " AS cos " +
        "FROM embeddings e JOIN slist USING (vec_id), qq " +
        "ORDER BY cos DESC, e.vec_id LIMIT 10")),

    // ---- ANN: BATCH brute-force top-k (one pass, all query vectors) ----
    ("ns_ann_batch_topk",
      (s: SparkSession, d: String) => {
        val embs = Tables.embeddings(s, d)
        Similarity.bruteForceTopKBatch(embs, "vec_id", "embedding",
          embs.filter(col("vec_id") < 10), "vec_id", "embedding", k = 3)
          .orderBy("qid", "rank")
      },
      Some("WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings " +
        "WHERE vec_id < 10), " +
        "scored AS (SELECT q.qid, e.vec_id AS id, " +
        "round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), " +
        "CAST(q.qvec AS DOUBLE[])), 3) AS cos " +
        "FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid), " +
        "r AS (SELECT qid, id, cos, CAST(row_number() OVER (PARTITION BY qid " +
        "ORDER BY cos DESC, id) AS INTEGER) AS rank FROM scored) " +
        "SELECT qid, id, cos, rank FROM r WHERE rank <= 3 ORDER BY qid, rank")),

    // ---- hard-negative mining: per anchor, top-k nearest DIFFERENT-label
    // vectors (contrastive-training negatives; cosine = margin signal) ----
    ("ns_ann_hard_negatives",
      (s: SparkSession, d: String) => {
        val embs = Tables.embeddings(s, d)
        Similarity.hardNegatives(embs, "vec_id", "embedding", "label",
          embs.filter(col("vec_id") < 10), "vec_id", "embedding", "label", k = 3)
          .orderBy("qid", "rank")
      },
      Some("WITH q AS (SELECT vec_id AS qid, embedding AS qvec, label AS qlabel " +
        "FROM embeddings WHERE vec_id < 10), " +
        "scored AS (SELECT q.qid, e.vec_id AS id, e.label AS neg_label, " +
        "round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), " +
        "CAST(q.qvec AS DOUBLE[])), 3) AS cos " +
        "FROM embeddings e CROSS JOIN q " +
        "WHERE e.vec_id <> q.qid AND e.label <> q.qlabel), " +
        "r AS (SELECT qid, id, neg_label, cos, CAST(row_number() OVER (" +
        "PARTITION BY qid ORDER BY cos DESC, id) AS INTEGER) AS rank FROM scored) " +
        "SELECT qid, id, neg_label, cos, rank FROM r WHERE rank <= 3 " +
        "ORDER BY qid, rank")),

    // ---- contrastive triplet mining: per anchor the best same-label
    // positive, the hardest different-label negative, and the margin —
    // the training-example builder for embedding models; negative margin
    // flags the anchors a contrastive loss learns most from. ----
    ("ns_ann_triplets",
      (s: SparkSession, d: String) => {
        val embs = Tables.embeddings(s, d)
        Similarity.tripletMine(embs, "vec_id", "embedding", "label",
            embs.filter(col("vec_id") < 10), "vec_id", "embedding", "label")
          .orderBy("qid")
      },
      Some("WITH q AS (SELECT vec_id AS qid, embedding AS qvec, " +
        "label AS qlabel FROM embeddings WHERE vec_id < 10), " +
        "scored AS (SELECT q.qid, q.qlabel, e.vec_id AS id, e.label AS lbl, " +
        "round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), " +
        "CAST(q.qvec AS DOUBLE[])), 3) AS cos " +
        "FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid), " +
        "p AS (SELECT qid, id AS pos_id, cos AS pos_cos FROM scored " +
        "WHERE lbl = qlabel QUALIFY row_number() OVER (PARTITION BY qid " +
        "ORDER BY cos DESC, id) = 1), " +
        "n AS (SELECT qid, id AS neg_id, cos AS neg_cos FROM scored " +
        "WHERE lbl <> qlabel QUALIFY row_number() OVER (PARTITION BY qid " +
        "ORDER BY cos DESC, id) = 1) " +
        "SELECT qid, pos_id, pos_cos, neg_id, neg_cos, " +
        "round(pos_cos - neg_cos, 3) AS margin " +
        "FROM p JOIN n USING (qid) ORDER BY qid")),

    // ---- ANN: BATCH index probe (bucket-pruned scan; approximate by
    // design — recall vs the batch brute force asserted in SimilaritySpec) ----
    // ---- ANN: BATCH probe of the IVF index (centroid ranking as a
    // DataFrame op over the broadcast k centroids; driver collects only
    // the distinct probed cids — bounded by k — for planning-time list
    // pruning; approximate by design → recall asserted in SimilaritySpec,
    // no cross-engine oracle) ----
    ("ns_ann_batch_ivf_topk",
      (s: SparkSession, d: String) => {
        val embs = Tables.embeddings(s, d)
        // same catalog entry as ns_ann_ivf_topk: one physical index serves
        // both the single-vector and the batch probe
        val indexDir = IndexCatalog.ensure(s, "ann-ivf",
          Seq(s"$d/embeddings.parquet"), "k=16,it=2")(dir =>
          graft.operators.IvfIndex.build(embs, "vec_id", "embedding", dir))
        // feed centroids + list membership: the oracle replays the
        // per-query probe — bit-exact raw-cosine centroid ranking (the
        // engine windows on the unrounded double), nprobe=4 prune, exact
        // rounded-3 per-query rank
        OracleFeed.publish("ns_ann_batch_ivf_topk", "centroids",
          s.read.parquet(s"$indexDir/centroids"))
        OracleFeed.publish("ns_ann_batch_ivf_topk", "lists",
          s.read.parquet(s"$indexDir/lists")
            .select(col("cid").cast("int").as("cid"), col("id")))
        graft.operators.IvfIndex.topKBatch(s, indexDir,
          embs.filter(col("vec_id") < 10), "vec_id", "embedding", k = 3)
          .orderBy("qid", "rank")
      },
      Some("WITH q AS (SELECT vec_id AS qid, embedding AS qv " +
        "FROM embeddings WHERE vec_id < 10), " +
        "probe AS (SELECT qid, cid, qv FROM (SELECT q.qid, c.cid, q.qv, " +
        "row_number() OVER (PARTITION BY q.qid ORDER BY " +
        dCosExact("q.qv", "c.cvec") + " DESC, c.cid) AS crank FROM " +
        OracleFeed.sqlPath("ns_ann_batch_ivf_topk", "centroids") +
        " c CROSS JOIN q) WHERE crank <= 4), " +
        "scored AS (SELECT p.qid, l.id, " + dCos("e.embedding", "p.qv") +
        " AS cos FROM " +
        OracleFeed.sqlPath("ns_ann_batch_ivf_topk", "lists") +
        " l JOIN probe p USING (cid) " +
        "JOIN embeddings e ON e.vec_id = l.id WHERE l.id <> p.qid), " +
        "r AS (SELECT qid, id, cos, CAST(row_number() OVER (" +
        "PARTITION BY qid ORDER BY cos DESC, id) AS INTEGER) AS rank " +
        "FROM scored) " +
        "SELECT qid, id, cos, rank FROM r WHERE rank <= 3 " +
        "ORDER BY qid, rank")),

    ("ns_ann_batch_index_topk",
      (s: SparkSession, d: String) => {
        val embs = Tables.embeddings(s, d)
        // same catalog entry as ns_ann_index_topk: one physical index serves
        // both the single-vector and the batch probe
        val indexDir = IndexCatalog.ensure(s, "ann-lsh",
          Seq(s"$d/embeddings.parquet"), "planes=6")(dir =>
          Similarity.buildIndex(embs, "vec_id", "embedding", dir, numPlanes = 6))
        // feed the bucket map: the oracle replays per-query Hamming≤2
        // candidacy + the exact rounded-3 per-query rank
        OracleFeed.publish("ns_ann_batch_index_topk", "buckets",
          s.read.parquet(indexDir)
            .select(col("id"), col("bucket").cast("long").as("bucket")))
        Similarity.indexTopKBatch(s, indexDir,
          embs.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 3, numPlanes = 6)
          .orderBy("qid", "rank")
      },
      Some("WITH b AS (SELECT id, bucket FROM " +
        OracleFeed.sqlPath("ns_ann_batch_index_topk", "buckets") + "), " +
        "q AS (SELECT b.id AS qid, b.bucket AS qb, e.embedding AS qv " +
        "FROM b JOIN embeddings e ON e.vec_id = b.id WHERE b.id < 10), " +
        "scored AS (SELECT q.qid, b.id, " + dCos("e.embedding", "q.qv") +
        " AS cos FROM b JOIN embeddings e ON e.vec_id = b.id CROSS JOIN q " +
        "WHERE b.id <> q.qid AND bit_count(xor(b.bucket, q.qb)) <= 2), " +
        "r AS (SELECT qid, id, cos, CAST(row_number() OVER (" +
        "PARTITION BY qid ORDER BY cos DESC, id) AS INTEGER) AS rank " +
        "FROM scored) " +
        "SELECT qid, id, cos, rank FROM r WHERE rank <= 3 " +
        "ORDER BY qid, rank")),

    // ---- ANN RECALL AUDITS: the driver-hashable twin of the rows-only
    // index probes. Each audit probes the SAME catalog index EXHAUSTIVELY
    // (maxHamming = numPlanes / nprobe = nlist / rerank window >= corpus),
    // which provably reproduces exact brute-force top-k — so the overlap
    // join against the brute baseline is (qid, k, k) by construction, a
    // DATA-INDEPENDENT constant DuckDB can state as the oracle. Green here
    // proves the index storage + pruning + probe plumbing is lossless
    // (partition layout drops no vector, kernels match the brute path);
    // recall at the production approximate settings stays asserted in
    // SimilaritySpec/PqIndexSpec/IvfPqIndexSpec. ----
    ("ns_ann_lsh_recall",
      (s: SparkSession, d: String) => {
        val embs = Tables.embeddings(s, d)
        overlapAudit(
          Similarity.lshTopK(embs, "vec_id", "embedding", queryId = 0,
            k = 10, numPlanes = 8, maxHamming = 8), "vec_id",
          Similarity.bruteForceTopK(embs, "vec_id", "embedding", 0, 10),
          qid = 0, k = 10)
      },
      Some(auditOracleSingle(10))),

    ("ns_ann_index_recall",
      (s: SparkSession, d: String) => {
        val embs = Tables.embeddings(s, d)
        val indexDir = IndexCatalog.ensure(s, "ann-lsh",
          Seq(s"$d/embeddings.parquet"), "planes=6")(dir =>
          Similarity.buildIndex(embs, "vec_id", "embedding", dir, numPlanes = 6))
        val qv = queryVec(embs, 0)
        overlapAudit(
          // k+1 with the query point included (cos 1.0 ranks first), then
          // dropped — mirrors ns_ann_index_topk
          Similarity.indexTopK(s, indexDir, qv, k = 11, numPlanes = 6,
            maxHamming = 6).filter(col("id") =!= 0), "id",
          Similarity.bruteForceTopK(embs, "vec_id", "embedding", 0, 10),
          qid = 0, k = 10)
      },
      Some(auditOracleSingle(10))),

    ("ns_ann_ivf_recall",
      (s: SparkSession, d: String) => {
        val embs = Tables.embeddings(s, d)
        val indexDir = IndexCatalog.ensure(s, "ann-ivf",
          Seq(s"$d/embeddings.parquet"), "k=16,it=2")(dir =>
          graft.operators.IvfIndex.build(embs, "vec_id", "embedding", dir))
        val qv = queryVec(embs, 0)
        overlapAudit(
          graft.operators.IvfIndex.topK(s, indexDir, qv, k = 11, nprobe = 16)
            .filter(col("id") =!= 0), "id",
          Similarity.bruteForceTopK(embs, "vec_id", "embedding", 0, 10),
          qid = 0, k = 10)
      },
      Some(auditOracleSingle(10))),

    ("ns_ann_pq_recall",
      (s: SparkSession, d: String) => {
        val embs = Tables.embeddings(s, d)
        val indexDir = IndexCatalog.ensure(s, "ann-pq",
          Seq(s"$d/embeddings.parquet"), "m=8,ksub=256,it=8")(dir =>
          graft.operators.PqIndex.build(embs, "vec_id", "embedding", dir,
            m = 8, ksub = 256))
        val qv = queryVec(embs, 0)
        // rerank window >= corpus: the ADC pre-ranking cannot drop a true
        // neighbor, so the exact rerank IS brute force
        val rf = (embs.count() / 11 + 1).toInt
        overlapAudit(
          graft.operators.PqIndex.topK(s, indexDir, qv, k = 11,
              rerankFrom = Some((embs, "vec_id", "embedding")),
              rerankFactor = rf)
            .filter(col("id") =!= 0), "id",
          Similarity.bruteForceTopK(embs, "vec_id", "embedding", 0, 10),
          qid = 0, k = 10)
      },
      Some(auditOracleSingle(10))),

    ("ns_ann_ivfpq_recall",
      (s: SparkSession, d: String) => {
        val embs = Tables.embeddings(s, d)
        val indexDir = IndexCatalog.ensure(s, "ann-ivfpq",
          Seq(s"$d/embeddings.parquet"), "k=16,m=8,ksub=256")(dir =>
          graft.operators.IvfPqIndex.build(embs, "vec_id", "embedding", dir))
        val qv = queryVec(embs, 0)
        val rf = (embs.count() / 11 + 1).toInt
        overlapAudit(
          graft.operators.IvfPqIndex.topK(s, indexDir, qv, k = 11,
              nprobe = 16, rerankFrom = Some((embs, "vec_id", "embedding")),
              rerankFactor = rf)
            .filter(col("id") =!= 0), "id",
          Similarity.bruteForceTopK(embs, "vec_id", "embedding", 0, 10),
          qid = 0, k = 10)
      },
      Some(auditOracleSingle(10))),

    ("ns_ann_batch_index_recall",
      (s: SparkSession, d: String) => {
        val embs = Tables.embeddings(s, d)
        val indexDir = IndexCatalog.ensure(s, "ann-lsh",
          Seq(s"$d/embeddings.parquet"), "planes=6")(dir =>
          Similarity.buildIndex(embs, "vec_id", "embedding", dir, numPlanes = 6))
        overlapAuditBatch(
          Similarity.indexTopKBatch(s, indexDir,
            embs.filter(col("vec_id") < 10), "vec_id", "embedding",
            k = 3, numPlanes = 6, maxHamming = 6),
          Similarity.bruteForceTopKBatch(embs, "vec_id", "embedding",
            embs.filter(col("vec_id") < 10), "vec_id", "embedding", k = 3),
          k = 3)
      },
      Some(auditOracleBatch(3))),

    ("ns_ann_batch_ivf_recall",
      (s: SparkSession, d: String) => {
        val embs = Tables.embeddings(s, d)
        val indexDir = IndexCatalog.ensure(s, "ann-ivf",
          Seq(s"$d/embeddings.parquet"), "k=16,it=2")(dir =>
          graft.operators.IvfIndex.build(embs, "vec_id", "embedding", dir))
        overlapAuditBatch(
          graft.operators.IvfIndex.topKBatch(s, indexDir,
            embs.filter(col("vec_id") < 10), "vec_id", "embedding",
            k = 3, nprobe = 16),
          Similarity.bruteForceTopKBatch(embs, "vec_id", "embedding",
            embs.filter(col("vec_id") < 10), "vec_id", "embedding", k = 3),
          k = 3)
      },
      Some(auditOracleBatch(3))),

    // ---- text analysis: language-ID heuristic ----
    ("ns_text_langid",
      (s: SparkSession, d: String) =>
        TextAnalysis.langId(Tables.documents(s, d), "doc_id", "text").orderBy("doc_id"),
      Some("WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks " +
        "FROM documents) " +
        "SELECT doc_id, round(CAST(len(list_filter(toks, t -> t IN " +
        "('the','a','an','of','and','to','in','is','it','for'))) AS DOUBLE) / len(toks), 4) " +
        "AS en_ratio, " +
        "CASE WHEN CAST(len(list_filter(toks, t -> t IN " +
        "('the','a','an','of','and','to','in','is','it','for'))) AS DOUBLE) / len(toks) >= 0.10 " +
        "THEN 'en' ELSE 'other' END AS lang_pred FROM t ORDER BY doc_id")),

    // ---- text analysis: quality scoring ----
    ("ns_text_quality",
      (s: SparkSession, d: String) =>
        TextAnalysis.quality(Tables.documents(s, d), "doc_id", "text").orderBy("doc_id"),
      Some("WITH t AS (SELECT doc_id, text, string_split_regex(lower(trim(text)), '\\s+') AS toks " +
        "FROM documents), " +
        "m AS (SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars, " +
        "CAST(len(toks) AS INTEGER) AS n_tokens, " +
        "CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) AS atl, " +
        "len(list_filter(toks, x -> x IN ('the','a','an','of','and','to','in','is','it','for'))) AS nst, " +
        "length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS npc " +
        "FROM t) " +
        "SELECT doc_id, n_chars, n_tokens, round(atl, 4) AS avg_token_len, " +
        "round(CAST(nst AS DOUBLE) / n_tokens, 4) AS stopword_ratio, " +
        "round(CAST(npc AS DOUBLE) / n_chars, 4) AS punct_ratio, " +
        qScoreSql("n_chars", "n_tokens", "nst", "npc") +
        " AS quality_score FROM m ORDER BY doc_id")),

    // ---- BPE tokenizer training: ranked merge table learned from the
    // corpus word counts. The iterative argmax IS SQL-expressible after
    // all: [[bpeCtes]] unrolls the 20 rounds as materialized CTEs with
    // the segmentation state carried as a brace-wrapped string (one
    // merge application = one replace()), so the full learned merge
    // sequence — argmaxes, tiebreaks, pair counts — is driver-hashed
    // against DuckDB, upgrading this family from spec-pinned rows-only.
    // BpeSpec additionally pins the distributed loop to the serial
    // reference. ----
    ("ns_text_bpe_vocab",
      (s: SparkSession, d: String) => bpeModel(s, d)._1.orderBy("rank"),
      Some(bpeCtes(BpeMerges) + ", m AS (" +
        (1 to BpeMerges).map(t =>
          s"SELECT ${t - 1} AS rank, l, r, c FROM b$t WHERE c >= 2")
          .mkString(" UNION ALL ") + ") " +
        "SELECT CAST(rank AS INTEGER) AS rank, l AS \"left\", " +
        "r AS \"right\", l || r AS merged, CAST(c AS BIGINT) AS " +
        "pair_count FROM m ORDER BY rank")),

    // ---- BPE encode: tokenize the corpus with the learned dictionary
    // (broadcast word->tokens join; serial-encode-equality in BpeSpec;
    // hashed via [[bpeIdCtes]] — the oracle re-learns the dictionary and
    // re-assembles each document's subword stream in word order) ----
    ("ns_text_bpe_encode",
      (s: SparkSession, d: String) =>
        Bpe.encode(Tables.documents(s, d), "doc_id", "text",
          bpeModel(s, d)._2).orderBy("doc_id"),
      Some(bpeIdCtes(BpeMerges) +
        ", ds AS (SELECT tw.doc_id, tw.wpos, unnest(ws.syms) AS tok, " +
        "generate_subscripts(ws.syms, 1) AS sidx FROM tw " +
        "JOIN wsyms ws ON tw.word = ws.word WHERE length(tw.word) > 0) " +
        "SELECT doc_id, CAST(count(*) AS INTEGER) AS n_bpe_tokens, " +
        "string_agg(tok, ' ' ORDER BY wpos, sidx) AS bpe_text " +
        "FROM ds GROUP BY doc_id ORDER BY doc_id")),

    // ---- BPE symbol vocabulary: dense frequency-sorted token ids (the
    // tokenizer's id assignment) — hashed via [[bpeIdCtes]]'s `vid`
    // relation: the oracle re-learns the merges, re-derives the final
    // per-word symbols, and assigns ids by the same
    // (freq desc, token asc) rule as [[Bpe.symbolVocab]]. ----
    ("ns_text_bpe_symbols",
      (s: SparkSession, d: String) =>
        Bpe.symbolVocab(bpeModel(s, d)._2).orderBy("id"),
      Some(bpeIdCtes(BpeMerges) +
        " SELECT token, id, freq FROM vid ORDER BY id")),

    // ---- BPE encode to ids: the model-input artifact — flattened
    // subword-id stream per document, map-only via the broadcast
    // dictionaries (id-decode equality with the string encode asserted
    // in BpeSpec; hashed via [[bpeIdCtes]]'s word->ids relation). The
    // declared projection joins the id array to a CSV string so the
    // driver's harness can sort/hash the rows (arrays are not
    // pandas-sortable); API consumers get the array form from
    // [[Bpe.encodeIds]] directly. ----
    ("ns_text_bpe_encode_ids",
      (s: SparkSession, d: String) =>
        Bpe.encodeIds(Tables.documents(s, d), "doc_id", "text",
          bpeModel(s, d)._2)
          .select(col("doc_id"), col("n_bpe_tokens"),
            concat_ws(",", transform(col("ids"), _.cast("string")))
              .as("ids_csv"))
          .orderBy("doc_id"),
      Some(bpeIdCtes(BpeMerges) +
        ", ds AS (SELECT tw.doc_id, tw.wpos, unnest(wi.ids) AS id, " +
        "generate_subscripts(wi.ids, 1) AS sidx FROM tw " +
        "JOIN wids wi ON tw.word = wi.word WHERE length(tw.word) > 0) " +
        "SELECT doc_id, CAST(count(*) AS INTEGER) AS n_bpe_tokens, " +
        "string_agg(CAST(id AS VARCHAR), ',' ORDER BY wpos, sidx) " +
        "AS ids_csv FROM ds GROUP BY doc_id ORDER BY doc_id")),

    // ---- text analysis: token counting (whitespace + BPE-ish regex) ----
    ("ns_text_tokens",
      (s: SparkSession, d: String) =>
        TextAnalysis.tokenCounts(Tables.documents(s, d), "doc_id", "text").orderBy("doc_id"),
      Some("SELECT doc_id, " +
        "CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS INTEGER) AS ws_tokens, " +
        "CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS bpe_tokens " +
        "FROM documents ORDER BY doc_id")),

    // ---- text analysis: fingerprints (md5 + md5-lower-64) ----
    ("ns_text_fingerprint",
      (s: SparkSession, d: String) =>
        TextAnalysis.fingerprints(Tables.documents(s, d), "doc_id", "text")
          .drop("fp_rolling") // engine-specific hash; unit-tested, not oracled
          .orderBy("doc_id"),
      Some("WITH n AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm " +
        "FROM documents), " +
        "h AS (SELECT doc_id, md5(norm) AS fp_md5, CAST(md5_number_lower(norm) AS HUGEINT) AS u " +
        "FROM n) " +
        "SELECT doc_id, fp_md5, CAST(CASE WHEN u >= 9223372036854775808 " +
        "THEN u - 18446744073709551616 ELSE u END AS BIGINT) AS fp_md5_64 " +
        "FROM h ORDER BY doc_id")),

    // ---- text analysis: PII redaction (emails/phones -> typed tokens) ----
    ("ns_text_redact_pii",
      (s: SparkSession, d: String) =>
        TextAnalysis.redactPii(Tables.documents(s, d), "doc_id", "text")
          .orderBy("doc_id"),
      Some("SELECT doc_id, " +
        "CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS INTEGER) AS n_emails, " +
        "CAST(len(regexp_extract_all(text, '[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}')) AS INTEGER) AS n_phones, " +
        "regexp_replace(regexp_replace(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g'), " +
        "'[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}', '<PHONE>', 'g') AS redacted " +
        "FROM documents ORDER BY doc_id")),

    // ---- text analysis: repetition signals (Gopher-style filters) ----
    ("ns_text_repetition",
      (s: SparkSession, d: String) =>
        TextAnalysis.repetition(Tables.documents(s, d), "doc_id", "text")
          .orderBy("doc_id"),
      Some("WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t " +
        "FROM documents), " +
        "tokpos AS (SELECT doc_id, len(t) AS n, unnest(t) AS w, " +
        "generate_subscripts(t, 1) AS pos FROM toks), " +
        "bg AS (SELECT doc_id, concat_ws(' ', w, lead(w, 1) OVER win) AS b FROM tokpos " +
        "WINDOW win AS (PARTITION BY doc_id ORDER BY pos) QUALIFY pos <= n - 1), " +
        "cnt AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2), " +
        "agg AS (SELECT doc_id, max(c) AS maxc, CAST(sum(c) AS BIGINT) AS total " +
        "FROM cnt GROUP BY 1) " +
        "SELECT t.doc_id, " +
        "round(1.0 - CAST(len(list_distinct(t.t)) AS DOUBLE) / len(t.t), 4) AS dup_word_frac, " +
        "round(CAST(a.maxc AS DOUBLE) / a.total, 4) AS top_bigram_share " +
        "FROM toks t JOIN agg a ON t.doc_id = a.doc_id ORDER BY t.doc_id")),

    // ---- text analysis: corpus top-k bigram document frequency ----
    ("ns_text_topngrams",
      (s: SparkSession, d: String) =>
        TextAnalysis.topNgrams(Tables.documents(s, d), "doc_id", "text",
          n = 2, k = 20),
      Some("WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t " +
        "FROM documents), " +
        "tokpos AS (SELECT doc_id, len(t) AS n, unnest(t) AS w, " +
        "generate_subscripts(t, 1) AS pos FROM toks), " +
        "sh AS (SELECT DISTINCT doc_id, concat_ws(' ', w, lead(w, 1) OVER win) AS ngram " +
        "FROM tokpos WINDOW win AS (PARTITION BY doc_id ORDER BY pos) QUALIFY pos <= n - 1) " +
        "SELECT ngram, count(*) AS df FROM sh GROUP BY ngram " +
        "ORDER BY df DESC, ngram LIMIT 20")),

    // ---- embeddings: per-group centroid (label-conditioned mean vector).
    // The declared query takes the posexplode + DECIMAL-sum path because
    // that is bit-exactly reproducible cross-engine (order-independent
    // decimal accumulation); the SCALE kernel for the same computation is
    // the native `vector_avg` aggregate (one map-side-combinable buffer per
    // group, no N·dim explode) — equality of the two paths is asserted in
    // VectorAvgSpec/SimilaritySpec, and IvfIndex uses vector_avg. ----
    ("ns_embed_centroids",
      (s: SparkSession, d: String) =>
        Tables.embeddings(s, d)
          .select(col("label"),
            posexplode(col("embedding")).as(Seq("pos", "v")))
          .groupBy("label", "pos")
          .agg(count(lit(1)).as("n"),
            sum(col("v").cast(org.apache.spark.sql.types.DecimalType(28, 12)))
              .as("sd"))
          .select(col("label"), col("pos"),
            round(col("sd").cast("double") / col("n"), 6).as("mean_v"))
          .orderBy("label", "pos"),
      Some("WITH e AS (SELECT label, CAST(i - 1 AS INTEGER) AS pos, " +
        "CAST(embedding[i] AS DECIMAL(28,12)) AS v " +
        "FROM embeddings CROSS JOIN generate_series(1, 64) g(i)) " +
        "SELECT label, pos, round(CAST(sum(v) AS DOUBLE) / count(*), 6) AS mean_v " +
        "FROM e GROUP BY label, pos ORDER BY label, pos")),

    // ---- curation: benchmark decontamination (n-gram overlap vs eval set).
    // Eval set = doc_id % 10 == 0; broadcast-join of eval shingles means the
    // train side never shuffles. ----
    ("ns_curate_decontaminate",
      (s: SparkSession, d: String) =>
        Curation.contaminationReport(Tables.documents(s, d), "doc_id", "text",
          col("doc_id") % 10 === 0, n = 3, minOverlap = 5)
          .orderBy("id"),
      Some(shingleBaseCte +
        ", ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 10 = 0), " +
        "ov AS (SELECT sh.doc_id, count(*) AS n_overlap FROM sh JOIN ev USING (s) " +
        "WHERE sh.doc_id % 10 <> 0 GROUP BY sh.doc_id) " +
        "SELECT d.doc_id AS id, CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlap, " +
        "coalesce(ov.n_overlap, 0) >= 5 AS contaminated " +
        "FROM documents d LEFT JOIN ov ON d.doc_id = ov.doc_id " +
        "WHERE d.doc_id % 10 <> 0 ORDER BY id")),

    // ---- curation: decontamination via the BLOOM-PREFILTERED plan — the
    // eval-too-big-to-broadcast path (filter built by the native bloom_agg,
    // train side probe-prefiltered before its shuffle, exact join on the
    // survivors). Same report, same oracle, as ns_curate_decontaminate:
    // false positives only admit rows into the exact join. ----
    ("ns_curate_decon_bloom",
      (s: SparkSession, d: String) =>
        Curation.contaminationReportScalable(Tables.documents(s, d), "doc_id",
          "text", col("doc_id") % 10 === 0, n = 3, minOverlap = 5)
          .orderBy("id"),
      Some(shingleBaseCte +
        ", ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 10 = 0), " +
        "ov AS (SELECT sh.doc_id, count(*) AS n_overlap FROM sh JOIN ev USING (s) " +
        "WHERE sh.doc_id % 10 <> 0 GROUP BY sh.doc_id) " +
        "SELECT d.doc_id AS id, CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlap, " +
        "coalesce(ov.n_overlap, 0) >= 5 AS contaminated " +
        "FROM documents d LEFT JOIN ov ON d.doc_id = ov.doc_id " +
        "WHERE d.doc_id % 10 <> 0 ORDER BY id")),

    // ---- curation: adaptive per-domain quality floor (keep iff a doc
    // clears its own domain's 20th-percentile quality). Exact interpolated
    // percentile on both engines (Spark `percentile` ≡ DuckDB
    // `quantile_cont`, identical p·(n−1) convention), computed over the
    // engine-agreed ROUNDED score and itself rounded, so keep decisions
    // are bit-deterministic. ----
    ("ns_curate_quality_floor",
      (s: SparkSession, d: String) =>
        Curation.adaptiveQualityFloor(Tables.documents(s, d), "doc_id",
          "text", "source", floorQuantile = 0.2)
          .orderBy("id"),
      Some("WITH t AS (SELECT doc_id, text, string_split_regex(lower(trim(text)), '\\s+') AS toks " +
        "FROM documents), " +
        "m AS (SELECT doc_id, CAST(length(text) AS INTEGER) AS nc, " +
        "CAST(len(toks) AS INTEGER) AS nt, " +
        "len(list_filter(toks, x -> x IN ('the','a','an','of','and','to','in','is','it','for'))) AS nst, " +
        "length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS npc " +
        "FROM t), " +
        "q AS (SELECT doc_id, " + qScoreSql("nc", "nt", "nst", "npc") +
        " AS quality_score FROM m), " +
        "j AS (SELECT d.doc_id AS id, d.source AS domain, q.quality_score " +
        "FROM q JOIN documents d USING (doc_id)), " +
        "th AS (SELECT domain, round(quantile_cont(quality_score, 0.2), 6) AS domain_threshold " +
        "FROM j GROUP BY domain) " +
        "SELECT j.id, j.domain, j.quality_score, th.domain_threshold, " +
        "j.quality_score >= th.domain_threshold AS keep " +
        "FROM j JOIN th USING (domain) ORDER BY id")),

    // ---- curation: the same floor from MERGEABLE KLL sketches — the
    // profile-scale path (and the storable/re-mergeable shard-profile
    // shape). Hash-oracled from the fed FLOORS (round 14): the sketch
    // thresholds publish as the feed and the engine result is built by
    // re-applying the PUBLISHED values (readBack — oracle and engine see
    // byte-identical floors), so DuckDB replays the scoring + join +
    // keep policy; the sketch COMPACTION itself stays engine-side,
    // keep-fraction-audited against the exact operator in CurationSpec. ----
    ("ns_curate_quality_floor_kll",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        OracleFeed.publish("ns_curate_quality_floor_kll", "floors",
          Curation.domainQualityFloorsSketch(docs, "doc_id", "text",
            "source", floorQuantile = 0.2))
        Curation.applyDomainFloor(docs, "doc_id", "text", "source",
          OracleFeed.readBack(s, "ns_curate_quality_floor_kll", "floors"))
          .orderBy("id")
      },
      Some("WITH t AS (SELECT doc_id, text, string_split_regex(lower(trim(text)), '\\s+') AS toks " +
        "FROM documents), " +
        "m AS (SELECT doc_id, CAST(length(text) AS INTEGER) AS nc, " +
        "CAST(len(toks) AS INTEGER) AS nt, " +
        "len(list_filter(toks, x -> x IN ('the','a','an','of','and','to','in','is','it','for'))) AS nst, " +
        "length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS npc " +
        "FROM t), " +
        "q AS (SELECT doc_id, " + qScoreSql("nc", "nt", "nst", "npc") +
        " AS quality_score FROM m), " +
        "j AS (SELECT d.doc_id AS id, d.source AS domain, q.quality_score " +
        "FROM q JOIN documents d USING (doc_id)), " +
        "th AS (SELECT domain, domain_threshold FROM " +
        OracleFeed.sqlPath("ns_curate_quality_floor_kll", "floors") + ") " +
        "SELECT j.id, j.domain, j.quality_score, th.domain_threshold, " +
        "j.quality_score >= th.domain_threshold AS keep " +
        "FROM j JOIN th USING (domain) ORDER BY id")),

    // ---- curation: SEMANTIC decontamination (embedding-cosine vs an eval
    // subset; catches paraphrased leakage the shingle overlap misses). The
    // LSH candidates are exact-verified, so the report equals the all-pairs
    // oracle as long as candidate recall holds at the 0.4 boundary — the
    // same measured-exact regime as ns_dedup_embedding. ----
    ("ns_curate_semantic_decon",
      (s: SparkSession, d: String) =>
        Curation.semanticContaminationReport(Tables.embeddings(s, d), "vec_id",
          "embedding", col("vec_id") % 50 === 0, threshold = 0.4)
          .orderBy("id"),
      Some("WITH ev AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 50 = 0), " +
        "c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 50 <> 0), " +
        "m AS (SELECT c.vec_id AS id, count(*) AS n_matches, " +
        "max(" + dCos("c.embedding", "ev.embedding") + ") AS max_cos " +
        "FROM c JOIN ev ON " + dCos("c.embedding", "ev.embedding") + " >= 0.4 " +
        "GROUP BY c.vec_id) " +
        "SELECT c.vec_id AS id, CAST(coalesce(m.n_matches, 0) AS BIGINT) AS n_matches, " +
        "coalesce(m.max_cos, 0.0) AS max_cos, m.id IS NOT NULL AS contaminated " +
        "FROM c LEFT JOIN m ON c.vec_id = m.id ORDER BY id")),

    // ---- curation: cluster-representative selection — near-dup clusters
    // keep their HIGHEST-QUALITY member (tie: min id), not the min id: the
    // real-world dedup policy ("of these near-identical pages, keep the
    // cleanest"). Composition over the MEMOIZED cluster table
    // (dupClusterTable — the pairs→CC run happens once per input version,
    // not per consumer query) → quality join → per-cluster rank-1 via a
    // cluster-partitioned window (no global window), conditional-agg so
    // the groupBy reuses the window's partitioning. ----
    ("ns_curate_keep_best",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, d)
        val clusters = dupClusterTable(s, d)
        val qual = TextAnalysis.quality(docs, "doc_id", "text")
          .select(col("doc_id").as("id"), col("quality_score"))
        val w = Window.partitionBy("cluster")
          .orderBy(col("quality_score").desc, col("id"))
        clusters.join(qual, "id")
          .withColumn("rn", row_number().over(w))
          .groupBy("cluster")
          .agg(count(lit(1)).as("n_docs"),
            max(when(col("rn") === 1, col("id"))).as("keep_id"),
            max(when(col("rn") === 1, col("quality_score"))).as("keep_quality"))
          .orderBy("cluster")
      },
      Some(shingleCte +
        ", dup AS (SELECT id_a, id_b FROM pairs " +
        "JOIN sizes s1 ON id_a = s1.doc_id JOIN sizes s2 ON id_b = s2.doc_id " +
        "WHERE CAST(inter AS DOUBLE)/(s1.n + s2.n - inter) >= 0.8), " +
        "edges AS (SELECT id_a AS a, id_b AS b FROM dup " +
        "UNION ALL SELECT id_b, id_a FROM dup), " +
        "closure AS (WITH RECURSIVE reach(id, r) AS (" +
        "SELECT a, a FROM (SELECT DISTINCT a FROM edges) " +
        "UNION SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id) " +
        "SELECT id, min(r) AS cluster FROM reach GROUP BY id), " +
        "cl AS (SELECT d.doc_id AS id, coalesce(c.cluster, d.doc_id) AS cluster " +
        "FROM documents d LEFT JOIN closure c ON d.doc_id = c.id), " +
        // quality_score exactly as ns_text_quality computes it (same
        // rounding, so the rank order is the engine-agreed rounded value)
        "qm AS (SELECT t.doc_id, CAST(length(d.text) AS INTEGER) AS nc, " +
        "CAST(len(t.t) AS INTEGER) AS nt, " +
        "len(list_filter(t.t, x -> x IN ('the','a','an','of','and','to','in','is','it','for'))) AS nst, " +
        "length(d.text) - length(regexp_replace(d.text, '[^a-z0-9 ]', '', 'g')) AS npc " +
        "FROM toks t JOIN documents d USING (doc_id)), " +
        "q AS (SELECT doc_id, " + qScoreSql("nc", "nt", "nst", "npc") +
        " AS score FROM qm), " +
        "r AS (SELECT cl.cluster, cl.id, q.score, row_number() OVER (" +
        "PARTITION BY cl.cluster ORDER BY q.score DESC, cl.id) AS rn " +
        "FROM cl JOIN q ON cl.id = q.doc_id) " +
        "SELECT cluster, count(*) AS n_docs, " +
        "max(CASE WHEN rn = 1 THEN id END) AS keep_id, " +
        "max(CASE WHEN rn = 1 THEN score END) AS keep_quality " +
        "FROM r GROUP BY cluster ORDER BY cluster")),

    // ---- curation: deterministic content-addressed train/val/test split ----
    ("ns_curate_hash_split",
      (s: SparkSession, d: String) =>
        Curation.hashSplit(Tables.documents(s, d), "doc_id")
          .orderBy("doc_id"),
      // md5_number_lower is UBIGINT; convert to the signed two's-complement
      // long Spark's md5_lower64 yields before the positive modulo
      Some("WITH h AS (SELECT doc_id, md5_number_lower(CAST(doc_id AS VARCHAR)) AS u " +
        "FROM documents), " +
        "s AS (SELECT doc_id, CAST(CASE WHEN u >= 9223372036854775808 " +
        "THEN u - 18446744073709551616 ELSE u END AS BIGINT) AS h64 FROM h), " +
        "b AS (SELECT doc_id, CAST(((h64 % 100) + 100) % 100 AS INTEGER) AS bucket FROM s) " +
        "SELECT doc_id, bucket, " +
        "CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' " +
        "ELSE 'test' END AS split " +
        "FROM b ORDER BY doc_id")),

    // ---- curation: LEAKAGE-FREE grouped split — near-dup clusters never
    // straddle train/eval (split key = cluster rep's hash, not the
    // doc's); oracle composes the recursive-CTE closure with the
    // hash-split bucket law ----
    ("ns_curate_group_split",
      (s: SparkSession, d: String) =>
        Curation.groupSplit(Tables.documents(s, d), "doc_id",
            dupClusterTable(s, d))
          .orderBy("doc_id"),
      Some(shingleCte +
        ", dup AS (SELECT id_a, id_b FROM pairs " +
        "JOIN sizes s1 ON id_a = s1.doc_id JOIN sizes s2 ON id_b = s2.doc_id " +
        "WHERE CAST(inter AS DOUBLE)/(s1.n + s2.n - inter) >= 0.8), " +
        "edges AS (SELECT id_a AS a, id_b AS b FROM dup " +
        "UNION ALL SELECT id_b, id_a FROM dup), " +
        "closure AS (WITH RECURSIVE reach(id, r) AS (" +
        "SELECT a, a FROM (SELECT DISTINCT a FROM edges) " +
        "UNION SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id) " +
        "SELECT id, min(r) AS cluster FROM reach GROUP BY id), " +
        "lab AS (SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS grp " +
        "FROM documents d LEFT JOIN closure c ON d.doc_id = c.id), " +
        "hx AS (SELECT doc_id, grp, md5_number_lower(CAST(grp AS VARCHAR)) AS u FROM lab), " +
        "sx AS (SELECT doc_id, grp, CAST(CASE WHEN u >= 9223372036854775808 " +
        "THEN u - 18446744073709551616 ELSE u END AS BIGINT) AS h64 FROM hx), " +
        "bx AS (SELECT doc_id, grp, CAST(((h64 % 100) + 100) % 100 AS INTEGER) AS bucket FROM sx) " +
        "SELECT doc_id, grp, bucket, " +
        "CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' " +
        "ELSE 'test' END AS split " +
        "FROM bx ORDER BY doc_id")),

    // ---- curation: funnel report (lang -> quality -> repetition -> dedup) ----
    ("ns_curate_funnel",
      (s: SparkSession, d: String) =>
        Curation.funnelReport(Tables.documents(s, d), "doc_id", "text"),
      Some("WITH t AS (SELECT doc_id, text, " +
        "string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents), " +
        "sig0 AS (SELECT doc_id, text, toks, " +
        "len(list_filter(toks, x -> x IN " +
        "('the','a','an','of','and','to','in','is','it','for'))) AS nst, " +
        "length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS npc " +
        "FROM t), " +
        "sig AS (SELECT doc_id, " +
        "round(CAST(nst AS DOUBLE) / len(toks), 4) AS en_ratio, " +
        qScoreSql("length(text)", "len(toks)", "nst", "npc") + " AS quality_score, " +
        "round(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4) AS dup_word_frac, " +
        "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp " +
        "FROM sig0), " +
        "flags AS (SELECT *, en_ratio >= 0.10 AS p1, " +
        "en_ratio >= 0.10 AND quality_score >= 0.5 AS p2, " +
        "en_ratio >= 0.10 AND quality_score >= 0.5 AND dup_word_frac <= 0.6 AS p3 " +
        "FROM sig) " +
        "SELECT CAST(count(*) AS BIGINT) AS n_total, " +
        "CAST(count(CASE WHEN p1 THEN 1 END) AS BIGINT) AS n_lang, " +
        "CAST(count(CASE WHEN p2 THEN 1 END) AS BIGINT) AS n_quality, " +
        "CAST(count(CASE WHEN p3 THEN 1 END) AS BIGINT) AS n_repetition, " +
        "CAST(count(DISTINCT CASE WHEN p3 THEN fp END) AS BIGINT) AS n_unique " +
        "FROM flags")),

    // ---- curation: token-budget shard packing (distributed prefix sum) ----
    ("ns_curate_pack_shards",
      (s: SparkSession, d: String) =>
        Curation.packTokenShards(Tables.documents(s, d), "doc_id", "n_chars",
          tokensPerShard = 20000L)
          .orderBy("doc_id"),
      Some("WITH h AS (SELECT doc_id, n_chars AS n_tokens, " +
        "md5_number_lower(CAST(doc_id AS VARCHAR)) AS u FROM documents), " +
        "s AS (SELECT doc_id, n_tokens, CAST(CASE WHEN u >= 9223372036854775808 " +
        "THEN u - 18446744073709551616 ELSE u END AS BIGINT) AS h64 FROM h), " +
        "o AS (SELECT doc_id, n_tokens, coalesce(sum(n_tokens) OVER " +
        "(ORDER BY h64, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre " +
        "FROM s) " +
        "SELECT doc_id, n_tokens, CAST(pre // 20000 AS INTEGER) AS shard " +
        "FROM o ORDER BY doc_id")),

    // ---- curation: shard delivery manifest — per shard the doc count,
    // token total, and an order-deterministic content fingerprint (md5
    // over per-doc md5s in the packer's (hash, id) order): the integrity
    // record a training job checks before consuming a shard. ----
    ("ns_curate_shard_manifest",
      (s: SparkSession, d: String) =>
        Curation.shardManifest(Tables.documents(s, d), "doc_id", "text",
          "n_chars", tokensPerShard = 20000L),
      Some("WITH h AS (SELECT doc_id, n_chars AS n_tokens, text, " +
        "md5_number_lower(CAST(doc_id AS VARCHAR)) AS u FROM documents), " +
        "s AS (SELECT doc_id, n_tokens, text, " +
        "CAST(CASE WHEN u >= 9223372036854775808 " +
        "THEN u - 18446744073709551616 ELSE u END AS BIGINT) AS h64 FROM h), " +
        "o AS (SELECT doc_id, n_tokens, text, h64, " +
        "coalesce(sum(n_tokens) OVER (ORDER BY h64, doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre FROM s), " +
        "a AS (SELECT doc_id, n_tokens, text, h64, " +
        "CAST(pre // 20000 AS INTEGER) AS shard FROM o) " +
        "SELECT shard, count(*) AS n_docs, " +
        "CAST(sum(n_tokens) AS BIGINT) AS n_tokens, " +
        "md5(string_agg(md5(text), '' ORDER BY h64, doc_id)) AS fingerprint " +
        "FROM a GROUP BY shard ORDER BY shard")),

    // ---- curation: fixed-length sequence packing (pretraining examples:
    // the corpus token stream in md5-hash doc order carved into 64-token
    // examples, with attention-reset doc boundaries) ----
    ("ns_curate_pack_sequences",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"),
            graft.operators.TextOps.tokens(col("text")).as("toks"))
        Curation.packSequences(docs, "doc_id", "toks", seqLen = 64)
          .orderBy("example_id")
      },
      Some("WITH h AS (SELECT doc_id, " +
        "string_split_regex(lower(trim(text)), '\\s+') AS toks, " +
        "md5_number_lower(CAST(doc_id AS VARCHAR)) AS u FROM documents), " +
        "s AS (SELECT doc_id, toks, CAST(CASE WHEN u >= 9223372036854775808 " +
        "THEN u - 18446744073709551616 ELSE u END AS BIGINT) AS h64 FROM h " +
        "WHERE len(toks) > 0), " +
        "o AS (SELECT doc_id, toks, coalesce(sum(len(toks)) OVER " +
        "(ORDER BY h64, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre " +
        "FROM s), " +
        "e AS (SELECT doc_id, pre, unnest(toks) AS tok, " +
        "generate_subscripts(toks, 1) - 1 AS pos FROM o), " +
        "g AS (SELECT tok, pos, CAST((pre + pos) // 64 AS BIGINT) AS example_id, " +
        "CAST((pre + pos) % 64 AS INTEGER) AS epos FROM e) " +
        "SELECT example_id, CAST(count(*) AS INTEGER) AS n_tokens, " +
        "string_agg(tok, ' ' ORDER BY epos) AS example_text, " +
        "coalesce(string_agg(CASE WHEN pos = 0 THEN CAST(epos AS VARCHAR) END, " +
        "',' ORDER BY epos), '') AS doc_starts, " +
        "CAST(count(*) FILTER (WHERE pos = 0) AS INTEGER) AS n_docs_started " +
        "FROM g GROUP BY example_id ORDER BY example_id")),

    // ---- curation: id-sequence packing — the end-to-end pretraining
    // artifact (corpus -> learned BPE ids -> fixed-length id examples
    // with attention-reset boundaries), now FULLY hashed: the oracle
    // re-learns the tokenizer ([[bpeIdCtes]]), re-encodes every document
    // to its subword-id stream (word -> wids join, flattened in
    // (word pos, sym pos) order), and re-packs with the same
    // hash-ordered carve the `_ws` twin already proved. ----
    // (declared projection joins the id / doc-start arrays to CSV strings
    // so the driver's harness can sort/hash the rows; the operator API
    // keeps returning arrays)
    ("ns_curate_pack_sequence_ids",
      (s: SparkSession, d: String) => {
        val ids = Bpe.encodeIds(Tables.documents(s, d), "doc_id", "text",
          bpeModel(s, d)._2)
        Curation.packSequencesIds(ids, "doc_id", "ids", seqLen = 64)
          .select(col("example_id"), col("n_tokens"),
            concat_ws(",", transform(col("ids"), _.cast("string")))
              .as("ids_csv"),
            concat_ws(",", transform(col("doc_starts"), _.cast("string")))
              .as("doc_starts"),
            col("n_docs_started"))
          .orderBy("example_id")
      },
      Some(bpeIdCtes(BpeMerges) +
        ", di AS (SELECT tw.doc_id, tw.wpos, wi.ids FROM tw " +
        "JOIN wids wi ON tw.word = wi.word WHERE length(tw.word) > 0), " +
        "dstream AS (SELECT doc_id, wpos, unnest(ids) AS id, " +
        "generate_subscripts(ids, 1) AS sidx FROM di), " +
        "dpos AS (SELECT doc_id, id, row_number() OVER " +
        "(PARTITION BY doc_id ORDER BY wpos, sidx) - 1 AS pos " +
        "FROM dstream), " +
        "dtot AS (SELECT doc_id, count(*) AS n FROM dpos GROUP BY doc_id), " +
        "hh AS (SELECT doc_id, n, " +
        "md5_number_lower(CAST(doc_id AS VARCHAR)) AS u FROM dtot), " +
        "ss AS (SELECT doc_id, n, CAST(CASE WHEN u >= " +
        "9223372036854775808 THEN u - 18446744073709551616 ELSE u END " +
        "AS BIGINT) AS h64 FROM hh), " +
        "oo AS (SELECT doc_id, coalesce(sum(n) OVER (ORDER BY h64, " +
        "doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) " +
        "AS pre FROM ss), " +
        "g AS (SELECT dpos.id, dpos.pos, " +
        "CAST((oo.pre + dpos.pos) // 64 AS BIGINT) AS example_id, " +
        "CAST((oo.pre + dpos.pos) % 64 AS INTEGER) AS epos " +
        "FROM dpos JOIN oo ON dpos.doc_id = oo.doc_id) " +
        "SELECT example_id, CAST(count(*) AS INTEGER) AS n_tokens, " +
        "string_agg(CAST(id AS VARCHAR), ',' ORDER BY epos) AS ids_csv, " +
        "coalesce(string_agg(CASE WHEN pos = 0 THEN " +
        "CAST(epos AS VARCHAR) END, ',' ORDER BY epos), '') AS " +
        "doc_starts, CAST(count(*) FILTER (WHERE pos = 0) AS INTEGER) " +
        "AS n_docs_started FROM g GROUP BY example_id " +
        "ORDER BY example_id")),

    // ---- curation: id-sequence packing under a DETERMINISTIC vocabulary —
    // the carve stage gets a full cross-engine hash oracle. Whitespace
    // tokens are densely numbered by (corpus freq desc, token asc) — the
    // same id-assignment rule as [[Bpe.symbolVocab]] but over a vocabulary
    // DuckDB can reproduce — then the id stream is packed by the SAME
    // [[Curation.packSequencesIds]] the learned-BPE chain uses. Green here
    // proves the id carve/reassembly exactly; the BPE twin above keeps its
    // spec-pinned coverage of the learned stage. ----
    ("ns_curate_pack_sequence_ids_ws",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"),
            graft.operators.TextOps.tokens(col("text")).as("toks"))
          .filter(size(col("toks")) > 0)
        // dense ids by (freq desc, token asc): the vocab is the distinct-
        // token table (Zipf-bounded), so the global ranking window is a
        // single bounded partition — same shape as Bpe.symbolVocab
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(desc("freq"), asc("token"))
        val vocab = docs.select(explode(col("toks")).as("token"))
          .groupBy("token").agg(count(lit(1)).as("freq"))
          .select(col("token"),
            (row_number().over(w) - 1).cast("int").as("id"))
        // encode in token order: posexplode -> vocab join (AQE picks
        // broadcast when the vocab is small) -> per-doc reassembly
        val ids = docs
          .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "token")))
          .join(vocab, "token")
          .groupBy("doc_id")
          .agg(array_sort(collect_list(struct(col("pos"), col("id")))).as("a"))
          .select(col("doc_id"), col("a.id").as("ids"))
        Curation.packSequencesIds(ids, "doc_id", "ids", seqLen = 64)
          .select(col("example_id"), col("n_tokens"),
            concat_ws(",", transform(col("ids"), _.cast("string")))
              .as("ids_csv"),
            concat_ws(",", transform(col("doc_starts"), _.cast("string")))
              .as("doc_starts"),
            col("n_docs_started"))
          .orderBy("example_id")
      },
      Some("WITH t AS (SELECT doc_id, " +
        "string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents), " +
        "h AS (SELECT doc_id, toks, md5_number_lower(CAST(doc_id AS VARCHAR)) AS u " +
        "FROM t WHERE len(toks) > 0), " +
        "s AS (SELECT doc_id, toks, CAST(CASE WHEN u >= 9223372036854775808 " +
        "THEN u - 18446744073709551616 ELSE u END AS BIGINT) AS h64 FROM h), " +
        "o AS (SELECT doc_id, toks, coalesce(sum(len(toks)) OVER " +
        "(ORDER BY h64, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre " +
        "FROM s), " +
        "e AS (SELECT doc_id, pre, unnest(toks) AS token, " +
        "generate_subscripts(toks, 1) - 1 AS pos FROM o), " +
        "v AS (SELECT token, count(*) AS freq FROM e GROUP BY 1), " +
        "vid AS (SELECT token, CAST(row_number() OVER " +
        "(ORDER BY freq DESC, token) - 1 AS INTEGER) AS id FROM v), " +
        "g AS (SELECT e.pos, vid.id, CAST((e.pre + e.pos) // 64 AS BIGINT) AS example_id, " +
        "CAST((e.pre + e.pos) % 64 AS INTEGER) AS epos " +
        "FROM e JOIN vid USING (token)) " +
        "SELECT example_id, CAST(count(*) AS INTEGER) AS n_tokens, " +
        "string_agg(CAST(id AS VARCHAR), ',' ORDER BY epos) AS ids_csv, " +
        "coalesce(string_agg(CASE WHEN pos = 0 THEN CAST(epos AS VARCHAR) END, " +
        "',' ORDER BY epos), '') AS doc_starts, " +
        "CAST(count(*) FILTER (WHERE pos = 0) AS INTEGER) AS n_docs_started " +
        "FROM g GROUP BY example_id ORDER BY example_id")),

    // ---- curation: per-domain document cap (no domain dominates) ----
    ("ns_curate_domain_cap",
      (s: SparkSession, d: String) =>
        Curation.domainCap(Tables.documents(s, d), "doc_id", "source", cap = 15)
          .orderBy("doc_id"),
      Some("WITH h AS (SELECT doc_id, source, md5_number_lower(CAST(doc_id AS VARCHAR)) AS u " +
        "FROM documents), " +
        "s AS (SELECT doc_id, source, CAST(CASE WHEN u >= 9223372036854775808 " +
        "THEN u - 18446744073709551616 ELSE u END AS BIGINT) AS h64 FROM h), " +
        "r AS (SELECT doc_id, source, CAST(row_number() OVER (PARTITION BY source " +
        "ORDER BY h64, doc_id) AS INTEGER) AS rn FROM s) " +
        "SELECT doc_id, source, rn, rn <= 15 AS kept FROM r ORDER BY doc_id")),

    // ---- curation: per-domain TOKEN-budget sampling — mixtures are
    // specified in tokens, not documents; each domain admits its
    // md5-order prefix until the running token sum crosses the budget. ----
    ("ns_curate_token_budget",
      (s: SparkSession, d: String) =>
        Curation.tokenBudgetSample(Tables.documents(s, d), "doc_id", "text",
            "source", budgetTokens = 2000L)
          .orderBy("doc_id"),
      Some("WITH t AS (SELECT doc_id, source, " +
        "CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) " +
        "AS n_tokens, md5_number_lower(CAST(doc_id AS VARCHAR)) AS u " +
        "FROM documents), " +
        "s2 AS (SELECT doc_id, source AS domain, n_tokens, " +
        "CAST(CASE WHEN u >= 9223372036854775808 " +
        "THEN u - 18446744073709551616 ELSE u END AS BIGINT) AS h64 FROM t), " +
        "c AS (SELECT doc_id, domain, n_tokens, " +
        "CAST(sum(n_tokens) OVER (PARTITION BY domain ORDER BY h64, doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) " +
        "AS cum_tokens FROM s2) " +
        "SELECT doc_id, domain, n_tokens, cum_tokens, " +
        "cum_tokens <= 2000 AS keep FROM c ORDER BY doc_id")),

    // ---- curation: domain-mixture reweighting (target shares -> sampling
    // weights; shares through exact decimal for cross-engine equality) ----
    ("ns_curate_mix_weights",
      (s: SparkSession, d: String) =>
        Curation.mixWeights(Tables.documents(s, d), "source",
          (0 until 20 by 2).map(i => s"src$i" -> 0.1).toMap)
          .orderBy("source"),
      Some("WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source), " +
        "t AS (SELECT c.source, c.n_docs, sum(c.n_docs) OVER () AS n_total, " +
        "CASE WHEN CAST(substring(c.source, 4) AS INTEGER) % 2 = 0 THEN 0.1 ELSE 0.0 END " +
        "AS target_share FROM c), " +
        "m AS (SELECT source, n_docs, " +
        "round(CAST(n_docs AS DECIMAL(28,12)) / n_total, 12) AS share12, " +
        "CAST(target_share AS DOUBLE) AS target_share FROM t) " +
        "SELECT source, n_docs, " +
        "CAST(round(share12, 6) AS DOUBLE) AS actual_share, target_share, " +
        "CASE WHEN share12 > 0 THEN round(target_share / CAST(share12 AS DOUBLE), 6) " +
        "ELSE 0.0 END AS weight FROM m ORDER BY source")),

    // ---- curation: TEMPERATURE mixture reweighting (q_d ∝ p_d^(1/τ),
    // τ=2 — the multilingual temperature-sampling rule; pow lands in a
    // 12-decimal DECIMAL before the exact normalizing sum, final
    // divisions on doubles derived from those decimals) ----
    ("ns_curate_temperature",
      (s: SparkSession, d: String) =>
        Curation.temperatureWeights(Tables.documents(s, d), "source",
          temperature = 2.0)
          .orderBy("source"),
      Some("WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source), " +
        "t AS (SELECT sum(n_docs) AS n_total FROM c), " +
        "p AS (SELECT source, n_docs, " +
        "CAST(round(CAST(n_docs AS DECIMAL(28,12)) / t.n_total, 12) AS DECIMAL(28,12)) AS share12 " +
        "FROM c, t), " +
        "pa AS (SELECT source, n_docs, share12, " +
        "CAST(round(share12, 6) AS DOUBLE) AS actual_share, " +
        "CAST(round(power(CAST(share12 AS DOUBLE), 0.5), 12) AS DECIMAL(28,12)) AS pa FROM p), " +
        "z AS (SELECT sum(pa) AS z FROM pa) " +
        "SELECT source, n_docs, actual_share, " +
        "round(CAST(pa AS DOUBLE) / CAST(z.z AS DOUBLE), 6) AS sampled_share, " +
        "CASE WHEN share12 > 0 THEN " +
        "round(CAST(pa AS DOUBLE) / CAST(z.z AS DOUBLE) / CAST(share12 AS DOUBLE), 6) " +
        "ELSE 0.0 END AS weight FROM pa, z ORDER BY source")),

    // ---- curation: APPLY the temperature mixture — materialize the
    // resampled corpus (floor(w) copies + a deterministic integer-space
    // Bernoulli for frac(w)); completes the compute-weights operators ----
    ("ns_curate_apply_mixture",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        Curation.applyMixture(docs, "doc_id", "source",
          Curation.temperatureWeights(docs, "source", temperature = 2.0))
          .orderBy("doc_id", "copy")
      },
      Some("WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source), " +
        "t AS (SELECT sum(n_docs) AS n_total FROM c), " +
        "p AS (SELECT source, " +
        "CAST(round(CAST(n_docs AS DECIMAL(28,12)) / t.n_total, 12) AS DECIMAL(28,12)) AS share12 " +
        "FROM c, t), " +
        "pa AS (SELECT source, share12, " +
        "CAST(round(power(CAST(share12 AS DOUBLE), 0.5), 12) AS DECIMAL(28,12)) AS pa FROM p), " +
        "z AS (SELECT sum(pa) AS z FROM pa), " +
        "w AS (SELECT source, CAST(round(round(CASE WHEN share12 > 0 THEN " +
        "CAST(pa AS DOUBLE) / CAST(z.z AS DOUBLE) / CAST(share12 AS DOUBLE) ELSE 0.0 END, 6) " +
        "* 1000000) AS BIGINT) AS wm FROM pa, z), " +
        // md5_number_lower is UBIGINT; convert to the signed two's-complement
        // long Spark's md5_lower64 yields before the positive modulo
        "h AS (SELECT doc_id, source, md5_number_lower(CAST(doc_id AS VARCHAR)) AS u " +
        "FROM documents), " +
        "sg AS (SELECT doc_id, source, CAST(CASE WHEN u >= 9223372036854775808 " +
        "THEN u - 18446744073709551616 ELSE u END AS BIGINT) AS h64 FROM h), " +
        "k AS (SELECT sg.doc_id, sg.source, (w.wm // 1000000) + " +
        "CASE WHEN ((h64 % 1000000) + 1000000) % 1000000 < w.wm % 1000000 " +
        "THEN 1 ELSE 0 END AS copies FROM sg JOIN w USING (source)) " +
        "SELECT doc_id, source, CAST(i AS BIGINT) AS copy " +
        "FROM (SELECT doc_id, source, unnest(generate_series(0, copies - 1)) AS i " +
        "FROM k WHERE copies > 0) ORDER BY doc_id, copy")),

    // ---- curation: DSIR importance weights (Xie et al. 2023) — every raw
    // doc scored by Σ_f ln(p̂_target(f)/p̂_raw(f)) over hashed unigram +
    // bigram features (8192 buckets, add-0.5 smoothing); target = the
    // src0/src1 slice standing in for "the domain we want more of".
    // Deterministic end-to-end (md5 feature hashing, ln rounded 6,
    // position-ordered sum rounded 4), so the whole model hash-matches
    // DuckDB. ----
    ("ns_curate_dsir",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        Curation.dsirLogRatios(docs, "doc_id", "text",
          docs.filter(col("source").isin("src0", "src1")), "text")
          .orderBy("doc_id")
      },
      Some(dsirCte +
        "SELECT d.doc_id, CAST(coalesce(sc.n_features, 0) AS BIGINT) AS n_features, " +
        "coalesce(sc.dsir_logratio, 0.0) AS dsir_logratio " +
        "FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id")),

    // ---- curation: the DSIR resample itself — Gumbel-top-m over the
    // importance weights (sampling ∝ exp(w) without replacement via the
    // Gumbel-max trick), noise content-addressed from the doc id so the
    // draw is reproducible and cross-engine exact ----
    ("ns_curate_dsir_sample",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        Curation.dsirSample(docs, "doc_id", "text",
          docs.filter(col("source").isin("src0", "src1")), "text", m = 100)
          .orderBy(col("gumbel_score").desc, col("doc_id"))
      },
      Some(dsirCte +
        ", wdoc AS (SELECT d.doc_id, CAST(coalesce(sc.n_features, 0) AS BIGINT) AS n_features, " +
        "coalesce(sc.dsir_logratio, 0.0) AS dsir_logratio " +
        "FROM documents d LEFT JOIN sc USING (doc_id)), " +
        "g AS (SELECT doc_id, n_features, dsir_logratio, " +
        "round(dsir_logratio + round(-ln(-ln(" +
        "((((CAST(CASE WHEN gu >= 9223372036854775808 THEN gu - 18446744073709551616 " +
        "ELSE gu END AS BIGINT) % 1000000) + 1000000) % 1000000) + 0.5) / 1000000.0" +
        ")), 6), 6) AS gumbel_score FROM (SELECT wdoc.*, " +
        "md5_number_lower('dsir|' || CAST(doc_id AS VARCHAR)) AS gu FROM wdoc)) " +
        "SELECT doc_id, n_features, dsir_logratio, gumbel_score FROM g " +
        "ORDER BY gumbel_score DESC, doc_id LIMIT 100")),

    // ---- text analysis: overlapping token chunks (RAG/embedding context
    // windows: 32-token chunks at stride 24; zero-shuffle explode) ----
    ("ns_text_chunks",
      (s: SparkSession, d: String) =>
        TextAnalysis.chunk(Tables.documents(s, d), "doc_id", "text",
          chunkSize = 32, overlap = 8)
          .orderBy("doc_id", "chunk_idx"),
      // per-row chunk counts need the LIST generate_series + unnest (the
      // table-function form cannot take a lateral column bound)
      Some("WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t " +
        "FROM documents), " +
        "k AS (SELECT doc_id, t, CAST(len(t) AS INTEGER) AS n, " +
        "CAST(1 + ceil(greatest(len(t) - 32, 0) / 24.0) AS INTEGER) AS nc FROM toks), " +
        "c AS (SELECT doc_id, t, n, unnest(generate_series(0, nc - 1)) AS i FROM k) " +
        "SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx, " +
        "CAST(least(32, n - i*24) AS INTEGER) AS n_tokens, " +
        "array_to_string(t[i*24+1 : i*24+32], ' ') AS chunk_text " +
        "FROM c ORDER BY doc_id, chunk_idx")),

    // ---- text analysis: char-level Shannon entropy (sorted-order sum) ----
    ("ns_text_entropy",
      (s: SparkSession, d: String) =>
        TextAnalysis.charEntropy(Tables.documents(s, d), "doc_id", "text")
          .orderBy("doc_id"),
      // n from the LOWERED string (matches the Spark operator under
      // lowercase-expanding Unicode); chars via per-row split, not a
      // fixed-bound generate_series (no silent 2048-char truncation)
      Some("WITH c AS (SELECT doc_id, lower(text) AS s, length(lower(text)) AS n FROM documents), " +
        "ch AS (SELECT doc_id, n, unnest(string_split(s, '')) AS ch FROM c), " +
        "cnt AS (SELECT doc_id, any_value(n) AS n, ch, count(*) AS k " +
        "FROM ch GROUP BY doc_id, ch), " +
        "e AS (SELECT doc_id, any_value(n) AS n, count(*) AS n_distinct, " +
        "(0.0 - list_sum(list_transform(list(CAST(k AS DOUBLE) / n ORDER BY ch), " +
        "p -> p * ln(p)))) / ln(2.0) AS ent FROM cnt GROUP BY doc_id) " +
        "SELECT doc_id, CAST(n AS INTEGER) AS n_chars, " +
        "CAST(n_distinct AS INTEGER) AS n_distinct_chars, " +
        "round(ent, 4) AS char_entropy_bits FROM e ORDER BY doc_id")),

    // ---- text analysis: duplicated-span coverage (Lee et al. span-level
    // dedup at token-5-gram granularity; see TextAnalysis scaladoc) ----
    ("ns_text_dup_spans",
      (s: SparkSession, d: String) =>
        TextAnalysis.duplicatedSpanStats(Tables.documents(s, d), "doc_id", "text",
          k = 5).orderBy("doc_id"),
      Some("WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t " +
        "FROM documents), " +
        "tok AS (SELECT doc_id, len(t) AS n, unnest(t) AS w, " +
        "generate_subscripts(t, 1) AS pos FROM toks), " +
        "kg AS (SELECT doc_id, n, pos, md5(concat_ws(' ', w, " +
        "lead(w, 1) OVER win, lead(w, 2) OVER win, lead(w, 3) OVER win, " +
        "lead(w, 4) OVER win)) AS fp FROM tok " +
        "WINDOW win AS (PARTITION BY doc_id ORDER BY pos) " +
        "QUALIFY pos <= n - 4), " + // pos 1-based: complete 5-grams only
        "dup AS (SELECT fp FROM kg GROUP BY fp HAVING count(*) >= 2), " +
        "ds AS (SELECT kg.doc_id, kg.pos FROM kg JOIN dup ON kg.fp = dup.fp), " +
        "c1 AS (SELECT doc_id, pos, greatest(pos, coalesce(max(pos + 5) OVER (" +
        "PARTITION BY doc_id ORDER BY pos " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), pos)) AS clip FROM ds), " +
        "cov AS (SELECT doc_id, count(*) AS n_dup_spans, " +
        "sum(greatest(0, pos + 5 - clip)) AS covered FROM c1 GROUP BY doc_id) " +
        "SELECT b.doc_id, CAST(b.n AS BIGINT) AS n_tokens, " +
        "CAST(greatest(0, b.n - 4) AS BIGINT) AS n_spans, " +
        "CAST(coalesce(c.n_dup_spans, 0) AS BIGINT) AS n_dup_spans, " +
        "CASE WHEN b.n = 0 THEN 0.0 ELSE " +
        "round(CAST(coalesce(c.covered, 0) AS DOUBLE) / b.n, 4) END AS dup_token_frac " +
        "FROM (SELECT doc_id, len(t) AS n FROM toks) b " +
        "LEFT JOIN cov c ON b.doc_id = c.doc_id ORDER BY b.doc_id")),

    // ---- duplicated-span REMOVAL: the rewrite counterpart of dup_spans —
    // strip every token under a >=2-occurrence 5-gram span, keep all docs
    // (fully-duplicated ones become empty strings) ----
    ("ns_text_strip_dup_spans",
      (s: SparkSession, d: String) =>
        TextAnalysis.stripDuplicatedSpans(Tables.documents(s, d), "doc_id", "text",
          k = 5).orderBy("doc_id"),
      Some("WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t " +
        "FROM documents), " +
        "tok AS (SELECT doc_id, len(t) AS n, unnest(t) AS w, " +
        "generate_subscripts(t, 1) - 1 AS pos FROM toks), " + // 0-based like posexplode
        "kg AS (SELECT doc_id, pos, md5(concat_ws(' ', w, " +
        "lead(w, 1) OVER win, lead(w, 2) OVER win, lead(w, 3) OVER win, " +
        "lead(w, 4) OVER win)) AS fp FROM tok " +
        "WINDOW win AS (PARTITION BY doc_id ORDER BY pos) " +
        "QUALIFY pos <= n - 5), " +
        "dup AS (SELECT fp FROM kg GROUP BY fp HAVING count(*) >= 2), " +
        "cov AS (SELECT DISTINCT doc_id, pos FROM (" +
        "SELECT kg.doc_id, unnest(generate_series(kg.pos, kg.pos + 4)) AS pos " +
        "FROM kg JOIN dup ON kg.fp = dup.fp)), " +
        "kept AS (SELECT tok.doc_id, count(*) AS kept_tokens, " +
        "string_agg(tok.w, ' ' ORDER BY tok.pos) AS clean_text FROM tok " +
        "ANTI JOIN cov ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos " +
        "GROUP BY tok.doc_id) " +
        "SELECT b.doc_id, CAST(b.n AS BIGINT) AS n_tokens, " +
        "CAST(coalesce(k.kept_tokens, 0) AS BIGINT) AS kept_tokens, " +
        "coalesce(k.clean_text, '') AS clean_text " +
        "FROM (SELECT doc_id, len(t) AS n FROM toks) b " +
        "LEFT JOIN kept k ON b.doc_id = k.doc_id ORDER BY b.doc_id")),

    // ---- text analysis: corpus-fitted bigram LM score (perplexity-style
    // quality filter; position-ordered summation for cross-engine float
    // determinism — see TextAnalysis.bigramLogProb scaladoc) ----
    ("ns_text_bigram_logprob",
      (s: SparkSession, d: String) =>
        TextAnalysis.bigramLogProb(Tables.documents(s, d), "doc_id", "text")
          .orderBy("doc_id"),
      Some("WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t " +
        "FROM documents), " +
        "tokpos AS (SELECT doc_id, unnest(t) AS w, " +
        "generate_subscripts(t, 1) AS pos FROM toks), " +
        "big AS (SELECT doc_id, pos, w, " +
        "lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2 FROM tokpos " +
        "QUALIFY w2 IS NOT NULL), " +
        "c12 AS (SELECT w, w2, count(*) AS c12 FROM big GROUP BY 1, 2), " +
        "c1 AS (SELECT w, count(*) AS c1 FROM big GROUP BY 1), " +
        "v AS (SELECT CAST(count(DISTINCT w) AS DOUBLE) AS v FROM tokpos), " +
        "sc AS (SELECT big.doc_id, big.pos, " +
        "round(ln((c12.c12 + 0.5) / (c1.c1 + 0.5 * v.v)), 6) AS lnp " +
        "FROM big JOIN c12 USING (w, w2) JOIN c1 USING (w) CROSS JOIN v), " +
        "agg AS (SELECT doc_id, count(*) AS n_bigrams, " +
        "round(list_sum(list(lnp ORDER BY pos)) / count(*), 4) AS avg_logprob " +
        "FROM sc GROUP BY doc_id) " +
        "SELECT d.doc_id, CAST(coalesce(a.n_bigrams, 0) AS BIGINT) AS n_bigrams, " +
        "coalesce(a.avg_logprob, 0.0) AS avg_logprob " +
        "FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id")),

    // ---- text retrieval: BM25 top-k for a literal term list ----
    ("ns_text_bm25",
      (s: SparkSession, d: String) =>
        TextAnalysis.bm25TopK(Tables.documents(s, d), "doc_id", "text",
          terms = Seq("join", "stream", "dup"), k = 10),
      Some(bm25OracleSql)),

    // ---- BM25 through the MATERIALIZED inverted index (bucket-pruned
    // postings probe; built once per corpus version via IndexCatalog) —
    // must reproduce the full scan bit-for-bit, so it shares the scan's
    // oracle verbatim. ----
    ("ns_text_bm25_index",
      (s: SparkSession, d: String) => {
        val dir = IndexCatalog.ensure(s, "bm25",
          Seq(s"$d/documents.parquet"), "buckets=64")(staging =>
          graft.operators.Bm25Index.build(Tables.documents(s, d), "doc_id",
            "text", staging))
        graft.operators.Bm25Index.topK(s, dir,
          terms = Seq("join", "stream", "dup"), k = 10)
      },
      Some(bm25OracleSql)),

    // ---- batch retrieval: many BM25 queries in ONE plan (the lexical
    // hard-negative-mining shape) — per-posting additive contributions
    // folded in term order, so the scores match the single-query paths
    // bit-for-bit and the oracle is the per-query SQL UNION ALL'd. ----
    ("ns_text_bm25_batch",
      (s: SparkSession, d: String) => {
        val dir = IndexCatalog.ensure(s, "bm25",
          Seq(s"$d/documents.parquet"), "buckets=64")(staging =>
          graft.operators.Bm25Index.build(Tables.documents(s, d), "doc_id",
            "text", staging))
        graft.operators.Bm25Index.batchTopK(s, dir, bm25BatchQueries, k = 10)
      },
      Some(bm25BatchOracleSql(bm25BatchQueries, 10))),

    // ---- more-like-this: doc-to-doc retrieval for a batch of anchors
    // (query = each anchor's top-3 tf terms, self excluded) — the whole
    // pipeline is relational in DuckDB: anchor term profiles, per-term
    // df, the ti-ordered contribution fold (list_sum ORDER BY ti, the NB
    // position-fold convention), self-exclusion, dense ranks. ----
    ("ns_text_bm25_mlt",
      (s: SparkSession, d: String) => {
        val dir = IndexCatalog.ensure(s, "bm25",
          Seq(s"$d/documents.parquet"), "buckets=64")(staging =>
          graft.operators.Bm25Index.build(Tables.documents(s, d), "doc_id",
            "text", staging))
        graft.operators.Bm25Index.moreLikeThis(s, dir,
          Tables.documents(s, d), "doc_id", "text",
          anchorIds = Seq(11L, 42L, 123L), m = 3, k = 10)
      },
      Some("WITH " + bm25MltCtes +
        " SELECT qid, doc_id, score, rank FROM r WHERE rank <= 10 " +
        "ORDER BY qid, rank")),

    // ---- incremental index maintenance: build on half the corpus, MERGE
    // the other half in (the CDC-append case) — the merged index must be
    // indistinguishable from a full build, so the probe again shares the
    // full-scan oracle verbatim. ----
    ("ns_text_bm25_merge",
      (s: SparkSession, d: String) => {
        val dir = IndexCatalog.ensure(s, "bm25merge",
          Seq(s"$d/documents.parquet"), "buckets=64 halves")(staging => {
          val docs = Tables.documents(s, d)
          graft.operators.Bm25Index.build(
            docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", staging)
          graft.operators.Bm25Index.merge(
            docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", staging)
        })
        graft.operators.Bm25Index.topK(s, dir,
          terms = Seq("join", "stream", "dup"), k = 10)
      },
      Some(bm25OracleSql)),

    // ---- CDC UPDATE path against the materialized index: build on the
    // evens, tombstone-DELETE half of them (doc_id % 4 = 2), merge the
    // odds — the probe must equal the scan over the LIVE corpus with NO
    // physical rewrite (logical delete masks candidates, corrects df,
    // and restates n/avgdl; BM25IndexSpec additionally pins compact and
    // re-merge-after-compact). The mutation sequence runs INSIDE the
    // build lambda so the catalog memoizes the final artifact — probes
    // stay pure and re-runs are idempotent. ----
    ("ns_text_bm25_update",
      (s: SparkSession, d: String) => {
        val dir = IndexCatalog.ensure(s, "bm25upd",
          Seq(s"$d/documents.parquet"), "buckets=64 del=4k+2")(staging => {
          val docs = Tables.documents(s, d)
          graft.operators.Bm25Index.build(
            docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", staging)
          graft.operators.Bm25Index.delete(s, staging,
            docs.filter(col("doc_id") % 4 === 2).select("doc_id"), "doc_id")
          graft.operators.Bm25Index.merge(
            docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", staging)
        })
        graft.operators.Bm25Index.topK(s, dir,
          terms = Seq("join", "stream", "dup"), k = 10)
      },
      Some(bm25OracleSqlOver(
        "(SELECT * FROM documents WHERE doc_id % 4 <> 2)"))),

    // ---- hybrid retrieval: reciprocal-rank fusion of the lexical BM25
    // top-20 and the dense cosine top-20 for one query (terms + doc-0's
    // vector). Contributions 1/(60+rank) are exact IEEE divisions folded
    // in list order, so the fused scores are bit-equal cross-engine. ----
    ("ns_retrieval_rrf",
      (s: SparkSession, d: String) => {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("cos").desc, col("vec_id"))
        val lex = TextAnalysis.bm25TopK(Tables.documents(s, d), "doc_id",
            "text", terms = Seq("join", "stream", "dup"), k = 20)
          .select(lit("q0").as("qid"), col("doc_id").as("id"), col("rank"))
        val dense = Similarity.bruteForceTopK(Tables.embeddings(s, d),
            "vec_id", "embedding", queryId = 0, k = 20)
          .withColumn("rank", row_number().over(w).cast("int"))
          .select(lit("q0").as("qid"), col("vec_id").as("id"), col("rank"))
        Retrieval.rrfFuse(Seq(lex, dense), k0 = 60, topK = 10)
      },
      Some("WITH toks AS (SELECT doc_id, " +
        "string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents), " +
        "d AS (SELECT doc_id, len(t) AS dl, " +
        "CAST(len(list_filter(t, x -> x = 'join')) AS DOUBLE) AS tf0, " +
        "CAST(len(list_filter(t, x -> x = 'stream')) AS DOUBLE) AS tf1, " +
        "CAST(len(list_filter(t, x -> x = 'dup')) AS DOUBLE) AS tf2 FROM toks), " +
        "s AS (SELECT CAST(count(*) AS DOUBLE) AS n, " +
        "CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl, " +
        "CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0, " +
        "CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1, " +
        "CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2 FROM d), " +
        "sc AS (SELECT doc_id, round(" +
        "(ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5)) * (tf0 * 2.2)) / " +
        "(tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl)) + " +
        "(ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) * (tf1 * 2.2)) / " +
        "(tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl)) + " +
        "(ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5)) * (tf2 * 2.2)) / " +
        "(tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 4) AS score FROM d, s), " +
        "lex AS (SELECT doc_id, CAST(row_number() OVER " +
        "(ORDER BY score DESC, doc_id) AS INTEGER) AS rank FROM sc), " +
        "q AS (SELECT embedding AS q_vec FROM embeddings WHERE vec_id = 0), " +
        "dn AS (SELECT vec_id, " +
        dCos("embeddings.embedding", "q.q_vec") + " AS cos " +
        "FROM embeddings, q WHERE vec_id <> 0), " +
        "dr AS (SELECT vec_id, CAST(row_number() OVER " +
        "(ORDER BY cos DESC, vec_id) AS INTEGER) AS rank FROM dn), " +
        "u AS (SELECT doc_id AS id, 0 AS li, 1.0 / (60.0 + rank) AS c " +
        "FROM lex WHERE rank <= 20 " +
        "UNION ALL SELECT vec_id, 1, 1.0 / (60.0 + rank) " +
        "FROM dr WHERE rank <= 20), " +
        "f AS (SELECT id, round(list_sum(list(c ORDER BY li)), 6) AS rrf " +
        "FROM u GROUP BY id), " +
        "rr AS (SELECT 'q0' AS qid, id, rrf, CAST(row_number() OVER " +
        "(ORDER BY rrf DESC, id) AS INTEGER) AS rank FROM f) " +
        "SELECT qid, id, rrf, rank FROM rr WHERE rank <= 10 " +
        "ORDER BY qid, rank")),

    // ---- hybrid retrieval: WEIGHTED linear score fusion (min-max
    // normalized per list/query, 0.7·lexical + 0.3·dense) — the
    // calibrated-scores combiner next to ns_retrieval_rrf's rank-only
    // one. Same lists, full oracle. ----
    ("ns_retrieval_fuse_weighted",
      (s: SparkSession, d: String) => {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("cos").desc, col("vec_id"))
        val lex = TextAnalysis.bm25TopK(Tables.documents(s, d), "doc_id",
            "text", terms = Seq("join", "stream", "dup"), k = 20)
          .select(lit("q0").as("qid"), col("doc_id").as("id"),
            col("score"))
        val dense = Similarity.bruteForceTopK(Tables.embeddings(s, d),
            "vec_id", "embedding", queryId = 0, k = 20)
          .select(lit("q0").as("qid"), col("vec_id").as("id"),
            col("cos").as("score"))
        Retrieval.weightedFuse(Seq(lex, dense), Seq(0.7, 0.3), topK = 10)
      },
      Some("WITH toks AS (SELECT doc_id, " +
        "string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents), " +
        "d AS (SELECT doc_id, len(t) AS dl, " +
        "CAST(len(list_filter(t, x -> x = 'join')) AS DOUBLE) AS tf0, " +
        "CAST(len(list_filter(t, x -> x = 'stream')) AS DOUBLE) AS tf1, " +
        "CAST(len(list_filter(t, x -> x = 'dup')) AS DOUBLE) AS tf2 FROM toks), " +
        "s AS (SELECT CAST(count(*) AS DOUBLE) AS n, " +
        "CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl, " +
        "CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0, " +
        "CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1, " +
        "CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2 FROM d), " +
        "sc AS (SELECT doc_id, round(" +
        "(ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5)) * (tf0 * 2.2)) / " +
        "(tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl)) + " +
        "(ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) * (tf1 * 2.2)) / " +
        "(tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl)) + " +
        "(ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5)) * (tf2 * 2.2)) / " +
        "(tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 4) AS score FROM d, s), " +
        "lex AS (SELECT doc_id AS id, score, CAST(row_number() OVER " +
        "(ORDER BY score DESC, doc_id) AS INTEGER) AS rank FROM sc), " +
        "q AS (SELECT embedding AS q_vec FROM embeddings WHERE vec_id = 0), " +
        "dn AS (SELECT vec_id AS id, " +
        dCos("embeddings.embedding", "q.q_vec") + " AS score " +
        "FROM embeddings, q WHERE vec_id <> 0), " +
        "dr AS (SELECT id, score, CAST(row_number() OVER " +
        "(ORDER BY score DESC, id) AS INTEGER) AS rank FROM dn), " +
        "l0 AS (SELECT id, score FROM lex WHERE rank <= 20), " +
        "l1 AS (SELECT id, score FROM dr WHERE rank <= 20), " +
        "n0 AS (SELECT id, 0 AS li, CASE WHEN max(score) OVER () = " +
        "min(score) OVER () THEN 1.0 ELSE round((score - min(score) OVER ()) " +
        "/ (max(score) OVER () - min(score) OVER ()), 6) END * 0.7 AS c FROM l0), " +
        "n1 AS (SELECT id, 1 AS li, CASE WHEN max(score) OVER () = " +
        "min(score) OVER () THEN 1.0 ELSE round((score - min(score) OVER ()) " +
        "/ (max(score) OVER () - min(score) OVER ()), 6) END * 0.3 AS c FROM l1), " +
        "u AS (SELECT * FROM n0 UNION ALL SELECT * FROM n1), " +
        "f AS (SELECT id, round(list_sum(list(c ORDER BY li)), 6) AS fused " +
        "FROM u GROUP BY id), " +
        "rr AS (SELECT 'q0' AS qid, id, fused, CAST(row_number() OVER " +
        "(ORDER BY fused DESC, id) AS INTEGER) AS rank FROM f) " +
        "SELECT qid, id, fused, rank FROM rr WHERE rank <= 10 " +
        "ORDER BY qid, rank")),

    // ---- retrieval evaluation: dense doc-to-doc retrieval (cosine top-10
    // per anchor) scored against lexical more-like-this qrels (BM25 top-10,
    // grade = 11 - rank) — recall@10, MRR@10, nDCG@10 per anchor. DCG
    // terms round to 6 before the rank-ordered fold; metrics round to 4.
    // ----
    ("ns_retrieval_eval",
      (s: SparkSession, d: String) => {
        val dir = IndexCatalog.ensure(s, "bm25",
          Seq(s"$d/documents.parquet"), "buckets=64")(staging =>
          graft.operators.Bm25Index.build(Tables.documents(s, d), "doc_id",
            "text", staging))
        val qrels = graft.operators.Bm25Index.moreLikeThis(s, dir,
            Tables.documents(s, d), "doc_id", "text",
            anchorIds = Seq(11L, 42L, 123L), m = 3, k = 10)
          .select(col("qid"), col("doc_id").as("id"),
            (lit(11) - col("rank")).as("grade"))
        val embs = Tables.embeddings(s, d)
        val sys = Similarity.bruteForceTopKBatch(embs, "vec_id", "embedding",
            embs.filter(col("vec_id").isin(11L, 42L, 123L)),
            "vec_id", "embedding", k = 10)
          .select(col("qid").cast("string").as("qid"), col("id"), col("rank"))
        Retrieval.evalMetrics(sys, qrels, k = 10)
      },
      Some("WITH " + bm25MltCtes + ", " +
        "rel AS (SELECT qid, doc_id AS id, 11 - rank AS grade FROM r " +
        "WHERE rank <= 10), " +
        "nrel AS (SELECT qid, count(*) AS n_rel FROM rel GROUP BY qid), " +
        "db AS (SELECT CAST(q.vec_id AS VARCHAR) AS qid, e.vec_id AS id, " +
        dCos("e.embedding", "q.embedding") + " AS cos " +
        "FROM embeddings e JOIN embeddings q " +
        "ON q.vec_id IN (11, 42, 123) AND e.vec_id <> q.vec_id), " +
        "sysr AS (SELECT qid, id, CAST(row_number() OVER (PARTITION BY qid " +
        "ORDER BY cos DESC, id) AS INTEGER) AS rank FROM db), " +
        "hits AS (SELECT sy.qid, sy.rank, re.grade FROM sysr sy " +
        "JOIN rel re ON sy.qid = re.qid AND sy.id = re.id " +
        "WHERE sy.rank <= 10), " +
        "hterm AS (SELECT qid, rank, round((pow(2.0, CAST(grade AS DOUBLE)) " +
        "- 1.0) / log2(CAST(rank AS DOUBLE) + 1.0), 6) AS t FROM hits), " +
        "pq AS (SELECT qid, count(*) AS n_hit, min(rank) AS first_rank, " +
        "list_sum(list(t ORDER BY rank)) AS dcg FROM hterm GROUP BY qid), " +
        "ig AS (SELECT qid, grade, row_number() OVER (PARTITION BY qid " +
        "ORDER BY grade DESC, id) AS rn FROM rel), " +
        "iterm AS (SELECT qid, rn, round((pow(2.0, CAST(grade AS DOUBLE)) " +
        "- 1.0) / log2(CAST(rn AS DOUBLE) + 1.0), 6) AS t FROM ig " +
        "WHERE rn <= 10), " +
        "ic AS (SELECT qid, list_sum(list(t ORDER BY rn)) AS idcg " +
        "FROM iterm GROUP BY qid) " +
        "SELECT n.qid, CAST(n.n_rel AS BIGINT) AS n_rel, " +
        "round(CAST(coalesce(p.n_hit, 0) AS DOUBLE) / n.n_rel, 4) " +
        "AS recall_at_k, " +
        "round(coalesce(1.0 / p.first_rank, 0.0), 4) AS mrr, " +
        "round(coalesce(p.dcg / i.idcg, 0.0), 4) AS ndcg_at_k " +
        "FROM nrel n LEFT JOIN pq p USING (qid) LEFT JOIN ic i USING (qid) " +
        "ORDER BY n.qid")),

    // ---- SFT: DPO/RLHF preference pairs — per source domain, the
    // highest- vs lowest-quality document (deterministic ties, margin
    // floor). Scores are the exact-int64 quality composite, so the pair
    // selection and margin are bit-deterministic. ----
    ("ns_sft_pref_pairs",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        // source carried on the quality scan (r18) — no id self-join
        val scored = TextAnalysis.quality(docs, "doc_id", "text",
            extra = Seq("source" -> col("source")))
          .select(col("doc_id"), col("source"), col("quality_score"))
        Sft.preferencePairs(scored, "source", "doc_id", "quality_score",
            minMargin = 0.05)
          .orderBy("prompt")
      },
      Some("WITH t AS (SELECT doc_id, source, " +
        "string_split_regex(lower(trim(text)), '\\s+') AS toks, text " +
        "FROM documents), " +
        "m AS (SELECT doc_id, source, CAST(length(text) AS INTEGER) AS nc, " +
        "CAST(len(toks) AS INTEGER) AS nt, " +
        "len(list_filter(toks, x -> x IN ('the','a','an','of','and','to','in','is','it','for'))) AS nst, " +
        "length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS npc " +
        "FROM t), " +
        "q AS (SELECT doc_id, source, " + qScoreSql("nc", "nt", "nst", "npc") +
        " AS score FROM m), " +
        "c AS (SELECT source, doc_id, score, " +
        "row_number() OVER (PARTITION BY source ORDER BY score DESC, doc_id) AS rc, " +
        "row_number() OVER (PARTITION BY source ORDER BY score ASC, doc_id) AS rr, " +
        "count(*) OVER (PARTITION BY source) AS n_cands FROM q), " +
        "p AS (SELECT ch.source AS prompt, CAST(ch.n_cands AS BIGINT) AS n_cands, " +
        "ch.doc_id AS chosen_id, ch.score AS chosen_score, " +
        "rj.doc_id AS rejected_id, rj.score AS rejected_score, " +
        "round(ch.score - rj.score, 6) AS margin " +
        "FROM (SELECT * FROM c WHERE rc = 1) ch " +
        "JOIN (SELECT * FROM c WHERE rr = 1) rj USING (source)) " +
        "SELECT prompt, n_cands, chosen_id, chosen_score, rejected_id, " +
        "rejected_score, margin FROM p " +
        "WHERE n_cands >= 2 AND chosen_id <> rejected_id AND margin >= 0.05 " +
        "ORDER BY prompt")),

    // ---- SFT: completion-loss-masked id packing — the ws-vocab packer
    // (full oracle, same corpus/order as ns_curate_pack_sequence_ids_ws)
    // with per-doc prompt/completion masks riding the carve: prompt =
    // first least(8, ceil(n/2)) tokens of each doc. ----
    ("ns_sft_masked_pack",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"),
            graft.operators.TextOps.tokens(col("text")).as("toks"))
          .filter(size(col("toks")) > 0)
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(desc("freq"), asc("token"))
        val vocab = docs.select(explode(col("toks")).as("token"))
          .groupBy("token").agg(count(lit(1)).as("freq"))
          .select(col("token"),
            (row_number().over(w) - 1).cast("int").as("id"))
        val ids = docs
          .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "token")))
          .join(vocab, "token")
          .groupBy("doc_id")
          .agg(array_sort(collect_list(struct(col("pos"), col("id")))).as("a"))
          .select(col("doc_id"), col("a.id").as("ids"),
            least(lit(8), ((size(col("a.id")) + 1) / 2).cast("int"))
              .as("prompt_len"))
        Sft.maskedPack(ids, "doc_id", "ids", "prompt_len", seqLen = 64)
          .select(col("example_id"), col("n_tokens"),
            concat_ws(",", transform(col("ids"), _.cast("string")))
              .as("ids_csv"),
            concat_ws(",", transform(col("mask"), _.cast("string")))
              .as("mask_csv"),
            col("n_loss_tokens"),
            concat_ws(",", transform(col("doc_starts"), _.cast("string")))
              .as("doc_starts"),
            col("n_docs_started"))
          .orderBy("example_id")
      },
      Some("WITH t AS (SELECT doc_id, " +
        "string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents), " +
        "h AS (SELECT doc_id, toks, md5_number_lower(CAST(doc_id AS VARCHAR)) AS u " +
        "FROM t WHERE len(toks) > 0), " +
        "s AS (SELECT doc_id, toks, CAST(CASE WHEN u >= 9223372036854775808 " +
        "THEN u - 18446744073709551616 ELSE u END AS BIGINT) AS h64 FROM h), " +
        "o AS (SELECT doc_id, toks, coalesce(sum(len(toks)) OVER " +
        "(ORDER BY h64, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre " +
        "FROM s), " +
        "e AS (SELECT doc_id, pre, len(toks) AS nt, unnest(toks) AS token, " +
        "generate_subscripts(toks, 1) - 1 AS pos FROM o), " +
        "v AS (SELECT token, count(*) AS freq FROM e GROUP BY 1), " +
        "vid AS (SELECT token, CAST(row_number() OVER " +
        "(ORDER BY freq DESC, token) - 1 AS INTEGER) AS id FROM v), " +
        "g AS (SELECT e.pos, vid.id, " +
        "CASE WHEN e.pos < least(8, (e.nt + 1) // 2) THEN 0 ELSE 1 END AS mask, " +
        "CAST((e.pre + e.pos) // 64 AS BIGINT) AS example_id, " +
        "CAST((e.pre + e.pos) % 64 AS INTEGER) AS epos " +
        "FROM e JOIN vid USING (token)) " +
        "SELECT example_id, CAST(count(*) AS INTEGER) AS n_tokens, " +
        "string_agg(CAST(id AS VARCHAR), ',' ORDER BY epos) AS ids_csv, " +
        "string_agg(CAST(mask AS VARCHAR), ',' ORDER BY epos) AS mask_csv, " +
        "CAST(sum(mask) AS INTEGER) AS n_loss_tokens, " +
        "coalesce(string_agg(CASE WHEN pos = 0 THEN CAST(epos AS VARCHAR) END, " +
        "',' ORDER BY epos), '') AS doc_starts, " +
        "CAST(count(*) FILTER (WHERE pos = 0) AS INTEGER) AS n_docs_started " +
        "FROM g GROUP BY example_id ORDER BY example_id")),

    // ---- SFT: chat-template rendering with assistant loss spans — each
    // document becomes a conversation (12-token turns, roles alternate
    // user/assistant); spans are integer prefix-sum arithmetic, so the
    // rendered text AND the trainable character ranges hash exactly. ----
    ("ns_sft_render_chat",
      (s: SparkSession, d: String) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"),
            posexplode(graft.operators.TextOps.tokens(col("text")))
              .as(Seq("pos", "tok")))
        val turns = toks
          .withColumn("idx", (col("pos") / 12).cast("int"))
          .groupBy("doc_id", "idx")
          .agg(concat_ws(" ", transform(
            array_sort(collect_list(struct(col("pos"), col("tok")))),
            s0 => s0.getField("tok"))).as("content"))
          .withColumn("role",
            when(pmod(col("idx"), lit(2)) === 0, "user").otherwise("assistant"))
        Sft.renderChat(turns, "doc_id", "idx", "role", "content")
          .orderBy("conv_id")
      },
      Some("WITH t AS (SELECT doc_id, " +
        "string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents), " +
        "e AS (SELECT doc_id, unnest(toks) AS tok, " +
        "generate_subscripts(toks, 1) - 1 AS pos FROM t), " +
        "tu AS (SELECT doc_id, CAST(pos // 12 AS INTEGER) AS idx, " +
        "string_agg(tok, ' ' ORDER BY pos) AS content FROM e GROUP BY 1, 2), " +
        "r AS (SELECT doc_id, idx, CASE WHEN idx % 2 = 0 THEN 'user' " +
        "ELSE 'assistant' END AS role, content FROM tu), " +
        "seg AS (SELECT doc_id, idx, role, length(role) AS role_len, " +
        "'<|' || role || '|>' || content AS seg, " +
        "length('<|' || role || '|>' || content) AS seg_len FROM r), " +
        "st AS (SELECT *, coalesce(sum(seg_len) OVER (PARTITION BY doc_id " +
        "ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) " +
        "+ (row_number() OVER (PARTITION BY doc_id ORDER BY idx) - 1) AS start " +
        "FROM seg) " +
        "SELECT doc_id AS conv_id, CAST(count(*) AS INTEGER) AS n_turns, " +
        "string_agg(seg, chr(10) ORDER BY idx) AS text, " +
        "coalesce(string_agg(CASE WHEN role = 'assistant' THEN " +
        "CAST(start + role_len + 4 AS VARCHAR) || ':' || " +
        "CAST(start + seg_len AS VARCHAR) END, ';' ORDER BY idx), '') " +
        "AS assistant_spans " +
        "FROM st GROUP BY doc_id ORDER BY conv_id")),

    // ---- KNN graph: every vector's top-5 neighbors, cluster-scoped
    // (IVF centroids, nprobe=2) — approximate by design, so rows-only;
    // the recall audit below is the driver-visible quality gate. ----
    // Hash-oracled from the fed IVF centroids (round 14): KnnGraph.build
    // is a pure function of (embeddings, centroids) under the oracle laws
    // (rounded-3 cosines, centroid ties to the smaller cid, neighbor ties
    // to the smaller id), so DuckDB replays the WHOLE graph — multi-probe
    // assignment, shared-cluster candidacy, undirected scoring, per-node
    // top-k — from the one artifact it cannot train.
    ("ns_ann_knn_graph",
      (s: SparkSession, d: String) => {
        val embs = Tables.embeddings(s, d)
        val dir = IndexCatalog.ensure(s, "ann-ivf",
          Seq(s"$d/embeddings.parquet"), "k=16,it=2")(
          p => graft.operators.IvfIndex.build(embs, "vec_id", "embedding", p))
        OracleFeed.publish("ns_ann_knn_graph", "centroids",
          s.read.parquet(s"$dir/centroids"))
        graft.operators.KnnGraph.build(embs, "vec_id", "embedding",
            s.read.parquet(s"$dir/centroids"), k = 5, nprobe = 4)
          .orderBy("id", "rank")
      },
      Some("WITH cent AS (SELECT cid, cvec FROM " +
        OracleFeed.sqlPath("ns_ann_knn_graph", "centroids") + "), " +
        "taken AS (SELECT id, cid FROM (SELECT e.vec_id AS id, c.cid, " +
        "row_number() OVER (PARTITION BY e.vec_id ORDER BY " +
        dCos("e.embedding", "c.cvec") + " DESC, c.cid) AS r " +
        "FROM embeddings e CROSS JOIN cent c) WHERE r <= 4), " +
        "pairs AS (SELECT DISTINCT x.id AS a, y.id AS b FROM taken x " +
        "JOIN taken y USING (cid) WHERE x.id < y.id), " +
        "scored AS (SELECT a, b, " + dCos("ea.embedding", "eb.embedding") +
        " AS cos FROM pairs JOIN embeddings ea ON ea.vec_id = a " +
        "JOIN embeddings eb ON eb.vec_id = b), " +
        "directed AS (SELECT a AS id, b AS nbr, cos FROM scored " +
        "UNION ALL SELECT b, a, cos FROM scored), " +
        "r AS (SELECT id, nbr, cos, CAST(row_number() OVER (" +
        "PARTITION BY id ORDER BY cos DESC, nbr) AS INTEGER) AS rank " +
        "FROM directed) " +
        "SELECT id, nbr, cos, rank FROM r WHERE rank <= 5 " +
        "ORDER BY id, rank")),

    // ---- KNN-graph recall audit (constant oracle): the graph must
    // recover >= 80% of the exact brute-force top-5 edges over a fixed
    // 5-query sample — the exhaustive-probe recall-audit pattern. ----
    ("ns_ann_knn_recall",
      (s: SparkSession, d: String) => {
        val embs = Tables.embeddings(s, d)
        val dir = IndexCatalog.ensure(s, "ann-ivf",
          Seq(s"$d/embeddings.parquet"), "k=16,it=2")(
          p => graft.operators.IvfIndex.build(embs, "vec_id", "embedding", p))
        val sample = Seq(0L, 11L, 42L, 77L, 123L)
        // nprobe=4 measured at 23-24/25 exact-edge recall across
        // sf0.001/0.01/0.1 (nprobe=2: 12-16, nprobe=3: 20-22) — the IVF
        // boundary trade, bought back with probes
        val graph = graft.operators.KnnGraph.build(embs, "vec_id",
            "embedding", s.read.parquet(s"$dir/centroids"), k = 5,
            nprobe = 4)
          .filter(col("id").isin(sample.map(Long.box): _*))
          .select("id", "nbr")
        val exact = Similarity.bruteForceTopKBatch(embs, "vec_id", "embedding",
            embs.filter(col("vec_id").isin(sample.map(Long.box): _*)),
            "vec_id", "embedding", k = 5)
          .select(col("qid").cast("long").as("id"), col("id").as("nbr"))
        graph.join(exact, Seq("id", "nbr"))
          .agg(count(lit(1)).as("n_hits"))
          .select(lit("knn_recall").as("audit"),
            lit(5).as("n_queries"),
            (col("n_hits") >= 20).as("recall_ok"))
      },
      Some("SELECT 'knn_recall' AS audit, 5 AS n_queries, true AS recall_ok")),

    // ---- curation: WEIGHTED stratified sample (Efraimidis–Spirakis
    // reservoir, inclusion ∝ n_chars, content-addressed draws) ----
    ("ns_curate_weighted_sample",
      (s: SparkSession, d: String) =>
        Curation.weightedSample(Tables.documents(s, d), "doc_id", "source",
            "n_chars", perStratum = 5)
          .orderBy("doc_id"),
      Some("WITH h AS (SELECT doc_id, source, n_chars, " +
        "md5_number_lower('ws|' || CAST(doc_id AS VARCHAR)) AS gu " +
        "FROM documents WHERE n_chars > 0), " +
        "k AS (SELECT doc_id, source, n_chars, " +
        "round(ln(((((CAST(CASE WHEN gu >= 9223372036854775808 " +
        "THEN gu - 18446744073709551616 ELSE gu END AS BIGINT) % 1000000) " +
        "+ 1000000) % 1000000) + 0.5) / 1000000.0) " +
        "/ CAST(n_chars AS DOUBLE), 6) + 0.0 AS es_key FROM h), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY source " +
        "ORDER BY es_key DESC, doc_id) AS rn FROM k) " +
        "SELECT doc_id, source, n_chars, es_key FROM r WHERE rn <= 5 " +
        "ORDER BY doc_id")),

    // ---- embeddings: per-vector hygiene stats (norms, ranges, unit flag) ----
    ("ns_embed_stats",
      (s: SparkSession, d: String) =>
        Similarity.embedStats(Tables.embeddings(s, d), "vec_id", "embedding")
          .orderBy("vec_id"),
      Some("WITH m AS (SELECT vec_id, len(embedding) AS dims, " +
        "sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm, " +
        "CAST(list_min(embedding) AS DOUBLE) AS mn, " +
        "CAST(list_max(embedding) AS DOUBLE) AS mx FROM embeddings) " +
        "SELECT vec_id, CAST(dims AS INTEGER) AS dims, round(nrm, 4) AS l2_norm, " +
        "round(mn, 4) AS min_v, round(mx, 4) AS max_v, " +
        "abs(nrm - 1.0) <= 0.01 AS is_unit FROM m ORDER BY vec_id")),

    // ---- ZCA whitening of the embedding column (one moments pass +
    // driver Jacobi + zero-shuffle transform). Rows-only by design (the
    // whitened values depend on the eigenbasis, which has no SQL form);
    // the audit below proves the transform did what whitening means. ----
    // Hash-oracled from the fed FITTED transform (round 14): (mean, W)
    // publish as one feed row and DuckDB replays the distributed
    // application — W·(v−μ) per vector (sequential double dot, bit-exact
    // to MatVecCenter) and the norm fold — so the zero-shuffle transform
    // map is cross-engine-checked; the FIT (moments + driver Jacobi)
    // stays engine-side, covered by ns_embed_whiten_audit's spectrum
    // identity.
    ("ns_embed_whiten",
      (s: SparkSession, d: String) => {
        val embs = Tables.embeddings(s, d)
        val (mean, w) = Similarity.whitenParams(embs, "embedding")
        import s.implicits._
        OracleFeed.publish("ns_embed_whiten", "transform",
          Seq((w.toSeq, mean.toSeq)).toDF("w", "mean"))
        Similarity.whitenWith(embs, "vec_id", "embedding", mean, w)
          .select(col("vec_id"), size(col("w")).as("dims"),
            round(sqrt(aggregate(col("w"), lit(0.0),
              (acc, x) => acc + x * x)), 4).as("w_norm"))
          .orderBy("vec_id")
      },
      Some("WITH wm AS (SELECT w, mean FROM " +
        OracleFeed.sqlPath("ns_embed_whiten", "transform") + "), " +
        "x AS (SELECT e.vec_id, list_transform(range(1, 65), i -> " +
        "list_sum(list_transform(e.embedding, (vj, j) -> " +
        "wm.w[(i-1)*64 + j] * (CAST(vj AS DOUBLE) - wm.mean[j])))) AS wv " +
        "FROM embeddings e CROSS JOIN wm) " +
        "SELECT vec_id, CAST(len(wv) AS INTEGER) AS dims, " +
        "round(sqrt(list_sum(list_transform(wv, y -> y * y))), 4) " +
        "AS w_norm FROM x ORDER BY vec_id")),

    // Whitening audit: whitened mean is 0; the whitened covariance's
    // EIGENVALUES equal lambda/(lambda+eps) of the original spectrum
    // (the spectrum comparison is exact even when unit-norm inputs make
    // the covariance rank-deficient — a flat cov-equals-identity check
    // would be wrong there); shape preserved; rerun identical.
    ("ns_embed_whiten_audit",
      (s: SparkSession, d: String) => {
        import graft.functions.{vector_moments, Jacobi}
        val eps = 1e-5
        val embs = Tables.embeddings(s, d)
        val w = Similarity.whiten(embs, "vec_id", "embedding", eps).cache()
        def moments(df: DataFrame, c: String) = {
          val r = df.agg(vector_moments(col(c)).as("m"))
            .select("m.n", "m.mean", "m.m2").head()
          (r.getLong(0), r.getSeq[Double](1).toArray,
            r.getSeq[Double](2).toArray)
        }
        def covEig(mean: Array[Double], m2: Array[Double]): Array[Double] = {
          val dd = mean.length
          Jacobi.eigen(Array.tabulate(dd * dd)(i =>
            m2(i) - mean(i / dd) * mean(i % dd)), dd)._1.sorted
        }
        val (n0, mean0, m20) = moments(embs, "embedding")
        val (n1, mean1, m21) = moments(w, "w")
        val expected = covEig(mean0, m20)
          .map(l => math.max(l, 0.0) / (math.max(l, 0.0) + eps)).sorted
        val got = covEig(mean1, m21)
        val slice = w.filter(col("vec_id") < 100).orderBy("vec_id")
          .collect().map(_.toSeq).toSeq
        val rerun = Similarity.whiten(embs, "vec_id", "embedding", eps)
          .filter(col("vec_id") < 100).orderBy("vec_id")
          .collect().map(_.toSeq).toSeq
        w.unpersist()
        auditDf(s, Seq(
          "whitened_mean_zero" -> mean1.forall(x => math.abs(x) < 1e-6),
          "whitened_spectrum_matches" -> (got.length == expected.length &&
            got.zip(expected).forall { case (a, b) => math.abs(a - b) < 1e-5 }),
          "shape_preserved" -> (n0 == n1 && mean1.length == mean0.length),
          "rerun_identical" -> (slice == rerun)))
      },
      Some(auditOracleSql(Seq("whitened_mean_zero",
        "whitened_spectrum_matches", "shape_preserved", "rerun_identical")))),

    // ---- curation: stratified deterministic sample (<=20 docs per lang) ----
    ("ns_curate_stratified_sample",
      (s: SparkSession, d: String) =>
        Curation.stratifiedSample(Tables.documents(s, d), "doc_id", "lang",
          perStratum = 20)
          .orderBy("lang", "rn"),
      // same unsigned->signed conversion: the rank order must be the order
      // of the SIGNED hash, matching Spark
      Some("WITH h AS (SELECT doc_id, lang, md5_number_lower(CAST(doc_id AS VARCHAR)) AS u " +
        "FROM documents), " +
        "s AS (SELECT doc_id, lang, CAST(CASE WHEN u >= 9223372036854775808 " +
        "THEN u - 18446744073709551616 ELSE u END AS BIGINT) AS h64 FROM h), " +
        "r AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang " +
        "ORDER BY h64, doc_id) AS rn FROM s) " +
        "SELECT doc_id, lang, CAST(rn AS INTEGER) AS rn FROM r WHERE rn <= 20 " +
        "ORDER BY lang, rn")),

    // ---- multimodal plumbing: frame slicing + per-frame fingerprints.
    // Spark slices the BINARY payload; DuckDB has no BLOB substring, so the
    // oracle slices the VARCHAR — byte-identical here because the corpus is
    // ASCII (UTF-8 bytes == chars). ----
    ("mm_frame_slices",
      (s: SparkSession, d: String) =>
        graft.operators.Multimodal.frameSlices(
          Tables.documents(s, d).select(col("doc_id"),
            encode(col("text"), "UTF-8").as("content")),
          "doc_id", "content", frames = 5)
          .orderBy("doc_id", "frame_no"),
      Some("WITH f AS (SELECT doc_id, text, length(text) // 5 AS flen, " +
        "CAST(i AS INTEGER) AS frame_no FROM documents " +
        "CROSS JOIN generate_series(0, 4) g(i)) " +
        "SELECT doc_id, frame_no, CAST(frame_no * flen AS BIGINT) AS off, " +
        "CAST(flen AS BIGINT) AS frame_len, " +
        "md5(substring(text, frame_no * flen + 1, flen)) AS frame_md5 " +
        "FROM f ORDER BY doc_id, frame_no")),

    // ---- multimodal metadata: REAL container-header parsing. Each doc_id
    // deterministically constructs a valid PNG/JPEG/BMP/GIF header (the
    // dimensions are doc_id arithmetic), media_header parses the bytes
    // back, and the oracle emits the same fields from the arithmetic
    // alone — so any magic-byte or endianness bug in the parser breaks
    // the hash match. Pixel decode (the part that needs codec libraries
    // this environment doesn't ship) is out of scope; see Multimodal. ----
    ("mm_binary_meta",
      (s: SparkSession, d: String) => {
        import graft.operators.Multimodal
        val w = (lit(16) + col("doc_id") % 640).cast("int")
        val h = (lit(16) + col("doc_id") % 480).cast("int")
        def hex2(c: Column) = lpad(hex(c % 256), 2, "0")
        def be16(c: Column) = lpad(hex(c), 4, "0")
        def be32(c: Column) = lpad(hex(c), 8, "0")
        def le16(c: Column) = concat(hex2(c), hex2(floor(c / 256).cast("int")))
        val hdrHex = when(col("doc_id") % 4 === 0, // PNG: sig + IHDR, BE u32 dims
            concat(lit("89504E470D0A1A0A0000000D49484452"), be32(w), be32(h)))
          .when(col("doc_id") % 4 === 1, // JPEG: SOI, APP0, SOF0 with BE u16 dims
            concat(lit("FFD8FFE000040000FFC0000B08"), be16(h), be16(w), lit("01011100")))
          .when(col("doc_id") % 4 === 2, // BMP: "BM" + 16 filler, LE i32 dims
            concat(lit("424D" + "00" * 16), le16(w), lit("0000"), le16(h), lit("0000")))
          .otherwise( // GIF89a: LE u16 dims
            concat(lit("474946383961"), le16(w), le16(h)))
        Tables.documents(s, d)
          .select(col("doc_id"), unhex(hdrHex).as("content"))
          .select(col("doc_id") +: Multimodal.headerMeta(col("content")): _*)
          .orderBy("doc_id")
      },
      Some("SELECT doc_id, " +
        "CAST(CASE doc_id % 4 WHEN 0 THEN 24 WHEN 1 THEN 21 WHEN 2 THEN 26 " +
        "ELSE 10 END AS BIGINT) AS n_bytes, " +
        "CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'bmp' " +
        "ELSE 'gif' END AS format, " +
        "CAST(16 + doc_id % 640 AS INTEGER) AS width, " +
        "CAST(16 + doc_id % 480 AS INTEGER) AS height " +
        "FROM documents ORDER BY doc_id")),

    // ---- supervised quality/domain classifiers (operators/Classifier):
    // hashed-n-gram Naive Bayes — closed-form counts, so TRAIN and SCORE
    // are both SQL-expressible and the whole train→predict pipeline
    // hash-matches DuckDB end-to-end. Train split = the hashSplit
    // convention (md5 bucket < 80); labels = lang. ----
    ("ns_quality_nb_predict",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val b = Curation.hashBucket(col("doc_id"), 100)
        val (model, priors) = nbModel(s, d)
        Classifier.nbScore(docs.filter(b >= 80), "doc_id", "text",
            model, priors, 4096)
          .join(docs.select("doc_id", "lang"), "doc_id")
          .select("doc_id", "lang", "predicted", "score")
          .orderBy("doc_id")
      },
      Some(nbCte +
        "SELECT p.doc_id, d.lang, p.predicted, p.score " +
        "FROM pred p JOIN documents d USING (doc_id) ORDER BY doc_id")),

    ("ns_quality_nb_eval",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val b = Curation.hashBucket(col("doc_id"), 100)
        val (model, priors) = nbModel(s, d)
        Classifier.nbScore(docs.filter(b >= 80), "doc_id", "text",
            model, priors, 4096)
          .join(docs.select("doc_id", "lang"), "doc_id")
          .groupBy("lang", "predicted").agg(count(lit(1)).as("n"))
          .orderBy("lang", "predicted")
      },
      Some(nbCte +
        "SELECT d.lang, p.predicted, count(*) AS n " +
        "FROM pred p JOIN documents d USING (doc_id) " +
        "GROUP BY 1, 2 ORDER BY 1, 2")),

    // ---- per-class precision/recall/F1 of the NB language predictor on
    // the held-out slice — the multi-class eval row the confusion matrix
    // (nb_eval) and kappa bracket; ratios on the HALF_UP micro grid, F1
    // from the ROUNDED micro P/R, all integer-exact. ----
    ("ns_quality_class_prf",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val b = Curation.hashBucket(col("doc_id"), 100)
        val (model, priors) = nbModel(s, d)
        val scored = Classifier.nbScore(docs.filter(b >= 80), "doc_id",
            "text", model, priors, 4096)
          .join(docs.select("doc_id", "lang"), "doc_id")
        Classifier.classPrf(scored, "predicted", "lang")
          .orderBy("label")
      },
      Some(nbCte +
        ", fpa AS (SELECT p.predicted AS p, d.lang AS a FROM pred p " +
        "JOIN documents d USING (doc_id)), " +
        "fcl AS (SELECT DISTINCT a AS label FROM fpa " +
        "UNION SELECT DISTINCT p FROM fpa), " +
        "ftp AS (SELECT a AS label, count(*) AS tp FROM fpa " +
        "WHERE p = a GROUP BY 1), " +
        "fpc AS (SELECT p AS label, count(*) AS pc FROM fpa GROUP BY 1), " +
        "fac AS (SELECT a AS label, count(*) AS ac FROM fpa GROUP BY 1), " +
        "fj AS (SELECT fcl.label, coalesce(ftp.tp, 0) AS tp, " +
        "coalesce(fpc.pc, 0) AS pc, coalesce(fac.ac, 0) AS ac " +
        "FROM fcl LEFT JOIN ftp ON fcl.label = ftp.label " +
        "LEFT JOIN fpc ON fcl.label = fpc.label " +
        "LEFT JOIN fac ON fcl.label = fac.label), " +
        "fm AS (SELECT label, tp, pc - tp AS fp, ac - tp AS fn, " +
        "CASE WHEN pc > 0 THEN (2000000 * tp + pc) // (2 * pc) " +
        "ELSE 0 END AS prec_micro, " +
        "CASE WHEN ac > 0 THEN (2000000 * tp + ac) // (2 * ac) " +
        "ELSE 0 END AS rec_micro FROM fj) " +
        "SELECT label, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp, " +
        "CAST(fn AS BIGINT) AS fn, CAST(prec_micro AS BIGINT) AS prec_micro, " +
        "CAST(rec_micro AS BIGINT) AS rec_micro, " +
        "CAST(CASE WHEN prec_micro + rec_micro > 0 THEN " +
        "(2 * (2 * prec_micro * rec_micro) + (prec_micro + rec_micro)) // " +
        "(2 * (prec_micro + rec_micro)) ELSE 0 END AS BIGINT) AS f1_micro " +
        "FROM fm ORDER BY label")),

    // ---- Cohen's kappa of the NB language predictor vs truth on the
    // held-out slice: chance-corrected agreement (the statistic that
    // separates "accurate" from "accurate on a majority-class corpus"),
    // one integer-exact micro-unit row; negative kappa rounds
    // half-away-from-zero in both engines by construction. ----
    ("ns_quality_kappa",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val b = Curation.hashBucket(col("doc_id"), 100)
        val (model, priors) = nbModel(s, d)
        val scored = Classifier.nbScore(docs.filter(b >= 80), "doc_id",
            "text", model, priors, 4096)
          .join(docs.select("doc_id", "lang"), "doc_id")
        Classifier.cohenKappa(scored, "predicted", "lang")
      },
      Some(nbCte +
        ", kpa AS (SELECT p.predicted AS p, d.lang AS a FROM pred p " +
        "JOIN documents d USING (doc_id)), " +
        "ktot AS (SELECT count(*) AS n, " +
        "count(*) FILTER (WHERE p = a) AS diag FROM kpa), " +
        "krc AS (SELECT p AS l, count(*) AS r FROM kpa GROUP BY 1), " +
        "kcc AS (SELECT a AS l, count(*) AS c FROM kpa GROUP BY 1), " +
        "kch AS (SELECT coalesce(sum(CAST(r AS HUGEINT) * " +
        "CAST(c AS HUGEINT)), 0) AS chance FROM krc JOIN kcc USING (l)), " +
        "k AS (SELECT n, diag, chance, " +
        "CAST(n AS HUGEINT) * diag - chance AS num, " +
        "CAST(n AS HUGEINT) * n - chance AS den " +
        "FROM ktot CROSS JOIN kch) " +
        "SELECT CAST(n AS BIGINT) AS n, CAST(diag AS BIGINT) AS diag, " +
        "CAST((2000000 * diag + n) // (2 * n) AS BIGINT) AS po_micro, " +
        "CAST((2000000 * chance + CAST(n AS HUGEINT) * n) // " +
        "(2 * CAST(n AS HUGEINT) * n) AS BIGINT) AS pe_micro, " +
        "CAST(CASE WHEN den = 0 THEN 0 WHEN num >= 0 THEN " +
        "(2000000 * num + den) // (2 * den) " +
        "ELSE -((2000000 * (-num) + den) // (2 * den)) END AS BIGINT) " +
        "AS kappa_micro FROM k")),

    // ---- classifier calibration: threshold-sweep precision/recall/F1
    // over the held-out 'en'-class NB log-posteriors — the report read
    // before picking a keep threshold. One row per distinct score; the
    // cumulative window runs over the distinct-score relation (bounded by
    // the 4-decimal grid), not the corpus. ----
    ("ns_quality_pr_curve",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val b = Curation.hashBucket(col("doc_id"), 100)
        val (model, priors) = nbModel(s, d)
        val en = Classifier.nbScores(docs.filter(b >= 80), "doc_id", "text",
            model, priors, 4096)
          .filter(col("label") === "en")
          .join(docs.select("doc_id", "lang"), "doc_id")
        Classifier.prCurve(en, "score", col("lang") === "en")
          .orderBy(col("thr").desc)
      },
      Some(nbCte +
        ", sl AS (SELECT sc.doc_id, sc.score, (d.lang = 'en') AS pos " +
        "FROM sc JOIN documents d USING (doc_id) WHERE sc.label = 'en'), " +
        "g AS (SELECT score AS thr, count(*) FILTER (WHERE pos) AS np, " +
        "count(*) FILTER (WHERE NOT pos) AS nn FROM sl GROUP BY 1), " +
        "tps AS (SELECT sum(np) AS tpos FROM g), " +
        "c AS (SELECT thr, sum(np) OVER w AS tp, sum(nn) OVER w AS fp " +
        "FROM g WINDOW w AS (ORDER BY thr DESC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), " +
        "mm AS (SELECT thr, tp, fp, tpos, " +
        "round(CAST(tp AS DOUBLE) / (tp + fp), 6) AS prec, " +
        "round(CAST(tp AS DOUBLE) / tpos, 6) AS rec " +
        "FROM c CROSS JOIN tps) " +
        "SELECT thr, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp, " +
        "CAST(tpos - tp AS BIGINT) AS fn, prec, rec, " +
        "CASE WHEN prec + rec > 0 " +
        "THEN round(2 * prec * rec / (prec + rec), 6) ELSE 0.0 END AS f1 " +
        "FROM mm ORDER BY thr DESC")),

    // ---- calibration (reliability) bins of the NB posterior
    // P(en | doc) against the true label over the held-out slice — the
    // reliability-diagram table next to the PR curve and AUC. Posterior
    // in log-space (round-6 exp terms, label-ordered fold); bin means
    // sum the 1e-6-grid probabilities as exact integers. ----
    ("ns_quality_calibration",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val b = Curation.hashBucket(col("doc_id"), 100)
        val (model, priors) = nbModel(s, d)
        val p = Classifier.nbPosterior(
            Classifier.nbScores(docs.filter(b >= 80), "doc_id", "text",
              model, priors, 4096), "en")
          .join(docs.select("doc_id", "lang"), "doc_id")
        Classifier.calibrationBins(p, "p", col("lang") === "en", bins = 10)
      },
      Some(nbCte +
        ", st AS (SELECT doc_id, max(CASE WHEN label = 'en' THEN score END) " +
        "AS s_t FROM sc GROUP BY doc_id), " +
        "tm AS (SELECT sc.doc_id, sc.label, round(exp(sc.score - st.s_t), 6) AS t " +
        "FROM sc JOIN st USING (doc_id) " +
        "WHERE sc.label <> 'en' AND st.s_t IS NOT NULL), " +
        "ps AS (SELECT doc_id, round(1.0 / (1.0 + " +
        "list_sum(list(t ORDER BY label))), 6) AS p FROM tm GROUP BY doc_id), " +
        "pl AS (SELECT ps.doc_id, ps.p, (d.lang = 'en') AS pos " +
        "FROM ps JOIN documents d USING (doc_id)), " +
        "bi AS (SELECT least(9, CAST(floor(p * 10) AS INTEGER)) AS bin, p, pos " +
        "FROM pl), " +
        "g AS (SELECT bin, count(*) AS n, count(*) FILTER (WHERE pos) AS n_pos, " +
        "sum(CAST(round(p * 1000000.0, 0) AS BIGINT)) AS psum " +
        "FROM bi GROUP BY bin) " +
        // CAST: grouping arithmetic promotes bin to int64 in DuckDB;
        // the engine emits int32 (width-exact oracle discipline)
        "SELECT CAST(bin AS INTEGER) AS bin, CAST(n AS BIGINT) AS n, " +
        "CAST(n_pos AS BIGINT) AS n_pos, " +
        "round(CAST(n_pos AS DOUBLE) / n, 6) AS pos_rate, " +
        "round(CAST(psum AS DOUBLE) / 1000000.0 / n, 6) AS mean_pred, " +
        "round(round(CAST(psum AS DOUBLE) / 1000000.0 / n, 6) - " +
        "round(CAST(n_pos AS DOUBLE) / n, 6), 6) AS gap " +
        "FROM g ORDER BY bin")),

    // ---- ROC-AUC of the NB "is-English" score against the true lang
    // label — the tie-corrected Mann–Whitney rank statistic over the
    // same held-out slice as the PR curve. Exact integer pair counts
    // until one final division. ----
    ("ns_quality_auc",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val b = Curation.hashBucket(col("doc_id"), 100)
        val (model, priors) = nbModel(s, d)
        val en = Classifier.nbScores(docs.filter(b >= 80), "doc_id", "text",
            model, priors, 4096)
          .filter(col("label") === "en")
          .join(docs.select("doc_id", "lang"), "doc_id")
        Classifier.rocAuc(en, "score", col("lang") === "en")
      },
      Some(nbCte +
        ", sl AS (SELECT sc.doc_id, sc.score, (d.lang = 'en') AS pos " +
        "FROM sc JOIN documents d USING (doc_id) WHERE sc.label = 'en'), " +
        "g AS (SELECT score AS s, count(*) FILTER (WHERE pos) AS np, " +
        "count(*) FILTER (WHERE NOT pos) AS nn FROM sl GROUP BY 1), " +
        "c AS (SELECT s, np, nn, coalesce(sum(nn) OVER (ORDER BY s " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg " +
        "FROM g) " +
        "SELECT CAST(sum(np) AS BIGINT) AS n_pos, " +
        "CAST(sum(nn) AS BIGINT) AS n_neg, " +
        "CASE WHEN sum(np) > 0 AND sum(nn) > 0 THEN " +
        "round((CAST(sum(np * cumneg) AS DOUBLE) + " +
        "0.5 * CAST(sum(np * nn) AS DOUBLE)) / " +
        "(CAST(sum(np) AS DOUBLE) * CAST(sum(nn) AS DOUBLE)), 6) " +
        "ELSE 0.0 END AS auc FROM c")),

    // ---- deterministic per-epoch corpus shuffle: content-addressed
    // permutation (md5(epoch|id)), shard + within-shard position; no
    // global sort or window. ----
    ("ns_curate_epoch_shuffle",
      (s: SparkSession, d: String) =>
        Curation.epochShuffle(Tables.documents(s, d), "doc_id",
            epoch = 1, nShards = 8)
          .orderBy("doc_id"),
      Some("WITH h AS (SELECT doc_id, " +
        "md5_number_lower('epoch1|' || CAST(doc_id AS VARCHAR)) AS u " +
        "FROM documents), " +
        "k AS (SELECT doc_id, CAST(CASE WHEN u >= 9223372036854775808 " +
        "THEN u - 18446744073709551616 ELSE u END AS BIGINT) AS skey FROM h), " +
        "b AS (SELECT doc_id, skey, " +
        "CAST(((skey % 8) + 8) % 8 AS INTEGER) AS shard FROM k) " +
        "SELECT doc_id, shard, CAST(row_number() OVER " +
        "(PARTITION BY shard ORDER BY skey, doc_id) AS INTEGER) AS pos " +
        "FROM b ORDER BY doc_id")),

    // ---- length-bucketed batch assembly: bin by token count, pack
    // batches of 8 within bins in content-hash order, report per-doc
    // padding waste against the bin ceiling. ----
    ("ns_curate_length_batches",
      (s: SparkSession, d: String) =>
        Curation.lengthBatches(Tables.documents(s, d), "doc_id", "text",
            binWidth = 64, maxLen = 2048, batchSize = 8)
          .orderBy("doc_id"),
      Some("WITH t AS (SELECT doc_id, CAST(len(string_split_regex(" +
        "lower(trim(text)), '\\s+')) AS INTEGER) AS n_tokens FROM documents), " +
        "bt AS (SELECT doc_id, n_tokens, " +
        "least(CAST(ceil(n_tokens / 64.0) AS INTEGER) * 64, 2048) AS bin, " +
        "CAST(CASE WHEN u >= 9223372036854775808 " +
        "THEN u - 18446744073709551616 ELSE u END AS BIGINT) AS h " +
        "FROM (SELECT t.*, md5_number_lower(CAST(doc_id AS VARCHAR)) AS u FROM t)), " +
        "rn AS (SELECT doc_id, n_tokens, bin, " +
        "row_number() OVER (PARTITION BY bin ORDER BY h, doc_id) AS rn FROM bt) " +
        // CAST: int32*64 promotes bin to int64 in DuckDB; engine is int32
        "SELECT doc_id, n_tokens, CAST(bin AS INTEGER) AS bin, " +
        "CAST((rn - 1) // 8 AS INTEGER) AS batch_id, " +
        "CAST(bin - least(n_tokens, bin) AS BIGINT) AS pad_tokens " +
        "FROM rn ORDER BY doc_id")),

    // ---- exact heavy hitters at a bounded shuffle: Misra–Gries sketch
    // prune (lossless above N/(cap+1)) + exact recount of the ≤cap
    // candidates. The output carries no estimate — it equals the exact
    // HAVING-threshold query, so it hash-matches DuckDB even though the
    // prune is approximate. ----
    // capacity 32 ⇒ threshold N/33: the fixture's hottest tokens sit at
    // ~3% of the stream (~N/33 clears 30 of them at sf0.01 AND sf0.1),
    // so the gate row is non-vacuous at both driver SFs — capacity 16's
    // N/17 threshold cleared NOTHING and the row proved only that both
    // engines agree on the empty set.
    ("ns_text_heavy_hitters",
      (s: SparkSession, d: String) =>
        TextAnalysis.heavyHitters(Tables.documents(s, d), "text", capacity = 32),
      Some("WITH toks AS (SELECT unnest(string_split_regex(lower(trim(text)), " +
        "'\\s+')) AS tok FROM documents), " +
        "nt AS (SELECT count(*) AS n FROM toks) " +
        "SELECT tok, count(*) AS cnt FROM toks GROUP BY 1 " +
        "HAVING count(*) > (SELECT n FROM nt) / 33.0 " +
        "ORDER BY cnt DESC, tok")),

    // ---- count-min sketch point-frequency estimates vs exact counts —
    // the "how frequent is THIS item" complement of the Misra-Gries
    // heavy hitters; d=3/w=16 is deliberately under-sized for the 31-
    // token vocabulary so hash collisions actually occur and the
    // sketch's one-sided error (est >= exact, never under) is exercised,
    // not vacuous. Integer-exact cross-engine (md5 rows, integer min). ----
    ("ns_text_cms_freq",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val terms = Seq("join", "hash", "row", "scan", "the", "dup",
          "zebra", "quantum")
        val grid = TextAnalysis.countMinGrid(docs, "text",
          depth = 3, width = 16)
        val est = TextAnalysis.countMinEstimate(grid, terms,
          depth = 3, width = 16)
        val exact = docs.select(explode(
            split(lower(trim(col("text"))), "\\s+")).as("term"))
          .filter(col("term").isin(terms: _*))
          .groupBy("term").agg(count(lit(1)).as("exact"))
        est.join(exact, Seq("term"), "left")
          .withColumn("exact", coalesce(col("exact"), lit(0L)))
          .orderBy("term")
      },
      Some("WITH toks AS (SELECT unnest(string_split_regex(" +
        "lower(trim(text)), '\\s+')) AS tok FROM documents), " +
        "grid AS (SELECT i AS row_i, " +
        dHashMod("md5_number_lower(tok || '#' || CAST(i AS VARCHAR))",
          16L) + " AS col_j, count(*) AS cnt " +
        "FROM toks CROSS JOIN generate_series(0, 2) g(i) GROUP BY 1, 2), " +
        "terms AS (SELECT unnest(['join', 'hash', 'row', 'scan', 'the', " +
        "'dup', 'zebra', 'quantum']) AS term), " +
        "probe AS (SELECT term, i AS row_i, " +
        dHashMod("md5_number_lower(term || '#' || CAST(i AS VARCHAR))",
          16L) + " AS col_j " +
        "FROM terms CROSS JOIN generate_series(0, 2) g(i)), " +
        "est AS (SELECT term, min(coalesce(grid.cnt, 0)) AS est " +
        "FROM probe LEFT JOIN grid USING (row_i, col_j) GROUP BY term), " +
        "ex AS (SELECT tok AS term, count(*) AS exact FROM toks " +
        "GROUP BY 1) " +
        "SELECT est.term, est.est, coalesce(ex.exact, 0) AS exact " +
        "FROM est LEFT JOIN ex ON est.term = ex.term ORDER BY est.term")),

    // ---- trigram LM with stupid backoff, fit on the train split and
    // scored on held-out docs so unseen trigrams exercise the full
    // backoff chain (a self-fitted model never backs off). ----
    ("ns_text_trigram_backoff",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val b = Curation.hashBucket(col("doc_id"), 100)
        TextAnalysis.trigramBackoff(docs.filter(b < 80), docs.filter(b >= 80),
            "doc_id", "text")
          .orderBy("doc_id")
      },
      Some(trigramCte +
        "SELECT doc_id, n_trigrams, avg_logscore FROM heldout ORDER BY doc_id")),

    // ---- LM-based (perplexity) quality floor: held-out docs scored by
    // the train-split trigram backoff model, each domain keeping docs at
    // or above its 20th-percentile avg log-score — the CCNet-style
    // reference-LM filter, composed from two independently-oracled
    // stages so the WHOLE filter hash-matches end-to-end. ----
    ("ns_curate_ppl_floor",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val b = Curation.hashBucket(col("doc_id"), 100)
        Curation.perplexityFloor(docs.filter(b < 80), docs.filter(b >= 80),
            "doc_id", "text", "source", floorQuantile = 0.2)
          .orderBy("doc_id")
      },
      Some(trigramCte +
        ", th AS (SELECT source AS domain, " +
        "round(quantile_cont(avg_logscore, 0.2), 6) AS domain_threshold " +
        "FROM heldout GROUP BY 1) " +
        "SELECT h.doc_id, h.source AS domain, h.n_trigrams, " +
        "h.avg_logscore, th.domain_threshold, " +
        "h.avg_logscore >= th.domain_threshold AS keep " +
        "FROM heldout h JOIN th ON h.source = th.domain " +
        "ORDER BY h.doc_id")),

    // ---- one-row corpus data card: volume, diversity, exact-dup census.
    // The dup census groups on md5_lower64(text) (8-byte shuffle keys);
    // the oracle groups on the text itself — same counts. ----
    ("ns_corpus_report",
      (s: SparkSession, d: String) =>
        Curation.corpusReport(Tables.documents(s, d), "doc_id", "text",
          "lang", "source", "n_chars"),
      Some("WITH base AS (SELECT count(*) AS n_docs, " +
        "sum(len(string_split_regex(lower(trim(text)), '\\s+'))) AS total_tokens, " +
        "sum(n_chars) AS total_chars, count(DISTINCT lang) AS n_langs, " +
        "count(DISTINCT source) AS n_sources FROM documents), " +
        "top AS (SELECT lang AS top_lang, count(*) AS top_n FROM documents " +
        "GROUP BY 1 ORDER BY top_n DESC, top_lang LIMIT 1), " +
        "dup AS (SELECT coalesce(sum(c), 0) AS dup_docs FROM " +
        "(SELECT count(*) AS c FROM documents GROUP BY text HAVING count(*) > 1)) " +
        "SELECT CAST(n_docs AS BIGINT) AS n_docs, " +
        "CAST(total_tokens AS BIGINT) AS total_tokens, " +
        "round(CAST(total_tokens AS BIGINT) / CAST(n_docs AS BIGINT), 4) AS avg_tokens, " +
        "CAST(total_chars AS BIGINT) AS total_chars, " +
        "CAST(n_langs AS BIGINT) AS n_langs, top_lang, " +
        "round(CAST(top_n AS BIGINT) / CAST(n_docs AS BIGINT), 6) AS top_lang_share, " +
        "CAST(n_sources AS BIGINT) AS n_sources, " +
        "CAST(dup_docs AS BIGINT) AS dup_docs, " +
        "round(CAST(dup_docs AS BIGINT) / CAST(n_docs AS BIGINT), 6) AS dup_frac " +
        "FROM base CROSS JOIN top CROSS JOIN dup")),

    // ---- cross-corpus vocabulary overlap via theta set-op sketches:
    // exact below 2^lgK distinct tokens, so the report hash-matches
    // DuckDB INTERSECT/EXCEPT at this scale while the corpus-side cost
    // is one sketch pass per side at any scale. ----
    ("ns_corpus_overlap",
      (s: SparkSession, d: String) =>
        Curation.vocabularyOverlap(Tables.documents(s, d), "text", "lang",
          a = "en", b = "de"),
      Some("WITH toks AS (SELECT lang AS g, unnest(string_split_regex(" +
        "lower(trim(text)), '\\s+')) AS tok FROM documents " +
        "WHERE lang IN ('en', 'de')), " +
        "va AS (SELECT DISTINCT tok FROM toks WHERE g = 'en'), " +
        "vb AS (SELECT DISTINCT tok FROM toks WHERE g = 'de'), " +
        "c AS (SELECT CAST((SELECT count(*) FROM va) AS BIGINT) AS n_a, " +
        "CAST((SELECT count(*) FROM vb) AS BIGINT) AS n_b, " +
        "CAST((SELECT count(*) FROM (SELECT * FROM va INTERSECT " +
        "SELECT * FROM vb)) AS BIGINT) AS n_common, " +
        "CAST((SELECT count(*) FROM (SELECT * FROM va EXCEPT " +
        "SELECT * FROM vb)) AS BIGINT) AS n_only_a) " +
        "SELECT n_a, n_b, n_common, n_only_a, " +
        "round(CAST(n_common AS DOUBLE) / (n_a + n_b - n_common), 6) " +
        "AS jaccard FROM c")),

    // ---- canary scan: which docs contain which contamination needles
    // verbatim — one zero-shuffle codegen'd scan, every needle tested
    // per row ("dup" is a real marker in the corpus; the GUID needle is
    // deliberately absent so the no-hit path is exercised). ----
    ("ns_curate_canary_scan",
      (s: SparkSession, d: String) =>
        Curation.canaryScan(Tables.documents(s, d), "doc_id", "text",
            Seq("dup", "slow merge", "canary-guid-1337"))
          .orderBy("doc_id", "needle"),
      Some("SELECT doc_id, needle FROM documents CROSS JOIN " +
        "(SELECT unnest(['dup', 'slow merge', 'canary-guid-1337']) " +
        "AS needle) " +
        "WHERE contains(text, needle) ORDER BY doc_id, needle")),

    // ---- snapshot diff — dataset versioning: two simulated snapshot
    // states of the documents table (drops on each side + edited texts)
    // classified added/removed/changed/unchanged by content hash; one
    // full-outer join on 32-byte md5s, doc-size-independent. ----
    ("ns_corpus_snapshot_diff",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val oldSnap = docs.filter(col("doc_id") % 7 =!= 0)
        val newSnap = docs.filter(col("doc_id") % 5 =!= 0)
          .withColumn("text", when(col("doc_id") % 3 === 0,
            concat(col("text"), lit(" v2"))).otherwise(col("text")))
        Curation.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
          .orderBy("id")
      },
      Some("WITH o AS (SELECT doc_id AS id, md5(text) AS h " +
        "FROM documents WHERE doc_id % 7 <> 0), " +
        "n AS (SELECT doc_id AS id, md5(CASE WHEN doc_id % 3 = 0 " +
        "THEN text || ' v2' ELSE text END) AS h " +
        "FROM documents WHERE doc_id % 5 <> 0) " +
        "SELECT coalesce(o.id, n.id) AS id, " +
        "CASE WHEN o.id IS NULL THEN 'added' " +
        "WHEN n.id IS NULL THEN 'removed' " +
        "WHEN o.h = n.h THEN 'unchanged' ELSE 'changed' END AS status " +
        "FROM o FULL JOIN n ON o.id = n.id ORDER BY id")),

    // ---- token-distribution drift between two md5-bucket halves of the
    // corpus — the pre-ingest drift monitor: one-row TV distance in
    // micro-units, integer-exact end-to-end (decimal cross products,
    // HUGEINT in the oracle, driver-BigInt final HALF_UP). ----
    // ---- source×source shingle-contamination matrix: shared distinct
    // 3-gram counts + directional containment + Jaccard per ordered
    // source pair, all-integer HALF_UP micro ratios — the "did one
    // source copy the other" complement of ns_corpus_drift's
    // distribution distance. Per-key join cardinality is bounded by
    // |sources| after the (source, shingle) distinct, so the plan needs
    // no hot-shingle cap at any corpus size. ----
    ("ns_corpus_overlap_matrix",
      (s: SparkSession, d: String) =>
        Curation.sourceOverlapMatrix(Tables.documents(s, d), "source",
            "text", shingleK = 3)
          .orderBy("src_a", "src_b"),
      Some("WITH toks AS (SELECT doc_id, source, " +
        "string_split_regex(lower(trim(text)), '\\s+') AS t " +
        "FROM documents), " +
        "tokpos AS (SELECT doc_id, source, len(t) AS n, unnest(t) AS w, " +
        "generate_subscripts(t, 1) AS pos FROM toks), " +
        "ssh AS (SELECT DISTINCT source AS src, concat_ws(' ', w, " +
        "lead(w, 1) OVER win, lead(w, 2) OVER win) AS s FROM tokpos " +
        "WINDOW win AS (PARTITION BY doc_id ORDER BY pos) " +
        "QUALIFY pos <= n - 2), " +
        "sizes AS (SELECT src, CAST(count(*) AS BIGINT) AS n " +
        "FROM ssh GROUP BY src), " +
        "cm AS (SELECT a.src AS src_a, b.src AS src_b, " +
        "CAST(count(*) AS BIGINT) AS common FROM ssh a JOIN ssh b " +
        "ON a.s = b.s AND a.src <> b.src GROUP BY 1, 2), " +
        "pr AS (SELECT sa.src AS src_a, sa.n AS n_a, sb.src AS src_b, " +
        "sb.n AS n_b FROM sizes sa JOIN sizes sb ON sa.src <> sb.src) " +
        "SELECT pr.src_a, pr.src_b, pr.n_a, pr.n_b, " +
        "coalesce(cm.common, 0) AS common, " +
        "CAST((2000000 * coalesce(cm.common, 0) + pr.n_a) // " +
        "(2 * pr.n_a) AS BIGINT) AS containment_micro, " +
        "CAST((2000000 * coalesce(cm.common, 0) + " +
        "(pr.n_a + pr.n_b - coalesce(cm.common, 0))) // " +
        "(2 * (pr.n_a + pr.n_b - coalesce(cm.common, 0))) AS BIGINT) " +
        "AS jaccard_micro " +
        "FROM pr LEFT JOIN cm ON pr.src_a = cm.src_a " +
        "AND pr.src_b = cm.src_b ORDER BY pr.src_a, pr.src_b")),

    ("ns_corpus_drift",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val b = Curation.hashBucket(col("doc_id"), 100)
        Curation.corpusDrift(docs.filter(b < 50), docs.filter(b >= 50),
          "text")
      },
      Some("WITH bk AS (SELECT " +
        dHashMod("md5_number_lower(CAST(doc_id AS VARCHAR))", 100L) +
        " AS bu, text FROM documents), " +
        "ta AS (SELECT unnest(string_split_regex(lower(trim(text)), " +
        "'\\s+')) AS tok FROM bk WHERE bu < 50), " +
        "tb AS (SELECT unnest(string_split_regex(lower(trim(text)), " +
        "'\\s+')) AS tok FROM bk WHERE bu >= 50), " +
        "ga AS (SELECT tok, count(*) AS c FROM ta GROUP BY 1), " +
        "gb AS (SELECT tok, count(*) AS c FROM tb GROUP BY 1), " +
        "j AS (SELECT coalesce(ga.c, 0) AS ca, coalesce(gb.c, 0) AS cb " +
        "FROM ga FULL JOIN gb ON ga.tok = gb.tok), " +
        "tt AS (SELECT sum(ca) AS na, sum(cb) AS nb, " +
        "sum(CASE WHEN ca > 0 THEN 1 ELSE 0 END) AS vocab_a, " +
        "sum(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS vocab_b, " +
        "sum(CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END) " +
        "AS vocab_shared FROM j), " +
        "sm AS (SELECT sum(abs(ca * (SELECT nb FROM tt) - " +
        "cb * (SELECT na FROM tt))) AS s FROM j) " +
        "SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, " +
        "CAST(vocab_a AS BIGINT) AS vocab_a, " +
        "CAST(vocab_b AS BIGINT) AS vocab_b, " +
        "CAST(vocab_shared AS BIGINT) AS vocab_shared, " +
        "CAST((2000000 * sm.s + 2 * na * nb) // (4 * na * nb) AS BIGINT) " +
        "AS tv_micro FROM tt, sm")),

    // ---- the per-token movers behind the drift scalar: each side's
    // share on its own micro-grid, top-20 by |delta| (ties to the
    // token) — integer-exact, so the report hashes. ----
    ("ns_corpus_drift_tokens",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val b = Curation.hashBucket(col("doc_id"), 100)
        Curation.driftTokens(docs.filter(b < 50), docs.filter(b >= 50),
          "text", topK = 20)
      },
      Some("WITH bk AS (SELECT " +
        dHashMod("md5_number_lower(CAST(doc_id AS VARCHAR))", 100L) +
        " AS bu, text FROM documents), " +
        "ta AS (SELECT unnest(string_split_regex(lower(trim(text)), " +
        "'\\s+')) AS tok FROM bk WHERE bu < 50), " +
        "tb AS (SELECT unnest(string_split_regex(lower(trim(text)), " +
        "'\\s+')) AS tok FROM bk WHERE bu >= 50), " +
        "ga AS (SELECT tok, count(*) AS c FROM ta GROUP BY 1), " +
        "gb AS (SELECT tok, count(*) AS c FROM tb GROUP BY 1), " +
        "j AS (SELECT coalesce(ga.tok, gb.tok) AS tok, " +
        "coalesce(ga.c, 0) AS ca, coalesce(gb.c, 0) AS cb " +
        "FROM ga FULL JOIN gb ON ga.tok = gb.tok), " +
        "tt AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM j), " +
        "sh AS (SELECT tok, ca, cb, " +
        "(2 * 1000000 * ca + (SELECT na FROM tt)) // " +
        "(2 * (SELECT na FROM tt)) AS share_a_micro, " +
        "(2 * 1000000 * cb + (SELECT nb FROM tt)) // " +
        "(2 * (SELECT nb FROM tt)) AS share_b_micro FROM j) " +
        "SELECT tok, CAST(ca AS BIGINT) AS ca, CAST(cb AS BIGINT) AS cb, " +
        "CAST(share_a_micro AS BIGINT) AS share_a_micro, " +
        "CAST(share_b_micro AS BIGINT) AS share_b_micro, " +
        "CAST(share_a_micro - share_b_micro AS BIGINT) AS delta_micro " +
        "FROM sh ORDER BY abs(share_a_micro - share_b_micro) DESC, tok " +
        "LIMIT 20")),

    // ---- PSI (population stability index) over document char length,
    // src0 slice vs the rest — the continuous-feature drift monitor
    // next to the token-TV scalar: 16 equal-width bins on [0, 2047]
    // (edge-clamped), add-0.5-smoothed proportions, round-6 ln terms
    // (the NB/DSIR ln-grid conventions). Per-bin table + the folded
    // scalar, both hashed. ----
    ("ns_corpus_psi_bins",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        Curation.psiBins(docs.filter(col("source") === "src0"),
            docs.filter(col("source") =!= "src0"),
            length(col("text")), lo = 0L, hi = 2047L, bins = 16)
          .orderBy("bin")
      },
      Some(psiCte +
        "SELECT bin, ca, cb, term FROM t ORDER BY bin")),

    ("ns_corpus_psi",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        Curation.psi(docs.filter(col("source") === "src0"),
          docs.filter(col("source") =!= "src0"),
          length(col("text")), lo = 0L, hi = 2047L, bins = 16)
      },
      Some(psiCte +
        "SELECT round(list_sum(list(term ORDER BY bin)), 6) AS psi " +
        "FROM t")),

    // Binary logistic regression (lang='en' vs rest). The iterative
    // gradient-descent TRAINING is not SQL-expressible (it stays covered
    // by ns_quality_lr_audit's distributed-equals-serial hash and
    // ClassifierSpec), but SCORING is an exact integer fold over the
    // trained nano-grid weights — so the model is published through
    // OracleFeed (round 15, the KLL-floors move) and DuckDB replays the
    // margin `Σ w_nano[b]·cnt + bias` in exact BIGINT arithmetic, one
    // double division by 1e9, and the round-6 sigmoid/threshold.
    ("ns_quality_lr_score",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val b = Curation.hashBucket(col("doc_id"), 100)
        val model = Classifier.lrTrain(docs.filter(b < 80),
          "doc_id", "text", col("lang") === "en",
          buckets = 1024, iters = 5, learnRate = 0.5)
        OracleFeed.publish("ns_quality_lr_score", "weights",
          model.select(col("b"), col("w_nano")))
        Classifier.lrScore(docs.filter(b >= 80), "doc_id", "text",
            OracleFeed.readBack(s, "ns_quality_lr_score", "weights"), 1024)
          .orderBy("doc_id")
      },
      Some("WITH t0 AS (SELECT doc_id, " +
        "string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents), " +
        "f0 AS (SELECT doc_id, list_concat(t, " +
        "[t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]) AS f FROM t0), " +
        "fx AS (SELECT doc_id, unnest(f) AS feat FROM f0), " +
        "fb AS (SELECT doc_id, " + dHashMod("u", 1024L) + " AS b " +
        "FROM (SELECT doc_id, md5_number_lower(feat) AS u FROM fx)), " +
        "sp AS (SELECT doc_id, " + dHashMod("su", 100L) + " >= 80 " +
        "AS is_score FROM (SELECT doc_id, " +
        "md5_number_lower(CAST(doc_id AS VARCHAR)) AS su FROM documents)), " +
        "cnt AS (SELECT doc_id, b, count(*) AS cnt FROM fb " +
        "JOIN sp USING (doc_id) WHERE is_score GROUP BY 1, 2), " +
        "wt AS (SELECT b, w_nano FROM " +
        OracleFeed.sqlPath("ns_quality_lr_score", "weights") +
        " WHERE b >= 0), " +
        "bias AS (SELECT w_nano AS bw FROM " +
        OracleFeed.sqlPath("ns_quality_lr_score", "weights") +
        " WHERE b = -1), " +
        "m AS (SELECT doc_id, sum(coalesce(w.w_nano, 0) * cnt.cnt) AS mm " +
        "FROM cnt LEFT JOIN wt w USING (b) GROUP BY 1), " +
        "sc AS (SELECT doc_id, round((mm + bias.bw) / 1e9, 6) AS margin, " +
        "round(1.0 / (1.0 + exp(-((mm + bias.bw) / 1e9))), 6) AS p " +
        "FROM m CROSS JOIN bias) " +
        "SELECT doc_id, margin, p, CAST(p >= 0.5 AS INTEGER) AS predicted " +
        "FROM sc ORDER BY doc_id")),

    // ---- multimodal decode -> resize -> patchify: payloads constructed
    // from doc_id arithmetic, decoded by the deterministic tile codec,
    // nearest-neighbor resampled 8x6 -> 4x4, summarized as 2x2 patch
    // mean/std — so the WHOLE pixel pipeline is arithmetic the oracle
    // replicates (the mm_binary_meta approach, extended through three
    // kernel stages). A real codec binding swaps in behind GrayDecoder
    // without touching this plan. ----
    ("mm_patch_grid",
      (s: SparkSession, d: String) => {
        import graft.operators.Multimodal
        def hex2(c: Column) = lpad(hex(c % 256), 2, "0")
        val payload = unhex(concat(hex2(col("doc_id")),
          hex2(floor(col("doc_id") / 256).cast("long")), lit("070B")))
        Multimodal.patchFeatures(
          Tables.documents(s, d).select(col("doc_id"), payload.as("content")),
          "doc_id", "content", w = 8, h = 6, outW = 4, outH = 4, p = 2)
          .orderBy("doc_id", "py", "px")
      },
      Some("WITH px AS (SELECT doc_id, py, qx AS px, dy, dx, " +
        "((py * 2 + dy) * 6) // 4 AS sy, ((qx * 2 + dx) * 8) // 4 AS sx " +
        "FROM documents CROSS JOIN generate_series(0, 1) a(py) " +
        "CROSS JOIN generate_series(0, 1) b(qx) " +
        "CROSS JOIN generate_series(0, 1) c(dy) " +
        "CROSS JOIN generate_series(0, 1) e(dx)), " +
        "v AS (SELECT doc_id, py, px, CASE (sy * 8 + sx) % 4 " +
        "WHEN 0 THEN doc_id % 256 WHEN 1 THEN (doc_id // 256) % 256 " +
        "WHEN 2 THEN 7 ELSE 11 END AS v FROM px) " +
        "SELECT doc_id, CAST(py AS INTEGER) AS py, CAST(px AS INTEGER) AS px, " +
        "round(sum(v) / 4.0, 6) AS mean, " +
        "round(sqrt(sum(v * v) / 4.0 - (sum(v) / 4.0) * (sum(v) / 4.0)), 6) " +
        "AS std FROM v GROUP BY doc_id, py, px ORDER BY doc_id, py, px")),

    // ---- REAL container decode in the gated path: the same arithmetic
    // pixel plane as mm_patch_grid (TileDecoder over a doc_id payload) is
    // ENCODED into a genuine PNG container per row (png_gray_encode, JDK
    // writer) and decoded back through the SHIPPED ImageIoDecoder
    // (GrayImage.scala codec seam) — intrinsic 8×6 raster-exact gray read,
    // then the declared-4×4 mismatch exercises the decoder's documented
    // integer resample convention (== GrayResize). PNG is lossless, so the
    // output equals mm_patch_grid's and the oracle replays the identical
    // pixel arithmetic — a gamma shift, palette misread, or resample drift
    // in the real decoder breaks the hash. Per-row codegen'd projections
    // throughout: encode+decode ride the scan, no shuffle before the agg. ----
    ("mm_image_decode_real",
      (s: SparkSession, d: String) => {
        import graft.functions.{ImageIoDecoder, TileDecoder, gray_decode,
          gray_patch_stats, png_gray_encode}
        def hex2(c: Column) = lpad(hex(c % 256), 2, "0")
        val payload = unhex(concat(hex2(col("doc_id")),
          hex2(floor(col("doc_id") / 256).cast("long")), lit("070B")))
        val plane = gray_decode(TileDecoder, payload, lit(8), lit(6))
        val png = png_gray_encode(plane, lit(8), lit(6))
        val decoded = gray_decode(ImageIoDecoder, png, lit(4), lit(4))
        // the decode chain derives from doc_id alone — project it first
        // (8 bytes/row) and fan the single-row-group scan out so the
        // per-row encode/decode kernels run at session parallelism (r18;
        // Tables.fanOut is a no-op on any multi-split input)
        Tables.fanOut(Tables.documents(s, d).select("doc_id"), col("doc_id"))
          .select(col("doc_id"), decoded.as("__px"))
          .select(col("doc_id"),
            explode(gray_patch_stats(2, col("__px"), lit(4), lit(4))).as("__s"))
          .select(col("doc_id"), col("__s.py").as("py"), col("__s.px").as("px"),
            col("__s.mean").as("mean"), col("__s.std").as("std"))
          .orderBy("doc_id", "py", "px")
      },
      // identical pixel arithmetic to mm_patch_grid's oracle: the PNG
      // encode→decode round-trip is bit-lossless by contract, so the real
      // decoder must reproduce the tile plane exactly
      Some("WITH px AS (SELECT doc_id, py, qx AS px, dy, dx, " +
        "((py * 2 + dy) * 6) // 4 AS sy, ((qx * 2 + dx) * 8) // 4 AS sx " +
        "FROM documents CROSS JOIN generate_series(0, 1) a(py) " +
        "CROSS JOIN generate_series(0, 1) b(qx) " +
        "CROSS JOIN generate_series(0, 1) c(dy) " +
        "CROSS JOIN generate_series(0, 1) e(dx)), " +
        "v AS (SELECT doc_id, py, px, CASE (sy * 8 + sx) % 4 " +
        "WHEN 0 THEN doc_id % 256 WHEN 1 THEN (doc_id // 256) % 256 " +
        "WHEN 2 THEN 7 ELSE 11 END AS v FROM px) " +
        "SELECT doc_id, CAST(py AS INTEGER) AS py, CAST(px AS INTEGER) AS px, " +
        "round(sum(v) / 4.0, 6) AS mean, " +
        "round(sqrt(sum(v * v) / 4.0 - (sum(v) / 4.0) * (sum(v) / 4.0)), 6) " +
        "AS std FROM v GROUP BY doc_id, py, px ORDER BY doc_id, py, px")),

    // ---- interleaved multimodal example packing (the VLM pretraining
    // input): per doc [IMG_BEGIN] patch-tokens [IMG_END] text-ids, packed
    // into exact-64-id examples by the SAME carve stage as the text/id
    // packers. The TileDecoder arithmetic keeps the image tokens
    // SQL-replicable (the mm_patch_grid pipeline, discretized), text ids
    // are md5 hash buckets — so the WHOLE multimodal stream gets a full
    // cross-engine hash oracle, doc_starts boundaries included. ----
    ("mm_pack_interleaved",
      (s: SparkSession, d: String) => {
        import graft.operators.Multimodal
        def hex2(c: Column) = lpad(hex(c % 256), 2, "0")
        val payload = unhex(concat(hex2(col("doc_id")),
          hex2(floor(col("doc_id") / 256).cast("long")), lit("070B")))
        Multimodal.packInterleaved(
          Tables.documents(s, d)
            .select(col("doc_id"), payload.as("content"), col("text")),
          "doc_id", "content", "text", w = 8, h = 6, outW = 4, outH = 4,
          p = 2, textVocab = 512, seqLen = 64)
          .select(col("example_id"), col("n_tokens"),
            concat_ws(",", transform(col("ids"), _.cast("string")))
              .as("ids_csv"),
            concat_ws(",", transform(col("doc_starts"), _.cast("string")))
              .as("doc_starts"),
            col("n_docs_started"))
          .orderBy("example_id")
      },
      Some("WITH px0 AS (SELECT doc_id, py, qx AS px, " +
        "((py * 2 + dy) * 6) // 4 AS sy, ((qx * 2 + dx) * 8) // 4 AS sx " +
        "FROM documents CROSS JOIN generate_series(0, 1) a(py) " +
        "CROSS JOIN generate_series(0, 1) b(qx) " +
        "CROSS JOIN generate_series(0, 1) c(dy) " +
        "CROSS JOIN generate_series(0, 1) e(dx)), " +
        "pv AS (SELECT doc_id, py, px, CASE (sy * 8 + sx) % 4 " +
        "WHEN 0 THEN doc_id % 256 WHEN 1 THEN (doc_id // 256) % 256 " +
        "WHEN 2 THEN 7 ELSE 11 END AS v FROM px0), " +
        "pm AS (SELECT doc_id, py, px, " +
        "CAST(514 + floor(sum(v) / 4.0) AS INTEGER) AS ptok " +
        "FROM pv GROUP BY 1, 2, 3), " +
        "pt AS (SELECT doc_id, list(ptok ORDER BY py, px) AS ptoks " +
        "FROM pm GROUP BY doc_id), " +
        "tk2 AS (SELECT doc_id, " +
        "string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents), " +
        "ids0 AS (SELECT tk2.doc_id, " +
        "[CAST(512 AS INTEGER)] || pt.ptoks || [CAST(513 AS INTEGER)] || " +
        "[CAST(" + dHashMod("md5_number_lower(tok)", 512L) +
        " AS INTEGER) FOR tok IN tk2.toks] AS ids " +
        "FROM tk2 JOIN pt USING (doc_id)), " +
        "hh AS (SELECT doc_id, ids, " +
        "md5_number_lower(CAST(doc_id AS VARCHAR)) AS u FROM ids0), " +
        "ss AS (SELECT doc_id, ids, CAST(CASE WHEN u >= 9223372036854775808 " +
        "THEN u - 18446744073709551616 ELSE u END AS BIGINT) AS h64 FROM hh), " +
        "oo AS (SELECT doc_id, ids, coalesce(sum(len(ids)) OVER " +
        "(ORDER BY h64, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) " +
        "AS pre FROM ss), " +
        "ee AS (SELECT doc_id, pre, unnest(ids) AS id, " +
        "generate_subscripts(ids, 1) - 1 AS pos FROM oo), " +
        "gg AS (SELECT pos, id, CAST((pre + pos) // 64 AS BIGINT) AS example_id, " +
        "CAST((pre + pos) % 64 AS INTEGER) AS epos FROM ee) " +
        "SELECT example_id, CAST(count(*) AS INTEGER) AS n_tokens, " +
        "string_agg(CAST(id AS VARCHAR), ',' ORDER BY epos) AS ids_csv, " +
        "coalesce(string_agg(CASE WHEN pos = 0 THEN CAST(epos AS VARCHAR) END, " +
        "',' ORDER BY epos), '') AS doc_starts, " +
        "CAST(count(*) FILTER (WHERE pos = 0) AS INTEGER) AS n_docs_started " +
        "FROM gg GROUP BY example_id ORDER BY example_id")),

    // ---- multimodal audio: REAL PCM16-LE decode + framed RMS/ZCR/peak
    // features. Payload samples are doc_id arithmetic (incl. negative
    // values, so the signed LE round-trip is exercised), and the oracle
    // recomputes every feature from the same arithmetic — an endianness
    // or sign bug breaks the hash. ----
    ("mm_audio_frames",
      (s: SparkSession, d: String) => {
        import graft.operators.Multimodal
        def hex2(c: Column) = lpad(hex(c % 256), 2, "0")
        def le16(v: Column) = {
          val u = pmod(v, lit(65536))
          concat(hex2(u), hex2(floor(u / 256).cast("long")))
        }
        val v0 = col("doc_id") % 1000
        val v1 = -(col("doc_id") % 500) - 1
        val v2 = lit(7L)
        val v3 = -(col("doc_id") % 3)
        val payload = unhex(concat(le16(v0), le16(v1), le16(v2), le16(v3)))
        Multimodal.audioFrames(
          Tables.documents(s, d).select(col("doc_id"), payload.as("content")),
          "doc_id", "content", frameLen = 2)
          .orderBy("doc_id", "frame")
      },
      Some("WITH v AS (SELECT doc_id, doc_id % 1000 AS v0, " +
        "-(doc_id % 500) - 1 AS v1, 7 AS v2, -(doc_id % 3) AS v3 " +
        "FROM documents) " +
        "SELECT * FROM (" +
        "SELECT doc_id, CAST(0 AS INTEGER) AS frame, CAST(2 AS INTEGER) AS n, " +
        "round(sqrt((v0 * v0 + v1 * v1) / 2.0), 6) AS rms, " +
        "CAST(CASE WHEN v0 * v1 < 0 THEN 1 ELSE 0 END AS INTEGER) AS zcr, " +
        "CAST(greatest(abs(v0), abs(v1)) AS INTEGER) AS peak FROM v " +
        "UNION ALL " +
        "SELECT doc_id, CAST(1 AS INTEGER), CAST(2 AS INTEGER), " +
        "round(sqrt((v2 * v2 + v3 * v3) / 2.0), 6), " +
        "CAST(CASE WHEN v2 * v3 < 0 THEN 1 ELSE 0 END AS INTEGER), " +
        "CAST(greatest(abs(v2), abs(v3)) AS INTEGER) FROM v) " +
        "ORDER BY doc_id, frame")),

    // ---- objective-shaping augmentations (operators/Augment): FIM/PSM
    // reorder and T5 span corruption, split points content-addressed from
    // md5(tag|doc_id) — deterministic, shard-order-free, and therefore
    // SQL-replicable end-to-end (split arithmetic included). ----
    ("ns_curate_fim",
      (s: SparkSession, d: String) => {
        import graft.operators.Augment
        Augment.fim(Tables.documents(s, d), "doc_id", "text")
          .orderBy("doc_id")
      },
      Some("WITH tk AS (SELECT doc_id, " +
        "string_split_regex(lower(trim(text)), '\\s+') AS t, " +
        "CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS INTEGER) " +
        "AS n FROM documents), " +
        "h1 AS (SELECT tk.*, CAST(" + dHashModCol("u1", "(n + 1)") + " AS INTEGER) " +
        "AS s1 FROM (SELECT tk.*, " +
        "md5_number_lower('fim1|' || CAST(doc_id AS VARCHAR)) AS u1 FROM tk) tk), " +
        "h2 AS (SELECT h1.*, CAST(s1 + " + dHashModCol("u2", "(n - s1 + 1)") +
        " AS INTEGER) AS s2 FROM (SELECT h1.*, " +
        "md5_number_lower('fim2|' || CAST(doc_id AS VARCHAR)) AS u2 FROM h1) h1) " +
        "SELECT doc_id, CAST(n AS INTEGER) AS n_tokens, s1, s2, " +
        "regexp_replace(trim(concat_ws(' ', '<PRE>', " +
        "array_to_string(t[1:s1], ' '), " +
        "'<SUF>', array_to_string(t[s2+1:n], ' '), " +
        "'<MID>', array_to_string(t[s1+1:s2], ' '))), ' +', ' ', 'g') " +
        "AS fim_text " +
        "FROM h2 ORDER BY doc_id")),

    ("ns_curate_span_corrupt",
      (s: SparkSession, d: String) => {
        import graft.operators.Augment
        Augment.spanCorrupt(Tables.documents(s, d), "doc_id", "text",
            nSpans = 2, spanLen = 3)
          .orderBy("doc_id")
      },
      Some("WITH tk AS (SELECT doc_id, " +
        "string_split_regex(lower(trim(text)), '\\s+') AS t, " +
        "CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS INTEGER) " +
        "AS n FROM documents), " +
        // window 0 = [0, n//2), window 1 = [n//2, n); span_i of up to 3
        // tokens at lo + h % (wlen - len + 1)
        "sp AS (SELECT tk.*, " +
        "CAST(CASE WHEN (n // 2) >= 1 THEN least(3, n // 2) ELSE 0 END " +
        "AS INTEGER) AS ln0, " +
        "CAST(CASE WHEN (n // 2) >= 1 THEN " + dHashModCol("u0",
          "greatest((n // 2) - least(3, n // 2) + 1, 1)") +
        " ELSE 0 END AS INTEGER) AS st0, " +
        "CAST(CASE WHEN (n - n // 2) >= 1 THEN least(3, n - n // 2) ELSE 0 END " +
        "AS INTEGER) AS ln1, " +
        "CAST((n // 2) + CASE WHEN (n - n // 2) >= 1 THEN " + dHashModCol("u1",
          "greatest((n - n // 2) - least(3, n - n // 2) + 1, 1)") +
        " ELSE 0 END AS INTEGER) AS st1 " +
        "FROM (SELECT tk.*, " +
        "md5_number_lower('sc0|' || CAST(doc_id AS VARCHAR)) AS u0, " +
        "md5_number_lower('sc1|' || CAST(doc_id AS VARCHAR)) AS u1 FROM tk) tk) " +
        "SELECT doc_id, CAST(n AS INTEGER) AS n_tokens, " +
        "regexp_replace(trim(concat_ws(' ', " +
        "array_to_string(t[1:st0], ' '), " +
        "CASE WHEN ln0 > 0 THEN '<X_0>' ELSE '' END, " +
        "array_to_string(t[st0+ln0+1:st1], ' '), " +
        "CASE WHEN ln1 > 0 THEN '<X_1>' ELSE '' END, " +
        "array_to_string(t[st1+ln1+1:n], ' '))), ' +', ' ', 'g') " +
        "AS inputs_text, " +
        "regexp_replace(trim(concat_ws(' ', " +
        "CASE WHEN ln0 > 0 THEN '<X_0>' ELSE '' END, " +
        "array_to_string(t[st0+1:st0+ln0], ' '), " +
        "CASE WHEN ln1 > 0 THEN '<X_1>' ELSE '' END, " +
        "array_to_string(t[st1+1:st1+ln1], ' '))), ' +', ' ', 'g') " +
        "AS targets_text " +
        "FROM sp ORDER BY doc_id")),

    // ---- WordPiece greedy encode against a char + top-50-word corpus
    // vocabulary, PREFIX-FREE (top words that prefix another token are
    // dropped) — the regime where greedy longest-match has a CLOSED FORM
    // (vocab word -> 1 piece, else 1 piece per character with ##
    // continuations) that the oracle replicates exactly. Without the
    // prefix filter the closed form breaks the moment a top word
    // prefixes a longer token — the 1M ScaleSmoke caught it. The general
    // greedy mechanics (multi-char prefixes, whole-word UNK) are pinned
    // by WordPieceSpec goldens + a serial-reference property. ----
    ("ns_text_wordpiece",
      (s: SparkSession, d: String) => {
        import graft.operators.WordPiece
        val docs = Tables.documents(s, d)
        WordPiece.encode(docs, "doc_id", "text",
            WordPiece.charWordVocab(docs, "text", topWords = 50,
              prefixFree = true))
          .select(col("doc_id"), col("n_pieces"),
            concat_ws(" ", col("pieces")).as("pieces_text"))
          .orderBy("doc_id")
      },
      Some("WITH tk AS (SELECT doc_id, unnest(t) AS w, " +
        "generate_subscripts(t, 1) AS pos FROM (SELECT doc_id, " +
        "string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents)), " +
        "tw AS (SELECT w FROM (SELECT w, count(*) AS cnt FROM tk GROUP BY 1 " +
        "ORDER BY cnt DESC, w LIMIT 50) t WHERE NOT EXISTS (" +
        "SELECT 1 FROM (SELECT DISTINCT w AS o FROM tk) d " +
        "WHERE d.o <> t.w AND starts_with(d.o, t.w))), " +
        "ch AS (SELECT doc_id, pos, w, unnest(string_split(w, '')) AS c, " +
        "generate_subscripts(string_split(w, ''), 1) AS ci FROM tk), " +
        "pw AS (SELECT doc_id, pos, w, " +
        "string_agg(CASE WHEN ci = 1 THEN c ELSE '##' || c END, ' ' " +
        "ORDER BY ci) AS char_form, count(*) AS n_chars " +
        "FROM ch GROUP BY 1, 2, 3), " +
        "pcs AS (SELECT doc_id, pos, " +
        "CASE WHEN w IN (SELECT w FROM tw) THEN w ELSE char_form END AS p, " +
        "CASE WHEN w IN (SELECT w FROM tw) THEN 1 ELSE n_chars END AS np " +
        "FROM pw) " +
        "SELECT doc_id, CAST(sum(np) AS INTEGER) AS n_pieces, " +
        "string_agg(p, ' ' ORDER BY pos) AS pieces_text " +
        "FROM pcs GROUP BY doc_id ORDER BY doc_id")),

    // ---- Unigram-LM (SentencePiece) Viterbi encode against the uniform
    // chars + SUBSTRING-FREE top-50-word vocabulary — under equal piece
    // probabilities Viterbi = minimal-piece segmentation, and substring
    // freedom gives it a closed form (vocab word -> 1 piece, any other
    // word can only segment per character) the oracle replicates exactly.
    // The trained-model path (EM probabilities, real Viterbi trade-offs)
    // is pinned by UnigramSpec and audited in ns_text_unigram_audit. ----
    ("ns_text_unigram_encode",
      (s: SparkSession, d: String) => {
        import graft.operators.Unigram
        val docs = Tables.documents(s, d)
        Unigram.encode(docs, "doc_id", "text",
            Unigram.uniformVocab(docs, "text", topWords = 50))
          .select(col("doc_id"), col("n_pieces"),
            concat_ws(" ", col("pieces")).as("pieces_text"))
          .orderBy("doc_id")
      },
      Some("WITH tk AS (SELECT doc_id, unnest(t) AS w, " +
        "generate_subscripts(t, 1) AS pos FROM (SELECT doc_id, " +
        "string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents)), " +
        "tw AS (SELECT w FROM (SELECT w, count(*) AS cnt FROM tk GROUP BY 1 " +
        "ORDER BY cnt DESC, w LIMIT 50) t WHERE NOT EXISTS (" +
        "SELECT 1 FROM (SELECT DISTINCT w AS o FROM tk) d " +
        "WHERE d.o <> t.w AND contains(d.o, t.w))), " +
        "ch AS (SELECT doc_id, pos, w, unnest(string_split(w, '')) AS c, " +
        "generate_subscripts(string_split(w, ''), 1) AS ci FROM tk), " +
        "pw AS (SELECT doc_id, pos, w, " +
        "string_agg(c, ' ' ORDER BY ci) AS char_form, count(*) AS n_chars " +
        "FROM ch GROUP BY 1, 2, 3), " +
        "pcs AS (SELECT doc_id, pos, " +
        "CASE WHEN w IN (SELECT w FROM tw) THEN w ELSE char_form END AS p, " +
        "CASE WHEN w IN (SELECT w FROM tw) THEN 1 ELSE n_chars END AS np " +
        "FROM pw) " +
        "SELECT doc_id, CAST(sum(np) AS INTEGER) AS n_pieces, " +
        "string_agg(p, ' ' ORDER BY pos) AS pieces_text " +
        "FROM pcs GROUP BY doc_id ORDER BY doc_id")),

    // EM-trained Unigram model (memoized like the BPE model) — rows-only
    // by design (iterative EM has no SQL form); every training invariant
    // is driver-checked by ns_text_unigram_audit below.
    ("ns_text_unigram_vocab",
      (s: SparkSession, d: String) =>
        unigramModel(s, d)
          .select(col("piece"), col("id"), round(col("llp"), 6).as("llp"))
          .orderBy("id"),
      None),

    // ---- subword regularization: SAMPLED Unigram segmentation against
    // the trained model (∝ Π p(piece)^0.5; content-addressed uniforms,
    // so the "random" corpus is a pure function of (seed, input)).
    // Rows-only by design — a sampled draw has no SQL form; the audit
    // below makes every invariant driver-visible. ----
    ("ns_text_unigram_sample",
      (s: SparkSession, d: String) => {
        import graft.operators.Unigram
        Unigram.sampleEncode(Tables.documents(s, d), "doc_id", "text",
            unigramModel(s, d), alpha = 0.5, seed = 1L)
          .select(col("doc_id"), col("n_pieces"),
            concat_ws(" ", col("pieces")).as("pieces_text"))
          .orderBy("doc_id")
      },
      None),

    // ---- tokenizer evaluation report: per-language fertility
    // (pieces/word — the number a tokenizer team tracks per language
    // before training) and compression (chars/piece), over the
    // closed-form uniform vocabulary so the whole report has a full
    // cross-engine oracle. Exact long ratios divided once and rounded 6.
    ("ns_text_tokenizer_stats",
      (s: SparkSession, d: String) => {
        import graft.operators.{TextOps, Unigram}
        val docs = Tables.documents(s, d)
        val enc = Unigram.encode(docs, "doc_id", "text",
          Unigram.uniformVocab(docs, "text", topWords = 50))
        val toks = TextOps.tokens(col("text"))
        enc.join(docs.select(col("doc_id"), col("lang"),
            size(filter(toks, w => length(w) > 0)).cast("long").as("nw"),
            aggregate(toks, lit(0L),
              (a, x) => a + length(x).cast("long")).as("nc")), "doc_id")
          .groupBy("lang").agg(
            count(lit(1)).as("n_docs"),
            sum("nw").as("n_words"),
            sum("n_pieces").cast("long").as("n_pieces"),
            sum("nc").as("n_chars"))
          .select(col("lang"), col("n_docs"), col("n_words"), col("n_pieces"),
            round(col("n_pieces").cast("double") / col("n_words"), 6)
              .as("fertility"),
            round(col("n_chars").cast("double") / col("n_pieces"), 6)
              .as("chars_per_piece"))
          .orderBy("lang")
      },
      Some("WITH tk AS (SELECT doc_id, unnest(t) AS w, " +
        "generate_subscripts(t, 1) AS pos FROM (SELECT doc_id, " +
        "string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents)), " +
        "tw AS (SELECT w FROM (SELECT w, count(*) AS cnt FROM tk GROUP BY 1 " +
        "ORDER BY cnt DESC, w LIMIT 50) t WHERE NOT EXISTS (" +
        "SELECT 1 FROM (SELECT DISTINCT w AS o FROM tk) d " +
        "WHERE d.o <> t.w AND contains(d.o, t.w))), " +
        "pw AS (SELECT doc_id, CASE WHEN w IN (SELECT w FROM tw) THEN 1 " +
        "ELSE len(w) END AS np, len(w) AS ncs FROM tk), " +
        "pd AS (SELECT doc_id, count(*) AS nw, sum(np) AS np, " +
        "sum(ncs) AS ncs FROM pw GROUP BY 1) " +
        "SELECT d.lang, count(*) AS n_docs, " +
        "CAST(sum(pd.nw) AS BIGINT) AS n_words, " +
        "CAST(sum(pd.np) AS BIGINT) AS n_pieces, " +
        "round(CAST(sum(pd.np) AS DOUBLE) / sum(pd.nw), 6) AS fertility, " +
        "round(CAST(sum(pd.ncs) AS DOUBLE) / sum(pd.np), 6) " +
        "AS chars_per_piece " +
        "FROM pd JOIN documents d USING (doc_id) " +
        "GROUP BY 1 ORDER BY 1")),

    // ---- constant-oracle AUDITS: spec-level invariants of the rows-only
    // operators, re-run inside the query and hashed against a
    // constant-true oracle (the ANN-recall pattern generalized). A
    // regression in any checked property flips a row to false and breaks
    // the hash. ----

    // BPE: the learned model equals the serial reference merge-for-merge;
    // the corpus-side token total equals the dictionary-side sum (two
    // independent computations of one number); the id stream decodes back
    // to the exact symbol stream.
    ("ns_text_bpe_audit",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val (mergesDf, vocabDf) = bpeModel(s, d)
        val words = Bpe.wordCounts(docs, "text").collect()
          .map(r => r.getAs[String]("word") -> r.getAs[Long]("cnt")).toSeq
        val serial = Bpe.learnLocal(words, Bpe.BpeConfig(numMerges = 20))._1
          .map(m => (m.rank, m.left, m.right, m.merged, m.pairCount))
        val stored = mergesDf.orderBy("rank").collect()
          .map(r => (r.getInt(0), r.getString(1), r.getString(2),
            r.getString(3), r.getLong(4))).toSeq
        val corpusSide = Bpe.encode(docs, "doc_id", "text", vocabDf)
          .agg(sum("n_bpe_tokens")).head().getLong(0)
        val dictSide = vocabDf.select(sum(col("cnt") * size(col("syms"))))
          .head().getLong(0)
        val symById = Bpe.symbolVocab(vocabDf).collect()
          .map(r => r.getAs[Int]("id") -> r.getAs[String]("token")).toMap
        val decoded = Bpe.encodeIds(docs, "doc_id", "text", vocabDf)
          .collect().map(r => r.getLong(0) ->
            r.getSeq[Int](2).map(symById).mkString(" ")).toMap
        val texts = Bpe.encode(docs, "doc_id", "text", vocabDf)
          .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
        auditDf(s, Seq(
          "merges_equal_serial" -> (stored == serial),
          "encode_conservation" -> (corpusSide == dictSide),
          "ids_decode_roundtrip" -> (decoded == texts)))
      },
      Some(auditOracleSql(Seq("merges_equal_serial", "encode_conservation",
        "ids_decode_roundtrip")))),

    // Unigram-LM: the distributed EM trainer equals the serial reference
    // bit-for-bit (the grid-arithmetic claim made measurable); the
    // trained model's probabilities normalize; Viterbi never scores below
    // the always-available char segmentation (optimality lower bound,
    // exact in nano-longs); the id stream decodes back to the pieces.
    ("ns_text_unigram_audit",
      (s: SparkSession, d: String) => {
        import graft.operators.{TextOps, Unigram}
        val docs = Tables.documents(s, d)
        val cfg = Unigram.UnigramConfig(vocabSize = 150, maxPieceLen = 4,
          seedSize = 300, emIters = 2)
        val words = Bpe.wordCounts(docs, "text")
        val serial = Unigram.trainLocal(words.collect()
          .map(r => (r.getString(0), r.getLong(1))).toSeq, cfg)
        val emEq = Unigram.trainDistributed(words, cfg).toSeq == serial.toSeq

        val model = unigramModel(s, d)
        val entries = model.select("piece", "llp_nano", "id").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
        val normOk = math.abs(
          entries.iterator.map(e => math.exp(e._2 / 1e9)).sum - 1.0) <= 1e-4

        val llpOf = entries.map(e => e._1 -> e._2).toMap
        val pieceOfId = entries.map(e => e._3 -> e._1).toMap
        val slice = docs.orderBy("doc_id").limit(600)
        val encoded = Unigram.encode(slice, "doc_id", "text", model)
          .select("doc_id", "pieces").collect()
          .map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
        val toks = slice.select(col("doc_id"),
            filter(TextOps.tokens(col("text")), w => length(w) > 0)
              .as("toks")).collect()
          .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
        val vitOk = encoded.forall { case (id, pieces) =>
          val vit = pieces.iterator.map(llpOf).sum // exact nano longs
          val charBase = toks(id).iterator
            .flatMap(_.split("").filter(_.nonEmpty)).map(llpOf).sum
          vit >= charBase
        }
        val idsOk = Unigram.encodeIds(slice, "doc_id", "text", model)
          .select("doc_id", "ids").collect()
          .map(r => r.getLong(0) -> r.getSeq[Int](1).map(pieceOfId))
          .toMap == encoded
        auditDf(s, Seq(
          "em_equals_serial" -> emEq,
          "probs_normalized" -> normOk,
          "viterbi_dominates_char_baseline" -> vitOk,
          "ids_decode_roundtrip" -> idsOk))
      },
      Some(auditOracleSql(Seq("em_equals_serial", "probs_normalized",
        "viterbi_dominates_char_baseline", "ids_decode_roundtrip")))),

    // Subword-regularization sampler: every sampled piece is a vocab
    // piece and concatenates back to the token stream; no draw ever
    // scores above Viterbi (optimality, exact nanos); the content-
    // addressed stream reruns identically; and the sampler actually
    // explores (some doc differs from argmax at alpha=0.5).
    ("ns_text_unigram_sample_audit",
      (s: SparkSession, d: String) => {
        import graft.operators.{TextOps, Unigram}
        val docs = Tables.documents(s, d).orderBy("doc_id").limit(600)
        val model = unigramModel(s, d)
        val llpOf = model.select("piece", "llp_nano").collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        def run() = Unigram.sampleEncode(docs, "doc_id", "text", model,
            alpha = 0.5, seed = 1L)
          .select("doc_id", "pieces").collect()
          .map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
        val samp = run()
        val vit = Unigram.encode(docs, "doc_id", "text", model)
          .select("doc_id", "pieces").collect()
          .map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
        val toks = docs.select(col("doc_id"),
            filter(TextOps.tokens(col("text")), w => length(w) > 0)
              .as("toks")).collect()
          .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
        val covOk = samp.forall { case (id, pieces) =>
          pieces.forall(llpOf.contains) &&
            pieces.mkString("") == toks(id).mkString("")
        }
        val boundOk = samp.forall { case (id, pieces) =>
          pieces.iterator.map(llpOf).sum <=
            vit(id).iterator.map(llpOf).sum
        }
        auditDf(s, Seq(
          "sample_covers_with_vocab_pieces" -> covOk,
          "sample_never_beats_viterbi" -> boundOk,
          "sample_rerun_identical" -> (run() == samp),
          "sample_explores_beyond_argmax" ->
            samp.exists { case (id, p) => p != vit(id) }))
      },
      Some(auditOracleSql(Seq("sample_covers_with_vocab_pieces",
        "sample_never_beats_viterbi", "sample_rerun_identical",
        "sample_explores_beyond_argmax")))),

    // LR: the distributed trainer's weights equal the serial reference
    // bit-for-bit; scoring thresholds exactly at p >= 0.5.
    ("ns_quality_lr_audit",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val b = Curation.hashBucket(col("doc_id"), 100)
        val train = docs.filter(b < 80)
        // serial reference trains CONCURRENTLY with the distributed loop
        // (r18, guide §2.6): it is one collect + pure driver CPU, fully
        // independent of lrTrain's iteration jobs
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        val serialFut = Future {
          val rows = train
            .select(col("text"), when(col("lang") === "en", 1L).otherwise(0L))
            .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
          Classifier.lrTrainSerial(rows, 1024, 5, 0.5).toSeq
        }
        val model = Classifier.lrTrain(train, "doc_id", "text",
          col("lang") === "en", buckets = 1024, iters = 5, learnRate = 0.5)
        val dist = model.orderBy("b").select("w_nano").collect()
          .map(_.getLong(0)).toSeq
        val serial = Await.result(serialFut,
          scala.concurrent.duration.Duration.Inf)
        val thrOk = Classifier.lrScore(docs.filter(b >= 80), "doc_id",
            "text", model, 1024)
          .filter((col("p") >= 0.5).cast("int") =!= col("predicted")).isEmpty
        auditDf(s, Seq(
          "weights_equal_serial" -> (dist == serial),
          "score_threshold_consistent" -> thrOk))
      },
      Some(auditOracleSql(Seq("weights_equal_serial",
        "score_threshold_consistent")))),

    // KLL quality floor: the sketch path's per-domain keep fraction
    // tracks the exact path within rank error (+ small-n granularity) —
    // one audited row per domain.
    ("ns_curate_quality_floor_audit",
      (s: SparkSession, d: String) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        def fracs(df: DataFrame) = df.groupBy("domain")
          .agg(count(lit(1)).as("n"), count(when(col("keep"), 1)).as("kept"))
          .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
          .toMap
        val exact = fracs(Curation.adaptiveQualityFloor(docs, "doc_id",
          "text", "source", floorQuantile = 0.2))
        val sk = fracs(Curation.adaptiveQualityFloorSketch(docs, "doc_id",
          "text", "source", floorQuantile = 0.2))
        exact.toSeq.map { case (dom, (n, kept)) =>
          val (ns, ks) = sk(dom)
          val tol = math.max(0.04, 2.5 / n)
          (dom, ns == n &&
            math.abs(ks.toDouble / ns - kept.toDouble / n) <= tol)
        }.toDF("domain", "within_tolerance").orderBy("domain")
      },
      Some("SELECT source AS domain, CAST(1 AS BOOLEAN) AS within_tolerance " +
        "FROM (SELECT DISTINCT source FROM documents) ORDER BY domain")),

    // HLL: approx_count_distinct lands within 3·rsd of the exact count
    // (rsd is a 1σ STANDARD deviation, not a bound — the first cut of
    // this audit at 1·rsd failed on real data, which is exactly the
    // property: default-rsd estimates routinely exceed 5%).
    ("ns_hll_audit",
      (s: SparkSession, d: String) => {
        val r = Tables.orders(s, d).agg(
          countDistinct(col("o_custkey")).as("exact"),
          approx_count_distinct(col("o_custkey"), 0.05).as("approx")).head()
        val (ex, ap) = (r.getLong(0), r.getLong(1))
        auditDf(s, Seq("approx_distinct_within_3rsd" ->
          (math.abs(ap - ex).toDouble / ex <= 0.15)))
      },
      Some(auditOracleSql(Seq("approx_distinct_within_3rsd")))),

    // SemDeDup with learned centroids: keep flags re-derived by an
    // INDEPENDENT driver-side union-find over the operator's own
    // within-cluster pair graph (min-id representative per component) —
    // plus the structural invariants: exactly one kept member per
    // component, and no pair crosses clusters.
    ("ns_dedup_semdedup_kmeans_audit",
      (s: SparkSession, d: String) => {
        val embs = Tables.embeddings(s, d)
        val rep = SemDedup.reportKMeans(embs, "vec_id", "embedding",
            Seq(s"$d/embeddings.parquet"), k = 8, iterations = 2, eps = 0.4)
          .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2))))
          .toMap
        val indexDir = graft.operators.IndexCatalog.ensure(s,
          "semdedup-kmeans", Seq(s"$d/embeddings.parquet"), "k=8,it=2")(dir =>
          graft.operators.IvfIndex.build(embs, "vec_id", "embedding", dir,
            8, 2))
        val centroids = s.read.parquet(s"$indexDir/centroids")
        val asg = SemDedup.assign(embs, "vec_id", "embedding", centroids)
        val prs = SemDedup.pairs(embs, "vec_id", "embedding", asg, eps = 0.4)
          .select("id_a", "id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
        // independent union-find, min-id representative
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        prs.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) {
            val (lo, hi) = (math.min(ra, rb), math.max(ra, rb))
            parent(hi) = lo
          }
        }
        val keepOk = rep.forall { case (id, (_, keep)) => keep == (find(id) == id) }
        val crossOk = prs.forall { case (a, b) => rep(a)._1 == rep(b)._1 }
        val groups = rep.keys.groupBy(find)
        val oneKeep = groups.forall { case (_, ids) =>
          ids.count(id => rep(id)._2) == 1 }
        auditDf(s, Seq(
          "keep_equals_union_find" -> keepOk,
          "pairs_stay_within_clusters" -> crossOk,
          "one_kept_per_component" -> oneKeep))
      },
      Some(auditOracleSql(Seq("keep_equals_union_find",
        "pairs_stay_within_clusters", "one_kept_per_component")))),

    // STREAMING surfaces, driver-visible: a real AvailableNow stream
    // through StreamingNb must derive the batch-identical model (counts
    // are batching-insensitive, so this is robust to micro-batch
    // boundaries); exact streaming dedup applied batch-by-batch in id
    // order must keep exactly the min-id per fingerprint; and the
    // incrementally-appended ANN index must probe identically to a
    // single-shot build (bucket content is a set union).
    ("ns_streaming_audit",
      (s: SparkSession, d: String) => {
        import graft.streaming.{StreamingAnnIndex, StreamingDedup, StreamingNb}
        val __t0 = System.nanoTime()
        def __mark(tag: String): Unit =
          if (sys.env.contains("GRAFT_AUDIT_TIMING"))
            println(f"AUDIT $tag%-12s ${(System.nanoTime() - __t0) / 1e9}%6.2f s")
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_stream_audit").toString
        // r18: the whole audit runs under a CLONED session (same
        // SparkContext, own conf) with shuffle partitions sized to the
        // 600-row audited slice — the NB stream's stateful micro-batches
        // and the dozens of tiny batch aggregates below each paid 32
        // shuffle/state partitions of fs+scheduler overhead for data
        // that fits in one. Every audited equality is
        // partitioning-independent (NB counts, min-id dedup, CMS sums,
        // bucket set unions), so the verdicts are unchanged.
        val ss = s.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "8")
        // equality is a property of the machinery, not the corpus size —
        // cap the audited slice so the bench entry stays O(constant)
        // while the gate-scale (sf0.01) run still covers every document
        val docs = Tables.documents(ss, d).filter(col("doc_id") < 600).cache()
        val parts = Seq(
          docs.filter(col("doc_id") < 300),
          docs.filter(col("doc_id") >= 300))

        // 1. real checkpointed stream -> NB counts. Started FIRST and
        // awaited LAST: stream startup + per-micro-batch checkpoint
        // latency is ~1-2 s each regardless of data size, so it runs
        // concurrently with the batch stages below instead of serializing
        // in front of them (this entry was 17% of the bench before).
        // One write job emits both micro-batch files (hash-partitioned on
        // the same 300-split; which file becomes which batch is
        // irrelevant — NB counts are batching-insensitive by design).
        val log = s"$tmp/log"
        docs.repartition(2, col("doc_id") < 300)
          .write.mode("append").parquet(log)
        __mark("log_written")
        val nbStream = StreamingNb.start(ss,
          ss.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1").parquet(log),
          s"$tmp/nb", s"$tmp/ckpt", "doc_id", "text", "lang", 512)

        __mark("nb_started")
        // 3. incrementally-built ANN index vs single-shot build — runs in
        // a Future so its jobs interleave with the dedup stage's (three
        // independent stacks; the equality claims are knob-independent,
        // so the audit uses SMALL layouts — 4 planes / 8 buckets — where
        // production-scale bucket counts would spend the whole budget
        // writing hundreds of tiny partition dirs per 600-row batch)
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        // batch-side NB reference model: independent of everything else —
        // trains concurrently, compared after the stream lands
        val nbBatchFut = Future {
          val (bm, bp) = Classifier.nbTrain(docs, "doc_id", "text", "lang", 512)
          (bm.collect().map(_.toSeq).toSet, bp.collect().map(_.toSeq).toSet)
        }
        // 4. streaming count-min grid vs the batch grid — sum-combinable
        // sketch equality, batching-insensitive like NB, so micro-batch
        // boundaries are free; independent stack, rides its own Future
        val cmsFut = Future {
          parts.zipWithIndex.foreach { case (p, i) =>
            graft.streaming.StreamingCms.upsertBatch(ss, p, i,
              s"$tmp/cms", "text", depth = 3, width = 32)
          }
          val streamed = graft.streaming.StreamingCms.read(ss, s"$tmp/cms")
            .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
            .toSet
          val batch = TextAnalysis.countMinGrid(docs, "text", 3, 32)
            .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
            .toSet
          streamed == batch
        }
        val annFut = Future {
          val embs = Tables.embeddings(ss, d).filter(col("vec_id") < 600)
          val eParts = Seq(embs.filter(col("vec_id") % 2 === 0),
            embs.filter(col("vec_id") % 2 === 1))
          eParts.foreach(p => StreamingAnnIndex.appendBatch(p, "vec_id",
            "embedding", s"$tmp/ann_inc", numPlanes = 4))
          StreamingAnnIndex.appendBatch(embs, "vec_id", "embedding",
            s"$tmp/ann_once", numPlanes = 4)
          val qv = queryVec(embs, 0L)
          def probe(dir: String) = StreamingAnnIndex
            .probeTopK(ss, dir, qv, k = 10, numPlanes = 4)
            .collect().map(_.toSeq).toSeq
          probe(s"$tmp/ann_inc") == probe(s"$tmp/ann_once")
        }

        // batch-side dedup reference — independent of the streamed chain,
        // so it rides its own Future like the NB reference (r18)
        val batchKeepFut = Future {
          docs.groupBy(md5(graft.operators.TextOps.normalized(col("text"))))
            .agg(min("doc_id").as("keep"))
            .select("keep").collect().map(_.getLong(0)).toSet
        }
        // 2. exact streaming dedup, id-ordered batches (order-dependent —
        // stays sequential on this thread)
        parts.foreach(p => StreamingDedup.dedupBatch(ss, p, "doc_id", "text",
          s"$tmp/dd_idx", s"$tmp/dd_out", numBuckets = 8))
        val streamedKeep = ss.read.parquet(s"$tmp/dd_out")
          .select("doc_id").collect().map(_.getLong(0)).toSet
        val ddEq = streamedKeep == Await.result(batchKeepFut,
          scala.concurrent.duration.Duration.Inf)
        __mark("dedup_done")

        val annEq = Await.result(annFut,
          scala.concurrent.duration.Duration.Inf)
        val cmsEq = Await.result(cmsFut,
          scala.concurrent.duration.Duration.Inf)
        __mark("ann_done")

        // stream done by now (or we wait out its tail), then compare
        nbStream.awaitTermination()
        __mark("nb_awaited")
        val (sm, sp) = StreamingNb.currentModel(ss, s"$tmp/nb", 512)
        def rowSet(df: DataFrame) = df.collect().map(_.toSeq).toSet
        val (bmSet, bpSet) = Await.result(nbBatchFut,
          scala.concurrent.duration.Duration.Inf)
        val nbEq = rowSet(sm) == bmSet && rowSet(sp) == bpSet
        docs.unpersist()
        __mark("nb_compared")

        auditDf(s, Seq(
          "streaming_nb_equals_batch" -> nbEq,
          "streaming_dedup_keeps_min_id" -> ddEq,
          "streaming_ann_probe_equals_batch" -> annEq,
          "streaming_cms_grid_equals_batch" -> cmsEq))
      },
      Some(auditOracleSql(Seq("streaming_nb_equals_batch",
        "streaming_dedup_keeps_min_id", "streaming_ann_probe_equals_batch",
        "streaming_cms_grid_equals_batch")))),

    // Event-time windows through the WATERMARKED streaming aggregate
    // (T11's streaming twin; EventTimeWindow) — its own declared entry
    // (split out of ns_streaming_audit in r18 so bench attributes the
    // checkpointed-stream cost per leg and a regression names its leg):
    // replay a bounded event log in micro-batches with a
    // watermark-advancing sentinel as the deterministic LAST file; the
    // append-mode sink of FINALIZED windows must equal the batch
    // groupBy(window(ts)) aggregate — for BOTH the tumbling shape and the
    // r17 sliding shape (slide < width, the q14b semantics) — and a
    // checkpoint restart over the same log must emit nothing new
    // (exactly-once per window).
    ("ns_streaming_audit_win",
      (s: SparkSession, d: String) => {
        import s.implicits._
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_stream_audit_win").toString
        val ev = Tables.events(s, d).filter(col("event_id") < 2000)
          .select("event_id", "ts", "event_type", "value")
        // ONE data file per write (coalesce(1)), asserted: with several
        // same-modTime files per half, FileStreamSource consumes them in
        // ARBITRARY order at maxFilesPerTrigger=1, and a sibling holding
        // older ts than an already-processed one is watermark-dropped —
        // empirically the sink then diverges nondeterministically. One
        // file per half = exactly three batches in modTime order.
        def writeTimed(wlog: String, df: DataFrame, modTime: Long): Unit = {
          val dir = new java.io.File(wlog)
          val before = Option(dir.listFiles())
            .map(_.map(_.getName).toSet).getOrElse(Set.empty[String])
          df.coalesce(1).write.mode("append").parquet(wlog)
          // exclude _SUCCESS and the hidden .crc twins, like the source does
          val fresh = dir.listFiles().filter(f => !before(f.getName) &&
            !f.getName.startsWith("_") && !f.getName.startsWith("."))
          require(fresh.length == 1,
            s"audit invariant: expected 1 data file per write, got ${fresh.length}")
          require(fresh.head.setLastModified(modTime),
            s"audit invariant: cannot set modTime on ${fresh.head}")
        }
        val sentinelTs = ev.agg(max("ts")).head()
          .getAs[java.time.LocalDateTime](0).plusDays(2)
        val t0 = System.currentTimeMillis() - 120000
        // r18 optimization (guide §2.6, overlap independent jobs): the
        // two window shapes used to run SEQUENTIALLY over one shared log
        // because two concurrent streams over one FileStreamSource dir
        // would race the modTime-ordered consumption. Giving each shape
        // its OWN log directory (3 tiny writes each, identical halves
        // and mod times) removes the shared-source race entirely, so the
        // two shape chains — each still internally sequential
        // (run → compare → restart → compare, the restart needs its own
        // checkpoint) — run CONCURRENTLY. Per-micro-batch checkpoint
        // latency is wall-clock-bound, not CPU-bound, so the overlap
        // halves the entry's cost (measured ~9.5 s → ~5 s at sf0.1);
        // every equality compared is computed exactly as before.
        // explicit mod times: FileStreamSource orders by modTime, and a
        // sentinel processed FIRST would watermark-drop every real event
        Seq("tumble", "slide").foreach { tag =>
          val wlog = s"$tmp/win_log_$tag"
          writeTimed(wlog, ev.filter(col("event_id") % 2 === 0), t0)
          writeTimed(wlog, ev.filter(col("event_id") % 2 === 1), t0 + 10000)
          writeTimed(wlog, Seq((-1L, sentinelTs, "__sentinel", 0.0))
            .toDF("event_id", "ts", "event_type", "value"), t0 + 20000)
        }
        // r18: the streams run from a CLONED session (same SparkContext,
        // own conf) with shuffle partitions sized to the audited slice —
        // a stateful micro-batch opens/commits one state-store instance
        // per shuffle partition per batch, so 32 state partitions for a
        // 2 000-event slice pay 8× the checkpoint fs-ops the data needs.
        // Sizing state partitions to load is the production posture;
        // the windowed sums are partitioning-independent (exact decimal).
        val ss = s.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "4")
        def runShape(tag: String, slide: String): (Boolean, Boolean) = {
          def run(): Unit = graft.streaming.EventTimeWindow.start(ss,
            ss.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", "1").parquet(s"$tmp/win_log_$tag"),
            "ts", Seq("event_type"), Seq("value"), "1 hour", "1 second",
            s"$tmp/out_$tag", s"$tmp/ckpt_$tag", slide = slide)
            .awaitTermination()
          run()
          def sink() = s.read.parquet(s"$tmp/out_$tag")
            .filter(col("event_type") =!= "__sentinel")
            .collect().map(_.toSeq).toSet
          val first = sink()
          val want = graft.streaming.EventTimeWindow.batchReference(ev,
            "ts", Seq("event_type"), Seq("value"), "1 hour", slide = slide)
            .collect().map(_.toSeq).toSet
          run() // restart, same checkpoint, no new data
          (first == want, sink() == want)
        }
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        import scala.concurrent.duration.Duration
        val tumbleFut = Future(runShape("tumble", ""))
        val slideFut = Future(runShape("slide", "30 minutes"))
        val (tumbleEq, tumbleRestart) = Await.result(tumbleFut, Duration.Inf)
        val (slideEq, slideRestart) = Await.result(slideFut, Duration.Inf)
        auditDf(s, Seq(
          "streaming_window_equals_batch" -> tumbleEq,
          "streaming_window_restart_emits_nothing" -> tumbleRestart,
          "streaming_sliding_equals_batch" -> slideEq,
          "streaming_sliding_restart_emits_nothing" -> slideRestart))
      },
      Some(auditOracleSql(Seq("streaming_window_equals_batch",
        "streaming_window_restart_emits_nothing",
        "streaming_sliding_equals_batch",
        "streaming_sliding_restart_emits_nothing")))),

    // MMR (diversifying lambda): k rows, the first pick is the relevance
    // top-1, and every pick comes from the top-k·factor candidate pool.
    ("ns_ann_mmr_audit",
      (s: SparkSession, d: String) => {
        val embs = Tables.embeddings(s, d)
        val mmr = Similarity.mmrTopK(embs, "vec_id", "embedding",
            queryId = 0, k = 10, lambda = 0.6)
          .orderBy("rank").select("vec_id").collect().map(_.getLong(0)).toSeq
        val cands = Similarity.bruteForceTopK(embs, "vec_id", "embedding",
            queryId = 0, k = 40)
          .select("vec_id").collect().map(_.getLong(0)).toSeq
        auditDf(s, Seq(
          "k_rows" -> (mmr.length == 10),
          "head_is_relevance_top1" -> (mmr.head == cands.head),
          "subset_of_candidates" -> mmr.forall(cands.contains)))
      },
      Some(auditOracleSql(Seq("k_rows", "head_is_relevance_top1",
        "subset_of_candidates")))),

    // ---- incremental cluster maintenance: resident corpus clustered
    // first, the delta's pairs folded in via the spanning-forest merge —
    // PROVEN equal to the full recompute by sharing its oracle ----
    ("ns_dedup_clusters_merge",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val half = docs.agg(max("doc_id")).head().getLong(0) / 2
        val allPairs = Dedup.minhashLshPairs(docs, "doc_id", "text", 0.8)
          .select("id_a", "id_b").cache()
        try {
          val resident = Dedup.dupClusters(
            allPairs.filter(col("id_a") <= half && col("id_b") <= half),
            docs.filter(col("doc_id") <= half), "doc_id")
          val delta = allPairs.filter(col("id_a") > half ||
            col("id_b") > half)
          Dedup.mergeClusters(resident, delta, docs, "doc_id").orderBy("id")
        } finally allPairs.unpersist()
      },
      // the FULL-recompute oracle, verbatim from ns_dedup_clusters: the
      // driver hash proves merge ≡ from-scratch
      Some(shingleCte +
        ", dup AS (SELECT id_a, id_b FROM pairs " +
        "JOIN sizes s1 ON id_a = s1.doc_id JOIN sizes s2 ON id_b = s2.doc_id " +
        "WHERE CAST(inter AS DOUBLE)/(s1.n + s2.n - inter) >= 0.8), " +
        "edges AS (SELECT id_a AS a, id_b AS b FROM dup " +
        "UNION ALL SELECT id_b, id_a FROM dup), " +
        "closure AS (WITH RECURSIVE reach(id, r) AS (" +
        "SELECT a, a FROM (SELECT DISTINCT a FROM edges) " +
        "UNION SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id) " +
        "SELECT id, min(r) AS cluster FROM reach GROUP BY id) " +
        "SELECT d.doc_id AS id, coalesce(c.cluster, d.doc_id) AS cluster " +
        "FROM documents d LEFT JOIN closure c ON d.doc_id = c.id ORDER BY id")),

    // ---- topic labels per lexical dup-cluster: top-3 most-distinctive
    // tokens by exact-integer cluster-vs-corpus df ratio ----
    ("ns_dedup_cluster_labels",
      (s: SparkSession, d: String) =>
        TextAnalysis.clusterLabels(Tables.documents(s, d), "doc_id", "text",
            dupClusterTable(s, d))
          .orderBy("cluster", "rank"),
      Some(shingleCte +
        ", dup AS (SELECT id_a, id_b FROM pairs " +
        "JOIN sizes s1 ON id_a = s1.doc_id JOIN sizes s2 ON id_b = s2.doc_id " +
        "WHERE CAST(inter AS DOUBLE)/(s1.n + s2.n - inter) >= 0.8), " +
        "edges AS (SELECT id_a AS a, id_b AS b FROM dup " +
        "UNION ALL SELECT id_b, id_a FROM dup), " +
        "closure AS (WITH RECURSIVE reach(id, r) AS (" +
        "SELECT a, a FROM (SELECT DISTINCT a FROM edges) " +
        "UNION SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id) " +
        "SELECT id, min(r) AS cluster FROM reach GROUP BY id), " +
        "lab AS (SELECT d.doc_id AS id, coalesce(c.cluster, d.doc_id) AS cluster " +
        "FROM documents d LEFT JOIN closure c ON d.doc_id = c.id), " +
        "tk AS (SELECT DISTINCT doc_id AS id, unnest(" +
        "string_split_regex(lower(trim(text)), '\\s+')) AS token " +
        "FROM documents), " +
        "tk2 AS (SELECT id, token FROM tk WHERE token <> ''), " +
        "dfg AS (SELECT token, count(*) AS dfg FROM tk2 GROUP BY token), " +
        "szs AS (SELECT cluster, count(*) AS members FROM lab " +
        "GROUP BY cluster HAVING count(*) >= 2), " +
        "dfc AS (SELECT l.cluster, t.token, count(*) AS dfc FROM tk2 t " +
        "JOIN lab l ON l.id = t.id " +
        "JOIN szs z ON z.cluster = l.cluster " +
        "GROUP BY l.cluster, t.token HAVING count(*) >= 2), " +
        "sc2 AS (SELECT c2.cluster, c2.token, c2.dfc, g.dfg, " +
        "(c2.dfc * 1000000) // g.dfg AS score, " +
        "row_number() OVER (PARTITION BY c2.cluster " +
        "ORDER BY (c2.dfc * 1000000) // g.dfg DESC, c2.token) AS rank " +
        "FROM dfc c2 JOIN dfg g ON g.token = c2.token) " +
        "SELECT cluster, CAST(rank AS INT) AS rank, token, dfc, dfg, score " +
        "FROM sc2 WHERE rank <= 3 ORDER BY cluster, rank")),

    // ---- per-domain Tukey-fence outlier report (pre-release data
    // screen): quartiles of integer lengths are exact binary rationals,
    // so the fences and strict comparisons are cross-engine safe ----
    ("ns_curate_outliers",
      (s: SparkSession, d: String) =>
        Curation.outlierReport(Tables.documents(s, d), "source", "n_chars")
          .orderBy("domain"),
      Some("WITH f AS (SELECT source AS domain, count(*) AS n, " +
        "quantile_cont(n_chars, 0.25) AS q1, " +
        "quantile_cont(n_chars, 0.75) AS q3 FROM documents GROUP BY source), " +
        "fx AS (SELECT *, q1 - 1.5*(q3 - q1) AS lo, q3 + 1.5*(q3 - q1) AS hi " +
        "FROM f) " +
        "SELECT d.source AS domain, " +
        "CAST(min(fx.n) AS BIGINT) AS n, " +
        "round(min(fx.q1), 4) AS q1, round(min(fx.q3), 4) AS q3, " +
        "round(min(fx.lo), 4) AS lo, round(min(fx.hi), 4) AS hi, " +
        "CAST(count(CASE WHEN d.n_chars < fx.lo THEN 1 END) AS BIGINT) AS n_low, " +
        "CAST(count(CASE WHEN d.n_chars > fx.hi THEN 1 END) AS BIGINT) AS n_high " +
        "FROM documents d JOIN fx ON d.source = fx.domain " +
        "GROUP BY d.source ORDER BY domain")),

    // ---- skew-robust z-order: KLL-quantile (equal-population) cells on
    // an exponentially-skewed dim. Sketch boundaries are approximate, so
    // this path has no bit oracle (rows-only) — the audit below is the
    // driver-visible proof. ----
    // Hash-oracled from the fed quantile BOUNDS (round 14): the KLL
    // boundaries publish per dimension and DuckDB replays the whole
    // placement — count-of-boundaries bucketing, the 2×6-bit Morton
    // interleave, the z_bin shift — in exact integer arithmetic (and
    // recomputes the md5-derived skew key itself: md5_lower64 is
    // md5_number_lower-compatible by construction). Sketch compaction
    // stays engine-side, balance-audited by ns_layout_skew_audit. ----
    ("ns_layout_zorder_skew",
      (s: SparkSession, d: String) => {
        // fanned out (r18): the md5-derived skew key is recomputed by TWO
        // downstream scans (sketch pass + placement pass), each serial on
        // the single-row-group events scan without it
        val ev = Tables.fanOut(Tables.events(s, d)
            .select("event_id", "user_id"), col("event_id"))
          .select(col("event_id"), col("user_id"),
            pow(lit(2.0),
              pmod(graft.functions.md5_lower64(col("event_id").cast("string")),
                lit(20L))).cast("long").as("sk"))
        val bounds = graft.operators.Layout.quantileBounds(ev,
          Seq("sk", "user_id"), bits = 6)
        import s.implicits._
        OracleFeed.publish("ns_layout_zorder_skew", "bounds",
          bounds.zipWithIndex.map { case (b, i) => (i, b.toSeq) }
            .toDF("dim", "bounds"))
        graft.operators.Layout.zorderWithQuantileBounds(ev,
            Seq("sk", "user_id"), bounds, bits = 6, log2Bins = 6)
          .select("event_id", "z_bin").orderBy("event_id")
      },
      Some("WITH bnd AS (SELECT dim, bounds FROM " +
        OracleFeed.sqlPath("ns_layout_zorder_skew", "bounds") + "), " +
        "b0s AS (SELECT bounds AS bounds0 FROM bnd WHERE dim = 0), " +
        "b1s AS (SELECT bounds AS bounds1 FROM bnd WHERE dim = 1), " +
        // md5_number_lower is UNSIGNED in DuckDB; the engine's md5_lower64
        // is the SIGNED two's-complement long, so re-sign through HUGEINT
        // before the pmod or residues diverge by 2^64 mod 20
        "h AS (SELECT event_id, user_id, " +
        "CAST(md5_number_lower(CAST(event_id AS VARCHAR)) AS HUGEINT) - " +
        "(CASE WHEN md5_number_lower(CAST(event_id AS VARCHAR)) >= " +
        "9223372036854775808 THEN 18446744073709551616::HUGEINT " +
        "ELSE 0::HUGEINT END) AS hs FROM events), " +
        "ev AS (SELECT event_id, CAST(user_id AS DOUBLE) AS ud, " +
        "pow(2.0, CAST(((hs % 20) + 20) % 20 AS DOUBLE)) AS skd FROM h), " +
        "b AS (SELECT e.event_id, " +
        "len(list_filter(bounds0, bd -> e.skd >= bd)) AS b0, " +
        "len(list_filter(bounds1, bd -> e.ud >= bd)) AS b1 " +
        "FROM ev e CROSS JOIN b0s CROSS JOIN b1s) " +
        "SELECT event_id, CAST((" +
        (0 until 6).map(i =>
          s"(((b0 >> $i) & 1) << ${2 * i + 1}) | (((b1 >> $i) & 1) << ${2 * i})")
          .mkString(" | ") +
        ") >> 6 AS BIGINT) AS z_bin FROM b ORDER BY event_id")),

    // ---- the balance audit: min-max cells on the skewed dim dump most
    // rows into one bin (pruning dies); quantile cells bound the max bin
    // share. Constant oracle — both claims re-proven every gate run. ----
    ("ns_layout_skew_audit",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d).select(col("event_id"),
          pow(lit(2.0),
            pmod(graft.functions.md5_lower64(col("event_id").cast("string")),
              lit(20L))).cast("long").as("sk"))
        val n = ev.count().toDouble
        def maxShare(binned: DataFrame): Double =
          binned.groupBy("z_bin").agg(count(lit(1)).as("c"))
            .agg(max("c")).head().getLong(0) / n
        val mm = maxShare(graft.operators.Layout.zorderBy(ev,
          Seq("sk"), bits = 6, log2Bins = 6))
        val qt = maxShare(graft.operators.Layout.zorderByQuantiles(ev,
          Seq("sk"), bits = 6, log2Bins = 6))
        auditDf(s, Seq(
          "minmax_degenerates_on_skew" -> (mm >= 0.5),
          "quantile_cells_stay_balanced" -> (qt <= 0.2),
          "quantile_beats_minmax" -> (qt < mm)))
      },
      Some(auditOracleSql(Seq("minmax_degenerates_on_skew",
        "quantile_cells_stay_balanced", "quantile_beats_minmax")))),

    // ---- fuzzy (edit-distance) self-join: q-gram prefix filtering +
    // exact Levenshtein verify; keys are 24-char doc prefixes with
    // content-addressed planted typos on odd ids, so true pairs exist at
    // distances 0/1/2. The oracle is BRUTE FORCE over all pairs — every
    // run re-proves the prefix filter lossless on real data. ----
    ("ns_text_fuzzy_join",
      (s: SparkSession, d: String) => {
        val keyed = Tables.documents(s, d).select(col("doc_id"),
            substring(regexp_replace(lower(trim(col("text"))), "\\s+", " "),
              1, 24).as("k"),
            (pmod(graft.functions.md5_lower64(col("doc_id").cast("string")),
              lit(20L)) + 1).cast("int").as("p"),
            pmod(graft.functions.md5_lower64(
              concat(col("doc_id").cast("string"), lit("t"))),
              lit(26L)).cast("int").as("cm"))
          .select(col("doc_id"),
            when(col("doc_id") % 2 === 1,
              expr("concat(substring(k, 1, p - 1), char(97 + cm), " +
                "substring(k, p + 1, 24))"))
              .otherwise(col("k")).as("key"))
        // q=6, not the default 3: this synthetic corpus has only ~375
        // distinct 3-grams, so 3-gram prefix groups go hot (4.9M
        // candidates measured at sf0.1 vs 1.0M at q=6) — the scaladoc's
        // q-selection law applied
        graft.operators.FuzzyJoin.selfJoin(keyed, "doc_id", "key",
            maxDist = 2, q = 6)
          .orderBy("id_a", "id_b")
      },
      Some("WITH k0 AS (SELECT doc_id, " +
        "substr(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), 1, 24) AS k " +
        "FROM documents), " +
        "tp AS (SELECT doc_id, k, 1 + " +
        dHashMod("md5_number_lower(CAST(doc_id AS VARCHAR))", 20L) + " AS p, " +
        dHashMod("md5_number_lower(CAST(doc_id AS VARCHAR) || 't')", 26L) +
        " AS cm FROM k0), " +
        "ky AS (SELECT doc_id, CASE WHEN doc_id % 2 = 1 THEN " +
        "concat(substr(k, 1, CAST(p-1 AS INT)), chr(CAST(97 + cm AS INT)), " +
        "substr(k, CAST(p+1 AS INT), 24)) ELSE k END AS key FROM tp), " +
        "pd AS (SELECT doc_id, rpad(key, 24, '#') AS key FROM ky) " +
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "CAST(levenshtein(a.key, b.key) AS INT) AS dist " +
        "FROM pd a JOIN pd b ON a.doc_id < b.doc_id " +
        "WHERE levenshtein(a.key, b.key) <= 2 " +
        "ORDER BY id_a, id_b")),

    // ---- fuzzy LOOKUP (two-table): typo'd keys (odd ids) matched
    // against the clean dictionary (even ids) — the reference-data
    // cleanup shape, same brute-force oracle proof ----
    ("ns_text_fuzzy_lookup",
      (s: SparkSession, d: String) => {
        val keyed = Tables.documents(s, d).select(col("doc_id"),
            substring(regexp_replace(lower(trim(col("text"))), "\\s+", " "),
              1, 24).as("k"),
            (pmod(graft.functions.md5_lower64(col("doc_id").cast("string")),
              lit(20L)) + 1).cast("int").as("p"),
            pmod(graft.functions.md5_lower64(
              concat(col("doc_id").cast("string"), lit("t"))),
              lit(26L)).cast("int").as("cm"))
        val dirty = keyed.filter(col("doc_id") % 2 === 1)
          .select(col("doc_id"),
            expr("concat(substring(k, 1, p - 1), char(97 + cm), " +
              "substring(k, p + 1, 24))").as("key"))
        val dict = keyed.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("k").as("key"))
        graft.operators.FuzzyJoin.join(dirty, "doc_id", "key",
            dict, "doc_id", "key", maxDist = 2, q = 6)
          .orderBy("id_l", "id_r")
      },
      Some("WITH k0 AS (SELECT doc_id, " +
        "substr(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), 1, 24) AS k " +
        "FROM documents), " +
        "tp AS (SELECT doc_id, k, 1 + " +
        dHashMod("md5_number_lower(CAST(doc_id AS VARCHAR))", 20L) + " AS p, " +
        dHashMod("md5_number_lower(CAST(doc_id AS VARCHAR) || 't')", 26L) +
        " AS cm FROM k0), " +
        "dirty AS (SELECT doc_id, rpad(concat(substr(k, 1, CAST(p-1 AS INT)), " +
        "chr(CAST(97 + cm AS INT)), substr(k, CAST(p+1 AS INT), 24)), 24, '#') AS key " +
        "FROM tp WHERE doc_id % 2 = 1), " +
        "dict AS (SELECT doc_id, rpad(k, 24, '#') AS key FROM tp " +
        "WHERE doc_id % 2 = 0) " +
        "SELECT a.doc_id AS id_l, b.doc_id AS id_r, " +
        "CAST(levenshtein(a.key, b.key) AS INT) AS dist " +
        "FROM dirty a JOIN dict b ON levenshtein(a.key, b.key) <= 2 " +
        "ORDER BY id_l, id_r")),

    // ---- score propagation over the exact KNN graph (label spreading,
    // Zhou et al. NIPS'04): seeds are content-addressed micro-unit
    // scores, two all-integer iterations (rational HALF_UP divisions),
    // so the whole trajectory hash-matches SQL. INTEGER-EXACT END TO
    // END (the r11 lesson): the graph itself is derived from the
    // fixed-point integer dot product (Similarity.intDotTopKBatch —
    // exact IEEE quantization, exact int64 ranking, w = HALF_UP
    // rational of the dot), because the previous rounded-double cosine
    // ranking sat within 3.6e-9 of a .0005 rounding boundary over the
    // all-pairs relation — any engine-build float deviation flipped an
    // edge weight and broke the hash. Here no double ever crosses the
    // engine boundary. The exact graph is the oracle-able baseline;
    // production propagates over KnnGraph.build's IVF graph (identical
    // operator, graph swapped). ----
    ("ns_ann_score_propagation",
      (s: SparkSession, d: String) => {
        val embs = Tables.embeddings(s, d)
        val seeds = embs.select(col("vec_id"),
          pmod(graft.functions.md5_lower64(col("vec_id").cast("string")),
            lit(1000001L)).as("s0"))
        graft.operators.KnnGraph.propagateWeighted(intdotEdges(s, d), seeds,
            "vec_id", "s0", alphaNum = 4, alphaDen = 5, iters = 2)
          .orderBy("id")
      },
      Some(intdotGraphCte +
        ", seeds AS (SELECT vec_id AS id, " +
        dHashMod("md5_number_lower(CAST(vec_id AS VARCHAR))", 1000001L) +
        " AS s0 FROM embeddings), " +
        "a1 AS (SELECT g.id, sum(g.w * s.s0) AS num, sum(g.w) AS den " +
        "FROM g JOIN seeds s ON g.nbr = s.id GROUP BY g.id), " +
        "s1 AS (SELECT s.id, s.s0, (2 * (1 * s.s0 + 4 * " +
        "CASE WHEN a1.den IS NOT NULL THEN (2*a1.num + a1.den) // (2*a1.den) " +
        "ELSE s.s0 END) + 5) // 10 AS s " +
        "FROM seeds s LEFT JOIN a1 ON s.id = a1.id), " +
        "a2 AS (SELECT g.id, sum(g.w * s1.s) AS num, sum(g.w) AS den " +
        "FROM g JOIN s1 ON g.nbr = s1.id GROUP BY g.id), " +
        "s2 AS (SELECT s1.id, s1.s0, (2 * (1 * s1.s0 + 4 * " +
        "CASE WHEN a2.den IS NOT NULL THEN (2*a2.num + a2.den) // (2*a2.den) " +
        "ELSE s1.s END) + 5) // 10 AS s " +
        "FROM s1 LEFT JOIN a2 ON s1.id = a2.id) " +
        // sum() promotes to HUGEINT in DuckDB and // propagates it; the
        // engine emits int64, and the driver hashes the Arrow-typed
        // encoding, so every sum-derived output must be CAST back to
        // BIGINT (the ns_corpus_drift convention).
        "SELECT id, CAST(s0 AS BIGINT) AS s0, CAST(s AS BIGINT) AS s " +
        "FROM s2 ORDER BY id")),

    // ---- the exact integer-dot KNN graph itself, fully hashed: the
    // graph every ns_ann_* graph-analytics query consumes, dumped as
    // (id, nbr, w) — promotes the family's graph derivation from
    // rows-only (the IVF ns_ann_knn_graph stays the scale path, audited
    // by ns_ann_knn_recall) to a driver-hashed artifact. ----
    ("ns_ann_knn_graph_exact",
      (s: SparkSession, d: String) =>
        intdotEdges(s, d).orderBy("id", "nbr"),
      Some(intdotGraphCte +
        " SELECT id, nbr, w FROM g ORDER BY id, nbr")),

    // ---- weighted PageRank over the exact KNN graph — centrality as a
    // curation signal (prototypes rank high, leaves low), two
    // all-integer damped iterations (per-edge HALF_UP flows, dangling
    // mass dropped by contract), so the full trajectory hash-matches
    // SQL like the propagation twin. ----
    ("ns_ann_pagerank",
      (s: SparkSession, d: String) =>
        graft.operators.KnnGraph.pageRank(intdotEdges(s, d),
            Tables.embeddings(s, d), "vec_id",
            dampNum = 85, dampDen = 100, iters = 2)
          .orderBy("id"),
      Some(intdotGraphCte +
        ", nodes AS (SELECT vec_id AS id FROM embeddings), " +
        "ow AS (SELECT id, sum(w) AS wt FROM g GROUP BY id), " +
        "c1 AS (SELECT g.nbr AS id, " +
        "sum((2 * 1000000 * g.w + ow.wt) // (2 * ow.wt)) AS infl " +
        "FROM g JOIN ow ON g.id = ow.id GROUP BY g.nbr), " +
        "s1 AS (SELECT n.id, (2 * (15 * 1000000 + " +
        "85 * coalesce(c1.infl, 0)) + 100) // 200 AS s " +
        "FROM nodes n LEFT JOIN c1 ON n.id = c1.id), " +
        "c2 AS (SELECT g.nbr AS id, " +
        "sum((2 * s1.s * g.w + ow.wt) // (2 * ow.wt)) AS infl " +
        "FROM g JOIN ow ON g.id = ow.id JOIN s1 ON g.id = s1.id " +
        "GROUP BY g.nbr), " +
        "s2 AS (SELECT n.id, (2 * (15 * 1000000 + " +
        "85 * coalesce(c2.infl, 0)) + 100) // 200 AS s " +
        "FROM nodes n LEFT JOIN c2 ON n.id = c2.id) " +
        // CAST: sum-derived // output is HUGEINT; engine emits int64.
        "SELECT id, CAST(s AS BIGINT) AS s FROM s2 ORDER BY id")),

    // ---- MASS-CONSERVING PageRank: the classic formulation a curation
    // user expects from the name — each iteration the score mass
    // stranded on dangling nodes (no out-edges) is redistributed
    // uniformly inside the damped term, HALF_UP on the micro-unit grid
    // (one global 1-row dangling-sum aggregate per iteration). The
    // intdot KNN graph has NO dangling nodes (every vector emits top-k
    // edges), so the edge set drops sources with id % 7 == 0: ~1/7 of
    // the nodes become dangling and the conservation path is actually
    // exercised, not vacuously green. ----
    ("ns_ann_pagerank_conserve",
      (s: SparkSession, d: String) =>
        graft.operators.KnnGraph.pageRank(
            intdotEdges(s, d).filter(col("id") % 7 =!= 0),
            Tables.embeddings(s, d), "vec_id",
            dampNum = 85, dampDen = 100, iters = 2,
            conserveDangling = true)
          .orderBy("id"),
      Some(intdotGraphCte +
        ", g2 AS (SELECT * FROM g WHERE id % 7 <> 0), " +
        "nodes AS (SELECT vec_id AS id FROM embeddings), " +
        "ow AS (SELECT id, sum(w) AS wt FROM g2 GROUP BY id), " +
        // iteration 1: dangling mass at s_0 = base, uniform share
        "dm1 AS (SELECT coalesce(sum(1000000), 0) AS dm FROM nodes n " +
        "WHERE NOT EXISTS (SELECT 1 FROM ow WHERE ow.id = n.id)), " +
        "sh1 AS (SELECT (2 * dm + (SELECT count(*) FROM nodes)) // " +
        "(2 * (SELECT count(*) FROM nodes)) AS sh FROM dm1), " +
        "c1 AS (SELECT g2.nbr AS id, " +
        "sum((2 * 1000000 * g2.w + ow.wt) // (2 * ow.wt)) AS infl " +
        "FROM g2 JOIN ow ON g2.id = ow.id GROUP BY g2.nbr), " +
        "s1 AS (SELECT n.id, (2 * (15 * 1000000 + " +
        "85 * (coalesce(c1.infl, 0) + (SELECT sh FROM sh1))) + 100) " +
        "// 200 AS s FROM nodes n LEFT JOIN c1 ON n.id = c1.id), " +
        // iteration 2: dangling mass at s_1
        "dm2 AS (SELECT coalesce(sum(s1.s), 0) AS dm FROM s1 " +
        "WHERE NOT EXISTS (SELECT 1 FROM ow WHERE ow.id = s1.id)), " +
        "sh2 AS (SELECT (2 * dm + (SELECT count(*) FROM nodes)) // " +
        "(2 * (SELECT count(*) FROM nodes)) AS sh FROM dm2), " +
        "c2 AS (SELECT g2.nbr AS id, " +
        "sum((2 * s1.s * g2.w + ow.wt) // (2 * ow.wt)) AS infl " +
        "FROM g2 JOIN ow ON g2.id = ow.id JOIN s1 ON g2.id = s1.id " +
        "GROUP BY g2.nbr), " +
        "s2 AS (SELECT n.id, (2 * (15 * 1000000 + " +
        "85 * (coalesce(c2.infl, 0) + (SELECT sh FROM sh2))) + 100) " +
        "// 200 AS s FROM nodes n LEFT JOIN c2 ON n.id = c2.id) " +
        // CAST: sum-derived // output is HUGEINT; engine emits int64.
        "SELECT id, CAST(s AS BIGINT) AS s FROM s2 ORDER BY id")),

    // ---- personalized PageRank: restart mass concentrated on a seed
    // slice (every 50th vector carries the full micro-unit), scores =
    // random-walk-with-restart proximity to the seeds — the "find more
    // like my curated data" signal; same integer conventions. ----
    ("ns_ann_ppr",
      (s: SparkSession, d: String) => {
        val restarts = Tables.embeddings(s, d).select(col("vec_id"),
          when(col("vec_id") % 50 === 0, lit(1000000L)).otherwise(lit(0L))
            .as("r"))
        graft.operators.KnnGraph.pageRankFrom(intdotEdges(s, d), restarts,
            "vec_id", "r", dampNum = 85, dampDen = 100, iters = 2)
          .orderBy("id")
      },
      Some(intdotGraphCte +
        ", nodes AS (SELECT vec_id AS id, CASE WHEN vec_id % 50 = 0 " +
        "THEN 1000000 ELSE 0 END AS r FROM embeddings), " +
        "ow AS (SELECT id, sum(w) AS wt FROM g GROUP BY id), " +
        "c1 AS (SELECT g.nbr AS id, " +
        "sum((2 * n.r * g.w + ow.wt) // (2 * ow.wt)) AS infl " +
        "FROM g JOIN ow ON g.id = ow.id JOIN nodes n ON g.id = n.id " +
        "GROUP BY g.nbr), " +
        "s1 AS (SELECT n.id, n.r, (2 * (15 * n.r + " +
        "85 * coalesce(c1.infl, 0)) + 100) // 200 AS s " +
        "FROM nodes n LEFT JOIN c1 ON n.id = c1.id), " +
        "c2 AS (SELECT g.nbr AS id, " +
        "sum((2 * s1.s * g.w + ow.wt) // (2 * ow.wt)) AS infl " +
        "FROM g JOIN ow ON g.id = ow.id JOIN s1 ON g.id = s1.id " +
        "GROUP BY g.nbr), " +
        "s2 AS (SELECT n.id, (2 * (15 * n.r + " +
        "85 * coalesce(c2.infl, 0)) + 100) // 200 AS s " +
        "FROM nodes n LEFT JOIN c2 ON n.id = c2.id) " +
        // CAST: sum-derived // output is HUGEINT; engine emits int64.
        "SELECT id, CAST(s AS BIGINT) AS s FROM s2 ORDER BY id")),

    // ---- HITS hubs/authorities over the same graph — the
    // direction-aware complement (the exact-KNN relation is asymmetric:
    // rank-5 membership is not mutual), integer mutual recursion with
    // max-renorm to the micro-unit grid per half-step. ----
    ("ns_ann_hits",
      (s: SparkSession, d: String) =>
        graft.operators.KnnGraph.hits(intdotEdges(s, d),
            Tables.embeddings(s, d), "vec_id", iters = 2)
          .orderBy("id"),
      Some(intdotGraphCte +
        ", nodes AS (SELECT vec_id AS id FROM embeddings), " +
        // iteration 1: a1 from h0 = base, then h1 from a1, each
        // max-renormed to base (zeros preserved)
        "a1r AS (SELECT n.id, coalesce(sum(1000000 * g.w), 0) AS a " +
        "FROM nodes n LEFT JOIN g ON g.nbr = n.id GROUP BY n.id), " +
        "a1 AS (SELECT id, CASE WHEN (SELECT max(a) FROM a1r) > 0 THEN " +
        "(2 * a * 1000000 + (SELECT max(a) FROM a1r)) // " +
        "(2 * (SELECT max(a) FROM a1r)) ELSE 0 END AS a FROM a1r), " +
        "h1r AS (SELECT n.id, coalesce(sum(a1.a * g.w), 0) AS h " +
        "FROM nodes n LEFT JOIN g ON g.id = n.id " +
        "LEFT JOIN a1 ON g.nbr = a1.id GROUP BY n.id), " +
        "h1 AS (SELECT id, CASE WHEN (SELECT max(h) FROM h1r) > 0 THEN " +
        "(2 * h * 1000000 + (SELECT max(h) FROM h1r)) // " +
        "(2 * (SELECT max(h) FROM h1r)) ELSE 0 END AS h FROM h1r), " +
        // iteration 2
        "a2r AS (SELECT n.id, coalesce(sum(h1.h * g.w), 0) AS a " +
        "FROM nodes n LEFT JOIN g ON g.nbr = n.id " +
        "LEFT JOIN h1 ON g.id = h1.id GROUP BY n.id), " +
        "a2 AS (SELECT id, CASE WHEN (SELECT max(a) FROM a2r) > 0 THEN " +
        "(2 * a * 1000000 + (SELECT max(a) FROM a2r)) // " +
        "(2 * (SELECT max(a) FROM a2r)) ELSE 0 END AS a FROM a2r), " +
        "h2r AS (SELECT n.id, coalesce(sum(a2.a * g.w), 0) AS h " +
        "FROM nodes n LEFT JOIN g ON g.id = n.id " +
        "LEFT JOIN a2 ON g.nbr = a2.id GROUP BY n.id), " +
        "h2 AS (SELECT id, CASE WHEN (SELECT max(h) FROM h2r) > 0 THEN " +
        "(2 * h * 1000000 + (SELECT max(h) FROM h2r)) // " +
        "(2 * (SELECT max(h) FROM h2r)) ELSE 0 END AS h FROM h2r) " +
        // CAST: sum-derived // outputs are HUGEINT; engine emits int64.
        "SELECT h2.id, CAST(h2.h AS BIGINT) AS h, " +
        "CAST(a2.a AS BIGINT) AS a FROM h2 JOIN a2 ON h2.id = a2.id " +
        "ORDER BY h2.id")),

    // ---- triangle count + local clustering coefficient over the exact
    // KNN graph's undirected simple edge set — neighborhood-density
    // curation signal (high LCC = inside a near-dup/topic clump, zero =
    // bridge/outlier); ordered-triple enumeration, integer HALF_UP
    // micro-unit coefficient, fully hashed. ----
    ("ns_ann_triangles",
      (s: SparkSession, d: String) =>
        graft.operators.KnnGraph.triangles(intdotEdges(s, d),
            Tables.embeddings(s, d), "vec_id")
          .orderBy("id"),
      Some(intdotGraphCte +
        ", und AS (SELECT DISTINCT least(id, nbr) AS a, " +
        "greatest(id, nbr) AS b FROM g WHERE id <> nbr), " +
        "dg AS (SELECT id, count(*) AS deg FROM " +
        "(SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und) u " +
        "GROUP BY id), " +
        "wg AS (SELECT e1.a, e1.b, e2.b AS c FROM und e1 " +
        "JOIN und e2 ON e1.b = e2.a), " +
        "tr AS (SELECT wg.a, wg.b, wg.c FROM wg " +
        "JOIN und e3 ON wg.a = e3.a AND wg.c = e3.b), " +
        "tn AS (SELECT id, count(*) AS tri FROM " +
        "(SELECT a AS id FROM tr UNION ALL SELECT b AS id FROM tr " +
        "UNION ALL SELECT c AS id FROM tr) u GROUP BY id) " +
        "SELECT n.vec_id AS id, coalesce(dg.deg, 0) AS deg, " +
        "coalesce(tn.tri, 0) AS tri, " +
        "CASE WHEN coalesce(dg.deg, 0) >= 2 THEN " +
        "(2 * 2000000 * coalesce(tn.tri, 0) + dg.deg * (dg.deg - 1)) // " +
        "(2 * dg.deg * (dg.deg - 1)) ELSE 0 END AS lcc_micro " +
        "FROM embeddings n LEFT JOIN dg ON n.vec_id = dg.id " +
        "LEFT JOIN tn ON n.vec_id = tn.id ORDER BY id")),

    // ---- weighted label-propagation communities over the exact KNN
    // graph: 3 synchronous rounds of "adopt the heaviest label among my
    // k nearest" (ties to the smaller label) — topic-granular grouping
    // between near-dup components (too fine) and k-means cells (fixed
    // k); integer weight sums + total-order argmax = full trajectory
    // hashed. ----
    ("ns_ann_communities",
      (s: SparkSession, d: String) =>
        graft.operators.KnnGraph.labelPropagation(intdotEdges(s, d),
            Tables.embeddings(s, d), "vec_id", iters = 3)
          .orderBy("id"),
      Some(intdotGraphCte +
        ", l0 AS (SELECT vec_id AS id, vec_id AS lbl FROM embeddings)" +
        lpRound("l0", "l1") + lpRound("l1", "l2") + lpRound("l2", "l3") +
        " SELECT id, lbl FROM l3 ORDER BY id")),

    // ---- onion-decomposition peel layers of the 6-peel: the k-NN graph
    // has NO stable core above the trivial out-degree (the 6-peel
    // cascades to empty at every SF — measured 847/941/212→0 at sf0.1),
    // so the per-node CASCADE DEPTH is the ordering signal, periphery
    // (layer 1) → structural center (late layers); bounded-round
    // contract, fixpoint-at-3 asserted in the spec. ----
    ("ns_ann_onion_layers",
      (s: SparkSession, d: String) =>
        graft.operators.KnnGraph.peelLayers(intdotEdges(s, d),
            Tables.embeddings(s, d), "vec_id", k = 6, rounds = 3)
          .orderBy("id"),
      Some(intdotGraphCte +
        ", und AS (SELECT DISTINCT least(id, nbr) AS a, " +
        "greatest(id, nbr) AS b FROM g WHERE id <> nbr), " +
        "a0 AS (SELECT vec_id AS id FROM embeddings), " +
        kcoreRound("a0", "a1", 6) + kcoreRound("a1", "a2", 6) +
        kcoreRound("a2", "a3", 6) +
        "lay AS (SELECT n.id, CASE WHEN x1.id IS NULL THEN 1 " +
        "WHEN x2.id IS NULL THEN 2 WHEN x3.id IS NULL THEN 3 " +
        "ELSE 0 END AS layer FROM a0 n " +
        "LEFT JOIN a1 x1 ON n.id = x1.id " +
        "LEFT JOIN a2 x2 ON n.id = x2.id " +
        "LEFT JOIN a3 x3 ON n.id = x3.id) " +
        "SELECT id, layer FROM lay ORDER BY id")),

    // ---- modularity of the 3-round LPA partition over the exact KNN
    // graph — the "is this community structure better than chance"
    // scalar that makes ns_ann_communities a measured grouping; one
    // integer-exact micro-unit row (decimal cross products, driver
    // BigInt HALF_UP, negative away-from-zero). ----
    ("ns_ann_modularity",
      (s: SparkSession, d: String) => {
        val edges = intdotEdges(s, d)
        val labels = graft.operators.KnnGraph.labelPropagation(edges,
            Tables.embeddings(s, d), "vec_id", iters = 3)
        graft.operators.KnnGraph.modularity(edges, labels)
      },
      Some(intdotGraphCte +
        ", l0 AS (SELECT vec_id AS id, vec_id AS lbl FROM embeddings)" +
        lpRound("l0", "l1") + lpRound("l1", "l2") + lpRound("l2", "l3") +
        ", ej AS (SELECT g.id, g.nbr, g.w, a.lbl AS lc, b.lbl AS ln " +
        "FROM g JOIN l3 a ON g.id = a.id JOIN l3 b ON g.nbr = b.id), " +
        "mt AS (SELECT sum(w) AS m, " +
        "sum(CASE WHEN lc = ln THEN w ELSE 0 END) AS intra FROM ej), " +
        "co AS (SELECT lc AS c, sum(w) AS dout FROM ej GROUP BY 1), " +
        "ci AS (SELECT ln AS c, sum(w) AS din FROM ej GROUP BY 1), " +
        "cx AS (SELECT coalesce(sum(CAST(dout AS HUGEINT) * " +
        "CAST(din AS HUGEINT)), 0) AS x FROM co JOIN ci USING (c)), " +
        "nc AS (SELECT count(DISTINCT lbl) AS communities FROM l3), " +
        "fin AS (SELECT nc.communities, mt.m, mt.intra, " +
        "CAST(mt.m AS HUGEINT) * mt.intra - cx.x AS num, " +
        "CAST(mt.m AS HUGEINT) * mt.m AS den " +
        "FROM mt CROSS JOIN cx CROSS JOIN nc) " +
        "SELECT CAST(communities AS BIGINT) AS communities, " +
        "CAST(m AS BIGINT) AS m, CAST(intra AS BIGINT) AS intra_w, " +
        "CAST(CASE WHEN num >= 0 THEN (2000000 * num + den) // (2 * den) " +
        "ELSE -((2000000 * (-num) + den) // (2 * den)) END AS BIGINT) " +
        "AS q_micro FROM fin")),

    // ---- shared-nearest-neighbor strength per KNN edge (Jarvis-
    // Patrick): |N(a) ∩ N(b)| over the out-neighborhoods — the
    // distance-concentration-robust similarity the SNN clustering
    // family weights edges by; all-integer, fully hashed. ----
    ("ns_ann_snn",
      (s: SparkSession, d: String) =>
        graft.operators.KnnGraph.sharedNeighbors(intdotEdges(s, d))
          .orderBy("a", "b"),
      Some(intdotGraphCte +
        ", cm AS (SELECT g1.id AS a, g2.id AS b, count(*) AS shared " +
        "FROM g g1 JOIN g g2 ON g1.nbr = g2.nbr AND g1.id <> g2.id " +
        "GROUP BY 1, 2) " +
        "SELECT g.id AS a, g.nbr AS b, g.w, " +
        "coalesce(cm.shared, 0) AS shared FROM g " +
        "LEFT JOIN cm ON g.id = cm.a AND g.nbr = cm.b " +
        "ORDER BY a, b")),

    // ---- EXACT incremental maintenance of the KNN edge state: build
    // over the resident 90%, insertExact the 10% delta, deleteExact the
    // vec_id%20==7 slice — and the final state must hash-match a from-
    // scratch rebuild over the post-delete corpus (the text indexes'
    // delete-then-merge ≡ rebuild contract, now on the graph family;
    // merge cost |resident|·|delta| dots + repair |affected|·N, never
    // the N² rebuild). ----
    ("ns_ann_knn_update",
      (s: SparkSession, d: String) => {
        val all = Tables.embeddings(s, d)
        // the embeddings table is one small file = one input partition;
        // spread the N-squared build's scan side across cores (query-
        // side concern: a real corpus arrives pre-partitioned)
        val resident = all.filter(col("vec_id") % 10 =!= 0)
          .repartition(32)
        val delta = all.filter(col("vec_id") % 10 === 0)
        // localCheckpoint between the stages: each is consumed by more
        // than one downstream subtree, and the N-squared build must run
        // once, not once per consumer (44 s -> ~5 s at sf0.1)
        val edges0 = graft.operators.Similarity.intDotTopKBatch(
            resident, "vec_id", "embedding", resident, "vec_id",
            "embedding", k = 5)
          .select(col("qid").as("id"), col("id").as("nbr"), col("dot"))
          .localCheckpoint()
        val afterIns = graft.operators.KnnGraph.insertExact(edges0,
            resident, delta, "vec_id", "embedding", k = 5)
          .localCheckpoint()
        val afterDel = graft.operators.KnnGraph.deleteExact(afterIns,
          all, all.filter(col("vec_id") % 20 === 7).select("vec_id"),
          "vec_id", "embedding", k = 5)
        afterDel.orderBy("id", "nbr")
      },
      Some(intdotRkCte("vec_id % 20 <> 7") +
        "SELECT id, nbr, dot FROM rk WHERE rank <= 5 ORDER BY id, nbr")),

    // ---- the STREAMING fold of the same maintenance: three vector
    // micro-batches applied through StreamingKnn's idempotent
    // versioned-state body (batch 1 redelivered mid-run to exercise the
    // version-tag skip), final committed state hashed against the
    // full-corpus rebuild oracle — streamed ≡ batch, driver-visible
    // (replay/crash-window semantics are specced in StreamingKnnSpec).
    ("ns_ann_knn_stream_fold",
      (s: SparkSession, d: String) => {
        val path = java.nio.file.Files
          .createTempDirectory("sknn_q").toString + "/knn"
        val embs = Tables.embeddings(s, d)
        val slices = Seq(
          embs.filter(col("vec_id") % 3 === 0),
          embs.filter(col("vec_id") % 3 === 1),
          embs.filter(col("vec_id") % 3 === 2))
        graft.streaming.StreamingKnn.applyBatch(s, slices(0), "vec_id",
          "embedding", 5, path, 0L)
        graft.streaming.StreamingKnn.applyBatch(s, slices(1), "vec_id",
          "embedding", 5, path, 1L)
        // at-least-once redelivery of batch 1: must be a no-op
        graft.streaming.StreamingKnn.applyBatch(s, slices(1), "vec_id",
          "embedding", 5, path, 1L)
        graft.streaming.StreamingKnn.applyBatch(s, slices(2), "vec_id",
          "embedding", 5, path, 2L)
        graft.streaming.StreamingKnn.currentEdges(s, path)
          .orderBy("id", "nbr")
      },
      Some(intdotRkCte("TRUE") +
        "SELECT id, nbr, dot FROM rk WHERE rank <= 5 ORDER BY id, nbr")),

    // ---- Z-order layout: Morton z-values over (user_id, event_id) with
    // power-of-two cells — integer-only bucket law, so the oracle
    // replicates every bit (Layout.scala scaladoc has the contract) ----
    ("ns_layout_zorder",
      (s: SparkSession, d: String) =>
        graft.operators.Layout.zorderBy(
            Tables.events(s, d).select("event_id", "user_id"),
            Seq("user_id", "event_id"), bits = 8, log2Bins = 6)
          .select("event_id", "z_value", "z_bin").orderBy("event_id"),
      Some(zorderPreSql +
        s"SELECT event_id, (${mortonSql("bu", "be", 8)}) AS z_value, " +
        s"(${mortonSql("bu", "be", 8)}) >> 10 AS z_bin FROM b " +
        "ORDER BY event_id")),

    // ---- data-skipping audit: how many "files" (deterministic z-prefix
    // bins vs arrival-order bins) a min/max-pruning reader must scan for
    // a user-band and an event-band predicate. The point the numbers
    // make: the linear layout scans EVERY bin for the user predicate;
    // z-order prunes both dimensions. ----
    ("ns_layout_skip_audit",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d).select("event_id", "user_id")
        val dims = Seq("user_id", "event_id")
        val Seq((mnu, mxu), (mne, mxe)) =
          graft.operators.Layout.columnRanges(ev, dims)
        val z = graft.operators.Layout.zorderBy(ev, dims, 8, 6)
          .withColumnRenamed("z_bin", "bin")
        val lin = ev.withColumn("bin",
          shiftright(col("event_id") - lit(mne),
            graft.operators.Layout.shiftFor(mne, mxe, 6)))
        val preds = Seq(
          "user_band" -> Seq(
            Some((mnu + (mxu - mnu) / 4,
              mnu + (mxu - mnu) / 4 + (mxu - mnu) / 16)), None),
          "event_band" -> Seq(None,
            Some((mne + (mxe - mne) / 4,
              mne + (mxe - mne) / 4 + (mxe - mne) / 16))))
        graft.operators.Layout.skippingAudit(
            Seq("zorder" -> z, "linear" -> lin), "bin", dims, preds)
          .orderBy("layout", "predicate")
      },
      Some(zorderPreSql +
        s", z AS (SELECT user_id, event_id, (${mortonSql("bu", "be", 8)}) >> 10 AS bin, " +
        "'zorder' AS layout FROM b " +
        "UNION ALL SELECT user_id, event_id, lbin AS bin, 'linear' AS layout FROM b), " +
        "st AS (SELECT layout, bin, min(user_id) umin, max(user_id) umax, " +
        "min(event_id) emin, max(event_id) emax FROM z GROUP BY 1, 2), " +
        "bounds AS (SELECT mnu + (mxu-mnu)//4 AS ulo, " +
        "mnu + (mxu-mnu)//4 + (mxu-mnu)//16 AS uhi, " +
        "mne + (mxe-mne)//4 AS elo, " +
        "mne + (mxe-mne)//4 + (mxe-mne)//16 AS ehi FROM s) " +
        "SELECT layout, predicate, bins_total, bins_hit FROM (" +
        "SELECT layout, 'user_band' AS predicate, count(*) AS bins_total, " +
        "count(*) FILTER (WHERE umin <= uhi AND umax >= ulo) AS bins_hit " +
        "FROM st, bounds GROUP BY layout " +
        "UNION ALL " +
        "SELECT layout, 'event_band' AS predicate, count(*) AS bins_total, " +
        "count(*) FILTER (WHERE emin <= ehi AND emax >= elo) AS bins_hit " +
        "FROM st, bounds GROUP BY layout) " +
        "ORDER BY layout, predicate")))
}
