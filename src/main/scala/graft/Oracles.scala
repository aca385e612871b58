package graft

/** DuckDB-dialect oracle SQL for the operators whose logic is too long to
  * inline — generated here so the Spark implementation and the oracle share
  * the exact same constants (marker lists, band layout, hex math).
  */
object Oracles {

  /** Shared tokenizer: distinct lower-case alnum words per doc. */
  private def tokCte(where: String): String =
    s"tok AS (SELECT DISTINCT doc_id, w FROM (SELECT doc_id, " +
      "unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS w " +
      s"FROM documents $where))"

  /** The whole minhash→bands→pairs→components family is generated from
    * CTE-list builders parameterized on (source relation, name prefix), so
    * the standalone oracles (q22/q35/q37 over `documents`) and the q51
    * pipeline oracle (the same stages over its filtered survivor CTE) are
    * guaranteed to share one band/hash scheme — in lockstep with the Spark
    * side, where Dedup.minHashBandsOn/lshPairsOn are likewise frame-
    * parameterized.
    */
  def bandCtes(src: String, p: String): String = {
    val mins = (0 until 8).map(i => s"min(md5('$i|' || sh)) AS h$i").mkString(", ")
    s"${p}w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), " +
      s"x -> x <> '') AS w FROM $src), " +
      s"${p}shg AS (SELECT DISTINCT doc_id, sh FROM (SELECT doc_id, " +
      "unnest(list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh " +
      s"FROM ${p}w WHERE len(w) >= 3)), " +
      s"${p}mh AS (SELECT doc_id, $mins FROM ${p}shg GROUP BY doc_id), " +
      s"${p}bands AS (SELECT doc_id, md5(h0 || h1) AS b0, md5(h2 || h3) AS b1, " +
      s"md5(h4 || h5) AS b2, md5(h6 || h7) AS b3 FROM ${p}mh)"
  }

  def pairCtes(src: String, p: String): String = {
    val unpivot = (0 until 4)
      .map(i => s"SELECT doc_id, $i AS band, b$i AS bv FROM ${p}bands")
      .mkString(" UNION ALL ")
    bandCtes(src, p) + s", ${p}long AS ($unpivot), " +
      s"${p}pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b " +
      s"FROM ${p}long a JOIN ${p}long b ON a.band = b.band AND a.bv = b.bv " +
      "AND a.doc_id < b.doc_id)"
  }

  /** Components of the pair graph via a recursive reachability CTE;
    * component label = min reachable doc_id. (Tractable in DuckDB because
    * the oracle corpus's pair graph is tiny; the Spark side uses star
    * contraction instead.) Requires WITH RECURSIVE on the enclosing query.
    */
  def clusterCtes(src: String, p: String): String =
    pairCtes(src, p) +
      s", ${p}edges AS (SELECT doc_a AS src, doc_b AS dst FROM ${p}pairs " +
      s"UNION SELECT doc_b, doc_a FROM ${p}pairs), " +
      s"${p}verts AS (SELECT DISTINCT src AS v FROM ${p}edges), " +
      s"${p}reach(v, r) AS (SELECT v, v FROM ${p}verts " +
      s"UNION SELECT e.dst, ${p}reach.r FROM ${p}reach JOIN ${p}edges e ON e.src = ${p}reach.v), " +
      s"${p}clus AS (SELECT v AS doc_id, min(r) AS cluster FROM ${p}reach GROUP BY v)"

  /** Q22 oracle — word-3-gram shingles, 8 md5 min-hashes, 4 bands of 2. */
  val minHashBands: String =
    s"WITH ${bandCtes("documents", "")} SELECT doc_id, b0, b1, b2, b3 FROM bands"

  /** Hex prefix of md5 -> 32-bit integer, written with only +,*,strpos so
    * it evaluates identically in any engine.
    */
  private val hexVal: String = (0 until 8).map { j =>
    val mult = math.pow(16, 7 - j).toLong
    s"(strpos('0123456789abcdef', substr(md5(w), ${j + 1}, 1)) - 1) * $mult"
  }.mkString(" + ")

  /** Q23 oracle — 32-bit SimHash over distinct words, doc_id < 2000. */
  val simHash: String =
    s"WITH ${tokCte("WHERE doc_id < 2000")}, " +
      s"h AS (SELECT doc_id, CAST($hexVal AS BIGINT) AS h FROM tok), " +
      "bits AS (SELECT doc_id, b, sum(CASE WHEN CAST(floor(h / power(2.0, b)) AS BIGINT) % 2 = 1 " +
      "THEN 1 ELSE -1 END) AS s FROM h, (SELECT unnest(range(32)) AS b) bs GROUP BY doc_id, b) " +
      "SELECT doc_id, CAST(sum(CASE WHEN s >= 0 THEN power(2.0, b) ELSE 0 END) AS BIGINT) " +
      "AS simhash FROM bits GROUP BY doc_id"

  /** Q24 oracle — exact word-set Jaccard pairs >= 0.5, doc_id < 300. */
  val jaccardPairs: String =
    s"WITH ${tokCte("WHERE doc_id < 300")}, " +
      "sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id), " +
      "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c " +
      "FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id GROUP BY 1, 2) " +
      "SELECT doc_a, doc_b, round(CAST(c AS DOUBLE) / (na + nb - c), 6) AS jac FROM " +
      "(SELECT doc_a, doc_b, c, sa.n AS na, sb.n AS nb FROM inter " +
      "JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b) " +
      "WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.5"

  /** Q35 oracle — candidate pairs sharing any LSH band (generated from the
    * same CTE builders as the q22 band oracle, so the md5 scheme stays in
    * lockstep).
    */
  val lshPairs: String =
    s"WITH ${pairCtes("documents", "")} SELECT doc_a, doc_b FROM pairs"

  /** Q74 oracle — incremental dedup of a synthesized incoming batch
    * (genuinely-new docs + re-crawls under doc_id + 1e6) against the
    * history split. The band scheme comes from the SAME CTE builders as
    * q22/q35, instantiated once per frame (prefixes h/i), so the three
    * engines' hashing can never drift apart.
    */
  val incrementalDedup: String = {
    def long(p: String): String = (0 until 4)
      .map(i => s"SELECT doc_id, $i AS band, b$i AS bv FROM ${p}bands")
      .mkString(" UNION ALL ")
    "WITH hist AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 < 4), " +
      "inc AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 4 " +
      "UNION ALL SELECT doc_id + 1000000, text FROM hist WHERE doc_id % 7 = 0), " +
      s"${bandCtes("hist", "h")}, ${bandCtes("inc", "i")}, " +
      s"hlong AS (${long("h")}), ilong AS (${long("i")}), " +
      "ex AS (SELECT i.doc_id, min(h.doc_id) AS exact_src FROM inc i " +
      "JOIN hist h ON md5(i.text) = md5(h.text) GROUP BY i.doc_id), " +
      "nr AS (SELECT a.doc_id, min(b.doc_id) AS near_src FROM ilong a " +
      "JOIN hlong b ON a.band = b.band AND a.bv = b.bv GROUP BY a.doc_id) " +
      "SELECT i.doc_id, CAST(ex.exact_src IS NOT NULL AS INTEGER) AS exact_dup, " +
      "CAST(nr.near_src IS NOT NULL AS INTEGER) AS near_dup, " +
      "CAST(ex.exact_src IS NULL AND nr.near_src IS NULL AS INTEGER) AS keep, " +
      "ex.exact_src, nr.near_src " +
      "FROM inc i LEFT JOIN ex ON i.doc_id = ex.doc_id " +
      "LEFT JOIN nr ON i.doc_id = nr.doc_id"
  }

  /** Q37 oracle — connected components of the q35 pair graph (see
    * clusterCtes for the recursive-reachability formulation).
    */
  val dedupClusters: String =
    s"WITH RECURSIVE ${clusterCtes("documents", "")} " +
      "SELECT doc_id, cluster FROM clus"

  /** Q40 oracle — embedding near-dup components: exact thresholded cosine
    * pairs (DOUBLE math, matching Spark's float→double cast) into the
    * same recursive reachability CTE as q37. Threshold 0.34 sits ≥ 1e-5
    * from the nearest pair similarity at every test SF.
    */
  val embedNearDup: String =
    "WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v " +
      "FROM embeddings WHERE vec_id < 500), " +
      "pairs AS (SELECT a.vec_id AS doc_a, b.vec_id AS doc_b FROM e a " +
      "JOIN e b ON a.vec_id < b.vec_id " +
      "WHERE list_cosine_similarity(a.v, b.v) >= 0.34), " +
      "edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs " +
      "UNION SELECT doc_b, doc_a FROM pairs), " +
      "verts AS (SELECT DISTINCT src AS v FROM edges), " +
      "reach(v, r) AS (SELECT v, v FROM verts " +
      "UNION SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.v) " +
      "SELECT v AS vec_id, min(r) AS cluster FROM reach GROUP BY v"

  /** Q44 oracle — q40's reachability CTE without the vec_id bound: exact
    * O(n²) thresholded cosine pairs over the FULL embeddings table (cheap
    * for the oracle at test SFs) → min-label components. The Spark side
    * must produce the same clusters from its sub-quadratic LSH candidate
    * path — which is exactly the claim q44 exists to prove.
    */
  val embedNearDupFull: String =
    "WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v " +
      "FROM embeddings), " +
      "pairs AS (SELECT a.vec_id AS doc_a, b.vec_id AS doc_b FROM e a " +
      "JOIN e b ON a.vec_id < b.vec_id " +
      "WHERE list_cosine_similarity(a.v, b.v) >= 0.34), " +
      "edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs " +
      "UNION SELECT doc_b, doc_a FROM pairs), " +
      "verts AS (SELECT DISTINCT src AS v FROM edges), " +
      "reach(v, r) AS (SELECT v, v FROM verts " +
      "UNION SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.v) " +
      "SELECT v AS vec_id, min(r) AS cluster FROM reach GROUP BY v"

  /** Q45 oracle — train/benchmark 8-gram decontamination in plain set
    * arithmetic. Tokenization mirrors TextOps.words; DuckDB 1.0 has no
    * lateral generate_series, so the shingle index unnests a
    * generate_series LIST in the select list instead. List slicing is
    * 1-based inclusive: ws[i:i+7] is the 8-gram starting at word i.
    */
  val decontaminate: String =
    "WITH toks AS (SELECT doc_id, source, list_filter(" +
      "string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '') AS ws " +
      "FROM documents), " +
      "idx AS (SELECT doc_id, source, ws, " +
      "unnest(generate_series(1, len(ws) - 7)) AS i FROM toks " +
      "WHERE len(ws) >= 8), " +
      "sh AS (SELECT doc_id, source, array_to_string(ws[i:i+7], ' ') AS sh8 " +
      "FROM idx), " +
      "hold AS (SELECT DISTINCT sh8 FROM sh " +
      "WHERE source IN ('src18', 'src19')), " +
      "tr AS (SELECT DISTINCT doc_id, sh8 FROM sh " +
      "WHERE source NOT IN ('src18', 'src19')), " +
      "cnt AS (SELECT doc_id, count(*) AS n FROM tr JOIN hold USING (sh8) " +
      "GROUP BY doc_id) " +
      "SELECT d.doc_id, CAST(coalesce(cnt.n, 0) AS BIGINT) " +
      "AS n_overlapping_shingles, " +
      "CAST(coalesce(cnt.n, 0) > 0 AS INTEGER) AS contaminated " +
      "FROM (SELECT doc_id FROM documents " +
      "WHERE source NOT IN ('src18', 'src19')) d LEFT JOIN cnt USING (doc_id)"

  /** Q46 oracle — the same doc_id-synthesized contact strings, scrubbed
    * with DuckDB's RE2 engine: both regexes are deliberately RE2-safe so
    * a Java-vs-RE2 semantic gap can't hide behind matching counts.
    */
  val piiScrub: String =
    "WITH r AS (SELECT doc_id, text || ' contact user' || doc_id || " +
      "'@mail.example.com' || CASE WHEN doc_id % 3 = 0 THEN " +
      "' cc admin' || doc_id || '@ex.org' ELSE '' END || " +
      "' tel +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') " +
      "AS raw FROM documents) " +
      "SELECT doc_id, " +
      "CAST(len(regexp_extract_all(raw, " +
      "'[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS BIGINT) AS n_emails, " +
      "CAST(len(regexp_extract_all(raw, '\\+1-555-[0-9]{4}')) AS BIGINT) " +
      "AS n_phones, " +
      "regexp_replace(regexp_replace(raw, " +
      "'[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g'), " +
      "'\\+1-555-[0-9]{4}', '<PHONE>', 'g') AS scrubbed FROM r"

  /** Q47 oracle — within-doc word-3-gram repetition. Same 1-based list
    * slice trick as the q45 shingle index; dup_frac divides as DOUBLE and
    * rounds to 6 like the Spark side.
    */
  val repNgrams: String =
    "WITH toks AS (SELECT doc_id, list_filter(" +
      "string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '') AS ws " +
      "FROM documents), " +
      "g AS (SELECT doc_id, array_to_string(ws[i:i+2], ' ') AS g FROM " +
      "(SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) AS i " +
      "FROM toks WHERE len(ws) >= 3)), " +
      "agg AS (SELECT doc_id, count(*) AS n_grams, " +
      "count(DISTINCT g) AS n_distinct FROM g GROUP BY doc_id) " +
      "SELECT d.doc_id, CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams, " +
      "CAST(coalesce(n_distinct, 0) AS BIGINT) AS n_distinct, " +
      "round(1.0 - coalesce(CAST(n_distinct AS DOUBLE) / n_grams, 1.0), 6) " +
      "AS dup_frac FROM documents d LEFT JOIN agg USING (doc_id)"

  /** Q48 oracle — DuckDB's quantile_cont is the same interpolated rank
    * formula ((1-g)·v[k] + g·v[k+1] at p·(n-1)) as Spark's exact
    * `percentile`, so values match to the 6-dp rounding on both sides.
    */
  val tokenPercentiles: String =
    "WITH t AS (SELECT source, CAST(len(list_filter(" +
      "string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '')) " +
      "AS BIGINT) AS n FROM documents) " +
      "SELECT source, round(quantile_cont(n, 0.5), 6) AS p50, " +
      "round(quantile_cont(n, 0.9), 6) AS p90, " +
      "round(quantile_cont(n, 0.99), 6) AS p99, " +
      "count(*) AS cnt FROM t GROUP BY source"

  /** Q49 oracle — the same running-max window formulation (the default
    * RANGE frame keeps same-instant events peers on both engines); the
    * second-truncated timestamp matches the q07/q38 convention.
    */
  val asOfLastView: String =
    "WITH t AS (SELECT event_id, user_id, event_type, ts FROM events " +
      "WHERE event_type IN ('purchase', 'view')), " +
      "o AS (SELECT *, max(CASE WHEN event_type = 'view' THEN ts END) " +
      "OVER (PARTITION BY user_id ORDER BY ts) AS lv, " +
      "count(CASE WHEN event_type = 'view' THEN 1 END) " +
      "OVER (PARTITION BY user_id ORDER BY ts) AS nv FROM t) " +
      "SELECT event_id AS purchase_id, user_id, " +
      "CAST(date_trunc('second', lv) AS TIMESTAMP) AS last_view_ts, " +
      "CAST(nv AS BIGINT) AS n_views_before FROM o " +
      "WHERE event_type = 'purchase'"

  /** Q50 oracle — q43's bin window verbatim, then string_agg in doc_id
    * order. total_tokens is a sum(BIGINT) → cast back from HUGEINT
    * (see q43's bin_offset erratum; the type audit now pins the class).
    */
  val packAssemble: String =
    "WITH t AS (SELECT doc_id, source, text, CAST(len(list_filter(" +
      "string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '')) " +
      "AS BIGINT) AS n_tokens FROM documents), " +
      "o AS (SELECT *, CAST(floor(coalesce(sum(n_tokens) OVER (" +
      "PARTITION BY source ORDER BY doc_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512) " +
      "AS BIGINT) AS bin FROM t) " +
      "SELECT source, bin, string_agg(text, ' ' ORDER BY doc_id) AS packed, " +
      "CAST(sum(n_tokens) AS BIGINT) AS total_tokens, count(*) AS n_docs " +
      "FROM o GROUP BY source, bin"

  /** Q41 oracle — per-doc top-3 TF-IDF terms. Tokenization mirrors
    * TextOps.words (lower → split on non-alphanumeric → drop empties);
    * scores are rounded to 6 places BEFORE the window ordering, matching
    * the Spark side, so rank boundaries are engine-portable.
    */
  val tfIdfTopTerms: String =
    "WITH toks AS (SELECT doc_id, unnest(list_filter(" +
      "string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '')) AS term " +
      "FROM documents), " +
      "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks " +
      "WHERE doc_id < 100 GROUP BY 1, 2), " +
      "dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1), " +
      "n AS (SELECT count(*) AS n_docs FROM documents), " +
      "scored AS (SELECT tf.doc_id, tf.term, tf.tf, dfreq.df, " +
      "round(tf.tf * ln(n.n_docs / dfreq.df), 6) AS score " +
      "FROM tf JOIN dfreq USING (term) CROSS JOIN n) " +
      "SELECT doc_id, term, tf, df, score FROM (" +
      "SELECT *, row_number() OVER (PARTITION BY doc_id " +
      "ORDER BY score DESC, term ASC) AS rn FROM scored) WHERE rn <= 3"

  /** Marker-word occurrence count via the length-difference trick. */
  private def occ(m: String): String = {
    val p = s" $m "
    s"(length(t) - length(replace(t, ' $m ', ''))) / ${p.length}"
  }
  private def score(ms: Seq[String]): String = ms.map(occ).mkString(" + ")

  /** Q27 oracle — marker-word language ID, argmax with fixed tie order.
    * Marker lists must stay in sync with operators/Text.q27LangId.
    */
  val langId: String = {
    val sEn = score(Seq("the", "a", "of"))
    val sDe = score(Seq("der", "und", "die"))
    val sEs = score(Seq("el", "la", "los"))
    val sFr = score(Seq("le", "les", "des"))
    val sZh = score(Seq("的", "是"))
    "WITH s AS (SELECT doc_id, ' ' || lower(text) || ' ' AS t FROM documents), " +
      s"sc AS (SELECT doc_id, $sEn AS s_en, $sDe AS s_de, $sEs AS s_es, " +
      s"$sFr AS s_fr, $sZh AS s_zh FROM s) " +
      "SELECT doc_id, CASE " +
      "WHEN s_en = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'en' " +
      "WHEN s_de = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'de' " +
      "WHEN s_es = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'es' " +
      "WHEN s_fr = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'fr' " +
      "ELSE 'zh' END AS detected FROM sc"
  }

  /** Q110 oracle — q27's scoring replayed per LINE (same marker lists,
    * same argmax tie order), plus the dominant-language aggregate via
    * the integer `cnt·8 + rank` key the Spark struct-max also encodes.
    */
  val lineLangId: String = {
    val sEn = score(Seq("the", "a", "of"))
    val sDe = score(Seq("der", "und", "die"))
    val sEs = score(Seq("el", "la", "los"))
    val sFr = score(Seq("le", "les", "des"))
    val sZh = score(Seq("的", "是"))
    "WITH s0 AS (SELECT doc_id, text || " +
      "CASE WHEN doc_id % 4 = 1 THEN chr(10) || 'der hund und die katze lief und der weg die' ELSE '' END || " +
      "CASE WHEN doc_id % 4 = 2 THEN chr(10) || 'el gato la casa los perros el jardin la' ELSE '' END || " +
      "CASE WHEN doc_id % 5 = 3 THEN chr(10) || 'le chat les maisons des amis le soir les' ELSE '' END || " +
      "CASE WHEN doc_id % 6 = 5 THEN chr(10) || 'the second line of the day a story the end' ELSE '' END AS raw " +
      "FROM documents), " +
      "lx AS (SELECT doc_id, unnest(string_split(raw, chr(10))) AS line, " +
      "generate_subscripts(string_split(raw, chr(10)), 1) - 1 AS line_idx FROM s0), " +
      "tl AS (SELECT doc_id, line_idx, ' ' || lower(line) || ' ' AS t FROM lx), " +
      s"sc AS (SELECT doc_id, line_idx, $sEn AS s_en, $sDe AS s_de, $sEs AS s_es, " +
      s"$sFr AS s_fr, $sZh AS s_zh FROM tl), " +
      "d AS (SELECT doc_id, line_idx, CASE " +
      "WHEN s_en = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'en' " +
      "WHEN s_de = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'de' " +
      "WHEN s_es = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'es' " +
      "WHEN s_fr = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'fr' " +
      "ELSE 'zh' END AS detected FROM sc), " +
      "c AS (SELECT doc_id, detected, count(*) AS cnt FROM d GROUP BY doc_id, detected), " +
      "k AS (SELECT doc_id, detected, cnt, cnt * 8 + " +
      "CASE detected WHEN 'en' THEN 5 WHEN 'de' THEN 4 WHEN 'es' THEN 3 " +
      "WHEN 'fr' THEN 2 ELSE 1 END AS kk FROM c), " +
      "dm AS (SELECT doc_id, arg_max(detected, kk) AS dominant_lang, " +
      "max(kk) // 8 AS n_dom FROM k GROUP BY doc_id), " +
      "nl AS (SELECT doc_id, count(*) AS n_lines FROM d GROUP BY doc_id) " +
      "SELECT d.doc_id, CAST(d.line_idx AS INTEGER) AS line_idx, d.detected, " +
      "dm.dominant_lang, CAST(nl.n_lines AS BIGINT) AS n_lines, " +
      "CAST(dm.n_dom AS BIGINT) AS n_dominant, " +
      "CAST(dm.n_dom < nl.n_lines AS INTEGER) AS mixed " +
      "FROM d JOIN dm ON d.doc_id = dm.doc_id JOIN nl ON d.doc_id = nl.doc_id"
  }

  /** Q51 oracle — the END-TO-END corpus pipeline as one CTE chain, every
    * stage composed from the SAME SQL its standalone oracle uses:
    * quality gate (q28's formula, floor 0.7) → holdout split +
    * 8-gram decontamination (q45) → exact dedup (q21's keep rule) →
    * LSH near-dup components over the survivors (q22/q35/q37 via
    * clusterCtes, keep singletons + component minima) → PII scrub (q46's
    * synthesized contacts + RE2-safe regexes) → per-language quota sample
    * (q42's hash threshold, salt "q51|") → token packing on the SCRUBBED
    * text (q43's per-source window, budget 512) → survivor-frame TF-IDF
    * top-3 terms (q41's formula over exdedup). Output: one manifest row
    * per packed doc. `off` is a windowed sum(BIGINT) → HUGEINT; cast back
    * (the q43 erratum class).
    */
  val corpusPipeline: String = {
    val words = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phoneRe = "\\+1-555-[0-9]{4}"
    "WITH RECURSIVE " +
      "sc AS (SELECT doc_id, source, lang, text, " +
      "CASE WHEN n_tokens IS NOT NULL THEN " +
      "round(least(1.0, n_tokens / 50.0) * 0.5 + " +
      "least(1.0, (CAST(cns AS DOUBLE) / n_tokens) / 5.0) * 0.5, 6) END AS quality " +
      s"FROM (SELECT doc_id, source, lang, text, len($words) AS n_tokens, " +
      "length(replace(text, ' ', '')) AS cns FROM documents)), " +
      "qual AS (SELECT * FROM sc WHERE quality >= 0.7 " +
      "AND source NOT IN ('src18', 'src19')), " +
      s"htoks AS (SELECT $words AS ws FROM documents " +
      "WHERE source IN ('src18', 'src19')), " +
      "hsh AS (SELECT DISTINCT array_to_string(ws[i:i+7], ' ') AS sh8 FROM " +
      "(SELECT ws, unnest(generate_series(1, len(ws) - 7)) AS i FROM htoks " +
      "WHERE len(ws) >= 8)), " +
      s"ttoks AS (SELECT doc_id, $words AS ws FROM qual), " +
      "tsh AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+7], ' ') AS sh8 FROM " +
      "(SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 7)) AS i FROM ttoks " +
      "WHERE len(ws) >= 8)), " +
      "contam AS (SELECT DISTINCT doc_id FROM tsh JOIN hsh USING (sh8)), " +
      "clean AS (SELECT * FROM qual WHERE doc_id NOT IN (SELECT doc_id FROM contam)), " +
      "keepx AS (SELECT min(doc_id) AS doc_id FROM clean GROUP BY md5(text)), " +
      "exdedup AS (SELECT clean.* FROM clean JOIN keepx USING (doc_id)), " +
      // survivor-frame TF-IDF (q41's formula): df and N span exdedup —
      // the WHOLE survivor frame, not the sampled manifest subset
      s"ttk AS (SELECT doc_id, unnest($words) AS term FROM exdedup), " +
      "ttf AS (SELECT doc_id, term, count(*) AS tf FROM ttk GROUP BY 1, 2), " +
      "tdf AS (SELECT term, count(DISTINCT doc_id) AS df FROM ttk GROUP BY 1), " +
      "tn AS (SELECT count(*) AS n_docs FROM exdedup), " +
      "tsc AS (SELECT ttf.doc_id, ttf.term, " +
      "round(ttf.tf * ln(tn.n_docs / tdf.df), 6) AS score " +
      "FROM ttf JOIN tdf USING (term) CROSS JOIN tn), " +
      "trk AS (SELECT doc_id, term, row_number() OVER (PARTITION BY doc_id " +
      "ORDER BY score DESC, term ASC) AS rn FROM tsc), " +
      "tts AS (SELECT doc_id, string_agg(term, ',' ORDER BY rn) AS top_terms " +
      "FROM trk WHERE rn <= 3 GROUP BY doc_id), " +
      clusterCtes("exdedup", "nd") +
      ", nearded AS (SELECT exdedup.* FROM exdedup LEFT JOIN ndclus USING (doc_id) " +
      "WHERE cluster IS NULL OR cluster = doc_id), " +
      "scrub AS (SELECT doc_id, source, lang, quality, " +
      "regexp_replace(regexp_replace(text || ' contact user' || doc_id || '@mail.example.com' || " +
      "CASE WHEN doc_id % 3 = 0 THEN ' cc admin' || doc_id || '@ex.org' ELSE '' END || " +
      "' tel +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'), " +
      s"'$emailRe', '<EMAIL>', 'g'), '$phoneRe', '<PHONE>', 'g') AS scrubbed FROM nearded), " +
      "samp AS (SELECT * FROM scrub WHERE CASE WHEN lang = 'en' " +
      "THEN substr(md5('q51|' || CAST(doc_id AS VARCHAR)), 1, 8) < '40000000' " +
      "ELSE substr(md5('q51|' || CAST(doc_id AS VARCHAR)), 1, 8) < 'c0000000' END), " +
      "tok AS (SELECT doc_id, source, lang, quality, " +
      "CAST(len(list_filter(string_split_regex(lower(scrubbed), '[^a-z0-9]+'), " +
      "w -> w <> '')) AS BIGINT) AS n_tokens FROM samp), " +
      "o AS (SELECT *, coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off FROM tok) " +
      "SELECT doc_id, source, lang, quality, n_tokens, " +
      "CAST(off % 512 AS BIGINT) AS bin_offset, " +
      "CAST(floor(off / 512) AS BIGINT) AS bin, top_terms " +
      "FROM o LEFT JOIN tts USING (doc_id)"
  }

  /** Q28 oracle — quality scoring from token statistics. */
  val quality: String =
    "WITH b AS (SELECT doc_id, " +
      "len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS n_tokens, " +
      "length(replace(text, ' ', '')) AS cns FROM documents) " +
      // the CASE guard mirrors qualityScore's NULL-text stance: without
      // it both engines' least() skips the null terms and a NULL text
      // "scores" 1.0
      "SELECT doc_id, n_tokens, round(CAST(cns AS DOUBLE) / n_tokens, 6) AS avg_token_len, " +
      "CASE WHEN n_tokens IS NOT NULL THEN " +
      "round(least(1.0, n_tokens / 50.0) * 0.5 + " +
      "least(1.0, (CAST(cns AS DOUBLE) / n_tokens) / 5.0) * 0.5, 6) END AS quality FROM b"

  /** Q122 oracle — the FULL train+score replay of the hashed-ngram NB
    * classifier: q65's rules label the corpus, unigram+bigram feature
    * instances hash through md5 into 4096 buckets (the same
    * first-8-hex-chars arithmetic as [[hexVal]], over `feat`), Laplace
    * log-odds weights round HALF-UP to 6 dp and scale to exact integer
    * micro-units, and each document's score is prior + the integer sum
    * over its instances — so a hashing, smoothing, counting, or
    * bigram-boundary slip on the Spark side cannot cancel.
    */
  val qualityClassifier: String = {
    val featHex = (0 until 8).map { j =>
      val mult = math.pow(16, 7 - j).toLong
      s"(strpos('0123456789abcdef', substr(md5(feat), ${j + 1}, 1)) - 1) * $mult"
    }.mkString(" + ")
    "WITH t AS (SELECT doc_id, list_filter(" +
      "string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '') AS ws " +
      "FROM documents), " +
      "m AS (SELECT doc_id, ws, " +
      "CAST(coalesce(len(ws), 0) AS BIGINT) AS n_words, " +
      "CASE WHEN len(ws) > 0 THEN round(CAST(len(array_to_string(ws, '')) " +
      "AS DOUBLE) / len(ws), 6) END AS mean_word_len, " +
      "CASE WHEN len(ws) > 0 THEN round(CAST(len(list_filter(ws, " +
      "w -> regexp_matches(w, '[a-z]'))) AS DOUBLE) / len(ws), 6) END " +
      "AS alpha_frac, " +
      "CAST(coalesce(len(list_filter(ws, w -> w IN ('the','be','to','of'," +
      "'and','a','in','that','have','i'))), 0) AS BIGINT) AS stop_hits " +
      "FROM t), " +
      "lbl AS (SELECT doc_id, ws, CAST(" +
      "n_words >= 40 AND n_words <= 100000 " +
      "AND coalesce(mean_word_len >= 3.0 AND mean_word_len <= 4.6, false) " +
      "AND coalesce(alpha_frac >= 0.8, false) AND stop_hits >= 2 " +
      "AS BIGINT) AS keep FROM m), " +
      "f AS (SELECT doc_id, keep, unnest(list_concat(ws, " +
      "list_transform(range(1, len(ws)), i -> ws[i] || '_' || ws[i+1]))) AS feat " +
      "FROM lbl), " +
      s"b AS (SELECT doc_id, keep, CAST($featHex AS BIGINT) % 4096 AS bucket FROM f), " +
      "cnt AS (SELECT bucket, sum(keep) AS c1, sum(1 - keep) AS c0 FROM b GROUP BY 1), " +
      "tot AS (SELECT sum(c1) AS t1, sum(c0) AS t0 FROM cnt), " +
      "wgt AS (SELECT bucket, CAST(CAST(round(" +
      "ln((c1 + 1.0) / (t1 + 4096)) - ln((c0 + 1.0) / (t0 + 4096)), 6) " +
      "AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS wm FROM cnt, tot), " +
      "pri AS (SELECT CAST(CAST(round(" +
      "ln((sum(keep) + 1.0) / (count(*) - sum(keep) + 1.0)), 6) " +
      "AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS pm FROM lbl), " +
      "sc AS (SELECT doc_id, count(*) AS nf, sum(wm) AS sm " +
      "FROM b JOIN wgt USING (bucket) GROUP BY 1) " +
      "SELECT l.doc_id, CAST(l.keep AS INTEGER) AS keep, " +
      "CAST(coalesce(sc.nf, 0) AS BIGINT) AS n_feats, " +
      "CAST(p.pm + coalesce(sc.sm, 0) AS DOUBLE) / 1e6 AS score, " +
      "CAST(p.pm + coalesce(sc.sm, 0) > 0 AS INTEGER) AS predicted " +
      "FROM lbl l LEFT JOIN sc USING (doc_id), pri p"
  }
}
