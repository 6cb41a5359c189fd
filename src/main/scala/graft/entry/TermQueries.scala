package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.functions.{LangId, TextFunctions}
import graft.operators.Keywords

/** Oracle-checked queries for the corpus term-statistics operators:
  * TF-IDF keyword extraction, PMI collocation mining, and multi-language
  * trigram-profile identification. Every oracle is a full replay —
  * the DuckDB side recomputes TF/DF/PMI/profile scores from the raw
  * documents table, not from precomputed artifacts.
  */
object TermQueries {

  private val toksD = "regexp_extract_all(lower(text), '[a-z0-9_]{2,}')"

  /** Top-5 TF-IDF keywords per document (first 500 docs keep the result
    * table bounded; the operator itself runs corpus-wide).
    */
  def keywordsTfidf(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id").as("id"), TextFunctions.tokens(col("text")).as("toks"))
    Keywords.tfidfTopK(docs, 5)
      .filter(col("id") < 500)
      .select(col("id"), col("rank"), col("term"), round(col("tfidf"), 6).as("tfidf"))
      .orderBy("id", "rank")
  }

  val keywordsTfidfSql: String =
    s"""WITH d AS (SELECT doc_id AS id, $toksD AS toks FROM documents),
       |terms AS (SELECT id, unnest(toks) AS term FROM d),
       |tf AS (SELECT id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(DISTINCT id) AS n_docs FROM d),
       |scored AS (SELECT id, tf.term AS term,
       |             tf * ln((n_docs + 1) / CAST(df + 1 AS DOUBLE)) AS tfidf
       |           FROM tf JOIN df USING (term) CROSS JOIN n),
       |ranked AS (SELECT id, term, tfidf,
       |             row_number() OVER (PARTITION BY id
       |               ORDER BY tfidf DESC, term ASC) AS rank
       |           FROM scored)
       |SELECT id, rank, term, round(tfidf, 6) AS tfidf
       |FROM ranked WHERE rank <= 5 AND id < 500
       |ORDER BY id, rank""".stripMargin

  /** Top-50 adjacent-bigram collocations by PMI (min pair count 10). */
  def collocationsPmi(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id").as("id"), TextFunctions.tokens(col("text")).as("toks"))
    Keywords.pmiCollocations(docs, 50, 10L)
      .select(col("rank"), col("w1"), col("w2"), col("pair_count"),
        round(col("pmi"), 6).as("pmi"))
      .orderBy("rank")
  }

  val collocationsPmiSql: String =
    s"""WITH d AS (SELECT doc_id AS id, $toksD AS toks FROM documents),
       |pairs AS (SELECT unnest(list_transform(range(1, len(toks)),
       |            i -> {'w1': toks[i], 'w2': toks[i + 1]})) AS p
       |          FROM d),
       |uni AS (SELECT unnest(toks) AS w FROM d),
       |cu AS (SELECT w, count(*) AS c FROM uni GROUP BY 1),
       |cb AS (SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS c_ab FROM pairs GROUP BY 1, 2),
       |tot AS (SELECT (SELECT CAST(sum(c) AS BIGINT) FROM cu) AS t_tok,
       |               (SELECT CAST(sum(c_ab) AS BIGINT) FROM cb) AS t_big),
       |scored AS (SELECT cb.w1, cb.w2, c_ab,
       |             ln(CAST(c_ab AS DOUBLE)) + 2 * ln(CAST(t_tok AS DOUBLE))
       |               - ln(CAST(t_big AS DOUBLE)) - ln(CAST(a.c AS DOUBLE))
       |               - ln(CAST(b.c AS DOUBLE)) AS pmi
       |           FROM cb
       |           JOIN cu a ON cb.w1 = a.w
       |           JOIN cu b ON cb.w2 = b.w
       |           CROSS JOIN tot
       |           WHERE c_ab >= 10),
       |ranked AS (SELECT row_number() OVER (ORDER BY pmi DESC, w1 ASC, w2 ASC) AS rank,
       |             w1, w2, c_ab AS pair_count, pmi
       |           FROM scored)
       |SELECT rank, w1, w2, pair_count, round(pmi, 6) AS pmi
       |FROM ranked WHERE rank <= 50 ORDER BY rank""".stripMargin

  /** Multi-language trigram-profile classification (en/de/fr/es/it/pt +
    * unknown), replayed in DuckDB from the same embedded profile table.
    */
  def textLangidMulti(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id").as("id"), col("text"))
    LangId.classify(docs)
      .select(col("id"), col("predicted"), col("score"))
      .orderBy("id")
  }

  val textLangidMultiSql: String =
    s"""WITH prof(lang, tri, w) AS (VALUES ${LangId.profileValuesSql}),
       |d AS (SELECT doc_id AS id,
       |        trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')) AS n
       |      FROM documents),
       |tris AS (SELECT id, unnest(CASE WHEN length(n) < 3 THEN []
       |           ELSE list_transform(range(1, length(n) - 1),
       |                  i -> substr(n, CAST(i AS INTEGER), 3)) END) AS tri
       |         FROM d),
       |scores AS (SELECT id, lang, CAST(sum(w) AS BIGINT) AS score
       |           FROM tris JOIN prof USING (tri) GROUP BY 1, 2),
       |best AS (SELECT id, lang, score,
       |           row_number() OVER (PARTITION BY id
       |             ORDER BY score DESC, lang ASC) AS rn
       |         FROM scores)
       |SELECT d.id,
       |       coalesce(b.lang, 'unknown') AS predicted,
       |       coalesce(b.score, 0) AS score
       |FROM d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON d.id = b.id
       |ORDER BY d.id""".stripMargin

  /** The full Gopher rule gate — every per-rule flag plus the conjunction,
    * so the oracle hash covers each rule's arithmetic, not just `keep`.
    * minWords=20 sits inside the synthetic corpus's length distribution
    * (the paper's 50 would gate everything on one rule and flatten the
    * hash signal; the arithmetic under test is identical).
    */
  def filterGopher(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id").as("id"), col("text").as("content"))
    graft.dedup.CorpusFilters.gopherRules(docs, minWords = 20)
      .select(col("id"), col("n_words"),
        round(col("mean_word_len"), 6).as("mean_word_len"),
        round(col("symbol_ratio"), 6).as("symbol_ratio"),
        round(col("alpha_frac"), 6).as("alpha_frac"),
        col("n_req_stops"), col("pass_words"), col("pass_meanlen"),
        col("pass_symbol"), col("pass_bullet"), col("pass_ellipsis"),
        col("pass_alpha"), col("pass_stops"), col("keep"))
      .orderBy("id")
  }

  val filterGopherSql: String =
    """WITH m AS (SELECT doc_id AS id, text,
      |    list_filter(regexp_split_to_array(text, '\s+'), w -> length(w) > 0) AS words,
      |    list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
      |      l -> length(l) > 0) AS lines,
      |    length(text) - length(replace(text, '#', '')) AS n_hash,
      |    (length(text) - length(regexp_replace(text, '\.\.\.', '', 'g'))) // 3 AS n_ell
      |  FROM documents),
      |s AS (SELECT id,
      |    CAST(len(words) AS BIGINT) AS n_words,
      |    CASE WHEN len(words) = 0 THEN 0.0
      |         ELSE list_reduce(list_prepend(0, list_transform(words, w -> length(w))),
      |                (a, b) -> a + b) * 1.0 / len(words) END AS mean_word_len,
      |    CASE WHEN len(words) = 0 THEN 0.0
      |         ELSE (n_hash + n_ell) * 1.0 / len(words) END AS symbol_ratio,
      |    CASE WHEN len(lines) = 0 THEN 0.0
      |         ELSE len(list_filter(lines, l -> starts_with(l, '•')
      |                OR starts_with(l, '- ') OR starts_with(l, '* ')))
      |              * 1.0 / len(lines) END AS bullet_frac,
      |    CASE WHEN len(lines) = 0 THEN 0.0
      |         ELSE len(list_filter(lines, l -> ends_with(l, '...')))
      |              * 1.0 / len(lines) END AS ellipsis_frac,
      |    CASE WHEN len(words) = 0 THEN 0.0
      |         ELSE len(list_filter(words, w -> regexp_matches(w, '[a-zA-Z]')))
      |              * 1.0 / len(words) END AS alpha_frac,
      |    CAST(len(list_intersect(list_distinct(list_transform(words, w -> lower(w))),
      |      ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'])) AS BIGINT)
      |      AS n_req_stops
      |  FROM m)
      |SELECT id, n_words, round(mean_word_len, 6) AS mean_word_len,
      |       round(symbol_ratio, 6) AS symbol_ratio,
      |       round(alpha_frac, 6) AS alpha_frac, n_req_stops,
      |       n_words >= 20 AND n_words <= 100000 AS pass_words,
      |       mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS pass_meanlen,
      |       symbol_ratio <= 0.1 AS pass_symbol,
      |       bullet_frac <= 0.9 AS pass_bullet,
      |       ellipsis_frac <= 0.3 AS pass_ellipsis,
      |       alpha_frac >= 0.8 AS pass_alpha,
      |       n_req_stops >= 2 AS pass_stops,
      |       (n_words >= 20 AND n_words <= 100000)
      |         AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
      |         AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9
      |         AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8
      |         AND n_req_stops >= 2 AS keep
      |FROM s ORDER BY id""".stripMargin

  /** Cluster-topics report (c-TF-IDF, the BERTopic idea): assign docs to
    * embedding clusters, then describe each cluster by its top TF-IDF
    * terms treating clusters as the "documents" — literally
    * [[Keywords.tfidfTopK]] with cluster ids. The oracle replays the
    * centroid seeding + cosine argmin assignment (same fragment as
    * q_dedup_semantic) and the term scoring.
    */
  def clusterTopics(s: SparkSession, dir: String): DataFrame = {
    val vecs = graft.Tables.vectors(s, dir)
    val cents = graft.ann.Ann.representativeCentroids(vecs, "label").cache()
    val assigned = graft.ann.Ann.assign(vecs, cents)
    val docsT = t(s, dir, "documents")
      .select(col("doc_id").as("doc"), TextFunctions.tokens(col("text")).as("toks"))
    val perCluster = docsT
      .join(assigned.select(col("id").as("doc"), col("cluster_id")), "doc")
      .select(col("cluster_id").as("id"), col("toks"))
    Keywords.tfidfTopK(perCluster, 5)
      .select(col("id").as("cluster_id"), col("rank"), col("term"),
        round(col("tfidf"), 6).as("tfidf"))
      .orderBy("cluster_id", "rank")
  }

  val clusterTopicsSql: String =
    s"""WITH e AS (SELECT vec_id AS id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cent AS (
       |  SELECT label AS centroid_id, v AS c FROM (
       |    SELECT label, v, row_number() OVER (PARTITION BY label ORDER BY id) AS rn FROM e)
       |  WHERE rn = 1),
       |assign AS (
       |  SELECT id, cluster_id FROM (
       |    SELECT e.id, cent.centroid_id AS cluster_id,
       |           row_number() OVER (PARTITION BY e.id
       |             ORDER BY 1.0 - list_cosine_similarity(e.v, cent.c), cent.centroid_id) AS rn
       |    FROM e CROSS JOIN cent)
       |  WHERE rn = 1),
       |d AS (SELECT a.cluster_id AS cid, $toksD AS toks
       |      FROM documents JOIN assign a ON documents.doc_id = a.id),
       |terms AS (SELECT cid, unnest(toks) AS term FROM d),
       |tf AS (SELECT cid, term, count(*) AS tf FROM terms GROUP BY 1, 2),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(DISTINCT cid) AS n_docs FROM d),
       |scored AS (SELECT cid, tf.term AS term,
       |             tf * ln((n_docs + 1) / CAST(df + 1 AS DOUBLE)) AS tfidf
       |           FROM tf JOIN df USING (term) CROSS JOIN n),
       |ranked AS (SELECT cid, term, tfidf,
       |             row_number() OVER (PARTITION BY cid
       |               ORDER BY tfidf DESC, term ASC) AS rank
       |           FROM scored)
       |SELECT cid AS cluster_id, rank, term, round(tfidf, 6) AS tfidf
       |FROM ranked WHERE rank <= 5
       |ORDER BY cluster_id, rank""".stripMargin

  // ---- Unigram-LM tokenizer (Kudo 2018 / SentencePiece): the oracle
  //      replays seeding, micro-nat costs, the INTEGER Viterbi DP (encoded
  //      tie-break, list_reduce accumulator), the recursive backtrace, and
  //      the EM usage re-estimation. ----

  /** Shared SQL prefix: word table → seed pieces → costs → per-word
    * (p, L) cost grid → integer Viterbi (list_reduce; encoded
    * `cost*8 + (4−L)` so min() breaks ties to the longest piece) →
    * recursive-CTE backtrace into pieces. Callers prepend WITH RECURSIVE.
    */
  private val unigramPrefixSql: String =
    s"""d AS (SELECT $toksD AS toks FROM documents),
       |w AS (SELECT unnest(toks) AS word FROM d),
       |words AS (SELECT word, count(*) AS n FROM w GROUP BY 1),
       |subx AS (SELECT word, n,
       |           unnest(flatten(list_transform(range(1, length(word) + 1), i ->
       |             list_transform(range(1, 5), L -> {'i': i, 'L': L})))) AS s
       |         FROM words),
       |sub AS (SELECT word, n, substr(word, CAST(s.i AS INT), CAST(s.L AS INT)) AS piece
       |        FROM subx WHERE s.i + s.L - 1 <= length(word)),
       |seed AS (SELECT piece, CAST(sum(n) AS BIGINT) AS freq FROM sub GROUP BY 1
       |         HAVING length(piece) = 1 OR sum(n) >= 2),
       |tot AS (SELECT CAST(sum(freq) AS BIGINT) AS t FROM seed),
       |costs AS (SELECT piece, CAST(floor(-ln(freq * 1.0 / t) * 1000000) AS BIGINT) AS c
       |          FROM seed CROSS JOIN tot),
       |gridx AS (SELECT word,
       |            unnest(flatten(list_transform(range(1, length(word) + 1), p ->
       |              list_transform(range(1, 5), L -> {'p': p, 'L': L})))) AS s
       |          FROM words),
       |grid AS (SELECT word, s.p AS p, s.L AS L,
       |           CASE WHEN s.p >= s.L
       |                THEN substr(word, CAST(s.p - s.L + 1 AS INT), CAST(s.L AS INT)) END AS piece
       |         FROM gridx),
       |gcost AS (SELECT g.word, g.p, g.L, coalesce(c.c, CAST(999999999999 AS BIGINT)) AS c
       |          FROM grid g LEFT JOIN costs c ON g.piece = c.piece),
       |parr AS (SELECT word, list(c ORDER BY p, L) AS pc FROM gcost GROUP BY word),
       |dp AS (SELECT words.word, words.n, length(words.word) AS len, parr.pc,
       |         list_reduce(
       |           list_prepend([CAST(0 AS BIGINT)],
       |             list_transform(range(1, length(words.word) + 1), p -> [CAST(p AS BIGINT)])),
       |           (acc, x) -> list_append(acc,
       |             list_min(list_transform([1, 2, 3, 4], L ->
       |               CASE WHEN x[1] >= L
       |                 THEN ((acc[CAST(x[1] - L + 1 AS INT)] // 8) + pc[CAST((x[1] - 1) * 4 + L AS INT)]) * 8 + (4 - L)
       |                 ELSE CAST(99999999999999999 AS BIGINT) END)))) AS earr
       |       FROM words JOIN parr USING (word)),
       |els AS (SELECT word, n, len, earr, list_transform(earr, e -> 4 - (e % 8)) AS Ls FROM dp),
       |r(word, pos, L) AS (
       |  SELECT word, len, Ls[len + 1] FROM els WHERE len > 0
       |  UNION ALL
       |  SELECT r.word, r.pos - r.L, e.Ls[r.pos - r.L + 1]
       |  FROM r JOIN els e USING (word) WHERE r.pos - r.L > 0
       |),
       |pieces AS (SELECT word, pos,
       |             substr(word, CAST(pos - L + 1 AS INT), CAST(L AS INT)) AS piece
       |           FROM r)""".stripMargin

  /** Per-distinct-word Viterbi segmentation under the seed cost table. */
  def unigramSegment(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.UnigramLm
    val docsToks = t(s, dir, "documents")
      .select(col("doc_id").as("id"), TextFunctions.tokens(col("text")).as("toks"))
    val words = UnigramLm.wordTable(docsToks)
    val costs = UnigramLm.costTable(UnigramLm.seedPieces(words))
    UnigramLm.segmentWords(words, costs)
      .select(col("word"), col("n"), col("pieces"), col("n_pieces").cast("long").as("n_pieces"),
        col("cost_micro"))
      .orderBy("word")
  }

  val unigramSegmentSql: String =
    s"""WITH RECURSIVE
       |$unigramPrefixSql
       |SELECT p.word, any_value(e.n) AS n,
       |       string_agg(p.piece, ' ' ORDER BY p.pos) AS pieces,
       |       count(*) AS n_pieces,
       |       any_value(e.earr[e.len + 1] // 8) AS cost_micro
       |FROM pieces p JOIN els e USING (word)
       |GROUP BY p.word ORDER BY p.word""".stripMargin

  /** One EM round of unigram-LM training: final (piece, usage, cost). */
  def unigramTrain(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.UnigramLm
    val docsToks = t(s, dir, "documents")
      .select(col("doc_id").as("id"), TextFunctions.tokens(col("text")).as("toks"))
    UnigramLm.train(docsToks, rounds = 1).orderBy("piece")
  }

  val unigramTrainSql: String =
    s"""WITH RECURSIVE
       |$unigramPrefixSql,
       |usage AS (SELECT p.piece, CAST(sum(e.n) AS BIGINT) AS usage
       |          FROM pieces p JOIN els e USING (word) GROUP BY 1),
       |kept AS (SELECT c.piece, coalesce(u.usage, 0) AS usage,
       |           coalesce(u.usage, 0) +
       |             CASE WHEN length(c.piece) = 1 THEN 1 ELSE 0 END AS smoothed
       |         FROM costs c LEFT JOIN usage u USING (piece)
       |         WHERE coalesce(u.usage, 0) +
       |             CASE WHEN length(c.piece) = 1 THEN 1 ELSE 0 END > 0),
       |tot2 AS (SELECT CAST(sum(smoothed) AS BIGINT) AS t2 FROM kept)
       |SELECT piece, usage,
       |       CAST(floor(-ln(smoothed * 1.0 / t2) * 1000000) AS BIGINT) AS cost_micro
       |FROM kept CROSS JOIN tot2 ORDER BY piece""".stripMargin

  /** WordPiece-style greedy MaxMatch segmentation under the same seed
    * vocabulary the unigram-LM trainer starts from — the BERT inference
    * rule (longest piece at each position, no backtracking), shipped
    * next to the Viterbi form so the greedy/optimal contrast is
    * measurable. The oracle replays seeding, the per-(position, length)
    * vocabulary-membership grid, and the forward greedy scan as a
    * recursive CTE.
    */
  def wordpieceSegment(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.UnigramLm
    val docsToks = t(s, dir, "documents")
      .select(col("doc_id").as("id"), TextFunctions.tokens(col("text")).as("toks"))
    val words = UnigramLm.wordTable(docsToks)
    UnigramLm.segmentWordsGreedy(words, UnigramLm.seedPieces(words))
      .select(col("word"), col("n"), col("pieces"),
        col("n_pieces").cast("long").as("n_pieces"))
      .orderBy("word")
  }

  val wordpieceSegmentSql: String =
    s"""WITH RECURSIVE
       |d AS (SELECT $toksD AS toks FROM documents),
       |w AS (SELECT unnest(toks) AS word FROM d),
       |words AS (SELECT word, count(*) AS n FROM w GROUP BY 1),
       |subx AS (SELECT word, n,
       |           unnest(flatten(list_transform(range(1, length(word) + 1), i ->
       |             list_transform(range(1, 5), L -> {'i': i, 'L': L})))) AS s
       |         FROM words),
       |sub AS (SELECT word, n, substr(word, CAST(s.i AS INT), CAST(s.L AS INT)) AS piece
       |        FROM subx WHERE s.i + s.L - 1 <= length(word)),
       |seed AS (SELECT piece FROM (SELECT piece, sum(n) AS freq FROM sub GROUP BY 1)
       |         WHERE length(piece) = 1 OR freq >= 2),
       |gridx AS (SELECT word,
       |            unnest(flatten(list_transform(range(1, length(word) + 1), p ->
       |              list_transform(range(1, 5), L -> {'p': p, 'L': L})))) AS s
       |          FROM words),
       |grid AS (SELECT word, s.p AS p, s.L AS L,
       |           CASE WHEN s.p + s.L - 1 <= length(word)
       |                THEN substr(word, CAST(s.p AS INT), CAST(s.L AS INT)) END AS piece
       |         FROM gridx),
       |flag AS (SELECT grid.word, grid.p, grid.L,
       |           grid.piece IS NOT NULL AND seed.piece IS NOT NULL AS ok
       |         FROM grid LEFT JOIN seed ON grid.piece = seed.piece),
       |farr AS (SELECT word, list(ok ORDER BY p, L) AS fl FROM flag GROUP BY word),
       |fw AS (SELECT words.word, words.n, length(words.word) AS len, farr.fl
       |       FROM words JOIN farr USING (word)),
       |r(word, pos, L) AS (
       |  SELECT word, 1,
       |    CAST(list_max(list_filter([1, 2, 3, 4],
       |      L -> L <= len AND fl[CAST(L AS INT)])) AS INT)
       |  FROM fw WHERE len > 0
       |  UNION ALL
       |  SELECT r.word, r.pos + r.L,
       |    CAST(list_max(list_filter([1, 2, 3, 4],
       |      L2 -> r.pos + r.L + L2 - 1 <= f.len
       |        AND f.fl[CAST((r.pos + r.L - 1) * 4 + L2 AS INT)])) AS INT)
       |  FROM r JOIN fw f USING (word) WHERE r.pos + r.L <= f.len
       |)
       |SELECT p.word, any_value(f.n) AS n,
       |       string_agg(substr(p.word, CAST(p.pos AS INT), CAST(p.L AS INT)),
       |         ' ' ORDER BY p.pos) AS pieces,
       |       CAST(count(*) AS BIGINT) AS n_pieces
       |FROM r p JOIN fw f USING (word)
       |GROUP BY p.word ORDER BY p.word""".stripMargin

  /** Positional phrase search with snippets: adjacency + order, phrase-TF
    * scoring, ±3-token highlight windows. The oracle replays the start-
    * position sweep, top-k, and snippet slicing per query.
    */
  def phraseSearch(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.textCorpus(s, dir)
    graft.search.Lexical.phraseSearch(docs,
        Seq(0 -> "table hash", 1 -> "customer join", 2 -> "spark hash sort"),
        k = 10, window = 3)
      .select(col("query_idx"), col("id"), col("phrase_tf"),
        col("first_pos").cast("long").as("first_pos"), col("snippet"))
      .orderBy(col("query_idx"), col("phrase_tf").desc, col("id"))
  }

  val phraseSearchSql: String =
    s"""WITH d AS (SELECT doc_id AS id, $toksD AS toks FROM documents),
       |q(query_idx, terms) AS (VALUES
       |  (0, ['table', 'hash']), (1, ['customer', 'join']),
       |  (2, ['spark', 'hash', 'sort'])),
       |m AS (SELECT query_idx, id, toks, len(terms) AS m, terms,
       |        list_filter(range(1, len(toks) - len(terms) + 2), i ->
       |          list_reduce(list_prepend(TRUE,
       |            list_transform(range(1, len(terms) + 1), j ->
       |              toks[CAST(i + j - 1 AS INT)] = terms[CAST(j AS INT)])),
       |            (a, b) -> a AND b)) AS starts
       |      FROM d CROSS JOIN q),
       |hits AS (SELECT query_idx, id, toks, m,
       |           CAST(len(starts) AS BIGINT) AS phrase_tf,
       |           CAST(starts[1] - 1 AS BIGINT) AS first_pos
       |         FROM m WHERE len(starts) > 0),
       |topk AS (SELECT *, row_number() OVER (PARTITION BY query_idx
       |           ORDER BY phrase_tf DESC, id ASC) AS rn
       |         FROM hits)
       |SELECT query_idx, id, phrase_tf, first_pos,
       |       array_to_string(toks[
       |         CAST(greatest(first_pos - 3, 0) + 1 AS INT):
       |         CAST(first_pos + m + 3 AS INT)], ' ') AS snippet
       |FROM topk WHERE rn <= 10
       |ORDER BY query_idx, phrase_tf DESC, id""".stripMargin

  /** Per-language equi-width histogram of document token counts — the
    * ANALYZE companion to percentiles; integer-exact bin edges.
    */
  def corpusHistogram(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("lang"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("n_tok"))
    graft.operators.Profile.histogram(docs, "lang", "n_tok", nBins = 8)
      .orderBy("group", "bin")
  }

  val corpusHistogramSql: String =
    s"""WITH d AS (SELECT lang AS grp, CAST(len($toksD) AS BIGINT) AS v FROM documents),
       |b AS (SELECT grp, min(v) AS lo, max(v) AS hi FROM d GROUP BY 1),
       |w AS (SELECT grp, lo, greatest(CAST(ceil((hi - lo + 1) * 1.0 / 8) AS BIGINT), 1) AS wd
       |      FROM b),
       |x AS (SELECT d.grp, least((d.v - w.lo) // w.wd, 7) AS bin, w.lo, w.wd
       |      FROM d JOIN w USING (grp))
       |SELECT grp AS "group", bin,
       |       lo + bin * wd AS lo, lo + (bin + 1) * wd - 1 AS hi,
       |       count(*) AS n
       |FROM x GROUP BY grp, bin, lo, wd
       |ORDER BY "group", bin""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_corpus_histogram" -> (corpusHistogram _),
    "q_phrase_search" -> (phraseSearch _),
    "q_unigram_segment" -> (unigramSegment _),
    "q_wordpiece_segment" -> (wordpieceSegment _),
    "q_unigram_train" -> (unigramTrain _),
    "q_keywords_tfidf" -> (keywordsTfidf _),
    "q_collocations_pmi" -> (collocationsPmi _),
    "q_text_langid_multi" -> (textLangidMulti _),
    "q_filter_gopher" -> (filterGopher _),
    "q_cluster_topics" -> (clusterTopics _)
  )

  def oracles: Map[String, String] = Map(
    "q_corpus_histogram" -> corpusHistogramSql,
    "q_phrase_search" -> phraseSearchSql,
    "q_unigram_segment" -> unigramSegmentSql,
    "q_wordpiece_segment" -> wordpieceSegmentSql,
    "q_unigram_train" -> unigramTrainSql,
    "q_keywords_tfidf" -> keywordsTfidfSql,
    "q_collocations_pmi" -> collocationsPmiSql,
    "q_text_langid_multi" -> textLangidMultiSql,
    "q_filter_gopher" -> filterGopherSql,
    "q_cluster_topics" -> clusterTopicsSql
  )
}
