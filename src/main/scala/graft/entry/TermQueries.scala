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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_keywords_tfidf" -> (keywordsTfidf _),
    "q_collocations_pmi" -> (collocationsPmi _),
    "q_text_langid_multi" -> (textLangidMulti _)
  )

  def oracles: Map[String, String] = Map(
    "q_keywords_tfidf" -> keywordsTfidfSql,
    "q_collocations_pmi" -> collocationsPmiSql,
    "q_text_langid_multi" -> textLangidMultiSql
  )
}
