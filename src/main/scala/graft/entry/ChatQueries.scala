package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Chat
import graft.functions.TextFunctions

/** SFT / chat-transcript curation queries. Conversations are synthesized
  * deterministically from the documents table (turn i carries tokens
  * (i-1)*13+1 .. +len_i of the doc, len_i = 5 + (i*7) mod 9, up to 7
  * content turns behind a system turn; docs with doc_id % 13 = 0 get turn
  * 2 mis-roled 'user' — a planted alternation defect), serialized to the
  * JSON messages format, and re-parsed through [[Chat.parseConversations]]
  * — so the JSON roundtrip, the structural audit, and the budget trim are
  * all under the one DuckDB replay.
  */
object ChatQueries {

  /** (doc_id, msgs JSON) — the synthesized chat corpus. */
  private def convJson(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.t(s, dir, "documents")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .withColumn("n_tok", size(col("toks")))
    val content = d
      .select(col("doc_id"), col("n_tok"), col("toks"),
        explode(sequence(lit(1), lit(7))).as("i"))
      .withColumn("len", lit(5) + pmod(col("i") * 7, lit(9)))
      .filter((col("i") - 1) * 13 + col("len") <= col("n_tok"))
      .withColumn("role",
        when(col("doc_id") % 13 === 0 && col("i") === 2, lit("user"))
          .otherwise(when(pmod(col("i"), lit(2)) === 1, lit("user"))
            .otherwise(lit("assistant"))))
      .withColumn("content",
        expr("concat_ws(' ', slice(toks, (i - 1) * 13 + 1, len))"))
      .select(col("doc_id"), col("i"), col("role"), col("content"))
    val sys = d.select(col("doc_id"), lit(0).as("i"),
      lit("system").as("role"), lit("system guidelines apply").as("content"))
    content.unionByName(sys)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("i"), col("role"), col("content"))))
        .as("ts"))
      .select(col("doc_id"),
        to_json(expr("transform(ts, t -> struct(t.role AS role, t.content AS content))"))
          .as("msgs"))
  }

  /** DuckDB fragment: the content turns (doc_id, i, len, role). */
  private val turnsCte: String =
    """d AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]{2,}') AS toks
      |      FROM documents),
      |t AS (SELECT d.doc_id, g.i, 5 + (g.i * 7) % 9 AS len,
      |             CASE WHEN d.doc_id % 13 = 0 AND g.i = 2 THEN 'user'
      |                  WHEN g.i % 2 = 1 THEN 'user' ELSE 'assistant' END AS role
      |      FROM d CROSS JOIN generate_series(1, 7) g(i)
      |      WHERE (g.i - 1) * 13 + 5 + (g.i * 7) % 9 <= len(d.toks))""".stripMargin

  // ---- structural audit: JSON roundtrip -> per-conversation validity ----
  def chatValidate(s: SparkSession, dir: String): DataFrame =
    Chat.alternationReport(
        Chat.parseConversations(convJson(s, dir), "doc_id", "msgs"))
      .orderBy("conv_id")

  val chatValidateSql: String =
    s"""WITH $turnsCte,
      |f AS (SELECT doc_id,
      |             CAST(count(*) AS INTEGER) AS n_content,
      |             bool_and(prev IS NULL OR prev <> role) AS alternates,
      |             max(CASE WHEN i = 1 THEN role END) = 'user' AS starts_user,
      |             arg_max(role, i) = 'assistant' AS ends_assistant
      |      FROM (SELECT *, lag(role) OVER (PARTITION BY doc_id ORDER BY i) AS prev
      |            FROM t)
      |      GROUP BY doc_id)
      |SELECT d.doc_id AS conv_id,
      |       CAST(coalesce(f.n_content, 0) + 1 AS INTEGER) AS n_turns,
      |       TRUE AS has_system,
      |       coalesce(f.starts_user, FALSE) AS starts_user,
      |       coalesce(f.alternates, TRUE) AS alternates,
      |       coalesce(f.ends_assistant, FALSE) AS ends_assistant,
      |       coalesce(f.starts_user, FALSE) AND coalesce(f.alternates, TRUE)
      |         AND coalesce(f.ends_assistant, FALSE) AS valid
      |FROM d LEFT JOIN f ON f.doc_id = d.doc_id
      |ORDER BY conv_id""".stripMargin

  // ---- budget trim: longest suffix within 40 tokens, user-aligned ----
  // The parsed turns are re-counted with the SAME tokenizer the synthesis
  // used, so content-turn costs equal len_i and the system turn costs 3 —
  // the oracle replays the reverse running sum and the user-alignment cut
  // from the synthesis arithmetic alone, without seeing any JSON.
  def chatBudget(s: SparkSession, dir: String): DataFrame = {
    val turns = Chat.parseConversations(convJson(s, dir), "doc_id", "msgs")
      .withColumn("tokens",
        size(TextFunctions.tokens(col("content"))).cast("long"))
    Chat.contextBudgetTrim(turns, budget = 40L, "tokens")
      .groupBy("conv_id")
      .agg(
        sum(when(col("role") =!= "system", 1L).otherwise(0L)).as("n_kept"),
        sum(col("tokens")).as("kept_tokens"),
        coalesce(min(when(col("role") =!= "system", col("turn_idx"))),
          lit(-1)).cast("long").as("first_kept_idx"))
      .orderBy("conv_id")
  }

  val chatBudgetSql: String =
    s"""WITH $turnsCte,
      |rv AS (SELECT doc_id, i, len, role,
      |              sum(len) OVER (PARTITION BY doc_id ORDER BY i DESC) AS rev_sum
      |       FROM t),
      |sfx AS (SELECT * FROM rv WHERE rev_sum + 3 <= 40),
      |fu AS (SELECT doc_id, min(CASE WHEN role = 'user' THEN i END) AS u0
      |       FROM sfx GROUP BY doc_id),
      |kept AS (SELECT sfx.* FROM sfx JOIN fu ON fu.doc_id = sfx.doc_id
      |         WHERE sfx.i >= fu.u0)
      |SELECT d.doc_id AS conv_id,
      |       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
      |       CAST(coalesce(k.kept_len, 0) + 3 AS BIGINT) AS kept_tokens,
      |       CAST(coalesce(k.first_i, -1) AS BIGINT) AS first_kept_idx
      |FROM d LEFT JOIN (SELECT doc_id, count(*) AS n_kept, sum(len) AS kept_len,
      |                         min(i) AS first_i
      |                  FROM kept GROUP BY doc_id) k ON k.doc_id = d.doc_id
      |ORDER BY conv_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_chat_validate" -> (chatValidate _),
    "q_chat_budget" -> (chatBudget _))

  def oracles: Map[String, String] = Map(
    "q_chat_validate" -> chatValidateSql,
    "q_chat_budget" -> chatBudgetSql)
}
