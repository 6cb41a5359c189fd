package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}

/** SFT / chat-transcript curation — the conversation-shaped side of the
  * training-data pipeline (instruction-tuning corpora are message ARRAYS,
  * not flat documents; the reference stores such payloads as opaque
  * documents and this engine must curate them at corpus scale):
  *
  *  - [[parseConversations]]: JSON `[{"role","content"},…]` → one row per
  *    turn, schema-checked by `from_json` (malformed arrays become null →
  *    zero turns, a governed drop the audit query surfaces as n_turns=0).
  *  - [[alternationReport]]: the structural validity audit every SFT
  *    pipeline runs before tokenization — optional leading system turn,
  *    then strict user/assistant alternation, user first, assistant last.
  *  - [[contextBudgetTrim]]: fit each conversation to a token budget by
  *    keeping the longest SUFFIX of content turns (recency wins — the
  *    standard SFT truncation), always charging/keeping the system turn,
  *    then advancing the start to the first kept USER turn so no
  *    response is left without its prompt.
  *
  * Scale shape: everything is conversation-keyed — one exchange per
  * operator; per-key state is a conversation's turn list (bounded by
  * context length, thousands of tokens, never corpus-sized), so the
  * plans survive any corpus multiplier. No UDFs: parsing is `from_json`,
  * the audits are array HOFs, the trim is two windows.
  */
object Chat {

  val turnSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("role", StringType), StructField("content", StringType))))

  /** Tool-call chat schema — the explicit-id grammar real tool-use corpora
    * carry (the OpenAI-style message shape): an assistant turn lists the
    * ids of the calls it issued (`tool_calls`), a tool turn names the call
    * it answers (`tool_call_id`). Parallel calls (one assistant, several
    * results) and id verification both need these columns; the positional
    * grammar ([[alternationReport]]/[[contextBudgetTrim]]) remains the
    * id-free fallback.
    */
  val toolTurnSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("role", StringType), StructField("content", StringType),
    StructField("tool_call_id", StringType),
    StructField("tool_calls", ArrayType(StringType)))))

  /** One row per turn: (conv_id, turn_idx, role, content). */
  def parseConversations(df: DataFrame, idCol: String, jsonCol: String): DataFrame =
    df.select(col(idCol).as("conv_id"),
        posexplode(from_json(col(jsonCol), turnSchema)))
      .select(col("conv_id"), col("pos").as("turn_idx"),
        col("col.role").as("role"), col("col.content").as("content"))

  /** One row per turn with the tool-call id columns:
    * (conv_id, turn_idx, role, content, call_id, calls).
    */
  def parseConversationsTools(df: DataFrame, idCol: String, jsonCol: String): DataFrame =
    df.select(col(idCol).as("conv_id"),
        posexplode(from_json(col(jsonCol), toolTurnSchema)))
      .select(col("conv_id"), col("pos").as("turn_idx"),
        col("col.role").as("role"), col("col.content").as("content"),
        col("col.tool_call_id").as("call_id"),
        col("col.tool_calls").as("calls"))

  /** Per-conversation structural audit over (conv_id, turn_idx, role):
    * (conv_id, n_turns, has_system, starts_user, alternates,
    * ends_assistant, valid). `alternates` is vacuously true for empty
    * content; `valid` additionally demands a user start and an assistant
    * end, so an empty or system-only conversation audits invalid.
    *
    * Role grammar (after the optional leading system turn): `user` may
    * open the conversation or follow an assistant turn; `assistant`
    * follows a user or a TOOL turn; `tool` (a function/tool result) is
    * valid ONLY directly after the assistant turn that called it — never
    * first, never after user, never after another tool. On corpora
    * without tool turns this reduces exactly to strict user/assistant
    * alternation (the pre-tool semantics). Any unknown role fails the
    * audit.
    */
  def alternationReport(turns: DataFrame): DataFrame = {
    val byConv = turns
      .groupBy("conv_id")
      .agg(sort_array(collect_list(struct(col("turn_idx"), col("role"))))
        .as("ts"))
      .select(col("conv_id"), expr("transform(ts, t -> t.role)").as("roles"))
    byConv.select(
      col("conv_id"),
      size(col("roles")).as("n_turns"),
      expr("size(roles) > 0 AND roles[0] = 'system'").as("has_system"),
      expr("""CASE WHEN size(roles) > 0 AND roles[0] = 'system'
             |     THEN slice(roles, 2, size(roles) - 1)
             |     ELSE roles END""".stripMargin).as("cr"))
      .select(
        col("conv_id"), col("n_turns"), col("has_system"),
        expr("size(cr) > 0 AND cr[0] = 'user'").as("starts_user"),
        // sequence(1, 0) DESCENDS in Spark — branch the empty case
        expr("""size(cr) = 0 OR forall(sequence(1, size(cr)),
               |  i -> cr[i - 1] IN ('user', 'assistant', 'tool') AND
               |       (CASE WHEN i = 1 THEN cr[0] <> 'tool'
               |             WHEN cr[i - 1] = 'user' THEN cr[i - 2] = 'assistant'
               |             WHEN cr[i - 1] = 'assistant'
               |               THEN cr[i - 2] IN ('user', 'tool')
               |             ELSE cr[i - 2] = 'assistant' END))""".stripMargin)
          .as("alternates"),
        expr("size(cr) > 0 AND element_at(cr, -1) = 'assistant'")
          .as("ends_assistant"))
      .withColumn("valid",
        col("starts_user") && col("alternates") && col("ends_assistant"))
  }

  /** Id-anchored structural audit over the tool-call grammar
    * ([[parseConversationsTools]] rows: conv_id, turn_idx, role, call_id,
    * calls). Role grammar (after the optional leading system turn):
    * `user` opens or follows an assistant; `assistant` follows user or
    * tool; `tool` follows an assistant OR another tool — a RUN of tool
    * results after one assistant is how parallel calls land, which the
    * positional grammar ([[alternationReport]]) must reject but this one
    * verifies BY ID: every tool turn's `call_id` must appear in the
    * `calls` list of the nearest preceding assistant turn (the run's
    * head). A tool row with a null call_id anchors positionally (legacy
    * transcripts without ids keep the old semantics). Adds
    * `tools_anchored` to the report; `valid` additionally requires it.
    *
    * Scale shape: the grammar is one conversation-keyed agg like
    * [[alternationReport]]; anchoring is a (conv_id, call_id)-keyed join
    * of tool rows against exploded assistant call lists — per-key state
    * bounded by a conversation's turn count, never corpus-sized.
    */
  def alternationReportIds(turns: DataFrame): DataFrame = {
    val wPrev = org.apache.spark.sql.expressions.Window
      .partitionBy("conv_id").orderBy(col("turn_idx").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // NO self-join: the nearest preceding assistant's call list arrives
    // per row through a window (conversation-bounded state; a join back
    // onto the same generator-derived lineage also mis-resolves under
    // Spark's self-join dedup — observed returning a shifted column)
    val toolOk = turns
      .withColumn("__anchor",
        max(when(col("role") <=> "assistant", col("turn_idx"))).over(wPrev))
      .withColumn("__anchor_calls",
        last(when(col("role") <=> "assistant",
          coalesce(col("calls"), array().cast("array<string>"))),
          ignoreNulls = true).over(wPrev))
      .filter(col("role") <=> "tool")
      .select(col("conv_id"),
        (col("__anchor").isNotNull &&
          (col("call_id").isNull ||
            array_contains(col("__anchor_calls"), col("call_id")))).as("__ok"))
      .groupBy("conv_id")
      .agg((sum(when(col("__ok"), 0L).otherwise(1L)) === 0L).as("tools_anchored"))
    val byConv = turns
      .groupBy("conv_id")
      .agg(sort_array(collect_list(struct(col("turn_idx"), col("role"))))
        .as("ts"))
      .select(col("conv_id"), expr("transform(ts, t -> t.role)").as("roles"))
    byConv.select(
      col("conv_id"),
      size(col("roles")).as("n_turns"),
      expr("size(roles) > 0 AND roles[0] = 'system'").as("has_system"),
      expr("""CASE WHEN size(roles) > 0 AND roles[0] = 'system'
             |     THEN slice(roles, 2, size(roles) - 1)
             |     ELSE roles END""".stripMargin).as("cr"))
      .select(
        col("conv_id"), col("n_turns"), col("has_system"),
        expr("size(cr) > 0 AND cr[0] = 'user'").as("starts_user"),
        // the id grammar's one positional relaxation: tool may follow
        // tool (a parallel-results run) — id anchoring carries the
        // correctness the positional adjacency rule used to
        expr("""size(cr) = 0 OR forall(sequence(1, size(cr)),
               |  i -> cr[i - 1] IN ('user', 'assistant', 'tool') AND
               |       (CASE WHEN i = 1 THEN cr[0] <> 'tool'
               |             WHEN cr[i - 1] = 'user' THEN cr[i - 2] = 'assistant'
               |             WHEN cr[i - 1] = 'assistant'
               |               THEN cr[i - 2] IN ('user', 'tool')
               |             ELSE cr[i - 2] IN ('assistant', 'tool') END))""".stripMargin)
          .as("alternates"),
        expr("size(cr) > 0 AND element_at(cr, -1) = 'assistant'")
          .as("ends_assistant"))
      .join(toolOk, Seq("conv_id"), "left")
      .na.fill(true, Seq("tools_anchored")) // no tool rows: vacuously ok
      .withColumn("valid",
        col("starts_user") && col("alternates") && col("ends_assistant") &&
          col("tools_anchored"))
  }

  /** Id-anchored budget-fit over [[parseConversationsTools]] rows plus a
    * `<tokensCol>`: the [[contextBudgetTrim]] rule with the tool anchor
    * resolved BY CALL ID — a kept tool result's anchor is the assistant
    * turn whose `calls` contains its `call_id` (the nearest such turn if
    * ids repeat), not the nearest assistant positionally. That keeps a
    * result whose true calling turn survives the cut even when a later
    * assistant turn sits between them, and drops a result whose calling
    * turn was trimmed even when a later assistant turn survived — the
    * two cases the positional heuristic gets wrong on parallel/
    * interleaved tool-call transcripts. Null call_id falls back to the
    * positional anchor; a tool row whose id matches no assistant drops.
    */
  def contextBudgetTrimIds(
      turns: DataFrame, budget: Long, tokensCol: String): DataFrame = {
    require(budget >= 1, s"budget >= 1, got $budget")
    val cols = Seq("conv_id", "turn_idx", "role", tokensCol).map(col)
    val sys = turns.filter(col("role") === "system")
    val content = turns.filter(col("role") =!= "system")
    val sysTok = sys.groupBy("conv_id")
      .agg(sum(col(tokensCol)).as("__sys_tok"))
    val wDesc = org.apache.spark.sql.expressions.Window
      .partitionBy("conv_id").orderBy(col("turn_idx").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wPrev = org.apache.spark.sql.expressions.Window
      .partitionBy("conv_id").orderBy(col("turn_idx").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val wConv = org.apache.spark.sql.expressions.Window.partitionBy("conv_id")
    val suffix = content
      // anchors resolve BEFORE the suffix cut: the calling assistant is a
      // property of the full conversation, not of what survives the
      // budget. NO self-join (see alternationReportIds): the preceding
      // assistants' (turn_idx, calls) pairs arrive per row through a
      // window collect (bounded by the conversation's turn count), and
      // the id anchor is the nearest one whose calls contain this row's
      // call_id — an array HOF referencing the current row.
      .withColumn("__pos_anchor",
        max(when(col("role") <=> "assistant", col("turn_idx"))).over(wPrev))
      .withColumn("__acalls",
        collect_list(when(col("role") <=> "assistant" && col("calls").isNotNull,
          struct(col("turn_idx").as("ti"), col("calls").as("cs")))).over(wPrev))
      .withColumn("__id_anchor",
        array_max(expr(
          "transform(filter(__acalls, x -> array_contains(x.cs, call_id)), x -> x.ti)")))
      .withColumn("__anchor",
        when(col("role") <=> "tool" && col("call_id").isNotNull,
          col("__id_anchor")).otherwise(col("__pos_anchor")))
      .join(sysTok, Seq("conv_id"), "left")
      .na.fill(0L, Seq("__sys_tok"))
      .withColumn("__rev_sum", sum(col(tokensCol)).over(wDesc))
      .filter(col("__rev_sum") + col("__sys_tok") <= budget)
    val kept = suffix
      .withColumn("__first_user",
        min(when(col("role") === "user", col("turn_idx"))).over(wConv))
      .filter(col("turn_idx") >= col("__first_user"))
      .filter(!(col("role") <=> "tool") ||
        (col("__anchor").isNotNull && col("__anchor") >= col("__first_user")))
      .select(cols: _*)
    sys.select(cols: _*).unionByName(kept)
  }

  /** Budget-fit over (conv_id, turn_idx, role, <tokensCol>): returns the
    * KEPT turns. System turns are always kept and charged first; content
    * turns keep the longest suffix whose running total (plus system)
    * stays within `budget`; the start then advances to the first kept
    * USER turn (a conversation whose kept suffix holds no user turn
    * keeps only its system turn).
    *
    * Tool turns: a kept `tool` result must have its calling assistant
    * turn kept too — a trim that cut the assistant call but kept the
    * tool result would train on an orphan answer-to-nothing. Each tool
    * turn's anchor is the nearest PRECEDING assistant turn; tool rows
    * whose anchor falls before the kept region (or that have no anchor)
    * drop even when the budget would admit them. Their tokens still
    * charge the suffix sum — the budget models the pre-cleanup cut, and
    * under-filling by an orphan's tokens is the conservative side.
    */
  def contextBudgetTrim(
      turns: DataFrame, budget: Long, tokensCol: String): DataFrame = {
    require(budget >= 1, s"budget >= 1, got $budget")
    val cols = Seq("conv_id", "turn_idx", "role", tokensCol).map(col)
    val sys = turns.filter(col("role") === "system")
    val content = turns.filter(col("role") =!= "system")
    val sysTok = sys.groupBy("conv_id")
      .agg(sum(col(tokensCol)).as("__sys_tok"))
    val wDesc = org.apache.spark.sql.expressions.Window
      .partitionBy("conv_id").orderBy(col("turn_idx").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wPrev = org.apache.spark.sql.expressions.Window
      .partitionBy("conv_id").orderBy(col("turn_idx").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val wConv = org.apache.spark.sql.expressions.Window.partitionBy("conv_id")
    val suffix = content
      // anchor BEFORE the suffix cut: the calling assistant is a property
      // of the full conversation, not of what survives the budget
      .withColumn("__anchor",
        max(when(col("role") === "assistant", col("turn_idx"))).over(wPrev))
      .join(sysTok, Seq("conv_id"), "left")
      .na.fill(0L, Seq("__sys_tok"))
      .withColumn("__rev_sum", sum(col(tokensCol)).over(wDesc))
      .filter(col("__rev_sum") + col("__sys_tok") <= budget)
    val kept = suffix
      .withColumn("__first_user",
        min(when(col("role") === "user", col("turn_idx"))).over(wConv))
      .filter(col("turn_idx") >= col("__first_user"))
      // the kept region is the contiguous [first_user, end] slice, so a
      // tool anchor is kept iff it is >= first_user; null-safe equality so
      // a null-role turn (role key absent in the JSON) is NOT treated as
      // a tool row — the orphan rule applies to actual tool results only
      .filter(!(col("role") <=> "tool") ||
        (col("__anchor").isNotNull && col("__anchor") >= col("__first_user")))
      .select(cols: _*)
    sys.select(cols: _*).unionByName(kept)
  }
}
