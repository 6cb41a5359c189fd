package graft

import org.apache.spark.sql.functions._
import graft.operators.Chat

/** Edge cases for the SFT chat-curation family that the synthesized
  * oracle corpus doesn't reach: malformed JSON, system-less
  * conversations, budget suffixes with no user turn.
  */
class ChatSpec extends SparkSpec {

  import spark.implicits._

  test("parseConversations: valid arrays explode in order; malformed JSON yields zero turns") {
    val df = Seq(
      (1L, """[{"role":"system","content":"s"},{"role":"user","content":"hi"},{"role":"assistant","content":"yo"}]"""),
      (2L, """not json at all"""),
      (3L, """[]""")).toDF("id", "msgs")
    val turns = Chat.parseConversations(df, "id", "msgs").collect()
    assert(turns.count(_.getLong(0) == 1L) == 3)
    assert(turns.filter(_.getLong(0) == 1L).map(r =>
      (r.getInt(1), r.getString(2))).sorted.toSeq ==
      Seq((0, "system"), (1, "user"), (2, "assistant")))
    assert(!turns.exists(_.getLong(0) == 2L), "malformed JSON must drop governed")
    assert(!turns.exists(_.getLong(0) == 3L))
  }

  test("alternationReport: system optional, double-user invalid, assistant-end required") {
    val turns = Seq(
      // valid WITHOUT system
      (1L, 0, "user"), (1L, 1, "assistant"),
      // valid WITH system
      (2L, 0, "system"), (2L, 1, "user"), (2L, 2, "assistant"),
      // double user -> alternation broken
      (3L, 0, "user"), (3L, 1, "user"), (3L, 2, "assistant"),
      // assistant first -> starts_user false
      (4L, 0, "assistant"), (4L, 1, "user"),
      // trailing user -> ends_assistant false
      (5L, 0, "user"), (5L, 1, "assistant"), (5L, 2, "user"),
      // system mid-stream -> role outside {user, assistant} breaks alternates
      (6L, 0, "user"), (6L, 1, "system"), (6L, 2, "assistant"))
      .toDF("conv_id", "turn_idx", "role")
    val r = Chat.alternationReport(turns).collect()
      .map(x => x.getLong(0) -> (x.getBoolean(2), x.getBoolean(3),
        x.getBoolean(4), x.getBoolean(5), x.getBoolean(6))).toMap
    // (has_system, starts_user, alternates, ends_assistant, valid)
    assert(r(1L) == ((false, true, true, true, true)))
    assert(r(2L) == ((true, true, true, true, true)))
    assert(r(3L) == ((false, true, false, true, false)))
    assert(r(4L) == ((false, false, true, false, false)))
    assert(r(5L) == ((false, true, true, false, false)))
    assert(r(6L) == ((false, true, false, true, false)))
  }

  test("contextBudgetTrim: suffix fit, user alignment, system always kept") {
    val turns = Seq(
      (1L, 0, "system", 3L),
      (1L, 1, "user", 10L), (1L, 2, "assistant", 10L),
      (1L, 3, "user", 10L), (1L, 4, "assistant", 10L))
      .toDF("conv_id", "turn_idx", "role", "tokens")
    // budget 25: system(3) + suffix 4,3 (20) fits; adding turn 2 busts ->
    // suffix {3,4}, already user-aligned
    val kept = Chat.contextBudgetTrim(turns, 25L, "tokens")
      .collect().map(r => (r.getInt(1), r.getString(2))).sorted.toSeq
    assert(kept == Seq((0, "system"), (3, "user"), (4, "assistant")))
    // budget 33: suffix {2,3,4} starts with assistant -> advance to 3
    val kept2 = Chat.contextBudgetTrim(turns, 33L, "tokens")
      .collect().map(r => r.getInt(1)).sorted.toSeq
    assert(kept2 == Seq(0, 3, 4))
    // budget 14: only turn 4 (assistant) fits -> no user -> system only
    val kept3 = Chat.contextBudgetTrim(turns, 14L, "tokens")
      .collect().map(r => r.getInt(1)).toSeq
    assert(kept3 == Seq(0))
    // no system turn at all: pure suffix semantics
    val noSys = Seq((7L, 0, "user", 5L), (7L, 1, "assistant", 5L))
      .toDF("conv_id", "turn_idx", "role", "tokens")
    val kept4 = Chat.contextBudgetTrim(noSys, 10L, "tokens")
      .collect().map(r => r.getInt(1)).sorted.toSeq
    assert(kept4 == Seq(0, 1))
  }

  test("alternationReport: tool turns valid only directly after assistant") {
    val turns = Seq(
      // valid tool-call exchange: u a t a
      (1L, 0, "user"), (1L, 1, "assistant"), (1L, 2, "tool"), (1L, 3, "assistant"),
      // tool directly after user -> invalid
      (2L, 0, "user"), (2L, 1, "tool"), (2L, 2, "assistant"),
      // tool after tool -> invalid
      (3L, 0, "user"), (3L, 1, "assistant"), (3L, 2, "tool"), (3L, 3, "tool"),
      (3L, 4, "assistant"),
      // tool-first -> invalid even before starts_user
      (4L, 0, "tool"), (4L, 1, "assistant"),
      // trailing tool -> ends_assistant false
      (5L, 0, "user"), (5L, 1, "assistant"), (5L, 2, "tool"),
      // two sequential tool-call rounds: u a t a t a
      (6L, 0, "user"), (6L, 1, "assistant"), (6L, 2, "tool"),
      (6L, 3, "assistant"), (6L, 4, "tool"), (6L, 5, "assistant"))
      .toDF("conv_id", "turn_idx", "role")
    val r = Chat.alternationReport(turns).collect()
      .map(x => x.getLong(0) -> (x.getBoolean(3), x.getBoolean(4),
        x.getBoolean(5), x.getBoolean(6))).toMap
    // (starts_user, alternates, ends_assistant, valid)
    assert(r(1L) == ((true, true, true, true)))
    assert(r(2L) == ((true, false, true, false)))
    assert(r(3L) == ((true, false, true, false)))
    assert(r(4L) == ((false, false, true, false)))
    assert(r(5L) == ((true, true, false, false)))
    assert(r(6L) == ((true, true, true, true)))
  }

  test("contextBudgetTrim: never keeps a tool result whose assistant call was cut") {
    // a well-formed tool exchange: the tool result rides with its kept
    // anchor when the budget admits the full conversation, and drops with
    // the region when the suffix cut lands past it
    val turns = Seq(
      (1L, 0, "system", 2L),
      (1L, 1, "user", 10L), (1L, 2, "assistant", 4L),
      (1L, 3, "tool", 3L), (1L, 4, "assistant", 4L),
      (1L, 5, "user", 5L), (1L, 6, "assistant", 5L))
      .toDF("conv_id", "turn_idx", "role", "tokens")
    val keptAll = Chat.contextBudgetTrim(turns, 100L, "tokens")
      .collect().map(r => r.getInt(1)).sorted.toSeq
    assert(keptAll == Seq(0, 1, 2, 3, 4, 5, 6))
    // budget 30: reverse sums 5,10,14,17,21 (+2 system) — turn 1 busts;
    // first kept user = 5 -> region {5,6}; the tool drops with the region
    val kept = Chat.contextBudgetTrim(turns, 30L, "tokens")
      .collect().map(r => r.getInt(1)).sorted.toSeq
    assert(kept == Seq(0, 5, 6))
    // the orphan case (reachable on malformed role orders the trim must
    // survive — it runs before/independently of the audit): the kept
    // region {2,3,4} holds a tool at 3 whose anchor assistant is 1 — CUT
    // — so the tool drops while its neighbors keep
    val t4 = Seq(
      (4L, 0, "user", 5L), (4L, 1, "assistant", 30L),
      (4L, 2, "user", 3L), (4L, 3, "tool", 2L), (4L, 4, "assistant", 3L))
      .toDF("conv_id", "turn_idx", "role", "tokens")
    val k4 = Chat.contextBudgetTrim(t4, 10L, "tokens")
      .collect().map(r => r.getInt(1)).sorted.toSeq
    assert(k4 == Seq(2, 4))
    // in a GRAMMAR-VALID conversation the user-alignment cut already
    // implies the anchor is kept (tool directly follows its assistant,
    // and first_user is a user turn), so the guard never fires: same
    // region arithmetic with the valid order keeps the whole exchange
    val t5 = Seq(
      (5L, 0, "user", 30L), (5L, 1, "assistant", 5L),
      (5L, 2, "user", 3L), (5L, 3, "assistant", 2L), (5L, 4, "tool", 2L),
      (5L, 5, "assistant", 3L))
      .toDF("conv_id", "turn_idx", "role", "tokens")
    val k5 = Chat.contextBudgetTrim(t5, 15L, "tokens")
      .collect().map(r => r.getInt(1)).sorted.toSeq
    assert(k5 == Seq(2, 3, 4, 5))
  }

  test("alternationReportIds: parallel runs valid by id; wrong/unknown ids fail") {
    import spark.implicits._
    def turns(rows: Seq[(Long, Int, String, String, Seq[String])]) =
      rows.toDF("conv_id", "turn_idx", "role", "call_id", "calls")
        .withColumn("call_id",
          org.apache.spark.sql.functions.when(col("call_id") === "", null)
            .otherwise(col("call_id")))
        .withColumn("calls",
          org.apache.spark.sql.functions.when(
            org.apache.spark.sql.functions.size(col("calls")) === 0, null)
            .otherwise(col("calls")))
        .withColumn("content", org.apache.spark.sql.functions.lit("x"))
    // conv 1: parallel calls — assistant issues [a, b]; two results in a
    // RUN (tool after tool), both id-anchored -> valid under the id
    // grammar (the positional grammar would reject the run)
    // conv 2: second result names an id the run-head assistant never
    // issued -> tools_anchored false
    // conv 3: a result with a null call_id anchors positionally (legacy)
    val t = turns(Seq(
      (1L, 0, "user", "", Nil), (1L, 1, "assistant", "", Seq("a", "b")),
      (1L, 2, "tool", "a", Nil), (1L, 3, "tool", "b", Nil),
      (1L, 4, "assistant", "", Nil),
      (2L, 0, "user", "", Nil), (2L, 1, "assistant", "", Seq("a")),
      (2L, 2, "tool", "a", Nil), (2L, 3, "tool", "zz", Nil),
      (2L, 4, "assistant", "", Nil),
      (3L, 0, "user", "", Nil), (3L, 1, "assistant", "", Nil),
      (3L, 2, "tool", "", Nil), (3L, 3, "assistant", "", Nil)))
    val rep = Chat.alternationReportIds(t)
      .collect().map(r => r.getAs[Long]("conv_id") ->
        (r.getAs[Boolean]("alternates"), r.getAs[Boolean]("tools_anchored"),
          r.getAs[Boolean]("valid"))).toMap
    assert(rep(1L) == ((true, true, true)))
    assert(rep(2L) == ((true, false, false)))
    assert(rep(3L) == ((true, true, true)))
  }

  test("contextBudgetTrimIds: anchor follows the call id, not position") {
    import spark.implicits._
    // interleaved: assistant 1 issues [a]; assistant 3 issues [b]; the
    // result for a arrives LAST (turn 4). Positionally its anchor would
    // be assistant 3; by id it is assistant 1.
    def mk(conv: Long) = Seq(
      (conv, 0, "user", null.asInstanceOf[String], null.asInstanceOf[Seq[String]], 10L),
      (conv, 1, "assistant", null.asInstanceOf[String], Seq("a"), 2L),
      (conv, 2, "user", null.asInstanceOf[String], null.asInstanceOf[Seq[String]], 3L),
      (conv, 3, "assistant", null.asInstanceOf[String], Seq("b"), 2L),
      (conv, 4, "tool", "a", null.asInstanceOf[Seq[String]], 2L),
      (conv, 5, "assistant", null.asInstanceOf[String], null.asInstanceOf[Seq[String]], 2L))
    val t = mk(1L).toDF("conv_id", "turn_idx", "role", "call_id", "calls", "tokens")
    // budget 12: reverse sums 2,4,6,9,11(,21) — turn 0 busts; first kept
    // user = 2. Tool 4's ID anchor (assistant 1) was CUT -> it drops,
    // though its positional anchor (assistant 3) survives.
    val tight = Chat.contextBudgetTrimIds(t, 12L, "tokens")
      .collect().map(_.getInt(1)).sorted.toSeq
    assert(tight == Seq(2, 3, 5))
    // budget 25 keeps everything: first user = 0, id anchor 1 >= 0 -> kept
    val wide = Chat.contextBudgetTrimIds(t, 25L, "tokens")
      .collect().map(_.getInt(1)).sorted.toSeq
    assert(wide == Seq(0, 1, 2, 3, 4, 5))
    // an id with NO carrier anywhere always drops
    val orphan = Seq(
      (9L, 0, "user", null.asInstanceOf[String], null.asInstanceOf[Seq[String]], 2L),
      (9L, 1, "assistant", null.asInstanceOf[String], Seq("a"), 2L),
      (9L, 2, "tool", "nope", null.asInstanceOf[Seq[String]], 2L),
      (9L, 3, "assistant", null.asInstanceOf[String], null.asInstanceOf[Seq[String]], 2L))
      .toDF("conv_id", "turn_idx", "role", "call_id", "calls", "tokens")
    val k = Chat.contextBudgetTrimIds(orphan, 20L, "tokens")
      .collect().map(_.getInt(1)).sorted.toSeq
    assert(k == Seq(0, 1, 3))
  }
}
