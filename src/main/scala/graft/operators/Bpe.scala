package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** Distributed BPE merge training (Sennrich, Haddow & Birch 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the tokenizer-
  * family operator next to the `bpeTokens` pre-tokenizer and
  * [[Vocab.coverage]]: learn the merge table itself from the corpus.
  *
  * Scale shape: ONE corpus pass builds the word-frequency table (explode +
  * keyed count — the table is VOCABULARY-sized, orders of magnitude below
  * the corpus, the same compression [[Vocab.coverage]] exploits). Every
  * merge round is then one keyed pair-count aggregation over that table
  * plus one narrow rewrite with the winning pair broadcast as literals;
  * driver state is the merge list (T pairs). localCheckpoint severs the
  * per-round lineage exactly like the duplicate-cluster label loop, so
  * round N never replays rounds 1..N-1.
  *
  * Determinism: the winning pair maximizes summed count with ties broken
  * to the binary-lexically smallest (s1, s2) — identical ordering in any
  * SQL engine on the `[a-z0-9_]` token alphabet. Merge application is the
  * classic left-to-right non-overlapping scan (a run "aaa" under rule
  * (a,a) yields "aa","a"), which an oracle replays positionally:
  * match positions, grouped into consecutive runs, applied at even
  * offsets within each run.
  *
  * The within-word scan is a Scala UDF by necessity: it is a sequential
  * carry fold no built-in or codegen HOF expresses, over vocabulary-table
  * rows (short symbol arrays), never over the corpus.
  *
  * No word-end marker is appended (merges stay within the pre-tokenizer's
  * word boundaries) — the variant that keeps every stage replayable on the
  * plain token stream.
  */
object Bpe {

  /** Left-to-right non-overlapping application of one merge rule. */
  private[operators] def applyMerge(
      syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toSeq
  }

  /** Train `merges` rounds over (id, toks) rows; returns the ordered merge
    * table (merge_rank, lhs, rhs, merged, cnt) where cnt is the pair's
    * summed frequency at the time it won. Stops early if no adjacent pair
    * remains (degenerate corpora).
    */
  def train(docsToks: DataFrame, merges: Int): DataFrame = {
    require(merges >= 1, s"need merges >= 1 (got $merges)")
    val spark = docsToks.sparkSession
    import spark.implicits._
    // vocabulary-sized word table: (word, syms, n); single chars via split
    var words = docsToks
      .select(explode(col("toks")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .select(col("word"),
        expr("filter(split(word, ''), s -> s != '')").as("syms"), col("n"))
      .localCheckpoint()
    val mergeUdf = udf(applyMerge _)
    val learned = ArrayBuffer.empty[(Int, String, String, String, Long)]
    var t = 1
    var exhausted = false
    while (t <= merges && !exhausted) {
      val top = words
        .filter(size(col("syms")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(0, size(syms)-2), i -> struct(syms[i] AS s1, syms[i+1] AS s2))")).as("p"))
        .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
        .agg(sum("n").as("cnt"))
        .orderBy(col("cnt").desc, col("s1"), col("s2"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val a = top(0).getString(0)
        val b = top(0).getString(1)
        learned += ((t, a, b, a + b, top(0).getLong(2)))
        words = words
          .withColumn("syms", mergeUdf(col("syms"), lit(a), lit(b)))
          .localCheckpoint()
        t += 1
      }
    }
    learned.toSeq.toDF("merge_rank", "lhs", "rhs", "merged", "cnt")
  }

  /** Segment a single word with a learned merge list (rules applied in
    * rank order) — the driver-side encoder mirror of [[train]], for spec
    * assertions and interactive use.
    */
  def segment(word: String, rules: Seq[(String, String)]): Seq[String] =
    rules.foldLeft(word.split("").filter(_.nonEmpty).toSeq) {
      case (syms, (a, b)) => applyMerge(syms, a, b)
    }

  /** Corpus segmentation under a learned merge table — the apply half of
    * the tokenizer loop. Scale-correct form: each DISTINCT word segments
    * exactly once over the vocabulary-sized table (rules ride the UDF
    * closure — a broadcast of T pairs); mapping the corpus back to
    * per-occurrence subwords is then a hash join against this frame, never
    * a per-occurrence re-segmentation. Output: (word, pieces, n_pieces, n)
    * with pieces space-joined (symbols are space-free by construction).
    */
  def segmentWords(
      docsToks: DataFrame, rules: Seq[(String, String)]): DataFrame = {
    val segUdf = udf((w: String) => {
      val pieces = segment(w, rules)
      (pieces.mkString(" "), pieces.length)
    })
    docsToks
      .select(explode(col("toks")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .withColumn("__s", segUdf(col("word")))
      .select(col("word"), col("__s._1").as("pieces"),
        col("__s._2").as("n_pieces"), col("n"))
  }
}
