package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer training (Kudo 2018, "Subword
  * Regularization" — the SentencePiece unigram model), completing the
  * tokenizer family next to [[Bpe]] (merge-based) and [[Vocab]]
  * (coverage stats): seed a piece inventory from corpus substrings,
  * then EM — Viterbi-segment every word under current piece costs,
  * re-estimate costs from piece usage.
  *
  * Scale shape: ONE corpus pass builds the vocabulary-sized word table
  * (the same compression [[Bpe.train]] and [[Vocab.coverage]] ride).
  * Seeding explodes substrings of THAT table — and the inventory is
  * ALPHABET-bounded, not corpus-bounded: pieces are strings over
  * `[a-z0-9_]` of length ≤ maxLen, so ≤ 37 + 37² + 37³ + 37⁴ ≈ 1.9M
  * candidates exist at maxLen=4 regardless of corpus size (minCount
  * prunes far below that). Each EM round is one Viterbi pass over
  * DISTINCT words (cost table rides the UDF closure, alphabet-bounded)
  * plus one keyed usage aggregation. Nothing touches the corpus after
  * the word table.
  *
  * Determinism (the property the DuckDB oracle replays): piece costs
  * are integer micro-nats, `floor(-ln(freq / total) * 1e6)` (the
  * [[graft.dedup.Perplexity]] quantization); Viterbi runs entirely in
  * integer arithmetic with ties broken to the LONGEST piece (encoded as
  * `cost * 8 + (maxLen - L)` so `min` breaks ties exactly like the SQL
  * replay); single-character pieces are always seeded and always
  * retained (add-one usage smoothing), so every word is segmentable and
  * no -inf cost exists.
  *
  * The per-word Viterbi is a Scala UDF by necessity (sequential DP with
  * carry — the same justification as [[Bpe]]'s merge scan), over
  * vocabulary-table rows only, never the corpus.
  */
object UnigramLm {

  /** Huge-but-additive sentinel for unreachable DP states (safe from
    * overflow when summed along a path: max word length × this stays far
    * below Long.MaxValue / 8 after tie-break encoding).
    */
  private val Inf = 999999999999L

  /** The vocabulary-sized word table: (word, n). */
  def wordTable(docsToks: DataFrame): DataFrame =
    docsToks
      .select(explode(col("toks")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Seed inventory: every substring of length ≤ maxLen, weighted by
    * occurrences × word frequency; single chars always kept (coverage),
    * longer pieces need total frequency ≥ minCount. Output: (piece, freq).
    */
  def seedPieces(words: DataFrame, maxLen: Int = 4, minCount: Long = 2L): DataFrame = {
    require(maxLen >= 1 && maxLen <= 7, s"tie-break encoding holds 3 bits (got maxLen=$maxLen)")
    words
      .select(col("n"), explode(expr(
        s"""flatten(transform(sequence(1, length(word)), i ->
           |  filter(transform(sequence(1, $maxLen), L ->
           |    CASE WHEN i + L - 1 <= length(word)
           |         THEN substring(word, i, L) ELSE NULL END),
           |  x -> x IS NOT NULL)))""".stripMargin)).as("piece"))
      .groupBy("piece").agg(sum("n").as("freq"))
      .filter(length(col("piece")) === 1 || col("freq") >= minCount)
  }

  /** Integer micro-nat cost table from a (piece, freqCol) frame:
    * `floor(-ln(freq / total) * 1e6)`. The single-row total stays
    * in-plan (broadcast cross join), matching the SQL replay.
    */
  def costTable(pieces: DataFrame, freqCol: String = "freq"): DataFrame =
    pieces
      .crossJoin(broadcast(pieces.agg(sum(col(freqCol)).as("__tot"))))
      .select(col("piece"),
        floor(-log(col(freqCol).cast("double") / col("__tot")) * 1e6)
          .cast("long").as("cost_micro"))

  /** Integer Viterbi: best (min total cost) segmentation of `word` under
    * `costs`, ties to the longest piece at each position. Returns
    * (pieces, totalCostMicro); every position is coverable because
    * single chars always carry a cost.
    */
  private[graft] def viterbi(
      word: String, costs: Map[String, Long], maxLen: Int): (Seq[String], Long) = {
    val n = word.length
    val best = Array.fill(n + 1)(Inf * 64)
    val choice = new Array[Int](n + 1)
    best(0) = 0L
    var p = 1
    while (p <= n) {
      var l = math.min(maxLen, p)
      while (l >= 1) { // L descending + strict < : ties keep the longest
        costs.get(word.substring(p - l, p)).foreach { c =>
          val cand = best(p - l) + c
          if (cand < best(p)) { best(p) = cand; choice(p) = l }
        }
        l -= 1
      }
      p += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var q = n
    while (q > 0 && choice(q) > 0) {
      out.prepend(word.substring(q - choice(q), q))
      q -= choice(q)
    }
    (out.toSeq, best(n))
  }

  /** Viterbi-segment every distinct word of a word table under a cost
    * table: (word, n, pieces [space-joined], n_pieces, cost_micro).
    * The cost table collects to the driver — alphabet-bounded (≤ ~1.9M
    * rows at maxLen=4), the same contract as [[Bpe.segmentWords]]'s
    * rule closure.
    */
  def segmentWords(words: DataFrame, costs: DataFrame, maxLen: Int = 4): DataFrame = {
    val costMap: Map[String, Long] = costs.select("piece", "cost_micro").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val segUdf = udf((w: String) => {
      val (pieces, c) = viterbi(w, costMap, maxLen)
      (pieces.mkString(" "), pieces.length, c)
    })
    words
      .withColumn("__s", segUdf(col("word")))
      .select(col("word"), col("n"), col("__s._1").as("pieces"),
        col("__s._2").as("n_pieces"), col("__s._3").as("cost_micro"))
  }

  /** WordPiece-style greedy MaxMatch: at each position take the LONGEST
    * vocabulary piece (≤ maxLen), no backtracking — the BERT tokenizer's
    * inference rule, the third member of the tokenizer family next to
    * [[Bpe.segment]] (merge replay) and [[segmentWords]] (Viterbi).
    * Greedy can split worse than Viterbi (that contrast is the point of
    * shipping both); single characters always advance the scan when the
    * vocabulary covers them (seed vocabularies do by construction —
    * uncovered characters fall back to themselves, documented coverage
    * behavior rather than a whole-word [UNK]).
    */
  private[graft] def maxMatch(word: String, vocab: String => Boolean, maxLen: Int): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = 0
    while (p < word.length) {
      var l = math.min(maxLen, word.length - p)
      while (l > 1 && !vocab(word.substring(p, p + l))) l -= 1
      out += word.substring(p, p + l)
      p += l
    }
    out.toSeq
  }

  /** Greedy-segment every distinct word under a piece vocabulary:
    * (word, n, pieces [space-joined], n_pieces). The vocabulary collects
    * to the driver — alphabet-bounded, the [[segmentWords]] contract.
    */
  def segmentWordsGreedy(words: DataFrame, pieces: DataFrame, maxLen: Int = 4): DataFrame = {
    val vocab: Set[String] =
      pieces.select("piece").collect().map(_.getString(0)).toSet
    val segUdf = udf((w: String) => {
      val ps = maxMatch(w, vocab, maxLen)
      (ps.mkString(" "), ps.length)
    })
    words
      .withColumn("__s", segUdf(col("word")))
      .select(col("word"), col("n"), col("__s._1").as("pieces"),
        col("__s._2").as("n_pieces"))
  }

  /** One EM round: usage of each piece across the Viterbi segmentations
    * (weighted by word frequency), add-one smoothing for single chars
    * (they must survive for coverage), zero-usage longer pieces dropped.
    * Output: (piece, usage, smoothed).
    */
  def emRound(words: DataFrame, costs: DataFrame, maxLen: Int = 4): DataFrame = {
    val segmented = segmentWords(words, costs, maxLen)
    val usage = segmented
      .select(col("n"), explode(split(col("pieces"), " ")).as("piece"))
      .groupBy("piece").agg(sum("n").as("usage"))
    // right join keeps chars that fell out of every segmentation
    usage
      .join(costs.select(col("piece")), Seq("piece"), "right")
      .select(col("piece"), coalesce(col("usage"), lit(0L)).as("usage"))
      .withColumn("smoothed",
        col("usage") + when(length(col("piece")) === 1, lit(1L)).otherwise(lit(0L)))
      .filter(col("smoothed") > 0)
  }

  /** Train `rounds` EM rounds from the corpus token stream; returns the
    * final piece table (piece, usage, cost_micro) where cost_micro is
    * re-estimated from the last round's smoothed usage.
    */
  def train(docsToks: DataFrame, rounds: Int = 1, maxLen: Int = 4,
      minCount: Long = 2L): DataFrame = {
    require(rounds >= 1, s"need rounds >= 1 (got $rounds)")
    val words = wordTable(docsToks).localCheckpoint()
    var costs = costTable(seedPieces(words, maxLen, minCount)).localCheckpoint()
    var lastUsage: DataFrame = null
    (0 until rounds).foreach { _ =>
      lastUsage = emRound(words, costs, maxLen).localCheckpoint()
      costs = costTable(lastUsage, "smoothed")
    }
    lastUsage.join(costs, "piece")
      .select(col("piece"), col("usage"), col("cost_micro"))
  }
}
