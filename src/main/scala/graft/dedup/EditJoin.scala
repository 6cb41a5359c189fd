package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Edit-distance similarity join (Ed-Join, Xiao et al. PVLDB 2008) — the
  * dedup-family member for TYPO-grade near-duplication: titles, names,
  * and short fields whose variants differ by a handful of character
  * edits. Word-shingle Jaccard is structurally blind here (one character
  * edit rewrites the whole word token and every shingle through it);
  * character-level positional q-grams see exactly that damage.
  *
  * Candidate generation is the 100 TB path, never all-pairs:
  *
  *   - count filter (Gravano 2001): one edit destroys at most q
  *     positional q-grams, so ed(a,b) <= k forces a positional-gram
  *     match of size >= max(|Ga|,|Gb|) - k*q (grams match when their
  *     text is equal AND positions differ by <= k);
  *   - prefix filter: order gram TYPES by global rarity (df asc,
  *     xxhash64 tiebreak, the [[Dedup.ngramJaccardPrefix]] ordering);
  *     a pair within threshold must then share a gram within BOTH
  *     strings' first k*q + 1 grams — and since prefixes hold each
  *     string's rarest grams, frequent grams fall out of the join by
  *     construction (no stop-gram d^2 blowup);
  *   - positional filter: the matching prefix gram itself must satisfy
  *     |pos_a - pos_b| <= k;
  *   - length filter: ||a| - |b|| <= k rides in the join condition.
  *
  * Strings too short for the machinery to prune — fewer than k*q + 1
  * grams, i.e. length <= k*q + q - 1 (including gram-less strings
  * shorter than q) — route through a LIGHT leg instead: their match
  * partners are length-bounded by <= k*q + q - 1 + k characters, so
  * both sides of that leg are bounded by the distinct-string dictionary
  * of a fixed tiny length (alphabet^(kq+q-1+k)), not by corpus size.
  * The light side broadcasts; the leg never touches long strings.
  *
  * Verification computes exact `levenshtein` (codegen built-in) on the
  * surviving candidates only. Output: (src, dst, dist) with src < dst,
  * one row per unordered pair, dist <= k — identical to the naive
  * all-pairs form (EditJoinSpec proves equality on corpora that
  * exercise both legs).
  */
object EditJoin {

  /** All unordered pairs of `strs` (columns `id`, `str`) within
    * Levenshtein distance `k`, using q-gram prefix filtering.
    */
  def editDistancePairs(strs: DataFrame, k: Int, q: Int = 2): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    require(q >= 2, s"q $q must be >= 2 (unigrams carry no position signal)")
    val lightMax = k * q + q - 1 // fewer than kq+1 grams: prefix = whole string
    val base = strs
      .filter(col("str").isNotNull)
      .select(col("id"), col("str"), length(col("str")).as("len"))
      .persist(StorageLevel.MEMORY_ONLY)

    // ---- heavy leg: prefix-filtered positional q-gram join ----
    val heavy = base.filter(col("len") > lightMax)
    // positional q-grams: (id, str, len, pos, h); gram text never ships —
    // every downstream shuffle keys on the 8-byte xxhash64 (hash ties
    // between DISTINCT grams only ever ADD a candidate; verify discards)
    val grams = heavy
      .select(col("id"), col("str"), col("len"),
        posexplode(expr("transform(sequence(1, len - " + (q - 1) + "), i -> substring(str, i, " + q + "))"))
          .as(Seq("pos", "g")))
      .select(col("id"), col("str"), col("len"), col("pos"), col("g"),
        xxhash64(col("g")).as("h"))
    val dfs = grams.groupBy("h").agg(count(lit(1)).as("df"))
    // gram text as tiebreak keeps (df, h, g) ONE total order over gram
    // types even under a hash collision (the ngramJaccardPrefix argument)
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("df").asc, col("h").asc, col("g").asc,
        col("pos").asc)
    // prefix frame materialized ONCE: it feeds BOTH sides of the
    // candidate self-join, and left lazy each side re-runs the gram
    // posexplode AND the rank window (traced as three Generate stages
    // per execution — dfs pass + one per join side). The frame is
    // prefix-BOUNDED: <= k*q + 1 rows per string.
    val pref = grams.join(dfs, "h")
      .withColumn("rnk", row_number().over(rankW))
      .filter(col("rnk") <= lit(k * q + 1))
      .select("id", "str", "len", "pos", "h")
      .localCheckpoint()
    // materialize the OUTPUT-SIZED candidate set before verification:
    // without the barrier Catalyst pushes the levenshtein predicate
    // through the distinct INTO the join condition, evaluating the DP on
    // every raw h-bucket pair before the cheap pos/len conjuncts prune
    // (measured 76 s -> ~8 s at a 4.7k-string vocab whose prefix buckets
    // multiply to 12.3M raw pairs vs 1.0M distinct candidates)
    val cands = pref.as("x").join(pref.as("y"),
        col("x.h") === col("y.h") && col("x.id") < col("y.id") &&
          abs(col("x.pos") - col("y.pos")) <= lit(k) &&
          abs(col("x.len") - col("y.len")) <= lit(k))
      .select(col("x.id").as("src"), col("x.str").as("src_str"),
        col("y.id").as("dst"), col("y.str").as("dst_str"))
      .distinct()
      .localCheckpoint()
    // cands is materialized (eager checkpoint): the prefix frame's blocks
    // are candidate-generation-only — release them deterministically
    graft.Checkpoints.free(pref)
    // threshold (early-abandon) levenshtein: O(k·len) band instead of the
    // full len² DP; returns -1 above k, which the filter excludes.
    // spread first: the checkpointed candidate frame is byte-coalesced to
    // 1-2 partitions while each row costs an O(k·len) DP (the
    // Dedup.verifyJaccard rationale)
    val heavyPairs = Dedup.spreadByKeys(cands, col("src"), col("dst"))
      .withColumn("dist", levenshtein(col("src_str"), col("dst_str"), k).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= lit(k))
      .select("src", "dst", "dist")

    // ---- light leg: dictionary-bounded short strings vs their
    //      length-feasible partners (<= lightMax + k chars) ----
    val light = base.filter(col("len") <= lightMax)
    val partners = base.filter(col("len") <= lightMax + k)
    val lightPairs = broadcast(light.as("x"))
      .join(partners.as("y"),
        col("x.id") =!= col("y.id") &&
          abs(col("x.len") - col("y.len")) <= lit(k))
      .select(
        least(col("x.id"), col("y.id")).as("src"),
        greatest(col("x.id"), col("y.id")).as("dst"),
        levenshtein(col("x.str"), col("y.str")).cast("long").as("dist"))
      .filter(col("dist") <= lit(k))
      .distinct() // light-light pairs arrive once per direction

    // legs are disjoint: heavy pairs have BOTH sides > lightMax chars,
    // light pairs have at least one side <= lightMax
    heavyPairs.unionByName(lightPairs)
  }

  /** Reference form: length-filtered all-pairs + levenshtein. The spec
    * oracle for [[editDistancePairs]]; never the scale path.
    */
  def editDistancePairsNaive(strs: DataFrame, k: Int): DataFrame = {
    val base = strs.filter(col("str").isNotNull)
      .select(col("id"), col("str"), length(col("str")).as("len"))
    base.as("x").join(base.as("y"),
        col("x.id") < col("y.id") &&
          abs(col("x.len") - col("y.len")) <= lit(k))
      .select(col("x.id").as("src"), col("y.id").as("dst"),
        levenshtein(col("x.str"), col("y.str")).cast("long").as("dist"))
      .filter(col("dist") <= lit(k))
  }
}
