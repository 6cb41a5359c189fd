package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Heavy-hitter (top-k frequent term) extraction without a full-vocabulary
  * shuffle — the Misra–Gries summary (Misra & Gries 1982; the "frequent"
  * sketch of Cormode & Hadjieleftheriou 2008) run per partition, followed
  * by an exact recount of the candidate union.
  *
  * Why not `groupBy(term).count.orderBy.limit(k)`: that shuffles one row
  * per DISTINCT term. At 100 TB the term vocabulary is billions of keys —
  * the shuffle is vocabulary-sized regardless of k. The sketch path's only
  * shuffle is the candidate union (≤ capacity rows per partition, deduped),
  * after which the recount streams the corpus once more through a
  * broadcast-hash semi-join (no shuffle) and aggregates over ≤ |candidates|
  * keys.
  *
  * Exactness: a term with global count > N/capacity must exceed
  * N_p/capacity in at least one partition (pigeonhole), and Misra–Gries
  * never evicts a key whose partition count exceeds N_p/capacity — so the
  * candidate union contains every such term. Choose capacity so the k-th
  * most frequent term clears N/capacity and the recounted top-k IS the
  * exact top-k (the oracle proves this equality; the spec proves
  * partitioning invariance). The returned counts are always exact (second
  * pass), never sketch estimates.
  *
  * Broadcast bound: |candidates| ≤ capacity × partitions before dedup; in
  * practice skewed term distributions collapse it to ~capacity. At 1000
  * executors keep capacity ≤ ~64k so the candidate table stays a few MB.
  */
object HeavyHitters {

  /** Per-partition Misra–Gries candidate terms from a single string column.
    * Narrow (mapPartitions, no shuffle); emits ≤ capacity terms per
    * partition. Null terms are skipped (nothing to count).
    */
  private[graft] def candidates(terms: Dataset[String], capacity: Int): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    import terms.sparkSession.implicits._
    terms.mapPartitions { it =>
      val m = new java.util.HashMap[String, Long](capacity * 2)
      while (it.hasNext) {
        val t = it.next()
        if (t != null) {
          val c = m.get(t)
          if (c != 0L || m.containsKey(t)) m.put(t, c + 1L)
          else if (m.size < capacity) m.put(t, 1L)
          else {
            // decrement-all step: amortized O(1) per input (runs ≤ N_p/capacity times)
            val itM = m.entrySet().iterator()
            while (itM.hasNext) {
              val e = itM.next()
              if (e.getValue == 1L) itM.remove() else e.setValue(e.getValue - 1L)
            }
          }
        }
      }
      scala.jdk.CollectionConverters.IteratorHasAsScala(m.keySet().iterator()).asScala
    }.toDF("term")
  }

  /** Exact top-k terms by frequency from (id, toks) rows, sketch-routed:
    * Misra–Gries candidates → exact recount of candidates only → top-k
    * with (count desc, term asc) tie-break. Output: (rank, term, n).
    */
  def topKTerms(toksDf: DataFrame, k: Int, capacity: Int = 65536): DataFrame = {
    import toksDf.sparkSession.implicits._
    val terms = toksDf.select(explode(col("toks")).as("term"))
    val cand = candidates(terms.select("term").as[String], capacity).distinct()
    // global top-k via TakeOrderedAndProject (orderBy + limit), ranks
    // assigned on the ≤ k collected rows (the Mmr/pmiCollocations
    // precedent — a rank window here would be the unpartitioned
    // single-task sort PlanSpec bans)
    val top = terms
      .join(broadcast(cand), "term")
      .groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term").asc)
      .limit(k)
      .collect()
      .sortBy(r => (-r.getLong(1), r.getString(0)))
    top.zipWithIndex.map { case (r, i) => (i + 1, r.getString(0), r.getLong(1)) }
      .toSeq.toDF("rank", "term", "n")
  }

  /** Zipf-law fit over the exact top-k term counts: least-squares slope
    * and intercept of `ln(count) ~ intercept + slope * ln(rank)` (a
    * Zipfian corpus shows slope ≈ -1; the synthetic word-salad here is
    * near-uniform, slope ≈ 0 — either way the REPORT is the operator).
    *
    * The regression runs driver-side over the ≤ k collected top-k rows
    * (the [[topKTerms]] result is already a driver-built frame). Log
    * values are micro-nat-quantized (⌊ln·10⁶⌉ as integers) before the
    * sums, so the closed-form slope divides EXACT integers — the oracle
    * computes bit-identical doubles regardless of summation order, the
    * engine's established float-parity discipline.
    */
  def zipfFit(toksDf: DataFrame, k: Int, capacity: Int = 65536): DataFrame = {
    import toksDf.sparkSession.implicits._
    val top = topKTerms(toksDf, k, capacity)
      .select("rank", "n").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    def micro(x: Double): Long = math.round(math.log(x) * 1e6)
    val pts = top.map { case (r, n) => (micro(r.toDouble), micro(n.toDouble)) }
    val kk = pts.length.toLong
    val sx = pts.map(_._1).sum
    val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    // closed form over exact integer sums; the 1e6 quantization scale
    // cancels in slope ((y/1e6 sums) / (x/1e6 sums)) and divides out of
    // the intercept once
    val slope = (kk * sxy - sx * sy).toDouble / (kk * sxx - sx * sx).toDouble
    val intercept = (sy.toDouble / kk - slope * (sx.toDouble / kk)) / 1e6
    Seq((kk, BigDecimal(slope).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      BigDecimal(intercept).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("k", "slope", "intercept")
  }
}
