package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions

/** Corpus deduplication operators — the LLM-training-pipeline extensions
  * (BASELINE.json north_star; beyond the reference's content-hash dedup at
  * vector_api.py:363-366).
  *
  * Every operator is expressed so the heavy step is a shuffle-bounded join
  * or aggregation (no all-pairs cross join in the scale path):
  *
  *  - exact:        hash -> groupBy  (one shuffle on the digest)
  *  - MinHash LSH:  shingle -> signature -> band buckets -> within-bucket
  *                  candidate pairs -> exact-Jaccard verify
  *  - SimHash:      fingerprint -> pigeonhole band blocking -> hamming verify
  *  - n-gram Jaccard: shingle inverted index -> co-occurrence counts
  *  - embedding near-dup: exact pairwise cosine over a blocked self-join
  *
  * Hashing uses the md5-derived stableHash32 so the DuckDB oracle can
  * replay signatures bit-for-bit where needed; the LSH *candidate* sets
  * never need oracle replay because every candidate is verified with the
  * exact measure before emission.
  */
object Dedup {

  /** Exact dedup by content digest: one row per distinct content with the
    * surviving (minimum) id and the duplicate count.
    */
  def exact(docs: DataFrame, idCol: String = "id", contentCol: String = "content"): DataFrame =
    docs
      .select(col(idCol).as("id"), sha2(col(contentCol), 256).as("digest"))
      .groupBy("digest")
      .agg(min("id").as("keep_id"), count(lit(1)).as("n_dups"))

  /** Deterministic MinHash permutation constants (fixed, engine-versioned). */
  val MinHashSeeds: Seq[(Long, Long)] = {
    // simple LCG-expanded fixed constants; all < MinHashP
    val p = MinHashP
    (1 to 32).map { i =>
      val a = (2654435761L * i + 1013904223L) % p
      val b = (1103515245L * i + 12345L) % p
      (if (a == 0) 1L else a, b)
    }
  }

  /** MinHash signatures over n-token shingles. Output: (id, sig ARRAY<LONG>). */
  def minHashSignatures(docs: DataFrame, shingleN: Int = 3): DataFrame = {
    val toks = tokens(col("content"))
    val sh = shingles(toks, shingleN)
    val sig = array(MinHashSeeds.map { case (a, b) => minHashSig(col("__sh"), a, b) }: _*)
    docs
      .select(col("id"), sh.as("__sh"))
      .filter(size(col("__sh")) > 0)
      .select(col("id"), sig.as("sig"), col("__sh").as("shingles"))
  }

  /** LSH candidate pairs + exact-Jaccard verification.
    *
    * bands=16 x rows=2 over 32 hashes: P(candidate | J) = 1-(1-J^2)^16,
    * ~1 at J>=0.8 (miss probability < 1e-11 at J=0.9), so for corpora whose
    * near-dups sit well above the threshold the verified output equals the
    * exact all-pairs answer. Every candidate is verified with exact Jaccard
    * computed from the true shingle sets before emission.
    *
    * Scale shape: the only shuffles are (a) groupBy band bucket and (b) the
    * verify join — both keyed, no cross join. Bucket skew (a degenerate
    * shingle shared by everything) is bounded by `maxBucketSize`.
    */
  def minHashNearDups(
      docs: DataFrame,
      threshold: Double = 0.6,
      shingleN: Int = 3,
      bands: Int = 16,
      maxBucketSize: Int = 1000): DataFrame = {
    val sigs = minHashSignatures(docs, shingleN).cache()
    val rowsPerBand = MinHashSeeds.size / bands
    // band key = (band index, the band's slice of the signature)
    val banded = sigs.select(
      col("id"), col("sig"),
      posexplode(array((0 until bands).map { b =>
        concat_ws("_", (0 until rowsPerBand).map(r =>
          element_at(col("sig"), b * rowsPerBand + r + 1)): _*)
      }: _*)).as(Seq("band", "bucket")))
    val buckets = banded
      .groupBy("band", "bucket")
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucketSize))
    // candidate pairs within each bucket (a < b), deduped across bands
    val cands = buckets
      .select(explode(expr(
        "filter(flatten(transform(ids, a -> transform(ids, b -> struct(a, b)))), p -> p.a < p.b)"))
        .as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .distinct()
    // exact verify against true shingle sets
    val shA = sigs.select(col("id").as("a"), col("shingles").as("sh_a"))
    val shB = sigs.select(col("id").as("b"), col("shingles").as("sh_b"))
    cands.join(shA, "a").join(shB, "b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni",
        (size(col("sh_a")) + size(col("sh_b"))).cast("double") - col("inter"))
      .withColumn("jaccard", col("inter") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** SimHash near-dups: 32-bit fingerprints, pigeonhole band blocking
    * (`blocks` byte-slices: hamming <= blocks-1 implies >= 1 identical
    * slice), hamming verify. Exact w.r.t. the simhash fingerprints.
    */
  def simHashNearDups(
      docs: DataFrame,
      maxHamming: Int = 3,
      blocks: Int = 4): DataFrame = {
    require(maxHamming < blocks, "pigeonhole guarantee needs maxHamming < blocks")
    val bitsPerBlock = 32 / blocks
    val fp = docs
      .select(col("id"), simHash32(tokens(col("content"))).as("fp"))
      .cache()
    val banded = fp.select(
      col("id"), col("fp"),
      posexplode(array((0 until blocks).map { b =>
        call_function("shiftright", col("fp"), lit(b * bitsPerBlock)) % (1L << bitsPerBlock)
      }: _*)).as(Seq("block", "key")))
    val cands = banded.as("x").join(banded.as("y"),
        col("x.block") === col("y.block") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        col("x.fp").as("fp_a"), col("y.fp").as("fp_b"))
      .distinct()
    cands
      .withColumn("hamming", hamming(col("fp_a"), col("fp_b")))
      .filter(col("hamming") <= maxHamming)
      .select("a", "b", "hamming")
  }

  /** Exact n-gram Jaccard over an inverted shingle index: pairs sharing at
    * least one shingle get their intersection counted by a groupBy — the
    * all-pairs cross join never materializes.
    */
  def ngramJaccard(
      docs: DataFrame,
      threshold: Double,
      shingleN: Int = 3): DataFrame = {
    val sh = docs
      .select(col("id"), shingles(tokens(col("content")), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .cache()
    val inv = sh.select(col("id"), size(col("sh")).as("len"), explode(col("sh")).as("g"))
    val co = inv.as("x").join(inv.as("y"),
        col("x.g") === col("y.g") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"),
        col("x.len").as("la"), col("y.len").as("lb"))
      .agg(count(lit(1)).as("inter"))
    co
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("la") + col("lb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** Embedding near-duplicates: pairs with cosine >= threshold.
    * v0 is the exact blocked self-join (join condition prunes by id order);
    * the 100 TB path pre-buckets by a cheap sign-LSH key and verifies, same
    * shape as [[minHashNearDups]].
    */
  def embeddingNearDups(
      vectors: DataFrame, // (id, embedding, norm)
      threshold: Double): DataFrame = {
    val a = vectors.select(col("id").as("a"), col("embedding").as("ea"), col("norm").as("na"))
    val b = vectors.select(col("id").as("b"), col("embedding").as("eb"), col("norm").as("nb"))
    a.join(b, col("a") < col("b"))
      .withColumn("cosine",
        VectorFunctions.dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select("a", "b", "cosine")
  }
}
