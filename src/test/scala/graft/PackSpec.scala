package graft

import org.apache.spark.sql.functions._
import graft.operators.Pack

/** Sequence-packing semantics: the distributed prefix sum must equal the
  * naive single-stream definition on any input partitioning, and the
  * manifest must tile every sequence exactly.
  */
class PackSpec extends SparkSpec {

  import spark.implicits._

  private def mkDocs(n: Int) =
    (1 to n).map(i => (i.toLong, (i * 7 % 23 + 1).toLong)).toDF("id", "tokens")

  test("offsets equal the naive in-order prefix sum (unshuffled order)") {
    val docs = mkDocs(200)
    val out = Pack.packOffsets(docs, 16L, shuffled = false)
      .orderBy("offset").collect()
    var expect = 0L
    out.foreach { r =>
      assert(r.getAs[Long]("offset") == expect,
        s"id=${r.getAs[Long]("id")} offset ${r.getAs[Long]("offset")} != $expect")
      assert(r.getAs[Long]("seq") == expect / 16)
      assert(r.getAs[Long]("pos_in_seq") == expect % 16)
      val toks = r.getAs[Long]("tokens")
      assert(r.getAs[Long]("seq_last") == math.max(expect, expect + toks - 1) / 16)
      expect += toks
    }
    // unshuffled corpus order = id STRING order (the generic-id contract)
    assert(out.map(_.getAs[Long]("id")).toSeq ==
      (1L to 200L).sortBy(_.toString))
  }

  test("offsets are invariant to the input partitioning") {
    val docs = mkDocs(500)
    val a = Pack.packOffsets(docs, 64L).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val b = Pack.packOffsets(docs.repartition(13, col("tokens")), 64L).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val c = Pack.packOffsets(docs.repartition(1), 64L).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(a == b && a == c)
  }

  test("zero-token documents keep a stable offset and span no extra window") {
    val docs = Seq((1L, 0L), (2L, 5L), (3L, 0L), (4L, 3L)).toDF("id", "tokens")
    val out = Pack.packOffsets(docs, 4L, shuffled = false).orderBy("id").collect()
    assert(out.map(_.getAs[Long]("offset")).toSeq == Seq(0L, 0L, 5L, 5L))
    out.foreach { r =>
      if (r.getAs[Long]("tokens") == 0L)
        assert(r.getAs[Long]("seq_last") == r.getAs[Long]("seq"))
    }
  }

  test("manifest tiles every sequence exactly: full windows, ordered slices") {
    val docs = mkDocs(300)
    val L = 32L
    val packed = Pack.packOffsets(docs, L)
    val man = Pack.sequenceManifest(packed, L).collect()
    val total = docs.agg(sum("tokens")).head().getLong(0)
    // per-document: slices concatenate back to [0, tokens)
    man.groupBy(_.getAs[Long]("id")).foreach { case (_, rows) =>
      val slices = rows.sortBy(_.getAs[Long]("seq"))
        .map(r => (r.getAs[Long]("doc_begin"), r.getAs[Long]("doc_end")))
      assert(slices.head._1 == 0L)
      slices.sliding(2).foreach {
        case Array((_, e1), (b2, _)) => assert(e1 == b2, "slices must abut")
        case _ => ()
      }
      assert(slices.last._2 == rows.head.getAs[Long]("tokens"))
      slices.foreach { case (b, e) => assert(e > b, "empty slice in manifest") }
    }
    // per-sequence: slice lengths sum to L for every window except the last
    val bySeq = man.groupBy(_.getAs[Long]("seq")).view
      .mapValues(_.map(r => r.getAs[Long]("doc_end") - r.getAs[Long]("doc_begin")).sum)
      .toMap
    val lastSeq = bySeq.keys.max
    assert(bySeq.keySet == (0L to lastSeq).toSet, "no gaps in sequence ids")
    bySeq.foreach { case (s, tot) =>
      if (s < lastSeq) assert(tot == L, s"seq $s carries $tot tokens, want $L")
      else assert(tot == total - lastSeq * L)
    }
  }

  test("manifest drops empty documents") {
    val docs = Seq((1L, 0L), (2L, 4L)).toDF("id", "tokens")
    val man = Pack.sequenceManifest(Pack.packOffsets(docs, 4L), 4L).collect()
    assert(man.map(_.getAs[Long]("id")).toSet == Set(2L))
  }
}
