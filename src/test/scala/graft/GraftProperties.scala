package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.ingest.{DeterministicHashEmbedder, Ingest, Sanitize}
import graft.search.Lexical

/** ScalaCheck properties for the driver-side scalar logic (SURVEY §5:
  * sanitizer idempotence, id determinism, RRF monotonicity, tokenizer
  * contract).
  */
object GraftProperties extends Properties("graft") {

  private val text: Gen[String] = Gen.asciiPrintableStr

  property("sanitizer is idempotent") = forAll(text) { s =>
    val once = Sanitize.sanitizeString(s)
    Sanitize.sanitizeString(once) == once
  }

  property("sanitized text contains no multi-segment unix path") =
    forAll(Gen.listOfN(3, Gen.identifier)) { segs =>
      val s = s"prefix /${segs.mkString("/")}/leaf.txt suffix"
      !Sanitize.sanitizeString(s).matches(""".*(?<![\w:])/(?:[^/\s]+/)+[^\s<>"']*.*""")
    }

  property("content id is deterministic and uuid-shaped") = forAll(text) { s =>
    val a = Ingest.contentIdScala(s)
    a == Ingest.contentIdScala(s) &&
      a.matches("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}")
  }

  property("uuid5 has version 5 and RFC variant bits") = forAll(text) { s =>
    val u = Ingest.uuid5Oid(s)
    u.charAt(14) == '5' && "89ab".contains(u.charAt(19))
  }

  property("RRF contribution is strictly decreasing in rank") =
    forAll(Gen.chooseNum(1, 10000), Gen.chooseNum(1, 999)) { (k, r) =>
      val c1 = 0.5 / (k + r)
      val c2 = 0.5 / (k + r + 1)
      c1 > c2 && c1 > 0
    }

  property("query tokenizer emits distinct lowercase tokens matching the pattern") =
    forAll(text) { s =>
      val toks = Lexical.tokenizeQuery(s)
      toks.distinct == toks && toks.forall(_.matches("[a-z0-9_]{2,}"))
    }

  property("deterministic embedder: fixed dim, values in [0,1), stable") =
    forAll(text, Gen.chooseNum(1, 32)) { (s, dim) =>
      val e = new DeterministicHashEmbedder(dim)
      val v = e.embedQuery(s)
      v.length == dim && v.forall(x => x >= 0.0f && x < 1.0f) &&
        v.toSeq == e.embedQuery(s).toSeq
    }

  property("error firewall only passes stable codes") =
    forAll(text) { s =>
      val out = graft.model.ErrorCodes.firewall(s)
      out.matches("^[a-z][a-z0-9_]{0,63}$")
    }

  property("lex index bucket is stable, in range, and casefold-insensitive to input identity") =
    forAll(text) { s =>
      val b = graft.search.LexIndex.bucketOfScala(s)
      b >= 0 && b < graft.search.LexIndex.NumBuckets &&
        b == graft.search.LexIndex.bucketOfScala(s)
    }

  property("backend policy canonicalizes and fail-closes") =
    forAll(Gen.oneOf(
      Gen.oneOf("epistemic_graph", "mongodb", "postgres", "qdrant"),
      Gen.identifier)) { raw =>
      import graft.model.{BackendPolicy, GraftException}
      val canon = BackendPolicy.canonicalBackend(raw)
      if (BackendPolicy.AvailableBackends.contains(canon))
        BackendPolicy.ensureBackendAvailable(raw.toUpperCase) == canon
      else
        try { BackendPolicy.ensureBackendAvailable(raw); false }
        catch { case e: GraftException =>
          e.code == graft.model.ErrorCodes.VectorBackendUnsupported ||
            e.code == graft.model.ErrorCodes.VectorBackendNotConfigured }
    }

  property("adaptive probes: covered floor uses a prefix, never more than all clusters") =
    forAll(Gen.chooseNum(1, 20), Gen.chooseNum(1L, 500L)) { (nClusters, floor) =>
      val ranked = (0 until nClusters).map(i => (i.toDouble, i.toLong))
      val sizes = ranked.map { case (_, cid) => cid -> (cid % 7 + 1) * 10L }.toMap
      val probes = graft.ann.IvfIndex.adaptiveProbes(ranked, sizes, floor)
      val total = sizes.values.sum
      probes.nonEmpty && probes.size <= nClusters &&
        probes == ranked.map(_._2).take(probes.size) && // a prefix of the ranking
        (sizes.filter(kv => probes.contains(kv._1)).values.sum >= math.min(floor, total))
    }

  property("multi-probe keys: base first, unique, each flip exactly one bit") =
    forAll(Gen.chooseNum(1, 6), Gen.chooseNum(0, 8),
        Gen.listOfN(8, Gen.chooseNum(-1.0f, 1.0f))) { (bits, extra, vecL) =>
      import graft.ann.SignLshIndex
      val planes = SignLshIndex.planes(8, bits, 1, 42L).head
      val vec = vecL.toSeq
      val keys = SignLshIndex.probeKeysOf(vec, planes, extra)
      keys.head == SignLshIndex.keyOf(vec, planes) &&
        keys.size == 1 + math.min(extra, bits) &&
        keys.distinct.size == keys.size &&
        keys.tail.forall(k =>
          k.length == bits &&
            k.zip(keys.head).count { case (a, b) => a != b } == 1)
    }

  // FLAC codec: lossless for EVERY 16-bit signal — random lengths, block
  // sizes, rates, mono/stereo (both decorrelations), fixed-vs-LPC blocks.
  // One property pins the whole bit-level format (Rice coding, escapes,
  // wasted bits, CRCs, short last frames, n < order verbatim edges).
  property("FLAC encode/decode is lossless on arbitrary PCM at every bit depth") =
    forAll(
      Gen.chooseNum(1, 700),
      Gen.chooseNum(16, 300), // RFC 9639 minimum conformant block size
      Gen.chooseNum(1, 96000),
      Gen.oneOf(1, 2),
      Gen.oneOf(8, 12, 16, 20, 24, 32),
      Gen.long) { (n, blockSize, rate, nCh, bps, seed) =>
      val rnd = new scala.util.Random(seed)
      val full = if (bps == 32) Int.MaxValue else (1 << (bps - 1)) - 1
      val chans = Array.fill(nCh)(Array.fill(n)(
        // mix flat runs (constant subframes), small residuals (rice), and
        // full-range jumps (escape / wide rice / the >26-bit verbatim path)
        rnd.nextInt(4) match {
          case 0 => 0
          case 1 => (rnd.nextLong() % (full.toLong + 1)).toInt
          case _ => rnd.nextInt(256) - 128
        }))
      val bytes = graft.multimodal.Flac.encode(chans, rate, blockSize, bps)
      graft.multimodal.Flac.decode(bytes).exists { fa =>
        fa.sampleRate == rate && fa.channels == nCh &&
          fa.bitsPerSample == bps &&
          fa.samples.zip(chans).forall { case (got, want) =>
            got.toSeq == want.toSeq
          }
      }
    }
}
