package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Seeded randomized property checks over the pure JVM kernels — no
  * Spark session needed, hundreds of cases per property, deterministic
  * seed so a failure reproduces exactly.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def rng = new scala.util.Random(42)

  test("NFC kernel: idempotent, ASCII-identity (same object), agrees with Normalizer") {
    import org.apache.spark.unsafe.types.UTF8String
    val r = rng
    // ASCII fast path returns the INPUT object — zero allocation
    val ascii = UTF8String.fromString("plain ascii only 123")
    assert(NfcNormalize.normalized(ascii) eq ascii)
    assert(NfcNormalize.normalized(null) === null)
    // known composition, built from CODEPOINTS (source literals can be
    // silently normalized by editors): e+acute -> U+00E9, a+grave -> U+00E0
    val dec = new String(Array(0x63, 0x61, 0x66, 0x65, 0x301, 0x20, 0x61, 0x300), 0, 8)
    val comp = new String(Array(0x63, 0x61, 0x66, 0xE9, 0x20, 0xE0), 0, 6)
    assert(NfcNormalize.normalized(UTF8String.fromString(dec)).toString === comp)
    for (_ <- 1 to 500) {
      val sb = new StringBuilder
      for (_ <- 0 until r.nextInt(12)) r.nextInt(5) match {
        case 0 => sb.append(('a' + r.nextInt(26)).toChar)
        case 1 => sb.append("é") // decomposed é
        case 2 => sb.append('\u00E9') // precomposed
        case 3 => sb.append(('\u0300' + r.nextInt(16)).toChar) // bare combining
        case _ => sb.append(('\u4E00' + r.nextInt(64)).toChar) // CJK (NFC-stable)
      }
      val s = sb.toString
      val once = NfcNormalize.normalized(UTF8String.fromString(s)).toString
      val twice = NfcNormalize.normalized(UTF8String.fromString(once)).toString
      assert(once === twice, s"not idempotent on '$s'")
      assert(once === java.text.Normalizer.normalize(s,
        java.text.Normalizer.Form.NFC), s"disagrees with Normalizer on '$s'")
    }
  }

  test("BPE: pieces always concatenate back to word + EOW, under any trained merges") {
    val r = rng
    for (_ <- 1 to 200) {
      // random corpus over a small alphabet (forces heavy merge overlap)
      val words = Seq.fill(1 + r.nextInt(8))(
        (1 to (1 + r.nextInt(7))).map(_ => ('a' + r.nextInt(4)).toChar).mkString)
      val counts = words.groupBy(identity).map { case (w, g) => w -> (g.size * (1L + r.nextInt(5))) }.toSeq
      val merges = graft.ops.TextAnalysis.trainBpeFromCounts(counts, r.nextInt(12))
      val ranks = BpeKernel.ranksOf(merges)
      // encode both trained words and unseen words
      val probes = words ++ Seq.fill(3)(
        (1 to (1 + r.nextInt(9))).map(_ => ('a' + r.nextInt(6)).toChar).mkString)
      probes.foreach { w =>
        val pieces = BpeKernel.encodeWord(w, ranks)
        val joined = (0 until pieces.size).map(pieces.get).mkString
        assert(joined === w + BpeKernel.EndOfWord, s"w=$w merges=$merges")
        assert(pieces.size <= w.length + 1)
        assert(pieces.size >= 1)
      }
    }
  }

  test("BPE: merge list is idempotent — re-encoding a single merged piece is stable") {
    val r = rng
    for (_ <- 1 to 100) {
      val counts = Seq.fill(5)(
        (1 to (2 + r.nextInt(5))).map(_ => ('a' + r.nextInt(3)).toChar).mkString)
        .groupBy(identity).map { case (w, g) => w -> g.size.toLong }.toSeq
      val merges = graft.ops.TextAnalysis.trainBpeFromCounts(counts, 8)
      val ranks = BpeKernel.ranksOf(merges)
      counts.map(_._1).foreach { w =>
        val once = BpeKernel.encodeWord(w, ranks)
        // pieces are maximal: no adjacent pair of the output is mergeable
        for (j <- 0 until once.size - 1)
          assert(!ranks.containsKey(once.get(j) + BpeKernel.Sep + once.get(j + 1)),
            s"non-maximal encoding of $w: $once under $merges")
      }
    }
  }

  test("ZValue: interleave is exactly invertible for 32-bit inputs") {
    def gather(z: Long, start: Int): Long = {
      var out = 0L
      var i = 0
      while (i < 32) {
        out |= ((z >>> (2 * i + start)) & 1L) << i
        i += 1
      }
      out
    }
    val r = rng
    for (_ <- 1 to 500) {
      val a = r.nextLong() & 0xFFFFFFFFL
      val b = r.nextLong() & 0xFFFFFFFFL
      val z = ZValue.interleave(a, b)
      assert(gather(z, 1) === a && gather(z, 0) === b, s"a=$a b=$b z=$z")
    }
    // edge values incl. the sign-bit case the oracle special-cases
    for (a <- Seq(0L, 1L, 1L << 31, 0xFFFFFFFFL); b <- Seq(0L, 1L, 1L << 31, 0xFFFFFFFFL)) {
      val z = ZValue.interleave(a, b)
      assert(gather(z, 1) === a && gather(z, 0) === b)
    }
  }

  test("HilbertValue: bijective on a 32x32 grid; consecutive indexes are grid-adjacent") {
    val cells = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val d = cells.map { case (x, y) => (x, y) -> HilbertValue.index(x, y) }.toMap
    // inputs < 2^5 exercise only the last 5 curve levels: d is a bijection
    // onto [0, 4^5) — the hierarchical-quadrant property
    assert(d.values.toSet === (0L until 1024L).toSet)
    // THE Hilbert property (which the Morton key lacks): walking the index
    // never jumps — consecutive cells are Manhattan-distance-1 neighbors
    val byD = d.map(_.swap)
    for (i <- 0L until 1023L) {
      val (x1, y1) = byD(i)
      val (x2, y2) = byD(i + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"seam jump at d=$i: ($x1,$y1) -> ($x2,$y2)")
    }
    // 16-bit window contract: masking, not hashing
    assert(HilbertValue.index(0x10003L, 0x20005L) === HilbertValue.index(3L, 5L))
  }

  test("MinHashKernel: signature equals the direct affine minima, within [0, P32)") {
    val r = rng
    for (_ <- 1 to 100) {
      val hs = Array.fill(1 + r.nextInt(40))(r.nextLong() & 0xFFFFFFFFFFFFFFFL) // 60-bit
      val k = 1 + r.nextInt(16)
      val as = Array.tabulate(k)(Hashing.affineA)
      val bs = Array.tabulate(k)(Hashing.affineB)
      val sig = MinHashKernel.sig(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(hs), as, bs)
      for (j <- 0 until k) {
        val expected = hs.map(h => (as(j) * (h & 0xFFFFFFFFL) + bs(j)) % Hashing.P32).min
        assert(sig.getLong(j) === expected)
        assert(sig.getLong(j) >= 0 && sig.getLong(j) < Hashing.P32)
      }
    }
  }

  test("WAV parse: header round-trips for random PCM shapes; windows cover the data") {
    val r = rng
    for (_ <- 1 to 100) {
      val channels = 1 + r.nextInt(4)
      val rate = 4000 + r.nextInt(48000)
      val samples = r.nextInt(3000)
      val bpf = channels * 2
      val buf = java.nio.ByteBuffer.allocate(44 + samples * bpf)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples * bpf)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1)
        .putShort(channels.toShort).putInt(rate).putInt(rate * bpf)
        .putShort(bpf.toShort).putShort(16)
      buf.put("data".getBytes("US-ASCII")).putInt(samples * bpf)
      for (_ <- 0 until samples * channels) buf.putShort(r.nextInt().toShort)
      val info = graft.ops.Multimodal.RealCodecs.parseWav(buf.array())
      assert(info.channels === channels && info.sampleRate === rate)
      assert(info.bitsPerSample === 16 && info.sampleFrames === samples)
      // window decomposition covers every sample frame exactly once
      val win = 1 + r.nextInt(600)
      val frames = graft.ops.Multimodal.RealCodecs.PcmWav(win).decodeBatch(Seq(
        graft.ops.Multimodal.MediaAsset(1L, "audio", buf.array())))
      assert(frames.map(_.width).sum === samples) // samples == 0 → one empty window
      assert(frames.map(_.pixels.length).sum === samples * bpf)
      assert(frames.zipWithIndex.forall { case (f, i) => f.frame_idx == i && f.height == channels })
    }
  }

  test("PQ: encode picks the argmin codeword per subspace; adc matches the direct sum") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val r = rng
    for (_ <- 1 to 100) {
      val mSub = 1 + r.nextInt(4)
      val dsub = 1 + r.nextInt(6)
      val dims = mSub * dsub
      val cells = 1 + r.nextInt(3)
      val ksub = 1 + r.nextInt(5)
      val cents = Array.fill(cells, dims)(r.nextDouble() * 2 - 1)
      val pq = Array.fill(mSub, ksub, dsub)(r.nextDouble() * 2 - 1)
      val v = Array.fill(dims)((r.nextDouble() * 2 - 1).toFloat)
      val cell = r.nextInt(cells)
      val codes = PqKernel.encode(ArrayData.toArrayData(v), cell.toLong, cents, pq)
      val res = v.indices.map(i => v(i).toDouble - cents(cell)(i)).toArray
      def dist(m: Int, cw: Array[Double]): Double =
        (0 until dsub).map { i => val d = res(m * dsub + i) - cw(i); d * d }.sum
      for (m <- 0 until mSub) {
        val c = codes.getInt(m)
        assert(c >= 0 && c < ksub)
        val dmin = (0 until ksub).map(k => dist(m, pq(m)(k))).min
        assert(dist(m, pq(m)(c)) <= dmin + 1e-12, s"code $c is not the argmin")
      }
      val qres = Array.fill(dims)(r.nextDouble() * 2 - 1)
      val a = PqKernel.adc(ArrayData.toArrayData(qres), codes, pq)
      val direct = (0 until mSub).map { m =>
        (0 until dsub).map { i =>
          val d = qres(m * dsub + i) - pq(m)(codes.getInt(m))(i); d * d
        }.sum
      }.sum
      assert(a >= 0.0 && math.abs(a - direct) < 1e-9)
    }
  }

  test("Unigram Viterbi: DP cost equals exhaustive-minimum over ALL segmentations") {
    val r = rng
    import scala.jdk.CollectionConverters._
    for (_ <- 1 to 300) {
      // small alphabet, random vocab of random substrings + random costs
      val word = (1 to (1 + r.nextInt(8))).map(_ => ('a' + r.nextInt(3)).toChar).mkString
      val nPieces = 1 + r.nextInt(8)
      val vocab = (1 to nPieces).map { _ =>
        val s = (1 to (1 + r.nextInt(4))).map(_ => ('a' + r.nextInt(3)).toChar).mkString
        s -> (1L + r.nextInt(1000))
      }.distinctBy(_._1)
      val unk = 1L + r.nextInt(2000)
      val costs = UnigramKernel.costsOf(vocab)
      val pieces = UnigramKernel.segmentWord(word, costs, unk).asScala.toSeq
      // pieces reassemble to the word (strip the ▁ mark)
      assert(pieces.mkString.replace(UnigramKernel.WordMark, "") === word)
      def cost(ps: Seq[String]): Option[Long] =
        ps.foldLeft(Option(0L)) { (acc, p) =>
          acc.flatMap { a =>
            val c = costs.get(p)
            if (c != null) Some(a + c)
            else if (p.length == 1) Some(a + unk)
            else None
          }
        }
      // exhaustive enumeration of every segmentation (2^(n-1) for n<=9)
      def segs(w: String): Seq[Seq[String]] =
        if (w.isEmpty) Seq(Seq.empty)
        else (1 to w.length).flatMap(i => segs(w.drop(i)).map(w.take(i) +: _))
      val best = segs(word).flatMap(s => cost(s)).min
      val got = cost(pieces.map(_.replace(UnigramKernel.WordMark, ""))).get
      assert(got === best, s"word=$word vocab=$vocab unk=$unk pieces=$pieces")
    }
  }

  test("Winnowing guarantee: two sequences sharing a >= w+k-1 token run share a fingerprint") {
    // pure-scala replay of the fingerprint selection (the spark op is
    // gated bit-exact against the oracle; this pins the ALGORITHM's
    // guarantee over random corpora)
    val r = rng
    val k = 3; val w = 4
    def h(s: String) = Hashing.planTimeH64(s"winnow$k:$s")
    def fps(ts: Seq[String]): Set[(Int, Long)] = {
      if (ts.length < k) return Set.empty
      val hs = (0 to ts.length - k).map(i => h(ts.slice(i, i + k).mkString(" ")))
      val wins = if (hs.length < w) Seq(hs.indices) else (0 to hs.length - w).map(i => i until i + w)
      wins.map(_.foldLeft((-1, Long.MaxValue)) { case ((bp, bh), j) =>
        if (hs(j) <= bh) (j, hs(j)) else (bp, bh) }).toSet
    }
    for (trial <- 1 to 200) {
      val runLen = w + k - 1 + r.nextInt(4)
      val run = (1 to runLen).map(_ => s"s${r.nextInt(50)}")
      def noise(n: Int) = (1 to n).map(_ => s"x${trial}_${r.nextInt(1000000)}")
      val a = noise(r.nextInt(6)) ++ run ++ noise(r.nextInt(6))
      val b = noise(r.nextInt(6)) ++ run ++ noise(r.nextInt(6))
      val shared = fps(a).map(_._2).intersect(fps(b).map(_._2))
      assert(shared.nonEmpty, s"trial=$trial run=$run")
    }
  }
}
