package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Audio, MediaBlob}

/** The audio codec seam is REAL: the encode stage emits genuine
  * RIFF/WAVE streams and the decode stage reads them back with
  * javax.sound.sampled — these pin the WAV magic, the PCM16LE sample
  * arithmetic, and the windowing the DuckDB oracles mirror. */
class AudioSpec extends AnyFunSuite {

  private def refSamples(data: Array[Byte]): Seq[Int] = {
    val n = data.length % 50 + 8
    (0 until n).map(i =>
      if (data.isEmpty) 0 else ((data(i % data.length) & 0xff) - 128) * 256)
  }

  test("encodeAudio emits a real RIFF/WAVE stream") {
    val wav = Audio.encodeAudio(
      Iterator(MediaBlob(1L, "some audio payload".getBytes("UTF-8")))).next()
    assert(new String(wav.data.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.data.slice(8, 12), "US-ASCII") == "WAVE")
  }

  test("decode returns construction format fields and exact sample stats") {
    val data = "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    val meta = Audio.decodeAudio(
      Audio.encodeAudio(Iterator(MediaBlob(1L, data)))).next()
    val ref = refSamples(data)
    assert(meta.n_samples == data.length % 50 + 8)
    assert(meta.sample_rate == 8000)
    assert(meta.channels == 1)
    assert(meta.bits == 16)
    assert(meta.abs_sum == ref.map(s => math.abs(s).toLong).sum)
    assert(meta.peak == ref.map(math.abs).max)
  }

  test("negative samples survive the LE round-trip (bytes < 128)") {
    // 'A' = 65 -> (65 - 128) * 256 = -16128: hi byte is negative
    val data = Array.fill(4)('A'.toByte)
    val meta = Audio.decodeAudio(
      Audio.encodeAudio(Iterator(MediaBlob(2L, data)))).next()
    assert(meta.peak == 16128)
    assert(meta.abs_sum == meta.n_samples.toLong * 16128)
  }

  test("windowed energy matches the construction per 5-sample window") {
    val data = "deterministic windowed audio energy fixture".getBytes("UTF-8")
    val rows = Audio.windowAudio(
      Audio.encodeAudio(Iterator(MediaBlob(3L, data)))).toList
    val ref = refSamples(data).grouped(5).zipWithIndex.toList
    assert(rows.size == ref.size)
    rows.zip(ref).foreach { case ((id, idx, cnt, energy, peak), (w, ri)) =>
      assert(id == 3L && idx == ri && cnt == w.length)
      assert(energy == w.map(s => s.toLong * s).sum)
      assert(peak == (if (w.isEmpty) 0 else w.map(math.abs).max))
    }
  }

  test("decimate-by-2 keeps exactly the even-index samples") {
    val data = "resampled audio keeps even index samples".getBytes("UTF-8")
    val ref = refSamples(data)
    val meta = Audio.decodeAudio(Audio.resampleAudio(
      Audio.encodeAudio(Iterator(MediaBlob(4L, data))))).next()
    val kept = ref.indices.collect { case i if i % 2 == 0 => ref(i) }
    assert(meta.n_samples == (ref.size + 1) / 2)
    assert(meta.abs_sum == kept.map(s => math.abs(s).toLong).sum)
    assert(meta.peak == kept.map(math.abs).max)
  }

  test("empty payload decodes as 8 samples of silence") {
    val meta = Audio.decodeAudio(
      Audio.encodeAudio(Iterator(MediaBlob(0L, Array.empty[Byte])))).next()
    assert(meta.n_samples == 8 && meta.abs_sum == 0L && meta.peak == 0)
  }

  /** Pure-Scala reference for the fingerprint landmarks: the same
    * construction the DuckDB oracle states (first min(len,128) bytes,
    * 8-sample windows, argmax non-DC bin with ties to the lower bin). */
  // the same rounding formula Audio.SpecCos/SpecSin pin (re-derived here
  // rather than shared, so a grid regression in the kernel can't hide)
  private val RefCos = Array.tabulate(4, 8)((k, n) =>
    math.round(math.cos(2.0 * math.Pi * k * n / 8) * 1000000L))
  private val RefSin = Array.tabulate(4, 8)((k, n) =>
    math.round(math.sin(2.0 * math.Pi * k * n / 8) * 1000000L))

  private def refLandmarks(data: Array[Byte]): Seq[(Int, Int, Long)] = {
    val n = math.min(data.length, 128)
    val samples = (0 until n).map(i => ((data(i) & 0xff) - 128) * 256)
    samples.grouped(8).zipWithIndex.map { case (w, idx) =>
      val ms = (1 until 4).map { k =>
        val re = w.indices.map(p => w(p).toLong * RefCos(k)(p)).sum
        val im = -w.indices.map(p => w(p).toLong * RefSin(k)(p)).sum
        val rk = math.abs(re) / 1000000L
        val ik = math.abs(im) / 1000000L
        (k, rk * rk + ik * ik)
      }
      val (bin, m) = ms.maxBy { case (k, m) => (m, -k) }
      (idx, bin, m / 1024L)
    }.toSeq
  }

  test("fingerprint landmarks match the oracle construction") {
    val data = ("fingerprint landmark fixture with enough bytes to cover " +
      "several full eight-sample windows and a partial tail!").getBytes("UTF-8")
    val lms = Audio.fingerprintLandmarks(
      Iterator(MediaBlob(9L, Audio.synthesizeWavFp(data)))).toList
    val ref = refLandmarks(data)
    assert(lms.size == ref.size)
    lms.zip(ref).foreach { case ((id, w, bin, q), (rw, rbin, rq)) =>
      assert(id == 9L && w == rw)
      assert(bin == rbin, s"window $w landmark bin")
      assert(q == rq, s"window $w quantized magnitude")
    }
    assert(lms.forall(l => l._3 >= 1 && l._3 <= 3), "landmark bins are non-DC")
  }

  test("identical payloads match at offset 0 with full votes; " +
    "an 8-byte trim matches at offset 1 (time-shift property)") {
    val s = TestSpark.spark
    import s.implicits._
    val base = ("a deterministic audio payload long enough that its " +
      "fingerprint carries many aligned landmark pairs across windows " +
      "0 through 15 of the synthesized wave form").getBytes("UTF-8")
    val docs = Seq(
      (1L, new String(base, "UTF-8")),
      (2L, new String(base, "UTF-8")),               // exact duplicate
      (3L, new String(base.drop(8), "UTF-8")))       // one window trimmed
      .toDF("doc_id", "text")
    val fps = Audio.audioFingerprints(docs).cache()
    val perDoc = fps.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val matches = Audio.audioMatches(fps).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)) -> r.getLong(3)).toMap
    // exact dup: every fingerprint votes, all at offset 0
    assert(matches((1L, 2L, 0)) == perDoc(1L))
    // trimmed doc: doc 3's window w is doc 1's window w+1, so the match
    // sits at offset +1 and carries (nearly) all of doc 3's fingerprints
    // (the trimmed doc's tail windows may differ where doc 1's samples
    // ran past 128)
    val shifted = matches.getOrElse((1L, 3L, 1), 0L)
    assert(shifted >= perDoc(3L) - 9,
      s"time-shift votes $shifted vs ${perDoc(3L)} fingerprints")
    fps.unpersist()
  }

  test("spectrogram bin 0 is the scaled window sum; power bounded by energy") {
    // DC coefficient row is all 1e6, so re(0) must equal 1e6 * Σ samples
    // and im(0) must be 0 — a closed-form cross-check of the pinned
    // coefficient grid; every bin's power respects |X(k)|² ≤ (Σ|x|)²
    val data = "spectral fixture with deterministic samples".getBytes("UTF-8")
    val ref = refSamples(data)
    val rows = Audio.spectrogram(
      Audio.encodeAudio(Iterator(MediaBlob(7L, data)))).toList
    assert(rows.size == ((ref.size + 7) / 8) * 4)
    val byWindow = rows.groupBy(_._2)
    for ((idx, bins) <- byWindow) {
      val w = ref.slice(idx * 8, idx * 8 + 8)
      val dc = bins.find(_._3 == 0).get
      assert(dc._4 == w.map(_.toLong).sum * 1000000L, "DC bin != scaled sum")
      assert(dc._5 == 0L, "DC bin has nonzero imaginary part")
      val bound = {
        val a = w.map(s => math.abs(s).toLong).sum.toDouble
        a * a + 1.0
      }
      for ((_, _, _, re, im) <- bins) {
        val p = (re / 1e6) * (re / 1e6) + (im / 1e6) * (im / 1e6)
        assert(p <= bound, s"bin power $p exceeds (sum |x|)^2 = $bound")
      }
    }
  }
}
