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
