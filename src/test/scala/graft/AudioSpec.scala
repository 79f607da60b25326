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
}
