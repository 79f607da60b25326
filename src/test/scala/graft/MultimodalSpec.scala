package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{MediaBlob, Multimodal}

/** The codec seam is REAL: the encode stage emits genuine PNG streams
  * and the decode stage reads them back with javax.imageio — these pin
  * the container format, the PNG magic, and the exact pixel arithmetic
  * the DuckDB oracles mirror. */
class MultimodalSpec extends AnyFunSuite {

  private val pngMagic =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def refChecksum(data: Array[Byte], n: Int, shift: Int): Long =
    (0 until n).map(i =>
      if (data.isEmpty) 0L else (data((i + shift) % data.length) & 0xff).toLong)
      .sum

  test("encodeImages emits real PNG bytes (magic header present)") {
    val blob = MediaBlob(7L, "hello multimodal pipeline".getBytes("UTF-8"))
    val png = Multimodal.encodeImages(Iterator(blob)).next()
    assert(png.data.take(8).sameElements(pngMagic), "not a PNG stream")
  }

  test("ImageIO decode returns the construction dims and exact pixel checksum") {
    val data = "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    val len = data.length
    val meta = Multimodal.decodeImages(
      Multimodal.encodeImages(Iterator(MediaBlob(1L, data)))).next()
    assert(meta.width == len % 16 + 1)
    assert(meta.height == len % 12 + 1)
    assert(meta.channels == 3)
    assert(meta.n_bytes == meta.width * meta.height * 3)
    assert(meta.checksum == refChecksum(data, meta.width * meta.height * 3, 0))
  }

  test("container demux decodes every 2nd frame with per-frame shifted pixels") {
    val data = "a deterministic multi frame container payload".getBytes("UTF-8")
    val len = data.length
    val nFrames = len % 5 + 1
    val rows = Multimodal.demuxFrames(
      Multimodal.encodeContainers(Iterator(MediaBlob(3L, data)))).toList
    val expectedIdx = (0 until nFrames).filter(_ % 2 == 0)
    assert(rows.map(_._2) == expectedIdx.toList)
    rows.foreach { case (_, f, nBytes, checksum) =>
      val w = (len + f) % 8 + 1
      val h = (len + f) % 6 + 1
      assert(nBytes == w * h * 3, s"frame $f dims")
      assert(checksum == refChecksum(data, w * h * 3, f), s"frame $f checksum")
    }
  }

  test("empty payload decodes as a 1x1 black image, checksum 0") {
    val meta = Multimodal.decodeImages(
      Multimodal.encodeImages(Iterator(MediaBlob(0L, Array.empty[Byte])))).next()
    assert(meta.width == 1 && meta.height == 1 && meta.checksum == 0L)
  }
}
