package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Decoded audio features (schema of the audio decode stage's output
  * batches). `abs_sum` / `peak` are integer energy statistics over the
  * decoded 16-bit samples — exact, so the oracle can restate them. */
case class AudioMeta(doc_id: Long, n_samples: Int, sample_rate: Int,
                     channels: Int, bits: Int, abs_sum: Long, peak: Int)

/** SURVEY.md §2.K multimodal columns — the AUDIO modality, built to the
  * same honesty standard as the image path (`Multimodal`): the codec is
  * `javax.sound.sampled` (pure JVM, headless-safe, in-container). Each
  * document's bytes deterministically synthesize a REAL RIFF/WAVE stream
  * (PCM 16-bit signed little-endian, mono, 8 kHz) in one `mapPartitions`
  * stage, and a second `mapPartitions` stage — the seam a native codec /
  * Pandas-UDF would occupy — parses it back with
  * `AudioSystem.getAudioInputStream`, reading the true format fields and
  * every sample frame. Because sample i is a pure function of the doc
  * bytes (`(byte(i mod len) - 128) * 256`), the DuckDB oracle reproduces
  * the decoded sample statistics exactly — real decode, still
  * hash-checked.
  *
  * Scale shape: both stages are narrow (partition-local); the only
  * shuffle in either key is the final output sort, and the windowed key's
  * per-window rows are produced by the decoder itself (no explode of
  * per-sample rows through a shuffle).
  */
object Audio extends graft.QueryModule {

  import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
  import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream,
    AudioSystem}

  private val SampleRate = 8000
  private val WindowSize = 5

  /** Construction the oracle mirrors: sample i of a payload is byte
    * (i mod len), recentred to signed 16-bit ((b - 128) * 256); empty
    * payloads are silence. */
  private def sampleValue(data: Array[Byte], i: Int): Int =
    if (data.isEmpty) 0 else ((data(i % data.length) & 0xff) - 128) * 256

  private def nSamples(len: Int): Int = len % 50 + 8

  /** Synthesize one REAL WAV stream (canonical 44-byte RIFF header via
    * AudioSystem.write) carrying the construction's PCM16LE samples. */
  private[ext] def synthesizeWav(data: Array[Byte]): Array[Byte] = {
    val n = nSamples(data.length)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = sampleValue(data, i)
      pcm(2 * i) = (s & 0xff).toByte            // little-endian lo
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte // hi
      i += 1
    }
    val fmt = new AudioFormat(SampleRate.toFloat, 16, 1, true, false)
    val stream = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** ENCODE stage: one real WAV per document. */
  def encodeAudio(blobs: Iterator[MediaBlob]): Iterator[MediaBlob] =
    blobs.map(b => MediaBlob(b.doc_id, synthesizeWav(b.data)))

  /** Parse a WAV payload back through javax.sound.sampled: returns the
    * format-true (rate, channels, bits) and the decoded sample array. */
  private def readWav(data: Array[Byte]): (AudioFormat, Array[Int]) = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(data))
    val fmt = in.getFormat
    val n = in.getFrameLength.toInt
    val raw = in.readAllBytes()
    in.close()
    val samples = new Array[Int](n)
    var i = 0
    while (i < n) {
      // PCM16 signed little-endian mono
      samples(i) = ((raw(2 * i + 1) << 8) | (raw(2 * i) & 0xff))
      i += 1
    }
    (fmt, samples)
  }

  /** REAL audio decoder at the codec seam: AudioSystem over the payload
    * bytes, emitting the stream's true format fields plus exact integer
    * energy statistics (sum of |sample|, peak |sample|). */
  def decodeAudio(blobs: Iterator[MediaBlob]): Iterator[AudioMeta] =
    blobs.map { b =>
      val (fmt, samples) = readWav(b.data)
      var absSum = 0L
      var peak = 0
      var i = 0
      while (i < samples.length) {
        val a = math.abs(samples(i))
        absSum += a
        if (a > peak) peak = a
        i += 1
      }
      AudioMeta(b.doc_id, samples.length, fmt.getSampleRate.toInt,
        fmt.getChannels, fmt.getSampleSizeInBits, absSum, peak)
    }

  /** WINDOWED feature extraction (the frame-sample analog for audio):
    * non-overlapping 5-sample windows, per-window exact energy (sum of
    * squared samples) and peak — the integer-exact stand-in for
    * RMS/spectral features a native DSP kernel would emit at this seam. */
  def windowAudio(blobs: Iterator[MediaBlob]): Iterator[(Long, Int, Int, Long, Int)] =
    blobs.flatMap { b =>
      val (_, samples) = readWav(b.data)
      samples.grouped(WindowSize).zipWithIndex.map { case (w, idx) =>
        var energy = 0L
        var peak = 0
        var i = 0
        while (i < w.length) {
          energy += w(i).toLong * w(i)
          val a = math.abs(w(i)); if (a > peak) peak = a
          i += 1
        }
        (b.doc_id, idx, w.length, energy, peak)
      }
    }

  private val SpecWindow = 8
  private val SpecBins = 4
  private val CoefScale = 1000000L

  /** DFT coefficient tables for the spectrogram, pinned to a 1e-6
    * integer grid: C(k)(n) = round(cos(2π·k·n/8)·1e6), S likewise for
    * sin. ONE table feeds BOTH sides — the Spark kernel uses the arrays
    * and the generated oracle embeds the same values as list literals —
    * so the per-window bin sums are exact BIGINT arithmetic in both
    * engines (the standard trick this repo uses wherever a transform
    * needs irrational constants: share the rounded grid, never recompute
    * libm on each side). */
  private[ext] val SpecCos: Array[Array[Long]] =
    Array.tabulate(SpecBins, SpecWindow)((k, n) =>
      math.round(math.cos(2.0 * math.Pi * k * n / SpecWindow) * CoefScale))
  private[ext] val SpecSin: Array[Array[Long]] =
    Array.tabulate(SpecBins, SpecWindow)((k, n) =>
      math.round(math.sin(2.0 * math.Pi * k * n / SpecWindow) * CoefScale))

  /** SPECTROGRAM stage: per non-overlapping 8-sample window, the DFT
    * power at 4 frequency bins (k = 0 is the DC/energy bin). The bin
    * sums re = Σ x[n]·C(k)(n), im = −Σ x[n]·S(k)(n) are exact 64-bit
    * integers (|x| ≤ 32768, coef ≤ 1e6, 8 terms → ≤ 2.7e11); power is
    * derived row-locally as (re/1e6)² + (im/1e6)², an identical IEEE
    * op sequence in both engines. The integer-exact stand-in for the
    * FFT feature extraction a native DSP kernel would run at this seam
    * — same honesty standard as [[windowAudio]]. */
  def spectrogram(blobs: Iterator[MediaBlob]): Iterator[(Long, Int, Int, Long, Long)] =
    blobs.flatMap { b =>
      val (_, samples) = readWav(b.data)
      samples.grouped(SpecWindow).zipWithIndex.flatMap { case (w, idx) =>
        (0 until SpecBins).iterator.map { k =>
          var re = 0L; var im = 0L; var n = 0
          while (n < w.length) {
            re += w(n).toLong * SpecCos(k)(n)
            im -= w(n).toLong * SpecSin(k)(n)
            n += 1
          }
          (b.doc_id, idx, k, re, im)
        }
      }
    }

  // --- audio fingerprinting (the Shazam/Wang'03 landmark shape) --------

  private val FpMaxSamples = 128
  private val FpQuantum = 1024L
  private val FpMaxDt = 3
  private val FpMinVotes = 3

  /** Encode a PCM16LE sample array as one real RIFF/WAVE stream. */
  private def pcmToWav(samples: Array[Int]): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(SampleRate.toFloat, 16, 1, true, false)
    val stream = new AudioInputStream(new ByteArrayInputStream(pcm), fmt,
      samples.length)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** ENCODE stage for the fingerprint keys: a real WAV over the first
    * min(len, 128) bytes (sample i = byte i, recentred — no wraparound,
    * so a shared document PREFIX yields a shared audio prefix and the
    * landmark pairs of near-dup documents align). */
  private[graft] def synthesizeWavFp(data: Array[Byte]): Array[Byte] = {
    val n = math.min(data.length, FpMaxSamples)
    pcmToWav(Array.tabulate(n)(i => ((data(i) & 0xff) - 128) * 256))
  }

  /** Spectral LANDMARK extraction at the decode seam — the fingerprint
    * keys' DSP stage: real WAV round-trip, non-overlapping 8-sample
    * windows, DFT magnitude on the shared integer grid over the 3 non-DC
    * bins; the landmark is the argmax bin (ties → lower bin) with its
    * squared magnitude quantized to a 1024 grid. All integer: the bin
    * sums are exact BIGINT, |re|,|im| are floor-divided by the 1e6
    * coefficient scale before squaring (trunc == floor on the abs), so
    * the oracle restates every landmark bit-for-bit. */
  def fingerprintLandmarks(blobs: Iterator[MediaBlob]): Iterator[(Long, Int, Int, Long)] =
    blobs.flatMap { b =>
      val (_, samples) = readWav(b.data)
      samples.grouped(SpecWindow).zipWithIndex.map { case (w, idx) =>
        var bestBin = 0
        var bestM = -1L
        var k = 1
        while (k < SpecBins) {
          var re = 0L; var im = 0L; var n = 0
          while (n < w.length) {
            re += w(n).toLong * SpecCos(k)(n)
            im -= w(n).toLong * SpecSin(k)(n)
            n += 1
          }
          val rk = math.abs(re) / CoefScale
          val ik = math.abs(im) / CoefScale
          val m = rk * rk + ik * ik
          if (m > bestM) { bestM = m; bestBin = k }
          k += 1
        }
        (b.doc_id, idx, bestBin, bestM / FpQuantum)
      }
    }

  /** Landmark-PAIR fingerprints over a `(doc_id, text)` relation: each
    * anchor landmark paired with the landmarks [[FpMaxDt]] windows ahead
    * (the Wang'03 target zone), hashed as the readable string
    * `binA_qA_binB_qB_dt`. The quantized magnitudes make the alphabet
    * effectively unbounded — candidate buckets stay small (max 26 at
    * sf0.1) without any banding step. Public so the spec can drive
    * constructed payloads through the identical path. */
  def audioFingerprints(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import graft.Ckpt.CutOps
    val lm = docs
      .select(col("doc_id"), col("text").cast("binary").as("data"))
      .as[MediaBlob]
      .mapPartitions(bs => bs.map(b => MediaBlob(b.doc_id, synthesizeWavFp(b.data))))
      .mapPartitions(fingerprintLandmarks)
      .toDF("doc_id", "w", "bin", "q")
      .cut() // the anchor-target pair join reads the landmarks twice
    lm.as("a").join(lm.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("b.w") - col("a.w") >= 1 && col("b.w") - col("a.w") <= FpMaxDt)
      .select(col("a.doc_id").as("doc_id"), col("a.w").as("anchor"),
        concat_ws("_",
          col("a.bin").cast("string"), col("a.q").cast("string"),
          col("b.bin").cast("string"), col("b.q").cast("string"),
          (col("b.w") - col("a.w")).cast("string")).as("fp"))
  }

  /** Offset-consistent VOTE matching over a fingerprint relation: pairs
    * of documents sharing ≥ [[FpMinVotes]] fingerprints at the SAME
    * anchor alignment (the Shazam scatterplot-diagonal test, as one
    * equi-join + hash agg — no alignment search). */
  def audioMatches(fps: DataFrame): DataFrame =
    fps.as("x").join(fps.as("y"),
        col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("i"), col("y.doc_id").as("j"),
        (col("x.anchor") - col("y.anchor")).as("t_offset"))
      .agg(count(lit(1)).as("votes"))
      .filter(col("votes") >= FpMinVotes)

  /** One micro-batch of incremental audio content-ID — the per-epoch
    * core [[graft.streaming.Streams.audioFpDeltas]] runs inside
    * `foreachBatch` (the audio twin of `Dedup.dedupDelta` /
    * `SimSearch.knnGraphDelta`, completing the streaming index lifecycle
    * for the fingerprint family): the batch's documents are
    * fingerprinted with the corpus-independent landmark hashes, matched
    * against the SAVED fingerprint store ∪ the batch (the historical
    * corpus is never re-fingerprinted), and every epoch table lands in
    * its own `epoch=N` partition so a re-delivered micro-batch rewrites
    * identical rows (replay-idempotent, the house at-least-once
    * contract). Votes decompose exactly: a pair's matches are all
    * emitted in the epoch its LATER document arrives in (both docs'
    * complete fingerprint sets exist then; earlier epochs can't see the
    * pair, later epochs have neither side in the delta), so the union
    * of per-epoch match rows ≡ the batch [[audioMatches]] over
    * everything streamed. Idempotent across epochs too (ADVICE r11):
    * docs already fingerprinted in a PRIOR epoch are anti-joined out of
    * the batch, so cross-epoch re-delivery neither duplicates store rows
    * nor double-counts votes. Returns the full match store as of this
    * epoch. */
  def audioFpDelta(batchIn: DataFrame, storeDir: String, epoch: Long): DataFrame = {
    // fail loudly if a compaction swap is in flight (r14 lease contract)
    graft.pipeline.StoreCompact.assertNotCompacting(storeDir)
    import graft.Ckpt.CutOps
    val s = batchIn.sparkSession
    val batch = batchIn.select(col("doc_id"), col("text")).cut()
    def writeEpoch(df: DataFrame, sub: String): Unit =
      df.write.mode("overwrite").parquet(s"$storeDir/$sub/epoch=$epoch")
    // CROSS-epoch idempotence (ADVICE r11): a doc re-delivered under a
    // DIFFERENT epoch (same-epoch replays are covered by the partition
    // overwrite) would store its fingerprints twice and double-count
    // votes — anti-join the batch against doc_ids already fingerprinted
    // in PRIOR epochs, so only genuinely new docs extend the store.
    val priorIds =
      if (graft.Hfs.exists(s"$storeDir/fps"))
        s.read.parquet(s"$storeDir/fps").filter(col("epoch") =!= epoch)
          .select("doc_id").distinct()
      else batch.select("doc_id").limit(0)
    val newDocs = batch.join(priorIds, Seq("doc_id"), "left_anti").cut()
    // the epoch's fingerprints land FIRST; the match join then reads the
    // delta back from its own partition and the full store as two
    // independent scans (a self-join of one in-memory plan here tripped
    // Catalyst's Union constraint rewrite over the checkpointed
    // fingerprint plan's stale origin constraints). On a replay the
    // overwrite lays down identical rows, so the store is unchanged.
    writeEpoch(audioFingerprints(newDocs), "fps")
    val deltaFps = s.read.parquet(s"$storeDir/fps/epoch=$epoch")
    val allFps = s.read.parquet(s"$storeDir/fps")
      .select("doc_id", "anchor", "fp")
    // match identity (i, j, t_offset, ai, fp) — aj = ai − t_offset, so
    // the distinct() collapses the doubled within-delta orientation
    // without losing genuine vote multiplicity
    val matches = deltaFps.as("x")
      .join(allFps.as("y"),
        col("x.fp") === col("y.fp") && col("x.doc_id") =!= col("y.doc_id"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("i"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("j"),
        when(col("x.doc_id") < col("y.doc_id"),
          col("x.anchor") - col("y.anchor"))
          .otherwise(col("y.anchor") - col("x.anchor")).as("t_offset"),
        when(col("x.doc_id") < col("y.doc_id"), col("x.anchor"))
          .otherwise(col("y.anchor")).as("ai"),
        col("x.fp").as("fp"))
      .distinct()
      .groupBy(col("i"), col("j"), col("t_offset"))
      .agg(count(lit(1)).as("votes"))
      .filter(col("votes") >= FpMinVotes)
      .cut() // materialize before the matches overwrite below
    writeEpoch(matches, "matches")
    s.read.parquet(s"$storeDir/matches")
      .select("i", "j", "t_offset", "votes")
      .orderBy("i", "j", "t_offset")
  }

  /** Audio fingerprint table [N]: one row per (anchor, target) landmark
    * pair — the index an audio-dedup / content-ID pipeline persists. */
  private def mmAudioFingerprint(s: SparkSession, d: String): DataFrame =
    audioFingerprints(Tables.documents(s, d))
      .orderBy("doc_id", "anchor", "fp")

  /** Audio near-dup detection [N]: fingerprint self-join + offset vote.
    * Candidates are one equi-join on the fingerprint string; the vote
    * threshold kills coincidental single-landmark collisions. */
  private def mmAudioDedup(s: SparkSession, d: String): DataFrame = {
    import graft.Ckpt.CutOps
    audioMatches(audioFingerprints(Tables.documents(s, d)).cut())
      .orderBy("i", "j", "t_offset")
  }

  /** RESAMPLE stage (decimate by 2): keep every 2nd sample and re-encode
    * a REAL WAV — pure integer selection (no interpolation filter, whose
    * kernel would be renderer-dependent), so the resampled stream is
    * bit-deterministic and the oracle restates every kept sample. The
    * audio twin of [[Multimodal.resizeImages]]'s nearest-neighbor rule. */
  def resampleAudio(blobs: Iterator[MediaBlob]): Iterator[MediaBlob] =
    blobs.map { b =>
      val (_, samples) = readWav(b.data)
      val kept = Array.range(0, samples.length, 2).map(samples)
      val pcm = new Array[Byte](kept.length * 2)
      var i = 0
      while (i < kept.length) {
        pcm(2 * i) = (kept(i) & 0xff).toByte
        pcm(2 * i + 1) = ((kept(i) >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(SampleRate.toFloat, 16, 1, true, false)
      val stream = new AudioInputStream(new ByteArrayInputStream(pcm), fmt,
        kept.length)
      val out = new ByteArrayOutputStream()
      AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
      MediaBlob(b.doc_id, out.toByteArray)
    }

  /** Decode/feature-extract as two partition-wise typed transforms over a
    * binary column: synthesize real WAVs, then decode them with
    * javax.sound.sampled. Oracle-checked: format fields and sample
    * statistics are pure functions of the doc bytes. */
  private def mmAudioDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("data"))
      .as[MediaBlob]
      .mapPartitions(encodeAudio)
      .mapPartitions(decodeAudio)
      .toDF()
      .orderBy("doc_id")
  }

  /** Windowed audio energy over binary payloads: real WAV round-trip,
    * one row per 5-sample window, oracle-checked per window. */
  private def mmAudioWindow(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("data"))
      .as[MediaBlob]
      .mapPartitions(encodeAudio)
      .mapPartitions(windowAudio)
      .toDF("doc_id", "window_idx", "n_in_window", "energy", "peak")
      .orderBy("doc_id", "window_idx")
  }

  /** Resample pipeline: encode → decimate-by-2 → decode (the SAME
    * decode stage mm_audio_decode uses — the resampled bytes are a real
    * WAV). Three partition-wise stages, no shuffle until the output
    * sort. */
  private def mmAudioResample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("data"))
      .as[MediaBlob]
      .mapPartitions(encodeAudio)
      .mapPartitions(resampleAudio)
      .mapPartitions(decodeAudio)
      .toDF()
      .orderBy("doc_id")
  }

  /** Windowed DFT power over binary payloads [N] (r10): real WAV
    * round-trip, one row per (8-sample window × 4 frequency bins),
    * integer-exact bin sums + row-local IEEE power — oracle-checked per
    * bin. Narrow until the output sort, like every key in this module. */
  private def mmAudioSpectrogram(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("data"))
      .as[MediaBlob]
      .mapPartitions(encodeAudio)
      .mapPartitions(spectrogram)
      .toDF("doc_id", "window_idx", "bin", "re_scaled", "im_scaled")
      .withColumn("power",
        (col("re_scaled") / lit(1000000.0)) * (col("re_scaled") / lit(1000000.0)) +
          (col("im_scaled") / lit(1000000.0)) * (col("im_scaled") / lit(1000000.0)))
      .orderBy("doc_id", "window_idx", "bin")
  }

  private def lit2d(t: Array[Array[Long]]): String =
    t.map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")

  /** Oracle for [[mmAudioSpectrogram]], generated so the coefficient
    * grid literals can never drift from [[SpecCos]]/[[SpecSin]]. */
  private def spectrogramOracle: String = {
    s"""WITH d AS (SELECT doc_id, text, length(text) AS len,
       |                  length(text) % 50 + 8 AS n
       |           FROM documents),
       |s AS (SELECT doc_id, i // $SpecWindow AS window_idx,
       |             i % $SpecWindow AS pos,
       |             CASE WHEN len = 0 THEN 0
       |                  ELSE (ord(substr(text, (i % len) + 1, 1)) - 128)
       |                       * 256 END AS v
       |      FROM d, unnest(range(0, n)) t(i)),
       |b AS (SELECT doc_id, window_idx, k,
       |             CAST(sum(CAST(v AS BIGINT) *
       |               (${lit2d(SpecCos)})[k + 1][pos + 1]) AS BIGINT) AS re,
       |             CAST(-sum(CAST(v AS BIGINT) *
       |               (${lit2d(SpecSin)})[k + 1][pos + 1]) AS BIGINT) AS im
       |      FROM s, unnest(range(0, $SpecBins)) t2(k)
       |      GROUP BY doc_id, window_idx, k)
       |SELECT doc_id, CAST(window_idx AS INTEGER) AS window_idx,
       |       CAST(k AS INTEGER) AS bin, re AS re_scaled, im AS im_scaled,
       |       (CAST(re AS DOUBLE) / 1000000.0) * (CAST(re AS DOUBLE) / 1000000.0)
       |         + (CAST(im AS DOUBLE) / 1000000.0) * (CAST(im AS DOUBLE) / 1000000.0)
       |         AS power
       |FROM b ORDER BY doc_id, window_idx, bin""".stripMargin
  }

  /** Shared CTE chain for the fingerprint oracles, generated from the
    * same [[SpecCos]]/[[SpecSin]] grids the JVM kernel uses: samples →
    * per-window non-DC bin sums → floor-scaled squared magnitudes →
    * argmax landmarks → anchor-target pair fingerprints. */
  private def fpCtesSql: String =
    s"""d AS (SELECT doc_id, text, least(length(text), $FpMaxSamples) AS n
       |      FROM documents WHERE length(text) > 0),
       |s AS (SELECT doc_id, i // $SpecWindow AS w, i % $SpecWindow AS pos,
       |             (ord(substr(text, i + 1, 1)) - 128) * 256 AS v
       |      FROM d, unnest(range(0, n)) t(i)),
       |bb AS (SELECT doc_id, w, k,
       |              CAST(sum(CAST(v AS BIGINT) *
       |                (${lit2d(SpecCos)})[k + 1][pos + 1]) AS BIGINT) AS re,
       |              CAST(-sum(CAST(v AS BIGINT) *
       |                (${lit2d(SpecSin)})[k + 1][pos + 1]) AS BIGINT) AS im
       |       FROM s, unnest(range(1, $SpecBins)) t2(k)
       |       GROUP BY doc_id, w, k),
       |mm AS (SELECT doc_id, w, k,
       |              (abs(re) // $CoefScale) * (abs(re) // $CoefScale)
       |            + (abs(im) // $CoefScale) * (abs(im) // $CoefScale) AS m
       |       FROM bb),
       |lm AS (SELECT doc_id, w, k AS bin, m // $FpQuantum AS q FROM (
       |         SELECT doc_id, w, k, m,
       |                row_number() OVER (PARTITION BY doc_id, w
       |                                   ORDER BY m DESC, k) AS rnk
       |         FROM mm) WHERE rnk = 1),
       |fp AS (SELECT a.doc_id, CAST(a.w AS INTEGER) AS anchor,
       |              concat(a.bin, '_', a.q, '_', b.bin, '_', b.q, '_',
       |                     b.w - a.w) AS fp
       |       FROM lm a JOIN lm b ON a.doc_id = b.doc_id
       |        AND b.w - a.w BETWEEN 1 AND $FpMaxDt)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_audio_decode" -> mmAudioDecode,
    "mm_audio_window" -> mmAudioWindow,
    "mm_audio_resample" -> mmAudioResample,
    "mm_audio_spectrogram" -> mmAudioSpectrogram,
    "mm_audio_fingerprint" -> mmAudioFingerprint,
    "mm_audio_dedup" -> mmAudioDedup)

  // Same ASCII precondition as mm_decode (ord(char) == byte; holds for
  // the driver's documents generator). Sample i = (ord(byte i mod len)
  // - 128) * 256; n_samples = len % 50 + 8; empty payloads are silence.
  val oracles: Map[String, String] = Map(
    "mm_audio_spectrogram" -> spectrogramOracle,
    "mm_audio_fingerprint" ->
      s"""WITH $fpCtesSql
         |SELECT doc_id, anchor, fp FROM fp
         |ORDER BY doc_id, anchor, fp""".stripMargin,
    "mm_audio_dedup" ->
      s"""WITH $fpCtesSql,
         |mt AS (SELECT x.doc_id AS i, y.doc_id AS j,
         |              x.anchor - y.anchor AS t_offset, count(*) AS votes
         |       FROM fp x JOIN fp y
         |         ON x.fp = y.fp AND x.doc_id < y.doc_id
         |       GROUP BY 1, 2, 3)
         |SELECT i, j, t_offset, votes FROM mt
         |WHERE votes >= $FpMinVotes
         |ORDER BY i, j, t_offset""".stripMargin,
    "mm_audio_decode" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS len,
        |                  length(text) % 50 + 8 AS n
        |           FROM documents),
        |s AS (SELECT doc_id, n,
        |             list_transform(range(0, n), i ->
        |               CASE WHEN len = 0 THEN 0
        |                    ELSE (ord(substr(text, (i % len) + 1, 1)) - 128)
        |                         * 256 END) AS smp
        |      FROM d)
        |SELECT doc_id,
        |       CAST(n AS INTEGER) AS n_samples,
        |       8000 AS sample_rate, 1 AS channels, 16 AS bits,
        |       CAST(coalesce(list_sum(list_transform(smp, x -> abs(x))), 0)
        |            AS BIGINT) AS abs_sum,
        |       CAST(coalesce(list_max(list_transform(smp, x -> abs(x))), 0)
        |            AS INTEGER) AS peak
        |FROM s ORDER BY doc_id""".stripMargin,
    // kept sample j of the decimated stream is source sample 2j
    "mm_audio_resample" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS len,
        |                  length(text) % 50 + 8 AS n
        |           FROM documents),
        |s AS (SELECT doc_id, (n + 1) // 2 AS nk,
        |             list_transform(range(0, (n + 1) // 2), j ->
        |               CASE WHEN len = 0 THEN 0
        |                    ELSE (ord(substr(text, ((2 * j) % len) + 1, 1))
        |                          - 128) * 256 END) AS smp
        |      FROM d)
        |SELECT doc_id,
        |       CAST(nk AS INTEGER) AS n_samples,
        |       8000 AS sample_rate, 1 AS channels, 16 AS bits,
        |       CAST(coalesce(list_sum(list_transform(smp, x -> abs(x))), 0)
        |            AS BIGINT) AS abs_sum,
        |       CAST(coalesce(list_max(list_transform(smp, x -> abs(x))), 0)
        |            AS INTEGER) AS peak
        |FROM s ORDER BY doc_id""".stripMargin,
    "mm_audio_window" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS len,
        |                  length(text) % 50 + 8 AS n
        |           FROM documents),
        |s AS (SELECT doc_id, i // 5 AS window_idx,
        |             CASE WHEN len = 0 THEN 0
        |                  ELSE (ord(substr(text, (i % len) + 1, 1)) - 128)
        |                       * 256 END AS v
        |      FROM d, unnest(range(0, n)) t(i))
        |SELECT doc_id, CAST(window_idx AS INTEGER) AS window_idx,
        |       CAST(count(*) AS INTEGER) AS n_in_window,
        |       CAST(sum(CAST(v AS BIGINT) * v) AS BIGINT) AS energy,
        |       CAST(max(abs(v)) AS INTEGER) AS peak
        |FROM s GROUP BY doc_id, window_idx
        |ORDER BY doc_id, window_idx""".stripMargin)
}
