package graft.multimodal

/** A REAL pure-JVM audio codec for the multimodal kernels: RIFF/WAVE
  * with 16-bit PCM — the PPM of audio. Chunk-walks the container
  * (`RIFF` size `WAVE`, then `fmt ` / `data` chunks in any order,
  * unknown chunks skipped), refuses anything that isn't integer PCM
  * (`audioFormat == 1`, 16-bit). No library dependency; the decode path
  * in [[Multimodal]] runs on actual samples, with the synthetic GRFT
  * framing as the fallback. Video remains honestly stubbed — there is
  * no trivially-pure-JVM video format.
  *
  * Scale note: same kernel contract as [[PpmCodec]] — per-row inside
  * `mapPartitions`, zero shuffle, one payload in flight per task.
  */
object WavCodec {

  /** Decoded clip: interleaved 16-bit samples (all channels). */
  final case class Clip(
      sampleRate: Int, channels: Int, samples: Array[Short]) {
    def nFrames: Int = if (channels == 0) 0 else samples.length / channels
    def durationMs: Long =
      if (sampleRate == 0) 0L else nFrames.toLong * 1000 / sampleRate
  }

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def tag(b: Array[Byte], off: Int, t: String): Boolean =
    b.length >= off + 4 && (0 until 4).forall(i => b(off + i) == t(i).toByte)

  /** Parse a 16-bit-PCM WAV. None on anything malformed or non-PCM —
    * the kernel treats that as "not this codec", never throws.
    */
  def decode(payload: Array[Byte]): Option[Clip] = {
    if (payload.length < 12 || !tag(payload, 0, "RIFF") ||
      !tag(payload, 8, "WAVE")) return None
    var pos = 12
    var rate = 0
    var channels = 0
    var bits = 0
    var pcm = false
    var data: Array[Short] = null
    while (pos + 8 <= payload.length) {
      val size = le32(payload, pos + 4)
      val body = pos + 8
      // long arithmetic: body + size wraps negative for size near
      // Int.MaxValue and would pass an int-typed bounds check
      if (size < 0 || body.toLong + size > payload.length) return None
      if (tag(payload, pos, "fmt ") && size >= 16) {
        pcm = le16(payload, body) == 1
        channels = le16(payload, body + 2)
        rate = le32(payload, body + 4)
        bits = le16(payload, body + 14)
      } else if (tag(payload, pos, "data")) {
        val n = size / 2
        val out = new Array[Short](n)
        var i = 0
        while (i < n) {
          out(i) = le16(payload, body + 2 * i).toShort
          i += 1
        }
        data = out
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      pos = body + size + (size & 1)
    }
    if (pcm && bits == 16 && rate > 0 && channels > 0 && data != null)
      Some(Clip(rate, channels, data))
    else None
  }

  /** Serialize back to canonical 16-bit PCM WAV. */
  def encode(clip: Clip): Array[Byte] = {
    val dataBytes = clip.samples.length * 2
    val out = new Array[Byte](44 + dataBytes)
    def put(off: Int, t: String): Unit =
      (0 until t.length).foreach(i => out(off + i) = t(i).toByte)
    def p16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def p32(off: Int, v: Int): Unit = {
      p16(off, v & 0xffff); p16(off + 2, (v >>> 16) & 0xffff)
    }
    put(0, "RIFF"); p32(4, 36 + dataBytes); put(8, "WAVE")
    put(12, "fmt "); p32(16, 16); p16(20, 1); p16(22, clip.channels)
    p32(24, clip.sampleRate)
    p32(28, clip.sampleRate * clip.channels * 2)
    p16(32, clip.channels * 2); p16(34, 16)
    put(36, "data"); p32(40, dataBytes)
    var i = 0
    while (i < clip.samples.length) {
      p16(44 + 2 * i, clip.samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** Nearest-neighbor resample on frame index — the audio analog of
    * [[PpmCodec.resize]]: output frame f copies source frame
    * floor(f·srcRate/targetRate), all channels; duration is preserved
    * to within one frame. Nearest-neighbor (not interpolation) keeps
    * the kernel integer-exact and byte-deterministic — the property the
    * pipeline specs pin; production would swap in a windowed-sinc
    * kernel behind the same signature.
    */
  def resample(clip: Clip, targetRate: Int): Clip = {
    require(targetRate > 0, "targetRate must be positive")
    if (targetRate == clip.sampleRate || clip.nFrames == 0)
      return clip.copy(sampleRate = targetRate)
    val nOut = math.max(1,
      (clip.nFrames.toLong * targetRate / clip.sampleRate).toInt)
    val out = new Array[Short](nOut * clip.channels)
    var f = 0
    while (f < nOut) {
      val src = math.min(
        (f.toLong * clip.sampleRate / targetRate).toInt, clip.nFrames - 1)
      var c = 0
      while (c < clip.channels) {
        out(f * clip.channels + c) = clip.samples(src * clip.channels + c)
        c += 1
      }
      f += 1
    }
    Clip(targetRate, clip.channels, out)
  }

  /** Amplitude histogram over the samples' high bytes (256 bins) — the
    * audio analog of the image luminance histogram: feeds the same
    * entropy/support features.
    */
  def amplitudeHistogram(clip: Clip): Array[Long] = {
    val hist = new Array[Long](256)
    var i = 0
    while (i < clip.samples.length) {
      hist(((clip.samples(i) >> 8) & 0xff)) += 1
      i += 1
    }
    hist
  }

  /** Zero-crossing count on channel 0 — the classic cheap voicing /
    * noisiness signal.
    */
  def zeroCrossings(clip: Clip): Long = {
    var n = 0L
    var i = clip.channels
    while (i < clip.samples.length) {
      val prev = clip.samples(i - clip.channels)
      val cur = clip.samples(i)
      if ((prev < 0 && cur >= 0) || (prev >= 0 && cur < 0)) n += 1
      i += clip.channels
    }
    n
  }
}
