package graft.multimodal

/** A REAL pure-JVM video CONTAINER parser: RIFF/AVI headers — the
  * format-level half of video support. Frame DECODE stays honestly out
  * of scope (MJPG/raw frame payloads need image codecs this container
  * doesn't ship), but the metadata a pipeline actually routes on —
  * dimensions, frame count, frame rate, duration, stream handler —
  * comes from the actual container bytes: `RIFF('AVI ' LIST('hdrl'
  * avih(...) LIST('strl' strh(...))) ...)`, chunk-walked with the same
  * word-aligned discipline (and long-arithmetic bounds checks) as
  * [[WavCodec]].
  *
  * Scale note: same kernel contract as the other codecs — per-row
  * inside `mapPartitions`, zero shuffle, one payload in flight per
  * task; never throws on malformed input.
  */
object AviCodec {

  /** Parsed container metadata. `handler` is the video stream's FOURCC
    * (e.g. "MJPG"), empty when no `vids` stream header is present.
    */
  final case class VideoMeta(
      width: Int, height: Int, nFrames: Int, microSecPerFrame: Int,
      handler: String) {
    def durationMs: Long = microSecPerFrame.toLong * nFrames / 1000
  }

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def tag(b: Array[Byte], off: Int, t: String): Boolean =
    b.length >= off + 4 && (0 until 4).forall(i => b(off + i) == t(i).toByte)

  /** Parse AVI container metadata. None on anything malformed or
    * non-AVI — never throws (the WavCodec overflow lesson is baked in:
    * every chunk bound is checked in long arithmetic).
    */
  def decodeMeta(payload: Array[Byte]): Option[VideoMeta] = {
    if (payload.length < 12 || !tag(payload, 0, "RIFF") ||
      !tag(payload, 8, "AVI ")) return None
    var pos = 12
    var meta: Option[VideoMeta] = None
    while (pos + 8 <= payload.length) {
      val size = le32(payload, pos + 4)
      val body = pos + 8
      if (size < 0 || body.toLong + size > payload.length) return None
      if (tag(payload, pos, "LIST") && size >= 4 &&
        tag(payload, body, "hdrl")) {
        var p = body + 4
        var w = -1; var h = -1; var nf = -1; var uspf = -1
        var handler = ""
        while (p + 8 <= body + size) {
          val ssz = le32(payload, p + 4)
          val sb = p + 8
          if (ssz < 0 || sb.toLong + ssz > payload.length) return None
          if (tag(payload, p, "avih") && ssz >= 40) {
            // MainAVIHeader: µs/frame @0, total frames @16, dims @32/@36
            uspf = le32(payload, sb)
            nf = le32(payload, sb + 16)
            w = le32(payload, sb + 32)
            h = le32(payload, sb + 36)
          } else if (tag(payload, p, "LIST") && ssz >= 4 &&
            tag(payload, sb, "strl")) {
            // AVIStreamHeader: fccType @0, fccHandler @4 (after "strh" id)
            val q = sb + 4
            if (q + 8 <= sb + ssz && tag(payload, q, "strh") &&
              le32(payload, q + 4) >= 8 && q + 16 <= payload.length &&
              tag(payload, q + 8, "vids"))
              handler = new String(payload, q + 12, 4, "US-ASCII").trim
          }
          p = sb + ssz + (ssz & 1)
        }
        if (w > 0 && h > 0 && nf >= 0 && uspf > 0)
          meta = Some(VideoMeta(w, h, nf, uspf, handler))
      }
      pos = body + size + (size & 1)
    }
    meta
  }

  /** Serialize a minimal valid AVI container carrying exactly this
    * metadata (hdrl with avih + one vids strl, empty movi) — the test
    * fixture builder and the round-trip witness for [[decodeMeta]].
    */
  def encodeMeta(meta: VideoMeta): Array[Byte] =
    encodeBody(meta, Array.emptyByteArray)

  private def le(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def cc(t: String): Array[Byte] = t.getBytes("US-ASCII")

  private def encodeBody(
      meta: VideoMeta, moviBody: Array[Byte]): Array[Byte] = {
    val avih = cc("avih") ++ le(56) ++
      le(meta.microSecPerFrame) ++ le(0) ++ le(0) ++ le(0) ++
      le(meta.nFrames) ++ le(0) ++ le(1) ++ le(0) ++
      le(meta.width) ++ le(meta.height) ++ Array.fill(16)(0.toByte)
    val fcc = (meta.handler + "    ").take(4)
    val strh = cc("strh") ++ le(48) ++ cc("vids") ++ cc(fcc) ++
      Array.fill(40)(0.toByte)
    val strl = cc("LIST") ++ le(4 + strh.length) ++ cc("strl") ++ strh
    val hdrl = cc("LIST") ++ le(4 + avih.length + strl.length) ++
      cc("hdrl") ++ avih ++ strl
    val movi = cc("LIST") ++ le(4 + moviBody.length) ++ cc("movi") ++
      moviBody
    val bodyLen = 4 + hdrl.length + movi.length
    cc("RIFF") ++ le(bodyLen) ++ cc("AVI ") ++ hdrl ++ movi
  }

  /** DIB row stride: BGR24 rows pad to 4-byte boundaries — the actual
    * uncompressed-frame convention, kept so the codec reads real
    * raw-DIB AVIs, not just its own output.
    */
  private def stride(width: Int): Int = (width * 3 + 3) & ~3

  /** Serialize an AVI whose `movi` list carries each frame as one
    * `00db` chunk of uncompressed BGR24 rows, BOTTOM-UP with 4-byte
    * row padding (the DIB conventions), stream handler "DIB ". Frames
    * must all match the stated dimensions.
    */
  def encodeFrames(
      width: Int, height: Int, frames: Seq[PpmCodec.Image],
      microSecPerFrame: Int = 100000): Array[Byte] = {
    require(frames.forall(f => f.width == width && f.height == height),
      "every frame must match the container dimensions")
    val rs = stride(width)
    val chunks = frames.map { f =>
      val body = new Array[Byte](rs * height)
      var y = 0
      while (y < height) {
        val srcRow = (height - 1 - y) * width * 3 // bottom-up
        var x = 0
        while (x < width) {
          body(y * rs + x * 3) = f.rgb(srcRow + x * 3 + 2)     // B
          body(y * rs + x * 3 + 1) = f.rgb(srcRow + x * 3 + 1) // G
          body(y * rs + x * 3 + 2) = f.rgb(srcRow + x * 3)     // R
          x += 1
        }
        y += 1
      }
      cc("00db") ++ le(body.length) ++ body ++
        (if ((body.length & 1) == 1) Array(0.toByte)
         else Array.emptyByteArray)
    }
    encodeBody(
      VideoMeta(width, height, frames.size, microSecPerFrame, "DIB"),
      chunks.flatten.toArray)
  }

  /** Decode the uncompressed-DIB frames of an AVI: container metadata
    * via [[decodeMeta]], then the `movi` list's `00db`/`00dc` chunks
    * converted bottom-up padded BGR → top-down RGB rasters. None when
    * the container is malformed, the handler is not raw DIB, or any
    * frame chunk is not exactly one raster — never throws.
    */
  def decodeFrames(payload: Array[Byte])
      : Option[(VideoMeta, Vector[PpmCodec.Image])] = {
    val meta = decodeMeta(payload) match {
      case Some(m) if m.handler == "DIB" && m.width > 0 &&
        m.width <= 8192 && m.height > 0 && m.height <= 8192 => m
      case _ => return None
    }
    val rs = stride(meta.width)
    val want = rs.toLong * meta.height
    val frames = Vector.newBuilder[PpmCodec.Image]
    var pos = 12
    while (pos + 8 <= payload.length) {
      val size = le32(payload, pos + 4)
      val body = pos + 8
      if (size < 0 || body.toLong + size > payload.length) return None
      if (tag(payload, pos, "LIST") && size >= 4 &&
        tag(payload, body, "movi")) {
        var p = body + 4
        while (p + 8 <= body + size) {
          val csz = le32(payload, p + 4)
          val cb = p + 8
          // bound against the movi LIST's own declared end, not the
          // whole payload — a chunk spilling past its list would
          // otherwise copy the NEXT top-level chunk's bytes into a
          // frame raster instead of refusing the torn container
          if (csz < 0 || cb.toLong + csz > body.toLong + size) return None
          if (tag(payload, p, "00db") || tag(payload, p, "00dc")) {
            if (csz.toLong != want) return None
            val rgb = new Array[Byte](meta.width * meta.height * 3)
            var y = 0
            while (y < meta.height) {
              val dstRow = (meta.height - 1 - y) * meta.width * 3
              var x = 0
              while (x < meta.width) {
                rgb(dstRow + x * 3) = payload(cb + y * rs + x * 3 + 2)
                rgb(dstRow + x * 3 + 1) = payload(cb + y * rs + x * 3 + 1)
                rgb(dstRow + x * 3 + 2) = payload(cb + y * rs + x * 3)
                x += 1
              }
              y += 1
            }
            frames += PpmCodec.Image(meta.width, meta.height, rgb)
          }
          p = cb + csz + (csz & 1)
        }
      }
      pos = body + size + (size & 1)
    }
    val fs = frames.result()
    if (fs.isEmpty) None else Some((meta, fs))
  }
}
