package graft.multimodal

/** A REAL pure-JVM image codec for the multimodal kernels: binary PPM
  * (P6), the simplest interchange format an image pipeline meets in the
  * wild — `"P6" <ws> width <ws> height <ws> maxval <single ws> raw RGB
  * triplets`, `#` comments allowed in the header. No library
  * dependency, so the decode path in [[Multimodal]] is exercised with
  * actual pixels instead of the synthetic-header stub (the stub remains
  * the fallback for payloads in the fixture's GRFT framing).
  *
  * Scale note: decode/resize are per-row kernels inside `mapPartitions`
  * — zero shuffle, payload bytes never enter the relational row format,
  * and the working set is one image at a time per task.
  */
object PpmCodec {

  /** Decoded raster: RGB, 3 bytes per pixel, row-major. */
  final case class Image(width: Int, height: Int, rgb: Array[Byte])

  /** Parse a binary PPM. None on anything malformed (wrong magic, bad
    * dims, truncated raster) — the kernel treats that as "not this
    * codec" and falls through, never throws.
    */
  def decode(payload: Array[Byte]): Option[Image] = {
    if (payload.length < 2 || payload(0) != 'P' || payload(1) != '6')
      return None
    var pos = 2
    // header token reader: skip whitespace and '#'-to-EOL comments
    def nextInt(): Option[Int] = {
      while (pos < payload.length &&
        (payload(pos).toChar.isWhitespace || payload(pos) == '#')) {
        if (payload(pos) == '#')
          while (pos < payload.length && payload(pos) != '\n') pos += 1
        else pos += 1
      }
      val start = pos
      while (pos < payload.length && payload(pos).toChar.isDigit) pos += 1
      // >9 digits can't be a sane dimension and would overflow .toInt
      if (pos == start || pos - start > 9) None
      else Some(new String(payload, start, pos - start, "US-ASCII").toInt)
    }
    for {
      w <- nextInt()
      h <- nextInt()
      maxval <- nextInt()
      // exactly ONE whitespace byte separates maxval from the raster
      if w > 0 && h > 0 && maxval > 0 && maxval < 256 &&
        pos < payload.length && payload(pos).toChar.isWhitespace &&
        // guard w*h*3 against Int overflow before the length check
        w.toLong * h * 3 <= payload.length.toLong - (pos + 1)
    } yield {
      val n = w * h * 3
      val rgb = java.util.Arrays.copyOfRange(payload, pos + 1, pos + 1 + n)
      Image(w, h, rgb)
    }
  }

  /** Serialize back to binary PPM (maxval 255). */
  def encode(img: Image): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n"
      .getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
    out
  }

  /** Nearest-neighbor rescale to exactly (nw, nh) — the standard
    * thumbnail kernel; deterministic (no filtering, no float pixel
    * math beyond the index map).
    */
  def resize(img: Image, nw: Int, nh: Int): Image = {
    val rgb = new Array[Byte](nw * nh * 3)
    var y = 0
    while (y < nh) {
      val sy = (y.toLong * img.height / nh).toInt
      var x = 0
      while (x < nw) {
        val sx = (x.toLong * img.width / nw).toInt
        val src = (sy * img.width + sx) * 3
        val dst = (y * nw + x) * 3
        rgb(dst) = img.rgb(src)
        rgb(dst + 1) = img.rgb(src + 1)
        rgb(dst + 2) = img.rgb(src + 2)
        x += 1
      }
      y += 1
    }
    Image(nw, nh, rgb)
  }

  /** Integer luminance per pixel (ITU-R BT.601 weights in /256 fixed
    * point — integer math so the result is engine- and platform-exact).
    */
  def luminanceHistogram(img: Image): Array[Long] = {
    val hist = new Array[Long](256)
    var i = 0
    while (i < img.rgb.length) {
      val r = img.rgb(i) & 0xff
      val g = img.rgb(i + 1) & 0xff
      val b = img.rgb(i + 2) & 0xff
      hist((77 * r + 150 * g + 29 * b) >> 8) += 1
      i += 3
    }
    hist
  }
}
