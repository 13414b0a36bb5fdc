package graft.multimodal

/** REAL compressed-format codec, pure JVM: GIF with actual LZW
  * (de)compression — the CompuServe GIF87a/89a specification, public
  * since 1987. This removes the "only uncompressed formats" caveat
  * from the multimodal decode path: the pixel payload here genuinely
  * round-trips a variable-width LZW code stream (growing code widths,
  * clear-code dictionary resets at 4096 entries, the KwKwK
  * first-use-before-defined case, LSB-first bit packing, 255-byte
  * data sub-blocks), not a container of raw bytes.
  *
  * Scope: encoder writes GIF87a with one image frame and a global
  * color table; decoder additionally accepts GIF89a, skips extension
  * blocks (0x21 label + sub-blocks), tolerates a missing end-of-
  * information code once all pixels are decoded (ubiquitous in the
  * wild — the canonical 1×1 GIF ends mid-code), and supports
  * deferred-clear streams (a full dictionary that is never reset).
  * Not in scope (compressed formats needing external codecs stay
  * behind [[FakeDecoder]]): interlacing, local color tables,
  * animation composition.
  */
object GifCodec {

  /** Decoded image: `palette` holds packed 0xRRGGBB ints; `indices`
    * one palette index per pixel, row-major. */
  final case class Gif(width: Int, height: Int, palette: Array[Int],
      indices: Array[Byte])

  private val MaxCode = 4096 // 12-bit LZW ceiling, per spec

  // ---- bit streams (GIF packs LZW codes LSB-first) -----------------

  private final class BitWriter {
    private val bytes = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nBits = 0
    def put(code: Int, width: Int): Unit = {
      var c = code; var w = width
      while (w > 0) {
        cur |= (c & 1) << nBits
        c >>= 1; w -= 1; nBits += 1
        if (nBits == 8) { bytes += cur.toByte; cur = 0; nBits = 0 }
      }
    }
    def finish(): Array[Byte] = {
      if (nBits > 0) { bytes += cur.toByte; cur = 0; nBits = 0 }
      bytes.toArray
    }
  }

  private final class BitReader(data: Array[Byte]) {
    private var pos = 0
    private var bit = 0
    /** Next `width`-bit code, or -1 if the stream ran out. */
    def get(width: Int): Int = {
      var out = 0
      var i = 0
      while (i < width) {
        if (pos >= data.length) return -1
        out |= ((data(pos) >> bit) & 1) << i
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      out
    }
  }

  // ---- LZW ----------------------------------------------------------

  /** GIF-variant LZW compression of a palette-index stream. Emits an
    * initial clear code, resets the dictionary whenever it reaches
    * 4096 entries, grows the code width one step AFTER the add that
    * fills the current width (mirroring the decoder, which runs one
    * dictionary entry behind), and terminates with end-of-information. */
  private[graft] def lzwEncode(minCodeSize: Int,
      input: Array[Byte]): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val w = new BitWriter
    var width = minCodeSize + 1
    var nextFree = eoi + 1
    // dictionary: (prefix code, next byte) -> code
    var dict = new java.util.HashMap[Int, Int]()
    def key(prefix: Int, b: Int): Int = (prefix << 8) | b
    w.put(clear, width)
    if (input.nonEmpty) {
      var cur = input(0) & 0xff
      var i = 1
      while (i < input.length) {
        val k = input(i) & 0xff
        if (dict.containsKey(key(cur, k))) {
          cur = dict.get(key(cur, k))
        } else {
          w.put(cur, width)
          if (nextFree == MaxCode) {
            w.put(clear, width)
            dict = new java.util.HashMap[Int, Int]()
            width = minCodeSize + 1
            nextFree = eoi + 1
          } else {
            dict.put(key(cur, k), nextFree)
            nextFree += 1
            if (nextFree == (1 << width) + 1 && width < 12) width += 1
          }
          cur = k
        }
        i += 1
      }
      w.put(cur, width)
    }
    // a spec-following decoder performs ONE MORE dictionary add after
    // consuming that final code (the entry for its predecessor) and
    // grows its read width when that add lands exactly on 1 << width —
    // mirror the bookkeeping, or EOI is written one bit narrower than
    // such a decoder reads it. BitWriter's zero padding makes the
    // mismatch benign in MOST streams (the extra bit read is a 0 pad,
    // and eoi's high bit is 0), but when the narrow EOI ends flush on
    // the final byte the wider read runs past the stream — a strict
    // external decoder errors. (Our own decoder stops at nPixels and
    // never reads EOI, so round-trips cannot see either case.) The
    // decoder skips its add at the deferred-clear ceiling, hence the
    // MaxCode mirror; the single-code stream (decoder prev == -1, no
    // add) can never satisfy the power-of-two test.
    // (the decoder's add count equals the encoder's at stream end —
    // it lags one entry mid-stream but catches up on the final code —
    // so the trigger is nextFree itself reaching 1 << width)
    if (nextFree < MaxCode && nextFree == (1 << width) && width < 12)
      width += 1
    w.put(eoi, width)
    w.finish()
  }

  /** GIF-variant LZW decompression: reads variable-width codes until
    * end-of-information, `nPixels` indices are produced (missing-EOI
    * tolerance), or the stream ends. */
  private[graft] def lzwDecode(minCodeSize: Int, data: Array[Byte],
      nPixels: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val r = new BitReader(data)
    val out = new Array[Byte](nPixels)
    var outPos = 0
    var width = minCodeSize + 1
    var nextFree = eoi + 1
    // dictionary as (prefix code, suffix byte) pairs; roots implicit
    val prefix = new Array[Int](MaxCode)
    val suffix = new Array[Byte](MaxCode)
    val stack = new Array[Byte](MaxCode)
    var prev = -1
    def emit(code: Int): Byte = { // writes the code's string, returns its first byte
      var sp = 0
      var c = code
      while (c >= clear) { // composite codes chain down to a root
        stack(sp) = suffix(c); sp += 1
        c = prefix(c)
      }
      val first = c.toByte
      require(outPos + sp + 1 <= nPixels,
        s"LZW output overruns the ${nPixels}-pixel image")
      out(outPos) = first; outPos += 1
      while (sp > 0) { sp -= 1; out(outPos) = stack(sp); outPos += 1 }
      first
    }
    var done = false
    while (!done && outPos < nPixels) {
      val code = r.get(width)
      if (code == -1) {
        require(outPos == nPixels,
          s"LZW stream ended at pixel $outPos of $nPixels")
        done = true
      } else if (code == clear) {
        width = minCodeSize + 1; nextFree = eoi + 1; prev = -1
      } else if (code == eoi) {
        require(outPos == nPixels,
          s"end-of-information at pixel $outPos of $nPixels")
        done = true
      } else {
        require(code < nextFree || (code == nextFree && prev != -1),
          s"LZW code $code ahead of dictionary ($nextFree)")
        val first =
          if (code < nextFree) emit(code)
          else { // KwKwK: the code being defined right now
            var sp = 0
            var c = prev
            while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
            val firstOfPrev = c.toByte
            require(outPos + sp + 2 <= nPixels,
              s"LZW output overruns the ${nPixels}-pixel image")
            out(outPos) = firstOfPrev; outPos += 1
            while (sp > 0) { sp -= 1; out(outPos) = stack(sp); outPos += 1 }
            out(outPos) = firstOfPrev; outPos += 1
            firstOfPrev
          }
        if (prev != -1 && nextFree < MaxCode) { // deferred-clear: full dict just stops growing
          prefix(nextFree) = prev
          suffix(nextFree) = first
          nextFree += 1
          if (nextFree == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    require(outPos == nPixels, s"decoded $outPos of $nPixels pixels")
    out
  }

  // ---- container ----------------------------------------------------

  def encode(width: Int, height: Int, palette: Array[Int],
      indices: Array[Byte]): Array[Byte] = {
    require(indices.length == width * height,
      s"${indices.length} indices for $width x $height")
    val bits = {
      var b = 1
      while ((1 << b) < palette.length) b += 1
      b
    }
    require(palette.length == (1 << bits) && bits >= 1 && bits <= 8,
      s"palette size ${palette.length} not a power of two in [2,256]")
    val minCodeSize = math.max(2, bits)
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF87a".getBytes("US-ASCII"))
    u16(width); u16(height)
    out.write(0x80 | (bits - 1)) // global color table, 2^bits entries
    out.write(0); out.write(0)   // background index, aspect
    palette.foreach { c =>
      out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff); out.write(c & 0xff)
    }
    out.write(0x2c) // image descriptor
    u16(0); u16(0); u16(width); u16(height)
    out.write(0)    // no local color table, not interlaced
    out.write(minCodeSize)
    val lzw = lzwEncode(minCodeSize, indices)
    var off = 0
    while (off < lzw.length) { // 255-byte data sub-blocks
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n); off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Pixel-count ceiling the decoder will allocate for (2^28 = 268M
    * pixels ≈ 256 MiB of indices): a hostile header can declare up to
    * 65535×65535 ≈ 4.3G pixels — `width * height` overflows Int — so
    * the product is computed in Long and refused past the bound with a
    * named error instead of a NegativeArraySizeException/OOM. */
  private val MaxPixels = 1L << 28

  def decode(bytes: Array[Byte]): Gif = {
    var pos = 0
    // every read states its need first: a truncated/hostile container
    // must throw the contract's named IllegalArgumentException, never
    // an ArrayIndexOutOfBounds from an unchecked bytes(pos)
    def need(n: Int, what: String): Unit =
      require(n <= bytes.length - pos,
        s"truncated GIF: $what needs $n bytes at offset $pos, " +
          s"${bytes.length - pos} remain")
    def u8(what: String): Int = {
      need(1, what); val v = bytes(pos) & 0xff; pos += 1; v
    }
    def u16(what: String): Int = {
      need(2, what)
      val v = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8)
      pos += 2; v
    }
    need(6, "magic")
    val magic = new String(bytes, 0, 6, "US-ASCII"); pos = 6
    require(magic == "GIF87a" || magic == "GIF89a", s"bad GIF magic: '$magic'")
    u16("screen width"); u16("screen height") // frame carries its own
    val packed = u8("screen descriptor flags")
    u8("background index"); u8("aspect ratio")
    val palette: Array[Int] =
      if ((packed & 0x80) != 0) {
        val n = 1 << ((packed & 0x07) + 1)
        need(3 * n, s"$n-entry global color table")
        Array.fill(n) {
          val r = u8("palette"); val g = u8("palette"); val b = u8("palette")
          (r << 16) | (g << 8) | b
        }
      } else Array.empty
    while ({ need(1, "block introducer"); bytes(pos) == 0x21 }) {
      pos += 1 // extension blocks (89a): label + sub-blocks, skipped
      u8("extension label")
      var n = u8("extension sub-block size")
      while (n != 0) {
        need(n, "extension sub-block"); pos += n
        n = u8("extension sub-block size")
      }
    }
    require(u8("image separator") == 0x2c, "expected image descriptor")
    u16("frame left"); u16("frame top")
    val width = u16("frame width"); val height = u16("frame height")
    require(width > 0 && height > 0,
      s"frame dimensions must be positive: $width x $height")
    val nPixels = width.toLong * height
    require(nPixels <= MaxPixels,
      s"refusing a $width x $height frame ($nPixels pixels > $MaxPixels)")
    val idPacked = u8("image descriptor flags")
    require((idPacked & 0x80) == 0, "local color tables not supported")
    require((idPacked & 0x40) == 0, "interlaced images not supported")
    require(palette.nonEmpty, "no global color table")
    val minCodeSize = u8("LZW min code size")
    require(minCodeSize >= 2 && minCodeSize <= 8,
      s"bad LZW min code size: $minCodeSize")
    val data = new java.io.ByteArrayOutputStream()
    var n = u8("image sub-block size")
    while (n != 0) {
      need(n, "image sub-block"); data.write(bytes, pos, n); pos += n
      n = u8("image sub-block size")
    }
    val indices = lzwDecode(minCodeSize, data.toByteArray, nPixels.toInt)
    indices.foreach(i => require((i & 0xff) < palette.length,
      s"pixel index ${i & 0xff} outside the ${palette.length}-color table"))
    Gif(width, height, palette, indices)
  }
}
