package graft.multimodal

/** REAL media codecs for the uncompressed container formats a JVM can
  * parse with no native libraries: RIFF/WAVE PCM-16 audio and binary
  * PPM (P6) images. Both formats are fully public specifications
  * (RIFF/WAVE: Microsoft/IBM 1991 multimedia standard; PPM: netpbm).
  *
  * This upgrades the multimodal decode step from the [[FakeDecoder]]
  * stub to actual byte-level parsing for these formats: the engine
  * encodes real container bytes, then the decode queries read back
  * ONLY those bytes through the parsers below — header validation,
  * chunk walking, little-endian sample extraction, pixel-row recovery.
  * Compressed codecs (JPEG/MP3/H.264) remain environment-gated: no
  * codec libraries exist in this container, and [[FakeDecoder]] keeps
  * standing in for them, loudly documented.
  *
  * Decoders are STRICT about what they accept (magic, PCM format tag,
  * bit depth, maxval) and TOLERANT where the spec demands it (unknown
  * RIFF chunks are skipped by their declared size, as real WAVs carry
  * LIST/fact chunks; PPM headers may hold `#` comments). Malformed
  * input throws `IllegalArgumentException` with the offending field —
  * a decode error must name itself, not read garbage.
  */
object WavCodec {

  /** Decoded WAV: `samples` is the LINEAR 16-bit interleaved stream
    * (frame-major, channel-minor — the data-chunk order), so
    * `samples.length = frames * channels`. For μ-law input
    * (`audioFormat` 7) the samples are the G.711-EXPANDED values. */
  final case class Wav(sampleRate: Int, channels: Int, bitsPerSample: Int,
      samples: Array[Short], audioFormat: Int = 1)

  /** G.711 μ-law byte → 16-bit linear sample — the CCITT expansion
    * (public ITU-T G.711 standard): complement, split into sign /
    * 3-bit exponent / 4-bit mantissa, rebuild the biased magnitude. */
  def ulawToLinear(u: Int): Short = {
    val v = ~u & 0xff
    val t = (((v & 0x0f) << 3) + 0x84) << ((v & 0x70) >> 4)
    (if ((v & 0x80) != 0) 0x84 - t else t - 0x84).toShort
  }

  /** Canonical RIFF/WAVE encoding of an interleaved PCM-16 stream:
    * RIFF header, 16-byte fmt chunk (audio format 1 = PCM), data
    * chunk. Little-endian throughout, per the RIFF spec. */
  def encodePcm16(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    require(channels > 0, s"channels must be positive: $channels")
    require(samples.length % channels == 0,
      s"interleaved stream length ${samples.length} not divisible by channels $channels")
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val byteRate = sampleRate * channels * 2
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)                  // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(byteRate)
      .putShort((channels * 2).toShort)     // block align
      .putShort(16.toShort)                 // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** RIFF/WAVE container around a raw G.711 μ-law byte stream:
    * fmt tag 7, 8 bits per sample, one byte per sample (the standard
    * telephony encoding, normally at 8 kHz). */
  def encodeUlaw(sampleRate: Int, channels: Int,
      ulaw: Array[Byte]): Array[Byte] = {
    require(channels > 0, s"channels must be positive: $channels")
    require(ulaw.length % channels == 0,
      s"stream length ${ulaw.length} not divisible by channels $channels")
    val pad = ulaw.length & 1 // word-align the data chunk
    val buf = java.nio.ByteBuffer.allocate(44 + ulaw.length + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + ulaw.length + pad)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(7.toShort)                  // μ-law
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels)        // byte rate
      .putShort(channels.toShort)           // block align
      .putShort(8.toShort)                  // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(ulaw.length)
      .put(ulaw)
    buf.array()
  }

  /** Parse a RIFF/WAVE container: validate magic, walk chunks in any
    * order skipping unknown ones (word-aligned, per spec), accept
    * PCM-16 (fmt 1) or μ-law (fmt 7), and return the LINEAR
    * interleaved sample stream (μ-law expanded via [[ulawToLinear]]). */
  def decode(bytes: Array[Byte]): Wav = {
    require(bytes.length >= 12, s"not a RIFF file: ${bytes.length} bytes")
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourCC(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    val riff = fourCC()
    require(riff == "RIFF", s"bad RIFF magic: '$riff'")
    buf.getInt // declared riff size; trust the actual buffer bound
    val wave = fourCC()
    require(wave == "WAVE", s"bad WAVE magic: '$wave'")
    var fmt: Option[(Int, Int, Int, Int)] = None // (format, channels, rate, bits)
    var data: Option[Array[Byte]] = None // raw; interpreted per fmt below
    while (buf.remaining() >= 8 && (fmt.isEmpty || data.isEmpty)) {
      val id = fourCC()
      val size = buf.getInt
      require(size >= 0 && size <= buf.remaining(),
        s"chunk '$id' declares $size bytes, ${buf.remaining()} remain")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small: $size")
          val start = buf.position()
          val audioFormat = buf.getShort.toInt
          val channels = buf.getShort.toInt
          val rate = buf.getInt
          buf.getInt   // byte rate (derived)
          buf.getShort // block align (derived)
          val bits = buf.getShort.toInt
          fmt = Some((audioFormat, channels, rate, bits))
          // word-aligned advance, clamped: an odd-sized chunk ending
          // exactly at end-of-buffer has no pad byte, and an over-limit
          // position() would throw a BARE IllegalArgumentException
          // that names no chunk — the decode-error contract requires
          // named errors
          buf.position(math.min(start + size + (size & 1), buf.limit()))
        case "data" =>
          val raw = new Array[Byte](size)
          buf.get(raw)
          data = Some(raw)
          if ((size & 1) == 1 && buf.hasRemaining) buf.get
        case _ => // LIST, fact, cue, ... — skip by declared size
          // same clamp as fmt: the pad byte may be absent at EOF
          buf.position(math.min(buf.position() + size + (size & 1), buf.limit()))
      }
    }
    val (format, channels, rate, bits) = fmt.getOrElse(
      throw new IllegalArgumentException("no fmt chunk"))
    // mirror the encoder-side checks: a container declaring 0 channels
    // would die as an ArithmeticException at the divisibility check
    // below, and rate 0 divides by zero in every duration consumer
    require(channels > 0, s"fmt chunk declares $channels channels")
    require(rate > 0, s"fmt chunk declares sample rate $rate")
    val raw = data.getOrElse(
      throw new IllegalArgumentException("no data chunk"))
    val samples = format match {
      case 1 =>
        require(bits == 16, s"only PCM-16 supported, got $bits-bit PCM")
        require(raw.length % 2 == 0, s"odd PCM-16 data size: ${raw.length}")
        val out = new Array[Short](raw.length / 2)
        var i = 0
        while (i < out.length) {
          out(i) = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort
          i += 1
        }
        out
      case 7 =>
        require(bits == 8, s"mu-law must be 8-bit, got $bits")
        val out = new Array[Short](raw.length)
        var i = 0
        while (i < out.length) { out(i) = ulawToLinear(raw(i) & 0xff); i += 1 }
        out
      case other =>
        throw new IllegalArgumentException(
          s"unsupported fmt tag $other (PCM=1 and mu-law=7 only)")
    }
    require(samples.length % channels == 0,
      s"data chunk (${samples.length} samples) not divisible by $channels channels")
    Wav(rate, channels, bits, samples, format) // bits = the CONTAINER's depth (8 for μ-law)
  }
}

/** Binary PPM (P6) — the netpbm uncompressed RGB image format. */
object PpmCodec {

  /** Decoded P6 image: `rgb` is row-major, 3 bytes (R, G, B) per
    * pixel, `rgb.length = width * height * 3`. */
  final case class Ppm(width: Int, height: Int, rgb: Array[Byte])

  def encodeP6(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3,
      s"rgb length ${rgb.length} != $width x $height x 3")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Parse a netpbm MULTI-IMAGE stream: concatenated P6 images, each
    * a complete header + payload (the documented netpbm stream form —
    * `pnmcat`/`pamsplit` read and write exactly this). Walks the
    * stream frame by frame; every frame may have its own dimensions.
    * Rejects trailing garbage (a stream must end exactly at the last
    * frame's final pixel byte). */
  def decodeStream(bytes: Array[Byte]): Seq[Ppm] = {
    require(bytes.nonEmpty,
      "empty stream: a P6 stream carries at least one frame")
    val frames = scala.collection.mutable.ListBuffer.empty[Ppm]
    var pos = 0
    while (pos < bytes.length) {
      val (img, next) = decodeP6At(bytes, pos)
      frames += img
      pos = next
    }
    frames.toList
  }

  /** Parse a P6 header (magic, width, height, maxval — whitespace
    * separated, `#` comments legal anywhere between tokens) and the
    * raw pixel payload that follows the single whitespace byte after
    * maxval. Only maxval 255 (1 byte per channel) is accepted. */
  def decodeP6(bytes: Array[Byte]): Ppm = {
    val (img, end) = decodeP6At(bytes, 0)
    require(end == bytes.length,
      s"${bytes.length - end} trailing bytes after a single P6 image")
    img
  }

  /** One P6 image starting at `offset`; returns (image, next offset). */
  private def decodeP6At(bytes: Array[Byte], offset: Int): (Ppm, Int) = {
    var pos = offset
    def skipWsAndComments(): Unit = {
      var in = true
      while (in && pos < bytes.length) {
        val c = bytes(pos).toChar
        if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else if (c.isWhitespace) pos += 1
        else in = false
      }
    }
    def token(): String = {
      skipWsAndComments()
      val start = pos
      while (pos < bytes.length && !bytes(pos).toChar.isWhitespace) pos += 1
      require(pos > start, s"truncated PPM header at byte $start")
      new String(bytes, start, pos - start, "US-ASCII")
    }
    // numeric header fields must fail as the contract's named
    // IllegalArgumentException, not a NumberFormatException
    def intToken(field: String): Int = {
      val t = token()
      try t.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"non-numeric PPM $field: '$t'")
      }
    }
    val magic = token()
    require(magic == "P6", s"bad PPM magic: '$magic'")
    val width = intToken("width")
    val height = intToken("height")
    require(width > 0 && height > 0,
      s"PPM dimensions must be positive: $width x $height")
    val maxval = intToken("maxval")
    require(maxval == 255, s"only maxval 255 supported, got $maxval")
    require(pos < bytes.length && bytes(pos).toChar.isWhitespace,
      "missing whitespace after maxval")
    pos += 1 // exactly ONE whitespace byte separates header and payload
    // Long math: a hostile header can declare dims whose w*h*3 wraps
    // Int (negative → NegativeArraySizeException, or — on an exact
    // 2^32 multiple — a silently misparsed frame). Bounding by the
    // remaining payload (an Int) also bounds the allocation.
    val expectL = width.toLong * height * 3
    require(expectL <= bytes.length - pos,
      s"pixel payload ${bytes.length - pos} bytes, expected $expectL " +
        s"($width x $height x 3)")
    val expect = expectL.toInt
    val rgb = new Array[Byte](expect)
    System.arraycopy(bytes, pos, rgb, 0, expect)
    (Ppm(width, height, rgb), pos + expect)
  }
}
