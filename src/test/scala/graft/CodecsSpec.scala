package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Multimodal, PpmCodec, WavCodec}

/** Byte-level conformance of the REAL uncompressed-media codecs
  * (Codecs.scala). The DuckDB gate adjudicates the encode→decode
  * round trip end-to-end (the oracle re-derives expected values from
  * the analytic synthesis rules); these tests pin what the gate
  * cannot see — that the parsers implement the PUBLIC formats, by
  * decoding hand-assembled golden bytes a third-party writer would
  * produce, tolerating spec-legal variation (chunk order, extra
  * chunks, header comments), and rejecting malformed input by name. */
class CodecsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("codecs-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  private val d = "/root/testdata/sf0.001"

  // -- WAV -----------------------------------------------------------

  test("wav: encode -> decode round-trips rate/channels/samples exactly") {
    val samples = Array.tabulate(300)(i => ((i * 977) % 65536 - 32768).toShort)
    val w = WavCodec.decode(WavCodec.encodePcm16(22050, 2, samples))
    assert(w.sampleRate == 22050 && w.channels == 2 && w.bitsPerSample == 16)
    assert(w.samples.toSeq == samples.toSeq)
  }

  test("wav: golden bytes hand-assembled per the RIFF spec decode correctly") {
    // 1 channel, 8000 Hz, 16-bit PCM, 2 samples: 1000, -2 — assembled
    // field by field, independent of the encoder under test
    val b = java.nio.ByteBuffer.allocate(48)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(40)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(4)
      .putShort(1000).putShort(-2)
    val w = WavCodec.decode(java.util.Arrays.copyOf(b.array(), 44 + 4))
    assert(w.sampleRate == 8000 && w.channels == 1)
    assert(w.samples.toSeq == Seq(1000.toShort, -2.toShort))
  }

  test("wav: unknown chunks are skipped by declared size (LIST before fmt)") {
    // a spec-legal container: RIFF [LIST(6 bytes + pad)] [fmt] [data]
    val b = java.nio.ByteBuffer.allocate(80)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(66)
      .put("WAVE".getBytes("US-ASCII"))
      .put("LIST".getBytes("US-ASCII")).putInt(5)
      .put("INFOx".getBytes("US-ASCII")).put(0.toByte) // odd size -> pad byte
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(44100).putInt(88200)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(2)
      .putShort(-32768)
    val w = WavCodec.decode(java.util.Arrays.copyOf(b.array(), b.position()))
    assert(w.sampleRate == 44100 && w.samples.toSeq == Seq((-32768).toShort))
  }

  test("wav: malformed input is rejected by name") {
    val good = WavCodec.encodePcm16(8000, 1, Array[Short](1, 2, 3))
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    val e1 = intercept[IllegalArgumentException](WavCodec.decode(badMagic))
    assert(e1.getMessage.contains("RIFF"))
    // fmt tag 2 (ADPCM) must be refused, not misread as PCM
    val adpcm = good.clone(); adpcm(20) = 2.toByte
    val e2 = intercept[IllegalArgumentException](WavCodec.decode(adpcm))
    assert(e2.getMessage.contains("PCM"))
    // a chunk whose declared size overruns the buffer must not be read
    val overrun = good.clone(); overrun(40) = 0x7f.toByte
    intercept[IllegalArgumentException](WavCodec.decode(overrun))
    // fmt declaring 0 channels: named rejection, not the mod-by-zero
    // ArithmeticException at the divisibility check (ADVICE r11)
    val noCh = good.clone(); noCh(22) = 0.toByte
    val e3 = intercept[IllegalArgumentException](WavCodec.decode(noCh))
    assert(e3.getMessage.contains("channels"))
    // fmt declaring rate 0: named rejection, not a downstream div-by-0
    val noRate = good.clone()
    noRate(24) = 0; noRate(25) = 0; noRate(26) = 0; noRate(27) = 0
    val e4 = intercept[IllegalArgumentException](WavCodec.decode(noRate))
    assert(e4.getMessage.contains("rate"))
  }

  test("wav mu-law: G.711 golden values and a real fmt-7 container round trip") {
    import graft.multimodal.WavCodec
    // ITU-T G.711 landmarks: 0x80 is the positive maximum +32124,
    // 0x00 its negative mirror -32124, 0xff/0x7f the two zeros
    assert(WavCodec.ulawToLinear(0x80) == 32124)
    assert(WavCodec.ulawToLinear(0x00) == -32124)
    assert(WavCodec.ulawToLinear(0xff) == 0)
    assert(WavCodec.ulawToLinear(0x7f) == 0)
    // segment boundary: 0xf0 -> ~= 0x0f: exp 0, mant 15 -> 8*15+132-132 = 120... sign 0
    assert(WavCodec.ulawToLinear(0xf0) == 120)
    val ulaw = Array.tabulate(251)(i => ((i * 37) % 256).toByte) // odd length -> pad path
    val w = WavCodec.decode(WavCodec.encodeUlaw(8000, 1, ulaw))
    assert(w.audioFormat == 7 && w.bitsPerSample == 8 && w.sampleRate == 8000)
    assert(w.samples.toSeq ==
      ulaw.toSeq.map(b => WavCodec.ulawToLinear(b & 0xff)))
    // an unsupported fmt tag must be named, not misread
    val bad = WavCodec.encodeUlaw(8000, 1, ulaw).clone()
    bad(20) = 2.toByte // ADPCM
    val e = intercept[IllegalArgumentException](WavCodec.decode(bad))
    assert(e.getMessage.contains("fmt tag"))
  }

  // -- PPM -----------------------------------------------------------

  test("ppm: encode -> decode round-trips dimensions and pixels exactly") {
    val rgb = Array.tabulate(5 * 3 * 3)(k => ((k * 31) % 256).toByte)
    val img = PpmCodec.decodeP6(PpmCodec.encodeP6(5, 3, rgb))
    assert(img.width == 5 && img.height == 3)
    assert(img.rgb.toSeq == rgb.toSeq)
  }

  test("ppm: third-party-style header with comments and flexible whitespace") {
    val pixels = Array[Byte](10, 20, 30, 40, 50, 60)
    val header = "P6 # a netpbm writer's comment\n# another\n 2\t1 # dims\n255\n"
    val bytes = header.getBytes("US-ASCII") ++ pixels
    val img = PpmCodec.decodeP6(bytes)
    assert(img.width == 2 && img.height == 1)
    assert(img.rgb.toSeq == pixels.toSeq)
  }

  test("ppm stream: walks concatenated variable-size frames exactly") {
    val f0 = PpmCodec.encodeP6(2, 1, Array[Byte](1, 2, 3, 4, 5, 6))
    val f1 = PpmCodec.encodeP6(1, 3, Array[Byte](9, 8, 7, 6, 5, 4, 3, 2, 1))
    val f2 = PpmCodec.encodeP6(1, 1, Array[Byte](-1, 0, 127))
    val frames = PpmCodec.decodeStream(f0 ++ f1 ++ f2)
    assert(frames.map(f => (f.width, f.height)) == Seq((2, 1), (1, 3), (1, 1)))
    assert(frames(1).rgb.toSeq == Seq[Byte](9, 8, 7, 6, 5, 4, 3, 2, 1))
    // a truncated final frame must fail, not silently shorten the stream
    val cut = (f0 ++ f1).dropRight(1)
    val e = intercept[IllegalArgumentException](PpmCodec.decodeStream(cut))
    assert(e.getMessage.contains("payload"))
    // single-image decode rejects trailing bytes (a second frame)
    val e2 = intercept[IllegalArgumentException](PpmCodec.decodeP6(f0 ++ f1))
    assert(e2.getMessage.contains("trailing"))
  }

  test("ppm: malformed input is rejected by name") {
    val e1 = intercept[IllegalArgumentException](
      PpmCodec.decodeP6("P5\n1 1\n255\n...".getBytes("US-ASCII")))
    assert(e1.getMessage.contains("magic"))
    val e2 = intercept[IllegalArgumentException](
      PpmCodec.decodeP6("P6\n2 2\n255\nxy".getBytes("US-ASCII")))
    assert(e2.getMessage.contains("payload"))
    val e3 = intercept[IllegalArgumentException](
      PpmCodec.decodeP6("P6\n1 1\n65535\n......".getBytes("US-ASCII")))
    assert(e3.getMessage.contains("maxval"))
    // hostile headers (ADVICE r11): non-numeric dims must be the named
    // rejection, not a NumberFormatException ...
    val e4 = intercept[IllegalArgumentException](
      PpmCodec.decodeP6("P6\nxx 1\n255\n...".getBytes("US-ASCII")))
    assert(e4.getMessage.contains("width"))
    // ... zero/negative dims are refused by name ...
    val e5 = intercept[IllegalArgumentException](
      PpmCodec.decodeP6("P6\n0 4\n255\n".getBytes("US-ASCII")))
    assert(e5.getMessage.contains("positive"))
    // ... and dims whose w*h*3 wraps Int (46341^2*3 > 2^32) must hit
    // the Long-math payload check, not NegativeArraySizeException
    val e6 = intercept[IllegalArgumentException](
      PpmCodec.decodeP6("P6\n46341 46341\n255\n...".getBytes("US-ASCII")))
    assert(e6.getMessage.contains("payload"))
  }

  // -- GIF / LZW -------------------------------------------------------

  test("gif: encode -> decode round-trips palette and pixels through real LZW") {
    import graft.multimodal.GifCodec
    val palette = Array.tabulate(8)(j => (j * 30 << 16) | (j * 20 << 8) | j)
    val indices = Array.tabulate(7 * 5)(i => ((i * 3) % 8).toByte)
    val g = GifCodec.decode(GifCodec.encode(7, 5, palette, indices))
    assert(g.width == 7 && g.height == 5)
    assert(g.palette.toSeq == palette.toSeq)
    assert(g.indices.toSeq == indices.toSeq)
  }

  test("gif: the canonical third-party 1x1 GIF decodes (89a, extension skip, missing EOI)") {
    import graft.multimodal.GifCodec
    // the ubiquitous 43-byte transparent-pixel GIF every web stack
    // ships — written by a third-party encoder, carries a GIF89a
    // graphic-control extension, and ends without an explicit
    // end-of-information code
    val bytes = java.util.Base64.getDecoder.decode(
      "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7")
    val g = GifCodec.decode(bytes)
    assert(g.width == 1 && g.height == 1)
    assert(g.palette.toSeq == Seq(0x000000, 0xffffff))
    assert(g.indices.toSeq == Seq(0.toByte))
  }

  test("gif lzw: KwKwK runs and 4096-entry dictionary resets round-trip exactly") {
    import graft.multimodal.GifCodec
    // a long same-byte run hits the code-defined-as-it-is-used case
    // on its second step and repeatedly afterwards
    val run = Array.fill(500)(3.toByte)
    val gRun = GifCodec.decode(GifCodec.encode(25, 20,
      Array.tabulate(4)(j => j), run))
    assert(gRun.indices.toSeq == run.toSeq)
    // 20k low-repetition pixels over 256 colors force the dictionary
    // past 4096 entries -> clear-code reset path, plus full width
    // growth 9..12 bits; values from a fixed LCG so the test is
    // deterministic
    var seed = 12345L
    val big = Array.tabulate(20000) { _ =>
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33) & 0xff).toByte
    }
    val palette256 = Array.tabulate(256)(j => j << 8)
    val gBig = GifCodec.decode(GifCodec.encode(200, 100, palette256, big))
    assert(gBig.indices.toSeq == big.toSeq)
  }

  test("gif: malformed input is rejected by name") {
    import graft.multimodal.GifCodec
    val good = GifCodec.encode(2, 2, Array.tabulate(4)(j => j),
      Array[Byte](0, 1, 2, 3))
    val badMagic = good.clone(); badMagic(3) = 'X'.toByte
    val e1 = intercept[IllegalArgumentException](GifCodec.decode(badMagic))
    assert(e1.getMessage.contains("magic"))
    // corrupt the LZW stream: a code far ahead of the dictionary
    val e2 = intercept[IllegalArgumentException] {
      GifCodec.lzwDecode(2, Array[Byte](0x04.toByte, 0x7f.toByte, 0x7f.toByte), 16)
    }
    assert(e2.getMessage.contains("LZW"))
    // truncated containers (ADVICE r11): every cut must throw the
    // named "truncated" rejection, never ArrayIndexOutOfBounds
    Seq(3, 8, 14, good.length - 3).foreach { cut =>
      val e = intercept[IllegalArgumentException](
        GifCodec.decode(good.take(cut)))
      assert(e.getMessage.contains("truncated") ||
        e.getMessage.contains("magic"),
        s"cut at $cut threw '${e.getMessage}'")
    }
    // a frame descriptor declaring 0 width is refused by name
    val zeroW = good.clone()
    // image descriptor starts after 6 magic + 7 screen + 12 palette;
    // width is its bytes 5-6
    val idOff = 6 + 7 + 12
    assert(zeroW(idOff) == 0x2c.toByte, "image descriptor offset moved")
    zeroW(idOff + 5) = 0; zeroW(idOff + 6) = 0
    val e3 = intercept[IllegalArgumentException](GifCodec.decode(zeroW))
    assert(e3.getMessage.contains("positive"))
  }

  test("codec properties: randomized round trips across the parameter space (seeded)") {
    import graft.multimodal.{GifCodec, PpmCodec, WavCodec}
    val rnd = new scala.util.Random(42) // fixed seed — deterministic
    (1 to 25).foreach { _ =>
      val ch = 1 + rnd.nextInt(3)
      val frames = 1 + rnd.nextInt(400)
      val samples = Array.fill(frames * ch)(rnd.nextInt(65536).toShort)
      val rate = 1 + rnd.nextInt(96000)
      val w = WavCodec.decode(WavCodec.encodePcm16(rate, ch, samples))
      assert(w.sampleRate == rate && w.channels == ch)
      assert(w.samples.toSeq == samples.toSeq)
    }
    (1 to 25).foreach { _ =>
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(40)
      val rgb = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      val img = PpmCodec.decodeP6(PpmCodec.encodeP6(w, h, rgb))
      assert(img.width == w && img.height == h && img.rgb.toSeq == rgb.toSeq)
    }
    (1 to 15).foreach { _ =>
      val bits = 1 + rnd.nextInt(8) // palette sizes 2..256 incl. the <4 floor
      val n = 1 << bits
      val palette = Array.tabulate(n)(_ => rnd.nextInt(1 << 24))
      val w = 1 + rnd.nextInt(60); val h = 1 + rnd.nextInt(60)
      val idx = Array.fill(w * h)(rnd.nextInt(n).toByte)
      val g = GifCodec.decode(GifCodec.encode(w, h, palette, idx))
      assert(g.width == w && g.height == h)
      assert(g.palette.toSeq == palette.toSeq && g.indices.toSeq == idx.toSeq)
    }
  }

  // -- decoded queries -----------------------------------------------

  test("wav_meta decodes what the container carries: doc 0 and doc 5 analytic pins") {
    val rows = Multimodal.wavMeta(spark, d).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 0: rate 8000, 1 channel, 256 frames -> 256 samples, 32 ms
    val r0 = rows(0L)
    assert(r0.getInt(1) == 8000 && r0.getInt(2) == 1)
    assert(r0.getInt(4) == 256 && r0.getLong(5) == 32L)
    // doc 5: 5%3=2 -> 44100, 2 channels, 261 frames -> 522 samples
    val r5 = rows(5L)
    assert(r5.getInt(1) == 44100 && r5.getInt(2) == 2)
    assert(r5.getInt(4) == 522 && r5.getLong(5) == 261L * 1000 / 44100)
  }

  test("image_grid covers every pixel exactly once: cell sums rebuild the whole-image sum") {
    val grid = Multimodal.imageGrid(spark, d)
    import org.apache.spark.sql.functions._
    val fromCells = grid.groupBy("doc_id")
      .agg(sum(col("sum_r") + col("sum_g") + col("sum_b")).as("tot"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // whole-image sum, analytically: sum over k of (id*31 + 7k) mod 256
    def whole(id: Long): Long = {
      val w = 8 + (id % 9).toInt; val h = 8 + (id % 7).toInt
      (0 until w * h * 3).map(k => (id * 31 + k.toLong * 7) % 256).sum
    }
    Seq(0L, 1L, 7L, 13L).foreach { id =>
      assert(fromCells(id) == whole(id), s"pixel coverage broken for doc $id")
    }
  }

  test("gif lzw: a STRICT decoder (reads until EOI, spec width growth) sees EOI at the written width") {
    // our production decoder stops at nPixels and never reads the
    // end-of-information code, so a round-trip cannot see an EOI
    // written one bit narrower than a spec decoder reads it (the
    // boundary case: the decoder's post-final-code dictionary add
    // lands exactly on 1 << width and grows the read width BEFORE
    // consuming EOI). This strict reader mirrors the spec exactly and
    // fails loudly if the encoder's EOI width ever desyncs again.
    import graft.multimodal.GifCodec
    def strictDecode(minCodeSize: Int, data: Array[Byte]): Array[Byte] = {
      val clear = 1 << minCodeSize
      val eoi = clear + 1
      var pos = 0; var bit = 0
      def get(width: Int): Int = {
        var out = 0; var i = 0
        while (i < width) {
          assert(pos < data.length, "strict decoder ran past the stream before EOI")
          out |= ((data(pos) >> bit) & 1) << i
          bit += 1; if (bit == 8) { bit = 0; pos += 1 }
          i += 1
        }
        out
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      var width = minCodeSize + 1
      var nextFree = eoi + 1
      val prefix = new Array[Int](4096); val suffix = new Array[Byte](4096)
      var prev = -1
      def expand(code: Int): Array[Byte] = {
        val sb = scala.collection.mutable.ArrayBuffer.empty[Byte]
        var c = code
        while (c >= clear) { sb += suffix(c); c = prefix(c) }
        (sb += c.toByte).reverse.toArray
      }
      var done = false
      while (!done) {
        val code = get(width)
        if (code == clear) { width = minCodeSize + 1; nextFree = eoi + 1; prev = -1 }
        else if (code == eoi) done = true
        else {
          val str =
            if (code < nextFree) expand(code)
            else { val p = expand(prev); p :+ p(0) } // KwKwK
          out ++= str
          if (prev != -1 && nextFree < 4096) {
            prefix(nextFree) = prev; suffix(nextFree) = str(0)
            nextFree += 1
            if (nextFree == (1 << width) && width < 12) width += 1
          }
          prev = code
        }
      }
      out.toArray
    }
    // deterministic boundary case: exactly 2 dictionary adds at
    // minCodeSize 2 leave nextFree == 8 == 1 << width at the final
    // code, so the strict decoder grows to 4 bits before reading EOI
    {
      val in = Array[Byte](0, 1, 2)
      val got = strictDecode(2, GifCodec.lzwEncode(2, in))
      assert(got.toSeq == in.toSeq, s"EOI width desync on [0,1,2]: got ${got.toSeq}")
    }
    val rnd = new scala.util.Random(2026)
    for (trial <- 1 to 300) {
      val mcs = 2 + rnd.nextInt(3)
      val n = 1 + rnd.nextInt(400)
      val alphabet = 1 << mcs
      val in = Array.fill(n)((rnd.nextInt(alphabet)).toByte)
      val enc = GifCodec.lzwEncode(mcs, in)
      val got = strictDecode(mcs, enc)
      assert(got.toSeq == in.toSeq, s"trial $trial mcs=$mcs n=$n")
    }
  }
}
