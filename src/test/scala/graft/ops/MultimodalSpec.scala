package graft.ops

import graft.SparkSpec

/** Pins [[Multimodal.FakeDecode]] against independently-derived golden
  * values, so the driver-gate oracle (which re-implements the same byte
  * arithmetic in DuckDB) and the Scala codec can't drift together. */
class MultimodalSpec extends SparkSpec {

  private val codec = new Multimodal.FakeDecode

  test("FakeDecode golden values on hand-computed payloads") {
    // "AB" = bytes 0x41 0x42: both high-nibble 4; dims (2%640, 2%480).
    val ab = "AB".getBytes("UTF-8")
    assert(codec.dims(ab) === ((2, 2)))
    assert(codec.features(ab).toSeq ===
      Seq(0L, 0L, 0L, 0L, 2L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
    assert(codec.frameSample(ab).toSeq === Seq(0x41))

    // 200 bytes cycling 0..199: take(128) heads at offsets 0,16,..,112;
    // high-nibble histogram computed by an independent formula (how many
    // of 0..199 have value/16 == g — exact division count, not a mask).
    val cyc = Array.tabulate[Byte](200)(i => i.toByte)
    assert(codec.dims(cyc) === ((200, 200)))
    val hist = codec.features(cyc)
    (0 until 16).foreach { g =>
      val expected = (0 until 200).count(v => v / 16 == g)
      assert(hist(g) === expected.toLong, s"bin $g")
    }
    assert(codec.frameSample(cyc).toSeq ===
      Seq(0, 16, 32, 48, 64, 80, 96, 112))

    // High bytes are SIGNED in the frame sample (Scala Byte.toInt):
    // 0xFF leads a 17-byte payload -> samples [-1, then byte 16 = 0x01].
    val hi = Array.fill[Byte](17)(0xFF.toByte); hi(16) = 1
    assert(codec.frameSample(hi).toSeq === Seq(-1, 1))
    assert(codec.features(hi)(15) === 16L) // sixteen 0xFF bytes in bin 15
    assert(codec.features(hi)(0) === 1L)
  }

  test("ImageHeader: byte-arithmetic parse == the JDK's full decode") {
    // cross-validation against an INDEPENDENT implementation: ImageIO's
    // decoders know nothing of our offset arithmetic, so agreement on
    // every format and a spread of shapes pins the parser to the specs
    for (id <- 0L until 64L) {
      val bytes = Multimodal.ImageCodec.encode(id)
      val fmt = Multimodal.ImageCodec.fmtFor(id)
      val (w, h) = Multimodal.ImageCodec.dimsFor(id)
      val parsed = Multimodal.ImageHeader.parse(bytes)
      assert(parsed.isDefined, s"id=$id fmt=$fmt unparsed")
      val (sniffed, pw, ph, depth) = parsed.get
      assert(sniffed === fmt, s"id=$id")
      assert((pw, ph) === ((w, h)), s"id=$id fmt=$fmt")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert((img.getWidth, img.getHeight) === ((w, h)), s"decode id=$id")
      fmt match {
        case "png" | "jpg" => assert(depth === 8, s"id=$id fmt=$fmt d=$depth")
        case "bmp" => assert(depth === 24, s"id=$id d=$depth")
        case "gif" => assert(depth >= 1 && depth <= 8, s"id=$id d=$depth")
      }
    }
  }

  test("ImageHeader: garbage, truncation and missing SOF yield None") {
    assert(Multimodal.ImageHeader.parse("not an image".getBytes).isEmpty)
    assert(Multimodal.ImageHeader.parse(Array[Byte]()).isEmpty)
    val png = Multimodal.ImageCodec.encode(0L) // id 0 -> png
    assert(Multimodal.ImageHeader.parse(png.take(10)).isEmpty)
    // SOI then EOI: a JPEG with no frame header
    assert(Multimodal.ImageHeader.parse(
      Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte)).isEmpty)
  }

  test("ImageHeader: progressive (SOF2) and EXIF (APP1) JPEG variants are real and parse") {
    // jpg ids are 1, 5, 9, ... with variant = (id/4) % 3
    val prog = (0L until 200L).filter(id =>
      Multimodal.ImageCodec.fmtFor(id) == "jpg" &&
        Multimodal.ImageCodec.jpgVariantFor(id) == "progressive")
    val exif = (0L until 200L).filter(id =>
      Multimodal.ImageCodec.fmtFor(id) == "jpg" &&
        Multimodal.ImageCodec.jpgVariantFor(id) == "exif")
    assert(prog.nonEmpty && exif.nonEmpty)
    for (id <- prog.take(4)) {
      val b = Multimodal.ImageCodec.encode(id)
      // the frame header really is SOF2 (progressive DCT), not SOF0
      assert(b.sliding(2).exists(p =>
        (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xC2), s"id=$id no SOF2")
      assert(!b.sliding(2).exists(p =>
        (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xC0), s"id=$id has SOF0")
      val parsed = Multimodal.ImageHeader.parse(b)
      assert(parsed.map(t => (t._2, t._3)) ===
        Some(Multimodal.ImageCodec.dimsFor(id)), s"id=$id")
    }
    for (id <- exif.take(4)) {
      val b = Multimodal.ImageCodec.encode(id)
      // APP1/Exif spliced directly after SOI
      assert((b(2) & 0xFF) == 0xFF && (b(3) & 0xFF) == 0xE1, s"id=$id no APP1")
      assert(new String(b, 6, 4, "US-ASCII") === "Exif", s"id=$id")
      val parsed = Multimodal.ImageHeader.parse(b)
      assert(parsed.map(t => (t._2, t._3)) ===
        Some(Multimodal.ImageCodec.dimsFor(id)), s"id=$id")
    }
  }

  test("ExifMeta: both byte orders parse to construction values; non-Exif docs refuse") {
    var (sawII, sawMM) = (false, false)
    for (id <- 0L until 96L) {
      val b = Multimodal.ImageCodec.encode(id)
      val got = Multimodal.ExifMeta.parse(b)
      val isExif = Multimodal.ImageCodec.fmtFor(id) == "jpg" &&
        Multimodal.ImageCodec.jpgVariantFor(id) == "exif"
      if (!isExif) assert(got.isEmpty, s"id=$id must refuse")
      else {
        val (w, h) = Multimodal.ImageCodec.dimsFor(id)
        val big = Multimodal.ImageCodec.exifBigEndian(id)
        if (big) sawMM = true else sawII = true
        assert(got === Some((if (big) "MM" else "II", 3, w.toLong, h.toLong,
          Multimodal.ImageCodec.orientationFor(id))), s"id=$id")
      }
    }
    assert(sawII && sawMM, "fixture must exercise both byte orders")
  }

  test("ExifMeta: TIFF contract violations refuse") {
    val id = (0L until 96L).find(i =>
      Multimodal.ImageCodec.fmtFor(i) == "jpg" &&
        Multimodal.ImageCodec.jpgVariantFor(i) == "exif").get
    val b = Multimodal.ImageCodec.encode(id)
    assert(Multimodal.ExifMeta.parse(b).isDefined)
    // TIFF base = APP1 at 2 + marker(2) + len(2) + "Exif\0\0"(6) = 12
    def patched(mod: Array[Byte] => Unit): Array[Byte] = {
      val c = b.clone(); mod(c); c
    }
    // bad magic (42 -> 43) at either byte order's position
    val big = Multimodal.ImageCodec.exifBigEndian(id)
    assert(Multimodal.ExifMeta.parse(
      patched(c => c(if (big) 15 else 14) = 43)).isEmpty, "bad magic")
    // byte-order marker garbage
    assert(Multimodal.ExifMeta.parse(
      patched(c => c(12) = 'X')).isEmpty, "bad byte order")
    // orientation out of 1..8: the SHORT value is left-justified in the
    // 4-byte value field of entry 2 — TIFF base 12, IFD at 12+8=20,
    // entry 2 at 20+2+2·12 = 46, value field at 46+8 = 54..55
    assert(Multimodal.ExifMeta.parse(patched { c =>
      c(54) = 0; c(55) = 0
    }).isEmpty, "orientation 0 must refuse")
    // truncated mid-IFD
    assert(Multimodal.ExifMeta.parse(b.take(40)).isEmpty, "truncation")
  }

  test("WavHeader: non-PCM containers refuse — even a lying 16-bit ADPCM") {
    val floatId = (0L until 100L)
      .find(Multimodal.WavCodec.variantFor(_) == "float").get
    val adpcmId = (0L until 100L)
      .find(Multimodal.WavCodec.variantFor(_) == "adpcm").get
    val fb = Multimodal.WavCodec.encode(floatId)
    // the float container is REAL: javax.sound reads it as PCM_FLOAT, so
    // our None is canonical-PCM policy, not a malformed blob
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(fb))
    assert(ais.getFormat.getEncoding ===
      javax.sound.sampled.AudioFormat.Encoding.PCM_FLOAT)
    ais.close()
    assert(Multimodal.WavHeader.parse(fb).isEmpty, "float WAV must refuse")
    // the ADPCM container claims bits=16: without the fmt-TAG check the
    // parser would sum bytes that are not PCM samples
    val ab = Multimodal.WavCodec.encode(adpcmId)
    assert(Multimodal.WavHeader.parse(ab).isEmpty, "ADPCM WAV must refuse")
  }

  test("WavHeader: chunk walk == the JDK's javax.sound decode") {
    for (id <- 0L until 32L
         if Multimodal.WavCodec.variantFor(id) == "pcm") {
      val bytes = Multimodal.WavCodec.encode(id)
      val parsed = Multimodal.WavHeader.parse(bytes)
      assert(parsed.isDefined, s"id=$id unparsed")
      val (ch, rate, bits, n, durMs, sum) = parsed.get
      // independent pin: the JDK's own WAV reader agrees on every field
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val f = ais.getFormat
      assert(ch === f.getChannels, s"id=$id")
      assert(rate === f.getSampleRate.toInt, s"id=$id")
      assert(bits === f.getSampleSizeInBits, s"id=$id")
      assert(n === ais.getFrameLength, s"id=$id frames")
      assert(durMs === n * 1000L / rate)
      // content witness: re-sum the samples from the construction formula
      val expSum = (0 until Multimodal.WavCodec.nSamplesFor(id) * ch)
        .map(i => Multimodal.WavCodec.encodedSampleAt(id, i).toLong).sum
      assert(sum === expSum, s"id=$id sample sum")
      ais.close()
    }
  }

  test("WavHeader: garbage, truncation, and lying chunk sizes yield None") {
    assert(Multimodal.WavHeader.parse("RIFFnope".getBytes).isEmpty)
    assert(Multimodal.WavHeader.parse(Array[Byte]()).isEmpty)
    val wav = Multimodal.WavCodec.encode(1L)
    assert(Multimodal.WavHeader.parse(wav.take(30)).isEmpty)
    // corrupt the data chunk size to exceed the buffer: must refuse,
    // not read past the end
    val lying = wav.clone()
    lying(43) = 0x7F.toByte // big-endian-most byte of the LE32 data size
    assert(Multimodal.WavHeader.parse(lying).isEmpty)
  }

  test("WavHeader: a second data chunk refuses in BOTH parse and pcmSamples") {
    val wav = Multimodal.WavCodec.encode(1L)
    assert(Multimodal.WavHeader.parse(wav).isDefined)
    assert(Multimodal.WavHeader.pcmSamples(wav).isDefined)
    // well-formed container, two data chunks: parse used to SUM across
    // both while pcmSamples kept only the last and the per-chunk oracle
    // join emitted one row per chunk — refusal is the only answer all
    // three sides share (ADVICE r14)
    val extra = new Array[Byte](12)
    extra(0) = 'd'; extra(1) = 'a'; extra(2) = 't'; extra(3) = 'a'
    extra(4) = 4 // LE32 size = 4
    extra(8) = 1; extra(9) = 2; extra(10) = 3; extra(11) = 4
    val twoData = wav ++ extra
    assert(Multimodal.WavHeader.parse(twoData).isEmpty,
      "parse must refuse a second data chunk")
    assert(Multimodal.WavHeader.pcmSamples(twoData).isEmpty,
      "pcmSamples must refuse a second data chunk")
  }

  test("Mp4Header: box walk recovers construction fields exactly") {
    for (id <- 0L until 32L) {
      val bytes = Multimodal.Mp4Codec.encode(id)
      val parsed = Multimodal.Mp4Header.parse(bytes)
      assert(parsed.isDefined, s"id=$id unparsed")
      val (brand, ts, dur, durMs, mb, msum) = parsed.get
      assert(brand === Multimodal.Mp4Codec.brandFor(id))
      assert(ts === Multimodal.Mp4Codec.timescaleFor(id).toLong)
      assert(dur === Multimodal.Mp4Codec.durUnitsFor(id).toLong)
      assert(durMs === dur * 1000L / ts)
      val n = Multimodal.Mp4Codec.mdatLenFor(id)
      assert(mb === n.toLong)
      val expSum = (0 until n)
        .map(i => (Multimodal.Mp4Codec.mdatByteAt(id, i) & 0xFF).toLong).sum
      assert(msum === expSum, s"id=$id mdat sum")
    }
  }

  test("Mp4Header.sampleTable: demux recovers the construction sample table") {
    for (id <- 0L until 32L) {
      val b = Multimodal.Mp4Codec.encode(id)
      val got = Multimodal.Mp4Header.sampleTable(b)
      assert(got.isDefined, s"id=$id refused")
      val (off0, sizes) = got.get
      val n = Multimodal.Mp4Codec.nFramesFor(id)
      assert(sizes.toSeq ===
        (0 until n).map(Multimodal.Mp4Codec.frameSizeFor(id, _)), s"id=$id")
      // the first mdat payload byte must be the formula's byte 0
      assert((b(off0.toInt) & 0xFF) ===
        (Multimodal.Mp4Codec.mdatByteAt(id, 0) & 0xFF), s"id=$id off0")
    }
  }

  test("Mp4Header.sampleTable: contract violations refuse") {
    val b = Multimodal.Mp4Codec.encode(6L)
    def patched(mod: Array[Byte] => Unit): Array[Byte] = {
      val c = b.clone(); mod(c); c
    }
    // locate stsz: scan for the fourcc (construction puts exactly one)
    val hexTag = "stsz".getBytes("US-ASCII")
    val zp = b.indices.indexWhere(i => i + 4 <= b.length - 4 &&
      (0 until 4).forall(j => b(i + 4 + j) == hexTag(j)))
    assert(zp > 0)
    // lying sample count (box length no longer matches 20 + 4n)
    assert(Multimodal.Mp4Header.sampleTable(
      patched(c => c(zp + 19) = (c(zp + 19) + 1).toByte)).isEmpty,
      "count/box-length mismatch must refuse")
    // stsz version/flags nonzero
    assert(Multimodal.Mp4Header.sampleTable(
      patched(c => c(zp + 8) = 1)).isEmpty, "stsz v1 must refuse")
    // a sample size of zero breaks the [1, 4096] bound
    assert(Multimodal.Mp4Header.sampleTable(patched { c =>
      c(zp + 20) = 0; c(zp + 21) = 0; c(zp + 22) = 0; c(zp + 23) = 0
    }).isEmpty, "zero-size sample must refuse")
    // sizes no longer tile mdat exactly (grow one sample by 1)
    assert(Multimodal.Mp4Header.sampleTable(
      patched(c => c(zp + 23) = (c(zp + 23) + 1).toByte)).isEmpty,
      "non-tiling sizes must refuse")
    // malformed box DEEP in the tree (inside stbl): the full validating
    // walk must refuse even though the box is not on the demux path —
    // corrupt the stco header's size to overrun stbl
    val cp = b.indices.indexWhere(i => i + 4 <= b.length - 4 &&
      b(i + 4) == 's' && b(i + 5) == 't' && b(i + 6) == 'c' && b(i + 7) == 'o')
    assert(cp > 0)
    assert(Multimodal.Mp4Header.sampleTable(
      patched(c => c(cp + 3) = 0x7F.toByte)).isEmpty,
      "overrunning nested box must refuse")
  }

  test("Mp4Header.sampleTable: pathological container nesting cannot overflow the stack") {
    // 100k-deep moov-inside-moov chain: each level is an 8-byte header
    // declaring size = everything remaining — legal per the walk's
    // size/bounds rules, so a recursive DFS would recurse len/8 deep
    val depth = 100000
    val total = 16 + 8 * depth
    val bb = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.putInt(16); bb.put("ftyp".getBytes("US-ASCII"))
    bb.put("isom".getBytes("US-ASCII")); bb.putInt(0)
    var remaining = 8 * depth
    while (remaining > 0) {
      bb.putInt(remaining); bb.put("moov".getBytes("US-ASCII"))
      remaining -= 8
    }
    // must terminate without StackOverflowError and refuse (no sample
    // table anywhere in the tree)
    assert(Multimodal.Mp4Header.sampleTable(bb.array()).isEmpty)
  }

  test("q_video_frames: strided demux == construction formula") {
    val rows = Multimodal.qVideoFrames(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, f) = (r.getLong(0), r.getInt(1))
      assert(f % 3 === 0)
      val sizes = (0 until Multimodal.Mp4Codec.encNFramesFor(id))
        .map(Multimodal.Mp4Codec.encFrameSizeFor(id, _))
      val base = sizes.take(f).sum // offset within the mdat payload
      val sz = sizes(f)
      assert(r.getInt(2) === sz, s"id=$id f=$f size")
      val want = (0 until sz)
        .map(i => (Multimodal.Mp4Codec.encMdatByteAt(id, base + i) & 0xFF).toLong)
      assert(r.getLong(3) === want.sum, s"id=$id f=$f sum")
      assert(r.getInt(4) === want.head.toInt, s"id=$id f=$f first")
      assert(r.getInt(5) === want.last.toInt, s"id=$id f=$f last")
    }
    // every doc contributes ceil(n/3) sampled frames
    rows.groupBy(_.getLong(0)).foreach { case (id, rs) =>
      val n = Multimodal.Mp4Codec.encNFramesFor(id)
      assert(rs.length === (n + 2) / 3, s"id=$id frames=${rs.length}")
    }
  }

  test("Mp4Header: garbage, truncation, lying box sizes yield None") {
    assert(Multimodal.Mp4Header.parse("not a video".getBytes).isEmpty)
    assert(Multimodal.Mp4Header.parse(Array[Byte]()).isEmpty)
    val mp4 = Multimodal.Mp4Codec.encode(2L)
    assert(Multimodal.Mp4Header.parse(mp4.take(40)).isEmpty)
    // corrupt the moov size to exceed the buffer: refuse, don't overrun
    val lying = mp4.clone()
    lying(24) = 0x7F.toByte // BE-most byte of the moov size
    assert(Multimodal.Mp4Header.parse(lying).isEmpty)
  }

  test("crafted adversarial containers: overflow sizes and boundary runs yield None") {
    // WAV whose first chunk size is a huge LE32 (~2^31): Int arithmetic
    // would wrap past the bounds guard and index negatively
    val wav = Multimodal.WavCodec.encode(1L)
    val hugeChunk = wav.clone()
    hugeChunk(16) = 0xF8.toByte; hugeChunk(17) = 0xFF.toByte
    hugeChunk(18) = 0xFF.toByte; hugeChunk(19) = 0x7F.toByte
    assert(Multimodal.WavHeader.parse(hugeChunk).isEmpty)
    // JPEG that ends in a run of 0xFF fill bytes: the fill-skip must not
    // read one past the buffer
    assert(Multimodal.ImageHeader.parse(
      Array(0xFF, 0xD8, 0xFF, 0xFF, 0xFF, 0xFF).map(_.toByte)).isEmpty)
    // MP4 whose moov ends in an 8-byte box TAGGED mvhd: too small for the
    // v0 field extent — must refuse, not read the next box's bytes
    val bb = java.nio.ByteBuffer.allocate(24 + 16 + 9)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.putInt(24).put("ftyp".getBytes).put("isom".getBytes)
      .putInt(0x200).put("isom".getBytes).put("mp41".getBytes)
    bb.putInt(16).put("moov".getBytes).putInt(8).put("mvhd".getBytes)
    bb.putInt(9).put("mdat".getBytes).put(7.toByte)
    assert(Multimodal.Mp4Header.parse(bb.array()).isEmpty)
  }

  test("fuzz: no parser ever throws on arbitrary bytes (malformed files must not kill a job)") {
    // at 100 TB some containers WILL be truncated/corrupt; the audit
    // pass must classify them (None), never crash the task. Seeded
    // pseudo-random buffers, plus adversarial prefixes that enter each
    // parser's format branch with garbage bodies.
    val prefixes = Seq(
      Array[Byte](),
      Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte), // PNG sig
      "GIF89a".getBytes, "BM".getBytes, Array(0xFF, 0xD8).map(_.toByte), // JPEG SOI
      "RIFF1234WAVE".getBytes, Array[Byte](0, 0, 0, 16) ++ "ftyp".getBytes)
    for (seed <- 0 until 200; pre <- prefixes) {
      val body = Array.tabulate[Byte](1 + (seed * 7) % 300)(i =>
        Cdc.splitmix64(seed * 1000L + i).toByte)
      val b = pre ++ body
      // must return (possibly None) without throwing
      Multimodal.ImageHeader.parse(b)
      Multimodal.WavHeader.parse(b)
      Multimodal.Mp4Header.parse(b)
      Cdc.chunks(b) // the chunker too: total, no crash, full coverage
      // r18: the fingerprint kernels share the parsers' refusal paths
      // but add grid/anchor arithmetic of their own — same contract
      Multimodal.BmpPixels.dhashChunks(b)
      Multimodal.audioFpChunks(b)
      Multimodal.videoFpChunks(b)
    }
  }

  test("q_multimodal_dims: sniffed == declared, dims match construction") {
    val rows = Multimodal.qMultimodalDims(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(2) === r.getString(1), s"sniff mismatch id=$id")
      assert(r.getInt(3) === 1 + (id % 13).toInt, s"width id=$id")
      assert(r.getInt(4) === 1 + (id % 7).toInt, s"height id=$id")
      assert(r.getInt(6) > 0, s"n_bytes id=$id")
    }
  }

  test("BmpPixels: JDK decode stats == independent recompute from the raster formula") {
    // pixels derive from doc_id alone (ImageCodec.encode's setRGB loop),
    // so the full decode path — write through ImageIO's BMP encoder,
    // read back through its decoder, fold stats — is pinned against a
    // straight recompute that never touches a container byte
    val bmpIds = (0L until 64L).filter(Multimodal.ImageCodec.fmtFor(_) == "bmp")
    assert(bmpIds.nonEmpty)
    bmpIds.foreach { id =>
      val got = Multimodal.BmpPixels.stats(Multimodal.ImageCodec.encode(id))
      val (w, h) = Multimodal.ImageCodec.dimsFor(id)
      var sr = 0L; var sg = 0L; var sb = 0L; var ck = 0L; var lum = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val v = ((id * 2654435761L + x * 131 + y * 31) & 0xFFFFFF).toInt
        val rr = (v >> 16) & 0xFF; val gg = (v >> 8) & 0xFF; val bb = v & 0xFF
        sr += rr; sg += gg; sb += bb
        ck += (y.toLong * w + x + 1) * v
        lum = math.max(lum, (rr + gg + bb).toLong)
      }
      assert(got === Some((w, h, sr, sg, sb, lum, ck)), s"id=$id")
    }
  }

  test("BmpPixels.thumb: nearest-neighbor 4x4 == raster formula at the sampled positions") {
    val bmpIds = (0L until 64L).filter(Multimodal.ImageCodec.fmtFor(_) == "bmp")
    bmpIds.foreach { id =>
      val got = Multimodal.BmpPixels.thumb(Multimodal.ImageCodec.encode(id))
      val (w, h) = Multimodal.ImageCodec.dimsFor(id)
      var sr = 0L; var sg = 0L; var sb = 0L; var ck = 0L
      for (y <- 0 until 4; x <- 0 until 4) {
        val (sx, sy) = (x * w / 4, y * h / 4)
        val v = ((id * 2654435761L + sx * 131 + sy * 31) & 0xFFFFFF).toInt
        sr += (v >> 16) & 0xFF; sg += (v >> 8) & 0xFF; sb += v & 0xFF
        ck += (y.toLong * 4 + x + 1) * v
      }
      assert(got === Some((w, h, sr, sg, sb, ck)), s"id=$id")
    }
  }

  test("BmpPixels.accepts refuses what the JDK decoder would reject or the oracle can't mirror") {
    val good = Multimodal.ImageCodec.encode(3L) // id 3 -> bmp
    assert(Multimodal.BmpPixels.accepts(good))
    def patched(mod: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); mod(b); b
    }
    // top-down (negative height): the JDK's BMPImageReader throws
    // "Invalid width/height for BI_RGB" on these, so the rule refuses
    val h = (good(22) & 0xFF) | ((good(23) & 0xFF) << 8)
    val neg = -h
    assert(!Multimodal.BmpPixels.accepts(patched { b =>
      b(22) = (neg & 0xFF).toByte; b(23) = ((neg >> 8) & 0xFF).toByte
      b(24) = ((neg >> 16) & 0xFF).toByte; b(25) = ((neg >> 24) & 0xFF).toByte
    }), "top-down BMP must be refused")
    // raw height >= 2^31 must be refused via the SIGNED reinterpretation,
    // not misread as a huge positive dimension
    assert(!Multimodal.BmpPixels.accepts(patched { b =>
      b(25) = 0x80.toByte
    }), ">=2^31 raw height must be refused")
    // 32-bit pixels: not the 24-bit BI_RGB walk the oracle mirrors
    assert(!Multimodal.BmpPixels.accepts(patched(b => b(28) = 32)),
      "non-24-bit BMP must be refused")
    // RLE compression: pixel array is not a plain raster
    assert(!Multimodal.BmpPixels.accepts(patched(b => b(30) = 1)),
      "compressed BMP must be refused")
    // pixel array extending past the buffer
    assert(!Multimodal.BmpPixels.accepts(good.dropRight(1)),
      "truncated pixel array must be refused")
    // oversized dims (bounded-walk guard)
    assert(!Multimodal.BmpPixels.accepts(patched(b => b(18) = 65)),
      "width > 64 must be refused")
  }

  test("pcmSamples: decode == sample formula; refusals track parse()") {
    (0L until 33L).foreach { id =>
      val b = Multimodal.WavCodec.encode(id)
      val got = Multimodal.WavHeader.pcmSamples(b)
      if (Multimodal.WavCodec.variantFor(id) != "pcm")
        assert(got.isEmpty, s"non-PCM id=$id must refuse")
      else {
        val ch = Multimodal.WavCodec.channelsFor(id)
        val n = Multimodal.WavCodec.nSamplesFor(id)
        val want = Array.tabulate(n * ch)(i => Multimodal.WavCodec.encodedSampleAt(id, i))
        assert(got.map(_._1) === Some(ch), s"channels id=$id")
        assert(got.get._2.toSeq === want.toSeq, s"samples id=$id")
      }
      // refusal parity with the metadata walk, every id
      assert(got.isDefined === Multimodal.WavHeader.parse(b).isDefined)
    }
  }

  test("q_audio_features: per-channel folds == independent recompute from the sample formula") {
    val rows = Multimodal.qAudioFeatures(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, c) = (r.getLong(0), r.getInt(1))
      val ch = Multimodal.WavCodec.channelsFor(id)
      val n = Multimodal.WavCodec.nSamplesFor(id)
      assert(Multimodal.WavCodec.variantFor(id) === "pcm", s"id=$id leaked")
      var peak = 0L; var zc = 0L; var sumAbs = 0L; var energy = 0L
      var prev = false
      for (t <- 0 until n) {
        val x = Multimodal.WavCodec.encodedSampleAt(id, t * ch + c).toLong
        peak = math.max(peak, math.abs(x))
        sumAbs += math.abs(x); energy += x * x
        val nn = x >= 0
        if (t > 0 && nn != prev) zc += 1
        prev = nn
      }
      assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6)) === ((n.toLong, peak, zc, sumAbs, energy)), s"id=$id c=$c")
    }
    // every PCM doc contributes exactly `channels` rows
    val perDoc = rows.groupBy(_.getLong(0)).map { case (id, rs) => (id, rs.length) }
    perDoc.foreach { case (id, k) =>
      assert(k === Multimodal.WavCodec.channelsFor(id), s"id=$id rows=$k")
    }
  }

  test("q_multimodal_features emits sortable scalar columns on the fixture") {
    val df = Multimodal.qMultimodalFeatures(spark, sf("sf0.001"))
    assert(df.schema.fields.forall(f =>
      !f.dataType.typeName.matches("array|map|struct")))
    val rows = df.limit(5).collect()
    assert(rows.nonEmpty)
    // nibble_hist is always 16 comma-joined counts
    rows.foreach(r => assert(r.getAs[String]("nibble_hist").split(",", -1).length === 16))
  }

  test("dhashChunks: 9x8 grid == raster recompute; sub-grid widths refused") {
    val bmpIds = (0L until 500L)
      .filter(id => Multimodal.ImageCodec.fmtFor(id) == "bmp")
      .filter(id => Multimodal.ImageCodec.phashTwinBase(id).isEmpty)
    assert(bmpIds.nonEmpty)
    bmpIds.foreach { id =>
      val got = Multimodal.BmpPixels.dhashChunks(Multimodal.ImageCodec.encode(id))
      val (w, h) = Multimodal.ImageCodec.dimsFor(id)
      if (w < 9) assert(got.isEmpty, s"id=$id w=$w must refuse")
      else {
        var bits = 0L
        for (y <- 0 until 8; x <- 0 until 8) {
          def gray(gx: Int): Int = {
            val v = ((id * 2654435761L + (gx * w / 9) * 131 +
              (y * h / 8) * 31) & 0xFFFFFF).toInt
            ((v >> 16) & 0xFF) + ((v >> 8) & 0xFF) + (v & 0xFF)
          }
          if (gray(x + 1) > gray(x)) bits |= 1L << (y * 8 + x)
        }
        assert(got === Some(((bits & 0xFFFF).toInt,
          ((bits >>> 16) & 0xFFFF).toInt, ((bits >>> 32) & 0xFFFF).toInt,
          ((bits >>> 48) & 0xFFFF).toInt, w.toLong * h)), s"id=$id")
      }
    }
  }

  test("q_image_phash finds every planted twin pair within hamming 3") {
    import org.apache.spark.sql.functions.col
    val dir = sf("sf0.01")
    val ids = graft.Tables(spark, dir, "documents")
      .select(col("doc_id")).collect().map(_.getLong(0))
    val expected = ids.flatMap(id =>
      Multimodal.ImageCodec.phashTwinBase(id).map(b => (b, id))).toSet
    assert(expected.nonEmpty, "fixture must contain planted image twins")
    val out = Multimodal.qImagePhash(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    expected.foreach { case (a, b) =>
      val h = out.get((a, b))
      assert(h.isDefined, s"planted twin pair ($a,$b) missing from output")
      assert(h.get <= 3, s"planted twin pair ($a,$b) hamming ${h.get} > 3")
    }
  }

  test("q_video_fingerprint finds every planted re-muxed twin within hamming 2") {
    import org.apache.spark.sql.functions.col
    val dir = sf("sf0.01")
    val ids = graft.Tables(spark, dir, "documents")
      .select(col("doc_id")).collect().map(_.getLong(0))
    val expected = ids.flatMap(id =>
      Multimodal.Mp4Codec.fpTwinBase(id).map(b => (b, id))).toSet
    assert(expected.size >= 15, s"only ${expected.size} planted video twins")
    val out = Multimodal.qVideoFingerprint(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    expected.foreach { case (a, b) =>
      val h = out.get((a, b))
      assert(h.isDefined, s"planted twin pair ($a,$b) missing from output")
      assert(h.get <= 2, s"planted twin pair ($a,$b) hamming ${h.get} > 2")
    }
    // a twin's moov metadata stays its OWN (re-mux semantics): duration
    // differs from the base even though the fingerprint matches
    val (a0, b0) = expected.head
    assert(Multimodal.Mp4Codec.durUnitsFor(a0) !=
      Multimodal.Mp4Codec.durUnitsFor(b0) ||
      Multimodal.Mp4Codec.timescaleFor(a0) !=
        Multimodal.Mp4Codec.timescaleFor(b0) ||
      Multimodal.Mp4Codec.brandFor(a0) != Multimodal.Mp4Codec.brandFor(b0))
  }

  test("q_phash_clusters: clusters are the pair closure, survivor = min doc") {
    val dir = sf("sf0.01")
    val pairs = Multimodal.qImagePhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val rows = Multimodal.qPhashClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.nonEmpty)
    // brute-force union-find closure of the pair set == the CC labeling
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expect = members.map(d => d -> find(d)).toMap
    assert(rows.length == members.length,
      s"${rows.length} rows vs ${members.length} pair participants")
    rows.foreach { case (doc, label, csize, surv) =>
      assert(label == expect(doc), s"doc $doc: label $label != closure")
      assert(csize == expect.values.count(_ == label).toLong, s"doc $doc size")
      assert((surv == 1) == (doc == label), s"doc $doc survivor flag")
    }
  }

  test("q_audio_fingerprint finds every planted twin pair within hamming 2") {
    import org.apache.spark.sql.functions.col
    val dir = sf("sf0.01")
    val ids = graft.Tables(spark, dir, "documents")
      .select(col("doc_id")).collect().map(_.getLong(0))
    val expected = ids.flatMap(id =>
      Multimodal.WavCodec.fpTwinBase(id).map(b => (b, id))).toSet
    assert(expected.size >= 15, s"only ${expected.size} planted audio twins")
    val out = Multimodal.qAudioFingerprint(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    expected.foreach { case (a, b) =>
      val h = out.get((a, b))
      assert(h.isDefined, s"planted twin pair ($a,$b) missing from output")
      assert(h.get <= 2, s"planted twin pair ($a,$b) hamming ${h.get} > 2")
    }
  }

  test("q_phash_incremental: batch-vs-index probe finds straddling twins") {
    val dir = sf("sf0.01")
    // recompute the cut from the HASHED set, exactly as the query does
    val ids = graft.Tables(spark, dir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"))
      .collect().map(_.getLong(0))
    val hashed = ids.filter(id =>
      Multimodal.BmpPixels.dhashChunks(Multimodal.ImageCodec.encode(id)).isDefined)
    val cut = hashed.max * 4 / 5
    val rows = Multimodal.qPhashIncremental(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(rows.nonEmpty, "no batch-vs-index collisions at all")
    rows.foreach { case ((b, i), h) =>
      assert(b > cut && i <= cut, s"pair ($b,$i) violates the batch/index cut")
      assert(h <= 3, s"pair ($b,$i) hamming $h > 3")
    }
    // every planted twin that STRADDLES the cut (twin arrives in the
    // batch, base already indexed) must surface — the production case
    val straddling = ids.flatMap(id =>
      Multimodal.ImageCodec.phashTwinBase(id).map(b => (id, b)))
      .filter { case (t, b) => t > cut && b <= cut }
    assert(straddling.nonEmpty, "fixture has no cut-straddling image twins")
    straddling.foreach { case (t, b) =>
      assert(rows.contains((t, b)), s"straddling twin ($t,$b) missed")
    }
  }

  test("q_media_keepbest: closure per modality, survivor = max quality") {
    val dir = sf("sf0.01")
    val rows = Multimodal.qMediaKeepbest(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5)))
    assert(rows.nonEmpty)
    assert(rows.exists(_._1 == "audio") && rows.exists(_._1 == "video"),
      "both modalities must contribute clusters")
    for (mod <- Seq("audio", "video")) {
      val pairs = (if (mod == "audio") Multimodal.qAudioFingerprint(spark, dir)
        else Multimodal.qVideoFingerprint(spark, dir)).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // brute-force union-find closure (the q_phash_clusters spec idiom)
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      val expect = members.map(d => d -> find(d)).toMap
      // independent quality recompute straight from the codecs
      def quality(id: Long): Long =
        if (mod == "audio") {
          val (ch, xs) =
            Multimodal.WavHeader.pcmSamples(Multimodal.WavCodec.encode(id)).get
          (xs.length / ch).toLong
        } else
          Multimodal.Mp4Header.sampleTable(Multimodal.Mp4Codec.encode(id))
            .get._2.length.toLong
      val mrows = rows.filter(_._1 == mod)
      assert(mrows.length == members.length,
        s"$mod: ${mrows.length} rows vs ${members.length} pair participants")
      mrows.foreach { case (_, doc, label, csize, q, best) =>
        assert(label == expect(doc), s"$mod doc $doc: label != closure")
        assert(csize == expect.values.count(_ == label).toLong,
          s"$mod doc $doc csize")
        assert(q == quality(doc), s"$mod doc $doc quality $q")
        val cluster = members.filter(expect(_) == label)
        val want = cluster.map(d => (-quality(d), d)).min._2
        assert((best == 1) == (doc == want), s"$mod doc $doc survivor flag")
      }
    }
  }

  test("q_stream_phash: streamed probe == batch probe, real micro-batches") {
    val dir = sf("sf0.01")
    val batch = Multimodal.qPhashIncremental(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val streamed = Multimodal.qStreamPhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(streamed.nonEmpty)
    assert(streamed.toSeq === batch.toSeq,
      "streaming probe drifted from the batch probe")
    // the staged source really is multi-file → multi-micro-batch
    val files = new java.io.File(Multimodal.phashBatchDir(spark, dir))
      .listFiles().map(_.getName).filter(_.endsWith(".parquet"))
    assert(files.length === 3, s"staged probe files: ${files.toSeq}")
  }

  test("q_image_keepbest: phash closure, survivor = max W*H then min id") {
    val dir = sf("sf0.01")
    val pairs = Multimodal.qImagePhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expect = members.map(d => d -> find(d)).toMap
    // independent quality recompute straight from the codec's dims
    def quality(id: Long): Long = {
      val (w, h) = Multimodal.ImageCodec.dimsFor(id)
      w.toLong * h
    }
    val rows = Multimodal.qImageKeepbest(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    assert(rows.length == members.length,
      s"${rows.length} rows vs ${members.length} pair participants")
    rows.foreach { case (doc, label, csize, q, best) =>
      assert(label == expect(doc), s"doc $doc: label != closure")
      assert(csize == expect.values.count(_ == label).toLong, s"doc $doc csize")
      assert(q == quality(doc), s"doc $doc quality $q != ${quality(doc)}")
      val cluster = members.filter(expect(_) == label)
      val want = cluster.map(d => (-quality(d), d)).min._2
      assert((best == 1) == (doc == want), s"doc $doc survivor flag")
    }
    // a planted one-pixel twin keeps its base's dims, so its cluster
    // decides by the doc_id tie-break — the policy's tie arm is real
    val ids = graft.Tables(spark, dir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"))
      .collect().map(_.getLong(0))
    val twinned = ids.flatMap(id =>
      Multimodal.ImageCodec.phashTwinBase(id).map(b => (b, id)))
      .filter { case (b, t) => expect.contains(b) && expect.contains(t) }
    assert(twinned.nonEmpty, "no planted twin landed in the closure")
  }

  test("q_cc_incremental: star-merge labels == full-closure labels") {
    val dir = sf("sf0.01")
    val full = Multimodal.qPhashClusters(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val rows = Multimodal.qCcIncremental(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.nonEmpty)
    // the contracted-batch merge against the history labeling must be
    // indistinguishable from the full rerun — same node set, same
    // labels, same sizes (the incremental-maintenance contract)
    assert(rows.length == full.size,
      s"${rows.length} rows vs ${full.size} full-closure participants")
    val ids = graft.Tables(spark, dir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"))
      .collect().map(_.getLong(0))
    val hashed = ids.filter(id => Multimodal.BmpPixels
      .dhashChunks(Multimodal.ImageCodec.encode(id)).isDefined)
    val cut = hashed.max * 4 / 5
    rows.foreach { case (doc, label, csize, isNew) =>
      val (wantLabel, wantSize) = full(doc)
      assert(label == wantLabel, s"doc $doc: label $label != $wantLabel")
      assert(csize == wantSize, s"doc $doc: csize $csize != $wantSize")
      assert((isNew == 1) == (doc > cut), s"doc $doc is_new flag")
    }
    // the batch side must actually contribute (cut-straddling planted
    // twins exist at this sf — the production ingest case)
    assert(rows.exists(_._4 == 1), "no batch-side cluster member at all")
    // the DISTRIBUTED closure arm (cap 0 forces the star-contraction
    // loop) must be value-identical to the driver union-find arm
    spark.conf.set("spark.graft.ccinc.driverMaxEdges", "0")
    try {
      val dist = Multimodal.qCcIncremental(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      assert(dist.toSeq === rows.toSeq, "distributed arm drifted")
    } finally spark.conf.unset("spark.graft.ccinc.driverMaxEdges")
  }
}
