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

  test("q_multimodal_features emits sortable scalar columns on the fixture") {
    val df = Multimodal.qMultimodalFeatures(spark, sf("sf0.001"))
    assert(df.schema.fields.forall(f =>
      !f.dataType.typeName.matches("array|map|struct")))
    val rows = df.limit(5).collect()
    assert(rows.nonEmpty)
    // nibble_hist is always 16 comma-joined counts
    rows.foreach(r => assert(r.getAs[String]("nibble_hist").split(",", -1).length === 16))
  }
}
