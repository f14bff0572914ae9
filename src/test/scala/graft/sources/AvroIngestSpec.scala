package graft.sources

import graft.SparkSpec

/** Avro container round-trip through the hand-rolled writer/reader pair
  * (the image has Avro core but no spark-avro connector — see the
  * [[AvroIngest]] scaladoc). The q_ingest_avro gate proves corpus-level
  * fidelity against the original parquet; this spec pins the container
  * mechanics: framing readable by the plain Avro API, multi-container
  * distribution, and content equality row-by-row. */
class AvroIngestSpec extends SparkSpec {

  test("documents round-trip byte-identically through Avro containers") {
    val dir = sf("sf0.001")
    val orig = graft.Tables(spark, dir, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val q = AvroIngest.qIngestAvro(spark, dir) // forces the staging write
    assert(q.count() > 0)
    // decode the same containers directly and compare every row
    val back = graft.SparkEntry.queries("q_ingest_avro")(spark, dir)
    assert(back.collect().nonEmpty)
    val rows = AvroIngest.readAvro(spark, AvroIngest.avroCopy(spark, dir))
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(rows.length === orig.length)
    assert(rows === orig, "Avro round-trip altered content")
  }

  test("containers are standard Avro: plain DataFileStream reads them") {
    val dir = sf("sf0.001")
    val stage = AvroIngest.avroCopy(spark, dir)
    val files = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".avro")).sortBy(_.getName)
    assert(files.length === 8, "expected 8 bounded container shards")
    var total = 0L
    files.foreach { f =>
      val rdr = new org.apache.avro.file.DataFileStream(
        new java.io.FileInputStream(f),
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      // writer schema travels in the header — name + fields as declared
      assert(rdr.getSchema.getName === "Document")
      assert(rdr.getSchema.getFields.size() === 5)
      while (rdr.hasNext) { rdr.next(); total += 1 }
      rdr.close()
    }
    val n = graft.Tables(spark, dir, "documents").count()
    assert(total === n, s"container rows $total != documents $n")
  }
}
