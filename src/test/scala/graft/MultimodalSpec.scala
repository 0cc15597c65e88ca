package graft

import org.apache.spark.sql.functions._

import graft.llm.Multimodal

/** The multimodal plumbing is stub-decoded (no codecs in this
  * container), so the tests pin what IS real: the binary header
  * round-trip, the agreement between the Catalyst decode path and the
  * partition-wise decoder slot, and the frame-sampling arithmetic.
  */
class MultimodalSpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.001"
  private lazy val media =
    Multimodal.withFakeMedia(Tables.documents(spark, Sf).limit(50), "doc_id", "text")

  test("binary media column: header + payload, byte length checks out") {
    val r = media.select(col("doc_id"), length(col("media")).as("blen"), col("n_chars"))
      .collect()
    assert(r.nonEmpty)
    r.foreach(row => assert(row.getInt(1) == row.getLong(2) + Multimodal.HeaderBytes))
  }

  test("Catalyst stub decode inverts the header exactly") {
    val decoded = Multimodal.decodeStub(media, "media")
      .select("doc_id", "n_chars", "meta.width", "meta.height", "meta.n_bytes").collect()
    decoded.foreach { r =>
      val (id, n) = (r.getLong(0), r.getLong(1))
      assert(r.getInt(2) == 16 + (n % 64).toInt)
      assert(r.getInt(3) == 16 + (id % 48).toInt)
      assert(r.getLong(4) == n)
    }
  }

  test("partition-wise decoder slot agrees with the Catalyst decode path") {
    val viaSql = Multimodal.decodeStub(media, "media")
      .select("doc_id", "meta.width", "meta.height").collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2)))).toMap
    val viaPartitions = Multimodal.mapMediaPartitions(media, "doc_id", "media")()
      .collect().map(r => (r.id, (r.width, r.height))).toMap
    assert(viaSql == viaPartitions)
  }

  test("frame sampling keeps every Nth fixed-size slice, count arithmetic holds") {
    val framed = Multimodal.sampleFrames(media, "media", frameBytes = 32, every = 2)
      .select("n_chars", "n_frames_total", "n_frames_kept", "frames").collect()
    framed.foreach { r =>
      val n = r.getLong(0)
      val total = r.getInt(1)
      val kept = r.getInt(2)
      assert(total == math.ceil(n / 32.0).toInt)
      assert(kept == (total + 1) / 2)
      val frames = r.getSeq[Array[Byte]](3)
      assert(frames.length == kept)
      // all but possibly the last kept frame are full-size
      frames.dropRight(1).foreach(f => assert(f.length == 32))
    }
  }
}
