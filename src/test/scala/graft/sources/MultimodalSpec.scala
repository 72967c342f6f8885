package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: schemas, determinism, batch shapes — the parts
  * that stay when the stubbed decoders are swapped for real codecs.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val media = Multimodal.table(spark, 40).cache()

  test("media table: schema, determinism, kind split") {
    val rows = media.collect()
    assert(rows.length === 40)
    assert(rows.count(_.kind == "audio") === 20)
    assert(rows.count(_.kind == "video") === 20)
    val again = Multimodal.table(spark, 40).collect()
    assert(rows.zip(again).forall { case (a, b) =>
      a.bytes.sameElements(b.bytes) && a.meta == b.meta })
    // metadata is honest per kind
    assert(rows.filter(_.kind == "audio").forall(m => m.meta.sample_rate == 16000))
    assert(rows.filter(_.kind == "video").forall(m => m.meta.n_frames > 0 && m.meta.w == 320))
  }

  test("audio features: one row per (audio row x window), deterministic values") {
    val f = Multimodal.audioFeatures(media, windows = 8).collect()
    assert(f.length === 20 * 8)
    assert(f.forall(_.energy > 0.0))
    val again = Multimodal.audioFeatures(media, windows = 8).collect()
    assert(f.map(_.energy).sorted.sameElements(again.map(_.energy).sorted))
  }

  test("frame sampling honours stride and frame count metadata") {
    val frames = Multimodal.frameSample(media, everyN = 5).collect()
    val byId = frames.groupBy(_.media_id)
    val metas = media.collect().filter(_.kind == "video").map(m => m.media_id -> m.meta).toMap
    for ((id, fs) <- byId) {
      val expected = (0 until metas(id).n_frames by 5).size
      assert(fs.length === expected, id)
      assert(fs.forall(_.frame_bytes.length == 64))
    }
  }

  test("caption join plumbing runs against the documents table") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val j = Multimodal.captionJoin(media, docs)
    assert(j.count() === 40) // left join keeps all media rows
  }
}
