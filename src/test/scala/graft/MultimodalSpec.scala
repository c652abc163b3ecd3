package graft

import graft.operators.Multimodal
import graft.operators.Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary ingest preserves payload bytes and metadata") {
    val docs = Seq((1L, "hello"), (2L, "wörld")).toDF("doc_id", "text")
    val media = documentsAsMedia(docs).collect().map(m => m.doc_id -> m).toMap
    assert(media(1L).payload.sameElements("hello".getBytes("UTF-8")))
    assert(media(2L).payload.sameElements("wörld".getBytes("UTF-8")))
    assert(media(2L).n_bytes == 6) // ö is 2 bytes in UTF-8
    assert(media(1L).media_type == "text/plain")
  }

  test("feature extraction is deterministic and partition-independent") {
    val docs = Tables.documents(spark, sf0001)
    val f1 = extractFeatures(documentsAsMedia(docs)).orderBy("doc_id").collect()
    val f2 = extractFeatures(documentsAsMedia(docs.repartition(7))).orderBy("doc_id").collect()
    assert(f1.length == 500)
    assert(f1.zip(f2).forall { case (a, b) =>
      a.doc_id == b.doc_id && a.byte_mean == b.byte_mean &&
        a.feature.sameElements(b.feature)
    })
  }

  test("stub features have the contracted shape and ranges") {
    val feats = extractFeatures(documentsAsMedia(Tables.documents(spark, sf0001)))
      .collect()
    feats.foreach { f =>
      assert(f.feature.length == 4)
      assert(f.byte_mean > 0 && f.byte_mean < 256)
    }
  }
}
