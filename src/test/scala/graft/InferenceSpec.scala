package graft

import graft.multimodal.Inference
import org.apache.spark.sql.functions._

/** Counting model: records every batch's size through an accumulator
  * so the spec can observe the batching contract from the outside.
  * Top-level (not nested in the suite) so closure capture ships only
  * the accumulator, not the ScalaTest engine. */
private class CountingModel(
    acc: org.apache.spark.util.CollectionAccumulator[Int])
    extends Inference.EmbeddingModel {
  override val dim = 2
  override def embed(texts: Seq[String]): Seq[Array[Float]] = {
    acc.add(texts.length)
    texts.map(t => Array(t.length.toFloat, t.count(_ == ' ').toFloat))
  }
}

/** Length-lying model for the loud-failure guard — top-level for the
  * same serializability reason. */
private object BadLengthModel extends Inference.EmbeddingModel {
  override val dim = 1
  override def embed(texts: Seq[String]): Seq[Array[Float]] =
    texts.drop(1).map(_ => Array(0f))
}

class InferenceSpec extends SparkSpec {

  test("inference boundary batches rows at <= batchSize, preserving order and values") {
    val docs = engine.Tables.documents(spark, sf).limit(200)
      .select(col("doc_id"), col("text"))
    val acc = spark.sparkContext.collectionAccumulator[Int]("batches")
    val out = Inference.embedDocuments(docs, new CountingModel(acc), batchSize = 16)
      .collect()
    assert(out.length == docs.count())
    // every model call saw a bounded, non-empty batch
    import scala.jdk.CollectionConverters._
    val sizes = acc.value.asScala.toSeq
    assert(sizes.nonEmpty && sizes.forall(s => s >= 1 && s <= 16),
      s"batch sizes out of contract: $sizes")
    assert(sizes.sum == out.length, "every row through exactly one batch")
    // the batching actually batched (not row-at-a-time calls)
    assert(sizes.count(_ == 16) >= out.length / 32,
      s"expected mostly full batches, got $sizes")
    // values: the fake model is pure per-row, so batching must not
    // change results — compare against a direct driver-side map
    val expect = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { e =>
      val t = expect(e.doc_id)
      assert(e.embedding.toSeq ==
        Seq(t.length.toFloat, t.count(_ == ' ').toFloat), s"doc ${e.doc_id}")
    }
  }

  test("portable fake model matches an independent reference; guards fire") {
    // independent re-derivation of the fake model's definition
    val P = graft.functions.GramSketch.PortableP
    def ref(t: String): Seq[Float] = {
      val h = t.codePoints().toArray.foldLeft(0L)((a, c) => (a * 31 + c) % P)
      (0 until 4).map(j =>
        (((h * graft.functions.GramSketch.portableA(j)
          + graft.functions.GramSketch.portableB(j)) % P).toDouble / P).toFloat)
    }
    for (t <- Seq("hello world", "", "UPPER case", "a"))
      assert(Inference.PortableHashModel.embed(Seq(t)).head.toSeq == ref(t),
        s"text '$t'")
    // a model returning the wrong batch length must fail loudly
    val docs = engine.Tables.documents(spark, sf).limit(10)
    val e = intercept[org.apache.spark.SparkException] {
      Inference.embedDocuments(docs, BadLengthModel).collect()
    }
    assert(e.getMessage.contains("embeddings")
      || Option(e.getCause).exists(_.getMessage.contains("embeddings")))
    intercept[IllegalArgumentException] {
      Inference.embedDocuments(docs, Inference.PortableHashModel, batchSize = 0)
    }
  }
}
