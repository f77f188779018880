package graft.queries

import graft.Q
import graft.engine.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column queries (SURVEY.md §2B B37 adjunct; mandated EXT).
  * See graft.multimodal.Multimodal for the decode plumbing.
  */
object MultimodalOps {

  /** Binary-column handling with oracle parity: payload size + content
    * hash + a projection of typed metadata. */
  val multimodalBinary: Q = Q(
    "q_multimodal_binary",
    (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          octet_length(col("text").cast("binary")).cast("long").as("n_bytes"),
          sha2(col("text").cast("binary"), 256).as("sha256_hex"),
          lit("text/plain").as("mime"),
          col("lang"), col("n_chars"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
      CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      sha256(text) AS sha256_hex,
      'text/plain' AS mime, lang, n_chars
    FROM documents ORDER BY doc_id"""))

  /** Feature extraction through the stubbed codec — mapPartitions
    * plumbing is real, decode is a deterministic fake, so no SQL oracle
    * (rows-only check) but full spec coverage in MultimodalSpec. */
  val multimodalFeatures: Q = Q(
    "q_multimodal_features",
    (s, d) => {
      val feats = Multimodal.extractFeatures(
        Multimodal.mediaFromDocuments(s, d))
      feats.toDF()
        .select(
          col("media_id"), col("n_bytes"), col("n_frames"),
          element_at(col("features"), 1).as("f_len"),
          element_at(col("features"), 2).as("f_mean"),
          element_at(col("features"), 3).as("f_min"),
          element_at(col("features"), 4).as("f_max"))
        .orderBy("media_id")
    },
    None)

  val all: Seq[Q] = Seq(multimodalBinary, multimodalFeatures)
}
