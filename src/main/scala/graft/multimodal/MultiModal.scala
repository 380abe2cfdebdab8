package graft.multimodal

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` with typed metadata,
  * processed by frame-sampling + feature extraction.
  *
  * The DECODE step is a deterministic STUB (no image/audio codecs in this
  * environment): media bytes are the UTF-8 encoding of the document text,
  * and "features" are md5 of each sampled frame's bytes. Everything around
  * the stub — binary schema, per-frame explode, bounded frame width,
  * codegen'd byte slicing — is the real Spark plumbing and is tested.
  *
  * Scale shape: explode(sequence(0, nFrames-1)) keeps per-row output bounded
  * (nFrames × width bytes), independent of media size; the scan prunes to
  * (id, media) only.
  */
object MultiModal {

  /** Attach the stub media column (binary) + metadata. */
  def withMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      encode(col(textCol), "UTF-8").as("media"),
      lit("text/fake").as("mime"),
      length(col(textCol)).as("mediaLen"))

  /** Sample up to `nFrames` frames of `width` bytes every `stride` bytes;
    * feature = md5(frame bytes). Frames beyond the media end are dropped.
    * Byte slicing happens on the hex encoding (2 chars/byte) — exactly
    * portable across engines.
    */
  def frameFeatures(media: DataFrame, nFrames: Int, stride: Int, width: Int): DataFrame =
    media
      .select(col("doc_id"), hex(col("media")).as("h"))
      .select(col("doc_id"), col("h"),
        explode(sequence(lit(0), lit(nFrames - 1))).as("frame"))
      .select(col("doc_id"), col("frame"),
        col("h").substr(col("frame") * (2 * stride) + 1, lit(2 * width)).as("fh"))
      .where(length(col("fh")) === 2 * width)
      .select(col("doc_id"), col("frame").cast("long").as("frame"), md5(col("fh")).as("feature"))
}
