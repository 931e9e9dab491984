package graft.ops

import graft.{OpQuery, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Input to the stub decoder: an opaque binary payload keyed by doc. */
case class BinDoc(doc_id: Long, payload: Array[Byte])

/** Typed metadata the "decoder" extracts per payload. */
case class MediaMeta(doc_id: Long, width: Long, height: Long, n_bytes: Long)

/** Multimodal columns (builder-prompt north star): media as opaque BINARY
  * columns + typed metadata, decoded per partition.
  *
  * The decode step is a STUB — no image/audio codecs exist in this
  * container — but the Spark-side plumbing is real: binary column in,
  * `Dataset[BinDoc].mapPartitions` over partition iterators (the Scala
  * analog of mapInPandas batch processing: one decoder instantiation per
  * partition, streaming rows through it, constant memory), typed
  * `MediaMeta` out. Swapping `StubCodec.decode` for a real codec changes
  * nothing in the plan.
  */
object MultimodalOps {

  private def t(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  /** Deterministic fake codec: "dimensions" derived from payload length.
    * A real implementation would parse the container header here.
    */
  object StubCodec {
    def decode(b: BinDoc): MediaMeta =
      MediaMeta(b.doc_id, b.payload.length % 640, b.payload.length % 480,
        b.payload.length.toLong)
  }

  /** m1: binary payload → per-partition decode → typed metadata. Oracle
    * re-derives the stub arithmetic from text length (payload = UTF-8 text).
    */
  val m1_multimodal_decode_stub = OpQuery(
    (s, d) => {
      import s.implicits._
      val bin = t(s, d, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[BinDoc]
      bin.mapPartitions { it =>
        // One codec per partition; rows stream through (constant memory).
        it.map(StubCodec.decode)
      }.toDF().orderBy("doc_id")
    },
    """SELECT doc_id,
      |  CAST(strlen(text) % 640 AS BIGINT) AS width,
      |  CAST(strlen(text) % 480 AS BIGINT) AS height,
      |  CAST(strlen(text) AS BIGINT) AS n_bytes
      |FROM documents ORDER BY doc_id""".stripMargin)

  /** m2: frame sampling — every-7th-position probes of the payload
    * (stand-in for video frame extraction; batch shape: fixed-size sample
    * vector per row, computed in codegen'd collection expressions).
    */
  /** Frame sampling builds an array internally; the dumped cell is the
    * CSV-joined form (driver comparator is scalar-only — r1 gate crash).
    */
  val m2_multimodal_frame_sample = OpQuery(
    (s, d) => t(s, d, "documents")
      .select(col("doc_id"),
        expr("array_join(transform(transform(sequence(0, 7), i -> ascii(substr(text, (i * 7) % greatest(length(text), 1) + 1, 1))), x -> cast(x AS STRING)), ',')")
          .as("frames"))
      .orderBy("doc_id"),
    """SELECT doc_id,
      |  array_to_string(list_transform(range(0, 8), i -> ascii(substr(text, (i * 7) % greatest(length(text), 1) + 1, 1))), ',') AS frames
      |FROM documents ORDER BY doc_id""".stripMargin)

  val all: Map[String, OpQuery] = Map(
    "m1_multimodal_decode_stub" -> m1_multimodal_decode_stub,
    "m2_multimodal_frame_sample" -> m2_multimodal_frame_sample)
}
