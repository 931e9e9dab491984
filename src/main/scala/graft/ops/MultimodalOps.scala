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

  /** m1/m3 count BYTES on the Spark side while their oracles count
    * CHARACTERS — equivalent only for ASCII. Make that precondition loud:
    * a non-ASCII document fails the query with this message instead of
    * silently hash-mismatching the gate. (assert_true returns NULL on
    * success, throws on violation; ifnull keeps the filter all-pass.)
    */
  private def asciiOnly(df: org.apache.spark.sql.DataFrame) =
    // NULL text must not trip the assert (assert_true throws on NULL as
    // well as false — the message would send the reader hunting for
    // non-ASCII bytes when the problem is a NULL document)
    df.filter(expr(
      "ifnull(assert_true(text IS NULL OR octet_length(text) = char_length(text), " +
        "'m1/m3 byte-level parity requires an ASCII corpus'), true)"))

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
      val bin = asciiOnly(t(s, d, "documents"))
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

  /** Per-partition "model" for m3 — the batch-inference shape: one
    * instantiation per partition, rows stream through. The featurizer is a
    * deterministic stand-in (16-bin byte histogram, normalized); swapping
    * in a real encoder changes nothing in the plan.
    */
  class StubFeaturizer {
    def embed(payload: Array[Byte]): Array[Double] = {
      val counts = new Array[Long](16)
      var i = 0
      while (i < payload.length) {
        counts((payload(i) & 0xff) % 16) += 1
        i += 1
      }
      val n = math.max(payload.length, 1).toDouble
      counts.map(_ / n)
    }
  }

  /** m3: feature extraction over binary payloads — the missing brief
    * bullet next to decode (m1) and frame-sample (m2). Plumbing identical
    * to batch inference: `Dataset[BinDoc].mapPartitions` with one model
    * per partition; fixed-width feature vector out, dumped as 16 scalar
    * columns (driver comparator is scalar-only). Oracle recomputes the
    * histogram from the characters — payloads are UTF-8 of pure-ASCII
    * text, so byte values equal code points (verified on the corpus).
    */
  val m3_multimodal_feature_extract = OpQuery(
    (s, d) => {
      import s.implicits._
      val bin = asciiOnly(t(s, d, "documents"))
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[BinDoc]
      val feats = bin.mapPartitions { it =>
        val model = new StubFeaturizer() // one per partition
        it.map(b => (b.doc_id, model.embed(b.payload)))
      }.toDF("doc_id", "f")
      feats.select(col("doc_id") +:
        (0 until 16).map(i => round(col("f")(i), 6).as(s"f_$i")): _*)
        .orderBy("doc_id")
    },
    "SELECT doc_id, " + (0 until 16).map(i =>
      s"round(CAST(len(list_filter(range(1, strlen(text)+1), k -> ascii(substr(text,k,1)) % 16 = $i)) AS DOUBLE) / greatest(strlen(text), 1), 6) AS f_$i")
      .mkString(", ") +
      " FROM documents ORDER BY doc_id")

  /** m4: resize — nearest-neighbor resample of the payload to a fixed
    * 8-byte thumbnail (the image-resize shape on opaque bytes; codegen'd
    * collection expression, dumped CSV-joined per the scalar-only rule).
    */
  val m4_multimodal_resize = OpQuery(
    (s, d) => t(s, d, "documents")
      .select(col("doc_id"),
        expr("array_join(transform(sequence(0, 7), k -> cast(ascii(substr(text, cast((k * length(text)) div 8 AS INT) + 1, 1)) AS STRING)), ',')")
          .as("resized"))
      .orderBy("doc_id"),
    """SELECT doc_id,
      |  array_to_string(list_transform(range(0, 8), k -> ascii(substr(text, CAST(k * strlen(text) // 8 AS INT) + 1, 1))), ',') AS resized
      |FROM documents ORDER BY doc_id""".stripMargin)

  val all: Map[String, OpQuery] = Map(
    "m1_multimodal_decode_stub" -> m1_multimodal_decode_stub,
    "m2_multimodal_frame_sample" -> m2_multimodal_frame_sample,
    "m3_multimodal_feature_extract" -> m3_multimodal_feature_extract,
    "m4_multimodal_resize" -> m4_multimodal_resize)
}
