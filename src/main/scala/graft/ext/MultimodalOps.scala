package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{Q, Tables}

/** Multimodal-column plumbing: treat media as opaque `binary` columns with
  * typed metadata, and run decode / feature-extraction as a partition-wise
  * batch operator.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake — but everything Spark-side is real:
  * the schema (binary payload + metadata struct), the mapPartitions batch
  * shape (the Scala analogue of a Pandas-UDF `mapInPandas` over Arrow
  * batches), and the downstream feature schema. Swapping `decodeStub` for a
  * JNI codec is a one-function change.
  */
object MultimodalOps {

  val FeatureDim = 8

  /** STUB: "decode" a media payload into a fixed-dim feature vector.
    * Deterministic fake: bytes → rolling 64-bit hash per stripe →
    * normalized floats. A real build links an image/audio codec here.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    if (payload == null || payload.isEmpty) return out
    var i = 0
    while (i < payload.length) {
      val d = i % FeatureDim
      out(d) = out(d) + (payload(i) & 0xff) * 1e-3f
      i += 1
    }
    out
  }

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("features", ArrayType(FloatType))))

  /** Binary ingestion: synthesize a binary payload column from text (the
    * testdata ships no media blobs) plus a metadata struct — the schema a
    * real media table would have.
    */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        length(col("text")).cast("long").as("n_bytes"),
        sha2(col("text"), 256).as("digest")).as("meta"))

  /** Partition-wise batch decode: one pass, no shuffle, constant memory per
    * batch — the shape that runs decode at 100 TB (each task decodes its
    * own partition; parallelism = input splits).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select(col("doc_id"), col("payload"), col("meta.mime"), col("meta.n_bytes"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          Row(r.getAs[Long]("doc_id"), r.getAs[String]("mime"),
            r.getAs[Long]("n_bytes"), decodeStub(payload))
        }
      }(enc)
  }

  private def mm1Features(s: SparkSession, d: String): DataFrame =
    extractFeatures(s, asMediaTable(Tables.documents(s, d)))
      .select(col("doc_id"), col("n_bytes"),
        round(element_at(col("features"), 1), 3).as("f0"),
        round(element_at(col("features"), FeatureDim), 3).as(s"f${FeatureDim - 1}"))
      .orderBy(col("doc_id"))

  /** Frame sampling: split a payload into fixed-size stripes ("frames"),
    * keep every Nth, extract per-frame features. Pure expressions until
    * the decode, which runs batch-wise — the shape of video frame
    * sampling at scale (explode multiplies rows BEFORE the expensive
    * decode so Spark parallelizes across frames, not just files).
    */
  def sampleFrames(docs: DataFrame, frameBytes: Int, everyNth: Int): DataFrame = {
    val media = asMediaTable(docs)
    media.select(col("doc_id"), col("payload"),
      posexplode(split(col("payload").cast("string"),
        s"(?<=\\G.{$frameBytes})")).as(Seq("frame_no", "frame")))
      .filter(col("frame_no") % everyNth === 0 && length(col("frame")) > 0)
      .select(col("doc_id"), col("frame_no"),
        length(col("frame")).cast("long").as("frame_bytes"),
        xxhash64(col("frame")).as("frame_digest"))
  }

  private def mm2FrameSample(s: SparkSession, d: String): DataFrame =
    sampleFrames(Tables.documents(s, d), frameBytes = 64, everyNth = 2)
      .orderBy(col("doc_id"), col("frame_no"))

  val qs: Seq[(String, Q)] = Seq(
    "mm1_media_features" -> Q(mm1Features, None),
    "mm2_frame_sample"   -> Q(mm2FrameSample, None),
  )
}
