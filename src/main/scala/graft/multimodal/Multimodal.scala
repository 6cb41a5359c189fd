package graft.multimodal

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque BINARY payloads
  * with typed metadata, and a batched per-partition decode/feature step.
  *
  * The decode itself is a STUB — this container has no image/audio codecs —
  * but everything Spark-side is real and tested: the schema, the binary
  * column handling, the batched mapPartitions shape (decode libraries are
  * initialized once per partition, rows processed in batches — the same
  * template a JNI/FFmpeg decoder drops into), and the deterministic output
  * contract (so the driver's oracle can replay it).
  */
object Multimodal {

  /** One decoded media record. `features` stands in for an
    * embedding/feature vector a real decoder would emit.
    */
  final case class Decoded(
      id: Long,
      modality: String,
      byte_len: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      fingerprint: String,
      features: Array[Float])

  /** STUB decoder: deterministic pseudo-metadata derived from the payload
    * bytes. A real implementation replaces ONLY the body of `decodeOne`
    * (e.g. javax.imageio / FFmpeg via JNI); the Spark plumbing around it —
    * per-partition init, batching, schema — is the real, tested part.
    */
  private def decodeOne(id: Long, modality: String, data: Array[Byte],
      md: MessageDigest): Decoded = {
    val len = data.length.toLong
    val fp = md.digest(data).map("%02x".format(_)).mkString
    md.reset()
    Decoded(
      id = id,
      modality = modality,
      byte_len = len,
      width = (32 + len % 608).toInt,
      height = (32 + (len * 7) % 448).toInt,
      n_frames = (1 + len % 16).toInt,
      fingerprint = fp,
      features = Array.tabulate(8)(i =>
        (data(((i * 7) % math.max(1, data.length)).toInt) & 0xff) / 255.0f))
  }

  /** Batched decode over (id: long, modality: string, data: binary).
    * One "decoder" (digest) instance per partition — the once-per-partition
    * init pattern for heavyweight native decoders.
    */
  def decodeStub(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, String, Array[Byte])] =
      media.select(col("id").cast("long"), col("modality"), col("data"))
        .as[(Long, String, Array[Byte])]
    ds.mapPartitions { it =>
      val md = MessageDigest.getInstance("SHA-256") // per-partition init
      it.map { case (id, modality, data) => decodeOne(id, modality, data, md) }
    }.toDF()
  }

  /** Resize planning over decoded media: aspect-preserving target
    * dimensions capped at `maxDim` (no-op when already within bounds),
    * plus the scale decision — the metadata half of a resize stage. The
    * pixel half belongs in [[decodeStub]]'s replaceable body; this column
    * arithmetic is exact integer math so an oracle can replay it.
    */
  def resizeStub(decoded: DataFrame, maxDim: Int = 256): DataFrame = {
    val m = greatest(col("width"), col("height"))
    def scaled(side: org.apache.spark.sql.Column) =
      greatest(lit(1), floor(side.cast("long") * maxDim / m).cast("int"))
    decoded.select(
      col("id"), col("width"), col("height"),
      when(m <= maxDim, col("width")).otherwise(scaled(col("width"))).as("out_w"),
      when(m <= maxDim, col("height")).otherwise(scaled(col("height"))).as("out_h"),
      (m > maxDim).as("resized"))
  }

  /** Feature extraction over decoded media — the embedding stage of a
    * multimodal pipeline, same per-partition-init mapPartitions template as
    * [[decodeStub]] (the init slot is where a real encoder session — CLIP,
    * an ONNX runtime, an audio embedder — lives, created once per partition
    * and reused across the batch). The stub derives a deterministic
    * `dim`-float vector from the content fingerprint's hex (4 hex chars →
    * one [0,1] feature; double division then float cast, so an oracle
    * replays it bit-exactly: DuckDB `('0x'||substr(sha256(x),...))::BIGINT
    * / 65535.0` cast REAL). Output (id, features) feeds the ANN operators
    * directly — media similarity is vector similarity from here on.
    */
  def featuresStub(decoded: DataFrame, dim: Int = 8): DataFrame = {
    require(dim >= 1 && dim * 4 <= 64, s"dim $dim needs 4*dim hex chars of a sha256")
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.select(col("id").cast("long"), col("fingerprint"))
      .as[(Long, String)]
      .mapPartitions { it =>
        // per-partition "encoder session" init slot (trivial for the stub)
        val hexRadix = 16
        it.map { case (id, fp) =>
          val feats = Array.tabulate(dim) { i =>
            (Integer.parseInt(fp.substring(i * 4, i * 4 + 4), hexRadix) /
              65535.0).toFloat
          }
          (id, feats)
        }
      }.toDF("id", "features")
  }

  /** Frame sampling shape: explode n_frames into (id, frame_idx) rows with
    * a deterministic per-frame pseudo-feature — the layout a video pipeline
    * feeds into per-frame embedding.
    */
  def sampleFrames(decoded: DataFrame, everyNth: Int = 1): DataFrame =
    decoded
      .select(col("id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .filter(col("frame_idx") % everyNth === 0)
}
