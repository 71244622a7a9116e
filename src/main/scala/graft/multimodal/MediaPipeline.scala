package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns with typed metadata; decode / feature-extraction runs
  * per-partition in batch shape. The actual codec work is STUBBED with a
  * deterministic fake (media libraries are not in this container) — the
  * Spark-side contract (schema, partitioning, batch iteration) is real.
  *
  * Scale notes: payload bytes never hit the driver; `repartition(n)`
  * controls decode parallelism; the per-partition iterator is the same
  * batch shape a vectorized (Arrow/pandas-style) UDF would use.
  */
object MediaPipeline {

  /** One decoded frame/feature row per media item. */
  final case class MediaFeature(
      docId: Long,
      nBytes: Long,
      format: String,
      width: Int,
      height: Int,
      // channel-mean stand-ins for real decoded features
      meanR: Double, meanG: Double, meanB: Double)

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("mime", StringType, nullable = false)
  ))

  /** Wrap the documents table as a media table: payload = UTF-8 bytes.
    * Stands in for image/audio blobs read from object storage via
    * `spark.read.format("binaryFile")`.
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("text/plain").as("mime"))

  /** Well-known container signatures (public magic-byte constants), in
    * match-priority order. The ONE media inspection that needs no codec
    * — and the first corruption/extension-spoofing gate a 100 TB media
    * ingest runs, because it reads 4 bytes per blob scan-side.
    */
  val magicSignatures: Seq[(String, Array[Byte])] = Seq(
    "jpeg" -> Array(0xFF, 0xD8, 0xFF).map(_.toByte),
    "png" -> Array[Byte](0x89.toByte, 'P', 'N', 'G'),
    "gif" -> "GIF8".getBytes("US-ASCII"),
    "zip" -> Array[Byte]('P', 'K', 0x03, 0x04),
    "pdf" -> "%PDF".getBytes("US-ASCII"),
    "riff" -> "RIFF".getBytes("US-ASCII"))

  /** Sniffed container format of a binary payload — per-row prefix
    * compares against [[magicSignatures]], pure scan-side column
    * algebra (no UDF, no payload movement). */
  def sniffedFormat(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    magicSignatures.foldRight(lit("unknown"): org.apache.spark.sql.Column) {
      case ((name, magic), acc) =>
        when(substring(payload, 1, magic.length) === lit(magic), name).otherwise(acc)
    }

  /** One sampled "frame" per media item: stride-sampled payload stats. */
  final case class FrameSample(
      docId: Long, frameIdx: Int, offset: Long, nSampled: Long, meanByte: Double)

  /** STUB frame sampling: a real video pipeline decodes every k-th frame;
    * this fake cuts the payload into `frameLen`-byte "frames" and emits
    * every `stride`-th of them with its byte-mean — the flatMap batch
    * shape (one media row -> N frame rows, executed per partition) is
    * exactly what a real frame sampler produces, and the byte math
    * replays in the SQL oracle.
    */
  def sampleFrames(
      media: DataFrame, frameLen: Int = 64, stride: Int = 4): Dataset[FrameSample] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id").cast(LongType), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          // ??? <- real frame decoder goes here; deterministic fake below
          val nFrames = (bytes.length + frameLen - 1) / frameLen
          (0 until nFrames by stride).iterator.map { f =>
            val start = f * frameLen
            val end = math.min(start + frameLen, bytes.length)
            var s = 0L
            var i = start
            while (i < end) { s += (bytes(i) & 0xff); i += 1 }
            FrameSample(id, f, start.toLong, (end - start).toLong,
              s.toDouble / (end - start))
          }
        }
      }
  }

  /** STUB decode: a real implementation would hand `payload` to an image
    * decoder here; this fake derives deterministic pseudo-features from
    * the bytes so the pipeline shape (binary in -> feature rows out,
    * executed per partition, never on the driver) is fully exercised.
    */
  def decodeAndFeaturize(media: DataFrame, parallelism: Int = 0): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    val repart = if (parallelism > 0) media.repartition(parallelism) else media
    repart
      .select(col("doc_id").cast(LongType), col("payload"), col("mime"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          // ??? <- real decoder goes here; deterministic fake below
          val n = bytes.length
          var s0 = 0L; var s1 = 0L; var s2 = 0L
          var i = 0
          while (i < n) {
            val b = bytes(i) & 0xff
            (i % 3: @annotation.switch) match {
              case 0 => s0 += b
              case 1 => s1 += b
              case 2 => s2 += b
            }
            i += 1
          }
          val third = math.max(n / 3, 1)
          MediaFeature(
            docId = id,
            nBytes = n.toLong,
            format = "fake",
            width = 16 * (1 + n % 64),
            height = 16 * (1 + n % 36),
            meanR = s0.toDouble / third,
            meanG = s1.toDouble / third,
            meanB = s2.toDouble / third)
        }
      }
  }
}
