package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Engine-side plumbing for multimodal (image/audio/video) columns.
  *
  * Media travels as an opaque `binary` column plus typed metadata; the
  * decode step is an injectable per-partition batch function so the
  * expensive native library is initialized once per task, not per row —
  * the Scala analog of the reference's worker-local model/corrections
  * initialization (`/root/reference/stage1/processor.py:751-800`) and of
  * a Pandas-UDF `mapInPandas` batch loop.
  *
  * Scale design:
  *  - decode runs in `mapPartitions`, so batch size = partition size and
  *    the decoder amortizes across the partition;
  *  - `repartitionByBytes` bounds the bytes per task (media blobs are
  *    orders of magnitude bigger than their metadata — partitioning by
  *    row count would make task sizes wildly skewed);
  *  - output is a typed Dataset with a fixed schema, so downstream
  *    feature queries stay columnar.
  */
object MediaPipeline {

  /** One media row in. */
  final case class MediaRow(id: Long, content: Array[Byte])

  /** Decoded features out — what a real image decoder would fill. */
  final case class MediaFeatures(
      id: Long,
      nBytes: Int,
      width: Int,
      height: Int,
      channels: Int,
      meanLuma: Double)

  /** A decoder consumes one partition's rows as a batch. */
  type Decoder = Iterator[MediaRow] => Iterator[MediaFeatures]

  /** The REAL decoder requires native image libraries that are not in
    * this container — deliberately left unimplemented; inject
    * [[fakeDecoder]] (tests) or a JNI-backed implementation (cluster).
    */
  def nativeDecoder: Decoder =
    throw new NotImplementedError(
      "native image decode needs an imaging library; inject a Decoder")

  /** Deterministic stand-in: derives plausible features from the bytes
    * themselves so the full pipeline is testable end-to-end. */
  val fakeDecoder: Decoder = { rows =>
    rows.map { r =>
      val b0 = if (r.content.nonEmpty) r.content(0) & 0xff else 0
      val b1 = if (r.content.length > 1) r.content(1) & 0xff else 0
      val luma =
        if (r.content.isEmpty) 0.0
        else r.content.iterator.map(b => (b & 0xff).toDouble).sum / r.content.length
      MediaFeatures(r.id, r.content.length, 32 + b0 % 64, 32 + b1 % 64, 3, luma)
    }
  }

  /** Bound bytes-per-task: media partitions must be sized by payload
    * bytes, not row count. */
  def repartitionByBytes(df: DataFrame, blobCol: String,
                         targetBytesPerTask: Long): DataFrame = {
    val totalBytes = df.agg(sum(octet_length(col(blobCol)))).head.getLong(0)
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytesPerTask).toInt)
    df.repartition(n)
  }

  /** Run the decode batch-wise over a (id, binary) DataFrame. */
  def decode(spark: SparkSession, media: DataFrame, decoder: Decoder): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => decoder(it.map { case (i, c) => MediaRow(i, c) }))
  }

  /** documents -> (id, content) media table: the binary ingestion path
    * used by the test-table corpus (text bytes stand in for media). */
  def mediaFromDocuments(spark: SparkSession, dir: String): DataFrame = {
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("id"),
        expr("encode(text, 'UTF-8')").as("content"))
  }
}
