package graft.analytics

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.GraftQuery

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * the Spark-side shape for image/audio/video handling in a training-data
  * pipeline. The real decode step needs media libraries this container
  * doesn't ship, so [[StubMediaDecoder]] stands in behind the same
  * interface; everything Spark-side — schema, batching, partition-local
  * decode, metadata extraction — is real and oracle-checked where
  * SQL-expressible.
  */
object MultimodalOps {

  /** A decoded media asset's typed metadata (what a real image/audio
    * decoder would emit alongside features).
    */
  final case class MediaMeta(
      doc_id: Long,
      byte_len: Long,
      magic: String,
      kind: String,
      checksum: String,
      // decode outputs (stubbed): deterministic fake "dimensions"
      width: Int,
      height: Int)

  /** Pluggable decoder boundary (a real build swaps in javacv/pillow-sided
    * impls; the contract — bytes in, typed meta out, called once per row
    * inside a partition — is what the engine guarantees).
    */
  trait MediaDecoder extends Serializable {
    def decode(docId: Long, bytes: Array[Byte]): MediaMeta
  }

  /** Deterministic fake decode: sniffs a "magic" prefix, derives fake
    * dimensions from the byte length. Marks exactly where a real decoder
    * plugs in.
    */
  final class StubMediaDecoder extends MediaDecoder {
    override def decode(docId: Long, bytes: Array[Byte]): MediaMeta = {
      val magic = bytes.take(2).map(b => f"$b%02x").mkString
      val kind = magic match {
        case "ffd8" => "jpeg"
        case "8950" => "png"
        case _ => "unknown"
      }
      val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      MediaMeta(docId, bytes.length.toLong, magic, kind,
        md.map(b => f"$b%02x").mkString,
        width = (bytes.length % 640) + 1, height = (bytes.length % 480) + 1)
    }
  }

  /** Partition-local decode: one decoder instance per partition (the
    * mapPartitions batch shape a heavyweight decoder needs), no shuffle.
    */
  def decodeAll(assets: Dataset[(Long, Array[Byte])], decoder: MediaDecoder): Dataset[MediaMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { case (id, bytes) => decoder.decode(id, bytes) }
    }
  }

  /** documents.text reinterpreted as opaque binary payloads — the column
    * plumbing under test; a real pipeline reads actual media bytes here.
    */
  def binaryAssets(s: SparkSession, dir: String): Dataset[(Long, Array[Byte])] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary"))
      .as[(Long, Array[Byte])]
  }

  /** A sampled "frame" of a media asset (video frame-sampling shape: one
    * row per sampled frame, partition-local decode, 1-in/N-out).
    */
  final case class MediaFrame(doc_id: Long, frame_idx: Int, frame_len: Int,
      frame_checksum: String)

  /** An extracted feature vector (image/audio feature-extraction shape).
    * The stub derives 8 deterministic byte-class frequencies; a real build
    * swaps in an embedding model behind the same partition-local batch
    * contract.
    */
  final case class MediaFeatures(doc_id: Long, f0: Double, f1: Double,
      f2: Double, f3: Double, f4: Double, f5: Double, f6: Double, f7: Double)

  /** Frame sampling: split the payload into fixed-stride frames, one row
    * per frame — mapPartitions 1-in/N-out, the flatMap shape a real video
    * sampler needs (decoder instantiated once per partition).
    */
  def sampleFrames(assets: Dataset[(Long, Array[Byte])], stride: Int): Dataset[MediaFrame] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { case (id, bytes) =>
        // a zero-length payload yields zero frames (ceil(0/stride) = 0)
        (0 until (bytes.length + stride - 1) / stride).map { i =>
          val from = i * stride
          val slice = java.util.Arrays.copyOfRange(bytes, from,
            math.min(bytes.length, from + stride))
          md.reset()
          MediaFrame(id, i, slice.length,
            md.digest(slice).map(b => f"$b%02x").mkString)
        }
      }
    }
  }

  /** Feature extraction: per-asset byte-class histogram frequencies
    * (deterministic stub for an embedding model; counts are exact ints,
    * one IEEE division each → cross-engine exact).
    */
  def extractFeatures(assets: Dataset[(Long, Array[Byte])]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { case (id, bytes) =>
        val counts = new Array[Int](8)
        var i = 0
        while (i < bytes.length) {
          counts((bytes(i) & 0xff) >>> 5) += 1
          i += 1
        }
        val n = math.max(bytes.length, 1).toDouble
        MediaFeatures(id, counts(0) / n, counts(1) / n, counts(2) / n,
          counts(3) / n, counts(4) / n, counts(5) / n, counts(6) / n, counts(7) / n)
      }
    }
  }

  private val qFrames = GraftQuery(
    "qm_frame_sample",
    (s, dir) => {
      sampleFrames(binaryAssets(s, dir), 64).toDF()
        .orderBy(col("doc_id"), col("frame_idx"))
    },
    // NOTE: the oracle slices with character-based substr while Spark
    // slices bytes — equivalent only because documents.text is ASCII in
    // the test corpora (len here is octet_length, which matches char
    // count under that assumption).
    Some("""WITH f AS (SELECT doc_id, octet_length(encode(text)) AS len, text FROM documents),
    idx AS (SELECT doc_id, len, text,
      unnest(generate_series(0, CAST(ceil(len / 64.0) AS INTEGER) - 1)) AS frame_idx
      FROM f)
    SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
      CAST(octet_length(encode(substr(text, frame_idx * 64 + 1, 64))) AS INTEGER) AS frame_len,
      md5(substr(text, frame_idx * 64 + 1, 64)) AS frame_checksum
    FROM idx ORDER BY doc_id, frame_idx"""))

  private val qFeatures = GraftQuery(
    "qm_feature_extract",
    (s, dir) => extractFeatures(binaryAssets(s, dir)).toDF()
      .orderBy(col("doc_id")),
    Some("""WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n,
      list_transform(generate_series(1, octet_length(encode(text))),
        i -> ascii(substr(text, i, 1)) // 32) AS cls
      FROM documents)
    SELECT doc_id,
      CAST(len(list_filter(cls, x -> x = 0)) AS DOUBLE) / n AS f0,
      CAST(len(list_filter(cls, x -> x = 1)) AS DOUBLE) / n AS f1,
      CAST(len(list_filter(cls, x -> x = 2)) AS DOUBLE) / n AS f2,
      CAST(len(list_filter(cls, x -> x = 3)) AS DOUBLE) / n AS f3,
      CAST(len(list_filter(cls, x -> x = 4)) AS DOUBLE) / n AS f4,
      CAST(len(list_filter(cls, x -> x = 5)) AS DOUBLE) / n AS f5,
      CAST(len(list_filter(cls, x -> x = 6)) AS DOUBLE) / n AS f6,
      CAST(len(list_filter(cls, x -> x = 7)) AS DOUBLE) / n AS f7
    FROM b ORDER BY doc_id"""))

  // Oracle-checked query: binary column metadata (length, magic prefix,
  // checksum) through the same decode path, SQL-expressible subset.
  private val qBinaryMeta = GraftQuery(
    "qm_binary_metadata",
    (s, dir) => {
      import s.implicits._
      decodeAll(binaryAssets(s, dir), new StubMediaDecoder).toDF()
        .select(col("doc_id"), col("byte_len"), col("magic"), col("kind"),
          col("checksum"), col("width"), col("height"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
      CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      lower(hex(encode(substr(text, 1, 2)))) AS magic,
      'unknown' AS kind,
      md5(text) AS checksum,
      CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
      CAST(octet_length(encode(text)) % 480 + 1 AS INTEGER) AS height
    FROM documents ORDER BY doc_id"""))

  val queries: Seq[GraftQuery] = Seq(qBinaryMeta, qFrames, qFeatures)
}
