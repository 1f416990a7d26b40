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

  val queries: Seq[GraftQuery] = Seq(qBinaryMeta)
}
