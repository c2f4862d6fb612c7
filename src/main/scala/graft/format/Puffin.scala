package graft.format

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import graft.objects.Json

/** Minimal writer/reader for Iceberg's PUFFIN statistics-file format
  * (public spec, iceberg.apache.org/puffin-spec): the sidecar format
  * external engines read table-level column statistics from —
  * `apache-datasketches-theta-v1` blobs carry per-column NDV sketches
  * that cost-based optimizers consume.
  *
  * Layout: Magic, Blob₁…Blobₙ, Footer where Footer = Magic,
  * FooterPayload (UTF-8 JSON), FooterPayloadSize (int32 LE),
  * Flags (int32 LE, 0 = uncompressed payload), Magic. Blobs are raw
  * byte ranges addressed by (offset, length) entries in the payload.
  */
object Puffin {

  private val Magic = Array[Byte]('P', 'F', 'A', '1')

  final case class Blob(
      blobType: String,
      fields: Seq[Int], // Iceberg field ids the blob describes
      snapshotId: Long,
      sequenceNumber: Long,
      data: Array[Byte],
      properties: Map[String, String] = Map.empty)

  final case class BlobRef(
      blobType: String,
      fields: Seq[Int],
      snapshotId: Long,
      sequenceNumber: Long,
      offset: Long,
      length: Long,
      properties: Map[String, String])

  final case class File(blobs: Seq[BlobRef], footerSize: Int, bytes: Array[Byte]) {
    def blobData(b: BlobRef): Array[Byte] =
      java.util.Arrays.copyOfRange(bytes, b.offset.toInt,
        (b.offset + b.length).toInt)
  }

  def write(blobs: Seq[Blob], createdBy: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Magic)
    val refs = blobs.map { b =>
      val off = out.size().toLong
      out.write(b.data)
      Map(
        "type" -> b.blobType,
        "fields" -> b.fields,
        "snapshot-id" -> b.snapshotId,
        "sequence-number" -> b.sequenceNumber,
        "offset" -> off,
        "length" -> b.data.length.toLong,
        "properties" -> b.properties)
    }
    val payload = Json.write(Map(
      "blobs" -> refs,
      "properties" -> Map("created-by" -> createdBy)))
    out.write(Magic) // footer opens with its own magic
    out.write(payload)
    val tail = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(payload.length).putInt(0 /* flags: uncompressed */).array()
    out.write(tail)
    out.write(Magic)
    out.toByteArray
  }

  /** Footer size as Iceberg metadata reports it: footer magic +
    * payload + size + flags + trailing magic.
    */
  def footerSize(fileBytes: Array[Byte]): Int = {
    val payloadLen = ByteBuffer
      .wrap(fileBytes, fileBytes.length - 12, 4)
      .order(ByteOrder.LITTLE_ENDIAN).getInt
    4 + payloadLen + 4 + 4 + 4
  }

  def read(fileBytes: Array[Byte]): File = {
    require(fileBytes.length >= 20, "truncated puffin file")
    def magicAt(off: Int): Boolean =
      (0 until 4).forall(i => fileBytes(off + i) == Magic(i))
    require(magicAt(0), "missing puffin header magic")
    require(magicAt(fileBytes.length - 4), "missing puffin trailing magic")
    val tail = ByteBuffer.wrap(fileBytes, fileBytes.length - 12, 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    val payloadLen = tail.getInt
    val flags = tail.getInt
    require(flags == 0, s"unsupported puffin footer flags: $flags")
    val payloadStart = fileBytes.length - 12 - payloadLen
    require(magicAt(payloadStart - 4), "missing puffin footer magic")
    val payload = new String(fileBytes, payloadStart, payloadLen,
      StandardCharsets.UTF_8)
    val node = Json.mapper.readTree(payload)
    import scala.jdk.CollectionConverters._
    val blobs = Option(node.get("blobs")).toSeq
      .flatMap(_.elements().asScala).map { b =>
        BlobRef(
          b.get("type").asText(),
          Option(b.get("fields")).toSeq
            .flatMap(_.elements().asScala.map(_.asInt())),
          b.path("snapshot-id").asLong(),
          b.path("sequence-number").asLong(),
          b.get("offset").asLong(),
          b.get("length").asLong(),
          Option(b.get("properties")).map(p =>
            p.fields().asScala.map(e =>
              e.getKey -> e.getValue.asText()).toMap).getOrElse(Map.empty))
      }
    File(blobs, footerSize(fileBytes), fileBytes)
  }
}
