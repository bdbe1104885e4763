package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TFRecord container walk + write — the ML world's sharded dataset
  * format (TensorFlow's on-disk layout, adopted far beyond it): a
  * training-data pipeline at 100 TB both INGESTS corpora that arrive
  * as TFRecord shards and RE-EXPORTS curated text the same way, so
  * like WET (q148) the engine is writer and reader at once.
  *
  * The format (public TensorFlow spec): per record a little-endian
  * u64 length, the MASKED CRC32C of those 8 length bytes, `length`
  * payload bytes, and the masked CRC32C of the payload — where
  * `mask(c) = rotr(c, 15) + 0xa282ead8` (the Castagnoli polynomial via
  * JDK `CRC32C`; the mask keeps embedded CRCs from colliding with
  * themselves).
  *
  * Error-as-value semantics follow what the CRCs can actually
  * guarantee: a payload-CRC mismatch drops THAT record and the walk
  * continues (the verified length still bounds the record); a
  * length-CRC mismatch ends the walk (the boundary itself is
  * untrustable — there is no resync magic in this format); a length
  * that runs past EOF is a truncation keeping every prior record;
  * allocation is capped BEFORE trusting the length field.
  *
  * The q152 corpus writes one shard per document — modular word-slice
  * records plus a multi-byte marker record, pure (doc_id, text)
  * arithmetic — and walks it back; record count, payload octet total,
  * and the concatenated-text sha are all oracle-replayed without the
  * oracle seeing a container byte.
  *
  * Scale shape (100 TB): per-row byte walker via `mapPartitions`,
  * zero shuffle before the output sort; work linear in shard size.
  */
object TfRecordOps {

  private val MaxRecordBytes = 1L << 26

  final case class TfInfo(
      doc_id: Long, status: String, n_records: Int, n_corrupt: Int,
      n_bytes: Long, text: String)

  // ------------------------------------------------------------------ crc

  /** The TFRecord CRC mask: rotate right 15, add the magic constant. */
  private[graft] def mask(crc: Long): Long =
    (((crc >>> 15) | (crc << 17)) + 0xa282ead8L) & 0xffffffffL

  private[graft] def maskedCrc(b: Array[Byte], off: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32C
    c.update(b, off, len)
    mask(c.getValue)
  }

  // --------------------------------------------------------------- encode

  private def le64(v: Long): Array[Byte] =
    Array.tabulate[Byte](8)(i => ((v >>> (8 * i)) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array.tabulate[Byte](4)(i => ((v >>> (8 * i)) & 0xff).toByte)

  /** One shard from raw payloads: the spec layout, both CRCs masked. */
  private[graft] def buildShard(records: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val len = le64(r.length.toLong)
      bos.write(len)
      bos.write(le32(maskedCrc(len, 0, 8)))
      bos.write(r)
      bos.write(le32(maskedCrc(r, 0, r.length)))
    }
    bos.toByteArray
  }

  /** The multi-byte marker record — CRC'd lengths count octets. */
  private[graft] def markerText(id: Long): String = "TFR № " + id

  /** One shard per document: `2 + id % 3` modular word-slice records
    * plus the marker (the q147 arithmetic with its own period).
    */
  private[graft] def buildDocShard(id: Long, text: String): Array[Byte] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val k = 2 + (id % 3).toInt
    val ws = text.split("[ \t\r\n]+").filter(_.nonEmpty)
    val parts = (0 until k).map(j => ws.zipWithIndex.collect {
      case (w, i) if i % k == j => w
    }.mkString(" "))
    buildShard((parts :+ markerText(id)).map(_.getBytes(utf8)))
  }

  // ----------------------------------------------------------------- walk

  private def readLe(b: Array[Byte], off: Int, n: Int): Long = {
    var v = 0L
    var i = 0
    while (i < n) { v |= (b(off + i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  /** (status, payloads): payload-CRC mismatch drops the record and
    * continues; length-CRC mismatch or a hostile length ends the walk.
    */
  private[graft] def parseShard(b: Array[Byte]): (String, Int, Seq[Array[Byte]]) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var corrupt = 0
    var p = 0
    while (p < b.length) {
      if (p + 12 > b.length) return ("truncated", corrupt, out.toSeq)
      val len = readLe(b, p, 8)
      if (readLe(b, p + 8, 4) != maskedCrc(b, p, 8))
        return ("bad-length-crc", corrupt, out.toSeq)
      if (len < 0 || len > MaxRecordBytes)
        return ("bad-header", corrupt, out.toSeq)
      val dataOff = p + 12
      if (dataOff + len + 4 > b.length) return ("truncated", corrupt, out.toSeq)
      val end = (dataOff + len).toInt
      if (readLe(b, end, 4) == maskedCrc(b, dataOff, len.toInt))
        out += java.util.Arrays.copyOfRange(b, dataOff, end)
      else corrupt += 1 // record drops alone: the verified length still bounds it
      p = end + 4
    }
    ("ok", corrupt, out.toSeq)
  }

  // ----------------------------------------------------------------- q152

  private[graft] def extractShard(docId: Long, b: Array[Byte]): TfInfo = {
    val (status, corrupt, recs) = parseShard(b)
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    TfInfo(docId, status, recs.length, corrupt,
      recs.map(_.length.toLong).sum,
      recs.map(new String(_, utf8)).mkString("\n"))
  }

  /** q152: the TFRecord loop end to end — write each document's shard
    * (masked-CRC32C framing), walk it back with both CRCs verified;
    * record count, payload octet total, and the text sha replayed by
    * the oracle from pure (doc_id, text) word arithmetic.
    */
  def q152TfrecordRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => extractShard(id, buildDocShard(id, t)) })
      .toDF()
      .select(col("doc_id"), col("status"),
        col("n_records").cast("long").as("n_records"),
        col("n_corrupt").cast("long").as("n_corrupt"),
        col("n_bytes"),
        sha2(col("text"), 256).as("text_sha"))
      .orderBy(col("doc_id"))
  }
}
