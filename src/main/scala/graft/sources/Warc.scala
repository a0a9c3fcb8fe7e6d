package graft.sources

import java.io.{ByteArrayInputStream, DataInputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) reader — the format web crawls ship
  * in (Common Crawl publishes its corpus as `.warc.gz` shards), and
  * the entry point of the web curation chain this library already
  * carries end to end:
  *
  *   readWarc → [[httpBodyText]] → `TextAnalysis.htmlToText` →
  *   `normalizeText` → `Curate.run`
  *
  * Reference analog: none — the reference's one binary column is
  * `categories.picture` (`northwind.sql:47`); WARC is part of the
  * beyond-reference training-data surface (SURVEY §6).
  *
  * Scale design: files load through Spark's `binaryFile` source — ONE
  * TASK PER FILE, which matches the format: `.warc.gz` is a chain of
  * per-record gzip members and cannot be split mid-file by offset, so
  * crawl corpora are shipped as many ~1 GB shards and the shard count
  * IS the parallelism (the same contract as Lake.readJsonl's gz
  * shards). Record parsing is genuine imperative byte walking — a
  * `flatMap` over file bytes (the documented mapPartitions-tier
  * escape hatch), not a Catalyst expression; everything downstream of
  * the parse is ordinary columnar code. Member-wise gzip is handled
  * transparently (Java's GZIPInputStream reads concatenated members);
  * uncompressed WARC parses identically.
  *
  * Out of scope, documented: chunked transfer decoding and non-UTF-8
  * payload charsets (both are quality-gate problems downstream);
  * `maxLength` guards the 2 GB binaryFile ceiling upstream.
  */
object Warc {

  final case class WarcRecord(file: String, record_type: String,
      target_uri: String, warc_date: String, content_length: Long,
      payload: Array[Byte])

  private val GzipMagic = Array[Byte](0x1f.toByte, 0x8b.toByte)

  /** Parse every record of one WARC file's bytes. Malformed trailing
    * garbage ends the walk (records parsed so far are kept) — a
    * truncated shard yields its valid prefix, never an exception that
    * kills the whole read. */
  private[graft] def parseRecords(file: String,
      raw: Array[Byte]): Seq[WarcRecord] = {
    val bytes =
      if (raw.length >= 2 && raw(0) == GzipMagic(0) && raw(1) == GzipMagic(1)) {
        val in = new GZIPInputStream(new ByteArrayInputStream(raw))
        try new DataInputStream(in).readAllBytes() finally in.close()
      } else raw
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var pos = 0
    def indexOfCrlfCrlf(from: Int): Int = {
      var i = from
      while (i + 3 < bytes.length) {
        if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
          bytes(i + 2) == '\r' && bytes(i + 3) == '\n') return i
        i += 1
      }
      -1
    }
    while (pos < bytes.length) {
      // skip inter-record CRLFs
      while (pos < bytes.length && (bytes(pos) == '\r' || bytes(pos) == '\n'))
        pos += 1
      if (pos >= bytes.length) return out.toSeq
      val headerEnd = indexOfCrlfCrlf(pos)
      if (headerEnd < 0) return out.toSeq
      val headerText = new String(bytes, pos, headerEnd - pos,
        StandardCharsets.UTF_8)
      val lines = headerText.split("\r\n")
      if (!lines.head.startsWith("WARC/")) return out.toSeq
      val headers = lines.tail.flatMap { l =>
        val i = l.indexOf(':')
        if (i < 0) None else Some(l.substring(0, i).trim.toLowerCase ->
          l.substring(i + 1).trim)
      }.toMap
      val len = headers.get("content-length").flatMap(_.toLongOption)
        .getOrElse(-1L)
      val bodyStart = headerEnd + 4
      if (len < 0 || bodyStart + len > bytes.length) return out.toSeq
      out += WarcRecord(file,
        headers.getOrElse("warc-type", ""),
        headers.getOrElse("warc-target-uri", ""),
        headers.getOrElse("warc-date", ""),
        len,
        java.util.Arrays.copyOfRange(bytes, bodyStart, (bodyStart + len).toInt))
      pos = (bodyStart + len).toInt
    }
    out.toSeq
  }

  /** Read a directory (or glob) of `.warc` / `.warc.gz` files into a
    * record table: file, record_type, target_uri, warc_date,
    * content_length, payload (binary). Filter on
    * `record_type = 'response'` for page fetches; `payload` for those
    * is the raw HTTP response — strip its headers with
    * [[httpBodyText]]. */
  def readWarc(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, c) => parseRecords(p, c) }
      .toDF()
  }

  /** The HTTP response BODY of a response record's payload, as text:
    * everything after the first blank line, UTF-8 decoded. One
    * codegen'd expression (decode + locate + substring). A payload
    * with no header terminator (not HTTP, or truncated) yields null —
    * quarantine, don't guess. */
  def httpBodyText(payload: Column): Column = {
    val s = decode(payload, "UTF-8")
    val at = instr(s, "\r\n\r\n")
    when(at > 0, s.substr(at + lit(4), length(s)))
      .otherwise(lit(null).cast("string"))
  }
}
