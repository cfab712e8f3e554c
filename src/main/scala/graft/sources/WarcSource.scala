package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500 — the Common Crawl container) record
  * parsing: the ingestion format a 100 TB web-corpus pipeline reads FIRST,
  * before any text operator runs. Same pure-JVM byte-walk genre as the
  * RIFF/PNG/MP3 walkers in [[graft.operators.Multimodal]]: the record
  * grammar (version line, named headers, Content-Length-delimited block,
  * CRLF CRLF separator) and the `application/http` block sub-format are
  * both public specs, no external library involved.
  *
  * Scale shape: parsing is a per-partition batch map over (id, payload)
  * rows — zero shuffle, records stream out of each payload lazily. At real
  * scale the payload column arrives from a binary-file scan partitioned by
  * WARC file, so record extraction is embarrassingly parallel and the
  * downstream text operators see one row per archived page.
  */
object WarcSource {

  /** One parsed WARC record: sequence position in its file, record type
    * (lowercased), target URI (responses), declared block length, HTTP
    * status and payload body when the block is `application/http`, else
    * the raw block as the body.
    */
  final case class WarcRecord(
      seq: Int, recType: String, targetUri: Option[String],
      contentLength: Long, httpStatus: Option[Int], body: String)

  private val Crlf = "\r\n"

  /** Strict WARC walk: every record must open with `WARC/1.0` or
    * `WARC/1.1`, carry a parseable integer `Content-Length`, be followed by
    * the two-CRLF record separator, and the file must end cleanly — any
    * violation dead-letters the WHOLE payload (None), never throws.
    * Header names are case-insensitive per the spec; `application/http`
    * blocks are split at the first blank line into a status line (code =
    * second token) and the body.
    */
  def parseWarc(b: Array[Byte]): Option[Seq[WarcRecord]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var p = 0
    def lineEnd(from: Int): Int = {
      var i = from
      while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n')) i += 1
      if (i + 1 < b.length) i else -1
    }
    def ascii(from: Int, until: Int): String =
      new String(b, from, until - from, java.nio.charset.StandardCharsets.ISO_8859_1)
    while (p < b.length) {
      val ve = lineEnd(p)
      if (ve < 0) return None
      val version = ascii(p, ve)
      if (version != "WARC/1.0" && version != "WARC/1.1") return None
      p = ve + 2
      // headers until blank line
      val headers = scala.collection.mutable.Map.empty[String, String]
      var blank = false
      while (!blank) {
        val he = lineEnd(p)
        if (he < 0) return None
        if (he == p) { blank = true; p += 2 }
        else {
          val line = ascii(p, he)
          val colon = line.indexOf(':')
          if (colon <= 0) return None
          headers(line.substring(0, colon).trim.toLowerCase) =
            line.substring(colon + 1).trim
          p = he + 2
        }
      }
      val len = headers.get("content-length").flatMap(_.toLongOption)
        .getOrElse(return None)
      if (len < 0 || p + len > b.length) return None
      val block = ascii(p, p + len.toInt)
      p += len.toInt
      // record separator: exactly two CRLFs
      if (p + 4 > b.length || ascii(p, p + 4) != Crlf + Crlf) return None
      p += 4
      val recType = headers.getOrElse("warc-type", return None).toLowerCase
      val isHttp = headers.get("content-type").exists(_.startsWith("application/http"))
      val (status, body) =
        if (isHttp) {
          val sep = block.indexOf(Crlf + Crlf)
          if (sep < 0) return None
          val statusLine = block.substring(0, block.indexOf(Crlf) max 0)
          val parts = statusLine.split(' ')
          if (parts.length < 2 || !parts(0).startsWith("HTTP/")) return None
          (parts(1).toIntOption, block.substring(sep + 4))
        } else (None, block)
      out += WarcRecord(out.size, recType, headers.get("warc-target-uri"),
        len, status, body)
    }
    if (out.isEmpty) None else Some(out.toSeq)
  }

  /** Planted per-record facts from the id — shared with the gate oracle:
    * record j of doc id has target URI `http://host{(id+j)%7}.example/p/
    * {id}/{j}`, HTTP status 404 when `id%5==0 && j==1` else 200, and body
    * `<html><body>page {id} section {j} {"x"*(id%5+j+1)}</body></html>`.
    */
  def plantWarcResponseCount(id: Long): Int = (1 + id % 3).toInt

  private def plantHttpBlock(id: Long, j: Int): String = {
    val notFound = id % 5 == 0 && j == 1
    val statusLine = if (notFound) "HTTP/1.1 404 Not Found" else "HTTP/1.1 200 OK"
    val body = s"<html><body>page $id section $j " +
      ("x" * ((id % 5).toInt + j + 1)) + "</body></html>"
    statusLine + Crlf + "Content-Type: text/html" + Crlf + Crlf + body
  }

  /** A COMPLETE spec-valid WARC file for the id: a warcinfo record followed
    * by [[plantWarcResponseCount]] response records whose HTTP blocks are
    * closed-form from (id, j).
    */
  def plantWarc(id: Long): Array[Byte] = {
    val sb = new StringBuilder
    def record(headers: Seq[(String, String)], block: String): Unit = {
      sb.append("WARC/1.0").append(Crlf)
      headers.foreach { case (k, v) => sb.append(k).append(": ").append(v).append(Crlf) }
      sb.append("Content-Length: ").append(block.length).append(Crlf)
      sb.append(Crlf).append(block).append(Crlf).append(Crlf)
    }
    record(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> s"<urn:uuid:info-$id>",
      "WARC-Date" -> "2024-01-01T00:00:00Z",
      "Content-Type" -> "application/warc-fields"),
      "software: graft-synthetic" + Crlf + "format: WARC File Format 1.0" + Crlf)
    var j = 0
    while (j < plantWarcResponseCount(id)) {
      record(Seq(
        "WARC-Type" -> "response",
        "WARC-Record-ID" -> s"<urn:uuid:rec-$id-$j>",
        "WARC-Date" -> "2024-01-01T00:00:00Z",
        "WARC-Target-URI" -> s"http://host${(id + j) % 7}.example/p/$id/$j",
        "Content-Type" -> "application/http; msgtype=response"),
        plantHttpBlock(id, j))
      j += 1
    }
    sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  /** (doc_id, payload) rows of planted WARC files — the gate input. */
  def plantWarcPayloads(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id")).as[Long]
      .mapPartitions(it => it.map(id => (id, plantWarc(id))))
      .toDF("doc_id", "payload")
  }

  /** One row per WARC record via [[parseWarc]]: (doc_id, rec_seq,
    * rec_type, target_uri, content_length, http_status, body). Malformed
    * payloads are DROPPED (dead-letter route, like the Multimodal
    * walkers). Per-partition batch map — zero shuffle.
    */
  def extractWarcRecords(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          parseWarc(bytes).toSeq.flatten.map { r =>
            (id, r.seq, r.recType, r.targetUri.orNull, r.contentLength,
              r.httpStatus.map(_.toLong).map(java.lang.Long.valueOf).orNull, r.body)
          }
        }
      }
      .toDF("doc_id", "rec_seq", "rec_type", "target_uri", "content_length",
        "http_status", "body")
  }
}
