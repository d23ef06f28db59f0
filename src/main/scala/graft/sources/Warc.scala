package graft.sources

import java.io.{BufferedInputStream, ByteArrayOutputStream, EOFException,
  FilterOutputStream, InputStream, IOException, OutputStream}
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.sql.Timestamp
import java.time.Instant
import java.time.format.DateTimeFormatter
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import graft.model.Page
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions.{col, floor, lit}
import org.apache.spark.sql.types._

/** WARC (ISO 28500 / WARC/1.0) source + sink — the container format the
  * north rule's Common-Crawl-style input actually arrives in. Reads the
  * Common-Crawl layout (one gzip member per record, members concatenated
  * into `.warc.gz` shards) into the `input_hint` page-table shape, and
  * writes it back for fixtures and re-sharding.
  *
  * Scale design:
  *  - The parallelism unit is the FILE: record-per-member gzip is not
  *    splittable mid-file without an external index (Common Crawl ships
  *    CDX for that), so — exactly like every production CC reader — one
  *    task streams one shard. CC shards are ~1 GB by construction, which
  *    matches the task-size sweet spot; at 100 TB that is ~100k tasks.
  *  - Parsing is STREAMING with O(one record) memory: a task never
  *    buffers its file, and a payload larger than `maxPayload` is
  *    skipped without materializing (Common Crawl instead truncates at
  *    1 MiB and marks `WARC-Truncated`; dropping is this reader's
  *    disclosed analog — the dropped count per file is exposed via the
  *    `rec_seq` gaps).
  *  - No shuffle anywhere: scan → rows is one narrow stage; downstream
  *    pruning works because the emitted frame is a plain projection.
  *
  * Reference scope: CPREx ingests PDFs from a crawler
  * (`cprex/crawler/chemrxiv.py`); the web-scale graft replaces that
  * surface with the Common-Crawl page table (BASELINE.json input_hint),
  * and this source makes the table derivable from raw WARC bytes.
  */
object Warc {

  private val WarcDate: DateTimeFormatter = DateTimeFormatter.ISO_INSTANT

  /** Hadoop Configuration is not Serializable; executor-side FS access
    * must still see the SESSION's settings (fs.s3a credentials,
    * defaultFS, …) — a fresh `new Configuration()` in a task silently
    * drops every spark.hadoop.* entry. Ship the session conf with the
    * closure via Hadoop's own wire format (what Spark's internal
    * SerializableConfiguration does).
    */
  private[graft] final class SerConf(@transient var conf: Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      conf.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      conf = new Configuration(false)
      conf.readFields(in)
    }
  }

  private def sessionConf(spark: SparkSession): SerConf =
    new SerConf(spark.sparkContext.hadoopConfiguration)

  /** Read-side row shape: raw record fields before text/lang derivation. */
  val readSchema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("warc_ts", TimestampType, nullable = false),
    StructField("html", BinaryType, nullable = false),
    StructField("http_status", IntegerType, nullable = false),
    StructField("content_type", StringType, nullable = false),
    StructField("warc_file", StringType, nullable = false),
    StructField("rec_seq", IntegerType, nullable = false)))

  // ------------------------------ writer ------------------------------

  /** WARC/1.0 response record (HTTP envelope included), uncompressed.
    * Deterministic: the record id is a content hash, the date is the
    * row's `warc_ts` at second precision (WARC/1.0 mandates seconds).
    */
  private[graft] def responseRecord(url: String, ts: Timestamp,
      html: Array[Byte]): Array[Byte] = {
    val http = new ByteArrayOutputStream()
    http.write(("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=UTF-8\r\n" +
      s"Content-Length: ${html.length}\r\n\r\n").getBytes(ISO_8859_1))
    http.write(html)
    val payload = http.toByteArray
    val date = WarcDate.format(
      Instant.ofEpochSecond(ts.getTime / 1000L))
    val recId = {
      val md = java.security.MessageDigest.getInstance("SHA-1")
      md.update(url.getBytes(UTF_8)); md.update(date.getBytes(ISO_8859_1))
      "urn:sha1:" + md.digest().map("%02x".format(_)).mkString
    }
    val out = new ByteArrayOutputStream()
    out.write(("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      s"WARC-Record-ID: <$recId>\r\n" +
      s"WARC-Date: $date\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes(ISO_8859_1))
    out.write(payload)
    out.write("\r\n\r\n".getBytes(ISO_8859_1))
    out.toByteArray
  }

  private[graft] def warcinfoRecord(filename: String): Array[Byte] = {
    val body = ("software: graft-warc/1.0\r\n" +
      "format: WARC File Format 1.0\r\n").getBytes(ISO_8859_1)
    val out = new ByteArrayOutputStream()
    out.write(("WARC/1.0\r\n" +
      "WARC-Type: warcinfo\r\n" +
      s"WARC-Record-ID: <urn:warcinfo:$filename>\r\n" +
      "WARC-Date: 2023-01-01T00:00:00Z\r\n" +
      s"WARC-Filename: $filename\r\n" +
      "Content-Type: application/warc-fields\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(ISO_8859_1))
    out.write(body)
    out.write("\r\n\r\n".getBytes(ISO_8859_1))
    out.toByteArray
  }

  /** Shield the shard stream so per-record GZIPOutputStream.close()
    * (which releases its Deflater) cannot close the file.
    */
  private final class CloseShield(out: OutputStream)
      extends FilterOutputStream(out) {
    override def close(): Unit = flush()
    // FilterOutputStream.write(b,off,len) loops byte-at-a-time; delegate
    override def write(b: Array[Byte], off: Int, len: Int): Unit =
      out.write(b, off, len)
  }

  /** Write `(url, warc_ts, html)` rows as Common-Crawl-layout
    * `.warc.gz` shards, one shard per input partition (empty partitions
    * write nothing), each record its own gzip member preceded by a
    * leading warcinfo member. Returns shard count. Repartition upstream
    * to choose the shard size — the format's only tuning knob.
    */
  def write(pages: DataFrame, dir: String): Long =
    cdxRows(pages, dir, acc = None).rdd
      .mapPartitions { it =>
        // drain fully: the cdx iterator writes records as it advances
        // and commits its shard on exhaustion
        var any = 0L
        while (it.hasNext) { it.next(); any = 1L }
        Iterator.single(any)
      }
      .fold(0L)(_ + _)

  /** CDX sidecar shape: one row per written response record, addressing
    * its gzip member for random access (Common Crawl's CDX(J) role).
    */
  val cdxSchema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("warc_ts", TimestampType, nullable = false),
    StructField("warc_file", StringType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("length", LongType, nullable = false)))

  /** The shard-writing job with its CDX index as the OUTPUT dataset:
    * evaluating the returned frame writes the shards (side effect) and
    * yields one index row per record — write it to its sink in the SAME
    * action (`writeWithCdx` does) so shards are never written twice.
    * Offsets/lengths address whole gzip members (`fs.getPos` before and
    * after the member), which is exactly what CC's CDX records and what
    * [[fetchRecords]] seeks to.
    *
    * Attempt safety: each task attempt writes its own temp file and
    * RENAMES it to the final shard path at exhaustion, so concurrent
    * attempts (speculation, zombie first attempts) never interleave
    * members into one stream. The commit is FIRST-WRITER-WINS with no
    * delete of the final path anywhere in the protocol: if the rename
    * loses to a peer attempt (or the shard already exists), this
    * attempt's temp file is discarded and the existing shard stands —
    * a zombie attempt killed mid-commit therefore can never erase an
    * already-committed shard (the delete-then-rename window the r4
    * review flagged is gone). Either attempt's file satisfies the
    * committed index rows because the bytes are deterministic: same
    * partition → same rows in the same order → identical gzip output
    * (java.util.zip Deflater, fixed level, same JVM). Corollary: the
    * sink expects a FRESH output directory per dataset (the standard
    * Hadoop no-overwrite discipline) — shards already present are
    * treated as this dataset's own committed output, never replaced.
    */
  private def cdxRows(pages: DataFrame, dir: String,
      acc: Option[org.apache.spark.util.LongAccumulator]): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val hc = sessionConf(spark)
    val rows = pages
      .select("url", "warc_ts", "html")
      .as[(String, Timestamp, Array[Byte])]
    val rdd = rows.rdd.mapPartitionsWithIndex { (idx, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val name = f"part-$idx%05d.warc.gz"
        val path = new Path(dir, name)
        val tc = org.apache.spark.TaskContext.get()
        val attempt = if (tc != null) tc.taskAttemptId() else 0L
        val tmpPath = new Path(dir, s".$name.attempt-$attempt.tmp")
        val fs = path.getFileSystem(hc.conf)
        val out = fs.create(tmpPath, true)
        var open = true
        def abort(): Unit = if (open) {
          open = false; out.close(); fs.delete(tmpPath, false); ()
        }
        def commit(): Unit = if (open) {
          open = false; out.close()
          // first-writer-wins: never delete the final path (see scaladoc)
          if (fs.exists(path) || !fs.rename(tmpPath, path)) {
            if (!fs.exists(path))
              throw new IOException(s"cannot commit WARC shard $path")
            // the standing shard must be THIS dataset's bytes (a peer
            // attempt / replay — deterministic bytes make equal length
            // a sufficient same-dataset check). A different length
            // means the output dir already held ANOTHER dataset: fail
            // fast instead of silently discarding the new shard while
            // committing a CDX that describes it (r5 advice — the
            // fresh-dir contract is now enforced, not just documented)
            val have = fs.getFileStatus(path).getLen
            val wrote = fs.getFileStatus(tmpPath).getLen
            fs.delete(tmpPath, false)
            if (have != wrote)
              throw new IOException(
                s"WARC sink: $path already exists with different bytes " +
                  s"($have vs $wrote written) — the output directory " +
                  "holds another dataset; write into a fresh directory")
            ()
          }
        }
        // a failed/short-circuited attempt must release and clean up
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => abort())
        def member(bytes: Array[Byte]): Unit = {
          val gz = new GZIPOutputStream(new CloseShield(out))
          gz.write(bytes)
          gz.close() // finish member + release Deflater; shard stays open
        }
        member(warcinfoRecord(name))
        // stream records through; commit the shard when input is exhausted
        new Iterator[Row] {
          override def hasNext: Boolean = {
            val h = it.hasNext
            if (!h) commit()
            h
          }
          override def next(): Row = {
            val (url, ts, html) = it.next()
            val off = out.getPos
            member(responseRecord(url, ts, html))
            acc.foreach(_.add(1L))
            Row(url, ts, path.toString, off, out.getPos - off)
          }
        }
      }
    }
    spark.createDataFrame(rdd, cdxSchema)
  }

  /** Write shards AND their CDX index parquet in ONE job (the index
    * rows are the job's output; shards are its side effect). Returns
    * record count — from an accumulator filled by the same action, not
    * a second scan of the (at 10^12 records, large) index. Caveat:
    * transformation-side accumulators are at-least-once under task
    * retries/speculation, so the returned count can overcount in those
    * (rare) runs — the CDX parquet itself is exactly-once (committed
    * writer); count it when the number must be exact.
    */
  def writeWithCdx(pages: DataFrame, dir: String, cdxDir: String): Long = {
    val spark = pages.sparkSession
    val acc = spark.sparkContext.longAccumulator("warc_cdx_records")
    cdxRows(pages, dir, Some(acc)).write.mode("overwrite").parquet(cdxDir)
    acc.value
  }

  /** Length-bounded, close-shielded view of the seeked FS stream: at
    * most `remaining` bytes are served, then EOF — so a gzip member
    * parse ends exactly at the CDX-recorded member boundary without
    * materializing the member (a corrupt or hostile CDX length can
    * therefore never buffer gigabytes in one task; the `maxPayload`
    * skip inside [[records]] applies while STREAMING). close() is a
    * no-op: the per-partition reader owns the underlying FS stream.
    */
  private final class BoundedIn(in: InputStream, private var remaining: Long)
      extends InputStream {
    override def read(): Int =
      if (remaining <= 0) -1
      else { val c = in.read(); if (c >= 0) remaining -= 1; c }
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      if (len == 0) 0
      else if (remaining <= 0) -1
      else {
        val r = in.read(b, off, math.min(len.toLong, remaining).toInt)
        if (r > 0) remaining -= r
        r
      }
    override def close(): Unit = ()
  }

  /** Random-access fetch: read EXACTLY the records a CDX subset
    * addresses — the O(|candidates|) payload fetch of a CC pipeline
    * (inspect flagged dup pairs, re-extract a sample, serve a page)
    * where a glob read would scan the corpus. Only index rows ride the
    * one exchange (file-keyed repartition + in-partition offset sort =
    * sequential-ish IO per shard); payload bytes appear first inside
    * the per-partition seek loop, STREAMED through a length-bounded
    * view of the seeked stream (never materialized per member — see
    * [[BoundedIn]]). Returns the [[readSchema]] frame (rec_seq = -1:
    * member addressing carries no file ordinal).
    *
    * `splitBytes` makes the read SPLITTABLE below file granularity:
    * the exchange key is (file, offset/splitBytes), so a 1-GB shard's
    * members spread over ~1 GB/splitBytes tasks — the CDX index is
    * exactly the external index that record-per-member gzip needs to
    * split (Common Crawl ships CDX for this reason), and contiguous
    * offsets within a range bucket keep the per-task IO sequential.
    * The default (Long.MaxValue) keeps the one-bucket-per-file shape.
    *
    * CONTIGUOUS members coalesce into runs — one seek and ONE gzip
    * stream (one Inflater, one buffer set) per run instead of per
    * member. A dense fetch (reading a whole shard slice through the
    * index — the splittable-ingest case) then decodes at the
    * file-unit reader's per-byte cost (a per-member stream measured
    * 7x slower at 20k members); a sparse fetch degenerates to
    * single-member runs, exactly the old shape.
    */
  def fetchRecords(cdx: DataFrame, maxPayload: Int = 8 << 20,
      splitBytes: Long = Long.MaxValue): DataFrame = {
    require(splitBytes > 0, s"splitBytes must be positive: $splitBytes")
    val spark = cdx.sparkSession
    val hc = sessionConf(spark)
    // EXPLICIT partition count: index rows are ~100 bytes but each one
    // fans out into a whole payload's worth of seek+gunzip work AFTER
    // the exchange, so AQE's advisory-size coalescing (which only sees
    // the index bytes) would collapse the fetch to one task — measured
    // exactly that: 20k members, 16 keys, ONE post-AQE partition. A
    // number-pinned repartition (REPARTITION_BY_NUM) is exempt from
    // AQE coalescing and keeps the planned fan-out.
    val parts = spark.sessionState.conf.numShufflePartitions
    val rdd = cdx.select("warc_file", "offset", "length")
      .repartition(parts, col("warc_file"), floor(col("offset") / lit(splitBytes)))
      .sortWithinPartitions("warc_file", "offset")
      .rdd.mapPartitions { it0 =>
        val it = it0.buffered
        var curFile: String = null
        var in: org.apache.hadoop.fs.FSDataInputStream = null
        def closeIn(): Unit = if (in != null) { in.close(); in = null }
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => closeIn())
        def switchTo(file: String): Unit = {
          closeIn()
          val path = new Path(file)
          in = path.getFileSystem(hc.conf).open(path)
          curFile = file
        }
        // (file, start, byteLen, memberCount) maximal contiguous runs
        val runs = new Iterator[(String, Long, Long, Long)] {
          override def hasNext: Boolean = it.hasNext
          override def next(): (String, Long, Long, Long) = {
            val r = it.next()
            val file = r.getString(0)
            val off = r.getLong(1)
            var len = r.getLong(2)
            var n = 1L
            var ext = true
            while (ext && it.hasNext) {
              val h = it.head
              if (h.getString(0) == file && h.getLong(1) == off + len) {
                len += h.getLong(2); n += 1; it.next(); ()
              } else ext = false
            }
            (file, off, len, n)
          }
        }
        // Iterator.flatMap drains each run's stream fully before the
        // next run seeks, so the shared FS stream is never clobbered
        val rows = runs.flatMap { case (file, off, len, nMembers) =>
          if (file != curFile) switchTo(file)
          in.seek(off)
          var seen = 0L
          val recs = records(new BoundedIn(in, len), file,
            maxPayload, lenientTail = false)
          recs.flatMap { rec =>
            seen += 1
            if (rec.warcType != "response") None
            else rec.payload.flatMap(parseHttp).map { case (st, ct, body) =>
              val ts = Timestamp.from(Instant.from(WarcDate.parse(
                rec.headers.getOrElse("warc-date", throw new IOException(
                  s"response record without WARC-Date at $file:$off")))))
              Row(rec.headers.getOrElse("warc-target-uri", ""), ts, body, st,
                ct, file, -1)
            }
          } ++ new Iterator[Row] { // post-run check: every member parsed
            override def hasNext: Boolean = {
              if (seen < nMembers) throw new IOException(
                s"CDX run $file:$off+$len covers $nMembers members but " +
                  s"only $seen WARC records parsed")
              false
            }
            override def next(): Row = throw new NoSuchElementException
          }
        }
        // exhaustion closes the last stream; the completion listener
        // covers failed/short-circuited tasks
        new Iterator[Row] {
          override def hasNext: Boolean = {
            val h = rows.hasNext
            if (!h) closeIn()
            h
          }
          override def next(): Row = rows.next()
        }
      }
    spark.createDataFrame(rdd, readSchema)
  }

  // ------------------------------ reader ------------------------------

  /** CRLF-terminated header line (ISO-8859-1); None at clean EOF. */
  private def readLine(in: InputStream): Option[String] = {
    val buf = new ByteArrayOutputStream(96)
    var c = in.read()
    if (c == -1) return None
    while (c != -1 && c != '\n') { buf.write(c); c = in.read() }
    val raw = buf.toByteArray
    val n = if (raw.nonEmpty && raw(raw.length - 1) == '\r') raw.length - 1
      else raw.length
    Some(new String(raw, 0, n, ISO_8859_1))
  }

  private def readFully(in: InputStream, n: Int, ctx: => String): Array[Byte] = {
    val b = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(b, off, n - off)
      if (r < 0) throw new EOFException(s"truncated WARC payload: $ctx")
      off += r
    }
    b
  }

  private def skipFully(in: InputStream, n: Long, ctx: => String): Unit = {
    var left = n
    val buf = new Array[Byte](64 * 1024)
    while (left > 0) {
      val r = in.read(buf, 0, math.min(left, buf.length.toLong).toInt)
      if (r < 0) throw new EOFException(s"truncated WARC payload: $ctx")
      left -= r
    }
  }

  /** One parsed record: (type, headers, payload or None if oversized). */
  private[graft] final case class Rec(
      warcType: String, headers: Map[String, String],
      payload: Option[Array[Byte]])

  /** Observability hook for lenient truncation: a lenient parse that
    * actually DROPS a damaged tail logs a warning (executor stderr) so
    * silently-shortened shards are discoverable in the logs — the
    * stream proceeding on a good prefix is the intended behavior, the
    * drop being invisible was not (r5 advice).
    */
  private def warnTruncated(file: String, e: Exception): Unit =
    org.slf4j.LoggerFactory.getLogger(getClass)
      .warn(s"lenient WARC parse truncated at a damaged record in $file: " +
        s"${e.getClass.getSimpleName}: ${e.getMessage}")

  /** Streaming record iterator over one (possibly gzipped) WARC stream.
    * Strict by default: a truncated or damaged record raises with file
    * context; a `lenientTail` reader instead ends the iterator at the
    * first bad record (the operational CC stance for damaged shards) —
    * covering truncation (EOFException), gzip damage (ZipException),
    * and malformed structure (any other IOException) alike.
    */
  private[graft] def records(in0: InputStream, file: String,
      maxPayload: Int, lenientTail: Boolean): Iterator[Rec] = {
    val in = new BufferedInputStream(
      if (file.endsWith(".gz")) new GZIPInputStream(
        new BufferedInputStream(in0, 1 << 16), 1 << 16)
      else in0, 1 << 16)
    new Iterator[Rec] {
      private var nextRec: Rec = _
      private var done = false
      private def advance(): Unit = {
        try {
          // tolerate blank lines between records (some writers pad)
          var line = readLine(in)
          while (line.exists(_.isEmpty)) line = readLine(in)
          line match {
            case None => done = true
            case Some(v) if !v.startsWith("WARC/") =>
              throw new IOException(s"bad WARC version line '$v' in $file")
            case Some(_) =>
              val hdrs = Map.newBuilder[String, String]
              var h = readLine(in).getOrElse(
                throw new EOFException(s"truncated WARC header in $file"))
              while (h.nonEmpty) {
                val i = h.indexOf(':')
                if (i > 0) hdrs += h.substring(0, i).trim.toLowerCase ->
                  h.substring(i + 1).trim
                h = readLine(in).getOrElse(
                  throw new EOFException(s"truncated WARC header in $file"))
              }
              val m = hdrs.result()
              val len = m.getOrElse("content-length",
                throw new IOException(s"WARC record without Content-Length in $file"))
                .toLong
              val typ = m.getOrElse("warc-type", "")
              val payload =
                if (len > maxPayload) { skipFully(in, len, file); None }
                else Some(readFully(in, len.toInt, file))
              // record terminator: two CRLFs
              skipFully(in, 4, file)
              nextRec = Rec(typ, m, payload)
          }
        } catch {
          // EOFException = truncation; ZipException = gzip damage; the
          // rest of the IOException space = malformed structure (bad
          // version line, missing Content-Length, non-numeric length) —
          // lenient mode must survive ALL of them or a single damaged
          // shard poisons the job
          case e: IOException =>
            if (lenientTail) { warnTruncated(file, e); done = true }
            else if (e.getMessage != null && e.getMessage.contains(file)) throw e
            else throw new IOException(
              s"damaged WARC record in $file (use lenientTail to tolerate)", e)
          case e: NumberFormatException =>
            if (lenientTail) { warnTruncated(file, e); done = true }
            else throw new IOException(
              s"malformed Content-Length in $file (use lenientTail to tolerate)", e)
        }
      }
      advance()
      override def hasNext: Boolean = !done
      override def next(): Rec = {
        val r = nextRec; advance(); r
      }
    }
  }

  /** Parse an `application/http; msgtype=response` payload into
    * (status, content-type, body). Returns None for non-HTTP payloads.
    */
  private[graft] def parseHttp(payload: Array[Byte])
      : Option[(Int, String, Array[Byte])] = {
    // header/body split: first CRLFCRLF
    var i = 0
    var split = -1
    while (split < 0 && i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
        payload(i + 2) == '\r' && payload(i + 3) == '\n') split = i
      i += 1
    }
    if (split < 0) return None
    val head = new String(payload, 0, split, ISO_8859_1)
    val lines = head.split("\r\n")
    val status = lines.headOption.flatMap { s =>
      val p = s.split(" ")
      if (p.length >= 2 && p(0).startsWith("HTTP/")) p(1).toIntOption else None
    }
    status.map { st =>
      val ctype = lines.drop(1).collectFirst {
        case l if l.toLowerCase.startsWith("content-type:") =>
          l.substring(l.indexOf(':') + 1).trim
      }.getOrElse("")
      val body = java.util.Arrays.copyOfRange(payload, split + 4, payload.length)
      (st, ctype, body)
    }
  }

  /** Read WARC shards matching `glob` into the raw record frame
    * (`readSchema`): response records only, one row per record.
    * `rec_seq` is the per-file ordinal over EMITTED rows plus oversized
    * drops: warcinfo/request/metadata records (which real CC crawl
    * shards interleave per capture) do not advance it, and neither does
    * a response whose HTTP head fails to parse (no row, no gap) — so a
    * gap in the emitted sequence means exactly one thing: an oversized
    * response was dropped at `maxPayload`.
    */
  def read(spark: SparkSession, glob: String,
      maxPayload: Int = 8 << 20, lenientTail: Boolean = false): DataFrame = {
    val p = new Path(glob)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = Option(fs.globStatus(p)).getOrElse(Array.empty)
      .filter(_.isFile).map(_.getPath.toString).sorted
    val hc = sessionConf(spark)
    // one task per shard: the format's parallelism unit (see object doc)
    val rdd = spark.sparkContext
      .parallelize(files.toIndexedSeq, math.max(files.length, 1))
      .flatMap { file =>
        val path = new Path(file)
        val in = path.getFileSystem(hc.conf).open(path)
        // release the FS stream even on failed/short-circuited tasks
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => in.close())
        var seq = -1
        records(in, file, maxPayload, lenientTail).flatMap { r =>
          val isHttpResponse = r.warcType == "response" &&
            r.headers.getOrElse("content-type", "").startsWith("application/http")
          if (!isHttpResponse) None
          else r.payload match {
            case None => seq += 1; None // oversized drop: the ONE gap cause
            case Some(p) => parseHttp(p) match {
              case None => None // malformed HTTP head: no row, no gap
              case Some((st, ct, body)) =>
                seq += 1
                val ts = Timestamp.from(Instant.from(WarcDate.parse(
                  r.headers.getOrElse("warc-date",
                    throw new IOException(s"response record without WARC-Date in $file")))))
                Some(Row(r.headers.getOrElse("warc-target-uri", ""), ts, body,
                  st, ct, file, seq))
            }
          }
        }
      }
    spark.createDataFrame(rdd, readSchema)
  }

  /** Parse one shard's bytes into Page rows — the STREAMING ingest
    * unit: structured streaming's binaryFile source delivers whole
    * shards, so per-task memory is bounded by shard size (size crawl
    * shards to the micro-batch budget). text/lang derived exactly as
    * [[ingest]] derives them.
    */
  private[graft] def parsePages(bytes: Array[Byte], file: String,
      maxPayload: Int, lenientTail: Boolean): Iterator[Page] =
    records(new java.io.ByteArrayInputStream(bytes), file, maxPayload,
      lenientTail).flatMap { r =>
      if (r.warcType != "response") None
      else if (!r.headers.getOrElse("content-type", "")
        .startsWith("application/http")) None
      else r.payload.flatMap(parseHttp).map { case (_, _, body) =>
        val ts = Timestamp.from(Instant.from(WarcDate.parse(
          r.headers.getOrElse("warc-date",
            throw new IOException(s"response record without WARC-Date in $file")))))
        val text = graft.functions.Html.extractText(body)
        Page(r.headers.getOrElse("warc-target-uri", ""), ts, body, text,
          graft.operators.TextStats.detectLang(text))
      }
    }

  // ------------------------------ WET ------------------------------

  /** WARC/1.0 `conversion` record — the record type WET files (CC's
    * extracted-text distribution) are made of: text/plain payload, no
    * HTTP envelope.
    */
  private[graft] def conversionRecord(url: String, ts: Timestamp,
      text: String): Array[Byte] = {
    val payload = text.getBytes(UTF_8)
    val date = WarcDate.format(Instant.ofEpochSecond(ts.getTime / 1000L))
    val recId = {
      val md = java.security.MessageDigest.getInstance("SHA-1")
      md.update(url.getBytes(UTF_8)); md.update(date.getBytes(ISO_8859_1))
      "urn:sha1:" + md.digest().map("%02x".format(_)).mkString
    }
    val out = new ByteArrayOutputStream()
    out.write(("WARC/1.0\r\n" +
      "WARC-Type: conversion\r\n" +
      s"WARC-Record-ID: <$recId>\r\n" +
      s"WARC-Date: $date\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      "Content-Type: text/plain; charset=UTF-8\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes(ISO_8859_1))
    out.write(payload)
    out.write("\r\n\r\n".getBytes(ISO_8859_1))
    out.toByteArray
  }

  /** Write `(url, warc_ts, text)` rows as WET shards (`*.warc.wet.gz`,
    * gzip member per conversion record, warcinfo lead) — the format a
    * released TEXT corpus ships in (Common Crawl's WET). Same shard-
    * per-partition, attempt-safe temp+rename discipline as [[write]].
    * Returns shard count.
    */
  def writeWet(docs: DataFrame, dir: String,
      urlCol: String = "url", tsCol: String = "warc_ts",
      textCol: String = "text"): Long = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hc = sessionConf(spark)
    docs.select(col(urlCol), col(tsCol), col(textCol))
      .as[(String, Timestamp, String)]
      .rdd.mapPartitionsWithIndex { (idx, it) =>
        if (!it.hasNext) Iterator.empty
        else {
          val name = f"part-$idx%05d.warc.wet.gz"
          val path = new Path(dir, name)
          val tc = org.apache.spark.TaskContext.get()
          val attempt = if (tc != null) tc.taskAttemptId() else 0L
          val tmpPath = new Path(dir, s".$name.attempt-$attempt.tmp")
          val fs = path.getFileSystem(hc.conf)
          val out = fs.create(tmpPath, true)
          var open = true
          def abort(): Unit = if (open) {
            open = false; out.close(); fs.delete(tmpPath, false); ()
          }
          if (tc != null) tc.addTaskCompletionListener[Unit](_ => abort())
          def member(bytes: Array[Byte]): Unit = {
            val gz = new GZIPOutputStream(new CloseShield(out))
            gz.write(bytes); gz.close()
          }
          member(warcinfoRecord(name))
          var n = 0L
          it.foreach { case (url, ts, text) =>
            member(conversionRecord(url, ts, text)); n += 1
          }
          open = false; out.close()
          // first-writer-wins, no delete of the final path (see cdxRows)
          if (fs.exists(path) || !fs.rename(tmpPath, path)) {
            if (!fs.exists(path))
              throw new IOException(s"cannot commit WET shard $path")
            fs.delete(tmpPath, false); ()
          }
          Iterator.single(1L)
        }
      }.fold(0L)(_ + _)
  }

  /** Read WET shards: conversion records → (url, warc_ts, text). */
  def readWet(spark: SparkSession, glob: String,
      maxPayload: Int = 8 << 20, lenientTail: Boolean = false): DataFrame = {
    val p = new Path(glob)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = Option(fs.globStatus(p)).getOrElse(Array.empty)
      .filter(_.isFile).map(_.getPath.toString).sorted
    val hc = sessionConf(spark)
    val rdd = spark.sparkContext
      .parallelize(files.toIndexedSeq, math.max(files.length, 1))
      .flatMap { file =>
        val path = new Path(file)
        val in = path.getFileSystem(hc.conf).open(path)
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => in.close())
        records(in, file, maxPayload, lenientTail).flatMap { r =>
          if (r.warcType != "conversion") None
          else r.payload.map { body =>
            val ts = Timestamp.from(Instant.from(WarcDate.parse(
              r.headers.getOrElse("warc-date",
                throw new IOException(s"conversion record without WARC-Date in $file")))))
            Row(r.headers.getOrElse("warc-target-uri", ""), ts,
              new String(body, UTF_8))
          }
        }
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("url", StringType, nullable = false),
      StructField("warc_ts", TimestampType, nullable = false),
      StructField("text", StringType, nullable = false))))
  }

  /** The full ingest: WARC shards → the north-rule page table. `text`
    * and `lang` are DERIVED columns (Common Crawl ships neither): text
    * via the engine's own extraction (byte-identical per url to the
    * pipeline's S4 stage by construction — same function) and lang via
    * the deterministic stopword argmax the quality family uses.
    */
  def ingest(spark: SparkSession, glob: String,
      maxPayload: Int = 8 << 20, lenientTail: Boolean = false): Dataset[Page] = {
    import spark.implicits._
    read(spark, glob, maxPayload, lenientTail)
      .select("url", "warc_ts", "html")
      .as[(String, Timestamp, Array[Byte])]
      .map { case (url, ts, html) =>
        val text = graft.functions.Html.extractText(html)
        Page(url, ts, html, text, graft.operators.TextStats.detectLang(text))
      }
  }
}
