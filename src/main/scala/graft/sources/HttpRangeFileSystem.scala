package graft.sources

import java.io.{EOFException, FileNotFoundException, IOException, InputStream}
import java.net.{HttpURLConnection, URI, URL}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** A3 — read-only, SEEKABLE Hadoop FileSystem over plain HTTP, so
  * `spark.read.parquet("http://host/file.parquet")` works end to end
  * (reference: data_engine.py:242-248 reads parquet from a mirror URL;
  * default at config/default_settings.yaml:37).
  *
  * Hadoop's own `org.apache.hadoop.fs.http.HttpFileSystem` cannot serve
  * parquet: its `getFileStatus` hardcodes length -1 and its stream
  * cannot seek, while the parquet reader needs the file length (footer
  * lives at `len - 8`) and random access into column chunks. This
  * implementation is the S3A access pattern over vanilla HTTP/1.1:
  *
  *   - `getFileStatus` = one HEAD request; length from Content-Length;
  *   - `open` = an [[FSInputStream]] that materializes a connection
  *     lazily with `Range: bytes=pos-` on first read after a seek, so a
  *     seek is free and N seeks cost N GETs, not N full downloads;
  *   - positioned reads (`read(position, ...)` — the parquet footer and
  *     column-chunk path) issue INDEPENDENT bounded range GETs
  *     (`bytes=a-b`) and never disturb the sequential stream.
  *
  * At 100 TB this matters the same way it does on S3: a column-pruned
  * scan over remote parquet fetches only the projected chunks' byte
  * ranges. Directories don't exist over plain HTTP, so paths must be
  * explicit file URLs (`listStatus` of a file returns itself — exactly
  * what Spark's file index needs for explicit multi-file reads). All
  * mutation entry points throw: the scheme is read-only by design.
  *
  * Resilience (the S3A discipline, conf-driven like `fs.s3a.*`):
  * every connection gets connect/read timeouts so a hung server fails
  * the request instead of blocking an executor task forever, and every
  * request (HEAD, sequential GET, ranged GET) is retried with
  * exponential backoff on transient failures — connection resets and
  * 5xx — but never on 4xx (a 404 is a real answer, and task-level
  * retry would only re-read whole splits for a deterministic error):
  *
  *   - `fs.graft.http.connect.timeout.ms` (default 30 000)
  *   - `fs.graft.http.read.timeout.ms`    (default 60 000)
  *   - `fs.graft.http.retries`            (default 3 — attempts = 1+3)
  *   - `fs.graft.http.retry.interval.ms`  (default 100, doubled per try)
  */
class HttpRangeFileSystem extends FileSystem {

  private var fsUri: URI = _
  private var workingDir: Path = _

  override def getScheme: String = "http"

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    fsUri = URI.create(s"${name.getScheme}://${name.getAuthority}")
    workingDir = new Path("/")
  }

  override def getUri: URI = fsUri

  private def policy: HttpRetryPolicy = {
    val c = getConf
    HttpRetryPolicy(
      connectTimeoutMs = c.getInt("fs.graft.http.connect.timeout.ms", 30000),
      readTimeoutMs = c.getInt("fs.graft.http.read.timeout.ms", 60000),
      retries = c.getInt("fs.graft.http.retries", 3),
      retryIntervalMs = c.getLong("fs.graft.http.retry.interval.ms", 100L))
  }

  private def urlOf(f: Path): URL = {
    val u = f.toUri
    val abs =
      if (u.getScheme != null && u.getAuthority != null) u
      else fsUri.resolve(u)
    abs.toURL
  }

  override def getFileStatus(f: Path): FileStatus = {
    val p = policy
    p.withRetries(s"HEAD $f") {
      val conn = p.connect(urlOf(f))
      try {
        conn.setRequestMethod("HEAD")
        conn.setInstanceFollowRedirects(true)
        val code = conn.getResponseCode
        if (code == HttpURLConnection.HTTP_NOT_FOUND)
          throw new FileNotFoundException(f.toString)
        if (code >= 400)
          throw HttpRetryPolicy.statusException(code, s"HEAD $f failed: HTTP $code")
        val len = conn.getHeaderFieldLong("Content-Length", -1L)
        if (len < 0)
          throw new IOException(
            s"HEAD $f returned no Content-Length — cannot serve seekable reads")
        val mtime = math.max(0L, conn.getLastModified)
        // blockSize only steers split sizing; 128 MB matches HDFS default
        new FileStatus(len, false, 1, 128L * 1024 * 1024, mtime, makeQualified(f))
      } finally conn.disconnect()
    }
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val len = getFileStatus(f).getLen
    new FSDataInputStream(new HttpRangeInputStream(urlOf(f), len, policy))
  }

  /** No directory listings over plain HTTP: a file lists as itself
    * (what globbing/file-index code calls on explicit file paths).
    */
  override def listStatus(f: Path): Array[FileStatus] = Array(getFileStatus(f))

  override def getWorkingDirectory: Path = workingDir
  override def setWorkingDirectory(dir: Path): Unit = workingDir = dir

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(s"$getScheme filesystem is read-only: $op")
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = readOnly("create")
  override def append(f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    readOnly("append")
  override def rename(src: Path, dst: Path): Boolean = readOnly("rename")
  override def delete(f: Path, recursive: Boolean): Boolean = readOnly("delete")
  override def mkdirs(f: Path, permission: FsPermission): Boolean = readOnly("mkdirs")
}

/** Same filesystem for TLS endpoints (`fs.https.impl`). */
class HttpsRangeFileSystem extends HttpRangeFileSystem {
  override def getScheme: String = "https"
}

/** Timeout + bounded-retry policy for one filesystem instance (read
  * once from the Hadoop conf; see [[HttpRangeFileSystem]] Scaladoc for
  * the keys and defaults).
  */
private[sources] final case class HttpRetryPolicy(
    connectTimeoutMs: Int,
    readTimeoutMs: Int,
    retries: Int,
    retryIntervalMs: Long,
) {

  /** Open a connection with the policy's timeouts applied — the ONLY
    * way this package opens HTTP connections, so no call site can hang
    * an executor task on a wedged server.
    */
  def connect(url: URL): HttpURLConnection = {
    val conn = url.openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    conn
  }

  /** Run `op`, retrying up to `retries` times with exponential backoff
    * on transient IO failures (resets, timeouts, 5xx). Deterministic
    * answers — 404 (`FileNotFoundException`) and other 4xx
    * ([[HttpRetryPolicy.HttpStatusException]] below 500) — propagate
    * immediately: re-asking cannot change them.
    */
  def withRetries[A](what: => String)(op: => A): A = {
    var attempt = 0
    var backoff = retryIntervalMs
    while (true) {
      try return op
      catch {
        case e: FileNotFoundException => throw e
        case e: HttpRetryPolicy.HttpStatusException if e.code < 500 => throw e
        case e: IOException =>
          attempt += 1
          if (attempt > retries) throw e
          try Thread.sleep(backoff)
          catch {
            case ie: InterruptedException =>
              Thread.currentThread().interrupt()
              throw e
          }
          backoff *= 2
      }
    }
    throw new IllegalStateException(s"unreachable: $what")
  }
}

private[sources] object HttpRetryPolicy {
  /** IOException carrying the HTTP status so retry logic can separate
    * transient 5xx from deterministic 4xx.
    */
  final class HttpStatusException(val code: Int, msg: String) extends IOException(msg)

  def statusException(code: Int, msg: String): IOException =
    new HttpStatusException(code, msg)
}

/** Seekable HTTP stream: lazy connection with a `Range: bytes=pos-`
  * header, re-opened only when a seek actually moves the position.
  * Positioned reads go through separate bounded-range requests. All
  * requests run under `policy`'s timeouts; sequential reads that die
  * mid-stream retry by reopening at the current position (reads only
  * advance `pos` by bytes actually delivered, so a resumed request
  * continues exactly where the wire broke).
  */
private[sources] class HttpRangeInputStream(url: URL, len: Long, policy: HttpRetryPolicy)
    extends FSInputStream {

  private var pos = 0L
  private var in: InputStream = _

  private def closeStream(): Unit = {
    if (in != null) {
      try in.close() catch { case _: IOException => }
      in = null
    }
  }

  private def ensureOpen(): Unit = {
    if (in == null) {
      val conn = policy.connect(url)
      var ok = false
      try {
        if (pos > 0) conn.setRequestProperty("Range", s"bytes=$pos-")
        val code = conn.getResponseCode
        if (code != HttpURLConnection.HTTP_OK && code != HttpURLConnection.HTTP_PARTIAL)
          throw HttpRetryPolicy.statusException(code, s"GET $url (from $pos) failed: HTTP $code")
        in = conn.getInputStream
        if (pos > 0 && code == HttpURLConnection.HTTP_OK) {
          // server ignored Range: burn the prefix so semantics stay right
          var remaining = pos
          while (remaining > 0) {
            val skipped = in.skip(remaining)
            if (skipped <= 0) {
              if (in.read() < 0) throw new EOFException(s"EOF skipping to $pos in $url")
              remaining -= 1
            } else remaining -= skipped
          }
        }
        ok = true
      } finally if (!ok) { closeStream(); conn.disconnect() }
    }
  }

  override def getPos: Long = pos

  override def seek(p: Long): Unit = {
    if (p < 0 || p > len) throw new EOFException(s"seek($p) outside [0, $len] for $url")
    if (p != pos) { closeStream(); pos = p }
  }

  override def seekToNewSource(targetPos: Long): Boolean = false

  override def read(): Int = {
    if (pos >= len) return -1
    policy.withRetries(s"GET $url @$pos") {
      try {
        ensureOpen()
        val b = in.read()
        if (b >= 0) pos += 1 else closeStream()
        b
      } catch { case e: IOException => closeStream(); throw e }
    }
  }

  override def read(buf: Array[Byte], off: Int, length: Int): Int = {
    if (length == 0) return 0
    if (pos >= len) return -1
    policy.withRetries(s"GET $url @$pos") {
      try {
        ensureOpen()
        val n = in.read(buf, off, length)
        if (n > 0) pos += n else closeStream()
        n
      } catch { case e: IOException => closeStream(); throw e }
    }
  }

  /** Positioned read: one independent `bytes=a-b` request, sequential
    * stream untouched (parquet reads its footer and column chunks this
    * way — reopening the main stream per chunk would thrash). The whole
    * request is idempotent, so the retry wraps it wholesale.
    */
  override def read(position: Long, buffer: Array[Byte], offset: Int, length: Int): Int = {
    if (position >= len) return -1
    val want = math.min(length.toLong, len - position).toInt
    if (want <= 0) return 0
    policy.withRetries(s"ranged GET $url [$position, +$want)") {
      val conn = policy.connect(url)
      try {
        conn.setRequestProperty("Range", s"bytes=$position-${position + want - 1}")
        val code = conn.getResponseCode
        if (code != HttpURLConnection.HTTP_PARTIAL && code != HttpURLConnection.HTTP_OK)
          throw HttpRetryPolicy.statusException(code,
            s"ranged GET $url [$position, +$want) failed: HTTP $code")
        val s = conn.getInputStream
        try {
          if (code == HttpURLConnection.HTTP_OK && position > 0) {
            var remaining = position
            while (remaining > 0) {
              val skipped = s.skip(remaining)
              if (skipped <= 0) {
                if (s.read() < 0) throw new EOFException(s"EOF skipping to $position in $url")
                remaining -= 1
              } else remaining -= skipped
            }
          }
          var done = 0
          var eof = false
          while (done < want && !eof) {
            val n = s.read(buffer, offset + done, want - done)
            if (n < 0) eof = true else done += n
          }
          if (done == 0 && eof) -1 else done
        } finally s.close()
      } finally conn.disconnect()
    }
  }

  override def close(): Unit = closeStream()
}
