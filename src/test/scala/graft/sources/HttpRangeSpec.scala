package graft.sources

import java.io.FileNotFoundException
import java.net.{HttpURLConnection, URI, URL}
import java.nio.file.Files

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** Protocol-level edge cases of the A3 stack: the loopback server's
  * RFC 7233 behavior and the filesystem's seek/positioned-read/error
  * semantics, independent of any Spark scan (RawSourcesSpec covers the
  * end-to-end parquet path).
  */
class HttpRangeSpec extends SparkSpec {

  private lazy val (root, port) = {
    val dir = Files.createTempDirectory("graft_httprange")
    Files.write(dir.resolve("blob.bin"), Array.tabulate[Byte](10000)(i => (i % 251).toByte))
    val (p, _) = LoopbackHttpServer.serve(dir.toString)
    (dir, p)
  }

  private def fs = {
    val f = new HttpRangeFileSystem
    f.initialize(URI.create(s"http://127.0.0.1:$port"),
      spark.sparkContext.hadoopConfiguration)
    f
  }

  test("getFileStatus: length from HEAD; missing file is FileNotFoundException") {
    assert(fs.getFileStatus(new Path(s"http://127.0.0.1:$port/blob.bin")).getLen == 10000L)
    intercept[FileNotFoundException] {
      fs.getFileStatus(new Path(s"http://127.0.0.1:$port/nope.bin"))
    }
  }

  test("path traversal out of the served root is a 404, not a file read") {
    val conn = new URL(s"http://127.0.0.1:$port/../../etc/hostname")
      .openConnection().asInstanceOf[HttpURLConnection]
    // raw request: URL normalization would strip the dots client-side
    conn.setRequestProperty("Accept", "*/*")
    assert(conn.getResponseCode == 404)
  }

  test("out-of-range request answers 416 with a Content-Range total") {
    val conn = new URL(s"http://127.0.0.1:$port/blob.bin")
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestProperty("Range", "bytes=999999-")
    assert(conn.getResponseCode == 416)
    assert(conn.getHeaderField("Content-Range") == "bytes */10000")
  }

  test("seek + sequential read and positioned read return the right bytes") {
    val in = fs.open(new Path(s"http://127.0.0.1:$port/blob.bin"), 4096)
    try {
      // forward seek, sequential read
      in.seek(5000)
      val buf = new Array[Byte](16)
      in.readFully(buf)
      assert(buf.toSeq == (5000 until 5016).map(i => (i % 251).toByte))
      assert(in.getPos == 5016)
      // positioned read must not disturb the stream position
      val pbuf = new Array[Byte](8)
      in.readFully(123L, pbuf)
      assert(pbuf.toSeq == (123 until 131).map(i => (i % 251).toByte))
      assert(in.getPos == 5016)
      // backward seek re-opens transparently
      in.seek(0)
      assert(in.read() == 0)
      // EOF: reads at/after length answer -1
      in.seek(10000)
      assert(in.read() == -1)
    } finally in.close()
  }

  test("listStatus of a file is the file itself (explicit-URL file index contract)") {
    val st = fs.listStatus(new Path(s"http://127.0.0.1:$port/blob.bin"))
    assert(st.length == 1 && st(0).getLen == 10000L && !st(0).isDirectory)
  }
}
