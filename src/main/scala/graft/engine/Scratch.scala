package graft.engine

import java.nio.file.Files

/** Process-scoped scratch directories for queries that materialize an
  * at-rest layout mid-flight (IVF corpus copies, fixture grids).
  *
  * Contract: `dir(key)` returns ONE unique directory per (process ×
  * key), created lazily — repeated invocations of the same query reuse
  * it (writers use mode("overwrite")), so a bench loop does not grow
  * the temp dir by a corpus copy per run; a JVM shutdown hook deletes
  * everything this process created, so repeated driver rounds do not
  * accumulate unbounded disk. The path is still UNIQUE per process
  * (`createTempDirectory`), never fixed — two concurrent processes
  * must not race each other's overwrite-while-read.
  *
  * Callers must fully materialize a result built over a scratch dir
  * before re-invoking the same query (true of the Verify/Bench
  * harnesses, which collect each query before the next run).
  */
object Scratch {
  private val dirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    dirs.values.forEach { d =>
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
      catch { case _: Throwable => () } // exit-time best effort
    }
  }))

  /** The process-stable scratch dir for `key` (created on first use). */
  def dir(key: String): String =
    dirs.computeIfAbsent(key, k =>
      Files.createTempDirectory(k.replaceAll("[^A-Za-z0-9_.-]", "_")).toString)
}
