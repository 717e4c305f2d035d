package graft.util

import java.nio.file.{Files, Path, Paths}

/** RAM-backed scratch directories for local-mode transient state.
  *
  * Streaming checkpoints, staged stream sources, and foreachBatch
  * sinks are TRANSIENT in this engine's local bench/verify runs — they
  * live for one query invocation — yet `java.io.tmpdir` usually sits
  * on a real disk, so every micro-batch pays ext4 fsyncs for offset
  * logs, state-store commit files, and sink parquet that nothing ever
  * re-reads after the session. Place that scratch on tmpfs
  * (`/dev/shm`) when one is mounted; fall back to the JVM tmpdir
  * otherwise.
  *
  * On a real cluster none of this code path matters: checkpoint and
  * sink locations are durable URIs (HDFS/S3) supplied by the job
  * config, never a local temp dir — durability there is the point,
  * while here the dirs are deleted at JVM exit anyway (shutdown
  * hook), so tmpfs loses nothing.
  */
object Scratch {
  private val base: Path = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) shm.toPath
    else Paths.get(System.getProperty("java.io.tmpdir"))
  }

  private val cleanup =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    cleanup.forEach { d =>
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(d))
    }))

  /** A fresh scratch dir under the RAM base, deleted at JVM exit. */
  def tempDir(prefix: String): String = {
    val out = Files.createTempDirectory(base, prefix).toString
    cleanup.add(out)
    out
  }
}
