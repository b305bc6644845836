package graft.util

import org.apache.spark.sql.DataFrame

/** Registry for operator-internal persisted frames (sketch/shingle tables
  * reused across self-join branches). Operators register via [[scoped]];
  * session drivers (Verify/Bench) call [[releaseAll]] between queries so a
  * long-lived session's storage memory stays bounded instead of
  * accumulating one cached frame per invocation. */
object Caches {
  private val frames = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  def scoped(df: DataFrame): DataFrame = {
    df.persist()
    frames.add(df)
    df
  }

  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  /** Materialize a corpus-scaled intermediate OUTSIDE the block manager:
    * write it as compressed parquet and hand back a scan of the file.
    * Block-manager caching (any storage level) competes with execution for
    * the unified pool — at 100M+ rows the cached blocks squat the protected
    * storage region and 32 concurrent shuffle sorters thrash against what's
    * left ("Unable to acquire 32768 bytes, got 0", measured on g2's sf10
    * run even with MEMORY_AND_DISK_SER). A parquet spill costs one write
    * plus columnar re-scans, keeps ZERO bytes of heap between stages, and
    * is exactly what a production job does when it checkpoints a reused
    * intermediate to the cluster FS. Honors an explicit checkpoint dir when
    * the session has one (the cluster case — local temp would not be shared
    * across executors); falls back to a process-local temp dir. */
  def material(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val base = spark.sparkContext.getCheckpointDir match {
      case Some(cp) => new org.apache.hadoop.fs.Path(cp, "graft-mat-" +
        java.util.UUID.randomUUID().toString.take(12)).toString
      case None =>
        val p = java.nio.file.Files.createTempDirectory("graft-mat-")
        dirs.add(p)
        p.toString
    }
    df.write.mode("overwrite").parquet(base)
    spark.read.parquet(base)
  }

  def releaseAll(): Unit = {
    var f = frames.poll()
    while (f != null) { f.unpersist(blocking = false); f = frames.poll() }
    var d = dirs.poll()
    while (d != null) {
      try {
        val walk = java.nio.file.Files.walk(d)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
        finally walk.close()
      } catch { case _: java.io.IOException => () }
      d = dirs.poll()
    }
  }
}
