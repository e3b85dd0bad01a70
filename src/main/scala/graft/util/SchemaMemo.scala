package graft.util

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** Once-per-file-state parquet schema memo (round 22, guide §1/§7.3).
  *
  * A schemaless `spark.read.parquet` runs a footer-inference JOB per
  * call (~30–75 ms plus a driver gap on this box), and the serving/probe
  * paths re-read the same immutable artifact trees on every query — the
  * round-21 fixed-schema change covered the artifacts whose schema is a
  * store-format constant, but the ID-TYPED artifacts (codes, signatures,
  * bands, postings, doclens, tombstones) deliberately kept inference
  * because their id column's type belongs to the caller. This memo keeps
  * that ownership — the type is still read from the artifact's own
  * footers, never assumed — but reads it ONCE PER FILE STATE instead of
  * once per query: the memo key is the path plus a freshness token over
  * the root's mtime and its direct children (names + mtimes), so any
  * single-writer mutation of the tree (append subdir, compaction swap,
  * tombstone write, testdata regeneration — the ADVICE r21 tblSchemas
  * hole) changes the token and forces re-inference. This is exactly the
  * metadata a catalog/metastore would hold; DATA is re-read from parquet
  * on every call as before.
  *
  * Posture and limits:
  *   - local-filesystem paths only (the bench/test regime; production
  *     object stores put this metadata in a real catalog): non-local or
  *     unreadable paths get a never-matching token and fall back to
  *     plain per-call inference — behavior, not just results, unchanged.
  *   - the token sees one directory level; mutating files INSIDE an
  *     existing subdirectory without touching the root or a direct
  *     child is invisible to it. The artifact stores never do that
  *     (appends create fresh batch-scoped subdirectories; compactions
  *     publish sibling versioned trees and bump the manifest), and the
  *     single-writer operating contract forbids a probe racing a
  *     half-written append.
  *   - `-Dgraft.schemaMemo=0` disables (diagnostic/A-B arm).
  */
object SchemaMemo {
  private val memo = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  private def enabled: Boolean = !"0".equals(System.getProperty("graft.schemaMemo"))

  /** Freshness token: root mtime (+ size for a plain file) and a fold
    * over direct children's names and mtimes. Throws → caller skips the
    * memo for this call. */
  private def token(path: String): String = {
    val p = java.nio.file.Paths.get(
      if (path.startsWith("file:")) new java.net.URI(path).getPath else path)
    val root = java.nio.file.Files.getLastModifiedTime(p).toMillis
    if (!java.nio.file.Files.isDirectory(p))
      s"f$root-${java.nio.file.Files.size(p)}"
    else {
      var acc = root
      var n = 0
      val s = java.nio.file.Files.list(p)
      try {
        val it = s.iterator()
        while (it.hasNext) {
          val c = it.next()
          acc = acc * 31 + c.getFileName.toString.hashCode +
            java.nio.file.Files.getLastModifiedTime(c).toMillis
          n += 1
        }
      } finally s.close()
      s"d$root-$n-$acc"
    }
  }

  /** `spark.read.parquet(path)` with once-per-file-state schema
    * inference. `recursive` mirrors the stores' recursiveFileLookup
    * reads (flat tree + delta subdirectories). */
  def parquet(spark: SparkSession, path: String, recursive: Boolean = false): DataFrame = {
    def reader: DataFrameReader = {
      val r = spark.read
      if (recursive) r.option("recursiveFileLookup", "true") else r
    }
    val key =
      if (!enabled) None
      else try Some(s"$path@$recursive@${token(path)}") catch { case _: Throwable => None }
    key match {
      case None => reader.parquet(path)
      case Some(k) =>
        val schema = memo.computeIfAbsent(k, _ => reader.parquet(path).schema)
        reader.schema(schema).parquet(path)
    }
  }
}
