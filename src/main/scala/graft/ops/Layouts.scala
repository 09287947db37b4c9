package graft.ops

import org.apache.spark.sql.{Row, SparkSession}

/** Shared plumbing for the at-rest index layouts' sidecar files
  * (`_meta` under a [[Dedup.writeNearDupIndex]] signature index,
  * `_codebooks` under a [[Similarity.writeIvfPqPartitioned]] vector
  * layout).
  *
  * Presence is decided by an explicit filesystem check, NOT by
  * catching `AnalysisException` from the read: a present-but-corrupt
  * sidecar (e.g. an interrupted write that left an empty directory)
  * raises the same exception as absence, and treating it as "absent"
  * silently skips exactly the validation the sidecar exists to
  * enforce (r14 ADVICE). With the explicit check, absence is the only
  * condition that may skip validation; every failure reading a
  * PRESENT sidecar surfaces as a curated error.
  */
private[graft] object Layouts {

  /** Subdirectory of a layout holding a streaming loop's per-batch
    * increments (`_increments/ingest_batch=<id>`). Underscore-prefixed
    * like `_meta`/`_codebooks`, so a plain `spark.read.parquet` of the
    * base layout never sees increment rows — readers opt in via
    * [[withIncrements]] (or fold them into a new base generation with
    * the family's compaction).
    */
  val IncrementsDir = "_increments"

  /** `base` unioned with the layout's committed per-batch increment
    * directories, projected to `cols`. `excludeBatchId` drops that
    * batch's OWN directory — the replay rule: a crash-replayed batch
    * must see exactly the history its first attempt saw, never its own
    * previous partial appends. The directories are LISTED and read by
    * explicit path (not partition discovery over the `_increments`
    * root), so the one directory that may hold a torn write from a
    * crashed attempt — the excluded batch's own — is never opened.
    */
  def withIncrements(spark: SparkSession, base: org.apache.spark.sql.DataFrame,
      path: String, cols: Seq[String],
      excludeBatchId: Option[Long]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val root = new org.apache.hadoop.fs.Path(path, IncrementsDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val projected = base.select(cols.map(col): _*)
    if (!fs.exists(root)) projected
    else {
      val dirs = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
        .filter { p =>
          p.getName.startsWith("ingest_batch=") &&
            excludeBatchId.forall(b => p.getName != s"ingest_batch=$b")
        }
      if (dirs.isEmpty) projected
      else projected.unionByName(
        // basePath anchors partition inference at the _increments root:
        // without it, increments whose INSIDES are partitioned (the ANN
        // layout's cell=... dirs) make multi-directory discovery fail
        // with CONFLICTING_DIRECTORY_STRUCTURES; with it, the reader
        // surfaces ingest_batch (and any inner partition column) and
        // the projection drops what the caller didn't ask for
        spark.read.option("basePath", root.toString)
          .parquet(dirs.map(_.toString).toIndexedSeq: _*)
          .select(cols.map(col): _*))
    }
  }

  /** The increment directory a batch OWNS (and overwrites wholesale on
    * replay — the idempotence that makes a crash-replay converge).
    */
  def incrementDir(path: String, batchId: Long): String =
    s"$path/$IncrementsDir/ingest_batch=$batchId"

  /** Retire a tombstone set during a compaction rewrite: anti-join
    * `rows` against the single id column of `dropIds` on `idCol`.
    * The join key is renamed on the tombstone side, so an id column
    * literally named like `idCol` never self-references. Unhinted —
    * AQE broadcasts a small tombstone set; a bulk retirement degrades
    * to a shuffle join instead of dying.
    */
  def dropTombstones(rows: org.apache.spark.sql.DataFrame,
      dropIds: Option[org.apache.spark.sql.DataFrame],
      idCol: String, caller: String): org.apache.spark.sql.DataFrame =
    dropIds.fold(rows) { d =>
      require(d.schema.length == 1,
        s"$caller: dropIds must have exactly one column (the retired " +
          s"ids); got ${d.schema.fieldNames.mkString(", ")}")
      val tomb = d.toDF("__tomb_id")
      rows.join(tomb, rows(idCol) === tomb("__tomb_id"), "left_anti")
    }

  /** True iff `path` exists on its filesystem. One namenode RPC —
    * never a data read.
    */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Delete `path` recursively if it exists (a compaction clearing
    * its dst before the sidecar-first rewrite). No-op on absence.
    */
  def delete(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Collect the rows of a sidecar KNOWN to exist ([[exists]] was
    * true). A sidecar directory that is unreadable (no parquet files
    * — a killed writer) or holds zero rows fails with a curated
    * message naming the layout and the rebuild path, instead of an
    * uncaught schema-inference or index-out-of-bounds error.
    */
  def collectSidecar(spark: SparkSession, path: String,
      rebuildWith: String): Array[Row] = {
    val rows =
      try spark.read.parquet(path).collect()
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalStateException(
            s"the sidecar at $path is present but unreadable — an " +
              "interrupted sidecar write can leave an empty directory; " +
              s"rebuild the layout with $rebuildWith (or delete the " +
              "sidecar to opt out of validation)", e)
      }
    if (rows.isEmpty)
      throw new IllegalStateException(
        s"the sidecar at $path is present but holds no rows — an " +
          "interrupted sidecar write; rebuild the layout with " +
          s"$rebuildWith (or delete the sidecar to opt out of validation)")
    rows
  }
}
