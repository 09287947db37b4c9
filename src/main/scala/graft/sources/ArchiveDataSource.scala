package graft.sources

import graft.core.{ArchiveEntry, ArchiveSchema, ConvertOptions}
import graft.walk.ArchiveWalker
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, StringStartsWith}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 face of the archive walker:
  * `spark.read.format("archive").load(paths*)` — the fourth face of
  * the same engine core (Dataset API `ArchiveConverter.entries`, SQL
  * generator `explode_archive`, CLI `Main`), expressed as a
  * first-class Spark source so Catalyst owns the scan:
  *
  *   - **one InputPartition per input archive** — the same morsel
  *     unit as the converter (task-per-input, no AQE-coalescible
  *     exchange);
  *   - **column pruning reaches the walker**: a query that projects
  *     neither `content` nor `hash` still streams every entry (sizes
  *     require reading, and tar/zip iteration advances by reading)
  *     but allocates NO content buffers and computes NO digests —
  *     `SELECT path, size FROM archive` over 100 TB of archives never
  *     materializes an entry (`ConvertOptions.materializeContent` /
  *     `computeHash`, asserted in SourcesSpec);
  *   - early-stop safe: the walker closes its input on task
  *     completion (round-6 walker fix), so `LIMIT` above this scan
  *     leaks nothing.
  *
  * Options (all optional): `maxDepth`, `maxEntryBytes`,
  * `extractStrings`, `skipErrors`, `truncateOversize`,
  * `sevenZMemSpoolMax` — the walker knobs with the same defaults as
  * [[graft.core.ConvertOptions]].
  * Paths may be local files, directories (expanded one level), globs,
  * or http(s)/file URLs (walked via the S2 streaming source).
  */
class ArchiveDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "archive"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = ArchiveSchema.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    // fixed-schema source: a caller-supplied `.schema(...)` must match
    // exactly — silently proceeding with the archive schema would hand
    // the user columns they did not declare (standard TableProvider
    // behavior for fixed-schema sources)
    require(schema == ArchiveSchema.schema,
      s"archive source has a fixed schema ${ArchiveSchema.schema.simpleString}; " +
        s"got ${schema.simpleString}. Drop .schema(...) and project instead.")
    new ArchiveTable(properties)
  }
}

final class ArchiveTable(properties: java.util.Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = "archive"
  override def schema(): StructType = ArchiveSchema.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // a catalog table (`CREATE TABLE ... USING archive OPTIONS (...)`)
    // carries its OPTIONS as table properties; a DataFrameReader scan
    // carries them here. Merge, scan-time options winning.
    val merged = new java.util.HashMap[String, String](properties)
    merged.putAll(options)
    new ArchiveScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

final class ArchiveScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = ArchiveSchema.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // Catalyst hands us the projected subset; an empty struct (e.g.
    // COUNT(*)) is legal and prunes everything
    required = requiredSchema

  /** Three pushdown families, all conservative — every filter is also
    * returned as residual so Spark re-applies it row-side; pushing can
    * never change results, only skip work:
    *
    *   - `source` conjuncts drop whole archives at PLANNING time —
    *     the archive analogue of Hive partition pruning
    *     (`WHERE source = '/x/a.tar.gz'` over 10k archives plans ONE
    *     partition);
    *   - `size` bound conjuncts fold into a half-open
    *     [pruneSizeMin, pruneSizeMax) the WALKER enforces: an entry
    *     reaching the upper bound stops buffering and hashing
    *     mid-stream (it cannot survive the residual filter);
    *   - `path` StringStartsWith conjuncts prune in-walk: a
    *     non-matching leaf is never buffered or digested, and a
    *     nested archive whose lineage cannot produce a matching path
    *     is skipped without expansion.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case EqualTo("source", _: String)            => true
      case In("source", _)                         => true
      case StringStartsWith("source", _)           => true
      case StringStartsWith("path", _)             => true
      case GreaterThan("size", _: Number)          => true
      case GreaterThanOrEqual("size", _: Number)   => true
      case LessThan("size", _: Number)             => true
      case LessThanOrEqual("size", _: Number)      => true
      case EqualTo("size", _: Number)              => true
      case _                                       => false
    }
    filters // all residual: pushed columns still evaluate row-side
  }
  override def pushedFilters(): Array[Filter] = pushed

  private def keep(path: String): Boolean = pushed.forall {
    case EqualTo("source", v: String)      => path == v
    case In("source", vs)                  => vs.exists(_ == path)
    case StringStartsWith("source", p)     => path.startsWith(p)
    case _                                 => true
  }

  /** Fold the pushed `size` conjuncts into one half-open walker range.
    * Bounds compose by intersection (max of lower, min of upper).
    */
  private def sizeBounds: (Option[Long], Option[Long]) = {
    var lo = Option.empty[Long]
    var hi = Option.empty[Long]
    def raiseLo(v: Long): Unit = lo = Some(lo.fold(v)(math.max(_, v)))
    def lowerHi(v: Long): Unit = hi = Some(hi.fold(v)(math.min(_, v)))
    pushed.foreach {
      // the +1 half-open conversions skip Long.MaxValue: overflowing
      // to a negative bound would make the walker drop EVERY row, and
      // dropped rows are beyond the residual filter's reach (pushdown
      // must only ever drop rows the predicate provably excludes)
      case GreaterThanOrEqual("size", v: Number) => raiseLo(v.longValue)
      case GreaterThan("size", v: Number) if v.longValue < Long.MaxValue =>
        raiseLo(v.longValue + 1)
      case LessThan("size", v: Number)           => lowerHi(v.longValue)
      case LessThanOrEqual("size", v: Number) if v.longValue < Long.MaxValue =>
        lowerHi(v.longValue + 1)
      case EqualTo("size", v: Number) if v.longValue < Long.MaxValue =>
        raiseLo(v.longValue); lowerHi(v.longValue + 1)
      case _                                     => ()
    }
    (lo, hi)
  }

  override def build(): Scan = {
    val names = required.fieldNames
    val (lo, hi) = sizeBounds
    val opts = ConvertOptions(
      maxDepth = Option(options.get("maxDepth")).map(_.toInt).getOrElse(32),
      maxEntryBytes = Option(options.get("maxEntryBytes")).map(_.toLong).getOrElse(1L << 30),
      extractStrings = options.getBoolean("extractStrings", false),
      skipErrors = options.getBoolean("skipErrors", false),
      truncateOversize = options.getBoolean("truncateOversize", false),
      sevenZMemSpoolMax = Option(options.get("sevenZMemSpoolMax"))
        .map(_.toLong).getOrElse(64L << 20),
      materializeContent = names.contains("content"),
      computeHash = names.contains("hash"),
      pruneSizeMin = lo.filter(_ > 0),
      pruneSizeMax = hi,
      prunePathPrefixes = pushed.collect { case StringStartsWith("path", p) => p }.toSeq)
    new ArchiveScan(ArchiveScan.expandPaths(options).filter(keep), required, opts, pushed)
  }
}

object ArchiveScan {
  /** Local paths stay bare (the walker opens them with File IO and the
    * `source` column matches the user's input string); any other
    * filesystem keeps its full scheme+authority — stripping them (the
    * old `.toUri.getPath`) silently turned `hdfs://nn/x` into `/x`,
    * which the walker then opened as a (wrong or missing) LOCAL file.
    * The walker only speaks local files and http(s); other schemes are
    * rejected here with a clear error instead of a misleading
    * FileNotFound downstream.
    */
  private def walkablePath(p: org.apache.hadoop.fs.Path): String = {
    val scheme = p.toUri.getScheme
    if (scheme == null || scheme == "file") p.toUri.getPath
    else throw new IllegalArgumentException(
      s"archive source cannot walk $p: scheme '$scheme' is not supported " +
        "(local paths and http(s) URLs only)")
  }

  /** Driver-side path expansion: `.load(p1, p2)` arrives as a JSON
    * array under "paths", a single `.load(p)` under "path". URLs pass
    * through; local entries glob-expand, directories one level.
    */
  private[sources] def expandPaths(options: CaseInsensitiveStringMap): Seq[String] = {
    val raw: Seq[String] = Option(options.get("paths")) match {
      case Some(json) =>
        new com.fasterxml.jackson.databind.ObjectMapper()
          .readValue(json, classOf[Array[String]]).toSeq
      case None => Option(options.get("path")).toSeq
    }
    require(raw.nonEmpty, "archive source: no path given (use .load(path, ...))")
    val conf = new org.apache.hadoop.conf.Configuration()
    raw.flatMap { p =>
      if (p.startsWith("http://") || p.startsWith("https://") || p.startsWith("file:")) Seq(p)
      else {
        val hp = new org.apache.hadoop.fs.Path(p)
        val fs = hp.getFileSystem(conf)
        val matched = Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Seq.empty)
        if (matched.isEmpty) Seq(p) // defer to the walker's open error
        else matched.flatMap { st =>
          if (st.isDirectory)
            fs.listStatus(st.getPath).filter(_.isFile).map(p => walkablePath(p.getPath)).sorted.toSeq
          else Seq(walkablePath(st.getPath))
        }
      }
    }
  }
}

final class ArchiveScan(paths: Seq[String], required: StructType, opts: ConvertOptions,
    pushed: Array[Filter] = Array.empty)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"archive walk of ${paths.size} inputs, columns [${required.fieldNames.mkString(", ")}]" +
      (if (pushed.isEmpty) "" else s", PushedFilters: [${pushed.mkString(", ")}]")
  override def planInputPartitions(): Array[InputPartition] =
    paths.map(p => ArchiveInputPartition(p): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new ArchiveReaderFactory(required.fieldNames, opts)
}

final case class ArchiveInputPartition(path: String) extends InputPartition

final class ArchiveReaderFactory(fieldNames: Array[String], opts: ConvertOptions)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ArchivePartitionReader(partition.asInstanceOf[ArchiveInputPartition].path, fieldNames, opts)
}

final class ArchivePartitionReader(path: String, fieldNames: Array[String], opts: ConvertOptions)
    extends PartitionReader[InternalRow] {
  private val getters: Array[ArchiveEntry => Any] = fieldNames.map {
    case "source"  => (e: ArchiveEntry) => UTF8String.fromString(e.source)
    case "path"    => (e: ArchiveEntry) => UTF8String.fromString(e.path)
    case "size"    => (e: ArchiveEntry) => e.size
    case "hash"    => (e: ArchiveEntry) => e.hash
    case "content" => (e: ArchiveEntry) => e.content
    case other     => throw new IllegalArgumentException(s"unknown archive column $other")
  }
  private val it: Iterator[ArchiveEntry] =
    if (!opts.skipErrors) ArchiveWalker.walkInput(path, opts)
    else {
      // same per-input containment contract as the converter (W7):
      // a failed input stops contributing rows, the scan continues
      val opened =
        try ArchiveWalker.walkInput(path, opts)
        catch { case t: Throwable => logSkip(t); Iterator.empty }
      new Iterator[ArchiveEntry] {
        private var pending: ArchiveEntry = _
        private var has = false
        private var dead = false
        private def advance(): Unit =
          if (!has && !dead) {
            try {
              if (opened.hasNext) { pending = opened.next(); has = true } else dead = true
            } catch { case t: Throwable => logSkip(t); dead = true }
          }
        override def hasNext: Boolean = { advance(); has }
        override def next(): ArchiveEntry = {
          advance()
          if (!has) throw new NoSuchElementException("input ended")
          has = false
          pending
        }
      }
    }
  private var cur: ArchiveEntry = _

  private def logSkip(t: Throwable): Unit =
    System.err.println(s"[graft] archive source skipping failed input $path: " +
      s"${t.getClass.getSimpleName}: ${t.getMessage}")

  override def next(): Boolean = it.hasNext && { cur = it.next(); true }
  override def get(): InternalRow = new GenericInternalRow(getters.map(_(cur)))
  // the walker closes its stream on exhaustion AND on task completion
  // (early stop), so there is nothing to release here
  override def close(): Unit = ()
}
