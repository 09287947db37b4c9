package graft.convert

import graft.core.{ConvertOptions, IncludeType}
import org.apache.spark.sql.SparkSession

/** CLI entry point mirroring the reference's `archive-to-parquet`
  * binary (reference: src/main.rs:26-132).
  *
  * {{{
  * graft.convert.Main OUTPUT INPUT... [options]
  *   INPUT of "-"            read newline-separated paths from stdin (S3)
  *   --urls                  treat inputs as http(s) URLs (S2)
  *   --unique                drop duplicate content by sha-256 (D1)
  *   --include all|text|binary   content filter (F2)
  *   --min-size N --max-size N   half-open size range (F1)
  *   --compression CODEC     parquet codec (default zstd level 1)
  *   --extract-executable-strings   P3
  *   --skip-errors           contain per-input failures (count, don't abort)
  *   --single-file           one output parquet file (reference parity)
  *   --threads N             input parallelism (default: all cores)
  *   --progress              live in-flight counters on stderr (D2)
  *   --progress-bars         per-input progress bars (reference multi-bar UI)
  *   --log-file FILE         tee progress + final stats lines to FILE
  *   --max-entry-bytes N     per-entry content cap (default 1 GiB)
  *   --truncate-oversize     emit over-cap entries as clamped prefixes
  *                           instead of failing the input
  *   --chunked               emit over-cap entries as content_part-indexed
  *                           chunk rows (no truncation, any entry size)
  *   --http-payload          decode WARC/HTTP response bodies: content becomes
  *                           the entity payload (chunked framing + gzip/deflate/
  *                           zstd codings reversed), size/hash recomputed,
  *                           http_status/http_content_type columns added
  *   --wet                   full WARC -> clean-text (WET) conversion: the
  *                           --http-payload decode, then charset resolution,
  *                           main-content extraction and NFC normalization;
  *                           content becomes the UTF-8 text, non-response
  *                           records drop, http_status/http_content_type/
  *                           n_blocks/n_content columns added
  * }}}
  */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: graft.convert.Main OUTPUT INPUT... [--urls] [--unique] " +
        "[--include all|text|binary] [--min-size N] [--max-size N] " +
        "[--compression C] [--extract-executable-strings] [--skip-errors] " +
        "[--single-file] [--threads N] [--progress] [--progress-bars] " +
        "[--log-file FILE] [--max-entry-bytes N] [--truncate-oversize] [--chunked] " +
        "[--http-payload] [--wet]")
      sys.exit(2)
    }
    val out = args.head
    var inputs = Vector.empty[String]
    var opts = ConvertOptions()
    var urls = false
    var i = 1
    while (i < args.length) {
      args(i) match {
        case "--urls"    => urls = true
        case "--unique"  => opts = opts.copy(unique = true)
        case "--include" => opts = opts.copy(include = IncludeType.fromString(args(i + 1))); i += 1
        case "--min-size" => opts = opts.copy(minSize = Some(args(i + 1).toLong)); i += 1
        case "--max-size" => opts = opts.copy(maxSize = Some(args(i + 1).toLong)); i += 1
        case "--compression" => opts = opts.copy(compression = args(i + 1)); i += 1
        case "--extract-executable-strings" => opts = opts.copy(extractStrings = true)
        case "--skip-errors" => opts = opts.copy(skipErrors = true)
        case "--single-file" => opts = opts.copy(singleFile = true)
        case "--progress" => opts = opts.copy(progress = true)
        case "--progress-bars" => opts = opts.copy(progressBars = true)
        case "--log-file" => opts = opts.copy(logFile = Some(args(i + 1))); i += 1
        case "--threads" => opts = opts.copy(parallelism = Some(args(i + 1).toInt)); i += 1
        case "--max-entry-bytes" => opts = opts.copy(maxEntryBytes = args(i + 1).toLong); i += 1
        case "--truncate-oversize" => opts = opts.copy(truncateOversize = true)
        case "--chunked" => opts = opts.copy(chunked = true)
        case "--http-payload" => opts = opts.copy(httpPayload = true)
        case "--wet" => opts = opts.copy(wet = true)
        case other => inputs :+= other
      }
      i += 1
    }
    // "-" => newline-separated paths on stdin (reference: src/main.rs:137-153)
    if (inputs == Vector("-")) {
      inputs = scala.io.Source.stdin.getLines().map(_.trim).filter(_.nonEmpty).toVector
    }
    require(inputs.nonEmpty, "no inputs given")
    if (urls) {
      val bad = inputs.filterNot(u => u.startsWith("http://") || u.startsWith("https://") || u.startsWith("file:"))
      require(bad.isEmpty, s"--urls given but not URLs: ${bad.mkString(", ")}")
    }

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName("graft-convert")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val stats = ArchiveConverter.convert(spark, inputs, out, opts)
      // mirror of the reference's final progress line (src/progress.rs)
      val statsLine = s"[graft] inputs=${stats.inputs} entries_read=${stats.entriesRead} " +
        s"bytes_read=${stats.bytesRead} rows_written=${stats.rows} bytes_written=${stats.bytes} " +
        s"errors=${stats.errors} -> $out"
      println(statsLine)
      // append (convert() already wrote the progress lines and closed)
      opts.logFile.foreach { f =>
        val w = new java.io.FileWriter(f, true)
        try w.write(statsLine + "\n") finally w.close()
      }
    } finally spark.stop()
  }
}
