package graft.streaming

import graft.config.Enums._
import graft.config.PlaybackConfig

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util
import scala.jdk.CollectionConverters._

/** The custom rate-limited playback source — the one piece of real
  * engine work the reference demands (SURVEY.md §7.3): Spark's file
  * source can neither re-read a finished file forever
  * (`postProcessMethod=continue_playing`, csvplayback.py:442-474) nor
  * delete/rename it at EOF and move to the next match, nor enforce the
  * readings-per-trigger budget of the burst/continuous emission
  * contract (csvplayback.py:294-318, 773-783).
  *
  * Modeled on Spark's own `rate` source: a `MicroBatchStream` with
  * `SupportsAdmissionControl`, offset = cumulative rows emitted since
  * stream start (monotone across replays — exactly the property the
  * `use csv sample delta` style needs, csvplayback.py:726-736).
  *
  * Emitted schema (raw; the DataFrame layer parses):
  *   value STRING      one CSV data line
  *   row_idx LONG      global row index, monotone across replays
  *   pos_in_batch LONG position within this micro-batch (chunk)
  *   emit_ts TIMESTAMP batch emission wall-clock (the T1/T2 base)
  */
object CsvPlaybackStream {
  val SCHEMA: StructType = StructType(Seq(
    StructField("value", StringType, nullable = false),
    StructField("row_idx", LongType, nullable = false),
    StructField("pos_in_batch", LongType, nullable = false),
    StructField("emit_ts", TimestampType, nullable = false)))

  val SHORT_NAME = "csvplayback"

  /** JVM-wide admission gate for graceful bench/test teardown. While
    * set, every playback source's `latestOffset` stops granting new
    * chunks (it returns the start offset unchanged), so after one
    * trigger interval no micro-batch is in flight and `query.stop()`'s
    * thread interrupt lands on an idle stream instead of killing live
    * write tasks (which logs "DataWritingSparkTask: Aborting commit"
    * ERRORs into otherwise-green bench artifacts). Scoped to teardown:
    * set it, drain, stop the queries, clear it. */
  val quiesce = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Sub-partition granularity: a batch range splits into ~SUB_SPLIT-row
    * partitions, and the seek index records the byte offset of every
    * SUB_SPLIT-th line so readers position in O(1). */
  val SUB_SPLIT = 16384L

  /** Byte-range size for the distributed index-build job. */
  val INDEX_RANGE_BYTES: Long = 32L * 1024 * 1024

  /** Per-byte-range line summary from the index job: number of line
    * starts owned by the range, plus the byte offset of every
    * [[SUB_SPLIT]]-th of them (range-relative ordinals). */
  case class SplitLines(startByte: Long, nLines: Long, offsets: Array[Long])

  /** Seek structure for one file: total physical lines plus, per range,
    * the first physical line number it owns and its offset samples.
    * [[offsetFor]] resolves a physical line to (seekByte, linesToSkip)
    * with skip < SUB_SPLIT — same reader cost as a dense global index,
    * but built by a parallel job instead of a driver scan. */
  case class FileLineIndex(totalLines: Long,
      splits: Array[(Long, SplitLines)]) {
    def offsetFor(physicalLine: Long): Option[(Long, Long)] = {
      if (splits.isEmpty) return None
      // last split whose first owned line is <= physicalLine
      var lo = 0
      var hi = splits.length - 1
      while (lo < hi) {
        val mid = (lo + hi + 1) >>> 1
        if (splits(mid)._1 <= physicalLine) lo = mid else hi = mid - 1
      }
      val (startLine, s) = splits(lo)
      val relIn = physicalLine - startLine
      if (relIn >= s.nLines || s.offsets.isEmpty) return None
      val oIdx = math.min(relIn / SUB_SPLIT, s.offsets.length - 1).toInt
      Some((s.offsets(oIdx), relIn - oIdx * SUB_SPLIT))
    }
  }

  /** Builds the line index with ONE Spark job over byte-range splits of
    * the file — each task scans its range for line starts (a start at
    * byte s is owned by the range containing s; tasks peek one byte
    * before their range to decide ownership of their first offset, so no
    * start is double-counted) and ships back a constant-size summary.
    * The driver merges summaries: first-trigger latency is O(file size /
    * cluster cores) + a tiny merge, not a single-threaded whole-file
    * read (the r2 verdict's top scale-killer). Compressed files are
    * unsplittable: one task streams the codec and only the line count
    * comes back (readers line-skip from 0, as before). */
  def buildLineIndex(sc: org.apache.spark.SparkContext, path: String,
      rangeBytes: Long = INDEX_RANGE_BYTES): FileLineIndex = {
    val p = new org.apache.hadoop.fs.Path(path)
    val conf = new org.apache.hadoop.conf.Configuration()
    val fs = p.getFileSystem(conf)
    val fileLen = fs.getFileStatus(p).getLen
    if (fileLen == 0)
      throw new java.io.EOFException(s"CSV file $path has zero length")
    val compressed =
      new org.apache.hadoop.io.compress.CompressionCodecFactory(conf).getCodec(p) != null
    val subSplit = SUB_SPLIT
    if (compressed) {
      // unsplittable: one task, count only
      val n = sc.parallelize(Seq(path), 1).map { pth =>
        val hp = new org.apache.hadoop.fs.Path(pth)
        val c = new org.apache.hadoop.conf.Configuration()
        val codec = new org.apache.hadoop.io.compress.CompressionCodecFactory(c).getCodec(hp)
        val in = new java.io.BufferedInputStream(
          codec.createInputStream(hp.getFileSystem(c).open(hp)), 1 << 20)
        try {
          var lines = 0L
          var prev = -1
          var b = in.read()
          var any = b >= 0
          while (b >= 0) { if (b == '\n') lines += 1; prev = b; b = in.read() }
          if (any && prev != '\n') lines += 1 // trailing line without newline
          lines
        } finally in.close()
      }.collect().head
      FileLineIndex(n, Array.empty)
    } else {
      val ranges = (0L until fileLen by rangeBytes)
        .map(st => (st, math.min(st + rangeBytes, fileLen)))
      val summaries = sc.parallelize(ranges, ranges.length).map { case (st, en) =>
        val hp = new org.apache.hadoop.fs.Path(path)
        val c = new org.apache.hadoop.conf.Configuration()
        val raw = hp.getFileSystem(c).open(hp)
        try {
          val readFrom = if (st == 0) 0L else st - 1
          raw.seek(readFrom)
          val in = new java.io.BufferedInputStream(raw, 1 << 20)
          val offs = scala.collection.mutable.ArrayBuffer[Long]()
          var n = 0L
          def recordStart(at: Long): Unit = {
            if (n % subSplit == 0) offs += at
            n += 1
          }
          var pos = readFrom
          var b = in.read()
          // ownership of the range's first byte as a line start
          if (st == 0) { recordStart(0L) }
          else if (b == '\n' && st < en) { recordStart(st) }
          if (st != 0) { pos += 1; b = in.read() } // consumed the peek byte
          while (b >= 0 && pos < en) {
            if (b == '\n' && pos + 1 < en) recordStart(pos + 1)
            pos += 1
            b = in.read()
          }
          SplitLines(st, n, offs.toArray)
        } finally raw.close()
      }.collect().sortBy(_.startByte)
      var acc = 0L
      val indexed = summaries.map { s =>
        val first = acc
        acc += s.nLines
        (first, s)
      }
      FileLineIndex(acc, indexed.filter(_._2.nLines > 0))
    }
  }

  /** First physical data line of the file for a config (header lines
    * consumed before data starts, csvplayback.py:579-659). */
  def dataStartLine(cfg: PlaybackConfig): Int = {
    val skip = cfg.headerMethod match {
      case HeaderMethod.SkipRows | HeaderMethod.PassInDatapoint => cfg.noOfRows
      case HeaderMethod.DoNotSkip => 0
    }
    if (cfg.variableCols) skip
    else cfg.columnMethod match {
      case ColumnMethod.Explicit => skip + 1 // pandas header=0 consumes one line
      case ColumnMethod.PickFromFile => skip + cfg.rowIndexForColumnNames + 1
    }
  }
}

class CsvPlaybackSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = CsvPlaybackStream.SHORT_NAME
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CsvPlaybackStream.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CsvPlaybackTable(PlaybackConfig.fromOptions(properties.asScala.toMap))
}

class CsvPlaybackTable(cfg: PlaybackConfig) extends Table with SupportsRead {
  override def name(): String = s"csvplayback(${cfg.csvDirName}/${cfg.csvFileName})"
  override def schema(): StructType = CsvPlaybackStream.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = CsvPlaybackStream.SCHEMA
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new CsvPlaybackMicroBatchStream(cfg)
    }
}

/** Offset = total rows emitted since stream start, plus the file anchor
  * those rows came from (`file` + the totalRows value at which that
  * file began). The anchor makes checkpoint recovery exact: a restarted
  * source re-maps a WAL-replayed range onto the right file at the right
  * base — without it, a recovered count is ambiguous once EOF
  * post-processing has rotated files, and the rotate check could
  * delete/rename a file that was never played. */
case class PlaybackOffset(totalRows: Long, file: Option[String] = None,
    fileStart: Long = 0L, fileBytes: Long = -1L) extends Offset {
  override def json(): String = file match {
    case Some(f) =>
      val esc = f.replace("\\", "\\\\").replace("\"", "\\\"")
      // fileBytes is the anchor's identity: a same-named file that
      // appears after the anchored one was rotated away must not be
      // mistaken for it on recovery (its bytes differ)
      s"""{"totalRows":$totalRows,"file":"$esc","fileStart":$fileStart,"fileBytes":$fileBytes}"""
    case None =>
      // fileStart must survive even between files: it is where the NEXT
      // file begins, and dropping it across a restart re-bases the
      // rotate check at 0 — which would post-process an unplayed file
      s"""{"totalRows":$totalRows,"fileStart":$fileStart}"""
  }
}

object PlaybackOffset {
  def parse(json: String): PlaybackOffset = {
    val rows = """"totalRows"\s*:\s*(\d+)""".r.findFirstMatchIn(json)
      .map(_.group(1).toLong).getOrElse(0L)
    val file = """"file"\s*:\s*"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(json)
      .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
    val start = """"fileStart"\s*:\s*(\d+)""".r.findFirstMatchIn(json)
      .map(_.group(1).toLong).getOrElse(0L)
    val bytes = """"fileBytes"\s*:\s*(-?\d+)""".r.findFirstMatchIn(json)
      .map(_.group(1).toLong).getOrElse(-1L)
    PlaybackOffset(rows, file, start, bytes)
  }
}

class CsvPlaybackMicroBatchStream(cfg: PlaybackConfig)
    extends MicroBatchStream with SupportsAdmissionControl {

  private val dir = PlaybackConfig.resolveDataDir(cfg.csvDirName)
  private val replay = cfg.postProcessMethod == PostProcess.ContinuePlaying

  // driver-side per-file state (the index itself is built distributed,
  // see CsvPlaybackStream.buildLineIndex; only the merged summaries
  // live here)
  private var currentFile: Option[String] = None
  private var fileRows: Long = 0L        // data rows in the current file
  private var fileBytes: Long = -1L      // on-disk size (anchor identity)
  private var fileStartOffset: Long = 0L // totalRows when this file began
  private var lastEmitMicros: Long = 0L
  private var lineIndex: CsvPlaybackStream.FileLineIndex =
    CsvPlaybackStream.FileLineIndex(0L, Array.empty)

  // Pacing state: the source enforces `sampleRate` itself by releasing
  // at most one chunk per `paceSec` of wall clock (schedule anchored at
  // the first eligible trigger). Driver-side only — a restart re-anchors
  // and the WAL'd row offsets stay exact.
  private var paceStartNanos: Long = Long.MinValue
  private var chunksGranted: Long = 0L

  /** FileFinder semantics (csvplayback.py:503-517): alphabetically
    * first match; absent → no progress this trigger. */
  private def findFile(): Option[String] = {
    val d = java.nio.file.Paths.get(dir)
    PlaybackConfig.matchingFiles(d, cfg.csvFileName).headOption.map(_.toString)
  }

  /** Loads `f` as the current file: builds its line index (one
    * distributed job) and derives the data-row count. The single
    * entry point for file state, shared by fresh pickup
    * ([[ensureFile]]) and checkpoint recovery ([[anchorFromOffset]]). */
  private def loadFile(f: String): Unit = {
    currentFile = Some(f)
    fileBytes =
      try java.nio.file.Files.size(java.nio.file.Paths.get(f))
      catch { case _: java.io.IOException => -1L }
    lineIndex = CsvPlaybackStream.buildLineIndex(
      org.apache.spark.SparkContext.getOrCreate(), f)
    fileRows = math.max(0L,
      lineIndex.totalLines - CsvPlaybackStream.dataStartLine(cfg))
  }

  private def ensureFile(): Unit = {
    if (currentFile.isEmpty) findFile().foreach(loadFile)
  }

  /** Restores file state on a freshly constructed source from a
    * recovered offset's anchor (checkpoint recovery path — both the
    * WAL-replayed batch and the first post-restart latestOffset arrive
    * before any state exists). If the anchored file is still on disk,
    * the index rebuilds and `fileStartOffset` restores exactly; if the
    * EOF action already rotated it, the next file picks up with its
    * base at the recovered row count, so the rotate check can never
    * fire against a file that was not played. No-op once state exists
    * or for fresh streams (anchorless initial offset). */
  private def anchorFromOffset(o: PlaybackOffset): Unit = {
    // path exists AND holds the same bytes the anchor was written
    // against — a same-named successor (possible after Rename frees
    // the name, or a producer re-drop) is NOT the anchored file, and
    // replaying a WAL range against its bytes would emit wrong rows
    def isAnchoredFile(f: String): Boolean = {
      val p = java.nio.file.Paths.get(f)
      java.nio.file.Files.exists(p) && (o.fileBytes < 0L ||
        (try java.nio.file.Files.size(p) == o.fileBytes
         catch { case _: java.io.IOException => false }))
    }
    if (currentFile.isEmpty) {
      o.file match {
        case Some(f) if isAnchoredFile(f) =>
          loadFile(f)
          fileStartOffset = o.fileStart
        case Some(_) =>
          // the anchored file is gone (EOF action rotated it; a
          // same-named file with different bytes counts as gone):
          // whatever file comes next — found now or triggers later —
          // begins at the recovered row count. Set the base
          // unconditionally: if it waited for a file to be found, a
          // successor arriving after the restart would still see base
          // 0 and be rotated away unplayed by the `s >= base + rows`
          // check.
          fileStartOffset = o.totalRows
          ensureFile()
        case None =>
          // between files at checkpoint time: the offset still records
          // where the next file must begin — restoring it keeps the
          // rotate check from firing against a file that never played
          fileStartOffset = math.max(fileStartOffset, o.fileStart)
      }
    }
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(cfg.chunkSize)

  override def initialOffset(): Offset = PlaybackOffset(0L)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("latestOffset(Offset, ReadLimit) is used")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val so = start.asInstanceOf[PlaybackOffset]
    if (CsvPlaybackStream.quiesce.get()) return so // teardown drain
    val s = so.totalRows
    anchorFromOffset(so) // recovery: restore state before the rotate check
    // EOF post-processing: the previous trigger finished the file (all
    // its rows are planned and, since triggers are sequential, already
    // processed). The reference deletes/renames eagerly at EOF too
    // (csvplayback.py:442-465) — not transactional across restarts, by
    // design.
    if (!replay && currentFile.isDefined && s >= fileStartOffset + fileRows)
      postProcessCurrentFile(s)
    ensureFile()
    if (currentFile.isEmpty || fileRows == 0)
      return PlaybackOffset(s, currentFile, fileStartOffset, fileBytes)
    // Wall-clock admission: rate enforcement is a property of the
    // source, not of the trigger cadence. Without this gate the rate
    // contract depended on the writer's trigger matching `paceSec`
    // exactly — a faster trigger silently over-emitted (a continuous
    // stream at trigger 10 ms pumped 100 chunks/sec), and a micro-batch
    // cycle that overran the trigger interval ALIASED throughput to the
    // next interval boundary (a 510 ms cycle under ProcessingTime(500)
    // halves 1M rows/sec to 500k — the round-6/7 bench regression).
    // Exactly one chunk is released per due tick; a tick that passes
    // while the engine is busy is SKIPPED, never banked, so a backlog
    // can never burst above the configured rate and a micro-batch never
    // exceeds the reference's per-burst row budget (csvplayback.py:
    // 294-318). Throughput is min(sampleRate, engine capability) under
    // any trigger.
    val paceNanos = math.max(1L, (cfg.paceSec * 1e9).toLong)
    val now = System.nanoTime()
    if (paceStartNanos == Long.MinValue) paceStartNanos = now
    val due = (now - paceStartNanos) / paceNanos + 1
    if (chunksGranted >= due)
      return PlaybackOffset(s, currentFile, fileStartOffset, fileBytes)
    chunksGranted = math.max(chunksGranted + 1, due) // missed ticks skip
    val budget = limit match {
      case r: ReadMaxRows => r.maxRows()
      case _ => cfg.chunkSize.toLong
    }
    lastEmitMicros = System.currentTimeMillis() * 1000L
    val next =
      if (replay) s + budget // endless: wraps around the file in planInputPartitions
      else math.min(s + budget, fileStartOffset + fileRows)
    PlaybackOffset(next, currentFile, fileStartOffset, fileBytes)
  }

  private def postProcessCurrentFile(totalNow: Long): Unit = {
    val p = java.nio.file.Paths.get(currentFile.get)
    cfg.postProcessMethod match {
      case PostProcess.Delete => java.nio.file.Files.deleteIfExists(p)
      case PostProcess.Rename =>
        java.nio.file.Files.move(p,
          p.resolveSibling(p.getFileName.toString + cfg.suffixName))
      case PostProcess.ContinuePlaying => // unreachable (replay)
    }
    currentFile = None
    fileStartOffset = totalNow
    fileRows = 0L
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val eo = end.asInstanceOf[PlaybackOffset]
    val s = start.asInstanceOf[PlaybackOffset].totalRows
    val e = eo.totalRows
    if (e <= s) return Array.empty
    // Checkpoint recovery: a batch whose offsets are already in the WAL
    // but whose commit is missing re-executes here BEFORE any
    // latestOffset call, on a freshly constructed source with no file
    // state — re-anchor from the end offset (its rows all belong to the
    // end offset's file) or the replayed batch silently emits zero rows
    // and the uncommitted range is lost forever.
    anchorFromOffset(eo)
    if (currentFile.isEmpty) ensureFile() // anchorless initial offsets
    if (currentFile.isEmpty || fileRows == 0) return Array.empty
    // Recovery where the recovered range does not lie inside the
    // current file: rows before fileStartOffset lived in a file the
    // EOF action already deleted/renamed (s < fileStartOffset happens
    // when the anchor re-based a successor file at the recovered
    // count), rows at/after fileStartOffset + fileRows belong to a
    // later file — either way the range is unrecoverable by design
    // (the reference post-processes eagerly too); emit nothing rather
    // than the wrong rows.
    if (s < fileStartOffset) return Array.empty
    if (!replay && s - fileStartOffset >= fileRows) return Array.empty
    // Clamp the end too: a recovered range can extend past the current
    // file's rows if the file shrank between WAL write and recovery
    // (truncation the identity check can't see, e.g. same-size rewrite
    // is excluded but a shorter file is not). Without the clamp the
    // `% fileRows` wrap below would re-emit rows from the top of the
    // file inside a single non-replay batch.
    val eEff = if (replay) e else math.min(e, fileStartOffset + fileRows)
    val path = currentFile.get
    val dataStart = CsvPlaybackStream.dataStartLine(cfg)
    val emitTs = if (lastEmitMicros == 0) System.currentTimeMillis() * 1000L else lastEmitMicros
    // map [s, e) global rows onto file-relative ranges, splitting at
    // replay wrap boundaries AND into ~16k-row sub-ranges so a large
    // burst parses in parallel across cores (each reader line-skips to
    // its range; skip cost is a sequential scan but far cheaper than
    // parse, so near-linear speedup until skip dominates — tune
    // subSplit upward for very large files)
    val subSplit = CsvPlaybackStream.SUB_SPLIT
    val parts = scala.collection.mutable.ArrayBuffer[InputPartition]()
    var cur = s
    while (cur < eEff) {
      val rel = (cur - fileStartOffset) % fileRows
      val take = math.min(math.min(eEff - cur, fileRows - rel), subSplit)
      val (seekByte, skipLines) =
        lineIndex.offsetFor(dataStart + rel) match {
          case Some((off, skip)) => (off, skip)
          case None => (-1L, dataStart + rel) // compressed: line-skip from 0
        }
      parts += PlaybackInputPartition(path, dataStart, rel, rel + take, cur, s,
        emitTs, seekByte, skipLines)
      cur += take
    }
    parts.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PlaybackReaderFactory()

  override def commit(end: Offset): Unit = ()
  // note: MicroBatchExecution only calls commit() when a NEXT batch is
  // constructed, so EOF actions cannot live here — they'd never fire for
  // the final batch; see latestOffset.

  override def deserializeOffset(json: String): Offset =
    PlaybackOffset.parse(json)

  override def stop(): Unit = ()
}

case class PlaybackInputPartition(path: String, dataStartLine: Int,
    fromRow: Long, toRow: Long, globalStart: Long, batchStart: Long,
    emitTsMicros: Long, seekByte: Long, skipLines: Long) extends InputPartition

class PlaybackReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PlaybackInputPartition]
    new PartitionReader[InternalRow] {
      private val hPath = new org.apache.hadoop.fs.Path(p.path)
      private val conf = new org.apache.hadoop.conf.Configuration()
      private val fs = hPath.getFileSystem(conf)
      private val codec = new org.apache.hadoop.io.compress.CompressionCodecFactory(conf).getCodec(hPath)
      private val stream = {
        val raw = fs.open(hPath)
        if (p.seekByte >= 0 && codec == null) { raw.seek(p.seekByte); raw }
        else if (codec == null) raw
        else codec.createInputStream(raw)
      }
      private val br = new java.io.BufferedReader(new java.io.InputStreamReader(stream, "UTF-8"))
      // position at the first wanted data line: seeked readers skip only
      // the sub-split residual; compressed streams skip from the top
      (0L until p.skipLines).foreach(_ => br.readLine())
      private var produced = 0L
      private var line: String = _

      override def next(): Boolean = {
        if (p.fromRow + produced >= p.toRow) return false
        line = br.readLine()
        if (line == null) return false // file shrank underneath us
        produced += 1
        true
      }

      override def get(): InternalRow = {
        val globalIdx = p.globalStart + produced - 1
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(line),
          globalIdx,
          globalIdx - p.batchStart,
          p.emitTsMicros))
      }

      override def close(): Unit = br.close()
    }
  }
}
