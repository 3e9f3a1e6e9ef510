package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The WRITE half of the DSv2 connector surface (SyntheticV2 covers the
  * read half): a table format with the OBJECT-STORE-SAFE commit
  * protocol every 100 TB sink needs —
  *
  *   df.write.format("graft-manifest").option("path", dir)
  *     .mode("append" | "overwrite").save()   // DSv2: explicit mode only
  *   spark.read.format("graft-manifest").option("path", dir)
  *     [.option("version", n)].load()
  *
  * Commit protocol (the Iceberg/Delta shape in miniature, derived from
  * the published snapshot-isolation design, not any implementation):
  *  1. every task writes its rows to `_staging/<queryId>/part-...` —
  *     never into the data directory;
  *  2. task commit returns the staged file as a [[WriterCommitMessage]];
  *     a FAILED or speculatively-duplicated task's files simply never
  *     appear in any message (abort deletes them, but even an orphan
  *     left behind is invisible — readers trust only the manifest);
  *  3. driver-side `BatchWrite.commit` renames the staged files into
  *     the data dir and then publishes `manifest-<v+1>` via
  *     write-temp-then-atomic-rename — the ONE atomic commit point.
  *     Append lists the previous snapshot's files plus the new ones;
  *     truncate (SaveMode.Overwrite) lists only the new ones, leaving
  *     prior data files in place but unreferenced.
  *
  * What that buys, spec'd in ManifestTableSpec: ATOMIC visibility (a
  * reader sees the whole write or none of it), SNAPSHOT ISOLATION (a
  * scan planned against manifest v keeps returning v's rows even if a
  * concurrent overwrite publishes v+1 mid-read), TIME TRAVEL
  * (`option("version", n)` reads any retained snapshot — overwrite is
  * non-destructive), orphan immunity (a crashed task's staging
  * litter is never read), and DATA SKIPPING: each task records
  * per-numeric-column (min, max) into its commit message, the manifest
  * carries them per file, and the scan prunes whole files whose range
  * cannot satisfy a pushed comparison predicate before any task
  * launches — with every filter retained post-scan, so pruning is a
  * pure optimization. File payload is TSV with backslash escapes —
  * deliberately trivial, because the CONTRACT under test is the commit
  * protocol, not the encoding; production would swap parquet files in
  * the same manifest frame. Local `java.io` file ops stand in for the
  * Hadoop FileSystem calls (same rename-based protocol; on real object
  * stores the final rename becomes a conditional PUT of the manifest).
  *
  * Types supported: the fixture scalar set (BIGINT/INT/DOUBLE/BOOLEAN/
  * STRING); anything else fails fast at write planning.
  *
  * Round-8 session-3 additions: ROW-LEVEL DELETE (`SupportsDelete` —
  * file-granular copy-on-write with a stats fast path; reachable as
  * real `DELETE FROM graftcat.`dir`` SQL through
  * [[GraftManifestCatalog]]) and bin-packing [[ManifestTable.compact]]
  * (the OPTIMIZE maintenance op) — both publish ordinary snapshots, so
  * deletes and compactions time-travel like writes.
  */
class ManifestTable extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-manifest"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dir = ManifestTable.pathOf(options)
    ManifestTable.readManifest(dir, ManifestTable.versionOf(options))
      .map(m => StructType.fromDDL(m.schemaDdl))
      .getOrElse(sys.error(s"graft-manifest: no manifest under $dir — " +
        "write first or pass an explicit schema"))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ManifestTable.MTable(schema,
      new CaseInsensitiveStringMap(properties))
}

/** Raised when a manifest publish loses the put-if-absent race — the
  * lakehouse log-store conflict (Iceberg `CommitFailedException`,
  * Delta `ConcurrentModificationException`). Append committers catch
  * it and retry against the re-read snapshot; rewrite committers
  * (delete / compact) let it surface because their inputs are stale.
  */
final class ConcurrentCommitException(msg: String)
  extends RuntimeException(msg)

object ManifestTable {

  private def pathOf(o: CaseInsensitiveStringMap): String = {
    val p = o.get("path")
    require(p != null && p.nonEmpty, "graft-manifest requires option(\"path\")")
    p
  }

  private def versionOf(o: CaseInsensitiveStringMap): Option[Long] =
    Option(o.get("version")).map(_.toLong)

  /** One committed snapshot: schema + the exact data files it covers,
    * each with optional per-numeric-column (min, max) stats for data
    * skipping (the Iceberg/Delta file-pruning shape) and, since
    * round 9, the file's exact row count (`rows`; −1 on manifests
    * written before the field existed) — the metadata that lets
    * COUNT(*) answer without touching a data file.
    */
  final case class FileEntry(path: String, stats: Map[String, (String, String)],
      rows: Long = -1L)
  /** `txns` (round 10): highest epoch committed per streaming writer id
    * — the Delta `txn`-action shape that makes the streaming sink
    * exactly-once: a replayed micro-batch (epoch ≤ the recorded high
    * water mark for its writer) commits as a no-op instead of
    * double-appending. Carried forward by EVERY publish so interleaved
    * batch writes / deletes / compactions never drop stream state.
    */
  final case class Manifest(version: Long, schemaDdl: String,
      files: Seq[FileEntry], txns: Map[String, Long] = Map.empty)

  private def encodeEntry(e: FileEntry): String =
    ((e.path +: e.stats.toSeq.sortBy(_._1).map { case (c, (mn, mx)) =>
      s"$c;$mn;$mx" }) ++
      // 2-token shape on purpose: a pre-round-9 decoder pattern-matches
      // 3-token stats entries and silently drops this, so old readers
      // stay compatible with new manifests (and vice versa: rows = -1)
      (if (e.rows >= 0) Seq(s"#rows;${e.rows}") else Nil)).mkString("|")

  private def decodeEntry(raw: String): FileEntry = {
    val parts = raw.split('|')
    val rows = parts.tail.collectFirst {
      case t if t.startsWith("#rows;") => t.stripPrefix("#rows;").toLong
    }.getOrElse(-1L)
    FileEntry(parts.head, parts.tail.flatMap { t =>
      t.split(';') match {
        case Array(c, mn, mx) => Some(c -> (mn, mx))
        case _ => None
      }
    }.toMap, rows)
  }

  private def manifestFile(dir: String, v: Long) = new File(dir, f"manifest-$v%09d")

  /** Table handle for the catalog plugin ([[GraftManifestCatalog]]):
    * resolve the latest snapshot's schema and serve the same Table the
    * TableProvider path builds — one implementation, two front doors.
    */
  private[sources] def tableFor(dir: String): org.apache.spark.sql.connector.catalog.Table = {
    val m = readManifest(dir, None).getOrElse(
      sys.error(s"graft-manifest: no manifest under $dir"))
    new MTable(StructType.fromDDL(m.schemaDdl),
      new CaseInsensitiveStringMap(java.util.Map.of("path", dir)))
  }

  /** Latest (or exact) committed snapshot, or None on an empty table. */
  def readManifest(dir: String, version: Option[Long]): Option[Manifest] = {
    val d = new File(dir)
    if (!d.isDirectory) return None
    val versions = d.listFiles((f: File) => f.getName.startsWith("manifest-"))
      .map(_.getName.stripPrefix("manifest-").toLong).sorted
    val pick = version match {
      case Some(v) =>
        require(versions.contains(v),
          s"graft-manifest: version $v not in ${versions.mkString(",")}")
        v
      case None if versions.isEmpty => return None
      case None => versions.last
    }
    val lines = Files.readAllLines(manifestFile(dir, pick).toPath,
      StandardCharsets.UTF_8).asScala.toSeq
    val kv = lines.filter(_.contains("=")).map { l =>
      val i = l.indexOf('='); (l.substring(0, i), l.substring(i + 1))
    }
    Some(Manifest(pick,
      kv.collectFirst { case ("schema", s) => s }.get,
      kv.collect { case ("file", f) => decodeEntry(f) },
      kv.collect { case ("txn", t) =>
        val i = t.lastIndexOf(';')
        t.substring(0, i) -> t.substring(i + 1).toLong
      }.toMap))
  }

  private val okTypes: Set[DataType] =
    Set(LongType, IntegerType, DoubleType, BooleanType, StringType)

  // ---- row codec: TSV with \t \n \r \\ escapes, \N for NULL ----------
  // \r must be escaped too: Files.readAllLines treats a bare CR as a
  // line terminator, so an unescaped CR would split one row into two
  // on read and decode would silently truncate the tail fields.
  private def encode(row: InternalRow, schema: StructType): String =
    schema.fields.zipWithIndex.map { case (f, i) =>
      if (row.isNullAt(i)) "\\N"
      else f.dataType match {
        case LongType => row.getLong(i).toString
        case IntegerType => row.getInt(i).toString
        case DoubleType => java.lang.Double.toString(row.getDouble(i))
        case BooleanType => row.getBoolean(i).toString
        case StringType => row.getUTF8String(i).toString
          .replace("\\", "\\\\").replace("\t", "\\t")
          .replace("\n", "\\n").replace("\r", "\\r")
        case t => sys.error(s"unsupported type $t")
      }
    }.mkString("\t")

  private val NullSentinel = "\u0000NULL\u0000"

  /** Split one encoded line into unescaped cells (null -> sentinel). */
  private def splitCells(line: String): Array[String] = {
    // split on unescaped tabs, then unescape per field
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '\\' && i + 1 < line.length) {
        line.charAt(i + 1) match {
          case 't' => sb.append('\t'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'N' => sb.append(NullSentinel); i += 2
          case o => sb.append(o); i += 2
        }
      } else if (c == '\t') { parts += sb.toString; sb.setLength(0); i += 1 }
      else { sb.append(c); i += 1 }
    }
    parts += sb.toString
    parts.toArray
  }

  private def convertCell(raw: String, t: DataType): Any = t match {
    case LongType => java.lang.Long.valueOf(raw)
    case IntegerType => java.lang.Integer.valueOf(raw)
    case DoubleType => java.lang.Double.valueOf(raw)
    case BooleanType => java.lang.Boolean.valueOf(raw)
    case StringType => UTF8String.fromString(raw)
    case other => sys.error(s"unsupported type $other")
  }

  /** Decode only the `required` fields of a line written under the
    * `full` schema - the column-pruning fast path: every cell is still
    * tab-scanned (field boundaries demand it) but dropped columns skip
    * value parsing and allocation entirely.
    */
  private def decodeProj(line: String, full: StructType,
      required: StructType): InternalRow = {
    val parts = splitCells(line)
    val vals = new Array[Any](required.fields.length)
    var j = 0
    while (j < required.fields.length) {
      val f = required.fields(j)
      val i = full.fieldIndex(f.name)
      vals(j) =
        if (i >= parts.length || parts(i) == NullSentinel) null
        else convertCell(parts(i), f.dataType)
      j += 1
    }
    new GenericInternalRow(vals)
  }

  private def decode(line: String, schema: StructType): InternalRow =
    decodeProj(line, schema, schema)

  // ---- table ---------------------------------------------------------
  private final class MTable(schema0: StructType, options: CaseInsensitiveStringMap)
      extends Table with SupportsRead with SupportsWrite
      with org.apache.spark.sql.connector.catalog.SupportsDelete {
    private val dir = pathOf(options)
    // snapshot pinned at TABLE resolution (load()): scans planned from
    // this DataFrame keep reading this version even if later commits
    // publish newer manifests — snapshot isolation, the Delta/Iceberg
    // analysis-time-snapshot semantics
    private val snapshot = readManifest(dir, versionOf(options))
    override def name(): String = s"graft_manifest($dir)"
    override def schema(): StructType = schema0
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
        TableCapability.STREAMING_WRITE, TableCapability.TRUNCATE)

    /** DELETE FROM support (metadata-only where stats allow): the
      * conjunction must be entirely in the comparison/null dialect the
      * row matcher evaluates — anything else (OR trees, functions,
      * UDFs) is refused HERE so Spark raises the analysis error
      * instead of silently deleting the wrong rows.
      */
    override def canDeleteWhere(
        filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
      filters.forall(filterSupported)

    override def deleteWhere(
        filters: Array[org.apache.spark.sql.sources.Filter]): Unit =
      ManifestTable.deleteWhereImpl(dir, filters)

    override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
      new MScanBuilder(dir, schema0, snapshot.map(_.files).getOrElse(Nil))

    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
      info.schema().fields.foreach { f =>
        require(okTypes.contains(f.dataType),
          s"graft-manifest: unsupported column type ${f.dataType} (${f.name})")
      }
      new WriteBuilder with SupportsTruncate {
        private var doTruncate = false
        override def truncate(): WriteBuilder = { doTruncate = true; this }
        override def build(): Write = {
          // option("clusterBy", "<col>"): the WRITE requests a range
          // distribution + within-partition sort on that column from
          // the ENGINE (RequiresDistributionAndOrdering) — Spark
          // inserts the exchange/sort, tasks then receive disjoint
          // value ranges, and the per-file (min, max) stats the commit
          // records become non-overlapping: the layout knob that turns
          // data skipping from "lucky" into "guaranteed" (the
          // Iceberg write-distribution-mode=range shape). Absent the
          // option the write accepts whatever layout arrives.
          Option(info.options.get("clusterBy")) match {
            case Some(c) =>
              import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
              import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
              require(info.schema().fieldNames.contains(c),
                s"graft-manifest: clusterBy column $c not in write schema")
              val so = Expressions.sort(Expressions.column(c),
                SortDirection.ASCENDING)
              // clusterPartitions pins the task count (AQE otherwise
              // coalesces a small-byte range shuffle to ONE task/file,
              // defeating the layout — the repo invariants-doc repartition-pin
              // rule surfacing through the DSv2 write path); 0/absent
              // lets the engine choose, which is right at real scale
              val parts = Option(info.options.get("clusterPartitions"))
                .map(_.toInt).getOrElse(0)
              new Write with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
                override def requiredDistribution(): Distribution =
                  Distributions.ordered(Array(so))
                override def requiredOrdering(): Array[SortOrder] = Array(so)
                override def requiredNumPartitions(): Int = parts
                override def toBatch: BatchWrite =
                  new MBatchWrite(dir, info.schema(), info.queryId(), doTruncate)
                override def toStreaming
                    : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
                  new MStreamingWrite(dir, info.schema(), info.queryId(), doTruncate)
              }
            case None => new Write {
              override def toBatch: BatchWrite =
                new MBatchWrite(dir, info.schema(), info.queryId(), doTruncate)
              override def toStreaming
                  : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
                new MStreamingWrite(dir, info.schema(), info.queryId(), doTruncate)
            }
          }
        }
      }
    }
  }

  // ---- write path ----------------------------------------------------
  private final case class StagedFile(name: String, rows: Long,
      stats: Seq[(String, String, String)]) extends WriterCommitMessage

  private final class MBatchWrite(dir: String, schema: StructType,
      queryId: String, truncate: Boolean) extends BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      new MWriterFactory(dir, schema, queryId)

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val staged = messages.collect {
        case sf: StagedFile if sf.name.nonEmpty => sf }
      val dataDir = new File(dir, "data"); dataDir.mkdirs()
      val moved = staged.map { sf =>
        val from = Paths.get(dir, "_staging", queryId, sf.name)
        val to = Paths.get(dir, "data", sf.name)
        // names embed the queryId so this can only trip on a true bug
        // (or a replayed commit) — fail rather than let Linux rename()
        // silently replace a file a prior snapshot still references
        require(!Files.exists(to),
          s"graft-manifest: commit would overwrite committed data file $to")
        Files.move(from, to, StandardCopyOption.ATOMIC_MOVE)
        FileEntry(s"data/${sf.name}",
          sf.stats.map { case (c, mn, mx) => c -> (mn, mx) }.toMap, sf.rows)
      }
      // Optimistic concurrency: read-check-publish against put-if-absent.
      // Losing the publish race means another committer created our
      // target version — re-read and re-derive (Delta-style reconcile:
      // an append composes with any winner; an overwrite still wins the
      // snapshot, the loser's files stay time-travelable).
      var attempt = 0
      var committed = false
      while (!committed) {
        val prev = readManifest(dir, None)
        val files = if (truncate) moved.toSeq
          else prev.map(_.files).getOrElse(Nil) ++ moved
        val v = prev.map(_.version + 1).getOrElse(1L)
        try {
          publish(dir, v, schema.toDDL, files, queryId,
            prev.map(_.txns).getOrElse(Map.empty))
          committed = true
        } catch {
          case e: ConcurrentCommitException =>
            attempt += 1
            if (attempt > 50) throw e
        }
      }
      cleanupStaging()
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit =
      cleanupStaging()

    private def cleanupStaging(): Unit = {
      val st = new File(new File(dir, "_staging"), queryId)
      Option(st.listFiles()).foreach(_.foreach(_.delete()))
      st.delete()
    }
  }

  /** EXACTLY-ONCE streaming sink (round 10) — the lakehouse surface's
    * missing half: `df.writeStream.format("graft-manifest")` commits
    * each micro-batch through the SAME atomic publish as a batch
    * write, plus a Delta-style `txn` high-water mark per streaming
    * writer id. `writerId` is the streaming query's STABLE id (Spark
    * passes `StreamingQuery.id`, persisted in checkpoint metadata, as
    * the LogicalWriteInfo queryId of a streaming write), so after a
    * kill+restart the re-planned epoch arrives with the same
    * (writerId, epochId) pair, reads `epochId <= txns(writerId)` from
    * the latest manifest, and commits as a NO-OP — replayed batches
    * can never double-append. A crash BETWEEN the file moves and the
    * manifest publish leaves moved-but-unreferenced orphans, which
    * readers never see (the manifest is the only source of truth);
    * the restarted attempt re-stages under a fresh per-run token so
    * its names can never collide with the orphans.
    */
  private final class MStreamingWrite(dir: String, schema: StructType,
      writerId: String, truncate: Boolean)
      extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
    private val runToken = java.util.UUID.randomUUID().toString.take(8)
    private val tag = s"$writerId-$runToken"

    override def createStreamingWriterFactory(info: PhysicalWriteInfo)
        : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
      new MStreamingWriterFactory(dir, schema, tag)

    override def commit(epochId: Long,
        messages: Array[WriterCommitMessage]): Unit = {
      // Optimistic loop over the put-if-absent publish: the txn
      // high-water re-check happens against EVERY re-read, so if a
      // racing instance of the same writer (zombie vs restarted
      // driver) wins the CAS with this epoch, this attempt degrades
      // to the replay no-op and its moved files become GC-able
      // orphans — a committed epoch can never be clobbered or doubled.
      var movedOpt: Option[Seq[FileEntry]] = None
      var attempt = 0
      while (true) {
        val prev = readManifest(dir, None)
        val last = prev.flatMap(_.txns.get(writerId)).getOrElse(Long.MinValue)
        if (epochId <= last) { cleanupStaging(); return } // replayed: no-op
        val moved = movedOpt.getOrElse {
          val staged = messages.collect {
            case sf: StagedFile if sf.name.nonEmpty => sf }
          new File(dir, "data").mkdirs()
          staged.toSeq.map { sf =>
            val from = Paths.get(dir, "_staging", tag, sf.name)
            val to = Paths.get(dir, "data", sf.name)
            require(!Files.exists(to),
              s"graft-manifest: commit would overwrite committed data file $to")
            Files.move(from, to, StandardCopyOption.ATOMIC_MOVE)
            FileEntry(s"data/${sf.name}",
              sf.stats.map { case (c, mn, mx) => c -> (mn, mx) }.toMap, sf.rows)
          }
        }
        movedOpt = Some(moved)
        val files = if (truncate) moved
          else prev.map(_.files).getOrElse(Nil) ++ moved
        val v = prev.map(_.version + 1).getOrElse(1L)
        try {
          publish(dir, v, schema.toDDL, files, s"$tag-e$epochId",
            prev.map(_.txns).getOrElse(Map.empty) + (writerId -> epochId))
          cleanupStaging(); return
        } catch {
          case e: ConcurrentCommitException =>
            attempt += 1
            if (attempt > 50) throw e
        }
      }
    }

    override def abort(epochId: Long,
        messages: Array[WriterCommitMessage]): Unit = cleanupStaging()

    private def cleanupStaging(): Unit = {
      val st = new File(new File(dir, "_staging"), tag)
      Option(st.listFiles()).foreach(_.foreach(_.delete()))
      st.delete()
    }
  }

  private final class MStreamingWriterFactory(dir: String, schema: StructType,
      tag: String)
      extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long,
        epochId: Long): DataWriter[InternalRow] =
      newRowWriter(dir, schema, tag,
        f"$tag-e$epochId-part-$partitionId%05d-$taskId")
  }

  private final class MWriterFactory(dir: String, schema: StructType,
      queryId: String) extends DataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
      // (partitionId, taskId) alone is NOT unique across applications
      // — Spark task IDs restart from 0 in a fresh JVM, so a later
      // append could regenerate an already-committed name and the
      // commit's ATOMIC_MOVE would silently replace it, corrupting
      // every prior snapshot that references the file. The queryId
      // (a per-write UUID) namespaces the name.
      newRowWriter(dir, schema, queryId,
        f"$queryId-part-$partitionId%05d-$taskId")
  }

  /** One staged-TSV row writer: stages under `_staging/<stagingTag>/`,
    * records per-numeric-column (min, max) + row count, and returns
    * the staged file as its commit message. Shared by the batch and
    * streaming writer factories — the protocol differs only in WHO
    * moves the staged files and when.
    */
  private def newRowWriter(dir: String, schema: StructType,
      stagingTag: String, name: String): DataWriter[InternalRow] =
      new DataWriter[InternalRow] {
        private var out: java.io.BufferedWriter = _
        private var rows = 0L
        // per-numeric-column running (min, max) for the manifest's
        // data-skipping stats; null-valued cells don't participate.
        // Integral columns are tracked in Long, not Double: a Double
        // rounds above 2^53, and a rounded min/max can prove a FALSE
        // non-match in survives() — scan pruning and the DELETE stats
        // fast path would then skip files that DO contain matches.
        private val numeric = schema.fields.zipWithIndex.filter { case (f, _) =>
          f.dataType == LongType || f.dataType == IntegerType ||
            f.dataType == DoubleType
        }
        private val integral = numeric.map(_._1.dataType != DoubleType)
        private val seen = Array.fill(numeric.length)(false)
        private val lMins = Array.fill(numeric.length)(Long.MaxValue)
        private val lMaxs = Array.fill(numeric.length)(Long.MinValue)
        private val dMins = Array.fill(numeric.length)(Double.NaN)
        private val dMaxs = Array.fill(numeric.length)(Double.NaN)
        override def write(record: InternalRow): Unit = {
          if (out == null) {
            val st = new File(new File(dir, "_staging"), stagingTag)
            st.mkdirs()
            out = Files.newBufferedWriter(new File(st, name).toPath,
              StandardCharsets.UTF_8)
          }
          var k = 0
          while (k < numeric.length) {
            val (f, i) = numeric(k)
            if (!record.isNullAt(i)) {
              if (integral(k)) {
                val v = f.dataType match {
                  case LongType => record.getLong(i)
                  case _ => record.getInt(i).toLong
                }
                if (v < lMins(k)) lMins(k) = v
                if (v > lMaxs(k)) lMaxs(k) = v
              } else {
                val v = record.getDouble(i)
                if (dMins(k).isNaN || v < dMins(k)) dMins(k) = v
                if (dMaxs(k).isNaN || v > dMaxs(k)) dMaxs(k) = v
              }
              seen(k) = true
            }
            k += 1
          }
          out.write(encode(record, schema)); out.write('\n'); rows += 1
        }
        override def commit(): WriterCommitMessage = {
          if (out != null) out.close()
          val stats = numeric.indices.collect {
            case k if seen(k) =>
              if (integral(k))
                (numeric(k)._1.name, lMins(k).toString, lMaxs(k).toString)
              else
                (numeric(k)._1.name, dMins(k).toString, dMaxs(k).toString)
          }.toSeq
          StagedFile(if (rows > 0) name else "", rows,
            if (rows > 0) stats else Nil)
        }
        override def abort(): Unit = {
          if (out != null) out.close()
          new File(new File(new File(dir, "_staging"), stagingTag), name).delete()
        }
        override def close(): Unit = if (out != null) { out.close(); out = null }
      }

  // ---- row-level DELETE + maintenance --------------------------------

  private def filterSupported(f: org.apache.spark.sql.sources.Filter): Boolean = {
    import org.apache.spark.sql.sources._
    f match {
      case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual |
           _: LessThan | _: LessThanOrEqual | _: IsNull | _: IsNotNull => true
      case And(l, r) => filterSupported(l) && filterSupported(r)
      case AlwaysTrue() | AlwaysFalse() => true
      case _ => false
    }
  }

  /** Evaluate one supported filter against a decoded row (SQL
    * three-valued semantics collapse to "no match" on null operands,
    * exactly what WHERE does).
    */
  private def rowMatches(row: InternalRow, schema: StructType,
      f: org.apache.spark.sql.sources.Filter): Boolean = {
    import org.apache.spark.sql.sources._
    def idx(c: String): Int = schema.fieldIndex(c)
    def cmp(c: String, v: Any): Option[Int] = {
      val i = idx(c)
      if (row.isNullAt(i)) return None
      (schema.fields(i).dataType, v) match {
        case (LongType, n: java.lang.Number) =>
          Some(java.lang.Long.compare(row.getLong(i), n.longValue()))
        case (IntegerType, n: java.lang.Number) =>
          Some(java.lang.Integer.compare(row.getInt(i), n.intValue()))
        case (DoubleType, n: java.lang.Number) =>
          Some(java.lang.Double.compare(row.getDouble(i), n.doubleValue()))
        case (StringType, s: String) =>
          Some(row.getUTF8String(i).toString.compareTo(s))
        case (StringType, s: UTF8String) =>
          Some(row.getUTF8String(i).compareTo(s))
        case (BooleanType, b: java.lang.Boolean) =>
          Some(java.lang.Boolean.compare(row.getBoolean(i), b.booleanValue()))
        case _ => None
      }
    }
    f match {
      case EqualTo(c, v) => cmp(c, v).contains(0)
      case GreaterThan(c, v) => cmp(c, v).exists(_ > 0)
      case GreaterThanOrEqual(c, v) => cmp(c, v).exists(_ >= 0)
      case LessThan(c, v) => cmp(c, v).exists(_ < 0)
      case LessThanOrEqual(c, v) => cmp(c, v).exists(_ <= 0)
      case IsNull(c) => row.isNullAt(idx(c))
      case IsNotNull(c) => !row.isNullAt(idx(c))
      case And(l, r) => rowMatches(row, schema, l) && rowMatches(row, schema, r)
      case AlwaysTrue() => true
      case AlwaysFalse() => false
      case _ => false
    }
  }

  /** Recompute per-numeric-column (min, max) stats over decoded rows
    * (the same contract the write path collects streamingly).
    */
  private def statsOf(rows: Seq[InternalRow],
      schema: StructType): Map[String, (String, String)] =
    schema.fields.zipWithIndex.collect {
      case (f, i) if f.dataType == LongType || f.dataType == IntegerType =>
        // native Long, never Double: precision above 2^53 matters here
        val vs = rows.collect {
          case r if !r.isNullAt(i) => f.dataType match {
            case LongType => r.getLong(i)
            case _ => r.getInt(i).toLong
          }
        }
        if (vs.isEmpty) None
        else Some(f.name -> (vs.min.toString, vs.max.toString))
      case (f, i) if f.dataType == DoubleType =>
        val vs = rows.collect { case r if !r.isNullAt(i) => r.getDouble(i) }
        if (vs.isEmpty) None
        else Some(f.name -> (vs.min.toString, vs.max.toString))
    }.flatten.toMap

  /** `DELETE FROM` executor: file-granular copy-on-write with a
    * stats fast path — a file whose (min, max) ranges PROVE no row can
    * match the conjunction is carried into the new snapshot untouched
    * (metadata-only delete, the Iceberg/Delta partition-prune shape);
    * only files that MAY contain matches are rewritten, and a rewrite
    * that keeps nothing drops the file entry entirely. Old data files
    * stay on disk — prior snapshots still time-travel. The rewrite
    * here is driver-side because files are task-sized and few; at
    * 100 TB each surviving file's rewrite is an independent task of a
    * cluster job (same per-file protocol, embarrassingly parallel) —
    * the COMMIT shape (staged rewrite + one atomic manifest rename)
    * is identical.
    */
  private[sources] def deleteWhereImpl(dir: String,
      filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    val m = readManifest(dir, None).getOrElse(return)
    val schema = StructType.fromDDL(m.schemaDdl)
    var changed = false
    val v = m.version + 1
    val rewritten = m.files.zipWithIndex.map { case (e, fi) =>
      if (!survives(e, schema, filters.toSeq)) e // stats prove 0 matches
      else {
        val lines = Files.readAllLines(
          Paths.get(dir, e.path), StandardCharsets.UTF_8).asScala.toSeq
        val kept = lines.filterNot { l =>
          filters.forall(rowMatches(decode(l, schema), schema, _))
        }
        if (kept.length == lines.length) e
        else {
          changed = true
          if (kept.isEmpty) null // whole file deleted
          else {
            val name = f"delete-$v%09d-$fi%05d"
            val tmp = Paths.get(dir, "data", s".$name.tmp")
            Files.write(tmp, kept.mkString("", "\n", "\n")
              .getBytes(StandardCharsets.UTF_8))
            Files.move(tmp, Paths.get(dir, "data", name),
              StandardCopyOption.ATOMIC_MOVE)
            FileEntry(s"data/$name", statsOf(kept.map(decode(_, schema)), schema),
              kept.length.toLong)
          }
        }
      }
    }.filter(_ != null)
    // publish v+1 even when nothing matched: DELETE committed ⇒ a new
    // snapshot exists (readers of "latest" see a post-delete world)
    publish(dir, v, m.schemaDdl, rewritten, s"delete-$v", m.txns)
    if (!changed) () // kept for clarity: the empty delete still commits
  }

  /** Bin-packing COMPACTION (the OPTIMIZE maintenance op): groups the
    * current snapshot's files greedily into ≤ `targetBytes` bins and
    * concatenates each multi-file bin into one file, publishing a new
    * snapshot whose row multiset is IDENTICAL — small-file compaction
    * changes layout, never data. Merged data-skipping stats are the
    * per-column (min of mins, max of maxs), kept only when every input
    * file carries that column's stats (conservative: absent stats
    * never prune). Prior snapshots still time-travel to the
    * pre-compaction layout. Driver-side concat for the same reason as
    * [[deleteWhereImpl]] — each bin is an independent task of a
    * cluster job at scale; returns the new version.
    */
  def compact(dir: String, targetBytes: Long = 64L * 1024 * 1024): Long = {
    val m = readManifest(dir, None).getOrElse(
      sys.error(s"graft-manifest: nothing to compact under $dir"))
    val v = m.version + 1
    val sized = m.files.map(e => e -> new File(dir, e.path).length())
    val bins = scala.collection.mutable.ArrayBuffer
      .empty[scala.collection.mutable.ArrayBuffer[(FileEntry, Long)]]
    var cur = scala.collection.mutable.ArrayBuffer.empty[(FileEntry, Long)]
    var curBytes = 0L
    for (fe <- sized) {
      if (cur.nonEmpty && curBytes + fe._2 > targetBytes) {
        bins += cur
        cur = scala.collection.mutable.ArrayBuffer.empty[(FileEntry, Long)]
        curBytes = 0L
      }
      cur += fe; curBytes += fe._2
    }
    if (cur.nonEmpty) bins += cur
    val entries = bins.zipWithIndex.map { case (bin, bi) =>
      if (bin.length == 1) bin.head._1
      else {
        val name = f"compact-$v%09d-$bi%05d"
        val tmp = Paths.get(dir, "data", s".$name.tmp")
        val out = Files.newOutputStream(tmp)
        try bin.foreach { case (e, _) =>
          out.write(Files.readAllBytes(Paths.get(dir, e.path)))
        } finally out.close()
        Files.move(tmp, Paths.get(dir, "data", name),
          StandardCopyOption.ATOMIC_MOVE)
        val cols = bin.map(_._1.stats.keySet).reduce(_ intersect _)
        val merged = cols.map { c =>
          // compare in exact decimal but KEEP the winning original
          // string: long stats stay bit-exact, never rounded via Double
          val rs = bin.map(_._1.stats(c))
          c -> (rs.map(_._1).minBy(BigDecimal(_)),
            rs.map(_._2).maxBy(BigDecimal(_)))
        }.toMap
        // row count survives compaction only when every input knew its
        // own (legacy -1 poisons the sum — conservative, never wrong)
        val mergedRows = if (bin.forall(_._1.rows >= 0))
          bin.map(_._1.rows).sum else -1L
        FileEntry(s"data/$name", merged, mergedRows)
      }
    }.toSeq
    publish(dir, v, m.schemaDdl, entries, s"compact-$v", m.txns)
    v
  }

  /** SNAPSHOT EXPIRATION + data-file GC (round 10 — Iceberg
    * `expireSnapshots` and Delta `VACUUM` in one maintenance op, the
    * retention half that bounds a table's storage against its write
    * history): drops all but the newest `keepLast` manifests, then
    * physically deletes every file under `data/` that NO RETAINED
    * manifest references — which sweeps (a) data files only expired
    * snapshots referenced (old overwrites, pre-compaction layouts,
    * delete-rewritten inputs) and (b) orphans from crashed commits
    * (moved but never published — always manifest-invisible, now also
    * reclaimed). `graceMs` is the Delta-VACUUM-retention safety valve:
    * a file younger than the grace is NEVER deleted, which protects
    * the window between a concurrent commit's file moves and its
    * manifest publish (production runs hours of grace; tests use 0
    * with writes quiesced). Time travel to an expired version fails
    * loudly at read; retained versions are untouched — including the
    * streaming `txn` high-water marks, which live in the manifests
    * themselves. Returns (expired manifest count, deleted file count).
    */
  def expireSnapshots(dir: String, keepLast: Int = 2,
      graceMs: Long = 0L): (Long, Long) = {
    require(keepLast >= 1, "graft-manifest: keepLast must be >= 1")
    val d = new File(dir)
    val versions = Option(
      d.listFiles((f: File) => f.getName.startsWith("manifest-")))
      .getOrElse(Array.empty)
      .map(_.getName.stripPrefix("manifest-").toLong).sorted.toSeq
    if (versions.isEmpty) return (0L, 0L)
    val (expired, retained) =
      versions.splitAt(math.max(0, versions.length - keepLast))
    val referenced: Set[String] = retained.flatMap(v =>
      readManifest(dir, Some(v)).toSeq.flatMap(_.files.map(_.path))).toSet
    expired.foreach(v => manifestFile(dir, v).delete())
    val now = System.currentTimeMillis()
    var deleted = 0L
    Option(new File(dir, "data").listFiles()).getOrElse(Array.empty)
      .foreach { f =>
        if (f.isFile && !referenced.contains(s"data/${f.getName}") &&
            now - f.lastModified() >= graceMs && f.delete()) deleted += 1
      }
    (expired.length.toLong, deleted)
  }

  /** The single atomic commit point shared by write, delete and
    * compaction: temp manifest + PUT-IF-ABSENT link. `Files.createLink`
    * is link(2), which fails with EEXIST when manifest-v already
    * exists — the compare-and-swap every Delta/Iceberg log store must
    * provide. A plain rename(2) (ATOMIC_MOVE) silently REPLACES, so a
    * zombie driver racing a restarted one, or a batch append racing a
    * streaming epoch, could both read version v and publish v+1 with
    * the loser clobbering the winner's committed snapshot (round-11
    * ADVICE fix). On conflict the committer gets
    * [[ConcurrentCommitException]]: append paths re-read and retry
    * against the new snapshot; rewrite paths (delete/compact) surface
    * it, because their rewrite premise is stale. At 100 TB the same
    * contract is delegated to the object store's conditional put.
    */
  private[graft] def publish(dir: String, v: Long, schemaDdl: String,
      files: Seq[FileEntry], tag: String,
      txns: Map[String, Long] = Map.empty): Unit = {
    val body = (Seq(s"version=$v", s"schema=$schemaDdl") ++
      txns.toSeq.sortBy(_._1).map { case (w, e) => s"txn=$w;$e" } ++
      files.map(f => s"file=${encodeEntry(f)}")).mkString("", "\n", "\n")
    val tmp = Paths.get(dir, s".manifest-$v.$tag.tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    try Files.createLink(manifestFile(dir, v).toPath, tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new ConcurrentCommitException(
          s"graft-manifest: manifest-$v already committed under $dir " +
            s"(lost the publish race; tag=$tag)")
    }
    Files.deleteIfExists(tmp)
  }

  // ---- read path -----------------------------------------------------
  private final case class MInputPartition(file: String) extends InputPartition

  /** DATA SKIPPING: conjunctive comparison predicates on numeric
    * columns prune whole files by the manifest's per-file (min, max)
    * stats before any task launches — the Iceberg/Delta scan shape.
    * Every pushed filter is also RETAINED as a post-scan filter
    * (pushFilters returns its input), so pruning is a pure
    * optimization and can never change results; files without stats
    * (older manifests, all-null columns) are never pruned.
    *
    * COLUMN PRUNING (round 9): `pruneColumns` narrows the decode to
    * the required fields — the TSV line is still tab-split (it must
    * be, to find field boundaries) but only required cells pay value
    * parsing and UTF8String allocation, and the emitted row has the
    * pruned arity. `.explain` shows ReadSchema = the pruned struct.
    *
    * AGGREGATE PUSHDOWN (round 9): global MIN/MAX/COUNT(*) answer
    * from the MANIFEST ALONE — min of per-file mins, max of per-file
    * maxes, sum of per-file row counts — when the metadata can prove
    * the answer: no residual filters (this source keeps every pushed
    * filter as a post-scan filter, so any filter at all disqualifies),
    * no grouping, MIN/MAX only on numeric columns whose stats every
    * file carries, COUNT(*) only when every file records its row
    * count (pre-round-9 manifests don't → clean fallback to a real
    * scan). The scan then plans ZERO data-file partitions — the
    * Iceberg metadata-only query shape; ManifestTableSpec proves it
    * by deleting the data files and asking again.
    */
  private final class MScanBuilder(dir: String, schema: StructType,
      entries: Seq[FileEntry]) extends ScanBuilder
      with org.apache.spark.sql.connector.read.SupportsPushDownFilters
      with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
      with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
    private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
    private var required: StructType = schema
    private var aggRow: Option[(StructType, Array[Any])] = None
    override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
        : Array[org.apache.spark.sql.sources.Filter] = {
      pushed = filters
      filters // every filter stays a post-scan filter; pruning is advisory
    }
    override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
      pushed
    override def pruneColumns(requiredSchema: StructType): Unit =
      required = requiredSchema

    /** Resolve the aggregation to its manifest-computed single row, or
      * None when the metadata cannot PROVE the answer.
      */
    private def planAgg(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
        : Option[(StructType, Array[Any])] = {
      import org.apache.spark.sql.connector.expressions.NamedReference
      import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
      if (pushed.nonEmpty || agg.groupByExpressions().nonEmpty) return None
      def colOf(e: org.apache.spark.sql.connector.expressions.Expression)
          : Option[StructField] = e match {
        case nr: NamedReference if nr.fieldNames().length == 1 =>
          schema.fields.find(_.name == nr.fieldNames()(0))
        case _ => None
      }
      def extremum(f: StructField, lo: Boolean): Option[Any] = {
        if (!entries.forall(_.stats.contains(f.name))) return None
        if (entries.isEmpty) return Some(null) // MIN/MAX over 0 rows
        val raw = entries.map(e =>
          if (lo) e.stats(f.name)._1 else e.stats(f.name)._2)
        f.dataType match {
          case LongType =>
            Some(if (lo) raw.map(_.toLong).min else raw.map(_.toLong).max)
          case IntegerType =>
            Some(if (lo) raw.map(_.toInt).min else raw.map(_.toInt).max)
          case DoubleType =>
            Some(if (lo) raw.map(_.toDouble).min else raw.map(_.toDouble).max)
          case _ => None // string stats are not collected; never prove
        }
      }
      val resolved = agg.aggregateExpressions().map {
        case m: Min => colOf(m.column()).flatMap(f =>
          extremum(f, lo = true).map(v => (f.dataType, v)))
        case m: Max => colOf(m.column()).flatMap(f =>
          extremum(f, lo = false).map(v => (f.dataType, v)))
        case _: CountStar =>
          if (entries.forall(_.rows >= 0L))
            Some((LongType: DataType, entries.map(_.rows).sum: Any))
          else None
        case _ => None
      }
      if (resolved.exists(_.isEmpty)) None
      else Some((StructType(resolved.zipWithIndex.map { case (r, i) =>
        StructField(s"agg_$i", r.get._1, nullable = true) }),
        resolved.map(_.get._2)))
    }

    override def supportCompletePushDown(
        agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
      planAgg(agg).isDefined

    override def pushAggregation(
        agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
      aggRow = planAgg(agg)
      aggRow.isDefined
    }

    override def build(): Scan = aggRow match {
      case Some((aggSchema, values)) => new MAggScan(aggSchema, values)
      case None => new MScan(dir, schema, required, entries, pushed.toSeq)
    }
  }

  /** Metadata-only aggregate result: one partition, one row, zero data
    * files opened.
    */
  private final class MAggScan(aggSchema: StructType, values: Array[Any])
      extends Scan with Batch {
    override def readSchema(): StructType = aggSchema
    override def toBatch: Batch = this
    override def description(): String =
      s"graft-manifest metadata-only aggregate ${aggSchema.fieldNames.mkString(",")}"
    override def planInputPartitions(): Array[InputPartition] =
      Array(MInputPartition("<manifest>"))
    override def createReaderFactory(): PartitionReaderFactory = {
      val vs = values
      new PartitionReaderFactory {
        override def createReader(p: InputPartition): PartitionReader[InternalRow] =
          new PartitionReader[InternalRow] {
            private var emitted = false
            override def next(): Boolean =
              if (emitted) false else { emitted = true; true }
            override def get(): InternalRow = new GenericInternalRow(vs.clone())
            override def close(): Unit = ()
          }
      }
    }
  }

  private def survives(e: FileEntry, schema: StructType,
      filters: Seq[org.apache.spark.sql.sources.Filter]): Boolean = {
    import org.apache.spark.sql.sources._
    // compare in exact decimal, not Double: a BIGINT min/max above 2^53
    // rounded through Double could prove a false non-match and prune a
    // file that holds matching rows (NaN/Inf stats fail the parse →
    // None → never prune, the conservative direction)
    def rng(col: String): Option[(BigDecimal, BigDecimal)] =
      e.stats.get(col).flatMap { case (mn, mx) =>
        try Some((BigDecimal(mn), BigDecimal(mx)))
        catch { case _: Exception => None }
      }
    def num(v: Any): Option[BigDecimal] = v match {
      case n: java.lang.Long => Some(BigDecimal(n.longValue()))
      case n: java.lang.Integer => Some(BigDecimal(n.intValue()))
      case n: java.lang.Short => Some(BigDecimal(n.intValue()))
      case n: java.lang.Byte => Some(BigDecimal(n.intValue()))
      case n: java.math.BigDecimal => Some(BigDecimal(n))
      case n: java.lang.Number =>
        try Some(BigDecimal(n.doubleValue()))
        catch { case _: Exception => None } // NaN/Inf probe → no prune
      case _ => None
    }
    filters.forall {
      case EqualTo(c, v) => (rng(c), num(v)) match {
        case (Some((mn, mx)), Some(x)) => x >= mn && x <= mx
        case _ => true
      }
      case GreaterThan(c, v) => (rng(c), num(v)) match {
        case (Some((_, mx)), Some(x)) => mx > x
        case _ => true
      }
      case GreaterThanOrEqual(c, v) => (rng(c), num(v)) match {
        case (Some((_, mx)), Some(x)) => mx >= x
        case _ => true
      }
      case LessThan(c, v) => (rng(c), num(v)) match {
        case (Some((mn, _)), Some(x)) => mn < x
        case _ => true
      }
      case LessThanOrEqual(c, v) => (rng(c), num(v)) match {
        case (Some((mn, _)), Some(x)) => mn <= x
        case _ => true
      }
      // runtime (DPP) filters arrive as IN-sets of join-key values: the
      // file survives when ANY value falls inside its [min, max]. An
      // EMPTY IN-set matches no rows, so a stats-bearing column prunes
      // the file outright (a fully-selective dim filter should drop
      // every fact file); only a stats-less column keeps the
      // conservative read-everything path.
      case In(c, vs) => rng(c) match {
        case Some((mn, mx)) =>
          vs.exists(v => num(v) match {
            case Some(x) => x >= mn && x <= mx
            case None => true
          })
        case _ => true
      }
      case _ => true
    }
  }

  /** Data files actually opened by partition readers, keyed by table
    * directory — the behavioral probe ManifestTableSpec uses to PROVE
    * static and runtime pruning skip file I/O (plan text alone can lie
    * about what executes). Keyed per table dir (not one process-global
    * counter) so concurrent queries over OTHER tables — parallel test
    * suites, a second session — cannot interleave increments into the
    * counter a spec is asserting on; assertions remain racy only for
    * concurrent scans of the SAME directory, which a spec controls.
    */
  private val filesOpenedByDir =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
  private def openKey(dir: String): String = new File(dir).getAbsolutePath
  private[sources] def recordFileOpened(dir: String): Unit =
    filesOpenedByDir
      .computeIfAbsent(openKey(dir), _ => new java.util.concurrent.atomic.AtomicLong(0L))
      .incrementAndGet()
  /** Files opened for `dir` since the last [[resetFilesOpened]]. */
  def filesOpened(dir: String): Long = {
    val c = filesOpenedByDir.get(openKey(dir))
    if (c == null) 0L else c.get()
  }
  def resetFilesOpened(dir: String): Unit = {
    val c = filesOpenedByDir.get(openKey(dir))
    if (c != null) c.set(0L)
  }

  private final class MScan(dir: String, schema: StructType,
      required: StructType, entries: Seq[FileEntry],
      filters: Seq[org.apache.spark.sql.sources.Filter])
      extends Scan with Batch
      with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
      with org.apache.spark.sql.connector.read.SupportsReportStatistics {
    // RUNTIME (DPP) FILTERING, round 9: a broadcast join whose dim side
    // is selective hands this scan an IN-set of join-key values at
    // execution time; the same per-file (min, max) stats that serve
    // static pushdown then drop whole files before their read tasks
    // launch. With a clusterBy-ranged layout this is the
    // Iceberg/Delta dynamic-file-pruning shape: fact I/O tracks the
    // dim's selectivity, not the fact's size.
    @volatile private var runtime: Seq[org.apache.spark.sql.sources.Filter] = Nil
    override def filterAttributes()
        : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
      // only columns in the PRUNED output: Spark resolves these against
      // the scan's output attributes, so a pruned-away column here is
      // an analysis error, not a missed optimization
      required.fields.filter(f => f.dataType == LongType ||
          f.dataType == IntegerType || f.dataType == DoubleType)
        .map(f => org.apache.spark.sql.connector.expressions.Expressions
          .column(f.name))
    override def filter(fs: Array[org.apache.spark.sql.sources.Filter]): Unit =
      runtime = fs.toSeq
    private def kept: Seq[FileEntry] =
      entries.filter(survives(_, schema, filters ++ runtime))
    // SupportsReportStatistics: planner-visible size/row counts from
    // the manifest — post-pruning, so a selective static filter also
    // shrinks the estimate and a small filtered scan becomes
    // broadcast-eligible (the capability SyntheticV2 gained in round 8;
    // here the numbers are exact metadata, not heuristics)
    override def estimateStatistics()
        : org.apache.spark.sql.connector.read.Statistics =
      new org.apache.spark.sql.connector.read.Statistics {
        private val ks = kept
        override def sizeInBytes(): java.util.OptionalLong =
          java.util.OptionalLong.of(
            ks.map(f => new File(dir, f.path).length()).sum)
        override def numRows(): java.util.OptionalLong =
          if (ks.forall(_.rows >= 0L))
            java.util.OptionalLong.of(ks.map(_.rows).sum)
          else java.util.OptionalLong.empty()
      }
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"graft-manifest ${kept.length}/${entries.length} files, " +
        s"read ${required.fieldNames.mkString(",")}"
    override def planInputPartitions(): Array[InputPartition] =
      kept.map(f => MInputPartition(new File(dir, f.path).getAbsolutePath)).toArray
    override def createReaderFactory(): PartitionReaderFactory = {
      val full = schema
      val req = required
      val tableDir = dir
      new PartitionReaderFactory {
        override def createReader(p: InputPartition): PartitionReader[InternalRow] =
          new PartitionReader[InternalRow] {
            private val it = {
              recordFileOpened(tableDir)
              Files.readAllLines(
                Paths.get(p.asInstanceOf[MInputPartition].file),
                StandardCharsets.UTF_8).iterator()
            }
            private var cur: InternalRow = _
            override def next(): Boolean =
              if (it.hasNext) { cur = decodeProj(it.next(), full, req); true }
              else false
            override def get(): InternalRow = cur
            override def close(): Unit = ()
          }
      }
    }
  }
}
