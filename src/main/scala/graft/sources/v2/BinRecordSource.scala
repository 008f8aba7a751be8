package graft.sources.v2

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 reader for fixed-width big-endian binary records —
  * the FITS-bintable bulk-load path as a first-class Spark source:
  *
  * {{{
  *   spark.read.format("graft.sources.v2.BinRecordSource")
  *     .schema(recordSchema)            // plays the FITS header
  *     .option("path", dir)
  *     .load()
  * }}}
  *
  * Why a full V2 source instead of the RDD decode
  * ([[graft.sources.Catalog.readBinaryRecords]]):
  *  - **Column pruning reaches the byte level.** The scan implements
  *    `SupportsPushDownRequiredColumns`, so `SELECT two columns`
  *    decodes two fields per record and skips the rest by offset —
  *    on a 100-column catalog dump that is a ~50× decode saving the
  *    RDD path cannot express (`ReadSchema` in explain shows it).
  *  - **Record-aligned splits.** Files are split at multiples of the
  *    record length into `maxSplitBytes`-sized partitions (the same
  *    contract as Hadoop text splits), so ingest parallelism scales
  *    with bytes, not files — one 1 TB dump still fans out across the
  *    cluster.
  *  - Engine-integrated: the result is a normal `DataFrame`; filters,
  *    projections and writes compose, and `spark.read.format(...)`
  *    needs no library import at the call site.
  *
  * Supported field types (all big-endian, as FITS mandates):
  * Long/Double (8 bytes), Int/Float (4), Short (2). The schema is
  * declared by the caller (`supportsExternalMetadata`) — a binary
  * dump carries no self-describing footer to infer from.
  */
class BinRecordSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  /** A binary dump carries no self-describing footer; the schema comes
    * from `.schema(...)` (read path) or the `recordSchema` DDL option
    * (required on the WRITE path, where `DataFrameWriter` has no
    * schema method and Spark falls back to `inferSchema`). */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Option(options.get("recordSchema")).map(StructType.fromDDL).getOrElse(
      throw new IllegalArgumentException(
        "binrec carries no self-describing schema: declare one with " +
          ".schema(...) or .option(\"recordSchema\", <ddl>)"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
    properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "option 'path' is required")
    BinRecordTable(schema, path,
      Option(properties.get("maxSplitBytes")).map(_.toLong)
        .getOrElse(BinRecord.DefaultSplitBytes))
  }
}

/** Record-layout arithmetic + file-visibility rule, shared with the
  * RDD ingest path ([[graft.sources.Catalog.readBinaryRecords]]) so
  * the two readers cannot drift. */
private[sources] object BinRecord {
  val DefaultSplitBytes: Long = 128L * 1024 * 1024

  def width(dt: DataType): Int = dt match {
    case LongType | DoubleType => 8
    case IntegerType | FloatType => 4
    case ShortType => 2
    case other => throw new IllegalArgumentException(
      s"unsupported binary-record field type $other")
  }

  /** Byte offset of each field inside one record. */
  def offsets(schema: StructType): Array[Int] =
    schema.fields.map(f => width(f.dataType)).scanLeft(0)(_ + _).dropRight(1)

  def recordLength(schema: StructType): Int =
    schema.fields.map(f => width(f.dataType)).sum

  /** The convention every Spark source applies: underscore/dot names
    * (staging dirs, markers, checksums) are invisible to reads. */
  def visible(name: String): Boolean =
    !name.startsWith("_") && !name.startsWith(".")
}

private[v2] case class BinRecordTable(tableSchema: StructType, path: String,
  maxSplitBytes: Long) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"binrec($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BinRecordScanBuilder(tableSchema, path, maxSplitBytes)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // the byte layout IS the schema: a mis-ordered or retyped query
    // schema would scramble every record, so demand an exact match
    val q = info.schema()
    require(q.fields.map(f => (f.name, f.dataType)).toSeq ==
      tableSchema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"write schema ${q.toDDL} does not match declared record layout " +
        s"${tableSchema.toDDL}")
    BinRecord.recordLength(q) // rejects unsupported field types loudly
    new BinRecordWriteBuilder(q, path, info.queryId())
  }
}

/** One pushed comparison, compiled to byte-offset form on the driver:
  * the reader evaluates it directly on the record buffer and skips
  * failing records BEFORE any row is materialized — predicate
  * pushdown at the byte level, the V2 analog of a parquet row-group
  * filter for a format with no statistics. `integral` picks the exact
  * comparison space (long for Long/Int/Short fields, double for
  * Float/Double) so no filter is ever approximated. */
private[v2] case class BinPred(off: Int, dt: DataType, op: String,
  integral: Boolean, lv: Long, dv: Double) {
  def eval(bb: java.nio.ByteBuffer): Boolean = {
    if (integral) {
      val x = dt match {
        case LongType => bb.getLong(off)
        case IntegerType => bb.getInt(off).toLong
        case ShortType => bb.getShort(off).toLong
        case other => throw new IllegalStateException(other.toString)
      }
      op match {
        case "=" => x == lv
        case ">" => x > lv
        case ">=" => x >= lv
        case "<" => x < lv
        case "<=" => x <= lv
      }
    } else {
      val x = dt match {
        case DoubleType => bb.getDouble(off)
        case FloatType => bb.getFloat(off).toDouble
        case other => throw new IllegalStateException(other.toString)
      }
      // Spark SQL's total order (SQLOrderingUtil semantics): -0.0 ==
      // 0.0, NaN == NaN, and NaN sorts above every other value. Raw
      // Java comparisons would silently drop NaN rows that Spark's
      // own post-scan evaluation keeps — and since these filters are
      // claimed as exactly handled, Spark never re-checks them.
      // (float→double widening is exact, so comparing in double space
      // preserves the float ordering.)
      val cmp = if (x == dv) 0 else java.lang.Double.compare(x, dv)
      op match {
        case "=" => cmp == 0
        case ">" => cmp > 0
        case ">=" => cmp >= 0
        case "<" => cmp < 0
        case "<=" => cmp <= 0
      }
    }
  }
}

private[v2] class BinRecordScanBuilder(full: StructType, path: String,
  maxSplitBytes: Long) extends ScanBuilder
  with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = full
  private var pushed: Array[sources.Filter] = Array.empty

  /** Catalyst hands us the projected schema; keep the FILE order so
    * field offsets stay monotone in the decode loop. */
  override def pruneColumns(requiredSchema: StructType): Unit = {
    val keep = requiredSchema.fieldNames.toSet
    required = StructType(full.fields.filter(f => keep.contains(f.name)))
  }

  private val offsetOf: Map[String, Int] =
    full.fieldNames.zip(BinRecord.offsets(full)).toMap

  /** A literal is acceptable for an integral field only when it IS
    * integral — `id > 3.5` must not silently become `id > 3` (for
    * `>=` the two differ); such filters stay with Spark. */
  private def compile(att: String, op: String, v: Any): Option[BinPred] =
    full.fields.find(_.name == att).flatMap { f =>
      val integral = f.dataType match {
        case LongType | IntegerType | ShortType => true
        case DoubleType | FloatType => false
      }
      v match {
        case n: Number =>
          val dv = n.doubleValue()
          if (integral && dv != math.rint(dv)) None
          else Some(BinPred(offsetOf(att), f.dataType, op, integral,
            n.longValue(), dv))
        case _ => None
      }
    }

  private def toPred(fl: sources.Filter): Option[BinPred] = fl match {
    case sources.EqualTo(a, v) => compile(a, "=", v)
    case sources.GreaterThan(a, v) => compile(a, ">", v)
    case sources.GreaterThanOrEqual(a, v) => compile(a, ">=", v)
    case sources.LessThan(a, v) => compile(a, "<", v)
    case sources.LessThanOrEqual(a, v) => compile(a, "<=", v)
    // fixed-width binary fields can never be NULL: trivially true
    case sources.IsNotNull(_) => Some(BinPred(0, LongType, "notnull", true, 0L, 0.0))
    case _ => None
  }

  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    val (ok, rest) = filters.partition(f => toPred(f).isDefined)
    pushed = ok
    rest // Spark evaluates what the byte-level reader can't prove exactly
  }

  override def pushedFilters(): Array[sources.Filter] = pushed

  override def build(): Scan = BinRecordScan(full, required, path, maxSplitBytes,
    pushed.flatMap(toPred).filter(_.op != "notnull"), pushed.map(_.toString))
}

/** One record-aligned byte range of one file. */
private[v2] case class BinRecordPartition(file: String, start: Long,
  length: Long) extends InputPartition

private[v2] case class BinRecordScan(full: StructType, required: StructType,
  path: String, maxSplitBytes: Long, preds: Array[BinPred],
  pushedDesc: Array[String]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"binrec $path recLen=${BinRecord.recordLength(full)} " +
      s"ReadFields=${required.fieldNames.mkString(",")} " +
      s"PushedFilters=[${pushedDesc.mkString(", ")}]"

  /** Driver-side planning: list visible files, validate record
    * alignment (a truncated file fails loudly HERE, not as a silently
    * short partition), and cut record-aligned splits. Directory glob
    * matches expand one level (the same contract as the RDD ingest
    * path) — a match is never silently dropped. */
  override def planInputPartitions(): Array[InputPartition] = {
    val recLen = BinRecord.recordLength(full).toLong
    val hconf = SparkSession.active.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(hconf)
    def visible(st: FileStatus) = BinRecord.visible(st.getPath.getName)
    val globbed =
      if (fs.isDirectory(p)) Array(fs.getFileStatus(p))
      else Option(fs.globStatus(p)).getOrElse(Array.empty[FileStatus])
    val matched = globbed.toSeq.flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).filter(_.isFile).filter(visible).toSeq
      else Seq(st).filter(visible)
    }
    require(matched.nonEmpty, s"no (visible) binary input files at $path")
    // split size: a whole number of records, at least one
    val split = math.max((maxSplitBytes / recLen) * recLen, recLen)
    matched.flatMap { st =>
      require(st.getLen % recLen == 0,
        s"${st.getPath} length ${st.getLen} is not a multiple of record " +
          s"length $recLen (truncated or mis-declared binary table)")
      (0L until st.getLen by split).map { off =>
        BinRecordPartition(st.getPath.toString, off,
          math.min(split, st.getLen - off))
      }
    }.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // executors must see the DRIVER's Hadoop configuration (including
    // spark.hadoop.* injections, which never reach a classpath
    // core-site.xml), so ship it as a plain serializable key→value map
    val hconf = SparkSession.active.sparkContext.hadoopConfiguration
    val it = hconf.iterator()
    val entries = Array.newBuilder[(String, String)]
    while (it.hasNext) { val e = it.next(); entries += (e.getKey -> e.getValue) }
    BinRecordReaderFactory(full, required, preds, entries.result())
  }
}

private[v2] case class BinRecordReaderFactory(full: StructType,
  required: StructType, preds: Array[BinPred],
  confEntries: Array[(String, String)])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val conf = new Configuration(false)
    confEntries.foreach { case (k, v) => conf.set(k, v) }
    new BinRecordReader(full, required, preds, conf,
      partition.asInstanceOf[BinRecordPartition])
  }
}

/** Streams one byte range, decoding ONLY the required fields of each
  * record by absolute offset (pruned fields are never touched), and
  * dropping records that fail a pushed filter BEFORE any row exists. */
private[v2] class BinRecordReader(full: StructType, required: StructType,
  preds: Array[BinPred], conf: Configuration, part: BinRecordPartition)
  extends PartitionReader[InternalRow] {

  private val recLen = BinRecord.recordLength(full)
  private val allOffsets = BinRecord.offsets(full)
  private val fieldIdx = full.fieldNames.zipWithIndex.toMap
  // (offset-in-record, type) per required field, in output order
  private val wanted: Array[(Int, DataType)] =
    required.fields.map(f => (allOffsets(fieldIdx(f.name)), f.dataType))

  private val fs = new Path(part.file).getFileSystem(conf)
  private val in = fs.open(new Path(part.file))
  in.seek(part.start)

  // Long arithmetic: a partition can legally exceed Int.MaxValue
  // records (tiny recLen × large maxSplitBytes) — an Int cast here
  // would silently drop rows
  private val totalRecords: Long = part.length / recLen
  private val buf = new Array[Byte](recLen)
  private var readRecords = 0L
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (readRecords < totalRecords) {
      in.readFully(buf, 0, recLen)
      readRecords += 1
      val bb = java.nio.ByteBuffer.wrap(buf).order(java.nio.ByteOrder.BIG_ENDIAN)
      var p = 0
      var pass = true
      while (pass && p < preds.length) {
        pass = preds(p).eval(bb)
        p += 1
      }
      if (pass) {
        val row = new GenericInternalRow(wanted.length)
        var i = 0
        while (i < wanted.length) {
          val (off, dt) = wanted(i)
          dt match {
            case LongType => row.setLong(i, bb.getLong(off))
            case DoubleType => row.setDouble(i, bb.getDouble(off))
            case IntegerType => row.setInt(i, bb.getInt(off))
            case FloatType => row.setFloat(i, bb.getFloat(off))
            case ShortType => row.setShort(i, bb.getShort(off))
            case other => throw new IllegalStateException(other.toString)
          }
          i += 1
        }
        current = row
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}

// ---------------------------------------------------------------------
// Write path — the round-trip half of the FITS-bintable analog.
//
// Commit protocol (the same two-phase discipline as Spark's file
// sources): each task streams its records to
// `<path>/_staging_<queryId>/part-<partition>-<task>-<queryId>.bin` —
// invisible
// to concurrent reads by the underscore rule — and the JOB commit
// renames the staged files into place (under truncate/overwrite the
// pre-existing files are deleted AFTER the renames, so a mid-commit
// crash shows old+new rows, never a torn or emptied table). A failed
// task or job only ever leaves staging garbage behind; a re-attempted
// task writes a new file keyed by its task id.

private[v2] class BinRecordWriteBuilder(schema: StructType, path: String,
  queryId: String) extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = BinRecordWrite(schema, path, queryId, doTruncate)
}

private[v2] case class BinWriteMessage(staged: String) extends WriterCommitMessage

private[v2] case class BinRecordWrite(schema: StructType, path: String,
  queryId: String, truncate: Boolean) extends Write with BatchWrite {
  override def toBatch: BatchWrite = this

  private def hconfEntries: Array[(String, String)] = {
    val hconf = SparkSession.active.sparkContext.hadoopConfiguration
    val it = hconf.iterator()
    val entries = Array.newBuilder[(String, String)]
    while (it.hasNext) { val e = it.next(); entries += (e.getKey -> e.getValue) }
    entries.result()
  }

  private def stagingDir = new Path(path, s"_staging_$queryId")

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
    : DataWriterFactory = {
    val hconf = SparkSession.active.sparkContext.hadoopConfiguration
    stagingDir.getFileSystem(hconf).mkdirs(stagingDir)
    BinRecordWriterFactory(schema, stagingDir.toString, queryId, hconfEntries)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val hconf = SparkSession.active.sparkContext.hadoopConfiguration
    val dest = new Path(path)
    val fs = dest.getFileSystem(hconf)
    val recLen = BinRecord.recordLength(schema)
    val staged = messages.collect { case BinWriteMessage(f) => new Path(f) }
    // a torn staged file must fail the JOB, before any rename
    staged.foreach { f =>
      val len = fs.getFileStatus(f).getLen
      require(len % recLen == 0,
        s"staged file $f length $len is not a multiple of record length $recLen")
    }
    // truncate order matters: capture the OLD files first, rename the
    // staged files IN (their names embed the per-query UUID, so they
    // can never collide with old files), and only then delete the old
    // generation. A crash mid-commit therefore leaves old+new rows
    // visible (re-running the overwrite converges) — never a torn or
    // emptied table, which delete-first would produce.
    val old = if (truncate)
      fs.listStatus(dest).filter(_.isFile)
        .filter(st => BinRecord.visible(st.getPath.getName))
        .map(_.getPath)
    else Array.empty[Path]
    staged.foreach { f =>
      require(fs.rename(f, new Path(dest, f.getName)),
        s"could not commit staged file $f into $dest")
    }
    old.foreach(f => fs.delete(f, false))
    fs.delete(stagingDir, true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val hconf = SparkSession.active.sparkContext.hadoopConfiguration
    stagingDir.getFileSystem(hconf).delete(stagingDir, true)
  }
}

private[v2] case class BinRecordWriterFactory(schema: StructType,
  stagingDir: String, queryId: String, confEntries: Array[(String, String)])
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
    : DataWriter[InternalRow] = {
    val conf = new Configuration(false)
    confEntries.foreach { case (k, v) => conf.set(k, v) }
    // the per-query UUID rides into the COMMITTED name: task ids
    // restart per application, so without it two appends from
    // different applications could collide mid-rename (a partially
    // committed batch with no rollback)
    new BinRecordDataWriter(schema, conf,
      new Path(stagingDir, f"part-$partitionId%05d-$taskId-$queryId.bin"))
  }
}

/** Encodes rows big-endian at the declared fixed width. Fixed-width
  * records have no null representation, so a null field fails the
  * task loudly instead of writing garbage bytes. */
private[v2] class BinRecordDataWriter(schema: StructType,
  conf: Configuration, file: Path) extends DataWriter[InternalRow] {
  private val recLen = BinRecord.recordLength(schema)
  private val types = schema.fields.map(_.dataType)
  private val fs = file.getFileSystem(conf)
  private val out = fs.create(file, true)
  private val buf = java.nio.ByteBuffer.allocate(recLen)
    .order(java.nio.ByteOrder.BIG_ENDIAN)

  override def write(row: InternalRow): Unit = {
    buf.clear()
    var i = 0
    while (i < types.length) {
      if (row.isNullAt(i)) throw new IllegalArgumentException(
        s"null in field '${schema.fields(i).name}': fixed-width binary " +
          "records cannot encode null")
      types(i) match {
        case LongType => buf.putLong(row.getLong(i))
        case DoubleType => buf.putDouble(row.getDouble(i))
        case IntegerType => buf.putInt(row.getInt(i))
        case FloatType => buf.putFloat(row.getFloat(i))
        case ShortType => buf.putShort(row.getShort(i))
        case other => throw new IllegalStateException(other.toString)
      }
      i += 1
    }
    out.write(buf.array(), 0, recLen)
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    BinWriteMessage(file.toString)
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(file, false)
  }

  override def close(): Unit = ()
}
