package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.types.{DataType, StructType}

/** The VECTORIZED deletion-vector read path (Delta's row-index
  * filtering, re-expressed over the stock DSv2 parquet machinery): the
  * scan's kept directories split per directory — DV-free ones read
  * through the untouched [[org.apache.spark.sql.execution.datasources
  * .v2.parquet.ParquetScan]] batch, and each DV-bearing directory's
  * files become ONE-file input partitions whose reader asks the
  * parquet reader to fill the temporary row-index column
  * (`ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME` — the same
  * public mechanism `_metadata.row_index` rides) and drops the rows
  * whose (file, index) the sidecar hides. Parquet filter pushdown,
  * row-group skipping, and the vectorized reader all apply to BOTH
  * sides; only the final batch→row boundary is paid, and only on the
  * DV'd files. Each partition ships exactly its own file's hidden
  * positions (sorted; matched with a two-pointer — the reader streams
  * indices in increasing order per file), so no task carries another
  * file's deletes.
  */
private[sources] class GraftVtDvBatch(clean: Batch, dv: Batch,
                                      hidden: Map[String, Array[Long]],
                                      dataTypes: Array[DataType])
    extends Batch {

  private val cleanFactory = clean.createReaderFactory()
  private val dvFactory = dv.createReaderFactory()

  /** Whether the WHOLE batch can stay COLUMNAR: every projected type
    * has a vector-copy path AND both parquet factories report columnar
    * support (their check reads conf + schema, not the partition).
    * When true, DV'd files filter at BATCH granularity (surviving rows
    * copied into fresh vectors — a copy of the minority) and the
    * DV-free majority keeps the untouched vectorized + whole-stage
    * path; when false, everything reads rows (the exec node requires
    * all-or-nothing columnar across one batch's partitions).
    */
  private val columnarOk: Boolean =
    dataTypes.forall(GraftVtColumnarDv.supportedType) &&
      (try {
        val dummy = FilePartition(0, Array.empty)
        cleanFactory.supportColumnarReads(dummy) &&
          dvFactory.supportColumnarReads(dummy)
      } catch { case _: Exception => false })

  override def planInputPartitions(): Array[InputPartition] = {
    val cleanParts: Array[InputPartition] =
      if (columnarOk) clean.planInputPartitions()
      else clean.planInputPartitions().map {
        case fp: FilePartition => GraftVtRowOnlyPartition(fp)
        case other => other
      }
    val dvParts: Array[InputPartition] = dv.planInputPartitions().flatMap {
      case fp: FilePartition =>
        GraftVtFoldedRead.dvPartitionsFor(fp.files.toSeq, hidden)
      case other => Seq(other) // defensive: clean path
    }
    cleanParts ++ dvParts
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftVtDvReaderFactory(cleanFactory, dvFactory, dataTypes,
      columnarOk)
}

/** One DV'd parquet file (possibly a byte-range split of it) plus the
  * sorted hidden row indices of exactly that file.
  */
private[sources] case class GraftVtDvPartition(inner: FilePartition,
                                               hidden: Array[Long])
    extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** A DV-free file partition forced onto the row-based read path —
  * planned when the SAME batch also contains DV partitions, because
  * the exec node requires all-or-nothing columnar across a batch's
  * partitions.
  */
private[sources] case class GraftVtRowOnlyPartition(inner: FilePartition)
    extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** CDC-sidecar files of a merge-on-read UPDATE/MERGE commit, read for
  * ONE change type: the sidecar mixes pre/post/insert rows in one
  * directory with the type EMBEDDED as a data column, so the change
  * feed plans the same files once per type, each partition keeping
  * only the rows whose embedded type equals the one its injected
  * partition value announces.
  */
private[sources] case class GraftVtTypedCdcPartition(inner: FilePartition,
                                                     wanted: String)
    extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** The change feed's dispatching factory: plain file partitions
  * delegate untouched; DV-fold partitions filter the prior snapshot's
  * hidden rows by row index (a removed DV'd directory must not
  * re-report rows an earlier DV delete already emitted); typed-CDC
  * partitions filter a mixed sidecar by its embedded change type. The
  * filtering readers' inner schemas append the marker column AFTER the
  * data columns, BEFORE the injected cdf partition columns — the
  * projection drops exactly the marker.
  */
private[sources] class GraftVtCdfReaderFactory(plain: PartitionReaderFactory,
                                               typed: PartitionReaderFactory,
                                               dv: PartitionReaderFactory,
                                               dataTypes: Array[DataType],
                                               cdfTypes: Array[DataType])
    extends PartitionReaderFactory {

  private def outIndices: Array[Int] =
    GraftVtFilteringReader.skipOne(dataTypes.length, cdfTypes.length)
  private def outTypes: Array[DataType] = dataTypes ++ cdfTypes

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case t: GraftVtTypedCdcPartition =>
        val want = org.apache.spark.unsafe.types.UTF8String
          .fromString(t.wanted)
        val at = dataTypes.length
        new GraftVtFilteringReader(typed.createReader(t.inner),
          outTypes, outIndices,
          r => !r.isNullAt(at) && r.getUTF8String(at).equals(want))
      case d: GraftVtDvPartition =>
        new GraftVtFilteringReader(dv.createReader(d.inner),
          outTypes, outIndices,
          GraftVtFilteringReader.dvKeep(d.hidden, dataTypes.length))
      case r: GraftVtRowOnlyPartition => plain.createReader(r.inner)
      case other => plain.createReader(other)
    }

  override def supportColumnarReads(p: InputPartition): Boolean = p match {
    case _: GraftVtTypedCdcPartition | _: GraftVtDvPartition |
         _: GraftVtRowOnlyPartition => false
    case other => plain.supportColumnarReads(other)
  }

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    p match {
      case _: GraftVtTypedCdcPartition | _: GraftVtDvPartition |
           _: GraftVtRowOnlyPartition =>
        throw new UnsupportedOperationException(
          "marker partitions read row-based")
      case other => plain.createColumnarReader(other)
    }
}

/** Dispatching factory: DV partitions get the filtering reader over
  * the parquet factory's row reader (which reads through the
  * vectorized reader internally when enabled); everything else
  * delegates to the clean factory untouched. Declared row-based for
  * every partition — [[org.apache.spark.sql.execution.datasources.v2
  * .DataSourceV2ScanExecBase]] requires all-or-nothing columnar, and
  * the DV side must see individual rows to drop hidden ones.
  */
private[sources] class GraftVtDvReaderFactory(clean: PartitionReaderFactory,
                                              dv: PartitionReaderFactory,
                                              dataTypes: Array[DataType],
                                              columnarDv: Boolean = false)
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case d: GraftVtDvPartition =>
        new GraftVtDvRowReader(dv.createReader(d.inner), d.hidden, dataTypes)
      case r: GraftVtRowOnlyPartition => clean.createReader(r.inner)
      case other => clean.createReader(other)
    }

  /** With `columnarDv` the whole batch stays columnar (DV files filter
    * at batch granularity); otherwise DV and row-only partitions read
    * as rows and DV-free batches keep whatever the clean factory
    * reports (the planner plans row-only markers exactly when a batch
    * mixes).
    */
  override def supportColumnarReads(p: InputPartition): Boolean = p match {
    case _: GraftVtDvPartition => columnarDv
    case _: GraftVtRowOnlyPartition => false
    case other => clean.supportColumnarReads(other)
  }

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    p match {
      case d: GraftVtDvPartition if columnarDv =>
        new GraftVtDvColumnarReader(dv.createColumnarReader(d.inner),
          d.hidden, dataTypes)
      case _: GraftVtDvPartition | _: GraftVtRowOnlyPartition =>
        throw new UnsupportedOperationException(
          "DV/row-only partitions read row-based")
      case other => clean.createColumnarReader(other)
    }
}

/** Filters the inner reader's rows with `keep` and projects a marker
  * column back off: the output row is the input's fields at
  * `outIndices` (typed by `outTypes`), which the callers build as
  * "everything except the marker index". Shared by the DV row-index
  * filter and the typed-CDC change-type filter.
  */
private[sources] class GraftVtFilteringReader(
    inner: PartitionReader[InternalRow],
    outTypes: Array[DataType], outIndices: Array[Int],
    keep: InternalRow => Boolean)
    extends PartitionReader[InternalRow] {

  private val proj = UnsafeProjection.create(
    outIndices.zip(outTypes).map { case (i, dt) =>
      BoundReference(i, dt, nullable = true)
    }.toIndexedSeq)
  private var row: InternalRow = _

  override def next(): Boolean = {
    while (inner.next()) {
      val r = inner.get()
      if (keep(r)) {
        row = proj(r)
        return true
      }
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = inner.close()
}

private[sources] object GraftVtFilteringReader {

  /** Everything except the marker at `skipIdx`: [0, skipIdx) ++
    * (skipIdx, skipIdx + 1 + trailing].
    */
  def skipOne(skipIdx: Int, trailing: Int): Array[Int] =
    (Array.range(0, skipIdx) ++
      Array.range(skipIdx + 1, skipIdx + 1 + trailing))

  /** The hidden-position predicate: indices increase monotonically
    * within one file's range, so a forward pointer into the sorted
    * hidden array suffices — O(rows + hidden), no per-row search.
    */
  def dvKeep(hidden: Array[Long], idxAt: Int): InternalRow => Boolean = {
    var ptr = 0
    r => {
      val idx = r.getLong(idxAt)
      while (ptr < hidden.length && hidden(ptr) < idx) ptr += 1
      ptr >= hidden.length || hidden(ptr) != idx
    }
  }
}

/** Skips the hidden rows and projects the temporary row-index column
  * back off — the batch scan's DV filter (no trailing partition
  * columns).
  */
private[sources] class GraftVtDvRowReader(inner: PartitionReader[InternalRow],
                                          hidden: Array[Long],
                                          dataTypes: Array[DataType])
    extends GraftVtFilteringReader(inner, dataTypes,
      Array.range(0, dataTypes.length),
      GraftVtFilteringReader.dvKeep(hidden, dataTypes.length))

private[sources] object GraftVtColumnarDv {
  import org.apache.spark.sql.types._

  /** Types the vector-copy path handles — every atomic type the stats
    * index meets in practice; anything else (nested, interval, variant)
    * takes the row path.
    */
  def supportedType(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | DateType |
         LongType | TimestampType | TimestampNTZType | FloatType |
         DoubleType | StringType | BinaryType => true
    case _: DecimalType => true
    case _ => false
  }
}

/** The COLUMNAR DV filter: each incoming batch's trailing row-index
  * vector drives the same sorted-positions two-pointer as the row
  * reader; a batch with no hidden rows passes through ZERO-COPY (its
  * vectors re-wrapped without the index column), a batch with hits has
  * its surviving rows copied into fresh on-heap vectors. The copy only
  * ever touches the DV'd files — the DV-free majority of the table
  * reads through the stock columnar path untouched, so whole-stage
  * codegen and batch processing survive an outstanding DV.
  */
private[sources] class GraftVtDvColumnarReader(
    inner: PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch],
    hidden: Array[Long], dataTypes: Array[DataType])
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {

  import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
  import org.apache.spark.sql.execution.vectorized.{OnHeapColumnVector, WritableColumnVector}

  private val width = dataTypes.length
  private var ptr = 0
  private var out: ColumnarBatch = _
  private var outOwned = false // only COPIED batches may be closed here

  private def closeOut(): Unit =
    if (out != null && outOwned) { out.close(); out = null }

  override def next(): Boolean = {
    closeOut()
    while (inner.next()) {
      val b = inner.get()
      val n = b.numRows()
      val idxCol = b.column(width)
      val keep = new Array[Int](n)
      var m = 0
      var i = 0
      while (i < n) {
        val idx = idxCol.getLong(i)
        while (ptr < hidden.length && hidden(ptr) < idx) ptr += 1
        if (ptr >= hidden.length || hidden(ptr) != idx) {
          keep(m) = i; m += 1
        }
        i += 1
      }
      if (m == n) {
        // nothing hidden here: re-wrap the inner vectors minus the
        // index column — zero copy, vectors stay owned by the inner
        // reader (consumed before the next call per reader contract)
        out = new ColumnarBatch(
          Array.tabulate[ColumnVector](width)(b.column), n)
        outOwned = false
        return true
      }
      if (m > 0) {
        val vecs = Array.tabulate[ColumnVector](width) { c =>
          val dst = new OnHeapColumnVector(m, dataTypes(c))
          copyRows(b.column(c), keep, m, dst, dataTypes(c))
          dst
        }
        out = new ColumnarBatch(vecs, m)
        outOwned = true
        return true
      }
      // whole batch hidden: keep scanning
    }
    false
  }

  private def copyRows(src: ColumnVector, keep: Array[Int], m: Int,
                       dst: WritableColumnVector,
                       dt: org.apache.spark.sql.types.DataType): Unit = {
    import org.apache.spark.sql.types._
    var j = 0
    dt match {
      case BooleanType => while (j < m) {
        val i = keep(j)
        if (src.isNullAt(i)) dst.putNull(j) else dst.putBoolean(j, src.getBoolean(i))
        j += 1
      }
      case ByteType => while (j < m) {
        val i = keep(j)
        if (src.isNullAt(i)) dst.putNull(j) else dst.putByte(j, src.getByte(i))
        j += 1
      }
      case ShortType => while (j < m) {
        val i = keep(j)
        if (src.isNullAt(i)) dst.putNull(j) else dst.putShort(j, src.getShort(i))
        j += 1
      }
      case IntegerType | DateType => while (j < m) {
        val i = keep(j)
        if (src.isNullAt(i)) dst.putNull(j) else dst.putInt(j, src.getInt(i))
        j += 1
      }
      case LongType | TimestampType | TimestampNTZType => while (j < m) {
        val i = keep(j)
        if (src.isNullAt(i)) dst.putNull(j) else dst.putLong(j, src.getLong(i))
        j += 1
      }
      case FloatType => while (j < m) {
        val i = keep(j)
        if (src.isNullAt(i)) dst.putNull(j) else dst.putFloat(j, src.getFloat(i))
        j += 1
      }
      case DoubleType => while (j < m) {
        val i = keep(j)
        if (src.isNullAt(i)) dst.putNull(j) else dst.putDouble(j, src.getDouble(i))
        j += 1
      }
      case StringType => while (j < m) {
        val i = keep(j)
        if (src.isNullAt(i)) dst.putNull(j)
        else {
          val u = src.getUTF8String(i).getBytes
          dst.putByteArray(j, u, 0, u.length)
        }
        j += 1
      }
      case BinaryType => while (j < m) {
        val i = keep(j)
        if (src.isNullAt(i)) dst.putNull(j)
        else {
          val bs = src.getBinary(i)
          dst.putByteArray(j, bs, 0, bs.length)
        }
        j += 1
      }
      case d: DecimalType => while (j < m) {
        val i = keep(j)
        if (src.isNullAt(i)) dst.putNull(j)
        else dst.putDecimal(j, src.getDecimal(i, d.precision, d.scale),
          d.precision)
        j += 1
      }
      case other => throw new IllegalStateException(
        s"unsupported columnar DV copy type $other — guarded by " +
          "GraftVtColumnarDv.supportedType") // unreachable by construction
    }
  }

  override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = out
  override def close(): Unit = { closeOut(); inner.close() }
}

/** The change feed's three reader factories (plain / embedded-type /
  * row-index marker schemas) plus the types the dispatching factory's
  * projections need — built once at scan construction, shipped to the
  * batch and the micro-batch stream.
  */
private[sources] case class GraftVtCdfReaders(
    mkPlain: () => PartitionReaderFactory,
    mkTyped: () => PartitionReaderFactory,
    mkDv: () => PartitionReaderFactory,
    dataTypes: Array[DataType],
    cdfTypes: Array[DataType]) {
  def mkFactory(): PartitionReaderFactory =
    new GraftVtCdfReaderFactory(mkPlain(), mkTyped(), mkDv(),
      dataTypes, cdfTypes)
}

private[sources] object GraftVtFoldedRead {

  /** The read-schema tail the parquet readers fill with per-file row
    * indices — nullable (the vectorized reader's column check rejects
    * a required column absent from the file; the generator fills it
    * either way).
    */
  val RowIndexField: org.apache.spark.sql.types.StructField =
    org.apache.spark.sql.types.StructField(
      org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
        .ROW_INDEX_TEMPORARY_COLUMN_NAME,
      org.apache.spark.sql.types.LongType, nullable = true)

  def withRowIndex(schema: StructType): StructType =
    StructType(schema.fields :+ RowIndexField)

  /** The ONE budget every DV position consumer reads: the batch scan
    * falls back to the row fold past it, streams and the change feed
    * refuse loudly (they have no fold).
    */
  val MaxInlinePositionsKey = "spark.graft.dv.maxInlinePositions"
  val MaxInlinePositionsDefault = 8000000L

  def maxInlinePositions(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.get(MaxInlinePositionsKey,
      MaxInlinePositionsDefault.toString).toLong

  /** One-file DV partitions for the given files: the hidden-position
    * slice is keyed `"<dir>/<file>"` and row indices only increase
    * within one file's range — the ONE construction every DV-planning
    * path (batch scan, plain stream, change feed) shares, so the
    * keying convention cannot drift between them.
    */
  def dvPartitionsFor(files: Seq[org.apache.spark.sql.execution.datasources.PartitionedFile],
                      hidden: Map[String, Array[Long]]): Seq[InputPartition] =
    files.map { f =>
      val p = f.toPath
      GraftVtDvPartition(FilePartition(0, Array(f)),
        hidden.getOrElse(p.getParent.getName + "/" + p.getName,
          Array.emptyLongArray)): InputPartition
    }
}
