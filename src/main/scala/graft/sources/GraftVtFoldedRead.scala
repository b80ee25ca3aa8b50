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

  override def planInputPartitions(): Array[InputPartition] = {
    // clean partitions ride row-only markers: this batch exists because
    // DV partitions exist, and the exec node needs uniform (non-)
    // columnar support across one batch's partitions
    val cleanParts: Array[InputPartition] = clean.planInputPartitions().map {
      case fp: FilePartition => GraftVtRowOnlyPartition(fp)
      case other => other
    }
    // one PartitionedFile per partition: the hidden-position slice is
    // keyed by file, and row indices only increase within one file's
    // range — a multi-file partition would interleave index spaces
    val dvParts: Array[InputPartition] = dv.planInputPartitions().flatMap {
      case fp: FilePartition => fp.files.map { f =>
        val p = f.toPath
        val key = p.getParent.getName + "/" + p.getName
        GraftVtDvPartition(FilePartition(0, Array(f)),
          hidden.getOrElse(key, Array.emptyLongArray)): InputPartition
      }
      case other => Array(other: InputPartition) // defensive: clean path
    }
    cleanParts ++ dvParts
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftVtDvReaderFactory(clean.createReaderFactory(),
      dv.createReaderFactory(), dataTypes)
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
                                              dataTypes: Array[DataType])
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case d: GraftVtDvPartition =>
        new GraftVtDvRowReader(dv.createReader(d.inner), d.hidden, dataTypes)
      case r: GraftVtRowOnlyPartition => clean.createReader(r.inner)
      case other => clean.createReader(other)
    }

  /** DV and row-only partitions read as rows; anything else delegates —
    * so a batch WITHOUT deletion vectors keeps whatever columnar
    * support the clean factory reports (the planner plans row-only
    * markers exactly when a batch mixes).
    */
  override def supportColumnarReads(p: InputPartition): Boolean = p match {
    case _: GraftVtDvPartition | _: GraftVtRowOnlyPartition => false
    case other => clean.supportColumnarReads(other)
  }

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    p match {
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
}
