package graft.sources

import graft.schema.Gdelt
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** DataSource V2 reader for the reference's raw GDELT event TSV files
  * (61 fixed tab-separated columns, headerless — reference:
  * conversion/converter.py:214-223): `spark.read.format("gdelt-tsv")
  * .load(dir)`.
  *
  * Why a connector when `spark.read.csv` already works (etl/Convert
  * .readRawTsv): this is the custom-SOURCE rung of the extension ladder —
  * the shape every proprietary-format connector takes on Spark:
  *
  *   - **schema injection, never inference** — the table reports the fixed
  *     61-column schema without reading a byte;
  *   - **one InputPartition per file** — Spark schedules files across the
  *     cluster exactly like its built-in file sources (at 100 TB the
  *     parallelism is the file count; a production connector adds offset
  *     splits for giant files, per-file is the correct unit here because
  *     GDELT ships many ~MB daily files);
  *   - **column pruning at PARSE time** (SupportsPushDownRequiredColumns):
  *     a `select(Day)` materializes one UTF8String per row, not 61 — the
  *     `ReadSchema` in `.explain` shrinks accordingly, which is the
  *     whole-pipeline win the builder prompt's "a scan that reads all
  *     columns for a 2-column projection is wrong" rule demands;
  *   - **strict DROPMALFORMED**: over-length rows are dropped, short rows
  *     null-pad, empty fields read as null — the same outcomes as
  *     readRawTsv EXCEPT that the CSV parser's malformation check is
  *     projection-dependent (univocity only flags excess tokens it
  *     parses, so pruned reads keep over-length rows); the connector
  *     applies the arity rule before projection, so row counts never
  *     change with the column list (spec-pinned).
  */
class GdeltTsv extends TableProvider with DataSourceRegister {
  override def shortName(): String = "gdelt-tsv"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Gdelt.rawSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("gdelt-tsv: missing path"))
    new GdeltTsvTable(path)
  }
}

private[sources] class GdeltTsvTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"gdelt_tsv(`$path`)"
  override def schema(): StructType = Gdelt.rawSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GdeltTsvScanBuilder(path)
}

private[sources] class GdeltTsvScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = Gdelt.rawSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new GdeltTsvScan(path, required)
}

private[sources] class GdeltTsvScan(path: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GdeltTsv $path ReadSchema: ${required.catalogString}"

  override def planInputPartitions(): Array[InputPartition] = {
    val p = Paths.get(path)
    val files: Seq[Path] =
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.iterator().asScala.filter(Files.isRegularFile(_)).toSeq
          .sortBy(_.toString)
        finally s.close()
      }
      else if (Files.isRegularFile(p)) Seq(p)
      else throw new IllegalArgumentException(s"gdelt-tsv: no such path $path")
    files.map(f => GdeltTsvPartition(f.toString): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // resolve required columns to their TSV field ordinals once, on the
    // driver; the factory ships only the int array
    val ordinals = required.fieldNames.map(Gdelt.columns.indexOf)
    require(ordinals.forall(_ >= 0),
      s"gdelt-tsv: unknown columns ${required.fieldNames.mkString(",")}")
    new GdeltTsvReaderFactory(ordinals)
  }
}

private[sources] case class GdeltTsvPartition(file: String) extends InputPartition

private[sources] class GdeltTsvReaderFactory(ordinals: Array[Int])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[GdeltTsvPartition].file
    new PartitionReader[InternalRow] {
      private val lines = Files.lines(Paths.get(file), StandardCharsets.UTF_8)
      private val it = lines.iterator().asScala
      private var row: InternalRow = _

      override def next(): Boolean = {
        while (it.hasNext) {
          // -1 keeps trailing empty fields so the arity check is exact.
          // DROPMALFORMED parity with the CSV reader: rows with MORE
          // fields than the schema are malformed and dropped; SHORT rows
          // null-pad (Spark's CSV parser only flags excess tokens)
          val fields = it.next().split("\t", -1)
          if (fields.length <= Gdelt.columns.length) {
            row = InternalRow.fromSeq(ordinals.map { i =>
              if (i >= fields.length || fields(i).isEmpty) null
              else UTF8String.fromString(fields(i))
            }.toIndexedSeq)
            return true
          }
        }
        false
      }

      override def get(): InternalRow = row
      override def close(): Unit = lines.close()
    }
  }
}
