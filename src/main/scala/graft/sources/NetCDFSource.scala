package graft.sources

import java.nio.channels.FileChannel
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 for NetCDF-3 classic files — closes OP-SRC-1's "native
  * format" gap (`dataset.py:25-34`: xarray `open_dataset` + merge): the
  * cube surfaces as a long-form DataFrame with one column per dimension
  * coordinate and one per data variable, CF-decoded the way xarray decodes
  * it (scale_factor/add_offset unpacking, _FillValue/missing_value → NULL,
  * "units since epoch" time coordinates → TIMESTAMP).
  *
  * `spark.read.format("netcdf").option("vars", "t2m,tp").load(dir_or_file)`
  *
  * Scale design (the reason this is a DataSource and not a driver loop):
  * - Partitions are SLABS of each file's outermost dimension, sized by
  *   `targetRowsPerPartition`; the classic format's closed-form offsets let
  *   every partition seek directly to its bytes ([[NetCDF.readSlab]]) — no
  *   full-file scan, no driver materialization, 1000 executors can each
  *   read their slice of a 100k-file archive concurrently.
  * - Column pruning is pushed down: an unprojected data variable's bytes
  *   are never read (each variable is a contiguous block).
  * - Multi-file scans union slabs across files (the reference's merge —
  *   files share one coordinate system; coordinate columns make the union
  *   alignment-safe without any shuffle).
  */
class NetCDFDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "netcdf"

  private def table(options: CaseInsensitiveStringMap): NetCDFTable = {
    val paths = NetCDFSource.resolvePaths(
      Option(options.get("path")).toSeq ++
        Option(options.get("paths")).toSeq.flatMap(_.split(",")))
    new NetCDFTable(paths,
      Option(options.get("vars")).map(_.split(",").map(_.trim).toSeq),
      Option(options.get("targetRowsPerPartition")).map(_.toLong)
        .getOrElse(1L << 20))
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    table(options).schema()

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    table(new CaseInsensitiveStringMap(properties))
}

object NetCDFSource {

  def resolvePaths(specs: Seq[String]): Seq[String] = {
    val out = specs.flatMap { s =>
      val p = Paths.get(s.stripPrefix("file:"))
      if (Files.isDirectory(p)) {
        // Files.list must be closed (it holds a directory FD) — this runs
        // at least twice per read (inferSchema + getTable)
        val stream = Files.list(p)
        try stream.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".nc"))
          .map(_.toString).toSeq.sorted
        finally stream.close()
      } else Seq(p.toString)
    }
    require(out.nonEmpty, s"no .nc files found under $specs")
    out
  }

  /** Resolved per-file scan spec: the table dims and data vars. */
  final case class FileLayout(path: String, header: NetCDF.Header,
      tableDimIds: Seq[Int], dataVars: Seq[NetCDF.Var])

  def layout(path: String, userVars: Option[Seq[String]]): FileLayout = {
    val h = NetCDF.readHeader(path)
    val dimNames = h.dims.map(_.name).toSet
    val candidates = h.vars.filter(v => !dimNames.contains(v.name))
    val data = userVars match {
      case Some(names) =>
        names.map(n => candidates.find(_.name == n).getOrElse(
          throw new IllegalArgumentException(s"variable $n not in $path " +
            s"(have ${candidates.map(_.name).mkString(",")})")))
      case None =>
        val maxNd = (0 +: candidates.map(_.dimIds.size)).max
        candidates.filter(_.dimIds.size == maxNd)
    }
    require(data.nonEmpty, s"no data variables in $path")
    val dimIds = data.head.dimIds
    require(data.forall(_.dimIds == dimIds),
      s"data variables span different dimension tuples in $path: " +
        data.map(v => s"${v.name}:${v.dimIds.mkString("x")}").mkString(", "))
    FileLayout(path, h, dimIds, data)
  }

  /** CF time-coordinate decode: "(seconds|minutes|hours|days) since <ts>". */
  private val TimeUnits =
    """(?i)\s*(seconds?|minutes?|hours?|days?)\s+since\s+(.+?)\s*""".r

  final case class TimeSpec(baseMicros: Long, unitMicros: Long)

  def timeSpec(v: NetCDF.Var): Option[TimeSpec] =
    v.att("units").flatMap(_.str).flatMap {
      case TimeUnits(unit, base) =>
        val unitMicros = unit.toLowerCase.stripSuffix("s") match {
          case "second" => 1000000L
          case "minute" => 60000000L
          case "hour" => 3600000000L
          case "day" => 86400000000L
        }
        val cleaned = base.trim.replace("T", " ")
        val full = if (cleaned.contains(" ")) cleaned else cleaned + " 00:00:00"
        try {
          val ldt = java.time.LocalDateTime.parse(full,
            java.time.format.DateTimeFormatter.ofPattern("yyyy-M-d H:m:s[.S]"))
          Some(TimeSpec(
            ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
              ldt.getNano / 1000L, unitMicros))
        } catch { case _: java.time.format.DateTimeParseException => None }
      case _ => None
    }

  /** Column type for a dimension: its coordinate variable's decoded type
    * (timestamp for CF time, double otherwise), or int index if the file
    * has no coordinate variable for it.
    */
  def dimField(h: NetCDF.Header, dimId: Int): StructField = {
    val d = h.dims(dimId)
    h.vars.find(v => v.name == d.name && v.dimIds == Seq(dimId)) match {
      case Some(cv) if timeSpec(cv).isDefined =>
        StructField(d.name, TimestampType, nullable = false)
      case Some(_) => StructField(d.name, DoubleType, nullable = false)
      case None => StructField(d.name, IntegerType, nullable = false)
    }
  }

  def schemaFor(fl: FileLayout): StructType = StructType(
    fl.tableDimIds.map(dimField(fl.header, _)) ++
      fl.dataVars.map(v => StructField(v.name, DoubleType, nullable = true)))
}

class NetCDFTable(paths: Seq[String], userVars: Option[Seq[String]],
    targetRows: Long) extends Table with SupportsRead {

  private lazy val layouts = paths.map(NetCDFSource.layout(_, userVars))

  override def name(): String = s"netcdf(${paths.head}…×${paths.size})"
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def schema(): StructType = {
    val s = NetCDFSource.schemaFor(layouts.head)
    layouts.tail.foreach { fl =>
      require(NetCDFSource.schemaFor(fl) == s,
        s"${fl.path} schema differs from ${layouts.head.path}")
    }
    s
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new NetCDFScanBuilder(layouts, schema(), userVars, targetRows)
}

class NetCDFScanBuilder(layouts: Seq[NetCDFSource.FileLayout],
    fullSchema: StructType, userVars: Option[Seq[String]], targetRows: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns with Scan
    with Batch {

  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // keep declaration order; an empty projection (count(*)) keeps zero
    // columns and the reader emits empty rows without touching data bytes
    val keep = requiredSchema.fieldNames.toSet
    required = StructType(fullSchema.fields.filter(f => keep(f.name)))
  }

  override def build(): Scan = this
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-netcdf vars=[${required.fieldNames.mkString(",")}]"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    layouts.flatMap { fl =>
      val shape = fl.header.shape(fl.dataVars.head)
      val outer = if (shape.isEmpty) 1 else shape.head
      val innerRows = if (shape.isEmpty) 1L
        else shape.drop(1).map(_.toLong).product
      val outerPerSlab =
        math.max(1L, targetRows / math.max(1L, innerRows)).toInt
      (0 until outer by outerPerSlab).map { from =>
        NetCDFSlab(fl.path, from, math.min(outer, from + outerPerSlab))
      }
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    NetCDFReaderFactory(required.fieldNames.toSeq, userVars)
}

final case class NetCDFSlab(path: String, outerFrom: Int, outerTo: Int)
    extends InputPartition

final case class NetCDFReaderFactory(requiredCols: Seq[String],
    userVars: Option[Seq[String]]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new NetCDFPartitionReader(p.asInstanceOf[NetCDFSlab], requiredCols,
      userVars)
}

/** Executor-side slab reader: re-parses the (tiny) header locally, reads
  * the projected variables' slab bytes only, and streams rows in row-major
  * dimension order.
  */
class NetCDFPartitionReader(slab: NetCDFSlab, requiredCols: Seq[String],
    userVars: Option[Seq[String]]) extends PartitionReader[InternalRow] {

  private val fl = NetCDFSource.layout(slab.path, userVars)
  private val h = fl.header
  private val ch = FileChannel.open(Paths.get(slab.path),
    StandardOpenOption.READ)

  private val shape = h.shape(fl.dataVars.head)
  private val dimNames = fl.tableDimIds.map(h.dims(_).name)
  private val slabShape =
    if (shape.isEmpty) Seq(1)
    else (slab.outerTo - slab.outerFrom) +: shape.drop(1)
  private val totalRows = slabShape.map(_.toLong).product

  // per required column: a lookup from row ordinal → internal value
  private val columns: Array[Long => Any] = requiredCols.map { name =>
    val dimPos = dimNames.indexOf(name)
    if (dimPos >= 0) dimColumn(dimPos, name)
    else varColumn(fl.dataVars.find(_.name == name).getOrElse(
      throw new IllegalStateException(s"column $name not a dim or var")))
  }.toArray

  /** stride of dimension `pos` in row-major order over the slab. */
  private def strideOf(pos: Int): Long =
    slabShape.drop(pos + 1).map(_.toLong).product

  private def dimColumn(pos: Int, name: String): Long => Any = {
    val dimId = fl.tableDimIds(pos)
    val d = h.dims(dimId)
    val stride = strideOf(pos)
    val extent = slabShape(pos)
    val offset = if (pos == 0) slab.outerFrom else 0
    h.vars.find(v => v.name == d.name && v.dimIds == Seq(dimId)) match {
      case Some(cv) =>
        val raw = NetCDF.readSlab(ch, h, cv, 0, h.shape(cv).head)
        NetCDFSource.timeSpec(cv) match {
          case Some(ts) =>
            val micros = raw.map(v =>
              ts.baseMicros + math.round(v * ts.unitMicros))
            ord => micros(offset + ((ord / stride) % extent).toInt)
          case None =>
            ord => raw(offset + ((ord / stride) % extent).toInt)
        }
      case None => // index dim
        ord => offset + ((ord / stride) % extent).toInt
    }
  }

  private def varColumn(v: NetCDF.Var): Long => Any = {
    val isOuter = shape.nonEmpty
    val raw =
      if (isOuter) NetCDF.readSlab(ch, h, v, slab.outerFrom, slab.outerTo)
      else NetCDF.readSlab(ch, h, v, 0, 1)
    val scale = v.att("scale_factor").flatMap(_.num).getOrElse(1.0)
    val offset = v.att("add_offset").flatMap(_.num).getOrElse(0.0)
    val fill = v.att("_FillValue").flatMap(_.num)
      .orElse(v.att("missing_value").flatMap(_.num))
    val unpack = scale != 1.0 || offset != 0.0
    ord => {
      val r = raw(ord.toInt)
      if (fill.contains(r)) null
      else if (unpack) r * scale + offset
      else r
    }
  }

  private var ord = -1L

  override def next(): Boolean = { ord += 1; ord < totalRows }

  override def get(): InternalRow =
    new GenericInternalRow(columns.map(_(ord)))

  override def close(): Unit = ch.close()
}
