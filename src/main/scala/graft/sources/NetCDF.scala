package graft.sources

import java.io.{DataOutputStream, FileOutputStream, RandomAccessFile}
import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.charset.StandardCharsets

/** Pure-JVM NetCDF-3 "classic" codec (CDF-1 32-bit, CDF-2 64-bit-offset,
  * and CDF-5 64-bit-data variants) — the reference pipeline's actual input
  * format (`pipeline/carbonpipeline/dataset.py:25-34` opens `*.nc` and
  * merges them into one cube). Implemented from the public NetCDF classic
  * format spec (netcdf-c file-format appendix; CDF-5 per the PnetCDF
  * spec): a flat header (dims, attrs, vars with absolute data offsets)
  * followed by big-endian row-major variable blocks, record variables
  * interleaved per record. No external library — the container has none —
  * and none is needed: the classic formats are fixed-layout binary
  * catalogs.
  *
  * CDF-5 is the ingest bridge for NetCDF-4 era data: `nccopy -k cdf5`
  * converts an HDF5-container download losslessly for the 64-bit types
  * (NetCDF-4's other additions — groups, compression — are container
  * features, not data), and CDF-5 lifts both classic bounds that real CDS
  * cubes hit (32-bit vsize per variable, 2^31 record count). In CDF-5
  * every NON_NEG header field (numrecs, list counts, name lengths, dim
  * lengths, ndims, dimids, attribute counts, vsize) widens to INT64 and
  * five integer types join the classic six.
  *
  * Scale posture: the header is O(vars); every variable's bytes are
  * addressable by closed-form offset arithmetic, so a reader partition can
  * seek DIRECTLY to its slab of the outermost dimension without scanning
  * the file — the property [[NetCDFTable]] builds its InputPartitions on.
  */
object NetCDF {

  // nc_type tags (classic set + the CDF-5 additions)
  val NC_BYTE = 1; val NC_CHAR = 2; val NC_SHORT = 3
  val NC_INT = 4; val NC_FLOAT = 5; val NC_DOUBLE = 6
  val NC_UBYTE = 7; val NC_USHORT = 8; val NC_UINT = 9
  val NC_INT64 = 10; val NC_UINT64 = 11

  private val TAG_DIM = 0x0A
  private val TAG_VAR = 0x0B
  private val TAG_ATT = 0x0C

  final case class Dim(name: String, length: Int) {
    def isRecord: Boolean = length == 0
  }

  /** Attribute values: Seq[Double] for numeric types, String for NC_CHAR. */
  final case class Att(name: String, ncType: Int, value: Either[String, Seq[Double]]) {
    def str: Option[String] = value.left.toOption
    def num: Option[Double] = value.toOption.flatMap(_.headOption)
  }

  final case class Var(name: String, dimIds: Seq[Int], atts: Seq[Att],
      ncType: Int, vsize: Long, begin: Long) {
    def att(n: String): Option[Att] = atts.find(_.name == n)
  }

  final case class Header(numRecs: Int, dims: Seq[Dim], gatts: Seq[Att],
      vars: Seq[Var], recSize: Long) {
    def dimOf(v: Var): Seq[Dim] = v.dimIds.map(dims)
    /** Record-dim length substituted in. */
    def shape(v: Var): Seq[Int] =
      dimOf(v).map(d => if (d.isRecord) numRecs else d.length)
  }

  def elemSize(ncType: Int): Int = ncType match {
    case NC_BYTE | NC_CHAR | NC_UBYTE => 1
    case NC_SHORT | NC_USHORT => 2
    case NC_INT | NC_FLOAT | NC_UINT => 4
    case NC_DOUBLE | NC_INT64 | NC_UINT64 => 8
    case t => throw new IllegalArgumentException(s"unsupported nc_type $t")
  }

  /** Unsigned-64 → double (values beyond 2^53 round, as any u64→f64 does). */
  private def u64ToDouble(v: Long): Double =
    if (v >= 0) v.toDouble else (v >>> 1).toDouble * 2.0 + (v & 1L)

  // ---------------------------------------------------------------- parse

  private def pad4(n: Long): Long = (n + 3) & ~3L

  /** `wide` = CDF-5: every NON_NEG header field is INT64 (tags and nc_type
    * stay INT). The JVM slab model keeps Int extents, so wide values are
    * range-checked where they land in Int fields.
    */
  private final class Reader(buf: ByteBuffer, wide: Boolean) {
    def i4(): Int = buf.getInt()
    def i8(): Long = buf.getLong()
    def nn(): Long = if (wide) i8() else i4().toLong
    def nnInt(what: String): Int = {
      val v = nn()
      require(v >= 0 && v <= Int.MaxValue,
        s"$what = $v outside the reader's 2^31 bound (CDF-5 allows it; " +
          "this slab model does not — split the file at ingest)")
      v.toInt
    }
    def name(): String = {
      val n = nnInt("name length")
      val bytes = new Array[Byte](n)
      buf.get(bytes)
      buf.position(buf.position() + (pad4(n) - n).toInt)
      new String(bytes, StandardCharsets.UTF_8)
    }
    def attValues(ncType: Int, n: Int): Either[String, Seq[Double]] = {
      val raw = new Array[Byte](n * elemSize(ncType))
      buf.get(raw)
      buf.position(buf.position() + (pad4(raw.length) - raw.length).toInt)
      val b = ByteBuffer.wrap(raw)
      ncType match {
        case NC_CHAR => Left(new String(raw, StandardCharsets.UTF_8))
        case NC_BYTE => Right((0 until n).map(i => raw(i).toDouble))
        case NC_UBYTE => Right((0 until n).map(i => (raw(i) & 0xFF).toDouble))
        case NC_SHORT => Right((0 until n).map(i => b.getShort(i * 2).toDouble))
        case NC_USHORT =>
          Right((0 until n).map(i => (b.getShort(i * 2) & 0xFFFF).toDouble))
        case NC_INT => Right((0 until n).map(i => b.getInt(i * 4).toDouble))
        case NC_UINT =>
          Right((0 until n).map(i => (b.getInt(i * 4).toLong & 0xFFFFFFFFL).toDouble))
        case NC_FLOAT => Right((0 until n).map(i => b.getFloat(i * 4).toDouble))
        case NC_DOUBLE => Right((0 until n).map(i => b.getDouble(i * 8)))
        case NC_INT64 => Right((0 until n).map(i => b.getLong(i * 8).toDouble))
        case NC_UINT64 =>
          Right((0 until n).map(i => u64ToDouble(b.getLong(i * 8))))
      }
    }
  }

  /** Parse the header of a classic NetCDF file. The header is at most a few
    * hundred KB for real files; read the first chunk only, growing if a
    * giant attribute table overflows it.
    */
  def readHeader(path: String): Header = {
    var cap = 1 << 16
    while (true) {
      val f = new RandomAccessFile(path, "r")
      try {
        val n = math.min(cap.toLong, f.length()).toInt
        val bytes = new Array[Byte](n)
        f.readFully(bytes)
        try return parseHeader(ByteBuffer.wrap(bytes))
        catch {
          case _: java.nio.BufferUnderflowException
              if n < f.length() => cap = cap << 2 // header bigger than chunk
        }
      } finally f.close()
    }
    throw new IllegalStateException("unreachable")
  }

  def parseHeader(buf: ByteBuffer): Header = {
    val (m0, m1, m2) = (buf.get(), buf.get(), buf.get())
    // real CDS "format: netcdf" downloads are frequently NetCDF-4 (an HDF5
    // container, magic \x89HDF) — name that case explicitly instead of a
    // generic bad-magic error; the supported ingest path is parquet (or
    // CDF-1/2 classic) per SURVEY §7.4
    require(!(m0 == 0x89.toByte && m1 == 'H' && m2 == 'D'),
      "NetCDF-4/HDF5 input detected (\\x89HDF magic): this reader supports " +
        "the NetCDF classic formats only (CDF-1/2/5) — convert " +
        "(`nccopy -k cdf5` keeps 64-bit types; `-k classic` for the " +
        "narrow set) or ingest via parquet")
    require(m0 == 'C' && m1 == 'D' && m2 == 'F',
      "not a NetCDF classic file (bad magic)")
    val version = buf.get().toInt
    require(version == 1 || version == 2 || version == 5,
      s"unsupported NetCDF variant $version (CDF-1/2/5 supported; " +
        "NetCDF-4/HDF5 needs ingest-side conversion)")
    val wide = version == 5
    val r = new Reader(buf, wide)
    val numRecs = r.nnInt("numrecs") // STREAMING (-1) rejected by the bound
    def tagged(expected: Int): Int = {
      val tag = r.i4(); val count = r.nnInt("list count")
      require(tag == expected || (tag == 0 && count == 0),
        s"bad tag $tag (expected $expected)")
      count
    }
    val dims = (0 until tagged(TAG_DIM)).map { _ =>
      Dim(r.name(), r.nnInt("dim length"))
    }
    def atts(): Seq[Att] = (0 until tagged(TAG_ATT)).map { _ =>
      val n = r.name(); val t = r.i4(); val cnt = r.nnInt("att count")
      Att(n, t, r.attValues(t, cnt))
    }
    val gatts = atts()
    val vars = (0 until tagged(TAG_VAR)).map { _ =>
      val n = r.name()
      val nd = r.nnInt("ndims")
      val dimIds = (0 until nd).map(_ => r.nnInt("dimid"))
      val va = atts()
      val t = r.i4()
      val vsize = if (wide) r.i8() else r.i4().toLong & 0xFFFFFFFFL
      val begin = if (version == 1) r.i4().toLong & 0xFFFFFFFFL else r.i8()
      Var(n, dimIds, va, t, vsize, begin)
    }
    // record stride: sum of record-var vsizes; the spec's single-record-var
    // exception packs that var without inter-record padding
    val recVars = vars.filter(v => v.dimIds.headOption.exists(dims(_).isRecord))
    val recSize =
      if (recVars.size == 1) {
        val v = recVars.head
        val perRec = v.dimIds.drop(1).map(dims(_).length.toLong).product *
          elemSize(v.ncType)
        perRec
      } else recVars.map(_.vsize).sum
    Header(numRecs, dims, gatts, vars, recSize)
  }

  // ---------------------------------------------------------------- read

  /** Read `v`'s values for outer-dimension indices [outerFrom, outerTo) as
    * doubles (raw, pre-CF-unpack), reading EXACTLY the slab's bytes — the
    * partition-pruned path the DataSource uses. For a 0-dim variable the
    * outer range must be [0,1).
    */
  def readSlab(ch: FileChannel, h: Header, v: Var, outerFrom: Int,
      outerTo: Int): Array[Double] = {
    val shape = h.shape(v)
    val innerCount =
      if (shape.isEmpty) 1L else shape.drop(1).map(_.toLong).product
    val es = elemSize(v.ncType)
    val isRec = v.dimIds.headOption.exists(h.dims(_).isRecord)
    val nOuter = if (shape.isEmpty) 1 else shape.head
    require(outerFrom >= 0 && outerTo <= nOuter && outerFrom <= outerTo,
      s"slab [$outerFrom,$outerTo) out of range for ${v.name} (outer $nOuter)")
    val total = (outerTo - outerFrom) * innerCount
    // explicit 2^31 guard: .toInt on an oversized slab would go negative
    // and die opaquely; a single outer index whose inner product exceeds
    // the JVM array bound cannot be materialized as one slab at all
    require(total <= Int.MaxValue / elemSize(v.ncType),
      s"slab of ${v.name} has $total elements (inner=$innerCount) — " +
        "exceeds the 2^31 JVM array bound; shrink the slab (inner " +
        "dimensions this large need a finer-than-outer-dim partitioner)")
    val out = new Array[Double](total.toInt)
    if (isRec) {
      // one seek per record: records interleave all record variables
      val perRec = (innerCount * es).toInt
      val buf = ByteBuffer.allocate(perRec)
      var rec = outerFrom
      while (rec < outerTo) {
        buf.clear()
        ch.read(buf, v.begin + rec.toLong * h.recSize)
        buf.flip()
        decode(buf, v.ncType, out, ((rec - outerFrom) * innerCount).toInt,
          innerCount.toInt)
        rec += 1
      }
    } else {
      val buf = ByteBuffer.allocate((total * es).toInt)
      ch.read(buf, v.begin + outerFrom * innerCount * es)
      buf.flip()
      decode(buf, v.ncType, out, 0, total.toInt)
    }
    out
  }

  private def decode(buf: ByteBuffer, ncType: Int, out: Array[Double],
      at: Int, n: Int): Unit = {
    var i = 0
    ncType match {
      case NC_BYTE | NC_CHAR =>
        while (i < n) { out(at + i) = buf.get().toDouble; i += 1 }
      case NC_UBYTE =>
        while (i < n) { out(at + i) = (buf.get() & 0xFF).toDouble; i += 1 }
      case NC_SHORT =>
        while (i < n) { out(at + i) = buf.getShort().toDouble; i += 1 }
      case NC_USHORT =>
        while (i < n) { out(at + i) = (buf.getShort() & 0xFFFF).toDouble; i += 1 }
      case NC_INT =>
        while (i < n) { out(at + i) = buf.getInt().toDouble; i += 1 }
      case NC_UINT =>
        while (i < n) {
          out(at + i) = (buf.getInt().toLong & 0xFFFFFFFFL).toDouble; i += 1
        }
      case NC_FLOAT =>
        while (i < n) { out(at + i) = buf.getFloat().toDouble; i += 1 }
      case NC_DOUBLE =>
        while (i < n) { out(at + i) = buf.getDouble(); i += 1 }
      case NC_INT64 =>
        while (i < n) { out(at + i) = buf.getLong().toDouble; i += 1 }
      case NC_UINT64 =>
        while (i < n) { out(at + i) = u64ToDouble(buf.getLong()); i += 1 }
    }
  }

  // --------------------------------------------------------------- write

  /** Minimal classic writer (CDF-1 by default; `version = 2` emits CDF-2
    * with 64-bit begin offsets for multi-GiB layouts; `version = 5` emits
    * CDF-5 with every NON_NEG field widened to INT64 plus the unsigned /
    * 64-bit integer types — the format `nccopy -k cdf5` produces from
    * NetCDF-4 downloads, and the round-trip fixture for that ingest path)
    * for region-sized gridded outputs and test fixtures (the analog of the
    * reference's per-region NetCDF sink, `core.py:325-369` — which writes
    * files of exactly this catalog size). Not a distributed sink: a NetCDF
    * classic file is a single sequential byte stream, so big data belongs
    * in parquet (OP-SNK-1); this exists for interchange with
    * NetCDF-consuming tools.
    *
    * `data` maps variable name → (dim names, nc_type, values-as-doubles,
    * attributes). Dims are defined by `dims` in order; at most one may be
    * the record dim (length 0 — pass its actual extent as `numRecs`),
    * matching real ERA5 layouts where time is UNLIMITED and variables
    * interleave per record.
    */
  final case class VarSpec(dims: Seq[String], ncType: Int,
      values: Array[Double], atts: Seq[Att] = Nil)

  def write(path: String, dims: Seq[Dim], vars: Seq[(String, VarSpec)],
      gatts: Seq[Att] = Nil, numRecs: Int = 0, version: Int = 1): Unit = {
    require(version == 1 || version == 2 || version == 5,
      s"classic writer supports CDF-1/2/5, got version $version")
    require(dims.count(_.isRecord) <= 1, "at most one record dimension")
    val recDimId = dims.indexWhere(_.isRecord)
    require(recDimId >= 0 || numRecs == 0,
      "numRecs given but no record (length-0) dimension declared")
    val dimIdx = dims.map(_.name).zipWithIndex.toMap
    // CDF-5: every NON_NEG field is 8 bytes; tags and nc_type stay 4
    val wide = version == 5
    val nnBytes = if (wide) 8 else 4
    def putNN(bb: ByteBuffer, v: Long): Unit =
      if (wide) bb.putLong(v) else bb.putInt(v.toInt)
    def nameBytes(s: String): Array[Byte] = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      val padded = new Array[Byte](nnBytes + pad4(b.length).toInt)
      val bb = ByteBuffer.wrap(padded)
      putNN(bb, b.length)
      bb.put(b)
      padded
    }
    def putElem(bb: ByteBuffer, ncType: Int, d: Double): Unit = ncType match {
      case NC_BYTE | NC_UBYTE => bb.put(d.toByte)
      case NC_SHORT | NC_USHORT => bb.putShort(d.toShort)
      case NC_INT => bb.putInt(d.toInt)
      // via toLong: Double.toInt SATURATES at 2^31-1, which would corrupt
      // unsigned-range values (e.g. 4294967295.0 → MaxValue, not -1)
      case NC_UINT => bb.putInt(d.toLong.toInt)
      case NC_FLOAT => bb.putFloat(d.toFloat)
      case NC_DOUBLE => bb.putDouble(d)
      case NC_INT64 => bb.putLong(d.toLong)
      // top-half u64 values re-wrap to the negative two's-complement long
      // (Double.toLong saturates at 2^63-1); sub-2^53 values are exact
      case NC_UINT64 => bb.putLong(
        if (d >= 9.223372036854776e18) (d - 1.8446744073709552e19).toLong
        else d.toLong)
      case NC_CHAR => throw new IllegalArgumentException(
        "numeric values with NC_CHAR type")
    }
    vars.foreach { case (n, sp) =>
      require(wide || sp.ncType <= NC_DOUBLE,
        s"$n: nc_type ${sp.ncType} needs CDF-5 (version = 5)")
    }
    def attBytes(a: Att): Array[Byte] = {
      val vb = a.value match {
        case Left(s) =>
          val raw = s.getBytes(StandardCharsets.UTF_8)
          (raw, raw.length)
        case Right(nums) =>
          val es = elemSize(a.ncType)
          val bb = ByteBuffer.allocate(nums.length * es)
          nums.foreach(putElem(bb, a.ncType, _))
          (bb.array(), nums.length)
      }
      val (raw, count) = vb
      val out = ByteBuffer.allocate(nameBytes(a.name).length + 4 + nnBytes +
        pad4(raw.length).toInt)
      out.put(nameBytes(a.name)).putInt(a.ncType)
      putNN(out, count)
      out.put(raw)
      out.array()
    }
    def attList(as: Seq[Att]): Array[Byte] = {
      val body = as.flatMap(attBytes).toArray
      val out = ByteBuffer.allocate(4 + nnBytes + body.length)
      out.putInt(if (as.isEmpty) 0 else TAG_ATT)
      putNN(out, as.size)
      out.put(body)
      out.array()
    }
    def isRecVar(sp: VarSpec): Boolean =
      recDimId >= 0 && sp.dims.headOption.exists(dimIdx(_) == recDimId)
    // the classic format only permits the record dim as a variable's FIRST
    // dimension — anywhere else the shape/offset arithmetic is undefined,
    // so reject instead of writing a file that reads back as garbage
    vars.foreach { case (n, sp) =>
      require(!sp.dims.drop(1).exists(dimIdx(_) == recDimId),
        s"$n: the record dimension must be the first dimension")
    }
    /** per-record element count for a record var; total count for fixed. */
    def fixedCount(sp: VarSpec): Long =
      sp.dims.filter(dimIdx(_) != recDimId)
        .map(d => dims(dimIdx(d)).length.toLong).product
    vars.foreach { case (n, sp) =>
      val expect =
        if (isRecVar(sp)) fixedCount(sp) * numRecs else fixedCount(sp)
      require(sp.values.length == expect,
        s"$n: ${sp.values.length} values, dims imply $expect")
    }
    // vsize per spec: fixed = padded total; record = padded per-record slab
    def vsize(sp: VarSpec): Long =
      pad4(fixedCount(sp) * elemSize(sp.ncType))
    val recVars = vars.filter { case (_, sp) => isRecVar(sp) }
    val singleRec = recVars.size == 1
    // layout pass: header size, then var begins — fixed vars first, then
    // the record section (all record vars interleave per record)
    val beginBytes = if (version == 1) 4 else 8 // CDF-2/5: 64-bit offsets
    val varHeads = vars.map { case (n, sp) =>
      nameBytes(n).length + nnBytes /*ndims*/ + sp.dims.size * nnBytes +
        attList(sp.atts).length + 4 /*type*/ + nnBytes /*vsize*/ + beginBytes
    }
    val headerSize = 4 /*magic*/ + nnBytes /*numrecs*/ +
      (4 + nnBytes) + dims.map(d => nameBytes(d.name).length + nnBytes).sum +
      attList(gatts).length +
      (4 + nnBytes) + varHeads.sum
    var offset = pad4(headerSize)
    val fixedBegins = scala.collection.mutable.Map.empty[String, Long]
    vars.foreach { case (n, sp) =>
      if (!isRecVar(sp)) { fixedBegins(n) = offset; offset += vsize(sp) }
    }
    val recBegins = scala.collection.mutable.Map.empty[String, Long]
    vars.foreach { case (n, sp) =>
      if (isRecVar(sp)) {
        recBegins(n) = offset
        // the single-record-var exception: slabs pack without padding
        offset += (if (singleRec) fixedCount(sp) * elemSize(sp.ncType)
          else vsize(sp))
      }
    }
    def beginOf(n: String): Long = fixedBegins.getOrElse(n, recBegins(n))
    // validate the WHOLE layout before any byte is written — a mid-write
    // require would leave a truncated, spec-invalid file on disk. vsize is
    // a SIGNED 32-bit field in CDF-1/2 (CDF-5 widens it to 64), and begin
    // is signed 32-bit in CDF-1 (external netcdf-c consumers parse them
    // signed — an unsigned-range value round-trips in our reader but seeks
    // to garbage in theirs); CDF-2/5 lift the begin bound, cubes beyond
    // any remaining bound belong in the parquet sink.
    vars.foreach { case (n, sp) =>
      require(wide || vsize(sp) <= Int.MaxValue,
        s"variable '$n' exceeds the classic-format signed-32-bit vsize " +
          s"bound (vsize=${vsize(sp)}): write with version=5 (CDF-5) or " +
          "through the parquet sink")
      require(version != 1 || beginOf(n) <= Int.MaxValue,
        s"variable '$n' begins past the CDF-1 signed-32-bit offset bound " +
          s"(begin=${beginOf(n)}): write with version=2/5 or " +
          "through the parquet sink")
    }
    val out = new DataOutputStream(new java.io.BufferedOutputStream(
      new FileOutputStream(path)))
    try {
      def writeNN(v: Long): Unit =
        if (wide) out.writeLong(v) else out.writeInt(v.toInt)
      out.write(Array[Byte]('C', 'D', 'F', version.toByte))
      writeNN(if (recDimId >= 0) numRecs else 0)
      out.writeInt(TAG_DIM); writeNN(dims.size)
      dims.foreach { d => out.write(nameBytes(d.name)); writeNN(d.length) }
      out.write(attList(gatts))
      out.writeInt(TAG_VAR); writeNN(vars.size)
      vars.foreach { case (n, sp) =>
        out.write(nameBytes(n))
        writeNN(sp.dims.size)
        sp.dims.foreach(d => writeNN(dimIdx(d)))
        out.write(attList(sp.atts))
        out.writeInt(sp.ncType)
        writeNN(vsize(sp))
        if (version == 1) out.writeInt(beginOf(n).toInt)
        else out.writeLong(beginOf(n))
      }
      // pad header to the first begin
      (headerSize until pad4(headerSize).toInt).foreach(_ => out.writeByte(0))
      def encode(sp: VarSpec, from: Int, count: Int, pad: Boolean): Array[Byte] = {
        val es = elemSize(sp.ncType)
        val size = if (pad) pad4(count.toLong * es).toInt else count * es
        val bb = ByteBuffer.allocate(size)
        (from until from + count).foreach { j =>
          val d = sp.values(j)
          if (sp.ncType == NC_CHAR) bb.put(d.toByte)
          else putElem(bb, sp.ncType, d)
        }
        bb.array()
      }
      vars.foreach { case (_, sp) =>
        if (!isRecVar(sp))
          out.write(encode(sp, 0, sp.values.length, pad = true))
      }
      (0 until numRecs).foreach { rec =>
        vars.foreach { case (_, sp) =>
          if (isRecVar(sp)) {
            val perRec = fixedCount(sp).toInt
            out.write(encode(sp, rec * perRec, perRec, pad = !singleRec))
          }
        }
      }
    } finally out.close()
  }
}
