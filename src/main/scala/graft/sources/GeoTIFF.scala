package graft.sources

import java.io.{DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.channels.FileChannel
import java.nio.charset.StandardCharsets
import java.nio.file.{Paths, StandardOpenOption}

/** Pure-JVM GeoTIFF codec (baseline TIFF 6.0, uncompressed, strip- or
  * tile-organized, single sample per pixel) — the reference's WTD / IGBP
  * raster inputs (`dataset.py:153-159`, `inference/core.py:61`: rioxarray
  * `open_rasterio(masked=True).squeeze("band")`). Implemented from the
  * public TIFF 6.0 + GeoTIFF specs: a raster surfaces as (y, x[, lat,
  * lon], value) rows with the GDAL nodata sentinel masked to NULL and the
  * affine georeference applied from ModelTiepoint + ModelPixelScale.
  *
  * Scale posture: strips/tiles are independently addressable blocks (the
  * IFD carries their absolute offsets), so a reader partition seeks
  * directly to its block range — same no-scan property as the NetCDF
  * source, which is what makes a 100k-raster archive scan parallelize.
  */
object GeoTIFF {

  // IFD tags
  private val TImageWidth = 256
  private val TImageLength = 257
  private val TBitsPerSample = 258
  private val TCompression = 259
  private val TStripOffsets = 273
  private val TSamplesPerPixel = 277
  private val TRowsPerStrip = 278
  private val TStripByteCounts = 279
  private val TPlanarConfig = 284
  private val TTileWidth = 322
  private val TTileLength = 323
  private val TTileOffsets = 324
  private val TTileByteCounts = 325
  private val TSampleFormat = 339
  private val TModelPixelScale = 33550
  private val TModelTiepoint = 33922
  private val TGdalNodata = 42113

  /** Block = one strip (tileW = full width) or one tile. */
  final case class Block(offset: Long, x0: Int, y0: Int, w: Int, h: Int,
      rowStride: Int)

  final case class Tiff(width: Int, height: Int, bits: Int,
      sampleFormat: Int, blocks: Seq[Block],
      // affine georeference: lon = originLon + x*scaleX,
      // lat = originLat - y*scaleY (GeoTIFF raster-space convention)
      geo: Option[(Double, Double, Double, Double)],
      nodata: Option[Double], bigEndian: Boolean) {
    def bytesPerSample: Int = bits / 8
  }

  def readHeader(path: String): Tiff = {
    val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
    try {
      val head = ByteBuffer.allocate(8)
      ch.read(head, 0); head.flip()
      val b0 = head.get(); val b1 = head.get()
      val bigEndian = (b0, b1) match {
        case ('M', 'M') => true
        case ('I', 'I') => false
        case _ => throw new IllegalArgumentException(s"not a TIFF: $path")
      }
      head.order(if (bigEndian) ByteOrder.BIG_ENDIAN
        else ByteOrder.LITTLE_ENDIAN)
      require(head.getShort(2) == 42,
        s"unsupported TIFF variant (BigTIFF?) in $path")
      val ifdOffset = head.getInt(4).toLong & 0xFFFFFFFFL

      val cnt = ByteBuffer.allocate(2)
        .order(head.order())
      ch.read(cnt, ifdOffset); cnt.flip()
      val nEntries = cnt.getShort() & 0xFFFF
      val ifd = ByteBuffer.allocate(nEntries * 12).order(head.order())
      ch.read(ifd, ifdOffset + 2); ifd.flip()

      final case class Entry(tag: Int, typ: Int, count: Long, raw: Int)
      val entries = (0 until nEntries).map { i =>
        val base = i * 12
        Entry(ifd.getShort(base) & 0xFFFF, ifd.getShort(base + 2) & 0xFFFF,
          ifd.getInt(base + 4).toLong & 0xFFFFFFFFL, ifd.getInt(base + 8))
      }
      def typeSize(t: Int): Int = t match {
        case 1 | 2 | 6 | 7 => 1; case 3 | 8 => 2; case 4 | 9 | 11 => 4
        case 5 | 10 | 12 => 8
        case _ => throw new IllegalArgumentException(s"TIFF type $t")
      }
      /** All values of an entry as doubles (offsets followed when the
        * payload exceeds the 4 inline bytes). */
      def values(e: Entry): Seq[Double] = {
        val size = typeSize(e.typ) * e.count
        val buf =
          if (size <= 4) {
            val b = ByteBuffer.allocate(4).order(head.order())
            b.putInt(e.raw); b.flip(); b
          } else {
            val b = ByteBuffer.allocate(size.toInt).order(head.order())
            ch.read(b, e.raw.toLong & 0xFFFFFFFFL); b.flip(); b
          }
        (0L until e.count).map { i =>
          e.typ match {
            case 1 | 2 | 7 => (buf.get(i.toInt) & 0xFF).toDouble
            case 6 => buf.get(i.toInt).toDouble
            case 3 => (buf.getShort(i.toInt * 2) & 0xFFFF).toDouble
            case 8 => buf.getShort(i.toInt * 2).toDouble
            case 4 => (buf.getInt(i.toInt * 4).toLong & 0xFFFFFFFFL).toDouble
            case 9 => buf.getInt(i.toInt * 4).toDouble
            case 11 => buf.getFloat(i.toInt * 4).toDouble
            case 12 => buf.getDouble(i.toInt * 8)
          }
        }
      }
      def ascii(e: Entry): String = {
        val size = e.count.toInt
        val arr = new Array[Byte](size)
        if (size <= 4) {
          // inline payload: the 4 value bytes hold the chars — allocate 4
          // and copy only `count` (a 1-3 byte tag like GDAL nodata "0"
          // would otherwise overflow a count-sized buffer on putInt)
          val b = ByteBuffer.allocate(4).order(head.order())
          b.putInt(e.raw); b.flip()
          b.get(arr, 0, size)
        } else {
          val b = ByteBuffer.allocate(size)
          ch.read(b, e.raw.toLong & 0xFFFFFFFFL); b.flip()
          b.get(arr)
        }
        new String(arr, StandardCharsets.US_ASCII).takeWhile(_ != '\u0000')
      }
      val byTag = entries.map(e => e.tag -> e).toMap
      def one(tag: Int, default: => Double): Double =
        byTag.get(tag).map(values(_).head).getOrElse(default)
      def seq(tag: Int): Seq[Double] =
        byTag.get(tag).map(values).getOrElse(Nil)

      val w = one(TImageWidth, sys.error("no ImageWidth")).toInt
      val h = one(TImageLength, sys.error("no ImageLength")).toInt
      require(one(TCompression, 1) == 1.0,
        s"only uncompressed TIFF supported ($path)")
      require(one(TSamplesPerPixel, 1) == 1.0 && one(TPlanarConfig, 1) == 1.0,
        s"only single-sample rasters supported ($path)")
      val bits = one(TBitsPerSample, 1).toInt
      val fmt = one(TSampleFormat, 1).toInt

      val blocks: Seq[Block] =
        if (byTag.contains(TTileOffsets)) {
          val tw = one(TTileWidth, sys.error("no TileWidth")).toInt
          val th = one(TTileLength, sys.error("no TileLength")).toInt
          val offs = seq(TTileOffsets)
          val across = (w + tw - 1) / tw
          offs.zipWithIndex.map { case (o, i) =>
            val tx = i % across; val ty = i / across
            Block(o.toLong, tx * tw, ty * th,
              math.min(tw, w - tx * tw), math.min(th, h - ty * th), tw)
          }
        } else {
          val rps = one(TRowsPerStrip, h).toInt
          seq(TStripOffsets).zipWithIndex.map { case (o, i) =>
            Block(o.toLong, 0, i * rps, w, math.min(rps, h - i * rps), w)
          }
        }
      val geo = (seq(TModelTiepoint), seq(TModelPixelScale)) match {
        case (tp, sc) if tp.size >= 6 && sc.size >= 2 =>
          // tiepoint (i,j,k)->(x,y,z): lon origin at pixel i, lat at j
          Some((tp(3) - tp(0) * sc(0), tp(4) + tp(1) * sc(1), sc(0), sc(1)))
        case _ => None
      }
      val nodata = byTag.get(TGdalNodata).map(ascii).map(_.trim)
        .filter(_.nonEmpty).map(_.toDouble)
      Tiff(w, h, bits, fmt, blocks, geo, nodata, bigEndian)
    } finally ch.close()
  }

  /** Decode one block's samples as doubles (row-major over the block,
    * padded tile columns/rows excluded by the caller via block w/h).
    */
  def readBlock(ch: FileChannel, t: Tiff, b: Block): Array[Double] = {
    val bps = t.bytesPerSample
    val buf = ByteBuffer.allocate(b.rowStride * b.h * bps)
      .order(if (t.bigEndian) ByteOrder.BIG_ENDIAN
        else ByteOrder.LITTLE_ENDIAN)
    ch.read(buf, b.offset); buf.flip()
    val out = new Array[Double](b.w * b.h)
    var r = 0
    while (r < b.h) {
      var c = 0
      while (c < b.w) {
        val i = (r * b.rowStride + c) * bps
        out(r * b.w + c) = (t.sampleFormat, t.bits) match {
          case (3, 32) => buf.getFloat(i).toDouble
          case (3, 64) => buf.getDouble(i)
          case (2, 16) => buf.getShort(i).toDouble
          case (2, 32) => buf.getInt(i).toDouble
          case (1, 8) => (buf.get(i) & 0xFF).toDouble
          case (1, 16) => (buf.getShort(i) & 0xFFFF).toDouble
          case (1, 32) => (buf.getInt(i).toLong & 0xFFFFFFFFL).toDouble
          case (f, w) => throw new IllegalArgumentException(
            s"unsupported sample format $f/$w bits")
        }
        c += 1
      }
      r += 1
    }
    out
  }

  /** Shared little-endian TIFF primitive writer: the IFD must list its
    * entries in ascending tag order (TIFF 6.0 hard requirement — libtiff
    * consumers reject unsorted directories), so entries are collected and
    * sorted before emission instead of trusting call order.
    */
  private final class LeWriter(path: String) {
    val out = new DataOutputStream(new java.io.BufferedOutputStream(
      new FileOutputStream(path)))
    private val entries = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Int, Int, Long)]
    def le2(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def le4(v: Long): Unit = {
      le2((v & 0xFFFF).toInt); le2(((v >> 16) & 0xFFFF).toInt)
    }
    def entry(tag: Int, typ: Int, count: Int, value: Long): Unit =
      entries += ((tag, typ, count, value))
    /** header + sorted IFD + next-IFD terminator. */
    def writeHeaderAndIfd(ifdOffset: Long): Unit = {
      out.write('I'); out.write('I'); le2(42); le4(ifdOffset)
      le2(entries.size)
      entries.sortBy(_._1).foreach { case (tag, typ, count, value) =>
        le2(tag); le2(typ); le4(count); le4(value)
      }
      le4(0)
    }
    def close(): Unit = out.close()
  }

  /** Tiled float32 TIFF writer (little-endian, no geo tags) — exercises
    * the tile-organized block path real WTD-scale rasters use (tiles are
    * the layout that makes block-range partitioning useful: a strip of a
    * 100k-wide raster is one huge block; a 256×256 tile is not). Padded
    * tile cells are written as zero and never surfaced (block w/h clamp).
    * Tiles are buffered one at a time — a whole-raster buffer would both
    * double peak memory and overflow ByteBuffer's 2 GiB bound on exactly
    * the raster sizes tiling exists for.
    */
  def writeFloat32Tiled(path: String, width: Int, height: Int,
      values: Array[Float], tileW: Int, tileH: Int): Unit = {
    require(values.length == width * height)
    val across = (width + tileW - 1) / tileW
    val down = (height + tileH - 1) / tileH
    val nTiles = across * down
    val w = new LeWriter(path)
    try {
      val nTags = 11
      val ifdOffset = 8L
      val ifdSize = 2 + nTags * 12 + 4
      val offsetsOff = ifdOffset + ifdSize
      val countsOff = offsetsOff + 4L * nTiles
      val dataOff = (countsOff + 4L * nTiles + 3) & ~3L
      val tileBytes = tileW.toLong * tileH * 4
      w.entry(TImageWidth, 4, 1, width)
      w.entry(TImageLength, 4, 1, height)
      w.entry(TBitsPerSample, 3, 1, 32)
      w.entry(TCompression, 3, 1, 1)
      w.entry(TSamplesPerPixel, 3, 1, 1)
      w.entry(TPlanarConfig, 3, 1, 1)
      w.entry(TSampleFormat, 3, 1, 3)
      w.entry(TTileWidth, 3, 1, tileW)
      w.entry(TTileLength, 3, 1, tileH)
      w.entry(TTileOffsets, 4, nTiles,
        if (nTiles == 1) dataOff else offsetsOff)
      w.entry(TTileByteCounts, 4, nTiles,
        if (nTiles == 1) tileBytes else countsOff)
      w.writeHeaderAndIfd(ifdOffset)
      if (nTiles > 1) {
        (0 until nTiles).foreach(i => w.le4(dataOff + i * tileBytes))
        (0 until nTiles).foreach(_ => w.le4(tileBytes))
      }
      ((offsetsOff + (if (nTiles > 1) 8L * nTiles else 0)) until dataOff)
        .foreach(_ => w.out.writeByte(0))
      val buf = ByteBuffer.allocate(tileBytes.toInt)
        .order(ByteOrder.LITTLE_ENDIAN)
      for { ty <- 0 until down; tx <- 0 until across } {
        buf.clear()
        for { r <- 0 until tileH; c <- 0 until tileW } {
          val y = ty * tileH + r; val x = tx * tileW + c
          buf.putFloat(
            if (y < height && x < width) values(y * width + x) else 0f)
        }
        w.out.write(buf.array())
      }
    } finally w.close()
  }

  /** Minimal single-strip float32 GeoTIFF writer (little-endian) for test
    * fixtures and region-sized interchange — mirrors what the reference's
    * rasters carry: one band, ModelTiepoint/PixelScale, GDAL nodata.
    */
  def writeFloat32(path: String, width: Int, height: Int,
      values: Array[Float], originLon: Double, originLat: Double,
      scale: Double, nodata: Option[Float]): Unit = {
    require(values.length == width * height)
    val w = new LeWriter(path)
    try {
      val nodataStr = nodata.map(v =>
        (if (v == v.toLong.toFloat) v.toLong.toString else v.toString) + "\u0000")
      val nTags = 11 + (if (nodataStr.isDefined) 1 else 0)
      val ifdOffset = 8L
      val ifdSize = 2 + nTags * 12 + 4
      var aux = ifdOffset + ifdSize // trailing payload area
      val scaleOff = aux; aux += 3 * 8
      val tieOff = aux; aux += 6 * 8
      // TIFF 6.0: a payload of <= 4 bytes MUST live inline in the value
      // field (short nodata like "0"/"-1" — common in real rasters); only
      // longer strings go to the trailing area
      val nodataTail = nodataStr.filter(_.length > 4)
      val nodataOff = nodataTail.map { s => val o = aux; aux += s.length; o }
      val dataOff = (aux + 3) & ~3L
      w.entry(TImageWidth, 4, 1, width)
      w.entry(TImageLength, 4, 1, height)
      w.entry(TBitsPerSample, 3, 1, 32)
      w.entry(TCompression, 3, 1, 1)
      w.entry(TStripOffsets, 4, 1, dataOff)
      w.entry(TSamplesPerPixel, 3, 1, 1)
      w.entry(TRowsPerStrip, 4, 1, height)
      w.entry(TStripByteCounts, 4, 1, width.toLong * height * 4)
      w.entry(TSampleFormat, 3, 1, 3)
      w.entry(TModelPixelScale, 12, 3, scaleOff)
      w.entry(TModelTiepoint, 12, 6, tieOff)
      nodataStr.foreach { s =>
        val value =
          if (s.length <= 4) // pack chars into the LE value field
            s.getBytes(StandardCharsets.US_ASCII).zipWithIndex
              .map { case (b, i) => (b & 0xFFL) << (8 * i) }.sum
          else nodataOff.get
        w.entry(TGdalNodata, 2, s.length, value)
      }
      w.writeHeaderAndIfd(ifdOffset)
      val payload = ByteBuffer.allocate((dataOff - scaleOff).toInt)
        .order(ByteOrder.LITTLE_ENDIAN)
      payload.putDouble(scale).putDouble(scale).putDouble(0.0)
      payload.putDouble(0.0).putDouble(0.0).putDouble(0.0)
      payload.putDouble(originLon).putDouble(originLat).putDouble(0.0)
      nodataTail.foreach(s => payload.put(s.getBytes(StandardCharsets.US_ASCII)))
      w.out.write(payload.array())
      val data = ByteBuffer.allocate(values.length * 4)
        .order(ByteOrder.LITTLE_ENDIAN)
      values.foreach(data.putFloat)
      w.out.write(data.array())
    } finally w.close()
  }
}
