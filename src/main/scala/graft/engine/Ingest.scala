package graft.engine

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._

/** OP-SRC-9 — zip extraction + per-archive layout
  * (`downloader.py:135-202`): each downloaded `*.zip` is extracted into a
  * directory named after the archive stem, optionally deleting the zip.
  * Driver/ingest-side FS work (O(archives), not dataflow); the network
  * download that produces the zips stays out of engine.
  */
object Ingest {

  /** Extract one archive into `destDir`; returns the extracted file paths.
    * Entry names are resolved and must stay inside `destDir` (zip-slip
    * guard — archive contents are untrusted input).
    */
  def unzip(zipPath: String, destDir: String): Seq[String] = {
    val dest = Paths.get(destDir).toAbsolutePath.normalize()
    Files.createDirectories(dest)
    val zf = new ZipFile(zipPath)
    try {
      zf.entries().asScala.filterNot(_.isDirectory).map { e =>
        val target = dest.resolve(e.getName).normalize()
        require(target.startsWith(dest),
          s"zip entry escapes destination: ${e.getName}")
        Files.createDirectories(target.getParent)
        val in = zf.getInputStream(e)
        val out = new BufferedOutputStream(
          new FileOutputStream(target.toFile))
        try in.transferTo(out)
        finally { out.close(); in.close() }
        target.toString
      }.toSeq
    } finally zf.close()
  }

  /** Extract every `*.zip` under `zipDir` into `unzipDir/<stem>/`
    * (the reference's per-region layout), optionally deleting archives
    * after extraction (`downloader.py:195-202`). Returns stem → files.
    */
  def extractAll(zipDir: String, unzipDir: String,
      deleteZips: Boolean = false): Map[String, Seq[String]] = {
    val zips: Seq[Path] = {
      val stream = Files.list(Paths.get(zipDir))
      try stream.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".zip")).toSeq.sortBy(_.toString)
      finally stream.close()
    }
    zips.map { z =>
      val stem = z.getFileName.toString.stripSuffix(".zip")
      val files = unzip(z.toString, s"$unzipDir/$stem")
      if (deleteZips) Files.delete(z)
      stem -> files
    }.toMap
  }
}
