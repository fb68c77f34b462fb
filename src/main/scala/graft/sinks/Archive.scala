package graft.sinks

import java.io.{BufferedInputStream, BufferedOutputStream, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.{GZIPOutputStream, ZipEntry, ZipOutputStream}

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}

/** Archive/compress post-pass (reference D22,
  * internal/ext/archive/file_archiver.go): gz per file; tar.gz / zip
  * of all outputs into one archive; `auto` dispatch by extension;
  * nearest-common-parent naming.
  *
  * Per-file gzip of bulk output should use the distributed writer
  * option (`option("compression","gzip")`) — this object covers the
  * *archive* shapes (many files → one artifact), which have no
  * distributed primitive and run on the driver after the write, same
  * as the reference archives after sync (write_handler.go:270-412).
  */
object Archive {

  sealed trait Kind
  case object Gz extends Kind
  case object TarGz extends Kind
  case object Zip extends Kind

  /** `auto` dispatch by archive filename (file_archiver.go:36-52). */
  def kindOf(dest: String): Kind =
    if (dest.endsWith(".tar.gz") || dest.endsWith(".tgz")) TarGz
    else if (dest.endsWith(".zip")) Zip
    else Gz

  /** Nearest common parent of the input files — archive entry names are
    * relative to it (file_archiver.go nearest-common-parent naming).
    */
  def commonParent(files: Seq[Path]): Path = {
    require(files.nonEmpty, "no files to archive")
    files.map(_.toAbsolutePath.getParent)
      .reduce { (a, b) =>
        val ai = a.iterator(); val bi = b.iterator()
        var common = a.getRoot
        var go = true
        while (go && ai.hasNext && bi.hasNext) {
          val (x, y) = (ai.next(), bi.next())
          if (x == y) common = common.resolve(x) else go = false
        }
        common
      }
  }

  /** `password` applies to zip only (AE-2 AES-256, the yeka/zip path,
    * file_archiver.go:195-205); for other kinds it is ignored, matching
    * the reference's warn-and-continue (write_handler.go:321-322).
    */
  def archive(files: Seq[String], dest: String, password: Option[String] = None): Unit = {
    val paths = files.map(Paths.get(_))
    (kindOf(dest), password.filter(_.nonEmpty)) match {
      case (Zip, Some(pw)) =>
        val base = commonParent(paths)
        AesZip.write(dest, paths.map(p =>
          base.relativize(p.toAbsolutePath).toString -> Files.readAllBytes(p)), pw)
      case _ => archivePlain(paths, dest)
    }
  }

  private def archivePlain(paths: Seq[Path], dest: String): Unit = {
    kindOf(dest) match {
      case Gz =>
        // one .gz per file, written next to dest's directory
        paths.foreach { p =>
          val out = Paths.get(dest).resolveSibling(p.getFileName.toString + ".gz")
          val os = new GZIPOutputStream(new BufferedOutputStream(
            new FileOutputStream(out.toFile)))
          try Files.copy(p, os) finally os.close()
        }
      case Zip =>
        val base = commonParent(paths)
        val zos = new ZipOutputStream(new BufferedOutputStream(
          new FileOutputStream(dest)))
        try paths.foreach { p =>
          zos.putNextEntry(new ZipEntry(base.relativize(p.toAbsolutePath).toString))
          Files.copy(p, zos)
          zos.closeEntry()
        } finally zos.close()
      case TarGz =>
        val base = commonParent(paths)
        val tos = new TarArchiveOutputStream(new GZIPOutputStream(
          new BufferedOutputStream(new FileOutputStream(dest))))
        tos.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
        try paths.foreach { p =>
          val e = new TarArchiveEntry(p.toFile,
            base.relativize(p.toAbsolutePath).toString)
          tos.putArchiveEntry(e)
          val in = new BufferedInputStream(new FileInputStream(p.toFile))
          try {
            val buf = new Array[Byte](64 * 1024)
            var n = in.read(buf)
            while (n >= 0) { tos.write(buf, 0, n); n = in.read(buf) }
          } finally in.close()
          tos.closeArchiveEntry()
        } finally tos.close()
    }
  }
}
