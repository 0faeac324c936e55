package graft.table

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/**
 * Rename-without-overwrite — the commit CAS primitive shared by snapshot
 * publication ([[IceTable.commit]]) and catalog versioning ([[GraftCatalog]]).
 * `FileSystem.rename` is NOT a safe CAS everywhere: on Raw/LocalFileSystem it
 * maps to POSIX rename(2), which silently REPLACES an existing destination.
 * Strongest primitive per scheme:
 *
 *  - `file://`: `Files.createLink` — link(2) is atomic and fails with EEXIST
 *    when the destination exists, a TRUE local CAS (FileContext's local
 *    rename is only a non-atomic existence check in front of rename(2));
 *    stores without hard links degrade to the FileContext path.
 *  - schemes with an AbstractFileSystem binding:
 *    `FileContext.rename(src, dst, Options.Rename.NONE)` — atomic
 *    no-overwrite rename on HDFS-like stores.
 *  - other schemes: best-effort exists-check + rename; the window cannot be
 *    closed without a server-side primitive, and HDFS-like stores fail the
 *    rename on an existing destination anyway.
 */
private[graft] object FsIO {
  /** full small-file read as UTF-8 (snapshot jsons, segments, catalogs) */
  def readUtf8(fs: FileSystem, p: HPath): String = {
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      new String(bytes.toByteArray, "UTF-8")
    } finally in.close()
  }
}

private[graft] object AtomicRename {

  /** publish `src` at `dst`, failing (false) when the destination exists */
  def renameNoReplace(f: FileSystem, src: HPath, dst: HPath): Boolean =
    if (Option(f.getUri.getScheme).forall(_ == "file")) {
      // atomic link(2) CAS; f.delete (not nio) also removes the local
      // checksum shadow file of the tmp name
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(dst.toUri.getPath),
          java.nio.file.Paths.get(src.toUri.getPath))
        f.delete(src, false)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: UnsupportedOperationException |
             _: java.nio.file.FileSystemException =>
          // store without hard links (VFAT/some FUSE mounts) or an odd
          // layout: degrade to the rename path rather than failing every
          // commit (the link CAS is an upgrade, not a requirement)
          fileContextRenameNoReplace(f, src, dst)
      }
    } else fileContextRenameNoReplace(f, src, dst)

  private def fileContextRenameNoReplace(f: FileSystem, src: HPath,
      dst: HPath): Boolean =
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        f.getUri, f.getConf)
      fc.rename(src, dst, org.apache.hadoop.fs.Options.Rename.NONE)
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        // no AbstractFileSystem binding for this scheme: best-effort guard +
        // FileSystem rename (HDFS-like stores fail it on existing dst anyway)
        try !f.exists(dst) && f.rename(src, dst)
        catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => false }
    }
}
