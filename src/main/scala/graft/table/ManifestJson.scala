package graft.table

import graft.model._
import org.json4s._
import org.json4s.jackson.Serialization

/** Manifest (de)serialization via json4s (ships with Spark). */
object ManifestJson {
  private implicit val formats: Formats = DefaultFormats

  def write(m: EpochManifest): String = Serialization.writePretty(m)

  def parse(s: String): EpochManifest = Serialization.read[EpochManifest](s)

  /** file-list SEGMENT bodies (two-level metadata). Canonical: callers pass
    * entries pre-sorted, so identical chunks serialize byte-identically —
    * the content-addressing contract. */
  def writeFiles(fs: Seq[DataFileEntry]): String = Serialization.writePretty(fs)

  def parseFiles(s: String): Seq[DataFileEntry] =
    Serialization.read[Seq[DataFileEntry]](s)
}
