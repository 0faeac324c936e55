package graft.table

import graft.model._
import org.json4s._
import org.json4s.jackson.Serialization

/** Manifest (de)serialization via json4s (ships with Spark). */
object ManifestJson {
  private implicit val formats: Formats = DefaultFormats

  def write(m: EpochManifest): String = Serialization.writePretty(m)

  def parse(s: String): EpochManifest = Serialization.read[EpochManifest](s)
}
