package graft.table

import graft.model._
import org.json4s._
import org.json4s.jackson.Serialization
import java.nio.file.{Files, Path}

/** Manifest (de)serialization via json4s (ships with Spark). */
object ManifestJson {
  private implicit val formats: Formats = DefaultFormats

  def write(m: EpochManifest): String = Serialization.writePretty(m)

  def read(p: Path): EpochManifest = {
    val s = new String(Files.readAllBytes(p), "UTF-8")
    Serialization.read[EpochManifest](s)
  }
}
