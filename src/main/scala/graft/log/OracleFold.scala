package graft.log

import graft.model.{ChangeEvent, FileRow}

/**
 * In-memory reference fold of a change log — the test oracle
 * (SURVEY.md §5): last-writer-wins by `seq` per key `(repo, path)`,
 * deletes remove the key. Mirrors the reference's dedup-reducer contract
 * (gobblin-compaction/.../avro/AvroKeyDedupReducer.java:62-90) where the
 * delta field (here: seq) totally orders conflicting records.
 */
object OracleFold {

  def sha256Hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(64)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** Fold events (any order) into the final table state. */
  def fold(events: IterableOnce[ChangeEvent]): Map[(String, String), FileRow] = {
    // keep, per key, the event with max seq; then drop deletes
    val best = scala.collection.mutable.HashMap.empty[(String, String), ChangeEvent]
    // same-(key, seq) duplicates with DIFFERENT payloads (at-least-once
    // producer retries) tie-break exactly like the engine: lexicographic
    // max of (commit, op, lang, content), null content smallest — the
    // oracle must agree with MergeEngine on every input, not just on
    // exact duplicates
    def tieKey(x: ChangeEvent): (String, String, String, Option[String]) =
      (x.commit, x.op, x.lang, Option(x.content))
    events.iterator.foreach { e =>
      val k = (e.repo, e.path)
      best.get(k) match {
        case Some(cur) if cur.seq > e.seq => ()
        case Some(cur) if cur.seq == e.seq =>
          if (Ordering[(String, String, String, Option[String])]
            .gt(tieKey(e), tieKey(cur))) best(k) = e
        case _ => best(k) = e
      }
    }
    best.iterator.collect {
      case (k, e) if e.op != "d" =>
        k -> FileRow(e.repo, e.path, e.commit, e.lang, e.content,
          sha256Hex(e.content))
    }.toMap
  }
}
