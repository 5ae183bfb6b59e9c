package graft.sources

/** One parsed manifest entry — the typed view of every on-disk dialect
  * (round-16 verdict #5: manifest set algebra over raw `|`-split
  * strings is a footgun CLAUDE.md itself warns about; a type whose
  * identity IS the path removes it by construction).
  *
  * Disk dialects (formats are written by their owners; this codec only
  * READS):
  *  - bare:        `path`                                  (pre-stats)
  *  - positional:  `path|nk_lo|nk_hi|bal_lo|bal_hi|rows`   (k/nkd/bal
  *                 stores — [[Snapshots.statsEntries]])
  *  - named:       `path|n=rows|col=lo..hi|...`            (schema-
  *                 driven — [[SchemaStats.entries]])
  *
  * `stats` maps column → (lo, hi) as the raw rendered strings (parse
  * numerically at the use site); positional entries surface their
  * bounds under `nkd` and `bal`. Equality/hashing on the FULL entry is
  * deliberate — set algebra over entries must go through `.path`.
  */
final case class ManifestEntry(
    path: String,
    rows: Option[Long],
    stats: Map[String, (String, String)],
    /** True only for the named dialect, whose entries enumerate EVERY
      * stat-able column the file holds — the precondition for treating
      * a missing column as "no non-null values" (absence pruning).
      * Positional entries list a fixed column pair; absence there means
      * nothing.
      */
    named: Boolean,
    line: String)

object ManifestEntry {

  /** Stat-bound comparator for the rendered strings `stats` carries:
    * numeric when both sides parse as numbers, lexicographic otherwise
    * — DateType bounds render as ISO strings ([[SchemaStats.entries]]),
    * which order correctly lexicographically; parsing them with
    * BigDecimal would throw (round-17 advice). Mixed-type comparisons
    * (a date bound against a numeric range) are caller errors either
    * way; same-typed columns compare correctly under both branches.
    */
  def boundCompare(a: String, b: String): Int =
    try BigDecimal(a).compare(BigDecimal(b))
    catch { case _: NumberFormatException => a.compareTo(b) }

  /** Does the recorded [lo, hi] bound intersect the queried [qLo, qHi]?
    * The one range test every stats-pruning reader should route through
    * — it is type-safe for every bound the named dialect renders.
    */
  def boundsIntersect(bounds: (String, String), qLo: String,
      qHi: String): Boolean =
    boundCompare(bounds._2, qLo) >= 0 && boundCompare(bounds._1, qHi) <= 0

  def parse(line: String): ManifestEntry = {
    val parts = line.split('|')
    if (parts.length >= 2 && parts(1).startsWith("n=")) {
      val stats = parts.drop(2).flatMap { f =>
        val eq = f.indexOf('=')
        if (eq <= 0) None
        else {
          val range = f.substring(eq + 1).split(raw"\.\.", 2)
          if (range.length == 2)
            Some(f.substring(0, eq) -> ((range(0), range(1))))
          else None
        }
      }.toMap
      ManifestEntry(parts(0), Some(parts(1).drop(2).toLong), stats,
        named = true, line)
    } else if (parts.length >= 6) {
      ManifestEntry(parts(0), Some(parts(5).toLong),
        Map("nkd" -> ((parts(1), parts(2))),
          "bal" -> ((parts(3), parts(4)))), named = false, line)
    } else ManifestEntry(parts(0), None, Map.empty, named = false, line)
  }

  /** Parsed entries of a version's manifest. */
  def of(dir: String, v: Int): Seq[ManifestEntry] =
    Snapshots.manifestLines(dir, v).map(parse)
}
