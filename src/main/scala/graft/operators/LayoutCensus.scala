package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** The ONE file-census discipline shared by the two artifacts that
  * age with their write history — the IVF-PQ index tree
  * ([[Pq.fileAudit]] / [[Pq.compactionCadence]]) and the bucketed
  * vector store ([[VectorStore.storeAudit]] /
  * [[VectorStore.storeCadence]]). Both artifacts use the same append
  * commit protocol (staged files renamed in under a `<tag>-` name
  * prefix, a commit marker written LAST), so their audits share, by
  * construction rather than by parallel maintenance, the
  * committed/orphan classification, the factor-threshold election,
  * and the cadence forecast — extracted here (round-17 verdict #6) so
  * the thresholds cannot drift apart.
  *
  * Everything here is pure string/arithmetic logic over one metadata
  * listing — no Spark job, no data read.
  */
private[graft] object LayoutCensus {

  /** Is `name` a COMMITTED data file under the append protocol?
    * Committed = the base build's own `part-*` files, plus
    * `<tag>-part-*` files whose commit marker landed. Tags match
    * `[A-Za-z0-9._]+` (no `-`), so the segment before the first `-`
    * IS the tag and the parse is unambiguous (`part` itself is a
    * rejected tag). A tagged file with NO marker is an ORPHAN — a
    * crashed append's partial leavings: scanned by probes (the
    * documented visible torn state), removed only by the batch's own
    * retry sweep, a janitor, or a rebuild. */
  def isCommitted(name: String, committedTags: Set[String]): Boolean =
    name.startsWith("part-") || committedTags.contains(name.takeWhile(_ != '-'))

  /** The non-hidden data-file names of one directory (files only;
    * `_`/`.` prefixes are bookkeeping — markers, checksums). */
  def dataFileNames(fs: FileSystem, dir: Path): Seq[String] =
    fs.listStatus(dir)
      .filter(st => !st.isDirectory && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .map(_.getPath.getName).toSeq

  /** The committed tag set — the marker names under `markersDir`,
    * each one a fully-applied append batch (empty when the directory
    * doesn't exist: no tagged append ever committed). */
  def committedTags(fs: FileSystem, markersDir: Path): Set[String] =
    if (fs.exists(markersDir))
      fs.listStatus(markersDir).map(_.getPath.getName).toSet
    else Set.empty

  /** The factor-threshold election both audits apply: repair when the
    * scanned file count (committed + orphans — probes pay the
    * per-file open tax on BOTH) reaches `factor ×` the layout's unit
    * count (cells for the index, buckets for the store), i.e. when
    * the repair would shrink the listing ≥ `factor`×. `factor` is a
    * parameter of the deployment's per-file-open cost, not of the
    * algorithm — the slow-open tax tables in BASELINE.md size it. */
  def elect(scannedFiles: Long, units: Long, factor: Long,
      repairAction: String): String =
    if (scannedFiles >= factor * units) repairAction else "keep"

  /** The cadence forecast both appenders surface: how many more
    * append batches until [[elect]] flips, extrapolated from the
    * artifact's OWN write history (committed batches vs the files
    * they added — a measured growth rate, not a config guess).
    * Orphans count toward the standing tax (probes scan them) but
    * NOT toward the growth rate (a crashed batch's leavings are not
    * a trend). Returns (decision, batchesToThreshold): `nowAction`
    * with horizon 0 when already over the line; `withinAction` with
    * the ⌈remaining/rate⌉ horizon when history exists; `keep` with
    * −1 when nothing is growing. */
  def forecast(scannedFiles: Long, units: Long, factor: Long,
      nBatches: Long, appendFiles: Long,
      nowAction: String, withinAction: String): (String, Long) = {
    val threshold = factor * units
    if (scannedFiles >= threshold) (nowAction, 0L)
    else if (nBatches > 0L && appendFiles > 0L)
      (withinAction,
        ((threshold - scannedFiles) * nBatches + appendFiles - 1L) / appendFiles)
    else ("keep", -1L)
  }

  /** Change-fingerprint of one artifact directory: every DATA file's
    * (name, length, mtime), sorted — NOT the directory's own mtime.
    * Local-FS directory mtime can have 1 s granularity and object
    * stores (S3A fake directories) report no meaningful directory
    * mtime, so a republish within the granularity window would serve
    * a stale cached row indefinitely if the directory were the key.
    * A rename-published tree rewrites its data files (fresh names +
    * lengths), so this fingerprint always moves even when every
    * mtime ties. Assumption (documented): publishes are rename-based
    * swaps of whole trees — a writer mutating a data file IN PLACE
    * to identical length within the mtime granularity is outside
    * every artifact's write protocol. */
  def dirFingerprint(fs: FileSystem, dir: Path): String =
    fs.listStatus(dir)
      .filter(st => !st.isDirectory && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
      .sorted.mkString(",")
}
