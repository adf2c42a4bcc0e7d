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

/** The ONE staged-append WRITE protocol shared by the same two
  * artifacts (round-18 verdict #4: [[graft.operators.VectorStore
  * .appendVectors]] was [[graft.operators.Pq.appendIvfPqIndex]]'s
  * port — stage/rename/marker/sweep logic duplicated; [[LayoutCensus]]
  * unified the READ side, this unifies the WRITE side so the halves
  * cannot drift). The protocol, in commit order:
  *
  *  1. short-circuit if `markersDir/<tag>` exists (batch applied);
  *  2. sweep a prior crashed attempt's `<tag>-` prefixed files;
  *  3. write the batch to a private STAGE, rename each staged data
  *     file into the live directory under the `<tag>-` prefix;
  *  4. commit: create the marker — LAST, so a crash anywhere above
  *     leaves no marker and the retry re-runs from step 2.
  *
  * Also home to the WRITER LEASE (round-18 verdict #3): the
  * single-writer-per-artifact contract used to be documented but
  * unenforced — two concurrent writers corrupted silently (unsynchronized
  * live-root renames and sweeps). [[withWriterLease]] converts that
  * into a loud failure: every mutator (append, rebuild, janitor,
  * compaction-as-reader-pause) creates `<root>/_writer_lease`
  * exclusively before touching the tree and deletes it after. The
  * lease is NOT a distributed lock service — it is a tripwire:
  *
  *  - a SECOND live writer fails fast instead of tearing files;
  *  - a writer retrying its own crashed attempt self-heals (the
  *    lease carries the owner string; an identical owner re-enters —
  *    the single-writer rule says nobody else can legitimately hold
  *    that identity while the retry runs);
  *  - a crashed tagged append whose marker DID land (the
  *    commit-to-release window) is provably complete, so any next
  *    writer may break its lease (`staleIf`);
  *  - any OTHER stale lease (a crashed janitor/rebuild/compaction)
  *    fails the next writer loudly with the remedy in the message —
  *    [[breakLease]] after confirming no writer is live. Loud and
  *    manual beats silent corruption; the automated path (the
  *    streaming sink's tagged appends) self-heals via the two rules
  *    above.
  */
private[graft] object AppendProtocol {

  /** Tag contract shared by both artifacts (see the
    * [[graft.operators.Pq.appendIvfPqIndex]] scaladoc for the full
    * reasoning): `[A-Za-z0-9._]+` (no `-` — cleanup deletes by
    * `<tag>-` name prefix, and a `-` inside a tag would let one tag
    * prefix another committed tag's files); not exactly `part` (that
    * sweep prefix would delete the base build's own `part-*` files);
    * and — round-19 — no LEADING `.` or `_`: Spark scans treat
    * `_`/`.`-prefixed files as hidden bookkeeping, so a tag like
    * `_b3` would rename the batch's data files into INVISIBILITY
    * (appended rows silently absent from every read — strictly worse
    * than either failure the other two rules prevent). */
  def validateTag(tag: String): Unit = {
    require(tag.nonEmpty && tag.matches("[A-Za-z0-9._]+"),
      s"batchTag must match [A-Za-z0-9._]+ (no '-': cleanup deletes " +
        s"by '<tag>-' name prefix, and a '-' inside a tag would let " +
        s"one tag prefix another committed tag's files), got '$tag'")
    require(!tag.startsWith("_") && !tag.startsWith("."),
      s"batchTag must not start with '_' or '.': Spark scans skip " +
        s"hidden files, so the renamed '<tag>-part-*' data files would " +
        s"be INVISIBLE to every read, got '$tag'")
    require(tag != "part",
      s"batchTag must not be exactly 'part' (Spark data files are " +
        s"named part-*; that tag's crash-cleanup sweep prefix " +
        s"'part-' would delete the base build's own files; longer " +
        s"tags like 'partition7' sweep 'partition7-' which cannot " +
        s"prefix a part-* file, so they stay allowed), got '$tag'")
  }

  /** Step 1: has `tag` fully applied? (its marker exists) */
  def applied(fs: FileSystem, markersDir: Path, tag: String): Boolean =
    fs.exists(new Path(markersDir, tag))

  /** Step 2: sweep a prior crashed attempt's partial renames — the
    * non-directory files in `dir` named `<tag>-…`. */
  def sweepTag(fs: FileSystem, dir: Path, tag: String): Unit =
    fs.listStatus(dir)
      .filter(st => !st.isDirectory && st.getPath.getName.startsWith(s"$tag-"))
      .foreach(f => fs.delete(f.getPath, false))

  /** Step 3: rename every non-hidden data file of `stagedDir` into
    * `liveDir` under `prefix` (`"<tag>-"`, or `""` untagged). The
    * prefix keeps the trailing `_NNNNN.c000…` suffix intact, which is
    * what Spark's bucketed scan parses — renamed files still
    * bucket-prune and co-partition. */
  def renameIn(fs: FileSystem, stagedDir: Path, liveDir: Path,
      prefix: String, what: String): Unit =
    fs.listStatus(stagedDir)
      .filter(st => !st.isDirectory && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .foreach { f =>
        require(fs.rename(f.getPath, new Path(liveDir, prefix + f.getPath.getName)),
          s"$what append rename failed: ${f.getPath}")
      }

  /** Step 4, the commit point: the marker lands only after every
    * rename, so a crash anywhere above leaves no marker and the
    * retry cleans up. */
  def commitMarker(fs: FileSystem, markersDir: Path, tag: String): Unit = {
    fs.mkdirs(markersDir)
    fs.create(new Path(markersDir, tag), false).close()
  }

  /** The lease file guarding one artifact root. `_`-prefixed: hidden
    * from scans and from every [[LayoutCensus]] listing. */
  def leasePath(root: Path): Path = new Path(root, "_writer_lease")

  /** Stable per-JVM writer identity (pid@host) — the nonce that makes
    * REPAIR owners unique per process: two live janitors/rebuilds
    * from different processes must NOT adjudicate each other as "my
    * own retry" (they would run concurrently, the silent corruption
    * the lease exists to prevent), while a same-process retry — the
    * autoMaintain sink re-dispatching after a thrown repair — still
    * re-enters its own lease. The cost, stated honestly: a repair
    * that dies WITH its JVM leaves a lease no restarted process can
    * steal — the remedy is [[breakLease]] after confirming no writer
    * is live, and that manual step is the price of never letting two
    * live repairs interleave silently. */
  private lazy val processNonce: String =
    java.lang.management.ManagementFactory.getRuntimeMXBean.getName

  /** The owner string for an append: the TAG is the identity (stable
    * across processes and restarts — a streaming checkpoint replays
    * the same batchId from any JVM, and the single-writer rule says
    * nobody else may run that tag), so tagged appends self-heal
    * across restarts. An UNTAGGED append has no cross-process
    * identity to key on — it gets the per-process nonce, so only its
    * own process may retry it (untagged already forfeits replay
    * safety; it forfeits cross-restart lease healing with it). */
  def appendOwner(tag: Option[String]): String =
    tag.map("append:" + _).getOrElse(s"append:untagged#$processNonce")

  /** The owner string for a repair/janitor (`rebuild`, `janitor`,
    * `compact`, `compact-flip`) — per-process identity, see
    * [[processNonce]]. */
  def repairOwner(kind: String): String = s"$kind#$processNonce"

  /** The one stale-lease adjudication every writer shares: a held
    * lease naming a TAGGED append whose commit marker landed is
    * provably a finished writer that crashed in its
    * commit-to-release window — safe for ANY next writer (append,
    * janitor, rebuild, compaction) to break, which is what keeps an
    * unattended deployment flowing after such a crash (a restarted
    * stream's replayed batch short-circuits on the marker WITHOUT
    * touching the lease, so the break must be available to whatever
    * writer runs next, not just the next append). Untagged-append
    * owners carry a `#` nonce and never have a marker, so they are
    * never adjudicated stale here. */
  def committedAppendStaleIf(fs: FileSystem, markersDir: Path): String => Boolean =
    held => held.startsWith("append:") && !held.contains("#") &&
      applied(fs, markersDir, held.stripPrefix("append:"))

  /** Run `body` holding the artifact's writer lease — see the object
    * scaladoc for the tripwire semantics. `staleIf(heldOwner)` lets a
    * caller prove a held lease stale beyond the identical-owner rule
    * (e.g. an append whose marker already landed). The lease is
    * deleted on exit, normal or thrown; only process death leaves it
    * behind, which is exactly the case the owner string adjudicates. */
  def withWriterLease[T](fs: FileSystem, root: Path, owner: String,
      staleIf: String => Boolean = _ => false)(body: => T): T = {
    acquireLease(fs, root, owner, staleIf)
    try body
    finally {
      // release only a lease that still names THIS writer: a holder
      // lingering in its commit-to-release window whose lease was
      // legitimately broken-and-reacquired by the next writer must
      // not delete that writer's live lease on its way out (an
      // owner-blind delete would let a third writer acquire and run
      // concurrently with the breaker)
      if (readOwner(fs, leasePath(root)) == owner)
        fs.delete(leasePath(root), false)
    }
  }

  /** Acquire (exclusive-create) the lease; adjudicate a held one. */
  def acquireLease(fs: FileSystem, root: Path, owner: String,
      staleIf: String => Boolean = _ => false): Unit = {
    val lease = leasePath(root)
    val acquired =
      try {
        val out = fs.create(lease, false) // exclusive: fails if held
        out.write(owner.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        out.close()
        true
      } catch { case _: java.io.IOException => false }
    if (!acquired) {
      val held = readOwner(fs, lease)
      // identical owner = this writer's own crashed/retrying attempt
      // (the single-writer rule says nobody else may run under the
      // same identity) — re-enter on the standing lease file
      if (held == owner) ()
      else if (staleIf(held)) {
        // the holder provably finished — break its lease, but
        // RE-ACQUIRE exclusively under our own owner rather than
        // squatting on the stale file: if we merely proceeded, the
        // lease would still name the finished holder, and a THIRD
        // writer would read the same stale owner, draw the same
        // conclusion, and run concurrently with us — two live
        // writers, the exact corruption the lease exists to prevent.
        // The delete+create race window is the create's exclusivity:
        // whoever loses the second create fails loudly below.
        fs.delete(lease, false)
        val reacquired =
          try {
            val out = fs.create(lease, false)
            out.write(owner.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            out.close()
            true
          } catch { case _: java.io.IOException => false }
        if (!reacquired)
          throw new IllegalStateException(
            s"artifact at $root: lost the lease race to '" +
              s"${readOwner(fs, lease)}' while breaking finished writer " +
              s"'$held' — another writer is live, refusing to write as " +
              s"'$owner'.")
      } else
        throw new IllegalStateException(
          s"artifact at $root is leased by writer '$held' — refusing to " +
            s"write as '$owner'. Either a writer is LIVE (the " +
            s"single-writer contract: serialize out-of-band writes) or " +
            s"it crashed mid-write; after confirming no writer is " +
            s"live, remove the lease (AppendProtocol.breakLease) and " +
            s"retry. Failing loudly here is the point — unsynchronized " +
            s"concurrent writes corrupt the tree silently.")
    }
  }

  private def readOwner(fs: FileSystem, lease: Path): String =
    try {
      val in = fs.open(lease)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
        buf.toString("UTF-8")
      } finally in.close()
    } catch { case _: java.io.IOException => "<unreadable>" }

  /** Manual remedy for a crashed non-append writer's stale lease —
    * only after confirming no writer is live. Returns whether a lease
    * existed. */
  def breakLease(fs: FileSystem, root: Path): Boolean =
    fs.delete(leasePath(root), false)
}
