package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Session-scoped build-once registry for PERSISTED index artifacts.
  *
  * The index-lifecycle operators (dedup groups, the lexical and vector
  * indexes) have two cost tiers: a BUILD that scans the corpus and a SERVE
  * that reads only the stored artifact. Registered queries must stand
  * alone from the raw tables, so a serve face cannot assume some other
  * query ran first — but paying a full rebuild inside EVERY consumer is
  * exactly the recurring cost the round-9 measurements flagged (each group
  * consumer re-derived the full PPJoin+CC closure: 123-182 s solo at
  * sf10). This cache is the middle path: the FIRST caller in a session
  * builds and the rest read, so a suite prices one build + N cheap serves
  * (the production shape — the nightly job built the artifact, query
  * tiers only read), while a solo run still stands alone by building on
  * demand.
  *
  * Keying: artifacts are keyed by a fingerprint of their source table.
  * For a plain file-backed table the fingerprint comes from the FILE
  * METADATA (sorted path:length:modTime list) — an O(listing) operation,
  * because a serve face that content-hashed the corpus on every call
  * would re-read all raw text per query, the exact cost class the serve
  * tier exists to avoid. For anything else (spec corpora override
  * `Tables.documents` with in-memory frames that share one path — a path
  * key would serve corpus A's artifact to corpus B) the fingerprint falls
  * back to a CONTENT hash: two linear order-independent aggregates
  * (count + xxhash64 XOR + a decimal SUM of the same hashes), fine at
  * spec scale. The sum breaks the XOR's cancellation class: rows
  * duplicated an even number of times XOR to zero, but their hashes
  * still add (2·h ≠ 0), so {r1,r1,r2} and {r3,r3,r2} no longer collide.
  * The sum runs over DECIMAL(38,0) — an ANSI-mode BIGINT sum of 64-bit
  * hashes would overflow and throw.
  *
  * Scope: the memo is per-JVM and the registry assumes ONE session owns
  * the artifact root at a time (bench / Verify / the driver each run
  * single-JVM). Two concurrent JVMs over the same corpus would race an
  * overwrite against an in-flight read — a deployment sharing artifacts
  * across processes puts them on a real store with a lock/rename
  * protocol; directories here are deterministic under the fingerprint, so
  * a crashed session's leftovers are simply overwritten by the next
  * build, never trusted. Leftovers from PRIOR sessions (a corpus rewrite
  * mints a fresh fingerprint directory every time) are best-effort pruned:
  * after a successful build, sibling fingerprint directories of the same
  * kind that this session neither built nor started building AND that
  * have not been written to for over an hour are deleted (see `prune`).
  */
object ArtifactCache {

  private val built = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Per-directory build locks. Builds run under a plain monitor — NOT
    * inside `built`'s `compute*` bins — because a build may itself ensure
    * another artifact (the upserted indexes clone their PRE-DELTA base:
    * `writeUpsertedIndex` → `textIndexDir(baseTables)`), and a
    * ConcurrentHashMap mapping function must not update other mappings of
    * the same map (nested updates that land in one bin can loop).
    * Monitors are per-thread reentrant, so nested DIFFERENT-key builds
    * just take a second lock; a build that ensured ITSELF would recurse —
    * no such cycle exists (build graph: day-old index → base index).
    */
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def lockFor(dir: String): Object =
    locks.computeIfAbsent(dir, _ => new Object)

  /** Directories with an in-flight OR completed build this session — the
    * prune guard: a sibling prune must never delete a directory another
    * thread is mid-build on (it enters this set BEFORE its build starts,
    * while `built` only lists completed builds).
    */
  private val live = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private val root = "/tmp/graft_artifacts"

  /** Fingerprint of `df` over `cols`: file-metadata based (NO data scan)
    * when `df` is a plain file-backed scan; content-based otherwise.
    */
  def fingerprint(df: DataFrame, cols: Column*): String =
    fileKey(df).getOrElse {
      val r = df.select(xxhash64(cols: _*).as("h"))
        .agg(count(lit(1)).as("n"),
          coalesce(expr("bit_xor(h)"), lit(0L)).as("x"),
          // decimal, not bigint: ANSI mode throws on a 64-bit hash sum
          coalesce(sum(col("h").cast("decimal(38,0)")), lit(0).cast("decimal(38,0)"))
            .as("s")).head()
      val sumHash = scala.util.hashing.MurmurHash3
        .stringHash(r.getDecimal(2).toBigInteger.toString)
      s"${r.getLong(0)}_${java.lang.Long.toHexString(r.getLong(1))}_" +
        java.lang.Integer.toHexString(sumHash)
    }

  /** The zero-data-scan fast path: a plain file-backed relation's
    * identity is its file listing (path, length, modification time) —
    * the standard cache-invalidation triple; a rewrite of any file
    * yields a fresh fingerprint and therefore a rebuild.
    */
  private[graft] def fileKey(df: DataFrame): Option[String] = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    df.queryExecution.analyzed match {
      case l: LogicalRelation =>
        l.relation match {
          case fs: HadoopFsRelation =>
            val files = fs.location.listFiles(Nil, Nil).flatMap(_.files)
              .map(f => s"${f.getPath}:${f.getLen}:${f.getModificationTime}")
              .sorted
            val h = scala.util.hashing.MurmurHash3.orderedHash(files)
            Some(s"files_${files.size}_${java.lang.Integer.toHexString(h)}")
          case _ => None
        }
      case _ => None
    }
  }

  /** The deterministic directory for (kind, fingerprint) — no build. */
  def dir(kind: String, fp: String): String = s"$root/$kind/$fp"

  /** The artifact directory for (kind, fingerprint), building via `build`
    * iff this session has not built it yet. Concurrent callers of the
    * SAME artifact serialize on its per-directory lock (second caller
    * waits, then reads); different artifacts build independently.
    */
  def ensure(kind: String, fp: String)(build: String => Unit): String = {
    val dir = this.dir(kind, fp)
    live.add(dir)
    // ALWAYS enter the lock (no lock-free fast path): this serializes
    // BUILDS — a rebuild() mid-overwrite can't interleave with a second
    // build, and a caller entering here waits out any in-flight build
    // before getting the path. It does NOT cover the caller's subsequent
    // SCAN of the returned directory (that runs after release; holding
    // the monitor across reads would nest per-artifact locks in opposite
    // orders for the two-artifact serve faces — a deadlock class worse
    // than the race). Rebuild-vs-in-flight-read is excluded by the
    // documented execution scope instead: bench / Verify / the driver
    // run registered queries single-threaded, and each serve face
    // materializes its result before returning.
    lockFor(dir).synchronized {
      if (!built.containsKey(dir)) {
        build(dir); built.put(dir, dir); prune(kind)
      }
    }
    dir
  }

  /** Force a (re)build — the registered BUILD faces call this so their
    * bench reading always prices the build, and mark the artifact built
    * so serve faces in the same session reuse it. The build runs under
    * the SAME per-directory lock as ensure(), so it serializes against a
    * concurrent ensure() of the same artifact instead of interleaving
    * with it.
    */
  def rebuild(kind: String, fp: String)(build: String => Unit): String = {
    val dir = this.dir(kind, fp)
    live.add(dir)
    lockFor(dir).synchronized { build(dir); built.put(dir, dir); prune(kind) }
    dir
  }

  /** Best-effort cross-session cleanup: drop sibling fingerprint
    * directories of `kind` that this session has neither built nor
    * started building — a corpus rewrite mints a fresh fingerprint
    * directory per session, and without pruning the root grows without
    * bound. Runs only after an ACTUAL build (never on cache-hit reads —
    * nothing new can be stale then, and the serve path stays listing-
    * free), deletes only directories that look ABANDONED (last modified
    * over an hour ago — a concurrent JVM's in-flight build keeps bumping
    * its directory's mtime as files land, and single-JVM ownership of
    * the root is the documented scope for anything longer-lived), and
    * re-checks liveness immediately before each delete. The whole pass
    * is advisory; a failure to delete is ignored.
    */
  private val pruneAgeMs = 60L * 60 * 1000

  /** Newest mtime across the WHOLE artifact tree: nested layouts
    * (`<fp>/postings/bucket=N/…`, `<fp>/idx/cluster=N/…`) land files two
    * levels down, where only the leaf file and its immediate parent get
    * mtime bumps — a one-level walk would miss a long in-flight append
    * that only touches existing partition dirs and prune it mid-write.
    * Artifact trees are small (hundreds of files), so the full walk is
    * cheap, and it only runs on the post-build prune path anyway.
    */
  private def lastTouched(dir: java.io.File): Long = {
    val kids = Option(dir.listFiles()).getOrElse(Array.empty)
    (dir.lastModified() +: kids.map(k =>
      if (k.isDirectory) lastTouched(k) else k.lastModified())).max
  }

  private def prune(kind: String): Unit =
    try {
      val now = System.currentTimeMillis()
      val kindDir = new java.io.File(s"$root/$kind")
      val children = Option(kindDir.listFiles()).getOrElse(Array.empty)
      children.foreach { c =>
        if (c.isDirectory && now - lastTouched(c) > pruneAgeMs &&
            !live.contains(c.getPath)) deleteRec(c)
      }
    } catch { case _: Throwable => () }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete(); ()
  }

  /** Clone `src` into `dst` (replacing `dst`): parquet part files are
    * HARD-LINKED when the filesystem allows (zero-copy, and safe because
    * committed part files are immutable — an append writes new files,
    * never rewrites existing ones), everything else (`_SUCCESS` and
    * friends, which a later append job RECREATES IN PLACE — through a
    * hard link that truncation would reach the shared inode and bump the
    * source artifact's mtime, breaking its metadata fingerprint) is
    * byte-copied.
    *
    * This is the stand-alone harness's zero-cost stand-in for "the index
    * directory already exists": production's daily upsert appends into
    * the live directory in place and copies nothing; a registered query
    * must not mutate the shared session artifact, so it links the base
    * into its own output directory and appends there.
    */
  def cloneDir(src: String, dst: String): Unit = {
    val s = java.nio.file.Paths.get(src)
    val d = java.nio.file.Paths.get(dst)
    deleteRec(d.toFile)
    java.nio.file.Files.walk(s).forEach { p =>
      val target = d.resolve(s.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) {
        java.nio.file.Files.createDirectories(target)
      } else {
        java.nio.file.Files.createDirectories(target.getParent)
        val name = p.getFileName.toString
        if (name.startsWith("_") || name.startsWith("."))
          java.nio.file.Files.copy(p, target)
        else
          try java.nio.file.Files.createLink(target, p)
          catch { case _: Throwable => java.nio.file.Files.copy(p, target) }
      }
    }
  }
}
