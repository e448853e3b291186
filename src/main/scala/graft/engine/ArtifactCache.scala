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
  * back to a CONTENT hash: one linear aggregate (count + an
  * order-independent xxhash64 XOR), fine at spec scale.
  *
  * Scope: the memo is per-JVM and the registry assumes ONE session owns
  * the artifact root at a time (bench / Verify / the driver each run
  * single-JVM). Two concurrent JVMs over the same corpus would race an
  * overwrite against an in-flight read — a deployment sharing artifacts
  * across processes puts them on a real store with a lock/rename
  * protocol; directories here are deterministic under the fingerprint, so
  * a crashed session's leftovers are simply overwritten by the next
  * build, never trusted.
  */
object ArtifactCache {

  private val built = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private val root = "/tmp/graft_artifacts"

  /** Fingerprint of `df` over `cols`: file-metadata based (NO data scan)
    * when `df` is a plain file-backed scan; content-based otherwise.
    */
  def fingerprint(df: DataFrame, cols: Column*): String =
    fileKey(df).getOrElse {
      val r = df.select(xxhash64(cols: _*).as("h"))
        .agg(count(lit(1)).as("n"),
          coalesce(expr("bit_xor(h)"), lit(0L)).as("x")).head()
      s"${r.getLong(0)}_${java.lang.Long.toHexString(r.getLong(1))}"
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

  /** The artifact directory for (kind, fingerprint), building via `build`
    * iff this session has not built it yet. Concurrent callers of the
    * SAME artifact serialize on its map bin (computeIfAbsent — second
    * caller waits, then reads); different artifacts build independently.
    */
  def ensure(kind: String, fp: String)(build: String => Unit): String = {
    val dir = s"$root/$kind/$fp"
    built.computeIfAbsent(dir, _ => { build(dir); dir })
  }

  /** Force a (re)build — the registered BUILD faces call this so their
    * bench reading always prices the build, and mark the artifact built
    * so serve faces in the same session reuse it.
    */
  def rebuild(kind: String, fp: String)(build: String => Unit): String = {
    val dir = s"$root/$kind/$fp"
    build(dir)
    built.put(dir, dir)
    dir
  }
}
