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
  * Keying: artifacts are keyed by a CONTENT fingerprint of their source
  * table (one linear aggregate — count + an order-independent xxhash64
  * sum), never by the table path alone: specs override `Tables.documents`
  * with synthetic frames that share one path, and a path key would serve
  * corpus A's artifact to corpus B. Distinct corpora therefore get
  * distinct directories; a rebuilt corpus gets a fresh one.
  *
  * The memo is per-JVM. Directories are deterministic under the
  * fingerprint, so a crashed session's leftovers are simply overwritten
  * by the next build (mode=overwrite), never trusted.
  */
object ArtifactCache {

  private val built = scala.collection.mutable.HashSet[String]()

  private val root = "/tmp/graft_artifacts"

  /** Content fingerprint of `df` over `cols`: row count + the
    * order-independent XOR of per-row xxhash64 (bit_xor — exact under
    * ANSI mode where a long SUM of hashes overflows; pairs of identical
    * rows would cancel, but every caller hashes a unique-id column in) —
    * one map-side-combined linear scan, negligible next to any index
    * build it guards.
    */
  def fingerprint(df: DataFrame, cols: Column*): String = {
    val r = df.select(xxhash64(cols: _*).as("h"))
      .agg(count(lit(1)).as("n"),
        coalesce(expr("bit_xor(h)"), lit(0L)).as("x")).head()
    s"${r.getLong(0)}_${java.lang.Long.toHexString(r.getLong(1))}"
  }

  /** The artifact directory for (kind, fingerprint), building via `build`
    * iff this session has not built it yet.
    */
  def ensure(kind: String, fp: String)(build: String => Unit): String =
    synchronized {
      val dir = s"$root/$kind/$fp"
      if (!built.contains(dir)) { build(dir); built += dir }
      dir
    }

  /** Force a (re)build — the registered BUILD faces call this so their
    * bench reading always prices the build, and mark the artifact built
    * so serve faces in the same session reuse it.
    */
  def rebuild(kind: String, fp: String)(build: String => Unit): String =
    synchronized {
      val dir = s"$root/$kind/$fp"
      build(dir)
      built += dir
      dir
    }
}
