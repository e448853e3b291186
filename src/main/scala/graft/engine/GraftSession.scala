package graft.engine

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's tuned defaults.
  *
  * Tuning posture (see SURVEY.md §5): AQE on (runtime coalesce + skew-join
  * handling stand in for hand-tuned partition counts at 100 TB), shuffle
  * partitions sized for the local harness via `SPARK_GRAFT_CPUS`, UTC
  * session time so date semantics match the DuckDB oracle.
  */
object GraftSession {

  /** Apply graft's standard configuration to any builder. */
  /** Per-task-safe shuffled-hash build bound (bytes) — see the join
    * block below. Heap stands in for executor memory in local mode; on a
    * cluster, pass the executor's (memory, cores) shape through the same
    * formula via --conf overrides of the two adaptive settings.
    */
  private[graft] def shjSafeBytes(concurrentTasks: Int): Long = {
    val heap = Runtime.getRuntime.maxMemory
    math.max(8L << 20,
      math.min(64L << 20, heap * 3 / 10 / math.max(1, concurrentTasks) / 3))
  }

  def tune(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Broadcast selection is RUNTIME-ONLY (AQE, from measured shuffle
      // sizes); the static planner's file-size-anchored estimates do not
      // survive explode/aggregate chains — at the sf10 scale probe the
      // static planner "broadcast" a 37M-row shingle-frequency frame it
      // had estimated at the 30MB parquet footprint and killed the
      // driver. Explicit broadcast() hints on true dims are unaffected;
      // everything else earns a broadcast only after its actual size is
      // known. (Static -1 = off; adaptive threshold = the real budget.)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", (64L << 20).toString)
      // Shuffled-hash over sort-merge (guide §3.1): the identity/dedup
      // plans carry 10-22 key-axis equi-joins each, every one paying two
      // per-partition sorts under SMJ. Conversion is RUNTIME-ONLY, like
      // broadcast selection above: the static preference stays off-path
      // (static size estimates are the thing this session distrusts), and
      // AQE rewrites SMJ -> SHJ only when every post-shuffle partition of
      // the build side measures under the local-map threshold — which is
      // therefore a MEMORY bound, and must be derived from the memory a
      // concurrently-building task actually owns, not a flat constant: a
      // flat 64 MB OOM'd the sf10 gate ("not enough memory to build hash
      // map" — 32 tasks x ~3x-expanded 64 MB maps > the unified pool).
      // Budget = heap x 0.3 (execution's protected half of the 0.6
      // unified fraction) / concurrent tasks / 3 (UnsafeHashedRelation's
      // measured bytes-to-map expansion), clamped to [8 MB, 64 MB]. The
      // AQE rule additionally requires advisory <= threshold, so the
      // advisory target is set to the same value (its 64 MB default only
      // shrinks when task memory is genuinely scarce — at 8 GB/32 cores
      // this yields ~25 MB; a production 64 GB/16-core executor computes
      // back at the 64 MB cap, where the guide's partition-sizing advice
      // resumes). Merge-hinted joins (the PPJoin candidate joins) are
      // unaffected — hints outrank the preference.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        shjSafeBytes(shufflePartitions).toString)
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        shjSafeBytes(shufflePartitions).toString)
      .config("spark.sql.parquet.filterPushdown", "true")
      // iterative jobs (dedup_groups) checkpoint per round; with the
      // reliable-checkpoint knob set, superseded rounds' files must be
      // reclaimed as their RDDs fall out of scope or a long job accrues
      // rounds × |labels| of dead checkpoint data
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")
      // The testdata's events.ts is TIMESTAMP(NANOS), which Spark's parquet
      // reader rejects; read it as a long and convert in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // The typed from_json users (Adv.asaFields, Etl.schemaCheck,
      // RawEnvelope) rely on per-field partial results: with this off, one
      // mistyped field nulls the WHOLE parsed struct and every sibling
      // field's verdict flips with it. True is the Spark 4 default —
      // pinned so a cluster-level override can't change semantics. (The
      // gate resolver itself no longer parses with from_json; it reads a
      // VARIANT.)
      .config("spark.sql.json.enablePartialResults", "true")

  /** Local session for tests and ad-hoc runs. */
  def local(cores: Int = 4): SparkSession = {
    val s = tune(SparkSession.builder().master(s"local[$cores]"), cores)
      .appName("graft")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
