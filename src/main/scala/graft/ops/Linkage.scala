package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Blocked entity resolution (record linkage): find pairs of records
  * that likely describe the same real-world entity — duplicate product
  * listings, near-identical customer rows — without the O(N²) all-pairs
  * comparison. The classic two-stage shape (Fellegi–Sunter matching
  * over blocking keys; see also the sorted-neighborhood method of
  * Hernández & Stolfo, SIGMOD '95):
  *
  *   1. BLOCK: records are grouped by a cheap deterministic key
  *      (normalized name token, phonetic code, brand × category…);
  *      only records sharing a block key are ever compared.
  *   2. MATCH: within each block, pairwise edit-distance (Levenshtein)
  *      with an `a < b` guard; pairs at or under `maxDistance` are
  *      candidate matches.
  *
  * Scale shape: the corpus crosses ONE hash shuffle (on the block
  * key); pair generation is a per-block double-explode bounded by
  * `maxBlock` (the same fail-fast skew guard as
  * [[Dedup.minhashCandidates]]'s bucket cap — an over-shared key like
  * a missing-name sentinel would otherwise generate a quadratic
  * bucket). Levenshtein runs inside whole-stage codegen (Spark
  * builtin). At 100 TB the right blocking key keeps blocks in the
  * hundreds, so the comparison cost is Σ|block|² ≪ N²; raise key
  * selectivity (compound keys) before raising `maxBlock`, the same
  * rule the winnowing/LSH rehearsals measured (SCALE.md).
  */
object Linkage {

  /** Builds the per-block record lists (the ONE shuffle of the
    * blocked-ER family) and applies the `maxBlock` skew guard. When
    * `audit` is supplied, the drop is OBSERVED on the same pass via
    * `Dataset.observe` — zero extra scans, the metrics ride the
    * query's own execution: `n_blocks` (comparable blocks, size ≥ 2),
    * `dropped_blocks` and `dropped_rows` (over-cap). At 100 TB this
    * is the auditability the silent filter lacked: a run reports HOW
    * MUCH the recall trade cut, per execution, from the driver's
    * `Observation.get` after any action on the result.
    *
    * CAVEAT (found by the round-12 sf0.1 bench): when the guarded
    * result is EMPTY — every block over-cap — AQE's empty-relation
    * propagation replaces the subtree in the final adaptive plan and
    * the `CollectMetrics` node vanishes from it, so `Observation.get`
    * returns an EMPTY map (the stage actually ran; the metrics are
    * lost at reporting time). Exactly the run whose audit matters
    * most. Callers that must survive the all-dropped case should use
    * [[blockAudit]] (one block-table-sized aggregate — cheaper than
    * this device's collect_list) instead of, or as a fallback to,
    * the observation.
    */
  private def guardedBlocks(
      keyed: DataFrame,
      maxBlock: Int,
      audit: Option[Observation]): DataFrame = {
    val blocks0 = keyed.groupBy("__blk")
      .agg(collect_list("__rec").as("recs"))
    val sz = size(col("recs"))
    val observed = audit match {
      case Some(obs) => blocks0.observe(obs,
        sum(when(sz >= 2 && sz <= maxBlock, 1L).otherwise(0L))
          .as("n_blocks"),
        sum(when(sz > maxBlock, 1L).otherwise(0L)).as("dropped_blocks"),
        sum(when(sz > maxBlock, sz.cast("long")).otherwise(0L))
          .as("dropped_rows"))
      case None => blocks0
    }
    observed.filter(size(col("recs")).between(2, maxBlock))
      // r18: pin the pair-expansion stage's parallelism. The block
      // relation is tiny in BYTES, so AQE's size-based coalescing runs
      // the downstream |block|²-row explode + comparator on ~1 task —
      // the explode multiplies AFTER the exchange, which size
      // estimates cannot see. Round-robin at the session's shuffle
      // setting (env-parameterized, not a local constant): a keyed
      // repartition on __blk would be elided (same partitioning as the
      // aggregate exchange) and then coalesced; the explicit
      // round-robin spreads whole blocks (comparisons stay
      // block-local, `maxBlock`-bounded) and survives both.
      .repartition(
        keyed.sparkSession.sessionState.conf.numShufflePartitions)
  }

  /** The audit counters of [[blockedPairs]]'s skew guard as a 1-row
    * DataFrame `(n_blocks, dropped_blocks, dropped_rows)` — computed
    * by a direct aggregate over per-block COUNTS (no collect_list, no
    * listener), so it is immune to the AQE empty-relation caveat on
    * [[guardedBlocks]]'s observation and works when EVERY block is
    * over-cap. One shuffle of (key, count) partials; the aggregate
    * input is block-table-sized.
    */
  def blockAudit(
      df: DataFrame,
      idCol: String,
      blockKey: Column,
      maxBlock: Int): DataFrame = {
    require(maxBlock >= 2, s"maxBlock must be >= 2, got $maxBlock")
    df.select(blockKey.as("__blk"))
      .groupBy("__blk").agg(count(lit(1)).as("__n"))
      .agg(
        sum(when(col("__n") >= 2 && col("__n") <= maxBlock, 1L)
          .otherwise(0L)).as("n_blocks"),
        sum(when(col("__n") > maxBlock, 1L).otherwise(0L))
          .as("dropped_blocks"),
        sum(when(col("__n") > maxBlock, col("__n")).otherwise(0L))
          .as("dropped_rows"))
  }

  /** Candidate duplicate pairs within blocks, at or under
    * `maxDistance` Levenshtein on `nameCol`. Output:
    * `(id_a, id_b, name_a, name_b, distance)` with `id_a < id_b`.
    * Blocks larger than `maxBlock` are dropped (skew guard —
    * documented, deliberate recall trade; the block key is the knob).
    * Pass an [[org.apache.spark.sql.Observation]] as `audit` to get
    * the dropped-blocks/dropped-rows counts of a run (see
    * [[guardedBlocks]]) — the cut is never silent when audited.
    */
  def blockedPairs(
      df: DataFrame,
      idCol: String,
      nameCol: String,
      blockKey: Column,
      maxDistance: Int,
      maxBlock: Int = 1000,
      audit: Option[Observation] = None): DataFrame = {
    require(maxDistance >= 0, s"maxDistance must be >= 0, got $maxDistance")
    require(maxBlock >= 2, s"maxBlock must be >= 2, got $maxBlock")
    val keyed = df.select(blockKey.as("__blk"),
      struct(col(idCol).as("id"), col(nameCol).as("name")).as("__rec"))
    // one shuffle: block key → bucket; sizes bounded by the guard
    val blocks = guardedBlocks(keyed, maxBlock, audit)
    blocks
      .select(explode(col("recs")).as("a"), col("recs"))
      .select(col("a"), explode(col("recs")).as("b"))
      .filter(col("a.id") < col("b.id"))
      // r18: the THRESHOLD levenshtein (banded DP, O(len·maxDistance)
      // instead of O(len²); returns -1 past the bound — exact below
      // it, so kept rows are byte-identical) behind the EvalOnce
      // fence: without the fence the pushed filter re-evaluated the
      // full distance per pair (2× Levenshtein per candidate — the
      // q150 plan showed the expression in Filter AND Project)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.name").as("name_a"), col("b.name").as("name_b"),
        graft.ops.TextOps.once(levenshtein(col("a.name"), col("b.name"),
          maxDistance).cast("long")).as("distance"))
      .filter(col("distance").between(0L, maxDistance.toLong))
      // the same (a, b) can share several block keys (compound
      // blocking) — report each pair once with its one distance
      .distinct()
  }

  /** Sorted-neighborhood candidate pairs (Hernández & Stolfo): sort
    * the corpus by a fuzzy key and compare each record only with its
    * `window` successors in the global order. The ER path when no
    * equality blocking key exists — a typo'd name lands NEXT TO its
    * clean form in sort order even though no exact key matches it.
    *
    * Output: `(id_a, id_b, name_a, name_b, distance)` where b follows
    * a within `window` positions and Levenshtein ≤ `maxDistance`.
    *
    * Scale shape: the global rank rides [[Rank.stratifiedRank]]'s
    * two-phase device (one range shuffle, partition-local scan — a
    * naive `Window.orderBy` would drag the corpus into ONE task);
    * pairing shuffles the slim (id, name, rank) rows once on
    * `floor(rank / window)` buckets — the left side duplicates into
    * its own and the NEXT bucket, so every ≤-window pair meets in
    * exactly one bucket and bucket population is ≤ 2·window. Total:
    * two slim shuffles, comparisons N·window, no quadratic block risk
    * regardless of key skew (the advantage over [[blockedPairs]]).
    */
  def sortedNeighborhoodPairs(
      df: DataFrame,
      idCol: String,
      nameCol: String,
      sortKey: Column,
      window: Int,
      maxDistance: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(maxDistance >= 0, s"maxDistance must be >= 0, got $maxDistance")
    val keyed = df.select(col(idCol).as("id"), col(nameCol).as("name"),
      sortKey.as("__sk"), lit(1).as("__all"))
    val ranked = Rank.stratifiedRank(keyed, "__all", Seq("__sk", "id"))
      .select(col("id"), col("name"), col("rk"))
    val bucket = floor((col("rk") - 1) / window)
    val right = ranked.select(bucket.as("__b"), col("id").as("id_b"),
      col("name").as("name_b"), col("rk").as("rk_b"))
    val left = ranked
      .select(explode(array(bucket, bucket + 1)).as("__b"),
        col("id").as("id_a"), col("name").as("name_a"), col("rk").as("rk_a"))
    left.join(right, "__b")
      .filter((col("rk_b") - col("rk_a")).between(1, window))
      // r18: threshold levenshtein behind the EvalOnce fence — same
      // double-evaluation + banded-DP reasoning as [[blockedPairs]]
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        graft.ops.TextOps.once(levenshtein(col("name_a"), col("name_b"),
          maxDistance).cast("long")).as("distance"))
      .filter(col("distance").between(0L, maxDistance.toLong))
  }

  /** [[blockedPairs]] with Jaro–Winkler scoring instead of edit
    * distance: `(id_a, id_b, name_a, name_b, similarity)` for
    * same-block pairs at or above `minSimilarity`. Jaro–Winkler is
    * the Fellegi–Sunter tradition's name comparator — insensitive to
    * length (a 2-edit typo in a short name is a weak Levenshtein
    * match but a strong JW one) and prefix-weighted, which fits
    * person/product names where the head tokens carry the identity.
    *
    * Same scale shape (and the same optional `audit` Observation for
    * dropped-block counts) as [[blockedPairs]]: one block-key
    * shuffle, per-block explode under the `maxBlock` skew guard; the
    * scorer is
    * the compiled `graft_jaro_winkler` kernel (TextKernels, codegen'd,
    * DuckDB-bit-parity for ASCII), so the match stage stays inside
    * whole-stage codegen. Requires `GraftFunctions.registerAll` (or
    * the `GraftExtensions` session extension).
    */
  def jaroWinklerPairs(
      df: DataFrame,
      idCol: String,
      nameCol: String,
      blockKey: Column,
      minSimilarity: Double,
      maxBlock: Int = 1000,
      audit: Option[Observation] = None): DataFrame = {
    require(minSimilarity >= 0.0 && minSimilarity <= 1.0,
      s"minSimilarity must be in [0,1], got $minSimilarity")
    require(maxBlock >= 2, s"maxBlock must be >= 2, got $maxBlock")
    val keyed = df.select(blockKey.as("__blk"),
      struct(col(idCol).as("id"), col(nameCol).as("name")).as("__rec"))
    val blocks = guardedBlocks(keyed, maxBlock, audit)
    blocks
      .select(explode(col("recs")).as("a"), col("recs"))
      .select(col("a"), explode(col("recs")).as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.name").as("name_a"), col("b.name").as("name_b"),
        // r18: EvalOnce fence — the pushed filter otherwise
        // re-evaluates the kernel per pair (the q150 levenshtein
        // finding, same mechanism)
        graft.ops.TextOps.once(call_function("graft_jaro_winkler",
          col("a.name"), col("b.name"))).as("similarity"))
      .filter(col("similarity") >= minSimilarity)
      .distinct()
  }
}
