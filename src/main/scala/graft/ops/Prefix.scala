package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Deterministic ordered bucketing — the partitioning half of the
  * two-phase distributed prefix sum shared by [[Pack.tokenOffsets]],
  * [[Rank.stratifiedRank]] and [[Rank.stratifiedPrefixSum]].
  *
  * == Why not repartitionByRange ==
  *
  * Every consumer of the device joins the bucketed rows back to an
  * aggregate DERIVED from them, keyed by the bucket — so both sides
  * must agree on every row's bucket. Through round 10 the bucket was
  * the PHYSICAL partition id of a `repartitionByRange`, and agreement
  * was delegated to `ReuseExchange` — best-effort, and it silently
  * failed over cached upstreams: each branch re-sampled range
  * boundaries over a nondeterministically-ordered child and the
  * `__pid` join mismatched (round 11, wrong run-to-run-varying
  * Spearman rank sums). Round 11 pinned ONE physical execution via
  * `localCheckpoint` — correct, but it truncated lineage (a lost
  * block failed the query instead of retrying — the round-11 ADVICE
  * fault-tolerance item) and paid a corpus-sized materialize+read
  * (q195 +0.5 s).
  *
  * == Value pinning ==
  *
  * Round 12 pins the VALUE, not the execution: boundaries are sampled
  * once at operator-build time and frozen into the plan as LITERALS,
  * and the bucket becomes a data column `__bkt = f(row values)` — a
  * pure deterministic function. Consequences, in order of importance:
  *
  *  - correctness no longer depends on physical execution AT ALL: any
  *    re-execution, cache eviction, AQE coalescing, or failed
  *    ReuseExchange reproduces identical buckets, because the
  *    boundaries are plan constants;
  *  - lineage stays intact — lost tasks retry normally (closes the
  *    round-11 fault-tolerance ADVICE item; the
  *    `useReliableCheckpoint` hatch is gone because nothing needs
  *    pinning anymore);
  *  - the corpus-sized checkpoint write+read disappears; the only new
  *    cost is one narrow key-column sample scan at build time (what
  *    `RangePartitioner` does internally anyway);
  *  - the partition-local scan can be a DECLARATIVE window again:
  *    `Window.partitionBy(__bkt, stratum)` over a child hash-
  *    partitioned on `__bkt` needs no second exchange (hash on a
  *    subset of the clustering keys satisfies ClusteredDistribution),
  *    so the round-7 "window re-exchanges the corpus" trap does not
  *    reapply, and the scan is codegen'd instead of an interpreted
  *    Row mapPartitions.
  *
  * == Determinism of the sample ==
  *
  * The sample itself is order-independent — rows are taken by
  * smallest `xxhash64(key)` (ties broken by the key), a pure function
  * of the key MULTISET, so even the frozen literals are reproducible
  * across runs and cached/uncached inputs. (Single-query correctness
  * only needs the literals to be frozen; multiset-determinism makes
  * plans and EXPLAIN output reproducible too.)
  *
  * == Ordering semantics ==
  *
  * Bucket assignment ([[graft.functions.BucketSearch]]) binary-
  * searches the frozen boundaries under Spark's natural ascending
  * row order — the same TOTAL ORDER the sort uses (nulls first, NaN
  * last) — so the bucket function is monotone in the window's sort
  * order by construction, including null and NaN keys. The kernel's
  * generated code is one call whatever the boundary count (a
  * when-tree of struct-literal comparisons measured ~0.7 s of Janino
  * compile per fresh plan at 128 buckets, and cluster-scale bucket
  * counts would be worse).
  *
  * == Skew ==
  *
  * Boundaries are equal-frequency quantiles of the hash-uniform
  * sample (RangePartitioner quality). `buckets = 4×partitions` keeps
  * the hash placement of buckets onto partitions balanced (with 1:1
  * balls-in-bins ~37% of partitions would sit empty); a hot key
  * collapses adjacent equal boundaries into one bucket, exactly like
  * range partitioning, and AQE is free to split or coalesce because
  * placement no longer carries meaning.
  */
private[graft] object Prefix {

  /** Adds `__bkt` (int, monotone in the total order of `keys`) — a
    * pure column addition, NO shuffle: callers repartition the row
    * side on `__bkt` themselves and aggregate the side table off the
    * UNSHUFFLED frame, so the side's per-(bucket, stratum) partials
    * combine map-side and only B×S rows cross the wire (deriving the
    * side from the repartitioned frame would force a second
    * corpus-cardinality exchange — column pruning makes the two
    * exchanges non-identical, so ReuseExchange cannot dedupe them).
    * Boundaries are computed EAGERLY (one sample job over the key
    * columns) and frozen as literals; `parts` sizes the sample
    * (128 rows per target partition).
    */
  /** Completeness window of the boundary sample. A sample that comes
    * back with fewer rows than its limit IS the whole key table, so
    * the device can skip the distributed machinery entirely
    * ([[Complete]]); the limit is at least this constant so the fast
    * path covers the overhead-dominated small-table regime even at
    * low parallelism. Driver memory exposure is the sample the
    * device already collects today — a bounded top-K of slim key
    * structs (the same order of magnitude RangePartitioner collects).
    */
  val SmallComplete: Int = 1 << 16

  /** The two shapes the device comes in, decided by ONE sample job:
    *  - [[Complete]]: the sample was the whole table — rank /
    *    stratum size / prefix sums are pure map-side lookups against
    *    the frozen [[graft.functions.KeyTable]]; no repartition, no
    *    window, no side-table join (the small-N fast path — measured
    *    >2 s of pure per-stage fixed cost in the q189 RFM cascade of
    *    three devices over a 1 500-row table, round 12);
    *  - [[Buckets]]: the frame with the frozen-literal `__bkt`
    *    column — the scale path, identical to round 12.
    * Falls back to [[Buckets]] when the complete sample contains a
    * duplicate full key (tied rows are only defined through the
    * window's arbitrary-but-consistent numbering).
    */
  sealed trait Device
  final case class Complete(model: graft.functions.KeyTable) extends Device
  final case class Buckets(withBkt: DataFrame) extends Device

  /** Runs the ONE order-independent sample job (smallest xxhash64,
    * ties by key) and returns the device. `stratumFields` = number of
    * leading key fields forming the stratum; `valCol` (cast to long)
    * is collected alongside the keys when the caller needs prefix
    * sums from a [[Complete]] model. `allowComplete = false` forces
    * the bucketed shape (callers that need `__bkt` itself).
    */
  def device(
      df: DataFrame,
      keys: Seq[Column],
      parts: Int,
      stratumFields: Int,
      valCol: Option[Column] = None,
      allowComplete: Boolean = true): Device = {
    require(keys.nonEmpty, "device needs at least one key column")
    val nBuckets = 4 * parts
    val k = struct(keys: _*)
    val lim = math.max(32 * nBuckets, SmallComplete) + 1
    val keyed = valCol match {
      case Some(v) => df.select(k.as("__k"), v.cast("long").as("__v"))
      case None => df.select(k.as("__k"))
    }
    val kType = keyed.schema.head.dataType.asInstanceOf[StructType]
    val fieldTypes = kType.fields.map(_.dataType)
    // order-independent sample: smallest hashes, ties broken by key
    val sample = keyed
      .orderBy(xxhash64(col("__k")), col("__k"))
      .limit(lim)
      .orderBy(col("__k"))
      .collect()
    val m = sample.length
    val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToCatalystConverter(kType)
    def toInternal(r: org.apache.spark.sql.Row)
        : org.apache.spark.sql.catalyst.InternalRow =
      conv(r).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow].copy()
    val completeModel =
      if (allowComplete && m < lim) {
        val sortedKeys = sample.map(r => toInternal(r.getStruct(0)))
        val vals: Array[java.lang.Long] =
          if (valCol.isDefined)
            sample.map(r => if (r.isNullAt(1)) null
              else java.lang.Long.valueOf(r.getLong(1)))
          else Array.empty
        graft.functions.KeyTable.build(
          sortedKeys, fieldTypes, stratumFields, vals)
      } else None
    completeModel match {
      case Some(model) => Complete(model)
      case None =>
        val bounds = (1 until nBuckets)
          .map(i => sample((i.toLong * m / nBuckets).toInt).getStruct(0))
          .distinct // adjacent equal quantiles → one bucket (hot keys)
          .map(toInternal)
          .toArray
        // constant-size codegen regardless of bucket count: a
        // when-tree of struct-literal comparisons pays Janino ~0.7 s
        // per fresh plan at 128 buckets (measured — the q195 round-12
        // regression) and grows with the bucket count; the kernel is
        // one generated call
        if (m == 0 || bounds.isEmpty) Buckets(df.withColumn("__bkt", lit(0)))
        else {
          val model = new graft.functions.BucketBounds(bounds, fieldTypes)
          Buckets(df.withColumn("__bkt",
            org.apache.spark.sql.graft.ColumnBridge.column(
              graft.functions.BucketSearch(
                org.apache.spark.sql.graft.ColumnBridge.expression(k),
                model))))
        }
    }
  }

  /** The lookup column for a [[Complete]] model: mode 0 = rank,
    * 1 = stratum size, 2 = exclusive prefix (see
    * [[graft.functions.KeyTableLookup]]). */
  def lookup(keys: Seq[Column], model: graft.functions.KeyTable,
      mode: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.KeyTableLookup(
        org.apache.spark.sql.graft.ColumnBridge.expression(
          struct(keys: _*)), model, mode))

  def bucketed(df: DataFrame, keys: Seq[Column], parts: Int): DataFrame =
    device(df, keys, parts, keys.length, None, allowComplete = false) match {
      case Buckets(withBkt) => withBkt
      case Complete(_) =>
        throw new IllegalStateException("unreachable: allowComplete=false")
    }
}
