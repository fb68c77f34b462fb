package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× corpus builder for the SUITE-level scale validation (round-11
  * VERDICT directive 1): replicate every sf0.1 table `factor`× with
  * per-replica key offsets, producing an "sf1-shaped" star schema at
  * `<dstDir>` — 6M lineitem / 1.5M orders / 1M events / 150k customers
  * — without regenerating the driver's corpus (TESTDATA.md forbids
  * touching /root/testdata; this writes under target/, gitignored).
  *
  * Scaling model mirrors TPC-H's: entity tables (customer, orders,
  * lineitem, part, supplier) grow 10× with DISJOINT key spaces per
  * replica (clean decimal offsets), so join fan-outs and per-key group
  * sizes stay constant while key cardinality and data volume grow
  * linearly; dimension tables (nation, region) and the date range stay
  * fixed, so per-nation / per-day group sizes grow 10× — exactly the
  * stress the no-global-window / two-phase-device designs claim to
  * absorb.
  *
  * Name-carrying entity columns (c_name, s_name, p_name) get a "~i"
  * replica suffix for i>0: the entity-resolution family (blocked ER,
  * sorted neighborhood, Jaro-Winkler) blocks on name-derived keys, so
  * identical names across replicas would inflate block OCCUPANCY 10×
  * (pairs ×100 — a duplicate-explosion regime, not a data-growth
  * regime; measured 33× on q150 before this fix, and q162's brand
  * blocks blew past the maxBlock guard entirely). With the suffix,
  * block COUNT grows 10× at constant occupancy — the scaling claim
  * under test. p_brand gets the suffix as well: it serves as an ER
  * blocking key on its own (q162, 25 distinct values), and Jaro-
  * Winkler at τ=0.90 still matches "name~1"↔"name~2" (the suffix is
  * a 1-char edit on a 30-char string), so fixed brands would both
  * trip the maxBlock guard (Spark → 0 rows) AND quadratically
  * explode the oracle (measured 17.5M pairs) — a duplicate-explosion
  * regime again, not data growth. None of the sf1-validated queries
  * aggregate by brand, so the deviation from TPC-H's fixed-dimension
  * model is confined to the blocking-key role.
  *
  * Two tables need more than key offsets, because naive replication
  * would create a 90%-duplicate corpus (every doc 10 exact copies —
  * a DIFFERENT regime than "10× more data at the same dup rate"):
  *  - documents: replica i>0 suffixes every TOKEN with "~i". Within a
  *    replica the dup/near-dup structure is byte-identical to sf0.1;
  *    across replicas no shingle survives, so exact/near-dup RATE is
  *    preserved while vocabulary grows Heaps-style.
  *  - embeddings: replica i>0 adds a deterministic per-(vec,dim,rep)
  *    jitter of ±5e-4 — far below cluster separation (labels keep
  *    their geometry) but enough that cross-replica pairs are not
  *    exact duplicates.
  *
  * Usage: runMain graft.ScaleUp <srcDir> <dstDir> [factor=10]
  */
object ScaleUp {

  /** replica-join: one input row → `factor` rows tagged 0..factor-1 */
  private def reps(spark: SparkSession, df: DataFrame, factor: Int): DataFrame =
    df.crossJoin(broadcast(
      spark.range(factor).select(col("id").cast("long").as("__rep"))))

  private def offs(c: String, step: Long): org.apache.spark.sql.Column =
    (col(c) + col("__rep") * step).as(c)

  /** replica-distinct entity name: "name~i" for replicas > 0 */
  private def nameSfx(c: String): org.apache.spark.sql.Column =
    when(col("__rep") === 0, col(c))
      .otherwise(concat(col(c), lit("~"), col("__rep"))).as(c)

  def main(args: Array[String]): Unit = {
    val src = args(0); val dst = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def rd(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def wr(df: DataFrame, t: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$dst/$t.parquet")

    // dimension tables: fixed, copied as-is (TPC-H keeps them constant)
    wr(rd("region"), "region", 1)
    wr(rd("nation"), "nation", 1)

    // clean decimal key offsets, all safely above the sf0.1 max keys
    val C = 1000000L   // custkey
    val O = 10000000L  // orderkey
    val P = 1000000L   // partkey
    val S = 100000L    // suppkey
    val E = 10000000L  // event_id
    val U = 1000000L   // user_id
    val D = 1000000L   // doc_id
    val V = 1000000L   // vec_id

    wr(reps(spark, rd("customer"), factor)
      .select(offs("c_custkey", C), nameSfx("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment")), "customer", 4)
    wr(reps(spark, rd("supplier"), factor)
      .select(offs("s_suppkey", S), nameSfx("s_name"), col("s_nationkey"),
        col("s_acctbal")), "supplier", 1)
    wr(reps(spark, rd("part"), factor)
      .select(offs("p_partkey", P), nameSfx("p_name"), nameSfx("p_brand"),
        col("p_type"), col("p_size"), col("p_retailprice")), "part", 4)
    wr(reps(spark, rd("orders"), factor)
      .select(offs("o_orderkey", O), offs("o_custkey", C),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority")), "orders", 8)
    wr(reps(spark, rd("lineitem"), factor)
      .select(offs("l_orderkey", O), offs("l_partkey", P),
        offs("l_suppkey", S), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"),
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate")),
      "lineitem", 32)
    wr(reps(spark, rd("events"), factor)
      .select(offs("event_id", E), col("ts"), offs("user_id", U),
        col("event_type"), col("value"), col("props")), "events", 8)

    // documents: token-suffix perturbation for replicas > 0 (see scaladoc)
    wr(reps(spark, rd("documents"), factor)
      .select(offs("doc_id", D),
        when(col("__rep") === 0, col("text")).otherwise(
          array_join(transform(split(col("text"), " "),
            w => concat(w, lit("~"), col("__rep"))), " ")).as("text"),
        col("lang"), col("source"), col("n_chars")), "documents", 4)

    // embeddings: deterministic ±5e-4 jitter for replicas > 0
    wr(reps(spark, rd("embeddings"), factor)
      .select(offs("vec_id", V),
        when(col("__rep") === 0, col("embedding")).otherwise(
          transform(col("embedding"), (x, d) =>
            (x + (pmod(col("vec_id") * 31 + d * 131 + col("__rep") * 17,
              lit(1000)).cast("double") / lit(1e6) - lit(5e-4))
              .cast("float")).cast("float"))).as("embedding"),
        col("label")), "embeddings", 2)

    println(s"[scaleup] wrote ${factor}x of $src to $dst")
    spark.stop()
  }
}
