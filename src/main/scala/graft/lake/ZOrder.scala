package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping — the
  * lake-layout optimization that makes file-level min/max pruning work
  * when queries filter on TWO columns at once. A single-key sort clusters
  * one dimension and scatters the other; interleaving the bits of both
  * keys gives every file a bounded 2-D extent, so a (key₁ range ∧ key₂
  * range) predicate prunes on both axes. This is how Delta/Iceberg
  * OPTIMIZE ZORDER lays out 100 TB facts; here it is a first-class
  * engine operator: a writer that range-partitions by z-value, and an
  * oracle-graded layout audit (q148) that MEASURES the pruning win
  * instead of asserting it.
  *
  * Everything is exact integer arithmetic: both dimensions normalize to
  * [[ZBits]]-bit grid coordinates with floor division against the
  * observed min/max, and the z-value is a sum of literal power-of-two
  * terms — bit-identical cross-engine, no floats anywhere.
  */
object ZOrder {

  /** Grid resolution per dimension (16 bits → 32-bit z-values). */
  val ZBits = 16

  /** Chunks-per-layout granularity for [[layoutAudit]]: the top
    * [[ChunkBitsPerDim]] bits of each dimension define the chunk grid
    * (2^(2·bits) z-cells), standing in for "files" — a SPACE-partitioned
    * chunking, so the audit needs no global row_number: chunk assignment
    * is a per-row expression and the stats are one aggregation.
    */
  val ChunkBitsPerDim = 5

  /** Probe workload size for [[layoutAudit]] — deterministic 2-D range
    * predicates derived from the observed min/max.
    */
  val AuditProbes = 32

  /** Normalize `c` (long) from [lo, hi] onto the [0, 2^ZBits) grid with
    * exact floor arithmetic (`DIV`, never float division — a double
    * quotient loses bits once keys approach 2^53/2^16); `span1` must be
    * `hi - lo + 1`.
    */
  def gridCoord(c: Column, lo: Column, span1: Column): Column =
    call_function("div", (c - lo) * ((1L << ZBits) - 1), span1)

  /** Morton interleave of two [[ZBits]]-bit grid coordinates: bit i of
    * `x` lands at position 2i, bit i of `y` at 2i+1. Built as a sum of
    * literal-constant terms so both engines evaluate the identical
    * integer expression.
    */
  def zValue(x: Column, y: Column): Column =
    (0 until ZBits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** The same interleave as DuckDB SQL over columns named `nx`/`ny` —
    * one definition of the term constants feeds both engines.
    */
  def zValueSql(nx: String, ny: String): String =
    (0 until ZBits).map { i =>
      s"((($nx >> $i) & 1) * ${1L << (2 * i)} + " +
        s"(($ny >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString(" + ")

  /** Write `df` z-clustered on two long-valued expressions: range
    * partition by z-value (each output file covers a contiguous z range
    * = a bounded 2-D cell), sort within partitions so row groups inherit
    * the clustering. The shuffle is a range exchange — the same price a
    * single-key sorted write pays, buying pruning on BOTH dimensions.
    */
  def zorderWrite(df: DataFrame, xCol: Column, yCol: Column, path: String,
      partitions: Int): Unit = {
    val b = df.agg(
      min(xCol).as("xlo"), max(xCol).as("xhi"),
      min(yCol).as("ylo"), max(yCol).as("yhi")).head()
    val (xlo, xhi, ylo, yhi) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val z = zValue(
      gridCoord(xCol, lit(xlo), lit(xhi - xlo + 1)),
      gridCoord(yCol, lit(ylo), lit(yhi - ylo + 1)))
    df.withColumn("__z", z)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Z-order layout audit (q148) — MEASURES the data-skipping win of
    * z-clustering against the two layouts a warehouse actually has:
    * insertion order (`natural`, chunked by orderkey ranges — time-of-
    * arrival files) and a single-key sort (`bykey`, chunked by custkey
    * ranges). All three layouts are chunked into the SAME number of
    * space-partitioned cells — 2^(2·[[ChunkBitsPerDim]]): the z layout
    * by the top bit-pairs of the z-value (exactly the cells a range-
    * partitioned z-write produces; see [[zorderWrite]]), the single-key
    * layouts by equally many top bits of their one key — so chunk
    * counts are comparable (equal "file" counts; a finer chunking would
    * win trivially) and NO global row-numbering is needed: chunk
    * assignment is a per-row expression, the stats are one aggregation,
    * and the audit runs at any scale as one scan + one keyed shuffle
    * over a metadata-sized chunk relation.
    *
    * The probe workload is [[AuditProbes]] deterministic 2-D range
    * predicates (a custkey slice ∧ a 30-day date window, both derived
    * from the observed min/max). A chunk is "scanned" when its min/max
    * box overlaps the probe box — precisely the file-footer pruning
    * test a scan planner runs. Output per layout: occupied chunks,
    * chunk-probe pairs scanned, and the scan fraction in ppm; z-order
    * should sit 1–2 orders of magnitude under `natural`, and under
    * `bykey` whenever the probe constrains both dimensions.
    */
  def layoutAudit(spark: SparkSession, dir: String): DataFrame = {
    val orders = graft.sources.Tables.orders(spark, dir)
      .select(col("o_orderkey").as("ok"), col("o_custkey").as("ck"),
        call_function("div",
          col("o_orderdate").cast("timestamp").cast("long"),
          lit(86400L)).as("d"))
    val b = orders.agg(
      min(col("ok")).as("oklo"), max(col("ok")).as("okhi"),
      min(col("ck")).as("cklo"), max(col("ck")).as("ckhi"),
      min(col("d")).as("dlo"), max(col("d")).as("dhi"))
    val g = orders.crossJoin(broadcast(b))
      .withColumn("nok", gridCoord(col("ok"), col("oklo"),
        col("okhi") - col("oklo") + 1L))
      .withColumn("nx", gridCoord(col("ck"), col("cklo"),
        col("ckhi") - col("cklo") + 1L))
      .withColumn("ny", gridCoord(col("d"), col("dlo"),
        col("dhi") - col("dlo") + 1L))
    // equal chunk counts: single-key layouts take 2·ChunkBitsPerDim top
    // bits of their one key (2^10 = 1024 chunks), z takes ChunkBitsPerDim
    // top bits per dimension (32 × 32 = the same 1024 cells)
    val topShift = ZBits - 2 * ChunkBitsPerDim
    val zTopShift = 2 * ZBits - 2 * ChunkBitsPerDim
    val chunks = g
      .select(col("ck"), col("d"), explode(array(
        struct(lit("natural").as("layout"),
          shiftright(col("nok"), topShift).as("chunk")),
        struct(lit("bykey").as("layout"),
          shiftright(col("nx"), topShift).as("chunk")),
        struct(lit("zorder").as("layout"),
          shiftright(zValue(col("nx"), col("ny")), zTopShift).as("chunk"))))
        .as("lc"))
      .groupBy(col("lc.layout").as("layout"), col("lc.chunk").as("chunk"))
      .agg(min(col("ck")).as("ckmin"), max(col("ck")).as("ckmax"),
        min(col("d")).as("dmin"), max(col("d")).as("dmax"))
    val probes = spark.range(AuditProbes).crossJoin(broadcast(b))
      .select(
        (col("cklo") + call_function("div",
          col("id") * (col("ckhi") - col("cklo") + 1L), lit(AuditProbes.toLong)))
          .as("p_cklo"),
        (col("cklo") + call_function("div",
          (col("id") + 1L) * (col("ckhi") - col("cklo") + 1L),
          lit(AuditProbes.toLong)) - 1L).as("p_ckhi"),
        (col("dlo") + (col("id") * 97L) %
          greatest(col("dhi") - col("dlo") - 29L, lit(1L))).as("p_dlo"))
      .withColumn("p_dhi", col("p_dlo") + 29L)
    chunks.crossJoin(broadcast(probes))
      .groupBy(col("layout"))
      .agg(
        countDistinct(col("chunk")).as("n_chunks"),
        sum(when(col("ckmin") <= col("p_ckhi") && col("ckmax") >= col("p_cklo")
          && col("dmin") <= col("p_dhi") && col("dmax") >= col("p_dlo"), 1L)
          .otherwise(0L)).as("scanned"))
      .withColumn("scan_ppm", expr(
        s"scanned * 1000000 DIV (n_chunks * $AuditProbes)"))
  }

  /** Point-probe workload size for [[skipIndexAudit]]. */
  val PointProbes = 32

  /** Skip-index audit (q150) — the POINT-LOOKUP sibling of the q148
    * range audit: for an equality predicate on an UNCLUSTERED key,
    * min/max footer stats barely prune (a few hundred random keys per
    * file span nearly the whole domain), while exact per-file key
    * membership — what a Parquet dictionary page or bloom filter gives
    * the planner — skips every file that lacks the key. This audit
    * measures both against the same arrival-order chunking (the q148
    * `natural` layout) and a [[PointProbes]]-point deterministic probe
    * workload, reporting chunk AND row scan fractions per method.
    *
    * Distributed shape: chunk stats are one aggregation; the membership
    * relation is distinct (chunk, key) — the true cardinality of the
    * dictionary metadata a lake actually stores — and probes attach by
    * key equi-join (never a scan of the fact). Metadata-scale at any
    * corpus size.
    */
  def skipIndexAudit(spark: SparkSession, dir: String): DataFrame = {
    val orders = graft.sources.Tables.orders(spark, dir)
      .select(col("o_orderkey").as("ok"), col("o_custkey").as("ck"))
    val b = orders.agg(
      min(col("ok")).as("oklo"), max(col("ok")).as("okhi"),
      min(col("ck")).as("cklo"), max(col("ck")).as("ckhi"))
    val topShift = ZBits - 2 * ChunkBitsPerDim
    val chunked = orders.crossJoin(broadcast(b))
      .withColumn("chunk", shiftright(gridCoord(col("ok"), col("oklo"),
        col("okhi") - col("oklo") + 1L), topShift))
    val stats = chunked.groupBy(col("chunk"))
      .agg(min(col("ck")).as("ckmin"), max(col("ck")).as("ckmax"),
        count(lit(1)).as("n_rows"))
    val members = chunked.select(col("chunk"), col("ck")).distinct()
    val probes = spark.range(PointProbes).crossJoin(broadcast(b))
      .select(col("id").as("probe"),
        (col("cklo") + (col("id") * 977L) %
          (col("ckhi") - col("cklo") + 1L)).as("pck"))
    val totals = stats.agg(
      count(lit(1)).as("all_chunks"), sum(col("n_rows")).as("all_rows"))
    val minmax = stats.crossJoin(broadcast(probes))
      .filter(col("ckmin") <= col("pck") && col("pck") <= col("ckmax"))
      .agg(count(lit(1)).as("scanned_chunks"),
        coalesce(sum(col("n_rows")), lit(0L)).as("scanned_rows"))
      .select(lit("minmax").as("method"), col("scanned_chunks"),
        col("scanned_rows"))
    val dict = members
      .join(broadcast(probes), col("ck") === col("pck"))
      .select(col("probe"), col("chunk")).distinct()
      .join(stats, Seq("chunk"))
      .agg(count(lit(1)).as("scanned_chunks"),
        coalesce(sum(col("n_rows")), lit(0L)).as("scanned_rows"))
      .select(lit("dictionary").as("method"), col("scanned_chunks"),
        col("scanned_rows"))
    minmax.unionAll(dict)
      .crossJoin(broadcast(totals))
      // DECIMAL-widened ppm: scanned_rows·10⁶ summed over the probe set
      // overflows BIGINT past ~3e11 rows
      .select(col("method"), col("scanned_chunks"), col("scanned_rows"),
        expr("CAST(CAST(scanned_chunks AS DECIMAL(38,0)) * 1000000 DIV " +
          s"(all_chunks * $PointProbes) AS BIGINT)").as("chunk_ppm"),
        expr("CAST(CAST(scanned_rows AS DECIMAL(38,0)) * 1000000 DIV " +
          s"(all_rows * $PointProbes) AS BIGINT)").as("row_ppm"))
  }

  /** Per-file min/max extent report for a written table: the footer
    * stats a scan planner would prune on, reconstructed via
    * `input_file_name`. Used by the spec to prove z-written files have
    * bounded extent in BOTH dimensions.
    */
  def fileExtents(spark: SparkSession, path: String,
      xCol: Column, yCol: Column): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(xCol).as("xmin"), max(xCol).as("xmax"),
        min(yCol).as("ymin"), max(yCol).as("ymax"),
        count(lit(1)).as("n_rows"))
}
