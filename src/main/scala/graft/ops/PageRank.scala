package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative link analysis (PageRank, Page et al. 1999) over an edge table —
  * the graph-centrality capability a training-data pipeline uses to rank
  * interlinked sources (domain graphs, citation graphs, dedup-cluster
  * containment graphs).
  *
  * All arithmetic is SCALED 64-BIT INTEGER (ranks in units of 1e-12):
  * per-edge contribution is `rank div out_degree` (floor) and the damping
  * update is `(15·base + 85·Σcontrib) div 100` — exact integer ops with a
  * defined floor in both Spark (`div`) and DuckDB (`//`), so a fixed
  * iteration count is bit-reproducible cross-engine with NO float summation
  * order concerns (the same reason [[graft.core.Det]] exists).
  *
  * Scale shape: each iteration is one hash join of the rank table onto the
  * edge table (both keyed by `src` — Catalyst reuses the exchange across
  * iterations) plus one `groupBy(dst)` sum with map-side partials; the rank
  * state is one narrow (node, rank) row per vertex, never materialized on
  * the driver. Plans are rebuilt FLAT from the previous iteration's
  * DataFrame; with a small fixed iteration count the lineage stays shallow
  * (the distributed connected-components loop in [[graft.llm.Dedup]] is the
  * template for unbounded iteration). Dangling nodes (no out-edges) leak
  * their mass by default — the standard simplification; pass
  * `redistributeDangling = true` for the textbook correction (each round the
  * dangling nodes' summed rank is split evenly across all nodes before
  * damping — Page et al. 1999 §2.1's rank-sink fix). Nodes with no IN-edges
  * are kept at the teleport floor via the left join against the node
  * table. */
object PageRank {

  /** Rank scale: 1.0 == 1e12 units. */
  val SCALE = 1000000000000L

  /** Below this node count the per-iteration rank and contribution tables
    * (one narrow (node, long) row each) are broadcast — an iteration then
    * costs ONE map-side-combined shuffle (the groupBy(dst) partials, ≤n
    * rows per partition) instead of three edge-table-sized exchanges.
    * 2M nodes ≈ 32 MB broadcast. Above the gate (web-scale graphs) the
    * loop falls back to keyed joins against the pre-partitioned edge
    * table. */
  val BroadcastMaxNodes = 2000000L

  /** `edges`: (src: long, dst: long) — pre-deduplicated directed edges.
    * Returns (node, rank_scaled) for every node appearing as src or dst.
    * `iters` fixed iterations of r ← 0.15/N + 0.85·Σ_{u→v} r_u/deg(u).
    *
    * `seeds` (a `node` column) switches to PERSONALIZED PageRank (Page
    * et al. 1999 §6 / Haveliwala 2002, "Topic-Sensitive PageRank"): the
    * teleport mass concentrates evenly on the seed set instead of all
    * nodes — rank becomes proximity-to-the-seeds, the curation tool for
    * "expand this trusted domain/author/doc set" source discovery. The
    * per-node teleport becomes a loop-invariant COLUMN (SCALE/|S| on
    * seeds, 0 elsewhere) folded into the node table once; ranks
    * initialize to that teleport distribution. Not combinable with
    * `redistributeDangling` (the dangling share would have to follow
    * the teleport vector, a different integer-rounding contract than
    * q187's uniform `div n` — kept separate so both oracles stay
    * exact). */
  def run(edges: DataFrame, iters: Int = 5,
          redistributeDangling: Boolean = false,
          seeds: DataFrame = null): DataFrame = {
    require(iters >= 1 && iters <= 50, "fixed small iteration count")
    require(!(redistributeDangling && seeds != null),
      "dangling redistribution and personalization are separate contracts")
    // Pin the loop-invariant tables once (every PageRank implementation
    // persists its edge list) and TRUNCATE THE RANK LINEAGE each round —
    // without it Catalyst replans the whole history per iteration and the
    // source scan count grows geometrically (the same reason the
    // distributed connected-components loop rebuilds flat plans). The
    // out-degree is folded into the edge table up front: it is as
    // loop-invariant as the edges themselves, and re-joining it every
    // iteration (the textbook formulation) pays an extra shuffle per
    // round for a value that never changes.
    val e0 = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint()
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node"))).distinct().localCheckpoint()
    // One bounded scalar: the node count feeds the teleport literal and
    // the broadcast gate.
    val n = nodes.count()
    val base = SCALE / n
    val small = n <= BroadcastMaxNodes
    def gated(df: DataFrame) = if (small) broadcast(df) else df
    // Under the broadcast gate the rank table rides in as a broadcast, so
    // the per-iteration contribution join never shuffles the edge table —
    // which makes the groupBy(dst) the loop's ONLY edge-sized exchange.
    // Pinning the degree-annotated edge table PRE-PARTITIONED ON dst
    // (localCheckpoint preserves outputPartitioning; pinned count, not
    // AQE-coalesced — the q203 trap) removes that exchange too: the loop
    // body then shuffles nothing edge-sized (the r15 HITS lesson). Above
    // the gate the join itself must exchange on src, so the copy
    // partitions by src instead and the agg exchange is the honest cost.
    val P = e0.sparkSession.sparkContext.defaultParallelism
    val e = {
      val withDeg = e0
        .join(e0.groupBy("src").agg(count(lit(1)).as("deg")), Seq("src"))
      (if (small) withDeg.repartition(P, col("dst"))
       else withDeg.repartition(P, col("src"))).localCheckpoint()
    }
    // Loop-invariant dangling-node set (no out-edges), pinned once. Its
    // per-round summed rank is ONE scalar — carried into the update as a
    // broadcast 1-row cross join, never a driver sync, so each iteration
    // stays a single pipelined job.
    val dangling = if (!redistributeDangling) null
      else nodes.join(e0.select(col("src").as("node")).distinct(),
        Seq("node"), "left_anti").localCheckpoint()
    // Personalization: the teleport base becomes a loop-invariant column
    // on the node table (SCALE/|S| on seeds, 0 elsewhere), pinned once.
    val nodesTb = if (seeds == null) null else {
      val sd = seeds.select(col("node").cast("long")).distinct()
        .localCheckpoint()
      val nSeeds = sd.count()
      require(nSeeds > 0, "personalization needs a non-empty seed set")
      nodes.join(gated(sd.withColumn("__s", lit(1))), Seq("node"), "left")
        .select(col("node"),
          when(col("__s").isNotNull, lit(SCALE / nSeeds)).otherwise(lit(0L))
            .as("tb"))
        .localCheckpoint()
    }
    val baseSql = if (seeds == null) s"15 * ${base}L" else "15 * tb"
    var ranks =
      if (seeds == null) nodes.select(col("node"), lit(base).as("pr"))
      else nodesTb.select(col("node"), col("tb").as("pr"))
    for (it <- 1 to iters) {
      val contrib = e
        .join(gated(ranks), col("node") === col("src"))
        .select(col("dst").as("node"), expr("pr div deg").as("c"))
        .groupBy("node")
        .agg(sum(col("c")).as("in_mass"))
      // Per-node share of the dangling mass, floor-divided in the same
      // scaled-integer arithmetic as the contributions (exact cross-engine).
      val inMassSql =
        if (!redistributeDangling) "coalesce(in_mass, 0L)"
        else s"coalesce(in_mass, 0L) + dmass div ${n}L"
      val withMass = (if (seeds == null) nodes else nodesTb)
        .join(gated(contrib), Seq("node"), "left")
      val updated =
        if (!redistributeDangling) withMass
        else withMass.crossJoin(broadcast(
          ranks.join(gated(dangling), Seq("node"))
            .agg(coalesce(sum(col("pr")), lit(0L)).as("dmass"))))
      val next = updated
        .select(col("node"),
          expr(s"($baseSql + 85 * ($inMassSql)) div 100").as("pr"))
      // EAGER truncation (r17): the lazy form let the NEXT round's
      // broadcast build be the first consumer, so the checkpoint
      // materialized ON A BROADCAST-EXCHANGE THREAD — which completes
      // holding the global RDDCheckpointData lock while wanting the
      // RDD's state lock, the exact ABBA the DAG scheduler runs in
      // the opposite order (holds state lock in getCacheLocs, wants
      // the class lock via partitions→checkpointRDD). jstack caught
      // the deadlock live in the r17 concurrent Verify. Eager keeps
      // the materialization job on THIS thread, where the window
      // cannot interleave with the scheduler.
      //
      // CHECKPOINT EVERY 2nd ROUND in the single-consumer modes (r20,
      // guide §2.4/measured gaps): each checkpoint action costs a job
      // PLUS ~30-120 ms of driver planning gaps around it, and in the
      // plain/personalized modes `ranks` is consumed exactly ONCE per
      // round (the contribution join), so letting one lazy round ride
      // into the next action duplicates no work and halves the
      // action count of the loop. The DANGLING mode reads `ranks`
      // TWICE per round (contribution join + dangling-mass aggregate),
      // so skipping its checkpoint would re-execute the previous
      // round's tail, including its broadcast builds — it keeps the
      // per-round pin. Lineage depth stays bounded (2 rounds).
      //
      // The FINAL round is elided too (r20 session 2): the returned
      // DataFrame has exactly one downstream consumer (the caller's
      // single action), so the last odd round rides into that action
      // like any other lazy round — one fewer checkpoint job + gap,
      // no recompute, and no lazy-checkpoint deadlock window because
      // nothing is left to materialize off-thread.
      ranks =
        if (it != iters && (redistributeDangling || it % 2 == 0))
          next.localCheckpoint()
        else next
    }
    ranks.select(col("node"), col("pr").as("rank_scaled"))
  }

  /** HITS score scale: 1.0 == 1e6 units — smaller than the PageRank
    * [[SCALE]] because the normalization multiply `raw · scale` must
    * stay inside a long for raw up to Σscore·maxdeg. */
  val HitsScale = 1000000L

  /** HITS hubs and authorities (Kleinberg 1999, "Authoritative Sources
    * in a Hyperlinked Environment") over DIRECTED `edges` (src → dst):
    * per round a(v) = Σ_{u→v} h(u) then h(u) = Σ_{u→v} a(v), each side
    * L1-renormalized to total mass [[HitsScale]] by integer floor
    * division — all-integer arithmetic, so the fixed-point loop is
    * bit-identical across engines like the PageRank loop. On a
    * bipartite purchase graph the hub side ranks buyers by how much
    * authoritative supply they touch and vice versa — the
    * mutual-reinforcement view PageRank's single score collapses.
    *
    * Scale shape: ONE materialization per full iteration — the h-side
    * raw-mass table, whose single job executes both half-round edge
    * joins back-to-back with the a-side L1 normalization `(raw·S) div T`
    * folded into the consuming join's projection (floor division is
    * per-node, so evaluating it on the joined edge rows is value-
    * identical to materializing a normalized score table first). The L1
    * totals never re-run an edge join: the a-side total Σ_v raw_a(v)
    * telescopes to Σ_u h(u)·outdeg(u), a node-scale aggregate over the
    * checkpointed raw table (which carries the loop-invariant
    * out-degree as a folded-in column — no per-round degree join), and
    * the h-side total is a 1-row aggregate over the pinned raw table —
    * both ride in as broadcast 1-row scalars, never a driver sync (a
    * literal-collect variant was measured SLOWER in r15: each collect
    * is a pipeline barrier, while lazy checkpoints let the whole loop
    * schedule inside the consuming action). Measured effect of this
    * shape vs the per-half-round normalize-materialize one: the
    * q290/q153 cost ratio fell 1.60 → 1.10–1.18 across two
    * same-session A/Bs (pagerank baseline; absolute seconds are
    * machine-load-dependent, so the honest claim is the range). */
  def hits(edges: DataFrame, iters: Int = 5): DataFrame = {
    require(iters >= 1 && iters <= 50, "fixed small iteration count")
    val e0 = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct().localCheckpoint()
    val P = e0.sparkSession.sparkContext.defaultParallelism
    // The edge table pins TWICE, pre-partitioned on each join key
    // (localCheckpoint preserves outputPartitioning): the a-side round
    // scans eByDst so its groupBy(dst) needs NO exchange, the h-side
    // round scans eBySrc likewise — with the score tables broadcast
    // (below), NO edge-table shuffle happens inside the loop at all.
    // Pinned partition count, not AQE-coalesced (the q203 trap).
    //
    // The loop-invariant out-degree is FOLDED INTO the src copy (r20
    // session 2, the PageRank idiom): it rides the edge rows (+8 bytes)
    // and the hub-state rows, so each round's a-side L1 total
    // (Σ h·outdeg == Σ_v raw_a(v)) is a node-scale aggregate over the
    // hub table ALONE — no per-round degree join and no per-round
    // degree-table broadcast build (measured: 1 AQE broadcast job +
    // its driver gap per round, plus the setup table's own checkpoint).
    val eBySrc = e0
      .join(e0.groupBy("src").agg(count(lit(1)).as("__deg")), Seq("src"))
      .repartition(P, col("src")).localCheckpoint()
    val eByDst = e0.repartition(P, col("dst")).localCheckpoint()
    // Node-scale score tables broadcast under the [[BroadcastMaxNodes]]
    // gate (the PageRank contract: 2M nodes ≈ 32 MB; web-scale graphs
    // fall back to keyed joins against the pre-partitioned edge copies).
    // Both broadcast tables are bounded by their own side's node count —
    // the hub table by |src|, the raw-authority table by |dst| — so the
    // gate takes the larger of the two, in one bounded-scalar job.
    val small = {
      val r = e0.agg(countDistinct(col("src")), countDistinct(col("dst")))
        .collect()(0)
      math.max(r.getLong(0), r.getLong(1)) <= BroadcastMaxNodes
    }
    def gated(df: DataFrame) = if (small) broadcast(df) else df
    // Hub state (node, h, __deg): normalized integer scores with the
    // loop-invariant out-degree alongside; seeded unnormalized at
    // HitsScale per Kleinberg's z-vector. After round 1 this is a LAZY
    // projection over the checkpointed raw table — never its own job.
    var h = eBySrc.groupBy(col("src").as("node"))
      .agg(max(col("__deg")).as("__deg"))
      .withColumn("h", lit(HitsScale)).localCheckpoint()
    var a: DataFrame = null
    for (it <- 1 to iters) {
      // Σ h·outdeg over the hub table alone (deg rides the state rows):
      // value-identical to the former h ⨝ degOut aggregate — h's node
      // set IS the src-node set every round.
      val ta = broadcast(h.agg(sum(expr("h * __deg")).as("__ta")))
      // Raw authority mass — consumed once (inside the h-side join), so
      // left unmaterialized except in the FINAL round, where it also
      // feeds the authority output and an EAGER checkpoint pins it
      // (lazy checkpoints materialize on whichever consumer fires
      // first — a broadcast thread here — and deadlock against the
      // scheduler; see the PageRank loop comment).
      val rawA0 = eByDst
        .join(gated(h.select(col("node").as("src"), col("h"))), Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum(col("h")).as("__ar"))
      val rawA = if (it == iters) rawA0.localCheckpoint() else rawA0
      val rawH = eBySrc
        .join(gated(rawA.select(col("node").as("dst"), col("__ar"))),
          Seq("dst"))
        .crossJoin(ta)
        .select(col("src").as("node"), col("__deg"),
          expr(s"(__ar * $HitsScale) div __ta").as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__hr"),
          max(col("__deg")).as("__deg")) // deg is per-src constant
        .localCheckpoint() // eager: the next line broadcasts over it
      val th = broadcast(rawH.agg(sum(col("__hr")).as("__th")))
      h = rawH.crossJoin(th)
        .select(col("node"), col("__deg"),
          expr(s"(__hr * $HitsScale) div __th").as("h"))
      if (it == iters)
        a = rawA.crossJoin(ta)
          .select(col("node"),
            expr(s"(__ar * $HitsScale) div __ta").as("a"))
    }
    h.select(col("node"), lit("hub").as("role"),
        col("h").as("score_scaled"))
      .unionAll(a.select(col("node"), lit("authority").as("role"),
        col("a").as("score_scaled")))
  }
}
