package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{SparkEntry, SparkSpec, Tables}

/** One-shot scaling sweep of the heavy-tail queries (round-6 verdict #5):
  * synthesizes a ~sf1 dataset as 10 key-shifted copies of sf0.1 under
  * /tmp/graft_sf1 (documents text gets a per-copy md5 prefix so the copies
  * are DISTINCT content — an exact-duplicate corpus would measure the
  * 45×-output adversarial case, not scaling), runs each tail query once at
  * sf0.1 and once at sf1 in the same warmed JVM, and prints the ratio.
  * A clean linear envelope is ratio ≈ 10 + constant; a quadratic term the
  * plan audits missed shows up as ratio ≫ 12. Results are recorded in
  * docs/SCALING.md (the committed artifact; wall-clock asserts would be
  * machine-load-flaky in CI).
  *
  * pr1/pr2 run on an explicitly shifted 10× edge list instead of the dir:
  * their input is DISTINCT (partkey, suppkey) pairs, which key-shifted
  * fact duplication would collapse right back to sf0.1 size. km1 likewise
  * gets explicitly shifted part-points (part rides along unscaled in the
  * dir as a dimension). Round 8 adds the round-7 newcomers: pr2, km1's
  * banded-rank seeding, e16 with compaction on (events.parquet now ships
  * in the synthetic dir), and mm3's decode+resize.
  *
  * Usage: `Test/runMain graft.tools.ScaleSweep`
  */
object ScaleSweep {
  private val Src = "/root/testdata/sf0.1"
  private val Out = "/tmp/graft_sf1"
  private val OutFlip = "/tmp/graft_sf1_flip"
  private val Copies = 10
  private val SrcTables =
    Seq("documents", "embeddings", "lineitem", "part", "events")

  private def build(s: SparkSession): Unit = {
    // Staleness guard: the stamp records the source mtime at build
    // completion, so both a half-built dir (no stamp — the stamp is the
    // LAST write) and a dir built from since-regenerated testdata (the
    // driver rewrites /root/testdata between rounds) trigger a rebuild
    // instead of silently serving stale ratios.
    val stamp = new java.io.File(s"$Out/_source_mtime")
    val cur = graft.util.Landing.sourceMtime(Src, SrcTables).toString
    if (stamp.exists() &&
        new java.io.File(s"$OutFlip/embeddings.parquet").exists() && {
          val src = scala.io.Source.fromFile(stamp)
          try src.mkString.trim == cur finally src.close()
        }) return
    new java.io.File(Out).mkdirs()
    new java.io.File(OutFlip).mkdirs()

    def shifted(df: DataFrame, idCol: String)(mangle: DataFrame => DataFrame)
        : DataFrame = {
      val span = df.agg(max(col(idCol))).head().getLong(0) + 1L
      (0 until Copies).map { k =>
        mangle(df.withColumn(idCol, col(idCol) + lit(k * span))
          .withColumn("_copy", lit(k)))
      }.reduce(_ unionByName _).drop("_copy")
    }

    val docs = Tables.documents(s, Src)
    shifted(docs, "doc_id") { d =>
      // distinct content per copy: a 16-hex-char md5 prefix pushes every
      // cross-copy pair past the near-dup thresholds without changing the
      // length/shingle profile the blocking operators key on
      d.withColumn("text",
          concat(substring(md5(concat_ws("|", col("doc_id"), col("_copy"))),
            1, 16), lit(" "), col("text")))
        .withColumn("n_chars", length(col("text")))
    }.coalesce(4).write.mode("overwrite").parquet(s"$Out/documents.parquet")

    // embeddings stay byte-identical per copy: duplicated vectors stress
    // exactly the hot-bucket refine/salt path x7 exists to survive
    shifted(Tables.embeddings(s, Src), "vec_id")(identity)
      .coalesce(4).write.mode("overwrite").parquet(s"$Out/embeddings.parquet")

    shifted(Tables.lineitem(s, Src), "l_orderkey")(identity)
      .coalesce(8).write.mode("overwrite").parquet(s"$Out/lineitem.parquet")
    // events: 10× volume over the SAME (day, event_type) key space — the
    // right MV-maintenance scale-up (e16's state is key-sized, not
    // volume-sized). ts lands as TimestampType µs; Tables.normalizeTs
    // accepts it on read.
    shifted(Tables.events(s, Src), "event_id")(identity)
      .coalesce(8).write.mode("overwrite").parquet(s"$Out/events.parquet")
    // dimensions ride along unscaled (the realistic fact-only scale-up)
    Tables.part(s, Src).write.mode("overwrite").parquet(s"$Out/part.parquet")

    // SIGN-FLIPPED embeddings dir for d11 (the pr1 shifted-input
    // discipline, adapted to vectors): copy k applies a deterministic
    // per-(copy, dim) coordinate reflection s_i(k) ∈ {±1}. A reflection
    // is an ISOMETRY, so every within-copy pair similarity — and with it
    // the copy's near-dup pair set and cell structure — is EXACTLY the
    // sf0.1 original (true pairs scale exactly linearly), while
    // cross-copy sims decorrelate to ≈0 (Σ aᵢbᵢsᵢ, random signs) and
    // stay far under the 0.35 threshold. Byte-identical duplication
    // (the $Out embeddings, kept for x7's adversarial hot-bucket case)
    // would instead multiply the OUTPUT ×45 — a different object.
    shifted(Tables.embeddings(s, Src), "vec_id") { d =>
      d.withColumn("embedding",
        when(col("_copy") === 0, col("embedding")).otherwise(
          zip_with(col("embedding"),
            sequence(lit(0), size(col("embedding")) - 1),
            (x, i) => when(
              pmod(xxhash64(col("_copy"), i), lit(2)) === 0, x)
              .otherwise(-x))))
    }.coalesce(4).write.mode("overwrite")
      .parquet(s"$OutFlip/embeddings.parquet")

    java.nio.file.Files.write(stamp.toPath, cur.getBytes("UTF-8"))
    println(s"[scalesweep] built $Out")
  }

  private def time[A](body: => A): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val s = SparkSpec.session
    build(s)
    // optional substring filters: run only matching registered-query rows
    // (the hand-built graph/kmeans rows at the bottom always need a full
    // run — they are cheap relative to rebuilding context for them)
    val only = args.toSeq
    def wanted(q: String): Boolean =
      only.isEmpty || only.exists(q.contains)
    // x4/x8 ride along since round 10: their auto IVF geometry derives
    // cells from the corpus count, so the 10× dir (n = 20k → 142 cells,
    // 16 probes ≈ 11% scanned vs 24% at sf0.1) exercises the
    // shrinking-fraction claim, not just the wall-clock ratio.
    val tail = Seq("d10_editdist_neardup", "x7_knn_join", "fm1_assoc_rules",
      "d7_dup_clusters", "t14_quality_buckets", "b3_smote_lsh",
      "e16_stream_upsert_mv", "mm3_resize", "x4_cosine_topk_ivf",
      "x8_cosine_topk_ivfsq", "t17_bm25", "e19_gapfill",
      "mm4_phash_neardup", "x10b_filtered_ivf", "x11_ivf_incremental",
      "x11b_ivf_append", "x12_ivf_persisted",
      // round-11 newcomers: d13's only corpus-sized exchange keys on the
      // 8-gram (the md5-prefix copies make every doc ~fully duplicated —
      // the adversarial-but-linear everything-covered case); x13/x14 are
      // O(candDepth) past their linear candidate scans.
      "d13_substring_dedup", "x13_hybrid_rrf", "x14_mmr_rerank",
      // t18 = amortized index landing + pruned serve; d14 = O(n·|eval|)
      // broadcast scan; e20 = x11b's append as a stream (base landing +
      // three micro-batch commits); dq4 = two x6-shaped scans.
      "t18_bm25_indexed", "d14_semantic_decon", "e20_stream_index_append",
      "dq4_embedding_drift",
      // d15 = d2b's map-only signature scan + one bucket-keyed exchange
      // at build, partition-pruned probe at serve (bkt bounded at 64)
      "d15_neardup_search",
      // round-12 newcomers: x15 reads the index files (≈2× index bytes);
      // mv2 = one event scan at sketch build + |days| sketch-row merges;
      // fm3 = tokenize pass + bigram exchange truncated by min-count;
      // od2 = one corpus scan + n-row exchange + TakeOrdered; e21 = d15's
      // probe per micro-batch against the 10× landed index
      "x15_ivf_compact", "mv2_sketch_rollup", "fm3_pmi_collocations",
      "od2_centroid_outliers", "e21_stream_neardup",
      // e22 = base landing + 3 streamed partial-sketch commits (linear);
      // e23 = user-keyed as-of pairing, window-bounded fan-out; dq5 =
      // count-by-day scan + two |days|-row aggregates
      "e22_stream_sketch", "e23_attribution", "dq5_volume_anomaly",
      // x13b/x16 are index-served (t18+x12 fusion / pruned code scan);
      // s16 is NOT swept — the synthetic 10× dir ships fact tables only,
      // not customer, and s16's cost model is |touched buckets| anyway
      "x13b_hybrid_indexed", "x16_ivfpq_persisted",
      // km3 = bounded driver fit + map-only argmax; a11 = one grouped
      // scan with map-side partial sketches
      "km3_bisecting_kmeans", "a11_group_quantiles",
      // round-13 newcomers: d16 = bloom build over the 10× eval side +
      // map-side pruned train scan + exact join on survivors; t19 = one
      // word-count exchange then a bounded-dict driver fold (memo is
      // fresh per JVM, so both timings measure the real build); fm4 =
      // PFP over baskets whose item universe is fixed (support threshold
      // scales with n — same lattice, 10× counts). pr5 sweeps on SHIFTED
      // support-2 edges below (densification discipline), s17 is the
      // fixed-size stroke surface (not corpus-scaled — no sweep row).
      "d16_bloom_decontaminate", "t19_bpe_merges", "fm4_fpgrowth",
      // second round-13 batch: af4 = asof (one user-keyed shuffle per
      // side) + slim version join; od3 = two grouped median aggregations
      // of one fact; t20 = token scan + vocab count + banded rank; fm5 =
      // PrefixSpan over 5-event prefixes; a12 = one 10-sum aggregate.
      // mm6 (fixed 128-doc frame count) and s18 (|nations| driver work)
      // have no corpus-scaled axis; s16/s18/s19 additionally read
      // customer, which the synthetic dir does not ship.
      "af4_pit_enrich", "od3_mad_outliers", "t20_corpus_laws",
      // af5 = af4's PIT enrichment + a users-sized latest-version argmax
      "af5_feature_skew",
      // ts1 = one day-keyed rollup exchange (10× volume, same ~30 days)
      // then |days|-sized window work
      "ts1_seasonal_decompose",
      // dq6 = one max-by-type scan with map-side partials, |streams| out
      "dq6_freshness",
      "fm5_prefixspan", "a12_correlations",
      // c7 = map-side md5 + one shard-keyed window; d19 = d7's landed
      // pair machinery + per-cluster argmax (near-dup volume exactly
      // linear on the plain 10× dir thanks to the md5-prefix mangling)
      "c7_epoch_shuffle", "d19_cluster_reps",
      // round-14 newcomers: x17 = x10b's widened probes through the
      // partition-pruned landed layout (x12's serve shape); e24 = af4's
      // as-of in 3 micro-batches over the 10× events; x18 = k-NN-graph
      // build (knnJoin at degree 16 — the corpus-scaled part) + beam
      // serve whose per-hop lookups are beam-bounded, not corpus-bound;
      // e25 = one dedup-stream pass over base+heartbeat+late staging
      // (the planted slices scale with the event table).
      "x17_filtered_persisted", "e24_stream_pit", "x18_knn_graph_beam",
      "e25_late_observability",
      // x18b = the base graph build (90% of x18's) + insert-by-search
      // over the delta (bounded, partition-pruned) + one file commit;
      // e26 = the same insert in 3 streamed micro-batch commits
      "x18b_knn_graph_append", "e26_stream_graph_append",
      // x19 = x18's shared base-graph build + two thinned-layer builds
      // (1/8 and 1/64 of nodes — sub-linear extras) + the layered serve
      // whose per-hop lookups stay beam-bounded
      "x19_hnsw_layers",
      // x20 = the x18b lifecycle (base build + append) plus the compaction
      // rewrite (one nbr-keyed vector join + per-node top-degree window),
      // then the beam-bounded serve — the x15 cost shape for graphs
      "x20_graph_compact",
      // x21 = x18's shared build + a map-only quantized relayout, then
      // the code-walk + exact finalist rerank (both beam-bounded)
      "x21_graph_sq8",
      // x22 = the shared build + a labeled relayout, then the unfiltered
      // walk whose scored pool is hops-by-beam-by-degree bounded
      "x22_graph_filtered",
      // e27 = one parquet write of each batch's own rows + one metadata
      // commit per micro-batch (4 batches over the 10× events), then a
      // manifest-pinned head aggregate — linear in events by construction
      "e27_stream_txn_sink")
    for (q <- tail if wanted(q)) {
      val small = time(SparkEntry.queries(q)(s, Src).collect())
      val big = time(SparkEntry.queries(q)(s, Out).collect())
      println(f"[scalesweep] $q%-22s sf0.1 $small%6.1fs  sf1 $big%7.1fs  ratio ${big / small}%5.1f")
    }
    // d11/d12 run on the sign-flipped dir (see build): within-copy pair
    // structure identical to sf0.1 ⇒ true near-dup volume exactly 10×,
    // cross-copy sims decorrelated under the threshold. d11 is the
    // exact contract (measures its documented isotropic worst case);
    // d12 is the within-cell approximation whose candidate volume is
    // 4n²/cells by construction.
    // b4 rides the flip dir too: byte-identical duplication would make
    // every point's 1-NN its own dist-0 copy (links = opposite-class
    // identical pairs only — a different object); sign-flipped copies
    // keep within-copy distances EXACT, so the true link set is exactly
    // 10× sf0.1's. km3/a11 run on the plain dir in the tail above.
    for (q <- Seq("d11_semdedup", "d12_semdedup_cells", "b4_tomek_links")
        if wanted(q)) {
      val small = time(SparkEntry.queries(q)(s, Src).collect())
      val big = time(SparkEntry.queries(q)(s, OutFlip).collect())
      println(f"[scalesweep] $q%-22s sf0.1 $small%6.1fs  sf1 $big%7.1fs  ratio ${big / small}%5.1f")
    }
    if (only.nonEmpty && !only.exists(f =>
        ("pr1_pagerank pr2_directed km1_kmeans pr3_triangles pr4_kcore " +
          "pr5_communities pr6_bfs km4_dbscan").contains(f)))
      return
    // pr1-shaped graph, 10 shifted copies of the distinct edge list
    val e0 = Tables.lineitem(s, Src)
      .select((col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst")).distinct()
      .localCheckpoint(true)
    val span = e0.agg(greatest(max(col("src")), max(col("dst")))).head()
      .getLong(0) + 1L
    val e10 = (0 until Copies).map(k =>
        e0.select((col("src") + lit(k * span)).as("src"),
          (col("dst") + lit(k * span)).as("dst")))
      .reduce(_ unionByName _)
    val small = time(graft.mining.MiningOps.pageRank(e0, iters = 3).collect())
    val big = time(graft.mining.MiningOps.pageRank(e10, iters = 3).collect())
    println(f"[scalesweep] pr1_pagerank(10x edges) sf0.1 $small%6.1fs  sf1 $big%7.1fs  ratio ${big / small}%5.1f")
    // pr2 on the SAME shifted edges, directed: the dangling-mass path adds
    // a per-iteration left-anti join + scalar agg that must stay linear
    val dSmall = time(
      graft.mining.MiningOps.pageRank(e0, iters = 3, directed = true)
        .collect())
    val dBig = time(
      graft.mining.MiningOps.pageRank(e10, iters = 3, directed = true)
        .collect())
    println(f"[scalesweep] pr2_directed(10x edges)  sf0.1 $dSmall%6.1fs  sf1 $dBig%7.1fs  ratio ${dBig / dSmall}%5.1f")
    // km1 on 10 shifted copies of the part points (part itself rides along
    // unscaled in $Out as a dimension, so the sweep shifts explicitly —
    // the round-7 distributed banded-rank seeding is what's under test)
    val p0 = Tables.part(s, Src).select(col("p_partkey").as("id"),
        col("p_size").cast("long").as("x"),
        round(col("p_retailprice") * 100).cast("long").as("y"))
      .localCheckpoint(true)
    val pSpan = p0.agg(max(col("id"))).head().getLong(0) + 1L
    val p10 = (0 until Copies).map(k =>
        p0.select((col("id") + lit(k * pSpan)).as("id"), col("x"),
          col("y")))
      .reduce(_ unionByName _)
    val kSmall = time(graft.mining.MiningOps.kmeans(p0, iters = 3).collect())
    val kBig = time(graft.mining.MiningOps.kmeans(p10, iters = 3).collect())
    println(f"[scalesweep] km1_kmeans(10x points)   sf0.1 $kSmall%6.1fs  sf1 $kBig%7.1fs  ratio ${kBig / kSmall}%5.1f")
    // km4 on 10 y-SHIFTED spatial replicas (the densification discipline
    // applied to geometry: km1's duplicated coordinates would multiply
    // DENSITY ×10 — a different object; disjoint spatial replicas keep
    // density constant). The inter-replica gap is 10 — far past ε (~2.5)
    // so replicas stay disconnected, but small against the y-range so
    // the bounding-box area grows ~×10 with n and the fixed-occupancy
    // ε² stays put.
    val ySpan = p0.agg(max(col("y")) - min(col("y")) + lit(10L))
      .head().getLong(0)
    val db10 = (0 until Copies).map(k =>
        p0.select((col("id") + lit(k * pSpan)).as("id"), col("x"),
          (col("y") + lit(k * ySpan)).as("y")))
      .reduce(_ unionByName _)
    val dbSmall = time(graft.mining.MiningOps.dbscan(p0).collect())
    val dbBig = time(graft.mining.MiningOps.dbscan(db10).collect())
    println(f"[scalesweep] km4_dbscan(10x replicas) sf0.1 $dbSmall%6.1fs  sf1 $dbBig%7.1fs  ratio ${dbBig / dbSmall}%5.1f")
    // pr3 on 10 SHIFTED copies of the co-purchase edge list — plain fact
    // duplication (the $Out lineitem) would DENSIFY the graph instead:
    // degree ×10 ⇒ wedges ×100, a different asymptotic object than
    // corpus growth. Shifted copies grow nodes+edges at constant degree,
    // the realistic direction; 12M edges also overflow the broadcast cap,
    // so this measures the shuffle-closure fallback path.
    val items0 = Tables.lineitem(s, Src)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val ec0 = items0.as("a").join(items0.as("b"), Seq("ok"))
      .filter(col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v")).distinct()
      .localCheckpoint(true)
    val cSpan = ec0.agg(greatest(max(col("u")), max(col("v")))).head()
      .getLong(0) + 1L
    val ec10 = (0 until Copies).map(k =>
        ec0.select((col("u") + lit(k * cSpan)).as("u"),
          (col("v") + lit(k * cSpan)).as("v")))
      .reduce(_ unionByName _)
    val tSmall = time(graft.mining.MiningOps.triangleCount(ec0).collect())
    val tBig = time(graft.mining.MiningOps.triangleCount(ec10).collect())
    println(f"[scalesweep] pr3_triangles(10x edges) sf0.1 $tSmall%6.1fs  sf1 $tBig%7.1fs  ratio ${tBig / tSmall}%5.1f")
    // pr4 on 10 SHIFTED copies of the SUPPORT-2 edge list (the pr1/pr3
    // densification discipline: duplicated facts would multiply every
    // pair's support ×10 and pass the threshold everywhere — a denser,
    // different graph; shifted copies grow nodes+edges at constant
    // degree, so the peel works on 10 disjoint replicas of the real one)
    val ks0 = graft.mining.MiningOps.coPurchaseEdges(s, Src)
      .localCheckpoint(true)
    val kSpan2 = ks0.agg(greatest(max(col("u")), max(col("v")))).head()
      .getLong(0) + 1L
    val ks10 = (0 until Copies).map(k =>
        ks0.select((col("u") + lit(k * kSpan2)).as("u"),
          (col("v") + lit(k * kSpan2)).as("v")))
      .reduce(_ unionByName _)
    val pcSmall = time(graft.mining.MiningOps
      .kcore(ks0, graft.mining.MiningOps.KcoreK,
        graft.mining.MiningOps.KcoreRounds).collect())
    val pcBig = time(graft.mining.MiningOps
      .kcore(ks10, graft.mining.MiningOps.KcoreK,
        graft.mining.MiningOps.KcoreRounds).collect())
    println(f"[scalesweep] pr4_kcore(10x edges)     sf0.1 $pcSmall%6.1fs  sf1 $pcBig%7.1fs  ratio ${pcBig / pcSmall}%5.1f")
    // pr5 on the same shifted support-2 replicas: LPA's per-round cost is
    // edges + nodes; 10 disjoint replicas at constant degree is the
    // honest scale direction for a support-thresholded graph
    val lpSmall = time(graft.mining.MiningOps
      .labelPropagation(ks0, graft.mining.MiningOps.LpaRounds).collect())
    val lpBig = time(graft.mining.MiningOps
      .labelPropagation(ks10, graft.mining.MiningOps.LpaRounds).collect())
    println(f"[scalesweep] pr5_communities(10x edges) sf0.1 $lpSmall%6.1fs  sf1 $lpBig%7.1fs  ratio ${lpBig / lpSmall}%5.1f")
    // pr6 on the same shifted replicas, with the registered op's FIXED
    // 8-seed set (the blast radius stays one replica's — the honest
    // serve question is "does a bounded walk stay bounded as the graph
    // grows", so the ratio should sit well UNDER linear)
    def bfsSeedsOf(e: DataFrame): DataFrame =
      e.select(col("u").as("node")).unionByName(e.select(col("v").as("node")))
        .distinct()
        .orderBy(md5(concat_ws("|", col("node").cast("string"),
          lit("pr6"))), col("node"))
        .limit(graft.mining.MiningOps.BfsSeeds)
    val bfSmall = time(graft.mining.MiningOps
      .multiSourceBfs(ks0, bfsSeedsOf(ks0),
        graft.mining.MiningOps.BfsRounds).collect())
    val bfBig = time(graft.mining.MiningOps
      .multiSourceBfs(ks10, bfsSeedsOf(ks10),
        graft.mining.MiningOps.BfsRounds).collect())
    println(f"[scalesweep] pr6_bfs(10x edges)       sf0.1 $bfSmall%6.1fs  sf1 $bfBig%7.1fs  ratio ${bfBig / bfSmall}%5.1f")
  }
}
