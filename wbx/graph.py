"""Link-graph analytics: host-graph construction + authority ranking.

Production crawlers order their frontier by link authority (PageRank /
OPIC-style scores — Page et al. 1999; Abiteboul et al. 2003), a layer the
reference engine does not have (warcbench is a single-archive record
iterator; its closest surface is the per-URI summarize reports,
``scripts/summarize.py``). This module adds that layer Spark-first:

- ``host_edges`` turns a pages table (``input_hint`` shape) into a distinct
  host→host link graph using the same ``extract_links`` / canonicalization
  kernels the crawl loop runs — no new parsing path.
- ``host_rank`` is power-iteration PageRank expressed as DataFrame joins:
  each iteration is ONE shuffle (the contribution ``groupBy(dst)``); the
  rank vector is per-host (orders of magnitude smaller than the edge
  list — ~10^7 hosts vs ~10^11 edges at crawl scale), so the edges side is
  hash-partitioned by ``src`` once and reused every iteration while only
  the small rank vector moves. Dangling mass (hosts with no out-links) is
  redistributed uniformly via a 1-row broadcast aggregate — never a
  driver-side collect, so the loop stays fully distributed.
- ``with_authority_priority`` broadcasts the rank vector back onto a
  frontier as its scheduling priority.

Lineage control: each iteration materializes with ``localCheckpoint`` to
truncate the logical plan (10 iterations of self-joins would otherwise
compound into an exponentially-analyzed plan). On a real cluster prefer
``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()`` for executor-
loss resilience; localCheckpoint keeps local-mode tests hermetic.

Determinism: ranks are doubles; groupBy sum reassociation keeps results
stable to ~1e-12 relative across partitionings, so consumers compare at a
rounded precision (the entry oracle pins ``round(rank * 1e6)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wbx.frontier import extract_links, url_host, with_canon_url, with_url_host


def host_edges(
    pages: DataFrame, base_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_host, dst_host, n_links) — distinct-pair weighted host graph
    from page HTML, via the crawl loop's own link-discovery kernels.
    Self-loops (intra-host links) are kept; callers that want a pure
    inter-host graph filter ``src_host != dst_host``."""
    links = extract_links(pages, base_col=base_col, html_col=html_col)
    # Null-host rows (scheme-less/invalid URLs) are excluded HERE, on the
    # raw strings, BEFORE the staged canonicalization pipeline. Filtering
    # on src_host/dst_host after staging looks equivalent but is a
    # scale-killer: predicate pushdown substitutes every staged level's
    # alias into the condition, and because each level references its
    # predecessors multiple times the filter expression grows
    # multiplicatively (observed: a 6.8 MB physical plan and a
    # minutes-long optimize for a 2-row input). A scheme-valid URL always
    # canonicalizes to a non-null host, so this cheap prefilter makes the
    # post-staging null filter unnecessary.
    def has_scheme(c):
        sep = F.instr(c, "://")
        return (sep > 0) & F.substring(c, 1, sep - 1).rlike(
            r"^[A-Za-z][A-Za-z0-9+.-]*$"
        )

    links = links.where(has_scheme(F.col("url")) & has_scheme(F.col("link")))
    # pure per-row column pipeline — canonicalize each side in place (the
    # staged hot-path kernels), never a join against the link table itself
    src = with_url_host(
        with_canon_url(links, "url", out_col="_src_canon"), "_src_canon", "src_host"
    )
    both = with_url_host(
        with_canon_url(src, "link", out_col="_dst_canon"), "_dst_canon", "dst_host"
    )
    return both.groupBy("src_host", "dst_host").agg(F.count("*").alias("n_links"))


def host_rank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """PageRank over a host graph → (host, rank, out_degree, in_degree).

    Standard power iteration with uniform teleport and uniform dangling-
    mass redistribution; edges are de-duplicated to distinct (src, dst)
    pairs (unweighted adjacency — the classic formulation). Ranks sum
    to 1 at every iteration.

    Per-iteration plan: rank-vector join onto edges (src), ONE groupBy(dst)
    shuffle for contributions, a left join back onto the host list, and a
    1-row broadcast cross-join carrying the dangling mass. The edge list is
    analyzed once and cached by Spark's shuffle reuse; only the rank vector
    (per-host, small) is recomputed.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    hosts = (
        e.select(F.col("src").alias("host"))
        .unionByName(e.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = hosts.count()
    if n == 0:
        return hosts.select(
            "host",
            F.lit(0.0).alias("rank"),
            F.lit(0).cast("long").alias("out_degree"),
            F.lit(0).cast("long").alias("in_degree"),
        )
    outdeg = e.groupBy("src").agg(F.count("*").alias("out_deg")).persist()
    indeg = e.groupBy("dst").agg(F.count("*").alias("in_deg"))
    # edges+degree joined and cached ONCE, pre-partitioned on src: the
    # per-iteration contribution join then reads a cached scan already
    # hashed on its key (or broadcasts the tiny rank vector) instead of
    # re-deriving and re-exchanging the edge table every round
    ew = e.join(outdeg, "src").repartition(F.col("src")).persist()
    ew.count()

    ranks = hosts.select("host", F.lit(1.0 / n).alias("rank"))
    teleport = (1.0 - damping) / n
    for _ in range(iterations):
        contrib = (
            ew.join(ranks, ew["src"] == ranks["host"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("contrib"))
        )
        dangling = (
            ranks.join(outdeg, ranks["host"] == outdeg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass"))
        )
        ranks = (
            hosts.join(contrib, hosts["host"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "host",
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dmass") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    out = (
        ranks.join(outdeg, ranks["host"] == outdeg["src"], "left")
        .join(indeg, ranks["host"] == indeg["dst"], "left")
        .select(
            "host",
            "rank",
            F.coalesce(F.col("out_deg"), F.lit(0)).cast("long").alias("out_degree"),
            F.coalesce(F.col("in_deg"), F.lit(0)).cast("long").alias("in_degree"),
        )
        .localCheckpoint(eager=True)
    )
    ew.unpersist()
    outdeg.unpersist()
    return out


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int | None = None,
) -> DataFrame:
    """Connected components by min-label propagation → (id, component).

    The missing half of every pairwise dedup operator: MinHash/SimHash/
    embedding near-dup emit PAIRS, but "keep one copy" needs the
    transitive closure — A~B and B~C must collapse to one cluster even
    though (A, C) was never emitted. ``component`` is the minimum member
    id of each cluster (a deterministic representative).

    Algorithm: every node starts labeled with itself; each round every
    node takes the min label in its closed neighborhood (undirected);
    converged when a round changes nothing — O(diameter) rounds, and
    near-dup clusters are short-diameter by construction (they exist
    because members mutually collide in sketch buckets). Works on any id
    type with a total order (the dedup operators emit longs).

    Scale shape per round: one labels→edges equi-join + one groupBy(node)
    min — label rows are (id, label) pairs only, payloads never
    participate. The convergence test is a distributed count aggregate
    (no row data reaches the driver); each round's labels materialize via
    localCheckpoint, which both truncates the growing self-join lineage
    and keeps round N+1 scanning a small cached table rather than
    re-deriving round N. (Star-contraction variants converge in fewer
    rounds on pathological long-chain graphs; min-label is chosen because
    its per-round algebra is plain relational — the DuckDB oracle runs
    the identical recurrence.)

    ``max_iter``: safety cap (None = run to convergence).
    """
    e = (
        pairs.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Undirected closed neighborhood, cached ONCE pre-partitioned on the
    # join key: without this every round re-runs the union+distinct and
    # re-exchanges the (large) edge table. persist (not localCheckpoint —
    # LogicalRDD drops the partitioning info) keeps the repartition(b)
    # inside the InMemoryRelation, so each round's join reads a cached
    # scan that already satisfies its distribution; only the (small)
    # label vector moves per round, and AQE broadcasts the cached side
    # outright when it fits (verified via .explain).
    sym = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .repartition(F.col("b"))
        .persist()
    )
    sym.count()  # materialize before the loop
    labels = (
        e.select(F.col("a").alias("id"))
        .unionByName(e.select(F.col("b").alias("id")))
        .distinct()
        .select("id", F.col("id").alias("component"))
        .localCheckpoint(eager=True)
    )
    rounds = 0
    while max_iter is None or rounds < max_iter:
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["id"])
            .groupBy(F.col("a").alias("nid"))
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["nid"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        rounds += 1
        if changed == 0:
            break
    sym.unpersist()
    return labels


def components_keep_representatives(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Near-dup dedup finisher: cluster the pairs, keep each component's
    minimum-id member, and pass through every doc that appears in no pair.
    The anti-join/semi-join pair touches only id columns — doc payloads
    are never shuffled (same late-fetch discipline as dedup_exact)."""
    comp = connected_components(pairs, src_col, dst_col)
    losers = comp.where(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


def with_authority_priority(
    frontier: DataFrame,
    ranks: DataFrame,
    url_col: str = "canon_url",
    priority_col: str = "priority",
) -> DataFrame:
    """Attach host-authority priority to a frontier: broadcast-join the
    (host, rank) vector on the URL's host and expose ``rank`` as the
    frontier's priority column (missing hosts → 0.0, the teleport floor is
    irrelevant for ordering). The rank vector is per-host and tiny next to
    the frontier, so this is always a broadcast — no frontier shuffle."""
    rank_map = ranks.select(
        F.col("host").alias("_auth_host"), F.col("rank").alias("_auth_rank")
    )
    host = url_host(F.col(url_col))
    return (
        frontier.withColumn("_auth_host", host)
        .join(F.broadcast(rank_map), "_auth_host", "left")
        .withColumn(priority_col, F.coalesce(F.col("_auth_rank"), F.lit(0.0)))
        .drop("_auth_host", "_auth_rank")
    )


def host_degree_stats(edges: DataFrame) -> DataFrame:
    """(host, out_degree, in_degree, out_links, in_links, is_dangling) —
    per-host degree summary of a (src_host, dst_host, n_links) graph:
    distinct-neighbor degrees plus link-weighted totals, self-loops
    excluded from both directions (a site linking itself says nothing
    about its place in the web). ``is_dangling`` marks hosts that are
    linked TO but never link out (PageRank's dangling mass; also the
    frontier's "discovered but never expanded" hosts).

    Scale shape: two map-side-combinable aggregates over the edge list
    (host-pair cardinality, far below URLs) joined full-outer on host —
    absent directions coalesce to zero. Deterministic."""
    inter = edges.filter(F.col("src_host") != F.col("dst_host"))
    out = inter.groupBy(F.col("src_host").alias("host")).agg(
        F.count("*").cast("long").alias("out_degree"),
        F.sum("n_links").cast("long").alias("out_links"),
    )
    inn = inter.groupBy(F.col("dst_host").alias("host")).agg(
        F.count("*").cast("long").alias("in_degree"),
        F.sum("n_links").cast("long").alias("in_links"),
    )
    return (
        out.join(inn, "host", "full_outer")
        .select(
            "host",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            F.coalesce("out_links", F.lit(0)).alias("out_links"),
            F.coalesce("in_links", F.lit(0)).alias("in_links"),
        )
        .withColumn("is_dangling", F.col("out_degree") == 0)
    )
