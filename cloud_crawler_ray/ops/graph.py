"""Link-graph analytics over crawl output: edge extraction and PageRank.

The reference crawler stops at extraction (its analogs — word_count.rb,
count_listings.rb — are per-page folds); ranking the crawled link graph is a
target-side addition, the canonical "iterative distributed op over crawl
output" a web corpus pipeline needs (rank-weighted sampling, seed scoring,
spam demotion).

Scale design
------------
* Edges come straight off the raw fetch table's admitted ``child_urls``
  (src = page canonical_url, dst = canonicalized child), flattened and
  block-deduped map-side, then exactly deduped with one hash(src,dst)
  shuffle — never collected on the driver.
* Node ids are assigned once with the metadata-only prefix-sum stamp
  (sorted distinct nodes → zip_with_index), and both edge endpoints convert
  to int ids via size-gated keyed_attach joins. All iterations then run on
  the int-id edge table (strings cross the wire exactly once).
* Each power iteration is: per-edge contribution (rank[src]/outdeg[src])
  → per-block partial sums by dst → combine. Below ``dense_cap`` nodes the
  rank vector broadcasts as ONE float64 numpy array per iteration
  (ray.put; memcpy-cheap) and the combine is a driver-side sparse add —
  O(N) driver floats, fine up to ~50M nodes. Above the cap the ranks stay
  a Dataset and each iteration is a keyed_attach join + hash-shard combine
  (the 10^10-node path; ~3 executions/iteration). Tests force this path
  with dense_cap=0.
* Dangling mass (pages with no admitted out-links) redistributes uniformly
  each iteration, so ranks always sum to 1.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..canon import canonical_urls
from .dedup import _add_shard, cluster_shards, keyed_attach

__all__ = [
    "link_edges",
    "pagerank",
    "hits",
    "connected_components",
    "label_propagation",
    "lpa_iterations",
]


def link_edges(raw: rd.Dataset) -> rd.Dataset:
    """Distinct (src, dst) canonical-URL edges from a raw fetch table
    (columns canonical_url, child_urls, fetched). Map-side flatten +
    block dedup, then one hash shuffle for exact global dedup."""
    import pyarrow.compute as pc

    def flatten(t: pa.Table) -> pa.Table:
        t = t.filter(t.column("fetched"))
        kids = t.column("child_urls")
        flat = pc.list_flatten(kids)
        parents = pc.list_parent_indices(kids)
        src = pc.take(t.column("canonical_url"), parents)
        dst = pa.array(canonical_urls(flat.to_pylist()), pa.string())
        tt = pa.table({"src": src, "dst": dst})
        return tt.group_by(["src", "dst"]).aggregate([])  # block dedup

    n_sh = cluster_shards()
    edges = raw.map_batches(flatten, batch_format="pyarrow")

    def shard_dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["src", "dst"])[["src", "dst"]]

    return (
        edges.map_batches(
            lambda t: _add_shard(
                pa.table(
                    {
                        "key": pc.binary_join_element_wise(
                            t.column("src"), t.column("dst"), "\x1f"
                        ),
                        "src": t.column("src"),
                        "dst": t.column("dst"),
                    }
                ),
                "key",
                n_sh,
            ),
            batch_format="pyarrow",
        )
        .groupby("shard")
        .map_groups(
            lambda g: shard_dedup(g.drop(columns=["shard", "key"])),
            batch_format="pandas",
        )
    )


def _rebase(mds: rd.MaterializedDataset) -> rd.Dataset:
    """Re-root a materialized Dataset on its raw Arrow block refs, severing
    plan lineage. Without this, every iteration's materialize() keeps the
    whole chain of prior iterations alive (stats/plan recursion), and
    per-iteration planning cost grows linearly — measured 1.2s → 6.1s per
    iteration over 4 PageRank rounds before this fix. The ObjectRefs keep
    the blocks alive; empty blocks are dropped (no schema)."""
    refs = []
    for b in mds.iter_internal_ref_bundles():
        for r, m in zip(b.block_refs, b.metadata):
            if m.num_rows:
                refs.append(r)
    return rd.from_arrow_refs(refs) if refs else mds


def _node_ids(edges: rd.Dataset) -> tuple[rd.Dataset, int]:
    """Distinct nodes (src ∪ dst) with deterministic dense int ids
    (sorted-URL order via the metadata-only prefix stamp)."""
    from ..stages.indexing import zip_with_index

    n_sh = cluster_shards()
    nodes = edges.map_batches(
        lambda t: pa.table({"node": t.column("src")}), batch_format="pyarrow"
    ).union(
        edges.map_batches(
            lambda t: pa.table({"node": t.column("dst")}), batch_format="pyarrow"
        )
    )
    nodes = (
        nodes.map_batches(
            lambda t: _add_shard(
                t.group_by("node").aggregate([]), "node", n_sh
            ),
            batch_format="pyarrow",
        )
        .groupby("shard")
        .map_groups(
            lambda g: g.drop(columns=["shard"]).drop_duplicates("node"),
            batch_format="pandas",
        )
        # back to Arrow blocks: the metadata-only stamp appends to pa.Tables
        .map_batches(lambda t: t, batch_format="pyarrow")
    )
    return zip_with_index(nodes, ["node"], col="nid", with_count=True)


def _teleport_vector(nodes: np.ndarray, seeds: list[str] | None) -> np.ndarray | None:
    """Personalized-PageRank teleport vector over the sorted node array:
    uniform mass 1/|seeds∩nodes| on the seed nodes, 0 elsewhere. None when
    seeds is None (classic uniform teleport keeps its historical float
    expression). Raises if no seed appears in the graph — a personalized
    walk with an empty restart set is undefined."""
    if seeds is None:
        return None
    hit = np.isin(nodes, np.asarray(list(seeds), dtype=object))
    k = int(hit.sum())
    if k == 0:
        raise ValueError("personalized pagerank: no seed URL appears in the edge set")
    tvec = np.zeros(len(nodes), np.float64)
    tvec[hit] = 1.0 / k
    return tvec


def _seed_nids(nodemap: rd.Dataset, seeds: list[str]) -> np.ndarray:
    """Sorted int ids of the seed nodes present in the graph — the seed set
    is small by definition (a focused crawl's restart pages), so the lookup
    is a broadcast membership filter over the nodemap with only the matching
    rows (≤ |seeds|) ever reaching the driver."""
    import pyarrow.compute as pc

    vals = pa.array(sorted(set(seeds)), pa.string())
    hits = nodemap.map_batches(
        lambda t: t.filter(pc.is_in(t.column("node"), value_set=vals)),
        batch_format="pyarrow",
    ).to_pandas()
    ids = np.sort(hits["nid"].to_numpy().astype(np.int64))
    if len(ids) == 0:
        raise ValueError("personalized pagerank: no seed URL appears in the edge set")
    return ids


def pagerank(
    edges: rd.Dataset,
    n_iter: int = 8,
    d: float = 0.85,
    dense_cap: int = 1_000_000,
    join_broadcast_cap: int = 500_000,
    driver_cap: int = 2_000_000,
    seeds: list[str] | None = None,
) -> rd.Dataset:
    """PageRank over a (src, dst) edge Dataset; returns (node, rank).

    With ``seeds`` set this is PERSONALIZED PageRank (teleport restricted
    to the seed set — random-surfer restarts land uniformly on the seeds,
    and dangling mass returns to them): rank becomes crawl-relevance from
    those pages, the focused-crawl prioritization signal. Update per
    iteration: rank = ((1-d) + d·dangling)·t + d·Aᵀ(rank/deg), start at t,
    t = 1/|seeds∩nodes| on seeds. seeds=None keeps the classic uniform
    teleport (and its exact historical float expression — hash-pinned).

    Fixed ``n_iter`` power iterations with uniform dangling-mass
    redistribution (ranks sum to 1 every iteration). Three size-gated
    paths, the hybrid-planner pattern used across this repo:
    * edges ≤ driver_cap: the distinct edge list crosses the wire ONCE;
      node ids (np.unique — the same sorted order the distributed stamp
      assigns), degrees and all iterations run driver-side in numpy. At
      40k nodes the fully distributed pipeline is 6-7 Ray executions of
      pure floor (~34 s measured) for work numpy does in milliseconds;
    * nodes ≤ dense_cap: rank vector broadcasts per iteration, sparse
      per-block partial sums (the mid-scale path, forced via driver_cap=0);
    * above: ranks stay a Dataset, keyed-join per iteration (the 10^10
      path, forced via dense_cap=0). All three are pinned to the same
      numpy reference in tests/test_graph.py."""
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.string()), "rank": pa.array([], pa.float64())})
        )
    if n_edges <= driver_cap:
        ed = edges.to_pandas()
        nodes, inv = np.unique(
            np.concatenate([ed["src"].to_numpy(), ed["dst"].to_numpy()]),
            return_inverse=True,
        )
        src = inv[: len(ed)]
        dst = inv[len(ed):]
        # canonical edge order: float accumulation (np.add.at) follows array
        # order, so sort edges by (dst, src) to make every rank bit a pure
        # function of the edge SET — identical under any partitioning of the
        # upstream Dataset (and to the serial oracle twin)
        order = np.lexsort((src, dst))
        src, dst = src[order], dst[order]
        n = len(nodes)
        deg = np.bincount(src, minlength=n).astype(np.int64)
        safe_deg = np.where(deg > 0, deg, 1)
        tvec = _teleport_vector(nodes, seeds)
        rank = np.full(n, 1.0 / n) if tvec is None else tvec.copy()
        base = (1.0 - d) / n
        for _ in range(n_iter):
            dangling = float(rank[deg == 0].sum())
            contrib = rank / safe_deg
            sums = np.zeros(n)
            np.add.at(sums, dst, contrib[src])
            if tvec is None:
                rank = base + d * dangling / n + d * sums
            else:
                rank = ((1.0 - d) + d * dangling) * tvec + d * sums
        return rd.from_arrow(
            pa.table({"node": pa.array(nodes, pa.string()), "rank": pa.array(rank)})
        )

    # normalize to Arrow blocks: link_edges ends in a pandas map_groups, and
    # keyed_attach needs Arrow schema types (same pattern as _node_ids)
    edges = edges.map_batches(lambda t: t, batch_format="pyarrow")
    nodemap, n = _node_ids(edges)
    if n == 0:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.string()), "rank": pa.array([], pa.float64())})
        )
    nodemap = nodemap.materialize()

    src_map = nodemap.map_batches(
        lambda t: t.rename_columns(["src", "src_id"]), batch_format="pyarrow"
    )
    dst_map = nodemap.map_batches(
        lambda t: t.rename_columns(["dst", "dst_id"]), batch_format="pyarrow"
    )
    e = keyed_attach(
        edges, src_map, "src", ["src_id"], right_count=n,
        broadcast_cap=max(join_broadcast_cap, 1),
    )
    e = keyed_attach(
        e, dst_map, "dst", ["dst_id"], right_count=n,
        broadcast_cap=max(join_broadcast_cap, 1),
    )
    e = _rebase(
        e.map_batches(
            lambda t: t.select(["src_id", "dst_id"]), batch_format="pyarrow"
        ).materialize()
    )

    # out-degree per node id: per-block partials + driver/sparse combine
    def deg_partial(t: pa.Table) -> pa.Table:
        tt = pa.table(
            {"src_id": t.column("src_id"), "c": pa.array(np.ones(len(t), np.int64))}
        )
        return tt.group_by("src_id").aggregate([("c", "sum")])

    sid = _seed_nids(nodemap, seeds) if seeds is not None else None

    if n <= dense_cap:
        degp = e.map_batches(deg_partial, batch_format="pyarrow").to_pandas()
        deg = np.zeros(n, np.int64)
        if len(degp):
            dsum = degp.groupby("src_id")["c_sum"].sum()
            deg[dsum.index.to_numpy()] = dsum.to_numpy()
        tvec = None
        if sid is not None:
            tvec = np.zeros(n, np.float64)
            tvec[sid] = 1.0 / len(sid)
        rank = np.full(n, 1.0 / n) if tvec is None else tvec.copy()
        base = (1.0 - d) / n
        safe_deg = np.where(deg > 0, deg, 1)
        for _ in range(n_iter):
            dangling = float(rank[deg == 0].sum())
            ref = ray.put((rank / safe_deg).astype(np.float64))

            def contrib(t: pa.Table, ref=ref) -> pa.Table:
                arr = ray.get(ref)
                mass = arr[t.column("src_id").to_numpy()]
                df = (
                    pd.DataFrame(
                        {"dst_id": t.column("dst_id").to_numpy(), "m": mass}
                    )
                    .groupby("dst_id", as_index=False)["m"]
                    .sum()
                )
                return pa.table(
                    {
                        "dst_id": pa.array(df["dst_id"].to_numpy(), pa.int64()),
                        "m": pa.array(df["m"].to_numpy(), pa.float64()),
                    }
                )

            parts = e.map_batches(contrib, batch_format="pyarrow").to_pandas()
            if tvec is None:
                new = np.full(n, base + d * dangling / n)
            else:
                new = ((1.0 - d) + d * dangling) * tvec
            if len(parts):
                s = parts.groupby("dst_id")["m"].sum()
                new[s.index.to_numpy()] += d * s.to_numpy()
            rank = new
        ranks_tbl = pa.table(
            {"nid": pa.array(np.arange(n, dtype=np.int64)), "rank": pa.array(rank)}
        )
        out = keyed_attach(
            nodemap, rd.from_arrow(ranks_tbl), "nid", ["rank"], right_count=n,
            broadcast_cap=max(join_broadcast_cap, 1),
        )
        return out.map_batches(
            lambda t: t.select(["node", "rank"]), batch_format="pyarrow"
        )

    # ---- at-scale path: ranks stay a Dataset, one join per iteration ----
    n_sh = cluster_shards()

    def shard_sum(col_key: str, col_val: str, out_val: str):
        def _f(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby(col_key, as_index=False)[col_val].sum()
            return out.rename(columns={col_val: out_val})

        return _f

    degs = (
        e.map_batches(deg_partial, batch_format="pyarrow")
        .map_batches(lambda t: _add_shard(t, "src_id", n_sh), batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: shard_sum("src_id", "c_sum", "deg")(g.drop(columns=["shard"])),
            batch_format="pandas",
        )
        .map_batches(lambda t: t.rename_columns(["nid", "deg"]), batch_format="pyarrow")
    )
    # full node vector with degree (0 for dangling)
    ranks = keyed_attach(nodemap, degs, "nid", ["deg"], right_count=n, broadcast_cap=0)

    def init_rank(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        deg = pc.fill_null(t.column("deg"), 0)
        if sid is None:
            r0 = np.full(t.num_rows, 1.0 / n)
        else:
            # seed-id array is tiny (the restart set) and rides the closure
            r0 = np.where(
                np.isin(t.column("nid").to_numpy(), sid), 1.0 / len(sid), 0.0
            )
        return pa.table(
            {
                "nid": t.column("nid"),
                "deg": pc.cast(deg, pa.int64()),
                "rank": pa.array(r0),
            }
        )

    ranks = _rebase(ranks.map_batches(init_rank, batch_format="pyarrow").materialize())
    base = (1.0 - d) / n
    for _ in range(n_iter):
        import pyarrow.compute as pc

        # dangling mass: one tiny scalar per block → driver add
        dparts = ranks.map_batches(
            lambda t: pa.table(
                {
                    "s": pa.array(
                        [
                            pc.sum(
                                pc.if_else(
                                    pc.equal(t.column("deg"), 0),
                                    t.column("rank"),
                                    pa.scalar(0.0),
                                )
                            ).as_py()
                            or 0.0
                        ],
                        pa.float64(),
                    )
                }
            ),
            batch_format="pyarrow",
        ).to_pandas()
        dangling = float(dparts["s"].sum())
        mass = ranks.map_batches(
            lambda t: pa.table(
                {
                    "src_id": t.column("nid"),
                    "m": pc.divide(
                        t.column("rank"),
                        pc.cast(
                            pc.if_else(
                                pc.greater(t.column("deg"), 0), t.column("deg"), 1
                            ),
                            pa.float64(),
                        ),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        contribs = keyed_attach(e, mass, "src_id", ["m"], right_count=n, broadcast_cap=0)
        sums = (
            contribs.map_batches(
                lambda t: pa.table(
                    {"dst_id": t.column("dst_id"), "m": t.column("m")}
                ).group_by("dst_id").aggregate([("m", "sum")]),
                batch_format="pyarrow",
            )
            .map_batches(lambda t: _add_shard(t, "dst_id", n_sh), batch_format="pyarrow")
            .groupby("shard")
            .map_groups(
                lambda g: shard_sum("dst_id", "m_sum", "s")(g.drop(columns=["shard"])),
                batch_format="pandas",
            )
            .map_batches(lambda t: t.rename_columns(["nid", "s"]), batch_format="pyarrow")
        )
        joined = keyed_attach(
            ranks.map_batches(
                lambda t: t.select(["nid", "deg"]), batch_format="pyarrow"
            ),
            sums,
            "nid",
            ["s"],
            right_count=n,
            broadcast_cap=0,
        )
        add = base + d * dangling / n
        seed_add = None if sid is None else ((1.0 - d) + d * dangling) / len(sid)

        def step(t: pa.Table, add=add, seed_add=seed_add) -> pa.Table:
            s = pc.fill_null(t.column("s"), 0.0)
            if seed_add is None:
                teleport = add
            else:
                teleport = pa.array(
                    np.where(np.isin(t.column("nid").to_numpy(), sid), seed_add, 0.0)
                )
            return pa.table(
                {
                    "nid": t.column("nid"),
                    "deg": t.column("deg"),
                    "rank": pc.add(pc.multiply(s, d), teleport),
                }
            )

        ranks = _rebase(joined.map_batches(step, batch_format="pyarrow").materialize())
    out = keyed_attach(
        nodemap, ranks, "nid", ["rank"], right_count=n, broadcast_cap=0
    )
    return out.map_batches(
        lambda t: t.select(["node", "rank"]), batch_format="pyarrow"
    )


def connected_components(edges: rd.Dataset, driver_pair_cap: int = 1_000_000) -> rd.Dataset:
    """Weakly connected components of the (src, dst) link graph: (node,
    component) where the component label is the lexicographically smallest
    member URL. Reuses the dedup family's size-gated machinery: union-find
    on the driver under ``driver_pair_cap`` edges, distributed hash-min
    label propagation above it (ops/dedup.py — per-round sharded min-label
    joins, loud non-convergence warning). Either way the RESULT (node →
    label) returns as a driver-built table — this wrapper's contract is
    analysis scale (O(nodes) driver memory); at 10^10 nodes the label table
    stays the sharded Dataset inside the label-prop rounds and a caller
    would consume it there instead of collecting."""
    from .dedup import _components_driver, _components_label_prop

    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(
            pa.table(
                {"node": pa.array([], pa.string()), "component": pa.array([], pa.string())}
            )
        )
    pairs_ds = edges.map_batches(
        lambda t: pa.table({"a": t.column("src"), "b": t.column("dst")}),
        batch_format="pyarrow",
    )
    if n_edges <= driver_pair_cap:
        pairs = pa.concat_tables(
            [pa.table(b) for b in pairs_ds.iter_batches(batch_format="pyarrow")]
        )
        labels = _components_driver(pairs)
    else:
        pairs = pa.concat_tables(
            [pa.table(b) for b in pairs_ds.iter_batches(batch_format="pyarrow")]
        )
        labels = _components_label_prop(pairs)
    nodes = sorted(labels)
    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes, pa.string()),
                "component": pa.array([labels[n] for n in nodes], pa.string()),
            }
        )
    )


def lpa_iterations(n: int, u: np.ndarray, v: np.ndarray, n_iter: int) -> np.ndarray:
    """Pure synchronous label-propagation kernel (Raghavan et al. 2007,
    "Near linear time algorithm to detect community structures") over an
    undirected int edge list (``u → v`` must cover BOTH directions, self
    loops removed, pairs distinct): ``n_iter`` rounds of
    label(v) = most frequent label among v's neighbors, ties → smallest
    label, all nodes updated simultaneously. Integer counts + min tie-break
    make the result a pure function of the edge SET — partitioning-free, so
    the distributed path and the serial oracle twin run THIS same code."""
    labels = np.arange(n, dtype=np.int64)
    for _ in range(n_iter):
        lab = labels[u]
        key = v.astype(np.int64) * np.int64(n) + lab
        uk, cnt = np.unique(key, return_counts=True)
        vv = (uk // n).astype(np.int64)
        ll = (uk % n).astype(np.int64)
        order = np.lexsort((ll, -cnt, vv))
        vv_o = vv[order]
        first = np.ones(len(vv_o), bool)
        first[1:] = vv_o[1:] != vv_o[:-1]
        new = labels.copy()
        new[vv_o[first]] = ll[order][first]
        labels = new
    return labels


def label_propagation(
    edges: rd.Dataset,
    n_iter: int = 5,
    driver_cap: int = 2_000_000,
    join_broadcast_cap: int = 500_000,
) -> rd.Dataset:
    """Community detection by synchronous label propagation over a directed
    (src, dst) edge Dataset, treated undirected; returns (node,
    community:int64) where the community id is the sorted-node rank (nid)
    the label converged to — identical between paths because both use the
    same sorted-node id space. Deterministic (integer counts, min-label
    ties, fixed ``n_iter``) under any partitioning.

    Two size-gated paths, the hybrid-planner pattern used across this repo:
    * edges ≤ driver_cap: edge list crosses the wire once, kernel runs in
      numpy driver-side;
    * above: per iteration ONE keyed join (neighbor labels onto the
      undirected edge list) + per-block (v, label) count partials + ONE
      co-shard argmax — labels stay a Dataset end to end; per-iteration
      lineage severed via materialize + _rebase so round cost stays flat."""
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(
            pa.table(
                {"node": pa.array([], pa.string()), "community": pa.array([], pa.int64())}
            )
        )
    if n_edges <= driver_cap:
        ed = edges.to_pandas()
        nodes, inv = np.unique(
            np.concatenate([ed["src"].to_numpy(), ed["dst"].to_numpy()]),
            return_inverse=True,
        )
        m = len(ed)
        n = len(nodes)
        u0 = np.concatenate([inv[:m], inv[m:]])
        v0 = np.concatenate([inv[m:], inv[:m]])
        keep = u0 != v0
        key = u0[keep].astype(np.int64) * np.int64(n) + v0[keep]
        uniq = np.unique(key)
        u, v = (uniq // n).astype(np.int64), (uniq % n).astype(np.int64)
        labels = lpa_iterations(n, u, v, n_iter)
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array(nodes, pa.string()),
                    "community": pa.array(labels, pa.int64()),
                }
            )
        )

    # ---- at-scale path ----
    # normalize to Arrow blocks (pandas-born upstreams lack Arrow types)
    edges = edges.map_batches(lambda t: t, batch_format="pyarrow")
    nodemap, n = _node_ids(edges)
    nodemap = nodemap.materialize()
    n_sh = cluster_shards()

    src_map = nodemap.map_batches(
        lambda t: t.rename_columns(["src", "src_id"]), batch_format="pyarrow"
    )
    dst_map = nodemap.map_batches(
        lambda t: t.rename_columns(["dst", "dst_id"]), batch_format="pyarrow"
    )
    e = keyed_attach(
        edges, src_map, "src", ["src_id"], right_count=n,
        broadcast_cap=max(join_broadcast_cap, 1),
    )
    e = keyed_attach(
        e, dst_map, "dst", ["dst_id"], right_count=n,
        broadcast_cap=max(join_broadcast_cap, 1),
    )

    def undirect(t: pa.Table) -> pa.Table:
        a = t.column("src_id").to_numpy()
        b = t.column("dst_id").to_numpy()
        uu = np.concatenate([a, b])
        vv = np.concatenate([b, a])
        keep = uu != vv
        return pa.table(
            {
                "u": pa.array(uu[keep], pa.int64()),
                "v": pa.array(vv[keep], pa.int64()),
            }
        )

    und = _rebase(
        e.map_batches(undirect, batch_format="pyarrow")
        .map_batches(lambda t: _add_shard(t, "v", n_sh), batch_format="pyarrow")
        # same (u,v) always shards by v → per-shard distinct is globally exact
        .groupby("shard")
        .map_groups(
            lambda g: g.drop(columns=["shard"]).drop_duplicates(["u", "v"]),
            batch_format="pandas",
        )
        .map_batches(lambda t: t, batch_format="pyarrow")
        .materialize()
    )

    labels = _rebase(
        nodemap.map_batches(
            lambda t: pa.table({"nid": t.column("nid"), "lab": t.column("nid")}),
            batch_format="pyarrow",
        ).materialize()
    )
    for _ in range(n_iter):
        lab_u = labels.map_batches(
            lambda t: t.rename_columns(["u", "lab"]), batch_format="pyarrow"
        )
        tagged = keyed_attach(und, lab_u, "u", ["lab"], right_count=n, broadcast_cap=0)
        counts = tagged.map_batches(
            lambda t: pa.table(
                {
                    "v": t.column("v"),
                    "lab": t.column("lab"),
                    "c": pa.array(np.ones(len(t), np.int64)),
                }
            ).group_by(["v", "lab"]).aggregate([("c", "sum")]),
            batch_format="pyarrow",
        )

        def argmax(g: pd.DataFrame) -> pd.DataFrame:
            s = g.groupby(["v", "lab"], as_index=False)["c_sum"].sum()
            s = s.sort_values(
                ["v", "c_sum", "lab"], ascending=[True, False, True], kind="stable"
            )
            out = s.groupby("v", sort=False).head(1)
            return out[["v", "lab"]].rename(columns={"v": "nid"})

        new_labels = (
            counts.map_batches(lambda t: _add_shard(t, "v", n_sh), batch_format="pyarrow")
            .groupby("shard")
            .map_groups(
                lambda g: argmax(g.drop(columns=["shard"])), batch_format="pandas"
            )
            .map_batches(lambda t: t, batch_format="pyarrow")
        )
        # every node from the edge set appears as some v in the undirected
        # list, so the argmax covers the full label vector each round
        labels = _rebase(new_labels.materialize())
    out = keyed_attach(nodemap, labels, "nid", ["lab"], right_count=n, broadcast_cap=0)
    return out.map_batches(
        lambda t: pa.table(
            {"node": t.column("node"), "community": t.column("lab")}
        ),
        batch_format="pyarrow",
    )


def hits(
    edges: rd.Dataset,
    n_iter: int = 16,
    driver_cap: int = 2_000_000,
) -> rd.Dataset:
    """HITS hubs & authorities (Kleinberg, "Authoritative sources in a
    hyperlinked environment", JACM 1999) over a (src, dst) edge Dataset;
    returns (node, hub, authority), both scores L2-normalized per
    iteration. Same hybrid gates as pagerank: under ``driver_cap`` edges
    the int-id edge list crosses the wire once and iterations are numpy;
    above it, each iteration broadcasts the two score vectors (ray.put)
    and every block emits sparse partial sums — no shuffle (the rank
    vectors at 10^10 nodes would move to the pagerank join path; HITS is
    typically run on a focused subgraph, so the broadcast path is the
    documented scale route)."""
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.string()),
                    "hub": pa.array([], pa.float64()),
                    "authority": pa.array([], pa.float64()),
                }
            )
        )

    def _iterate(src: np.ndarray, dst: np.ndarray, n: int):
        hub = np.full(n, 1.0)
        auth = np.full(n, 1.0)
        for _ in range(n_iter):
            new_auth = np.zeros(n)
            np.add.at(new_auth, dst, hub[src])
            na = np.linalg.norm(new_auth)
            auth = new_auth / na if na > 0 else new_auth
            new_hub = np.zeros(n)
            np.add.at(new_hub, src, auth[dst])
            nh = np.linalg.norm(new_hub)
            hub = new_hub / nh if nh > 0 else new_hub
        return hub, auth

    if n_edges <= driver_cap:
        ed = edges.to_pandas()
        nodes, inv = np.unique(
            np.concatenate([ed["src"].to_numpy(), ed["dst"].to_numpy()]),
            return_inverse=True,
        )
        src = inv[: len(ed)]
        dst = inv[len(ed):]
        # canonical edge order (see pagerank): bit-stable under any input
        # partitioning — np.add.at accumulates in array order
        order = np.lexsort((src, dst))
        src, dst = src[order], dst[order]
        hub, auth = _iterate(src, dst, len(nodes))
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array(nodes, pa.string()),
                    "hub": pa.array(hub),
                    "authority": pa.array(auth),
                }
            )
        )

    # broadcast path: distributed node ids + per-iteration score broadcast
    nodemap, n = _node_ids(edges)
    nodemap = nodemap.materialize()
    src_map = nodemap.map_batches(
        lambda t: t.rename_columns(["src", "src_id"]), batch_format="pyarrow"
    )
    dst_map = nodemap.map_batches(
        lambda t: t.rename_columns(["dst", "dst_id"]), batch_format="pyarrow"
    )
    e = keyed_attach(edges, src_map, "src", ["src_id"], right_count=n)
    e = keyed_attach(e, dst_map, "dst", ["dst_id"], right_count=n)
    e = _rebase(
        e.map_batches(
            lambda t: t.select(["src_id", "dst_id"]), batch_format="pyarrow"
        ).materialize()
    )
    hub = np.full(n, 1.0)
    auth = np.full(n, 1.0)
    for _ in range(n_iter):
        for direction in ("auth", "hub"):
            vec = hub if direction == "auth" else auth
            in_col, out_col = (
                ("src_id", "dst_id") if direction == "auth" else ("dst_id", "src_id")
            )
            ref = ray.put(vec)

            def contrib(t: pa.Table, ref=ref, in_col=in_col, out_col=out_col) -> pa.Table:
                arr = ray.get(ref)
                mass = arr[t.column(in_col).to_numpy()]
                df = (
                    pd.DataFrame({"k": t.column(out_col).to_numpy(), "m": mass})
                    .groupby("k", as_index=False)["m"]
                    .sum()
                )
                return pa.table(
                    {
                        "k": pa.array(df["k"].to_numpy(), pa.int64()),
                        "m": pa.array(df["m"].to_numpy(), pa.float64()),
                    }
                )

            parts = e.map_batches(contrib, batch_format="pyarrow").to_pandas()
            new = np.zeros(n)
            if len(parts):
                s = parts.groupby("k")["m"].sum()
                new[s.index.to_numpy()] = s.to_numpy()
            nrm = np.linalg.norm(new)
            if nrm > 0:
                new = new / nrm
            if direction == "auth":
                auth = new
            else:
                hub = new
    scores = pa.table(
        {
            "nid": pa.array(np.arange(n, dtype=np.int64)),
            "hub": pa.array(hub),
            "authority": pa.array(auth),
        }
    )
    out = keyed_attach(
        nodemap, rd.from_arrow(scores), "nid", ["hub", "authority"], right_count=n
    )
    return out.map_batches(
        lambda t: t.select(["node", "hub", "authority"]), batch_format="pyarrow"
    )


def anchor_text_index(docs: rd.Dataset, n_shards: int | None = None) -> rd.Dataset:
    """Anchor-text index: for every link target, how many distinct documents
    point at it and the sorted distinct anchor texts used (the reference's
    anchor-text surface, page.rb `links`/anchor lookup — P4 — aggregated
    corpus-wide, the signal web search and focus-crawl scoring feed on).

    Map side flattens the interleaved span column zero-copy
    (list_flatten + list_parent_indices, never pandas), keeps kind=='link'
    spans, and emits block-distinct (target, anchor, doc) triples; one
    hash(target) shuffle then owns each target whole, so the distinct
    referring-doc count and the '\\x1f'-joined distinct anchor list are
    exact in a single vectorized pandas pass. Output is one row per target
    — bounded by distinct URLs, never by links."""
    import pyarrow.compute as pc

    if n_shards is None:
        n_shards = cluster_shards()

    def triples(t: pa.Table) -> pa.Table:
        spans = t.column("spans")
        flat = pc.list_flatten(spans)
        parents = pc.list_parent_indices(spans)
        tt = pa.table(
            {
                "target": pc.struct_field(flat, "media_ref"),
                "anchor": pc.struct_field(flat, "text"),
                "doc_id": pc.take(t.column("doc_id"), parents),
            }
        ).filter(pc.equal(pc.struct_field(flat, "kind"), "link"))
        return tt.group_by(["target", "anchor", "doc_id"]).aggregate([])

    def shard_index(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["target", "anchor", "doc_id"])
        grp = g.groupby("target", sort=False)
        n_refs = grp["doc_id"].nunique()
        anchors = grp["anchor"].agg(
            lambda a: "\x1f".join(sorted(set(a)))
        )
        return pd.DataFrame(
            {
                "target": n_refs.index.astype(str),
                "n_refs": n_refs.to_numpy().astype(np.int64),
                "anchors": anchors.to_numpy(),
            }
        )

    return (
        docs.map_batches(triples, batch_format="pyarrow")
        .map_batches(lambda t: _add_shard(t, "target", n_shards), batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: shard_index(g.drop(columns=["shard"])), batch_format="pandas"
        )
    )


def triangles(edges: rd.Dataset, broadcast_cap: int = 2_000_000) -> rd.Dataset:
    """Exact triangle enumeration over an undirected edge list (columns
    ``a``, ``b`` with a < b, rows distinct). Returns a Dataset of triangle
    rows (a, b, c), a < b < c.

    Shape: the classic oriented wedge-join. Edges are already oriented
    low-id → high-id, so every triangle {u<v<w} is generated exactly once —
    as the wedge (v, w) out of its LOWEST vertex u, checked against the
    edge set. Wedge generation is one hash(a) shard pass (each node's
    out-neighborhood lands whole in one shard; per-node wedges come from a
    vectorized combination index, no Python per-pair loop). The membership
    check is size-gated like every join here: under ``broadcast_cap`` edges
    the sorted composite-key array broadcasts once via ray.put (memcpy-cheap
    numpy, searchsorted probe per wedge block); above it wedges and edges
    hash-shard by the (v, w) key and each shard does a local pandas merge
    (tests force this path with broadcast_cap=0).

    Scale note: wedge count is Σ C(outdeg, 2) — callers bound it upstream
    (the query gates edges to co-occurrence ≥ 2; a production variant would
    orient by degree instead of id, the standard skew cut). Wedges stream
    through the shuffle pre-filtered only by existence of the wedge, so the
    output volume is the honest cost.
    """
    edges = edges.materialize()
    n_edges = edges.count()
    n_sh = cluster_shards()

    def wedge_block(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for u, grp in g.groupby("a"):
            nb = np.sort(grp["b"].to_numpy().astype(np.int64))
            d = len(nb)
            if d < 2:
                continue
            ii, jj = np.triu_indices(d, k=1)
            outs.append(
                pd.DataFrame({"u": np.int64(u), "v": nb[ii], "w": nb[jj]})
            )
        if not outs:
            return pd.DataFrame(
                {
                    "u": np.array([], np.int64),
                    "v": np.array([], np.int64),
                    "w": np.array([], np.int64),
                }
            )
        return pd.concat(outs, ignore_index=True)

    wedges = (
        edges.map_batches(lambda t: _add_shard(t, "a", n_sh), batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: wedge_block(g.drop(columns=["shard"])), batch_format="pandas"
        )
    )

    def _key(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        # ids are graph node ids (< 2^31 in every producer here); the
        # composite fits one int64 exactly
        return (a.astype(np.int64) << np.int64(32)) | b.astype(np.int64)

    if n_edges <= broadcast_cap:
        epdf = edges.to_pandas()
        ekeys = np.sort(_key(epdf["a"].to_numpy(), epdf["b"].to_numpy()))
        ref = ray.put(ekeys)

        def probe(df: pd.DataFrame) -> pd.DataFrame:
            keys = ray.get(ref)
            wk = _key(df["v"].to_numpy(), df["w"].to_numpy())
            pos = np.searchsorted(keys, wk)
            hit = (pos < len(keys)) & (keys[np.minimum(pos, len(keys) - 1)] == wk)
            out = df.loc[hit]
            return pd.DataFrame(
                {
                    "a": out["u"].to_numpy().astype(np.int64),
                    "b": out["v"].to_numpy().astype(np.int64),
                    "c": out["w"].to_numpy().astype(np.int64),
                }
            )

        return wedges.map_batches(probe, batch_format="pandas")

    # distributed path: co-shard wedges and edges on the (v, w) key
    def tag_wedge(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        key = pc.binary_join_element_wise(
            pc.cast(t.column("v"), pa.string()),
            pc.cast(t.column("w"), pa.string()),
            "\x1f",
        )
        return _add_shard(t.append_column("_k", key), "_k", n_sh).drop_columns(["_k"])

    def tag_edge(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        key = pc.binary_join_element_wise(
            pc.cast(t.column("a"), pa.string()),
            pc.cast(t.column("b"), pa.string()),
            "\x1f",
        )
        t = pa.table(
            {
                "u": pa.array(np.full(t.num_rows, -1, np.int64)),
                "v": t.column("a"),
                "w": t.column("b"),
            }
        ).append_column("_k", key)
        return _add_shard(t, "_k", n_sh).drop_columns(["_k"])

    tagged = wedges.map_batches(tag_wedge, batch_format="pyarrow").union(
        edges.map_batches(tag_edge, batch_format="pyarrow")
    )

    def shard_join(g: pd.DataFrame) -> pd.DataFrame:
        is_edge = g["u"] < 0
        e = g.loc[is_edge, ["v", "w"]].drop_duplicates()
        wd = g.loc[~is_edge]
        m = wd.merge(e, on=["v", "w"])
        return pd.DataFrame(
            {
                "a": m["u"].to_numpy().astype(np.int64),
                "b": m["v"].to_numpy().astype(np.int64),
                "c": m["w"].to_numpy().astype(np.int64),
            }
        )

    return tagged.groupby("shard").map_groups(
        lambda g: shard_join(g.drop(columns=["shard"])), batch_format="pandas"
    )


def k_core(
    edges: rd.Dataset,
    k: int,
    broadcast_cap: int = 5_000_000,
    max_iters: int = 1000,
) -> rd.Dataset:
    """k-core of an undirected graph (columns ``a``, ``b``, a < b, rows
    distinct): the maximal subgraph where every node has degree ≥ k,
    computed by iterative peeling. Returns the surviving edge Dataset.

    Shape per round: degrees come from per-block partial counts over both
    endpoints (one hash(node) shard combine — bounded rows, never the raw
    edge stream twice); nodes under k form the peel set. The peel set is
    BY CONSTRUCTION the small side (it shrinks every round toward
    convergence), so it broadcasts via ray.put as a sorted numpy array and
    edges drop by two vectorized searchsorted probes — under
    ``broadcast_cap`` peeled nodes per round; above it the round falls back
    to a hash-shard anti-join (test-forced with broadcast_cap=0). Each
    round re-roots the edge blocks on raw refs (`_rebase`) so iteration
    cost stays flat (the PageRank lineage lesson). Terminates when a round
    peels nothing; max_iters is a loud backstop, never a silent cap."""
    n_sh = cluster_shards()
    cur = edges.materialize()

    def degree_partial(t: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [
                t.column("a").to_numpy(zero_copy_only=False),
                t.column("b").to_numpy(zero_copy_only=False),
            ]
        ).astype(np.int64)
        u, c = np.unique(nodes, return_counts=True)
        return pa.table({"node": pa.array(u), "deg": pa.array(c.astype(np.int64))})

    def shard_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False)["deg"].sum()
        return out[out["deg"] < k][["node"]]

    for it in range(max_iters):
        if cur.count() == 0:
            return cur
        peel_ds = (
            cur.map_batches(degree_partial, batch_format="pyarrow")
            .map_batches(lambda t: _add_shard(t, "node", n_sh), batch_format="pyarrow")
            .groupby("shard")
            .map_groups(
                lambda g: shard_sum(g.drop(columns=["shard"])), batch_format="pandas"
            )
            .materialize()
        )
        n_peel = peel_ds.count()
        if n_peel == 0:
            return cur
        if n_peel <= broadcast_cap:
            peel = np.sort(peel_ds.to_pandas()["node"].to_numpy().astype(np.int64))
            ref = ray.put(peel)

            def drop(t: pa.Table) -> pa.Table:
                p = ray.get(ref)
                a = t.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
                b = t.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
                ia = np.searchsorted(p, a)
                ib = np.searchsorted(p, b)
                hit_a = (ia < len(p)) & (p[np.minimum(ia, len(p) - 1)] == a)
                hit_b = (ib < len(p)) & (p[np.minimum(ib, len(p) - 1)] == b)
                keep = ~(hit_a | hit_b)
                return t.filter(pa.array(keep))

            cur = _rebase(cur.map_batches(drop, batch_format="pyarrow").materialize())
        else:
            # anti-join round: tag peel rows, co-shard with edges on each
            # endpoint in turn, drop edges whose endpoint has a peel partner
            def tag_peel(t: pa.Table, col: str) -> pa.Table:
                return pa.table(
                    {
                        "a": pa.array(
                            np.full(t.num_rows, -1, np.int64)
                        ),
                        "b": pa.array(
                            np.full(t.num_rows, -1, np.int64)
                        ),
                        "_key": t.column("node"),
                    }
                )

            stream = cur
            for col in ("a", "b"):
                tagged = stream.map_batches(
                    lambda t, col=col: t.append_column("_key", t.column(col)),
                    batch_format="pyarrow",
                ).union(
                    peel_ds.map_batches(
                        lambda t, col=col: tag_peel(t, col), batch_format="pyarrow"
                    )
                )

                def anti(g: pd.DataFrame) -> pd.DataFrame:
                    is_peel = g["a"] < 0
                    peeled = set(g.loc[is_peel, "_key"])
                    e = g.loc[~is_peel]
                    return e[~e["_key"].isin(peeled)][["a", "b"]]

                stream = (
                    tagged.map_batches(
                        lambda t: _add_shard(t, "_key", n_sh), batch_format="pyarrow"
                    )
                    .groupby("shard")
                    .map_groups(
                        lambda g: anti(g.drop(columns=["shard"])),
                        batch_format="pandas",
                    )
                )
            cur = _rebase(stream.materialize())
    raise RuntimeError(f"k_core did not converge in {max_iters} rounds")


def random_walks(
    edges: rd.Dataset,
    walk_len: int = 10,
    walks_per_node: int = 2,
    seed: int = 7,
    broadcast_cap: int = 5_000_000,
) -> rd.Dataset:
    """Deterministic random-walk corpus over an undirected int-id edge list
    (columns ``a``, ``b``) — the graph→sequence generator for DeepWalk /
    node2vec-style embedding training (Perozzi et al. 2014). Every node
    starts ``walks_per_node`` walks; each step picks a neighbor by a
    counter-based hash of (walk_id, step, seed), so the corpus is fully
    reproducible under any partitioning and any retry (no RNG state
    anywhere). Walks stop early at dead ends. Returns (walk_id, start,
    walk) with the walk as a list<int64> column.

    Shape, size-gated like every lookup here: under ``broadcast_cap``
    edges the CSR adjacency (indptr + sorted neighbor array) broadcasts
    once via ray.put and walk blocks advance all steps locally — one map
    pass total. Above the cap each step is one hash(cur) shuffle that
    co-locates walk frontiers with their node's neighbor list (test-forced
    with broadcast_cap=0; walk state re-roots on raw block refs each step
    so iteration cost stays flat). Both paths emit byte-identical walks."""
    edges = edges.materialize()
    n_edges = edges.count()
    n_sh = cluster_shards()

    K1, K2 = np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F)

    def _pick(walk_ids: np.ndarray, step: int, deg: np.ndarray) -> np.ndarray:
        h = (walk_ids.astype(np.uint64) + np.uint64(seed)) * K1
        h ^= h >> np.uint64(29)
        h = (h + np.uint64(step)) * K2
        h ^= h >> np.uint64(32)
        return (h % np.maximum(deg.astype(np.uint64), 1)).astype(np.int64)

    def _seeds_table(t: pa.Table) -> pa.Table:
        nodes = np.unique(
            np.concatenate(
                [
                    t.column("a").to_numpy(zero_copy_only=False),
                    t.column("b").to_numpy(zero_copy_only=False),
                ]
            ).astype(np.int64)
        )
        reps = np.repeat(nodes, walks_per_node)
        copy = np.tile(np.arange(walks_per_node, dtype=np.int64), len(nodes))
        # walk_id is globally unique and deterministic: node * wpn + copy
        return pa.table(
            {
                "walk_id": pa.array(reps * walks_per_node + copy),
                "start": pa.array(reps),
            }
        )

    # distinct seed nodes via one sharded pass (bounded rows per shard)
    seeds = (
        edges.map_batches(_seeds_table, batch_format="pyarrow")
        .map_batches(lambda t: _add_shard(t, "walk_id", n_sh), batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: g.drop(columns=["shard"]).drop_duplicates("walk_id"),
            batch_format="pandas",
        )
    )

    if n_edges <= broadcast_cap:
        ep = edges.to_pandas()
        a = ep["a"].to_numpy().astype(np.int64)
        b = ep["b"].to_numpy().astype(np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        nodes = np.unique(src)
        indptr = np.searchsorted(src, nodes, side="left")
        indptr = np.append(indptr, len(src))
        ref = ray.put((nodes, indptr, dst))

        def walk_block(df: pd.DataFrame) -> pd.DataFrame:
            nodes_, indptr_, nbrs_ = ray.get(ref)
            wid = df["walk_id"].to_numpy().astype(np.int64)
            cur = df["start"].to_numpy().astype(np.int64)
            alive = np.ones(len(cur), bool)
            walks = [cur.copy()]
            for step in range(1, walk_len):
                pos = np.searchsorted(nodes_, cur)
                pos = np.minimum(pos, len(nodes_) - 1)
                found = nodes_[pos] == cur
                lo = indptr_[pos]
                deg = indptr_[pos + 1] - lo
                ok = alive & found & (deg > 0)
                pick = _pick(wid, step, deg)
                nxt = np.where(ok, nbrs_[lo + np.where(ok, pick, 0)], -1)
                alive = ok
                cur = np.where(ok, nxt, cur)
                walks.append(np.where(ok, nxt, -1))
            W = np.stack(walks, axis=1)  # (n, walk_len), -1 past dead ends
            return pd.DataFrame(
                {
                    "walk_id": wid,
                    "start": df["start"].to_numpy().astype(np.int64),
                    "walk": [row[row >= 0].tolist() for row in W],
                }
            )

        return seeds.map_batches(walk_block, batch_format="pandas")

    # distributed path: one co-shard round per step
    state = seeds.map_batches(
        lambda t: pa.table(
            {
                "walk_id": t.column("walk_id"),
                "start": t.column("start"),
                "cur": t.column("start"),
                "path": pa.array(
                    [[v] for v in t.column("start").to_pylist()],
                    pa.list_(pa.int64()),
                ),
                "alive": pa.array([True] * t.num_rows),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def und(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        t.column("a").combine_chunks().cast(pa.int64()),
                        t.column("b").combine_chunks().cast(pa.int64()),
                    ]
                ),
                "nbr": pa.concat_arrays(
                    [
                        t.column("b").combine_chunks().cast(pa.int64()),
                        t.column("a").combine_chunks().cast(pa.int64()),
                    ]
                ),
            }
        )

    adj = edges.map_batches(und, batch_format="pyarrow").materialize()

    for step in range(1, walk_len):
        tagged = state.map_batches(
            lambda t: t.append_column("_key", t.column("cur")),
            batch_format="pyarrow",
        ).union(
            adj.map_batches(
                lambda t: pa.table(
                    {
                        "walk_id": pa.array(
                            np.full(t.num_rows, -1, np.int64)
                        ),
                        "start": t.column("nbr"),
                        "cur": t.column("node"),
                        "path": pa.array(
                            [None] * t.num_rows, pa.list_(pa.int64())
                        ),
                        "alive": pa.array([False] * t.num_rows),
                        "_key": t.column("node"),
                    }
                ),
                batch_format="pyarrow",
            )
        )

        def advance(g: pd.DataFrame, step=step) -> pd.DataFrame:
            is_adj = g["walk_id"] < 0
            w = g.loc[~is_adj].copy()
            if not len(w):
                return w.drop(columns=["_key"])
            # shard-local CSR: adjacency rows sorted by (node, nbr)
            an = g.loc[is_adj, "cur"].to_numpy().astype(np.int64)
            ab = g.loc[is_adj, "start"].to_numpy().astype(np.int64)
            order = np.lexsort((ab, an))
            an, ab = an[order], ab[order]
            uniq = np.unique(an)
            indptr = np.append(np.searchsorted(an, uniq, side="left"), len(an))

            curs = w["cur"].to_numpy().astype(np.int64)
            wids = w["walk_id"].to_numpy().astype(np.int64)
            alive = w["alive"].to_numpy().astype(bool)
            pos = np.searchsorted(uniq, curs)
            pos = np.minimum(pos, max(len(uniq) - 1, 0))
            found = (len(uniq) > 0) & (uniq[pos] == curs) if len(uniq) else np.zeros(len(w), bool)
            lo = indptr[pos] if len(uniq) else np.zeros(len(w), np.int64)
            deg = (indptr[pos + 1] - lo) if len(uniq) else np.zeros(len(w), np.int64)
            ok = alive & found & (deg > 0)
            pick = _pick(wids, step, deg)
            nxt = np.where(ok, ab[np.minimum(lo + np.where(ok, pick, 0), max(len(ab) - 1, 0))], curs) if len(ab) else curs
            w["cur"] = nxt
            w["alive"] = ok
            w["path"] = [
                list(p) + [int(n)] if o else list(p)
                for p, n, o in zip(w["path"], nxt, ok)
            ]
            return w.drop(columns=["_key"])

        state = _rebase(
            tagged.map_batches(lambda t: _add_shard(t, "_key", n_sh), batch_format="pyarrow")
            .groupby("shard")
            .map_groups(
                lambda g, step=step: advance(g.drop(columns=["shard"]), step),
                batch_format="pandas",
            )
            .materialize()
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "walk_id": df["walk_id"].to_numpy().astype(np.int64),
                "start": df["start"].to_numpy().astype(np.int64),
                "walk": [list(p) for p in df["path"]],
            }
        )

    return state.map_batches(finish, batch_format="pandas")


def bfs_distances(
    edges: rd.Dataset,
    seeds: list[int],
    max_depth: int = 15,
    driver_cap: int = 2_000_000,
) -> rd.Dataset:
    """Multi-source BFS hop distances over an undirected int-id edge list
    (columns ``a``, ``b``): returns (node, dist) for every node within
    ``max_depth`` hops of any seed. The canonical iterative frontier
    expansion, fully distributed — frontier and label state stay Datasets
    end to end (nothing O(nodes) on the driver):

    per round, one hash(node) co-shard joins the frontier with its
    adjacency lists (vectorized merge per shard) to produce candidates at
    d+1, and a second co-shard anti-joins candidates against the labels so
    only first-reached nodes survive (BFS = first touch is the shortest).
    Rounds re-root on raw block refs (`_rebase`); the loop ends when a
    round discovers nothing. ``max_depth`` bounds the recursion exactly
    like the SQL oracle's recursive-CTE depth guard, so both sides compute
    the identical relation."""
    edges = edges.materialize()
    if edges.count() <= driver_cap:
        # size-gated driver path (the pagerank precedent): the distinct edge
        # list crosses the wire ONCE and BFS runs in numpy CSR — at sandbox
        # scale the distributed rounds are ~2 pure-floor executions each for
        # work numpy does in milliseconds. The distributed path below is the
        # 10^10-edge shape, test-forced with driver_cap=0.
        ed = edges.to_pandas()
        a = ed["a"].to_numpy().astype(np.int64)
        b = ed["b"].to_numpy().astype(np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        nodes = np.unique(src)
        indptr = np.append(np.searchsorted(src, nodes, side="left"), len(src))
        dist = np.full(len(nodes), -1, np.int64)
        seed_arr = np.asarray(sorted(set(int(x) for x in seeds)))
        pos = np.searchsorted(nodes, seed_arr)
        ok = (pos < len(nodes)) & (nodes[np.minimum(pos, len(nodes) - 1)] == seed_arr)
        frontier = pos[ok]
        dist[frontier] = 0
        out_nodes = list(seed_arr)  # seeds not in the graph still label 0
        out_dist = [0] * len(seed_arr)
        d = 0
        while len(frontier) and d < max_depth:
            d += 1
            nbr_idx = np.concatenate(
                [dst[indptr[f] : indptr[f + 1]] for f in frontier]
            ) if len(frontier) else np.array([], np.int64)
            npos = np.searchsorted(nodes, np.unique(nbr_idx))
            new = npos[dist[npos] < 0]
            if not len(new):
                break
            dist[new] = d
            frontier = new
        seen = dist >= 0
        extra = ~np.isin(nodes[seen], seed_arr)
        out_nodes += nodes[seen][extra].tolist()
        out_dist += dist[seen][extra].tolist()
        tbl = pa.table(
            {
                "node": pa.array(np.asarray(out_nodes, np.int64)),
                "dist": pa.array(np.asarray(out_dist, np.int64)),
            }
        )
        return rd.from_arrow(tbl)

    n_sh = cluster_shards()

    und = edges.map_batches(
        lambda t: pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        t.column("a").combine_chunks().cast(pa.int64()),
                        t.column("b").combine_chunks().cast(pa.int64()),
                    ]
                ),
                "nbr": pa.concat_arrays(
                    [
                        t.column("b").combine_chunks().cast(pa.int64()),
                        t.column("a").combine_chunks().cast(pa.int64()),
                    ]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    seed_tbl = pa.table(
        {
            "node": pa.array(sorted(set(int(s) for s in seeds)), pa.int64()),
            "dist": pa.array([0] * len(set(seeds)), pa.int64()),
        }
    )
    labels = rd.from_arrow(seed_tbl).materialize()
    frontier = labels

    for d in range(1, max_depth + 1):
        if frontier.count() == 0:
            break
        # candidates: frontier nodes' neighbors at distance d
        tagged = frontier.map_batches(
            lambda t: pa.table(
                {"node": t.column("node"), "nbr": pa.array(np.full(t.num_rows, -1, np.int64))}
            ),
            batch_format="pyarrow",
        ).union(und)

        def expand(g: pd.DataFrame) -> pd.DataFrame:
            on_frontier = set(g.loc[g["nbr"] < 0, "node"])
            adj = g[g["nbr"] >= 0]
            hit = adj[adj["node"].isin(on_frontier)]
            return pd.DataFrame({"node": hit["nbr"].unique().astype(np.int64)})

        cands = (
            tagged.map_batches(lambda t: _add_shard(t, "node", n_sh), batch_format="pyarrow")
            .groupby("shard")
            .map_groups(
                lambda g: expand(g.drop(columns=["shard"])), batch_format="pandas"
            )
        )

        # anti-join against labels: first touch wins
        tagged2 = cands.map_batches(
            lambda t: pa.table(
                {"node": t.column("node"), "dist": pa.array(np.full(t.num_rows, -1, np.int64))}
            ),
            batch_format="pyarrow",
        ).union(labels)

        def first_touch(g: pd.DataFrame, d=d) -> pd.DataFrame:
            labeled = set(g.loc[g["dist"] >= 0, "node"])
            new = g.loc[(g["dist"] < 0) & ~g["node"].isin(labeled), "node"].unique()
            return pd.DataFrame(
                {"node": new.astype(np.int64), "dist": np.full(len(new), d, np.int64)}
            )

        new_labels = (
            tagged2.map_batches(lambda t: _add_shard(t, "node", n_sh), batch_format="pyarrow")
            .groupby("shard")
            .map_groups(
                lambda g, d=d: first_touch(g.drop(columns=["shard"]), d),
                batch_format="pandas",
            )
            .materialize()
        )
        if new_labels.count() == 0:
            break
        frontier = _rebase(new_labels)
        labels = _rebase(labels.union(new_labels).materialize())

    return labels


def scc_coloring(n: int, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Pure strongly-connected-components kernel over a DIRECTED int edge
    list — iterative forward-min coloring + same-color backward confirmation
    (the FW-BW/coloring scheme of Orzan 2004 / Slota et al. 2014, built
    from the one primitive that distributes: min-label propagation to
    fixpoint). Returns scc[v] = the smallest member id of v's SCC, a pure
    function of the edge SET (min-propagation is order- and
    partitioning-free), so the distributed wrapper and the serial oracle
    twin run THIS same code and must agree bit-for-bit.

    Per outer round over the still-active subgraph:
      1. f = forward min propagation to fixpoint: f(v) = min id that
         reaches v within the active subgraph. Standard property: f(v)=r
         implies an r→v path whose every vertex has color r.
      2. backward reachability restricted to SAME-COLOR edges from each
         color root r (f(r)=r): v confirmed iff v reaches its root inside
         its color class — exactly SCC(r), whose minimum id is r.
      3. settle confirmed nodes, shrink the active set. Every round
         settles every current color root's whole SCC, so the loop
         terminates in ≤ #SCC rounds (few, in practice, for web graphs).
    """
    scc = np.full(n, -1, np.int64)
    if n == 0:
        return scc
    active = np.ones(n, bool)
    ids = np.arange(n, dtype=np.int64)
    while active.any():
        # TRIM (Multistep): a node with no incoming or no outgoing edge
        # inside the active subgraph is a singleton SCC — peeling these
        # iteratively resolves the acyclic regions in O(longest path)
        # rounds instead of one coloring round per settled root (a DAG
        # chain would otherwise cost O(n) rounds). Pure peeling: the
        # result is unchanged, only the round count.
        while True:
            m = active[src] & active[dst] & (src != dst)
            indeg = np.bincount(dst[m], minlength=n)
            outdeg = np.bincount(src[m], minlength=n)
            trivial = active & ((indeg == 0) | (outdeg == 0))
            if not trivial.any():
                break
            scc[trivial] = ids[trivial]
            active &= ~trivial
        if not active.any():
            break
        m = active[src] & active[dst]
        s, d = src[m], dst[m]
        f = ids.copy()
        while True:
            before = f[d].min() if len(d) else 0, f.sum()
            np.minimum.at(f, d, f[s])
            if (f[d].min() if len(d) else 0, f.sum()) == before:
                break
        same = f[s] == f[d]
        s2, d2 = s[same], d[same]
        reach = np.zeros(n, bool)
        reach[active & (f == ids)] = True
        while True:
            before = int(reach.sum())
            np.logical_or.at(reach, s2, reach[d2])
            if int(reach.sum()) == before:
                break
        settled = active & reach
        scc[settled] = f[settled]
        active &= ~settled
    return scc


def strongly_connected_components(
    edges: rd.Dataset, driver_edge_cap: int = 2_000_000
) -> rd.Dataset:
    """SCC of the directed (src, dst) link graph — the web-graph bowtie
    primitive (mutually-reachable URL clusters: navigation cores, redirect
    rings, link farms). Returns (node, scc) where scc is the
    lexicographically smallest member URL, matching connected_components'
    labeling convention.

    Size-gated like the rest of the graph family: under ``driver_edge_cap``
    the distinct edge list collects once and the shared pure kernel runs on
    the driver; above it (or test-forced with driver_edge_cap=0) the
    at-scale path runs — _scc_distributed, the same trim + FW-BW-min
    coloring as per-round sharded min/max joins with every label table and
    the settled set kept as Datasets (driver sees changed counts only).
    Both are pure functions of the edge set, so they agree bit-for-bit."""
    edges = edges.materialize()
    n_edges = edges.count()
    empty = pa.table(
        {"node": pa.array([], pa.string()), "scc": pa.array([], pa.string())}
    )
    if n_edges == 0:
        return rd.from_arrow(empty)
    if n_edges > driver_edge_cap:
        return _scc_distributed(edges)
    tbl = pa.concat_tables(
        [
            pa.table(b)
            for b in edges.select_columns(["src", "dst"]).iter_batches(
                batch_format="pyarrow"
            )
        ]
    )
    s = np.asarray(tbl.column("src").to_pylist(), dtype=object)
    d = np.asarray(tbl.column("dst").to_pylist(), dtype=object)
    nodes, inv = np.unique(np.concatenate([s, d]), return_inverse=True)
    src = inv[: len(s)].astype(np.int64)
    dst = inv[len(s):].astype(np.int64)
    order = np.lexsort((src, dst))  # canonical edge order (twin parity)
    labels = scc_coloring(len(nodes), src[order], dst[order])
    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes, pa.string()),
                "scc": pa.array(nodes[labels], pa.string()),
            }
        )
    )


def _scc_distributed(
    edges: rd.Dataset,
    max_outer: int = 64,
    max_inner: int = 512,
    join_broadcast_cap: int = 500_000,
) -> rd.Dataset:
    """Fully distributed SCC — the same trim + FW-BW-min coloring as
    scc_coloring, expressed as per-round sharded min/max joins (the LPA /
    components machinery): node-label tables and the settled set stay
    Datasets end-to-end, the driver sees per-round CHANGED COUNTS only.
    Both paths are pure functions of the edge set, so their (node, scc)
    outputs are identical (pinned by tests on planted graphs and the real
    crawl graph).

    Per outer round: (1) distributed TRIM to fixpoint — nodes missing from
    the active edge list's src side (no out-edge) or dst side (no in-edge)
    are singleton SCCs, peeled via two distinct-side joins per round;
    (2) forward min-label propagation to fixpoint (attach f to edges by
    src, sharded per-dst min merge); (3) backward reach restricted to
    same-color edges (attach reach by dst, sharded per-src max merge);
    (4) reached nodes settle as their color, edges touching them drop.
    ``max_inner`` caps each propagation (diameter bound), ``max_outer``
    the settle rounds (#SCCs bound after trim) — both warn loudly."""
    import warnings

    import pyarrow.compute as pc

    from .dedup import _add_shard, keyed_attach

    edges = edges.select_columns(["src", "dst"]).materialize()
    n_edges = edges.count()
    n_sh = max(8, min(64, n_edges // 50_000 + 8))
    jcap = join_broadcast_cap

    def _shard_distinct(ds: rd.Dataset, col: str, out_cols) -> rd.Dataset:
        return (
            ds.map_batches(lambda t: _add_shard(t, col, n_sh), batch_format="pyarrow")
            .groupby("shard")
            .map_groups(
                lambda g: g.drop_duplicates(col)[out_cols],
                batch_format="pandas",
            )
            # normalize pandas-born blocks to Arrow: keyed_attach derives
            # its output schema from block types (see the R148 fix)
            .map_batches(lambda t: t.select(out_cols), batch_format="pyarrow")
        )

    def _rename(ds: rd.Dataset, names: list[str]) -> rd.Dataset:
        return ds.map_batches(
            lambda t: t.rename_columns(names), batch_format="pyarrow"
        )

    def _attach(
        left: rd.Dataset, right: rd.Dataset, key: str, cols: list[str]
    ) -> rd.Dataset:
        """keyed_attach with the right-side count supplied: small label /
        flag tables (≤ join_broadcast_cap rows) take the one-object-store
        broadcast probe instead of a shuffle — the difference between a
        map-only round and an all-to-all per iteration. Counting is cheap:
        every right side here is already materialized. Above the cap the
        sharded join path engages automatically (the at-scale route)."""
        right = right.materialize()
        return keyed_attach(
            left,
            right,
            key,
            cols,
            n_shards=n_sh,
            right_count=right.count(),
            broadcast_cap=jcap,
        )

    def _minmax_rounds(
        labels: rd.Dataset, ed: rd.Dataset, key_from: str, key_to: str, how: str
    ) -> rd.Dataset:
        """Propagate labels along ed (key_from → key_to) to fixpoint with a
        per-node min (how='min') or max ('max') sharded merge per round."""
        for _ in range(max_inner):
            prop = _attach(
                ed,
                _rename(labels, [key_from, "lab"]),
                key_from,
                ["lab"],
            ).map_batches(
                lambda t: pa.table(
                    {"node": t.column(key_to), "lab": t.column("lab"), "old": pa.array(np.zeros(t.num_rows, np.int8))}
                ),
                batch_format="pyarrow",
            )
            olds = labels.map_batches(
                lambda t: t.append_column("old", pa.array(np.ones(t.num_rows, np.int8))),
                batch_format="pyarrow",
            )

            def merge(g: pd.DataFrame, how=how) -> pd.DataFrame:
                agg = g.groupby("node")["lab"].agg(how)
                base = g[g["old"] == 1].set_index("node")["lab"]
                new = agg.loc[base.index]
                chg = (new != base).to_numpy()
                out = pd.DataFrame({"node": base.index.to_numpy(object), "lab": new.to_numpy(object)})
                out["chg"] = chg.astype(np.int64)
                return out

            merged = (
                olds.union(_rename(prop, ["node", "lab", "old"]))
                .map_batches(lambda t: _add_shard(t, "node", n_sh), batch_format="pyarrow")
                .groupby("shard")
                .map_groups(
                    lambda g: merge(g.drop(columns=["shard"])), batch_format="pandas"
                )
                .materialize()
            )
            changed = merged.sum("chg") or 0
            labels = _rebase(
                merged.map_batches(
                    lambda t: t.select(["node", "lab"]), batch_format="pyarrow"
                ).materialize()
            ).materialize()
            if changed == 0:
                break
        else:
            warnings.warn(
                f"_scc_distributed: propagation hit max_inner={max_inner} "
                "without fixpoint — result may split SCCs",
                stacklevel=2,
            )
        return labels

    active_edges = edges
    active_nodes = _shard_distinct(
        edges.map_batches(
            lambda t: pa.table(
                {
                    "node": pa.concat_arrays(
                        [
                            t.column("src").combine_chunks(),
                            t.column("dst").combine_chunks(),
                        ]
                    )
                }
            ),
            batch_format="pyarrow",
        ),
        "node",
        ["node"],
    ).materialize()
    settled: list[rd.Dataset] = []

    def _drop_settled_edges(ed: rd.Dataset, gone: rd.Dataset) -> rd.Dataset:
        """Remove edges with either endpoint in *gone* (node-keyed)."""
        gmark = gone.map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("node"),
                    "gone": pa.array(np.ones(t.num_rows, np.int8)),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        ed = _attach(
            ed,
            _rename(gmark, ["src", "gone_s"]),
            "src",
            ["gone_s"],
        )
        ed = _attach(
            ed,
            _rename(gmark, ["dst", "gone_d"]),
            "dst",
            ["gone_d"],
        )
        return ed.map_batches(
            lambda t: t.filter(
                pc.and_(
                    pc.is_null(t.column("gone_s")), pc.is_null(t.column("gone_d"))
                )
            ).select(["src", "dst"]),
            batch_format="pyarrow",
        ).materialize()

    for _outer in range(max_outer):
        if active_nodes.count() == 0:
            break
        # ---- TRIM to fixpoint
        while True:
            nonself = active_edges.map_batches(
                lambda t: t.filter(pc.not_equal(t.column("src"), t.column("dst"))),
                batch_format="pyarrow",
            )
            outs = _shard_distinct(
                nonself.map_batches(
                    lambda t: pa.table({"node": t.column("src")}), batch_format="pyarrow"
                ),
                "node",
                ["node"],
            ).map_batches(
                lambda t: t.append_column("has_out", pa.array(np.ones(t.num_rows, np.int8))),
                batch_format="pyarrow",
            )
            ins = _shard_distinct(
                nonself.map_batches(
                    lambda t: pa.table({"node": t.column("dst")}), batch_format="pyarrow"
                ),
                "node",
                ["node"],
            ).map_batches(
                lambda t: t.append_column("has_in", pa.array(np.ones(t.num_rows, np.int8))),
                batch_format="pyarrow",
            )
            flagged = _attach(
                keyed_attach(
                    active_nodes, outs, "node", ["has_out"]
                ),
                ins,
                "node",
                ["has_in"],
            ).materialize()
            trivial = flagged.map_batches(
                lambda t: (
                    lambda tt: pa.table(
                        {"node": tt.column("node"), "scc": tt.column("node")}
                    )
                )(
                    t.filter(
                        pc.or_(
                            pc.is_null(t.column("has_out")),
                            pc.is_null(t.column("has_in")),
                        )
                    )
                ),
                batch_format="pyarrow",
            ).materialize()
            if trivial.count() == 0:
                break
            settled.append(trivial)
            active_nodes = _rebase(
                flagged.map_batches(
                    lambda t: t.filter(
                        pc.and_(
                            pc.is_valid(t.column("has_out")),
                            pc.is_valid(t.column("has_in")),
                        )
                    ).select(["node"]),
                    batch_format="pyarrow",
                ).materialize()
            ).materialize()
            active_edges = _drop_settled_edges(active_edges, trivial.select_columns(["node"]))
            if active_nodes.count() == 0:
                break
        if active_nodes.count() == 0:
            break
        # ---- forward min to fixpoint
        f = active_nodes.map_batches(
            lambda t: pa.table({"node": t.column("node"), "lab": t.column("node")}),
            batch_format="pyarrow",
        ).materialize()
        f = _minmax_rounds(f, active_edges, "src", "dst", "min")
        # ---- same-color edges
        ce = _attach(
            active_edges, _rename(f, ["src", "f_s"]), "src", ["f_s"]
        )
        ce = _attach(
            ce, _rename(f, ["dst", "f_d"]), "dst", ["f_d"]
        )
        ce = ce.map_batches(
            lambda t: t.filter(pc.equal(t.column("f_s"), t.column("f_d"))).select(
                ["src", "dst"]
            ),
            batch_format="pyarrow",
        ).materialize()
        # ---- backward reach (labels "1"/"0" as strings, max-merge)
        r = f.map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("node"),
                    "lab": pc.if_else(
                        pc.equal(t.column("node"), t.column("lab")), "1", "0"
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        r = _minmax_rounds(r, ce, "dst", "src", "max")
        # ---- settle reached nodes as their color
        fr = _attach(
            f, _rename(r, ["node", "r"]), "node", ["r"]
        ).materialize()
        new_settled = fr.map_batches(
            lambda t: (
                lambda tt: pa.table({"node": tt.column("node"), "scc": tt.column("lab")})
            )(t.filter(pc.equal(t.column("r"), "1"))),
            batch_format="pyarrow",
        ).materialize()
        settled.append(new_settled)
        active_nodes = _rebase(
            fr.map_batches(
                lambda t: t.filter(pc.not_equal(t.column("r"), "1")).select(["node"]),
                batch_format="pyarrow",
            ).materialize()
        ).materialize()
        active_edges = _drop_settled_edges(
            active_edges, new_settled.select_columns(["node"])
        )
    else:
        if active_nodes.count() > 0:
            warnings.warn(
                f"_scc_distributed: {active_nodes.count()} nodes unsettled "
                f"after max_outer={max_outer} rounds",
                stacklevel=2,
            )
    if not settled:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.string()), "scc": pa.array([], pa.string())})
        )
    out = settled[0]
    for s in settled[1:]:
        out = out.union(s)
    return out


def bowtie_kernel(n: int, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Pure bowtie-decomposition kernel (Broder et al. 2000, "Graph
    structure in the web") over a directed int edge list: classify every
    node relative to the LARGEST SCC (ties → smallest scc label) as
      CORE (in the giant SCC), IN (reaches the core), OUT (reached from
      the core), OTHER (tendrils/tubes/disconnected — neither).
    Deterministic pure function of the edge set: the SCC labels come from
    scc_coloring and the two reachability closures are boolean fixpoints.
    (IN ∩ OUT is provably empty outside the core — mutual reachability
    with the core would put the node in the core SCC — so the class
    assignment needs no precedence rule.)
    Returns an int8 class array: 0=CORE 1=IN 2=OUT 3=OTHER."""
    cls = np.full(n, 3, np.int8)
    if n == 0:
        return cls
    scc = scc_coloring(n, src, dst)
    labs, cnt = np.unique(scc, return_counts=True)
    core_lab = labs[np.lexsort((labs, -cnt))[0]]
    core = scc == core_lab
    fwd = core.copy()  # reached FROM the core
    while True:
        before = int(fwd.sum())
        np.logical_or.at(fwd, dst, fwd[src])
        if int(fwd.sum()) == before:
            break
    bwd = core.copy()  # reaches the core
    while True:
        before = int(bwd.sum())
        np.logical_or.at(bwd, src, bwd[dst])
        if int(bwd.sum()) == before:
            break
    cls[fwd & ~core] = 2
    cls[bwd & ~core] = 1
    cls[core] = 0
    return cls


_BOWTIE_NAMES = np.array(["CORE", "IN", "OUT", "OTHER"], dtype=object)


def bowtie_classes(
    edges: rd.Dataset, driver_edge_cap: int = 2_000_000
) -> rd.Dataset:
    """Web-bowtie decomposition of the directed link graph → (node, cls in
    CORE/IN/OUT/OTHER). Same analysis-scale gate as the SCC wrapper: edges
    collect under ``driver_edge_cap`` and the pure kernel runs once; above
    the cap, compute scc via _scc_distributed and run the two boolean
    reachability closures as the same per-round broadcast/sharded max
    joins (reach flags are labels under max-merge — the exact _minmax_rounds
    primitive), seeded from the largest-SCC label. Loud ValueError until a
    caller needs that composition wired."""
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.string()), "cls": pa.array([], pa.string())})
        )
    if n_edges > driver_edge_cap:
        raise ValueError(
            f"bowtie_classes: {n_edges} edges exceeds driver_edge_cap="
            f"{driver_edge_cap}; run scc via _scc_distributed and the two "
            "reach closures via the _minmax_rounds max-merge (documented)"
        )
    tbl = pa.concat_tables(
        [
            pa.table(b)
            for b in edges.select_columns(["src", "dst"]).iter_batches(
                batch_format="pyarrow"
            )
        ]
    )
    s = np.asarray(tbl.column("src").to_pylist(), dtype=object)
    d = np.asarray(tbl.column("dst").to_pylist(), dtype=object)
    nodes, inv = np.unique(np.concatenate([s, d]), return_inverse=True)
    src = inv[: len(s)].astype(np.int64)
    dst = inv[len(s):].astype(np.int64)
    order = np.lexsort((src, dst))
    cls = bowtie_kernel(len(nodes), src[order], dst[order])
    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes, pa.string()),
                "cls": pa.array(_BOWTIE_NAMES[cls], pa.string()),
            }
        )
    )


# ---------------------------------------------------------------------------
# Approximate neighborhood function / effective diameter (ANF: Palmer,
# Gibbons & Faloutsos, KDD 2002; HyperBall: Boldi & Vigna, "In-core
# computation of geometric centralities with HyperBall", ICDM 2013 wksp).
# N(t) = Σ_x |ball_out(x, t)| estimated by one HyperLogLog register array
# per node that max-merges its out-neighbors' arrays each round — the
# at-scale way to read a web graph's effective diameter without an
# all-pairs BFS. Estimates are floored to 2^20 fixed point per node before
# summing, so every reported value is an exact integer sum — a pure
# function of the edge set under any partitioning (and bit-identical
# between the driver kernel and the distributed register rounds).
# ---------------------------------------------------------------------------

_ANF_FP = 1 << 20


def _anf_init_regs(nodes: np.ndarray, p: int) -> np.ndarray:
    """(n, 2^p) uint8 register matrix: node x starts as the HLL of {x},
    hashed from the node STRING (pandas fixed-key siphash — identical on
    the driver kernel and inside any worker)."""
    m = 1 << p
    h = pd.util.hash_array(np.asarray(nodes, dtype=object))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    from .sketches import _clz64

    rank = np.minimum(_clz64(h << np.uint64(p)) + 1, 64 - p + 1).astype(np.uint8)
    reg = np.zeros((len(nodes), m), dtype=np.uint8)
    if len(nodes):
        reg[np.arange(len(nodes)), idx] = rank
    return reg


def _anf_est_fp(reg: np.ndarray) -> np.ndarray:
    """Per-row HLL estimate (standard + linear-counting small range), then
    floor to 2^20 fixed point — int64 per node, exactly summable."""
    m = reg.shape[1]
    alpha = 0.7213 / (1 + 1.079 / m)
    s = np.sum(np.exp2(-reg.astype(np.float64)), axis=1)
    est = alpha * m * m / s
    zeros = (reg == 0).sum(axis=1)
    lc = m * np.log(m / np.maximum(zeros, 1))
    est = np.where((est <= 2.5 * m) & (zeros > 0), lc, est)
    return np.floor(est * _ANF_FP).astype(np.int64)


def anf_kernel(
    nodes: np.ndarray, src: np.ndarray, dst: np.ndarray,
    p: int = 6, t_max: int = 16,
) -> pd.DataFrame:
    """Pure HyperBall kernel over int-indexed directed edges (src→dst,
    indices into ``nodes``): synchronous (Jacobi) rounds of
    reg[x] ← max(reg[x], reg[y]∀ x→y) until fixpoint or ``t_max``.
    Returns one row per radius t: (t, nf_fp, nf_est) plus the effective
    diameter (smallest t with 10·N(t) ≥ 9·N(t_last), integer arithmetic)
    repeated on every row. Shared by the distributed wrapper and the
    serial oracle twin."""
    reg = _anf_init_regs(nodes, p)
    rows = [(0, int(_anf_est_fp(reg).sum()))]
    for t in range(1, t_max + 1):
        new = reg.copy()
        if len(src):
            np.maximum.at(new, src, reg[dst])
        if np.array_equal(new, reg):
            break
        reg = new
        rows.append((t, int(_anf_est_fp(reg).sum())))
    nf_last = rows[-1][1]
    eff = next(t for t, nf in rows if 10 * nf >= 9 * nf_last)
    return pd.DataFrame(
        {
            "t": np.array([r[0] for r in rows], np.int64),
            "nf_fp": np.array([r[1] for r in rows], np.int64),
            "nf_est": np.array([r[1] / _ANF_FP for r in rows], np.float64),
            "eff_diameter": np.full(len(rows), eff, np.int64),
        }
    )


def neighborhood_function(
    edges: rd.Dataset, p: int = 6, t_max: int = 16,
    driver_cap: int = 2_000_000,
) -> rd.Dataset:
    """ANF/HyperBall over a (src, dst) string-keyed edge Dataset: the
    neighborhood-function curve N(t) and the graph's effective diameter.

    Size-gated like every graph op here: under ``driver_cap`` edges the
    distinct edge list crosses the wire once and the kernel runs in numpy;
    above it (test-forced via driver_cap=0) registers stay a Dataset of
    (node, 2^p-byte) rows and each round is two co-shard exchanges —
    (1) regs meet out-edges in hash(dst) shards, emitting (src, reg[dst]);
    (2) candidates meet current regs in hash(node) shards for an
    elementwise-max merge — with per-round driver traffic bounded by one
    (changed, Σest) pair per shard. Register volume is m bytes/node
    (p=6 → 64 B; 10^10 nodes ≈ 640 GB spread over the cluster), the real
    HyperBall cost, and rounds stop at the fixpoint ≤ graph diameter."""
    edges = edges.materialize()
    n_edges = edges.count()
    empty = pd.DataFrame(
        {
            "t": pd.Series([], dtype=np.int64),
            "nf_fp": pd.Series([], dtype=np.int64),
            "nf_est": pd.Series([], dtype=np.float64),
            "eff_diameter": pd.Series([], dtype=np.int64),
        }
    )
    if n_edges == 0:
        return rd.from_pandas(empty)
    if n_edges <= driver_cap:
        ed = edges.to_pandas()
        nodes, inv = np.unique(
            np.concatenate([ed["src"].to_numpy(), ed["dst"].to_numpy()]),
            return_inverse=True,
        )
        return rd.from_pandas(
            anf_kernel(nodes, inv[: len(ed)], inv[len(ed):], p, t_max)
        )

    n_sh = cluster_shards()
    edges = edges.map_batches(lambda t: t, batch_format="pyarrow")

    def init_regs(t: pa.Table) -> pa.Table:
        nodes = t.column("node").to_numpy(zero_copy_only=False)
        reg = _anf_init_regs(nodes, p)
        return pa.table(
            {
                "node": t.column("node"),
                "reg": pa.array([r.tobytes() for r in reg], pa.binary()),
            }
        )

    nodemap, _n = _node_ids(edges)
    regs = (
        nodemap.map_batches(
            lambda t: pa.table({"node": t.column("node")}), batch_format="pyarrow"
        )
        .map_batches(init_regs, batch_format="pyarrow")
        .materialize()
    )
    m = 1 << p

    def est_partial(t: pa.Table) -> pa.Table:
        reg = np.stack(
            [np.frombuffer(b, np.uint8) for b in t.column("reg").to_pylist()]
        ) if t.num_rows else np.zeros((0, m), np.uint8)
        return pa.table({"s": pa.array([int(_anf_est_fp(reg).sum())], pa.int64())})

    def nf_of(ds: rd.Dataset) -> int:
        parts = ds.map_batches(est_partial, batch_format="pyarrow").to_pandas()
        return int(parts["s"].sum())

    rows = [(0, nf_of(regs))]
    for t in range(1, t_max + 1):
        # (1) regs meet out-edges in hash(dst) shards → (src, reg[dst])
        tagged = regs.map_batches(
            lambda tb: pa.table(
                {
                    "key": tb.column("node"),
                    "src": pa.array([""] * tb.num_rows, pa.string()),
                    "reg": tb.column("reg"),
                }
            ),
            batch_format="pyarrow",
        ).union(
            edges.map_batches(
                lambda tb: pa.table(
                    {
                        "key": tb.column("dst"),
                        "src": tb.column("src").cast(pa.string()),
                        "reg": pa.array([b""] * tb.num_rows, pa.binary()),
                    }
                ),
                batch_format="pyarrow",
            )
        )

        def emit(g: pd.DataFrame) -> pd.DataFrame:
            have = g[g["src"] == ""]
            lut = dict(zip(have["key"], have["reg"]))
            ed = g[g["src"] != ""]
            out_reg = ed["key"].map(lut)
            keep = out_reg.notna()
            return pd.DataFrame(
                {"node": ed.loc[keep, "src"].to_numpy(), "reg": out_reg[keep].to_numpy()}
            )

        cands = (
            tagged.map_batches(
                lambda tb: _add_shard(tb, "key", n_sh), batch_format="pyarrow"
            )
            .groupby("shard")
            .map_groups(lambda g: emit(g.drop(columns=["shard"])), batch_format="pandas")
            .map_batches(lambda tb: tb, batch_format="pyarrow")
        )

        # (2) merge candidates into regs in hash(node) shards
        def merge(g: pd.DataFrame) -> pd.DataFrame:
            order = np.argsort(g["node"].to_numpy(), kind="stable")
            nodes_s = g["node"].to_numpy()[order]
            mats = np.stack([np.frombuffer(b, np.uint8) for b in g["reg"].to_numpy()[order]])
            brk = np.ones(len(nodes_s), bool)
            brk[1:] = nodes_s[1:] != nodes_s[:-1]
            starts = np.flatnonzero(brk)
            merged = np.maximum.reduceat(mats, starts, axis=0)
            # changed = merged differs from the CURRENT reg (the row that
            # came from `regs`; candidates never cover nodes regs lacks)
            cur = np.stack(
                [np.frombuffer(b, np.uint8) for b in g.loc[g["is_reg"] == 1, "reg"]]
            )
            cur_nodes = g.loc[g["is_reg"] == 1, "node"].to_numpy()
            cur_order = np.argsort(cur_nodes, kind="stable")
            changed = int((merged != cur[cur_order]).any(axis=1).sum())
            return pd.DataFrame(
                {
                    "node": nodes_s[brk],
                    "reg": [r.tobytes() for r in merged],
                    "changed": np.full(brk.sum(), 0, np.int64),
                }
            ).assign(changed=lambda df: df["changed"].where(df.index > 0, changed))

        both = regs.map_batches(
            lambda tb: tb.append_column("is_reg", pa.array([1] * tb.num_rows, pa.int8())),
            batch_format="pyarrow",
        ).union(
            cands.map_batches(
                lambda tb: tb.append_column("is_reg", pa.array([0] * tb.num_rows, pa.int8())),
                batch_format="pyarrow",
            )
        )
        new_regs = (
            both.map_batches(lambda tb: _add_shard(tb, "node", n_sh), batch_format="pyarrow")
            .groupby("shard")
            .map_groups(
                lambda g: merge(g.drop(columns=["shard"])), batch_format="pandas"
            )
            .materialize()
        )
        changed_total = int(
            new_regs.map_batches(
                lambda tb: pa.table(
                    {"c": pa.array([int(np.sum(tb.column("changed").to_numpy()))], pa.int64())}
                ),
                batch_format="pyarrow",
            ).to_pandas()["c"].sum()
        )
        regs = _rebase(
            new_regs.map_batches(
                lambda tb: tb.select(["node", "reg"]), batch_format="pyarrow"
            ).materialize()
        )
        if changed_total == 0:
            break
        rows.append((t, nf_of(regs)))

    nf_last = rows[-1][1]
    eff = next(t for t, nf in rows if 10 * nf >= 9 * nf_last)
    return rd.from_pandas(
        pd.DataFrame(
            {
                "t": np.array([r[0] for r in rows], np.int64),
                "nf_fp": np.array([r[1] for r in rows], np.int64),
                "nf_est": np.array([r[1] / _ANF_FP for r in rows], np.float64),
                "eff_diameter": np.full(len(rows), eff, np.int64),
            }
        )
    )


def harmonic_kernel(
    nodes: np.ndarray, src: np.ndarray, dst: np.ndarray,
    p: int = 6, t_max: int = 16,
) -> np.ndarray:
    """Pure harmonic-centrality kernel (the metric HyperBall was built
    for — Boldi & Vigna 2013): H(y) = Σ_{x≠y} 1/d(x,y), estimated per
    round as hc[y] += (|ball_in(y,t)| − |ball_in(y,t−1)|)/t with the ball
    sizes in 2^20 fixed point and the division an int64 floor — so the
    per-node result is a pure integer function of the edge set. Pass the
    edge arrays as given (src→dst): in-balls grow by propagating registers
    ALONG edge direction, reg[dst] ← max(reg[dst], reg[src]). Returns
    hc_fp int64 per node (aligned with ``nodes``)."""
    reg = _anf_init_regs(nodes, p)
    est_prev = _anf_est_fp(reg)
    hc = np.zeros(len(nodes), np.int64)
    for t in range(1, t_max + 1):
        new = reg.copy()
        if len(src):
            np.maximum.at(new, dst, reg[src])
        if np.array_equal(new, reg):
            break
        reg = new
        est = _anf_est_fp(reg)
        hc += (est - est_prev) // t
        est_prev = est
    return hc


def harmonic_centrality(
    edges: rd.Dataset, p: int = 6, t_max: int = 16, k: int = 20,
    driver_cap: int = 2_000_000,
) -> pd.DataFrame:
    """Top-k nodes of a (src, dst) string-keyed edge Dataset by estimated
    harmonic centrality. Size-gated: the driver kernel under ``driver_cap``
    edges; above it (test-forced via driver_cap=0) the SAME register
    rounds as neighborhood_function run with the tag direction swapped
    (registers flow src→dst) and an hc_fp column accumulated in the merge
    shard from the per-node old/new estimates — per-block top-k partials
    then bound the driver collect to n_blocks·k rows."""
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return pd.DataFrame(
            {
                "node": pd.Series([], dtype=object),
                "hc_fp": pd.Series([], dtype=np.int64),
            }
        )
    if n_edges <= driver_cap:
        ed = edges.to_pandas()
        nodes, inv = np.unique(
            np.concatenate([ed["src"].to_numpy(), ed["dst"].to_numpy()]),
            return_inverse=True,
        )
        hc = harmonic_kernel(nodes, inv[: len(ed)], inv[len(ed):], p, t_max)
        order = np.lexsort((nodes, -hc))[:k]
        return pd.DataFrame(
            {"node": nodes[order], "hc_fp": hc[order].astype(np.int64)}
        ).reset_index(drop=True)

    n_sh = cluster_shards()
    edges = edges.map_batches(lambda t: t, batch_format="pyarrow")
    m = 1 << p

    def init_regs(t: pa.Table) -> pa.Table:
        nodes = t.column("node").to_numpy(zero_copy_only=False)
        reg = _anf_init_regs(nodes, p)
        return pa.table(
            {
                "node": t.column("node"),
                "reg": pa.array([r.tobytes() for r in reg], pa.binary()),
                "hc": pa.array(np.zeros(t.num_rows, np.int64)),
            }
        )

    nodemap, _n = _node_ids(edges)
    regs = (
        nodemap.map_batches(
            lambda t: pa.table({"node": t.column("node")}), batch_format="pyarrow"
        )
        .map_batches(init_regs, batch_format="pyarrow")
        .materialize()
    )

    for t in range(1, t_max + 1):
        # registers flow ALONG edges: regs meet edges in hash(src) shards,
        # emitting (dst, reg[src])
        tagged = regs.map_batches(
            lambda tb: pa.table(
                {
                    "key": tb.column("node"),
                    "dst": pa.array([""] * tb.num_rows, pa.string()),
                    "reg": tb.column("reg"),
                }
            ),
            batch_format="pyarrow",
        ).union(
            edges.map_batches(
                lambda tb: pa.table(
                    {
                        "key": tb.column("src").cast(pa.string()),
                        "dst": tb.column("dst").cast(pa.string()),
                        "reg": pa.array([b""] * tb.num_rows, pa.binary()),
                    }
                ),
                batch_format="pyarrow",
            )
        )

        def emit(g: pd.DataFrame) -> pd.DataFrame:
            have = g[g["dst"] == ""]
            lut = dict(zip(have["key"], have["reg"]))
            ed = g[g["dst"] != ""]
            out_reg = ed["key"].map(lut)
            keep = out_reg.notna()
            return pd.DataFrame(
                {
                    "node": ed.loc[keep, "dst"].to_numpy(),
                    "reg": out_reg[keep].to_numpy(),
                }
            )

        cands = (
            tagged.map_batches(
                lambda tb: _add_shard(tb, "key", n_sh), batch_format="pyarrow"
            )
            .groupby("shard")
            .map_groups(lambda g: emit(g.drop(columns=["shard"])), batch_format="pandas")
            .map_batches(lambda tb: tb, batch_format="pyarrow")
        )

        def merge(g: pd.DataFrame, t=t) -> pd.DataFrame:
            order = np.argsort(g["node"].to_numpy(), kind="stable")
            nodes_s = g["node"].to_numpy()[order]
            mats = np.stack(
                [np.frombuffer(b, np.uint8) for b in g["reg"].to_numpy()[order]]
            )
            brk = np.ones(len(nodes_s), bool)
            brk[1:] = nodes_s[1:] != nodes_s[:-1]
            starts = np.flatnonzero(brk)
            merged = np.maximum.reduceat(mats, starts, axis=0)
            cur_mask = g["is_reg"].to_numpy()[order] == 1
            cur = mats[cur_mask]
            est_old = _anf_est_fp(cur)
            est_new = _anf_est_fp(merged)
            hc_prev = g["hc"].to_numpy()[order][cur_mask].astype(np.int64)
            hc_new = hc_prev + (est_new - est_old) // t
            changed = int((merged != cur).any(axis=1).sum())
            out = pd.DataFrame(
                {
                    "node": nodes_s[brk],
                    "reg": [r.tobytes() for r in merged],
                    "hc": hc_new,
                    "changed": np.zeros(brk.sum(), np.int64),
                }
            )
            if len(out):
                out.iloc[0, out.columns.get_loc("changed")] = changed
            return out

        both = regs.map_batches(
            lambda tb: tb.append_column("is_reg", pa.array([1] * tb.num_rows, pa.int8())),
            batch_format="pyarrow",
        ).union(
            cands.map_batches(
                lambda tb: pa.table(
                    {
                        "node": tb.column("node"),
                        "reg": tb.column("reg"),
                        "hc": pa.array(np.zeros(tb.num_rows, np.int64)),
                        "is_reg": pa.array(np.zeros(tb.num_rows, np.int8)),
                    }
                ),
                batch_format="pyarrow",
            )
        )
        new_regs = (
            both.map_batches(lambda tb: _add_shard(tb, "node", n_sh), batch_format="pyarrow")
            .groupby("shard")
            .map_groups(
                lambda g, t=t: merge(g.drop(columns=["shard"]), t), batch_format="pandas"
            )
            .materialize()
        )
        changed_total = int(
            new_regs.map_batches(
                lambda tb: pa.table(
                    {"c": pa.array([int(np.sum(tb.column("changed").to_numpy()))], pa.int64())}
                ),
                batch_format="pyarrow",
            ).to_pandas()["c"].sum()
        )
        regs = _rebase(
            new_regs.map_batches(
                lambda tb: tb.select(["node", "reg", "hc"]), batch_format="pyarrow"
            ).materialize()
        )
        if changed_total == 0:
            break

    def topk(tb: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "node": tb.column("node").to_numpy(zero_copy_only=False),
                "hc_fp": tb.column("hc").to_numpy().astype(np.int64),
            }
        )
        return df.sort_values(["hc_fp", "node"], ascending=[False, True]).head(k)

    parts = regs.map_batches(topk, batch_format="pyarrow").to_pandas()
    return (
        parts.sort_values(["hc_fp", "node"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def ktruss_kernel(a: np.ndarray, b: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Pure k-truss kernel over undirected distinct a<b int edges: peel
    edges whose support (triangles containing the edge, within the
    CURRENT subgraph) is < k−2 until fixpoint (Cohen 2008, "Trusses:
    cohesive subgraphs for social network analysis"). Support counting is
    the same oriented wedge-join as `triangles` (wedges out of the lowest
    vertex, searchsorted membership probe); the result is the canonical
    maximal subgraph — a pure function of the edge set. Shared by the
    distributed wrapper and the serial oracle twin."""
    a = np.asarray(a, np.int64).copy()
    b = np.asarray(b, np.int64).copy()
    while len(a):
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        keys = (a << np.int64(32)) | b
        sup = np.zeros(len(a), np.int64)
        ua, starts = np.unique(a, return_index=True)
        bounds = np.append(starts, len(a))
        for i in range(len(ua)):
            s, e = bounds[i], bounds[i + 1]
            d = e - s
            if d < 2:
                continue
            nb = b[s:e]
            ii, jj = np.triu_indices(d, k=1)
            wk = (nb[ii] << np.int64(32)) | nb[jj]
            pos = np.searchsorted(keys, wk)
            hit = (pos < len(keys)) & (keys[np.minimum(pos, len(keys) - 1)] == wk)
            if not hit.any():
                continue
            np.add.at(sup, pos[hit], 1)
            np.add.at(sup, s + ii[hit], 1)
            np.add.at(sup, s + jj[hit], 1)
        keep = sup >= (k - 2)
        if keep.all():
            break
        a, b = a[keep], b[keep]
    return a, b


def k_truss(
    edges: rd.Dataset,
    k: int,
    driver_cap: int = 2_000_000,
    max_iters: int = 1000,
) -> rd.Dataset:
    """k-truss of an undirected (a, b) edge Dataset: the edge-wise sibling
    of k_core (triangle membership, not degree — a strictly stronger
    cohesion signal for link-farm / community cores). Size-gated: the
    kernel under ``driver_cap`` edges; above it (test-forced via
    driver_cap=0) each round runs the existing distributed `triangles`
    op on the surviving edges, folds each triangle into its three edge
    keys (one hash(key) shard sum = per-edge support), co-shard-joins
    support back onto the edges, and drops sup < k−2 — `_rebase` between
    rounds keeps iteration cost flat; terminates when a round drops
    nothing (max_iters is a loud backstop)."""
    cur = edges.materialize()
    empty = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
    )
    if cur.count() == 0:
        return rd.from_arrow(empty)
    if cur.count() <= driver_cap:
        ed = cur.to_pandas()
        ka, kb = ktruss_kernel(ed["a"].to_numpy(), ed["b"].to_numpy(), k)
        return rd.from_arrow(
            pa.table({"a": pa.array(ka), "b": pa.array(kb)})
        )

    import pyarrow.compute as pc

    n_sh = cluster_shards()
    for _ in range(max_iters):
        n_before = cur.count()
        if n_before == 0:
            break
        tri = triangles(cur, broadcast_cap=0).materialize()

        def tri_to_edges(t: pa.Table) -> pa.Table:
            aa = t.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
            bb = t.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
            cc = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "a": pa.array(np.concatenate([aa, aa, bb])),
                    "b": pa.array(np.concatenate([bb, cc, cc])),
                    "sup": pa.array(np.ones(3 * len(aa), np.int64)),
                }
            )

        sup_rows = tri.map_batches(tri_to_edges, batch_format="pyarrow")
        tagged = cur.map_batches(
            lambda t: pa.table(
                {
                    "a": t.column("a").cast(pa.int64()),
                    "b": t.column("b").cast(pa.int64()),
                    "sup": pa.array(np.full(t.num_rows, -1, np.int64)),
                }
            ),
            batch_format="pyarrow",
        ).union(sup_rows)

        def key_shard(t: pa.Table) -> pa.Table:
            keys = pc.add(
                pc.multiply(t.column("a"), np.int64(1) << np.int64(32)),
                t.column("b"),
            )
            return _add_shard(t.append_column("_k", keys), "_k", n_sh).drop_columns(["_k"])

        def filter_shard(g: pd.DataFrame, k=k) -> pd.DataFrame:
            sup = g[g["sup"] > 0].groupby(["a", "b"], as_index=False)["sup"].sum()
            ed = g.loc[g["sup"] < 0, ["a", "b"]].drop_duplicates()
            m = ed.merge(sup, on=["a", "b"], how="left").fillna({"sup": 0})
            keep = m[m["sup"] >= (k - 2)]
            return keep[["a", "b"]].astype(np.int64)

        new = (
            tagged.map_batches(key_shard, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(
                lambda g: filter_shard(g.drop(columns=["shard"])), batch_format="pandas"
            )
            .materialize()
        )
        n_after = new.count()
        cur = _rebase(new)
        if n_after == n_before:
            break
    return cur


_SSSP_INF = np.int64(1) << np.int64(62)


def sssp_kernel(
    n: int, src: np.ndarray, dst: np.ndarray, w: np.ndarray,
    seed_idx: np.ndarray,
) -> np.ndarray:
    """Pure single/multi-source shortest-path kernel over int-indexed
    directed edges with nonnegative int64 weights: synchronous Bellman-
    Ford relaxation (dist[dst] ← min(dist[dst], dist[src]+w)) to fixpoint
    — min-merge is order- and partitioning-free, so the result is a pure
    function of the weighted edge set and the distributed rounds must
    agree bit-for-bit. Returns int64 distances, _SSSP_INF = unreachable."""
    dist = np.full(n, _SSSP_INF, np.int64)
    if len(seed_idx):
        dist[seed_idx] = 0
    while True:
        cand = dist.copy()
        if len(src):
            np.minimum.at(cand, dst, dist[src] + w)
        if np.array_equal(cand, dist):
            return dist
        dist = cand


def weighted_sssp(
    edges: rd.Dataset,
    seeds: list[str],
    driver_cap: int = 2_000_000,
    max_rounds: int = 10_000,
) -> rd.Dataset:
    """Weighted shortest paths from a seed set over a (src, dst, w)
    string-keyed edge Dataset with nonnegative int64 weights — for the
    crawl graph with w = target fetch latency this is the minimum crawl
    cost to reach every page. Returns (node, cost_ms) for reachable nodes.

    Size-gated: kernel under ``driver_cap`` edges; above it (test-forced
    via driver_cap=0) distances stay a Dataset and each round is two
    co-shard exchanges — dist meets out-edges in hash(src) shards emitting
    (dst, dist+w) candidates, candidates min-merge with dist in hash(node)
    shards — driver sees one changed-count per shard per round; rounds
    stop at the fixpoint ≤ the shortest-path tree's hop depth."""
    edges = edges.materialize()
    n_edges = edges.count()
    empty = pa.table(
        {"node": pa.array([], pa.string()), "cost_ms": pa.array([], pa.int64())}
    )
    if n_edges == 0 or not seeds:
        return rd.from_arrow(empty)
    if n_edges <= driver_cap:
        ed = edges.to_pandas()
        nodes, inv = np.unique(
            np.concatenate([ed["src"].to_numpy(), ed["dst"].to_numpy()]),
            return_inverse=True,
        )
        seed_arr = np.asarray(sorted(set(seeds)), dtype=object)
        pos = np.searchsorted(nodes, seed_arr)
        ok = (pos < len(nodes)) & (nodes[np.minimum(pos, len(nodes) - 1)] == seed_arr)
        dist = sssp_kernel(
            len(nodes), inv[: len(ed)], inv[len(ed):],
            ed["w"].to_numpy().astype(np.int64), pos[ok],
        )
        # seeds not in the graph still label 0 (the bfs_distances policy —
        # and what the distributed dist table does by construction)
        reach = dist < _SSSP_INF
        extra = ~np.isin(nodes[reach], seed_arr)
        out_nodes = list(seed_arr) + nodes[reach][extra].tolist()
        out_cost = [0] * len(seed_arr) + dist[reach][extra].tolist()
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array(np.asarray(out_nodes, dtype=object), pa.string()),
                    "cost_ms": pa.array(np.asarray(out_cost, np.int64)),
                }
            )
        )

    n_sh = cluster_shards()
    edges = edges.map_batches(lambda t: t, batch_format="pyarrow")
    dist = rd.from_arrow(
        pa.table(
            {
                "node": pa.array(sorted(set(seeds)), pa.string()),
                "cost_ms": pa.array([0] * len(set(seeds)), pa.int64()),
            }
        )
    ).materialize()

    for _ in range(max_rounds):
        tagged = dist.map_batches(
            lambda tb: pa.table(
                {
                    "key": tb.column("node"),
                    "dst": pa.array([""] * tb.num_rows, pa.string()),
                    "w": tb.column("cost_ms"),
                }
            ),
            batch_format="pyarrow",
        ).union(
            edges.map_batches(
                lambda tb: pa.table(
                    {
                        "key": tb.column("src").cast(pa.string()),
                        "dst": tb.column("dst").cast(pa.string()),
                        "w": tb.column("w").cast(pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
        )

        def relax(g: pd.DataFrame) -> pd.DataFrame:
            have = g[g["dst"] == ""]
            lut = dict(zip(have["key"], have["w"]))
            ed = g[g["dst"] != ""]
            base = ed["key"].map(lut)
            keep = base.notna()
            return pd.DataFrame(
                {
                    "node": ed.loc[keep, "dst"].to_numpy(),
                    "cost_ms": (
                        base[keep].to_numpy().astype(np.int64)
                        + ed.loc[keep, "w"].to_numpy().astype(np.int64)
                    ),
                }
            )

        cands = (
            tagged.map_batches(
                lambda tb: _add_shard(tb, "key", n_sh), batch_format="pyarrow"
            )
            .groupby("shard")
            .map_groups(lambda g: relax(g.drop(columns=["shard"])), batch_format="pandas")
            .map_batches(lambda tb: tb, batch_format="pyarrow")
        )

        def min_merge(g: pd.DataFrame) -> pd.DataFrame:
            best = g.groupby("node", as_index=False)["cost_ms"].min()
            old = g[g["is_d"] == 1].set_index("node")["cost_ms"]
            prev = old.reindex(best["node"]).to_numpy()
            new = best["cost_ms"].to_numpy().astype(np.int64)
            changed = int(np.sum(~(prev == new)))  # NaN prev (new node) counts
            out = best.copy()
            out["changed"] = 0
            if len(out):
                out.iloc[0, out.columns.get_loc("changed")] = changed
            return out

        both = dist.map_batches(
            lambda tb: tb.append_column("is_d", pa.array([1] * tb.num_rows, pa.int8())),
            batch_format="pyarrow",
        ).union(
            cands.map_batches(
                lambda tb: tb.append_column("is_d", pa.array([0] * tb.num_rows, pa.int8())),
                batch_format="pyarrow",
            )
        )
        new_dist = (
            both.map_batches(lambda tb: _add_shard(tb, "node", n_sh), batch_format="pyarrow")
            .groupby("shard")
            .map_groups(
                lambda g: min_merge(g.drop(columns=["shard"])), batch_format="pandas"
            )
            .materialize()
        )
        changed_total = int(
            new_dist.map_batches(
                lambda tb: pa.table(
                    {"c": pa.array([int(np.sum(tb.column("changed").to_numpy()))], pa.int64())}
                ),
                batch_format="pyarrow",
            ).to_pandas()["c"].sum()
        )
        dist = _rebase(
            new_dist.map_batches(
                lambda tb: tb.select(["node", "cost_ms"]), batch_format="pyarrow"
            ).materialize()
        )
        if changed_total == 0:
            break
    return dist


_RA_FP = 1 << 20  # fixed-point scale for resource-allocation scores


def link_pred_kernel(a: np.ndarray, b: np.ndarray) -> pd.DataFrame:
    """Pure link-prediction kernel over an undirected (a < b, distinct)
    int edge list: for every NON-adjacent pair (x < y) with at least one
    common neighbor, the common-neighbor count ``cn`` and the resource-
    allocation index ``ra_fp`` = Σ_z floor(2^20 / deg(z)) over shared
    neighbors z (Zhou/Lü/Zhang 2009 — RA beats Adamic-Adar on web-ish
    degree distributions and, unlike AA's 1/log deg, is integer-exact).
    Returns all scored candidates unsorted; callers rank."""
    a = a.astype(np.int64)
    b = b.astype(np.int64)
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    nodes, starts = np.unique(src, return_index=True)
    ends = np.append(starts[1:], len(src))
    rows_x, rows_y, rows_ra = [], [], []
    for i in range(len(nodes)):
        nb = dst[starts[i]:ends[i]]
        d = len(nb)
        if d < 2:
            continue
        ii, jj = np.triu_indices(d, k=1)
        rows_x.append(nb[ii])
        rows_y.append(nb[jj])
        rows_ra.append(np.full(len(ii), _RA_FP // d, np.int64))
    if not rows_x:
        return pd.DataFrame(
            {
                "x": np.array([], np.int64),
                "y": np.array([], np.int64),
                "cn": np.array([], np.int64),
                "ra_fp": np.array([], np.int64),
            }
        )
    cand = pd.DataFrame(
        {
            "x": np.concatenate(rows_x),
            "y": np.concatenate(rows_y),
            "ra_fp": np.concatenate(rows_ra),
        }
    )
    agg = cand.groupby(["x", "y"], as_index=False).agg(
        cn=("ra_fp", "size"), ra_fp=("ra_fp", "sum")
    )
    ekey = (a << np.int64(32)) | b
    ckey = (agg["x"].to_numpy() << np.int64(32)) | agg["y"].to_numpy()
    keep = ~np.isin(ckey, ekey)
    return agg.loc[keep].reset_index(drop=True)


def link_prediction(edges: rd.Dataset) -> rd.Dataset:
    """Distributed link prediction over an undirected (a < b, distinct)
    edge Dataset: every non-adjacent pair with ≥1 common neighbor, scored
    by common-neighbor count and the integer-exact resource-allocation
    index (see link_pred_kernel). Returns (x, y, cn, ra_fp).

    Shape — two hash shuffles, zero driver state:
    1. adjacency rows (z, nbr) both directions hash(z)-shard; a node's
       adjacency is shard-complete, so deg(z) is the group size and each z
       emits its neighbor pairs (x < y) with weight 2^20 // deg via one
       vectorized triu index (no per-pair Python);
    2. pair partials and the edge list co-shard on the (x, y) key; each
       shard drops candidates that ARE edges and sums cn / ra_fp exactly —
       a pair's rows all land in one shard, so shard-local sums are global.

    Scale note: wedge volume is Σ C(deg, 2) — the same honest cost as
    triangle enumeration; production crawls cut super-hubs upstream (drop
    or sample deg > cap adjacency, the standard link-prediction hub cut)
    before this op. The sf-scale co-purchase graphs never trip a cap, so
    none is silently applied here."""
    edges = edges.materialize()
    n_sh = cluster_shards()

    def und(t: pa.Table) -> pa.Table:
        av = t.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        bv = t.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "z": pa.array(np.concatenate([av, bv])),
                "n": pa.array(np.concatenate([bv, av])),
            }
        )

    def wedge_pairs(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, grp in g.groupby("z"):
            nb = np.sort(grp["n"].to_numpy().astype(np.int64))
            d = len(nb)
            if d < 2:
                continue
            ii, jj = np.triu_indices(d, k=1)
            outs.append(
                pd.DataFrame(
                    {"x": nb[ii], "y": nb[jj], "cn": np.int64(1),
                     "ra_fp": np.full(len(ii), _RA_FP // d, np.int64)}
                )
            )
        if not outs:
            return pd.DataFrame(
                {
                    "x": np.array([], np.int64),
                    "y": np.array([], np.int64),
                    "cn": np.array([], np.int64),
                    "ra_fp": np.array([], np.int64),
                }
            )
        return pd.concat(outs, ignore_index=True)

    partials = (
        edges.map_batches(und, batch_format="pyarrow")
        .map_batches(lambda t: _add_shard(t, "z", n_sh), batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: wedge_pairs(g.drop(columns=["shard"])), batch_format="pandas"
        )
    )

    def tag_edge(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "x": t.column("a").cast(pa.int64()),
                "y": t.column("b").cast(pa.int64()),
                "cn": pa.array(np.full(t.num_rows, -1, np.int64)),
                "ra_fp": pa.array(np.zeros(t.num_rows, np.int64)),
            }
        )

    def pair_key(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column("y").to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("_k", pa.array((x << np.int64(32)) | y))

    tagged = (
        partials.map_batches(lambda t: t, batch_format="pyarrow")
        .union(edges.map_batches(tag_edge, batch_format="pyarrow"))
        .map_batches(pair_key, batch_format="pyarrow")
        .map_batches(lambda t: _add_shard(t, "_k", n_sh), batch_format="pyarrow")
    )

    def shard_score(g: pd.DataFrame) -> pd.DataFrame:
        is_edge = g["cn"] < 0
        edge_keys = g.loc[is_edge, "_k"].unique()
        cands = g.loc[~is_edge]
        cands = cands[~cands["_k"].isin(edge_keys)]
        if not len(cands):
            return pd.DataFrame(
                {
                    "x": np.array([], np.int64),
                    "y": np.array([], np.int64),
                    "cn": np.array([], np.int64),
                    "ra_fp": np.array([], np.int64),
                }
            )
        out = cands.groupby(["x", "y"], as_index=False)[["cn", "ra_fp"]].sum()
        return out.astype(np.int64)

    return (
        tagged.groupby("shard")
        .map_groups(
            lambda g: shard_score(g.drop(columns=["shard"])), batch_format="pandas"
        )
        .map_batches(lambda t: t, batch_format="pyarrow")
    )


def graph_summary(edges: rd.Dataset) -> pd.DataFrame:
    """Integer-exact structural summary of a DIRECTED int-keyed edge
    Dataset (columns ``src``, ``dst``; rows distinct, no self-loops —
    callers filter). Returns 9 (metric, v) rows; every value is an exact
    int64 sum, so the output is a pure function of the edge set and the
    ratios derive outside:

      reciprocity        = recip_edges / m_edges       (Newman 2002)
      assortativity r    = Pearson over per-edge (outdeg src, indeg dst)
                           from sum_x/sum_y/sum_xy/sum_x2/sum_y2 + m
      global clustering  = closed_wedges / wedges      (transitivity)

    Shape — bounded driver traffic throughout: degree tables come from
    per-block partials → hash(node) shard sums; the five assortativity
    sums leave each block as 5 ints after two size-gated keyed_attach
    joins; reciprocity + the distinct undirected edge set come from ONE
    hash(unordered-key) shard pass; closed wedges reuse the oriented
    wedge-join (``triangles``: closed = 3·triangle count) and the wedge
    total is Σ C(deg,2) from the same undirected degree partials. Node ids
    must fit int32 (the composite-key packing every graph op here uses)."""
    edges = edges.materialize()
    m = edges.count()
    rows: dict[str, int] = {"m_edges": int(m)}
    if m == 0:
        for k in ("recip_edges", "sum_x", "sum_y", "sum_xy", "sum_x2",
                  "sum_y2", "closed_wedges", "wedges"):
            rows[k] = 0
        return pd.DataFrame(
            {"metric": sorted(rows), "v": [rows[k] for k in sorted(rows)]}
        )
    n_sh = cluster_shards()

    # ---- reciprocity + distinct undirected edges: one unordered-key pass
    def und_key(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        return pa.table(
            {
                "_k": pa.array((lo << np.int64(32)) | hi),
                "a": pa.array(lo),
                "b": pa.array(hi),
                "fwd": pa.array((s < d).astype(np.int8)),
            }
        )

    def pair_fold(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.groupby(["_k", "a", "b"], as_index=False)["fwd"].nunique()
        recip = 2 * int((gg["fwd"] == 2).sum())
        out = gg[["a", "b"]].copy()
        out["recip_partial"] = 0
        if len(out):
            out.iloc[0, out.columns.get_loc("recip_partial")] = recip
        return out

    upairs = (
        edges.map_batches(und_key, batch_format="pyarrow")
        .map_batches(lambda t: _add_shard(t, "_k", n_sh), batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: pair_fold(g.drop(columns=["shard"])), batch_format="pandas"
        )
        .materialize()
    )
    rows["recip_edges"] = int(
        upairs.map_batches(
            lambda t: pa.table(
                {"r": pa.array([int(np.sum(t.column("recip_partial").to_numpy()))],
                               pa.int64())}
            ),
            batch_format="pyarrow",
        ).to_pandas()["r"].sum()
    )
    und = _rebase(
        upairs.map_batches(
            lambda t: t.select(["a", "b"]), batch_format="pyarrow"
        ).materialize()
    )

    # ---- degree tables (out-deg by src, in-deg by dst)
    def deg_table(col: str, out_col: str) -> rd.Dataset:
        def partial(t: pa.Table) -> pa.Table:
            v, c = np.unique(
                t.column(col).to_numpy(zero_copy_only=False).astype(np.int64),
                return_counts=True,
            )
            return pa.table({col: pa.array(v), out_col: pa.array(c.astype(np.int64))})

        return (
            edges.map_batches(partial, batch_format="pyarrow")
            .map_batches(lambda t: _add_shard(t, col, n_sh), batch_format="pyarrow")
            .groupby("shard")
            .map_groups(
                lambda g: g.drop(columns=["shard"]).groupby(col, as_index=False)[
                    out_col
                ].sum(),
                batch_format="pandas",
            )
            .map_batches(lambda t: t, batch_format="pyarrow")
            .materialize()
        )

    outd = deg_table("src", "od")
    ind = deg_table("dst", "indeg")
    joined = keyed_attach(
        keyed_attach(
            edges.map_batches(lambda t: t, batch_format="pyarrow"),
            outd, "src", ["od"], right_count=outd.count(),
        ),
        ind, "dst", ["indeg"], right_count=ind.count(),
    )

    def sums_partial(t: pa.Table) -> pa.Table:
        x = t.column("od").to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column("indeg").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "sum_x": pa.array([int(x.sum())], pa.int64()),
                "sum_y": pa.array([int(y.sum())], pa.int64()),
                "sum_xy": pa.array([int((x * y).sum())], pa.int64()),
                "sum_x2": pa.array([int((x * x).sum())], pa.int64()),
                "sum_y2": pa.array([int((y * y).sum())], pa.int64()),
            }
        )

    sp = joined.map_batches(sums_partial, batch_format="pyarrow").to_pandas()
    for c in ("sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2"):
        rows[c] = int(sp[c].sum())

    # ---- transitivity: closed wedges via the oriented wedge-join
    rows["closed_wedges"] = 3 * int(triangles(und).count())

    def wedge_partial(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        v, c = np.unique(np.concatenate([a, b]), return_counts=True)
        return pa.table({"n": pa.array(v), "d": pa.array(c.astype(np.int64))})

    wp = (
        und.map_batches(wedge_partial, batch_format="pyarrow")
        .map_batches(lambda t: _add_shard(t, "n", n_sh), batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: pd.DataFrame(
                {
                    "w": [
                        int(
                            (
                                lambda d: (d * (d - 1) // 2).sum()
                            )(
                                g.drop(columns=["shard"])
                                .groupby("n")["d"].sum().to_numpy()
                            )
                        )
                    ]
                }
            ),
            batch_format="pandas",
        )
        .to_pandas()
    )
    rows["wedges"] = int(wp["w"].sum())
    return pd.DataFrame(
        {"metric": sorted(rows), "v": np.asarray([rows[k] for k in sorted(rows)], np.int64)}
    )


def msf_kernel(a: np.ndarray, b: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Pure minimum-spanning-forest kernel over undirected string-or-int
    endpoint arrays with int64 weights: Kruskal with union-find over the
    TOTAL edge order (w, a, b) — the total order makes the lexicographic
    MSF unique, so Borůvka rounds with the same tie-break (the distributed
    path) must produce the identical edge set. Returns the sorted indices
    of the kept edges into the input arrays."""
    order = np.lexsort((b, a, w))
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ua, ub = inv[: len(a)], inv[len(a):]
    parent = np.arange(len(nodes))

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    keep = []
    for i in order:
        ra, rb = find(int(ua[i])), find(int(ub[i]))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            keep.append(int(i))
    return np.sort(np.asarray(keep, np.int64))


def minimum_spanning_forest(
    edges: rd.Dataset,
    driver_cap: int = 2_000_000,
    max_rounds: int = 64,
    max_merge_rounds: int = 64,
) -> rd.Dataset:
    """Minimum spanning forest of an undirected (a, b, w) string-keyed
    edge Dataset (a < b, rows distinct, int64 weights) — for the latency-
    weighted crawl graph this is the cheapest skeleton that keeps every
    reachable page connected (crawl-budget planning, host backbone maps).
    Returns (a, b, w) of the kept edges. The (w, a, b) TOTAL order makes
    the MSF unique, so both paths agree bit-for-bit.

    Size-gated: Kruskal kernel under ``driver_cap`` edges; above it
    (test-forced via driver_cap=0) Borůvka rounds where component labels
    stay a Dataset: per round (≤ log₂ n rounds — component count at least
    halves) the label table attaches to both endpoints via size-gated
    keyed_attach joins, internal edges drop, each component elects its
    (w, a, b)-minimum cross edge in one hash(comp) shard pass, and the
    candidate star graph merges by inner min-label rounds (Borůvka
    candidates form pseudotrees whose cycles are 2-cycles under a total
    order, so the inner fixpoint is O(candidate-tree depth), typically
    1-3; a loud warning fires if ``max_merge_rounds`` is hit). Driver sees
    per-round changed-counts only; MSF edges accumulate as a Dataset."""
    edges = edges.materialize()
    n_edges = edges.count()
    empty = pa.table(
        {
            "a": pa.array([], pa.string()),
            "b": pa.array([], pa.string()),
            "w": pa.array([], pa.int64()),
        }
    )
    if n_edges == 0:
        return rd.from_arrow(empty)
    if n_edges <= driver_cap:
        ed = edges.to_pandas()
        av = ed["a"].to_numpy()
        bv = ed["b"].to_numpy()
        wv = ed["w"].to_numpy().astype(np.int64)
        keep = msf_kernel(av, bv, wv)
        out = ed.iloc[keep].sort_values(["a", "b"]).reset_index(drop=True)
        out["w"] = out["w"].astype(np.int64)
        return rd.from_pandas(out[["a", "b", "w"]])

    import warnings

    import pyarrow.compute as pc

    n_sh = cluster_shards()

    # comp table: every endpoint starts as its own component
    def node_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": pa.concat_arrays(
                [t.column("a").combine_chunks().cast(pa.string()),
                 t.column("b").combine_chunks().cast(pa.string())]
            )}
        )

    def shard_distinct(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["node"])

    comp = (
        edges.map_batches(node_rows, batch_format="pyarrow")
        .map_batches(lambda t: _add_shard(t, "node", n_sh), batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: shard_distinct(g.drop(columns=["shard"])), batch_format="pandas"
        )
        .map_batches(
            lambda t: t.append_column("comp", t.column("node")),
            batch_format="pyarrow",
        )
        .materialize()
    )
    live = edges
    msf_parts: list[rd.Dataset] = []

    for _round in range(max_rounds):
        # attach comp to both endpoints (comp named per side to avoid clash)
        cu = comp.map_batches(
            lambda t: pa.table({"a": t.column("node"), "cu": t.column("comp")}),
            batch_format="pyarrow",
        ).materialize()
        with_cu = keyed_attach(
            live.map_batches(lambda t: t, batch_format="pyarrow"),
            cu, "a", ["cu"], right_count=cu.count(),
        )
        cv = comp.map_batches(
            lambda t: pa.table({"b": t.column("node"), "cv": t.column("comp")}),
            batch_format="pyarrow",
        ).materialize()
        tagged = keyed_attach(with_cu, cv, "b", ["cv"], right_count=cv.count())

        cross = tagged.map_batches(
            lambda t: t.filter(
                pc.not_equal(t.column("cu"), t.column("cv"))
            ),
            batch_format="pyarrow",
        ).materialize()
        n_cross = cross.count()
        if n_cross == 0:
            break
        live = _rebase(
            cross.map_batches(
                lambda t: t.select(["a", "b", "w"]), batch_format="pyarrow"
            ).materialize()
        )

        # each component elects its (w, a, b)-minimum cross edge
        def both_sides(t: pa.Table) -> pa.Table:
            base = {
                "a": t.column("a"), "b": t.column("b"), "w": t.column("w"),
                "cu": t.column("cu"), "cv": t.column("cv"),
            }
            one = pa.table({**base, "comp_key": t.column("cu")})
            two = pa.table({**base, "comp_key": t.column("cv")})
            return pa.concat_tables([one, two])

        def elect(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["w", "a", "b"], kind="stable")
            return g.groupby("comp_key", as_index=False).first()

        cands = (
            cross.map_batches(both_sides, batch_format="pyarrow")
            .map_batches(lambda t: _add_shard(t, "comp_key", n_sh), batch_format="pyarrow")
            .groupby("shard")
            .map_groups(
                lambda g: elect(g.drop(columns=["shard"])), batch_format="pandas"
            )
            # an edge may be elected by both endpoints: exact dedup by key
            .map_batches(
                lambda t: t.append_column(
                    "_k",
                    pc.binary_join_element_wise(
                        t.column("a").cast(pa.string()),
                        t.column("b").cast(pa.string()),
                        "\x1f",
                    ),
                ),
                batch_format="pyarrow",
            )
            .map_batches(lambda t: _add_shard(t, "_k", n_sh), batch_format="pyarrow")
            .groupby("shard")
            .map_groups(
                lambda g: g.drop(columns=["shard", "_k", "comp_key"]).drop_duplicates(
                    ["a", "b"]
                ),
                batch_format="pandas",
            )
            .map_batches(lambda t: t, batch_format="pyarrow")
            .materialize()
        )
        msf_parts.append(
            _rebase(
                cands.map_batches(
                    lambda t: t.select(["a", "b", "w"]), batch_format="pyarrow"
                ).materialize()
            )
        )

        # merge components: min-label fixpoint over the candidate star graph
        lab = (
            cands.map_batches(
                lambda t: pa.table(
                    {
                        "comp": pa.concat_arrays(
                            [t.column("cu").combine_chunks(),
                             t.column("cv").combine_chunks()]
                        )
                    }
                ),
                batch_format="pyarrow",
            )
            .map_batches(lambda t: _add_shard(t, "comp", n_sh), batch_format="pyarrow")
            .groupby("shard")
            .map_groups(
                lambda g: g.drop(columns=["shard"]).drop_duplicates(["comp"]),
                batch_format="pandas",
            )
            .map_batches(
                lambda t: t.append_column("lab", t.column("comp")),
                batch_format="pyarrow",
            )
            .materialize()
        )
        cand_edges = cands.map_batches(
            lambda t: pa.table(
                {
                    "x": pa.concat_arrays(
                        [t.column("cu").combine_chunks(), t.column("cv").combine_chunks()]
                    ),
                    "y": pa.concat_arrays(
                        [t.column("cv").combine_chunks(), t.column("cu").combine_chunks()]
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        for _inner in range(max_merge_rounds):
            have = lab.map_batches(
                lambda t: pa.table(
                    {"x": t.column("comp"), "y": pa.array([""] * t.num_rows, pa.string()),
                     "lab": t.column("lab")}
                ),
                batch_format="pyarrow",
            ).union(
                cand_edges.map_batches(
                    lambda t: pa.table(
                        {"x": t.column("x"), "y": t.column("y"),
                         "lab": pa.array([""] * t.num_rows, pa.string())}
                    ),
                    batch_format="pyarrow",
                )
            )

            def push(g: pd.DataFrame) -> pd.DataFrame:
                own = g[g["y"] == ""]
                lut = dict(zip(own["x"], own["lab"]))
                ed = g[g["y"] != ""]
                vals = ed["x"].map(lut)
                keep = vals.notna()
                return pd.DataFrame(
                    {"comp": ed.loc[keep, "y"].to_numpy(),
                     "cand": vals[keep].to_numpy()}
                )

            pushed = (
                have.map_batches(lambda t: _add_shard(t, "x", n_sh), batch_format="pyarrow")
                .groupby("shard")
                .map_groups(
                    lambda g: push(g.drop(columns=["shard"])), batch_format="pandas"
                )
                .map_batches(lambda t: t, batch_format="pyarrow")
            )

            def min_lab(g: pd.DataFrame) -> pd.DataFrame:
                own = g[g["cand"] == ""]
                cand = g.groupby("comp", as_index=False)["lab2"].min()
                old = own.set_index("comp")["lab2"]
                prev = old.reindex(cand["comp"])
                changed = int((prev.to_numpy() != cand["lab2"].to_numpy()).sum())
                out = cand.rename(columns={"lab2": "lab"})
                out["comp"] = out["comp"].astype(str)
                out["changed"] = 0
                if len(out):
                    out.iloc[0, out.columns.get_loc("changed")] = changed
                return out

            both = lab.map_batches(
                lambda t: pa.table(
                    {"comp": t.column("comp"), "lab2": t.column("lab"),
                     "cand": pa.array([""] * t.num_rows, pa.string())}
                ),
                batch_format="pyarrow",
            ).union(
                pushed.map_batches(
                    lambda t: pa.table(
                        {"comp": t.column("comp"), "lab2": t.column("cand"),
                         "cand": pa.array(["c"] * t.num_rows, pa.string())}
                    ),
                    batch_format="pyarrow",
                )
            )
            new_lab = (
                both.map_batches(lambda t: _add_shard(t, "comp", n_sh), batch_format="pyarrow")
                .groupby("shard")
                .map_groups(
                    lambda g: min_lab(g.drop(columns=["shard"])), batch_format="pandas"
                )
                .materialize()
            )
            changed_total = int(
                new_lab.map_batches(
                    lambda t: pa.table(
                        {"c": pa.array(
                            [int(np.sum(t.column("changed").to_numpy()))], pa.int64()
                        )}
                    ),
                    batch_format="pyarrow",
                ).to_pandas()["c"].sum()
            )
            lab = _rebase(
                new_lab.map_batches(
                    lambda t: t.select(["comp", "lab"]), batch_format="pyarrow"
                ).materialize()
            )
            if changed_total == 0:
                break
        else:
            warnings.warn(
                "minimum_spanning_forest: candidate merge did not converge "
                f"within {max_merge_rounds} min-label rounds",
                stacklevel=2,
            )

        # update the comp table: comp -> lab where present
        lab_j = lab.map_batches(
            lambda t: pa.table({"comp": t.column("comp"), "lab": t.column("lab")}),
            batch_format="pyarrow",
        ).materialize()
        comp = _rebase(
            keyed_attach(
                comp.map_batches(lambda t: t, batch_format="pyarrow"),
                lab_j, "comp", ["lab"], right_count=lab_j.count(),
            )
            .map_batches(
                lambda t: pa.table(
                    {
                        "node": t.column("node"),
                        "comp": pc.coalesce(
                            t.column("lab").cast(pa.string()), t.column("comp")
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
    if not msf_parts:
        return rd.from_arrow(empty)
    out = msf_parts[0]
    for part in msf_parts[1:]:
        out = out.union(part)
    return out


def densest_kernel(
    a: np.ndarray, b: np.ndarray, num: int = 1, den: int = 10
) -> np.ndarray:
    """Pure densest-subgraph kernel over an undirected (a < b, distinct)
    int edge list: Charikar greedy peeling in the (1+ε) batched form
    (Bahmani/Kumar/Vassilvitskii, VLDB 2012), ε = num/den — each round
    removes EVERY node with deg·n·den ≤ 2·m·(den+num), so the peel is a
    pure function of the edge set (no per-node order dependence) and
    terminates in O(log n) rounds; a round's snapshot is the set of nodes
    with ≥1 alive edge (isolated leftovers — e.g. a star center after its
    leaves peel — contribute 0 density and drop out), and the answer is
    the snapshot with maximum density m/n, compared by integer cross-
    multiplication (earliest round wins ties). 2(1+ε)-approximation.
    Returns the sorted member node ids."""
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ua, ub = inv[: len(a)], inv[len(a):]
    n_all = len(nodes)
    alive_edge = np.ones(len(ua), bool)
    best_m, best_n = -1, 1
    best_mask = np.zeros(n_all, bool)
    while True:
        deg = np.bincount(ua[alive_edge], minlength=n_all) + np.bincount(
            ub[alive_edge], minlength=n_all
        )
        alive = deg > 0
        n = int(alive.sum())
        if n == 0:
            break
        m = int(alive_edge.sum())
        if m * best_n > best_m * n:
            best_m, best_n = m, n
            best_mask = alive.copy()
        peel = alive & (deg * n * den <= 2 * m * (den + num))
        alive_edge &= ~(peel[ua] | peel[ub])
    return np.sort(nodes[best_mask])


def densest_subgraph(
    edges: rd.Dataset,
    num: int = 1,
    den: int = 10,
    driver_cap: int = 2_000_000,
    broadcast_cap: int = 5_000_000,
) -> rd.Dataset:
    """Distributed densest subgraph over an undirected (a, b) int-keyed
    edge Dataset — the community-core / link-farm-core extractor (the
    densest co-purchase cluster; on a link graph, the tightest spam ring).
    Returns one sorted column ``part`` of member node ids.

    Size-gated: kernel under ``driver_cap`` edges; above it (test-forced
    via driver_cap=0) the SAME batched peeling runs distributed: per round
    degrees come from per-block partials → hash(node) shard sums, the
    global (m, n) pair and the integer peel threshold are driver ints, the
    peeled-node set stays a Dataset (recorded per round — the best
    snapshot reconstructs as the union of rounds ≥ best_r, zero driver
    node data), and edge filtering broadcasts the peel set under
    ``broadcast_cap`` (ray.put sorted ids + searchsorted) or anti-joins in
    hash(endpoint) shards above it. O(log n) rounds for ε = num/den."""
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table({"part": pa.array([], pa.int64())}))
    if n_edges <= driver_cap:
        ed = edges.to_pandas()
        members = densest_kernel(
            ed["a"].to_numpy().astype(np.int64),
            ed["b"].to_numpy().astype(np.int64),
            num, den,
        )
        return rd.from_arrow(pa.table({"part": pa.array(members, pa.int64())}))

    n_sh = cluster_shards()
    live = edges.map_batches(
        lambda t: pa.table(
            {"a": t.column("a").cast(pa.int64()), "b": t.column("b").cast(pa.int64())}
        ),
        batch_format="pyarrow",
    ).materialize()

    def deg_partial(t: pa.Table) -> pa.Table:
        v, c = np.unique(
            np.concatenate(
                [
                    t.column("a").to_numpy(zero_copy_only=False),
                    t.column("b").to_numpy(zero_copy_only=False),
                ]
            ),
            return_counts=True,
        )
        return pa.table(
            {"n": pa.array(v.astype(np.int64)), "d": pa.array(c.astype(np.int64))}
        )

    node_rounds: list[rd.Dataset] = []
    round_mn: list[tuple[int, int]] = []
    while True:
        m = live.count()
        deg = (
            live.map_batches(deg_partial, batch_format="pyarrow")
            .map_batches(lambda t: _add_shard(t, "n", n_sh), batch_format="pyarrow")
            .groupby("shard")
            .map_groups(
                lambda g: g.drop(columns=["shard"]).groupby("n", as_index=False)["d"].sum(),
                batch_format="pandas",
            )
            .map_batches(lambda t: t, batch_format="pyarrow")
            .materialize()
        )
        n = deg.count()
        if n == 0:
            break
        # the deg table IS the round snapshot: every row has >=1 alive edge
        node_rounds.append(
            _rebase(
                deg.map_batches(
                    lambda t: t.select(["n"]), batch_format="pyarrow"
                ).materialize()
            )
        )
        round_mn.append((int(m), int(n)))
        thresh = 2 * int(m) * (den + num)

        def peel_fn(t: pa.Table, n=n, thresh=thresh) -> pa.Table:
            d = t.column("d").to_numpy(zero_copy_only=False).astype(np.int64)
            keep = d * (int(n) * den) <= thresh
            return pa.table(
                {
                    "n": pa.array(
                        t.column("n").to_numpy(zero_copy_only=False)[keep].astype(
                            np.int64
                        )
                    )
                }
            )

        peel = deg.map_batches(peel_fn, batch_format="pyarrow").materialize()
        n_peel = peel.count()
        if n_peel == n:
            break
        if n_peel <= broadcast_cap:
            ids = np.sort(
                np.concatenate(
                    [
                        pa.table(bt).column("n").to_numpy(zero_copy_only=False)
                        for bt in peel.iter_batches(batch_format="pyarrow")
                    ]
                    or [np.array([], np.int64)]
                ).astype(np.int64)
            )
            ref = ray.put(ids)

            def drop(t: pa.Table, ref=ref) -> pa.Table:
                gone = ray.get(ref)
                av = t.column("a").to_numpy(zero_copy_only=False)
                bv = t.column("b").to_numpy(zero_copy_only=False)

                def hit(x: np.ndarray) -> np.ndarray:
                    if not len(gone):
                        return np.zeros(len(x), bool)
                    pos = np.searchsorted(gone, x)
                    return (pos < len(gone)) & (
                        gone[np.minimum(pos, len(gone) - 1)] == x
                    )

                keep = ~(hit(av) | hit(bv))
                return pa.table({"a": pa.array(av[keep]), "b": pa.array(bv[keep])})

            live = _rebase(
                live.map_batches(drop, batch_format="pyarrow").materialize()
            )
        else:
            # co-shard anti-join on each endpoint in turn
            def anti(col: str, ed: rd.Dataset) -> rd.Dataset:
                tagged = ed.map_batches(
                    lambda t, col=col: t.append_column(
                        "_key", t.column(col).cast(pa.int64())
                    ),
                    batch_format="pyarrow",
                ).union(
                    peel.map_batches(
                        lambda t: pa.table(
                            {
                                "a": pa.array(np.full(t.num_rows, -1, np.int64)),
                                "b": pa.array(np.full(t.num_rows, -1, np.int64)),
                                "_key": t.column("n").cast(pa.int64()),
                            }
                        ),
                        batch_format="pyarrow",
                    )
                )

                def drop_marked(g: pd.DataFrame) -> pd.DataFrame:
                    gone = set(g.loc[g["a"] < 0, "_key"])
                    keep = g[(g["a"] >= 0) & (~g["_key"].isin(gone))]
                    return keep[["a", "b"]]

                return (
                    tagged.map_batches(
                        lambda t: _add_shard(t, "_key", n_sh), batch_format="pyarrow"
                    )
                    .groupby("shard")
                    .map_groups(
                        lambda g: drop_marked(g.drop(columns=["shard"])),
                        batch_format="pandas",
                    )
                    .map_batches(lambda t: t, batch_format="pyarrow")
                )

            live = _rebase(anti("b", anti("a", live)).materialize())

    if not round_mn:
        return rd.from_arrow(pa.table({"part": pa.array([], pa.int64())}))
    best_r = 0
    best_m, best_n = round_mn[0]
    for r, (m, n) in enumerate(round_mn):
        if m * best_n > best_m * n:
            best_m, best_n, best_r = m, n, r
    return node_rounds[best_r].map_batches(
        lambda t: pa.table({"part": t.column("n").cast(pa.int64())}),
        batch_format="pyarrow",
    )


_BC_FP = 1 << 20  # fixed-point scale for betweenness output


def _hashmin_sample(nodes: np.ndarray, k: int) -> np.ndarray:
    """Deterministic pseudo-random k-sample: the k nodes with the smallest
    splitmix64 hash of their id — unbiased w.r.t. graph structure, stable
    under partitioning/resume (the same hash-min trick the PQ/kmeans
    codebook samplers use). Ties impossible (hash of distinct int64 ids
    with a bijective mixer)."""
    v = nodes.astype(np.uint64)
    with np.errstate(over="ignore"):
        h = (v + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    order = np.argsort(h, kind="stable")
    return np.sort(nodes[order[:k]])


def betweenness_kernel(
    a: np.ndarray, b: np.ndarray, seeds: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Pure sampled-source betweenness kernel (Brandes 2001 dependency
    accumulation; Bader/Kintali/Madduri/Mihail 2007 source sampling) over
    an undirected (a < b, distinct) int edge list. Returns (nodes, bc_fp)
    where bc_fp = floor(bc · 2^20).

    Float discipline — the reason the distributed rounds can hash-match:
    every float sum happens over a canonically ORDERED array. Per level,
    each settled vertex u accumulates δ(u) = σ(u) · Σ_v q(v) where
    q(v) = (1 + δ(v)) / σ(v) over its DAG successors v sorted by id, via
    one np.add.reduceat over the (u, v)-lexsorted frontier edges — the
    same slice contents in the same order on both paths give the same
    IEEE result. Across sources, bc accumulates in ascending seed order.
    σ path counts are exact int64 (overflow is a documented bound, not a
    silent wrap, for the graph sizes this analyzes)."""
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    n = len(nodes)
    ua, ub = inv[: len(a)], inv[len(a):]
    # both directions, lexsorted by (u, v) once
    eu = np.concatenate([ua, ub])
    ev = np.concatenate([ub, ua])
    order = np.lexsort((ev, eu))
    eu, ev = eu[order], ev[order]
    seed_pos = np.searchsorted(nodes, seeds)
    ok = (seed_pos < n) & (nodes[np.minimum(seed_pos, n - 1)] == seeds)
    deltas: list[np.ndarray] = []
    for s in seed_pos[ok]:
        dist = np.full(n, -1, np.int64)
        sigma = np.zeros(n, np.int64)
        dist[s] = 0
        sigma[s] = 1
        frontier = np.array([s], np.int64)
        levels = [frontier]
        while True:
            on_f = np.zeros(n, bool)
            on_f[frontier] = True
            m = on_f[eu] & (dist[ev] < 0)
            nxt_v = ev[m]
            if not len(nxt_v):
                break
            # sigma sums are integer and order-free
            np.add.at(sigma, nxt_v, sigma[eu[m]])
            frontier = np.unique(nxt_v)
            dist[frontier] = len(levels)
            levels.append(frontier)
        delta = np.zeros(n, np.float64)
        for L in range(len(levels) - 1, 0, -1):
            # edges u -> v with dist[u] = L-1, dist[v] = L, in (u, v) order
            m = (dist[eu] == L - 1) & (dist[ev] == L)
            uu, vv = eu[m], ev[m]
            if not len(uu):
                continue
            q = (1.0 + delta[vv]) / sigma[vv]
            starts = np.flatnonzero(np.diff(uu, prepend=uu[0] - 1))
            sums = np.add.reduceat(q, starts)
            ids = uu[starts]
            delta[ids] = sigma[ids] * sums
        delta[s] = 0.0
        deltas.append(delta)
    bc = np.zeros(n, np.float64)
    for d in deltas:  # ascending seed order — fixed accumulation order
        bc = bc + d
    return nodes, np.floor(bc * _BC_FP).astype(np.int64)


def betweenness(
    edges: rd.Dataset,
    k: int = 8,
    driver_cap: int = 2_000_000,
) -> rd.Dataset:
    """Sampled-source betweenness over an undirected (a, b) int-keyed edge
    Dataset: the 'bridge' centrality (which pages/parts sit on the most
    shortest paths) from k hash-min-sampled sources. Returns (node, bc_fp)
    for every node, bc_fp = floor(bc · 2^20).

    Size-gated: betweenness_kernel under ``driver_cap`` edges; above it
    (test-forced via driver_cap=0) the SAME algorithm runs as batched
    multi-source rounds with all per-(source, node) state held in
    Datasets. Forward: frontier (s, u) rows meet out-edges in hash(u)
    shards; σ candidates min... SUM-merge with the visited table in
    hash(s, v) shards (σ sums are integers — order-free). Backward, per
    level: settled (s, u, σ) rows of level L-1 meet edges in hash(u)
    shards, the (s, v) successors attach q = (1+δ)/σ in hash(s⊻v) shards,
    and each (s, u) group reduces Σ q over v-SORTED rows with one
    np.add.reduceat — the identical slice content and order as the kernel,
    so every IEEE float matches bit-for-bit. bc accumulates per node in
    ascending seed order (one vectorized add per seed, kernel-identical);
    the driver sees per-round changed-counts only. σ is exact int64 —
    path-count overflow is a documented bound, not a silent wrap."""
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "bc_fp": pa.array([], pa.int64())})
        )

    # deterministic seed pick: per-block hash-min partials -> driver top-k
    def seed_partial(t: pa.Table) -> pa.Table:
        v = np.unique(
            np.concatenate(
                [
                    t.column("a").to_numpy(zero_copy_only=False),
                    t.column("b").to_numpy(zero_copy_only=False),
                ]
            ).astype(np.int64)
        )
        return pa.table({"n": pa.array(_hashmin_sample(v, k))})

    cand = np.unique(
        np.concatenate(
            [
                pa.table(bt).column("n").to_numpy(zero_copy_only=False)
                for bt in edges.map_batches(seed_partial, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow")
            ]
        ).astype(np.int64)
    )
    seeds = _hashmin_sample(cand, k)

    if n_edges <= driver_cap:
        ed = edges.to_pandas()
        nodes, bc_fp = betweenness_kernel(
            ed["a"].to_numpy().astype(np.int64),
            ed["b"].to_numpy().astype(np.int64),
            seeds,
        )
        return rd.from_arrow(
            pa.table({"node": pa.array(nodes, pa.int64()), "bc_fp": pa.array(bc_fp)})
        )

    n_sh = cluster_shards()
    eb = edges.map_batches(
        lambda t: pa.table(
            {
                "u": pa.concat_arrays(
                    [
                        t.column("a").cast(pa.int64()).combine_chunks(),
                        t.column("b").cast(pa.int64()).combine_chunks(),
                    ]
                ),
                "v": pa.concat_arrays(
                    [
                        t.column("b").cast(pa.int64()).combine_chunks(),
                        t.column("a").cast(pa.int64()).combine_chunks(),
                    ]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def sv_key(t: pa.Table, scol: str, vcol: str) -> pa.Table:
        s = t.column(scol).to_numpy(zero_copy_only=False).astype(np.int64)
        v = t.column(vcol).to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("_k", pa.array((s << np.int64(32)) ^ v))

    # ---- forward: state rows (s, node, dist, sigma)
    state = rd.from_arrow(
        pa.table(
            {
                "s": pa.array(seeds, pa.int64()),
                "node": pa.array(seeds, pa.int64()),
                "dist": pa.array(np.zeros(len(seeds), np.int64)),
                "sigma": pa.array(np.ones(len(seeds), np.int64)),
            }
        )
    ).materialize()
    level = 0
    while True:
        frontier = state.map_batches(
            lambda t, L=level: t.filter(
                pa.compute.equal(t.column("dist"), pa.scalar(L, pa.int64()))
            ).select(["s", "node", "sigma"]),
            batch_format="pyarrow",
        ).materialize()
        if frontier.count() == 0:
            break

        # frontier meets out-edges in hash(u) shards
        def f_tag(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "u": t.column("node"),
                    "v": pa.array(np.full(t.num_rows, -1, np.int64)),
                    "s": t.column("s"),
                    "sigma": t.column("sigma"),
                }
            )

        def e_tag(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "u": t.column("u"),
                    "v": t.column("v"),
                    "s": pa.array(np.full(t.num_rows, -1, np.int64)),
                    "sigma": pa.array(np.zeros(t.num_rows, np.int64)),
                }
            )

        def expand(g: pd.DataFrame) -> pd.DataFrame:
            fr = g[g["v"] < 0]
            ed = g[g["v"] >= 0]
            if not len(fr) or not len(ed):
                return pd.DataFrame(
                    {
                        "s": np.array([], np.int64),
                        "node": np.array([], np.int64),
                        "sigma": np.array([], np.int64),
                    }
                )
            m = ed[["u", "v"]].merge(fr[["u", "s", "sigma"]], on="u")
            out = m.groupby(["s", "v"], as_index=False)["sigma"].sum()
            return out.rename(columns={"v": "node"})

        cands = (
            frontier.map_batches(f_tag, batch_format="pyarrow")
            .union(eb.map_batches(e_tag, batch_format="pyarrow"))
            .map_batches(lambda t: _add_shard(t, "u", n_sh), batch_format="pyarrow")
            .groupby("shard")
            .map_groups(
                lambda g: expand(g.drop(columns=["shard"])), batch_format="pandas"
            )
            .map_batches(lambda t: t, batch_format="pyarrow")
        )

        # merge with visited in hash(s, v) shards: keep unvisited only
        def merge(g: pd.DataFrame, L=level) -> pd.DataFrame:
            seen = g[g["dist"] >= 0]
            new = g[g["dist"] < 0]
            if not len(new):
                return seen[["s", "node", "dist", "sigma"]]
            skey = set(zip(seen["s"], seen["node"]))
            agg = new.groupby(["s", "node"], as_index=False)["sigma"].sum()
            mask = [
                (s, v) not in skey for s, v in zip(agg["s"], agg["node"])
            ]
            fresh = agg.loc[mask].copy()
            fresh["dist"] = L + 1
            return pd.concat(
                [seen[["s", "node", "dist", "sigma"]],
                 fresh[["s", "node", "dist", "sigma"]]],
                ignore_index=True,
            )

        both = state.union(
            cands.map_batches(
                lambda t: t.append_column(
                    "dist", pa.array(np.full(t.num_rows, -1, np.int64))
                ).select(["s", "node", "dist", "sigma"]),
                batch_format="pyarrow",
            )
        )
        new_state = (
            both.map_batches(lambda t: sv_key(t, "s", "node"), batch_format="pyarrow")
            .map_batches(lambda t: _add_shard(t, "_k", n_sh), batch_format="pyarrow")
            .groupby("shard")
            .map_groups(
                lambda g: merge(g.drop(columns=["shard", "_k"])),
                batch_format="pandas",
            )
            .map_batches(lambda t: t, batch_format="pyarrow")
            .materialize()
        )
        grew = new_state.count() - state.count()
        state = _rebase(new_state)
        level += 1
        if grew == 0:
            break

    max_level = level
    # ---- backward: delta rows (s, node, delta) accumulate level by level
    delta = rd.from_arrow(
        pa.table(
            {
                "s": pa.array([], pa.int64()),
                "node": pa.array([], pa.int64()),
                "delta": pa.array([], pa.float64()),
            }
        )
    ).materialize()
    for L in range(max_level, 0, -1):
        # q rows for level-L vertices: q = (1 + delta) / sigma
        lvl = state.map_batches(
            lambda t, L=L: t.filter(
                pa.compute.equal(t.column("dist"), pa.scalar(L, pa.int64()))
            ).select(["s", "node", "sigma"]),
            batch_format="pyarrow",
        )

        def attach_q(g: pd.DataFrame) -> pd.DataFrame:
            st = g[g["sigma"] > 0]
            dl = g[g["sigma"] <= 0]
            dmap = dict(zip(zip(dl["s"], dl["node"]), dl["delta"]))
            dvals = np.array(
                [dmap.get((s, v), 0.0) for s, v in zip(st["s"], st["node"])],
                np.float64,
            )
            return pd.DataFrame(
                {
                    "s": st["s"].to_numpy(np.int64),
                    "v": st["node"].to_numpy(np.int64),
                    "q": (1.0 + dvals) / st["sigma"].to_numpy(np.int64),
                }
            )

        qrows = (
            lvl.map_batches(
                lambda t: t.append_column(
                    "delta", pa.array(np.zeros(t.num_rows, np.float64))
                ),
                batch_format="pyarrow",
            )
            .union(
                delta.map_batches(
                    lambda t: pa.table(
                        {
                            "s": t.column("s"),
                            "node": t.column("node"),
                            "sigma": pa.array(np.zeros(t.num_rows, np.int64)),
                            "delta": t.column("delta"),
                        }
                    ),
                    batch_format="pyarrow",
                )
            )
            .map_batches(lambda t: sv_key(t, "s", "node"), batch_format="pyarrow")
            .map_batches(lambda t: _add_shard(t, "_k", n_sh), batch_format="pyarrow")
            .groupby("shard")
            .map_groups(
                lambda g: attach_q(g.drop(columns=["shard", "_k"])),
                batch_format="pandas",
            )
            .map_batches(lambda t: t, batch_format="pyarrow")
            .materialize()
        )

        # level-(L-1) settled rows meet edges in hash(u) shards -> (s,u,v,sigma)
        prev = state.map_batches(
            lambda t, L=L: t.filter(
                pa.compute.equal(t.column("dist"), pa.scalar(L - 1, pa.int64()))
            ).select(["s", "node", "sigma"]),
            batch_format="pyarrow",
        )

        def join_edges(g: pd.DataFrame) -> pd.DataFrame:
            fr = g[g["v"] < 0]
            ed = g[g["v"] >= 0]
            if not len(fr) or not len(ed):
                return pd.DataFrame(
                    {
                        "s": np.array([], np.int64),
                        "u": np.array([], np.int64),
                        "v": np.array([], np.int64),
                        "sigma": np.array([], np.int64),
                    }
                )
            m = ed[["u", "v"]].merge(fr[["u", "s", "sigma"]], on="u")
            return m[["s", "u", "v", "sigma"]]

        su_edges = (
            prev.map_batches(f_tag, batch_format="pyarrow")
            .union(eb.map_batches(e_tag, batch_format="pyarrow"))
            .map_batches(lambda t: _add_shard(t, "u", n_sh), batch_format="pyarrow")
            .groupby("shard")
            .map_groups(
                lambda g: join_edges(g.drop(columns=["shard"])), batch_format="pandas"
            )
            .map_batches(lambda t: t, batch_format="pyarrow")
        )

        # attach q on (s, v); keep only successors that ARE level L
        def attach_and_reduce_prep(g: pd.DataFrame) -> pd.DataFrame:
            qq = g[g["u"] < 0]
            ee = g[g["u"] >= 0].drop(columns=["q"])  # NaN placeholder
            m = ee.merge(qq[["s", "v", "q"]], on=["s", "v"], how="inner")
            return m[["s", "u", "v", "sigma", "q"]]

        joined = (
            su_edges.map_batches(
                lambda t: t.append_column(
                    "q", pa.array(np.full(t.num_rows, np.nan, np.float64))
                ),
                batch_format="pyarrow",
            )
            .union(
                qrows.map_batches(
                    lambda t: pa.table(
                        {
                            "s": t.column("s"),
                            "u": pa.array(np.full(t.num_rows, -1, np.int64)),
                            "v": t.column("v"),
                            "sigma": pa.array(np.zeros(t.num_rows, np.int64)),
                            "q": t.column("q"),
                        }
                    ),
                    batch_format="pyarrow",
                )
            )
            .map_batches(lambda t: sv_key(t, "s", "v"), batch_format="pyarrow")
            .map_batches(lambda t: _add_shard(t, "_k", n_sh), batch_format="pyarrow")
            .groupby("shard")
            .map_groups(
                lambda g: attach_and_reduce_prep(g.drop(columns=["shard", "_k"])),
                batch_format="pandas",
            )
            .map_batches(lambda t: t, batch_format="pyarrow")
        )

        # per (s, u): sort by v, one reduceat — kernel-identical slices
        def reduce_delta(g: pd.DataFrame) -> pd.DataFrame:
            if not len(g):
                return pd.DataFrame(
                    {
                        "s": np.array([], np.int64),
                        "node": np.array([], np.int64),
                        "delta": np.array([], np.float64),
                    }
                )
            g = g.sort_values(["s", "u", "v"], kind="stable")
            su = (g["s"].to_numpy(np.int64) << np.int64(32)) ^ g["u"].to_numpy(
                np.int64
            )
            starts = np.flatnonzero(np.diff(su, prepend=su[0] - 1))
            sums = np.add.reduceat(g["q"].to_numpy(np.float64), starts)
            return pd.DataFrame(
                {
                    "s": g["s"].to_numpy(np.int64)[starts],
                    "node": g["u"].to_numpy(np.int64)[starts],
                    "delta": g["sigma"].to_numpy(np.int64)[starts] * sums,
                }
            )

        new_delta = (
            joined.map_batches(lambda t: sv_key(t, "s", "u"), batch_format="pyarrow")
            .map_batches(lambda t: _add_shard(t, "_k", n_sh), batch_format="pyarrow")
            .groupby("shard")
            .map_groups(
                lambda g: reduce_delta(g.drop(columns=["shard", "_k"])),
                batch_format="pandas",
            )
            .map_batches(lambda t: t, batch_format="pyarrow")
            .materialize()
        )
        delta = _rebase(delta.union(new_delta).materialize())

    # ---- bc per node: ascending-seed-order accumulation, seeds vectorized
    seed_list = [int(x) for x in seeds]

    def fold_bc(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["s"] != g["node"]]
        piv = g.pivot_table(
            index="node", columns="s", values="delta", aggfunc="first",
            fill_value=0.0,
        )
        bc = np.zeros(len(piv), np.float64)
        for s in seed_list:  # fixed ascending order, one vectorized add each
            if s in piv.columns:
                bc = bc + piv[s].to_numpy(np.float64)
        return pd.DataFrame(
            {
                "node": piv.index.to_numpy(np.int64),
                "bc_fp": np.floor(bc * _BC_FP).astype(np.int64),
            }
        )

    # every visited node appears (delta rows exist only where updated;
    # union the full node set with zero rows so unreached nodes emit 0)
    node_zero = state.map_batches(
        lambda t: pa.table(
            {
                "s": pa.array(np.full(t.num_rows, -1, np.int64)),
                "node": t.column("node"),
                "delta": pa.array(np.zeros(t.num_rows, np.float64)),
            }
        ),
        batch_format="pyarrow",
    )
    all_nodes = eb.map_batches(
        lambda t: pa.table(
            {
                "s": pa.array(
                    np.full(len(np.unique(t.column("u").to_numpy(zero_copy_only=False))), -1, np.int64)
                ),
                "node": pa.array(
                    np.unique(t.column("u").to_numpy(zero_copy_only=False)).astype(np.int64)
                ),
                "delta": pa.array(
                    np.zeros(len(np.unique(t.column("u").to_numpy(zero_copy_only=False))), np.float64)
                ),
            }
        ),
        batch_format="pyarrow",
    )
    return (
        delta.union(node_zero)
        .union(all_nodes)
        .map_batches(lambda t: _add_shard(t, "node", n_sh), batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: fold_bc(g.drop(columns=["shard"])), batch_format="pandas"
        )
        .map_batches(lambda t: t, batch_format="pyarrow")
    )


_ROBUST_FRACS = (0, 5, 10, 20, 40)  # percent of highest-degree nodes removed


def robustness_kernel(
    src: np.ndarray, dst: np.ndarray, fracs: tuple = _ROBUST_FRACS
) -> pd.DataFrame:
    """Pure targeted-attack robustness kernel (Albert/Jeong/Barabási 2000:
    error and attack tolerance of complex networks) over a directed string
    edge list, treated as undirected for connectivity: for each percent p,
    remove the top-p% nodes by undirected degree (ties → smaller node id
    removed first — a total order, so the curve is a pure function of the
    edge set) and report surviving node/edge counts and the largest
    weakly-connected component. The hub-removal fragmentation curve is the
    'how dead is the crawl if the big hosts go away' read."""
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    u, v = inv[: len(src)], inv[len(src):]
    n = len(nodes)
    deg = np.bincount(u, minlength=n) + np.bincount(v, minlength=n)
    order = np.lexsort((np.arange(n), -deg))  # deg DESC, node ASC
    rows = []
    for p in fracs:
        k = n * p // 100
        removed = np.zeros(n, bool)
        removed[order[:k]] = True
        keep_e = ~(removed[u] | removed[v])
        uu, vv = u[keep_e], v[keep_e]
        # union-find over survivors
        parent = np.arange(n)

        def find(x: int) -> int:
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for a, b in zip(uu.tolist(), vv.tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        alive = ~removed
        if alive.any():
            roots = np.asarray([find(int(x)) for x in np.flatnonzero(alive)])
            largest = int(np.bincount(roots).max())
        else:
            largest = 0
        rows.append(
            {
                "pct_removed": int(p),
                "n_removed": int(k),
                "n_nodes_left": int(alive.sum()),
                "n_edges_left": int(keep_e.sum()),
                "largest_cc": largest,
            }
        )
    return pd.DataFrame(rows)


def robustness_curve(edges: rd.Dataset, driver_cap: int = 2_000_000) -> pd.DataFrame:
    """Targeted-attack robustness over a (src, dst) edge Dataset. Like
    connected_components, this wrapper's contract is ANALYSIS scale —
    under ``driver_cap`` edges the kernel runs on the driver; above it
    the degree table, removal sets and filtered edges stay Datasets
    (hash(node) shard degree sums → metadata-only rank stamp → co-shard
    endpoint anti-joins, the densest-subgraph filter shape) and the
    label-propagation components path computes the largest-CC sizes —
    at 10^10 nodes a caller consumes the per-step label Datasets
    directly instead of the summary frame."""
    edges = edges.materialize()
    if edges.count() <= driver_cap:
        ed = edges.to_pandas()
        return robustness_kernel(
            ed["src"].to_numpy(dtype=object), ed["dst"].to_numpy(dtype=object)
        )
    # distributed path (test-forced via driver_cap=0): degrees, removal
    # sets and filtered edges stay Datasets; components reuse the
    # size-gated connected_components wrapper per step (its own contract
    # is analysis-scale O(nodes) labels — at 10^10 nodes a caller consumes
    # the per-step label Datasets instead of this summary frame)
    from ..stages.indexing import zip_with_index
    from .dedup import _add_shard, cluster_shards

    n_sh = cluster_shards()

    def deg_partial(t: pa.Table) -> pa.Table:
        v, c = np.unique(
            np.concatenate(
                [
                    t.column("src").to_numpy(zero_copy_only=False),
                    t.column("dst").to_numpy(zero_copy_only=False),
                ]
            ),
            return_counts=True,
        )
        return pa.table(
            {"node": pa.array(v, pa.string()), "deg": pa.array(c.astype(np.int64))}
        )

    deg = (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .map_batches(lambda t: _add_shard(t, "node", n_sh), batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: g.drop(columns=["shard"]).groupby("node", as_index=False)[
                "deg"
            ].sum(),
            batch_format="pandas",
        )
        .map_batches(
            lambda t: t.append_column(
                "negdeg",
                pa.array(
                    -t.column("deg").to_numpy(zero_copy_only=False).astype(np.int64)
                ),
            ),
            batch_format="pyarrow",
        )
    )
    ranked, n = zip_with_index(deg, ["negdeg", "node"], col="rank", with_count=True)
    ranked = ranked.materialize()
    rows = []
    for p in _ROBUST_FRACS:
        k = n * p // 100
        removed = ranked.map_batches(
            lambda t, k=k: t.filter(
                pa.compute.less(t.column("rank"), pa.scalar(k, pa.int64()))
            ).select(["node"]),
            batch_format="pyarrow",
        ).materialize()

        def anti(col: str, ed: rd.Dataset) -> rd.Dataset:
            tagged = ed.map_batches(
                lambda t, col=col: pa.table(
                    {
                        "src": t.column("src"),
                        "dst": t.column("dst"),
                        "_key": t.column(col),
                    }
                ),
                batch_format="pyarrow",
            ).union(
                removed.map_batches(
                    lambda t: pa.table(
                        {
                            "src": pa.array([""] * t.num_rows, pa.string()),
                            "dst": pa.array([""] * t.num_rows, pa.string()),
                            "_key": t.column("node"),
                        }
                    ),
                    batch_format="pyarrow",
                )
            )

            def drop_marked(g: pd.DataFrame) -> pd.DataFrame:
                gone = set(g.loc[g["src"] == "", "_key"])
                keep = g[(g["src"] != "") & (~g["_key"].isin(gone))]
                return keep[["src", "dst"]]

            return (
                tagged.map_batches(
                    lambda t: _add_shard(t, "_key", n_sh), batch_format="pyarrow"
                )
                .groupby("shard")
                .map_groups(
                    lambda g: drop_marked(g.drop(columns=["shard"])),
                    batch_format="pandas",
                )
                .map_batches(lambda t: t, batch_format="pyarrow")
            )

        kept = anti("dst", anti("src", edges)).materialize()
        n_edges_left = kept.count()
        n_left = n - k
        largest = 0
        if n_edges_left:
            labels = connected_components(kept)
            largest = int(
                labels.map_batches(
                    lambda t: pa.table(
                        {"component": t.column("component")}
                    ),
                    batch_format="pyarrow",
                )
                .map_batches(
                    lambda t: _add_shard(t, "component", n_sh), batch_format="pyarrow"
                )
                .groupby("shard")
                .map_groups(
                    lambda g: pd.DataFrame(
                        {"m": [int(g.groupby("component").size().max())]}
                    )
                    if len(g)
                    else pd.DataFrame({"m": [0]}),
                    batch_format="pandas",
                )
                .to_pandas()["m"].max()
            )
        if n_left > 0:
            largest = max(largest, 1)  # isolated survivors are size-1 CCs
        rows.append(
            {
                "pct_removed": int(p),
                "n_removed": int(k),
                "n_nodes_left": int(n_left),
                "n_edges_left": int(n_edges_left),
                "largest_cc": int(largest),
            }
        )
    return pd.DataFrame(rows)
