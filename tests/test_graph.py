"""PageRank / link-graph ops: both execution paths pinned against a dense
numpy power iteration with identical dangling handling, plus edge
extraction from a raw fetch table."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from cloud_crawler_ray.ops.graph import link_edges, pagerank

# src -> dst; node 3 dangling, node 2 the hub
EDGES = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (4, 0), (5, 1)]
N = 6


def _names():
    return {i: f"http://h.example.com/n{i}" for i in range(N)}


def _edges_ds(repart: int = 3) -> rd.Dataset:
    names = _names()
    tbl = pa.table(
        {
            "src": [names[a] for a, b in EDGES],
            "dst": [names[b] for a, b in EDGES],
        }
    )
    ds = rd.from_arrow(tbl)
    return ds.repartition(repart) if repart > 1 else ds


def _ref_pagerank(n_iter: int, d: float = 0.85) -> np.ndarray:
    deg = np.zeros(N)
    for a, _ in EDGES:
        deg[a] += 1
    r = np.full(N, 1 / N)
    for _ in range(n_iter):
        dangling = r[deg == 0].sum()
        new = np.full(N, (1 - d) / N + d * dangling / N)
        for a, b in EDGES:
            new[b] += d * r[a] / deg[a]
        r = new
    return r


def _got_vector(ds: rd.Dataset) -> np.ndarray:
    names = _names()
    got = ds.to_pandas()
    m = dict(zip(got["node"], got["rank"]))
    assert len(m) == N
    return np.array([m[names[i]] for i in range(N)])


@pytest.mark.parametrize("repart", [1, 3])
def test_pagerank_driver_path_matches_numpy(ray_session, repart):
    # default size gates → the collect-once driver path at this size
    g = _got_vector(pagerank(_edges_ds(repart), n_iter=8))
    exp = _ref_pagerank(8)
    assert np.allclose(g, exp, atol=1e-12)
    assert abs(g.sum() - 1.0) < 1e-9  # dangling mass redistributed


def test_pagerank_dense_broadcast_path_matches_numpy(ray_session):
    # driver_cap=0 forces the per-iteration rank-broadcast path
    g = _got_vector(pagerank(_edges_ds(), n_iter=8, driver_cap=0))
    exp = _ref_pagerank(8)
    assert np.allclose(g, exp, atol=1e-12)
    assert abs(g.sum() - 1.0) < 1e-9


def test_pagerank_join_path_matches_numpy(ray_session):
    # dense_cap=0 + driver_cap=0 force the at-scale Dataset-join path
    # (ranks never assemble on the driver); fewer iterations to bound
    # test time
    g = _got_vector(pagerank(_edges_ds(), n_iter=3, dense_cap=0, driver_cap=0))
    exp = _ref_pagerank(3)
    assert np.allclose(g, exp, atol=1e-12)
    assert abs(g.sum() - 1.0) < 1e-9


def _ref_personalized(n_iter: int, seed_ids: list[int], d: float = 0.85) -> np.ndarray:
    deg = np.zeros(N)
    for a, _ in EDGES:
        deg[a] += 1
    t = np.zeros(N)
    t[seed_ids] = 1.0 / len(seed_ids)
    r = t.copy()
    for _ in range(n_iter):
        dangling = r[deg == 0].sum()
        new = ((1 - d) + d * dangling) * t
        for a, b in EDGES:
            new[b] += d * r[a] / deg[a]
        r = new
    return r


SEEDS = [0, 4]


def _seed_urls():
    names = _names()
    return [names[i] for i in SEEDS]


@pytest.mark.parametrize("repart", [1, 3])
def test_personalized_pagerank_driver_path(ray_session, repart):
    g = _got_vector(pagerank(_edges_ds(repart), n_iter=8, seeds=_seed_urls()))
    exp = _ref_personalized(8, SEEDS)
    assert np.allclose(g, exp, atol=1e-12)
    assert abs(g.sum() - 1.0) < 1e-9  # restarts + dangling return to seeds
    # mass concentrates near the restart set vs the uniform walk
    uni = _ref_pagerank(8)
    assert g[0] > uni[0]


def test_personalized_pagerank_dense_broadcast_path(ray_session):
    g = _got_vector(pagerank(_edges_ds(), n_iter=8, driver_cap=0, seeds=_seed_urls()))
    exp = _ref_personalized(8, SEEDS)
    assert np.allclose(g, exp, atol=1e-12)
    assert abs(g.sum() - 1.0) < 1e-9


def test_personalized_pagerank_join_path(ray_session):
    g = _got_vector(
        pagerank(_edges_ds(), n_iter=3, dense_cap=0, driver_cap=0, seeds=_seed_urls())
    )
    exp = _ref_personalized(3, SEEDS)
    assert np.allclose(g, exp, atol=1e-12)
    assert abs(g.sum() - 1.0) < 1e-9


def test_personalized_pagerank_unknown_seed_raises(ray_session):
    with pytest.raises(ValueError):
        pagerank(_edges_ds(), n_iter=2, seeds=["http://nowhere.example.com/"])


def test_link_edges_dedup_and_canonicalize(ray_session):
    raw = pa.table(
        {
            "canonical_url": [
                "http://a.example.com/",
                "http://a.example.com/",  # duplicate fetch row (two waves)
                "http://b.example.com/",
            ],
            "child_urls": [
                ["http://a.example.com/x", "HTTPS://A.example.com/x"],
                ["http://a.example.com/x"],
                ["http://a.example.com/x#frag"],
            ],
            "fetched": [True, True, False],  # unfetched page emits no edges
        }
    )
    edges = link_edges(rd.from_arrow(raw)).to_pandas()
    pairs = set(zip(edges["src"], edges["dst"]))
    # both children of a canonicalize to the same dst; dedup keeps one edge;
    # the unfetched b row contributes nothing
    assert pairs == {("http://a.example.com/", "http://a.example.com/x")}


def test_pagerank_empty(ray_session):
    empty = rd.from_arrow(
        pa.table({"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())})
    )
    assert pagerank(empty, n_iter=2).count() == 0


def _ref_hits(n_iter: int):
    hub = np.full(N, 1.0)
    auth = np.full(N, 1.0)
    for _ in range(n_iter):
        new_auth = np.zeros(N)
        for a, b in EDGES:
            new_auth[b] += hub[a]
        na = np.linalg.norm(new_auth)
        auth = new_auth / na if na > 0 else new_auth
        new_hub = np.zeros(N)
        for a, b in EDGES:
            new_hub[a] += auth[b]
        nh = np.linalg.norm(new_hub)
        hub = new_hub / nh if nh > 0 else new_hub
    return hub, auth


@pytest.mark.parametrize("driver_cap", [2_000_000, 0])
def test_hits_matches_numpy(ray_session, driver_cap):
    from cloud_crawler_ray.ops.graph import hits

    n_iter = 4 if driver_cap == 0 else 16  # bound the broadcast-path time
    got = hits(_edges_ds(), n_iter=n_iter, driver_cap=driver_cap).to_pandas()
    names = _names()
    hub, auth = _ref_hits(n_iter)
    m = {r.node: (r.hub, r.authority) for r in got.itertuples()}
    for i in range(N):
        gh, ga = m[names[i]]
        assert abs(gh - hub[i]) < 1e-12 and abs(ga - auth[i]) < 1e-12, i


def test_connected_components(ray_session):
    import ray.data as rd
    from cloud_crawler_ray.ops.graph import connected_components

    # two components: {n0..n3} (via 0-1,2-3,1-2) and {n4, n5}
    names = _names()
    E = [(0, 1), (2, 3), (1, 2), (4, 5)]
    edges = rd.from_arrow(
        pa.table(
            {
                "src": [names[a] for a, _ in E],
                "dst": [names[b] for _, b in E],
            }
        )
    ).repartition(2)
    got = connected_components(edges).to_pandas()
    comp = dict(zip(got["node"], got["component"]))
    assert comp[names[0]] == comp[names[3]] == names[0]
    assert comp[names[4]] == comp[names[5]] == names[4]
    assert comp[names[0]] != comp[names[4]]


def _docs_with_spans() -> rd.Dataset:
    from cloud_crawler_ray.schemas import DOCUMENTS_SCHEMA

    def spans(items):
        return [
            {"kind": k, "text": t, "media_ref": m, "offset": i}
            for i, (k, t, m) in enumerate(items)
        ]

    rows = {
        "doc_id": ["http://h/a", "http://h/b", "http://h/c"],
        "spans": [
            spans(
                [
                    ("text", "intro", ""),
                    ("link", "to x", "http://h/x"),
                    ("link", "also x", "http://h/x"),
                    ("image", "", "http://h/img.png"),
                    ("link", "to y", "http://h/y"),
                ]
            ),
            spans(
                [
                    ("link", "to x", "http://h/x"),  # same anchor, different doc
                    ("text", "body", ""),
                ]
            ),
            spans([("text", "no links", "")]),
        ],
    }
    tbl = pa.Table.from_pydict(rows, schema=DOCUMENTS_SCHEMA)
    return rd.from_arrow(tbl).repartition(2)


def test_anchor_text_index(ray_session):
    from cloud_crawler_ray.ops.graph import anchor_text_index

    out = (
        anchor_text_index(_docs_with_spans())
        .to_pandas()
        .sort_values("target")
        .reset_index(drop=True)
    )
    assert out["target"].tolist() == ["http://h/x", "http://h/y"]
    assert out["n_refs"].tolist() == [2, 1]
    assert out["anchors"].tolist() == ["also x\x1fto x", "to y"]


def test_anchor_text_index_matches_crawl_oracle(ray_session):
    """Corpus-level parity on a real crawl: recompute the index row-by-row
    from the Python oracle's documents and compare exactly."""
    from collections import defaultdict

    from cloud_crawler_ray.oracle import crawl_oracle
    from cloud_crawler_ray.ops.graph import anchor_text_index
    from cloud_crawler_ray.pipelines.crawl import crawl
    from cloud_crawler_ray.spec import CrawlSpec
    from cloud_crawler_ray.synthweb import make_skewed_web

    import shutil

    web, seeds = make_skewed_web(300, n_hosts=6, seed=13)
    out_dir = "/tmp/ccray_anchor_idx_test"
    shutil.rmtree(out_dir, ignore_errors=True)
    spec = CrawlSpec(delay=0.01)
    h = crawl(web, seeds, spec, out_dir)
    got = (
        anchor_text_index(h.documents())
        .to_pandas()
        .sort_values("target")
        .reset_index(drop=True)
    )
    ora = crawl_oracle(web, seeds, spec)
    refs = defaultdict(set)
    anchors = defaultdict(set)
    for doc in ora.documents:
        for s in doc["spans"]:
            if s["kind"] == "link":
                refs[s["media_ref"]].add(doc["doc_id"])
                anchors[s["media_ref"]].add(s["text"])
    assert got["target"].tolist() == sorted(refs)
    for _, row in got.iterrows():
        assert row["n_refs"] == len(refs[row["target"]])
        assert row["anchors"] == "\x1f".join(sorted(anchors[row["target"]]))


def _brute_triangles(edges):
    es = set(map(tuple, edges))
    nodes = sorted({x for e in edges for x in e})
    out = []
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if (a, b) not in es:
                continue
            for c in nodes:
                if c > b and (a, c) in es and (b, c) in es:
                    out.append((a, b, c))
    return sorted(out)


def test_triangles_both_paths(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cloud_crawler_ray.ops.graph import triangles

    rng = np.random.default_rng(5)
    n = 40
    edges = sorted(
        {
            (int(a), int(b)) if a < b else (int(b), int(a))
            for a, b in rng.integers(0, n, size=(260, 2))
            if a != b
        }
    )
    expect = _brute_triangles(edges)
    assert len(expect) > 5  # the fixture really contains triangles
    tbl = pa.table(
        {
            "a": pa.array([e[0] for e in edges], pa.int64()),
            "b": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    for cap in (2_000_000, 0):  # broadcast path, then forced shard-join path
        got = triangles(rd.from_arrow(tbl).repartition(5), broadcast_cap=cap).to_pandas()
        got_t = sorted(map(tuple, got[["a", "b", "c"]].itertuples(index=False)))
        assert got_t == expect, (cap, len(got_t), len(expect))


def test_triangles_empty_and_no_triangles(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from cloud_crawler_ray.ops.graph import triangles

    # a path graph has no triangles
    tbl = pa.table({"a": pa.array([0, 1, 2], pa.int64()), "b": pa.array([1, 2, 3], pa.int64())})
    got = triangles(rd.from_arrow(tbl)).to_pandas()
    assert len(got) == 0


def _brute_k_core(edges, k):
    es = set(map(tuple, edges))
    while True:
        deg = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        bad = {n for n, d in deg.items() if d < k}
        if not bad:
            return sorted(es)
        es = {e for e in es if e[0] not in bad and e[1] not in bad}


def test_k_core_both_paths(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cloud_crawler_ray.ops.graph import k_core

    rng = np.random.default_rng(13)
    # sparse random graph (dissolves under k=8 peeling) + a planted 12-clique
    edges = {
        (int(a), int(b)) if a < b else (int(b), int(a))
        for a, b in rng.integers(0, 200, size=(400, 2))
        if a != b
    }
    clique = rng.choice(np.arange(1000, 1100), 12, replace=False)
    ii, jj = np.triu_indices(12, k=1)
    edges |= {
        (int(min(clique[i], clique[j])), int(max(clique[i], clique[j])))
        for i, j in zip(ii, jj)
    }
    edges = sorted(edges)
    expect = _brute_k_core(edges, 8)
    assert len(expect) >= 66  # the clique (66 edges) must survive
    tbl = pa.table(
        {
            "a": pa.array([e[0] for e in edges], pa.int64()),
            "b": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    for cap in (5_000_000, 0):  # broadcast peel, then forced anti-join path
        got = k_core(rd.from_arrow(tbl).repartition(4), k=8, broadcast_cap=cap).to_pandas()
        got_e = sorted(map(tuple, got[["a", "b"]].itertuples(index=False)))
        assert got_e == expect, (cap, len(got_e), len(expect))


def test_k_core_empty_result(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from cloud_crawler_ray.ops.graph import k_core

    tbl = pa.table({"a": pa.array([0, 1], pa.int64()), "b": pa.array([1, 2], pa.int64())})
    got = k_core(rd.from_arrow(tbl), k=3)
    assert got.count() == 0


def test_random_walks_both_paths_identical(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cloud_crawler_ray.ops.graph import random_walks

    rng = np.random.default_rng(21)
    edges = sorted(
        {
            (int(a), int(b)) if a < b else (int(b), int(a))
            for a, b in rng.integers(0, 50, size=(150, 2))
            if a != b
        }
    )
    es = set(edges) | {(b, a) for a, b in edges}
    tbl = pa.table(
        {
            "a": pa.array([e[0] for e in edges], pa.int64()),
            "b": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    outs = []
    for cap in (5_000_000, 0):
        got = (
            random_walks(
                rd.from_arrow(tbl).repartition(4), walk_len=6, walks_per_node=2, broadcast_cap=cap
            )
            .to_pandas()
            .sort_values("walk_id")
            .reset_index(drop=True)
        )
        outs.append(got)
        # every walk starts at its start node and every hop is a real edge
        for _, row in got.iterrows():
            w = list(row["walk"])
            assert w[0] == row["start"]
            for x, y in zip(w, w[1:]):
                assert (x, y) in es, (x, y)
    a, b = outs
    assert a["walk_id"].tolist() == b["walk_id"].tolist()
    assert [list(w) for w in a["walk"]] == [list(w) for w in b["walk"]]
    # every node starts walks_per_node walks
    nodes = {x for e in edges for x in e}
    assert len(a) == 2 * len(nodes)


def test_random_walks_partition_invariant_and_dead_end(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from cloud_crawler_ray.ops.graph import random_walks

    # undirected walks never hit a dead end (you can always go back), so
    # this pins partition invariance and full walk lengths on a small graph
    tbl = pa.table({"a": pa.array([0, 1, 10], pa.int64()), "b": pa.array([1, 2, 11], pa.int64())})
    a = (
        random_walks(rd.from_arrow(tbl).repartition(1), walk_len=5, walks_per_node=1)
        .to_pandas().sort_values("walk_id").reset_index(drop=True)
    )
    b = (
        random_walks(rd.from_arrow(tbl).repartition(3), walk_len=5, walks_per_node=1)
        .to_pandas().sort_values("walk_id").reset_index(drop=True)
    )
    assert [list(w) for w in a["walk"]] == [list(w) for w in b["walk"]]
    assert (a["walk"].apply(len) == 5).all()


def test_bfs_distances_vs_brute(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cloud_crawler_ray.ops.graph import bfs_distances

    rng = np.random.default_rng(31)
    edges = sorted(
        {
            (int(a), int(b)) if a < b else (int(b), int(a))
            for a, b in rng.integers(0, 120, size=(200, 2))
            if a != b
        }
    )
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seeds = [0, 1]
    # brute BFS
    from collections import deque
    dist = {s: 0 for s in seeds}
    dq = deque(seeds)
    while dq:
        u = dq.popleft()
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    tbl = pa.table(
        {
            "a": pa.array([e[0] for e in edges], pa.int64()),
            "b": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    for cap in (2_000_000, 0):  # driver numpy path, then forced distributed
        got = (
            bfs_distances(rd.from_arrow(tbl).repartition(4), seeds, driver_cap=cap)
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        assert dict(zip(got["node"], got["dist"])) == dist, cap
        # max_depth truncation matches the depth-bounded relation
        got2 = bfs_distances(rd.from_arrow(tbl), seeds, max_depth=2, driver_cap=cap).to_pandas()
        expect2 = {n: dd for n, dd in dist.items() if dd <= 2}
        assert dict(zip(got2["node"], got2["dist"])) == expect2, cap


def _community_edges_ds(repart: int = 3) -> rd.Dataset:
    # two 4-cliques bridged by one edge — LPA must find both communities
    names = {i: f"http://c.example.com/n{i}" for i in range(8)}
    pairs = []
    for grp in (range(0, 4), range(4, 8)):
        grp = list(grp)
        for i in grp:
            for j in grp:
                if i < j:
                    pairs.append((i, j))
    pairs.append((3, 4))  # bridge
    tbl = pa.table(
        {
            "src": [names[a] for a, b in pairs],
            "dst": [names[b] for a, b in pairs],
        }
    )
    ds = rd.from_arrow(tbl)
    return ds.repartition(repart) if repart > 1 else ds


def _lpa_expected(n_iter: int) -> dict:
    from cloud_crawler_ray.ops.graph import lpa_iterations

    names = sorted(f"http://c.example.com/n{i}" for i in range(8))
    pairs = []
    for grp in (range(0, 4), range(4, 8)):
        grp = list(grp)
        for i in grp:
            for j in grp:
                if i < j:
                    pairs.append((i, j))
    pairs.append((3, 4))
    idx = {u: i for i, u in enumerate(names)}
    und = set()
    for a, b in pairs:
        ua, ub = idx[f"http://c.example.com/n{a}"], idx[f"http://c.example.com/n{b}"]
        und.add((ua, ub))
        und.add((ub, ua))
    uv = np.array(sorted(und), dtype=np.int64)
    labels = lpa_iterations(8, uv[:, 0], uv[:, 1], n_iter)
    return dict(zip(names, labels))


@pytest.mark.parametrize("repart", [1, 4])
def test_label_propagation_driver_path(ray_session, repart):
    from cloud_crawler_ray.ops.graph import label_propagation

    got = label_propagation(_community_edges_ds(repart), n_iter=5).to_pandas()
    exp = _lpa_expected(5)
    assert dict(zip(got["node"], got["community"])) == exp
    # the two planted cliques land in two distinct communities
    comm = dict(zip(got["node"], got["community"]))
    left = {comm[f"http://c.example.com/n{i}"] for i in range(4)}
    right = {comm[f"http://c.example.com/n{i}"] for i in range(4, 8)}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_label_propagation_join_path_matches_driver(ray_session):
    from cloud_crawler_ray.ops.graph import label_propagation

    got = label_propagation(
        _community_edges_ds(), n_iter=5, driver_cap=0, join_broadcast_cap=0
    ).to_pandas()
    exp = _lpa_expected(5)
    assert dict(zip(got["node"], got["community"])) == exp


def test_scc_kernel_matches_bruteforce_closure():
    """scc_coloring vs an O(n^3) transitive-closure oracle on random
    digraphs, plus the planted two-cycle/bridge/DAG-tail shape."""
    from cloud_crawler_ray.ops.graph import scc_coloring

    # cycle A 0->1->2->0, cycle B 3->4->3, one-way bridge 2->3, tail 4->5
    src = np.array([0, 1, 2, 3, 4, 2, 4], np.int64)
    dst = np.array([1, 2, 0, 4, 3, 3, 5], np.int64)
    assert scc_coloring(6, src, dst).tolist() == [0, 0, 0, 3, 3, 5]

    rng = np.random.default_rng(42)
    for _ in range(25):
        n = int(rng.integers(2, 14))
        m = int(rng.integers(1, 40))
        s = rng.integers(0, n, m).astype(np.int64)
        d = rng.integers(0, n, m).astype(np.int64)
        reach = np.eye(n, dtype=bool)
        adj = np.zeros((n, n), bool)
        adj[s, d] = True
        for _ in range(n):
            reach = reach | (reach @ adj)
        mutual = reach & reach.T
        expect = np.array([np.flatnonzero(mutual[i])[0] for i in range(n)])
        assert np.array_equal(scc_coloring(n, s, d), expect)


def test_scc_wrapper_labels_and_cap(ray_session):
    from cloud_crawler_ray.ops.graph import strongly_connected_components

    edges = pa.table(
        {
            "src": ["a", "b", "c", "x", "y"],
            "dst": ["b", "a", "a", "y", "x"],
        }
    )
    out = (
        strongly_connected_components(rd.from_arrow(edges))
        .to_pandas()
        .set_index("node")["scc"]
    )
    assert out["a"] == out["b"] == "a"
    assert out["c"] == "c"  # one-way into the cycle: singleton
    assert out["x"] == out["y"] == "x"
    # over-cap: the distributed path engages and must agree exactly
    dist = (
        strongly_connected_components(rd.from_arrow(edges), driver_edge_cap=2)
        .to_pandas()
        .set_index("node")["scc"]
    )
    assert dist.sort_index().equals(out.sort_index())


def test_scc_distributed_path_matches_driver(ray_session):
    """Test-force the at-scale SCC path (driver_edge_cap=0 → per-round
    broadcast/sharded min-max joins, labels stay Datasets) and pin it to
    the driver kernel on a cyclic graph and a pure chain (trim path)."""
    from cloud_crawler_ray.ops.graph import strongly_connected_components

    cyc = pa.table(
        {
            "src": ["a", "b", "c", "d", "e", "c", "e"],
            "dst": ["b", "c", "a", "e", "d", "d", "f"],
        }
    )
    chain = pa.table(
        {"src": [f"n{i}" for i in range(4)], "dst": [f"n{i+1}" for i in range(4)]}
    )
    for edges in (cyc, chain):
        drv = (
            strongly_connected_components(rd.from_arrow(edges))
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        dist = (
            strongly_connected_components(rd.from_arrow(edges), driver_edge_cap=0)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        assert drv.equals(dist)


def test_bowtie_kernel_classes():
    """Planted bowtie: IN chain → 3-cycle core → OUT chain, plus a
    disconnected pair."""
    from cloud_crawler_ray.ops.graph import bowtie_kernel

    # nodes 0..7: 0->1->2 (IN), core {2,3,4} cycle, 4->5->6 (OUT), 7 isolated edge 7->7? use 7->8
    src = np.array([0, 1, 2, 3, 4, 4, 5, 7], np.int64)
    dst = np.array([1, 2, 3, 4, 2, 5, 6, 8], np.int64)
    cls = bowtie_kernel(9, src, dst)
    # 0=CORE 1=IN 2=OUT 3=OTHER
    assert cls[2] == cls[3] == cls[4] == 0
    assert cls[0] == cls[1] == 1
    assert cls[5] == cls[6] == 2
    assert cls[7] == cls[8] == 3


def test_anf_kernel_sanity_and_fixpoint():
    import numpy as np

    from cloud_crawler_ray.ops.graph import anf_kernel

    # directed path a->b->c->d: balls grow by one per round, fixpoint at 3
    nodes = np.array(["a", "b", "c", "d"], dtype=object)
    src = np.array([0, 1, 2])
    dst = np.array([1, 2, 3])
    out = anf_kernel(nodes, src, dst, p=6, t_max=16)
    assert list(out["t"]) == [0, 1, 2, 3]
    nf = out["nf_fp"].to_numpy()
    assert (np.diff(nf) > 0).all()  # strictly growing until fixpoint
    # with 64 registers and <=4 elements, linear counting is near-exact:
    # true N(t) sums are 4, 7, 9, 10
    est = out["nf_est"].to_numpy()
    for e, true in zip(est, [4, 7, 9, 10]):
        assert abs(e - true) / true < 0.2
    assert out["eff_diameter"].iloc[0] == 3  # N(3)=10 needed to reach 90%

    # edge order must not matter (max-merge is order-free)
    perm = np.array([2, 0, 1])
    out2 = anf_kernel(nodes, src[perm], dst[perm], p=6, t_max=16)
    assert (out2["nf_fp"].to_numpy() == nf).all()


def test_neighborhood_function_distributed_parity(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cloud_crawler_ray.ops.graph import neighborhood_function

    rng = np.random.default_rng(11)
    n = 40
    src = rng.integers(0, n, 120)
    dst = rng.integers(0, n, 120)
    keep = src != dst
    ed = pd.DataFrame(
        {"src": [f"u{s}" for s in src[keep]], "dst": [f"u{d}" for d in dst[keep]]}
    ).drop_duplicates()
    ds = rd.from_pandas(ed).repartition(4)
    a = neighborhood_function(ds, p=6, t_max=16).to_pandas().sort_values("t")
    b = (
        neighborhood_function(ds, p=6, t_max=16, driver_cap=0)
        .to_pandas()
        .sort_values("t")
    )
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


def test_harmonic_kernel_star_graph():
    import numpy as np

    from cloud_crawler_ray.ops.graph import _ANF_FP, harmonic_kernel

    # star: a,b,c,d all point at z; z's in-ball grows to 5 at t=1 ->
    # hc(z) ~ 4 (four nodes at distance 1); leaves have in-degree 0 -> 0
    nodes = np.array(["a", "b", "c", "d", "z"], dtype=object)
    src = np.array([0, 1, 2, 3])
    dst = np.array([4, 4, 4, 4])
    hc = harmonic_kernel(nodes, src, dst, p=8)
    assert hc[4] / _ANF_FP > 3.0  # ~4 with HLL error at m=256
    assert all(h == 0 for h in hc[:4])
    # chain a->b->c: hc(c) ~ 1 + 1/2, hc(b) ~ 1, hc(a) = 0
    nodes2 = np.array(["a", "b", "c"], dtype=object)
    hc2 = harmonic_kernel(nodes2, np.array([0, 1]), np.array([1, 2]), p=8)
    assert hc2[0] == 0
    assert 0.6 < hc2[1] / _ANF_FP < 1.4
    assert 1.0 < hc2[2] / _ANF_FP < 2.0


def test_harmonic_centrality_distributed_parity(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cloud_crawler_ray.ops.graph import harmonic_centrality

    rng = np.random.default_rng(13)
    n = 30
    src = rng.integers(0, n, 90)
    dst = rng.integers(0, n, 90)
    keep = src != dst
    ed = pd.DataFrame(
        {"src": [f"u{s}" for s in src[keep]], "dst": [f"u{d}" for d in dst[keep]]}
    ).drop_duplicates()
    ds = rd.from_pandas(ed).repartition(4)
    a = harmonic_centrality(ds, k=10)
    b = harmonic_centrality(ds, k=10, driver_cap=0)
    pd.testing.assert_frame_equal(a, b)


def test_ktruss_kernel_planted():
    import numpy as np

    from cloud_crawler_ray.ops.graph import ktruss_kernel

    # K4 on {0,1,2,3} (every edge in 2 triangles) + a pendant triangle
    # {3,4,5} + a dangling edge (5,6)
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
             (3, 4), (3, 5), (4, 5), (5, 6)]
    a = np.array([e[0] for e in edges])
    b = np.array([e[1] for e in edges])
    # 3-truss: every edge in >=1 triangle (within survivors) -> drops (5,6)
    ka, kb = ktruss_kernel(a, b, 3)
    assert set(zip(ka, kb)) == set(edges[:-1])
    # 4-truss: every edge in >=2 triangles -> only K4 survives (the
    # pendant triangle's edges have support 1 and peel, which then peels
    # nothing else since K4 is self-sufficient)
    ka, kb = ktruss_kernel(a, b, 4)
    assert set(zip(ka, kb)) == set(edges[:6])
    # 5-truss of K4: every edge would need 3 triangles -> empty
    ka, kb = ktruss_kernel(a, b, 5)
    assert len(ka) == 0


def test_k_truss_distributed_parity(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cloud_crawler_ray.ops.graph import k_truss

    rng = np.random.default_rng(17)
    n = 25
    src = rng.integers(0, n, 140)
    dst = rng.integers(0, n, 140)
    keep = src < dst
    ed = pd.DataFrame({"a": src[keep], "b": dst[keep]}).drop_duplicates()
    ds = rd.from_pandas(ed).repartition(4)
    a = (
        k_truss(ds, k=3)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
        .astype(np.int64)
    )
    bdf = (
        k_truss(ds, k=3, driver_cap=0)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
        .astype(np.int64)
    )
    assert len(a) > 0  # dense random graph keeps a triangle core
    pd.testing.assert_frame_equal(a, bdf)


def test_sssp_kernel_vs_floyd_warshall():
    import numpy as np

    from cloud_crawler_ray.ops.graph import _SSSP_INF, sssp_kernel

    rng = np.random.default_rng(21)
    n = 18
    src = rng.integers(0, n, 70)
    dst = rng.integers(0, n, 70)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.integers(1, 50, keep.sum()).astype(np.int64)
    seeds = np.array([0, 5])
    dist = sssp_kernel(n, src, dst, w, seeds)
    # Floyd-Warshall reference
    INF = 10**12
    D = np.full((n, n), INF, np.int64)
    np.fill_diagonal(D, 0)
    for s, d, ww in zip(src, dst, w):
        D[s, d] = min(D[s, d], ww)
    for kk in range(n):
        D = np.minimum(D, D[:, kk : kk + 1] + D[kk : kk + 1, :])
    ref = np.minimum(D[0], D[5])
    for i in range(n):
        if ref[i] >= INF:
            assert dist[i] == _SSSP_INF
        else:
            assert dist[i] == ref[i], (i, dist[i], ref[i])


def test_weighted_sssp_distributed_parity(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cloud_crawler_ray.ops.graph import weighted_sssp

    rng = np.random.default_rng(23)
    n = 25
    src = rng.integers(0, n, 80)
    dst = rng.integers(0, n, 80)
    keep = src != dst
    ed = pd.DataFrame(
        {
            "src": [f"u{s}" for s in src[keep]],
            "dst": [f"u{d}" for d in dst[keep]],
            "w": rng.integers(1, 100, int(keep.sum())).astype(np.int64),
        }
    ).drop_duplicates(["src", "dst"])
    ds = rd.from_pandas(ed).repartition(4)
    seeds = ["u0", "u1", "zzz-not-in-graph"]
    a = (
        weighted_sssp(ds, seeds)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    b = (
        weighted_sssp(ds, seeds, driver_cap=0)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert (a.set_index("node").loc[["u0", "u1", "zzz-not-in-graph"], "cost_ms"] == 0).all()


def test_link_pred_kernel_brute_force():
    """link_pred_kernel vs an itertools brute force on random undirected
    graphs: candidates = non-adjacent pairs with >=1 common neighbor,
    cn exact, ra_fp = sum(2^20 // deg(z)) exact."""
    import itertools

    import numpy as np

    from cloud_crawler_ray.ops.graph import _RA_FP, link_pred_kernel

    rng = np.random.default_rng(31)
    for trial in range(10):
        n = int(rng.integers(5, 20))
        m = int(rng.integers(4, 40))
        a = rng.integers(0, n, m)
        b = rng.integers(0, n, m)
        keep = a != b
        lo, hi = np.minimum(a[keep], b[keep]), np.maximum(a[keep], b[keep])
        ed = sorted(set(zip(lo.tolist(), hi.tolist())))
        if not ed:
            continue
        adj: dict[int, set[int]] = {}
        for x, y in ed:
            adj.setdefault(x, set()).add(y)
            adj.setdefault(y, set()).add(x)
        expect = {}
        for x, y in itertools.combinations(sorted(adj), 2):
            if y in adj[x]:
                continue
            common = adj[x] & adj[y]
            if common:
                expect[(x, y)] = (
                    len(common),
                    sum(_RA_FP // len(adj[z]) for z in common),
                )
        av = np.array([x for x, _ in ed], np.int64)
        bv = np.array([y for _, y in ed], np.int64)
        got = link_pred_kernel(av, bv)
        got_map = {
            (int(r.x), int(r.y)): (int(r.cn), int(r.ra_fp))
            for r in got.itertuples()
        }
        assert got_map == expect, (trial, ed)


def test_link_prediction_distributed_matches_kernel(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cloud_crawler_ray.ops.graph import link_pred_kernel, link_prediction

    rng = np.random.default_rng(33)
    a = rng.integers(0, 40, 150)
    b = rng.integers(0, 40, 150)
    keep = a != b
    lo, hi = np.minimum(a[keep], b[keep]), np.maximum(a[keep], b[keep])
    ed = (
        pd.DataFrame({"a": lo, "b": hi})
        .drop_duplicates()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    ds = rd.from_pandas(ed).repartition(5)
    got = (
        link_prediction(ds)
        .to_pandas()
        .sort_values(["x", "y"])
        .reset_index(drop=True)
    )
    ref = (
        link_pred_kernel(ed["a"].to_numpy(), ed["b"].to_numpy())
        .sort_values(["x", "y"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype(np.int64), ref.astype(np.int64)
    )


def test_graph_summary_brute_force(ray_session):
    """graph_summary vs a dict/set brute force on random directed graphs:
    reciprocity, assortativity sums, wedge/closed-wedge counts all exact."""
    import itertools

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cloud_crawler_ray.ops.graph import graph_summary

    rng = np.random.default_rng(41)
    for trial in range(3):
        n = int(rng.integers(6, 16))
        m = int(rng.integers(8, 60))
        s = rng.integers(0, n, m)
        d = rng.integers(0, n, m)
        keep = s != d
        ed = (
            pd.DataFrame({"src": s[keep], "dst": d[keep]})
            .drop_duplicates()
            .reset_index(drop=True)
        )
        es = set(zip(ed["src"].tolist(), ed["dst"].tolist()))
        od: dict[int, int] = {}
        ind: dict[int, int] = {}
        for x, y in es:
            od[x] = od.get(x, 0) + 1
            ind[y] = ind.get(y, 0) + 1
        xs = [od[x] for x, y in es]
        ys = [ind[y] for x, y in es]
        und = {(min(x, y), max(x, y)) for x, y in es}
        adj: dict[int, set[int]] = {}
        for a, b in und:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
        tri = sum(
            1
            for a, b, c in itertools.combinations(sorted(adj), 3)
            if b in adj[a] and c in adj[a] and c in adj[b]
        )
        expect = {
            "closed_wedges": 3 * tri,
            "m_edges": len(es),
            "recip_edges": sum(1 for x, y in es if (y, x) in es),
            "sum_x": sum(xs),
            "sum_x2": sum(v * v for v in xs),
            "sum_xy": sum(a * b for a, b in zip(xs, ys)),
            "sum_y": sum(ys),
            "sum_y2": sum(v * v for v in ys),
            "wedges": wedges,
        }
        got = graph_summary(rd.from_pandas(ed).repartition(4))
        got_map = dict(zip(got["metric"], got["v"].astype(int)))
        assert got_map == expect, (trial, got_map, expect)


def _prim_reference(ed, nodes):
    """Independent Prim with the same (w, a, b) total order, per component."""
    import heapq

    adj: dict[str, list[tuple[int, str, str, str]]] = {}
    for a, b, w in ed:
        adj.setdefault(a, []).append((w, a, b, b))
        adj.setdefault(b, []).append((w, a, b, a))
    seen: set[str] = set()
    kept = set()
    for start in sorted(nodes):
        if start in seen:
            continue
        seen.add(start)
        heap = list(adj.get(start, []))
        heapq.heapify(heap)
        while heap:
            w, a, b, other = heapq.heappop(heap)
            if other in seen:
                continue
            seen.add(other)
            kept.add((a, b, w))
            for item in adj.get(other, []):
                heapq.heappush(heap, item)
    return kept


def test_msf_kernel_vs_prim():
    import numpy as np

    from cloud_crawler_ray.ops.graph import msf_kernel

    rng = np.random.default_rng(51)
    for trial in range(8):
        n = int(rng.integers(4, 25))
        m = int(rng.integers(3, 60))
        a = rng.integers(0, n, m)
        b = rng.integers(0, n, m)
        keep = a != b
        lo = np.minimum(a[keep], b[keep])
        hi = np.maximum(a[keep], b[keep])
        names_lo = np.array([f"n{v:03d}" for v in lo], dtype=object)
        names_hi = np.array([f"n{v:03d}" for v in hi], dtype=object)
        import pandas as pd

        ed = (
            pd.DataFrame(
                {"a": names_lo, "b": names_hi,
                 "w": rng.integers(1, 6, int(keep.sum())).astype(np.int64)}
            )
            .groupby(["a", "b"], as_index=False)["w"].min()
        )
        if not len(ed):
            continue
        idx = msf_kernel(
            ed["a"].to_numpy(), ed["b"].to_numpy(), ed["w"].to_numpy()
        )
        got = {
            (r.a, r.b, int(r.w)) for r in ed.iloc[idx].itertuples()
        }
        nodes = set(ed["a"]) | set(ed["b"])
        ref = _prim_reference(
            list(zip(ed["a"], ed["b"], ed["w"].astype(int))), nodes
        )
        assert got == ref, (trial, sorted(got), sorted(ref))


def test_msf_distributed_parity(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cloud_crawler_ray.ops.graph import minimum_spanning_forest

    rng = np.random.default_rng(53)
    a = rng.integers(0, 30, 120)
    b = rng.integers(0, 30, 120)
    keep = a != b
    lo = np.minimum(a[keep], b[keep])
    hi = np.maximum(a[keep], b[keep])
    ed = (
        pd.DataFrame(
            {
                "a": [f"u{v:03d}" for v in lo],
                "b": [f"u{v:03d}" for v in hi],
                "w": rng.integers(1, 9, int(keep.sum())).astype(np.int64),
            }
        )
        .groupby(["a", "b"], as_index=False)["w"].min()
    )
    # add a disconnected little component
    extra = pd.DataFrame(
        {"a": ["z001", "z001"], "b": ["z002", "z003"], "w": np.int64([4, 2])}
    )
    ed = pd.concat([ed, extra], ignore_index=True)
    ds = rd.from_pandas(ed).repartition(5)
    fast = (
        minimum_spanning_forest(ds)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    dist = (
        minimum_spanning_forest(ds, driver_cap=0)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        fast, dist[["a", "b", "w"]].astype({"w": np.int64})
    )
    # spanning: kept edges = nodes - components (forest property)
    nodes = set(ed["a"]) | set(ed["b"])
    assert len(fast) < len(nodes)


def test_densest_kernel_planted_and_bound():
    """densest_kernel recovers a planted clique exactly against sparse
    noise, and on tiny random graphs its density meets the 2(1+eps)
    approximation bound vs the exhaustive optimum."""
    import itertools

    import numpy as np

    from cloud_crawler_ray.ops.graph import densest_kernel

    # planted K6 (density 2.5) + a long path of noise (density < 1)
    k6 = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    path = [(10 + i, 11 + i) for i in range(12)] + [(0, 10)]
    ed = k6 + path
    a = np.array([x for x, _ in ed], np.int64)
    b = np.array([y for _, y in ed], np.int64)
    got = densest_kernel(a, b)
    assert got.tolist() == [0, 1, 2, 3, 4, 5]

    rng = np.random.default_rng(61)
    for trial in range(6):
        n = int(rng.integers(5, 11))
        m = int(rng.integers(4, 18))
        aa = rng.integers(0, n, m)
        bb = rng.integers(0, n, m)
        keep = aa != bb
        lo = np.minimum(aa[keep], bb[keep])
        hi = np.maximum(aa[keep], bb[keep])
        pairs = sorted(set(zip(lo.tolist(), hi.tolist())))
        if not pairs:
            continue
        av = np.array([x for x, _ in pairs], np.int64)
        bv = np.array([y for _, y in pairs], np.int64)
        nodes = sorted(set(av) | set(bv))
        # exhaustive optimum density
        best = (0, 1)
        for r in range(2, len(nodes) + 1):
            for sub in itertools.combinations(nodes, r):
                ss = set(sub)
                mm = sum(1 for x, y in pairs if x in ss and y in ss)
                if mm * best[1] > best[0] * r:
                    best = (mm, r)
        got = densest_kernel(av, bv)
        gs = set(got.tolist())
        gm = sum(1 for x, y in pairs if x in gs and y in gs)
        # 2(1+eps) bound with eps=0.1: got_density * 2.2 >= opt_density
        assert gm * best[1] * 22 >= best[0] * len(gs) * 10, (
            trial, gm, len(gs), best,
        )


def test_densest_subgraph_distributed_parity(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cloud_crawler_ray.ops.graph import densest_kernel, densest_subgraph

    rng = np.random.default_rng(63)
    a = rng.integers(0, 50, 260)
    b = rng.integers(0, 50, 260)
    keep = a != b
    lo = np.minimum(a[keep], b[keep])
    hi = np.maximum(a[keep], b[keep])
    ed = (
        pd.DataFrame({"a": lo, "b": hi}).drop_duplicates().reset_index(drop=True)
    )
    # star: center 100 with leaves — exercises the isolated-center case
    star = pd.DataFrame({"a": [100] * 5, "b": [101, 102, 103, 104, 105]})
    ed = pd.concat([star, ed], ignore_index=True)
    ds = rd.from_pandas(ed).repartition(5)
    fast = np.sort(
        densest_subgraph(ds).to_pandas()["part"].to_numpy().astype(np.int64)
    )
    dist = np.sort(
        densest_subgraph(ds, driver_cap=0).to_pandas()["part"].to_numpy().astype(np.int64)
    )
    ref = densest_kernel(
        ed["a"].to_numpy().astype(np.int64), ed["b"].to_numpy().astype(np.int64)
    )
    assert fast.tolist() == ref.tolist()
    assert dist.tolist() == ref.tolist()
    # sharded anti-join path too
    dist2 = np.sort(
        densest_subgraph(ds, driver_cap=0, broadcast_cap=0)
        .to_pandas()["part"].to_numpy().astype(np.int64)
    )
    assert dist2.tolist() == ref.tolist()


def test_betweenness_kernel_brute_force():
    """betweenness_kernel with ALL nodes as sources equals exact Brandes
    betweenness, checked against an itertools all-shortest-paths brute
    force (ordered-pair convention) on random graphs."""
    import itertools

    import numpy as np

    from cloud_crawler_ray.ops.graph import _BC_FP, betweenness_kernel

    rng = np.random.default_rng(71)
    for trial in range(5):
        n = int(rng.integers(5, 10))
        m = int(rng.integers(4, 16))
        aa = rng.integers(0, n, m)
        bb = rng.integers(0, n, m)
        keep = aa != bb
        pairs = sorted(
            set(zip(np.minimum(aa[keep], bb[keep]).tolist(),
                    np.maximum(aa[keep], bb[keep]).tolist()))
        )
        if not pairs:
            continue
        adj: dict[int, set[int]] = {}
        for x, y in pairs:
            adj.setdefault(x, set()).add(y)
            adj.setdefault(y, set()).add(x)
        nodes = sorted(adj)
        # brute force: enumerate all shortest paths per ordered pair
        def all_shortest(s, t):
            best, out = None, []
            stack = [(s, [s])]
            while stack:
                cur, path = stack.pop()
                if best is not None and len(path) > best:
                    continue
                if cur == t:
                    if best is None or len(path) < best:
                        best, out = len(path), [path]
                    elif len(path) == best:
                        out.append(path)
                    continue
                for nb in adj[cur]:
                    if nb not in path:
                        stack.append((nb, path + [nb]))
            return out

        bc = {v: 0.0 for v in nodes}
        for s, t in itertools.permutations(nodes, 2):
            sp = all_shortest(s, t)
            if not sp:
                continue
            sigma = len(sp)
            for v in nodes:
                if v in (s, t):
                    continue
                thru = sum(1 for p in sp if v in p)
                bc[v] += thru / sigma
        av = np.array([x for x, _ in pairs], np.int64)
        bv = np.array([y for _, y in pairs], np.int64)
        got_nodes, got_fp = betweenness_kernel(
            av, bv, np.array(nodes, np.int64)
        )
        for nd, fp in zip(got_nodes, got_fp):
            assert abs(fp / _BC_FP - bc[int(nd)]) < 1e-4, (
                trial, nd, fp / _BC_FP, bc[int(nd)],
            )


def test_betweenness_distributed_bit_exact(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cloud_crawler_ray.ops.graph import betweenness

    rng = np.random.default_rng(73)
    a = rng.integers(0, 60, 300)
    b = rng.integers(0, 60, 300)
    keep = a != b
    ed = (
        pd.DataFrame(
            {"a": np.minimum(a[keep], b[keep]), "b": np.maximum(a[keep], b[keep])}
        )
        .drop_duplicates()
        .reset_index(drop=True)
    )
    ds = rd.from_pandas(ed).repartition(6)
    fast = (
        betweenness(ds)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    dist = (
        betweenness(ds, driver_cap=0)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    # bit-exact: identical fixed-point integers on every node
    pd.testing.assert_frame_equal(
        fast.astype(np.int64), dist.astype(np.int64)
    )
    assert (fast["bc_fp"] > 0).any()


def test_robustness_kernel_star_chain():
    """Planted star+chain: removing the hub at 20% fragments the star to
    singletons while the chain survives as the largest component."""
    import numpy as np

    from cloud_crawler_ray.ops.graph import robustness_kernel

    # hub h0 with 6 leaves + disjoint 4-chain (c0-c1-c2-c3): 11 nodes
    ed = [("h0", f"l{i}") for i in range(6)] + [
        ("c0", "c1"), ("c1", "c2"), ("c2", "c3")
    ]
    src = np.array([a for a, _ in ed], object)
    dst = np.array([b for _, b in ed], object)
    out = robustness_kernel(src, dst)
    r0 = out[out["pct_removed"] == 0].iloc[0]
    assert r0["largest_cc"] == 7 and r0["n_edges_left"] == 9
    # 20% of 11 nodes = 2 removed: hub first (deg 6), then c1 (deg 2, the
    # lexicographically-smallest of the deg-2 ties)
    r20 = out[out["pct_removed"] == 20].iloc[0]
    assert r20["n_removed"] == 2
    assert r20["largest_cc"] == 2  # c2-c3 survives as the biggest piece
    assert r20["n_edges_left"] == 1


def test_robustness_distributed_parity(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cloud_crawler_ray.ops.graph import robustness_curve, robustness_kernel

    rng = np.random.default_rng(77)
    a = rng.integers(0, 30, 90)
    b = rng.integers(0, 30, 90)
    keep = a != b
    ed = (
        pd.DataFrame(
            {
                "src": [f"u{v:03d}" for v in a[keep]],
                "dst": [f"u{v:03d}" for v in b[keep]],
            }
        )
        .drop_duplicates()
        .reset_index(drop=True)
    )
    ds = rd.from_pandas(ed).repartition(4)
    fast = robustness_curve(ds).reset_index(drop=True)
    dist = robustness_curve(ds, driver_cap=0).reset_index(drop=True)
    ref = robustness_kernel(
        ed["src"].to_numpy(dtype=object), ed["dst"].to_numpy(dtype=object)
    )
    pd.testing.assert_frame_equal(fast.astype(np.int64), ref.astype(np.int64))
    pd.testing.assert_frame_equal(dist.astype(np.int64), ref.astype(np.int64))
