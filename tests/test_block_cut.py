"""0030's block-cut-tree reachability vs a brute-force BFS replica of
the original per-subject algorithm (0030:366-415) on random bipartite
junction graphs — pure Python, no Spark session."""

from __future__ import annotations

import random
import time

from keepright_spark.checks.check_0030 import _open_ways


def _bfs_open(pairs, subjects):
    """The reference algorithm: per-subject BFS excluding the way."""
    node_ways: dict = {}
    way_nodes: dict = {}
    for w, nd in pairs:
        node_ways.setdefault(nd, set()).add(w)
        way_nodes.setdefault(w, set()).add(nd)
    bad = []
    for w, fn, ln in subjects:
        seen_nodes = {fn}
        seen_ways = set()
        frontier = [fn]
        found = False
        while frontier and not found:
            nxt = []
            for nd in frontier:
                for ow in node_ways.get(nd, ()):
                    if ow == w or ow in seen_ways:
                        continue
                    seen_ways.add(ow)
                    for nd2 in way_nodes[ow]:
                        if nd2 not in seen_nodes:
                            seen_nodes.add(nd2)
                            nxt.append(nd2)
                            if nd2 == ln:
                                found = True
            frontier = nxt
        if not found:
            bad.append(w)
    return bad


def test_random_graph_equivalence():
    rng = random.Random(7)
    for trial in range(200):
        n_ways = rng.randint(1, 25)
        n_nodes = rng.randint(2, 30)
        pairs = set()
        for w in range(n_ways):
            for _ in range(rng.randint(1, 4)):
                pairs.add((w, rng.randrange(n_nodes)))
        pairs = sorted(pairs)
        subjects = []
        for w in range(n_ways):
            if rng.random() < 0.6:
                subjects.append(
                    (w, rng.randrange(n_nodes), rng.randrange(n_nodes))
                )
        got = sorted(_open_ways(pairs, subjects))
        exp = sorted(_bfs_open(pairs, subjects))
        assert got == exp, (trial, pairs, subjects, got, exp)


def test_dense_class_bounded():
    """Stress: a dense grid class (the '*'-rule worst case).  The
    block-cut approach must stay near-linear — the old BFS was
    O(subjects × edges) here."""
    K = 60  # K×K grid of ways chained through shared junction nodes
    pairs = []
    for r in range(K):
        for c in range(K):
            w = r * K + c
            pairs.append((w, r * (K + 1) + c))
            pairs.append((w, r * (K + 1) + c + 1))
            pairs.append((w, (r + 1) * (K + 1) + c))
    subjects = [(w, 0, (K * (K + 1)) + K - 1) for w in range(K * K)]
    t0 = time.time()
    bad = _open_ways(pairs, subjects)
    dt = time.time() - t0
    assert dt < 5.0, f"dense class took {dt:.1f}s"
    assert bad == sorted(_bfs_open(pairs, subjects))
