"""Exact min-cut edit metrics: hand-checkable fixtures.

Reference semantics: ``bootstrapper/eval/evaluate_thresholds.py:285-470``
(funlib split_graph min-cuts per merging segment)."""

import networkx as nx
import numpy as np

from bootstrapper_tpu.eval.mincut import compute_edits, split_graph


def line_graph(edges):
    g = nx.Graph()
    for u, v, w in edges:
        g.add_edge(u, v, weight=w)
    return g


class TestSplitGraph:
    def test_single_cut_separates_two_seeds(self):
        # f1 -0.9- f2 -0.8- f3 -0.9- f4 ; cheapest cut is the middle edge
        g = line_graph([(1, 2, 0.9), (2, 3, 0.8), (3, 4, 0.9)])
        n = split_graph(g, [[1, 2], [3, 4]])
        assert n == 1
        assert g.nodes[1]["split"] == g.nodes[2]["split"]
        assert g.nodes[3]["split"] == g.nodes[4]["split"]
        assert g.nodes[1]["split"] != g.nodes[3]["split"]

    def test_three_seeds_need_two_cuts(self):
        g = line_graph([(1, 2, 0.5), (2, 3, 0.5)])
        n = split_graph(g, [[1], [2], [3]])
        assert n == 2
        labels = {g.nodes[i]["split"] for i in (1, 2, 3)}
        assert len(labels) == 3

    def test_already_separate(self):
        g = line_graph([(1, 2, 0.5)])
        g.add_node(3)
        assert split_graph(g, [[1, 2], [3]]) == 0

    def test_cut_prefers_cheap_edges(self):
        # ring: cutting the two cheap edges (0.1 each) beats one expensive
        g = line_graph([(1, 2, 1.0), (2, 3, 0.1), (3, 4, 1.0), (4, 1, 0.1)])
        n = split_graph(g, [[1, 2], [3, 4]])
        assert n == 1  # one min-cut operation removes both cheap edges
        assert g.nodes[1]["split"] != g.nodes[3]["split"]


def edits(node_frag, node_seg, comps, frag_ids, frag_seg, edges, t):
    eu = np.array([e[0] for e in edges], np.uint64)
    ev = np.array([e[1] for e in edges], np.uint64)
    es = np.array([e[2] for e in edges], np.float64)
    return compute_edits(
        comps, node_frag, node_seg,
        np.asarray(frag_ids, np.uint64), np.asarray(frag_seg, np.uint64),
        eu, ev, es, t,
    )


class TestComputeEdits:
    def test_clean_segmentation_no_edits(self):
        comps = [{"a1", "a2"}, {"b1", "b2"}]
        node_frag = {"a1": 1, "a2": 2, "b1": 3, "b2": 4}
        node_seg = {"a1": 10, "a2": 10, "b1": 20, "b2": 20}
        res = edits(node_frag, node_seg, comps, [1, 2, 3, 4],
                    [10, 10, 20, 20], [(1, 2, 0.1), (3, 4, 0.1)], 0.5)
        assert res == {
            "splits_needed": 0, "merges_needed": 0,
            "unsplittable_fragments": 0, "merging_segments": 0,
        }

    def test_false_merge_needs_one_split(self):
        # two skeletons glued through edge (2,3): min cut = 1 edge
        comps = [{"a1", "a2"}, {"b1", "b2"}]
        node_frag = {"a1": 1, "a2": 2, "b1": 3, "b2": 4}
        node_seg = {n: 10 for n in node_frag}  # all one segment
        res = edits(
            node_frag, node_seg, comps, [1, 2, 3, 4], [10, 10, 10, 10],
            [(1, 2, 0.1), (2, 3, 0.2), (3, 4, 0.1)], 0.5,
        )
        assert res["splits_needed"] == 1
        assert res["merges_needed"] == 0
        assert res["merging_segments"] == 1

    def test_false_split_needs_one_merge(self):
        comps = [{"a1", "a2"}]
        node_frag = {"a1": 1, "a2": 2}
        node_seg = {"a1": 10, "a2": 20}
        res = edits(node_frag, node_seg, comps, [1, 2], [10, 20], [], 0.5)
        assert res["splits_needed"] == 0
        assert res["merges_needed"] == 1

    def test_unsplittable_fragment(self):
        # fragment 1 contains sites of both skeletons: nothing to cut
        comps = [{"a1", "a2"}, {"b1"}]
        node_frag = {"a1": 1, "a2": 2, "b1": 1}
        node_seg = {n: 10 for n in node_frag}
        res = edits(node_frag, node_seg, comps, [1, 2], [10, 10],
                    [(1, 2, 0.1)], 0.5)
        assert res["splits_needed"] == 0
        assert res["unsplittable_fragments"] == 1
        assert res["merging_segments"] == 1

    def test_three_way_merge_two_splits(self):
        comps = [{"a"}, {"b"}, {"c"}]
        node_frag = {"a": 1, "b": 2, "c": 3}
        node_seg = {n: 10 for n in node_frag}
        res = edits(node_frag, node_seg, comps, [1, 2, 3], [10, 10, 10],
                    [(1, 2, 0.2), (2, 3, 0.2)], 0.5)
        assert res["splits_needed"] == 2
        assert res["merges_needed"] == 0

    def test_cut_fragmenting_seed_set_counts_merge(self):
        # skeleton A sits in fragments 1 and 3, which flank B's fragment 2
        # on a path 1-2-3: separating A from B cuts twice and leaves A in
        # two pieces -> 1 additional merge needed
        comps = [{"a1", "a2"}, {"b"}]
        node_frag = {"a1": 1, "a2": 3, "b": 2}
        node_seg = {n: 10 for n in node_frag}
        res = edits(node_frag, node_seg, comps, [1, 2, 3], [10, 10, 10],
                    [(1, 2, 0.2), (2, 3, 0.2)], 0.5)
        assert res["splits_needed"] >= 1
        # A's two fragments end in different parts
        assert res["merges_needed"] == 1

    def test_threshold_excludes_edges(self):
        # the glue edge is above threshold -> not part of the RAG; but the
        # LUT said one segment, so it's still a merging segment with no
        # connecting path: cut count is 0 (already separate)
        comps = [{"a"}, {"b"}]
        node_frag = {"a": 1, "b": 2}
        node_seg = {n: 10 for n in node_frag}
        res = edits(node_frag, node_seg, comps, [1, 2], [10, 10],
                    [(1, 2, 0.9)], 0.5)
        assert res["splits_needed"] == 0


def test_native_matches_nx_on_random_graphs():
    """Dual pin: the C++ Dinic splitter and the networkx preflow-push
    implementation agree on split counts and full seed separation
    across random instances (distinct float capacities: no ties)."""
    import networkx as nx
    import numpy as np

    from bootstrapper_tpu.eval.mincut import split_graph

    rng = np.random.default_rng(42)
    for trial in range(12):
        n = int(rng.integers(6, 40))
        g = nx.Graph()
        g.add_nodes_from(range(n))
        # random connected-ish graph with distinct capacities
        for _ in range(int(n * 2.2)):
            u, v = rng.integers(0, n, 2)
            if u != v:
                g.add_edge(int(u), int(v),
                           weight=float(rng.uniform(0.01, 1.0)))
        for i in range(n - 1):  # spanning chain keeps it connected
            if not g.has_edge(i, i + 1):
                g.add_edge(i, i + 1, weight=float(rng.uniform(0.01, 1.0)))
        k = int(rng.integers(2, 4))
        seeds = rng.choice(n, size=k, replace=False)
        comps = [[int(s)] for s in seeds]

        g_nx = g.copy()
        n_nx = split_graph(g_nx, comps, impl="nx")
        g_nat = g.copy()
        n_nat = split_graph(g_nat, comps, impl="native")

        assert n_nx == n_nat, (trial, n_nx, n_nat)
        # the real invariant: every seed pair separated, both impls
        for impl_g in (g_nx, g_nat):
            labs = [impl_g.nodes[int(s)]["split"] for s in seeds]
            assert len(set(labs)) == k, (trial, labs)
