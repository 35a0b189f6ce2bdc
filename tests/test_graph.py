"""Unit tests for the bucket-sharded graph state (stages/graph.py):
shard invariants, integer PageRank hand-checked on a tiny graph, and
the bit-exactness contract — identical results at any bucket count.
"""

import numpy as np
import pyarrow as pa
import pytest

from don_crawler_ray.stages.graph import (
    init_labels,
    label_count_dataset,
    min_label_sweeps,
    pagerank,
    self_labeled_ids,
    shard_graph,
    state_dataset,
)


def _edges_ds(pairs):
    import ray

    src = [a for a, _ in pairs]
    dst = [b for _, b in pairs]
    return ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    ).repartition(3)


def _collect(node_refs, value_refs, vname):
    df = state_dataset(node_refs, value_refs, "node", vname).to_pandas()
    return dict(zip(df.node.tolist(), df[vname].tolist()))


class TestShardGraph:
    def test_shard_invariants(self, ray_session):
        import ray

        pairs = [(1, 2), (2, 1), (2, 3), (3, 2), (7, 1), (1, 7), (7, 3), (3, 7)]
        edge_refs, node_refs, n_nodes = shard_graph(_edges_ds(pairs), n_buckets=4)
        assert n_nodes == 4
        seen_nodes = []
        for b, (eref, nref) in enumerate(zip(edge_refs, node_refs)):
            src, dst = ray.get(eref)
            node_ids, outdeg = ray.get(nref)
            # edges live in bucket src % B, sorted by src
            assert all(s % 4 == b for s in src)
            assert list(src) == sorted(src)
            # node shard holds exactly its residue class, sorted
            assert all(n % 4 == b for n in node_ids)
            assert list(node_ids) == sorted(node_ids)
            # out-degree = outgoing edge count of that node
            for nid, od in zip(node_ids, outdeg):
                assert od == sum(1 for s, _ in pairs if s == nid)
            seen_nodes.extend(node_ids.tolist())
        assert sorted(seen_nodes) == [1, 2, 3, 7]

    def test_rejects_single_bucket(self, ray_session):
        with pytest.raises(ValueError, match="n_buckets"):
            shard_graph(_edges_ds([(1, 2), (2, 1)]), n_buckets=1)

    def test_dst_outside_node_universe_is_loud(self, ray_session):
        """A non-symmetrized edge list whose dst never appears as a
        source (and no nodes_ds) violates the node-universe
        precondition; the sweep must raise, not silently credit the
        rank to a neighboring node."""
        import ray

        # node 9 is dst-only: in no node shard
        edge_refs, node_refs, _ = shard_graph(
            _edges_ds([(1, 9), (2, 1), (1, 2)]), n_buckets=2
        )
        with pytest.raises(
            (ValueError, ray.exceptions.RayTaskError), match="node"
        ):
            labels = min_label_sweeps(
                edge_refs, node_refs, init_labels(node_refs), iters=1
            )
            ray.get(labels)


class TestPagerank:
    def test_hand_computed_two_node_cycle(self, ray_session):
        """1 <-> 2, one iteration, S=1000: each node starts at 500,
        contributes (85*500)//(100*1) = 425, base = (15*1000)//200 = 75
        -> both end at exactly 500."""
        edge_refs, node_refs, n = shard_graph(_edges_ds([(1, 2), (2, 1)]), n_buckets=2)
        ranks = pagerank(edge_refs, node_refs, n, iters=1, scale=1000)
        assert _collect(node_refs, ranks, "pr") == {1: 500, 2: 500}

    def test_hub_outranks_leaves(self, ray_session):
        # star: leaves 1,2,3 -> hub 10; hub -> 1 (so every node has outdeg)
        pairs = [(1, 10), (2, 10), (3, 10), (10, 1)]
        edge_refs, node_refs, n = shard_graph(_edges_ds(pairs), n_buckets=2)
        got = _collect(node_refs, pagerank(edge_refs, node_refs, n, iters=3), "pr")
        assert got[10] > got[1] > got[2] == got[3]

    def test_bit_identical_across_bucket_counts(self, ray_session):
        """The determinism contract: integer arithmetic with commutative
        merges means the bucket count (the parallelism knob) cannot
        change a single rank."""
        rng = np.random.default_rng(3)
        pairs = [
            (int(a), int(b))
            for a, b in rng.integers(0, 50, size=(300, 2))
            if a != b
        ]
        results = {}
        for nb in (2, 5, 16):
            edge_refs, node_refs, n = shard_graph(_edges_ds(pairs), n_buckets=nb)
            results[nb] = _collect(
                node_refs, pagerank(edge_refs, node_refs, n, iters=4), "pr"
            )
        assert results[2] == results[5] == results[16]


class TestMinLabel:
    def test_bit_identical_across_bucket_counts(self, ray_session):
        rng = np.random.default_rng(4)
        half = [
            (int(a), int(b))
            for a, b in rng.integers(0, 60, size=(80, 2))
            if a != b
        ]
        pairs = half + [(b, a) for a, b in half]  # symmetrize
        results = {}
        for nb in (2, 7):
            edge_refs, node_refs, _ = shard_graph(_edges_ds(pairs), n_buckets=nb)
            labels = min_label_sweeps(
                edge_refs, node_refs, init_labels(node_refs), iters=64, until_fixed=True
            )
            results[nb] = _collect(node_refs, labels, "label")
        assert results[2] == results[7]
        # converged: every component labeled by its minimum member
        comp: dict = {}
        for node, lab in results[2].items():
            comp.setdefault(lab, []).append(node)
        for lab, members in comp.items():
            assert lab == min(members)

    def test_label_count_dataset_sums_to_nodes(self, ray_session):
        pairs = [(1, 2), (2, 1), (5, 6), (6, 5)]
        edge_refs, node_refs, n = shard_graph(_edges_ds(pairs), n_buckets=3)
        labels = min_label_sweeps(
            edge_refs, node_refs, init_labels(node_refs), iters=4
        )
        df = label_count_dataset(labels, "component", "n").to_pandas()
        assert int(df.n.sum()) == n
        assert self_labeled_ids(node_refs, labels).tolist() == [1, 5]


class TestPropertyVsUnionFind:
    def test_components_match_union_find(self, ray_session):
        """Property check: sharded min-label propagation converges to
        exactly the union-find components (label = min member) on
        random graphs."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=12, deadline=None)
        @given(
            st.lists(
                st.tuples(st.integers(0, 30), st.integers(0, 30)),
                min_size=0,
                max_size=40,
            ),
            st.integers(2, 6),
        )
        def check(raw_edges, nb):
            pairs = [(a, b) for a, b in raw_edges if a != b]
            nodes = sorted({n for e in pairs for n in e} | {0, 30})
            # union-find reference
            parent = {n: n for n in nodes}

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for a, b in pairs:
                parent[find(a)] = find(b)
            comp_min: dict = {}
            for n in nodes:
                r = find(n)
                comp_min[r] = min(comp_min.get(r, n), n)
            expect = {n: comp_min[find(n)] for n in nodes}

            import ray

            sym = pairs + [(b, a) for a, b in pairs]
            nodes_ds = ray.data.from_arrow(
                pa.table({"node": pa.array(nodes, pa.int64())})
            )
            if sym:
                edges = _edges_ds(sym)
            else:
                edges = ray.data.from_arrow(
                    pa.table(
                        {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
                    )
                )
            edge_refs, node_refs, _ = shard_graph(
                edges, n_buckets=nb, nodes_ds=nodes_ds, node_col="node"
            )
            labels = min_label_sweeps(
                edge_refs, node_refs, init_labels(node_refs), iters=64, until_fixed=True
            )
            df = state_dataset(node_refs, labels, "node", "label").to_pandas()
            got = dict(zip(df.node.tolist(), df.label.tolist()))
            assert got == expect

        check()
