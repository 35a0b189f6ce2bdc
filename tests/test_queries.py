"""Driver-mirror correctness harness: every SQL-checked query is run
through Ray AND DuckDB at sf0.001 and compared (row count, column
names, order-insensitive values) — the same gate the driver applies at
sf0.01. Non-SQL queries get dedicated oracles below.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def _to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas(limit=None)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(ray_df: pd.DataFrame, sql_df: pd.DataFrame, name: str):
    assert sorted(ray_df.columns) == sorted(sql_df.columns), f"{name}: columns differ"
    assert len(ray_df) == len(sql_df), f"{name}: row counts {len(ray_df)} vs {len(sql_df)}"
    # The driver's gate hashes raw column bytes, so representation must
    # match, not just value (DuckDB HUGEINT vs engine int64 broke 6
    # queries in round 1 — ADVICE.md item 1).
    for col in ray_df.columns:
        assert ray_df[col].dtype == sql_df[col].dtype, (
            f"{name}.{col}: dtype {ray_df[col].dtype} vs oracle {sql_df[col].dtype}"
        )
    a, b = _normalize(ray_df), _normalize(sql_df)
    for col in a.columns:
        av, bv = a[col].to_numpy(), b[col].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            assert np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=1e-9), f"{name}.{col}"
        else:
            assert (av == bv).all(), f"{name}.{col}"


SQL_CHECKED = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_sql_checked_query(ray_session, name):
    queries = entrymod.queries()
    sql = entrymod.oracle_sql()[name]
    ray_df = _to_pandas(queries[name](SF_DIR))
    sql_df = _duck(sql)
    compare(ray_df, sql_df, name)


class TestNonSqlOracles:
    def test_vitality_events(self, ray_session):
        from don_crawler_ray.functions.vitality import vitality_for_repo
        from don_crawler_ray.pipelines.queries import VITALITY_NOW

        out = _to_pandas(entrymod.queries()["vitality_events"](SF_DIR))
        # independent recomputation straight from parquet
        ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
        ev["repo"] = "r" + (ev.user_id % 20).astype(str)
        assert len(out) == ev.repo.nunique()
        for repo, grp in ev.groupby("repo"):
            vit, _, _ = vitality_for_repo(
                grp.ts.to_numpy(),
                np.array([f"u{u}@x" for u in grp.user_id], dtype=object),
                np.where(grp.event_type == "purchase", 2, 1),
                (grp.event_type == "signup").to_numpy(),
                now=VITALITY_NOW,
                days=60,
            )
            got = out.loc[out.repo == repo, "vitality_index"].iloc[0]
            assert got == vit, repo

    def test_ann_topk_matches_numpy(self, ray_session):
        out = _to_pandas(entrymod.queries()["ann_topk"](SF_DIR))
        emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
        mat = np.stack(emb.embedding.to_numpy()).astype(np.float64)
        ids = emb.vec_id.to_numpy()
        mn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        for qid in range(5):
            q = mn[qid]
            scores = mn @ q
            order = np.lexsort((ids, -scores))[:10]
            want = ids[order].tolist()
            got = out[out.query_id == qid].sort_values("rank").vec_id.tolist()
            assert got == want, f"query {qid}"

    def test_minhash_pairs_verified(self, ray_session):
        from don_crawler_ray.functions.dedup import jaccard_exact

        out = _to_pandas(entrymod.queries()["minhash_pairs"](SF_DIR))
        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet").set_index("doc_id").text
        # every reported pair really has jaccard >= 0.5
        for _, row in out.iterrows():
            assert jaccard_exact(docs[row.a], docs[row.b]) >= 0.5
        # recall vs brute force on a slice of 80 docs
        sub = docs.iloc[:80]
        truth = set()
        items = list(sub.items())
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                if jaccard_exact(items[i][1], items[j][1]) >= 0.6:
                    a, b = sorted((items[i][0], items[j][0]))
                    truth.add((a, b))
        found = {tuple(sorted((r.a, r.b))) for _, r in out.iterrows()}
        if truth:
            recall = len(truth & found) / len(truth)
            assert recall >= 0.8, (recall, len(truth))

    def test_minhash_pairs_high_duplication(self, ray_session, tmp_path, monkeypatch):
        """A 50%-duplicate corpus (the dedup worst case) must still
        verify without driver blowup: above the broadcast bound the
        verify stage joins candidate texts through the shuffle instead
        of building a driver-side dict (VERDICT r02 item 6). Forces the
        join path by zeroing the bound."""
        import pyarrow.parquet as pq

        from don_crawler_ray.functions.dedup import jaccard_exact
        from don_crawler_ray.pipelines import queries as qmod

        monkeypatch.setattr(qmod, "MINHASH_BROADCAST_MAX_PAIRS", 0)

        rng = np.random.default_rng(7)
        words = [f"w{i:03d}" for i in range(400)]
        ids, texts = [], []
        expected = set()
        for base in range(100):
            toks = rng.choice(words, size=40, replace=True).tolist()
            a, b = 2 * base, 2 * base + 1
            ids.append(a)
            texts.append(" ".join(toks))
            # near-duplicate: mutate one token
            mut = list(toks)
            mut[int(rng.integers(0, 40))] = str(rng.choice(words))
            ids.append(b)
            texts.append(" ".join(mut))
            if jaccard_exact(texts[-2], texts[-1]) >= 0.6:
                expected.add((a, b))
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts}),
            str(tmp_path / "documents.parquet"),
        )
        out = _to_pandas(entrymod.queries()["minhash_pairs"](str(tmp_path)))
        found = {tuple(sorted((int(r.a), int(r.b)))) for _, r in out.iterrows()}
        # heavy-dup corpus: every reported pair truly >= 0.5 jaccard
        lookup = dict(zip(ids, texts))
        for a, b in found:
            assert jaccard_exact(lookup[a], lookup[b]) >= 0.5
        # and recall of the planted near-identical pairs is high
        recall = len(expected & found) / len(expected)
        assert recall >= 0.9, (recall, len(expected), len(found))

    def test_simhash_sql_empty_doc_parity(self):
        """ADVICE r02: empty / whitespace-only docs must hash to the
        all-zero signature in BOTH the engine and the SQL oracle (the
        naive regexp_split yields one '' token whose FNV offset basis
        votes nonzero)."""
        import duckdb

        from don_crawler_ray.functions.dedup import simhash64
        from don_crawler_ray.pipelines.queries import SQL_SIMHASH

        con = duckdb.connect()
        tbl = pa.table(
            {"doc_id": pa.array([0, 1, 2], pa.int64()), "text": ["", "   ", "hello world"]}
        )
        con.register("documents", tbl)
        rows = dict(con.execute(SQL_SIMHASH).fetchall())
        for d, t in [(0, ""), (1, "   "), (2, "hello world")]:
            assert rows[d] == f"{simhash64(t):016x}"

    def test_simhash_deterministic(self, ray_session):
        a = _to_pandas(entrymod.queries()["simhash_docs"](SF_DIR))
        b = _to_pandas(entrymod.queries()["simhash_docs"](SF_DIR))
        assert a.sort_values("doc_id").simhash.tolist() == b.sort_values("doc_id").simhash.tolist()

    def test_crawl_queries_run(self, ray_session):
        q = entrymod.queries()
        ext = _to_pandas(q["crawl_extract"](SF_DIR))
        assert len(ext) > 0 and "canonical_url" in ext.columns
        sched = _to_pandas(q["crawl_schedule"](SF_DIR))
        assert set(sched.status.unique()) <= {"scheduled", "robots_denied", "dedup_hit"}
        canon = _to_pandas(q["url_canonicalize"](SF_DIR))
        assert len(canon) == 1000


class TestAdditionalOps:
    def test_ivf_assign_matches_numpy(self, ray_session):
        out = _to_pandas(entrymod.queries()["ivf_assign"](SF_DIR))
        emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
        mat = np.stack(emb.embedding.to_numpy()).astype(np.float64)
        labels = emb.label.to_numpy()
        cents = np.stack([mat[labels == l].mean(axis=0) for l in sorted(set(labels.tolist()))])
        cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
        mn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        best = np.argmax(mn @ cn.T, axis=1)
        want = pd.Series(best).value_counts().sort_index()
        got = out.set_index("centroid").n.sort_index()
        assert got.to_dict() == want.to_dict()

    def test_text_stats_kernels(self, ray_session):
        from don_crawler_ray.functions.textstats import (
            bpe_token_count,
            detect_language,
            doc_fingerprint_md5,
            quality_score,
            whitespace_token_count,
        )

        out = _to_pandas(entrymod.queries()["text_stats"](SF_DIR)).set_index("doc_id")
        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet").set_index("doc_id")
        for doc_id in list(docs.index[:50]):
            t = docs.loc[doc_id].text
            row = out.loc[doc_id]
            assert row.ws_tokens == whitespace_token_count(t)
            assert row.bpe_tokens == bpe_token_count(t)
            assert abs(row.quality - quality_score(t)) < 1e-12
            assert row.lang_detected == detect_language(t)
            assert row.fingerprint == doc_fingerprint_md5(t)

    def test_embedding_neardup_matches_numpy(self, ray_session):
        out = _to_pandas(entrymod.queries()["embedding_neardup"](SF_DIR))
        emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
        mat = np.stack(emb.embedding.to_numpy()).astype(np.float64)
        ids = emb.vec_id.to_numpy()
        labels = emb.label.to_numpy()
        cents = np.stack([mat[labels == l].mean(axis=0) for l in sorted(set(labels.tolist()))])
        cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
        mn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        buckets = np.argmax(mn @ cn.T, axis=1)
        want = set()
        for b in np.unique(buckets):
            sel = buckets == b
            sub_ids = ids[sel]
            sub = mn[sel]
            sims = sub @ sub.T
            iu, ju = np.triu_indices(len(sub_ids), k=1)
            for i, j in zip(iu[sims[iu, ju] >= 0.40], ju[sims[iu, ju] >= 0.40]):
                want.add(tuple(sorted((int(sub_ids[i]), int(sub_ids[j])))))
        got = {tuple(sorted((int(r.a), int(r.b)))) for _, r in out.iterrows()}
        assert got == want

    def test_fetch_simulation_deterministic_and_scripted(self, ray_session):
        a = _to_pandas(entrymod.queries()["fetch_simulation"](SF_DIR))
        b = _to_pandas(entrymod.queries()["fetch_simulation"](SF_DIR))
        key = ["host", "rank"]
        a = a.sort_values(key, ignore_index=True)
        b = b.sort_values(key, ignore_index=True)
        assert a.equals(b)
        # scripted host0 episode at request 3 -> some row has 2 attempts + 30s wait
        h0 = a[a.host.str.startswith("host0.")]
        assert (h0.attempts >= 2).any()
        assert (h0.virtual_wait_ms == 30_000).any()
        # unscripted hosts: single attempts, zero waits
        h9 = a[a.host.str.startswith("host9.")]
        if len(h9):
            assert (h9.attempts == 1).all()

    def test_crawl_counters_table(self, ray_session):
        out = _to_pandas(entrymod.queries()["crawl_counters"](SF_DIR)).set_index("metric")
        assert out.loc["fetched"].value == out.loc["scheduled"].value
        assert out.loc["dedup_hit"].value > 0
        assert out.loc["robots_denied"].value > 0
        assert out.loc["seen_set_size"].value == out.loc["fetched"].value
        assert out.loc["revisit_skipped"].value == 0
        # determinism digests surface as driver-visible columns
        assert len(out.loc["seen_digest"].detail) == 32
        assert len(out.loc["text_digest"].detail) == 32
        assert out.loc["text_digest"].value == out.loc["fetched"].value

    def test_seed_expand(self, ray_session):
        out = _to_pandas(entrymod.queries()["seed_expand"](SF_DIR))
        # 20 publishers cover all 20 tiny-frontier hosts; 1000 urls total
        assert out[out.error.isna()].n_urls.sum() == 1000
        # the bad-scheme seed surfaces as an error row, not a crash
        bad = out[out.publisher_id == "org-bad"]
        assert len(bad) == 1 and "unsupported scheme" in bad.error.iloc[0]
        # mega-host publisher holds ~50%
        assert out.n_urls.max() > 400


class TestAsofJoin:
    def test_edge_cases(self, ray_session, tmp_path):
        """Purchase before any login -> -1; a login at the same ts with
        a smaller event_id counts as at-or-before; users never bleed
        across segments."""
        import pyarrow.parquet as pq

        ts0 = np.datetime64("2024-01-01T10:00:00", "us")
        rows = [
            # user 1: purchase before its login
            (0, ts0, 1, "purchase"),
            (1, ts0 + np.timedelta64(60, "s"), 1, "login"),
            (2, ts0 + np.timedelta64(120, "s"), 1, "purchase"),
            # user 2: login at the SAME ts as the purchase, smaller id
            (3, ts0, 2, "login"),
            (4, ts0, 2, "purchase"),
            # user 3: only purchases (must not inherit user 2's login)
            (5, ts0 + np.timedelta64(5, "s"), 3, "purchase"),
            # noise event types are ignored
            (6, ts0, 1, "click"),
        ]
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([0.0] * len(rows), pa.float64()),
                "props": pa.array([""] * len(rows), pa.string()),
            }
        )
        pq.write_table(tbl, str(tmp_path / "events.parquet"))
        out = (
            _to_pandas(entrymod.queries()["asof_join_events"](str(tmp_path)))
            .set_index("purchase_id")
            .sort_index()
        )
        assert out.loc[0].login_id == -1
        assert out.loc[2].login_id == 1
        assert out.loc[4].login_id == 3
        assert out.loc[5].login_id == -1


class TestGraphQueries:
    def test_min_label_propagation_disconnected(self, ray_session):
        """The sharded propagation kernel finds true components on a
        graph with several disconnected pieces (the sf fixture happens
        to be fully connected, so this drives a synthetic 3-component
        graph), and the per-shard representative extraction returns
        exactly the component minima."""
        import ray

        from don_crawler_ray.stages.graph import (
            init_labels,
            min_label_sweeps,
            self_labeled_ids,
            shard_graph,
            state_dataset,
        )

        # components: {1,2,3}, {10,11}, {20}; node 20 is isolated and
        # enters the universe only through nodes_ds
        src = [1, 2, 2, 3, 10, 11]
        dst = [2, 1, 3, 2, 11, 10]
        edges = ray.data.from_arrow(
            pa.table(
                {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
            )
        ).repartition(3)
        nodes = ray.data.from_arrow(
            pa.table({"node": pa.array(sorted(set(src) | {20}), pa.int64())})
        )
        edge_refs, node_refs, n_nodes = shard_graph(
            edges, n_buckets=4, nodes_ds=nodes, node_col="node"
        )
        assert n_nodes == 6
        labels = min_label_sweeps(
            edge_refs, node_refs, init_labels(node_refs), iters=8, until_fixed=True
        )
        out = state_dataset(node_refs, labels, "node", "label").to_pandas()
        got = dict(zip(out.node.tolist(), out.label.tolist()))
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}
        assert self_labeled_ids(node_refs, labels).tolist() == [1, 10, 20]

    def test_pagerank_mass_and_ranking(self, ray_session):
        out = _to_pandas(entrymod.queries()["pagerank_orders"](SF_DIR))
        # floor division only ever LOSES mass; total stays within 1% of S
        assert 0.99 * 10**12 <= out.pr.sum() <= 10**12
        # suppliers (high-degree hubs in the bipartite graph) outrank
        # customers
        supp = out[out.node >= 1_000_000].pr.mean()
        cust = out[out.node < 1_000_000].pr.mean()
        assert supp > cust

    def test_jaccard_pairs_is_exact(self, ray_session):
        """Prefix filtering must have recall AND precision 1.0: the
        engine's pair set equals brute force over all sf0.001 docs."""
        from don_crawler_ray.functions.dedup import word_ngrams
        from don_crawler_ray.pipelines.queries import JACCARD_NGRAM, JACCARD_TAU

        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
        sets = {
            int(r.doc_id): set(word_ngrams(r.text, JACCARD_NGRAM))
            for _, r in docs.iterrows()
        }
        truth = {}
        items = [(d, s) for d, s in sets.items() if s]
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                (a, sa), (b, sb) = items[i], items[j]
                inter = len(sa & sb)
                jac = inter / (len(sa) + len(sb) - inter)
                if jac >= JACCARD_TAU:
                    truth[tuple(sorted((a, b)))] = jac
        out = _to_pandas(entrymod.queries()["jaccard_pairs"](SF_DIR))
        found = {
            tuple(sorted((int(r.a), int(r.b)))): float(r.jaccard)
            for _, r in out.iterrows()
        }
        assert found.keys() == truth.keys()
        for k in truth:
            assert found[k] == truth[k], k

    def test_jaccard_pairs_high_duplication_join_path(
        self, ray_session, tmp_path, monkeypatch
    ):
        """50%-dup corpus through the shuffle-join verify path (bound
        zeroed): still EXACTLY the brute-force pair set."""
        import pyarrow.parquet as pq

        from don_crawler_ray.functions.dedup import word_ngrams
        from don_crawler_ray.pipelines import queries as qmod

        monkeypatch.setattr(qmod, "MINHASH_BROADCAST_MAX_PAIRS", 0)

        rng = np.random.default_rng(11)
        words = [f"w{i:03d}" for i in range(300)]
        ids, texts = [], []
        for base in range(60):
            toks = rng.choice(words, size=30, replace=True).tolist()
            ids.append(2 * base)
            texts.append(" ".join(toks))
            mut = list(toks)
            mut[int(rng.integers(0, 30))] = str(rng.choice(words))
            ids.append(2 * base + 1)
            texts.append(" ".join(mut))
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts}),
            str(tmp_path / "documents.parquet"),
        )
        sets = {d: set(word_ngrams(t, qmod.JACCARD_NGRAM)) for d, t in zip(ids, texts)}
        truth = set()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = ids[i], ids[j]
                inter = len(sets[a] & sets[b])
                if inter and inter / (len(sets[a]) + len(sets[b]) - inter) >= 0.5:
                    truth.add((min(a, b), max(a, b)))
        out = _to_pandas(entrymod.queries()["jaccard_pairs"](str(tmp_path)))
        found = {tuple(sorted((int(r.a), int(r.b)))) for _, r in out.iterrows()}
        assert found == truth
        assert len(truth) >= 40  # the fixture really is duplicate-heavy

    def test_frequency_ordered_prefixes_shrink_candidates(
        self, ray_session, tmp_path
    ):
        """VERDICT r03 #6: on a boilerplate-heavy corpus (every doc
        shares a high-DF template; near-dups share rare content),
        frequency-ordered prefixes must produce the SAME verified pair
        set as hash-ordered prefixes while generating strictly fewer
        candidates — hash order puts shared boilerplate shingles in
        every prefix, exploding the buckets."""
        import pyarrow.parquet as pq

        from don_crawler_ray.functions.dedup import word_ngrams
        from don_crawler_ray.pipelines import queries as qmod

        rng = np.random.default_rng(7)
        boiler = " ".join(f"b{i:02d}" for i in range(30))  # in EVERY doc
        ids, texts = [], []
        for base in range(40):
            uniq = [f"u{base:02d}x{i:02d}" for i in range(30)]
            ids.append(2 * base)
            texts.append(boiler + " " + " ".join(uniq))
            mut = list(uniq)
            mut[int(rng.integers(0, 30))] = f"m{base:02d}"
            ids.append(2 * base + 1)
            texts.append(boiler + " " + " ".join(mut))
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts}),
            str(tmp_path / "documents.parquet"),
        )

        hash_pairs, hash_cands = qmod._jaccard_pairs_build(
            str(tmp_path), freq_order=False
        )
        freq_pairs, freq_cands = qmod._jaccard_pairs_build(
            str(tmp_path), freq_order=True
        )

        def pairset(t):
            return {
                (min(a, b), max(a, b))
                for a, b in zip(t.column("a").to_pylist(), t.column("b").to_pylist())
            }

        sets = {d: set(word_ngrams(t, qmod.JACCARD_NGRAM)) for d, t in zip(ids, texts)}
        truth = set()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = ids[i], ids[j]
                inter = len(sets[a] & sets[b])
                if inter and inter / (len(sets[a]) + len(sets[b]) - inter) >= 0.5:
                    truth.add((min(a, b), max(a, b)))

        assert pairset(freq_pairs) == pairset(hash_pairs) == truth
        assert len(truth) >= 40  # every (base, mutated) pair is a near-dup
        # the point of the optimization: candidate buckets collapse
        assert freq_cands < hash_cands / 2, (freq_cands, hash_cands)

    def test_dedup_clusters_consistent_with_pairs(self, ray_session):
        clusters = _to_pandas(entrymod.queries()["dedup_clusters"](SF_DIR))
        pairs = _to_pandas(entrymod.queries()["jaccard_pairs"](SF_DIR))
        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
        assert sorted(clusters.doc_id) == sorted(docs.doc_id)
        rep = dict(zip(clusters.doc_id, clusters.rep))
        # paired docs share a representative
        for _, r in pairs.iterrows():
            assert rep[int(r.a)] == rep[int(r.b)]
        # each representative is the minimum member of its cluster
        by_rep: dict = {}
        for d, rp in rep.items():
            by_rep.setdefault(rp, []).append(d)
        for rp, members in by_rep.items():
            assert rp == min(members)

    def test_embedding_quantize_roundtrip(self, ray_session):
        out = _to_pandas(entrymod.queries()["embedding_quantize"](SF_DIR))
        emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
        mat = np.stack(emb.embedding.to_numpy()).astype(np.float64)
        d = mat.shape[1]
        assert len(out) == len(emb) * d
        assert out.qv.abs().max() <= 127
        sub = out[out.vec_id == int(emb.vec_id.iloc[0])].sort_values("pos")
        x = mat[emb.vec_id.to_numpy().tolist().index(int(emb.vec_id.iloc[0]))]
        scale = float(sub.scale.iloc[0])
        assert scale == np.abs(x).max()
        # dequantization error bounded by half a quantization step
        deq = sub.qv.to_numpy().astype(np.float64) * scale / 127.0
        assert np.abs(deq - x).max() <= scale / 127.0 * 0.5 + 1e-12

    def test_vocab_topk_counter_oracle(self, ray_session):
        import collections

        out = _to_pandas(entrymod.queries()["vocab_topk"](SF_DIR))
        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
        c: collections.Counter = collections.Counter()
        for t in docs.text:
            c.update(t.split())
        want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
        got = list(zip(out.sort_values("rank").token, out.sort_values("rank").n))
        assert got == [(t, n) for t, n in want]

    def test_hll_estimate_accuracy(self, ray_session):
        from don_crawler_ray.functions.sketch import hll_estimate

        out = _to_pandas(entrymod.queries()["hll_users"](SF_DIR))
        est = hll_estimate(out.bucket.to_numpy(), out.rho.to_numpy())
        ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
        true = ev.user_id.nunique()
        assert abs(est - true) / true < 0.05, (est, true)

    def test_hll_partials_merge_invariant(self, ray_session):
        """The sketch is mergeable: registers from the full table equal
        the elementwise max of registers over any split of it."""
        import numpy as np

        from don_crawler_ray.functions.sketch import hll_bucket_rho

        ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
        uids = ev.user_id.unique()
        full_b, full_r = hll_bucket_rho(uids)
        reg_full: dict = {}
        for b, r in zip(full_b, full_r):
            reg_full[int(b)] = max(reg_full.get(int(b), 0), int(r))
        reg_merged: dict = {}
        for part in np.array_split(uids, 7):
            pb, pr = hll_bucket_rho(part)
            for b, r in zip(pb, pr):
                reg_merged[int(b)] = max(reg_merged.get(int(b), 0), int(r))
        assert reg_full == reg_merged

    def test_tfidf_topk_ranks_by_score(self, ray_session):
        out = _to_pandas(entrymod.queries()["tfidf_topk"](SF_DIR))
        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
        n = len(docs)
        # independent recomputation for 10 docs
        df: dict = {}
        for t in docs.text:
            for tok in set(t.split()):
                df[tok] = df.get(tok, 0) + 1
        for _, doc in docs.head(10).iterrows():
            tf: dict = {}
            for tok in doc.text.split():
                tf[tok] = tf.get(tok, 0) + 1
            want = sorted(((-(c * n) / df[t], t) for t, c in tf.items()))[:3]
            got = out[out.doc_id == doc.doc_id].sort_values("rank")
            assert list(got.token) == [t for _, t in want]
            assert list(got.score) == [-s for s, _ in want]

    def test_cms_point_queries_bound_true_counts(self, ray_session):
        """CMS guarantees estimate >= true count; with depth 4 x width
        512 over this vocabulary the estimates should also be tight."""
        import collections

        import numpy as np

        from don_crawler_ray.functions.dedup import fnv1a64
        from don_crawler_ray.functions.sketch import (
            CMS_DEPTH,
            CMS_WIDTH,
            cms_point_query,
        )

        out = _to_pandas(entrymod.queries()["cms_tokens"](SF_DIR))
        counters = np.zeros((CMS_DEPTH, CMS_WIDTH), np.int64)
        counters[out.r.to_numpy(), out.bucket.to_numpy()] = out.n.to_numpy()
        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
        true: collections.Counter = collections.Counter()
        for t in docs.text:
            true.update(t.split())
        assert int(counters[0].sum()) == sum(true.values())  # each row sees every occurrence
        for tok, cnt in true.items():
            est = cms_point_query(counters, fnv1a64(tok))
            assert est >= cnt, tok
            assert est <= cnt + counters[0].sum() * 2 / CMS_WIDTH, tok  # CM error bound


class TestRound3Widening:
    """Dedicated oracles for the range-join / quantile / normalization
    batch, beyond the parametrized SQL gate above."""

    def test_range_join_matches_brute_force(self, ray_session):
        """Every bucketed band-join count equals the O(n^2) definition:
        events with ts in [t, t+1h) excluding self — including window
        boundaries and cross-bucket probes."""
        from don_crawler_ray.pipelines.queries import RANGE_BAND_US

        out = _to_pandas(entrymod.queries()["range_join_events"](SF_DIR))
        ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["event_id", "ts"])
        ts = ev.ts.astype("int64").to_numpy()
        order = np.argsort(ts, kind="stable")
        sorted_ts = ts[order]
        lo = np.searchsorted(sorted_ts, ts, side="left")
        hi = np.searchsorted(sorted_ts, ts + RANGE_BAND_US, side="left")
        brute = dict(zip(ev.event_id.to_numpy(), (hi - lo - 1)))
        assert len(out) == len(ev)
        for eid, n in zip(out.event_id, out.n_within):
            assert n == brute[eid], eid

    def test_zscore_group_moments(self, ray_session):
        """Standardized scores have ~0 mean and ~1 population std per
        priority group (float tolerance only — bit-exactness vs DuckDB
        is the parametrized gate's job)."""
        out = _to_pandas(entrymod.queries()["zscore_orders"](SF_DIR))
        orders = pd.read_parquet(
            f"{SF_DIR}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
        )
        j = out.merge(orders, on="o_orderkey")
        for _, g in j.groupby("o_orderpriority"):
            assert abs(g.zscore.mean()) < 1e-9
            assert abs(g.zscore.std(ddof=0) - 1.0) < 1e-9

    def test_quality_filter_keeps_exact_tail(self, ray_session):
        """The percentile gate keeps exactly the rows at/above the
        1-based (90n+99)//100 order statistic of n_chars."""
        out = _to_pandas(entrymod.queries()["quality_filter_pct"](SF_DIR))
        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["n_chars"])
        v = np.sort(docs.n_chars.to_numpy())
        n = len(v)
        thr = v[(90 * n + 99) // 100 - 1]
        assert (out.n_chars >= thr).all()
        assert len(out) == int((docs.n_chars >= thr).sum())

    def test_group_quantiles_integer_index_contract(self, ray_session):
        """p50 equals the explicit ceil-index order statistic computed
        in pure integers — the contract that differs from float
        ceil(0.5*n) when the product is integral."""
        out = _to_pandas(entrymod.queries()["group_quantiles"](SF_DIR))
        orders = pd.read_parquet(
            f"{SF_DIR}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
        )
        for prio, g in orders.groupby("o_orderpriority"):
            v = np.sort(g.o_totalprice.to_numpy())
            n = len(v)
            row = out[out.o_orderpriority == prio].iloc[0]
            for p in (25, 50, 90):
                assert row[f"p{p}"] == v[(p * n + 99) // 100 - 1]

    def test_rollup_levels_consistent(self, ray_session):
        """Grand total == sum of year level == sum of finest level."""
        out = _to_pandas(entrymod.queries()["rollup_orders"](SF_DIR))
        total = out[(out.year == -1)].revenue_cents.iloc[0]
        yr = out[(out.year != -1) & (out.priority == "ALL")]
        fine = out[(out.year != -1) & (out.priority != "ALL")]
        assert yr.revenue_cents.sum() == total
        assert fine.revenue_cents.sum() == total
        assert yr.n_orders.sum() == fine.n_orders.sum() == out[out.year == -1].n_orders.iloc[0]


class TestTextCorpusOps:
    def test_repetition_stats_brute_force(self, ray_session):
        """top-k-gram counts match a per-doc Counter brute force and
        fractions are the exact integer ratio."""
        from collections import Counter

        out = _to_pandas(entrymod.queries()["repetition_stats"](SF_DIR)).set_index("doc_id")
        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        for _, r in docs.head(50).iterrows():
            toks = r.text.lower().split()
            row = out.loc[r.doc_id]
            assert row.n_words == len(toks)
            exp2 = max(Counter(zip(toks, toks[1:])).values()) if len(toks) >= 2 else 0
            exp3 = (
                max(Counter(zip(toks, toks[1:], toks[2:])).values()) if len(toks) >= 3 else 0
            )
            assert row.top2_n == exp2 and row.top3_n == exp3
            assert row.top2_frac == exp2 * 2 / max(len(toks), 1)
            assert row.top3_frac == exp3 * 3 / max(len(toks), 1)

    def test_dup_ngram_docs_symmetric_and_brute(self, ray_session):
        """Every reported doc shares >=1 8-gram with another doc; counts
        match a brute-force shingle-set intersection."""
        from don_crawler_ray.functions.dedup import shingle_hashes

        out = _to_pandas(entrymod.queries()["dup_ngram_docs"](SF_DIR)).set_index("doc_id")
        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        sets = {int(r.doc_id): set(shingle_hashes(r.text, k=8).tolist()) for _, r in docs.iterrows()}
        from collections import Counter as C

        freq = C()
        for s in sets.values():
            freq.update(s)
        for did, s in sets.items():
            n_shared = sum(1 for h in s if freq[h] >= 2)
            if n_shared:
                assert out.loc[did].n_shared == n_shared
            else:
                assert did not in out.index

    def test_pivot_events_row_sums(self, ray_session):
        """Pivoted per-day type counts sum to the per-day event total."""
        out = _to_pandas(entrymod.queries()["pivot_events"](SF_DIR))
        ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["ts", "event_type"])
        per_day = ev.groupby(ev.ts.dt.floor("D")).size()
        wide_sum = out.set_index("day")[
            ["n_click", "n_error", "n_purchase", "n_signup", "n_view"]
        ].sum(axis=1)
        assert len(out) == len(per_day)
        for day, n in per_day.items():
            assert wide_sum.loc[day] == n


class TestJoinReshapeOps:
    def test_left_join_keeps_orderless_customer(self, ray_session, tmp_path):
        """A customer with no orders survives the left join with zero
        count/spend; totals are exact cents."""
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "c_custkey": pa.array([1, 2, 7], pa.int64()),
                    "c_nationkey": pa.array([10, 11, 12], pa.int32()),
                }
            ),
            tmp_path / "customer.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "o_custkey": pa.array([1, 1, 2], pa.int64()),
                    "o_totalprice": pa.array([10.01, 0.02, 5.555], pa.float64()),
                }
            ),
            tmp_path / "orders.parquet",
        )
        out = (
            _to_pandas(entrymod.queries()["left_join_customers"](str(tmp_path)))
            .set_index("c_custkey")
            .sort_index()
        )
        assert list(out.index) == [1, 2, 7]
        assert out.loc[7].n_orders == 0 and out.loc[7].total_cents == 0
        assert out.loc[1].n_orders == 2 and out.loc[1].total_cents == 1003
        assert out.loc[2].n_orders == 1 and out.loc[2].total_cents == 556  # rint half-even on 555.5
        assert out.loc[7].c_nationkey == 12

    def test_json_extract_matches_json_loads(self, ray_session):
        import json

        out = _to_pandas(entrymod.queries()["json_extract_events"](SF_DIR)).set_index(
            "event_type"
        )
        ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["event_type", "props"])
        ev["k"] = ev.props.map(lambda s: json.loads(s)["k"])
        for et, g in ev.groupby("event_type"):
            row = out.loc[et]
            assert row.n == len(g)
            assert row.sum_k == g.k.sum()
            assert row.min_k == g.k.min() and row.max_k == g.k.max()

    def test_value_histogram_total_and_bins(self, ray_session):
        out = _to_pandas(entrymod.queries()["value_histogram"](SF_DIR)).set_index("bin")
        ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["value"])
        cents = np.rint(ev.value.to_numpy() * 100.0).astype(np.int64)
        bins = np.minimum(cents // 2500, 19)
        assert out.n.sum() == len(ev)
        assert len(out) == 20
        for b in range(20):
            assert out.loc[b].n == int((bins == b).sum())


class TestWindowJoinFingerprintOps:
    """Semantic (non-parity) properties of the round-3 additions: the
    parametrized SQL gate proves value equality; these prove the
    operator CONTRACTS (winnowing's match guarantee, DuckDB's NTILE
    sizing rule, bloom exactness under false positives, funnel
    ordering)."""

    def test_winnow_guarantee_shared_fingerprint(self, ray_session):
        """Two docs sharing a run of >= w+k-1 tokens share a
        fingerprint (the winnowing theorem, Schleimer et al. §2)."""
        from don_crawler_ray.functions.dedup import fnv1a64

        out = _to_pandas(entrymod.queries()["winnow_fingerprints"](SF_DIR))
        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])

        def fps(text):
            toks = text.lower().split()
            if len(toks) < 3:
                toks = toks + [""] * (3 - len(toks))
            h = np.array(
                [fnv1a64(" ".join(toks[i:i + 3]) + " ") for i in range(max(1, len(toks) - 2))],
                np.uint64,
            )
            if len(h) <= 4:
                return {int(h[np.argmin(h)])}
            win = np.lib.stride_tricks.sliding_window_view(h, 4)
            idx = np.argmin(win, axis=1) + np.arange(win.shape[0])
            return set(h[np.unique(idx)].tolist())

        # independent recomputation agrees with the distributed result
        ref = {int(r.doc_id): fps(r.text) for r in docs.itertuples()}
        for r in out.itertuples():
            want = ref[int(r.doc_id)]
            assert r.n_fp == len(want)
            assert int(r.min_fp) == min(want) and int(r.max_fp) == max(want)
        # the guarantee itself, on a synthetic shared run
        a = "unique alpha beta gamma delta epsilon zeta eta theta run"
        b = "other prefix alpha beta gamma delta epsilon zeta eta theta tail"
        assert fps(a) & fps(b)

    def test_ntile_sizes_match_duckdb_rule(self, ray_session):
        out = _to_pandas(entrymod.queries()["ntile_orders"](SF_DIR))
        sizes = out.groupby(["o_custkey", "tile"]).size().unstack(fill_value=0)
        for _, row in sizes.iterrows():
            counts = [c for c in row.tolist() if c > 0]
            n = sum(counts)
            k = min(4, n)
            # first n%k tiles get ceil(n/k), rest floor(n/k)
            want = [(n // k) + (1 if i < n % k else 0) for i in range(k)]
            assert counts == [w for w in want if w > 0]

    def test_bloom_join_exact_despite_false_positives(self, ray_session):
        """A deliberately tiny bloom (high FP rate) must still give
        exact results because the bucket equijoin verifies."""
        from don_crawler_ray.pipelines import queries as q

        out = _to_pandas(entrymod.queries()["bloom_join_lineitem"](SF_DIR))
        li = pd.read_parquet(
            f"{SF_DIR}/lineitem.parquet",
            columns=["l_partkey", "l_returnflag", "l_extendedprice"],
        )
        part = pd.read_parquet(f"{SF_DIR}/part.parquet", columns=["p_partkey", "p_size"])
        keys = set(part[part.p_size >= 40].p_partkey)
        hit = li[li.l_partkey.isin(keys)]
        want = hit.groupby("l_returnflag").agg(
            n=("l_extendedprice", "size"),
            cents=("l_extendedprice", lambda s: int(np.rint(s.to_numpy() * 100).sum())),
        )
        got = out.set_index("l_returnflag")
        assert got.n.to_dict() == want.n.to_dict()
        assert got.cents.to_dict() == want.cents.to_dict()

    def test_funnel_stages_monotone(self, ray_session):
        out = _to_pandas(entrymod.queries()["funnel_stages"](SF_DIR)).set_index("stage")
        assert out.loc[1].n_users >= out.loc[2].n_users >= out.loc[3].n_users

    def test_running_total_last_equals_group_sum(self, ray_session):
        out = _to_pandas(entrymod.queries()["running_total"](SF_DIR))
        orders = pd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_custkey", "o_totalprice"])
        want = orders.assign(
            cents=np.rint(orders.o_totalprice.to_numpy() * 100).astype(np.int64)
        ).groupby("o_custkey").cents.sum()
        last = out.sort_values(["o_custkey", "o_orderdate", "o_orderkey"]).groupby("o_custkey").cum_cents.last()
        assert last.to_dict() == want.to_dict()


class TestWindowTieEdges:
    """Tie and singleton edge cases the sf fixtures never hit (order
    cents are globally unique there): equal-cents groups must share a
    percent_rank, and NTILE/rank must behave on 1-row partitions."""

    def _orders(self, tmp_path, prices, custkeys):
        import pyarrow.parquet as pq

        n = len(prices)
        pq.write_table(
            pa.table(
                {
                    "o_custkey": pa.array(custkeys, pa.int64()),
                    "o_orderkey": pa.array(list(range(1, n + 1)), pa.int64()),
                    "o_orderdate": pa.array(
                        np.arange(n, dtype=np.int64).view("datetime64[D]").astype("datetime64[us]")
                    ),
                    "o_totalprice": pa.array(prices, pa.float64()),
                }
            ),
            tmp_path / "orders.parquet",
        )
        return str(tmp_path)

    def test_percent_rank_ties_and_singletons(self, ray_session, tmp_path):
        import duckdb

        # cust 1: 4 orders with a 3-way tie; cust 2: singleton
        sf = self._orders(tmp_path, [5.0, 5.0, 5.0, 9.0, 3.0], [1, 1, 1, 1, 2])
        out = _to_pandas(entrymod.queries()["percent_rank_orders"](sf))
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW orders AS SELECT * FROM read_parquet('{tmp_path}/orders.parquet')"
        )
        want = con.execute(entrymod.oracle_sql()["percent_rank_orders"]).fetchdf()
        compare(out, want, "percent_rank_ties")
        got = out.set_index("o_orderkey").pr
        assert got[1] == got[2] == got[3] == 0.0  # tied lowest share rank 1
        assert got[4] == 1.0
        assert got[5] == 0.0  # singleton partition

    def test_ntile_and_rank_singletons(self, ray_session, tmp_path):
        import duckdb

        sf = self._orders(tmp_path, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0], [1, 1, 1, 2, 3, 3])
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW orders AS SELECT * FROM read_parquet('{tmp_path}/orders.parquet')"
        )
        for name in ("ntile_orders", "rank_orders", "running_total"):
            out = _to_pandas(entrymod.queries()[name](sf))
            want = con.execute(entrymod.oracle_sql()[name]).fetchdf()
            compare(out, want, name)


class TestBatchHContracts:
    """Semantic contracts for the batch-H operators — properties the
    oracle hash-compare can't express (reconstruction, quota
    invariants, estimator accuracy)."""

    def test_chunk_documents_reconstruction(self, ray_session):
        from don_crawler_ray.pipelines.queries import CHUNK_STRIDE, CHUNK_WINDOW

        out = _to_pandas(entrymod.queries()["chunk_documents"](SF_DIR))
        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        by_doc = {d: g.sort_values("chunk_id") for d, g in out.groupby("doc_id")}
        for _, row in docs.head(50).iterrows():
            g = by_doc[row.doc_id]
            text = row.text
            want_n = (len(text) + CHUNK_STRIDE - 1) // CHUNK_STRIDE
            assert len(g) == want_n, row.doc_id
            # chunk i is exactly text[i*S : i*S+W]
            for i, chunk in zip(g.chunk_id, g.chunk_text):
                assert chunk == text[i * CHUNK_STRIDE : i * CHUNK_STRIDE + CHUNK_WINDOW]
            # stride-overlap identity: chunk i's head repeats chunk
            # i-1's tail (window - stride chars) whenever i-1 was full
            ov = CHUNK_WINDOW - CHUNK_STRIDE
            chunks = g.chunk_text.tolist()
            for i in range(1, len(chunks)):
                if len(chunks[i - 1]) == CHUNK_WINDOW:
                    assert chunks[i - 1][-ov:].startswith(chunks[i][:ov][: len(chunks[i - 1][-ov:])])

    def test_redact_terms_no_residue(self, ray_session):
        import re

        from don_crawler_ray.pipelines.queries import REDACT_PATTERN

        out = _to_pandas(entrymod.queries()["redact_terms"](SF_DIR))
        pat = re.compile(REDACT_PATTERN)
        assert len(out) == 500
        assert int(out.n_hits.sum()) > 0  # the deny-list actually fires
        for s in out.scrubbed:
            assert pat.search(s) is None

    def test_lag_events_semantics(self, ray_session):
        out = _to_pandas(entrymod.queries()["lag_events"](SF_DIR))
        ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["event_id", "user_id", "ts"])
        assert len(out) == len(ev)
        # exactly one -1 per user; all other gaps >= 0
        firsts = out[out.gap_us == -1]
        assert set(firsts.user_id) == set(ev.user_id.unique())
        assert len(firsts) == ev.user_id.nunique()
        assert (out[out.gap_us != -1].gap_us >= 0).all()

    def test_neardup_survivors_partition(self, ray_session):
        surv = _to_pandas(entrymod.queries()["neardup_survivors"](SF_DIR))
        clusters = _to_pandas(entrymod.queries()["dedup_clusters"](SF_DIR))
        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
        kept = set(surv.doc_id)
        # survivors are exactly the cluster representatives
        assert kept == set(clusters[clusters.doc_id == clusters.rep].doc_id)
        # every dropped doc's representative survives
        dropped = clusters[~clusters.doc_id.isin(kept)]
        assert dropped.rep.isin(kept).all()
        assert kept | set(dropped.doc_id) == set(docs.doc_id)

    def test_hll_users_daily_estimates(self, ray_session):
        from don_crawler_ray.functions.sketch import HLL_P, hll_estimate

        out = _to_pandas(entrymod.queries()["hll_users_daily"](SF_DIR))
        ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["ts", "user_id"])
        ev["day"] = ev.ts.dt.floor("D")
        true_dau = ev.groupby("day").user_id.nunique()
        for day, g in out.groupby("day"):
            est = hll_estimate(g.bucket.to_numpy(), g.rho.to_numpy(), HLL_P)
            truth = int(true_dau.loc[day])
            assert abs(est - truth) <= max(3, 0.25 * truth), (day, est, truth)

    def test_argmax_orders_semantics(self, ray_session):
        out = _to_pandas(entrymod.queries()["argmax_orders"](SF_DIR)).set_index("o_custkey")
        orders = pd.read_parquet(
            f"{SF_DIR}/orders.parquet", columns=["o_custkey", "o_orderkey", "o_totalprice"]
        )
        orders["cents"] = (orders.o_totalprice * 100.0).round().astype("int64")
        want = orders.sort_values(
            ["o_custkey", "cents", "o_orderkey"], ascending=[True, False, True]
        ).groupby("o_custkey").first()
        assert len(out) == len(want)
        assert (out.best_order == want.o_orderkey).all()
        assert (out.best_cents == want.cents).all()

    def test_cube_orders_consistency(self, ray_session):
        out = _to_pandas(entrymod.queries()["cube_orders"](SF_DIR))
        base = out[(out.status != "ALL") & (out.priority != "ALL")]
        grand = out[(out.status == "ALL") & (out.priority == "ALL")]
        assert len(grand) == 1
        assert int(grand.n_orders.iloc[0]) == int(base.n_orders.sum())
        assert int(grand.cents.iloc[0]) == int(base.cents.sum())
        by_status = out[(out.status != "ALL") & (out.priority == "ALL")].set_index("status")
        roll = base.groupby("status")[["n_orders", "cents"]].sum()
        assert (by_status.n_orders == roll.n_orders).all()
        assert (by_status.cents == roll.cents).all()

    def test_snapshot_diff_semantics(self, ray_session):
        out = _to_pandas(entrymod.queries()["snapshot_diff"](SF_DIR)).set_index("user_id")
        ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
        ev["cents"] = (ev.value * 100.0).round().astype("int64")
        t1, t2 = pd.Timestamp("2024-01-11"), pd.Timestamp("2024-01-21")
        e2 = ev[ev.ts <= t2].sort_values(["ts", "event_id"])
        last2 = e2.groupby("user_id").cents.last()
        last1 = e2[e2.ts <= t1].groupby("user_id").cents.last()
        assert set(out.index) == set(last2.index)
        for uid in out.index:
            new = int(last2.loc[uid])
            assert int(out.loc[uid, "new_cents"]) == new
            if uid not in last1.index:
                assert out.loc[uid, "status"] == "added"
                assert int(out.loc[uid, "old_cents"]) == -1
            else:
                old = int(last1.loc[uid])
                assert int(out.loc[uid, "old_cents"]) == old
                assert out.loc[uid, "status"] == ("same" if old == new else "changed")

    def test_budget_alloc_quota(self, ray_session):
        from don_crawler_ray.pipelines.queries import BUDGET_TOTAL

        out = _to_pandas(entrymod.queries()["budget_alloc"](SF_DIR))
        assert int(out.budget.sum()) == BUDGET_TOTAL
        total = int(out.n_orders.sum())
        base = (BUDGET_TOTAL * out.n_orders) // total
        # Hamilton quota property: base <= budget <= base + 1
        assert ((out.budget == base) | (out.budget == base + 1)).all()

    def test_lang_gini_bounds(self, ray_session):
        out = _to_pandas(entrymod.queries()["lang_gini_by_source"](SF_DIR))
        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["source", "lang"])
        assert ((out.gini >= 0) & (out.gini < 1)).all()
        for _, row in out.iterrows():
            grp = docs[docs.source == row.source]
            p = grp.lang.value_counts(normalize=True).to_numpy()
            assert abs(row.gini - (1.0 - float((p * p).sum()))) < 1e-9


class TestBatchIContracts:
    """Semantic contracts for the batch-I operators."""

    def test_sample_per_group_is_uniform_rank(self, ray_session):
        from don_crawler_ray.functions.dedup import _mix64
        from don_crawler_ray.pipelines.queries import SAMPLE_PER_GROUP_K

        out = _to_pandas(entrymod.queries()["sample_per_group"](SF_DIR))
        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang"])
        assert (out.groupby("lang").size() <= SAMPLE_PER_GROUP_K).all()
        for lang, g in docs.groupby("lang"):
            ids = g.doc_id.to_numpy().astype(np.int64)
            hv = _mix64(ids.astype(np.uint64))
            want = ids[np.lexsort((ids, hv))][:SAMPLE_PER_GROUP_K]
            got = out[out.lang == lang].sort_values("rank").doc_id.to_numpy()
            assert (got == want).all(), lang

    def test_enrich_lineitem_totals(self, ray_session):
        out = _to_pandas(entrymod.queries()["enrich_lineitem"](SF_DIR))
        li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet", columns=["l_extendedprice", "l_discount"])
        rev = ((li.l_extendedprice * 100.0).round().astype("int64")
               * (100 - (li.l_discount * 100.0).round().astype("int64")))
        assert int(out.n_lines.sum()) == len(li)  # every line lands in a cell
        assert int(out.rev_e6.sum()) == int(rev.sum())

    def test_retired_parts_never_ship_late(self, ray_session):
        out = _to_pandas(entrymod.queries()["retired_parts"](SF_DIR))
        li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet", columns=["l_partkey", "l_shipdate"])
        cut = pd.Timestamp("2001-06-01")
        last = li.groupby("l_partkey").l_shipdate.max()
        assert set(out.l_partkey) == set(last[last < cut].index)
        assert len(out) > 0  # non-vacuous at this fixture

    def test_distinct_on_events_first_per_pair(self, ray_session):
        out = _to_pandas(entrymod.queries()["distinct_on_events"](SF_DIR))
        ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
        want = (
            ev.sort_values(["user_id", "event_type", "ts", "event_id"])
            .groupby(["user_id", "event_type"])
            .first()
            .reset_index()
        )
        got = out.sort_values(["user_id", "event_type"], ignore_index=True)
        want = want.sort_values(["user_id", "event_type"], ignore_index=True)
        assert len(got) == len(want)
        assert (got.event_id.to_numpy() == want.event_id.to_numpy()).all()
        assert (got.first_ts.to_numpy() == want.ts.to_numpy()).all()


class TestCurationPipeline:
    def test_curation_pipeline_composition(self, ray_session):
        """The composite equals its stages composed independently:
        en + quality + near-dup-survivor docs, then chunk counts."""
        from don_crawler_ray.pipelines.queries import CHUNK_STRIDE

        out = _to_pandas(entrymod.queries()["curation_pipeline"](SF_DIR))
        surv = _to_pandas(entrymod.queries()["neardup_survivors"](SF_DIR))
        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang", "n_chars"])
        want_docs = set(
            docs[(docs.lang == "en") & (docs.n_chars >= 100)].doc_id
        ) & set(surv.doc_id)
        assert set(out.doc_id) == want_docs
        n_by_doc = out.groupby("doc_id").size()
        chars = docs.set_index("doc_id").n_chars
        for d, n in n_by_doc.items():
            assert n == (chars.loc[d] + CHUNK_STRIDE - 1) // CHUNK_STRIDE


class TestBatchJContracts:
    def test_table_checksum_order_free(self, ray_session):
        """The checksum is invariant to row order and partitioning —
        recompute it from a shuffled pandas read and from the query."""
        import hashlib

        from don_crawler_ray.functions.dedup import _mix64

        out = _to_pandas(entrymod.queries()["table_checksum"](SF_DIR))
        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        docs = docs.sample(frac=1.0, random_state=3)  # scramble order
        sigs = np.array(
            [int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big") for t in docs.text],
            np.uint64,
        )
        with np.errstate(over="ignore"):
            tsum = np.add.reduce(sigs, dtype=np.uint64)
            isum = np.add.reduce(_mix64(docs.doc_id.to_numpy().astype(np.uint64)), dtype=np.uint64)
        assert int(out.n_rows.iloc[0]) == len(docs)
        assert np.uint64(out.text_checksum.iloc[0]) == tsum
        assert np.uint64(out.id_checksum.iloc[0]) == isum

    def test_unpivot_totals(self, ray_session):
        out = _to_pandas(entrymod.queries()["unpivot_lineitem"](SF_DIR)).set_index("measure")
        li = pd.read_parquet(
            f"{SF_DIR}/lineitem.parquet",
            columns=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        )
        for m in li.columns:
            assert int(out.loc[m, "n"]) == len(li)
            assert int(out.loc[m, "sum_e2"]) == int((li[m] * 100.0).round().astype("int64").sum())

    def test_chunk_explode_unicode_property(self, ray_session):
        """utf8_slice_codeunits slices CODE POINTS — property-check the
        explode kernel against Python string slicing on multi-byte
        text (the fixture is ASCII, so this is the only place the
        unicode contract is exercised)."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from don_crawler_ray.pipelines.queries import (
            CHUNK_STRIDE,
            CHUNK_WINDOW,
            _chunk_explode_fn,
        )

        explode = _chunk_explode_fn()

        @settings(max_examples=50, deadline=None)
        @given(st.lists(st.text(min_size=0, max_size=400), min_size=1, max_size=8))
        def prop(texts):
            batch = pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            )
            out = explode(batch)
            got = {}
            for d, i, c in zip(
                out.column("doc_id").to_pylist(),
                out.column("chunk_id").to_pylist(),
                out.column("chunk_text").to_pylist(),
            ):
                got[(d, i)] = c
            for d, t in enumerate(texts):
                n = (len(t) + CHUNK_STRIDE - 1) // CHUNK_STRIDE
                assert sum(1 for k in got if k[0] == d) == n
                for i in range(n):
                    assert got[(d, i)] == t[i * CHUNK_STRIDE : i * CHUNK_STRIDE + CHUNK_WINDOW]

        prop()


def test_source_concentration_monotone(ray_session):
    out = _to_pandas(entrymod.queries()["source_concentration"](SF_DIR))
    assert (out.sort_values("rank").cum_share.diff().dropna() > 0).all()
    assert abs(out.cum_share.max() - 1.0) < 1e-12
    assert (out.sort_values("rank").n_docs.diff().dropna() <= 0).all()


class TestBatchKContracts:
    def test_events_per_user_histogram_total(self, ray_session):
        out = _to_pandas(entrymod.queries()["events_per_user_histogram"](SF_DIR))
        ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id"])
        assert int(out.n_users.sum()) == ev.user_id.nunique()
        assert int((out.n_events * out.n_users).sum()) == len(ev)

    def test_text_normalize_idempotent(self, ray_session):
        out = _to_pandas(entrymod.queries()["text_normalize"](SF_DIR))
        import re
        for s in out.norm_text.head(100):
            assert s == s.lower()
            assert "  " not in s
            assert s == s.strip(" ")
            assert re.search(r"[\t\n\r\f]", s) is None

    def test_order_gap_stats_semantics(self, ray_session):
        out = _to_pandas(entrymod.queries()["order_gap_stats"](SF_DIR)).set_index("o_custkey")
        orders = pd.read_parquet(
            f"{SF_DIR}/orders.parquet", columns=["o_custkey", "o_orderkey", "o_orderdate"]
        ).sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        for ck, g in orders.groupby("o_custkey"):
            if len(g) < 2:
                assert ck not in out.index
                continue
            gaps = g.o_orderdate.diff().dropna().dt.days.sum()
            assert int(out.loc[ck, "n_orders"]) == len(g)
            assert int(out.loc[ck, "sum_gap_days"]) == int(gaps)


def test_global_running_sum_parallel_invariance(ray_session):
    """The two-phase scan must give identical prefix sums however the
    sorted blocks are laid out — force a different block count via
    repartition and compare final totals + spot prefixes."""
    out = _to_pandas(entrymod.queries()["global_running_sum"](SF_DIR)).sort_values("event_id")
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["event_id", "event_type", "value"])
    ev = ev.sort_values("event_id")
    cents = np.where(
        ev.event_type == "purchase", (ev.value * 100.0).round().astype("int64"), 0
    )
    want = np.cumsum(cents)
    assert (out.cum_cents.to_numpy() == want).all()


def test_exact_median_selection(ray_session):
    out = _to_pandas(entrymod.queries()["exact_median_lineitem"](SF_DIR))
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet", columns=["l_extendedprice"])
    cents = np.sort((li.l_extendedprice * 100.0).round().astype("int64").to_numpy())
    k = (len(cents) + 1) // 2
    assert int(out.n.iloc[0]) == len(cents)
    assert int(out.median_cents.iloc[0]) == int(cents[k - 1])


def test_quantile_disc_rank_rule():
    """Pin the k = (n+1)//2 lower-middle rule to DuckDB's
    quantile_disc(0.5) on odd AND even counts."""
    import duckdb

    for vals in ([5, 1, 9], [5, 1, 9, 7], [2], [3, 3, 1, 8, 8, 8]):
        got = duckdb.sql(
            f"SELECT quantile_disc(x, 0.5) FROM (SELECT unnest({vals}) AS x)"
        ).fetchone()[0]
        want = sorted(vals)[(len(vals) + 1) // 2 - 1]
        assert got == want, vals


class TestBatchLContracts:
    def test_fraction_sample_rates(self, ray_session):
        out = _to_pandas(entrymod.queries()["fraction_sample_by_lang"](SF_DIR))
        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang"])
        got = out.groupby("lang").size()
        tot = docs.groupby("lang").size()
        # en downsampled hard; every other lang near its 50% rate
        assert got.get("en", 0) / tot["en"] < 0.25
        for lg in tot.index:
            if lg == "en":
                continue
            assert 0.25 < got.get(lg, 0) / tot[lg] < 0.75, lg

    def test_abandoned_views_semantics(self, ray_session):
        out = _to_pandas(entrymod.queries()["abandoned_views"](SF_DIR))
        ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
        views = ev[ev.event_type == "view"]
        purch = ev[ev.event_type == "purchase"]
        abandoned = set()
        for _, v in views.iterrows():
            p = purch[
                (purch.user_id == v.user_id)
                & (purch.ts > v.ts)
                & (purch.ts <= v.ts + pd.Timedelta(hours=1))
            ]
            if p.empty:
                abandoned.add(v.event_id)
        assert set(out.event_id) == abandoned
        assert len(abandoned) < len(views)  # some views DO convert

    def test_incremental_equals_scratch(self, ray_session):
        """The maintenance invariant: base-at-T1 + delta == scratch-at-T2."""
        out = _to_pandas(entrymod.queries()["incremental_daily_counts"](SF_DIR))
        ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["ts"])
        want = (
            ev[ev.ts <= pd.Timestamp("2024-01-26")]
            .assign(day=lambda d: d.ts.dt.floor("D"))
            .groupby("day")
            .size()
        )
        got = out.set_index("day").n_events
        assert (got.sort_index() == want.sort_index()).all()


class TestBatchMContracts:
    def test_debounce_keeps_first_and_suppresses(self, ray_session):
        from don_crawler_ray.pipelines.queries import DEBOUNCE_WINDOW_US

        out = _to_pandas(entrymod.queries()["debounce_events"](SF_DIR))
        ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
        assert len(out) < len(ev)  # non-vacuous: something was suppressed
        ev["win"] = ev.ts.astype("int64") // 1000 // (DEBOUNCE_WINDOW_US // 1000)
        want = (
            ev.sort_values(["user_id", "event_type", "ts", "event_id"])
            .groupby(["user_id", "event_type", "win"])
            .first()
        )
        assert set(out.event_id) == set(want.event_id)

    def test_user_event_types_sorted_sets(self, ray_session):
        out = _to_pandas(entrymod.queries()["user_event_types"](SF_DIR)).set_index("user_id")
        ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id", "event_type"])
        for uid, g in ev.groupby("user_id"):
            want = sorted(set(g.event_type))
            assert out.loc[uid, "event_types"] == ",".join(want)
            assert int(out.loc[uid, "n_types"]) == len(want)


def test_basket_pairs_support(ray_session):
    out = _to_pandas(entrymod.queries()["basket_pairs"](SF_DIR))
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id", "event_type"])
    sets = ev.groupby("user_id").event_type.agg(lambda s: frozenset(s))
    import itertools
    want = {}
    for types in sets:
        for a, b in itertools.combinations(sorted(types), 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    got = {(r.type_a, r.type_b): int(r.n_users) for r in out.itertuples()}
    assert got == want


def test_doc_corpus_fit_recompute(ray_session):
    out = _to_pandas(entrymod.queries()["doc_corpus_fit"](SF_DIR)).set_index("doc_id")
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    from collections import Counter
    gc = Counter()
    for t in docs.text:
        toks = t.split()
        gc.update(zip(toks, toks[1:]))
    for _, row in docs.head(60).iterrows():
        toks = row.text.split()
        bgs = list(zip(toks, toks[1:]))
        if not bgs:
            assert row.doc_id not in out.index
            continue
        tot = sum(gc[b] for b in bgs)
        assert int(out.loc[row.doc_id, "n_bigrams"]) == len(bgs)
        assert out.loc[row.doc_id, "fit"] == tot / len(bgs)


def test_pareto_docs_brute_force(ray_session):
    out = _to_pandas(entrymod.queries()["pareto_docs"](SF_DIR))
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang", "text"])
    docs["n_tok"] = docs.text.str.split().map(len)
    docs["n_distinct"] = docs.text.str.split().map(lambda t: len(set(t)))
    want = set()
    for lg, grp in docs.groupby("lang"):
        pts = grp[["doc_id", "n_tok", "n_distinct"]].to_numpy()
        for did, x, y in pts:
            dominated = any(
                (a >= x and b >= y and (a > x or b > y)) for _, a, b in pts
            )
            if not dominated:
                want.add((int(did), lg, int(x), int(y)))
    got = {(int(r.doc_id), r.lang, int(r.n_tok), int(r.n_distinct)) for r in out.itertuples()}
    assert got == want


def test_pareto_mask_edge_cases():
    import numpy as np

    from don_crawler_ray.pipelines.queries import _pareto_mask

    # empty, singleton, all-duplicates (mutually non-dominating)
    assert _pareto_mask(np.array([], np.int64), np.array([], np.int64)).tolist() == []
    assert _pareto_mask(np.array([5], np.int64), np.array([3], np.int64)).tolist() == [True]
    dup = _pareto_mask(np.array([2, 2, 2], np.int64), np.array([7, 7, 7], np.int64))
    assert dup.tolist() == [True, True, True]
    # strict chain: only the maximum survives
    chain = _pareto_mask(np.array([1, 2, 3], np.int64), np.array([1, 2, 3], np.int64))
    assert chain.tolist() == [False, False, True]
    # anticorrelated: everything survives
    anti = _pareto_mask(np.array([1, 2, 3], np.int64), np.array([3, 2, 1], np.int64))
    assert anti.tolist() == [True, True, True]


def test_hrw_minimal_movement():
    """The rendezvous-sharding contract: growing K=8 -> 9 moves roughly
    1/9 of keys, and every moved key lands on the NEW shard."""
    import numpy as np

    from don_crawler_ray.pipelines.queries import hrw_owner

    keys = np.arange(1, 20_001, dtype=np.int64)
    o8 = hrw_owner(keys, 8)
    o9 = hrw_owner(keys, 9)
    assert set(np.unique(o8)) <= set(range(8))
    moved = o8 != o9
    frac = moved.mean()
    assert 0.05 < frac < 0.20, frac  # expect ~1/9 = 0.111
    assert set(np.unique(o9[moved])) == {8}  # movers go only to the new shard


def test_hrw_shards_recompute(ray_session):
    import numpy as np

    from don_crawler_ray.pipelines.queries import HRW_SHARDS, hrw_owner

    out = _to_pandas(entrymod.queries()["hrw_shards"](SF_DIR)).set_index("o_orderkey")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_orderkey"])
    keys = orders.o_orderkey.to_numpy().astype(np.int64)
    want = hrw_owner(keys, HRW_SHARDS)
    got = out.loc[keys, "shard"].to_numpy()
    assert (got == want).all()
    # every shard is populated and the split is roughly balanced
    counts = np.bincount(want, minlength=HRW_SHARDS)
    assert (counts > 0).all()
    assert counts.max() < 2.5 * counts.min()


class TestSpanDedup:
    def test_known_spans_removed(self, ray_session, tmp_path):
        """Crafted corpus pins the ExactSubstr-removal semantics:
        a cross-doc shared 8-token span is cut from BOTH docs, a
        within-doc repeated span is cut (both occurrences), overlap
        coverage merges, and unique text plus short docs survive
        verbatim."""
        import pyarrow.parquet as pq

        shared = "s0 s1 s2 s3 s4 s5 s6 s7"        # 8 tokens, in docs 0+1
        rep = "r0 r1 r2 r3 r4 r5 r6 r7"           # 8 tokens, twice in doc 2
        docs = {
            0: f"a0 a1 {shared} a2 a3",
            1: f"b0 {shared} b1",
            2: f"{rep} mid {rep}",
            3: "u0 u1 u2 u3 u4 u5 u6 u7 u8",      # unique: untouched
            4: "short doc",                        # < 8 tokens: untouched
        }
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(sorted(docs), pa.int64()),
                    "text": [docs[i] for i in sorted(docs)],
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        out = (
            _to_pandas(entrymod.queries()["span_dedup_docs"](str(tmp_path)))
            .set_index("doc_id")
            .sort_index()
        )
        assert out.loc[0, "text_clean"] == "a0 a1 a2 a3"
        assert out.loc[0, "n_removed"] == 8
        assert out.loc[1, "text_clean"] == "b0 b1"
        assert out.loc[1, "n_removed"] == 8
        assert out.loc[2, "text_clean"] == "mid"
        assert out.loc[2, "n_removed"] == 16
        assert out.loc[3, "text_clean"] == docs[3]
        assert out.loc[3, "n_removed"] == 0
        assert out.loc[4, "text_clean"] == docs[4]
        assert out.loc[4, "n_removed"] == 0

    def test_overlapping_runs_cover_union(self, ray_session, tmp_path):
        """Two docs sharing a 9-token run => two overlapping dup
        8-grams; coverage is the union (9 tokens), not 16."""
        import pyarrow.parquet as pq

        run = " ".join(f"c{i}" for i in range(9))
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([0, 1], pa.int64()),
                    "text": [f"x0 {run} x1", f"y0 y1 {run}"],
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        out = (
            _to_pandas(entrymod.queries()["span_dedup_docs"](str(tmp_path)))
            .set_index("doc_id")
        )
        assert out.loc[0, "n_removed"] == 9
        assert out.loc[0, "text_clean"] == "x0 x1"
        assert out.loc[1, "n_removed"] == 9
        assert out.loc[1, "text_clean"] == "y0 y1"


class TestQuantileSketch:
    def test_rank_error_bound(self, ray_session):
        """Sketch deciles must sit within the uniform-sample rank
        bound: |true_rank(est) - q*n| <= 4*n*sqrt(q(1-q)/K) (4 sigma;
        the hash sample is fixed, so this is a deterministic check,
        not a flaky statistical one)."""
        from don_crawler_ray.pipelines.queries import QSKETCH_K

        out = _to_pandas(
            entrymod.queries()["quantile_sketch_lineitem"](SF_DIR)
        ).set_index("q_pct")
        full = pd.read_parquet(
            f"{SF_DIR}/lineitem.parquet", columns=["l_extendedprice"]
        )["l_extendedprice"].to_numpy()
        cents = np.rint(full * 100.0).astype(np.int64)
        cents.sort()
        n = len(cents)
        for qp in range(10, 100, 10):
            q = qp / 100.0
            est = int(out.loc[qp, "est_cents"])
            true_rank = np.searchsorted(cents, est, side="left")
            bound = 4.0 * n * np.sqrt(q * (1 - q) / QSKETCH_K)
            assert abs(true_rank - q * n) <= bound, (qp, true_rank, q * n, bound)

    def test_bottom_k_merge_is_order_invariant(self):
        """The sketch's merge (concat + re-truncate bottom-K) is a
        semilattice: any split of the input and any merge order yields
        the same sample — the property that makes the result
        bit-identical at any parallelism."""
        from don_crawler_ray.functions.dedup import _mix64

        rng = np.random.default_rng(3)
        hv = (_mix64(rng.integers(0, 1 << 62, 5000).astype(np.uint64))
              ^ np.uint64(1 << 63)).astype(np.int64)
        cents = rng.integers(0, 10**6, 5000)
        K = 256

        def bottom_k(h, c):
            o = np.lexsort((c, h))[:K]
            return h[o], c[o]

        gh, gc = bottom_k(hv, cents)
        for splits in (2, 7, 31):
            parts = [bottom_k(h, c) for h, c in zip(
                np.array_split(hv, splits), np.array_split(cents, splits))]
            mh = np.concatenate([p[0] for p in parts])
            mc = np.concatenate([p[1] for p in parts])
            rh, rc = bottom_k(mh, mc)
            assert (rh == gh).all() and (rc == gc).all()


class TestGopherFilter:
    def test_each_rule_fires(self, ray_session, tmp_path):
        """One doc per failure mode + one clean doc pins each rule."""
        import pyarrow.parquet as pq

        good = "the quick brown fox jumps over the lazy dog " * 8  # 72 words
        docs = [
            good,                                   # keeps
            "the of short",                         # R1: wc < 50
            " ".join(["ab"] * 60) + " the of",      # R2: mean len < 3
            " ".join(["1234"] * 60) + " the of",    # R3: no-alpha words
            " ".join([f"w{i}xyz" for i in range(60)]),  # R4: no stopwords
        ]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": docs,
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        out = _to_pandas(entrymod.queries()["gopher_filter"](str(tmp_path)))
        row = out.iloc[0]
        assert row["n_docs"] == 5
        assert row["n_keep"] == 1
        assert row["n_fail_wordcount"] == 1
        assert row["n_fail_meanlen"] == 1
        assert row["n_fail_alpha"] == 1
        assert row["n_fail_stopwords"] == 1


class TestWarc:
    def test_roundtrip_exact_fidelity(self, ray_session, tmp_path):
        """Record-level fidelity, not just aggregates: every
        (uri, date, payload) survives byte-exactly, including payloads
        containing CRLF blank lines (the record delimiter)."""
        import ray

        from don_crawler_ray.sources.warc import read_warc, write_warc

        rows = {
            "target_uri": [f"https://ex.com/p/{i}" for i in range(57)],
            "warc_date": ["2026-08-18T00:00:00Z"] * 57,
            "payload": [f"body {i}\r\n\r\ntrailer {i}" for i in range(57)],
        }
        ds = ray.data.from_arrow(pa.table(rows)).repartition(4)
        write_warc(ds, str(tmp_path / "w"))
        back = pa.Table.from_pylist(read_warc(str(tmp_path / "w")).take_all())
        assert back.select(list(rows)).sort_by("target_uri").to_pydict() == pa.table(
            rows
        ).sort_by("target_uri").to_pydict()
        # no headers written -> empty maps back
        assert all(h == [] for h in back.column("headers").to_pylist())

    def test_headers_map_roundtrip(self, ray_session, tmp_path):
        """The map<string,string> headers column survives the sink ->
        source path via X-Hdr-* extension fields (keys lowercased —
        HTTP field names are case-insensitive)."""
        import ray

        from don_crawler_ray.sources.warc import read_warc, write_warc

        rows = pa.table(
            {
                "target_uri": pa.array([f"https://ex.com/h/{i}" for i in range(9)]),
                "warc_date": pa.array(["2026-08-18T00:00:00Z"] * 9),
                "payload": pa.array([f"p{i}" for i in range(9)]),
                "headers": pa.array(
                    [[("Content-Language", f"l{i}"), ("x-source", f"s{i}")] for i in range(9)],
                    pa.map_(pa.string(), pa.string()),
                ),
            }
        )
        write_warc(ray.data.from_arrow(rows).repartition(3), str(tmp_path / "w"))
        back = pa.Table.from_pylist(read_warc(str(tmp_path / "w")).take_all())
        back = back.sort_by("target_uri")
        got = {
            u: dict(h)
            for u, h in zip(
                back.column("target_uri").to_pylist(), back.column("headers").to_pylist()
            )
        }
        for i in range(9):
            assert got[f"https://ex.com/h/{i}"] == {
                "content-language": f"l{i}",
                "x-source": f"s{i}",
            }

    def test_header_name_injection_rejected(self):
        from don_crawler_ray.sources.warc import record_bytes

        with pytest.raises(ValueError, match="token-safe"):
            record_bytes(
                "https://x/y", "2026-01-01T00:00:00Z", "p", {"bad: name": "v"}
            )
        with pytest.raises(ValueError, match="CR/LF"):
            record_bytes(
                "https://x/y", "2026-01-01T00:00:00Z", "p", {"ok-name": "v\r\nInjected: yes"}
            )

    def test_record_bytes_deterministic(self):
        from don_crawler_ray.sources.warc import record_bytes

        a = record_bytes("https://x/y", "2026-01-01T00:00:00Z", "hello")
        b = record_bytes("https://x/y", "2026-01-01T00:00:00Z", "hello")
        assert a == b
        # extracted-text payloads write as `resource` records: that is
        # the ISO 28500 pairing that keeps Content-Type: text/plain valid
        assert b"WARC-Type: resource" in a
        assert b"Content-Length: 5" in a

    def test_crawl_output_to_warc(self, ray_session, tmp_path):
        """The flagship pipeline's output writes as WARC and reads
        back with matching row count — the crawl -> archive hand-off."""
        import pyarrow.compute as pc

        import __ray_entry__ as e
        from don_crawler_ray.sources.warc import read_warc, write_warc

        ds = e.entry()
        n = ds.count()

        def to_rec(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "target_uri": batch.column("canonical_url"),
                    "warc_date": pc.strftime(batch.column("warc_ts"), format="%Y-%m-%dT%H:%M:%SZ"),
                    "payload": batch.column("text"),
                }
            )

        write_warc(ds.map_batches(to_rec, batch_format="pyarrow"), str(tmp_path / "w"))
        assert read_warc(str(tmp_path / "w")).count() == n


class TestWarcProperties:
    def test_parse_roundtrip_hypothesis(self):
        """Any unicode payload — including CRLFs, WARC/1.0 banners and
        header-shaped text — survives record encode/parse, because the
        parser walks by Content-Length, never by delimiter scan."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from don_crawler_ray.sources.warc import (
            batch_to_warc_bytes,
            parse_warc_stream,
        )

        payload = st.text(max_size=200)
        uri = st.from_regex(r"https://[a-z]{1,10}\.example/[A-Za-z0-9/_-]{0,20}", fullmatch=True)

        @settings(max_examples=60, deadline=None)
        @given(st.lists(st.tuples(uri, payload), min_size=0, max_size=8))
        def check(rows):
            t = pa.table(
                {
                    "target_uri": pa.array([r[0] for r in rows], pa.string()),
                    "warc_date": pa.array(["2026-01-01T00:00:00Z"] * len(rows), pa.string()),
                    "payload": pa.array([r[1] for r in rows], pa.string()),
                }
            )
            back = parse_warc_stream(batch_to_warc_bytes(t))
            assert back.column("target_uri").to_pylist() == t.column("target_uri").to_pylist()
            assert back.column("payload").to_pylist() == t.column("payload").to_pylist()

        check()


class TestWarcRobustness:
    def test_foreign_record_types_skipped(self, ray_session, tmp_path):
        """Real WARCs lead with warcinfo and interleave request
        records — the reader skips them and keeps responses."""
        from don_crawler_ray.sources.warc import read_warc, record_bytes

        warcinfo = (
            b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\ninfo\r\n\r\n"
        )
        request = (
            b"WARC/1.0\r\nWARC-Type: request\r\n"
            b"WARC-Target-URI: https://x/a\r\nContent-Length: 3\r\n\r\nGET\r\n\r\n"
        )
        resp = record_bytes("https://x/a", "2026-01-01T00:00:00Z", "hello")
        (tmp_path / "f.warc").write_bytes(warcinfo + request + resp)
        out = pa.Table.from_pylist(read_warc(str(tmp_path / "f.warc")).take_all())
        assert out.num_rows == 1
        assert out.column("payload").to_pylist() == ["hello"]

    def test_truncated_payload_raises(self):
        from don_crawler_ray.sources.warc import iter_warc_records, record_bytes

        data = record_bytes("https://x/a", "2026-01-01T00:00:00Z", "hello world")
        with pytest.raises(ValueError, match="truncated WARC payload"):
            list(iter_warc_records([data[:-15]]))

    def test_missing_content_length_raises(self):
        from don_crawler_ray.sources.warc import iter_warc_records

        bad = b"WARC/1.0\r\nWARC-Type: response\r\n\r\n"
        with pytest.raises(ValueError, match="Content-Length"):
            list(iter_warc_records([bad]))

    def test_header_injection_rejected(self):
        from don_crawler_ray.sources.warc import record_bytes

        with pytest.raises(ValueError, match="CR/LF"):
            record_bytes("https://x/a\r\nContent-Length: 0", "2026-01-01", "p")
        with pytest.raises(ValueError, match="null"):
            record_bytes("https://x/a", "2026-01-01", None)

    def test_chunked_parse_matches_whole(self):
        """Record boundaries falling across chunk reads parse
        identically to a single-buffer parse."""
        from don_crawler_ray.sources.warc import (
            iter_warc_records,
            record_bytes,
        )

        data = b"".join(
            record_bytes(f"https://x/{i}", "2026-01-01T00:00:00Z", "p" * i)
            for i in range(40)
        )
        whole = [(f, p) for f, p in iter_warc_records([data])]
        for sz in (1, 7, 64, 1000):
            chunked = [
                (f, p)
                for f, p in iter_warc_records(
                    data[i : i + sz] for i in range(0, len(data), sz)
                )
            ]
            assert chunked == whole


class TestCombineTreeBounds:
    def test_chained_combiners_bound_candidate_rows(self, ray_session):
        """The bounded-driver-merge doctrine, functionally: feeding
        many tiny bottom-K partials through the two chained combine
        levels must (a) leave the exact global bottom-K reachable and
        (b) shrink the row count to at most K per output batch —
        not K x blocks."""
        import ray

        from don_crawler_ray.functions.dedup import _mix64
        from don_crawler_ray.pipelines.queries import _COMBINE_BATCH

        K = 64
        rng = np.random.default_rng(11)
        hv = (_mix64(rng.integers(0, 1 << 62, 20_000).astype(np.uint64))
              ^ np.uint64(1 << 63)).astype(np.int64)
        cents = rng.integers(0, 10**6, 20_000)

        def bottom_k(h, c):
            o = np.lexsort((c, h))[:K]
            return h[o], c[o]

        # 200 tiny partial blocks of K rows each
        parts = []
        for h, c in zip(np.array_split(hv, 200), np.array_split(cents, 200)):
            ph, pc_ = bottom_k(h, c)
            parts.append(pa.table({"hv": pa.array(ph, pa.int64()),
                                   "cents": pa.array(pc_, pa.int64())}))
        ds = ray.data.from_arrow(parts)

        def combine(batch: pa.Table) -> pa.Table:
            h = batch.column("hv").to_numpy(zero_copy_only=False)
            c = batch.column("cents").to_numpy(zero_copy_only=False)
            o = np.lexsort((c, h))[:K]
            return pa.table({"hv": pa.array(h[o], pa.int64()),
                             "cents": pa.array(c[o], pa.int64())})

        out = (
            ds.map_batches(combine, batch_format="pyarrow", batch_size=_COMBINE_BATCH)
            .map_batches(combine, batch_format="pyarrow", batch_size=_COMBINE_BATCH)
            .take_all()
        )
        # (b) bounded: 200 blocks x K = 12,800 flat rows collapse to <= K
        # per surviving batch (one here, since everything fits one batch)
        assert len(out) <= K
        # (a) exact: the global bottom-K survives the tree untouched
        gh, gc = bottom_k(hv, cents)
        oh = np.array(sorted((r["hv"], r["cents"]) for r in out))
        ge = np.array(sorted(zip(gh.tolist(), gc.tolist())))
        assert (oh == ge).all()


class TestCurationOps:
    """Invariants of the round-5 curation trio beyond the generic
    oracle gate (which already pins exact values at sf0.001)."""

    def test_semdedup_first_wins_brute_force(self, ray_session):
        """Per cluster, kept == greedy 'no lower-id member within
        threshold' recomputed by brute force on the driver."""
        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import QUERIES, _emb_matrix

        out = QUERIES["semdedup"](SF_DIR).to_pandas()
        emb = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
        m = _emb_matrix(emb.column("embedding"))
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        by_id = dict(zip(emb.column("vec_id").to_pylist(), m))
        for _, grp in out.groupby("cid"):
            grp = grp.sort_values("vec_id")
            ids = grp.vec_id.to_numpy()
            g = np.stack([by_id[i] for i in ids])
            sims = g @ g.T
            expect = ~np.tril(sims >= 0.40, k=-1).any(axis=1)
            assert (grp.kept.to_numpy() == expect).all()

    def test_ccnet_terciles_balanced_and_ordered(self, ray_session):
        """Within each language: tercile sizes follow the ntile rule and
        bucket boundaries respect the (nll_e6, doc_id) order."""
        from don_crawler_ray.pipelines.queries import QUERIES

        out = QUERIES["ccnet_ppl_buckets"](SF_DIR).to_pandas()
        assert set(out.bucket.unique()) <= {1, 2, 3}
        for _, grp in out.groupby("lang"):
            n = len(grp)
            sizes = grp.bucket.value_counts().sort_index().to_numpy()
            expect = [n // 3 + (1 if i < n % 3 else 0) for i in range(3)]
            assert sizes.tolist() == [s for s in expect if s > 0]
            g = grp.sort_values(["nll_e6", "doc_id"])
            assert (np.diff(g.bucket.to_numpy()) >= 0).all()

    def test_dsir_target_language_scores_highest(self, ray_session):
        """The importance weight must actually select for the target
        domain: mean log-weight of lang='en' strictly exceeds every
        other language's mean (the paper's sanity check)."""
        from don_crawler_ray.pipelines.queries import DSIR_TARGET_LANG, QUERIES

        out = QUERIES["dsir_weights"](SF_DIR).to_pandas()
        means = out.groupby("lang").logw_e6.mean()
        tgt = means[DSIR_TARGET_LANG]
        assert (means.drop(DSIR_TARGET_LANG) < tgt).all()


class TestParagraphDedupMixture:
    """Invariants of the session-3 additions beyond the generic oracle
    gate (which already pins exact values at sf0.001)."""

    def test_paragraph_dedup_segments_globally_unique(self, ray_session):
        """Re-splitting every rebuilt doc into PARA_SEG_TOKENS-token
        chunks must reproduce the kept segments exactly once
        corpus-wide (each interior segment is a full K-token chunk and
        only a doc's last segment can be short, so the re-split is
        boundary-exact)."""
        from don_crawler_ray.pipelines.queries import PARA_SEG_TOKENS, QUERIES

        out = QUERIES["paragraph_dedup"](SF_DIR).to_pandas()
        seen: set[str] = set()
        k = PARA_SEG_TOKENS
        for _, row in out.iterrows():
            toks = row.text.split()
            segs = [" ".join(toks[i : i + k]) for i in range(0, len(toks), k)]
            assert len(segs) == row.n_kept
            for s in segs:
                assert s not in seen, f"segment kept twice: {s!r}"
                seen.add(s)

    def test_paragraph_dedup_min_doc_survives_whole(self, ray_session):
        """The minimum doc_id is the first corpus-wide occurrence of all
        its segments, so it must survive byte-identical (modulo the
        single-space normalization both sides apply)."""
        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import QUERIES

        out = QUERIES["paragraph_dedup"](SF_DIR).to_pandas().set_index("doc_id")
        docs = pq.read_table(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
        ).to_pandas().set_index("doc_id")
        first = docs.index.min()
        assert " ".join(docs.loc[first, "text"].split()) == out.loc[first, "text"]

    def test_paragraph_dedup_duplicate_doc_vanishes(self, ray_session, tmp_path):
        """A corpus where doc B repeats doc A's text verbatim must drop
        B entirely (every segment of B was seen at A)."""
        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import QUERIES

        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "a b c d e f g h i j",
                        "a b c d e f g h i j",
                        "z z2 z3 a b c d e f g h i j",
                    ]
                ),
            }
        )
        pq.write_table(t, tmp_path / "documents.parquet")
        out = QUERIES["paragraph_dedup"](str(tmp_path)).to_pandas().set_index("doc_id")
        assert 2 not in out.index  # fully shadowed by doc 1
        # doc 3: its first segment ('z z2 z3 a b c d e') is novel; its
        # tail ('f g h i j') differs from doc 1's chunking, so survives
        assert out.loc[3, "n_kept"] == 2
        assert out.loc[1, "text"] == "a b c d e f g h i j"

    def test_mixture_sample_respects_weights(self, ray_session):
        """Over-weighted sources keep everything (rate clamps at 1);
        every source's kept count is <= its total (sampling never
        upsamples); kept rows reproduce the deterministic coin."""
        import pyarrow.parquet as pq

        from don_crawler_ray.functions.dedup import _mix64
        from don_crawler_ray.pipelines.queries import MIXTURE_WEIGHTS, QUERIES

        out = QUERIES["mixture_sample"](SF_DIR).to_pandas()
        docs = pq.read_table(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "source"]
        ).to_pandas()
        totals = docs.groupby("source").size()
        kept = out.groupby("source").size()
        for s in MIXTURE_WEIGHTS:
            assert kept.get(s, 0) == totals[s], f"{s} should keep all docs"
        assert (kept <= totals[kept.index]).all()
        assert out.doc_id.is_unique
        # keep rule is "coin(doc_id) < thr_s", so within every source
        # the kept coins sit strictly below every dropped coin
        merged = docs.merge(out[["doc_id"]], on="doc_id", how="left", indicator=True)
        for _s, grp in merged.groupby("source"):
            k = (grp._merge == "both").to_numpy()
            if k.any() and (~k).any():
                c = _mix64(grp.doc_id.to_numpy().astype(np.uint64)) % np.uint64(
                    1_000_000
                )
                assert c[k].max() < c[~k].min()


class TestEmbeddingOutliers:
    def test_flags_match_brute_force(self, ray_session):
        """Distances and flags recomputed on the driver from the raw
        parquet (numpy, same e6 rounding) must agree exactly."""
        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import QUERIES, _emb_matrix

        out = (
            QUERIES["embedding_outliers"](SF_DIR)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        emb = pq.read_table(f"{SF_DIR}/embeddings.parquet")
        m = _emb_matrix(emb.column("embedding"))
        lbl = emb.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        vid = emb.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(vid)
        m, lbl, vid = m[order], lbl[order], vid[order]
        assert (out.vec_id.to_numpy() == vid).all()
        for label in np.unique(lbl):
            sel = lbl == label
            c = m[sel].mean(axis=0)
            d2 = ((m[sel] - c) ** 2).sum(axis=1)
            e6 = np.rint(d2 * 1e6).astype(np.int64)
            got = out[out.label == label]
            assert (got.dist2_e6.to_numpy() == e6).all()
            # top n//20 by (dist2 DESC, vec_id ASC) are the outliers
            k = len(e6) // 20
            order = np.lexsort((vid[sel], -e6))
            expect = np.zeros(len(e6), bool)
            expect[order[:k]] = True
            assert (got.is_outlier.to_numpy().astype(bool) == expect).all()
            assert got.is_outlier.sum() == k
        # the 5%-per-label rule fires without dominating
        frac = out.is_outlier.mean()
        assert 0 < frac < 0.1


class TestNeardupKeepBest:
    def test_one_winner_per_cluster_and_argmax(self, ray_session):
        from don_crawler_ray.pipelines.queries import QUERIES

        out = QUERIES["neardup_keep_best"](SF_DIR).to_pandas()
        clus = QUERIES["dedup_clusters"](SF_DIR).to_pandas()
        # same component assignment as dedup_clusters
        assert (
            out.sort_values("doc_id").rep.to_numpy()
            == clus.sort_values("doc_id").rep.to_numpy()
        ).all()
        for rep, grp in out.groupby("rep"):
            assert grp.kept.sum() == 1, f"cluster {rep}"
            g = grp.sort_values(["n_chars", "doc_id"], ascending=[False, True])
            assert g.iloc[0].kept == 1
        # singletons keep themselves
        sizes = out.groupby("rep").size()
        singles = out[out.rep.isin(sizes[sizes == 1].index)]
        assert (singles.kept == 1).all()
        assert (singles.rep == singles.doc_id).all()


class TestLshKnnOov:
    """Invariants of the session-4 additions (SRP-LSH ANN, kNN label
    voting, OOV rate) beyond the generic oracle gate."""

    def test_lsh_hits_actually_collide_and_scores_exact(self, ray_session):
        """Every returned (query, vec) pair collides in band1 OR band2,
        the self-hit sits at rank 0 with score 1.0, and each quantized
        score equals the brute-force cosine."""
        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import (
            QUERIES,
            _emb_matrix,
            _srp_bands,
            _srp_planes,
        )

        out = QUERIES["lsh_ann_topk"](SF_DIR).to_pandas()
        emb = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
        ids = np.asarray(emb.column("vec_id").to_pylist(), np.int64)
        mat = _emb_matrix(emb.column("embedding"))
        b1, b2 = _srp_bands(mat, _srp_planes(mat.shape[1]))
        mn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        pos = {int(v): i for i, v in enumerate(ids)}
        for row in out.itertuples():
            qi, vi = pos[row.query_id], pos[row.vec_id]
            assert b1[qi] == b1[vi] or b2[qi] == b2[vi]
            assert row.score_e6 == int(np.rint(float(mn[vi] @ mn[qi]) * 1e6))
        rank0 = out[out["rank"] == 0]
        assert (rank0.vec_id.to_numpy() == rank0.query_id.to_numpy()).all()
        assert (rank0.score_e6.to_numpy() == 1_000_000).all()
        for _, grp in out.groupby("query_id"):
            g = grp.sort_values("rank")
            assert (np.diff(g.score_e6.to_numpy()) <= 0).all()

    def test_lsh_is_subset_of_brute_force_candidates(self, ray_session):
        """LSH top-10 scores can never beat the brute-force top-10 at
        the same rank (the candidate set is a subset of the corpus)."""
        from don_crawler_ray.pipelines.queries import QUERIES

        lsh = QUERIES["lsh_ann_topk"](SF_DIR).to_pandas()
        full = QUERIES["ann_topk"](SF_DIR).to_pandas()
        for qid in lsh.query_id.unique():
            ls = lsh[lsh.query_id == qid].sort_values("rank").score_e6.to_numpy()
            fs = full[full.query_id == qid].sort_values("rank").score_e6.to_numpy()
            assert (ls <= fs[: len(ls)] + 1).all()  # +1 for e6 rounding

    def test_knn_majority_matches_brute_force(self, ray_session):
        """pred_label == majority label of the true 10 nearest
        neighbours (self excluded), recomputed on the driver."""
        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import QUERIES, _emb_matrix

        out = QUERIES["knn_classify"](SF_DIR).to_pandas()
        emb = pq.read_table(f"{SF_DIR}/embeddings.parquet")
        ids = np.asarray(emb.column("vec_id").to_pylist(), np.int64)
        labels = np.asarray(emb.column("label").to_pylist(), np.int64)
        mat = _emb_matrix(emb.column("embedding"))
        mn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        assert len(out) == 5
        for row in out.itertuples():
            qi = int(np.flatnonzero(ids == row.query_id)[0])
            s = mn @ mn[qi]
            m = np.flatnonzero(ids != row.query_id)
            order = m[np.lexsort((ids[m], -s[m]))[:10]]
            uniq, counts = np.unique(labels[order], return_counts=True)
            best = np.lexsort((uniq, -counts))[0]
            assert row.pred_label == uniq[best]
            assert row.votes == counts[best]
            assert row.true_label == labels[qi]

    def test_oov_rate_bounds_and_totals(self, ray_session):
        """n_oov <= n_tok per doc; corpus token total matches a driver
        recount; permille is exact floor division; and the one rare
        token ('dup'-class, freq < 0.2%) is the only OOV source."""
        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import OOV_VOCAB_DENOM, QUERIES

        out = QUERIES["oov_rate"](SF_DIR).to_pandas()
        assert (out.n_oov <= out.n_tok).all()
        assert (out.oov_permille == (out.n_oov * 1000) // out.n_tok).all()

        docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        import collections

        c: collections.Counter = collections.Counter()
        texts = dict(zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()))
        for t in texts.values():
            c.update(t.split())
        grand = sum(c.values())
        assert out.n_tok.sum() == grand
        vocab = {t for t, n in c.items() if n * OOV_VOCAB_DENOM >= grand}
        by_id = out.set_index("doc_id")
        for doc_id, text in list(texts.items())[:50]:
            toks = text.split()
            if not toks:
                assert doc_id not in by_id.index
                continue
            expect = sum(1 for t in toks if t not in vocab)
            assert by_id.loc[doc_id, "n_oov"] == expect


class TestFasttextStreaksBm25:
    """Invariants of the hashed-linear classifier, streaks, and BM25
    operators beyond the generic oracle gate."""

    def test_fasttext_score_recomputed(self, ray_session):
        import pyarrow.parquet as pq

        from don_crawler_ray.functions.dedup import _mix64, fnv1a64
        from don_crawler_ray.pipelines.queries import (
            FASTTEXT_BUCKETS,
            FASTTEXT_WMOD,
            QUERIES,
        )

        out = QUERIES["fasttext_quality"](SF_DIR).to_pandas().set_index("doc_id")
        docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        texts = dict(zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()))
        assert len(out) == len(texts)
        for doc_id, text in list(texts.items())[:40]:
            toks = text.split()
            score = 0
            for a, b in zip(toks, toks[1:]):
                bucket = fnv1a64(f"{a} {b} ") % FASTTEXT_BUCKETS
                w = int(_mix64(np.array([bucket], np.uint64))[0] % np.uint64(FASTTEXT_WMOD)) - 8
                score += w
            row = out.loc[doc_id]
            assert row.score == score
            assert row.n_bigrams == max(0, len(toks) - 1)
            assert row.label == (1 if score > 0 else 0)

    def test_user_streaks_recomputed(self, ray_session):
        import pandas as pd
        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import QUERIES

        out = QUERIES["user_streaks"](SF_DIR).to_pandas().set_index("user_id")
        ev = pq.read_table(f"{SF_DIR}/events.parquet", columns=["user_id", "ts"]).to_pandas()
        ev["day"] = (ev.ts.values.astype("datetime64[D]").astype(np.int64))
        assert (out.longest_streak <= out.active_days).all()
        assert (out.n_streaks >= 1).all()
        for uid, grp in list(ev.groupby("user_id"))[:40]:
            days = np.unique(grp.day.to_numpy())
            runs = np.split(days, np.flatnonzero(np.diff(days) != 1) + 1)
            row = out.loc[uid]
            assert row.active_days == len(days)
            assert row.longest_streak == max(len(r) for r in runs)
            assert row.n_streaks == len(runs)

    def test_bm25_terms_and_scores(self, ray_session):
        import collections

        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import BM25_B, BM25_K1, QUERIES

        out = QUERIES["bm25_topk"](SF_DIR).to_pandas()
        docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        texts = docs.column("text").to_pylist()
        n_docs = len(texts)
        df: collections.Counter = collections.Counter()
        grand = 0
        for t in texts:
            toks = t.split()
            grand += len(toks)
            df.update(set(toks))
        top5 = sorted(df, key=lambda k: (-df[k], k))[:5]
        assert sorted(out.term.unique()) == sorted(top5)
        avgdl = grand / n_docs
        dls = {int(i): len(t.split()) for i, t in zip(docs.column("doc_id").to_pylist(), texts)}
        tfs = {
            int(i): collections.Counter(t.split())
            for i, t in zip(docs.column("doc_id").to_pylist(), texts)
        }
        for row in out.itertuples():
            tf = tfs[row.doc_id][row.term]
            assert tf == row.tf and dls[row.doc_id] == row.dl and df[row.term] == row.df
            idf = (n_docs - row.df + 0.5) / (row.df + 0.5)
            s = (idf * (tf * (BM25_K1 + 1.0))) / (
                tf + BM25_K1 * ((1.0 - BM25_B) + BM25_B * (row.dl / avgdl))
            )
            assert row.score_e6 == int(np.rint(s * 1e6))
        for _, grp in out.groupby("term"):
            g = grp.sort_values("rank")
            assert (np.diff(g.score_e6.to_numpy()) <= 0).all()
            assert list(g["rank"]) == list(range(len(g)))


class TestTrianglesTempMix:
    """Invariants of triangle counting and the temperature mixture."""

    def test_triangles_match_driver_recount(self, ray_session):
        import itertools

        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import QUERIES

        out = QUERIES["triangle_count"](SF_DIR).to_pandas().set_index("node")
        li = pq.read_table(
            f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
        ).to_pandas()
        edges = set()
        for _, grp in li.groupby("l_orderkey"):
            for a, b in itertools.combinations(sorted(set(grp.l_partkey)), 2):
                edges.add((a, b))
        adj: dict[int, set] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        assert len(out) == len(adj)
        tri = dict.fromkeys(adj, 0)
        for a, b in edges:
            for c in adj[a] & adj[b]:
                if c > b:  # a<b<c counted once, voted at all three
                    tri[a] += 1
                    tri[b] += 1
                    tri[c] += 1
        for node, nbrs in adj.items():
            row = out.loc[node]
            assert row.degree == len(nbrs)
            assert row.triangles == tri[node]
            d = len(nbrs)
            expect = (2000 * tri[node]) // (d * (d - 1)) if d >= 2 else 0
            assert row.lcc_permille == expect

    def test_triangle_totals_consistent(self, ray_session):
        from don_crawler_ray.pipelines.queries import QUERIES

        out = QUERIES["triangle_count"](SF_DIR).to_pandas()
        # every triangle votes at exactly 3 vertices
        assert out.triangles.sum() % 3 == 0
        assert (out.lcc_permille <= 1000).all()
        assert (out.lcc_permille >= 0).all()

    def test_temperature_mix_upsamples_tail(self, ray_session):
        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import TEMPMIX_BUDGET, QUERIES

        out = QUERIES["temperature_mix"](SF_DIR).to_pandas().sort_values("n_docs")
        docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["lang"])
        n_total = docs.num_rows
        assert out.n_docs.sum() == n_total
        assert abs(out.p.sum() - 1.0) < 1e-12
        assert out.alloc.sum() <= TEMPMIX_BUDGET
        # alpha<1 flattens the distribution: sampled share > corpus share
        # for the rarest lang, < for the most common (when they differ)
        lo, hi = out.iloc[0], out.iloc[-1]
        if lo.n_docs < hi.n_docs:
            assert lo.p > lo.n_docs / n_total
            assert hi.p < hi.n_docs / n_total
        # monotone: more docs never gets a smaller share
        assert (np.diff(out.p.to_numpy()) >= 0).all()


class TestLangidNgram:
    def test_argmax_matches_driver_recount(self, ray_session):
        import collections

        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import LANGID_SCALE, QUERIES

        out = QUERIES["langid_ngram"](SF_DIR).to_pandas().set_index("doc_id")
        docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text", "lang"])
        ids = docs.column("doc_id").to_pylist()
        texts = docs.column("text").to_pylist()
        langs_col = docs.column("lang").to_pylist()
        assert len(out) == len(ids)
        # train profiles exactly as the operator defines them
        counts: dict = collections.defaultdict(collections.Counter)
        for t, l in zip(texts, langs_col):
            counts[l].update(t[i : i + 2] for i in range(len(t) - 1))
        langs = sorted(counts)
        w = {
            l: {g: (n * LANGID_SCALE) // sum(c.values()) for g, n in c.items()}
            for l, c in ((l, counts[l]) for l in langs)
        }
        n_correct = 0
        for doc_id, t, true in list(zip(ids, texts, langs_col))[:60]:
            bg = collections.Counter(t[i : i + 2] for i in range(len(t) - 1))
            scores = [
                (sum(c * w[l].get(g, 0) for g, c in bg.items()), l) for l in langs
            ]
            best = max(scores, key=lambda x: (x[0], [-ord(ch) for ch in x[1]]))
            row = out.loc[doc_id]
            assert row.best_score == best[0]
            assert row.pred_lang == best[1]
            assert row.correct == (1 if best[1] == true else 0)
            n_correct += int(row.correct)
        # sanity: correct column is 0/1
        assert set(out.correct.unique()) <= {0, 1}


class TestDomainCap:
    def test_cap_keeps_smallest_doc_ids(self, ray_session):
        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import DOMAIN_CAP, QUERIES

        out = QUERIES["domain_cap"](SF_DIR).to_pandas()
        docs = pq.read_table(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "source"]
        ).to_pandas()
        sizes = out.groupby("source").size()
        assert (sizes <= DOMAIN_CAP).all()
        for src, grp in out.groupby("source"):
            want = sorted(docs.loc[docs.source == src, "doc_id"])[:DOMAIN_CAP]
            got = grp.sort_values("rk")
            assert got.doc_id.tolist() == want
            assert got.rk.tolist() == list(range(len(want)))


class TestKlDomainWeights:
    def test_kl_matches_recount_and_is_nonnegative(self, ray_session):
        import collections
        import math

        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import QUERIES

        out = QUERIES["kl_domain_weights"](SF_DIR).to_pandas().set_index("source")
        docs = pq.read_table(
            f"{SF_DIR}/documents.parquet", columns=["source", "text"]
        ).to_pandas()
        per_src: dict = collections.defaultdict(collections.Counter)
        for src, txt in zip(docs.source, docs.text):
            per_src[src].update(txt.split())
        corpus: collections.Counter = collections.Counter()
        for c in per_src.values():
            corpus.update(c)
        grand = sum(corpus.values())
        assert int(out.n_tok.sum()) == grand
        # KL >= 0 up to the e6 rounding grid
        assert (out.kl_e6 >= -1).all()
        for src, c in per_src.items():
            n_s = sum(c.values())
            kl = sum(
                (cnt / n_s) * math.log((cnt / n_s) / (corpus[t] / grand))
                for t, cnt in c.items()
            )
            row = out.loc[src]
            assert row.n_types == len(c)
            assert abs(row.kl_e6 - kl * 1e6) <= 1.0


class TestDocEntropy:
    def test_entropy_and_ttr_match_recount(self, ray_session):
        import collections
        import math

        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import QUERIES

        out = QUERIES["doc_entropy"](SF_DIR).to_pandas().set_index("doc_id")
        docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        ids = docs.column("doc_id").to_pylist()
        texts = docs.column("text").to_pylist()
        assert len(out) == len(ids)
        for doc_id, t in list(zip(ids, texts))[:80]:
            toks = t.split()
            c = collections.Counter(toks)
            n = len(toks)
            h = math.log(n) - sum(v * math.log(v) for v in c.values()) / n
            row = out.loc[doc_id]
            assert row.n_tok == n
            assert row.n_distinct == len(c)
            assert row.ttr_permille == (len(c) * 1000) // n
            assert abs(row.entropy_e6 - h * 1e6) <= 1.0
            # 0 <= H <= ln(n_distinct)
            assert -1 <= row.entropy_e6 <= math.log(len(c)) * 1e6 + 1


class TestMarkovTransitions:
    def test_counts_match_pandas_shift(self, ray_session):
        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import QUERIES

        out = QUERIES["markov_transitions"](SF_DIR).to_pandas()
        ev = (
            pq.read_table(
                f"{SF_DIR}/events.parquet",
                columns=["user_id", "ts", "event_id", "event_type"],
            )
            .to_pandas()
            .sort_values(["user_id", "ts", "event_id"])
        )
        prev = ev.groupby("user_id").event_type.shift(1)
        pairs = (
            ev.assign(prev_type=prev)
            .dropna(subset=["prev_type"])
            .groupby(["prev_type", "event_type"])
            .size()
        )
        got = out.set_index(["prev_type", "next_type"]).n
        assert got.sort_index().tolist() == pairs.sort_index().tolist()
        assert set(got.index) == set(pairs.index)
        # per-prev probabilities sum to 1e6 up to floor losses
        for _, grp in out.groupby("prev_type"):
            s = grp.p_e6.sum()
            assert 1_000_000 - len(grp) < s <= 1_000_000


class TestWindowCooccur:
    def test_counts_match_window_recount(self, ray_session):
        import collections

        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import (
            COOCCUR_MIN,
            WINDOW_W,
            QUERIES,
        )

        out = QUERIES["window_cooccur"](SF_DIR).to_pandas()
        texts = (
            pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])
            .column("text")
            .to_pylist()
        )
        c: collections.Counter = collections.Counter()
        for t in texts:
            toks = t.split()
            for d in range(1, WINDOW_W + 1):
                c.update(zip(toks, toks[d:]))
        want = {k: v for k, v in c.items() if v >= COOCCUR_MIN}
        got = {(r.w1, r.w2): r.cnt for r in out.itertuples()}
        assert got == want


class TestDocRarityFloor:
    def test_min_freq_and_argmin_token(self, ray_session):
        import collections

        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import QUERIES

        out = QUERIES["doc_rarity_floor"](SF_DIR).to_pandas().set_index("doc_id")
        docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        ids = docs.column("doc_id").to_pylist()
        texts = docs.column("text").to_pylist()
        corpus: collections.Counter = collections.Counter()
        for t in texts:
            corpus.update(t.split())
        assert len(out) == sum(1 for t in texts if t.split())
        for doc_id, t in zip(ids, texts):
            toks = set(t.split())
            if not toks:
                continue
            cnt, tok = min((corpus[x], x) for x in toks)
            row = out.loc[doc_id]
            assert row.rare_cnt == cnt
            assert row.rare_tok == tok


class TestDecayScores:
    def test_integer_halving_weights(self, ray_session):
        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import DECAY_MAX_WEEKS, QUERIES

        out = QUERIES["decay_scores"](SF_DIR).to_pandas().set_index("user_id")
        ev = pq.read_table(
            f"{SF_DIR}/events.parquet", columns=["ts", "user_id"]
        ).to_pandas()
        day = (ev.ts.astype("int64") // 1_000_000) // 86_400
        max_day = int(day.max())
        weeks = ((max_day - day) // 7).clip(upper=DECAY_MAX_WEEKS)
        w = np.right_shift(128, weeks.to_numpy().astype(np.int64))
        w = pd.Series(w, index=ev.index)
        want = w.groupby(ev.user_id).sum()
        assert len(out) == len(want)
        for uid, s in want.items():
            assert out.loc[uid].score == s
        # weights live on the exact halving grid
        assert set(np.unique(w)) <= {128 >> i for i in range(DECAY_MAX_WEEKS + 1)}


class TestQ5LocalSupplier:
    def test_matches_pandas_recompute(self, ray_session):
        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import QUERIES, Q5_REGION

        out = QUERIES["q5_local_supplier"](SF_DIR).to_pandas()
        cust = pq.read_table(f"{SF_DIR}/customer.parquet").to_pandas()
        orders = pq.read_table(f"{SF_DIR}/orders.parquet").to_pandas()
        li = pq.read_table(f"{SF_DIR}/lineitem.parquet").to_pandas()
        supp = pq.read_table(f"{SF_DIR}/supplier.parquet").to_pandas()
        nat = pq.read_table(f"{SF_DIR}/nation.parquet").to_pandas()
        reg = pq.read_table(f"{SF_DIR}/region.parquet").to_pandas()
        rk = reg.loc[reg.r_name == Q5_REGION, "r_regionkey"].iloc[0]
        nat = nat[nat.n_regionkey == rk]
        o = orders[
            (orders.o_orderdate >= "1997-01-01") & (orders.o_orderdate < "1999-01-01")
        ]
        j = (
            li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
            .merge(cust, left_on="o_custkey", right_on="c_custkey")
            .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
            .merge(nat, left_on="s_nationkey", right_on="n_nationkey")
        )
        j = j[j.c_nationkey == j.s_nationkey]
        rev = (
            (j.l_extendedprice * 100.0).round().astype("int64")
            * (100 - (j.l_discount * 100.0).round().astype("int64"))
        )
        want = rev.groupby(j.n_name).sum().sort_values(ascending=False)
        got = out.set_index("n_name").revenue_e4
        assert got.to_dict() == want.to_dict()
        # output is sorted by revenue desc then name
        assert list(out.revenue_e4) == sorted(out.revenue_e4, reverse=True)


class TestNgramNovelty:
    def test_ownership_and_permille_grid(self, ray_session):
        import collections

        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import QUERIES

        out = QUERIES["ngram_novelty"](SF_DIR).to_pandas().set_index("doc_id")
        docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        ids = docs.column("doc_id").to_pylist()
        texts = docs.column("text").to_pylist()
        owner: dict = {}
        per_doc: dict = {}
        for doc_id, t in sorted(zip(ids, texts)):
            toks = t.split()
            bgs = set(zip(toks, toks[1:]))
            per_doc[doc_id] = bgs
            for b in bgs:
                owner.setdefault(b, doc_id)
        n_docs_with_bg = sum(1 for b in per_doc.values() if b)
        assert len(out) == n_docs_with_bg
        for doc_id, bgs in per_doc.items():
            if not bgs:
                continue
            n_owned = sum(1 for b in bgs if owner[b] == doc_id)
            row = out.loc[doc_id]
            assert row.n_bg == len(bgs)
            assert row.n_owned == n_owned
            assert row.novelty_permille == n_owned * 1000 // len(bgs)
        # every bigram has exactly one owner: owned sums to distinct bigrams
        assert int(out.n_owned.sum()) == len(owner)


class TestContainmentPairs:
    def test_containment_matches_bruteforce(self, ray_session):
        import pyarrow.parquet as pq

        from don_crawler_ray.functions.dedup import word_ngrams
        from don_crawler_ray.pipelines.queries import (
            JACCARD_NGRAM,
            JACCARD_TAU,
            QUERIES,
        )

        out = QUERIES["containment_pairs"](SF_DIR).to_pandas()
        docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        sets = {
            d: set(word_ngrams(t, JACCARD_NGRAM))
            for d, t in zip(
                docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
            )
            if len(t.split()) >= JACCARD_NGRAM
        }
        ids = sorted(sets)
        want = {}
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                inter = len(sets[a] & sets[b])
                union = len(sets[a]) + len(sets[b]) - inter
                if union and inter / union >= JACCARD_TAU:
                    want[(a, b)] = (inter, len(sets[a]), len(sets[b]))
        got = {
            (r.a, r.b): (r.inter, r.na, r.nb) for r in out.itertuples()
        }
        assert got == want
        for r in out.itertuples():
            assert r.cont_a_permille == r.inter * 1000 // max(r.na, 1)
            assert r.cont_b_permille == r.inter * 1000 // max(r.nb, 1)
            # containment >= jaccard always (inter/|A| >= inter/union)
            assert r.cont_a_permille >= 500 or r.cont_b_permille >= 500


class TestWinsorizeValues:
    def test_clip_bounds_and_sums(self, ray_session):
        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import QUERIES

        out = QUERIES["winsorize_values"](SF_DIR).to_pandas().set_index("event_type")
        ev = pq.read_table(
            f"{SF_DIR}/events.parquet", columns=["event_type", "value"]
        ).to_pandas()
        cents = (ev.value * 100.0).round().astype("int64")
        for et, grp in cents.groupby(ev.event_type):
            v = np.sort(grp.to_numpy())
            n = len(v)
            lo = v[(5 * n + 99) // 100 - 1]
            hi = v[(95 * n + 99) // 100 - 1]
            row = out.loc[et]
            assert row.n == n
            assert row.lo_e2 == lo
            assert row.hi_e2 == hi
            assert row.sum_clipped_e2 == int(np.clip(v, lo, hi).sum())
            assert row.n_clipped_lo == int((v < lo).sum())
            assert row.n_clipped_hi == int((v > hi).sum())
            # clip counts bounded by the percentile definition
            assert row.n_clipped_lo <= (5 * n) // 100
            assert row.n_clipped_hi <= n - (95 * n + 99) // 100 + n // 100


class TestDupMatrix:
    def test_credits_match_prefix_recount(self, ray_session):
        import collections
        import hashlib

        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import DUP_MATRIX_PREFIX, QUERIES

        out = QUERIES["dup_matrix"](SF_DIR).to_pandas()
        docs = pq.read_table(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "source", "text"]
        ).to_pandas()
        first: dict = {}
        want: collections.Counter = collections.Counter()
        for _, r in docs.sort_values("doc_id").iterrows():
            f = hashlib.md5(
                " ".join(r.text.lower().split()[:DUP_MATRIX_PREFIX]).encode()
            ).hexdigest()
            if f in first:
                want[(first[f], r.source)] += 1
            else:
                first[f] = r.source
        got = {(r.orig_source, r.dup_source): r.n for r in out.itertuples()}
        assert got == dict(want)
        assert int(out.n.sum()) == sum(want.values())


class TestStratifiedEvalSplit:
    def test_exact_per_lang_ceil_5pct(self, ray_session):
        import hashlib

        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import QUERIES

        out = QUERIES["stratified_eval_split"](SF_DIR).to_pandas()
        docs = pq.read_table(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang"]
        ).to_pandas()
        assert len(out) == len(docs)
        for lang, grp in docs.groupby("lang"):
            n = len(grp)
            cut = (5 * n + 99) // 100
            sub = out[out.lang == lang]
            assert (sub.split == "eval").sum() == cut
            # eval member set = first `cut` ids by (md5, id)
            ordered = sorted(
                grp.doc_id, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
            )
            assert set(sub.loc[sub.split == "eval", "doc_id"]) == set(ordered[:cut])
        # determinism across invocations
        out2 = QUERIES["stratified_eval_split"](SF_DIR).to_pandas()
        a = out.sort_values("doc_id").reset_index(drop=True)
        b = out2.sort_values("doc_id").reset_index(drop=True)
        assert a.equals(b)


class TestPrioritySample:
    def test_bottomk_matches_brute_force(self, ray_session):
        import pyarrow.parquet as pq

        from don_crawler_ray.functions.dedup import _mix64
        from don_crawler_ray.pipelines.queries import PRIORITY_SAMPLE_K, QUERIES

        out = QUERIES["priority_sample"](SF_DIR).to_pandas()
        docs = pq.read_table(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "n_chars"]
        ).to_pandas()
        doc = docs.doc_id.to_numpy()
        w = np.maximum(docs.n_chars.to_numpy(), 1).astype(np.uint64)
        pr = _mix64(doc.astype(np.uint64)) // w
        order = np.lexsort((doc, pr))[:PRIORITY_SAMPLE_K]
        assert list(out.doc_id) == list(doc[order])
        assert list(out["rank"]) == list(range(1, len(order) + 1))
        # size bias: the sampled docs skew longer than the corpus mean
        assert out.n_chars.mean() > docs.n_chars.mean()


class TestHeavyHitters:
    def test_exact_threshold_set(self, ray_session):
        import collections

        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import HH_THRESHOLD, QUERIES

        out = QUERIES["heavy_hitters"](SF_DIR).to_pandas()
        docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"]).to_pandas()
        cnt: collections.Counter = collections.Counter()
        for t in docs.text:
            cnt.update(t.split())
        total = sum(cnt.values())
        want = {t: c for t, c in cnt.items() if c * HH_THRESHOLD > total}
        assert dict(zip(out.token, out.n)) == want
        # output is (n desc, token asc)
        key = list(zip(-out.n, out.token))
        assert key == sorted(key)


class TestProfileColumns:
    def test_matches_pandas_profile(self, ray_session):
        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import PROFILE_COLUMNS, QUERIES

        out = (
            QUERIES["profile_columns"](SF_DIR).to_pandas().set_index("col")
        )
        li = pq.read_table(
            f"{SF_DIR}/lineitem.parquet", columns=[c for c, _, _ in PROFILE_COLUMNS]
        ).to_pandas()
        assert list(out.index) == sorted(c for c, _, _ in PROFILE_COLUMNS)
        for col, _is_int, track in PROFILE_COLUMNS:
            row = out.loc[col]
            assert row.n == len(li)
            assert row.n_null == int(li[col].isna().sum())
            assert row.min_v == str(li[col].min())
            assert row.max_v == str(li[col].max())
            assert row.n_distinct == (li[col].nunique() if track else -1)


class TestSourceSimilarity:
    def test_signature_agreement_matches_brute_force(self, ray_session):
        import pyarrow.parquet as pq

        from don_crawler_ray.functions.dedup import minhash_signatures_batch
        from don_crawler_ray.pipelines.queries import QUERIES

        out = QUERIES["source_similarity"](SF_DIR).to_pandas()
        docs = pq.read_table(
            f"{SF_DIR}/documents.parquet", columns=["source", "text"]
        ).to_pandas()
        sigs = minhash_signatures_batch(list(docs.text))
        per_src = {
            src: sigs[docs.index[docs.source == src]].min(axis=0)
            for src in docs.source.unique()
        }
        names = sorted(per_src)
        assert len(out) == len(names) * (len(names) - 1) // 2
        for r in out.itertuples():
            want = int((per_src[r.src_a] == per_src[r.src_b]).sum())
            assert r.agree == want
            assert r.est_jaccard == want / 64.0
            assert r.src_a < r.src_b


class TestRrfFusion:
    def test_matches_brute_force_ranks(self, ray_session):
        import numpy as np
        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import QUERIES, RRF_K, RRF_TOPN

        out = QUERIES["rrf_fusion"](SF_DIR).to_pandas().set_index("doc_id")
        docs = pq.read_table(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "text", "n_chars"]
        ).to_pandas()
        n_tok = docs.text.map(lambda t: len(t.split()))
        ra = {
            int(d): r + 1
            for r, d in enumerate(
                docs.doc_id.iloc[
                    np.lexsort((docs.doc_id.values, -n_tok.values))[:RRF_TOPN]
                ]
            )
        }
        rb = {
            int(d): r + 1
            for r, d in enumerate(
                docs.doc_id.iloc[
                    np.lexsort((docs.doc_id.values, -docs.n_chars.values))[:RRF_TOPN]
                ]
            )
        }
        assert set(out.index) == set(ra) | set(rb)
        for d, row in out.iterrows():
            assert row.rank_a == ra.get(d, 0)
            assert row.rank_b == rb.get(d, 0)
            want = (1.0 / (RRF_K + row.rank_a) if row.rank_a else 0.0) + (
                1.0 / (RRF_K + row.rank_b) if row.rank_b else 0.0
            )
            assert row.rrf_e9 == int(np.floor(want * 1e9))


class TestRollingDaily:
    def test_matches_pandas_rolling(self, ray_session):
        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import QUERIES

        out = QUERIES["rolling_daily"](SF_DIR).to_pandas()
        ev = pq.read_table(f"{SF_DIR}/events.parquet", columns=["ts"]).to_pandas()
        daily = ev.ts.dt.floor("D").value_counts().sort_index()
        assert list(out.day) == list(daily.index)
        assert list(out.n_events) == list(daily.values)
        roll = daily.rolling(7, min_periods=1)
        assert list(out.sum_7d) == [int(x) for x in roll.sum()]
        assert list(out.avg7_e6) == [
            s * 1_000_000 // c for s, c in zip(out.sum_7d, roll.count().astype(int))
        ]


class TestLangidConfusion:
    def test_matches_langid_predictions(self, ray_session):
        import collections

        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import QUERIES

        out = QUERIES["langid_confusion"](SF_DIR).to_pandas()
        pred = QUERIES["langid_ngram"](SF_DIR).to_pandas().set_index("doc_id")
        docs = pq.read_table(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang"]
        ).to_pandas()
        cm = collections.Counter(
            (t, pred.loc[d, "pred_lang"]) for d, t in zip(docs.doc_id, docs.lang)
        )
        assert {(r.true_lang, r.pred_lang): r.n for r in out.itertuples()} == dict(cm)
        assert out.n.sum() == len(docs)
        row_tot = out.groupby("true_lang").n.sum()
        for r in out.itertuples():
            assert r.row_permille == r.n * 1000 // int(row_tot[r.true_lang])


class TestJsDivergence:
    def test_matches_brute_force_and_bounds(self, ray_session):
        import collections

        import numpy as np
        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import QUERIES

        out = QUERIES["js_divergence_sources"](SF_DIR).to_pandas()
        docs = pq.read_table(
            f"{SF_DIR}/documents.parquet", columns=["source", "text"]
        ).to_pandas()
        counts: dict = collections.defaultdict(collections.Counter)
        for src, txt in zip(docs.source, docs.text):
            counts[src].update(txt.split())
        sources = sorted(counts)
        vocab = sorted({t for c in counts.values() for t in c})
        mat = np.zeros((len(sources), len(vocab)), np.float64)
        for i, s in enumerate(sources):
            for j, t in enumerate(vocab):
                mat[i, j] = counts[s][t]
        p = mat / mat.sum(axis=1, keepdims=True)
        assert len(out) == len(sources) * (len(sources) - 1) // 2
        got = {(r.src_a, r.src_b): r.jsd_e6 for r in out.itertuples()}
        for i in range(len(sources)):
            for j in range(i + 1, len(sources)):
                a, b = p[i], p[j]
                m = a + b
                with np.errstate(divide="ignore", invalid="ignore"):
                    ta = np.where(a > 0, 0.5 * a * np.log(2.0 * a / m), 0.0)
                    tb = np.where(b > 0, 0.5 * b * np.log(2.0 * b / m), 0.0)
                want = int(np.rint((np.sum(ta) + np.sum(tb)) * 1e6))
                assert got[(sources[i], sources[j])] == want
                # JSD is bounded by ln 2 and non-negative
                assert 0 <= want <= int(np.log(2) * 1e6) + 1


class TestVocabGrowth:
    def test_matches_brute_force_curve(self, ray_session):
        import numpy as np
        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import QUERIES, VOCAB_GROWTH_STEPS

        out = QUERIES["vocab_growth"](SF_DIR).to_pandas()
        docs = pq.read_table(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
        ).to_pandas()
        first: dict = {}
        for d, t in zip(docs.doc_id, docs.text):
            for tok in t.split():
                if tok not in first or d < first[tok]:
                    first[tok] = d
        dids = np.sort(docs.doc_id.values)
        n = len(dids)
        assert list(out.step) == list(range(1, VOCAB_GROWTH_STEPS + 1))
        for r in out.itertuples():
            k = -(-n * r.step // VOCAB_GROWTH_STEPS)
            assert r.n_docs == k
            assert r.boundary_doc == dids[k - 1]
            assert r.vocab_size == sum(1 for v in first.values() if v <= r.boundary_doc)
        # Heaps-law curve is nondecreasing and ends at the full vocab
        assert list(out.vocab_size) == sorted(out.vocab_size)
        assert out.vocab_size.iloc[-1] == len(first)
        assert out.n_docs.iloc[-1] == n


class TestBurstDays:
    def test_matches_pandas_prev_window(self, ray_session):
        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import QUERIES

        out = QUERIES["burst_days"](SF_DIR).to_pandas()
        ev = pq.read_table(f"{SF_DIR}/events.parquet", columns=["ts"]).to_pandas()
        daily = ev.ts.dt.floor("D").value_counts().sort_index()
        assert list(out.day) == list(daily.index)
        assert list(out.n_events) == list(daily.values)
        vals = list(daily.values)
        for i, r in enumerate(out.itertuples()):
            prev = vals[max(0, i - 7): i]
            assert r.sum_prev7 == sum(prev)
            want = 1 if prev and r.n_events * len(prev) > 2 * sum(prev) else 0
            assert r.is_burst == want


class TestZipfFit:
    def test_matches_brute_force_ols(self, ray_session):
        import collections

        import numpy as np
        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import QUERIES, ZIPF_MAX_RANKS

        out = QUERIES["zipf_fit"](SF_DIR).to_pandas()
        docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"]).to_pandas()
        cnt: collections.Counter = collections.Counter()
        for t in docs.text:
            cnt.update(t.split())
        items = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:ZIPF_MAX_RANKS]
        x = np.log(np.arange(1, len(items) + 1, dtype=np.float64))
        y = np.log(np.array([c for _, c in items], np.float64))
        n = float(len(items))
        sx, sy, sxx, sxy = np.sum(x), np.sum(y), np.sum(x * x), np.sum(x * y)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        assert out.n_ranks[0] == len(items)
        assert out.slope_e6[0] == int(np.rint(slope * 1e6))
        assert out.intercept_e6[0] == int(np.rint(intercept * 1e6))
        # a rank-frequency fit must slope downward
        assert out.slope_e6[0] < 0


class TestTokenCoverage:
    def test_matches_brute_force_cumshare(self, ray_session):
        import collections

        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.queries import COVERAGE_KS, QUERIES

        out = QUERIES["token_coverage"](SF_DIR).to_pandas()
        docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"]).to_pandas()
        cnt: collections.Counter = collections.Counter()
        for t in docs.text:
            cnt.update(t.split())
        ordered = [c for _, c in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))]
        total = sum(ordered)
        assert list(out.k) == list(COVERAGE_KS)
        for r in out.itertuples():
            cov = sum(ordered[: r.k])
            assert r.covered == cov
            assert r.covered_permille == cov * 1000 // total
        # the curve is nondecreasing and ends <= 1000
        assert list(out.covered_permille) == sorted(out.covered_permille)
        assert out.covered_permille.iloc[-1] <= 1000


class TestAnnRecallEval:
    def test_consistent_with_component_queries(self, ray_session):
        from don_crawler_ray.pipelines.queries import QUERIES

        out = QUERIES["ann_recall_eval"](SF_DIR).to_pandas()
        brute = QUERIES["ann_topk"](SF_DIR).to_pandas()
        ivf = QUERIES["ann_ivf_topk"](SF_DIR).to_pandas()
        for r in out.itertuples():
            b = set(brute[brute.query_id == r.query_id].vec_id)
            i = set(ivf[ivf.query_id == r.query_id].vec_id)
            assert r.n_brute == len(b) == 10
            assert r.n_common == len(b & i)
            assert r.recall_permille == r.n_common * 1000 // r.n_brute
            assert 0 <= r.recall_permille <= 1000
        assert sorted(out.query_id) == sorted(brute.query_id.unique())
