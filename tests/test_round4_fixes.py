"""Round-4 ADVICE regressions: inverted range-join intervals, raw-text
JSONL semantics in `cli check`, stale filter_stats on curation re-run."""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from json_schema_ray.cli import main
from json_schema_ray.functions.rangejoin import range_join_counts


def test_rangejoin_inverted_interval_does_not_undercount(ray_session):
    """A same-bucket inverted interval (end < t < start) used to feed the
    counts subtraction a -1 for unrelated points, cancelling valid
    matches."""
    import ray.data as rd

    pts = pa.table({"k": pa.array([0], type=pa.int64()),
                    "t": pa.array([500], type=pa.int64())})
    ivs = pa.table(
        {
            "k": pa.array([0, 0], type=pa.int64()),
            # one genuine covering interval + one inverted one in the same
            # (key, bucket) group with end < t < start
            "s": pa.array([400, 800], type=pa.int64()),
            "e": pa.array([600, 100], type=pa.int64()),
        }
    )
    got = range_join_counts(
        rd.from_arrow(pts), rd.from_arrow(ivs),
        key_col="k", point_ts_col="t", start_col="s", end_col="e",
        bucket_width_us=1000,
    ).to_pandas()
    assert len(got) == 1
    assert int(got["n_matches"].iloc[0]) == 1


def test_cli_check_jsonl_raw_text_semantics(ray_session, tmp_path, capsys):
    """Heterogeneous JSONL: Arrow schema unification would inject keys
    seen only in other documents (flipping additionalProperties:false)
    and materialize missing keys as explicit nulls (flipping required).
    The raw-text path validates each line as its own document."""
    docs = tmp_path / "docs.jsonl"
    with open(docs, "w") as f:
        f.write(json.dumps({"a": 1}) + "\n")   # valid
        f.write(json.dumps({"b": 2}) + "\n")   # invalid: missing a, extra b
    schema = tmp_path / "schema.json"
    json.dump(
        {
            "type": "object",
            "required": ["a"],
            "properties": {"a": {"type": "integer"}},
            "additionalProperties": False,
        },
        open(schema, "w"),
    )
    rc = main(["check", "--schema", str(schema), "--input", str(docs)])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # unified-schema path reported n_invalid == 2 ({"a":1} rejected for the
    # injected b:null) — the raw-text path must report exactly 1
    assert out["n_docs"] == 2
    assert out["n_valid"] == 1
    assert out["n_invalid"] == 1
    assert rc == 3


def test_curation_rerun_clears_stale_filter_stats(ray_session, tmp_path):
    """resume=False into an existing out_dir re-runs stage 1; stale
    side-output partials must not be summed with the new ones."""
    from json_schema_ray.pipelines.curation import run_curation

    rng = np.random.default_rng(7)
    words = ["the", "quick", "brown", "fox", "data", "pipeline", "ray", "arrow"]
    texts = [" ".join(rng.choice(words, size=30)) + "." for _ in range(60)]
    texts += ["x y"] * 10  # below min_tokens -> dropped, nonzero reason count
    docs = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                  "text": pa.array(texts)}),
        docs,
    )
    out_dir = str(tmp_path / "curated")
    rep1 = run_curation(str(docs), out_dir, resume=False, concurrency=2)
    rep2 = run_curation(str(docs), out_dir, resume=False, concurrency=2)
    assert rep1.n_input == rep2.n_input == len(texts)
    assert rep2.n_filtered == rep1.n_filtered
    assert rep2.drop_reasons == rep1.drop_reasons
    assert sum(rep1.drop_reasons.values()) == rep1.n_input - rep1.n_filtered > 0


# ------------------------------------------ distributed cluster resolution


def _cluster_partitions(df, id_col="doc_id"):
    """frozenset of frozensets — canonical-label-independent comparison."""
    groups = {}
    for r in df.itertuples():
        groups.setdefault(getattr(r, "cluster_id"), set()).add(getattr(r, id_col))
    return frozenset(frozenset(g) for g in groups.values())


def test_dedup_clusters_distributed_matches_union_find(ray_session):
    """Seeded clusters: label propagation partitions == union-find
    partitions, exactly one keep per cluster, survivor is the min id."""
    from json_schema_ray.functions.dedup import (
        dedup_clusters,
        dedup_clusters_distributed,
    )

    pairs = pa.table(
        {
            "id_a": ["a", "b", "x", "m", "p"],
            "id_b": ["b", "c", "y", "a", "q"],  # {a,b,c,m}, {x,y}, {p,q}
        }
    )
    uf = dedup_clusters(pairs).to_pandas()
    lp = dedup_clusters_distributed(pairs, num_partitions=4).to_pandas()
    assert _cluster_partitions(uf) == _cluster_partitions(lp)
    # exactly one survivor per cluster; survivor is its own label = min id
    per = lp.groupby("cluster_id")
    assert (per["keep"].sum() == 1).all()
    for cid, g in per:
        assert cid == min(g["doc_id"])
        assert g.loc[g["keep"], "doc_id"].iloc[0] == cid


def test_dedup_clusters_distributed_long_chains_no_driver_pairs(ray_session):
    """Large synthetic pair Dataset (chains of length 40, int64 ids) that
    is never collected to the driver: convergence needs pointer jumping,
    and the verdict is read off Dataset aggregates only."""
    import ray.data as rd

    from json_schema_ray.functions.dedup import dedup_clusters_distributed

    N_CHAINS, LEN = 50, 40

    def gen(b: pa.Table) -> pa.Table:
        i = b["id"].to_numpy()
        keep = (i % LEN) != LEN - 1  # last link of each chain has no successor
        i = i[keep]
        return pa.table(
            {
                "id_a": pa.array(i, type=pa.int64()),
                "id_b": pa.array(i + 1, type=pa.int64()),
            }
        )

    pairs_ds = rd.range(N_CHAINS * LEN).map_batches(gen, batch_format="pyarrow")
    cl = dedup_clusters_distributed(pairs_ds, id_col="id", num_partitions=4)
    n_ids = cl.count()
    n_keep = int(cl.sum("keep") or 0)
    assert n_ids == N_CHAINS * LEN
    assert n_keep == N_CHAINS  # one survivor per chain
    # every node's label is its chain head (the min id of the chain)
    def check(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy()
        lbl = b["cluster_id"].to_numpy()
        ok = (lbl == (ids // LEN) * LEN).all()
        return pa.table({"ok": pa.array([bool(ok)])})

    assert all(r["ok"] for r in cl.map_batches(check, batch_format="pyarrow").take_all())


def test_drop_near_dups_distributed_equals_broadcast_path(ray_session):
    import ray.data as rd

    from json_schema_ray.functions.dedup import drop_near_dups, drop_near_dups_distributed

    pairs = pa.table({"id_a": ["a", "b", "x"], "id_b": ["b", "c", "y"]})
    ds = rd.from_arrow(pa.table({"doc_id": list("abcxyz"), "text": [""] * 6}))
    want = sorted(drop_near_dups(ds, pairs).to_pandas()["doc_id"])
    got = sorted(
        drop_near_dups_distributed(
            rd.from_arrow(pa.table({"doc_id": list("abcxyz"), "text": [""] * 6})),
            pairs,
            num_partitions=4,
        ).to_pandas()["doc_id"]
    )
    assert got == want == ["a", "x", "z"]


def test_minhash_streaming_pairs_match_driver_version(ray_session):
    """minhash_lsh_candidate_pairs_ds (driver-free) produces the SAME
    candidate pair set and est_jaccard values as minhash_lsh_candidates,
    and chains into dedup_clusters_distributed end-to-end."""
    import numpy as np
    import ray.data as rd

    from json_schema_ray.functions.dedup import (
        dedup_clusters_distributed,
        minhash_lsh_candidate_pairs_ds,
        minhash_lsh_candidates,
    )

    rng = np.random.default_rng(11)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa"]
    base = [" ".join(rng.choice(words, size=40)) for _ in range(30)]
    texts, ids = [], []
    for i, t in enumerate(base):
        texts.append(t); ids.append(2 * i)
        # near-dup twin for every 3rd doc: tweak one word
        if i % 3 == 0:
            texts.append(t.replace(t.split()[0], "omega", 1)); ids.append(2 * i + 1)
    tbl = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                    "text": pa.array(texts)})
    ds = rd.from_arrow(tbl).repartition(4)

    want = minhash_lsh_candidates(ds, concurrency=2).to_pandas()
    got = (
        minhash_lsh_candidate_pairs_ds(
            rd.from_arrow(tbl).repartition(4), concurrency=2, num_partitions=4
        )
        .to_pandas()
    )
    key = lambda df: {   # noqa: E731
        (int(a), int(b)): round(float(j), 9)
        for a, b, j in zip(df["id_a"], df["id_b"], df["est_jaccard"])
    }
    assert key(got) == key(want)
    assert len(want) > 0  # the planted twins must collide

    # chain: streaming pairs -> distributed resolution, no driver pair set
    strong = minhash_lsh_candidate_pairs_ds(
        rd.from_arrow(tbl).repartition(4), concurrency=2, num_partitions=4
    ).filter(lambda r: r["est_jaccard"] >= 0.5)
    cl = dedup_clusters_distributed(strong, id_col="doc_id", num_partitions=4)
    n_keep = int(cl.sum("keep") or 0)
    assert 0 < n_keep <= cl.count()


# ------------------------------------------------------- bloom filter


def test_bloom_filter_basics():
    """No false negatives; FP rate near the analytic bound; OR-merge."""
    import numpy as np

    from json_schema_ray.state.bloom import BloomFilter, hash_strings

    rng = np.random.default_rng(5)
    members = [f"gram-{i}" for i in range(20_000)]
    others = [f"other-{i}" for i in range(50_000)]
    bf = BloomFilter(n_bits=1 << 19, k=7)  # m/n ≈ 26 bits/el → fp ~ 2e-5
    h_in = hash_strings(members)
    bf.add_hashes(h_in)
    assert bf.contains_hashes(h_in).all()  # zero false negatives, always
    fp = bf.contains_hashes(hash_strings(others)).mean()
    expected = (1 - np.exp(-7 * len(members) / (1 << 19))) ** 7
    assert fp <= max(4 * expected, 1e-3)

    # mergeable: OR of shard filters == filter of the union
    a, b = BloomFilter(1 << 19, 7), BloomFilter(1 << 19, 7)
    a.add_hashes(h_in[:10_000]); b.add_hashes(h_in[10_000:])
    assert a.merge(b).contains_hashes(h_in).all()


def test_find_contaminated_bloom_superset_of_exact(ray_session):
    """Bloom path flags every exactly-contaminated doc (no false
    negatives) and the flagged superset stays tight at 1 MiB default."""
    import numpy as np
    import ray.data as rd

    from json_schema_ray.functions.text import (
        doc_word_ngrams,
        find_contaminated,
        find_contaminated_bloom,
    )

    rng = np.random.default_rng(9)
    words = [f"w{i}" for i in range(200)]
    bench_texts = [" ".join(rng.choice(words, size=30)) for _ in range(10)]
    clean = [" ".join(rng.choice(words, size=40)) for _ in range(50)]
    # plant benchmark 13-grams into 5 training docs
    dirty = [c + " " + " ".join(bench_texts[i % 10].split()[:13]) for i, c in enumerate(clean[:5])]
    texts = dirty + clean[5:]
    tbl = pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                    "text": pa.array(texts)})
    bench_tbl = pa.table({"text": pa.array(bench_texts)})
    grams = doc_word_ngrams(bench_tbl, n=13, text_col="text")[0].unique()

    exact = find_contaminated(
        rd.from_arrow(tbl), grams, n=13
    ).to_pandas().set_index("doc_id")
    bloom = find_contaminated_bloom(
        rd.from_arrow(tbl), grams, n=13
    ).to_pandas().set_index("doc_id")

    assert set(exact.index) == set(range(5))
    assert set(exact.index) <= set(bloom.index)  # superset, no false negatives
    # n_matched upper-bounds the exact count
    for d in exact.index:
        assert bloom.loc[d, "n_matched"] >= exact.loc[d, "n_matched"]
