"""functions/rangejoin.py — bucket-partitioned interval join: exact
counts vs brute force, pairs mode agreement, bucket-boundary and
long-interval replication cases.  The sf0.01 SQL oracle lives in
__ray_entry__.oracle_sql()['range_join']."""

import numpy as np
import pyarrow as pa

from json_schema_ray.functions.rangejoin import range_join_counts, range_join_pairs


def _mk(seed=11, n_pts=4000, n_iv=600, keys=7, span=1_000_000, iv_len=(10, 5000)):
    rng = np.random.default_rng(seed)
    pts = pa.table(
        {
            "k": pa.array(rng.integers(0, keys, n_pts).astype(np.int64)),
            "t": pa.array(rng.integers(0, span, n_pts).astype(np.int64)),
        }
    )
    s = rng.integers(0, span, n_iv).astype(np.int64)
    e = s + rng.integers(*iv_len, n_iv).astype(np.int64)
    ivs = pa.table(
        {
            "k": pa.array(rng.integers(0, keys, n_iv).astype(np.int64)),
            "s": pa.array(s),
            "e": pa.array(e),
            "iid": pa.array(np.arange(n_iv, dtype=np.int64)),
        }
    )
    return pts, ivs


def _brute_counts(pts, ivs):
    k_p, t = pts["k"].to_numpy(), pts["t"].to_numpy()
    k_i, s, e = ivs["k"].to_numpy(), ivs["s"].to_numpy(), ivs["e"].to_numpy()
    out = {}
    for i in range(len(t)):
        m = int(((k_i == k_p[i]) & (s <= t[i]) & (e >= t[i])).sum())
        if m:
            out[(int(k_p[i]), int(t[i]))] = out.get((int(k_p[i]), int(t[i])), 0) + m
    return out


def test_counts_exact_vs_brute(ray_session):
    import ray.data as rd

    pts, ivs = _mk()
    got = range_join_counts(
        rd.from_arrow(pts).repartition(5),
        rd.from_arrow(ivs).repartition(3),
        key_col="k", point_ts_col="t", start_col="s", end_col="e",
        bucket_width_us=4096,
    ).to_pandas()
    want = _brute_counts(pts, ivs)
    # duplicate (k, t) points each contribute their own row; aggregate both
    got_agg = got.groupby(["k", "t"])["n_matches"].sum().to_dict()
    assert got_agg == want


def test_pairs_match_counts(ray_session):
    import ray.data as rd

    pts, ivs = _mk(seed=23, n_pts=800, n_iv=200)
    counts = range_join_counts(
        rd.from_arrow(pts), rd.from_arrow(ivs),
        key_col="k", point_ts_col="t", start_col="s", end_col="e",
        bucket_width_us=2048,
    ).to_pandas()
    pairs = range_join_pairs(
        rd.from_arrow(pts), rd.from_arrow(ivs),
        key_col="k", point_ts_col="t", start_col="s", end_col="e",
        interval_id_col="iid", bucket_width_us=2048, chunk=97,
    ).to_pandas()
    assert counts["n_matches"].sum() == len(pairs)
    # every pair really covers: verify against the interval table
    iv = {int(r["iid"]): (int(r["s"]), int(r["e"]), int(r["k"])) for r in ivs.to_pylist()}
    for r in pairs.itertuples():
        s, e, k = iv[int(r.iid)]
        assert s <= r.t <= e and k == r.k
    # no duplicate pairs from interval replication (one meeting bucket)
    assert not pairs.duplicated().any()


def test_bucket_boundaries_inclusive(ray_session):
    import ray.data as rd

    W = 100
    pts = pa.table({"k": pa.array([1, 1, 1, 1], type=pa.int64()),
                    "t": pa.array([100, 199, 200, 300], type=pa.int64())})
    # interval exactly [100, 200]: covers t=100, 199, 200 — not 300
    ivs = pa.table({"k": pa.array([1], type=pa.int64()),
                    "s": pa.array([100], type=pa.int64()),
                    "e": pa.array([200], type=pa.int64())})
    got = range_join_counts(
        rd.from_arrow(pts), rd.from_arrow(ivs),
        key_col="k", point_ts_col="t", start_col="s", end_col="e",
        bucket_width_us=W,
    ).to_pandas().sort_values("t")
    assert got["t"].tolist() == [100, 199, 200]
    assert got["n_matches"].tolist() == [1, 1, 1]


def test_long_interval_replication(ray_session):
    import ray.data as rd

    # one interval spanning many buckets must meet points in each bucket
    pts = pa.table({"k": pa.array([5] * 6, type=pa.int64()),
                    "t": pa.array([0, 999, 5000, 9999, 10000, 20001], type=pa.int64())})
    ivs = pa.table({"k": pa.array([5], type=pa.int64()),
                    "s": pa.array([0], type=pa.int64()),
                    "e": pa.array([20000], type=pa.int64())})
    got = range_join_counts(
        rd.from_arrow(pts), rd.from_arrow(ivs),
        key_col="k", point_ts_col="t", start_col="s", end_col="e",
        bucket_width_us=1000,
    ).to_pandas().sort_values("t")
    assert got["t"].tolist() == [0, 999, 5000, 9999, 10000]
