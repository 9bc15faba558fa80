"""Distributed profiling operators: exact heavy hitters and deterministic
stratified sampling.

These extend the engine's profiling surface (SURVEY §2.9: column stats /
top-N values) with the two operations a 100-TB corpus audit needs that the
reference cannot express (the reference validates one in-memory document at
a time, ``js/Schema.java:51-66``):

- ``heavy_hitters``: all values whose global frequency exceeds a fraction
  ``min_frac`` of the dataset — EXACT counts, without ever shuffling the
  full column.  Two streaming passes:

  1. *Pigeonhole candidate prefilter* (the mergeable-summaries guarantee,
     Agarwal et al., PODS'12 / Misra-Gries): if count(x) > φ·N globally,
     then in at least one batch count_i(x) > φ·n_i.  Each batch therefore
     emits only its locally-φ-frequent values (< 1/φ of them per batch) —
     a guaranteed SUPERSET of the true heavy hitters, tiny by
     construction.
  2. *Candidate-only exact recount*: the candidate set is broadcast
     (``ray.put`` once, read per task) and a second narrow scan counts
     ONLY candidate values — the exchange moves ≤ |candidates| rows per
     block instead of N values.

  The result is bit-exact (a SQL ``HAVING count(*) > φ·N`` oracle holds),
  while the shuffle volume is bounded by the candidate count, not the
  data.  Skewed keys are the POINT here: the heavier the skew, the
  smaller the candidate set.

- ``stratified_sample``: exactly ``ceil(frac · n_g)`` rows per group,
  selected as the quota-smallest Knuth-hash values of the id — the
  engine-reproducible sampling contract (same hash family as the
  train/val/test split): stable under repartitioning, reproducible in SQL
  (``row_number() OVER (... ORDER BY hash)``), no RNG state.  Pass 1 is a
  tiny per-group count; pass 2 keeps at most quota_g rows per group per
  batch (partial top-k combiner) so the final per-group selection touches
  ≤ quota·n_blocks rows, not the group.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

KNUTH = np.uint64(0x9E3779B97F4A7C15)


def knuth_hash(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """uint64 multiplicative hash of an integer id column (mod 2^64) —
    mirrored in SQL as ``(CAST(id AS HUGEINT)*11400714819323198485) %
    18446744073709551616``."""
    ids = arr.to_numpy(zero_copy_only=False).astype(np.uint64)
    return ids * KNUTH


def heavy_hitters(ds, col: str, *, min_frac: float, total: int | None = None) -> pa.Table:
    """All values of ``ds[col]`` with global count > ``min_frac * N``,
    with EXACT counts.  Returns an Arrow table (col, n) sorted by
    (n desc, col asc).  ``total`` skips the count pass when the caller
    already knows N (e.g. from parquet footers)."""
    import ray

    n_total = int(ds.count()) if total is None else int(total)
    threshold = min_frac * n_total

    def local_frequent(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch.select([col]), col).aggregate([([], "count_all")])
        cnt = g.column("count_all")
        keep = pc.greater(pc.cast(cnt, pa.float64()), min_frac * len(batch))
        return g.filter(keep).select([col])

    # candidate superset: < 1/min_frac values per batch by construction
    candidates = ds.map_batches(local_frequent, batch_format="pyarrow").unique(col)
    if not candidates:
        sch = ds.schema()
        col_type = dict(zip(sch.names, sch.types))[col]
        return pa.table({col: pa.array([], type=col_type),
                         "n": pa.array([], type=pa.int64())})
    cand_ref = ray.put(pa.array(candidates))

    def recount(batch: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        hit = batch.select([col]).filter(pc.is_in(batch[col], value_set=cand))
        g = pa.TableGroupBy(hit, col).aggregate([([], "count_all")])
        return g.rename_columns([col, "n_part"])

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(recount, batch_format="pyarrow")
        .groupby(col)
        .aggregate(Sum("n_part", alias_name="n"))
        .to_pandas()
    )
    out = out[out["n"] > threshold].sort_values(["n", col], ascending=[False, True])
    out["n"] = out["n"].astype(np.int64)
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def stratified_sample(
    ds,
    *,
    group_col: str,
    id_col: str,
    frac: float,
    prefilter_threshold_rows: int = 5_000_000,
):
    """Deterministic per-group sample: exactly ``ceil(frac * n_g)`` rows
    of each ``group_col`` group, chosen as the quota-smallest
    ``knuth_hash(id)`` values (ties broken by id — the hash is injective
    on int64 ids anyway, the tiebreak documents intent).  Returns a
    Dataset of (group_col, id_col) rows.

    Partitioning assumption: ``group_col`` is a STRATUM column (source,
    language, shard class — driver-small cardinality), so the quota map
    broadcasts via closure capture; strata themselves can be arbitrarily
    large (the partial top-k combiner bounds what reaches each group's
    final select to ≤ quota × n_blocks rows).  For million-way group
    columns use the hash-split assignment (``q_train_split`` shape)
    instead — exact per-group quotas at that cardinality would need the
    quota map as a joined side, not a broadcast."""
    # quota pass reads ONLY the stratum column (projection pushed into the
    # scan) and counts via a per-batch combiner + driver sum — a stratum
    # column is driver-small by contract, so the n_groups×n_blocks partial
    # rows are trivial and the sort-based groupby exchange is pure waste
    # (measured ~0.4 s of the query's wall at the 32-CPU bench profile)
    def _vc(b: pa.Table) -> pa.Table:
        t = pa.TableGroupBy(b.select([group_col]), group_col).aggregate(
            [([], "count_all")]
        )
        return t.rename_columns([group_col, "n"])

    counts = (
        ds.select_columns([group_col])
        .map_batches(_vc, batch_format="pyarrow")
        .to_pandas()
        .groupby(group_col)["n"]
        .sum()
    )
    quotas = {g: int(math.ceil(frac * int(n))) for g, n in counts.items()}

    # SIZE-AWARE select plan (the join_auto pattern): above
    # ``prefilter_threshold_rows`` the select exchange uses an EXACT
    # hash-threshold prefilter; below it, the one-execution quota-cap plan
    # wins — the prefilter's extra candidate materialization + verify pass
    # cost more fixed latency than a small exchange saves (measured
    # 2.2 s → 3.6 s at 600k rows/32 CPUs), while at scale shuffling 100 %
    # of the input to keep frac of it is the real cost.
    use_prefilter = sum(counts) > prefilter_threshold_rows

    # EXACT hash-threshold prefilter: the quota-th smallest of n_g uniform
    # 64-bit hashes concentrates at (q_g/n_g)·2^64; keeping only
    # h ≤ frac·(1+slack)·2^64 shrinks the select exchange from ~ALL rows
    # (the per-batch quota cap never binds when quota > rows-per-batch,
    # i.e. whenever frac ≳ 1/n_blocks) to ≈ frac·(1+slack) of the input.
    # Exactness is VERIFIED, not assumed: groups whose captured candidate
    # count falls below quota (Chernoff-rare; slack = 6/√q) re-run through
    # the unfiltered cap path, so the result is always the true quota-
    # smallest set.  Tiny groups (quota < 64) skip the prefilter — their
    # rows are negligible and their threshold concentration is weak.
    thr = np.uint64(min(1.0, frac + 6.0 * math.sqrt(frac) / math.sqrt(
        max(64, min((q for q in quotas.values() if q >= 64), default=64))
    )) * float(np.iinfo(np.uint64).max))
    small_groups = {g for g, q in quotas.items() if q < 64}

    def partial_select(batch: pa.Table, _only: frozenset | None = None) -> pa.Table:
        h = knuth_hash(batch[id_col])
        t = pa.table(
            {
                group_col: batch[group_col],
                id_col: batch[id_col],
                "__h__": pa.array(h),  # uint64 — int64 reinterpret would break ordering
            }
        )
        out_parts = []
        grp = batch[group_col].to_numpy(zero_copy_only=False)
        for g in np.unique(grp):
            key = g if not isinstance(g, bytes) else g.decode()
            if _only is not None and key not in _only:
                continue
            q = quotas.get(key, 0)
            if q <= 0:
                continue
            m = grp == g
            idx = np.nonzero(m)[0]
            hh = h[idx]
            if use_prefilter and _only is None and key not in small_groups:
                keep = hh <= thr  # exactness verified below
                idx, hh = idx[keep], hh[keep]
            if len(idx) > q:
                sel = np.argsort(hh, kind="stable")[:q]
                idx = idx[sel]
            out_parts.append(t.take(pa.array(idx)))
        if not out_parts:
            return t.slice(0, 0)
        return pa.concat_tables(out_parts)

    def final_select(g: pa.Table) -> pa.Table:
        key = g[group_col][0].as_py()
        q = quotas.get(key, 0)
        t = g.sort_by([("__h__", "ascending"), (id_col, "ascending")])
        return t.slice(0, q).select([group_col, id_col])

    if not use_prefilter:
        # one-execution plan: per-batch quota cap → per-group final select
        return (
            ds.map_batches(partial_select, batch_format="pyarrow")
            .groupby(group_col)
            .map_groups(final_select, batch_format="pyarrow")
        )

    cand = ds.map_batches(partial_select, batch_format="pyarrow").materialize()
    # verify the prefilter captured every quota (exact-or-retry)
    got = (
        cand.select_columns([group_col])
        .map_batches(_vc, batch_format="pyarrow")
        .to_pandas()
        .groupby(group_col)["n"]
        .sum()
    )
    short = frozenset(
        g for g, q in quotas.items() if int(got.get(g, 0)) < q and g not in small_groups
    )
    if short:  # Chernoff-rare: re-run the shorted groups without the filter
        extra = ds.map_batches(
            lambda b, _o=short: partial_select(b, _only=_o), batch_format="pyarrow"
        )
        keep_ok = cand.map_batches(
            lambda b, _o=short: b.filter(
                pa.array(~np.isin(b[group_col].to_numpy(zero_copy_only=False), list(_o)))
            ),
            batch_format="pyarrow",
        )
        cand = keep_ok.union(extra)
    return cand.groupby(group_col).map_groups(final_select, batch_format="pyarrow")


def exact_group_rank_select(
    ds,
    *,
    group_col: str,
    value_col: str,
    id_col: str,
    rank_fn,
    sample_mod: int | None = None,
    pad_mult: float = 4.0,
    max_iters: int = 8,
) -> pa.Table:
    """Exact per-group order statistics (k-th smallest ``value_col``)
    WITHOUT whole-group materialization — the distributed swap for exact
    ntile/quantile boundaries contracted in ``q_rank_windows``.

    ``rank_fn(n) -> [(tag, rank), ...]`` gives the 1-indexed target ranks
    per group of size n (out-of-range ranks dropped; duplicate ranks under
    different tags fine).  Returns an Arrow table
    ``(group_col, tag, rank, value)`` sorted by (group, tag).

    Algorithm — two streaming passes plus vanishingly-rare retries (the
    classic distributed selection shape, cf. Blum et al. selection +
    TeraSort-style sampled partitioning):

    0. exact per-group counts (combiner-collapsed groupby);
    1. a DETERMINISTIC hash-of-id row sample (no RNG state, stable under
       repartitioning) brackets each target rank between two sample order
       statistics with a ±pad·√|sample| safety margin;
    2. one scan counts values strictly below each bracket exactly and
       collects only the in-bracket values (≈ pad·sample_mod rows per
       target).  If ``count_below < rank ≤ count_below + |in_bracket|``
       the k-th value is read off the sorted in-bracket set; a missed
       bracket (probability e^-Ω(pad²) by Chernoff) widens ×4 and
       re-scans, degenerating to a full-range bracket in O(log) rounds.

    Driver state is bounded by n_groups × targets × pad × sample_mod —
    never by the data.  ``value_col`` must be int64 (exact comparisons,
    no float ties); ``id_col`` seeds the sample hash.
    """
    import pandas as pd
    from ray.data.aggregate import Count

    group_type = ds.schema().base_schema.field(group_col).type
    OUT = pa.schema(
        [(group_col, group_type), ("tag", pa.int64()),
         ("rank", pa.int64()), ("value", pa.int64())]
    )
    PART = pa.schema(
        [(group_col, group_type), ("tag", pa.int64()),
         ("kind", pa.int64()), ("num", pa.int64())]
    )

    # ONE pass produces both the exact per-group counts (kind 0: per-batch
    # count partials) and the deterministic row sample (kind 1: sampled
    # values) — fused so the input is read once for steps 0+1 instead of
    # twice (each dataset execution re-reads the source; measured ~0.3-0.5 s
    # of pure fixed cost per execution at the 32-CPU bench profile).
    # ``sample_mod`` must be chosen before the counts exist, so it falls
    # back to a fixed default; callers with wildly skewed group counts can
    # still pass it explicitly.
    if sample_mod is None:
        sample_mod = 16

    def count_and_sample(b: pa.Table) -> pa.Table:
        cnt = pa.TableGroupBy(b.select([group_col]), group_col).aggregate(
            [([], "count_all")]
        )
        h = pd.util.hash_pandas_object(
            b[id_col].to_pandas(), index=False
        ).to_numpy()
        samp = b.select([group_col, value_col]).filter(
            pa.array((h % sample_mod) == 0)
        )
        return pa.table(
            {
                group_col: pa.concat_arrays(
                    [cnt[group_col].combine_chunks().cast(group_type),
                     samp[group_col].combine_chunks().cast(group_type)]
                ),
                "kind": pa.array(
                    np.concatenate([np.zeros(len(cnt), np.int64),
                                    np.ones(len(samp), np.int64)])
                ),
                "num": pa.concat_arrays(
                    [cnt["count_all"].combine_chunks().cast(pa.int64()),
                     samp[value_col].combine_chunks().cast(pa.int64())]
                ),
            }
        )

    cs = ds.map_batches(count_and_sample, batch_format="pyarrow").to_pandas()
    counts_df = cs[cs["kind"] == 0].groupby(group_col)["num"].sum()
    counts = {g: int(n) for g, n in counts_df.items()}
    pending = [
        (g, int(tag), int(r))
        for g, n in counts.items()
        for tag, r in rank_fn(n)
        if 1 <= r <= n
    ]
    if not pending:
        return OUT.empty_table()
    samples = {
        g: np.sort(v["num"].to_numpy().astype(np.int64))
        for g, v in cs[cs["kind"] == 1].groupby(group_col)
    }

    I64_LO, I64_HI = np.iinfo(np.int64).min, np.iinfo(np.int64).max
    resolved: list[tuple] = []
    pad = float(pad_mult)
    for _ in range(max_iters):
        brackets = []
        for g, tag, r in pending:
            s = samples.get(g)
            if s is None or len(s) == 0:
                lo, hi = I64_LO, I64_HI
            else:
                p = r * len(s) / counts[g]
                w = int(pad * math.sqrt(len(s)) + 2)
                loi, hii = int(math.floor(p)) - w, int(math.ceil(p)) + w
                lo = I64_LO if loi < 0 else int(s[min(loi, len(s) - 1)])
                hi = I64_HI if hii >= len(s) else int(s[hii])
            brackets.append((g, tag, lo, hi))

        def scan(b: pa.Table, _br=tuple(brackets)) -> pa.Table:
            grp = b[group_col].to_numpy(zero_copy_only=False)
            val = b[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
            gs, tags, kinds, nums = [], [], [], []
            for g, tag, lo, hi in _br:
                m = grp == g
                if not m.any():
                    continue
                v = val[m]
                below = int((v < lo).sum()) if lo != I64_LO else 0
                gs.append(g); tags.append(tag); kinds.append(0); nums.append(below)
                w = v[(v >= lo) & (v <= hi)]
                gs.extend([g] * len(w)); tags.extend([tag] * len(w))
                kinds.extend([1] * len(w)); nums.extend(int(x) for x in w)
            return pa.table(
                {
                    group_col: pa.array(gs, type=group_type),
                    "tag": pa.array(tags, type=pa.int64()),
                    "kind": pa.array(kinds, type=pa.int64()),
                    "num": pa.array(nums, type=pa.int64()),
                }
            ).cast(PART)

        parts = ds.map_batches(scan, batch_format="pyarrow").to_pandas()
        below_tot = (
            parts[parts["kind"] == 0].groupby([group_col, "tag"])["num"].sum()
        )
        inbr = {
            k: np.sort(v["num"].to_numpy())
            for k, v in parts[parts["kind"] == 1].groupby([group_col, "tag"])
        }
        still = []
        for g, tag, r in pending:
            below = int(below_tot.get((g, tag), 0))
            arr = inbr.get((g, tag), np.array([], dtype=np.int64))
            idx = r - below - 1
            if 0 <= idx < len(arr):
                resolved.append((g, tag, r, int(arr[idx])))
            else:
                still.append((g, tag, r))
        pending = still
        if not pending:
            break
        pad *= 4.0
    else:
        raise RuntimeError(f"rank selection did not converge for {pending[:4]}")

    resolved.sort(key=lambda t: (str(t[0]), t[1]))
    return pa.table(
        {
            group_col: pa.array([t[0] for t in resolved], type=group_type),
            "tag": pa.array([t[1] for t in resolved], type=pa.int64()),
            "rank": pa.array([t[2] for t in resolved], type=pa.int64()),
            "value": pa.array([t[3] for t in resolved], type=pa.int64()),
        }
    )
