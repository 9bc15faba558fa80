"""Composed training-data curation funnel: the standard pre-training data
pipeline — heuristic filter → PII scrub → exact dedup → near-dedup →
benchmark decontamination → train/val/test split → sequence packing →
partitioned write — as ONE resumable streaming product surface.

This composes the engine's individually-oracled curation operators
(``functions/text.py``, ``functions/dedup.py``) the way the flagship
validation pipeline composes its constraint operators
(``pipelines/validation.py``): the reference applies one Schema to a
document stream (``js/Schema.java:51-66``); a training-data user runs this
funnel over the same stream.

Scale shape (the 100-TB contract):

- Every stage that touches the full corpus is a streaming ``map_batches``
  pass; stage boundaries are **partitioned parquet directories** under
  ``out_dir`` with an atomic ``_SUCCESS`` manifest, so a failed run
  resumes by skipping finished stages and the working set between stages
  lives on storage, not in the object store.
- The wide signal scan (language-ID, quality, repetition, token counts,
  PII scrub, content fingerprint) is ONE actor-pool pass — patterns
  compile once per actor — with per-reason drop accounting emitted as an
  in-scan side-output (content-hashed filenames → idempotent under task
  retry), the same shape as the flagship's violation side-output
  (``stages/validate.py``).
- Exact dedup hash-partitions on a small bucket key (not the raw
  fingerprint) exactly like ``functions/dedup.exact_dedup``.
- Near-dup candidates come from the distributed MinHash-LSH prefilter;
  only the candidate-pair set and the resolved drop-set (∝ duplicates
  found, not corpus size) touch the driver, then broadcast into an
  ``is_in`` filter — no shuffle of the big side.
- Decontamination broadcasts the benchmark's distinct n-grams (the SMALL
  side) once; matching is one ``pc.is_in`` per batch.
- The split assignment is a stateless multiplicative hash of the id —
  reproducible on any engine, stable under repartitioning, no shuffle.
- Packing group-assigns documents by id hash so bin contents are
  independent of block boundaries, then packs inside
  ``groupby(...).map_groups`` — each group is one vectorized
  searchsorted walk (``functions/text.pack_greedy``).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.dedup import (
    dedup_clusters,
    dedup_clusters_distributed,
    minhash_lsh_candidates,
)

# above this many candidate pairs, cluster resolution leaves the driver
# (iterative min-label propagation, functions/dedup.py); below it the
# union-find fast path wins on latency
DISTRIBUTED_PAIRS_THRESHOLD = 2_000_000
# (round-5) the LSH sig/banded tables now ALWAYS spill to parquet under
# the run dir rather than staying pinned in the object store (~1 KB/doc);
# the former LSH_SPILL_THRESHOLD routing is gone — the spill IS the
# default 100-TB path, and the small-run fixed cost is one local parquet
# write+read of candidate-sized tables.

# above this many distinct benchmark n-grams, decontamination switches to
# the Bloom-filter path (constant 1 MiB broadcast, zero false negatives,
# bounded-FP over-drop) instead of broadcasting the gram array
BLOOM_GRAMS_THRESHOLD = 5_000_000
from ..functions.text import (
    TOKEN_RE,
    WS_TOKEN_RE,
    LangId,
    add_fingerprint,
    add_quality_score,
    add_repetition_stats,
    doc_word_ngrams,
    find_contaminated,
    pack_greedy,
    redact_pii,
)

# drop-reason precedence: a doc failing several checks counts once,
# under the FIRST matching reason
REASONS = ("lang", "too_short", "too_long", "quality", "repetition")


# --------------------------------------------------------------- report


@dataclass
class CurationReport:
    """Funnel accounting: every count is rows surviving AFTER the stage."""

    n_input: int = 0
    n_filtered: int = 0            # after the signal filter + PII scrub
    n_exact_deduped: int = 0       # after fingerprint keep-first
    n_near_dup_dropped: int = 0    # near-dup cluster losers removed
    n_contaminated_dropped: int = 0
    n_final: int = 0               # rows written to curated/
    drop_reasons: dict = field(default_factory=dict)  # reason -> n docs
    split_counts: dict = field(default_factory=dict)  # split -> n docs
    n_pack_bins: int = 0           # 0 when packing disabled
    out_dir: str = ""
    resumed_stages: list = field(default_factory=list)

    def to_table(self) -> pa.Table:
        """One-row Arrow summary (driver-checkable: counts are monotone
        non-increasing through the funnel and splits sum to n_final)."""
        splits_sum = sum(self.split_counts.values())
        monotone = (
            self.n_input >= self.n_filtered >= self.n_exact_deduped >= self.n_final
        )
        cols: dict = {
            "n_input": [self.n_input],
            "n_filtered": [self.n_filtered],
            "n_exact_deduped": [self.n_exact_deduped],
            "n_near_dup_dropped": [self.n_near_dup_dropped],
            "n_contaminated_dropped": [self.n_contaminated_dropped],
            "n_final": [self.n_final],
        }
        for r in REASONS:
            cols[f"dropped_{r}"] = [int(self.drop_reasons.get(r, 0))]
        for s in sorted(self.split_counts):
            cols[f"n_{s}"] = [int(self.split_counts[s])]
        cols["n_pack_bins"] = [self.n_pack_bins]
        cols["funnel_ok"] = [bool(monotone and splits_sum == self.n_final)]
        return pa.table(
            {k: pa.array(v, type=pa.bool_() if k == "funnel_ok" else pa.int64())
             for k, v in cols.items()}
        )


# ---------------------------------------------------- stage 1: signal scan


class SignalFilter:
    """Actor-pool wide scan: language-ID + quality + repetition + token
    counts + PII scrub + content fingerprint in ONE pass.  Survivors
    stream on with their signal columns; per-reason drop counts are
    side-written as tiny parquet partials (content-hashed filename →
    a retried task overwrites its own file, idempotent)."""

    def __init__(
        self,
        *,
        langs: tuple = ("en",),
        min_quality: float = 0.3,
        max_dup_word_frac: float = 0.9,
        max_top_2gram_frac: float = 0.5,
        min_tokens: int = 5,
        max_tokens: int = 1_000_000,
        redact: bool = True,
        stats_dir: str | None = None,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        self.langid = LangId()  # marker regexes compile once per actor
        self.langs = set(langs)
        self.min_quality = min_quality
        self.max_dup_word_frac = max_dup_word_frac
        self.max_top_2gram_frac = max_top_2gram_frac
        self.min_tokens = min_tokens
        self.max_tokens = max_tokens
        self.redact = redact
        self.stats_dir = stats_dir
        self.text_col = text_col
        self.id_col = id_col

    def _write_stats(self, batch: pa.Table, counts: dict) -> None:
        if self.stats_dir is None:
            return
        os.makedirs(self.stats_dir, exist_ok=True)
        # filename from the full id-column content: unique per batch,
        # deterministic under retry (same pattern as the flagship's
        # violation side-output, stages/validate.py)
        h = hashlib.sha1()
        for v in pc.cast(batch[self.id_col], pa.string()).to_pylist():
            h.update((v or "").encode())
            h.update(b"\x1f")
        t = pa.table(
            {
                "reason": pa.array(list(counts), type=pa.string()),
                "n": pa.array([int(counts[k]) for k in counts], type=pa.int64()),
            }
        )
        pq.write_table(t, os.path.join(self.stats_dir, f"part-{h.hexdigest()[:16]}.parquet"))

    def __call__(self, batch: pa.Table) -> pa.Table:
        b = self.langid(batch, self.text_col)
        b = add_quality_score(b, self.text_col)
        b = add_repetition_stats(b, self.text_col)
        t = b[self.text_col]
        n_tok = pc.cast(pc.count_substring_regex(t, WS_TOKEN_RE), pa.int64()).fill_null(0)
        n_bpe = pc.cast(pc.count_substring_regex(t, TOKEN_RE), pa.int64()).fill_null(0)
        b = b.append_column("n_tokens", n_tok)
        b = b.append_column("n_bpe_tokens", n_bpe)

        npf = lambda col: b[col].to_numpy(zero_copy_only=False)  # noqa: E731
        lang_ok = np.isin(npf("lang_pred"), list(self.langs))
        toks = n_tok.to_numpy(zero_copy_only=False)
        fails = {
            "lang": ~lang_ok,
            "too_short": toks < self.min_tokens,
            "too_long": toks > self.max_tokens,
            "quality": npf("quality_score") < self.min_quality,
            "repetition": (npf("dup_word_frac") > self.max_dup_word_frac)
            | (npf("top_2gram_frac") > self.max_top_2gram_frac),
        }
        keep = np.ones(len(b), dtype=bool)
        counts = {"__in__": len(b)}
        for r in REASONS:  # precedence: first matching reason counts
            hit = fails[r] & keep
            counts[r] = int(hit.sum())
            keep &= ~fails[r]
        counts["__kept__"] = int(keep.sum())
        self._write_stats(batch, counts)

        out = b.filter(pa.array(keep))
        if self.redact:
            out = redact_pii(out, self.text_col)
            i = out.schema.get_field_index(self.text_col)
            out = out.set_column(i, self.text_col, out["redacted"])
            out = out.drop(["redacted", "n_email", "n_phone", "n_ipv4"])
        # fingerprint the SCRUBBED text: exact dedup keys what ships
        return add_fingerprint(out, self.text_col)


# ------------------------------------------------------- stage plumbing


def _done(d: str) -> bool:
    return os.path.exists(os.path.join(d, "_SUCCESS"))


def _mark(d: str, meta: dict) -> None:
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, "_SUCCESS.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(d, "_SUCCESS"))  # atomic completion


def _meta(d: str) -> dict:
    with open(os.path.join(d, "_SUCCESS")) as f:
        return json.load(f)


def _fresh(d: str) -> str:
    if os.path.isdir(d):
        shutil.rmtree(d)  # drop partial output from a failed attempt
    os.makedirs(d, exist_ok=True)
    return d


def _parquet_rows(d: str) -> int:
    """Row count from parquet footers only (no data read)."""
    n = 0
    for root, _dirs, files in os.walk(d):
        for f in files:
            if f.endswith(".parquet"):
                n += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    return n


def _id_type(d: str, id_col: str) -> pa.DataType:
    """Arrow dtype of ``id_col`` from one parquet footer (no data read)."""
    for root, _dirs, files in os.walk(d):
        for f in files:
            if f.endswith(".parquet"):
                sch = pq.ParquetFile(os.path.join(root, f)).schema_arrow
                return sch.field(id_col).type
    return pa.large_string()


def _id_hash(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Deterministic uint64 hash of an id column: Knuth multiplicative
    for integer ids (mirrors q_train_split / its HUGEINT SQL oracle),
    fixed-key SipHash for everything else."""
    if pa.types.is_integer(arr.type):
        ids = arr.to_numpy(zero_copy_only=False).astype(np.uint64)
        return ids * np.uint64(0x9E3779B97F4A7C15)
    s = pc.cast(arr, pa.string()).to_pandas()
    return pd.util.hash_pandas_object(s, index=False).to_numpy().astype(np.uint64)


# --------------------------------------------------------------- funnel


def run_curation(
    input_path: str,
    out_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    langs: tuple = ("en",),
    min_quality: float = 0.3,
    max_dup_word_frac: float = 0.9,
    max_top_2gram_frac: float = 0.5,
    min_tokens: int = 5,
    max_tokens: int = 1_000_000,
    redact: bool = True,
    near_dup_threshold: float = 0.6,
    minhash_k: int = 128,
    benchmark_texts: pa.Table | None = None,
    contamination_ngram: int = 13,
    splits: tuple = (("train", 0.90), ("val", 0.05), ("test", 0.05)),
    pack_capacity: int | None = None,
    pack_groups: int = 64,
    concurrency: int = 4,
    resume: bool = True,
) -> CurationReport:
    """Run the full curation funnel over ``input_path`` (parquet/lance/
    JSONL — format autodetected), writing stage outputs under
    ``out_dir``:

    - ``filtered/``  — signal-filtered, PII-scrubbed, fingerprinted docs
    - ``deduped/``   — exact-dedup survivors
    - ``drops/``     — resolved near-dup + contamination drop ids
    - ``curated/split=*/`` — final corpus, hive-partitioned by split
      (with a ``pack_bin`` column when ``pack_capacity`` is set)

    ``resume=True`` skips any stage whose ``_SUCCESS`` manifest exists —
    the restart-after-failure path for a multi-day 100-TB run.
    ``benchmark_texts`` is the held-out eval set (a small table with
    ``text_col``); pass None to skip decontamination.
    """
    from ..sources.reader import read_auto

    rep = CurationReport(out_dir=out_dir)
    os.makedirs(out_dir, exist_ok=True)
    filtered_dir = os.path.join(out_dir, "filtered")
    deduped_dir = os.path.join(out_dir, "deduped")
    drops_dir = os.path.join(out_dir, "drops")
    curated_dir = os.path.join(out_dir, "curated")
    # OUTSIDE filtered/: the stage-2 re-read must see only stage-1 rows
    stats_dir = os.path.join(out_dir, "filter_stats")

    rep.n_input = read_auto(input_path).count()  # parquet footers only

    # ---- stage 1: signal scan + filter + scrub + fingerprint ----------
    if resume and _done(filtered_dir):
        rep.resumed_stages.append("filtered")
    else:
        _fresh(filtered_dir)
        # stage-1 re-run (restart or resume=False): stale side-output
        # partials from a prior attempt would be summed with the new ones,
        # inflating drop_reasons / n_filtered — clear them together.
        shutil.rmtree(stats_dir, ignore_errors=True)
        read_auto(input_path).map_batches(
            SignalFilter,
            fn_constructor_kwargs=dict(
                langs=langs, min_quality=min_quality,
                max_dup_word_frac=max_dup_word_frac,
                max_top_2gram_frac=max_top_2gram_frac,
                min_tokens=min_tokens, max_tokens=max_tokens,
                redact=redact, stats_dir=stats_dir,
                text_col=text_col, id_col=id_col,
            ),
            batch_format="pyarrow",
            concurrency=(1, concurrency),
        ).write_parquet(filtered_dir)
        _mark(filtered_dir, {"stage": "filtered"})
    # reason accounting from the side-output partials (tiny)
    reasons: dict[str, int] = {}
    if os.path.isdir(stats_dir):
        for f in os.listdir(stats_dir):
            if f.endswith(".parquet"):
                t = pq.read_table(os.path.join(stats_dir, f))
                for r, n in zip(t["reason"].to_pylist(), t["n"].to_pylist()):
                    reasons[r] = reasons.get(r, 0) + int(n)
    rep.drop_reasons = {r: reasons.get(r, 0) for r in REASONS}
    rep.n_filtered = reasons.get("__kept__", _parquet_rows(filtered_dir))

    # ---- stage 2: exact dedup (fingerprint keep-first) ----------------
    if resume and _done(deduped_dir):
        rep.resumed_stages.append("deduped")
        rep.n_exact_deduped = _meta(deduped_dir)["rows"]
    else:
        _fresh(deduped_dir)

        def keep_first(g: pa.Table) -> pa.Table:
            t = g.sort_by([("fingerprint", "ascending"), (id_col, "ascending")])
            fp = t["fingerprint"].to_numpy(zero_copy_only=False)
            first = np.ones(len(t), dtype=bool)
            first[1:] = fp[1:] != fp[:-1]
            return t.filter(pa.array(first)).drop(["__bucket__"])

        def add_bucket(b: pa.Table) -> pa.Table:
            fp = b["fingerprint"].to_numpy(zero_copy_only=False)
            return b.append_column(
                "__bucket__", pa.array((fp % 64).astype(np.int64))
            )

        (
            read_auto(filtered_dir)
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__bucket__")
            .map_groups(keep_first, batch_format="pyarrow")
            .write_parquet(deduped_dir)
        )
        _mark(deduped_dir, {"stage": "deduped", "rows": _parquet_rows(deduped_dir)})
        rep.n_exact_deduped = _meta(deduped_dir)["rows"]

    # ---- stage 3+4: near-dup drop-set + contamination set --------------
    if resume and _done(drops_dir):
        rep.resumed_stages.append("drops")
        drops = pq.read_table(os.path.join(drops_dir, "drops.parquet"))
    else:
        _fresh(drops_dir)
        deduped = read_auto(deduped_dir, columns=[id_col, text_col])
        # the LSH sig/banded tables ALWAYS spill as parquet under the run
        # dir (the 100-TB path: nothing pinned in the object store, a
        # retried stage rewrites its own namespaced subdirs idempotently —
        # minhash_lsh_candidates docstring).  _fresh(drops_dir) above
        # already cleared any prior attempt's spill, and the spill is
        # removed below once drops.parquet is marked done, so a RESUMED
        # run never re-reads stale signatures.
        spill = os.path.join(drops_dir, "_lsh_spill")
        pairs = minhash_lsh_candidates(
            deduped, text_col=text_col, id_col=id_col,
            k=minhash_k, concurrency=concurrency,
            spill_dir=spill,
        )
        pairs = pairs.filter(pc.greater_equal(pairs["est_jaccard"], near_dup_threshold))
        near_ids: list = []
        if pairs.num_rows:
            if pairs.num_rows > DISTRIBUTED_PAIRS_THRESHOLD:
                # pair set too large for driver union-find: resolve via
                # iterative min-label propagation; the driver collects only
                # the drop ids (∝ near-dups) for the broadcast filter
                cl_ds = dedup_clusters_distributed(pairs, id_col)
                drops_t = cl_ds.map_batches(
                    lambda b: b.filter(pc.invert(b["keep"])).select([id_col]),
                    batch_format="pyarrow",
                ).to_arrow_refs()
                import ray as _ray

                near_ids = [
                    i
                    for ref in drops_t
                    for i in _ray.get(ref)[id_col].to_pylist()
                ]
            else:
                clusters = dedup_clusters(pairs, id_col)
                near_ids = clusters.filter(pc.invert(clusters["keep"]))[id_col].to_pylist()
        cont_ids: list = []
        if benchmark_texts is not None and benchmark_texts.num_rows:
            grams = doc_word_ngrams(
                benchmark_texts, n=contamination_ngram, text_col=text_col
            )[0].unique()
            if len(grams) > BLOOM_GRAMS_THRESHOLD:
                # benchmark too large to broadcast as an array: Bloom path
                # (constant 1 MiB broadcast, zero false negatives; the
                # measured-FP over-drop is conservative and documented in
                # functions/text.find_contaminated_bloom)
                from ..functions.text import find_contaminated_bloom

                hit = find_contaminated_bloom(
                    deduped, grams, n=contamination_ngram,
                    id_col=id_col, text_col=text_col,
                )
            else:
                hit = find_contaminated(
                    deduped, grams, n=contamination_ngram,
                    id_col=id_col, text_col=text_col,
                )
            near = set(near_ids)
            cont_ids = [
                i for i in hit.to_pandas()[id_col].tolist() if i not in near
            ]
        # empty drop-set keeps the dataset's actual id dtype so the
        # broadcast is_in filter and downstream unions never see a
        # schema that differs from the non-empty case
        id_type = _id_type(deduped_dir, id_col)
        drops = pa.table(
            {
                id_col: pa.array(near_ids + cont_ids, type=id_type),
                "why": pa.array(
                    ["near_dup"] * len(near_ids) + ["contaminated"] * len(cont_ids),
                    type=pa.string(),
                ),
            }
        )
        pq.write_table(drops, os.path.join(drops_dir, "drops.parquet"))
        shutil.rmtree(spill, ignore_errors=True)  # spill consumed; keep the run dir lean
        _mark(drops_dir, {"stage": "drops"})
    why = drops["why"].to_pylist()
    rep.n_near_dup_dropped = why.count("near_dup")
    rep.n_contaminated_dropped = why.count("contaminated")

    # ---- stage 5: drop → split → pack → write ---------------------------
    if resume and _done(curated_dir):
        rep.resumed_stages.append("curated")
        m = _meta(curated_dir)
        rep.split_counts = m["split_counts"]
        rep.n_final = m["rows"]
        rep.n_pack_bins = m.get("n_pack_bins", 0)
        return rep
    _fresh(curated_dir)

    drop_ids = drops[id_col].combine_chunks()
    names = [s[0] for s in splits]
    bounds = np.cumsum([s[1] for s in splits]) / sum(s[1] for s in splits)

    def finalize(b: pa.Table) -> pa.Table:
        if len(drop_ids):
            b = b.filter(pc.invert(pc.is_in(b[id_col], value_set=drop_ids)))
        h = _id_hash(b[id_col])
        frac = (h >> np.uint64(40)).astype(np.float64) / float(1 << 24)
        split = np.array(names, dtype=object)[np.searchsorted(bounds, frac, side="right").clip(max=len(names) - 1)]
        b = b.append_column("split", pa.array(split, type=pa.string()))
        if pack_capacity is not None:
            # block-boundary-independent pack groups: same id → same group
            grp = (_id_hash(b[id_col]) % np.uint64(pack_groups)).astype(np.int64)
            b = b.append_column("pack_group", pa.array(grp))
        return b

    final = read_auto(deduped_dir).map_batches(finalize, batch_format="pyarrow")

    n_pack_bins = 0
    if pack_capacity is not None:

        def pack(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(id_col).reset_index(drop=True)
            bins = pack_greedy(g["n_bpe_tokens"].to_numpy(), pack_capacity)
            g["pack_bin"] = [
                f"{s}/{p}/{b}" for s, p, b in zip(g["split"], g["pack_group"], bins)
            ]
            return g.drop(columns=["pack_group"])

        final = final.groupby(["split", "pack_group"]).map_groups(
            pack, batch_format="pandas"
        )

    final.write_parquet(curated_dir, partition_cols=["split"])

    split_counts = {name: 0 for name in names}  # stable column set
    split_counts.update(
        {
            e.split("=", 1)[1]: _parquet_rows(os.path.join(curated_dir, e))
            for e in os.listdir(curated_dir)
            if e.startswith("split=")
        }
    )
    rep.split_counts = split_counts
    rep.n_final = sum(split_counts.values())
    if pack_capacity is not None:
        import ray.data as rd

        n_pack_bins = len(
            rd.read_parquet(curated_dir, columns=["pack_bin"]).unique("pack_bin")
        )
    rep.n_pack_bins = n_pack_bins
    _mark(
        curated_dir,
        {
            "stage": "curated",
            "rows": rep.n_final,
            "split_counts": split_counts,
            "n_pack_bins": n_pack_bins,
        },
    )
    return rep
