"""Deterministic synthetic interleaved text+media document table.

Shape per ``BASELINE.json`` ``input_hint`` / FIXTURES.md §1:

    doc_id:        string           (unique; violation mode: duplicates)
    spans:         list<struct<kind, text, media_ref, offset:int32>>
    partition_id:  int32            (contiguous chunks; checkpoint unit)

plus a ``media_catalog`` side table (FIXTURES.md §2) and a ground-truth
dict naming every injected violation, so tests can assert exact
violation rows.  Generation is numpy-vectorized (pool-based text,
indexed media refs) — SF=0.1 (~600k docs) generates in seconds.

Violation classes (rates independent, deterministic under ``seed``):
``dup_doc_id, bad_kind, bad_media_ref_format, dangling_media_ref,
null_text, offset_disorder, empty_spans``.  ``skew`` > 0 makes media_ref
choice Zipf-distributed (hot keys exercise salted shuffles).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

KINDS = ("text", "image", "audio", "video")
_WORDS = (
    "the fast key order sort table scan merge part window small hash join "
    "spark group query row data slow filter customer line batch value stream "
    "agg column vector media span text image audio video token shard block"
).split()

DEFAULT_RATES = {
    "dup_doc_id": 0.002,
    "bad_kind": 0.002,
    "bad_media_ref_format": 0.002,
    "dangling_media_ref": 0.003,
    "null_text": 0.002,
    "offset_disorder": 0.002,
    "empty_spans": 0.001,
}


@dataclass
class GeneratedData:
    documents: pa.Table
    catalog: pa.Table
    expected: dict = field(default_factory=dict)  # violation class -> sorted doc_ids


def _make_text_pool(
    rng: np.random.RandomState, n: int = 4096, words_per_span: tuple[int, int] = (3, 12)
) -> np.ndarray:
    words = np.array(_WORDS)
    lens = rng.randint(words_per_span[0], words_per_span[1], size=n)
    return np.array([" ".join(rng.choice(words, size=ln)) for ln in lens])


def _media_uuid(i: int) -> str:
    return str(uuid.UUID(int=(0x9E3779B97F4A7C15 * (i + 1)) & ((1 << 128) - 1)))


def generate(
    n_docs: int = 2000,
    seed: int = 42,
    rates: dict | None = None,
    skew: float = 0.0,
    n_parts: int = 8,
    catalog_size: int | None = None,
    words_per_span: tuple[int, int] = (3, 12),
) -> GeneratedData:
    rng = np.random.RandomState(seed)
    rates = {**DEFAULT_RATES, **(rates or {})}

    # ---------- catalog + media_ref pools -------------------------------
    catalog_size = catalog_size or max(64, n_docs // 4)
    n_dangling_pool = max(8, catalog_size // 10)
    all_refs = np.array(
        ["media://" + _media_uuid(i) for i in range(catalog_size + n_dangling_pool)]
    )
    catalog_refs = all_refs[:catalog_size]  # refs present in the catalog
    dangling_refs = all_refs[catalog_size:]  # never in the catalog

    cat_kinds = np.array(KINDS[1:])[rng.randint(0, 3, size=catalog_size)]
    catalog = pa.table(
        {
            "media_ref": pa.array(catalog_refs),
            "media_kind": pa.array(cat_kinds),
            "bytes": pa.array(rng.randint(1, 10_000_000, size=catalog_size).astype(np.int64)),
        }
    )

    # ---------- per-doc structure ---------------------------------------
    doc_ids = np.array([f"doc-{seed}-{i:010d}" for i in range(n_docs)])
    n_spans = 1 + rng.poisson(4, size=n_docs)

    empty_idx = _pick(rng, n_docs, rates["empty_spans"])
    n_spans[empty_idx] = 0

    total = int(n_spans.sum())
    doc_of_span = np.repeat(np.arange(n_docs), n_spans)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_spans, out=offsets[1:])

    # All string columns are assembled by POOL INDEX and materialized with
    # one vectorized ``pc.take`` each (null index → null) — building
    # millions of Python string objects and converting them to Arrow is
    # 10-30× slower, catastrophically so under concurrent generation.

    # kinds: 70% text, rest media; pool slot 4 = the bad-kind injection
    kind_idx = rng.choice(4, size=total, p=[0.7, 0.15, 0.1, 0.05]).astype(np.int32)
    kind_pool = pa.array(list(KINDS) + ["bogus"])

    # text pool indices (-1 → null)
    pool = _make_text_pool(rng, words_per_span=words_per_span)
    text_idx = np.full(total, -1, dtype=np.int32)
    tmask = kind_idx == 0
    text_idx[tmask] = rng.randint(0, len(pool), size=int(tmask.sum()))

    # media-ref pool = catalog ++ dangling ++ [malformed]; media spans pick
    # catalog entries (zipf-skewed when requested)
    ref_pool = pa.array(list(all_refs) + ["media://not-a-valid-uuid"])
    MALFORMED = len(all_refs)
    ref_idx = np.full(total, -1, dtype=np.int32)
    mmask = ~tmask
    n_media = int(mmask.sum())
    if n_media:
        if skew > 0:
            ranks = rng.zipf(1.0 + skew, size=n_media) - 1
            pick = np.minimum(ranks, catalog_size - 1)
        else:
            pick = rng.randint(0, catalog_size, size=n_media)
        ref_idx[mmask] = pick

    # offsets strictly increasing within doc: per-span position index
    span_offsets = (np.arange(total) - np.repeat(offsets[:-1], n_spans)).astype(np.int32)

    # ---------- violation injection -------------------------------------
    expected: dict[str, list[str]] = {}

    dup_idx = _pick(rng, n_docs, rates["dup_doc_id"])
    dup_idx = dup_idx[dup_idx > 0]
    # drop adjacent picks so overwrites can't cancel each other out
    if len(dup_idx) > 1:
        dup_idx = dup_idx[np.concatenate([[True], np.diff(dup_idx) > 1])]
    doc_ids[dup_idx] = doc_ids[dup_idx - 1]  # duplicate the previous doc's id
    # ground truth from the FINAL id array: ids appearing more than once
    uniq_ids, cnts = np.unique(doc_ids, return_counts=True)
    expected["dup_doc_id"] = sorted(uniq_ids[cnts > 1])

    bad_kind_docs = _pick_docs_with_spans(rng, n_spans, rates["bad_kind"])
    for d in bad_kind_docs:
        s = offsets[d] + rng.randint(0, n_spans[d])
        kind_idx[s] = 4  # "bogus"

    bad_fmt_docs = _pick_docs_with_spans(rng, n_spans, rates["bad_media_ref_format"])
    for d in bad_fmt_docs:
        s = offsets[d] + rng.randint(0, n_spans[d])
        kind_idx[s] = 1  # image
        text_idx[s] = -1
        ref_idx[s] = MALFORMED

    dang_docs = _pick_docs_with_spans(rng, n_spans, rates["dangling_media_ref"])
    for d in dang_docs:
        s = offsets[d] + rng.randint(0, n_spans[d])
        kind_idx[s] = 1  # image
        text_idx[s] = -1
        ref_idx[s] = catalog_size + rng.randint(0, n_dangling_pool)

    null_text_docs = _pick_docs_with_spans(rng, n_spans, rates["null_text"])
    for d in null_text_docs:
        s = offsets[d] + rng.randint(0, n_spans[d])
        kind_idx[s] = 0  # text
        text_idx[s] = -1
        ref_idx[s] = -1

    dis_docs = _pick_docs_with_spans(rng, n_spans, rates["offset_disorder"], min_spans=2)
    for d in dis_docs:
        s = offsets[d] + rng.randint(0, n_spans[d] - 1)
        span_offsets[s], span_offsets[s + 1] = span_offsets[s + 1], span_offsets[s]

    # ---------- ground truth from the FINAL arrays -----------------------
    # injections can land on the same span at independent rates (a later
    # class overwrites an earlier one); expectations therefore derive from
    # the final state, not from the picked doc lists
    def _docs_with(span_mask: np.ndarray) -> list[str]:
        hit = np.zeros(n_docs, dtype=bool)
        hit[doc_of_span[span_mask]] = True
        return sorted(set(doc_ids[hit]))

    is_media_k = (kind_idx >= 1) & (kind_idx <= 3)
    expected["bad_kind"] = _docs_with(kind_idx == 4)
    expected["bad_media_ref_format"] = _docs_with(is_media_k & (ref_idx == MALFORMED))
    expected["dangling_media_ref"] = _docs_with(is_media_k & (ref_idx >= catalog_size) & (ref_idx < MALFORMED))
    expected["null_text"] = _docs_with((kind_idx == 0) & (text_idx == -1))
    disorder = np.zeros(total, dtype=bool)
    if total > 1:
        same_doc = doc_of_span[1:] == doc_of_span[:-1]
        disorder[1:] = same_doc & (span_offsets[1:] <= span_offsets[:-1])
    expected["offset_disorder"] = _docs_with(disorder)
    expected["empty_spans"] = sorted(set(doc_ids[empty_idx]))

    # ---------- assemble Arrow table ------------------------------------
    span_type = pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
    import pyarrow.compute as pc

    def _take(pool_arr: pa.Array, idx: np.ndarray) -> pa.Array:
        return pc.take(pool_arr, pa.array(idx, mask=idx < 0))

    pool_pa = pa.array(pool.tolist())
    flat = pa.StructArray.from_arrays(
        [
            _take(kind_pool, kind_idx),
            _take(pool_pa, text_idx),
            _take(ref_pool, ref_idx),
            pa.array(span_offsets, type=pa.int32()),
        ],
        fields=list(span_type),
    )
    spans = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), flat)
    partition_id = (np.arange(n_docs) * n_parts // max(1, n_docs)).astype(np.int32)

    documents = pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.string()),
            "spans": spans,
            "partition_id": pa.array(partition_id, type=pa.int32()),
        }
    )
    return GeneratedData(documents, catalog, expected)


def interleave_from_documents(
    docs: pa.Table, seed: int = 42, n_parts: int = 8, dangling_rate: float = 0.01
) -> GeneratedData:
    """Deterministically re-shape the TPC-H-ish ``documents`` table
    (doc_id,text,lang,source,n_chars — TESTDATA.md) into the interleaved
    ``input_hint`` shape: each doc's text split into ~3 text spans plus
    one media span whose ref hashes off the doc_id; a fraction of refs
    is withheld from the catalog (expected dangling set).

    Fully vectorized: the span text child is built ZERO-COPY by offset
    arithmetic over the source column's own data buffer (each piece is a
    contiguous byte range of the original string; thirds computed on
    byte offsets — identical to code points for this ASCII corpus, and
    guarded by an exact-length check with a code-point fallback), and
    kind/ref children are pool-index ``pc.take``s like ``generate()``.
    """
    import pyarrow.compute as pc

    rng = np.random.RandomState(seed)
    n = len(docs)
    did_col = docs["doc_id"]
    doc_ids = np.array(
        pc.binary_join_element_wise("doc-", pc.cast(did_col, pa.string()), "").to_pylist()
    )
    media_kind_pool = np.array(KINDS[1:])
    ref_ids = rng.permutation(n)

    ta = docs["text"]
    if isinstance(ta, pa.ChunkedArray):
        ta = ta.combine_chunks()
    ta = ta.fill_null("")
    large = pa.types.is_large_string(ta.type)
    otype = np.int64 if large else np.int32
    bufs = ta.buffers()  # [validity, offsets, data]
    offs = np.frombuffer(bufs[1], dtype=otype)[ta.offset : ta.offset + n + 1].astype(np.int64)

    # ASCII guard: byte-thirds == code-point-thirds only when 1 byte = 1 cp
    n_bytes = int(offs[-1] - offs[0])
    n_cp = int(pc.sum(pc.utf8_length(ta)).as_py() or 0)
    if n_bytes != n_cp:  # non-ASCII corpus: split on code points (slow path)
        texts = ta.to_pandas().to_numpy()
        pieces_all = []
        for t in texts:
            third = max(1, len(t) // 3)
            ps = [p for p in (t[:third], t[third : 2 * third], t[2 * third :]) if p] if t else []
            pieces_all.append(ps)
        n_pieces = np.array([len(p) for p in pieces_all], dtype=np.int64)
        text_vals = pa.array(
            [x for ps in pieces_all for x in (*ps, None)], type=pa.string()
        )
    else:
        b0, b3 = offs[:-1], offs[1:]
        third = np.maximum(1, (b3 - b0) // 3)
        b1 = np.minimum(b0 + third, b3)
        b2 = np.minimum(b0 + 2 * third, b3)
        cand = np.stack([b0, b1, b2, b3], axis=1)  # candidate piece starts
        keep = np.concatenate(
            [cand[:, 1:] > cand[:, :-1], np.ones((n, 1), dtype=bool)], axis=1
        )  # 3 piece-nonempty flags + always-keep media slot
        n_pieces = keep[:, :3].sum(axis=1)
        child_starts = cand[keep]  # row-major → doc order preserved
        child_offsets = np.concatenate([child_starts, offs[-1:]]).astype(otype)
        total0 = len(child_starts)
        valid = np.ones(total0, dtype=bool)
        valid[np.cumsum(n_pieces + 1) - 1] = False  # media slot text = null
        cls = pa.LargeStringArray if large else pa.StringArray
        text_vals = cls.from_buffers(
            total0,
            pa.py_buffer(child_offsets.tobytes()),
            bufs[2],  # SHARED source data buffer — no string copies
            pa.py_buffer(np.packbits(valid, bitorder="little").tobytes()),
            int((~valid).sum()),
        )

    n_spans = n_pieces + 1
    total = int(n_spans.sum())
    doc_of = np.repeat(np.arange(n), n_spans)
    span_offsets = (np.arange(total) - np.repeat(np.cumsum(n_spans) - n_spans, n_spans)).astype(np.int32)
    is_media = span_offsets == n_pieces[doc_of].astype(np.int32)

    kind_pool = pa.array(list(KINDS))
    kind_idx = np.where(is_media, 1 + (doc_of % 3), 0).astype(np.int32)
    ref_pool = pa.array(["media://" + _media_uuid(int(r)) for r in ref_ids])
    ref_idx = np.where(is_media, doc_of, -1).astype(np.int32)

    span_type = pa.struct(
        [("kind", pa.string()), ("text", pa.string()), ("media_ref", pa.string()), ("offset", pa.int32())]
    )
    flat = pa.StructArray.from_arrays(
        [
            pc.take(kind_pool, pa.array(kind_idx)),
            text_vals,
            pc.take(ref_pool, pa.array(ref_idx, mask=ref_idx < 0)),
            pa.array(span_offsets, type=pa.int32()),
        ],
        fields=list(span_type),
    )
    list_offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(n_spans, out=list_offsets[1:])
    spans = pa.ListArray.from_arrays(pa.array(list_offsets, type=pa.int32()), flat)
    partition_id = (np.arange(n) * n_parts // max(1, n)).astype(np.int32)
    documents = pa.table(
        {
            "doc_id": pa.array(doc_ids),
            "spans": spans,
            "partition_id": pa.array(partition_id),
        }
    )
    # catalog: all refs except a deterministic dangling subset
    all_ref_ids = np.arange(n)
    n_dangling = int(round(n * dangling_rate))
    dangling = set(rng.choice(n, size=n_dangling, replace=False).tolist())
    cat_ids = np.array([r for r in all_ref_ids if r not in dangling])
    cat_refs = np.array(["media://" + _media_uuid(int(r)) for r in cat_ids])
    catalog = pa.table(
        {
            "media_ref": pa.array(cat_refs),
            "media_kind": pa.array(media_kind_pool[cat_ids % 3]),
            "bytes": pa.array(rng.randint(1, 1_000_000, size=len(cat_ids)).astype(np.int64)),
        }
    )
    dang_docs = sorted(doc_ids[np.isin(ref_ids, list(dangling))])
    return GeneratedData(documents, catalog, {"dangling_media_ref": dang_docs})


def _pick(rng, n, rate) -> np.ndarray:
    k = int(round(n * rate))
    return np.sort(rng.choice(n, size=k, replace=False)) if k else np.array([], dtype=np.int64)


def _pick_docs_with_spans(rng, n_spans, rate, min_spans=1) -> np.ndarray:
    eligible = np.where(n_spans >= min_spans)[0]
    k = int(round(len(n_spans) * rate))
    if not k or not len(eligible):
        return np.array([], dtype=np.int64)
    return np.sort(rng.choice(eligible, size=min(k, len(eligible)), replace=False))


def write_dataset(
    out_dir: str, data: GeneratedData, n_parts: int | None = None,
    sidecars: bool = True,
) -> dict:
    """Write hive-partitioned documents (one directory per partition_id —
    the checkpoint/resume unit), the catalog, and ground truth.  Returns
    paths dict.

    ``sidecars=False`` skips the shared catalog/ground-truth files: when
    several generator tasks write chunks of one corpus concurrently
    (bench ``mult`` > 1), exactly ONE of them may write the sidecars —
    concurrent writes to the same parquet path interleave and corrupt it
    (the media_ref pool is deterministic per chunk size, so any single
    chunk's catalog carries the full ref set).  Sidecar writes go through
    a temp file + ``os.replace`` so a crashed writer never leaves a
    half-written catalog behind."""
    os.makedirs(out_dir, exist_ok=True)
    docs_dir = os.path.join(out_dir, "documents")
    pids = data.documents["partition_id"].to_numpy()
    for pid in np.unique(pids):
        part_dir = os.path.join(docs_dir, f"partition_id={pid}")
        os.makedirs(part_dir, exist_ok=True)
        mask = pa.array(pids == pid)
        pq.write_table(
            data.documents.filter(mask).drop(["partition_id"]),
            os.path.join(part_dir, "part.parquet"),
        )
    cat_path = os.path.join(out_dir, "media_catalog.parquet")
    exp_path = os.path.join(out_dir, "expected_violations.json")
    if sidecars:
        tmp = cat_path + f".tmp{os.getpid()}"
        pq.write_table(data.catalog, tmp)
        os.replace(tmp, cat_path)
        tmp = exp_path + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(data.expected, f, indent=1, sort_keys=True)
        os.replace(tmp, exp_path)
    return {"documents": docs_dir, "catalog": cat_path, "expected": exp_path}
