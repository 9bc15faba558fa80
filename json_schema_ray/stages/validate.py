"""Span-level validation stage for interleaved documents.

One ``map_batches`` actor-pool stage makes a SINGLE wide scan of the
input and emits a narrow **results stream** containing three record
kinds (the tabular analog of the reference's 4-kind result algebra,
``js/results/IValidationResult.java:15-20``):

- ``violation`` rows — (partition_id, doc_id, span_index, constraint_id,
  error_type, actual); ERROR results, at span granularity (the
  reference's instance JSON Pointer becomes (doc_id, span_index)).
- ``partial``  rows — per-(partition × constraint) failing-doc counts +
  an ``__all__`` row with per-partition doc totals; CONTAINER/AND-fold
  reduced per batch (combiner) so the downstream groupby shuffles a few
  rows per batch, never per doc.
- ``sketch``  rows — serialized HLL / t-digest partials per feature
  (ANNOTATION analog: what was observed, feeding the drift/stats merge).

All span checks are vectorized over the FLATTENED child array of the
``spans`` list column (``pc.list_flatten`` + offset-segment reductions)
— the Ray-Data mapping of the reference's parallel-array validation
(``js/compilers/v2020/Items2020CompilerFactory.java:57-68``): block =
unit of parallelism, elements = numpy lanes.

The compiled plan + broadcast catalog ride in actor state: built once
per actor in ``__init__`` (``ray.put`` on the driver, ``ray.get`` here),
reused for every batch — the reference's compile-once / validate-many
contract (``README.md:301-303``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..kernels.formats import ANCHORED_REGEX
from ..state.hll import HyperLogLog
from ..state.tdigest import TDigest

KINDS = ("text", "image", "audio", "video")
MEDIA_REF_RE = ANCHORED_REGEX["media-ref"]

RESULT_SCHEMA = pa.schema(
    [
        ("record_type", pa.string()),
        ("partition_id", pa.int32()),
        ("doc_id", pa.string()),
        ("span_index", pa.int32()),
        ("constraint_id", pa.string()),
        ("error_type", pa.string()),
        ("expected", pa.string()),
        ("actual", pa.string()),
        ("message", pa.string()),
        ("n_docs", pa.int64()),
        ("n_bad", pa.int64()),
        ("feature", pa.string()),
        ("sketch_kind", pa.string()),
        ("blob", pa.binary()),
    ]
)

# per-constraint violation metadata: error_type, expected (SURVEY §1.2's
# (…, expected, actual) contract), and the rendered-message pieces from
# spec/errors.ERROR_MESSAGES templates ({0}=actual pre-split so rendering
# is one vectorized binary_join per chunk, never per-row Python):
# (error_type, expected, msg_prefix, msg_suffix, insert_actual)
CONSTRAINT_META: dict[str, tuple[str, str, str, str, bool]] = {
    "spans[].kind/enum": (
        "ENUM", "['text', 'image', 'audio', 'video']",
        "The value ", " not declared in enum ['text', 'image', 'audio', 'video']", True,
    ),
    "spans[].text/required": (
        "REQUIRED", "[text]", "Some required properties [text] are missing", "", False,
    ),
    "spans[].media_ref/format": (
        "FORMAT", "media-ref", "Value ", " not conform to format media-ref", True,
    ),
    "spans[].offset/order": (
        "ORDER", "strictly increasing offset",
        "Value ", " breaks required ordering (strictly increasing offset)", True,
    ),
    "spans[].media_ref/referential": (
        "REFERENTIAL", "in media catalog", "Value ", " has no match in catalog media", True,
    ),
    "doc_id/required": (
        "REQUIRED", "[doc_id]", "Some required properties [doc_id] are missing", "", False,
    ),
    "spans/minItems": (
        "MIN_ITEMS", "minItems=1", "Required minimum items amount is 1, Actual size: 0", "", False,
    ),
    # extended (compute-weighted) battery — content checks over text spans
    "spans[].text/quality": (
        "QUALITY", "quality_score >= 0.05",
        "Text quality score ", " below floor 0.05", True,
    ),
    "spans[].text/maxTokens": (
        "MAX_TOKENS", "<= 4096 BPE tokens", "Token count ", " exceeds budget 4096", True,
    ),
}


def _empty_columns(n: int) -> dict:
    return {
        "record_type": [""] * n,
        "partition_id": np.full(n, -1, dtype=np.int32),
        "doc_id": [None] * n,
        "span_index": np.full(n, -1, dtype=np.int32),
        "constraint_id": [None] * n,
        "error_type": [None] * n,
        "expected": [None] * n,
        "actual": [None] * n,
        "message": [None] * n,
        "n_docs": np.zeros(n, dtype=np.int64),
        "n_bad": np.zeros(n, dtype=np.int64),
        "feature": [None] * n,
        "sketch_kind": [None] * n,
        "blob": [None] * n,
    }


def _rows_to_table(rows: list[dict]) -> pa.Table:
    cols = _empty_columns(len(rows))
    for i, r in enumerate(rows):
        for k, v in r.items():
            cols[k][i] = v
    return pa.table(
        {f.name: pa.array(cols[f.name], type=f.type) for f in RESULT_SCHEMA}
    )


def _uniq_table(doc_id) -> pa.Table:
    """Per-batch pre-counted uniqueness partials, vectorized: one
    ``record_type='uniq'`` row per distinct doc_id in the batch with its
    within-batch count in ``n_docs`` (nulls count as a value, matching
    stages/shuffle's ``value_counts`` mapper).  Emitted in-scan so the
    uniqueness check needs NO second read of the input — the folded
    map-reduce (stages/shuffle.find_duplicate_keys_folded) consumes these
    rows straight off the scan's output blocks."""
    vc = pc.value_counts(doc_id)
    vals = pc.cast(vc.field("values"), pa.string())
    cnts = pc.cast(vc.field("counts"), pa.int64())
    k = len(vals)
    cols = {}
    for f in RESULT_SCHEMA:
        if f.name == "record_type":
            cols[f.name] = pa.array(np.full(k, "uniq"), type=pa.string())
        elif f.name == "doc_id":
            cols[f.name] = vals
        elif f.name == "n_docs":
            cols[f.name] = cnts
        else:
            cols[f.name] = pa.nulls(k, f.type)
    return pa.table(cols).cast(RESULT_SCHEMA)


class SpanValidator:
    """Callable class for ``ds.map_batches(SpanValidator, concurrency=N,
    batch_format="pyarrow")``.  Stateless w.r.t. data (pure per batch);
    holds only the immutable compiled plan + catalog key set."""

    def __init__(
        self,
        catalog_ref=None,  # ray.ObjectRef of a list/ndarray of valid media refs, or the values themselves
        violation_cap: int | None = 10_000,
        with_sketches: bool = True,
        viol_dir: str | None = None,
        extended_checks: bool | str = False,
        emit_uniq: bool = False,
    ):
        import ray

        refs = catalog_ref
        if refs is not None and isinstance(refs, ray.ObjectRef):
            refs = ray.get(refs)
        self.catalog = pa.array(refs, type=pa.string()) if refs is not None else None
        self.cap = violation_cap
        self.with_sketches = with_sketches
        # side-output mode: each task writes its own violation rows straight
        # into the hive-partitioned output (deterministic content-derived
        # filenames → a retried task overwrites its own file, idempotent)
        # and emits only a per-partition ``__viol_rows__`` count partial —
        # the driver never touches a violation row and the pipeline needs
        # no second pass over the results stream.
        self.viol_dir = viol_dir
        # extended = the compute-weighted content battery (quality score,
        # token budget, winnowing content fingerprints): real training-data
        # curation checks whose regex/rolling-hash cost per byte dominates
        # parquet decode, so cluster-scaling is visible above the single-VM
        # memory-bandwidth floor (BASELINE.md scaling protocol).
        # "regex" = same battery minus the winnowing/content_fp pass — this
        # host's hypervisor throttles guest memory bandwidth in bursts
        # (BASELINE.md round-3 isolation: RE2 passes scale ~90% at 24-way
        # even in sick phases while the winnow kernel swings 0.7-18.9 MB/s
        # across simultaneous tasks), so the regex profile measures the
        # scaling of the stages the host lets scale.
        self.extended = extended_checks
        # emit per-batch value_counts(doc_id) partials in the result stream
        # ('uniq' rows) so the uniqueness check rides the wide scan instead
        # of a second narrow read — see pipelines/validation fold_uniq
        self.emit_uniq = emit_uniq

    # ------------------------------------------------------------------

    _VIOL_COLS = [
        "doc_id", "span_index", "constraint_id", "error_type",
        "expected", "actual", "message",
    ]

    def _write_violations(self, vt: pa.Table, rows: list[dict]) -> None:
        import hashlib
        import os

        import pyarrow.parquet as pq

        pids = np.unique(pc.cast(vt["partition_id"], pa.int32()).to_numpy(zero_copy_only=False))
        for p in pids:
            sub = vt.filter(pc.equal(vt["partition_id"], pa.scalar(int(p), type=pa.int32())))
            d = os.path.join(self.viol_dir, f"partition_id={int(p)}")
            os.makedirs(d, exist_ok=True)
            # filename = sha1 over the FULL batch content (every key column,
            # every row) — two same-partition batches that share a leading
            # row and row count must still get distinct files, else one
            # silently overwrites the other while __viol_rows__ counts both.
            # Content-derived (not random) so a retried task rewrites its own
            # file, keeping the write idempotent.
            key = pc.binary_join_element_wise(
                pc.cast(sub["doc_id"], pa.string()).fill_null(""),
                pc.cast(sub["span_index"], pa.string()),
                pc.cast(sub["constraint_id"], pa.string()).fill_null(""),
                pa.scalar("\x1f"),
            ).combine_chunks()
            h = hashlib.sha1(str(int(p)).encode())
            h.update("\x1e".join(key.to_pylist()).encode())
            name = h.hexdigest()[:16]
            pq.write_table(sub.select(self._VIOL_COLS), os.path.join(d, f"part-{name}.parquet"))
            rows.append(
                {"record_type": "partial", "partition_id": int(p),
                 "constraint_id": "__viol_rows__", "n_docs": 0, "n_bad": int(len(sub))}
            )

    # ------------------------------------------------------------------

    def _extended_checks(self, text, is_text: np.ndarray, sketch_rows: list[dict]):
        """Compute-weighted content battery over the flat text child:
        quality scoring (4 regex-count passes + composite), BPE-ish token
        budget, and winnowing content fingerprints (rolling k-gram hash,
        SIGMOD'03) feeding tokens t-digest + content_fp HLL sketch
        partials.  All vectorized — the per-byte cost is regex + rolling
        hash arithmetic, not decode."""
        from ..functions.text import TOKEN_RE, WS_TOKEN_RE, STOPWORDS, add_winnow_fingerprints
        from ..state.tdigest import TDigest

        tq = text.fill_null("")
        f64 = lambda a: pc.cast(a, pa.float64()).to_numpy(zero_copy_only=False)  # noqa: E731
        n_chars = f64(pc.utf8_length(tq))
        n_tok = f64(pc.count_substring_regex(tq, WS_TOKEN_RE))
        n_bpe = f64(pc.count_substring_regex(tq, TOKEN_RE))
        n_punct = f64(pc.count_substring_regex(tq, r"[^\w\s]"))
        stop_pat = r"(?i)\b(?:" + "|".join(STOPWORDS) + r")\b"
        n_stop = f64(pc.count_substring_regex(tq, stop_pat))

        tok = np.maximum(n_tok, 1.0)
        punct_ratio = n_punct / np.maximum(n_chars, 1.0)
        stop_ratio = n_stop / tok  # feature parity with functions/text.py
        mean_word_len = np.maximum(n_chars - (tok - 1), 0) / tok
        len_score = np.clip(n_chars / 500.0, 0, 1)
        word_len_score = np.exp(-0.5 * ((mean_word_len - 5.0) / 3.0) ** 2)
        score = (
            0.4 * len_score
            + 0.3 * (1 - np.clip(punct_ratio * 5, 0, 1))
            + 0.3 * word_len_score
        )
        quality_ok = ~is_text | (score >= 0.05)
        tokens_ok = ~is_text | (n_bpe <= 4096)

        if self.with_sketches:
            if self.extended != "regex":  # winnow pass: bandwidth-bound, see __init__
                wt = add_winnow_fingerprints(pa.table({"text": tq}), "text", k=8, window=16)
                col = wt["winnow"]
                col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                fps = np.asarray(col.flatten()).astype(np.uint64)
                # splitmix-style finalizer: rolling-hash high bits are weak
                # and HLL registers index off them
                fps = fps ^ (fps >> np.uint64(30))
                fps = fps * np.uint64(0xBF58476D1CE4E5B9)
                fps = fps ^ (fps >> np.uint64(27))
                hll_fp = HyperLogLog().add_hashes(fps)
            else:
                hll_fp = HyperLogLog()
            td_tok = TDigest().add_values(n_bpe[is_text]) if is_text.any() else TDigest()
            # stop_ratio feeds its own drift sketch: stopword-density
            # shift is a classic corpus-drift signal (e.g. code or
            # boilerplate creeping into a prose corpus), and it gives the
            # n_stop pass a real consumer — the quality score itself
            # keeps functions/text.py's formula (stop term weight 0).
            td_stop = (
                TDigest().add_values(stop_ratio[is_text]) if is_text.any() else TDigest()
            )
            sketch_rows.extend(
                [
                    {"record_type": "sketch", "feature": "content_fp",
                     "sketch_kind": "hll", "blob": hll_fp.to_bytes()},
                    {"record_type": "sketch", "feature": "bpe_tokens",
                     "sketch_kind": "tdigest", "blob": td_tok.to_bytes()},
                    {"record_type": "sketch", "feature": "stop_ratio",
                     "sketch_kind": "tdigest", "blob": td_stop.to_bytes()},
                ]
            )
        return [
            ("spans[].text/quality", "QUALITY", quality_ok,
             pa.array(np.round(score, 4)).cast(pa.string()) if not quality_ok.all() else None),
            ("spans[].text/maxTokens", "MAX_TOKENS", tokens_ok,
             pa.array(n_bpe.astype(np.int64)).cast(pa.string()) if not tokens_ok.all() else None),
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return _rows_to_table([])
        doc_id = batch["doc_id"].combine_chunks() if isinstance(batch["doc_id"], pa.ChunkedArray) else batch["doc_id"]
        spans = batch["spans"].combine_chunks() if isinstance(batch["spans"], pa.ChunkedArray) else batch["spans"]
        if "partition_id" in batch.column_names:
            pid = pc.cast(batch["partition_id"], pa.int32()).to_numpy(zero_copy_only=False)
        else:
            pid = np.zeros(n, dtype=np.int32)

        off = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lo, hi = off[0], off[-1]
        # CRITICAL: slice the child array BEFORE any compute.  A batch that
        # is a zero-copy slice of a bigger block (the normal case under
        # batch_size re-batching) exposes the PARENT's full child array via
        # .values — computing kernels on it and indexing [lo:hi] afterwards
        # would redo the whole block's work for every one of its slices.
        flat = spans.values.slice(lo, hi - lo)  # zero-copy view
        kind = pc.struct_field(flat, "kind")
        text = pc.struct_field(flat, "text")
        mref = pc.struct_field(flat, "media_ref")
        soff = pc.struct_field(flat, "offset")

        def np_bool(arr):
            return arr.fill_null(False).to_numpy(zero_copy_only=False)

        valid = lambda a: pc.is_valid(a).to_numpy(zero_copy_only=False)  # noqa: E731

        n_spans = np.diff(off)
        doc_idx_of_span = np.repeat(np.arange(n), n_spans)  # aligned to flat
        span_pos = np.arange(hi - lo) - np.repeat(off[:-1] - lo, n_spans)

        kind_np_ok = np_bool(pc.is_in(kind, value_set=pa.array(KINDS)))
        is_text = np_bool(pc.equal(kind, "text"))
        # media span = kind ∈ {image,audio,video}; an invalid kind triggers
        # ONLY the enum constraint (one violation per root cause)
        is_media = np_bool(pc.is_in(kind, value_set=pa.array(KINDS[1:])))
        text_ok = ~is_text | valid(text)
        mref_present = valid(mref)
        mref_fmt = np_bool(pc.match_substring_regex(mref, MEDIA_REF_RE))
        media_ok = ~is_media | (mref_present & mref_fmt)

        # strictly increasing offsets within each doc
        so = soff.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
        order_ok = np.ones(hi - lo, dtype=bool)
        if hi - lo > 1:
            inc = so[1:] > so[:-1]
            same_doc = doc_idx_of_span[1:] == doc_idx_of_span[:-1]
            order_ok[1:] = inc | ~same_doc

        if self.catalog is not None:
            in_cat = np_bool(pc.is_in(mref, value_set=self.catalog))
            ref_ok = ~is_media | ~mref_fmt | in_cat  # only well-formed refs checked
        else:
            ref_ok = np.ones(hi - lo, dtype=bool)

        # doc-level checks
        did_ok = valid(doc_id) & np_bool(pc.greater(pc.utf8_length(doc_id), 0))
        minitems_ok = n_spans >= 1

        span_checks = [
            ("spans[].kind/enum", "ENUM", kind_np_ok, kind),
            ("spans[].text/required", "REQUIRED", text_ok, kind),
            ("spans[].media_ref/format", "FORMAT", media_ok, mref),
            ("spans[].offset/order", "ORDER", soff, None),  # placeholder replaced below
            ("spans[].media_ref/referential", "REFERENTIAL", ref_ok, mref),
        ]
        span_checks[3] = ("spans[].offset/order", "ORDER", order_ok, soff)

        ext_sketch_rows: list[dict] = []
        if self.extended:
            span_checks.extend(self._extended_checks(text, is_text, ext_sketch_rows))

        doc_checks = [
            ("doc_id/required", "REQUIRED", did_ok),
            ("spans/minItems", "MIN_ITEMS", minitems_ok),
        ]

        rows: list[dict] = []
        per_constraint_bad_docs: dict[str, np.ndarray] = {}

        doc_id_np = doc_id.to_numpy(zero_copy_only=False)

        # violation rows are built columnar (numpy gather + one pa chunk per
        # constraint) — no per-row Python even under adversarial violation
        # rates; `cap` bounds rows per (constraint × batch), counts stay exact
        viol_chunks: list[pa.Table] = []

        def emit_violations(cid, etype, bad_doc_idx, span_index, actual_strs):
            k = len(bad_doc_idx)
            meta = CONSTRAINT_META.get(cid)
            expected = meta[1] if meta else None
            if actual_strs is None:
                actual_col = pa.array([None] * k, type=pa.string())
            else:
                actual_col = actual_strs
            # rendered message: one vectorized join (template pre/post around
            # the actual value), constant string for actual-less constraints
            if meta is None:
                message = pa.array([None] * k, type=pa.string())
            elif meta[4] and actual_strs is not None:
                message = pc.binary_join_element_wise(
                    pa.array([meta[2]] * k), actual_col.fill_null("null"),
                    pa.array([meta[3]] * k), "",
                )
            else:
                message = pa.array([meta[2]] * k, type=pa.string())
            viol_chunks.append(
                pa.table(
                    {
                        "record_type": pa.array(["violation"] * k),
                        "partition_id": pa.array(pid[bad_doc_idx], type=pa.int32()),
                        "doc_id": pa.array(doc_id_np[bad_doc_idx], type=pa.string()),
                        "span_index": pa.array(span_index, type=pa.int32()),
                        "constraint_id": pa.array([cid] * k),
                        "error_type": pa.array([etype] * k),
                        "expected": pa.array([expected] * k, type=pa.string()),
                        "actual": actual_col,
                        "message": message,
                        "n_docs": pa.array(np.zeros(k, dtype=np.int64)),
                        "n_bad": pa.array(np.zeros(k, dtype=np.int64)),
                        "feature": pa.array([None] * k, type=pa.string()),
                        "sketch_kind": pa.array([None] * k, type=pa.string()),
                        "blob": pa.array([None] * k, type=pa.binary()),
                    }
                )
            )

        for cid, etype, ok, actual_arr in span_checks:
            bad = np.where(~ok)[0]
            bad_docs = np.zeros(n, dtype=bool)
            if len(bad):
                bad_docs[doc_idx_of_span[bad]] = True
                capped = bad[: self.cap] if self.cap else bad
                actual = None
                if actual_arr is not None:
                    actual = pc.cast(
                        actual_arr.take(pa.array(capped)), pa.string()
                    )
                emit_violations(
                    cid, etype, doc_idx_of_span[capped],
                    span_pos[capped].astype(np.int32), actual,
                )
            per_constraint_bad_docs[cid] = bad_docs

        for cid, etype, ok in doc_checks:
            bad = np.where(~ok)[0]
            if len(bad):
                capped = bad[: self.cap] if self.cap else bad
                emit_violations(
                    cid, etype, capped, np.full(len(capped), -1, dtype=np.int32), None
                )
            bd = np.zeros(n, dtype=bool)
            bd[bad] = True
            per_constraint_bad_docs[cid] = bd

        # ---- per-(partition, constraint) partials (combiner) -----------
        all_bad = np.zeros(n, dtype=bool)
        for bd in per_constraint_bad_docs.values():
            all_bad |= bd
        for p in np.unique(pid):
            pmask = pid == p
            rows.append(
                {
                    "record_type": "partial",
                    "partition_id": int(p),
                    "constraint_id": "__all__",
                    "n_docs": int(pmask.sum()),
                    "n_bad": int((all_bad & pmask).sum()),
                }
            )
            for cid, bd in per_constraint_bad_docs.items():
                nb = int((bd & pmask).sum())
                if nb:
                    rows.append(
                        {
                            "record_type": "partial",
                            "partition_id": int(p),
                            "constraint_id": cid,
                            "n_docs": int(pmask.sum()),
                            "n_bad": nb,
                        }
                    )

        # ---- sketch partials -------------------------------------------
        if self.with_sketches:
            td_spans = TDigest().add_values(n_spans.astype(np.float64))
            tlens = pc.utf8_length(text)
            td_tlen = TDigest().add_values(
                tlens.drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
            )
            hll_doc = HyperLogLog().add_column(doc_id)
            hll_ref = HyperLogLog().add_column(mref)
            for feature, kind_, blob in (
                ("n_spans", "tdigest", td_spans.to_bytes()),
                ("text_len", "tdigest", td_tlen.to_bytes()),
                ("doc_id", "hll", hll_doc.to_bytes()),
                ("media_ref", "hll", hll_ref.to_bytes()),
            ):
                rows.append(
                    {
                        "record_type": "sketch",
                        "feature": feature,
                        "sketch_kind": kind_,
                        "blob": blob,
                    }
                )
            rows.extend(ext_sketch_rows)

        vt = (
            pa.concat_tables([t.cast(RESULT_SCHEMA) for t in viol_chunks])
            if viol_chunks
            else None
        )
        if vt is not None and self.viol_dir is not None:
            self._write_violations(vt, rows)  # side-output; adds count partials
            vt = None
        out = _rows_to_table(rows)  # partial + sketch rows (few per batch)
        if vt is not None:
            out = pa.concat_tables([vt, out.cast(RESULT_SCHEMA)])
        if self.emit_uniq:
            out = pa.concat_tables([out.cast(RESULT_SCHEMA), _uniq_table(doc_id)])
        return out
