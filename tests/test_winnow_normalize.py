"""Pin the winnow kernel's numpy whitespace-collapse normalization to
the regex semantics it replaced (`\\s+` → " ", per doc), and the
cache-blocked core to batch-layout independence.

The collapse is idempotent, so running the CURRENT kernel on
pre-collapsed text reproduces the old regex path's answer — that is the
differential reference here (no second implementation kept around).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from json_schema_ray.functions.text import add_winnow_fingerprints


def _regex_path(tbl: pa.Table, k: int, w: int):
    t = pc.replace_substring_regex(tbl["text"].fill_null(""), r"\s+", " ")
    return add_winnow_fingerprints(pa.table({"text": t}), "text", k=k, window=w)


CASES = [
    ["hello   world", "  leading ws", "trailing ws   ", "", None,
     "\t\n mixed \r\n ws \x0b\x0c end"],
    ["", "", ""],
    ["   ", "\t\t", "a"],
    ["ab" * 500 + "   " + "cd" * 500],
    ["x"],
    ["\n\n\n", " \t ", "word"],
]


@pytest.mark.parametrize("case", range(len(CASES)))
@pytest.mark.parametrize("k,w", [(5, 8), (8, 16), (2, 2)])
def test_numpy_collapse_matches_regex_semantics(case, k, w):
    tbl = pa.table({"text": pa.array(CASES[case], type=pa.string())})
    got = [set(x) for x in add_winnow_fingerprints(tbl, "text", k=k, window=w)["winnow"].to_pylist()]
    want = [set(x) for x in _regex_path(tbl, k, w)["winnow"].to_pylist()]
    assert got == want


def test_numpy_collapse_matches_regex_randomized():
    rng = np.random.default_rng(12345)  # derandomized (fixed seed)
    words = ["the", "fox", "  ", "data\t\n", "pipeline", "\r", "ok"]
    texts = [
        " ".join(rng.choice(words, rng.integers(0, 40))) for _ in range(800)
    ]
    tbl = pa.table({"text": pa.array(texts)})
    got = [set(x) for x in add_winnow_fingerprints(tbl, "text", k=8, window=16)["winnow"].to_pylist()]
    want = [set(x) for x in _regex_path(tbl, 8, 16)["winnow"].to_pylist()]
    assert got == want


def test_cache_chunk_boundaries_layout_independent():
    """Fingerprint SET must not depend on where the 256 KiB chunk
    boundaries fall: a single doc long enough to span several chunks
    must fingerprint identically to the same doc alone in a tiny batch."""
    rng = np.random.default_rng(7)
    big = " ".join(
        "".join(rng.choice(list("abcdefgh "), 8)) for _ in range(120_000)
    )  # ~1 MB → 4+ chunks
    alone = add_winnow_fingerprints(
        pa.table({"text": [big]}), "text", k=8, window=16
    )["winnow"].to_pylist()[0]
    packed = add_winnow_fingerprints(
        pa.table({"text": ["padding doc one", big, "padding doc two"]}),
        "text", k=8, window=16,
    )["winnow"].to_pylist()[1]
    assert set(alone) == set(packed)
