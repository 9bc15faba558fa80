"""PII redaction + Gopher-style repetition signals (`functions/text.py`):
naive-reference parity for the vectorized kernels, and pattern-order /
edge-case pins for the redactor.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import pytest

from json_schema_ray.functions.text import add_repetition_stats, redact_pii

REP_CASES = [
    "a b a b a b",
    "x y z",
    "",
    "solo",
    "a a a a",
    None,
    "p q p q r r r p q",
    "one two one two three three",
]


def _naive(s: str | None):
    if not s:
        s = ""
    w = s.split(" ")
    dup = 1 - len(set(w)) / len(w)
    if len(w) < 2:
        return dup, 0.0
    grams = [(w[i], w[i + 1]) for i in range(len(w) - 1)]
    c = Counter(grams)
    return dup, max(c.values()) / len(grams)


def test_repetition_stats_match_naive():
    out = add_repetition_stats(
        pa.table({"text": pa.array(REP_CASES, type=pa.string())})
    ).to_pandas()
    for i, s in enumerate(REP_CASES):
        d, g = _naive(s)
        assert out["dup_word_frac"][i] == pytest.approx(d, abs=1e-12), s
        assert out["top_2gram_frac"][i] == pytest.approx(g, abs=1e-12), s


def test_repetition_stats_batch_layout_independent():
    """Per-doc signals must not depend on batch packing."""
    solo = add_repetition_stats(pa.table({"text": ["a b a b a b"]})).to_pandas()
    packed = add_repetition_stats(
        pa.table({"text": ["x", "a b a b a b", "q r q r"]})
    ).to_pandas()
    assert packed["dup_word_frac"][1] == solo["dup_word_frac"][0]
    assert packed["top_2gram_frac"][1] == solo["top_2gram_frac"][0]


def test_redact_pii_kinds_and_order():
    out = redact_pii(
        pa.table(
            {
                "text": pa.array(
                    [
                        "mail bob.smith+x@corp.example.com or call 555-123-4567",
                        "servers 10.0.0.42 and 192.168.001.001",
                        "clean text",
                        None,
                        # numeric TLD is NOT an email (pattern requires
                        # [A-Za-z]{2,}); the IP rule claims the host
                        "ping a@1.2.3.4 now",
                    ]
                )
            }
        )
    ).to_pandas()
    assert list(out["n_email"]) == [1, 0, 0, 0, 0]
    assert list(out["n_phone"]) == [1, 0, 0, 0, 0]
    assert list(out["n_ipv4"]) == [0, 2, 0, 0, 1]
    assert out["redacted"][0] == "mail [EMAIL] or call [PHONE]"
    assert out["redacted"][1] == "servers [IP] and [IP]"
    assert out["redacted"][4] == "ping a@[IP] now"
    assert out["redacted"][3] is None or out["redacted"][3] == ""


def test_decontamination_planted(ray_session):
    """Planted 13-gram overlap: doc t1 embeds a benchmark sentence
    verbatim (>=13 shared words), t2 is clean, t3 shares only 12 words
    (below the n-gram threshold -> NOT flagged)."""
    import numpy as np
    import ray.data as rd

    from json_schema_ray.functions.text import doc_word_ngrams, find_contaminated

    bench_sent = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi"
    bench = pa.table({"doc_id": [0], "text": [bench_sent]})
    grams = doc_word_ngrams(bench, n=13)[0].unique()
    assert len(grams) == 2  # 14 words -> two 13-grams

    twelve = " ".join(bench_sent.split()[:12])
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "prefix words then " + bench_sent + " and a suffix",
                    "completely different content with no overlap at all whatsoever here",
                    "leading bits " + twelve + " trailing bits",
                ],
            }
        )
    )
    out = find_contaminated(ds, grams, n=13).to_pandas().sort_values("doc_id")
    assert list(out["doc_id"]) == [1]
    assert int(out["n_matched"].iloc[0]) == 2  # both benchmark grams present
