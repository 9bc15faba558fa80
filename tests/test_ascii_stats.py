"""Fused ASCII byte-pass stats: exact parity with the five RE2 kernels."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from json_schema_ray.functions.text import (
    STOPWORDS,
    TOKEN_RE,
    WS_TOKEN_RE,
    ascii_text_stats,
)


def _regex_ref(a: pa.Array):
    f64 = lambda x: pc.cast(x, pa.float64()).to_numpy(zero_copy_only=False)  # noqa: E731
    sp = r"(?i)\b(?:" + "|".join(STOPWORDS) + r")\b"
    return {
        "n_chars": f64(pc.utf8_length(a)),
        "n_tok": f64(pc.count_substring_regex(a, WS_TOKEN_RE)),
        "n_bpe": f64(pc.count_substring_regex(a, TOKEN_RE)),
        "n_punct": f64(pc.count_substring_regex(a, r"[^\w\s]")),
        "n_stop": f64(pc.count_substring_regex(a, sp)),
    }


HAND_CASES = [
    "", " ", "the", "The ", " the the THE", "xthe they the_",
    "99the the99 the_9", "of_to in-is that,it for.with", "a_b_c",
    "__the__", "to to to", "t h e", "word\tword\nthe\r\nand",
    "  multiple   spaces  the  ", "!!!", "a!the!b", "IN IS IT",
    "within", "forward", "TO", "9to9 _to_ .to.", "is",
]


def _assert_parity(cases):
    arr = pa.array(cases, pa.string())
    got, want = ascii_text_stats(arr), _regex_ref(arr)
    for k in want:
        bad = np.nonzero(got[k] != want[k])[0]
        assert len(bad) == 0, (
            f"{k}: case {cases[bad[0]]!r} got {got[k][bad[0]]} want {want[k][bad[0]]}"
        )


def test_hand_cases_exact():
    _assert_parity(HAND_CASES)


def test_random_soup_exact_across_chunk_boundaries():
    rng = np.random.RandomState(0)
    chars = list("abcdefg THEandofto986._,!-\t\n")
    cases = ["".join(rng.choice(chars, size=rng.randint(0, 200))) for _ in range(20_000)]
    _assert_parity(HAND_CASES + cases)  # > 256 KiB → exercises cache blocking


def test_sliced_and_chunked_inputs():
    arr = pa.array(HAND_CASES * 50)
    sl = arr.slice(7, 400)
    got, want = ascii_text_stats(sl), _regex_ref(sl)
    assert all((got[k] == want[k]).all() for k in want)
    ch = pa.chunked_array([arr.slice(0, 100), arr.slice(100, 200)])
    got2 = ascii_text_stats(ch)
    want2 = _regex_ref(ch.combine_chunks())
    assert all((got2[k] == want2[k]).all() for k in want2)


def test_non_ascii_falls_back():
    assert ascii_text_stats(pa.array(["héllo", "ok"])) is None


def test_nulls_and_empty():
    arr = pa.array(["the cat", None, ""])
    got = ascii_text_stats(arr)
    assert got["n_stop"].tolist() == [1.0, 0.0, 0.0]
    assert got["n_chars"].tolist() == [7.0, 0.0, 0.0]
    empty = ascii_text_stats(pa.array([], pa.string()))
    assert all(len(v) == 0 for v in empty.values())
