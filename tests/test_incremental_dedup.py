"""Incremental snapshot dedup (functions/dedup.incremental_dedup)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from json_schema_ray.functions.dedup import incremental_dedup


def _corpora(n_old=400, n_new=120, n_overlap=30, seed=9):
    rng = np.random.RandomState(seed)
    old_texts = [f"old document {i} " + " ".join(map(str, rng.randint(0, 99, 6)))
                 for i in range(n_old)]
    new_unique = [f"new document {i} " + " ".join(map(str, rng.randint(0, 99, 6)))
                  for i in range(n_new - n_overlap)]
    # overlap docs: whitespace/case variants of old texts (normalization must hit)
    dups = [old_texts[i].upper().replace(" ", "  ") for i in range(n_overlap)]
    old = pd.DataFrame({"doc_id": np.arange(n_old, dtype=np.int64), "text": old_texts})
    new = pd.DataFrame(
        {
            "doc_id": np.arange(10_000, 10_000 + n_new, dtype=np.int64),
            "text": new_unique + dups,
        }
    )
    return old, new


def test_incremental_dedup_exact_overlap(ray_session):
    old, new = _corpora()
    kept, stats = incremental_dedup(
        rd.from_pandas(new).repartition(5), rd.from_pandas(old).repartition(7)
    )
    kept_df = kept.to_pandas()
    assert len(kept_df) == 90  # 120 new - 30 planted dups
    assert stats["n_confirmed"] == 30
    assert stats["n_candidates"] >= 30  # superset (bloom FPs allowed)
    # precisely the non-dup docs survive
    assert set(kept_df["doc_id"]) == set(range(10_000, 10_090))


def test_incremental_dedup_bloom_fps_are_verified_away(ray_session):
    # a 512-bit bloom over 400 docs is saturated → nearly every probe is a
    # candidate, but verification must still confirm exactly the 30 dups
    old, new = _corpora()
    kept, stats = incremental_dedup(
        rd.from_pandas(new), rd.from_pandas(old), n_bits=512, k=2
    )
    assert stats["bloom_fill"] > 0.5
    assert stats["n_candidates"] > 30  # FPs really occurred
    assert stats["n_confirmed"] == 30
    assert len(kept.to_pandas()) == 90


def test_incremental_dedup_no_overlap(ray_session):
    old, new = _corpora(n_overlap=0)
    kept, stats = incremental_dedup(rd.from_pandas(new), rd.from_pandas(old))
    assert stats["n_confirmed"] == 0
    assert len(kept.to_pandas()) == 120
