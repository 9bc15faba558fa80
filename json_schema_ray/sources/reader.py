"""Format-autodetecting table reader: Lance or Parquet.

``BASELINE.json``'s ``input_hint`` names a Lance table as the canonical
input; this sandbox has no ``lance`` package, so the Lance branch is a
real hook behind an import guard (``ray.data.read_lance`` is a public
API) with Parquet as the always-available path.  Detection is by layout,
not extension alone: a Lance dataset is a directory containing a
``_versions/`` manifest dir (or a ``.lance`` suffix).

The read boundary is deliberately small and injectable
(`_lance_reader`) so tests can exercise the branch without the package
(see tests/test_reader_autodetect.py).
"""

from __future__ import annotations

import os


def is_lance_dataset(path: str) -> bool:
    """True iff ``path`` looks like a Lance dataset on disk."""
    if path.endswith(".lance"):
        return True
    return os.path.isdir(path) and os.path.isdir(os.path.join(path, "_versions"))


def _lance_reader(path: str, columns=None, **kwargs):
    """Isolated import boundary — monkeypatch target for tests."""
    try:
        import lance  # noqa: F401  (read_lance needs the package at runtime)
    except ImportError as e:
        raise ImportError(
            f"{path} is a Lance dataset but the 'lance' package is not "
            "installed; install pylance or convert the table to Parquet."
        ) from e
    import ray.data as rd

    return rd.read_lance(path, columns=columns, **kwargs)


def read_auto(path: str | list[str], columns=None, **kwargs):
    """Format-autodetecting read: ``read_lance`` when the path is a Lance
    dataset (and the package imports); ``read_json`` for ``.jsonl`` /
    ``.json`` / ``.ndjson`` (the reference's native instance format —
    ``Schema.apply(jsonText)``, ``js/Schema.java:51-66`` — as
    newline-delimited files); ``read_csv`` for ``.csv``;
    ``read_parquet`` otherwise.  Accepts a single path or a list of
    same-format files (Lance autodetect applies to single paths only —
    a Lance dataset is one rooted directory).  ``columns`` prunes at the
    scan for parquet/lance; JSONL/CSV must parse whole records, so the
    projection applies right after the read there."""
    import ray.data as rd

    if isinstance(path, str) and is_lance_dataset(path):
        return _lance_reader(path, columns=columns, **kwargs)
    probe = path if isinstance(path, str) else (path[0] if path else "")
    ext = os.path.splitext(probe)[1].lower()
    if ext in (".jsonl", ".json", ".ndjson"):
        ds = rd.read_json(path, **kwargs)
        return ds.select_columns(list(columns)) if columns else ds
    if ext == ".csv":
        ds = rd.read_csv(path, **kwargs)
        return ds.select_columns(list(columns)) if columns else ds
    return rd.read_parquet(path, columns=columns, **kwargs)
