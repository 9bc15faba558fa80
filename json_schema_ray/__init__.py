"""json_schema_ray — a Ray-Data-native schema + constraint validation
engine with the query/data-processing capabilities of
georgeakulov/json-schema (reference semantics), re-expressed as
vectorized Arrow predicate kernels over ``ray.data.Dataset`` pipelines.

Public API:

- ``compile_schema`` / ``ConstraintEngineBuilder`` — compile-once
  JSON-Schema-subset constraints (dynamic path: full semantics over
  JSON values; vector path: ``kernels.vector.compile_vector`` for typed
  Arrow columns).
- ``pipelines.validation.run_validation`` — the flagship interleaved-
  document validation job (span kernels, stats/sketches, salted
  uniqueness, referential semi-join, drift, checkpoint/resume).
- ``stages`` — reusable Ray Data stages (validate, stats, shuffle,
  drift); ``functions`` — training-data ops (dedup, similarity, text,
  media); ``state`` — mergeable sketches + checkpoint manifest;
  ``sources`` — synthetic interleaved data.
"""

def _configure_memory() -> None:
    """Keep allocator pages resident: on hosts where first-touch page
    faults are slow (measured ~100 MB/s on this VM vs GB/s typical),
    returning freed pages to the OS makes every batch re-fault its
    working set.  A long jemalloc decay lets each worker fault its
    buffers once and reuse them — measured 10-15× on concurrent
    Arrow-buffer-building stages.  Runs in every process that imports
    the package (driver and all Ray workers)."""
    try:
        import pyarrow as _pa

        _pa.jemalloc_set_decay_ms(1_000_000)
    except (ImportError, NotImplementedError, OSError):
        pass


_configure_memory()

from .builder import ConstraintEngineBuilder
from .kernels.dynamic import CompiledSchema, DynamicCompiler, compile_schema
from .kernels.vector import UnsupportedVector, compile_table_plan, compile_vector
from .spec.errors import ERROR_MESSAGES, Violation
from .spec.schema import SchemaRegistry

__version__ = "0.1.0"

__all__ = [
    "ConstraintEngineBuilder",
    "CompiledSchema",
    "DynamicCompiler",
    "compile_schema",
    "compile_vector",
    "compile_table_plan",
    "UnsupportedVector",
    "SchemaRegistry",
    "Violation",
    "ERROR_MESSAGES",
    "__version__",
]
