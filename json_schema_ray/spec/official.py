"""Embedded official meta-schemas (the ``OriginalSpecResolver`` analog).

The reference bundles the json-schema.org meta-schemas for every supported
dialect inside its jar (``src/main/resources/dialects.zip``) and resolves
``$ref``s to ``https://json-schema.org/draft/...`` URIs against that
embedded copy instead of the network
(``js/loaders/OriginalSpecResolver.java:229-296``).  This module does the
same for the Ray engine: the official meta-schema + vocabulary documents
for draft-07, 2019-09 and 2020-12 are vendored under
``resources/metaschemas/`` (public spec files, json-schema.org) and can be
pre-registered into any :class:`~json_schema_ray.spec.schema.SchemaRegistry`
so that

- ``{"$ref": "https://json-schema.org/draft/2020-12/schema"}`` compiles
  without network access, and
- the engine can validate *schemas themselves* against the official
  meta-schema — the 2020-12 meta-schema is the heaviest public exercise of
  ``$dynamicRef``/``$dynamicAnchor`` (every subschema position recurses
  through ``{"$dynamicRef": "#meta"}``), and 2019-09's of
  ``$recursiveRef``.
"""

from __future__ import annotations

import json
from functools import lru_cache
from importlib import resources
from typing import Any

from .schema import SchemaRegistry

#: canonical meta-schema URI per dialect name used across the engine
METASCHEMA_URIS = {
    "draft7": "http://json-schema.org/draft-07/schema",
    "2019-09": "https://json-schema.org/draft/2019-09/schema",
    "2020-12": "https://json-schema.org/draft/2020-12/schema",
}


@lru_cache(maxsize=1)
def official_metaschemas() -> dict[str, Any]:
    """Load every vendored meta-schema document, keyed by its ``$id``."""
    docs: dict[str, Any] = {}
    root = resources.files("json_schema_ray") / "resources" / "metaschemas"
    for entry in sorted(root.iterdir(), key=lambda e: e.name):
        if not entry.name.endswith(".json"):
            continue
        doc = json.loads(entry.read_text(encoding="utf-8"))
        sid = doc["$id"].rstrip("#")
        docs[sid] = doc
    return docs


def register_official_metaschemas(registry: SchemaRegistry) -> list[str]:
    """Pre-register all embedded meta-schemas into ``registry``; returns the
    registered base URIs.  Safe to call on a registry that already holds
    user resources (``register`` uses ``setdefault`` semantics)."""
    out = []
    for uri, doc in official_metaschemas().items():
        out.append(registry.register(doc, uri))
    return out
