"""Schema resource registry: preprocessing + ``$ref`` resolution.

Plays the role of the reference's ``SchemasRegistry`` +
``SchemaPreprocessor`` (``js/loaders/SchemasRegistry.java:27-470``,
``js/loaders/SchemaPreprocessor.java:20-30, :153-233``): one pass over a
raw schema document collects every ``$id`` (embedded resource), ``$anchor``,
``$dynamicAnchor`` and ``$recursiveAnchor``, after which ``resolve()``
turns any URI-reference into a concrete subschema node.  All resolution
happens at **compile time** on the driver; compiled plans shipped to Ray
workers contain no unresolved references (SURVEY.md §2.5).

External resources resolve three ways, all compile-time/driver-side
(workers only ever see flat compiled plans — no I/O in plans):

- pre-registration via ``register`` (the analog of the reference's
  ``IExternalResolver`` / ``SchemaBuilder.registerExternalSchema``,
  ``js/SchemaBuilder.java:228-285``);
- pluggable per-scheme **loaders** (``SchemaBuilder.registerResourceLoader``,
  ``js/SchemaBuilder.java:103-133``): when ``resolve`` misses, the
  loader for the URI's scheme fetches + registers the resource lazily,
  mirroring ``SchemasRegistry.resolvePath``
  (``js/loaders/SchemasRegistry.java:304-367``).  ``file_loader`` is the
  ``FileLoader.java:152-174`` analog; ``http_loader``
  (``HttpLoader.java:78-135``) exists but this sandbox has no network —
  it raises at compile time unless the environment provides one;
- unknown scheme/no loader → KeyError (never silent).
"""

from __future__ import annotations

from typing import Any
from urllib.parse import unquote, urldefrag, urljoin, urlparse

# keywords whose value is a single subschema
_SINGLE_SCHEMA_KEYS = (
    "additionalProperties",
    "propertyNames",
    "additionalItems",
    "contains",
    "if",
    "then",
    "else",
    "not",
    "unevaluatedProperties",
    "unevaluatedItems",
    "contentSchema",
)
# keywords whose value is a dict of subschemas
_SCHEMA_MAP_KEYS = ("properties", "patternProperties", "$defs", "definitions", "dependentSchemas")
# keywords whose value is a list of subschemas
_SCHEMA_LIST_KEYS = ("allOf", "anyOf", "oneOf", "prefixItems")

DEFAULT_BASE = "urn:jsr:root"


def _join(base: str, ref: str) -> str:
    """URI-reference resolution; handles ``urn:`` bases that urljoin can't."""
    if ref.startswith("#"):
        return urldefrag(base)[0] + ref
    if urlparse(ref).scheme:
        return ref
    if base.startswith("urn:"):
        return ref  # relative ref against an urn base: treat as opaque id
    return urljoin(base, ref)


def pointer_get(doc: Any, pointer: str) -> Any:
    """RFC 6901 descent; raises KeyError on a missing path."""
    node = doc
    if pointer == "":
        return node
    # NOTE: "/" is NOT the root — it points at the member with key ""
    # (RFC 6901 §5); the normal token loop below handles it.
    for raw in pointer.split("/")[1:]:
        tok = unquote(raw).replace("~1", "/").replace("~0", "~")
        if isinstance(node, list):
            node = node[int(tok)]
        elif isinstance(node, dict):
            node = node[tok]
        else:
            raise KeyError(f"cannot descend {tok!r} into {type(node)}")
    return node


def file_loader(uri: str) -> Any:
    """``file:`` scheme loader — compile-time, driver-side JSON read
    (reference ``js/loaders/FileLoader.java:152-174``)."""
    import json as _json
    from urllib.request import url2pathname

    with open(url2pathname(urlparse(uri).path)) as f:
        return _json.load(f)


def http_loader(uri: str) -> Any:
    """``http(s):`` scheme loader (reference ``js/loaders/HttpLoader.java:78-135``).
    Compile-time, driver-side only; raises URLError in network-less
    environments — compiled plans never perform I/O either way."""
    import json as _json
    from urllib.request import urlopen

    with urlopen(uri, timeout=10) as r:
        return _json.loads(r.read().decode("utf-8"))


def classpath_loader(uri: str) -> Any:
    """``classpath:`` scheme loader — the reference bundles schemas as JVM
    classpath resources (``js/loaders/ClasspathLoader.java:186-203``); the
    Python analog resolves ``classpath:pkg.subpkg/name.json`` through
    ``importlib.resources`` so schemas shipped inside an installed package
    are addressable from ``$ref`` without a filesystem path."""
    import json as _json
    from importlib import resources

    path = uri.split(":", 1)[1].lstrip("/")
    pkg, _, resource = path.partition("/")
    if not resource:
        raise ValueError(f"classpath URI needs 'pkg/resource' form: {uri!r}")
    node = resources.files(pkg)
    for part in resource.split("/"):
        node = node / part
    return _json.loads(node.read_text(encoding="utf-8"))


# Default loaders are LOCAL-ONLY.  The reference enables its embedded
# http(s) loaders by default (SchemaBuilder.allowEmbedResourceLoaders,
# js/SchemaBuilder.java:103-133); we deliberately invert that: compiling an
# untrusted schema must not let a remote $ref trigger a driver-side network
# fetch (SSRF / availability surface).  Opt in with
# ``SchemaRegistry(allow_network=True)`` or ``NETWORK_LOADERS``.
DEFAULT_LOADERS = {"file": file_loader, "classpath": classpath_loader}
NETWORK_LOADERS = {"http": http_loader, "https": http_loader}


class SchemaRegistry:
    def __init__(self, loaders: dict[str, Any] | None = None, allow_network: bool = False) -> None:
        # scheme -> callable(uri) -> schema document; consulted lazily on
        # resolve() misses (pre-registered resources always win)
        self.loaders: dict[str, Any] = dict(loaders) if loaders is not None else dict(DEFAULT_LOADERS)
        if allow_network and loaders is None:
            self.loaders.update(NETWORK_LOADERS)
        # reference-string → URI aliases (SchemaBuilder.addMappingIdToURI,
        # js/SchemaBuilder.java:153-156): applied before resolution, so an
        # opaque identifier can point at a loadable/registered resource
        self.aliases: dict[str, str] = {}
        self.resources: dict[str, Any] = {}
        self.anchors: dict[tuple[str, str], Any] = {}
        self.dynamic_anchors: dict[tuple[str, str], Any] = {}
        # resource uri -> outermost node carrying "$recursiveAnchor": true
        self.recursive_anchors: dict[str, Any] = {}
        # id(node) -> resource uri that node belongs to (for pointer descents
        # crossing embedded-resource boundaries)
        self._node_base: dict[int, str] = {}

    # ----------------------------------------------------------- registration

    def register(self, schema: Any, uri: str = DEFAULT_BASE) -> str:
        """Preprocess + register one schema document; returns its canonical
        base URI (the root ``$id`` if present, else ``uri``)."""
        base = uri
        if isinstance(schema, dict):
            sid = schema.get("$id")
            if isinstance(sid, str) and not sid.startswith("#"):
                base = urldefrag(_join(uri, sid))[0]
        self.resources.setdefault(base, schema)
        if base != uri:
            self.resources.setdefault(uri, schema)
        self._walk(schema, base, is_root=True)
        return base

    def _walk(self, node: Any, base: str, is_root: bool = False) -> None:
        if not isinstance(node, dict):
            return
        sid = node.get("$id")
        if isinstance(sid, str) and not is_root:
            if sid.startswith("#"):  # draft-07 anchor-form $id
                self.anchors[(base, sid[1:])] = node
            else:
                base = urldefrag(_join(base, sid))[0]
                self.resources.setdefault(base, node)
        self._node_base[id(node)] = base
        anchor = node.get("$anchor")
        if isinstance(anchor, str):
            self.anchors[(base, anchor)] = node
        dyn = node.get("$dynamicAnchor")
        if isinstance(dyn, str):
            self.anchors.setdefault((base, dyn), node)
            self.dynamic_anchors[(base, dyn)] = node
        if node.get("$recursiveAnchor") is True:
            self.recursive_anchors.setdefault(base, node)

        for k in _SINGLE_SCHEMA_KEYS:
            if k in node:
                self._walk(node[k], base)
        for k in _SCHEMA_MAP_KEYS:
            v = node.get(k)
            if isinstance(v, dict):
                for sub in v.values():
                    self._walk(sub, base)
        for k in _SCHEMA_LIST_KEYS:
            v = node.get(k)
            if isinstance(v, list):
                for sub in v:
                    self._walk(sub, base)
        items = node.get("items")
        if isinstance(items, list):
            for sub in items:
                self._walk(sub, base)
        else:
            self._walk(items, base)
        deps = node.get("dependencies")
        if isinstance(deps, dict):
            for sub in deps.values():
                if isinstance(sub, (dict, bool)):
                    self._walk(sub, base)

    # ------------------------------------------------------------- resolution

    def base_of(self, node: Any, fallback: str) -> str:
        return self._node_base.get(id(node), fallback)

    def resolve(self, ref: str, base: str) -> tuple[Any, str]:
        """Resolve a URI-reference against ``base`` → ``(node, resource_uri)``.

        Mirrors ``SchemasRegistry.resolveRef``
        (``js/loaders/SchemasRegistry.java:227-298``) minus lazy remote
        loading: unknown resources raise.
        """
        ref = self.aliases.get(ref, ref)
        abs_uri = _join(base, ref)
        doc_uri, frag = urldefrag(abs_uri)
        frag = unquote(frag)
        if doc_uri not in self.resources:
            # lazy scheme-loader fetch + preprocess, compile-time only
            loader = self.loaders.get(urlparse(doc_uri).scheme)
            if loader is None:
                raise KeyError(
                    f"unresolvable $ref {ref!r} (base {base!r}): no resource {doc_uri!r} "
                    f"and no loader for its scheme"
                )
            try:
                loaded = loader(doc_uri)
            except Exception as e:  # loader failure is still a compile error
                raise KeyError(
                    f"unresolvable $ref {ref!r}: loader for {doc_uri!r} failed: {e}"
                ) from e
            self.register(loaded, doc_uri)
        doc = self.resources[doc_uri]
        if not frag:
            return doc, self.base_of(doc, doc_uri)
        if frag.startswith("/"):
            node = pointer_get(doc, frag)
            return node, self.base_of(node, doc_uri)
        key = (doc_uri, frag)
        if key in self.anchors:
            node = self.anchors[key]
            return node, self.base_of(node, doc_uri)
        raise KeyError(f"unresolvable anchor {frag!r} in resource {doc_uri!r}")

    def resolve_dynamic(self, ref: str, base: str, scope: tuple[str, ...]) -> tuple[Any, str]:
        """``$dynamicRef`` (2020-12): if the statically-resolved target is a
        ``$dynamicAnchor``, rebind to the *outermost* dynamic scope entry
        carrying the same dynamic anchor (``SchemasRegistry.java:183-224``);
        otherwise behave exactly like ``$ref``."""
        node, res_uri = self.resolve(ref, base)
        frag = unquote(urldefrag(_join(base, ref))[1])
        if frag and not frag.startswith("/"):
            target_uri = urldefrag(_join(base, ref))[0]
            if (target_uri, frag) in self.dynamic_anchors:
                for uri in scope:  # outermost first
                    cand = self.dynamic_anchors.get((uri, frag))
                    if cand is not None:
                        return cand, uri
        return node, res_uri

    def resolve_recursive(self, base: str, scope: tuple[str, ...]) -> tuple[Any, str]:
        """``$recursiveRef: "#"`` (2019-09): if the current resource root has
        ``$recursiveAnchor: true``, rebind to the outermost in-scope resource
        that also does (``SchemasRegistry.java:155-180``)."""
        if base in self.recursive_anchors:
            for uri in scope:
                cand = self.recursive_anchors.get(uri)
                if cand is not None:
                    return cand, uri
        return self.resolve("#", base)
