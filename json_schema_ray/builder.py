"""ConstraintEngineBuilder — the user-extension surface.

Mirrors the reference's ``SchemaBuilder`` extension points
(``js/SchemaBuilder.java``, SURVEY.md §2.8) re-expressed for the Ray
engine; compile-once → immutable, reusable, worker-shippable plans:

| reference                                   | here                       |
|---------------------------------------------|----------------------------|
| registerFormatValidator (:306-323)          | add_format                 |
| setRegexFactory (:293-297)                  | set_regex_flavor           |
| registerResourceLoader (:103-133)           | register_schema (pre-load) |
| external $ref resolvers (:153-156,:228-285) | register_schema(uri=...)   |
| content validators (:189-208)               | set_content_processing,    |
|                                              | add_content_encoding,      |
|                                              | add_content_media_type     |
| scheduler injection (:331-347)              | (Ray owns scheduling)      |
| treatObjectAsArray (:163-166)               | treat_object_as_array      |
"""

from __future__ import annotations

from typing import Any, Callable

from .kernels.dynamic import CompiledSchema, DynamicCompiler
from .spec.schema import SchemaRegistry


class ConstraintEngineBuilder:
    """Not thread-safe (like the reference builder, README.md:302);
    the compiled output IS thread-safe and reusable."""

    def __init__(self) -> None:
        self._registry = SchemaRegistry()
        self._formats: dict[str, Callable[[str], bool]] = {}
        self._regex_flavor: Callable[[str], Any] | None = None
        # None → auto-detect from the root "$schema" (2020-12 fallback),
        # the DialectRegistry analog; dialect() forces one
        self._dialect: str | None = None
        self._formats_assert = False
        self._content = "default"
        self._content_encodings: dict[str, Callable[[str], Any]] = {}
        self._content_media_types: list[tuple] = []
        self._treat_object_as_array = False

    def dialect(self, d: str) -> "ConstraintEngineBuilder":
        assert d in ("2020-12", "2019-09", "draft7")
        self._dialect = d
        return self

    def register_loader(self, scheme: str, loader: Callable[[str], Any]) -> "ConstraintEngineBuilder":
        """Per-URI-scheme resource loader for lazy ``$ref`` resolution at
        COMPILE time on the driver (``SchemaBuilder.registerResourceLoader``,
        ``js/SchemaBuilder.java:103-133``).  ``file``/``classpath`` are
        pre-registered (spec/schema.DEFAULT_LOADERS); ``http(s)`` is
        OPT-IN via :meth:`allow_network_loaders` — unlike the reference's
        default-on embedded loaders, an untrusted schema here cannot make
        the driver fetch remote URLs.  Compiled plans shipped to workers
        never perform I/O."""
        self._registry.loaders[scheme] = loader
        return self

    def allow_network_loaders(self, on: bool = True) -> "ConstraintEngineBuilder":
        """Enable (or disable) the ``http``/``https`` compile-time ``$ref``
        loaders — the analog of ``SchemaBuilder.allowEmbedResourceLoaders``
        (``js/SchemaBuilder.java:103-133``), inverted to default-off."""
        from .spec.schema import NETWORK_LOADERS

        if on:
            self._registry.loaders.update(NETWORK_LOADERS)
        else:
            for scheme in NETWORK_LOADERS:
                self._registry.loaders.pop(scheme, None)
        return self

    def assert_formats(self, on: bool = True) -> "ConstraintEngineBuilder":
        self._formats_assert = on
        return self

    def add_format(self, name: str, predicate: Callable[[str], bool]) -> "ConstraintEngineBuilder":
        """Custom format validator (applies to strings; non-strings pass)."""
        self._formats[name] = predicate
        return self

    def set_regex_flavor(self, compile_fn: Callable[[str], Any]) -> "ConstraintEngineBuilder":
        """Custom regex engine: ``compile_fn(pattern)`` must return an
        object with a ``search(str)`` method (``IRegexPredicateFactory``
        analog)."""
        self._regex_flavor = compile_fn
        return self

    def register_schema(self, uri: str, schema: Any) -> "ConstraintEngineBuilder":
        """Pre-register an external schema resource so ``$ref: uri``
        resolves without I/O (``SchemaBuilder.addMappingIdToSchema``,
        ``js/SchemaBuilder.java:228-285``)."""
        self._registry.register(schema, uri)
        return self

    def map_ref(self, identifier: str, uri: str) -> "ConstraintEngineBuilder":
        """Alias an opaque ``$ref`` identifier to a concrete URI, resolved
        by registered resources or scheme loaders
        (``SchemaBuilder.addMappingIdToURI``, ``js/SchemaBuilder.java:153-156``)."""
        self._registry.aliases[identifier] = uri
        return self

    def use_official_metaschemas(self) -> "ConstraintEngineBuilder":
        """Pre-register the embedded official json-schema.org meta-schemas
        (draft-07 / 2019-09 / 2020-12 + vocabulary resources) so ``$ref``s
        to ``https://json-schema.org/draft/...`` URIs resolve without
        network — the ``OriginalSpecResolver`` analog
        (``js/loaders/OriginalSpecResolver.java:229-296``, embedded
        ``dialects.zip``)."""
        from .spec.official import register_official_metaschemas

        register_official_metaschemas(self._registry)
        return self

    def set_content_processing(self, mode: str) -> "ConstraintEngineBuilder":
        assert mode in ("disable", "default", "encoding", "encoding_and_schema")
        self._content = mode
        return self

    def add_content_encoding(
        self, name: str, decode_fn: Callable[[str], Any]
    ) -> "ConstraintEngineBuilder":
        """Custom (or replacement) ``contentEncoding`` codec
        (``SchemaBuilder.addContentEncodingValidator``,
        ``js/SchemaBuilder.java:180-194``): ``decode_fn`` receives the
        encoded string and returns the decoded value (bytes or str), or
        raises if the value is not validly encoded — the ``ExceptionableOp``
        contract.  Names are case-insensitive; registering a built-in name
        (e.g. ``base64``) replaces the default decoder.  The decoded value
        feeds the ``contentMediaType`` check and ``contentSchema``
        (chain assembly: ``ContentUtils.java:27-87``)."""
        self._content_encodings[name] = decode_fn
        return self

    def add_content_media_type(
        self,
        media_type: str | Callable[[str], bool],
        check_fn: Callable[[Any], Any],
    ) -> "ConstraintEngineBuilder":
        """Custom ``contentMediaType`` validator
        (``SchemaBuilder.addContentMediaTypeValidator``,
        ``js/SchemaBuilder.java:196-208``): ``media_type`` is either an
        exact name (case-insensitive) or a predicate over the media-type
        string (the ``Predicate<MimeType>`` analog); ``check_fn`` receives
        the DECODED bytes and raises if validation fails — the
        ``ExceptionableCons`` contract."""
        if callable(media_type):
            pred = media_type
        else:
            want = media_type.lower()

            def pred(m: str, _w=want) -> bool:
                return isinstance(m, str) and m.lower() == _w

        self._content_media_types.append((pred, check_fn))
        return self

    def treat_object_as_array(self, on: bool = True) -> "ConstraintEngineBuilder":
        self._treat_object_as_array = on
        return self

    def compile(self, schema: Any, uri: str | None = None) -> CompiledSchema:
        compiler = DynamicCompiler(
            registry=self._registry,
            dialect=self._dialect,
            formats_assert=self._formats_assert,
            content_processing=self._content,
            format_predicates=self._formats or None,
            regex_flavor=self._regex_flavor,
            content_encodings=self._content_encodings or None,
            content_media_types=self._content_media_types or None,
        )
        compiler.treat_object_as_array = self._treat_object_as_array
        return compiler.compile(schema, uri)
