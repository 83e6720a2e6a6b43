"""Entity-model parsing and strict validation.

Mirrors the reference's model layer (SURVEY.md §2.1, §3 rows 28-30):
  * ``model/Model.java::Model(String json)`` (≈L40-120) — parse + validate the
    four sections ``attributes / resolvers / matchers / indices``.
  * ``model/Attribute.java::VALID_TYPES/validateType`` (≈L20-90) — types
    restricted to {string, number, boolean, date}.
  * ``model/Resolver.java`` (≈L15-100) — non-empty attribute list referencing
    declared attributes; optional integer ``weight``.
  * ``model/Matcher.java`` (≈L15-110) — clause template with
    ``{{ field }} / {{ value }} / {{ params.* }}`` variables, optional
    ``quality ∈ [0,1]``.
  * ``model/Index.java`` / ``model/IndexField.java`` (≈L15-120) — per-index
    field → {attribute, matcher, quality} mappings.
  * ``model/Validation.java`` — name restrictions (non-empty, no periods,
    no leading underscore, printable ASCII subset).

The external JSON contract is kept verbatim (SURVEY.md Appendix A).  Our
engine additionally classifies each matcher clause template into an
executable kind (exact / tokens / fuzzy / phonetic / date_window /
jaro_winkler / ngram) — the reference delegates execution to Elasticsearch;
we compile to Spark expressions (see plans/compiler.py).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from zentity_spark import dialect

VALID_ATTRIBUTE_TYPES = ("string", "number", "boolean", "date")

MATCHER_KINDS = (
    "exact",
    "tokens",
    "fuzzy",
    "phonetic",
    "date_window",
    "jaro_winkler",
    "ngram",
)

_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9_.\- ]*$")


class ValidationError(ValueError):
    """≙ ``model/ValidationException.java``."""


def _require(cond: bool, msg: str) -> None:
    if not cond:
        raise ValidationError(msg)


def _validate_name(name: object, what: str) -> str:
    _require(isinstance(name, str), f"{what} name must be a string")
    _require(len(name) > 0, f"{what} name must not be empty")
    _require("." not in name, f"{what} name must not contain periods: '{name}'")
    _require(not name.startswith("_"), f"{what} name must not start with '_': '{name}'")
    _require(
        _NAME_RE.match(name) is not None,
        f"{what} name has invalid characters: '{name}'",
    )
    return name


def _validate_quality(q: object, what: str) -> float | None:
    if q is None:
        return None
    _require(isinstance(q, (int, float)) and not isinstance(q, bool),
             f"{what} must be a number in [0.0, 1.0]")
    _require(0.0 <= float(q) <= 1.0, f"{what} must be in [0.0, 1.0], got {q}")
    return float(q)


@dataclass(frozen=True)
class Attribute:
    """≙ ``model/Attribute.java``. ``score`` feeds the identity-confidence
    formula (SURVEY Appendix B); ``params`` carries e.g. date ``format`` and
    our ``normalizer`` extension."""

    name: str
    type: str = "string"
    score: float | None = None
    params: dict = field(default_factory=dict)

    @staticmethod
    def parse(name: str, spec: object) -> "Attribute":
        _validate_name(name, "attribute")
        _require(isinstance(spec, dict), f"attribute '{name}' must be an object")
        unknown = set(spec) - {"type", "score", "params"}
        _require(not unknown, f"attribute '{name}' has unknown fields: {sorted(unknown)}")
        typ = spec.get("type", "string")
        _require(
            typ in VALID_ATTRIBUTE_TYPES,
            f"attribute '{name}' has invalid type '{typ}' "
            f"(expected one of {list(VALID_ATTRIBUTE_TYPES)})",
        )
        score = _validate_quality(spec.get("score"), f"attribute '{name}'.score")
        params = spec.get("params", {})
        _require(isinstance(params, dict), f"attribute '{name}'.params must be an object")
        if typ == "date":
            fmt = params.get("format", "yyyy-MM-dd")
            _require(isinstance(fmt, str),
                     f"attribute '{name}'.params.format must be a string")
            try:
                dialect.validate_date_format(fmt)
            except ValueError as e:
                _require(False, f"attribute '{name}': {e}")
        return Attribute(name=name, type=typ, score=score, params=dict(params))


@dataclass(frozen=True)
class Resolver:
    """≙ ``model/Resolver.java``: ALL listed attributes must match for a
    candidate pair to resolve under this resolver (AND semantics,
    ``Job.java::makeResolversClause`` ≈L460-560)."""

    name: str
    attributes: tuple
    weight: int = 0

    @staticmethod
    def parse(name: str, spec: object, declared_attrs: set) -> "Resolver":
        _validate_name(name, "resolver")
        _require(isinstance(spec, dict), f"resolver '{name}' must be an object")
        unknown = set(spec) - {"attributes", "weight"}
        _require(not unknown, f"resolver '{name}' has unknown fields: {sorted(unknown)}")
        attrs = spec.get("attributes")
        _require(isinstance(attrs, list) and len(attrs) > 0,
                 f"resolver '{name}' must have a non-empty attributes list")
        for a in attrs:
            _require(a in declared_attrs,
                     f"resolver '{name}' references undeclared attribute '{a}'")
        _require(len(set(attrs)) == len(attrs),
                 f"resolver '{name}' lists duplicate attributes")
        weight = spec.get("weight", 0)
        _require(isinstance(weight, int) and not isinstance(weight, bool),
                 f"resolver '{name}'.weight must be an integer")
        return Resolver(name=name, attributes=tuple(attrs), weight=weight)


@dataclass(frozen=True)
class Matcher:
    """≙ ``model/Matcher.java``. ``clause`` is the ES query template with
    ``{{ field }}/{{ value }}/{{ params.* }}`` variables; we classify it into
    an executable ``kind`` instead of populating it at query time
    (``Job.java::populateMatcherClause`` ≈L150-220 has no Spark analog —
    compilation happens once at plan time)."""

    name: str
    kind: str
    quality: float | None = None
    params: dict = field(default_factory=dict)
    clause: dict = field(default_factory=dict)

    @staticmethod
    def parse(name: str, spec: object) -> "Matcher":
        _validate_name(name, "matcher")
        _require(isinstance(spec, dict), f"matcher '{name}' must be an object")
        unknown = set(spec) - {"clause", "params", "quality", "type"}
        _require(not unknown, f"matcher '{name}' has unknown fields: {sorted(unknown)}")
        quality = _validate_quality(spec.get("quality"), f"matcher '{name}'.quality")
        params = spec.get("params", {})
        _require(isinstance(params, dict), f"matcher '{name}'.params must be an object")
        clause = spec.get("clause")
        kind = spec.get("type")
        if kind is None:
            _require(isinstance(clause, dict) and len(clause) > 0,
                     f"matcher '{name}' must have a non-empty clause or a type")
            kind = classify_clause(name, clause, params)
        _require(kind in MATCHER_KINDS,
                 f"matcher '{name}' has unknown type '{kind}' "
                 f"(expected one of {list(MATCHER_KINDS)})")
        return Matcher(name=name, kind=kind, quality=quality,
                       params=dict(params), clause=dict(clause or {}))


def classify_clause(name: str, clause: dict, params: dict) -> str:
    """Map an ES clause template to an executable matcher kind.

    term → exact; match+fuzziness → fuzzy; match (plain) → tokens;
    range with '||-{{ params.window }}' → date_window.  The reference never
    interprets clauses itself (ES does); this classification is the Spark-side
    equivalent of delegating to the ES query DSL (SURVEY §3 rows 7-12).
    """
    body = json.dumps(clause)
    if "term" in clause:
        return "exact"
    if "range" in clause:
        _require("window" in json.dumps(clause) or "window" in params,
                 f"matcher '{name}': range clause requires a window param")
        return "date_window"
    if "match" in clause:
        if "fuzziness" in body:
            return "fuzzy"
        return "tokens"
    raise ValidationError(
        f"matcher '{name}': unsupported clause template {sorted(clause)} "
        "(supported: term, match, match+fuzziness, range±window)"
    )


@dataclass(frozen=True)
class IndexField:
    """≙ ``model/IndexField.java``: one concrete source field → attribute via
    matcher, with optional per-field quality."""

    field: str
    attribute: str
    matcher: str | None
    quality: float | None = None

    @property
    def span_field(self) -> str:
        """Base field carrying the raw value in the spans table.  ES
        multi-fields like ``full_name.phonetic`` are derived *indexed* forms
        of the base field ``full_name`` (the analyzer lives in the index
        mapping, not the document) — our extraction reads the base field and
        applies the matcher's key function instead (SURVEY §3 row 10)."""
        return self.field.split(".", 1)[0]

    @staticmethod
    def parse(index: str, fname: str, spec: object, declared_attrs: set,
              declared_matchers: set) -> "IndexField":
        _require(isinstance(fname, str) and fname, f"index '{index}' field name invalid")
        _require(isinstance(spec, dict), f"index '{index}' field '{fname}' must be an object")
        unknown = set(spec) - {"attribute", "matcher", "quality"}
        _require(not unknown,
                 f"index '{index}' field '{fname}' has unknown fields: {sorted(unknown)}")
        attr = spec.get("attribute")
        _require(attr in declared_attrs,
                 f"index '{index}' field '{fname}' references undeclared attribute '{attr}'")
        matcher = spec.get("matcher")
        if matcher is not None:
            _require(matcher in declared_matchers,
                     f"index '{index}' field '{fname}' references undeclared matcher '{matcher}'")
        quality = _validate_quality(spec.get("quality"),
                                    f"index '{index}' field '{fname}'.quality")
        return IndexField(field=fname, attribute=attr, matcher=matcher, quality=quality)


@dataclass(frozen=True)
class Index:
    """≙ ``model/Index.java``: in our engine an 'index' is a *source* tag in
    the interleaved documents table, and its fields are extraction specs over
    ``kind='text'`` spans (FIXTURES.md §2)."""

    name: str
    fields: tuple

    @staticmethod
    def parse(name: str, spec: object, declared_attrs: set,
              declared_matchers: set) -> "Index":
        _require(isinstance(name, str) and name, "index name must be a non-empty string")
        _require(isinstance(spec, dict), f"index '{name}' must be an object")
        fields = spec.get("fields")
        _require(isinstance(fields, dict) and len(fields) > 0,
                 f"index '{name}' must have a non-empty fields object")
        parsed = tuple(
            IndexField.parse(name, f, s, declared_attrs, declared_matchers)
            for f, s in sorted(fields.items())
        )
        return Index(name=name, fields=parsed)


@dataclass(frozen=True)
class Model:
    """≙ ``model/Model.java``: the four required, non-empty sections."""

    attributes: dict
    resolvers: dict
    matchers: dict
    indices: dict

    @staticmethod
    def parse(src) -> "Model":
        if isinstance(src, (str, bytes)):
            try:
                obj = json.loads(src)
            except json.JSONDecodeError as e:
                raise ValidationError(f"model is not valid JSON: {e}") from e
        else:
            obj = src
        _require(isinstance(obj, dict), "model must be a JSON object")
        unknown = set(obj) - {"attributes", "resolvers", "matchers", "indices"}
        _require(not unknown, f"model has unknown sections: {sorted(unknown)}")
        for section in ("attributes", "resolvers", "matchers", "indices"):
            _require(section in obj, f"model is missing required section '{section}'")
            _require(isinstance(obj[section], dict) and len(obj[section]) > 0,
                     f"model section '{section}' must be a non-empty object")

        attributes = {n: Attribute.parse(n, s) for n, s in sorted(obj["attributes"].items())}
        matchers = {n: Matcher.parse(n, s) for n, s in sorted(obj["matchers"].items())}
        resolvers = {
            n: Resolver.parse(n, s, set(attributes))
            for n, s in sorted(obj["resolvers"].items())
        }
        indices = {
            n: Index.parse(n, s, set(attributes), set(matchers))
            for n, s in sorted(obj["indices"].items())
        }
        return Model(attributes=attributes, resolvers=resolvers,
                     matchers=matchers, indices=indices)

    def to_json(self) -> str:
        def attr(a: Attribute):
            d: dict = {"type": a.type}
            if a.score is not None:
                d["score"] = a.score
            if a.params:
                d["params"] = a.params
            return d

        def res(r: Resolver):
            d: dict = {"attributes": list(r.attributes)}
            if r.weight:
                d["weight"] = r.weight
            return d

        def mat(m: Matcher):
            d: dict = {"type": m.kind}
            if m.clause:
                d["clause"] = m.clause
            if m.quality is not None:
                d["quality"] = m.quality
            if m.params:
                d["params"] = m.params
            return d

        return json.dumps({
            "attributes": {n: attr(a) for n, a in self.attributes.items()},
            "resolvers": {n: res(r) for n, r in self.resolvers.items()},
            "matchers": {n: mat(m) for n, m in self.matchers.items()},
            "indices": {
                n: {"fields": {f.field: {
                    "attribute": f.attribute,
                    **({"matcher": f.matcher} if f.matcher else {}),
                    **({"quality": f.quality} if f.quality is not None else {}),
                } for f in ix.fields}}
                for n, ix in self.indices.items()
            },
        }, indent=2, sort_keys=True)
