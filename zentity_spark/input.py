"""Resolution input parsing: attributes / terms / ids
(≙ ``resolution/input/Input.java::parseAttributes/parseTerms/parseIds``
≈L80-600, SURVEY rows 13/24).

Terms are untyped strings coerced to every attribute whose type parses
them (``input/Term.java::isNumber/isBoolean/isDate`` ≈L30-180): string
always; number/boolean/date only when parseable.  Values are normalized
with the SAME SQL normalizer expressions the extraction stage uses
(evaluated driver-side on literals), so probe values and extracted values
live in one value space.
"""

from __future__ import annotations

import re

from zentity_spark import dialect as D

_NUM_RE = re.compile(r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$")


def _is_date(s: str, fmt: str) -> bool:
    from datetime import datetime
    if fmt in D.EPOCH_DATE_FORMATS:
        return bool(re.match(r"^-?\d+$", s))
    try:
        datetime.strptime(s, D.java_date_fmt_to_py(fmt))
        return True
    except ValueError:
        return False


def term_accepts(attr, term: str) -> bool:
    """can this attribute's type hold this untyped term?"""
    if attr.type == "string":
        return True
    if attr.type == "number":
        return bool(_NUM_RE.match(term.strip()))
    if attr.type == "boolean":
        return term.strip().lower() in ("true", "false")
    if attr.type == "date":
        return _is_date(term.strip(), attr.params.get("format", "yyyy-MM-dd"))
    return False


def build_probe(spark, plan, attributes=None, terms=None):
    """(attributes, terms) → ({attr: sorted [normalized values]},
    {attr: input params}).

    ``attributes`` accepts the reference's both shapes
    (``input/Attribute.java::params`` ≈L30-100): a plain value list, or
    ``{"values": [...], "params": {...}}`` — the params entry is the
    input level of the matcher-params cascade (matcher ⊕ model-attr ⊕
    input-attr, rightmost wins — SURVEY row 29).

    Normalization runs the compiled SQL normalizer of each attribute on the
    literal values (one tiny driver-side query), guaranteeing identity with
    extraction-time normalization.
    """
    raw: dict = {}
    params: dict = {}
    for a, vs in (attributes or {}).items():
        if a not in plan.model.attributes:
            raise KeyError(f"input references undeclared attribute '{a}'")
        if isinstance(vs, dict):
            p = vs.get("params", {})
            if p:
                params[a] = dict(p)
            vs = vs.get("values", [])
        raw.setdefault(a, []).extend(str(v) for v in vs)
    for t in terms or ():
        for a, spec in plan.model.attributes.items():
            if term_accepts(spec, str(t)):
                raw.setdefault(a, []).append(str(t))

    probe: dict = {}
    for a, vs in raw.items():
        expr = plan.norm_sql(a, "c", D.SPARK)
        rows = ", ".join("('" + v.replace("'", "''") + "')" for v in set(vs))
        got = spark.sql(
            f"SELECT DISTINCT {expr} AS v FROM (VALUES {rows}) AS t(c)"
        ).collect()
        vals = sorted(r["v"] for r in got if r["v"])
        if vals:
            probe[a] = vals
    return probe, params
