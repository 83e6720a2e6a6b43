"""Model-validation parity tests.

Ports the *cases* (not code) of the reference's model unit tests
(`src/test/java/io/zentity/model/{Model,Attribute,Resolver,Matcher,Index,
IndexField}Test.java` — SURVEY.md §6.1, anchors unverified per §0): legal and
illegal JSON for every section, name restrictions, type restrictions, range
checks, cross-reference checks.
"""

import json

import pytest

from zentity_spark.model import Model, ValidationError

VALID = {
    "attributes": {"name": {"type": "string", "score": 0.8},
                   "dob": {"type": "date", "params": {"format": "yyyy-MM-dd"}}},
    "resolvers": {"r1": {"attributes": ["name", "dob"], "weight": 2}},
    "matchers": {"x": {"clause": {"term": {"{{ field }}": "{{ value }}"}},
                       "quality": 0.9}},
    "indices": {"idx": {"fields": {
        "fname": {"attribute": "name", "matcher": "x"}}}},
}


def _mutate(**over):
    m = json.loads(json.dumps(VALID))
    for k, v in over.items():
        m[k] = v
    return m


def test_valid_model_parses():
    m = Model.parse(json.dumps(VALID))
    assert set(m.attributes) == {"name", "dob"}
    assert m.resolvers["r1"].attributes == ("name", "dob")
    assert m.resolvers["r1"].weight == 2
    assert m.matchers["x"].kind == "exact"
    assert m.matchers["x"].quality == 0.9
    assert m.indices["idx"].fields[0].attribute == "name"


def test_roundtrip_json():
    m = Model.parse(json.dumps(VALID))
    m2 = Model.parse(m.to_json())
    assert m2.to_json() == m.to_json()


def test_invalid_json():
    with pytest.raises(ValidationError, match="not valid JSON"):
        Model.parse("{nope")


def test_model_must_be_object():
    with pytest.raises(ValidationError):
        Model.parse("[1, 2]")


@pytest.mark.parametrize("section", ["attributes", "resolvers", "matchers", "indices"])
def test_missing_section(section):
    m = _mutate()
    del m[section]
    with pytest.raises(ValidationError, match=f"missing required section '{section}'"):
        Model.parse(m)


@pytest.mark.parametrize("section", ["attributes", "resolvers", "matchers", "indices"])
def test_empty_section(section):
    with pytest.raises(ValidationError, match="non-empty"):
        Model.parse(_mutate(**{section: {}}))


def test_unknown_top_level_section():
    with pytest.raises(ValidationError, match="unknown sections"):
        Model.parse(_mutate(extra={"a": 1}))


# --- names (model/Validation.java rules: non-empty, no periods, no leading _)

@pytest.mark.parametrize("bad", ["", "has.dot", "_leading", "bad\nname"])
def test_bad_attribute_names(bad):
    m = _mutate(attributes={bad: {"type": "string"}})
    with pytest.raises(ValidationError):
        Model.parse(m)


def test_bad_resolver_name():
    m = _mutate(resolvers={"a.b": {"attributes": ["name"]}})
    with pytest.raises(ValidationError):
        Model.parse(m)


# --- attributes

def test_invalid_attribute_type():
    m = _mutate(attributes={"name": {"type": "float"}})
    with pytest.raises(ValidationError, match="invalid type 'float'"):
        Model.parse(m)


def test_attribute_type_defaults_to_string():
    m = _mutate(attributes={"name": {}, "dob": {"type": "date"}})
    assert Model.parse(m).attributes["name"].type == "string"


@pytest.mark.parametrize("score", [-0.1, 1.5, "high", True])
def test_attribute_score_range(score):
    m = _mutate(attributes={"name": {"type": "string", "score": score},
                            "dob": {"type": "date"}})
    with pytest.raises(ValidationError):
        Model.parse(m)


def test_attribute_unknown_field():
    m = _mutate(attributes={"name": {"type": "string", "bogus": 1},
                            "dob": {"type": "date"}})
    with pytest.raises(ValidationError, match="unknown fields"):
        Model.parse(m)


# --- resolvers

def test_resolver_empty_attributes():
    m = _mutate(resolvers={"r1": {"attributes": []}})
    with pytest.raises(ValidationError, match="non-empty attributes"):
        Model.parse(m)


def test_resolver_undeclared_attribute():
    m = _mutate(resolvers={"r1": {"attributes": ["ghost"]}})
    with pytest.raises(ValidationError, match="undeclared attribute 'ghost'"):
        Model.parse(m)


def test_resolver_duplicate_attributes():
    m = _mutate(resolvers={"r1": {"attributes": ["name", "name"]}})
    with pytest.raises(ValidationError, match="duplicate"):
        Model.parse(m)


def test_resolver_weight_must_be_int():
    m = _mutate(resolvers={"r1": {"attributes": ["name"], "weight": "big"}})
    with pytest.raises(ValidationError, match="weight"):
        Model.parse(m)


# --- matchers (clause classification ≙ the ES templates zentity ships)

def test_matcher_requires_clause_or_type():
    m = _mutate(matchers={"x": {"quality": 0.5}})
    with pytest.raises(ValidationError):
        Model.parse(m)


def test_matcher_quality_range():
    m = _mutate(matchers={"x": {"clause": {"term": {"f": "v"}}, "quality": 2.0}})
    with pytest.raises(ValidationError):
        Model.parse(m)


def test_clause_classification():
    m = _mutate(matchers={
        "e": {"clause": {"term": {"{{ field }}": "{{ value }}"}}},
        "t": {"clause": {"match": {"{{ field }}": "{{ value }}"}}},
        "f": {"clause": {"match": {"{{ field }}": {
            "query": "{{ value }}", "fuzziness": "{{ params.fuzziness }}"}}}},
        "d": {"clause": {"range": {"{{ field }}": {
            "gte": "{{ value }}||-{{ params.window }}",
            "lte": "{{ value }}||+{{ params.window }}"}}},
              "params": {"window": "2d"}},
        "x": {"clause": {"term": {"f": "v"}}},
    }, indices={"idx": {"fields": {"fname": {"attribute": "name", "matcher": "e"}}}})
    parsed = Model.parse(m)
    assert parsed.matchers["e"].kind == "exact"
    assert parsed.matchers["t"].kind == "tokens"
    assert parsed.matchers["f"].kind == "fuzzy"
    assert parsed.matchers["d"].kind == "date_window"


def test_unsupported_clause():
    m = _mutate(matchers={"x": {"clause": {"wildcard": {"f": "*"}}}})
    with pytest.raises(ValidationError, match="unsupported clause"):
        Model.parse(m)


def test_explicit_type_matcher():
    m = _mutate(matchers={"x": {"type": "phonetic", "quality": 0.8}})
    assert Model.parse(m).matchers["x"].kind == "phonetic"


def test_unknown_matcher_type():
    m = _mutate(matchers={"x": {"type": "quantum"}})
    with pytest.raises(ValidationError, match="unknown type"):
        Model.parse(m)


# --- indices

def test_index_field_undeclared_attribute():
    m = _mutate(indices={"idx": {"fields": {
        "f": {"attribute": "ghost", "matcher": "x"}}}})
    with pytest.raises(ValidationError, match="undeclared attribute"):
        Model.parse(m)


def test_index_field_undeclared_matcher():
    m = _mutate(indices={"idx": {"fields": {
        "f": {"attribute": "name", "matcher": "ghost"}}}})
    with pytest.raises(ValidationError, match="undeclared matcher"):
        Model.parse(m)


def test_index_empty_fields():
    m = _mutate(indices={"idx": {"fields": {}}})
    with pytest.raises(ValidationError, match="non-empty fields"):
        Model.parse(m)


def test_index_field_quality_range():
    m = _mutate(indices={"idx": {"fields": {
        "f": {"attribute": "name", "matcher": "x", "quality": -1}}}})
    with pytest.raises(ValidationError):
        Model.parse(m)


def test_multifield_span_field():
    m = _mutate(indices={"idx": {"fields": {
        "full_name.phonetic": {"attribute": "name", "matcher": "x"}}}})
    ix = Model.parse(m).indices["idx"]
    assert ix.fields[0].field == "full_name.phonetic"
    assert ix.fields[0].span_field == "full_name"
