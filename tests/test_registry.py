"""Model registry CRUD parity (≙ ModelsActionIT shapes — SURVEY §6.1):
create fails on conflict, update requires validity, delete 404s, invalid
models never reach storage.
"""

import json

import pytest

from zentity_spark.model import ValidationError
from zentity_spark.registry import ModelExists, ModelNotFound, ModelRegistry
from tests.test_model import VALID


@pytest.fixture
def reg(tmp_path):
    r = ModelRegistry(str(tmp_path / "models"))
    r.setup()
    return r


def test_create_get_roundtrip(reg):
    reg.create("person", json.dumps(VALID))
    got = reg.get("person")
    assert set(got.attributes) == {"name", "dob"}
    assert reg.list() == ["person"]


def test_create_conflict(reg):
    reg.create("person", json.dumps(VALID))
    with pytest.raises(ModelExists):
        reg.create("person", json.dumps(VALID))


def test_upsert_replaces(reg):
    reg.create("person", json.dumps(VALID))
    v2 = json.loads(json.dumps(VALID))
    v2["attributes"]["extra"] = {"type": "string"}
    reg.upsert("person", json.dumps(v2))
    assert "extra" in reg.get("person").attributes


def test_invalid_model_never_written(reg):
    bad = {"attributes": {}}
    with pytest.raises(ValidationError):
        reg.create("person", json.dumps(bad))
    assert reg.list() == []


def test_delete_and_missing(reg):
    reg.create("person", json.dumps(VALID))
    reg.delete("person")
    assert reg.list() == []
    with pytest.raises(ModelNotFound):
        reg.get("person")
    with pytest.raises(ModelNotFound):
        reg.delete("person")


def test_bad_type_name(reg):
    with pytest.raises(ValidationError):
        reg.create("../evil", json.dumps(VALID))
