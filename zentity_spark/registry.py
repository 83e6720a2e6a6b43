"""Entity-model registry: the batch analog of the ``.zentity-models`` index
CRUD (SURVEY.md §4.2, rows 2-4):

  * ``ModelsAction.java::getEntityModel/indexEntityModel/updateEntityModel/
    deleteEntityModel`` (≈L80-280) — GET / POST(create, fail-if-exists) /
    PUT(upsert) / DELETE with full validation before every write.
  * ``SetupAction.java::createIndex`` (≈L40-120) — storage initialization,
    also invoked lazily when missing.

Storage is a directory of ``{entity_type}.json`` files (the "models table");
entity types obey the same name restrictions as model section names.
"""

from __future__ import annotations

import os
import re

from zentity_spark.model import Model, ValidationError

_TYPE_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9_\-]*$")


class ModelExists(ValidationError):
    """POST on an existing entity type (reference: 409-style conflict)."""


class ModelNotFound(KeyError):
    """GET/PUT-update/DELETE on a missing entity type (reference: 404)."""


class ModelRegistry:
    def __init__(self, path: str):
        self.path = path

    def setup(self) -> None:
        """≙ POST _zentity/_setup — idempotent storage init."""
        os.makedirs(self.path, exist_ok=True)

    def _file(self, entity_type: str) -> str:
        if not _TYPE_RE.match(entity_type or ""):
            raise ValidationError(
                f"invalid entity type name: {entity_type!r}")
        return os.path.join(self.path, f"{entity_type}.json")

    def list(self) -> list:
        """≙ GET _zentity/models (match_all)."""
        self.setup()
        return sorted(f[:-5] for f in os.listdir(self.path)
                      if f.endswith(".json"))

    def get(self, entity_type: str) -> Model:
        f = self._file(entity_type)
        if not os.path.exists(f):
            raise ModelNotFound(entity_type)
        with open(f) as fh:
            return Model.parse(fh.read())

    def create(self, entity_type: str, model_json) -> Model:
        """≙ POST — validate, fail if the type already exists."""
        self.setup()
        f = self._file(entity_type)
        if os.path.exists(f):
            raise ModelExists(f"entity type '{entity_type}' already exists")
        model = Model.parse(model_json)      # validation before write
        with open(f, "w") as fh:
            fh.write(model.to_json())
        return model

    def upsert(self, entity_type: str, model_json) -> Model:
        """≙ PUT — validate, replace or create."""
        self.setup()
        model = Model.parse(model_json)
        with open(self._file(entity_type), "w") as fh:
            fh.write(model.to_json())
        return model

    def delete(self, entity_type: str) -> None:
        f = self._file(entity_type)
        if not os.path.exists(f):
            raise ModelNotFound(entity_type)
        os.remove(f)
