"""zentity_spark — a from-scratch PySpark-native entity-resolution engine.

Re-expresses the capabilities of the reference (``fintechstudios/zentity``,
an Elasticsearch plugin for query-time entity resolution — see SURVEY.md)
as a batch DataFrame pipeline: declarative entity models (attributes,
resolvers, matchers, index mappings) compiled to multi-key blocking,
vectorized pairwise scoring, and iterative connected-components clustering
over an interleaved text+media documents table.

Reference anchors cited in docstrings use the convention
``path/File.java::symbol`` relative to ``/root/reference`` (the public
upstream source); see SURVEY.md §0 for verification status.
"""

__version__ = "0.1.0"

ABOUT = {
    "name": "zentity_spark",
    "description": (
        "Batch entity resolution on PySpark: blocking, pairwise scoring, "
        "transitive clustering with zentity-compatible entity models."
    ),
    "website": "https://zentity.io (reference semantics)",
    "version": __version__,
}
