from zentity_spark.functions.similarity import (
    jaro_winkler_np,
    jaro_winkler_py,
    register_similarity_udfs,
)

__all__ = ["jaro_winkler_np", "jaro_winkler_py", "register_similarity_udfs"]
