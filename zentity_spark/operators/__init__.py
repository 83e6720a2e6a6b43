from zentity_spark.operators.cluster import (
    bounded_label_propagation,
    connected_components,
)

__all__ = ["connected_components", "bounded_label_propagation"]
