from zentity_spark.plans.compiler import CompiledPlan, Scope, compile_model

__all__ = ["CompiledPlan", "Scope", "compile_model"]
