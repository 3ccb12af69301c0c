from rudder_server_spark.plans.registry import REGISTRY, QueryDef

__all__ = ["REGISTRY", "QueryDef"]
