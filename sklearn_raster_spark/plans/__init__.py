from sklearn_raster_spark.plans.registry import QuerySpec, REGISTRY, query, load_all_queries

__all__ = ["QuerySpec", "REGISTRY", "query", "load_all_queries"]
