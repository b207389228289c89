from akvorado_spark.plans.rollup import FlowStore, Resolution, DEFAULT_RESOLUTIONS

__all__ = ["FlowStore", "Resolution", "DEFAULT_RESOLUTIONS"]
