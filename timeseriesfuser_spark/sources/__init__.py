from timeseriesfuser_spark.sources.readers import build_source_df

__all__ = ["build_source_df"]
