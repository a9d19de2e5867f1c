from esmarc_spark.pipeline.run import run_pipeline

__all__ = ["run_pipeline"]
