from kp_data_pipelines_spark.plans.pipeline import Pipeline, Stage

__all__ = ["Pipeline", "Stage"]
