from nadry_spark.pipeline.training_export import export_training_shards  # noqa: F401
