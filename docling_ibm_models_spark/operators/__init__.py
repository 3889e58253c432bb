from docling_ibm_models_spark.operators import cell_matcher, otsl_ops  # noqa: F401
