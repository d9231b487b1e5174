from ner_spark.functions import text  # noqa: F401
