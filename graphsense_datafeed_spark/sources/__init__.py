from graphsense_datafeed_spark.sources.tables import load, load_all  # noqa: F401
