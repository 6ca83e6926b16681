from pdftableextractor_spark.plans.skew import salted_repartition  # noqa: F401
