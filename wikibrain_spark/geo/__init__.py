from wikibrain_spark.geo import cells, geodesic, pip  # noqa: F401
