"""qbeast_spark_spark.sources"""
