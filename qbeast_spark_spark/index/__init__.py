"""qbeast_spark_spark.index"""
