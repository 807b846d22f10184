"""qbeast_spark_spark.streaming"""
