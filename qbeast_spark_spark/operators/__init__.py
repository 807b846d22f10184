"""qbeast_spark_spark.operators"""
