"""qbeast_spark_spark.core"""
