"""qbeast_spark_spark.plans"""
