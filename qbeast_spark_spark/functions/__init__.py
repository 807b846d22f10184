"""qbeast_spark_spark.functions"""
