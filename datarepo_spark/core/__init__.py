"""datarepo_spark.core"""
