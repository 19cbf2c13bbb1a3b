"""datarepo_spark.operators"""
