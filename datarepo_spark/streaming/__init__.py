"""datarepo_spark.streaming"""
