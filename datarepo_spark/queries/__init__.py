"""datarepo_spark.queries"""
