"""datarepo_spark.catalog"""
