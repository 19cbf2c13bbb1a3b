"""datarepo_spark.functions"""
