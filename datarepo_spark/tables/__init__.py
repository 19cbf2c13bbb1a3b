"""datarepo_spark.tables"""
