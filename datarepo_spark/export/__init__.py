"""datarepo_spark.export"""
