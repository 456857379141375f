"""Spark operators: KG pipeline stages [1]-[7] + training-data ops."""
