from solr_spark.oracle.reference import OracleIndex

__all__ = ["OracleIndex"]
