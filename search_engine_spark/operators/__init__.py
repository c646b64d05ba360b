"""PySpark-native search/analytics engine (rebuild of zerowei/Search-Engine capabilities)."""
