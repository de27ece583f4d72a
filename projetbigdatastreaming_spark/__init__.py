"""PySpark-native analytics engine (rebuild of graceGBI/ProjetBigDataStreaming)."""
